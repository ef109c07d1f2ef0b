package graft.contract

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StructType}

/** Per-path nested-structure actions (cdf: crates/cdf-contract/src/
  * program.rs:365-376 `NestedAction`): keep the struct, expand it to a
  * child table with propagated parent keys, or capture it as JSON in
  * the `_cdf_variant` column. Structs/arrays are first-class in Spark,
  * so KeepNested is free; the other two lower to `explode`/`to_json`.
  */
object NestedActions {
  val VariantColumn = "_cdf_variant"

  sealed trait NestedAction
  object NestedAction {
    case object NotNested extends NestedAction
    case object KeepNested extends NestedAction
    final case class ExpandToChildTable(childName: String, parentKeys: Seq[String]) extends NestedAction
    case object CaptureVariant extends NestedAction
  }
  import NestedAction._

  /** Apply one action to `column`; returns (parent df, optional child). */
  def apply(df: DataFrame, column: String, action: NestedAction): (DataFrame, Option[(String, DataFrame)]) =
    action match {
      case NotNested | KeepNested => (df, None)
      case CaptureVariant =>
        // untypeable/drifting substructure → JSON in _cdf_variant,
        // original column dropped (cdf variant_capture.rs)
        val withVariant = df
          .withColumn(VariantColumn,
            when(col(column).isNotNull, to_json(struct(col(column).as(column))))
              .otherwise(lit(null)))
          .drop(column)
        (withVariant, None)
      case ExpandToChildTable(childName, parentKeys) =>
        val childCols = parentKeys.map(col) :+ col(column)
        val child = df.schema(column).dataType match {
          case _: ArrayType =>
            df.select(parentKeys.map(col) :+
              posexplode_outer(col(column)).as(Seq("_child_pos", "_elem")): _*)
              .select(parentKeys.map(col) :+ col("_child_pos") :+ col("_elem.*"): _*)
          case _: StructType =>
            df.select(parentKeys.map(col) :+ col(s"$column.*"): _*)
          case other =>
            throw new IllegalArgumentException(s"cannot expand $column of type $other")
        }
        (df.drop(column), Some(childName -> child))
    }
}
