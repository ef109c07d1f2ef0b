package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the latest right row with
  * `rightTime <= leftTime` within the same key — the temporal-join
  * primitive of event/feature pipelines (point-in-time correctness for
  * training data: no feature leakage from the future).
  *
  * Spark lacks this operator; per the extension ladder we COMPOSE it
  * from existing ops (SURVEY §7.3 rung (a)) rather than a custom
  * SparkPlan: union both sides tagged, one window pass per key ordered
  * by (time, side) carrying the last right payload forward with
  * `last(ignoreNulls)`. Cost: ONE shuffle on the key (same as any join
  * strategy would need) + a linear window scan — no range explosion,
  * no per-row binary search, skew handled by AQE like any sort.
  */
object AsofJoin {

  /** Left rows gain `asof_<payloadCol>` = payload of the latest right
    * row at-or-before their time (null when none precedes).
    * Ties at equal time: the right row is visible to the left row. */
  def leftAsof(left: DataFrame, right: DataFrame, keys: Seq[String],
      timeCol: String, payloadCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    // side 0 = right (sorts first at equal time → visible), 1 = left
    val taggedRight = payloadCols.foldLeft(
      right.select(((keys :+ timeCol) ++ payloadCols).map(col): _*)
        .withColumn("_side", lit(0))) { (df, p) =>
      df.withColumnRenamed(p, s"_p_$p")
    }
    val taggedLeft = payloadCols.foldLeft(
      left.withColumn("_side", lit(1))) { (df, p) =>
      df.withColumn(s"_p_$p", lit(null).cast(taggedRight.schema(s"_p_$p").dataType))
    }
    val unioned = taggedLeft.unionByName(taggedRight, allowMissingColumns = true)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(timeCol).asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = payloadCols.foldLeft(unioned) { (df, p) =>
      df.withColumn(s"asof_$p", last(col(s"_p_$p"), ignoreNulls = true).over(w))
    }
    filled.filter(col("_side") === 1)
      .select((leftCols.map(col) ++ payloadCols.map(p => col(s"asof_$p"))): _*)
  }
}
