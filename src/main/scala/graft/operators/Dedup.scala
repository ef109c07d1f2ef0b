package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyed / exact dedup (cdf: crates/cdf-contract/src/program.rs:335-341
  * `DedupKeepProgram`, dedup_key.rs; spill engine
  * crates/cdf-engine/src/dedup_spill.rs — Spark-first: `dropDuplicates`
  * and window `row_number` shuffle on the key and spill via
  * UnsafeExternalSorter, so the 8 MiB-budget external-sort machinery of
  * the reference is replaced by the platform).
  *
  * Scale note: both paths are a single hash-partition shuffle on the
  * dedup key with map-side partial aggregation unavailable (row
  * identity must survive), so the shuffle IS the cost. At 100 TB,
  * pre-bucketing the table by the dedup key makes this shuffle-free.
  */
object Dedup {
  sealed trait Keep
  object Keep {
    /** keep first row per key in `orderCols` ascending order. */
    case object First extends Keep
    /** keep last row per key (reference merge default). */
    case object Last extends Keep
    /** any duplicate key is a contract failure. */
    case object Fail extends Keep
  }

  /** Keyed dedup with total, deterministic ordering: `orderCols` must
    * form a total order within key (append a unique id as final
    * tiebreak or results are nondeterministic under parallelism). */
  def keyed(df: DataFrame, keys: Seq[String], orderCols: Seq[String], keep: Keep): DataFrame = {
    val ordering = keep match {
      case Keep.First | Keep.Fail => orderCols.map(col(_).asc)
      case Keep.Last => orderCols.map(col(_).desc)
    }
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ordering: _*)
    keep match {
      case Keep.Fail =>
        val counted = df.withColumn("_graft_key_count", count(lit(1)).over(
          Window.partitionBy(keys.map(col): _*)))
        // caller asserts emptiness of .filter(col("_graft_key_count") > 1)
        counted
      case _ =>
        df.withColumn("_graft_rn", row_number().over(w))
          .filter(col("_graft_rn") === 1)
          .drop("_graft_rn")
    }
  }

  /** Whole-row exact dedup (cdf: crates/cdf-engine/src/expression.rs:267-291). */
  def exact(df: DataFrame): DataFrame = df.distinct()
}
