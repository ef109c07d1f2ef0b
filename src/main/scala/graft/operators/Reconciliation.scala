package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Reconciliation counts (cdf: crates/cdf-contract/src/reconciliation.rs):
  * a merge's inserted/updated/unchanged/deleted breakdown, computed
  * from (base, stage, result) and cross-checked against the receipt's
  * row count — written/updated/deleted must explain the destination
  * cardinality exactly or the commit is refused.
  */
object Reconciliation {

  final case class MergeCounts(
      inserted: Long, updated: Long, survived: Long, resultRows: Long) {
    def explains(destRows: Long): Boolean =
      inserted + updated + survived == resultRows && resultRows == destRows
  }

  /** Counts for an upsert of `stage` into `base` on `keys`. */
  def mergeCounts(base: DataFrame, stage: DataFrame, keys: Seq[String]): MergeCounts = {
    val baseKeys = base.select(keys.map(col): _*)
    val stageKeys = stage.select(keys.map(col): _*).distinct()
    val updated = baseKeys.join(stageKeys, keys, "left_semi").count()
    val inserted = stageKeys.count() - updated
    val survived = baseKeys.count() - updated
    MergeCounts(inserted, updated, survived, inserted + updated + survived)
  }

  /** cdc_apply breakdown: last-op-per-key distribution. */
  def cdcCounts(ops: DataFrame, keys: Seq[String], opCol: String,
      orderCols: Seq[String]): DataFrame = {
    Dedup.keyed(ops, keys, orderCols, Dedup.Keep.Last)
      .groupBy(col(opCol).as("op")).agg(count(lit(1)).as("n"))
  }
}
