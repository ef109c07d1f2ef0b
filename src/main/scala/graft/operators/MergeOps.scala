package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Write-disposition semantics re-expressed as pure DataFrame algebra
  * (cdf: crates/cdf-kernel/src/resource.rs:419-425 dispositions;
  * VISION.md:921-931 semantics; merge impl
  * crates/cdf-dest-postgres/src/commit.rs:678-943).
  *
  * These return the post-commit logical table so they compose and are
  * oracle-checkable; the sink layer (graft.pkg) handles the physical
  * staged write + receipt.
  *
  * Scale notes: `upsert` is one equi-join on the merge key — broadcast
  * when the stage fits (typical incremental batch ≪ base), else a
  * shuffle-hash join; pre-bucketing base by key makes it co-located.
  */
object MergeOps {

  /** merge = dedup-then-merge: stage deduped last-writer-per-key (a pure
    * function of the package, cdf VISION.md:929), then insert-or-update
    * into base on `keys`. */
  def upsert(base: DataFrame, stage: DataFrame, keys: Seq[String]): DataFrame = {
    val cols = base.columns.toSeq
    val survivors = base.join(stage.select(keys.map(col): _*), keys, "left_anti")
    stage.select(cols.map(col): _*).unionByName(survivors.select(cols.map(col): _*))
  }

  /** cdc_apply: ordered apply of insert/update/delete ops per key —
    * last op per key wins; a terminal delete removes the key
    * (cdf: VISION.md:931; crates/cdf-runtime/src/cdc_log_source.rs).
    * `opCol` values: insert|update|delete; `orderCols` = total order. */
  def cdcApply(ops: DataFrame, keys: Seq[String], opCol: String, orderCols: Seq[String]): DataFrame = {
    val last = Dedup.keyed(ops, keys, orderCols, Dedup.Keep.Last)
    last.filter(col(opCol) =!= "delete").drop(opCol)
  }

  /** replace = atomic swap, never delete-then-insert (VISION.md:927):
    * logically, the new data IS the table. */
  def replace(next: DataFrame): DataFrame = next

  /** append (VISION.md:925). */
  def append(base: DataFrame, batch: DataFrame): DataFrame =
    base.unionByName(batch)
}
