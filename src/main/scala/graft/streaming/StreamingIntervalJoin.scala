package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked STREAM–STREAM interval join: pairs (l, r) with the same
  * key and `r.time ∈ [l.time, l.time + window]` — the streaming twin
  * of `operators/RangeJoin` (batch bucketed form). Reference
  * semantics: cdf temporal join; here both inputs are real streams and
  * Catalyst's symmetric hash join owns buffering and eviction.
  *
  * Scale design (the 100 TB story):
  *  - ONE shuffle per side on the key; each side buffers rows in keyed
  *    state only until the other side's watermark proves no future
  *    match is possible: left rows are held `window + lateness`, right
  *    rows `lateness` — steady-state memory is O(rows in the active
  *    window), independent of stream length, RocksDB-backed when
  *    configured.
  *  - the time bound is part of the JOIN CONDITION, not a post-filter,
  *    so Spark derives the state watermarks instead of buffering
  *    forever (an unbounded stream-stream join is rejected by the
  *    analyzer — by design).
  *  - inner join: a match is emitted in the micro-batch where the
  *    later of the two rows arrives — no watermark wait on emission,
  *    so cross-epoch pairs (click in batch 1, purchase in batch 3)
  *    surface the moment they complete.
  */
object StreamingIntervalJoin {

  /** Join two STREAMING frames on `keys` plus
    * `right.rightTs ∈ [left.leftTs, left.leftTs + window]`.
    * `leftTs`/`rightTs` are TIMESTAMP columns (must be distinctly
    * named); `window` and `lateness` are interval strings.
    *
    * `joinType` "inner": matches emit as soon as the later row
    * arrives. "left_outer": additionally, a left row with NO match
    * emits null-padded — but only once BOTH watermarks pass
    * `leftTs + window` (the earliest moment absence is provable;
    * Spark holds the row in state exactly that long, then emits and
    * evicts in one step — the streaming twin of a left range join).
    */
  def joinWithin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, window: String,
      lateness: String = "1 second", joinType: String = "inner"): DataFrame = {
    require(joinType == "inner" || joinType == "left_outer", joinType)
    val l = left.withWatermark(leftTs, lateness)
    // key columns live on both sides; alias the right copies so the
    // equi-join condition is unambiguous and the output keeps one copy
    val r0 = right.withWatermark(rightTs, lateness)
    val r = keys.foldLeft(r0)((df, k) => df.withColumnRenamed(k, s"_r_$k"))
    val keyEq = keys.map(k => col(k) === col(s"_r_$k")).reduce(_ && _)
    val cond = keyEq &&
      col(rightTs) >= col(leftTs) &&
      col(rightTs) <= col(leftTs) + expr(s"INTERVAL $window")
    l.join(r, cond, joinType).drop(keys.map(k => s"_r_$k"): _*)
  }
}
