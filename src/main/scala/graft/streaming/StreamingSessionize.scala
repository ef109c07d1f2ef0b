package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming gap-based sessionization on Spark's NATIVE session
  * windows — the streaming twin of `operators/Sessionize` (which is
  * the batch lag+running-sum formulation). Reference semantics:
  * cdf window.rs gap sessions; here expressed as
  * `session_window(ts, gap)` + watermark so Catalyst owns state
  * layout, merge, and eviction.
  *
  * Scale design (the 100 TB story):
  *  - ONE shuffle on (session_window, keys); state is per open
  *    session per key, evicted the moment the watermark passes the
  *    session close — steady-state memory is O(active sessions),
  *    independent of stream length, RocksDB-backed when configured.
  *  - session bounds are aggregated from the EVENTS (min/max event
  *    time), not read off the window struct, so the emitted rows are
  *    bit-identical to the batch rollup regardless of how the engine
  *    pads the window end with the gap.
  *  - append mode: a session row is emitted exactly once, when it can
  *    no longer grow — the contract an incremental downstream (ledger
  *    merge, cursor advance) needs.
  *
  * Merge semantics note (pinned by StreamingSessionizeSpec): Spark
  * merges an event into the open session iff it starts at or before
  * `last event + gap` — an event EXACTLY `gap` later stays in-session;
  * a new session opens only when `diff > gap`. That is bit-identical
  * to the batch `Sessionize.assign` split law with the same `gapUs`,
  * so the two formulations agree row-for-row with no offset fudge.
  */
object StreamingSessionize {

  /** Build the streaming session rollup over `df` (a STREAMING frame
    * with `keys` plus a TIMESTAMP column `tsCol`). Emits one row per
    * closed session: keys, `session_start`/`session_end` (epoch µs of
    * the first/last event), `n_events`, `duration_us`.
    *
    * @param gap      session gap as an interval string, e.g. "1 hour"
    * @param lateness watermark delay; events older than
    *                 max(event time) - lateness may be dropped
    */
  def sessions(df: DataFrame, keys: Seq[String], tsCol: String, gap: String,
      lateness: String = "1 second"): DataFrame =
    df.withWatermark(tsCol, lateness)
      .groupBy(session_window(col(tsCol), gap) +: keys.map(col): _*)
      .agg(
        unix_micros(min(col(tsCol))).as("session_start"),
        unix_micros(max(col(tsCol))).as("session_end"),
        count(lit(1)).as("n_events"))
      .withColumn("duration_us", col("session_end") - col("session_start"))
      .drop("session_window")
}
