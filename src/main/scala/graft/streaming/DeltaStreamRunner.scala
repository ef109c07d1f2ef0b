package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.sources.DeltaLog

/** Delta table as a STREAMING SOURCE: version-grained incremental
  * drain of the transaction log — the lakehouse half of the drain-epoch
  * family (CdcLogRunner drains a CDC log; this drains `_delta_log`).
  *
  * Semantics (mirrors Delta's own streaming-source contract):
  *  - one micro-batch per COMMIT: a commit is atomic in the log, so
  *    the cursor only ever points at commit boundaries — a restart
  *    resumes exactly at a version, never inside one (the same
  *    never-split-a-transaction law as the CDC settlement units)
  *  - `dataChange=false` housekeeping (OPTIMIZE / ZORDER rewrites) is
  *    INVISIBLE: its epoch yields zero rows, because the rewritten
  *    files carry no new data — the flag's reason to exist
  *  - a version that REMOVES data (DELETE, DV commit) refuses typed
  *    via [[DeltaLog.readIncremental]] — an append-diff stream would
  *    silently resurrect deleted rows; the caller must re-snapshot
  *
  * Scale shape: each epoch is ONE distributed parquet scan over
  * exactly the files that version added (file list from the KB-scale
  * log, data never collected); the cursor is a single long. */
object DeltaStreamRunner {

  final case class EpochResult(version: Long, rows: Long)

  /** Drain commits `(fromVersion, untilVersion]` (default: the log
    * head at call time — the Trigger.AvailableNow cap). `onEpoch`
    * receives each version's appended rows as a real DataFrame and
    * returns the row count it settled; the returned cursor trail is
    * what a caller persists. */
  def drain(spark: SparkSession, tableDir: String, fromVersion: Long,
      untilVersion: Option[Long] = None)(
      onEpoch: (Long, DataFrame) => Long): Seq[EpochResult] = {
    val cap = untilVersion.getOrElse(DeltaLog.currentVersion(tableDir))
    (fromVersion + 1 to cap).map { v =>
      val df = DeltaLog.readIncremental(spark, tableDir, v - 1, v)
      EpochResult(v, onEpoch(v, df))
    }
  }
}
