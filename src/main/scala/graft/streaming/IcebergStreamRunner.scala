package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.sources.IcebergSource

/** Iceberg table as a STREAMING SOURCE: snapshot-grained incremental
  * drain of the ancestry chain — the Iceberg twin of
  * [[DeltaStreamRunner]] (both lakehouse formats stream through the
  * same drain-epoch shape; only the cursor vocabulary differs:
  * snapshot ids on the parent chain vs log versions).
  *
  * Semantics (Iceberg's incremental-append contract):
  *  - one micro-batch per SNAPSHOT, walked in commit order along the
  *    parent chain from the cursor — a snapshot commit is atomic, so
  *    the cursor only ever points at snapshot boundaries
  *  - `replace` (compaction) snapshots yield ZERO rows: a rewrite adds
  *    no data, and single-snapshot windows mean the drain never has to
  *    re-window around a compaction the way a multi-snapshot
  *    `readIncremental` caller must
  *  - delete snapshots stream their net effect on rows ADDED IN THE
  *    SAME WINDOW only (readIncremental's sequence-gated MoR); their
  *    effect on earlier data is row REMOVAL, which an added-rows
  *    stream cannot represent — consumers needing it diff full scans
  *
  * Scale shape: each epoch is one manifest-pruned parquet scan of the
  * files that snapshot added; the cursor is one snapshot id. */
object IcebergStreamRunner {

  final case class EpochResult(snapshotId: Long, rows: Long)

  /** Drain snapshots after `fromSnapshot` (exclusive; None = from
    * table creation) up to `untilSnapshot` (default: current head —
    * the Trigger.AvailableNow cap). */
  def drain(spark: SparkSession, tableDir: String, fromSnapshot: Option[Long],
      untilSnapshot: Option[Long] = None)(
      onEpoch: (Long, DataFrame) => Long): Seq[EpochResult] = {
    val meta = IcebergSource.readMeta(tableDir)
    val headOpt = untilSnapshot.orElse(meta.currentSnapshotId)
    headOpt match {
      case None => Seq.empty
      case Some(head) if fromSnapshot.contains(head) => Seq.empty
      case Some(head) =>
        val chain = meta.lineage(fromSnapshot, head).reverse // commit order
        chain.map { s =>
          val df =
            if (s.operation == "replace")
              spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
                org.apache.spark.sql.types.StructType(Nil))
            else IcebergSource.readIncremental(spark, tableDir, s.parentId, s.id)
          EpochResult(s.id, onEpoch(s.id, df))
        }
    }
  }
}
