package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.GroupState

/** Cross-epoch heavy-hitter candidates — the streaming composition of
  * the Misra-Gries summary (`functions/MisraGries`, the batch
  * q_heavy_hitters sketch) with the keyed state store: the sketch is
  * maintained INCREMENTALLY as micro-batches arrive, so "what are the
  * frequent terms so far" is answerable at every epoch without
  * re-scanning history.
  *
  * Scale design (the 100 TB story):
  *  - terms shard by hash; each shard's state is ONE Misra-Gries buffer
  *    of ≤ `capacity` counters — state size is O(shards × capacity),
  *    independent of vocabulary and stream length, RocksDB-backable.
  *  - the MG guarantee composes across epochs because the state IS the
  *    summary: any term with true count > shard_count/capacity is
  *    retained (Misra & Gries 1982), and a term lives in exactly one
  *    shard, so a global φ-heavy hitter (count > total/φ⁻¹) survives
  *    whenever capacity ≥ φ⁻¹ ≥ shard-skew-adjusted bound.
  *  - emission per batch is the shard's CURRENT sketch tagged with a
  *    state sequence number; the reader takes each shard's newest
  *    snapshot, so the final candidate set needs no end-of-stream
  *    signal. False positives are removed by the caller's exact
  *    confirm pass (sketch-prune-confirm, as in batch q_heavy_hitters)
  *    — the result is exact regardless of sketch noise.
  */
object StreamingHeavyHitters {

  final case class Tok(shard: Int, term: String)
  final case class MgState(seq: Long, counts: Map[String, Long])
  final case class Snapshot(shard: Int, seq: Long, term: String, lower: Long)

  implicit val tokEnc: Encoder[Tok] = Encoders.product[Tok]
  implicit val snapEnc: Encoder[Snapshot] = Encoders.product[Snapshot]
  implicit val stateEnc: Encoder[MgState] = Encoders.product[MgState]

  /** Misra-Gries step: increment if tracked; insert while below
    * capacity; otherwise decrement every counter (dropping zeros) —
    * identical semantics to the batch Aggregator's `reduce`. */
  private def mgStep(counts: Map[String, Long], term: String,
      capacity: Int): Map[String, Long] =
    counts.get(term) match {
      case Some(c) => counts.updated(term, c + 1)
      case None if counts.size < capacity => counts.updated(term, 1L)
      case None =>
        counts.flatMap { case (w, c) => if (c > 1) Some(w -> (c - 1)) else None }
    }

  /** Per-shard state transition: fold the batch's terms into the MG
    * buffer (sorted for replay-stable decrement order), bump the
    * sequence number, emit the full current sketch as this epoch's
    * snapshot. */
  def update(capacity: Int)(shard: Int, rows: Iterator[Tok],
      state: GroupState[MgState]): Iterator[Snapshot] = {
    val prior = if (state.exists) state.get else MgState(0L, Map.empty)
    // batch order is non-deterministic; MG's decrement step is
    // order-sensitive, so sort for a partitioning-invariant sketch
    val counts = rows.toSeq.map(_.term).sorted
      .foldLeft(prior.counts)((m, t) => mgStep(m, t, capacity))
    val seq = prior.seq + 1
    state.update(MgState(seq, counts))
    counts.iterator.map { case (w, c) => Snapshot(shard, seq, w, c) }
  }

  /** Final candidates from the emitted snapshots: each shard's newest
    * sketch (max seq), unioned. */
  def latestCandidates(snapshots: Dataset[Snapshot]): Dataset[String] = {
    import org.apache.spark.sql.functions._
    import snapshots.sparkSession.implicits._
    val w = org.apache.spark.sql.expressions.Window.partitionBy("shard")
    snapshots
      .withColumn("mx", max("seq").over(w))
      .filter(col("seq") === col("mx"))
      .select(col("term")).distinct().as[String]
  }
}
