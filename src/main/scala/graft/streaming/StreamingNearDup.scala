package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Cross-epoch NEAR-dup candidate detection — the streaming
  * composition of the SimHash band index (`llm/TextDedup`) with the
  * keyed state store (`StatefulDedup`'s shape): documents arriving in
  * ANY micro-batch are checked against every earlier document that
  * shared a band, so a near-duplicate of last hour's crawl is caught
  * the moment it arrives, without re-scanning the corpus.
  *
  * Scale design (the 100 TB story):
  *  - signatures are the codegen'd one-pass SimHash kernel; only
  *    (band_key, doc_id, sig) — ~30 bytes/doc/band — shuffles.
  *  - state is keyed BY BAND (16-bit chunks of the signature): a doc
  *    lands in `bands` groups, each holding a bounded ring of recent
  *    (sig, doc_id) pairs (`maxPerBand`, FIFO eviction) — state size
  *    is O(bands × maxPerBand × distinct-band-keys), independent of
  *    corpus size, RocksDB-backed when configured.
  *  - emission = candidate pairs at Hamming ≤ `maxHamming`, verified
  *    inside the state loop (64-bit xor+popcount per candidate — cheap
  *    and exact for SimHash distance); downstream exact-Jaccard verify
  *    composes batch-side exactly as in `TextDedup.simhashPairs`.
  *  - dedup of pair emissions across bands is the caller's distinct()
  *    over (doc_a, doc_b) — kept out of the state loop so each band's
  *    group stays independent (no cross-key coordination).
  */
object StreamingNearDup {

  final case class Banded(band: String, docId: Long, sig: Long)
  final case class CandidatePair(docA: Long, docB: Long, hamming: Int)
  final case class BandState(sigs: List[(Long, Long)]) // (sig, docId), newest first

  implicit private val bandedEnc: Encoder[Banded] = Encoders.product[Banded]
  implicit private val pairEnc: Encoder[CandidatePair] = Encoders.product[CandidatePair]
  implicit private val stateEnc: Encoder[BandState] = Encoders.product[BandState]
  implicit private val strEnc: Encoder[String] = Encoders.STRING

  /** 16-bit band keys of a 64-bit simhash: "b:chunk". `portableHash`
    * swaps the token hash for the md5-derived one (exactly as
    * `TextDedup.simhashPairs`) so a SQL oracle can replay the
    * signatures; banding and state semantics are identical. */
  def bandedOf(df: DataFrame, idCol: String, textCol: String,
      portableHash: Boolean = false): Dataset[Banded] = {
    graft.functions.TextHashFunctions.register(df.sparkSession)
    val fn = if (portableHash) "graft_portable_simhash64" else "graft_simhash64"
    df.select(col(idCol).cast("long").as("docId"),
        call_function(fn, col(textCol)).as("sig"))
      .select(col("docId"), col("sig"),
        explode(sequence(lit(0), lit(3))).as("b"))
      .select(
        concat_ws(":", col("b").cast("string"),
          call_function("shiftrightunsigned", col("sig"), col("b") * 16).bitwiseAND(0xFFFFL)
            .cast("string")).as("band"),
        col("docId"), col("sig"))
      .as[Banded]
  }

  /** Per-band state transition: every arriving doc is checked against
    * the band's retained signatures (newest first); matches within
    * `maxHamming` emit ordered candidate pairs (old doc first). The
    * arriving docs then join the ring, bounded by `maxPerBand`. A doc
    * id already in the ring re-emits nothing (idempotent replays). */
  def emitCandidates(maxHamming: Int, maxPerBand: Int)(
      band: String, rows: Iterator[Banded],
      state: GroupState[BandState]): Iterator[CandidatePair] = {
    val prior = if (state.exists) state.get.sigs else Nil
    val out = List.newBuilder[CandidatePair]
    var ring = prior
    val seen = scala.collection.mutable.HashSet[Long](prior.map(_._2): _*)
    // batch order is non-deterministic; sort for replay-stable emission
    rows.toSeq.sortBy(_.docId).foreach { r =>
      if (!seen.contains(r.docId)) {
        ring.foreach { case (s, id) =>
          val h = java.lang.Long.bitCount(s ^ r.sig)
          if (h <= maxHamming)
            out += CandidatePair(math.min(id, r.docId), math.max(id, r.docId), h)
        }
        ring = ((r.sig, r.docId) :: ring).take(maxPerBand)
        seen += r.docId
      }
    }
    state.update(BandState(ring))
    out.result().iterator
  }

  /** Batch/stream-agnostic wiring: shared-band grouping + keyed state.
    * Callers `.distinct()` the emitted pairs (a pair can surface from
    * several bands) and exact-verify downstream. */
  def apply(banded: Dataset[Banded], maxHamming: Int = 3,
      maxPerBand: Int = 256): Dataset[CandidatePair] =
    banded.groupByKey(_.band)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        emitCandidates(maxHamming, maxPerBand))
}
