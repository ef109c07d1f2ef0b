package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.StreamingNearDup
import graft.streaming.StreamingNearDup.{Banded, CandidatePair}

class StreamingNearDupSpec extends SparkSpec {

  private val docA = "the quick brown fox jumps over the lazy dog near the river bank today"
  // doubling the text doubles every token count, so each simhash bit's
  // majority sign is unchanged — a guaranteed hamming-0 near-dup that
  // is NOT an exact string copy
  private val docAish = docA + " " + docA
  private val docB = "completely different words about spark catalyst optimizer plans and shuffles here now"

  test("cross-epoch near-dup: a later batch's near-copy pairs with the earlier original") {
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._

    val input = MemoryStream[(Long, String)]
    val banded = StreamingNearDup.bandedOf(input.toDF().toDF("doc_id", "text"),
      "doc_id", "text")
    val query = StreamingNearDup(banded, maxHamming = 3).writeStream
      .format("memory").queryName("neardup_out")
      .outputMode(OutputMode.Append())
      .start()

    // epoch 1: original + unrelated doc — no pairs yet
    input.addData((1L, docA), (2L, docB))
    query.processAllAvailable()
    val afterE1 = spark.sql("SELECT * FROM neardup_out").count()
    assert(afterE1 == 0, "first epoch has nothing to pair against")

    // epoch 2: an exact copy and a near copy arrive
    input.addData((10L, docA), (11L, docAish))
    query.processAllAvailable()
    val afterE2 = spark.sql("SELECT * FROM neardup_out").count()

    // epoch 3: replay of doc 10 — idempotent, no re-emission
    input.addData((10L, docA))
    query.processAllAvailable()
    query.stop()

    assert(spark.sql("SELECT * FROM neardup_out").count() == afterE2,
      "replays must not re-emit")
    val pairs = spark.sql("SELECT docA, docB, hamming FROM neardup_out")
      .as[(Long, Long, Int)].collect().toSet
    // exact copy: hamming 0 against the original from epoch 1
    assert(pairs.contains((1L, 10L, 0)))
    // near copy (doubled text = identical signature) pairs with both
    assert(pairs.contains((1L, 11L, 0)) && pairs.contains((10L, 11L, 0)))
    // the unrelated doc never pairs
    assert(!pairs.exists { case (a, b, _) => a == 2L || b == 2L })
  }

  test("band-state ring is bounded: eviction keeps state O(maxPerBand), oldest first") {
    // exercise the transition function directly (no stream needed)
    val st = new TestGroupState(None)
    val rows = (1L to 10L).map(i => Banded("b", i, 0L)) // identical sigs: all pair
    val out = StreamingNearDup.emitCandidates(maxHamming = 0, maxPerBand = 4)(
      "b", rows.iterator, st).toSeq
    // 10 docs, everyone pairs with the ring contents at arrival (bounded by 4)
    assert(out.nonEmpty && out.forall(_.hamming == 0))
    assert(st.updated.get.sigs.size == 4, "ring bounded at maxPerBand")
    assert(st.updated.get.sigs.map(_._2) == List(10L, 9L, 8L, 7L), "newest retained")
    // a doc already in the ring re-emits nothing
    val st2 = new TestGroupState(st.updated)
    val out2 = StreamingNearDup.emitCandidates(maxHamming = 0, maxPerBand = 4)(
      "b", Iterator(Banded("b", 10L, 0L)), st2).toSeq
    assert(out2.isEmpty)
  }

  /** Minimal GroupState stub for direct transition-function tests. */
  private class TestGroupState(initial: Option[StreamingNearDup.BandState])
      extends org.apache.spark.sql.streaming.GroupState[StreamingNearDup.BandState] {
    var updated: Option[StreamingNearDup.BandState] = initial
    override def exists: Boolean = updated.isDefined
    override def get: StreamingNearDup.BandState = updated.get
    override def getOption: Option[StreamingNearDup.BandState] = updated
    override def update(s: StreamingNearDup.BandState): Unit = updated = Some(s)
    override def remove(): Unit = updated = None
    override def hasTimedOut: Boolean = false
    override def setTimeoutDuration(ms: Long): Unit = ()
    override def setTimeoutDuration(d: String): Unit = ()
    override def setTimeoutTimestamp(ms: Long): Unit = ()
    override def setTimeoutTimestamp(ms: Long, add: String): Unit = ()
    override def setTimeoutTimestamp(ts: java.sql.Date): Unit = ()
    override def setTimeoutTimestamp(ts: java.sql.Date, add: String): Unit = ()
    override def getCurrentWatermarkMs(): Long = 0L
    override def getCurrentProcessingTimeMs(): Long = 0L
  }
}
