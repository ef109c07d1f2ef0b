package graft

import org.apache.spark.sql.functions._

import graft.llm.SeqPacking

/** Sequence-packing invariants: budget law, document atomicity, order
  * preservation, partitioning invariance. */
class SeqPackingSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(n: Int, parts: Int) =
    (0 until n).map(i => (i.toLong, 50L + (i * 37) % 400)).toDF("doc_id", "toks")
      .repartition(parts)

  test("every sequence fits the budget unless it holds one oversized doc") {
    val docs = corpus(500, 7).union(Seq((9001L, 5000L), (9002L, 120L)).toDF("doc_id", "toks"))
    val packed = SeqPacking.pack(docs, "doc_id", "toks", budget = 1024, shards = 8)
    val fills = SeqPacking.sequenceFill(packed).collect()
    fills.foreach { r =>
      val ok = r.getAs[Long]("toks") <= 1024 || r.getAs[Long]("n_docs") == 1
      assert(ok, s"sequence over budget with multiple docs: $r")
    }
    // nothing lost, nothing duplicated
    assert(packed.count() == 502)
    assert(packed.select("doc_id").distinct().count() == 502)
    // the oversized doc is alone in its sequence at offset 0
    val big = packed.filter(col("doc_id") === 9001L).head()
    assert(big.offset == 0L)
    val mates = packed.collect().count(p => p.shard == big.shard && p.seq == big.seq)
    assert(mates == 1)
  }

  test("offsets are contiguous and doc order within a shard is preserved") {
    val packed = SeqPacking.pack(corpus(300, 5), "doc_id", "toks", 1024, 4)
      .collect().groupBy(_.shard)
    packed.foreach { case (_, ps) =>
      val inOrder = ps.sortBy(_.doc_id)
      // (seq, offset) must be non-decreasing lexicographically in doc order
      val keys = inOrder.map(p => (p.seq, p.offset)).toSeq
      assert(keys == keys.sorted, "packing reordered documents within a shard")
      inOrder.groupBy(_.seq).foreach { case (_, inSeq) =>
        val sorted = inSeq.sortBy(_.offset)
        var expect = 0L
        sorted.foreach { p => assert(p.offset == expect); expect += p.toks }
      }
    }
  }

  test("assignment is a pure function of (corpus, budget, shards) — partitioning-invariant") {
    val a = SeqPacking.pack(corpus(400, 3), "doc_id", "toks", 512, 8)
      .collect().sortBy(_.doc_id).toSeq
    val b = SeqPacking.pack(corpus(400, 17), "doc_id", "toks", 512, 8)
      .collect().sortBy(_.doc_id).toSeq
    assert(a == b)
  }
}
