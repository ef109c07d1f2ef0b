package graft

import org.apache.spark.sql.functions._

import graft.operators.PageRankOps

class PageRankOpsSpec extends SparkSpec {
  import spark.implicits._

  test("two-node cycle is the exact conservation fixpoint: both ranks stay 1,000,000") {
    val edges = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val r = PageRankOps.pageRank(edges, "src", "dst")
      .orderBy("node").as[(Long, Long)].collect().toSeq
    // r = 150000 + (85 * r) div 100 has the exact solution r = 1,000,000
    assert(r == Seq((1L, 1000000L), (2L, 1000000L)))
  }

  test("star graph converges to the hand-computed exact fixpoint") {
    val edges = Seq((1L, 2L), (3L, 2L)).toDF("src", "dst")
    val r = PageRankOps.pageRank(edges, "src", "dst")
      .orderBy("node").as[(Long, Long)].collect().toMap
    // leaves have no in-edges: teleport floor. center:
    // 150000 + (85 * (150000 + 150000)) div 100 = 405000
    assert(r == Map(1L -> 150000L, 2L -> 405000L, 3L -> 150000L))
  }

  test("events transition graph converges with floor and mass-bound invariants") {
    val ev = graft.core.Tables.eventsUs(spark, sf()).select(
      col("user_id"), col("event_id"), col("ts_us"),
      get_json_object(col("props"), "$.k").cast("int").as("k"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts_us", "event_id")
    val edges = ev
      .select(col("k").as("dst"), lag("k", 1).over(w).as("src"))
      .filter(col("src").isNotNull)
    val r = PageRankOps.pageRank(edges, "src", "dst").collect()
    assert(r.nonEmpty)
    assert(r.forall(_.getLong(1) >= 150000L), "teleport floor violated")
    assert(r.map(_.getLong(1)).sum <= r.length.toLong * 1000000L,
      "floor division can only lose mass, never create it")
  }

  test("result is invariant under input partitioning (the determinism law)") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L), (2L, 3L)).toDF("src", "dst")
    val a = PageRankOps.pageRank(edges.repartition(1), "src", "dst")
      .orderBy("node").as[(Long, Long)].collect().toSeq
    val b = PageRankOps.pageRank(edges.repartition(7), "src", "dst")
      .orderBy("node").as[(Long, Long)].collect().toSeq
    assert(a == b)
  }
}
