package graft

import org.apache.spark.sql.functions._

/** Focused guards for the r16 optimization internals: every rewritten
  * path must compute exactly what the original computed. */
class R16OptimizationSpec extends SparkSpec {

  test("spearman: every probe knob combination computes the same rho") {
    val d = sf()
    val combos = for {
      spread <- Seq(true, false)
      persist <- Seq(true, false)
      hintX <- Seq(true, false)
      gate <- Seq(-1L, 4L << 20, Long.MaxValue)
    } yield (spread, persist, hintX, gate)
    val rhos = combos.map { case (sp, pe, hx, g) =>
      val r = graft.catalog.RankStatsQueries
        .spearmanDf(spark, d, sp, pe, hx, g).head().getDouble(0)
      spark.catalog.clearCache()
      r
    }
    assert(rhos.distinct.size == 1,
      s"variant rhos diverged: ${combos.zip(rhos).mkString(", ")}")
  }

  test("Par.awaitAll: results keep submission order and jobs inherit the label") {
    spark.sparkContext.setJobDescription("awaitall-spec")
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val out = graft.core.Par.awaitAll((1 to 4).map { i => () =>
      seen.add(spark.sparkContext.getLocalProperty("spark.job.description"))
      // run a real job from the pool thread so inheritance is exercised
      spark.range(i * 100L).count() + i
    })
    spark.sparkContext.setJobDescription(null)
    assert(out == Seq(101L, 202L, 303L, 404L))
    import scala.jdk.CollectionConverters._
    assert(seen.asScala.forall(_ == "awaitall-spec"),
      s"pool threads lost the driver's job label: ${seen.asScala.toSeq}")
  }

  test("Scratch: reclaim deletes registered dirs and is re-entrant") {
    val d1 = graft.core.Scratch.dir("graft_spec_reclaim")
    val f = java.nio.file.Paths.get(d1, "x")
    java.nio.file.Files.writeString(f, "y")
    assert(java.nio.file.Files.exists(f))
    graft.core.Scratch.reclaim()
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(d1)))
    graft.core.Scratch.reclaim() // second call: no-op, no throw
    val d2 = graft.core.Scratch.dir("graft_spec_reclaim")
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(d2)))
    graft.core.Scratch.reclaim()
  }

  test("withStreamingShuffle restores every conf it sets") {
    val s = spark
    val before = Seq(
      "spark.sql.shuffle.partitions",
      "spark.sql.streaming.noDataMicroBatches.enabled",
      "spark.sql.streaming.minBatchesToRetain")
      .map(k => k -> s.conf.getOption(k))
    graft.core.Sessions.withStreamingShuffle(s) {
      assert(s.conf.get("spark.sql.streaming.noDataMicroBatches.enabled") == "false")
      assert(s.conf.get("spark.sql.streaming.minBatchesToRetain") == "2")
    }
    before.foreach { case (k, v) => assert(s.conf.getOption(k) == v, k) }
  }

  test("shortest_paths: gated-broadcast BFS matches the recursive-CTE result shape") {
    // the oracle gate proves value equality; this guards the loop's
    // counting rewrite (count()-driven termination vs isEmpty)
    val rows = graft.catalog.GraphQueries.shortestPaths
      .run(spark, sf()).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getInt(0)).toSeq == rows.map(_.getInt(0)).toSeq.sorted)
    assert(rows.forall(_.getLong(1) > 0L))
  }
}
