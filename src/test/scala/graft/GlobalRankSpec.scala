package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.GlobalRank

class GlobalRankSpec extends SparkSpec {

  private def lineitem = spark.read.parquet(s"${sf("sf0.001")}/lineitem.parquet")
    .select("l_orderkey", "l_linenumber", "l_extendedprice")

  test("global row_number equals the single-partition window formulation") {
    val order = Seq(col("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))
    val ours = GlobalRank.withGlobalRowNumber(lineitem, order)
      .select(col("l_orderkey"), col("l_linenumber"), col("rn"))
    val ref = lineitem.withColumn("rn",
        row_number().over(Window.orderBy(order: _*)).cast("long"))
      .select(col("l_orderkey"), col("l_linenumber"), col("rn"))
    assert(ours.exceptAll(ref).isEmpty && ref.exceptAll(ours).isEmpty)
  }

  test("ranks are partition-count invariant and a 1..n permutation") {
    val order = Seq(col("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))
    val a = GlobalRank.withGlobalRowNumber(lineitem.repartition(3), order, numPartitions = 5)
      .select(col("l_orderkey"), col("l_linenumber"), col("rn"))
    val b = GlobalRank.withGlobalRowNumber(lineitem.repartition(17), order, numPartitions = 11)
      .select(col("l_orderkey"), col("l_linenumber"), col("rn"))
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    val n = lineitem.count()
    val stats = a.agg(min("rn"), max("rn"), countDistinct("rn")).head
    assert(stats.getLong(0) === 1L && stats.getLong(1) === n && stats.getLong(2) === n)
  }

  test("ntile matches SQL NTILE semantics including the remainder rule") {
    import spark.implicits._
    // n=10, k=4: buckets of 3,3,2,2
    val df = (1 to 10).map(i => (i.toLong, s"r$i")).toDF("v", "tag")
    val got = GlobalRank.ntile(df, Seq(col("v")), 4)
      .select("v", "bucket").as[(Long, Int)].collect().sortBy(_._1)
    assert(got.map(_._2).toSeq === Seq(1, 1, 1, 2, 2, 2, 3, 3, 4, 4))
    // degenerate k > n: every row its own bucket, no division blow-up
    val small = (1 to 3).map(_.toLong).toDF("v")
    val g2 = GlobalRank.ntile(small, Seq(col("v")), 7)
      .select("v", "bucket").as[(Long, Int)].collect().sortBy(_._1)
    assert(g2.map(_._2).toSeq === Seq(1, 2, 3))
  }

  test("ranking stays distributed — many tasks, never one-task collapse") {
    val order = Seq(col("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))
    val ranked = GlobalRank.withGlobalRowNumber(lineitem, order, numPartitions = 8)
    // the stamped frame carries the range layout: 8 parallel tasks, each
    // holding a contiguous rank range (the single-partition window the
    // operator replaces would put ALL rows in one task)
    assert(ranked.rdd.getNumPartitions === 8)
    val perPart = ranked.rdd
      .mapPartitionsWithIndex { case (pid, it) =>
        val rns = it.map(_.getAs[Long]("rn")).toSeq
        if (rns.isEmpty) Iterator.empty
        else Iterator((pid, rns.min, rns.max, rns.size.toLong))
      }.collect().sortBy(_._1)
    assert(perPart.size > 1, "rows must spread over multiple tasks")
    // contiguity: partition p's ranks form [min, max] with no gaps, and
    // successive partitions chain without overlap
    perPart.foreach { case (_, lo, hi, n) => assert(hi - lo + 1 === n) }
    perPart.toSeq.sliding(2).foreach {
      case Seq((_, _, hi1, _), (_, lo2, _, _)) => assert(lo2 === hi1 + 1)
      case _ =>
    }
  }
}
