package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.catalog.TimeSeriesQueries

/** Laws for the time-series tier: the distributed formulations must
  * equal straightforward window/driver-side reference implementations
  * on real data (windows are fine IN TESTS — the production plans are
  * what PlanAuditSpec pins). */
class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  /** The tier's daily revenue-cents series, computed independently of
    * the code under test (plain SQL over the parquet). */
  private def dailySeries(dir: String): Seq[(Long, Long)] = {
    val ord = graft.core.Tables(spark, dir, "orders")
    ord.select(graft.core.Tables.tsUs(ord, "o_orderdate").as("us"),
        round(col("o_totalprice") * 100).cast("long").as("c"))
      .select(expr("us div 86400000000").as("day"), col("c"))
      .groupBy("day").agg(sum("c").as("x"))
      .orderBy("day")
      .as[(Long, Long)].collect().toSeq
  }

  test("holt linear == driver-side recurrence on the real series") {
    val series = dailySeries(sf())
    assert(series.size > 100)
    // reference: the textbook recurrence, sequential doubles
    val exp = collection.mutable.ArrayBuffer.empty[(Long, Double, Double)]
    var l = series.head._2.toDouble
    var b = series(1)._2.toDouble - series.head._2.toDouble
    exp += ((series.head._1, l, b))
    series.drop(1).foreach { case (day, xi) =>
      val x = xi.toDouble
      val lNew = 0.5 * x + 0.5 * (l + b)
      b = 0.5 * (lNew - l) + 0.5 * b
      l = lNew
      exp += ((day, l, b))
    }
    val got = TimeSeriesQueries.holtLinear.run(spark, sf())
      .as[(Long, Double, Double)].collect().toSeq
    assert(got.size == exp.size)
    got.zip(exp).foreach { case ((gd, gl, gb), (ed, el, eb)) =>
      assert(gd == ed)
      assert(math.abs(gl - el / 100) < 1e-6, s"level at day $gd")
      assert(math.abs(gb - eb / 100) < 1e-6, s"trend at day $gd")
    }
  }

  test("stl median == window/percentile reference (trend + seasonal)") {
    val daily = dailySeries(sf()).toDF("day", "x")
    val w = Window.orderBy("day").rowsBetween(-3, 3)
    // reference trend: exact 4th order statistic of each full 7-window
    val ref = daily
      .withColumn("win", collect_list("x").over(w))
      .filter(size(col("win")) === 7)
      .select(col("day"), col("x"),
        element_at(array_sort(col("win")), 4).as("trend"))
      .select(expr("(day + 3) % 7").as("dow"), (col("x") - col("trend")).as("det"))
    // reference seasonal: lower median = (n+1)/2-th smallest per dow
    val refSeasonal = ref.groupBy("dow")
      .agg(count(lit(1)).as("n"), sort_array(collect_list("det")).as("ds"))
      .select(col("dow"), col("n").as("n_days"),
        element_at(col("ds"), expr("(n + 1) div 2").cast("int")).as("seasonal_cents"))
      .as[(Long, Long, Long)].collect().toMap2
    val got = TimeSeriesQueries.stlMedian.run(spark, sf())
      .as[(Long, Long, Long)].collect()
    assert(got.length == 7)
    got.foreach { case (dow, n, seas) =>
      val (en, es) = refSeasonal(dow)
      assert(n == en && seas == es, s"dow $dow: got ($n,$seas) want ($en,$es)")
    }
  }

  test("sign test: counts match wilcoxon's pair universe and a direct recount") {
    val (nPos, nNeg, z) = TimeSeriesQueries.pairedSignTest.run(spark, sf())
      .as[(Long, Long, Double)].head()
    // direct recount of the pairing, independent formulation
    val o = graft.core.Tables(spark, sf(), "orders")
    val a = o.filter(year(col("o_orderdate")).isin(1995, 1996))
      .groupBy("o_custkey")
      .agg(
        max(when(year(col("o_orderdate")) === 1995,
          round(col("o_totalprice") * 100).cast("long"))).as("c95"),
        max(when(year(col("o_orderdate")) === 1996,
          round(col("o_totalprice") * 100).cast("long"))).as("c96"))
      .filter(col("c95").isNotNull && col("c96").isNotNull && col("c96") =!= col("c95"))
      .select((col("c96") > col("c95")).as("pos")).as[Boolean].collect()
    assert(nPos == a.count(identity).toLong)
    assert(nNeg == a.count(!_).toLong)
    val n = (nPos + nNeg).toDouble
    assert(math.abs(z - (2.0 * nPos - n) / math.sqrt(n)) < 1e-5)
  }

  private implicit class ToMap2(xs: Array[(Long, Long, Long)]) {
    def toMap2: Map[Long, (Long, Long)] = xs.map(t => t._1 -> (t._2, t._3)).toMap
  }
}
