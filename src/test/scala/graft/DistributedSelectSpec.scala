package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.DistributedSelect

class DistributedSelectSpec extends SparkSpec {

  private def lineitem = spark.read.parquet(s"${sf("sf0.001")}/lineitem.parquet")

  test("lower median per group equals the window rank-selection formulation") {
    val dec = org.apache.spark.sql.types.DecimalType(12, 2)
    val base = lineitem.select(col("l_returnflag").as("flag"),
      col("l_extendedprice").cast(dec).as("v"),
      col("l_orderkey"), col("l_linenumber"))
    val ref = {
      val w = Window.partitionBy("flag")
        .orderBy(col("v"), col("l_orderkey"), col("l_linenumber"))
      base.withColumn("rn", row_number().over(w))
        .withColumn("n", count(lit(1)).over(Window.partitionBy("flag")))
        .filter(col("rn") === expr("(n + 1) div 2"))
        .select(col("flag"), col("v").as("median"))
    }
    val got = DistributedSelect.lowerMedianByGroup(base, Seq("flag"), "v")
    assert(got.exceptAll(ref).isEmpty && ref.exceptAll(got).isEmpty)
  }

  test("small sample targets force the extract path and still select exactly") {
    val dec = org.apache.spark.sql.types.DecimalType(12, 2)
    val base = lineitem.select(col("l_returnflag").as("flag"),
      col("l_extendedprice").cast(dec).as("v"))
    // sampleTarget 16 on thousands of rows: brackets are coarse, the
    // in-bracket extraction pass must do the exact work
    val tiny = DistributedSelect.lowerMedianByGroup(base, Seq("flag"), "v", sampleTarget = 16)
    val full = DistributedSelect.lowerMedianByGroup(base, Seq("flag"), "v")
    assert(tiny.exceptAll(full).isEmpty && full.exceptAll(tiny).isEmpty)
  }

  test("heavy-hitter column: sampled bracket array is bounded by distinct values") {
    import spark.implicits._
    // one value carries 95% of the group: the (value, group) ticket hash
    // keeps EVERY duplicate of a kept value, so before the histogram
    // aggregation the collected array could hold ~0.95·n rows; after it,
    // at most the distinct-value count (102 here) regardless of n
    val rows = Seq.fill(20000)(("g1", 50L)) ++
      (1 to 500).map(i => ("g1", (i % 100).toLong + 100L)) ++
      (1 to 300).map(i => ("g2", i.toLong))
    val df = rows.toDF("flag", "v").repartition(8)
    val w = Window.partitionBy("flag").orderBy(col("v"))
    val ref = df.withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("flag")))
      .filter(col("rn") === expr("(n + 1) div 2"))
      .select(col("flag"), col("v").as("median"))
    val got = DistributedSelect.lowerMedianByGroup(df, Seq("flag"), "v",
      sampleTarget = 64)
    assert(got.exceptAll(ref).isEmpty && ref.exceptAll(got).isEmpty)
  }

  test("all-ties groups and k-th percentiles resolve without a group sort") {
    import spark.implicits._
    val ties = Seq.fill(1000)(("g1", BigDecimal(5))) ++
      (1 to 100).map(i => ("g2", BigDecimal(i)))
    val df = ties.toDF("flag", "v")
    val med = DistributedSelect.lowerMedianByGroup(df, Seq("flag"), "v")
      .as[(String, BigDecimal)].collect().toMap
    assert(med("g1") === BigDecimal(5))
    assert(med("g2") === BigDecimal(50)) // lower median of 1..100
    // P90 via the kExpr hook: ceil(n * 0.9)-th smallest
    val p90 = DistributedSelect.kthByGroup(df, Seq("flag"), "v",
        expr("cast(ceil(__n * 0.9) as bigint)"), out = "p90")
      .as[(String, BigDecimal)].collect().toMap
    assert(p90("g2") === BigDecimal(90))
    assert(p90("g1") === BigDecimal(5))
  }

  test("multi-quantile shares one pass set and matches per-quantile selections") {
    val dec = org.apache.spark.sql.types.DecimalType(12, 2)
    val base = lineitem.select(col("l_returnflag").as("flag"),
      col("l_extendedprice").cast(dec).as("v"))
    val profile = DistributedSelect.quantilesByGroup(base, Seq("flag"), "v",
      Seq("p25" -> 0.25, "p50" -> 0.50, "p99" -> 0.99))
    // each quantile column must equal the standalone kthByGroup answer
    for ((name, q) <- Seq("p25" -> 0.25, "p50" -> 0.50, "p99" -> 0.99)) {
      val solo = DistributedSelect.kthByGroup(base, Seq("flag"), "v",
        expr(s"greatest(1L, cast(ceil(__n * $q) as bigint))"), out = name)
      val a = profile.select("flag", name)
      assert(a.exceptAll(solo).isEmpty && solo.exceptAll(a).isEmpty, s"$name diverged")
    }
  }

  test("partition-count invariance") {
    val dec = org.apache.spark.sql.types.DecimalType(12, 2)
    val base = lineitem.select(col("l_returnflag").as("flag"),
      col("l_extendedprice").cast(dec).as("v"))
    val a = DistributedSelect.lowerMedianByGroup(base.repartition(3), Seq("flag"), "v")
    val b = DistributedSelect.lowerMedianByGroup(base.repartition(17), Seq("flag"), "v")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("quantilesByGroup: partition-count invariant even though sketch brackets may move") {
    val dec = org.apache.spark.sql.types.DecimalType(12, 2)
    val base = lineitem.select(col("l_returnflag").as("flag"),
      col("l_extendedprice").cast(dec).as("v"))
    val qs = Seq("p25" -> 0.25, "p50" -> 0.50, "p99" -> 0.99)
    // GK summaries merge in partition order, so the bracket ENDPOINTS can
    // differ between these runs — the answers cannot (exact-count determined)
    val a = DistributedSelect.quantilesByGroup(base.repartition(3), Seq("flag"), "v", qs)
    val b = DistributedSelect.quantilesByGroup(base.repartition(17), Seq("flag"), "v", qs)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("quantilesByGroup: small groups (whole-group bracket) and all-ties groups") {
    import spark.implicits._
    val ties = Seq.fill(1000)(("g1", BigDecimal(5))) ++
      (1 to 100).map(i => ("g2", BigDecimal(i))) ++
      Seq(("g3", BigDecimal(42))) // n = 1
    val df = ties.toDF("flag", "v")
    val got = DistributedSelect.quantilesByGroup(df, Seq("flag"), "v",
      Seq("med" -> 0.5, "p90" -> 0.9))
      .as[(String, BigDecimal, BigDecimal)].collect()
      .map { case (f, m, p) => f -> ((m, p)) }.toMap
    assert(got("g1") == ((BigDecimal(5), BigDecimal(5))))
    assert(got("g2") == ((BigDecimal(50), BigDecimal(90))))
    assert(got("g3") == ((BigDecimal(42), BigDecimal(42))))
  }
}
