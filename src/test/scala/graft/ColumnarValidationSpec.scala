package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.contract.{ColumnarValidation, ContractPolicy, RowRule, ValidationProgram}

/** The columnar kernel must agree with the row-based Column pipeline
  * on every rule type, every null placement, and every boundary —
  * and must HONESTLY record which path ran. */
class ColumnarValidationSpec extends SparkSpec {
  import spark.implicits._

  private val policy = ContractPolicy(Seq(
    RowRule.Nullability("nn_id", "id"),
    RowRule.Range("range_qty", "qty", 1, 45),
    RowRule.Domain("domain_flag", "flag", Seq("A", "N")),
    RowRule.Regex("regex_status", "status", "^O"),
    RowRule.Freshness("fresh_ts", "ts", 1000L * 86400 * 365, 917827200000L)))

  /** edge rows: nulls in every ruled column, boundaries straddled,
    * multi-byte UTF-8, empty strings. */
  private def edgeDf() = {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("qty", DoubleType),
      StructField("flag", StringType), StructField("status", StringType),
      StructField("ts", TimestampType), StructField("pad", StringType)))
    val t = (ms: Long) => new java.sql.Timestamp(ms)
    val fresh = 917827200000L - 1000L * 86400 * 300 // inside the window
    val stale = 917827200000L - 1000L * 86400 * 400 // outside
    val rows = Seq(
      Row(1L, 1.0, "A", "O-open", t(fresh), "x"), // all pass (lo boundary)
      Row(2L, 45.0, "N", "O", t(917827200000L - 1000L * 86400 * 365), "y"), // hi + exact-threshold pass
      Row(null, 0.999, "R", "F-done", t(stale), "z"), // all five fail
      Row(4L, 45.001, null, null, null, null), // nulls fail non-nullability rules
      Row(5L, null, "Ä", "ÖO", t(fresh), "é"), // multi-byte; prefix must NOT match mid-string
      Row(6L, 22.5, "", "", t(fresh), ""), // empty strings fail domain+regex
      Row(7L, 45.0000001, "AN", "Oö", t(fresh - 1), "w")) // just-over range; "AN" ∉ {A,N}
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 3), schema)
  }

  private def rowTruth(df: org.apache.spark.sql.DataFrame, p: ContractPolicy)
      : (Seq[(Long, Long)], Map[String, Long]) = {
    val program = ValidationProgram.compile(p)
    val outcome = program.ruleOutcomeCounts(df).head()
    val perRule = p.rules.map(r =>
      (outcome.getAs[Long](s"${r.id}__pass"), outcome.getAs[Long](s"${r.id}__violation")))
    val disp = program.annotate(df)
      .groupBy(ValidationProgram.DispositionCol).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    (perRule, disp)
  }

  private def assertAgrees(df: org.apache.spark.sql.DataFrame, p: ContractPolicy,
      expectColumnar: Boolean): Unit = {
    val r = ColumnarValidation.counts(df, p)
    assert(r.columnar == expectColumnar,
      s"path mismatch: columnar=${r.columnar}, reason=${r.fallbackReason}")
    val (perRule, disp) = rowTruth(df, p)
    p.rules.zipWithIndex.foreach { case (rule, i) =>
      assert((r.counts.rulePass(i), r.counts.ruleViolation(i)) == perRule(i),
        s"rule ${rule.id}: kernel=(${r.counts.rulePass(i)},${r.counts.ruleViolation(i)}) row=${perRule(i)}")
    }
    val kDisp = r.counts.rowsByDisposition.filter(_._2 > 0)
    assert(kDisp == disp, s"dispositions: kernel=$kDisp row=$disp")
    assert(r.counts.totalRows == df.count())
  }

  test("columnar kernel == row pipeline on edge rows (parquet-backed, columnar path taken)") {
    val dir = s"${tmpDir()}/edge"
    edgeDf().write.parquet(dir)
    assertAgrees(spark.read.parquet(dir), policy, expectColumnar = true)
  }

  test("fatal rules escalate the rank in the kernel exactly as in the row path") {
    val dir = s"${tmpDir()}/fatal"
    edgeDf().write.parquet(dir)
    val p = policy.copy(fatalRules = Set("domain_flag"))
    assertAgrees(spark.read.parquet(dir), p, expectColumnar = true)
    val r = ColumnarValidation.counts(spark.read.parquet(dir), p)
    assert(r.counts.rowsByDisposition.getOrElse("reject_batch", 0L) > 0,
      "a fatal domain violation must surface as reject_batch")
  }

  test("general-regex rule stays columnar (slow lane), literal rewrites hit the byte kernels") {
    val dir = s"${tmpDir()}/rx"
    edgeDf().write.parquet(dir)
    val general = policy.copy(rules = policy.rules.map {
      case RowRule.Regex(id, c, _) => RowRule.Regex(id, c, "^O.*n$") // metacharacters
      case r => r
    })
    assertAgrees(spark.read.parquet(dir), general, expectColumnar = true)
    // suffix / equality / contains forms too
    Seq("n$", "^O$", "O").foreach { pat =>
      val p = policy.copy(rules = policy.rules.map {
        case RowRule.Regex(id, c, _) => RowRule.Regex(id, c, pat)
        case r => r
      })
      assertAgrees(spark.read.parquet(dir), p, expectColumnar = true)
    }
  }

  test("in-memory relation falls back to the row path with the reason recorded, same numbers") {
    val df = edgeDf() // LocalTableScan/parallelize: no columnar scan
    assertAgrees(df, policy, expectColumnar = false)
    val r = ColumnarValidation.counts(df, policy)
    assert(r.fallbackReason.exists(_.contains("no columnar scan")))
  }

  test("Custom SQL rule falls back (predicates stay on the row path)") {
    val dir = s"${tmpDir()}/custom"
    edgeDf().write.parquet(dir)
    val p = policy.copy(rules = policy.rules :+ RowRule.Custom("c1", "qty", "qty * 2 < 50"))
    val r = ColumnarValidation.counts(spark.read.parquet(dir), p)
    assert(!r.columnar && r.fallbackReason.exists(_.contains("custom rule")))
    assertAgrees(spark.read.parquet(dir), p, expectColumnar = false)
  }

  test("DATE freshness under the UTC session uses the whole-day kernel and agrees") {
    val schema = StructType(Seq(StructField("d", DateType)))
    val rows = (0 until 40).map(i => Row(java.sql.Date.valueOf(f"1998-12-${i % 28 + 1}%02d")))
    val dir = s"${tmpDir()}/dates"
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema).write.parquet(dir)
    val p = ContractPolicy(Seq(
      RowRule.Freshness("fresh_d", "d", 1000L * 86400 * 10, 915148800000L))) // asOf 1999-01-01
    assertAgrees(spark.read.parquet(dir), p, expectColumnar = true)
  }

  test("kernel counts on real lineitem match the row pipeline and the plan reads only ruled columns") {
    val li = graft.core.Tables(spark, sf("sf0.01"), "lineitem")
    val p = graft.catalog.CoreQueries.lineitemPolicy
    assertAgrees(li, p, expectColumnar = true)
    // the pruned projection is the point of the counts path: the scan
    // must decode the 5 ruled columns, not all 16
    val proj = li.select(p.rules.map(_.column).distinct.map(col): _*)
    val scan = proj.queryExecution.executedPlan
      .collectFirst { case s if s.supportsColumnar => s }.get
    assert(scan.output.map(_.name).toSet == p.rules.map(_.column).toSet,
      s"scan must be pruned to ruled columns: ${scan.output.map(_.name)}")
  }

  test("zero-allocation byte lane (plain on-heap vectors, no dictionary) agrees with row truth") {
    // parquet fixtures arrive dictionary-encoded, so the dict-memo lane
    // is covered above; this drives the byte lane through KernelFixture
    val df = edgeDf()
    val (perRule, _) = rowTruth(df, policy)
    Seq(policy,
      policy.copy(rules = policy.rules.map {
        case RowRule.Regex(id, c, _) => RowRule.Regex(id, c, "n$") // EndsWith bytes
        case r => r
      }),
      policy.copy(rules = policy.rules.map {
        case RowRule.Regex(id, c, _) => RowRule.Regex(id, c, "O") // Contains bytes
        case r => r
      })).foreach { p =>
      val cols = p.rules.map(_.column).distinct
      val (batch, schema) = graft.tools.KernelFixture.onHeapBatch(df, cols)
      val (idxs, kerns, ranks) = graft.contract.ColumnarValidation
        .bindKernels(schema, p).fold(r => fail(r), identity)
      val c = graft.contract.ColumnarValidation
        .evalBatches(Iterator.single(batch), idxs, kerns, ranks)
      val (truth, _) = rowTruth(df, p)
      p.rules.indices.foreach { i =>
        assert((c.rulePass(i), c.ruleViolation(i)) == truth(i),
          s"byte lane ${p.rules(i).id}: (${c.rulePass(i)},${c.ruleViolation(i)}) != ${truth(i)}")
      }
    }
    assert(perRule.nonEmpty)
  }

  test("seeded randomized differential: kernel == row pipeline on adversarial data × random policies") {
    val strPool = Array("A", "N", "R", "", "O", "Oö", "ÄO", "o", "NA", "AN",
      "O" * 40, " ", "n", "On", "öÖ漢", " O", "O ")
    (1 to 6).foreach { seed =>
      val rnd = new scala.util.Random(seed * 7919)
      val schema = StructType(Seq(
        StructField("id", LongType), StructField("qty", DoubleType),
        StructField("flag", StringType), StructField("status", StringType),
        StructField("ts", TimestampType)))
      val doubles = Array(Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity,
        0.0, -0.0, 1.0, 45.0, 44.9999999, 45.0000001, 1e300, -1e300)
      val rows = (0 until 2000).map { _ =>
        def maybeNull[A >: Null](v: A): A = if (rnd.nextInt(10) == 0) null else v
        Row(
          maybeNull(Long.box(rnd.nextLong())),
          maybeNull(Double.box(
            if (rnd.nextInt(4) == 0) doubles(rnd.nextInt(doubles.length))
            else rnd.nextDouble() * 60)),
          maybeNull(strPool(rnd.nextInt(strPool.length))),
          maybeNull(strPool(rnd.nextInt(strPool.length))),
          maybeNull(new java.sql.Timestamp(rnd.nextLong() % 4102444800000L)))
      }
      val dir = s"${tmpDir()}/rand$seed"
      spark.createDataFrame(spark.sparkContext.parallelize(rows, 4), schema)
        .write.parquet(dir)
      val lo = rnd.nextDouble() * 50 - 5
      val hi = if (rnd.nextBoolean()) lo + rnd.nextDouble() * 50 else lo - 1 // inverted bounds too
      val allowed = Seq.fill(rnd.nextInt(3) + 1)(strPool(rnd.nextInt(strPool.length)))
      val pattern = Seq("^O", "n$", "^O$", "O", "^O.*n$", "N")(rnd.nextInt(6))
      val p = ContractPolicy(
        rules = Seq(
          RowRule.Nullability("nn", "id"),
          RowRule.Range("rg", "qty", lo, hi),
          RowRule.Domain("dom", "flag", allowed),
          RowRule.Regex("rx", "status", pattern),
          RowRule.Freshness("fr", "ts",
            math.abs(rnd.nextLong() % (1000L * 86400 * 3650)), 917827200000L)),
        fatalRules = if (rnd.nextBoolean()) Set("dom") else Set.empty)
      // alternate the SIMD and forced-scalar lanes across seeds so the
      // differential pins BOTH fast paths to the row pipeline
      graft.contract.FastLanes.forceOff = seed % 2 == 0
      try assertAgrees(spark.read.parquet(dir), p, expectColumnar = true)
      finally graft.contract.FastLanes.forceOff = false
    }
  }

  test("filtered frame falls back (FilterExec is not a pass-through), counts cover ONLY the filtered rows") {
    val dir = s"${tmpDir()}/filtered"
    edgeDf().write.parquet(dir)
    val filtered = spark.read.parquet(dir).filter("qty > 2.0")
    // row-path fallback with the reason recorded — running kernels at
    // the scan would count rows the filter removed
    val r = ColumnarValidation.counts(filtered, policy)
    assert(!r.columnar, "a filtered plan must not claim the columnar path")
    assert(r.fallbackReason.exists(_.contains("non-passthrough")), s"reason: ${r.fallbackReason}")
    assertAgrees(filtered, policy, expectColumnar = false)
    assert(r.counts.totalRows == filtered.count(),
      s"counts must cover the FILTERED rows: ${r.counts.totalRows} != ${filtered.count()}")
    assert(r.counts.totalRows < spark.read.parquet(dir).count())
  }

  test("short/byte columns use width-exact kernels (columnar, no NPE on plain pages)") {
    val schema = StructType(Seq(
      StructField("s", ShortType), StructField("b", ByteType)))
    val rows = Seq(
      Row(Short.box(1), Byte.box(1)), Row(Short.box(45), Byte.box(45)),
      Row(Short.box(0), Byte.box(0)), Row(Short.box(46), Byte.box(46)),
      Row(Short.box(Short.MinValue), Byte.box(Byte.MinValue)),
      Row(Short.box(Short.MaxValue), Byte.box(Byte.MaxValue)),
      Row(null, null), Row(Short.box(22), null))
    val p = ContractPolicy(Seq(
      RowRule.Range("rg_s", "s", 1, 45),
      RowRule.Range("rg_b", "b", 1, 45)))
    // both page encodings: plain (dictionary off — the lane that NPE'd
    // under the int kernel) and dictionary-enabled
    Seq("plain" -> "false", "dict" -> "true").foreach { case (tag, dict) =>
      val dir = s"${tmpDir()}/narrow_$tag"
      spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
        .write.option("parquet.enable.dictionary", dict).parquet(dir)
      assertAgrees(spark.read.parquet(dir), p, expectColumnar = true)
    }
  }

  test("decimal range kernel: int32/int64/binary-backed decimals agree with the " +
      "row pipeline across encodings, nulls included") {
    // parquet physical layout varies by precision: (5,2) packs into
    // INT32, (12,2) into INT64, (25,2) into FLBA — one kernel must
    // read all three through getDecimal, under both page encodings
    for ((p, s) <- Seq((5, 2), (12, 2), (25, 2)); dict <- Seq("false", "true")) {
      val dir = s"${tmpDir()}/dec_${p}_$dict"
      val rows = Seq[Any](null, "0.00", "1.00", "45.00", "45.01", "-1.00", "999.99", "44.999")
        .map {
          case null => Row(null)
          case v: String => Row(new java.math.BigDecimal(v).setScale(s, java.math.RoundingMode.HALF_UP))
        }
      val schema = StructType(Seq(StructField("d", DecimalType(p, s))))
      spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
        .write.option("parquet.enable.dictionary", dict).parquet(dir)
      val policy = ContractPolicy(Seq(RowRule.Range("rg_d", "d", 1, 45)))
      assertAgrees(spark.read.parquet(dir), policy, expectColumnar = true)
    }
  }

  test("SIMD lanes: vector api loads in this JVM; forced-scalar lanes agree bit-for-bit") {
    import graft.contract.FastLanes
    // the sbt forks add --add-modules jdk.incubator.vector — if this
    // trips, the SIMD rung silently degraded to scalar everywhere
    assert(FastLanes.simdStatus.isRight,
      s"vector api should load under the sbt fork: ${FastLanes.simdStatus}")
    assert(FastLanes.reflective, "OnHeapColumnVector backing-array reflection broke")
    val dir = s"${tmpDir()}/simd"
    edgeDf().write.parquet(dir)
    val df = spark.read.parquet(dir)
    val withSimd = ColumnarValidation.counts(df, policy)
    assert(withSimd.columnar)
    FastLanes.forceOff = true
    try {
      val scalar = ColumnarValidation.counts(df, policy)
      assert(scalar.columnar)
      assert(withSimd.counts.rulePass.toSeq == scalar.counts.rulePass.toSeq)
      assert(withSimd.counts.ruleViolation.toSeq == scalar.counts.ruleViolation.toSeq)
      assert(withSimd.counts.rowsByRank.toSeq == scalar.counts.rowsByRank.toSeq)
      assertAgrees(df, policy, expectColumnar = true) // scalar lanes vs row truth
    } finally FastLanes.forceOff = false
    assertAgrees(df, policy, expectColumnar = true)   // SIMD lanes vs row truth
  }

  test("SIMD int/long range: exact integer bounds and the long→double lanewise round") {
    val schema = StructType(Seq(StructField("i", IntegerType), StructField("l", LongType)))
    val rows = Seq(
      Row(Int.box(Int.MinValue), Long.box(Long.MinValue)),
      Row(Int.box(Int.MaxValue), Long.box(Long.MaxValue)),
      Row(Int.box(0), Long.box(0L)), Row(Int.box(-1), Long.box(-1L)),
      Row(Int.box(1), Long.box(1L)), Row(Int.box(45), Long.box(45L)),
      Row(Int.box(46), Long.box(46L)),
      // 2^53 ± 1: (double) x rounds — the SIMD L2D lane and the row
      // pipeline's implicit promotion must agree here
      Row(Int.box(44), Long.box(9007199254740993L)),
      Row(Int.box(2), Long.box(9007199254740992L)),
      Row(null, null))
    val dir = s"${tmpDir()}/simd_il"
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
      .write.option("parquet.enable.dictionary", "false").parquet(dir)
    val bounds = Seq(
      (0.5, 45.5),                  // fractional bounds → exact int ceil/floor
      (45.0, 44.0),                 // inverted → everything fails
      (-1e300, 1e300),              // clamps to full int range
      (9.007199254740992e15, 9.007199254740994e15), // the 2^53 window
      (2147483646.5, 2.5e18))       // lo above Int.MaxValue-0.5, hi beyond long-exact
    bounds.foreach { case (lo, hi) =>
      val p = ContractPolicy(Seq(
        RowRule.Range("rg_i", "i", lo, hi), RowRule.Range("rg_l", "l", lo, hi)))
      assertAgrees(spark.read.parquet(dir), p, expectColumnar = true)
    }
  }

  test("countsDf is partition-invariant and matches across repartitioning") {
    val dir = s"${tmpDir()}/pi"
    edgeDf().write.parquet(dir)
    val a = ColumnarValidation.countsDf(spark.read.parquet(dir), policy).head()
    val b = ColumnarValidation.countsDf(
      spark.read.parquet(dir).repartition(7), policy).head()
    assert(a == b)
  }

  // ---- footer-stats rule proofs (r13): uniform-outcome rules skip decode

  private def proofDf() = {
    val schema = StructType(Seq(
      StructField("nn", LongType),       // no nulls → NotNull provable
      StructField("some_null", LongType),// mixed → not provable
      StructField("in_rng", DoubleType), // 5..10, no nulls → Range(0,20) provable
      StructField("out_rng", DoubleType))) // mixed vs Range
    val rows = (1 to 200).map { i =>
      Row(i.toLong, if (i % 7 == 0) null else i.toLong,
        5.0 + (i % 6), if (i % 3 == 0) 99.0 else 1.0)
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 3), schema)
  }

  test("stats-proven rules agree with row truth and prune their columns from the scan") {
    val dir = s"${tmpDir()}/proofs"
    proofDf().write.parquet(dir)
    val df = spark.read.parquet(dir)
    val p = ContractPolicy(Seq(
      RowRule.Nullability("nn_ok", "nn"),          // provable all-pass
      RowRule.Nullability("nn_mixed", "some_null"),// NOT provable
      RowRule.Range("rng_ok", "in_rng", 0, 20),    // provable all-pass
      RowRule.Range("rng_mixed", "out_rng", 0, 20)))
    assertAgrees(df, p, expectColumnar = true)
    // and the verdict-lattice join with a fatal proven rule still holds
    val pf = p.copy(fatalRules = Set("nn_ok", "rng_mixed"))
    assertAgrees(df, pf, expectColumnar = true)
  }

  test("all rules stats-proven: counts come back without decoding any value column") {
    val dir = s"${tmpDir()}/proofs_all"
    proofDf().write.parquet(dir)
    val df = spark.read.parquet(dir)
    val p = ContractPolicy(Seq(
      RowRule.Nullability("nn_ok", "nn"),
      RowRule.Range("rng_ok", "in_rng", 0, 20)))
    // agreement is what matters; the path may be columnar (empty-schema
    // batches) or the recorded row fallback if Spark refuses the shape
    val r = ColumnarValidation.counts(df, p)
    val (perRule, disp) = rowTruth(df, p)
    p.rules.indices.foreach { i =>
      assert((r.counts.rulePass(i), r.counts.ruleViolation(i)) == perRule(i))
    }
    assert(r.counts.rowsByDisposition.filter(_._2 > 0) == disp)
    assert(r.counts.totalRows == 200L)
  }

  test("an all-null column proves NotNull all-FAIL from stats alone") {
    val schema = StructType(Seq(
      StructField("alln", LongType), StructField("live", LongType)))
    val rows = (1 to 50).map(i => Row(null, i.toLong))
    val dir = s"${tmpDir()}/proofs_allnull"
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
      .write.parquet(dir)
    val p = ContractPolicy(Seq(
      RowRule.Nullability("nn_dead", "alln"),
      RowRule.Range("rng", "live", 0, 30)))
    assertAgrees(spark.read.parquet(dir), p, expectColumnar = true)
  }

  test("freshness proofs from timestamp bounds: all-stale all-FAIL, all-fresh all-pass") {
    val asOf = 917827200000L
    val schema = StructType(Seq(
      StructField("stale_ts", TimestampType), StructField("fresh_ts", TimestampType),
      StructField("mixed_ts", TimestampType)))
    val t = (ms: Long) => new java.sql.Timestamp(ms)
    val window = 1000L * 86400 * 365
    val rows = (1 to 60).map { i =>
      Row(t(asOf - window - 1000L * i),          // always below the window
        t(asOf - 1000L * i),                     // always inside
        t(if (i % 2 == 0) asOf - 1000L else asOf - window - 1000L))
    }
    val dir = s"${tmpDir()}/proofs_fresh"
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
      .write.parquet(dir)
    val p = ContractPolicy(Seq(
      RowRule.Freshness("fr_stale", "stale_ts", window, asOf),
      RowRule.Freshness("fr_fresh", "fresh_ts", window, asOf),
      RowRule.Freshness("fr_mixed", "mixed_ts", window, asOf)))
    assertAgrees(spark.read.parquet(dir), p, expectColumnar = true)
  }

  test("stats proofs stay sound when FILES disagree (per-file uniform, cross-file mixed)") {
    // file A: col all-null; file B: col non-null. Neither all-pass nor
    // all-fail holds across the scan, so no proof may fire — and the
    // counts must still be exactly right either way.
    val schema = StructType(Seq(
      StructField("c", LongType), StructField("r", DoubleType)))
    val dir = s"${tmpDir()}/proofs_crossfile"
    val fa = (1 to 30).map(_ => Row(null, 5.0))          // all-null c, in-range r
    val fb = (1 to 20).map(i => Row(i.toLong, 50.0))     // non-null c, out-of-range r
    spark.createDataFrame(spark.sparkContext.parallelize(fa, 1), schema)
      .write.parquet(dir)
    spark.createDataFrame(spark.sparkContext.parallelize(fb, 1), schema)
      .write.mode("append").parquet(dir)
    val p = ContractPolicy(Seq(
      RowRule.Nullability("nn_c", "c"),     // mixed across files: no proof
      RowRule.Range("rng_r", "r", 0, 20)))  // file A passes, file B fails: no proof
    assertAgrees(spark.read.parquet(dir), p, expectColumnar = true)
  }

  test("a filtered frame never uses stats proofs (row-path fallback is the existing rule)") {
    val dir = s"${tmpDir()}/proofs_filtered"
    proofDf().write.parquet(dir)
    val df = spark.read.parquet(dir).filter(col("nn") > 100L)
    val p = ContractPolicy(Seq(RowRule.Nullability("nn_ok", "nn")))
    // FilterExec above the scan → row path (pre-existing law); the
    // proofs can therefore never see filtered plans
    assertAgrees(df, p, expectColumnar = false)
  }
}
