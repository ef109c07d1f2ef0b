package graft

import graft.contract._

/** Verdict-lattice totality + validation split semantics
  * (cdf: lattice.rs `assert_verdict_lattice_total` — every cell gets
  * exactly one disposition, for every policy; here the lattice is
  * checked exhaustively, which subsumes the reference's sampled
  * property test). */
class ContractSpec extends SparkSpec {
  import spark.implicits._

  test("verdict lattice: every verdict has exactly one disposition; join is monotone") {
    Verdict.all.foreach { v =>
      val d = Disposition.ofVerdict(v) // total: must not throw
      assert(d != null)
    }
    for (a <- Verdict.all; b <- Verdict.all) { // exhaustive over the lattice
      val j = Verdict.join(a, b)
      assert(j.rank == math.max(a.rank, b.rank))
      assert(Verdict.join(a, b) == Verdict.join(b, a))
    }
  }

  test("every row gets exactly one disposition under arbitrary rules (incl. nulls)") {
    val df = Seq(
      (Some(1L), Some(10.0), Some("A")),
      (Some(2L), Some(99.0), Some("X")),
      (None, Some(5.0), Some("N")),
      (Some(4L), None, None)
    ).toDF("id", "qty", "flag")
    val policy = ContractPolicy(Seq(
      RowRule.Nullability("nn_id", "id"),
      RowRule.Range("range_qty", "qty", 1, 50),
      RowRule.Domain("dom_flag", "flag", Seq("A", "N"))),
      fatalRules = Set("nn_id"))
    val program = ValidationProgram.compile(policy)
    val annotated = program.annotate(df)
    // totality: disposition column never null, exactly one per row
    assert(annotated.filter(org.apache.spark.sql.functions.col(
      ValidationProgram.DispositionCol).isNull).count() == 0)
    val byDisp = annotated.groupBy(ValidationProgram.DispositionCol).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // row1 accept; row2 quarantine (range+domain viol); row3 fatal (null id
    // escalated) → reject_batch; row4 quarantine (null qty/flag = not-pass)
    assert(byDisp == Map("accept" -> 1L, "quarantine" -> 2L, "reject_batch" -> 1L))
    assert(program.accepted(df).count() == 1)
    assert(program.accepted(df).columns.toSeq == df.columns.toSeq) // schema preserved
  }

  test("custom boolean row rules evaluate arbitrary predicates") {
    val df = Seq((1L, 10.0, 5.0), (2L, 3.0, 9.0)).toDF("id", "a", "b")
    val policy = ContractPolicy(Seq(
      RowRule.Custom("a_gt_b", "a", "a > b")))
    val program = ValidationProgram.compile(policy)
    assert(program.accepted(df).select("id").as[Long].collect().toSeq == Seq(1L))
  }

  test("scan negotiation: residuals, limit gating, order-by pushdown") {
    import graft.core.Descriptor._
    def fid(p: String): Fidelity =
      if (p.contains("inexact")) Fidelity.Inexact
      else if (p.contains("exact")) Fidelity.Exact
      else Fidelity.Unsupported
    val req = ScanRequest(Seq("a", "b"), Seq("a_exact > 1", "b_inexact < 2", "c_other = 3"),
      limit = Some(10), resumeFrom = None, orderBy = Some(OrderBy("a", ascending = true)))
    val plan = negotiate("r", req, fid, partitions = 4, sourceOrders = true)
    assert(plan.predicates.map(_.sql) == Seq("a_exact > 1", "b_inexact < 2")) // unsupported not pushed
    assert(plan.residualPredicates == Seq("b_inexact < 2", "c_other = 3")) // re-checked engine-side
    assert(plan.limitPushed.isEmpty) // inexact present → limit stays engine-side
    assert(plan.orderByPushed == Some(OrderBy("a", ascending = true)))
    val exactOnly = negotiate("r", req.copy(predicates = Seq("a_exact > 1")), fid, 4)
    assert(exactOnly.limitPushed == Some(10))
    assert(exactOnly.orderByPushed.isEmpty) // source doesn't claim ordering
  }

  test("epoch cadence triggers: any armed trigger closes the epoch") {
    import graft.streaming.DrainEpoch._
    val s = CadenceState(batches = 3, rows = 5000, bytes = 1 << 20, lastCloseWatermarkUs = 1000)
    assert(shouldClose(Seq(Cadence.Batches(3)), s, 1000))
    assert(!shouldClose(Seq(Cadence.Batches(4)), s, 1000))
    assert(shouldClose(Seq(Cadence.Rows(5000)), s, 1000))
    assert(shouldClose(Seq(Cadence.Bytes(1 << 20)), s, 1000))
    assert(shouldClose(Seq(Cadence.WatermarkAdvance(500)), s, 1600))
    assert(!shouldClose(Seq(Cadence.WatermarkAdvance(700)), s, 1600))
    assert(shouldClose(Seq(Cadence.Batches(99), Cadence.Rows(5000)), s, 1000)) // any-of
  }

  test("quarantine redacts PII columns with sha2, never plaintext") {
    val df = Seq((1L, "alice@example.com"), (2L, "bob@example.com"))
      .toDF("id", "email")
    val policy = ContractPolicy(Seq(RowRule.Regex("re_email", "email", "^x")))
    val q = ValidationProgram.compile(policy).quarantined(df, redactColumns = Set("email"))
    val vals = q.select("email").as[String].collect()
    assert(vals.length == 2)
    assert(vals.forall(v => v.length == 64 && !v.contains("@")))
  }

  test("schema-aware compile: missing-column rules error or skip per policy") {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("a",
        org.apache.spark.sql.types.DoubleType)))
    val policy = ContractPolicy(Seq(
      RowRule.Range("r_a", "a", 0, 1),
      RowRule.Nullability("r_ghost", "ghost")))
    assert(ValidationProgram.compileFor(schema, policy).isLeft) // default: error
    val Right((program, skipped)) =
      ValidationProgram.compileFor(schema, policy, missingColumns = "skip")
    assert(skipped == Seq("r_ghost"))
    assert(program.ruleCols.map(_._1.id) == Seq("r_a"))
  }

  test("field metadata (cdf:semantic etc.) survives the package write/read boundary") {
    import org.apache.spark.sql.types._
    val meta = new MetadataBuilder()
      .putString("cdf:semantic", "cdf.pii@1(class=\"email\")")
      .putString("cdf:source_name", "Email_Address")
      .putString("cdf:null_origin", "declared").build()
    val df = spark.createDataFrame(
      java.util.List.of(org.apache.spark.sql.Row(1L, "a@b.c")),
      StructType(Seq(StructField("id", LongType),
        StructField("email", StringType, nullable = true, meta))))
    val dir = tmpDir()
    graft.pkg.PackageWriter.write(df, None, dir, "meta_r", "p")
    val back = spark.read.parquet(s"$dir/data")
    val got = back.schema("email").metadata
    assert(got.getString("cdf:semantic").contains("cdf.pii@1"))
    assert(got.getString("cdf:source_name") == "Email_Address")
    assert(got.getString("cdf:null_origin") == "declared")
  }

  test("compiled-plan artifact: content-addressed, reproducible") {
    graft.core.Tables.registerAll(spark, sf())
    val text =
      """RESOURCE
        |TARGET t.orders
        |DISPOSITION APPEND
        |EXECUTION BOUNDED
        |AS SELECT o_orderkey FROM orders WHERE o_totalprice > 10""".stripMargin
    val c = graft.run.ResourceSql.compile(spark, text).toOption.get
    val dir = tmpDir()
    val (p1, h1) = graft.run.ResourceSql.writeCompiled(c, dir)
    val (p2, h2) = graft.run.ResourceSql.writeCompiled(c, dir)
    assert(h1 == h2 && p1 == p2) // reproducible, content-addressed
    assert(java.nio.file.Files.readString(java.nio.file.Paths.get(p1)).contains("\"resource\":\"t.orders\""))
  }

  test("namecase-v1: deterministic normalization + collision is a plan error") {
    assert(Namecase.normalize("CamelCaseCol") == "camel_case_col")
    assert(Namecase.normalize("weird col-name!") == "weird_col_name")
    assert(Namecase.normalize("9lives") == "c_9lives")
    assert(Namecase.normalize("a" * 100).length <= Namecase.MaxLen)
    // same long prefix, different tail → distinct hashed names
    assert(Namecase.normalize("a" * 90 + "x") != Namecase.normalize("a" * 90 + "y"))
    val df = Seq((1, 2)).toDF("My Col", "my_col")
    intercept[IllegalArgumentException](Namecase.normalizeColumns(df))
  }
}
