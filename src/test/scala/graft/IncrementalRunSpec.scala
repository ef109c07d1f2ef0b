package graft

import org.apache.spark.sql.functions._

import graft.contract.{ContractPolicy, RowRule}
import graft.core.{Descriptor, Ledger, Position}
import graft.run.Runner

/** The incremental loop end-to-end: run → committed position → resume
  * from the ledger → next run reads only new data → destination
  * converges to the full table (cdf: the run spine §3.1 + cursor
  * window-close semantics; overlap from the lag window absorbed by the
  * merge disposition exactly as VISION.md:460-464 prescribes). */
class IncrementalRunSpec extends SparkSpec {

  test("two incremental runs with cursor resume converge to the full table") {
    val base = tmpDir()
    val ledger = Ledger.at(base)
    val ev = graft.core.Tables.eventsUs(spark, sf())
      .select("event_id", "ts_us", "user_id", "event_type", "value")
    val mid = ev.agg(expr("percentile_approx(ts_us, 0.5)")).head().getLong(0)

    val cfg = Runner.RunConfig(
      descriptor = Descriptor.ResourceDescriptor(
        id = "ev_inc", schemaSource = Descriptor.SchemaSource.Discover,
        primaryKey = Seq("event_id"),
        // lag creates a deliberate re-read window; merge dedups it
        cursor = Some(Descriptor.CursorSpec("ts_us", lagMs = 60L * 1000_000L,
          Descriptor.OrderingClaim.Inexact)),
        disposition = Descriptor.Disposition.Merge(Seq("event_id"))),
      policy = ContractPolicy(Seq(RowRule.Nullability("nn", "event_id"))),
      orderColumns = Seq("ts_us", "event_id"))

    // run 1: everything up to mid
    val r1 = Runner.run(spark, cfg, ev.filter(col("ts_us") <= mid),
      s"$base/pkg1", s"$base/dest", ledger)
    assert(r1.committed)
    val pos1 = ledger.resumePosition("ev_inc", "root").get.asInstanceOf[Position.Cursor]
    assert(pos1.field == "ts_us")

    // run 2: resume from the committed position (typed, from the ledger)
    // — the lag window re-reads some already-loaded rows on purpose
    val increment = ev.filter(col("ts_us") > pos1.value)
    assert(increment.count() > 0)
    val r2 = Runner.run(spark, cfg, increment, s"$base/pkg2", s"$base/dest", ledger)
    assert(r2.committed && r2.packageHash != r1.packageHash)

    // convergence: destination == full table, no duplicates despite overlap
    val dest = spark.read.parquet(s"$base/dest")
    assert(dest.count() == ev.count())
    assert(dest.select("event_id").distinct().count() == ev.count())
    // the ledger head advanced to run 2's package and position
    assert(ledger.committedHead("ev_inc", "root").map(_.packageHash) == Some(r2.packageHash))
    val pos2 = ledger.resumePosition("ev_inc", "root").get.asInstanceOf[Position.Cursor]
    assert(pos2.value > pos1.value)
  }

  test("drift admitted-as-variant: new columns captured into _cdf_variant, authority schema kept") {
    val base = tmpDir()
    val source = graft.core.Tables(spark, sf(), "region")
      .withColumn("surprise_col", concat(lit("v"), col("r_regionkey")))
    val authority = graft.core.Tables(spark, sf(), "region").schema
    val cfg = Runner.RunConfig(
      descriptor = Descriptor.ResourceDescriptor(
        id = "region_drift", schemaSource = Descriptor.SchemaSource.Discover,
        primaryKey = Seq("r_regionkey"), cursor = None,
        disposition = Descriptor.Disposition.Append),
      policy = ContractPolicy(Nil),
      authority = Some(authority))
    val r = Runner.run(spark, cfg, source, s"$base/pkg", s"$base/dest", Ledger.at(base))
    assert(r.committed)
    val dest = spark.read.parquet(s"$base/dest")
    assert(!dest.columns.contains("surprise_col"))
    assert(dest.columns.contains(graft.contract.NestedActions.VariantColumn))
    import spark.implicits._
    val v = dest.filter(col("r_regionkey") === 0)
      .select(graft.contract.NestedActions.VariantColumn).as[String].head()
    assert(v.contains("\"surprise_col\":\"v0\""))
  }

  test("schema admission: authority mismatch rejects the batch with a typed Data error") {
    val base = tmpDir()
    val source = graft.core.Tables(spark, sf(), "region")
    val wrongAuthority = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("r_regionkey",
        org.apache.spark.sql.types.StringType))) // lossy vs int32
    val cfg = Runner.RunConfig(
      descriptor = Descriptor.ResourceDescriptor(
        id = "region_auth", schemaSource = Descriptor.SchemaSource.Discover,
        primaryKey = Seq("r_regionkey"), cursor = None,
        disposition = Descriptor.Disposition.Append),
      policy = ContractPolicy(Nil),
      authority = Some(wrongAuthority))
    val e = intercept[graft.core.GraftError.Data](
      Runner.run(spark, cfg, source, s"$base/pkg", s"$base/dest", Ledger.at(base)))
    assert(e.getMessage.contains("schema admission rejected"))
    assert(!new java.io.File(s"$base/dest").exists()) // failed clean, no artifacts
  }
}
