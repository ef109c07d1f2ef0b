package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.core.Ledger
import graft.streaming.DrainEpoch

class StreamingSpec extends SparkSpec {

  test("drain epochs: 3-way split, carryover re-enters, frontier monotone, ledger-gated") {
    val out = tmpDir()
    val ledger = Ledger.at(out)
    val events = graft.core.Tables.eventsTs(spark, sf())
      .select("event_id", "ts", "user_id", "event_type", "value")

    // simulate out-of-order delivery: epoch 1 gets the NEWER half,
    // epoch 2 delivers the older half late
    val pivot = Timestamp.valueOf("2024-01-15 00:00:00")
    val newer = events.filter(col("ts") >= lit(pivot))
    val older = events.filter(col("ts") < lit(pivot))

    val wm1 = Timestamp.valueOf("2024-01-10 00:00:00")
    val wm2 = Timestamp.valueOf("2024-01-20 00:00:00")
    val grace = 6L * 24 * 3600 * 1000 // 6 days

    val results = DrainEpoch.drain(spark,
      DrainEpoch.Config("ev", "ts", graceMs = grace, lagMs = 1000, maxEpochs = 2),
      Seq(newer, older), Seq(wm1, wm2), out, ledger)

    // 2 configured epochs + the end-of-drain carryover flush package
    assert(results.length == 3)
    val e1 = results(0); val e2 = results(1); val flush = results(2)
    // epoch1: everything newer than wm1 admits
    assert(e1.admitted == newer.count())
    assert(e1.recaptured == 0 && e1.quarantined == 0)
    // epoch2: old rows split around wm2-grace (2024-01-14): recapture vs quarantine
    val recaptureLo = Timestamp.valueOf("2024-01-14 00:00:00")
    assert(e2.admitted == 0) // no carryover entered epoch2 (e1 recaptured nothing)
    assert(e2.recaptured == older.filter(col("ts") >= lit(recaptureLo)).count())
    assert(e2.quarantined == older.filter(col("ts") < lit(recaptureLo)).count())
    // within-grace late data is DELIVERED at drain end, never dropped
    // (cdf orchestration.rs:3845-3978 carryover → next package as admitted)
    assert(flush.admitted == e2.recaptured)
    assert(flush.recaptured == 0 && flush.quarantined == 0)
    // frontier: monotone, only advanced by admitted data
    assert(e1.frontierUs.isDefined)
    assert(e2.frontierUs == e1.frontierUs) // epoch2 admitted nothing
    assert(flush.frontierUs == e2.frontierUs) // flush rows are below the frontier
    // each epoch (and the flush) settled through the ledger
    assert(ledger.committedHead("ev", "stream:ev/epoch:0").isDefined)
    assert(ledger.committedHead("ev", "stream:ev/epoch:1").isDefined)
    assert(ledger.committedHead("ev", "stream:ev/epoch:2").isDefined)
    // conservation: every input row landed in exactly one delivered bucket
    val total = results.map(r => r.admitted + r.quarantined).sum
    assert(total == events.count())
  }

  test("drain: carryover is admitted into the NEXT epoch's package, not re-classified") {
    import spark.implicits._
    val out = tmpDir()
    val ledger = Ledger.at(out)
    def df(ts: String*) = ts.map(Timestamp.valueOf).toDF("ts")

    // epoch1 wm=10:00 grace=1h: the 09:30 row recaptures.
    // epoch2 wm=12:00: under re-classification 09:30 would quarantine
    // (12:00 − 1h = 11:00 > 09:30); correct behavior admits it.
    val b1 = df("2024-01-01 10:30:00", "2024-01-01 09:30:00")
    val b2 = df("2024-01-01 12:30:00")
    val results = DrainEpoch.drain(spark,
      DrainEpoch.Config("ev2", "ts", graceMs = 3600 * 1000L, lagMs = 0, maxEpochs = 2),
      Seq(b1, b2),
      Seq(Timestamp.valueOf("2024-01-01 10:00:00"), Timestamp.valueOf("2024-01-01 12:00:00")),
      out, ledger)

    assert(results.length == 2) // no end-of-drain carryover → no flush package
    assert(results(0).admitted == 1 && results(0).recaptured == 1)
    assert(results(1).admitted == 2) // new 12:30 row + carried-over 09:30 row
    assert(results(1).recaptured == 0 && results(1).quarantined == 0)
    // the carried-over row physically landed in epoch1's package dir
    val ep1 = spark.read.parquet(s"$out/epoch_1/data")
    assert(ep1.filter(col("ts") === lit(Timestamp.valueOf("2024-01-01 09:30:00"))).count() == 1)
  }
}
