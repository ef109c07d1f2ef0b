package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.core.Ledger
import graft.streaming.DrainEpoch

class StreamingSpec extends SparkSpec {

  test("drain epochs: 3-way split, carryover re-enters, frontier monotone, ledger-gated") {
    val out = tmpDir()
    val ledger = Ledger.at(out)
    val events = graft.core.Tables(spark, sf(), "events")
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
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

    assert(results.length == 2)
    val e1 = results(0); val e2 = results(1)
    // epoch1: everything newer than wm1 admits
    assert(e1.admitted == newer.count())
    assert(e1.recaptured == 0 && e1.quarantined == 0)
    // epoch2: old rows split around wm2-grace (2024-01-14): recapture vs quarantine
    val recaptureLo = Timestamp.valueOf("2024-01-14 00:00:00")
    assert(e2.admitted == 0)
    assert(e2.recaptured == older.filter(col("ts") >= lit(recaptureLo)).count())
    assert(e2.quarantined == older.filter(col("ts") < lit(recaptureLo)).count())
    // frontier: monotone, only advanced by admitted data
    assert(e1.frontierUs.isDefined)
    assert(e2.frontierUs == e1.frontierUs) // epoch2 admitted nothing
    // each epoch settled through the ledger
    assert(ledger.committedHead("ev", "stream:ev/epoch:0").isDefined)
    assert(ledger.committedHead("ev", "stream:ev/epoch:1").isDefined)
    // conservation: every input row landed in exactly one bucket
    val total = results.map(r => r.admitted + r.quarantined).sum + e2.recaptured
    assert(total == events.count())
  }
}
