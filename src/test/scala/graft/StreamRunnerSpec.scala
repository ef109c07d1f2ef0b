package graft

import java.nio.file.{Files, Paths}
import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.core.Ledger
import graft.streaming.StreamRunner

/** Real Structured Streaming drain over a file source with
  * Trigger.AvailableNow — run-until-quiescent, then stop. */
class StreamRunnerSpec extends SparkSpec {

  test("AvailableNow drain: file-source epochs settle through ledger with monotone frontier") {
    val srcDir = tmpDir()
    val outDir = tmpDir()
    val ledger = Ledger.at(outDir)

    // stage the events table as the streaming source (one file = one batch
    // under maxFilesPerTrigger)
    val events = graft.core.Tables.eventsTs(spark, sf())
      .select("event_id", "ts", "user_id", "value")
    events.filter(col("event_id") % 2 === 0).coalesce(1)
      .write.parquet(s"$srcDir/f0")
    events.filter(col("event_id") % 2 === 1).coalesce(1)
      .write.parquet(s"$srcDir/f1")
    // flatten: move part files into one dir for the stream reader
    val flat = tmpDir()
    for (sub <- Seq("f0", "f1")) {
      val dir = Paths.get(srcDir, sub)
      val part = Files.list(dir).filter(_.toString.endsWith(".parquet")).findFirst().get()
      Files.move(part, Paths.get(flat, s"$sub.parquet"))
    }

    val stream = spark.readStream.schema(events.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(flat)

    val res = StreamRunner.drainAvailableNow(
      stream, "ts", graceMs = 10L * 24 * 3600 * 1000, lagMs = 1000,
      watermarkFor = b => {
        val r = b.agg(max(col("ts"))).head()
        if (r.isNullAt(0)) None
        else Some(new Timestamp(r.getTimestamp(0).getTime - 20L * 24 * 3600 * 1000))
      },
      outDir = outDir, ledger = ledger, resource = "ev_stream")

    assert(res.epochs.nonEmpty) // drained to quiescence, then stopped
    val totalRouted = res.epochs.map(r => r.admitted + r.quarantined).sum +
      res.epochs.last.recaptured
    assert(totalRouted >= events.count()) // recaptured rows may be counted twice across epochs
    assert(res.frontierUs.isDefined)
    // frontier monotone across epochs
    val frontiers = res.epochs.flatMap(_.frontierUs)
    assert(frontiers == frontiers.sorted)
    // every epoch settled: committed head exists per epoch scope
    res.epochs.foreach { e =>
      assert(ledger.committedHead("ev_stream", s"stream:ev_stream/epoch:${e.epoch}").isDefined)
    }
  }

  test("native session windows over a stream match the batch sessionizer's session count") {
    // streaming counterpart of q_sessionize: Spark's session_window with
    // the same 1h gap must produce the same number of (user, session)
    // groups as the batch lag/cumsum formulation
    val events = graft.core.Tables.eventsTs(spark, sf())
      .select("event_id", "ts", "user_id")
    val srcDir = s"${tmpDir()}/events"
    events.coalesce(1).write.parquet(srcDir)

    val stream = spark.readStream.schema(events.schema).parquet(srcDir)
    val agg = stream
      .groupBy(session_window(col("ts"), "1 hour"), col("user_id"))
      .count()
    val q = agg.writeStream.format("memory").queryName("sessions_out")
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val streamingSessions = spark.sql("SELECT COUNT(*) FROM sessions_out").head().getLong(0)
    val batchSessions = graft.operators.Sessionize.summarize(
      events.withColumn("ts_us", expr("unix_micros(ts)")).select("user_id", "ts_us", "event_id"),
      Seq("user_id"), "ts_us", "event_id", gapUs = 3600000000L).count()
    assert(streamingSessions == batchSessions)
  }
}
