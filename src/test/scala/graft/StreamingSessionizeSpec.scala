package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StreamingSessionize

class StreamingSessionizeSpec extends SparkSpec {

  private def runSessions(epochs: Seq[Seq[(Long, Long)]], gap: String): Seq[(Long, Long, Long, Long, Long)] = {
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, Long)]
    val df = input.toDF().toDF("user_id", "ts_us")
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .select("user_id", "ts")
    val sessions = StreamingSessionize.sessions(df, Seq("user_id"), "ts", gap)
    val sink = s"stream_sessionize_spec_${System.nanoTime()}"
    val ckpt = tmpDir()
    val q = sessions.writeStream.format("memory").queryName(sink)
      .outputMode("append").option("checkpointLocation", ckpt).start()
    try {
      val maxTs = epochs.flatten.map(_._2).max
      epochs.foreach { ep => input.addData(ep); q.processAllAvailable() }
      // two sentinel batches: the first advances max(event time); the
      // second runs with the advanced watermark, closing every real session
      input.addData(Seq((-1L, maxTs + 36000000000L))); q.processAllAvailable()
      input.addData(Seq((-1L, maxTs + 72000000000L))); q.processAllAvailable()
      spark.table(sink).filter(col("user_id") =!= -1L)
        .select("user_id", "session_start", "session_end", "n_events", "duration_us")
        .as[(Long, Long, Long, Long, Long)]
        .collect().toSeq.sortBy(r => (r._1, r._2))
    } finally {
      q.stop()
      spark.catalog.dropTempView(sink)
      org.apache.spark.sql.execution.streaming.state.StateStore.stop()
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ckpt))
    }
  }

  test("gap semantics: exact-gap merges, gap+1µs splits (same law as batch Sessionize)") {
    val t0 = 1700000000000000L
    val out = runSessions(
      Seq(Seq((7L, t0), (7L, t0 + 3600000000L)),      // exactly gap after: SAME session
          Seq((7L, t0 + 3600000000L + 3600000001L))), // 1µs over the gap: new session
      gap = "3600 seconds")
    assert(out.map(r => (r._4, r._5)) === Seq((2L, 3600000000L), (1L, 0L)))
    assert(out.map(_._2) === Seq(t0, t0 + 3600000000L + 3600000001L))
  }

  test("cross-epoch session: events split over micro-batches merge into one session") {
    val t0 = 1700000000000000L
    val out = runSessions(
      Seq(Seq((1L, t0), (2L, t0 + 1000000L)),
          Seq((1L, t0 + 1800000000L)),                // 30 min later: same session for user 1
          Seq((1L, t0 + 1800000000L + 5400000000L))), // 90 min later: new session
      gap = "3600 seconds")
    assert(out === Seq(
      (1L, t0, t0 + 1800000000L, 2L, 1800000000L),
      (1L, t0 + 7200000000L, t0 + 7200000000L, 1L, 0L),
      (2L, t0 + 1000000L, t0 + 1000000L, 1L, 0L)))
  }

  test("differential vs batch Sessionize on the events fixture") {
    import spark.implicits._
    val ev = graft.core.Tables.eventsUs(spark, sf()).select("user_id", "ts_us", "event_id")
    // identical split law (diff > gap opens) — no offset needed
    val batch = graft.operators.Sessionize.summarize(
        ev, Seq("user_id"), "ts_us", "event_id", gapUs = 3600000000L)
      .select(col("user_id"), col("session_start"), col("session_end"),
        col("n_events"), col("duration_us"))
      .as[(Long, Long, Long, Long, Long)].collect().toSeq.sortBy(r => (r._1, r._2))

    val rows = ev.select("user_id", "ts_us").as[(Long, Long)]
      .collect().toSeq.sortBy(_._2)
    val epochs = rows.grouped((rows.size + 2) / 3).toSeq
    val streamed = runSessions(epochs, gap = "3600 seconds")
    assert(streamed === batch)
  }
}
