package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StreamingIntervalJoin

class StreamingIntervalJoinSpec extends SparkSpec {

  /** Drive the join over micro-batch epochs of (key, ts_us, id) rows. */
  private def run(leftEpochs: Seq[Seq[(Long, Long, Long)]],
      rightEpochs: Seq[Seq[(Long, Long, Long)]],
      window: String): Seq[(Long, Long, Long)] = {
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val lIn = MemoryStream[(Long, Long, Long)]
    val rIn = MemoryStream[(Long, Long, Long)]
    val l = lIn.toDF().toDF("user_id", "lts_us", "left_id")
      .withColumn("lts", timestamp_micros(col("lts_us"))).drop("lts_us")
    val r = rIn.toDF().toDF("user_id", "rts_us", "right_id")
      .withColumn("rts", timestamp_micros(col("rts_us"))).drop("rts_us")
    val joined = StreamingIntervalJoin.joinWithin(l, r, Seq("user_id"), "lts", "rts", window)
      .select(col("user_id"), col("left_id"), col("right_id"))
    val sink = s"stream_ij_spec_${System.nanoTime()}"
    val ckpt = tmpDir()
    val q = joined.writeStream.format("memory").queryName(sink)
      .outputMode("append").option("checkpointLocation", ckpt).start()
    try {
      (leftEpochs.map(Some(_)).zipAll(rightEpochs.map(Some(_)), None, None)).foreach {
        case (le, re) =>
          le.foreach(lIn.addData(_)); re.foreach(rIn.addData(_)); q.processAllAvailable()
      }
      spark.table(sink).as[(Long, Long, Long)].collect().toSeq.sorted
    } finally {
      q.stop()
      spark.catalog.dropTempView(sink)
      org.apache.spark.sql.execution.streaming.state.StateStore.stop()
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ckpt))
    }
  }

  test("left_outer: unmatched left emits null-padded once the watermark proves absence") {
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val t0 = 1700000000000000L
    val lIn = MemoryStream[(Long, Long, Long)]
    val rIn = MemoryStream[(Long, Long, Long)]
    val l = lIn.toDF().toDF("user_id", "lts_us", "left_id")
      .withColumn("lts", timestamp_micros(col("lts_us"))).drop("lts_us")
    val r = rIn.toDF().toDF("user_id", "rts_us", "right_id")
      .withColumn("rts", timestamp_micros(col("rts_us"))).drop("rts_us")
    val joined = StreamingIntervalJoin.joinWithin(
        l, r, Seq("user_id"), "lts", "rts", "1 hour", joinType = "left_outer")
      .select(col("user_id"), col("left_id"), col("right_id"))
    val sink = s"stream_ij_outer_${System.nanoTime()}"
    val ckpt = tmpDir()
    val q = joined.writeStream.format("memory").queryName(sink)
      .outputMode("append").option("checkpointLocation", ckpt).start()
    try {
      // left 100 matches; left 200 never will
      lIn.addData(Seq((1L, t0, 100L), (2L, t0, 200L)))
      rIn.addData(Seq((1L, t0 + 60000000L, 901L)))
      q.processAllAvailable()
      val early = spark.table(sink).as[(Long, Long, Option[Long])].collect().toSeq
      assert(early === Seq((1L, 100L, Some(901L))),
        "unmatched left must NOT emit before the watermark passes lts+window")
      // advance BOTH watermarks far past t0+window: absence is provable,
      // (2, 200) emits null-padded. Two rounds: the first advances event
      // time, the second runs state cleanup under the new watermark.
      lIn.addData(Seq((9L, t0 + 7200000000L, 1L)))
      rIn.addData(Seq((9L, t0 + 7200000000L, 2L)))
      q.processAllAvailable()
      lIn.addData(Seq((9L, t0 + 10800000000L, 3L)))
      rIn.addData(Seq((9L, t0 + 10800000000L, 4L)))
      q.processAllAvailable()
      val out = spark.table(sink).as[(Long, Long, Option[Long])].collect().toSeq
        .filter(_._1 == 2L)
      assert(out === Seq((2L, 200L, None)))
    } finally {
      q.stop()
      spark.catalog.dropTempView(sink)
      org.apache.spark.sql.execution.streaming.state.StateStore.stop()
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ckpt))
    }
  }

  test("cross-epoch match: right row in a later batch pairs with a buffered left row") {
    val t0 = 1700000000000000L
    val out = run(
      leftEpochs = Seq(Seq((1L, t0, 100L), (2L, t0, 200L)), Seq(), Seq()),
      rightEpochs = Seq(Seq(), Seq((1L, t0 + 1800000000L, 901L)), // 30 min later, same key
        Seq((1L, t0 + 3600000000L, 902L), // exactly window: inclusive bound
          (1L, t0 + 3600000001L, 903L), // 1µs past window: no match
          (2L, t0 + 1000000L, 904L))), // other key
      window = "1 hour")
    assert(out === Seq((1L, 100L, 901L), (1L, 100L, 902L), (2L, 200L, 904L)))
  }

  test("differential vs batch RangeJoin on the events fixture") {
    import spark.implicits._
    val ev = graft.core.Tables.eventsUs(spark, sf())
    val clicks = ev.filter(col("event_type") === "click")
      .select("user_id", "ts_us", "event_id").as[(Long, Long, Long)]
      .collect().toSeq.sortBy(_._2)
    val purch = ev.filter(col("event_type") === "purchase")
      .select("user_id", "ts_us", "event_id").as[(Long, Long, Long)]
      .collect().toSeq.sortBy(_._2)

    val batch = graft.operators.RangeJoin.joinWithin(
        ev.filter(col("event_type") === "click").select("user_id", "ts_us", "event_id"),
        ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts_us").as("p_ts"), col("event_id").as("purchase_id")),
        Seq("user_id"), "ts_us", "p_ts", windowUs = 3600000000L)
      .select(col("user_id"), col("event_id"), col("purchase_id"))
      .as[(Long, Long, Long)].collect().toSeq.sorted

    val streamed = run(
      clicks.grouped((clicks.size + 2) / 3).toSeq,
      purch.grouped((purch.size + 2) / 3).toSeq,
      window = "1 hour")
    assert(streamed === batch)
  }
}
