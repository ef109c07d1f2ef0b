package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.StatefulDedup
import graft.streaming.StatefulDedup.Keyed

class StatefulDedupSpec extends SparkSpec {

  test("cross-batch keyed dedup: duplicates and stale replays dropped across epochs") {
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._

    val input = MemoryStream[Keyed]
    val out = StatefulDedup(input.toDS())
    val query = out.writeStream
      .format("memory").queryName("dedup_out")
      .outputMode(OutputMode.Update())
      .start()

    // epoch 1: k1 twice (positions 1,2), k2 once
    input.addData(Keyed("k1", 1, "a"), Keyed("k1", 2, "b"), Keyed("k2", 5, "x"))
    query.processAllAvailable()
    // epoch 2: k1 replayed at stale positions + one genuine advance; k3 new
    input.addData(Keyed("k1", 2, "b"), Keyed("k1", 1, "a"),
      Keyed("k1", 7, "c"), Keyed("k3", 1, "z"))
    query.processAllAvailable()
    // epoch 3: pure replay — nothing may emit
    input.addData(Keyed("k1", 7, "c"), Keyed("k2", 5, "x"))
    query.processAllAvailable()
    query.stop()

    val rows = spark.sql("SELECT key, position, payload FROM dedup_out")
      .as[(String, Long, String)].collect().toSeq
    // epoch1 emits k1@2, k2@5; epoch2 emits only k1@7 and k3@1; epoch3 emits nothing
    assert(rows.sorted == Seq(
      ("k1", 2L, "b"), ("k1", 7L, "c"), ("k2", 5L, "x"), ("k3", 1L, "z")))
  }

  test("stateful dedup runs on the RocksDB state store (the at-scale provider)") {
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[Keyed]
      val query = StatefulDedup(input.toDS()).writeStream
        .format("memory").queryName("dedup_rocks")
        .outputMode(OutputMode.Update())
        .start()
      input.addData(Keyed("a", 1, "x"), Keyed("a", 2, "y"))
      query.processAllAvailable()
      input.addData(Keyed("a", 2, "y"), Keyed("b", 1, "z")) // replay + new key
      query.processAllAvailable()
      query.stop()
      val rows = spark.sql("SELECT key, position FROM dedup_rocks")
        .as[(String, Long)].collect().toSeq.sorted
      assert(rows == Seq(("a", 2L), ("b", 1L)))
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }
}
