package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.{Ledger, Position}
import graft.sources.MongoChangeStream
import graft.streaming.{CdcLogRunner, Settlement}

/** Extended-JSON v2 change-stream decode conformance (cdf:
  * crates/cdf-source-mongodb/src/resource.rs:340-356). Events are
  * hand-authored per the public MongoDB Extended JSON spec. */
class MongoChangeStreamSpec extends SparkSpec {
  import spark.implicits._

  // canonical-mode events: two single-doc writes, one 2-doc txn, one delete
  private def ev(token: String, op: String, t: Long, i: Long, id: Int,
      doc: String, txn: String = "") =
    s"""{"_id":{"_data":"$token"},"operationType":"$op",
       |"clusterTime":{"$$timestamp":{"t":$t,"i":$i}},
       |"ns":{"db":"shop","coll":"orders"},
       |"documentKey":{"_id":{"$$oid":"6500000000000000000000$id"}}$txn
       |${if (doc.isEmpty) "" else s""","fullDocument":$doc"""}}""".stripMargin.replace("\n", "")

  private val txnIds = ""","txnNumber":{"$numberLong":"7"},"lsid":{"id":{"$binary":{"base64":"c2Vzc2lvbjE=","subType":"04"}}}"""

  private val events = Seq(
    ev("8100A1", "insert", 1700000001L, 1, 10,
      """{"qty":{"$numberLong":"5"},"price":{"$numberDecimal":"19.99"},"name":"ball",
        |"when":{"$date":{"$numberLong":"1700000001000"}}}""".stripMargin.replace("\n", "")),
    ev("8100A2", "update", 1700000002L, 1, 10,
      """{"qty":{"$numberLong":"6"},"price":{"$numberDecimal":"19.99"},"name":"ball",
        |"when":{"$date":"2023-11-14T22:13:22Z"}}""".stripMargin.replace("\n", "")),
    // multi-document transaction: same clusterTime, two docs
    ev("8100B1", "insert", 1700000003L, 2, 11,
      """{"qty":{"$numberInt":"1"},"price":{"$numberDecimal":"5.50"},"name":"cap","when":{"$date":{"$numberLong":"1700000003000"}}}""", txnIds),
    ev("8100B2", "insert", 1700000003L, 2, 12,
      """{"qty":2,"price":3.25,"name":"pin","when":{"$date":{"$numberLong":"1700000003000"}}}""", txnIds),
    ev("8100C1", "delete", 1700000004L, 1, 11, ""))

  private def decoded = MongoChangeStream.decodeEnvelope(events.toDF("j"), "j")

  test("envelope + extended-json scalars decode to typed values (canonical AND relaxed)") {
    val docs = MongoChangeStream.decodeDocument(decoded, Seq(
      "qty" -> LongType, "price" -> DecimalType(10, 2), "name" -> StringType,
      "when" -> TimestampType))
    val byTok = docs.collect().map(r => r.getAs[String]("resume_token") -> r).toMap

    assert(byTok("8100A1").getAs[Long]("qty") == 5L)
    assert(byTok("8100A1").getAs[java.math.BigDecimal]("price").doubleValue() == 19.99)
    assert(byTok("8100A1").getAs[String]("doc_key") == "650000000000000000000010")
    assert(byTok("8100A1").getAs[String]("db") == "shop")
    // relaxed-mode numerics decode identically
    assert(byTok("8100B2").getAs[Long]("qty") == 2L)
    assert(byTok("8100B2").getAs[java.math.BigDecimal]("price").doubleValue() == 3.25)
    // $date in both forms → same instant domain
    assert(byTok("8100A1").getAs[java.sql.Timestamp]("when").getTime == 1700000001000L)
    assert(byTok("8100A2").getAs[java.sql.Timestamp]("when").getTime == 1699999999000L + 3000L)
    // txn identifiers surface only on the transactional events
    assert(byTok("8100B1").getAs[Long]("txn_number") == 7L)
    assert(byTok("8100B1").getAs[String]("lsid") == "c2Vzc2lvbjE=")
    assert(byTok("8100A1").isNullAt(byTok("8100A1").fieldIndex("txn_number")))
  }

  test("resume: lexicographic token order, strictly-after filter, ledger round-trip") {
    val tok = MongoChangeStream.maxToken(decoded.filter(col("commit_key") <=
      (lit(1700000002L) * 4294967296L + 1)))
    assert(tok.contains("8100A2"))

    val out = tmpDir()
    val ledger = Ledger.at(out)
    ledger.propose("mongo", "stream", "p1", Some(MongoChangeStream.position(tok.get)))
    ledger.commit("mongo", "stream", "p1", """{"rows":2}""")
    val resumed = ledger.resumePosition("mongo", "stream")
      .flatMap(MongoChangeStream.resumeToken)
    assert(resumed == tok)

    val rest = MongoChangeStream.afterToken(decoded, resumed)
    assert(rest.select("resume_token").as[String].collect().sorted.toSeq
      == Seq("8100B1", "8100B2", "8100C1"))
  }

  test("multi-document transactions never split under settlement packing") {
    val withTx = MongoChangeStream.withTxnId(decoded)
    val txns = CdcLogRunner.txnSummaries(withTx, "tx_id")
    // 4 transactions: two singletons, one 2-op txn, one delete
    assert(txns.map(_.ops) == Seq(1, 1, 2, 1))
    // an op ceiling of 2 may close units but can never split the txn
    val plans = CdcLogRunner.packPlans(txns, Settlement.Policy(2, Long.MaxValue))
    val txOf = withTx.select("tx_id").as[Long].collect().toSet
    plans.foreach { p =>
      val inUnit = txOf.filter(t => t >= p.fromTx && t <= p.toTx)
      assert(inUnit.nonEmpty)
    }
    assert(plans.map(_.ops).sum == 5)
  }

  test("ordered apply: last op per document key wins; terminal delete removes") {
    val keys = MongoChangeStream.applyOrdered(decoded, Seq("doc_key"))
      .select("doc_key").as[String].collect().toSet
    // doc ...0010 survives (insert→update), ...0011 deleted, ...0012 survives
    assert(keys == Set("650000000000000000000010", "650000000000000000000012"))
  }

  test("micro-batch stream: token offsets, trailing commit group held back, AvailableNow drains, exactly-once restart") {
    import scala.collection.mutable
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.streaming.Trigger
    import graft.sources.dsv2.MongoStreamRegistry

    MongoStreamRegistry.register("orders_stream")
    // two complete singleton commits + a 2-doc txn (B1/B2 share commit
    // clusterTime) — the txn is the TRAILING group for now
    MongoStreamRegistry.append("orders_stream", events.take(4))

    val ckpt = tmpDir()
    val seen = mutable.ArrayBuffer.empty[String]
    def stream() = spark.readStream
      .format("graft.sources.dsv2.MongoStreamSource")
      .option("stream", "orders_stream").load()
    val q1 = stream().writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[Row], _: Long) =>
        // the typed decode composes over the streamed frame
        val toks = MongoChangeStream.decodeEnvelope(b.toDF(), "event")
          .select("resume_token").collect().map(_.getString(0))
        seen.synchronized { seen ++= toks }; ()
      }
      .start()
    q1.processAllAvailable()
    // the trailing commit group (the B txn) is HELD BACK: its
    // completeness is unproven until a later commit appears
    assert(seen.sorted.toSeq == Seq("8100A1", "8100A2"),
      s"trailing commit group must be held back, got $seen")

    // a later commit proves the txn complete; the next batch releases
    // BOTH its events atomically (never a half-transaction) and now
    // holds back the new trailing group
    MongoStreamRegistry.append("orders_stream", Seq(events(4)))
    q1.processAllAvailable()
    q1.stop()
    assert(seen.sorted.toSeq == Seq("8100A1", "8100A2", "8100B1", "8100B2"))

    // restart from the checkpoint with AvailableNow: drains the tail,
    // resumes strictly after the committed token — exactly once
    val seen2 = mutable.ArrayBuffer.empty[String]
    val q2 = stream().writeStream
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (b: org.apache.spark.sql.Dataset[Row], _: Long) =>
        seen2.synchronized { seen2 ++= b.collect().map(_.getString(0)) }; ()
      }
      .start()
    q2.awaitTermination()
    assert(seen2.sorted.toSeq == Seq("8100C1"),
      s"restart must resume after the checkpointed token, got $seen2")
  }

  test("liveness: events without clusterTime get unique commit keys — the frontier never fuses them into a phantom group") {
    import scala.collection.mutable
    import org.apache.spark.sql.Row
    import graft.sources.dsv2.MongoStreamRegistry

    def bare(token: String, id: Int) = // no clusterTime at all
      s"""{"_id":{"_data":"$token"},"operationType":"insert",
         |"ns":{"db":"shop","coll":"orders"},
         |"documentKey":{"_id":{"$$oid":"6500000000000000000000$id"}}}""".stripMargin.replace("\n", "")

    MongoStreamRegistry.register("bare_stream")
    // e2 and e4 both lack clusterTime; e4 is the newest. A shared
    // sentinel key would truncate the frontier to BEFORE e2 (takeWhile
    // stops at the first key equal to the last's), stalling the stream
    // two events behind. Unique keys hold back ONLY e4.
    MongoStreamRegistry.append("bare_stream", Seq(
      ev("9200A1", "insert", 1800000001L, 1, 20, """{"qty":{"$numberLong":"1"}}"""),
      bare("9200A2", 21),
      ev("9200A3", "insert", 1800000003L, 1, 22, """{"qty":{"$numberLong":"2"}}"""),
      bare("9200A4", 23)))

    val seen = mutable.ArrayBuffer.empty[String]
    val q = spark.readStream
      .format("graft.sources.dsv2.MongoStreamSource")
      .option("stream", "bare_stream").load()
      .writeStream
      .option("checkpointLocation", tmpDir())
      .foreachBatch { (b: org.apache.spark.sql.Dataset[Row], _: Long) =>
        seen.synchronized { seen ++= b.collect().map(_.getString(0)) }; ()
      }
      .start()
    q.processAllAvailable()
    q.stop()
    assert(seen.sorted.toSeq == Seq("9200A1", "9200A2", "9200A3"),
      s"frontier must advance past bare events, holding back only the trailing one, got $seen")
  }
}
