package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.dsv2.PagedRegistry

/** Conformance for the negotiated-pushdown DSv2 source — the resource
  * suite shape (cdf: conformance "capability truth-telling": every
  * claimed pushdown exercised vs engine-side ground truth; Inexact
  * sources must return supersets that the engine re-check trims). */
class Dsv2Spec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("qty", DoubleType),
    StructField("tag", StringType)))

  private def rows(n: Int): Seq[Row] =
    (1 to n).map(i => Row(i.toLong, (i % 50).toDouble, s"t${i % 5}"))

  private def register(name: String, exact: Set[String], inexact: Set[String]): Unit =
    PagedRegistry.register(name, PagedRegistry.Entry(
      schema, rows(300).grouped(75).toSeq, PagedRegistry.Fid(exact, inexact)))

  private def read(name: String) =
    spark.read.format("graft.sources.dsv2.PagedSource").option("table", name).load()

  test("exact pushdown: source filters faithfully, results match ground truth") {
    register("t_exact", exact = Set("qty", "id"), inexact = Set.empty)
    val got = read("t_exact").filter(col("qty") > 40).select("id").as[Long].collect().sorted
    val truth = rows(300).filter(r => r.getDouble(1) > 40).map(_.getLong(0)).sorted
    assert(got.toSeq == truth)
  }

  test("inexact pushdown: source returns superset; engine residual re-check trims it") {
    register("t_inexact", exact = Set.empty, inexact = Set("qty"))
    val df = read("t_inexact").filter(col("qty") > 40)
    val got = df.select("id").as[Long].collect().sorted
    val truth = rows(300).filter(r => r.getDouble(1) > 40).map(_.getLong(0)).sorted
    assert(got.toSeq == truth) // identical despite the leaky source
    // the plan records the pushed (inexact) filter at the scan
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PagedScan"))
  }

  test("unsupported columns stay engine-side and still filter correctly") {
    register("t_unsup", exact = Set("id"), inexact = Set.empty) // tag unclassified
    val got = read("t_unsup").filter(col("tag") === "t3" && col("id") <= 100)
      .select("id").as[Long].collect().sorted
    val truth = rows(300).filter(r => r.getString(2) == "t3" && r.getLong(0) <= 100)
      .map(_.getLong(0)).sorted
    assert(got.toSeq == truth)
  }

  test("partition-union completeness: 4 input partitions, no loss, no overlap") {
    register("t_parts", exact = Set.empty, inexact = Set.empty)
    val df = read("t_parts")
    assert(df.rdd.getNumPartitions == 4)
    assert(df.count() == 300)
    assert(df.select("id").distinct().count() == 300)
  }

  test("projection pruning reaches the reader") {
    register("t_proj", exact = Set.empty, inexact = Set.empty)
    val df = read("t_proj").select("tag")
    assert(df.schema.fieldNames.toSeq == Seq("tag"))
    assert(df.distinct().count() == 5)
  }

  test("capability truth-telling under adversarial values: NaN, -0.0, infinities") {
    // cdf conformance: an Exact claim is falsified with adversarial
    // float edges by comparing source-filtered results against
    // engine-side ground truth (VISION §20.1 / FIXTURES §6)
    val adv = Seq(
      Row(1L, Double.NaN, "t0"), Row(2L, -0.0, "t0"), Row(3L, 0.0, "t0"),
      Row(4L, Double.PositiveInfinity, "t0"), Row(5L, Double.NegativeInfinity, "t0"),
      Row(6L, 1.5, "t0"), Row(7L, null, "t0"))
    PagedRegistry.register("t_adv", PagedRegistry.Entry(
      schema, Seq(adv), PagedRegistry.Fid(exact = Set("qty"), inexact = Set.empty)))
    val pushed = read("t_adv")
    // unclassified twin: same rows, nothing pushed → Spark is ground truth
    PagedRegistry.register("t_adv_truth", PagedRegistry.Entry(
      schema, Seq(adv), PagedRegistry.Fid(exact = Set.empty, inexact = Set.empty)))
    val truth = read("t_adv_truth")
    for (pred <- Seq(
        col("qty") > 0.0, col("qty") >= 0.0, col("qty") < 0.0,
        col("qty") === 0.0, col("qty") === Double.NaN, col("qty") <= 1.5)) {
      val a = pushed.filter(pred).select("id").as[Long].collect().sorted.toSeq
      val b = truth.filter(pred).select("id").as[Long].collect().sorted.toSeq
      assert(a == b, s"Exact claim falsified for $pred: pushed=$a truth=$b")
    }
  }

  test("micro-batch streaming: typed offsets, appended rows picked up, exactly-once restart") {
    register("t_stream", exact = Set.empty, inexact = Set.empty)
    val ckpt = java.nio.file.Files.createTempDirectory("paged_ckpt").toString
    val seen = new scala.collection.concurrent.TrieMap[Long, Int]()
    def startQuery() = spark.readStream
      .format("graft.sources.dsv2.PagedSource").option("table", "t_stream").load()
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], _: Long) =>
        batch.select("id").collect().foreach { r =>
          val id = r.getLong(0)
          seen.put(id, seen.getOrElse(id, 0) + 1)
        }
        ()
      }
      .start()

    val q1 = startQuery()
    q1.processAllAvailable()
    assert(seen.size == 300)
    // the log grows; the next trigger reads only the delta
    PagedRegistry.append("t_stream", (301 to 320).map(i =>
      Row(i.toLong, (i % 50).toDouble, s"t${i % 5}")))
    q1.processAllAvailable()
    assert(seen.size == 320)
    // offset is typed + readable, exactly a prefix-length cursor
    assert(q1.lastProgress.sources.head.endOffset.contains("\"rows\":320"))
    q1.stop()

    // restart from the checkpoint: nothing reprocessed (exactly-once),
    // new appends resume from the committed prefix
    PagedRegistry.append("t_stream", Seq(Row(321L, 1.0, "t1")))
    val q2 = startQuery()
    q2.processAllAvailable()
    q2.stop()
    assert(seen.size == 321)
    assert(seen.values.forall(_ == 1), // every row delivered exactly once
      s"duplicates: ${seen.filter(_._2 > 1)}")
  }

  test("ClickHouse DSv2: pushed predicates appear in the dialect SQL; residuals re-check") {
    import graft.sources.dsv2.ClickHouseRegistry
    val all = Seq(
      (1L, 2.5, "apple"), (2L, 5.0, "banana"), (3L, 7.25, "apricot"), (4L, 9.0, "cherry"))
    // fake server: honors exactly the WHERE the dialect SQL carries for
    // qty (a real ClickHouse evaluates Exact predicates faithfully);
    // serves every tag — residual trimming is the ENGINE's job
    val transport: graft.sources.ClickHouse.Transport = { sql =>
      val filtered = if (sql.contains("`qty` > 4.5")) all.filter(_._2 > 4.5) else all
      filtered.map { case (i, q, t) => s"""{"id":$i,"qty":$q,"tag":"$t"}""" }.mkString("\n")
    }
    ClickHouseRegistry.register("ev", ClickHouseRegistry.Entry(
      "events", schema, transport, pushable = Set("id", "qty")))
    val df = spark.read.format("graft.sources.dsv2.ClickHouseSource")
      .option("table", "ev").load()
      .filter(col("qty") > 4.5)            // Exact → pushed into the SQL
      .filter(col("tag").startsWith("a"))  // dialect can't say it → residual
      .select("id", "tag")
    assert(df.collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      == Seq((3L, "apricot"))) // superset trimmed by the residual re-check
    val sqls = ClickHouseRegistry.issuedSql("ev")
    assert(sqls.exists(_.contains("`qty` > 4.5")),
      s"pushed predicate missing from dialect SQL: $sqls")
    assert(sqls.forall(s => !s.toLowerCase.contains("apple") && !s.toLowerCase.contains("like")),
      "residual predicate must never reach the dialect SQL")
    assert(sqls.forall(_.endsWith("FORMAT JSONEachRow")))

    // projection pruning reaches the SELECT list
    ClickHouseRegistry.register("ev2", ClickHouseRegistry.Entry(
      "events", schema, transport, pushable = Set("id", "qty")))
    val one = spark.read.format("graft.sources.dsv2.ClickHouseSource")
      .option("table", "ev2").load().select("tag")
    assert(one.distinct().count() == 4)
    assert(ClickHouseRegistry.issuedSql("ev2").exists(_.startsWith("SELECT `tag` FROM `events`")),
      s"projection not pruned: ${ClickHouseRegistry.issuedSql("ev2")}")

    // LIMIT pushes (all pushed predicates are Exact by construction)
    ClickHouseRegistry.register("ev3", ClickHouseRegistry.Entry(
      "events", schema, transport, pushable = Set("id", "qty")))
    val lim = spark.read.format("graft.sources.dsv2.ClickHouseSource")
      .option("table", "ev3").load().limit(2)
    assert(lim.count() == 2)
    assert(ClickHouseRegistry.issuedSql("ev3").exists(_.contains("LIMIT 2")))
  }

  test("Mongo DSv2: Exact predicates compile into the find command; residuals re-check; Extended JSON decodes") {
    import graft.sources.dsv2.MongoRegistry
    val mongoSchema = StructType(Seq(
      StructField("id", LongType), StructField("score", DoubleType),
      StructField("name", StringType), StructField("ts", TimestampType)))
    // canonical Extended JSON docs (typed wrappers) — the decode path
    // must unwrap $numberLong/$numberDouble/$date
    val docs = Seq(
      (1L, 2.5, "alice", 1700000000000L), (2L, 6.5, "bob", 1700000001000L),
      (3L, 7.0, "ann", 1700000002000L), (4L, 9.5, "carol", 1700000003000L))
    val transport: String => String = { cmd =>
      // fake server honoring exactly the filter the command carries for
      // score (a real mongod evaluates Exact predicates faithfully)
      val kept = if (cmd.contains(""""$gt":{"$numberDouble":"4.5"}""")) docs.filter(_._2 > 4.5) else docs
      kept.map { case (i, s, n, t) =>
        s"""{"id":{"$$numberLong":"$i"},"score":{"$$numberDouble":"$s"},""" +
          s""""name":"$n","ts":{"$$date":{"$$numberLong":"$t"}}}"""
      }.mkString("\n")
    }
    MongoRegistry.register("docs", MongoRegistry.Entry(
      "events.docs", mongoSchema, transport, pushable = Set("id", "score")))
    val df = spark.read.format("graft.sources.dsv2.MongoFindSource")
      .option("collection", "docs").load()
      .filter(col("score") > 4.5)              // Exact → find filter
      .filter(col("name").startsWith("a"))     // residual → engine re-check
      .select("id", "name", "ts")
    assert(df.collect().map(r => (r.getLong(0), r.getString(1))).toSeq == Seq((3L, "ann")))
    // typed decode of the $date wrapper
    assert(df.select("ts").head().getTimestamp(0).getTime == 1700000002000L)
    val cmds = MongoRegistry.issuedCommands("docs")
    assert(cmds.exists(_.contains(""""score":{"$gt":{"$numberDouble":"4.5"}}""")),
      s"pushed predicate missing from find command: $cmds")
    assert(cmds.forall(c => !c.contains("alice") && !c.contains("regex")),
      "residual predicate must never reach the find command")
    // projection pruned to the required columns (+ filter columns)
    assert(cmds.exists(c => c.contains(""""projection":{""") && c.contains(""""name":1""")))

    // limit pushes into the command (all pushed predicates Exact)
    MongoRegistry.register("docs2", MongoRegistry.Entry(
      "events.docs", mongoSchema, transport, pushable = Set("id", "score")))
    val lim = spark.read.format("graft.sources.dsv2.MongoFindSource")
      .option("collection", "docs2").load().limit(3)
    assert(lim.count() <= 3)
    assert(MongoRegistry.issuedCommands("docs2").exists(_.contains(""""limit":3""")))
  }

  test("Mongo DSv2: a null literal in IN/= stays residual — Mongo's $in:[null] matches missing fields, Spark's never does") {
    import graft.sources.dsv2.MongoRegistry
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("score", DoubleType)))
    // doc 3 has a NULL score; doc 4 omits the field entirely. A pushed
    // {$in:[6.5,null]} would make the server return docs 3 AND 4 as
    // matches; Spark's `score IN (6.5, NULL)` must return only doc 2.
    val transport: String => String = { _ =>
      Seq(
        """{"id":{"$numberLong":"1"},"score":{"$numberDouble":"2.5"}}""",
        """{"id":{"$numberLong":"2"},"score":{"$numberDouble":"6.5"}}""",
        """{"id":{"$numberLong":"3"},"score":null}""",
        """{"id":{"$numberLong":"4"}}""").mkString("\n")
    }
    MongoRegistry.register("nulls", MongoRegistry.Entry(
      "events.nulls", schema, transport, pushable = Set("id", "score")))
    val df = spark.read.format("graft.sources.dsv2.MongoFindSource")
      .option("collection", "nulls").load()
      .filter(col("score").isin(6.5, null))
    assert(df.select("id").collect().map(_.getLong(0)).toSeq == Seq(2L))
    val cmds = MongoRegistry.issuedCommands("nulls")
    assert(cmds.forall(c => !c.contains("$in")),
      s"null-carrying IN must stay residual, got: $cmds")
  }

  test("limit pushes only under all-Exact predicates") {
    register("t_lim", exact = Set("qty"), inexact = Set.empty)
    assert(read("t_lim").filter(col("qty") > 10).limit(7).count() == 7)
    register("t_lim2", exact = Set.empty, inexact = Set("qty"))
    // limit with an inexact predicate: source must NOT truncate its
    // superset — correctness preserved engine-side
    val got = read("t_lim2").filter(col("qty") > 48).limit(5).count()
    assert(got == 5)
  }
}
