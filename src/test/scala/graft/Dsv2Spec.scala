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
    // fake server: honors exactly the WHERE + LIMIT the dialect SQL
    // carries for qty (a real ClickHouse evaluates Exact predicates and
    // LIMIT faithfully — the limit claim is a FULL push, so the server
    // contract matters); serves every tag — residual trimming is the
    // ENGINE's job
    val transport: graft.sources.ClickHouse.Transport = { sql =>
      val filtered = if (sql.contains("`qty` > 4.5")) all.filter(_._2 > 4.5) else all
      val limited = "LIMIT (\\d+)".r.findFirstMatchIn(sql)
        .map(m => filtered.take(m.group(1).toInt)).getOrElse(filtered)
      limited.map { case (i, q, t) => s"""{"id":$i,"qty":$q,"tag":"$t"}""" }.mkString("\n")
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
      // fake server honoring exactly the filter + limit the command
      // carries for score (a real mongod evaluates Exact predicates and
      // limit faithfully — the limit claim is a FULL push)
      val kept = if (cmd.contains(""""$gt":{"$numberDouble":"4.5"}""")) docs.filter(_._2 > 4.5) else docs
      val limited = """"limit":(\d+)""".r.findFirstMatchIn(cmd)
        .map(m => kept.take(m.group(1).toInt)).getOrElse(kept)
      limited.map { case (i, s, n, t) =>
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

  test("ClickHouse DSv2: top-N pushes ORDER BY ... LIMIT into the dialect SQL; no engine-side Sort") {
    import graft.sources.dsv2.ClickHouseRegistry
    val all = Seq((1L, 2.5, "a"), (2L, 9.0, "b"), (3L, 7.25, "c"), (4L, 5.0, "d"))
    // fake server honoring the ORDER BY/LIMIT contract the SQL carries
    val transport: graft.sources.ClickHouse.Transport = { sql =>
      val sorted = if (sql.contains("ORDER BY `qty` DESC NULLS LAST")) all.sortBy(-_._2) else all
      val limited = "LIMIT (\\d+)".r.findFirstMatchIn(sql)
        .map(m => sorted.take(m.group(1).toInt)).getOrElse(sorted)
      limited.map { case (i, q, t) => s"""{"id":$i,"qty":$q,"tag":"$t"}""" }.mkString("\n")
    }
    ClickHouseRegistry.register("ev_top", ClickHouseRegistry.Entry(
      "events", schema, transport, pushable = Set("id", "qty")))
    val df = spark.read.format("graft.sources.dsv2.ClickHouseSource")
      .option("table", "ev_top").load()
      .orderBy(col("qty").desc).limit(2)
    assert(df.collect().map(_.getLong(0)).toSeq == Seq(2L, 3L))
    val sqls = ClickHouseRegistry.issuedSql("ev_top")
    assert(sqls.exists(_.contains("ORDER BY `qty` DESC NULLS LAST LIMIT 2")),
      s"top-N not pushed into the dialect SQL: $sqls")
    val opt = df.queryExecution.optimizedPlan.toString
    assert(!opt.contains("Sort"), s"fully-pushed top-N must leave no engine-side Sort:\n$opt")

    // a residual predicate forbids server-side top-N (the server would
    // keep rows the engine then filters, dropping true top-N members)
    ClickHouseRegistry.register("ev_top2", ClickHouseRegistry.Entry(
      "events", schema, transport, pushable = Set("id", "qty")))
    val res = spark.read.format("graft.sources.dsv2.ClickHouseSource")
      .option("table", "ev_top2").load()
      .filter(col("tag").isin("a", "c", "d")) // dialect can't say IN → residual
      .orderBy(col("qty").desc).limit(2)
    assert(res.collect().map(_.getLong(0)).toSeq == Seq(3L, 4L))
    assert(ClickHouseRegistry.issuedSql("ev_top2").forall(!_.contains("ORDER BY")),
      "top-N must stay engine-side under a residual predicate")
  }

  test("Mongo DSv2: top-N pushes sort+limit into the find command when null placement matches BSON order") {
    import graft.sources.dsv2.MongoRegistry
    val schemaM = StructType(Seq(
      StructField("id", LongType), StructField("score", DoubleType)))
    val docs = Seq((1L, 2.5), (2L, 9.0), (3L, 7.25), (4L, 5.0))
    val transport: String => String = { cmd =>
      val sorted = if (cmd.contains(""""sort":{"score":-1}""")) docs.sortBy(-_._2) else docs
      val limited = """"limit":(\d+)""".r.findFirstMatchIn(cmd)
        .map(m => sorted.take(m.group(1).toInt)).getOrElse(sorted)
      limited.map { case (i, s) =>
        s"""{"id":{"$$numberLong":"$i"},"score":{"$$numberDouble":"$s"}}"""
      }.mkString("\n")
    }
    MongoRegistry.register("topd", MongoRegistry.Entry(
      "events.topd", schemaM, transport, pushable = Set("id", "score")))
    val df = spark.read.format("graft.sources.dsv2.MongoFindSource")
      .option("collection", "topd").load()
      .orderBy(col("score").desc).limit(2) // desc → NULLS LAST = BSON order
    assert(df.collect().map(_.getLong(0)).toSeq == Seq(2L, 3L))
    val cmds = MongoRegistry.issuedCommands("topd")
    assert(cmds.exists(c => c.contains(""""sort":{"score":-1}""") && c.contains(""""limit":2""")),
      s"top-N not pushed into the find command: $cmds")
    assert(!df.queryExecution.optimizedPlan.toString.contains("Sort"))

    // non-default null placement cannot be served by BSON sort order:
    // the sort must stay engine-side (no sort key in the command)
    MongoRegistry.register("topd2", MongoRegistry.Entry(
      "events.topd", schemaM, transport, pushable = Set("id", "score")))
    val eng = spark.read.format("graft.sources.dsv2.MongoFindSource")
      .option("collection", "topd2").load()
      .orderBy(col("score").asc_nulls_last).limit(2)
    assert(eng.collect().map(_.getLong(0)).toSeq == Seq(1L, 4L))
    assert(MongoRegistry.issuedCommands("topd2").forall(!_.contains(""""sort"""")),
      "asc NULLS LAST is not BSON sort order — must not push")
  }

  test("offset pushes beside limit: ClickHouse OFFSET clause, Mongo skip key (skip-then-take)") {
    import graft.sources.dsv2.{ClickHouseRegistry, MongoRegistry}
    val rowsC = (1 to 6).map(i => (i.toLong, i * 1.0, s"t$i"))
    val chTransport: graft.sources.ClickHouse.Transport = { sql =>
      val off = "OFFSET (\\d+)".r.findFirstMatchIn(sql).map(_.group(1).toInt).getOrElse(0)
      val lim = "LIMIT (\\d+)".r.findFirstMatchIn(sql).map(_.group(1).toInt).getOrElse(Int.MaxValue)
      rowsC.drop(off).take(lim)
        .map { case (i, q, t) => s"""{"id":$i,"qty":$q,"tag":"$t"}""" }.mkString("\n")
    }
    ClickHouseRegistry.register("ev_off", ClickHouseRegistry.Entry(
      "events", schema, chTransport, pushable = Set("id", "qty")))
    val ch = spark.read.format("graft.sources.dsv2.ClickHouseSource")
      .option("table", "ev_off").load().offset(2).limit(3)
    assert(ch.collect().map(_.getLong(0)).toSeq == Seq(3L, 4L, 5L))
    assert(ClickHouseRegistry.issuedSql("ev_off").exists(_.contains("LIMIT 3 OFFSET 2")),
      s"offset not pushed: ${ClickHouseRegistry.issuedSql("ev_off")}")

    val mSchema = StructType(Seq(StructField("id", LongType)))
    val mTransport: String => String = { cmd =>
      val off = """"skip":(\d+)""".r.findFirstMatchIn(cmd).map(_.group(1).toInt).getOrElse(0)
      val lim = """"limit":(\d+)""".r.findFirstMatchIn(cmd).map(_.group(1).toInt).getOrElse(Int.MaxValue)
      (1 to 6).drop(off).take(lim)
        .map(i => s"""{"id":{"$$numberLong":"$i"}}""").mkString("\n")
    }
    MongoRegistry.register("offd", MongoRegistry.Entry(
      "events.offd", mSchema, mTransport, pushable = Set("id")))
    val mg = spark.read.format("graft.sources.dsv2.MongoFindSource")
      .option("collection", "offd").load().offset(2).limit(3)
    assert(mg.collect().map(_.getLong(0)).toSeq == Seq(3L, 4L, 5L))
    assert(MongoRegistry.issuedCommands("offd").exists(c =>
      c.contains(""""skip":2""") && c.contains(""""limit":3""")),
      s"skip not pushed: ${MongoRegistry.issuedCommands("offd")}")
  }

  test("ClickHouse DSv2: group-by renders into the dialect SQL with -OrNull parity; no engine-side Aggregate") {
    import graft.sources.dsv2.ClickHouseRegistry
    val schemaC = StructType(Seq(
      StructField("id", LongType), StructField("qty", DoubleType),
      StructField("tag", StringType)))
    // tag "z" has ONLY null qty — sumOrNull must yield NULL like Spark
    val docs = Seq(
      (1L, Some(2.0), "x"), (2L, Some(3.5), "x"), (3L, Some(10.0), "y"),
      (4L, None, "y"), (5L, None, "z"))
    val transport: graft.sources.ClickHouse.Transport = { sql =>
      assert(sql.contains("GROUP BY `tag`"), s"expected GROUP BY in dialect SQL: $sql")
      // fake server evaluating the asserted aggregate SQL over docs
      docs.groupBy(_._3).toSeq.sortBy(_._1).map { case (tag, g) =>
        val vals = g.flatMap(_._2)
        val sum = if (vals.isEmpty) "null" else vals.sum.toString
        val mn = if (vals.isEmpty) "null" else vals.min.toString
        val avg = if (vals.isEmpty) "null" else (vals.sum / vals.size).toString
        s"""{"tag":"$tag","a0":$sum,"a1":${g.size},"a2":${vals.size},"a3":$mn,"a4":$avg}"""
      }.mkString("\n")
    }
    ClickHouseRegistry.register("ev_agg", ClickHouseRegistry.Entry(
      "events", schemaC, transport, pushable = Set("id", "qty", "tag")))
    val df = spark.read.format("graft.sources.dsv2.ClickHouseSource")
      .option("table", "ev_agg").load()
      .groupBy("tag")
      .agg(sum("qty").as("s"), count(lit(1)).as("c"), count(col("qty")).as("cq"),
        min("qty").as("m"), avg("qty").as("a"))
      .orderBy("tag")
    val got = df.collect().map(r => (r.getString(0),
      Option(r.get(1)), r.getLong(2), r.getLong(3), Option(r.get(4)))).toSeq
    assert(got == Seq(
      ("x", Some(5.5), 2L, 2L, Some(2.0)),
      ("y", Some(10.0), 2L, 1L, Some(10.0)),
      ("z", None, 1L, 0L, None)))
    val sqls = ClickHouseRegistry.issuedSql("ev_agg")
    val sql = sqls.find(_.contains("GROUP BY")).getOrElse(fail(s"no aggregate SQL: $sqls"))
    assert(sql.contains("sumOrNull(`qty`) AS a0"), sql)
    assert(sql.contains("count(*) AS a1"), sql)
    assert(sql.contains("count(`qty`) AS a2"), sql)
    assert(sql.contains("minOrNull(`qty`) AS a3"), sql)
    assert(sql.contains("avgOrNull(`qty`) AS a4"), sql)
    assert(sql.startsWith("SELECT `tag`, sumOrNull"), sql)
    assert(!df.queryExecution.optimizedPlan.toString.contains("Aggregate"),
      s"complete pushdown must leave no engine-side Aggregate:\n${df.queryExecution.optimizedPlan}")
  }

  test("Mongo DSv2: group-by compiles to an aggregate pipeline; complete pushdown leaves no engine-side Aggregate") {
    import graft.sources.dsv2.MongoRegistry
    val schemaM = StructType(Seq(
      StructField("id", LongType), StructField("qty", DoubleType),
      StructField("tag", StringType)))
    // tag "z" has ONLY null qty — the $sum null-parity projection must
    // yield NULL (a bare $sum would yield 0, diverging from Spark)
    val docs = Seq(
      (1L, Some(2.0), "x"), (2L, Some(3.5), "x"), (3L, Some(10.0), "y"),
      (4L, None, "y"), (5L, None, "z"))
    val transport: String => String = { cmd =>
      assert(cmd.startsWith("""{"aggregate":"events.aggd""""), s"expected aggregate command: $cmd")
      // fake mongod evaluating the asserted pipeline shape over docs
      docs.groupBy(_._3).toSeq.sortBy(_._1).map { case (tag, g) =>
        val vals = g.flatMap(_._2)
        val sum = if (vals.isEmpty) "null" else s"""{"$$numberDouble":"${vals.sum}"}"""
        val mn = if (vals.isEmpty) "null" else s"""{"$$numberDouble":"${vals.min}"}"""
        val avg = if (vals.isEmpty) "null" else s"""{"$$numberDouble":"${vals.sum / vals.size}"}"""
        s"""{"tag":"$tag","a0":$sum,"a1":{"$$numberInt":"${g.size}"},""" +
          s""""a2":{"$$numberInt":"${vals.size}"},"a3":$mn,"a4":$avg}"""
      }.mkString("\n")
    }
    MongoRegistry.register("aggd", MongoRegistry.Entry(
      "events.aggd", schemaM, transport, pushable = Set("id", "qty", "tag")))
    val df = spark.read.format("graft.sources.dsv2.MongoFindSource")
      .option("collection", "aggd").load()
      .groupBy("tag")
      .agg(sum("qty").as("s"), count(lit(1)).as("c"), count(col("qty")).as("cq"),
        min("qty").as("m"), avg("qty").as("a"))
      .orderBy("tag")
    val got = df.collect().map(r => (r.getString(0),
      Option(r.get(1)), r.getLong(2), r.getLong(3), Option(r.get(4)))).toSeq
    assert(got == Seq(
      ("x", Some(5.5), 2L, 2L, Some(2.0)),
      ("y", Some(10.0), 2L, 1L, Some(10.0)),
      ("z", None, 1L, 0L, None)))
    val cmds = MongoRegistry.issuedCommands("aggd")
    val cmd = cmds.find(_.contains(""""aggregate"""")).getOrElse(fail(s"no aggregate command: $cmds"))
    assert(cmd.contains(""""$group":{"_id":{"g0":"$tag"}"""), cmd)
    assert(cmd.contains(""""a0":{"$sum":"$qty"}"""), cmd)
    assert(cmd.contains(""""a0n":{"$sum":{"$cond":[{"$lte":["$qty",null]},0,1]}}"""), cmd)
    assert(cmd.contains(""""$project":{"_id":0,"tag":"$_id.g0""""), cmd)
    assert(cmd.contains(""""a0":{"$cond":[{"$eq":["$a0n",0]},null,"$a0"]}"""), cmd)
    assert(cmd.contains(""""a4":{"$avg":"$qty"}""") || cmd.contains(""""a4":1"""), cmd)
    // complete pushdown: the engine re-aggregates NOTHING
    assert(!df.queryExecution.optimizedPlan.toString.contains("Aggregate"),
      s"complete pushdown must leave no engine-side Aggregate:\n${df.queryExecution.optimizedPlan}")
  }

  test("Mongo DSv2: global aggregate stays engine-side — $group over an empty input emits zero rows, Spark must emit one") {
    import graft.sources.dsv2.MongoRegistry
    val schemaM = StructType(Seq(
      StructField("id", LongType), StructField("qty", DoubleType)))
    // empty collection: a pushed {"$group":{"_id":null}} would return
    // NO documents, silently swallowing Spark's mandatory single row
    val transport: String => String = { cmd =>
      assert(!cmd.contains(""""aggregate""""),
        s"global aggregate must NOT push to the server: $cmd")
      "" // no documents
    }
    MongoRegistry.register("aggglobal", MongoRegistry.Entry(
      "events.aggglobal", schemaM, transport, pushable = Set("id", "qty")))
    val df = spark.read.format("graft.sources.dsv2.MongoFindSource")
      .option("collection", "aggglobal").load()
      .agg(count(lit(1)).as("c"), sum("qty").as("s"))
    val got = df.collect()
    assert(got.length == 1, "global aggregate over empty input must emit exactly one row")
    assert(got(0).getLong(0) == 0L)
    assert(got(0).isNullAt(1))
  }

  test("Mongo DSv2: grouping by a column named _id refuses pushdown — the $project spec would carry conflicting _id keys") {
    import graft.sources.dsv2.MongoRegistry
    val schemaM = StructType(Seq(
      StructField("_id", StringType), StructField("qty", DoubleType)))
    val transport: String => String = { cmd =>
      assert(!cmd.contains(""""aggregate""""),
        s"_id group key must NOT push to the server: $cmd")
      Seq(
        """{"_id":"a","qty":{"$numberDouble":"1.5"}}""",
        """{"_id":"a","qty":{"$numberDouble":"2.5"}}""",
        """{"_id":"b","qty":{"$numberDouble":"4.0"}}""").mkString("\n")
    }
    MongoRegistry.register("aggid", MongoRegistry.Entry(
      "events.aggid", schemaM, transport, pushable = Set("_id", "qty")))
    val df = spark.read.format("graft.sources.dsv2.MongoFindSource")
      .option("collection", "aggid").load()
      .groupBy("_id").agg(sum("qty").as("s")).orderBy("_id")
    val got = df.collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(got == Seq(("a", 4.0), ("b", 4.0)))
    // engine-side aggregation still present
    assert(df.queryExecution.optimizedPlan.toString.contains("Aggregate"),
      s"refused pushdown must keep the engine Aggregate:\n${df.queryExecution.optimizedPlan}")
  }
}
