package graft

import org.apache.spark.sql.types._

import graft.sources.ClickHouse
import graft.sources.ClickHouse.{Pred, ScanSpec}

/** ClickHouse dialect/scan/publish-plan conformance (cdf:
  * crates/cdf-source-clickhouse resource.rs:284-300,
  * crates/cdf-dest-clickhouse plan.rs/session.rs). */
class ClickHouseSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("qty", DoubleType),
    StructField("tag", StringType)))

  test("type lattice round-trips both directions") {
    assert(ClickHouse.chType(LongType, nullable = false) == "Int64")
    assert(ClickHouse.chType(StringType, nullable = true) == "Nullable(String)")
    assert(ClickHouse.chType(DecimalType(12, 2), nullable = false) == "Decimal(12, 2)")
    assert(ClickHouse.chType(TimestampType, nullable = false) == "DateTime64(6)")
    assert(ClickHouse.sparkType("Nullable(Int64)") == LongType)
    assert(ClickHouse.sparkType("Decimal(12, 2)") == DecimalType(12, 2))
    assert(ClickHouse.sparkType("DateTime64(3)") == TimestampType)
    intercept[IllegalArgumentException](ClickHouse.sparkType("AggregateFunction(sum, Int64)"))
  }

  test("scan SQL: exact-operator pushdown, projection, order, cursor WHERE") {
    val spec = ScanSpec("events", Seq("id", "qty"),
      preds = Seq(Pred("qty", ">", 4.5), Pred("tag", "=", "a'b")),
      orderBy = Seq(ClickHouse.Order("id")), cursor = Some(("id", 100L)))
    // every conjunct parenthesized: OR-bearing shard predicates must
    // not escape the conjunction
    assert(spec.sql == "SELECT `id`, `qty` FROM `events` WHERE (`qty` > 4.5) AND " +
      "(`tag` = 'a\\'b') AND (`id` > 100) ORDER BY `id` ASC NULLS FIRST FORMAT JSONEachRow")
    // only the reference's declared operator set is pushable
    intercept[IllegalArgumentException](Pred("tag", "LIKE", "x%"))
    // limit + cursor refused (capability truth-telling)
    intercept[IllegalArgumentException](
      ScanSpec("t", Seq("id"), limit = Some(10), cursor = Some(("id", 1L))))
    assert(ScanSpec("t", Seq("id"), limit = Some(10)).sql.endsWith("LIMIT 10 FORMAT JSONEachRow"))
  }

  test("JSONEachRow response parses distributed with the declared schema") {
    val served = collection.mutable.ArrayBuffer.empty[String]
    val transport: ClickHouse.Transport = { sql =>
      served += sql
      """{"id":1,"qty":2.5,"tag":"a"}
        |{"id":2,"qty":null,"tag":"b"}
        |
        |{"id":3,"qty":7.25,"tag":"c"}""".stripMargin
    }
    val df = ClickHouse.read(spark, transport,
      ScanSpec("events", Seq("id", "qty", "tag"), cursor = Some(("id", 0L))), schema)
    assert(served.head.contains("`id` > 0"))
    val rows = df.orderBy("id").collect()
    assert(rows.length == 3)
    assert(rows(0).getLong(0) == 1L && rows(0).getDouble(1) == 2.5)
    assert(rows(1).isNullAt(1) && rows(1).getString(2) == "b")
  }

  test("publish plan: staged atomic merge, EXCHANGE swap, hash-derived idempotent names") {
    val plan = ClickHouse.publishPlan("orders", schema, Seq("id"), "qty", "abcdef0123456789ff")
    val sqls = plan.map(_.sql)
    assert(sqls.head == "CREATE TABLE `__incoming_abcdef0123456789` " +
      "(`id` Int64, `qty` Nullable(Float64), `tag` Nullable(String)) " +
      "ENGINE = MergeTree ORDER BY (`id`)")
    // the swap is EXCHANGE (atomic) — never DROP-then-CREATE of the live table
    assert(sqls.exists(_.startsWith("EXCHANGE TABLES `__publish_")))
    assert(!sqls.exists(s => s.startsWith("DROP TABLE `orders`") || s.contains("DELETE")))
    // last-writer dedup with incoming winning ties
    val merge = sqls.find(_.contains("row_number()")).get
    assert(merge.contains("PARTITION BY `id`") && merge.contains("`__src` DESC") &&
      merge.contains("WHERE __rn = 1"))
    // replaying the same package hash regenerates the SAME plan (idempotent)
    assert(plan == ClickHouse.publishPlan("orders", schema, Seq("id"), "qty", "abcdef0123456789ff"))
  }

  test("HTTP wire path: staged EXCHANGE publish over a real endpoint, chaos at every kill point") {
    // The live half (cdf-dest-clickhouse/src/session.rs:147-176): the
    // HTTP-interface client drives an embedded fixture over real HTTP —
    // INSERT payload in the body with the query in the URL (the
    // documented bulk-load shape), statements as POST bodies, errors
    // as non-200. Same replay law the plan-shape test above pins.
    import graft.sources.{ClickHouseHttp, ClickHouseHttpClient}
    import org.apache.spark.sql.types._

    val server = new ClickHouseHttpFixture
    try {
      val client = new ClickHouseHttpClient(server.endpoint)
      val schema = StructType(Seq(
        StructField("k", LongType, nullable = false),
        StructField("v", StringType, nullable = false),
        StructField("ord", LongType, nullable = false)))
      def rows(rs: (Long, String, Long)*): Seq[String] =
        rs.map { case (k, v, o) => s"""{"k":$k,"v":"$v","ord":$o}""" }
      def publish(hash: String, rs: Seq[String], chaos: String => Unit = _ => ()): Long =
        ClickHouseHttp.publishViaHttp(client, "accts", schema, Seq("k"), "ord", hash, rs, chaos)
      def state(): Seq[(Long, String)] =
        server.tables("accts").rows
          .map(r => (r("k").asInstanceOf[Long], r("v").asInstanceOf[String])).sortBy(_._1).toSeq

      // first package
      assert(publish("aaaa000000000000", rows((1L, "a", 1L), (2L, "b", 1L), (3L, "c", 1L))) == 3L)
      assert(state() == Seq((1L, "a"), (2L, "b"), (3L, "c")))

      final case class Kill(at: String) extends RuntimeException(at)
      def killAt(p: String): String => Unit = s => if (s == p) throw Kill(p)

      // second package updates k=2, inserts k=4; kill BEFORE the swap
      // at both earlier steps: the destination must be untouched
      val pkg2 = rows((2L, "B2", 2L), (4L, "d", 2L))
      intercept[Kill](publish("bbbb000000000000", pkg2, killAt("loaded")))
      assert(state() == Seq((1L, "a"), (2L, "b"), (3L, "c")))
      intercept[Kill](publish("bbbb000000000000", pkg2, killAt("staged")))
      assert(state() == Seq((1L, "a"), (2L, "b"), (3L, "c")),
        "the EXCHANGE is the only visible commit point")
      // replay converges
      assert(publish("bbbb000000000000", pkg2) == 4L)
      assert(state() == Seq((1L, "a"), (2L, "B2"), (3L, "c"), (4L, "d")))

      // kill AFTER the swap: destination already final, work tables
      // survive inert; replay is an idempotent no-op swap of equals
      val pkg3 = rows((4L, "D2", 3L), (5L, "e", 3L))
      intercept[Kill](publish("cccc000000000000", pkg3, killAt("published")))
      assert(state() == Seq((1L, "a"), (2L, "B2"), (3L, "c"), (4L, "D2"), (5L, "e")))
      assert(server.tables.keys.exists(_.startsWith("__")), "work tables survive the crash, inert")
      assert(publish("cccc000000000000", pkg3) == 5L)
      assert(state() == Seq((1L, "a"), (2L, "B2"), (3L, "c"), (4L, "D2"), (5L, "e")),
        "replay after a post-swap crash must republish identical content")
      assert(!server.tables.keys.exists(_.startsWith("__")), "clean run drops its work tables")

      // protocol errors surface typed with the server's text
      val e = intercept[java.sql.SQLException](client.execute("SELECT nonsense"))
      assert(e.getMessage.contains("clickhouse http 500"))

      // the read seam runs over the SAME wire transport
      val df = graft.sources.ClickHouse.read(spark, client.transport,
        graft.sources.ClickHouse.ScanSpec("accts", Seq("k", "v", "ord")), schema)
      assert(df.count() == 5)
    } finally server.stop()
  }

  test("executor-side HTTP scan: tasks POST their own queries and stream the response; bytes never transit the driver") {
    import org.apache.spark.sql.functions._
    import graft.sources.ClickHouseHttpClient
    import graft.sources.dsv2.ClickHouseRegistry
    val server = new ClickHouseHttpFixture
    try {
      val client = new ClickHouseHttpClient(server.endpoint)
      client.execute("CREATE TABLE `ev` (`k` Int64, `v` Nullable(String)) " +
        "ENGINE = MergeTree ORDER BY (`k`)")
      client.insert("INSERT INTO `ev` FORMAT JSONEachRow",
        (1 to 8).map(i => s"""{"k":$i,"v":"x$i"}""").mkString("\n"))
      val evSchema = StructType(Seq(
        StructField("k", LongType, nullable = false), StructField("v", StringType)))
      ClickHouseRegistry.register("ev_http", ClickHouseRegistry.Entry(
        "ev", evSchema,
        // the seam is dead for http entries — prove nothing uses it
        transport = _ => sys.error("http entries must not use the driver-side seam"),
        pushable = Set("k", "v"),
        http = Some(server.endpoint),
        shardWheres = Seq("k % 2 = 0", "k % 2 = 1")))
      val before = server.requests.get
      val df = spark.read.format("graft.sources.dsv2.ClickHouseSource")
        .option("table", "ev_http").load()
        .filter(col("k") > 2L)
      df.queryExecution.executedPlan // plan fully — still no request
      assert(server.requests.get == before,
        "planning an executor-side scan must not issue a query")
      val got = df.collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
      assert(got == (3 to 8).map(i => (i.toLong, s"x$i")))
      assert(server.requests.get == before + 2, "one task-side POST per shard")
      val sqls = ClickHouseRegistry.issuedSql("ev_http")
      assert(sqls.size == 2 && sqls.forall(_.contains("`k` > 2")), sqls.toString)
      assert(sqls.exists(_.contains("% 2 = 0")) && sqls.exists(_.contains("% 2 = 1")))

      // global semantics (pushed top-N) pin the scan to ONE streamed query
      val top = spark.read.format("graft.sources.dsv2.ClickHouseSource")
        .option("table", "ev_http").load()
        .orderBy(col("k").desc_nulls_last).limit(3)
      assert(top.collect().map(_.getLong(0)).toSeq == Seq(8L, 7L, 6L))
      assert(server.requests.get == before + 3, "a pushed top-N must be a single query")

      // a completely-pushed GLOBAL aggregate (no GROUP BY) must also
      // pin to ONE query: Spark's own aggregate is gone, so a
      // per-shard fan-out would return one partial row per shard
      val cnt = spark.read.format("graft.sources.dsv2.ClickHouseSource")
        .option("table", "ev_http").load()
        .agg(count(lit(1)).as("n"))
        .collect()
      assert(cnt.length == 1 && cnt.head.getLong(0) == 8L,
        s"global aggregate over a sharded entry must return ONE total row: ${cnt.toSeq}")
      assert(server.requests.get == before + 4,
        "a completely-pushed global aggregate must be a single query")
    } finally server.stop()
  }
}
