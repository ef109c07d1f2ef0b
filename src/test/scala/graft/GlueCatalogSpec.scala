package graft

import scala.collection.mutable

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.GlueCatalog
import graft.sources.GlueCatalog.{GlueColumn, GluePartition}

/** Glue JSON-protocol conformance against a paged in-memory endpoint
  * (cdf: crates/cdf-source-glue/src/driver.rs:1073). */
class GlueCatalogSpec extends SparkSpec {
  import spark.implicits._

  /** fixture transport: serves NextToken-paged responses and records
    * every request for pagination/pruning assertions. */
  private class Endpoint(partLocs: Seq[String]) {
    val calls = mutable.ArrayBuffer.empty[(String, String)]
    def transport: GlueCatalog.Transport = (action, req) => {
      calls += ((action, req))
      val token = "\"NextToken\":\"([^\"]+)\"".r.findFirstMatchIn(req).map(_.group(1))
      action match {
        case "AWSGlue.GetDatabases" => token match {
          case None => """{"DatabaseList":[{"Name":"sales"}],"NextToken":"t1"}"""
          case Some("t1") => """{"DatabaseList":[{"Name":"ops"}]}"""
          case t => sys.error(s"bad token $t")
        }
        case "AWSGlue.GetTables" =>
          require(req.contains(""""DatabaseName":"sales""""), s"bad req $req")
          """{"TableList":[{"Name":"orders","StorageDescriptor":{
            |"Location":"/unused/base","InputFormat":"org.apache.hadoop.hive.ql.io.parquet.MapredParquetInputFormat",
            |"Columns":[{"Name":"id","Type":"bigint"},{"Name":"amount","Type":"decimal(12,2)"},
            |{"Name":"tag","Type":"string"}]},
            |"PartitionKeys":[{"Name":"ds","Type":"string"}]}]}""".stripMargin.replace("\n", "")
        case "AWSGlue.GetPartitions" => token match {
          case None =>
            s"""{"Partitions":[{"Values":["2024-01-01"],"StorageDescriptor":{"Location":"${partLocs(0)}"}},
               |{"Values":["2024-01-02"],"StorageDescriptor":{"Location":"${partLocs(1)}"}}],
               |"NextToken":"p1"}""".stripMargin.replace("\n", "")
          case Some("p1") =>
            s"""{"Partitions":[{"Values":["2024-01-03"],"StorageDescriptor":{"Location":"${partLocs(2)}"}}]}"""
          case t => sys.error(s"bad token $t")
        }
      }
    }
  }

  private def writePartitions(): Seq[String] = {
    val base = tmpDir()
    (1 to 3).map { d =>
      val loc = s"$base/ds=2024-01-0$d"
      (1 to 10).map(i => (d * 100L + i, BigDecimal(i) + 0.25, s"t$i"))
        .toDF("id", "amount", "tag")
        .withColumn("amount", col("amount").cast(DecimalType(12, 2)))
        .write.parquet(loc)
      loc
    }
  }

  test("NextToken pagination walks every page of databases and partitions") {
    val ep = new Endpoint(writePartitions())
    assert(GlueCatalog.getDatabases(ep.transport) == Seq("sales", "ops"))
    assert(ep.calls.count(_._1 == "AWSGlue.GetDatabases") == 2)
    val parts = GlueCatalog.getPartitions(ep.transport, "sales", "orders")
    assert(parts.map(_.values.head) == Seq("2024-01-01", "2024-01-02", "2024-01-03"))
    assert(ep.calls.count(_._1 == "AWSGlue.GetPartitions") == 2)
  }

  test("storage descriptor maps to a typed Spark schema") {
    val ep = new Endpoint(writePartitions())
    val Seq(tbl) = GlueCatalog.getTables(ep.transport, "sales")
    assert(tbl.partitionKeys == Seq(GlueColumn("ds", "string")))
    assert(GlueCatalog.toStructType(tbl) == StructType(Seq(
      StructField("id", LongType), StructField("amount", DecimalType(12, 2)),
      StructField("tag", StringType))))
    // type-mapping edges
    assert(GlueCatalog.toSparkType("array<int>") == ArrayType(IntegerType))
    intercept[IllegalArgumentException](GlueCatalog.toSparkType("struct<a:int>"))
  }

  test("catalog-level partition pruning reads ONLY matching locations") {
    val locs = writePartitions()
    val ep = new Endpoint(locs)
    val Seq(tbl) = GlueCatalog.getTables(ep.transport, "sales")
    val parts = GlueCatalog.getPartitions(ep.transport, "sales", "orders")

    val pruned = GlueCatalog.scan(spark, tbl, parts,
      keep = _.values.head >= "2024-01-02")
    assert(pruned.count() == 20)
    // partition-key column surfaces from catalog values, typed
    assert(pruned.select("ds").distinct().as[String].collect().sorted.toSeq
      == Seq("2024-01-02", "2024-01-03"))
    // the pruned location was never touched by the scan
    val touched = pruned.inputFiles.mkString(",")
    assert(!touched.contains(locs(0)) && touched.contains(locs(1)) && touched.contains(locs(2)))
    // values match the files + catalog key
    assert(pruned.filter(col("ds") === "2024-01-02").agg(min("id")).head().getLong(0) == 201L)
  }

  test("negotiated filters: partition keys prune catalog-side, residuals re-check engine-side") {
    import org.apache.spark.sql.sources._
    val locs = writePartitions()
    val ep = new Endpoint(locs)
    val Seq(tbl) = GlueCatalog.getTables(ep.transport, "sales")
    val parts = GlueCatalog.getPartitions(ep.transport, "sales", "orders")

    val (df, neg) = GlueCatalog.scanWithFilters(spark, tbl, parts, Seq(
      In("ds", Array("2024-01-02", "2024-01-03")), // partition key → catalog prune
      GreaterThan("id", 205L),                     // data column → residual
      StringStartsWith("tag", "t")))               // data column → residual
    // negotiation record: what went catalog-side vs residual
    assert(neg.catalogSide.map(_.toString).exists(_.contains("ds")))
    assert(neg.residual.size == 2)
    assert(neg.prunedToLocations.toSet == Set(locs(1), locs(2)))
    // pruned location never touched
    assert(!df.inputFiles.mkString(",").contains(locs(0)))
    // residuals applied: ids 206..210 and 301..310 survive
    assert(df.count() == 15)
    assert(df.agg(min("id")).head().getLong(0) == 206L)
    // the residual on a data column reaches the parquet scan as a
    // pushed filter (stock DSv2 pushdown on the vectorized reader)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThan(id,205"),
      s"residual did not push into the parquet scan:\n$plan")
  }

  test("DSv2 connector: uniform negotiation record; pruned locations NEVER opened") {
    import graft.sources.dsv2.GlueRegistry
    val locs = writePartitions()
    val ep = new Endpoint(locs)
    GlueRegistry.register("sales_orders", GlueRegistry.Entry(ep.transport, "sales", "orders"))
    // delete the to-be-pruned partition's files BEFORE the query: if the
    // scan touched that location at all, the parquet read would throw —
    // success is proof the catalog-side prune really skipped it
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(locs(0)))
    val df = spark.read.format("graft.sources.dsv2.GlueSource")
      .option("table", "sales_orders").load()
      .filter(col("ds").isin("2024-01-02", "2024-01-03")) // partition key → catalog prune
      .filter(col("id") > 205L)                           // data column → residual
    assert(df.count() == 15)
    assert(df.agg(min("id")).head().getLong(0) == 206L)
    // partition-key column surfaced from catalog values
    assert(df.select("ds").distinct().as[String].collect().sorted.toSeq
      == Seq("2024-01-02", "2024-01-03"))
    // the negotiation record matches the driver seam's classification
    val n = GlueRegistry.negotiations("sales_orders").last
    assert(n.prunedToLocations.toSet == Set(locs(1), locs(2)))
    assert(n.catalogSide.map(_.toString).exists(_.contains("ds")))
    assert(n.residual.map(_.toString).exists(_.contains("id")))
    // a filter pruning EVERYTHING is a legal empty result, not an error
    GlueRegistry.register("sales_orders2", GlueRegistry.Entry(ep.transport, "sales", "orders"))
    val empty = spark.read.format("graft.sources.dsv2.GlueSource")
      .option("table", "sales_orders2").load()
      .filter(col("ds") === "1999-01-01")
    assert(empty.count() == 0)
  }

  test("DSv2 connector reports real statistics: a small Glue table broadcast-joins WITHOUT hints") {
    import graft.sources.dsv2.GlueRegistry
    val locs = writePartitions()
    val ep = new Endpoint(locs)
    GlueRegistry.register("sales_bcast", GlueRegistry.Entry(ep.transport, "sales", "orders"))
    val glue = spark.read.format("graft.sources.dsv2.GlueSource")
      .option("table", "sales_bcast").load()
      .filter(col("ds") === "2024-01-02") // catalog prune → 1 location
    val big = spark.range(0, 5000).select((col("id") % 1000 + 200).as("k"))
    val joined = big.join(glue, col("k") === col("id"))
    assert(joined.count() == 50) // ids 201..210 × 5 hits each
    // the native DSv2 scan's SupportsReportStatistics reached the join
    // planner (the earlier V1Scan bridge lost it in V1ScanWrapper)
    assert(joined.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"),
      s"small glue DSv2 read should broadcast without hints:\n${joined.queryExecution.executedPlan}")
  }

  test("driver seam carries real post-prune statistics: a small pruned read broadcasts in a join") {
    import org.apache.spark.sql.sources._
    val locs = writePartitions()
    val ep = new Endpoint(locs)
    val Seq(tbl) = GlueCatalog.getTables(ep.transport, "sales")
    val parts = GlueCatalog.getPartitions(ep.transport, "sales", "orders")
    val (pruned, neg) = GlueCatalog.scanWithFilters(spark, tbl, parts,
      Seq(EqualTo("ds", "2024-01-02")))
    assert(neg.prunedToLocations == Seq(locs(1)))
    // the parquet relation's native size estimate covers ONLY the
    // surviving location — small enough to broadcast
    assert(pruned.queryExecution.optimizedPlan.stats.sizeInBytes
      < spark.conf.get("spark.sql.autoBroadcastJoinThreshold").replace("b", "").toLong
      || pruned.queryExecution.optimizedPlan.stats.sizeInBytes < 10L * 1024 * 1024)
    val big = spark.range(0, 5000).select((col("id") % 1000 + 200).as("k"))
    val joined = big.join(pruned, col("k") === col("id"))
    assert(joined.count() > 0)
    assert(joined.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"),
      s"small pruned glue read should broadcast:\n${joined.queryExecution.executedPlan}")
  }

  test("HTTP wire transport: AWS JSON 1.1 protocol over a real endpoint — discovery, pruning and scan end to end") {
    // The live half: GlueCatalog.httpTransport POSTs with
    // Content-Type: application/x-amz-json-1.1 and X-Amz-Target,
    // exactly the published protocol; the fixture is the SAME paged
    // catalog served over a real JDK HttpServer socket.
    import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
    import java.nio.charset.StandardCharsets.UTF_8
    val locs = writePartitions()
    val ep = new Endpoint(locs)
    val server = HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val target = Option(ex.getRequestHeaders.getFirst("X-Amz-Target")).getOrElse("")
        val ct = Option(ex.getRequestHeaders.getFirst("Content-Type")).getOrElse("")
        val req = new String(ex.getRequestBody.readAllBytes(), UTF_8)
        val (code, body) =
          if (ct != "application/x-amz-json-1.1")
            (400, s"""{"__type":"InvalidRequest","message":"bad content type $ct"}""")
          else try (200, ep.transport(target, req))
          catch { case e: Throwable =>
            (400, s"""{"__type":"InvalidInputException","message":"${e.getMessage}"}""") }
        val bytes = body.getBytes(UTF_8)
        ex.sendResponseHeaders(code, bytes.length)
        ex.getResponseBody.write(bytes)
        ex.close()
      }
    })
    server.start()
    try {
      val wire = GlueCatalog.httpTransport(s"http://127.0.0.1:${server.getAddress.getPort}")
      // discovery walks the same NextToken pages over the wire
      val Seq(tbl) = GlueCatalog.getTables(wire, "sales")
      assert(tbl.name == "orders" && tbl.partitionKeys.map(_.name) == Seq("ds"))
      val parts = GlueCatalog.getPartitions(wire, "sales", "orders")
      assert(parts.map(_.values.head) == Seq("2024-01-01", "2024-01-02", "2024-01-03"))
      // pruned scan over the wire-discovered catalog
      import org.apache.spark.sql.sources._
      val (df, neg) = GlueCatalog.scanWithFilters(spark, tbl, parts,
        Seq(EqualTo("ds", "2024-01-02")))
      assert(neg.prunedToLocations == Seq(locs(1)))
      assert(df.count() == 10)
      // a service error surfaces typed with the AWS error body
      val e = intercept[java.io.IOException](GlueCatalog.getTables(wire, "nope"))
      assert(e.getMessage.contains("glue http 400"))
    } finally server.stop(0)
  }

  test("full scan unions all partitions with catalog keys attached") {
    val ep = new Endpoint(writePartitions())
    val Seq(tbl) = GlueCatalog.getTables(ep.transport, "sales")
    val parts = GlueCatalog.getPartitions(ep.transport, "sales", "orders")
    val full = GlueCatalog.scan(spark, tbl, parts)
    assert(full.count() == 30)
    assert(full.groupBy("ds").count().count() == 3)
  }
}
