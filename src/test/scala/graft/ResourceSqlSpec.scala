package graft

import org.apache.spark.sql.types._

import graft.contract.TrustPreset
import graft.core.{Descriptor, Position}
import graft.run.ResourceSql
import graft.sources.{Paginators, RestSource}

class ResourceSqlSpec extends SparkSpec {

  private val ordersResource =
    """RESOURCE
      |TARGET warehouse.orders
      |DISPOSITION MERGE KEY o_orderkey
      |CURSOR o_orderdate LAG 60000
      |TRUST GOVERNED
      |EXECUTION BOUNDED
      |AS
      |SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
      |FROM orders WHERE o_totalprice > 1000""".stripMargin

  test("resource envelope compiles to descriptor + admitted body; bad shapes rejected") {
    graft.core.Tables.registerAll(spark, sf())
    val c = ResourceSql.compile(spark, ordersResource).toOption.get
    assert(c.descriptor.id == "warehouse.orders")
    assert(c.descriptor.disposition == Descriptor.Disposition.Merge(Seq("o_orderkey")))
    assert(c.descriptor.cursor == Some(Descriptor.CursorSpec(
      "o_orderdate", 60000, Descriptor.OrderingClaim.Inexact)))
    assert(c.trust == TrustPreset.Governed && c.bounded)
    val df = ResourceSql.query(spark, ordersResource).toOption.get
    assert(df.count() > 0)

    // aggregation/join bodies are rejected at compile time
    val bad = ordersResource.replace(
      "SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate\nFROM orders WHERE o_totalprice > 1000",
      "SELECT o_custkey, sum(o_totalprice) FROM orders GROUP BY 1")
    assert(ResourceSql.compile(spark, bad).left.exists(_.contains("body rejected")))
    assert(ResourceSql.compile(spark, "AS SELECT 1").isLeft) // no TARGET
    // DRAIN marks unbounded execution
    val drain = ResourceSql.compile(spark,
      ordersResource.replace("EXECUTION BOUNDED", "EXECUTION DRAIN ELAPSED 60"))
    assert(drain.toOption.exists(!_.bounded))
  }

  test("cursor resources must carry their watermark claim through the body") {
    graft.core.Tables.registerAll(spark, sf())
    // the happy path records per-node behavior in the compiled artifact
    val c = ResourceSql.compile(spark, ordersResource).toOption.get
    assert(c.watermarkNodes.nonEmpty)
    assert(c.watermarkNodes.last.outCol == Some("o_orderdate"))
    val (path, _) = ResourceSql.writeCompiled(c, tmpDir())
    assert(java.nio.file.Files.readString(java.nio.file.Paths.get(path))
      .contains("watermark_behavior"))

    // dropping the cursor column is a compile-time rejection, not a
    // first-run surprise
    val drops = ordersResource.replace(
      "SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate",
      "SELECT o_orderkey, o_custkey, o_totalprice")
    assert(ResourceSql.compile(spark, drops).left.exists(_.contains("does not survive")))

    // a non-monotone rewrite of the cursor column is rejected too
    val mangles = ordersResource.replace(
      "SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate",
      "SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate % 7 AS o_orderdate")
    assert(ResourceSql.compile(spark, mangles).left.exists(_.contains("does not survive")))

    // SELECT * forwards the claim
    val star = ordersResource.replace(
      "SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate", "SELECT *")
    assert(ResourceSql.compile(spark, star).toOption
      .exists(_.watermarkNodes.last.outCol == Some("o_orderdate")))
  }

  test("authored resource runs end-to-end through the Runner spine") {
    graft.core.Tables.registerAll(spark, sf())
    val base = tmpDir()
    val ledger = graft.core.Ledger.at(base)
    val result = ResourceSql.run(spark, ordersResource,
      rules = Seq(graft.contract.RowRule.Nullability("nn", "o_orderkey")),
      baseDir = base, ledger = ledger).toOption.get
    assert(result.committed && !result.duplicate)
    assert(result.accepted > 0)
    // merge disposition landed at the destination, keyed by the envelope's KEY
    val dest = spark.read.parquet(s"$base/dest")
    assert(dest.count() == result.accepted)
    assert(ledger.committedHead("warehouse.orders", "root").isDefined)
  }

  test("REST resource end-to-end: fixture pages → $.items extraction → typed DataFrame + position") {
    // the reference's rest-fixture payload shape (FIXTURES §2.1)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("updated_at", LongType)))
    val all = (1 to 25).map(i => s"""{"id":$i,"name":"u$i","updated_at":${i * 10}}""")
    def page(docs: Seq[String]): String = s"""{"items":[${docs.mkString(",")}]}"""

    val cursor = Paginators.CursorParam("since",
      rs => Some(rs.length.toLong)) // opaque to the source; position from pages
    val fetch = { req: Paginators.PageRequest =>
      val since = req.params.get("since").map(_.toInt).getOrElse(0)
      val slice = all.slice(since, since + 10)
      Paginators.PageResponse(
        if (slice.isEmpty) Nil else Seq(page(slice)),
        nextToken = None)
    }
    // Offset pagination over page-documents
    val (df, pos) = RestSource.read(spark, Paginators.Offset(1), req => {
      val o = req.params("offset").toInt
      val slice = all.slice(o * 10, o * 10 + 10)
      Paginators.PageResponse(if (slice.isEmpty) Nil else Seq(page(slice)))
    }, "$.items", schema)

    assert(df.count() == 25)
    assert(df.schema == schema)
    assert(df.rdd.getNumPartitions == 3) // one partition per page window
    import spark.implicits._
    assert(df.select("id").as[Long].collect().sorted.toSeq == (1L to 25L))
    assert(pos.isDefined)

    // incremental resume through the ledger: commit the position, then a
    // second drain fetches only what the stored position permits
    val base = tmpDir()
    val ledger = graft.core.Ledger.at(base)
    ledger.propose("rest_r", "root", "pkg1", Some(Position.Cursor("offset", 20)))
    ledger.commit("rest_r", "root", "pkg1", "{}")
    val resume = ledger.resumePosition("rest_r", "root")
    val (df2, _) = RestSource.read(spark, Paginators.Offset(10), req => {
      val o = req.params("offset").toInt
      val slice = all.slice(o, o + 10)
      Paginators.PageResponse(if (slice.isEmpty) Nil else Seq(page(slice)))
    }, "$.items", schema, resume)
    assert(df2.select("id").as[Long].collect().sorted.toSeq == (21L to 25L))
  }
}
