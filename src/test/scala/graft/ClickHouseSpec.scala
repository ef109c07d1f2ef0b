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
    assert(spec.sql == "SELECT `id`, `qty` FROM `events` WHERE `qty` > 4.5 AND " +
      "`tag` = 'a\\'b' AND `id` > 100 ORDER BY `id` ASC NULLS FIRST FORMAT JSONEachRow")
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
}
