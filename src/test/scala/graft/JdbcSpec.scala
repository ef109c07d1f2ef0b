package graft

import org.apache.spark.sql.functions._

import graft.sources.Jdbc

/** JDBC resource conformance against embedded Derby: pushdown,
  * partitioned reads, stage+MERGE disposition, receipt probe. */
class JdbcSpec extends SparkSpec {

  private val conn = Jdbc.Conn("jdbc:derby:memory:graftdb;create=true")

  test("jdbc roundtrip with predicate pushdown and partitioned parallel reads") {
    val orders = graft.core.Tables(spark, sf(), "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    Jdbc.createTable(conn,
      "CREATE TABLE ORDERS_J (O_ORDERKEY BIGINT PRIMARY KEY, O_CUSTKEY BIGINT, O_TOTALPRICE DOUBLE)")
    Jdbc.append(orders, conn, "ORDERS_J")

    val back = Jdbc.read(spark, conn, "ORDERS_J")
    assert(back.count() == orders.count())

    // predicate pushdown reaches the JDBC scan (Exact fidelity)
    val filtered = back.filter(col("O_TOTALPRICE") > 100000)
    val scanPlan = filtered.queryExecution.executedPlan.toString
    assert(scanPlan.contains("PushedFilters") && scanPlan.contains("O_TOTALPRICE"))
    val truth = orders.filter(col("o_totalprice") > 100000).count()
    assert(filtered.count() == truth)

    // range-partitioned read: 4 cursors, union completeness
    val maxKey = orders.agg(max("o_orderkey")).head().getLong(0)
    val part = Jdbc.readPartitioned(spark, conn, "ORDERS_J", "O_ORDERKEY", 0, maxKey, 4)
    assert(part.rdd.getNumPartitions == 4)
    assert(part.count() == orders.count())
    assert(part.select("O_ORDERKEY").distinct().count() == orders.count())
  }

  test("merge disposition: stage table + SQL MERGE, idempotent, receipt probe") {
    val base = graft.core.Tables(spark, sf(), "region")
      .select(col("r_regionkey").cast("long").as("RK"), col("r_name").as("RNAME"))
    Jdbc.createTable(conn,
      "CREATE TABLE REGION_J (RK BIGINT PRIMARY KEY, RNAME VARCHAR(64))")
    Jdbc.append(base, conn, "REGION_J")

    import spark.implicits._
    val stage = Seq((0L, "UPDATED"), (99L, "NEWROW")).toDF("RK", "RNAME")
    Jdbc.mergeInto(stage, conn, "REGION_J", "RK")

    val after = Jdbc.read(spark, conn, "REGION_J")
    assert(after.count() == base.count() + 1) // one insert
    assert(after.filter(col("RK") === 0).select("RNAME").as[String].head() == "UPDATED")
    assert(after.filter(col("RK") === 99).count() == 1)

    // replay the same stage: idempotent (merge, not append)
    Jdbc.mergeInto(stage, conn, "REGION_J", "RK")
    assert(Jdbc.countProbe(conn, "REGION_J") == base.count() + 1)
  }

  test("limit and aggregate push into the remote SQL via the V2 JDBC catalog") {
    // The V1 format(\"jdbc\") reader pushes predicates only; Spark's
    // limit/offset/aggregate pushdown lives on the V2 JDBCTableCatalog
    // path — so that is the path a deployment should mount remote
    // databases through, and the one this test pins.
    val orders = graft.core.Tables(spark, sf(), "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    Jdbc.createTable(conn,
      "CREATE TABLE ORDERS_P (O_ORDERKEY BIGINT PRIMARY KEY, O_CUSTKEY BIGINT, O_TOTALPRICE DOUBLE)")
    Jdbc.append(orders, conn, "ORDERS_P")

    spark.conf.set("spark.sql.catalog.derbyj",
      "org.apache.spark.sql.execution.datasources.v2.jdbc.JDBCTableCatalog")
    spark.conf.set("spark.sql.catalog.derbyj.url", conn.url)
    spark.conf.set("spark.sql.catalog.derbyj.driver", conn.driver)
    spark.conf.set("spark.sql.catalog.derbyj.pushDownAggregate", "true")
    spark.conf.set("spark.sql.catalog.derbyj.pushDownLimit", "true")
    val back = spark.read.table("derbyj.APP.ORDERS_P")

    val lim = back.limit(5)
    assert(lim.count() == 5)

    val agg = back.groupBy("O_CUSTKEY")
      .agg(count(lit(1)).as("n"), max("O_TOTALPRICE").as("mx"))
    val truth = orders.groupBy("o_custkey").agg(count(lit(1)), max("o_totalprice")).count()
    assert(agg.count() == truth)
    assert(agg.queryExecution.executedPlan.toString.contains("PushedAggregates"),
      s"aggregate not pushed into the JDBC scan:\n${agg.queryExecution.executedPlan}")
  }

  test("incremental cursor scan pushes the position predicate into the remote SQL") {
    // reuses ORDERS_J from the roundtrip test (suite-ordered)
    val orders = graft.core.Tables(spark, sf(), "orders")
    val mid = orders.agg(org.apache.spark.sql.functions.expr("percentile_approx(o_orderkey, 0.5)"))
      .head().getLong(0)
    val inc = Jdbc.readIncremental(spark, conn, "ORDERS_J", "O_ORDERKEY", mid)
    val truth = orders.filter(col("o_orderkey") > mid).count()
    assert(inc.count() == truth)
    assert(inc.agg(org.apache.spark.sql.functions.min("O_ORDERKEY")).head().getLong(0) > mid)
  }
}
