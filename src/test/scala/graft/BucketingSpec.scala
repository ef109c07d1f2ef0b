package graft

import org.apache.spark.sql.functions._

import graft.pkg.Bucketing

class BucketingSpec extends SparkSpec {

  /** drop catalog entry AND stale warehouse dirs from prior JVM runs
    * (the in-memory catalog forgets tables across sessions, but the
    * managed locations persist). */
  private def dropClean(tables: String*): Unit = tables.foreach { t =>
    spark.sql(s"DROP TABLE IF EXISTS $t")
    val loc = java.nio.file.Paths.get("spark-warehouse", t)
    if (java.nio.file.Files.exists(loc)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(loc).sorted(java.util.Comparator.reverseOrder())
        .iterator().asScala.foreach(java.nio.file.Files.delete)
    }
  }

  test("bucketed-by-merge-key tables join without shuffling the base side") {
    dropClean("orders_bucketed", "stage_bucketed")
    val orders = graft.core.Tables(spark, sf("sf0.01"), "orders")
    Bucketing.writeBucketed(orders, "orders_bucketed", "o_orderkey", buckets = 8)
    Bucketing.writeBucketed(orders.limit(1000), "stage_bucketed", "o_orderkey", buckets = 8)

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    try {
      val joined = spark.table("orders_bucketed")
        .join(spark.table("stage_bucketed"), "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      // co-located: bucketed reads satisfy the join distribution — no
      // Exchange anywhere in the plan
      assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
      assert(joined.count() == 1000)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  test("recurring merge into a bucketed table preserves bucketing and content") {
    dropClean("merge_target", "merge_target__swap")
    val orders = graft.core.Tables(spark, sf(), "orders")
    Bucketing.writeBucketed(orders, "merge_target", "o_orderkey", buckets = 4)
    val stage = orders.filter(col("o_orderkey") % 10 === 0)
      .withColumn("o_totalprice", col("o_totalprice") * 2)
    Bucketing.mergeIntoBucketed(spark, "merge_target", stage, "o_orderkey", buckets = 4)

    val after = spark.table("merge_target")
    assert(after.count() == orders.count())
    val updated = after.join(stage.select(col("o_orderkey"), col("o_totalprice").as("sp")), "o_orderkey")
    assert(updated.filter(col("o_totalprice") =!= col("sp")).count() == 0)
    // still bucketed for the NEXT merge
    val catalog = spark.sql("DESCRIBE TABLE EXTENDED merge_target")
      .filter(col("col_name") === "Num Buckets").select("data_type").head().getString(0)
    assert(catalog.trim == "4")
  }
}
