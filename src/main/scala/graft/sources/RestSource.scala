package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.core.Position

/** REST/paginated resource end-to-end: paginator drain → `$.path`
  * record extraction → DataFrame, one input partition per page window
  * (cdf: crates/cdf-source-rest/ + format-json `records => '$.items'`;
  * SURVEY §2.1 REST row: "driver-side fetch loop →
  * spark.createDataFrame per page-window partition").
  *
  * Transport is injected (`fetch`), so the zero-egress container tests
  * the whole path against in-memory fixtures; a real deployment plugs
  * an HTTP client into the same seam. Page payloads are raw JSON
  * documents; `recordsPointer` (e.g. `$.items`) extracts the record
  * array before schema-bound parsing — the pointer is part of the
  * plan, not a transform.
  */
object RestSource {

  /** Drain the paginator and parse pages into a DataFrame. Each page
    * window becomes its own partition so downstream parallelism
    * mirrors the fetch windows. */
  def read(spark: SparkSession, paginator: Paginators.Paginator,
      fetch: Paginators.PageRequest => Paginators.PageResponse,
      recordsPointer: String, schema: StructType,
      resume: Option[Position] = None): (DataFrame, Option[Position]) = {
    val (pages, position) = Paginators.drain(paginator, fetch, resume)
    if (pages.isEmpty)
      return (spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema), position)

    // one RDD partition per page window
    val rdd = spark.sparkContext.makeRDD(pages.map(p => p: Seq[String]), pages.size)
      .mapPartitions(it => it.flatten)
    import spark.implicits._
    val raw = spark.createDataset(rdd)(org.apache.spark.sql.Encoders.STRING).toDF("doc")
    val parsed = raw.select(
      explode(from_json(get_json_object(col("doc"), recordsPointer),
        org.apache.spark.sql.types.ArrayType(schema))).as("rec"))
      .select(col("rec.*"))
    (parsed, position)
  }
}
