package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Canonical access to the driver-generated testdata tables
  * (`/root/testdata/sf*`; see /root/repo/TESTDATA.md).
  *
  * Mirrors the reference's notion of a registered resource scan
  * (cdf: crates/cdf-kernel/src/resource.rs:29-189 `ResourceDescriptor`):
  * every query starts from a declarative `spark.read.parquet` scan so
  * Catalyst can push projections/filters into the parquet reader.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Register every table as a temp view so `spark.sql` works over the
    * same names DuckDB sees (the `cdf sql` surface, SURVEY §3.2). */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => apply(spark, sfDir, n).createOrReplaceTempView(n))
}
