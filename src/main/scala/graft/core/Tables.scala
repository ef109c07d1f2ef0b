package graft.core

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, unix_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

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

  /** Footer-inferred schema per (dir, table), cached for the JVM: a
    * bare `spark.read.parquet` re-runs a one-task schema-inference job
    * on EVERY call, which at 185 catalog queries × reps is pure
    * scheduling overhead (the files are driver-generated and immutable
    * for a run). Declaring the schema is also the 100 TB discipline —
    * production scans never infer. */
  private val schemaCache = scala.collection.concurrent.TrieMap
    .empty[(String, Long, Long), org.apache.spark.sql.types.StructType]

  /** Cache key = (path, total length, max mtime) — same law as
    * ParquetFooters' footerCache, so a test or bench that REGENERATES a
    * file at the same path in the same JVM re-infers instead of
    * silently decoding with a stale schema. */
  private def cacheKey(path: String): (String, Long, Long) = {
    val f = new java.io.File(path)
    if (f.isDirectory) {
      val kids = Option(f.listFiles()).getOrElse(Array.empty[java.io.File])
      (path, kids.map(_.length).sum,
        kids.foldLeft(f.lastModified)((m, k) => math.max(m, k.lastModified)))
    } else (path, f.length, f.lastModified)
  }

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val path = s"$sfDir/$name.parquet"
    val schema = schemaCache.getOrElseUpdate(cacheKey(path),
      spark.read.parquet(path).schema)
    spark.read.schema(schema).parquet(path)
  }

  /** Register every table as a temp view so `spark.sql` works over the
    * same names DuckDB sees (the `cdf sql` surface, SURVEY §3.2). */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => apply(spark, sfDir, n).createOrReplaceTempView(n))

  /** Micros-since-epoch view of an event-time column, adaptive to the
    * physical grain the driver generated it at. The testdata has shipped
    * `events.ts` both as parquet TIMESTAMP(NANOS) — which Spark reads as
    * BIGINT under `nanosAsLong` (Sessions.local) — and as TIMESTAMP(µs),
    * which Spark reads natively (NTZ when not UTC-adjusted). Both grains
    * land on the same exact BIGINT micros, which is also what DuckDB's
    * `epoch_us(ts)` yields, so oracles are unchanged. The NTZ branch
    * relies on the UTC session timezone (Sessions.local) making the
    * wall-clock→instant cast value-preserving. */
  def tsUs(df: DataFrame, c: String = "ts"): Column = df.schema(c).dataType match {
    case LongType         => expr(s"$c div 1000")
    case TimestampType    => unix_micros(col(c))
    case TimestampNTZType => unix_micros(col(c).cast(TimestampType))
    case other =>
      throw new IllegalArgumentException(s"event-time column $c: unsupported type $other")
  }

  /** `events` with `ts` replaced by exact BIGINT micros `ts_us` — the
    * common grain every catalog query and oracle agrees on. */
  def eventsUs(spark: SparkSession, sfDir: String): DataFrame = {
    val df = apply(spark, sfDir, "events")
    df.withColumn("ts_us", tsUs(df)).drop("ts")
  }

  /** `events` with `ts` as a proper TIMESTAMP at the exact µs grain —
    * the shape streaming operators (watermarks, session windows) want. */
  def eventsTs(spark: SparkSession, sfDir: String): DataFrame = {
    val df = apply(spark, sfDir, "events")
    df.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(tsUs(df)))
  }
}
