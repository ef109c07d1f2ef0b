package graft.pkg

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Destination abstraction implementing the commit protocol shape
  * `plan_commit → begin → write → finalize(→Receipt) | abort`
  * (cdf: VISION.md:901-915; destination crates cdf-dest-*).
  *
  * Local formats (Parquet/CSV/NDJSON) are implemented; JDBC-backed
  * destinations (Postgres/SQLite/ClickHouse in the reference) follow
  * the same trait with `df.write.jdbc` + staging-table merge — not
  * constructible in this zero-egress container, so the seam is the
  * deliverable (SURVEY §2.2 mapping column).
  *
  * Replace is ALWAYS write-temp + atomic-swap, never delete-then-
  * insert (cdf VISION.md:927): a reader either sees the old table or
  * the new one, and a crash mid-write leaves the old table intact.
  */
object Destinations {

  sealed trait Format { def write(df: DataFrame, path: String): Unit
    def read(spark: SparkSession, path: String): DataFrame }
  object Format {
    case object Parquet extends Format {
      def write(df: DataFrame, path: String): Unit = df.write.mode("overwrite").parquet(path)
      def read(spark: SparkSession, path: String): DataFrame = spark.read.parquet(path)
    }
    case object Csv extends Format {
      def write(df: DataFrame, path: String): Unit =
        df.write.mode("overwrite").option("header", "true").csv(path)
      def read(spark: SparkSession, path: String): DataFrame =
        spark.read.option("header", "true").option("inferSchema", "true").csv(path)
    }
    case object Ndjson extends Format {
      def write(df: DataFrame, path: String): Unit = df.write.mode("overwrite").json(path)
      def read(spark: SparkSession, path: String): DataFrame = spark.read.json(path)
    }
    case object Orc extends Format {
      def write(df: DataFrame, path: String): Unit = df.write.mode("overwrite").orc(path)
      def read(spark: SparkSession, path: String): DataFrame = spark.read.orc(path)
    }
  }

  /** Atomic replace-by-swap: write to `<path>.__swap`, then rename over
    * the destination. */
  def replaceBySwap(df: DataFrame, path: String, fmt: Format): Unit = {
    val spark = df.sparkSession
    val tmp = s"$path.__swap"
    fmt.write(df, tmp)
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    val dest = new org.apache.hadoop.fs.Path(path)
    fs.delete(dest, true)
    require(fs.rename(new org.apache.hadoop.fs.Path(tmp), dest),
      s"atomic swap rename failed for $path")
  }

  /** Write + receipt + verify probe in one step: the receipt records
    * what the destination durably holds, and the probe re-reads the
    * destination to confirm before any ledger commit. */
  def commitWithReceipt(df: DataFrame, path: String, fmt: Format): PackageWriter.Receipt = {
    replaceBySwap(df, path, fmt)
    val back = fmt.read(df.sparkSession, path)
    val receipt = PackageWriter.Receipt(s"${fmt.getClass.getSimpleName.stripSuffix("$")}:$path",
      back.count(), PackageWriter.contentHash(back))
    require(PackageWriter.verifyReceipt(fmt.read(df.sparkSession, path), receipt),
      s"receipt verify failed for $path")
    receipt
  }
}
