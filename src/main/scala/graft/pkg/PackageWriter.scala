package graft.pkg

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.CanonicalJson._
import graft.operators.StatsOps

/** Hash-addressed run package: the evidence directory that makes a
  * load replayable and verifiable (cdf: VISION.md:762-790; builder
  * crates/cdf-package/).
  *
  * Layout (decision recorded in SURVEY §7.1 — Parquet, not Arrow IPC):
  *   <dir>/data/        accepted rows (Parquet)
  *   <dir>/quarantine/  quarantined rows + verdicts (Parquet)
  *   <dir>/stats/       per-column stats (Parquet, 1 row)
  *   <dir>/manifest.json  canonical manifest; its sha256 IS the
  *                        package identity
  *
  * Identity discipline: Parquet bytes are NOT stable across writers,
  * so the manifest hashes canonical LOGICAL content — a partition-
  * order-independent content hash (sum of per-row xxhash64 mod 2^63)
  * plus row/column counts — making package identity invariant to
  * partitioning ("jobs invariance", cdf docs/performance-envelope.md:103).
  */
object PackageWriter {

  final case class PackageResult(dir: String, packageHash: String, rows: Long,
      quarantined: Long, manifest: String, segments: Int = 1,
      contentHash: String = "")

  /** Row count + content hash in ONE aggregation job (one pass over
    * the data instead of two). */
  def countAndHash(df: DataFrame): (Long, String) = {
    if (df.columns.isEmpty) (df.count(), "0")
    else {
      val r = df.select(xxhash64(df.columns.map(col): _*)
          .cast(org.apache.spark.sql.types.DecimalType(38, 0)).as("h"))
        .agg(count(lit(1)).as("c"), sum(col("h")).as("s"))
        .head()
      (r.getLong(0),
        if (r.isNullAt(1)) "0" else r.getDecimal(1).toBigInteger.toString)
    }
  }

  /** Partition-order-independent logical content hash: exact decimal
    * sum of per-row xxhash64 over all columns — commutative,
    * overflow-free (ANSI-safe), invariant to partitioning. */
  def contentHash(df: DataFrame): String = countAndHash(df)._2

  /** `maxRecordsPerFile = 0` leaves the writer's file sizing alone;
    * a positive value caps rows per written file (segmentation with no
    * pre-count and no shuffle — see Segmentation.maxRecordsPerFile). */
  def write(df: DataFrame, quarantine: Option[DataFrame], dir: String,
      resource: String, planHash: String,
      maxRecordsPerFile: Long = 0L): PackageResult = {
    val dataDir = s"$dir/data"
    val qDir = s"$dir/quarantine"
    val statsDir = s"$dir/stats"

    val w = df.write.mode("overwrite")
    (if (maxRecordsPerFile > 0L) w.option("maxRecordsPerFile", maxRecordsPerFile)
     else w).parquet(dataDir)
    val written = df.sparkSession.read.parquet(dataDir)

    val numericCols = written.schema.fields.filter(f =>
      f.dataType.typeName match {
        case "integer" | "long" | "double" | "float" | "string" | "timestamp" => true
        case _ => false
      }).map(_.name).toSeq
    // ONE aggregation pass over the written package: row count +
    // content hash + the full per-column stats profile (two jobs fused
    // — at 100 TB the package read-back is the cost, not the agg).
    val aggs = StatsOps.statsAggs(numericCols)
    val combined = written
      .select(col("*"), xxhash64(written.columns.map(col): _*)
        .cast(org.apache.spark.sql.types.DecimalType(38, 0)).as("__h"))
      .agg(aggs.head, sum(col("__h")).as("__hash_sum") +: aggs.tail: _*)
      .persist()
    val cRow = combined.head()
    val rows = cRow.getLong(0)
    val hash = if (cRow.isNullAt(1)) "0" else cRow.getDecimal(1).toBigInteger.toString
    combined.drop("__hash_sum").coalesce(1).write.mode("overwrite").parquet(statsDir)
    combined.unpersist()

    val segments = {
      val d = new java.io.File(dataDir)
      val n = Option(d.list()).map(_.count(_.startsWith("part-"))).getOrElse(0)
      math.max(1, n)
    }

    // count the quarantine from what was WRITTEN, not by re-running the
    // quarantine pipeline over the source (that would be a second full
    // source scan — the written parquet footprint is tiny by comparison)
    val qRows = quarantine.map { q =>
      q.write.mode("overwrite").parquet(qDir)
      df.sparkSession.read.parquet(qDir).count()
    }.getOrElse(0L)

    writeManifest(dir, resource, planHash, rows, qRows, written.columns.toSeq, hash, segments)
  }

  /** Render + persist the canonical package manifest; shared by the
    * per-package writer and bulk (partitioned) writers. */
  def writeManifest(dir: String, resource: String, planHash: String, rows: Long,
      qRows: Long, columns: Seq[String], hash: String, segments: Int): PackageResult = {
    val manifest = JObj.of(
      "manifest_version" -> JInt(1),
      "resource" -> JStr(resource),
      "plan_hash" -> JStr(planHash),
      "row_count" -> JInt(rows),
      "quarantine_count" -> JInt(qRows),
      "columns" -> JArr(columns.sorted.map(JStr(_))),
      "content_hash" -> JStr(hash),
      "layout" -> JArr(Seq("data/", "quarantine/", "stats/", "manifest.json").map(JStr)))
    val rendered = render(manifest)
    val pkgHash = sha256Hex(rendered)
    Files.createDirectories(Paths.get(dir))
    Files.write(Paths.get(dir, "manifest.json"), rendered.getBytes(StandardCharsets.UTF_8))
    PackageResult(dir, pkgHash, rows, qRows, rendered, segments, hash)
  }

  /** Destination receipt: durable, independently verifiable ack
    * (cdf VISION.md:935-954). `verify` re-probes the destination. */
  final case class Receipt(destination: String, rows: Long, contentHash: String) {
    def toJsonString: String = render(JObj.of(
      "destination" -> JStr(destination), "rows" -> JInt(rows),
      "content_hash" -> JStr(contentHash)))
  }

  /** Post-commit verification probe: recount + rehash the destination
    * table (one combined pass) and compare to the receipt. Tampered
    * loads must fail. */
  def verifyReceipt(dest: DataFrame, r: Receipt): Boolean = {
    val (c, h) = countAndHash(dest)
    c == r.rows && h == r.contentHash
  }
}
