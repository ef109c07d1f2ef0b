package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The `cdf sql` ops/metadata surface (cdf: crates/cdf-cli/src/
  * system_sql.rs:16-31,76-95 — 14 SQLite-mounted fact tables).
  * Spark-first: the same facts mount as temp views and get full Spark
  * SQL (joins/aggregates/windows), strictly superseding the
  * reference's read-only SQLite surface.
  */
object SystemTables {

  /** Mount ledger + package-manifest facts under `graft_*` views. */
  def mount(spark: SparkSession, ledger: Ledger, packageDirs: Seq[String]): Unit = {
    import spark.implicits._

    val entries = ledger.entries().map(e =>
      (e.seq, e.resource, e.scope, e.state, e.packageHash, e.position, e.receipt))
    entries.toDF("seq", "resource", "scope", "state", "package_hash", "position", "receipt")
      .createOrReplaceTempView("graft_checkpoints")

    val manifests = packageDirs.flatMap { dir =>
      val p = java.nio.file.Paths.get(dir, "manifest.json")
      if (java.nio.file.Files.exists(p)) {
        val s = java.nio.file.Files.readString(p)
        def f(k: String): Option[String] =
          ("\"" + k + "\":(\"[^\"]*\"|-?\\d+)").r.findFirstMatchIn(s).map(_.group(1))
            .map(v => if (v.startsWith("\"")) v.substring(1, v.length - 1) else v)
        Some((dir, f("resource").getOrElse(""), f("plan_hash").getOrElse(""),
          f("row_count").map(_.toLong).getOrElse(0L),
          f("quarantine_count").map(_.toLong).getOrElse(0L),
          f("content_hash").getOrElse(""),
          CanonicalJson.sha256Hex(s)))
      } else None
    }
    manifests.toDF("dir", "resource", "plan_hash", "row_count",
        "quarantine_count", "content_hash", "package_hash")
      .createOrReplaceTempView("graft_packages")
  }

  /** Ledger-head vs destination drift check (cdf doctor_drift.rs):
    * rows whose committed package hash has no matching package dir or
    * whose manifest disagrees with the ledger. */
  def driftReport(spark: SparkSession): DataFrame =
    spark.sql("""
      SELECT c.resource, c.scope, c.package_hash,
             p.dir IS NULL AS missing_package
      FROM graft_checkpoints c
      LEFT JOIN graft_packages p ON c.package_hash = p.package_hash
      WHERE c.state = 'committed'
    """)
}
