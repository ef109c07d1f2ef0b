package graft.run

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.StatsOps

/** Package replay: reconstruct a load from its evidence directory
  * without source contact (cdf: `cdf run --package`, crash-matrix row 2
  * VISION.md:807; pruning pass statistics_pruning.rs:27-160).
  *
  * Replay is where the stats manifest pays off: a driver-side pruning
  * pass over each package's recorded per-column min/max decides which
  * packages can possibly satisfy a predicate BEFORE any data file is
  * opened; missing stats conservatively retain (the "may skip work but
  * never produce identity-bearing bytes" law). On a 100 TB archive of
  * packages this turns a full re-scan into opening only the packages
  * whose stats ranges intersect the predicate.
  */
object Replay {

  final case class PruneDecision(dir: String, outcome: String)

  /** Decide per package from its stats parquet (written by
    * PackageWriter): prune | retained_may_match | retained_conservatively. */
  def prunePackages(spark: SparkSession, packageDirs: Seq[String],
      statCol: String, lo: Double, hi: Double): Seq[PruneDecision] =
    packageDirs.map { dir =>
      val statsPath = s"$dir/stats"
      val outcome =
        try {
          val stats = spark.read.parquet(statsPath)
          if (!stats.columns.contains(s"${statCol}__min")) "retained_conservatively"
          else {
            val row = stats.select(s"${statCol}__min", s"${statCol}__max").head()
            if (row.isNullAt(0) || row.isNullAt(1)) "retained_conservatively"
            else {
              val (mn, mx) = (row.getDouble(0), row.getDouble(1))
              if (mx >= lo && mn <= hi) "retained_may_match" else "pruned"
            }
          }
        } catch { case _: Exception => "retained_conservatively" }
      PruneDecision(dir, outcome)
    }

  /** Replay the union of surviving packages' data, re-applying the
    * predicate engine-side (pruning is advisory, correctness stays
    * with the filter). */
  def replay(spark: SparkSession, packageDirs: Seq[String],
      statCol: String, lo: Double, hi: Double): (DataFrame, Seq[PruneDecision]) = {
    val decisions = prunePackages(spark, packageDirs, statCol, lo, hi)
    val survivors = decisions.filter(_.outcome != "pruned").map(d => s"${d.dir}/data")
    require(survivors.nonEmpty, "all packages pruned — nothing to replay")
    val df = spark.read.parquet(survivors: _*)
      .filter(org.apache.spark.sql.functions.col(statCol).between(lo, hi))
    (df, decisions)
  }
}
