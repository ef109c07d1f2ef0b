package graft.core

import org.apache.spark.sql.SparkSession

/** Single place for session construction so Verify / Bench / tests get
  * identical semantics.
  *
  * - UTC session timezone (cdf fidelity rule: timestamps keep their
  *   zone story, VISION.md:391-397).
  * - `nanosAsLong`: the testdata `events.ts` column is parquet
  *   TIMESTAMP(NANOS), which Spark cannot represent natively; we read
  *   it as BIGINT nanoseconds and convert explicitly — truncation to
  *   micros is then a visible, deterministic `DIV 1000`, matching the
  *   reference's plan-visible coercion discipline (SURVEY §1.2).
  * - AQE on: runtime shuffle coalescing + skew-join handling are the
  *   100 TB story for every shuffle we emit.
  */
object Sessions {
  def local(cores: String, shufflePartitions: String): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
