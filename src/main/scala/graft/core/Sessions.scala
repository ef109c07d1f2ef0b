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

  /** Run `body` with streaming-sized shuffle parallelism. Stateful
    * streaming queries pay per-micro-batch fixed cost PER STATE
    * PARTITION (store open/commit/snapshot × partitions × batches);
    * the catalog's drain fixtures are driver-fed MemoryStreams, so 32
    * state partitions buy nothing and quadruple the fixed cost. 8
    * keeps state genuinely distributed (and the results are partition-
    * count invariant — only the wall changes). On a real cluster,
    * size state partitions to executor count through this same conf. */
  def withStreamingShuffle[T](s: SparkSession)(body: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val prev = s.conf.get(key)
    s.conf.set(key, "8")
    try body finally s.conf.set(key, prev)
  }
}
