package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-aware equi-join by key salting: the hot-key mitigation for the
  * shuffles this engine does emit (dedup/merge keys — SURVEY §4
  * "Shuffle" row; AQE's skew-join handles sort-merge cases, salting
  * covers the hash-partition paths AQE can't split, e.g. a merge key
  * where one tenant owns half the rows).
  *
  * Left (large, skewed) rows get a deterministic salt in [0, n);
  * right (smaller) rows are replicated n ways. The join key becomes
  * (key, salt) so one hot key spreads over n partitions. Salt is
  * derived from stable columns via xxhash64 — NOT rand() — so replays
  * produce identical partitioning (determinism law).
  */
object Salting {

  def saltedJoin(left: DataFrame, right: DataFrame, key: String, salts: Int,
      saltSource: Seq[String]): DataFrame = {
    require(salts > 0)
    val l = left.withColumn("_salt",
      pmod(xxhash64(saltSource.map(col): _*), lit(salts.toLong)))
    val r = right.withColumn("_salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    l.join(r, Seq(key, "_salt")).drop("_salt")
  }
}
