package graft.contract

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Normalize-stage transforms (cdf: crates/cdf-contract/src/
  * transforms.rs:1-18; applied in crates/cdf-engine/src/execution/
  * orchestration.rs:189-236 `normalize_record_batch`).
  *
  * Each lowers to a stock Catalyst operation — rename/cast/derive/
  * filter stay inside whole-stage codegen; Redact is `sha2` (no UDF).
  */
sealed trait Transform
object Transform {
  final case class Rename(from: String, to: String) extends Transform
  /** cast gated by the lossless-widening table at plan time (§1.2). */
  final case class Cast(column: String, toType: String) extends Transform
  final case class Derive(column: String, sqlExpr: String) extends Transform
  final case class Filter(sqlPredicate: String) extends Transform
  /** PII masking, never plaintext (cdf VISION.md:723). */
  final case class Redact(column: String) extends Transform

  def apply(df: DataFrame, ts: Seq[Transform]): DataFrame =
    ts.foldLeft(df) {
      case (acc, Rename(f, t)) => acc.withColumnRenamed(f, t)
      case (acc, Cast(c, t)) => acc.withColumn(c, col(c).cast(t))
      case (acc, Derive(c, e)) => acc.withColumn(c, expr(e))
      case (acc, Filter(p)) => acc.filter(expr(p))
      case (acc, Redact(c)) => acc.withColumn(c, sha2(col(c).cast("string"), 256))
    }
}

/** `namecase-v1` identifier normalization (cdf: VISION.md:405-407,
  * crates/cdf-contract/src/normalization.rs): NFC → lower_snake →
  * charset filter → truncate + 8-hex content hash on overflow.
  * Collisions after normalization are a plan error, not a runtime one.
  */
object Namecase {
  val MaxLen = 63

  def normalize(name: String): String = {
    val nfc = java.text.Normalizer.normalize(name, java.text.Normalizer.Form.NFC)
    val snake = nfc
      .replaceAll("([a-z0-9])([A-Z])", "$1_$2")
      .toLowerCase
      .replaceAll("[^a-z0-9_]+", "_")
      .replaceAll("_+", "_")
      .stripPrefix("_").stripSuffix("_")
    val base = if (snake.isEmpty) "col" else snake
    val named = if (base.head.isDigit) s"c_$base" else base
    if (named.length <= MaxLen) named
    else {
      val h = java.security.MessageDigest.getInstance("SHA-256")
        .digest(named.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
      // trailing underscores at the cut would create `__` (and break
      // idempotence — found by the property fuzzer)
      named.take(MaxLen - 9).replaceAll("_+$", "") + "_" + h
    }
  }

  /** Normalize every column; duplicate post-normalization names are a
    * plan-time error (cdf: collision = plan error). */
  def normalizeColumns(df: DataFrame): DataFrame = {
    val mapped = df.columns.map(c => c -> normalize(c))
    val dupes = mapped.groupBy(_._2).filter(_._2.length > 1).keys
    require(dupes.isEmpty, s"namecase-v1 collision: ${dupes.mkString(", ")}")
    mapped.foldLeft(df) { case (acc, (from, to)) =>
      if (from == to) acc else acc.withColumnRenamed(from, to)
    }
  }
}
