package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Z-ORDER (Morton-curve) file clustering, shared by the Iceberg and
  * Delta write paths: z-value = interleaved bits of per-column
  * quantile-rank buckets (16 buckets → 4 bits per column). Each output
  * file then covers a z-range whose projection onto EVERY listed
  * column is a blocky sub-range — footer min/max bounds tighten on all
  * of them, where a lexicographic sort only tightens its first column.
  *
  * Scale notes: the quantile bounds come from `approxQuantile` (one
  * sketch pass, never a sort); the layout itself is one range exchange
  * on the z-value plus a within-partition sort — exactly the cost of a
  * plain sorted write. The bucket count bounds the interleave at
  * 4·k bits, so the z-value stays a 32-bit int for k ≤ 8 columns.
  */
object ZOrderLayout {
  def apply(df: DataFrame, zorderBy: Seq[String], numPartitions: Int,
      nBuckets: Int = 16): DataFrame = {
    require(zorderBy.nonEmpty, "zorderBy must name at least one column")
    require(zorderBy.forall(df.columns.contains),
      s"zorder columns $zorderBy missing from ${df.columns.toSeq}")
    val qs = (1 until nBuckets).map(_.toDouble / nBuckets).toArray
    val bucketCols = zorderBy.map { c =>
      val bounds = df.stat.approxQuantile(c, qs, 0.01)
      bounds.distinct.map(b => when(col(c) > b, 1).otherwise(0))
        .reduceOption(_ + _).getOrElse(lit(0))
    }
    val k = zorderBy.length
    val z = (0 until 4).flatMap(j => bucketCols.zipWithIndex.map { case (bc, i) =>
      shiftleft(shiftright(bc, j).bitwiseAND(lit(1)), j * k + i)
    }).reduce(_ + _) // disjoint bit positions: + ≡ bitwise OR
    df.withColumn("__gz", z)
      .repartitionByRange(math.max(1, numPartitions), col("__gz"))
      .sortWithinPartitions(col("__gz"))
      .drop("__gz")
  }
}
