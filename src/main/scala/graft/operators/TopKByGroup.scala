package graft.operators

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Encoder, Encoders}

/** Bounded top-k per group WITHOUT a rank window — the scale-safe
  * idiom for "top 3 per category" over groups of any size.
  *
  * `row_number() OVER (PARTITION BY g ORDER BY v DESC) <= k` sorts
  * EVERY row of every group (one task per group at few-group scale);
  * `collect_list` then slicing buffers whole groups. This Aggregator
  * keeps a k-bounded, sorted buffer instead: `reduce` inserts into a
  * ≤k vector, `merge` merges two ≤k vectors — both O(k), both
  * MERGEABLE, so Spark runs it with partial aggregation (map-side
  * combine) and the shuffle carries at most k (value, id) pairs per
  * group per map task. Deterministic: total order (value desc, id asc)
  * breaks ties.
  */
object TopKByGroup {

  final case class Entry(v: Long, id: Long)
  final case class Buf(items: Seq[Entry])

  private def ord: Ordering[Entry] =
    Ordering.by[Entry, (Long, Long)](e => (-e.v, e.id))

  final class TopKAgg(k: Int) extends Aggregator[Entry, Buf, Seq[Entry]] {
    def zero: Buf = Buf(Vector.empty)
    def reduce(b: Buf, a: Entry): Buf = {
      if (b.items.length == k && ord.gteq(a, b.items.last)) b
      else Buf((b.items :+ a).sorted(ord).take(k))
    }
    def merge(b1: Buf, b2: Buf): Buf =
      Buf((b1.items ++ b2.items).sorted(ord).take(k))
    def finish(r: Buf): Seq[Entry] = r.items.sorted(ord).take(k)
    def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    def outputEncoder: Encoder[Seq[Entry]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Entry]]()
  }

  /** (groupCols..., rank (1-based), `idCol`, `valueCol`) of the top-k
    * rows per group by (`valueCol` desc, `idCol` asc). Both columns
    * must be LongType (the catalog's exact-integer discipline). */
  def topK(df: DataFrame, groupCols: Seq[String], valueCol: String,
      idCol: String, k: Int): DataFrame = {
    val g = groupCols.map(col)
    val agg = udaf(new TopKAgg(k))
    val rows = df
      .groupBy(g: _*)
      .agg(agg(col(valueCol), col(idCol)).as("__top"))
      .select(g :+ posexplode(col("__top")): _*)
    rows.select(g ++ Seq((col("pos") + 1).cast("long").as("rank"),
      col("col.id").as(idCol), col("col.v").as(valueCol)): _*)
  }
}
