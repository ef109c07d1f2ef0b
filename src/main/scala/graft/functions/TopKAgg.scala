package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Per-key top-k as a typed Aggregator (SURVEY §2.11 "UDAF equivalent
  * → Aggregator[IN,BUF,OUT]").
  *
  * The window-function formulation (`row_number() <= k`) shuffles and
  * fully sorts EVERY row of every key; this aggregator keeps a bounded
  * k-element buffer per key with map-side partial aggregation, so the
  * shuffle carries at most k rows per key per mapper — the difference
  * between sorting 100 TB and merging kilobytes at scale.
  *
  * Ordering: (value DESC, id ASC) — a total order, so results are
  * deterministic and oracle-checkable.
  */
final case class Scored(value: Double, id: Long)
final case class TopKBuf(items: Seq[Scored])

class TopKAgg(k: Int) extends Aggregator[Scored, TopKBuf, Seq[Scored]] {
  require(k > 0)

  private def better(a: Scored, b: Scored): Boolean =
    a.value > b.value || (a.value == b.value && a.id < b.id)

  private def trim(items: Seq[Scored]): Seq[Scored] =
    items.sortWith(better).take(k)

  override def zero: TopKBuf = TopKBuf(Vector.empty)
  override def reduce(b: TopKBuf, a: Scored): TopKBuf =
    // cheap guard: skip sorting when the candidate can't enter a full buffer
    if (b.items.size >= k && !better(a, b.items.last)) b
    else TopKBuf(trim(b.items :+ a))
  override def merge(x: TopKBuf, y: TopKBuf): TopKBuf = TopKBuf(trim(x.items ++ y.items))
  override def finish(r: TopKBuf): Seq[Scored] = trim(r.items)
  override def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
  override def outputEncoder: Encoder[Seq[Scored]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
}
