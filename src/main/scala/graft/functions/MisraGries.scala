package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoder

/** Misra–Gries heavy-hitters sketch as a typed Aggregator (mergeable
  * summaries form, Agarwal et al. PODS'12): at most `capacity`
  * counters ever exist, each item's estimate undercounts its true
  * frequency by at most n/capacity, and — the guarantee the confirm
  * pass relies on — EVERY item with true frequency > n/capacity is
  * present in the final sketch.
  *
  * Scale shape: the exact heavy-hitters groupBy shuffles one row per
  * DISTINCT token (trillions, mostly singletons, at corpus scale);
  * the sketch shuffles at most `capacity` counters per map partition
  * with map-side combine, then a second exact pass confirms counts
  * for only the ≤capacity candidates — sketch-prune-confirm, the same
  * shape as the Bloom incremental dedup. Results are EXACT (the
  * sketch only prunes; confirmed counts come from real aggregation).
  *
  * reduce: add the item; on overflow subtract the minimum count from
  * every counter and drop zeros (batched decrement — each such step
  * retires ≥1 counter and charges every surviving estimate equally).
  * merge: sum counters; if over capacity, subtract the (capacity+1)-th
  * largest count and keep the positive residuals. Errors add, so the
  * merged sketch keeps the n/capacity bound over the combined stream.
  */
final case class MgBuf(counts: Map[String, Long])

class MisraGries(capacity: Int)
    extends Aggregator[String, MgBuf, Map[String, Long]] {
  require(capacity > 0)

  override def zero: MgBuf = MgBuf(Map.empty)

  override def reduce(b: MgBuf, item: String): MgBuf = {
    val c = b.counts.updatedWith(item)(v => Some(v.getOrElse(0L) + 1L))
    if (c.size <= capacity) MgBuf(c)
    else {
      val m = c.valuesIterator.min
      MgBuf(c.collect { case (k, v) if v > m => k -> (v - m) })
    }
  }

  override def merge(x: MgBuf, y: MgBuf): MgBuf = {
    val c = y.counts.foldLeft(x.counts) { case (acc, (k, v)) =>
      acc.updatedWith(k)(o => Some(o.getOrElse(0L) + v))
    }
    if (c.size <= capacity) MgBuf(c)
    else {
      // subtract the (capacity+1)-th largest count: ≤capacity survive
      val cut = c.valuesIterator.toArray.sortInPlace()(Ordering[Long].reverse)
        .apply(capacity)
      MgBuf(c.collect { case (k, v) if v > cut => k -> (v - cut) })
    }
  }

  override def finish(r: MgBuf): Map[String, Long] = r.counts
  override def bufferEncoder: Encoder[MgBuf] = ExpressionEncoder[MgBuf]()
  override def outputEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
}
