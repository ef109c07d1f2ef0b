package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Cross-batch keyed dedup — the reference's single `StatefulBarrier`
  * node (cdf: crates/cdf-runtime/src/graph.rs:26; SURVEY §2.7
  * "flatMapGroupsWithState if cross-batch").
  *
  * Within one epoch, dedup is a plain shuffle (`Dedup.keyed`); across
  * epochs the set of already-seen keys must persist, which is exactly
  * Spark's keyed state store. State per key is just the last-emitted
  * position (monotone), so state size is O(distinct keys), partitioned
  * by the shuffle — the 100 TB shape, with state in RocksDB when
  * configured.
  */
object StatefulDedup {

  final case class Keyed(key: String, position: Long, payload: String)

  implicit private val keyedEnc: Encoder[Keyed] = Encoders.product[Keyed]
  implicit private val strEnc: Encoder[String] = Encoders.STRING
  implicit private val longEnc: Encoder[Long] = Encoders.scalaLong

  /** Emit a row only when its key is unseen OR its position advances
    * beyond the stored one (keep=Last across epochs: later positions
    * supersede; duplicates and stale replays are dropped). */
  def emitNew(key: String, rows: Iterator[Keyed],
      state: GroupState[Long]): Iterator[Keyed] = {
    val seenUpTo = if (state.exists) state.get else Long.MinValue
    val fresh = rows.filter(_.position > seenUpTo).toSeq
    if (fresh.isEmpty) Iterator.empty
    else {
      val winner = fresh.maxBy(_.position)
      state.update(winner.position)
      Iterator.single(winner)
    }
  }

  /** Batch/stream-agnostic wiring: groupByKey on the dedup key +
    * flatMapGroupsWithState over the position state. */
  def apply(ds: Dataset[Keyed]): Dataset[Keyed] =
    ds.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.NoTimeout())(emitNew)
}
