package graft.streaming

/** Transaction-bounded settlement units for CDC streams (cdf:
  * crates/cdf-runtime/src/cdc_log_source.rs:34-340 `SettlementUnitKind`,
  * `SettlementCadencePolicy`): a settlement unit is the atomic commit
  * granule of a CDC apply. The packing rule is the point: units close
  * on byte/op ceilings but NEVER split a source transaction — a
  * destination either sees all of a transaction's effects or none,
  * which is what makes ordered apply + replay safe.
  */
object Settlement {

  /** One source transaction's worth of change records. */
  final case class Txn(txId: Long, ops: Int, bytes: Long)

  final case class Policy(maxOps: Int, maxBytes: Long)

  /** Pack transactions (in commit order) into settlement units:
    * greedy fill, close when the NEXT transaction would exceed a
    * ceiling; an oversized single transaction becomes its own unit
    * (ceilings are targets, atomicity is law). */
  def pack(txns: Seq[Txn], p: Policy): Seq[Seq[Txn]] = {
    require(txns.map(_.txId) == txns.map(_.txId).sorted, "commit order required")
    val units = Seq.newBuilder[Seq[Txn]]
    var current = Vector.empty[Txn]
    var ops = 0
    var bytes = 0L
    txns.foreach { t =>
      val wouldExceed = current.nonEmpty &&
        (ops + t.ops > p.maxOps || bytes + t.bytes > p.maxBytes)
      if (wouldExceed) {
        units += current
        current = Vector.empty; ops = 0; bytes = 0L
      }
      current :+= t; ops += t.ops; bytes += t.bytes
    }
    if (current.nonEmpty) units += current
    units.result()
  }

  /** Invariants checked by the conformance test: order preserved, no
    * transaction split, every unit within ceilings unless it holds a
    * single oversized transaction. */
  def validate(txns: Seq[Txn], units: Seq[Seq[Txn]], p: Policy): Boolean = {
    val flat = units.flatten
    flat == txns &&
      units.forall(u => u.nonEmpty &&
        (u.size == 1 || (u.map(_.ops).sum <= p.maxOps && u.map(_.bytes).sum <= p.maxBytes)))
  }
}
