package graft.core

/** Typed error taxonomy (cdf: VISION.md:986-994): every failure is
  * classified so retry/recovery policy is mechanical — `Data` errors
  * fail the batch cleanly before artifacts exist, `Plan` errors are
  * author-time, `State`/`Destination` errors gate the commit path.
  */
sealed abstract class GraftError(msg: String) extends RuntimeException(msg) {
  def kind: String
  def retryable: Boolean
}

object GraftError {
  /** malformed/contract-violating data beyond policy tolerance. */
  final case class Data(msg: String) extends GraftError(msg) {
    def kind = "data"; def retryable = false
  }
  /** author-time plan rejection (shape/type/volatility admission). */
  final case class Plan(msg: String) extends GraftError(msg) {
    def kind = "plan"; def retryable = false
  }
  /** source unavailable/inconsistent (position invalid, file vanished). */
  final case class Resource(msg: String, transient: Boolean) extends GraftError(msg) {
    def kind = "resource"; def retryable = transient
  }
  /** destination write/verify failure — commit gate refuses. */
  final case class Destination(msg: String, transient: Boolean) extends GraftError(msg) {
    def kind = "destination"; def retryable = transient
  }
  /** ledger/state-store inconsistency (commit without proposal, drift). */
  final case class State(msg: String) extends GraftError(msg) {
    def kind = "state"; def retryable = false
  }
}
