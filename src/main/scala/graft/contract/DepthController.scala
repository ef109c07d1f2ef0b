package graft.contract

import org.apache.spark.sql.DataFrame

/** Validation depth rings (cdf: crates/cdf-contract/src/policy.rs:231-240
  * `ValidationDepth`, program.rs:428-447): Discovery → Full →
  * Sampled after N clean runs; any anomaly demotes back to Full.
  * Every transition is an event the caller records in the ledger.
  *
  * At 100 TB this is the knob that turns full-scan validation into a
  * deterministic-sample validation once a source has earned trust —
  * the sample is seeded, so replays validate identical rows.
  */
object DepthController {

  sealed trait Ring
  case object Discovery extends Ring
  case object Full extends Ring
  final case class Sampled(fraction: Double) extends Ring

  final case class State(ring: Ring, cleanRuns: Int)
  final case class Config(
      promoteAfterCleanRuns: Int = 3,
      sampleFraction: Double = 0.1,
      seed: Long = 42L)

  final case class Transition(from: Ring, to: Ring, reason: String)

  /** Advance the ring after a run. `anomalies` = quarantined+rejected. */
  def advance(s: State, anomalies: Long, cfg: Config = Config()): (State, Option[Transition]) = {
    if (anomalies > 0) {
      val t = if (s.ring != Full) Some(Transition(s.ring, Full, s"demote: $anomalies anomalies")) else None
      (State(Full, 0), t)
    } else s.ring match {
      case Discovery =>
        (State(Full, 1), Some(Transition(Discovery, Full, "first clean run")))
      case Full if s.cleanRuns + 1 >= cfg.promoteAfterCleanRuns =>
        (State(Sampled(cfg.sampleFraction), 0),
          Some(Transition(Full, Sampled(cfg.sampleFraction),
            s"promote after ${s.cleanRuns + 1} clean runs")))
      case Full => (State(Full, s.cleanRuns + 1), None)
      case r: Sampled => (State(r, s.cleanRuns + 1), None)
    }
  }

  /** The rows the current ring actually validates: full frame, or a
    * seeded deterministic sample (replays validate identical rows). */
  def validationInput(df: DataFrame, ring: Ring, cfg: Config = Config()): DataFrame =
    ring match {
      case Sampled(f) => df.sample(withReplacement = false, f, cfg.seed)
      case _ => df
    }
}
