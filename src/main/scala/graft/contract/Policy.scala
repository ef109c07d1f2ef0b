package graft.contract

/** Contract policy vocabulary — the WHAT of the reference's validation
  * surface (cdf: crates/cdf-contract/src/policy.rs:242-261 `RowRule`,
  * :231-240 `ValidationDepth`; crates/cdf-kernel/src/resource.rs:419-425
  * write dispositions). Pure Scala; compiled to Spark `Column`
  * pipelines by [[ValidationProgram]].
  */
sealed trait RowRule { def id: String; def column: String }
object RowRule {
  /** column must be non-null (policy.rs:242-247). */
  final case class Nullability(id: String, column: String) extends RowRule
  /** value ∈ allowed string set (policy.rs:247-250). */
  final case class Domain(id: String, column: String, allowed: Seq[String]) extends RowRule
  /** min ≤ v ≤ max, typed (policy.rs:250-255). */
  final case class Range(id: String, column: String, min: Double, max: Double) extends RowRule
  /** regex match (policy.rs:255-258). */
  final case class Regex(id: String, column: String, pattern: String) extends RowRule
  /** col ≥ asOf − maxAgeMs (policy.rs:258-261). `asOf` is an explicit
    * instant, never wall-clock — replay determinism (SURVEY §7.1). */
  final case class Freshness(id: String, column: String, maxAgeMs: Long, asOfEpochMs: Long) extends RowRule
  /** custom boolean predicate over the row (program.rs:146-200). */
  final case class Custom(id: String, column: String, sqlPredicate: String) extends RowRule
}

/** Verdict lattice — every cell/row gets exactly ONE of these
  * (cdf: crates/cdf-contract/src/program.rs:385-397 `RuleOutcome`;
  * totality property-tested like `assert_verdict_lattice_total`). */
sealed abstract class Verdict(val rank: Int, val name: String)
object Verdict {
  case object Pass extends Verdict(0, "pass")
  case object Coerced extends Verdict(1, "coerced")
  case object AdmittedAsVariant extends Verdict(2, "admitted_as_variant")
  case object Violation extends Verdict(3, "violation")
  case object Fatal extends Verdict(4, "fatal")
  val all: Seq[Verdict] = Seq(Pass, Coerced, AdmittedAsVariant, Violation, Fatal)
  /** join = worst-of (monotone in rank). */
  def join(a: Verdict, b: Verdict): Verdict = if (a.rank >= b.rank) a else b
}

/** Row disposition derived from the joined verdict
  * (cdf: program.rs:378-420). */
sealed trait Disposition
object Disposition {
  case object Accept extends Disposition
  case object Quarantine extends Disposition
  case object RejectBatch extends Disposition
  case object RejectRun extends Disposition

  def ofVerdict(v: Verdict): Disposition = v match {
    case Verdict.Pass | Verdict.Coerced | Verdict.AdmittedAsVariant => Accept
    case Verdict.Violation => Quarantine
    case Verdict.Fatal => RejectBatch
  }
}

/** Validation depth rings (cdf: policy.rs:231-240): Discovery → Full →
  * Sampled after N clean runs; demote on anomaly. */
sealed trait ValidationDepth
object ValidationDepth {
  case object Discovery extends ValidationDepth
  case object Full extends ValidationDepth
  final case class Sampled(fraction: Double, seed: Long) extends ValidationDepth
}

/** A contract: rules + what a violation means per rule.
  * `fatalRules` escalate Violation→Fatal (RejectBatch). */
final case class ContractPolicy(
    rules: Seq[RowRule],
    fatalRules: Set[String] = Set.empty,
    depth: ValidationDepth = ValidationDepth.Full)

/** Trust presets (cdf: VISION.md:739-746; authoring surface
  * `TRUST GOVERNED`, examples/postgres/.../orders.cdf.sql): a trust
  * level is a bundle of contract defaults, not a new mechanism. */
sealed trait TrustPreset {
  /** validation starts at this depth ring. */
  def initialDepth: ValidationDepth
  /** violations escalate to Fatal (RejectBatch) instead of Quarantine. */
  def violationsAreFatal: Boolean
  /** schema drift default (SchemaOps.DriftPolicy.newColumns). */
  def driftNewColumns: String
}
object TrustPreset {
  /** exploratory: observe everything, quarantine nothing fatal. */
  case object Raw extends TrustPreset {
    val initialDepth = ValidationDepth.Discovery
    val violationsAreFatal = false
    val driftNewColumns = "admit"
  }
  /** production default: full validation, drift captured as variant. */
  case object Governed extends TrustPreset {
    val initialDepth = ValidationDepth.Full
    val violationsAreFatal = false
    val driftNewColumns = "admit_as_variant"
  }
  /** contract-critical: any violation rejects the batch, drift rejects. */
  case object Certified extends TrustPreset {
    val initialDepth = ValidationDepth.Full
    val violationsAreFatal = true
    val driftNewColumns = "reject_batch"
  }

  /** Apply a preset's defaults to a rule set. */
  def policy(preset: TrustPreset, rules: Seq[RowRule]): ContractPolicy =
    ContractPolicy(rules,
      fatalRules = if (preset.violationsAreFatal) rules.map(_.id).toSet else Set.empty,
      depth = preset.initialDepth)
}
