package graft.core

/** Resource descriptor vocabulary (cdf: crates/cdf-kernel/src/
  * resource.rs:29-189 `ResourceDescriptor`, :389-425 cursor +
  * dispositions, :523-529 fidelity, :567-622 scan negotiation).
  * Pure Scala plan-time values; serialized into the compiled plan
  * artifact and the ledger.
  */
object Descriptor {

  /** Pushdown fidelity (resource.rs:523-529): `Exact` results need no
    * re-check; `Inexact` sources return supersets and the engine
    * re-applies the predicate; `Unsupported` stays engine-side. */
  sealed trait Fidelity
  object Fidelity {
    case object Exact extends Fidelity
    case object Inexact extends Fidelity
    case object Unsupported extends Fidelity
  }

  /** Write dispositions (resource.rs:419-425, VISION.md:921-931). */
  sealed trait Disposition
  object Disposition {
    case object Append extends Disposition
    case object Replace extends Disposition
    final case class Merge(keys: Seq[String]) extends Disposition
    final case class CdcApply(keys: Seq[String], opColumn: String) extends Disposition
  }

  /** Cursor ordering claim (resource.rs:389-402): how trustworthy the
    * source's ordering is, which decides the window-close lag. */
  sealed trait OrderingClaim
  object OrderingClaim {
    case object Exact extends OrderingClaim
    case object Inexact extends OrderingClaim
    case object Unordered extends OrderingClaim
  }

  final case class CursorSpec(field: String, lagMs: Long, ordering: OrderingClaim)

  final case class FreshnessSpec(maxAgeMs: Long)

  /** Sub-resource single-writer state key (cdf VISION.md:873-875). */
  sealed trait ScopeKey { def render: String }
  object ScopeKey {
    final case class Partition(id: String) extends ScopeKey { def render = s"partition:$id" }
    final case class Window(lo: Long, hi: Long) extends ScopeKey { def render = s"window:$lo..$hi" }
    final case class File(path: String) extends ScopeKey { def render = s"file:$path" }
    final case class Stream(id: String) extends ScopeKey { def render = s"stream:$id" }
    case object Root extends ScopeKey { def render = "root" }
  }

  /** Schema authority source (resource.rs:197-219). */
  sealed trait SchemaSource
  object SchemaSource {
    final case class Declared(ddl: String) extends SchemaSource
    case object Discover extends SchemaSource
  }

  final case class ResourceDescriptor(
      id: String,
      schemaSource: SchemaSource,
      primaryKey: Seq[String],
      cursor: Option[CursorSpec],
      disposition: Disposition,
      freshness: Option[FreshnessSpec] = None,
      bounded: Boolean = true)

  /** Negotiated read (resource.rs:567-610): what the engine asked for
    * and what the source promised, recorded as evidence. */
  final case class ScanPredicate(sql: String, fidelity: Fidelity)
  /** order-by is pushdown-only: the engine never sorts result sets in
    * the load path (cdf resource.rs:611-622). */
  final case class OrderBy(field: String, ascending: Boolean)
  final case class ScanRequest(
      projection: Seq[String],
      predicates: Seq[String],
      limit: Option[Long],
      resumeFrom: Option[Position],
      orderBy: Option[OrderBy] = None)
  final case class ScanPlan(
      resource: String,
      projection: Seq[String],
      predicates: Seq[ScanPredicate],
      residualPredicates: Seq[String],
      limitPushed: Option[Long],
      partitions: Int,
      orderByPushed: Option[OrderBy] = None) {

    import CanonicalJson._
    def toJson: J = JObj.of(
      "resource" -> JStr(resource),
      "projection" -> JArr(projection.map(JStr)),
      "predicates" -> JArr(predicates.map(p => JObj.of(
        "sql" -> JStr(p.sql), "fidelity" -> JStr(p.fidelity.toString.toLowerCase)))),
      "residual" -> JArr(residualPredicates.map(JStr)),
      "limit_pushed" -> limitPushed.map(JInt(_): J).getOrElse(JNull),
      "partitions" -> JInt(partitions))
  }

  /** Delivery guarantee derived from plan facts, never asserted by the
    * author (cdf: VISION.md:960-969 derivation table): replayable
    * source + keyed dedup/merge + verified receipt ⇒ effectively-once;
    * missing pieces degrade honestly. */
  sealed trait DeliveryGuarantee
  object DeliveryGuarantee {
    case object ExactlyOnceEffective extends DeliveryGuarantee
    case object AtLeastOnce extends DeliveryGuarantee
    case object AtMostOnce extends DeliveryGuarantee
  }

  def deriveGuarantee(sourceReplayable: Boolean, disposition: Disposition,
      receiptVerified: Boolean): DeliveryGuarantee = {
    val keyed = disposition match {
      case Disposition.Merge(keys) => keys.nonEmpty
      case Disposition.CdcApply(keys, _) => keys.nonEmpty
      case Disposition.Replace => true // idempotent by construction
      case Disposition.Append => false
    }
    if (!sourceReplayable) DeliveryGuarantee.AtMostOnce // a lost batch cannot be refetched
    else if (keyed && receiptVerified) DeliveryGuarantee.ExactlyOnceEffective
    else DeliveryGuarantee.AtLeastOnce // replays may duplicate appended rows
  }

  /** Pushdown negotiation (cdf planning.rs:1169-1310): predicates the
    * source claims `Exact` are pushed and dropped engine-side; `Inexact`
    * are pushed AND re-checked; `Unsupported` stay engine-side. Limit
    * only pushes when every pushed predicate is Exact
    * (table_provider.rs:126-137). */
  def negotiate(resource: String, req: ScanRequest,
      sourceFidelity: String => Fidelity, partitions: Int,
      sourceOrders: Boolean = false): ScanPlan = {
    val classified = req.predicates.map(p => ScanPredicate(p, sourceFidelity(p)))
    val residual = classified.collect {
      case ScanPredicate(p, Fidelity.Inexact) => p
      case ScanPredicate(p, Fidelity.Unsupported) => p
    }
    val allExact = classified.forall(_.fidelity == Fidelity.Exact)
    ScanPlan(
      resource,
      req.projection,
      classified.filter(_.fidelity != Fidelity.Unsupported),
      residual,
      if (allExact) req.limit else None,
      partitions,
      // order-by only pushes to a source that claims ordering, and a
      // limit on ordered results additionally needs all-Exact predicates
      orderByPushed = if (sourceOrders) req.orderBy else None)
  }
}
