package graft.streaming

/** Typed watermark claims with per-partition aggregation (cdf:
  * crates/cdf-kernel/src/execution_extent.rs:282-330 `WatermarkPolicy`,
  * :645-700 `WatermarkClaim` — "typed monotone completeness claim";
  * combined watermark = MIN across partitions, because a claim promises
  * "no event earlier than T will arrive" and the weakest partition
  * bounds the whole stream).
  *
  * Domains are integers (epoch micros or any monotone long) — this is
  * the non-timestamp watermark machinery Spark's built-in event-time
  * watermark cannot express (SURVEY §7.4.3).
  */
object WatermarkClaims {

  /** One partition's monotone frontier claim. */
  final case class Claim(partition: String, frontier: Long)

  final case class State(perPartition: Map[String, Long]) {
    /** The stream-level watermark: min over partition claims; None
      * until every expected partition has claimed at least once. */
    def combined(expected: Set[String]): Option[Long] =
      if (expected.forall(perPartition.contains))
        Some(expected.map(perPartition).min)
      else None

    /** Advance one partition's claim — regression is a claim violation
      * (claims are monotone completeness promises). */
    def advance(c: Claim): Either[String, State] =
      perPartition.get(c.partition) match {
        case Some(prev) if c.frontier < prev =>
          Left(s"watermark regression on ${c.partition}: $prev -> ${c.frontier}")
        case _ => Right(State(perPartition + (c.partition -> c.frontier)))
      }
  }

  object State { val empty: State = State(Map.empty) }

  /** Idle-partition exclusion (cdf execution_extent.rs: watermark
    * idleness capability — `idle_after_milliseconds` must be > 0): a
    * partition that has not claimed for `idleAfterMs` stops holding
    * the stream watermark back, so one stalled shard cannot freeze
    * every window downstream. At least one live partition must have
    * claimed — excluding everything would fabricate completeness. */
  def combinedWithIdleExclusion(s: State, expected: Set[String],
      lastHeardMs: Map[String, Long], nowMs: Long, idleAfterMs: Long): Option[Long] = {
    require(idleAfterMs > 0, "watermark idle exclusion must wait more than zero milliseconds")
    val live = expected.filter(p =>
      nowMs - lastHeardMs.getOrElse(p, Long.MinValue / 2) < idleAfterMs)
    val claimed = live.filter(s.perPartition.contains)
    if (claimed.isEmpty || claimed != live) None
    else Some(claimed.map(s.perPartition).min)
  }

  /** Operator watermark behavior through a pipeline stage (cdf
    * execution_extent.rs:627-643): Preserve, Transform (monotone
    * mapping), or Drop (stage emits no event-time claim). */
  sealed trait Behavior
  object Behavior {
    case object Preserve extends Behavior
    final case class Transform(shiftUs: Long) extends Behavior
    case object Drop extends Behavior
  }

  def through(wm: Option[Long], b: Behavior): Option[Long] = b match {
    case Behavior.Preserve => wm
    case Behavior.Transform(shift) => wm.map(_ + shift)
    case Behavior.Drop => None
  }
}
