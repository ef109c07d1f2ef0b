package graft.streaming

import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedStar}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._

import graft.streaming.WatermarkClaims.Behavior

/** Per-node operator watermark behavior derived FROM the plan (cdf:
  * crates/cdf-kernel/src/execution_extent.rs:627-643
  * `OperatorWatermarkBehavior` { Preserve, Transform, Drop } — every
  * operator in a streaming pipeline declares how it carries the
  * event-time completeness claim; the pipeline's output claim is the
  * fold of its nodes).
  *
  * Spark-first: rather than asking users to annotate operators, we
  * walk the admitted `Projection(Filter?(Scan))` Catalyst tree and
  * classify each node against the event-time column:
  *
  *  - Filter / SubqueryAlias / leaf scan → Preserve (removing rows can
  *    never violate "no event earlier than T will arrive").
  *  - Project that forwards the column (possibly renamed) → Preserve,
  *    with the rename tracked so downstream claims follow the column.
  *  - Project that rebuilds the column as a MONOTONE shift
  *    (`col ± literal` in the integer event-time domain) → Transform
  *    with the shift applied to the claim (the reference's
  *    `mapping_id` must name a monotone mapping; an affine shift is
  *    the verifiable subset).
  *  - Anything else (column dropped, or a non-monotone rewrite) →
  *    Drop: the stage emits NO claim, and downstream must re-derive
  *    one. Conservative by construction — a wrong Preserve would be a
  *    completeness lie; a wrong Drop only costs freshness.
  */
object OperatorWatermarks {

  final case class NodeBehavior(node: String, behavior: Behavior, outCol: Option[String])

  private def nameOf(e: Expression): Option[String] = e match {
    case a: AttributeReference => Some(a.name)
    case u: UnresolvedAttribute => Some(u.name)
    case _ => None
  }

  /** Classify one projection list against the incoming event-time
    * column: (behavior, output column carrying the claim). */
  private def classifyProject(exprs: Seq[NamedExpression], col: String): (Behavior, Option[String]) = {
    val carriers = exprs.flatMap {
      case a: Alias => classifyExpr(a.child, col).map { b => (b, a.name) }
      // SELECT * forwards every column unchanged, the claim included
      case _: UnresolvedStar => Some((Behavior.Preserve: Behavior, col))
      case e => nameOf(e).filter(_ == col).map(_ => (Behavior.Preserve: Behavior, col))
    }
    carriers match {
      case Seq() => (Behavior.Drop, None)
      case Seq((b, out)) => (b, Some(out))
      // the same source column projected twice: keep the weakest claim
      // carrier deterministic — Preserve wins over Transform, first name
      case many => many.find(_._1 == Behavior.Preserve).orElse(many.headOption) match {
        case Some((b, out)) => (b, Some(out))
        case None => (Behavior.Drop, None)
      }
    }
  }

  /** Integer literal, seen through the analyzer's implicit casts. */
  private def litLong(e: Expression): Option[Long] = e match {
    case Literal(v: Long, _) => Some(v)
    case Literal(v: Int, _) => Some(v.toLong)
    case Literal(v: Short, _) => Some(v.toLong)
    case Cast(c, _, _, _) => litLong(c)
    case _ => None
  }

  /** Monotone-shift recognition in the integer event-time domain. */
  private def classifyExpr(e: Expression, col: String): Option[Behavior] = e match {
    case a if nameOf(a).contains(col) => Some(Behavior.Preserve)
    case Add(l, r, _) if nameOf(l).contains(col) && litLong(r).isDefined =>
      litLong(r).map(Behavior.Transform(_))
    case Add(l, r, _) if nameOf(r).contains(col) && litLong(l).isDefined =>
      litLong(l).map(Behavior.Transform(_))
    case Subtract(l, r, _) if nameOf(l).contains(col) && litLong(r).isDefined =>
      litLong(r).map(v => Behavior.Transform(-v))
    case Cast(c, _, _, _) => classifyExpr(c, col) // widening cast preserves order
    case _ => None // non-monotone or unrecognized: no claim survives
  }

  /** Walk bottom-up from the scan, deriving each node's behavior and
    * following the claim-carrying column through renames. */
  def derive(plan: LogicalPlan, eventTimeCol: String): Seq[NodeBehavior] = {
    def walk(p: LogicalPlan): (Seq[NodeBehavior], Option[String]) = p match {
      // a View is the SOURCE boundary: the event-time column is named
      // in the source's output terms, so the claim originates here
      // (the view's internal definition belongs to the source, not to
      // this pipeline)
      case v: View =>
        (Seq(NodeBehavior("View", Behavior.Preserve, Some(eventTimeCol))),
          Some(eventTimeCol))
      case leaf if leaf.children.isEmpty =>
        (Seq(NodeBehavior(leaf.nodeName, Behavior.Preserve, Some(eventTimeCol))),
          Some(eventTimeCol))
      case f: Filter =>
        val (below, colIn) = walk(f.child)
        (below :+ NodeBehavior("Filter",
          if (colIn.isDefined) Behavior.Preserve else Behavior.Drop, colIn), colIn)
      case s: SubqueryAlias =>
        val (below, colIn) = walk(s.child)
        (below, colIn)
      case pr: Project =>
        val (below, colIn) = walk(pr.child)
        colIn match {
          case None => (below :+ NodeBehavior("Project", Behavior.Drop, None), None)
          case Some(c) =>
            val (b, out) = classifyProject(pr.projectList, c)
            (below :+ NodeBehavior("Project", b, out), out)
        }
      case other =>
        val results = other.children.map(walk)
        val below = results.flatMap(_._1)
        // outside the admitted subset: conservative Drop
        (below :+ NodeBehavior(other.nodeName, Behavior.Drop, None), None)
    }
    walk(plan)._1
  }

  /** The pipeline's output claim: fold every node's behavior over the
    * source watermark. None = some stage dropped the claim. */
  def propagate(sourceWm: Option[Long], plan: LogicalPlan, eventTimeCol: String): Option[Long] =
    derive(plan, eventTimeCol).foldLeft(sourceWm) { (wm, n) =>
      WatermarkClaims.through(wm, n.behavior)
    }

  /** The column carrying the claim at the plan output (None if
    * dropped) — downstream epochs classify late data against THIS
    * column. */
  def outputColumn(plan: LogicalPlan, eventTimeCol: String): Option[String] =
    derive(plan, eventTimeCol).lastOption.flatMap(_.outCol)
}
