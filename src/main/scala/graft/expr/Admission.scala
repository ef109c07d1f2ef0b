package graft.expr

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical._

/** Relational-shape admission: the load path accepts EXACTLY
  * `Projection(Filter?(TableScan))` — any other SQL node is rejected
  * (cdf: crates/cdf-engine/src/sql_analysis.rs:639-666
  * `admitted_relational_nodes`; heavy modeling is deliberately
  * delegated downstream, VISION.md:752-754).
  *
  * Spark-first: we parse with Spark's own SQL parser against the
  * session catalog and walk the analyzed LogicalPlan, so the admitted
  * subset is enforced on real Catalyst nodes rather than a parallel
  * grammar.
  */
object Admission {

  final case class AdmittedQuery(plan: LogicalPlan)

  /** Nodes allowed in a resource query tree. */
  private def allowed(p: LogicalPlan): Boolean = p match {
    case _: Project => true
    case _: Filter => true
    case _: SubqueryAlias => true
    case l if l.children.isEmpty => true // leaf scans (relations/views)
    case _ => false
  }

  /** Validate shape; returns the offending node name on rejection. */
  def admit(spark: SparkSession, sql: String): Either[String, AdmittedQuery] = {
    val parsed =
      try spark.sessionState.sqlParser.parsePlan(sql)
      catch { case e: Exception => return Left(s"parse error: ${e.getMessage}") }
    val offenders = parsed.collect {
      case p if !allowed(p) => p.getClass.getSimpleName
    }
    if (offenders.nonEmpty)
      Left(s"relational shape rejected: ${offenders.distinct.mkString(", ")} " +
        "(admitted: Projection(Filter?(TableScan)))")
    else Right(AdmittedQuery(parsed))
  }
}
