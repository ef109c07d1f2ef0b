package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.{CurrentDate, CurrentTimestamp, Expression, Rand, Randn, Uuid}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Session extensions (SURVEY §7.3 extension ladder, rung (c)):
  *
  *  - `DeterminismGuard`: an analysis check that REJECTS
  *    non-deterministic expressions (rand/uuid/now/current_date/…) in
  *    any plan over graft resource views — the Catalyst-native
  *    enforcement of the reference's volatility gate
  *    (cdf: crates/cdf-engine/src/expression.rs:579-583 "non-Immutable
  *    rejected"), complementing the IR-level gate in `graft.expr.Expr`.
  *  - registers the native text-hash functions so SQL users get
  *    `graft_simhash64` / `graft_minhash16` without API calls.
  *
  * Activate with
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")` or
  * `Sessions.localSealed(...)`. The guard is scoped by view-name prefix
  * so ops/metadata sessions stay unrestricted (determinism is a load-
  * path law, not an ad-hoc-SQL law).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectCheckRule { session =>
      plan => GraftExtensions.checkDeterminism(plan)
    }
    ext.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("graft_simhash64"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          "graft.functions.SimHash64Expr", "graft_simhash64"),
        (exprs: Seq[Expression]) => graft.functions.SimHash64Expr(exprs.head)))
    ext.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("graft_minhash16"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          "graft.functions.MinHashSigExpr", "graft_minhash16"),
        (exprs: Seq[Expression]) => graft.functions.MinHashSigExpr(exprs.head, 16)))
    ext.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("graft_ngrams5"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          "graft.functions.WordNgramsExpr", "graft_ngrams5"),
        (exprs: Seq[Expression]) => graft.functions.WordNgramsExpr(exprs.head, 5)))
  }
}

object GraftExtensions {
  /** Views whose plans must be replay-deterministic. */
  val GuardedPrefix = "graft_resource_"

  private def guarded(plan: LogicalPlan): Boolean = {
    var hit = false
    plan.foreach {
      case p if p.nodeName == "SubqueryAlias" &&
        p.toString.contains(GuardedPrefix) => hit = true
      case _ =>
    }
    hit
  }

  def checkDeterminism(plan: LogicalPlan): Unit = {
    if (!guarded(plan)) return
    plan.foreach { node =>
      node.expressions.foreach { root =>
        root.foreach {
          case e @ (_: Rand | _: Randn | _: Uuid | _: CurrentTimestamp | _: CurrentDate) =>
            throw new org.apache.spark.sql.AnalysisException(
              errorClass = "USER_RAISED_EXCEPTION",
              messageParameters = Map("errorMessage" ->
                (s"non-deterministic expression ${e.prettyName} rejected over a graft resource " +
                  "(replay-determinism law; cdf expression.rs:579-583)")))
          case e: Expression if !e.deterministic && e.children.isEmpty =>
            throw new org.apache.spark.sql.AnalysisException(
              errorClass = "USER_RAISED_EXCEPTION",
              messageParameters = Map("errorMessage" ->
                s"non-deterministic expression ${e.prettyName} rejected over a graft resource"))
          case _ =>
        }
      }
    }
  }
}
