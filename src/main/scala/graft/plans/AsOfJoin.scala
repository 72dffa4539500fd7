package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.graft.ColumnBridge

import graft.ops.TimeSeries

/** AS-OF join as a first-class Catalyst operator (SURVEY.md §7.3.1's
  * deferred ergonomics item): the join appears in the raw logical plan
  * as one `AsOfJoinPlan` node, and an injected resolution rule lowers
  * it to the library's single-shuffle union+window plan
  * ([[TimeSeries.asofJoinOpts]]) during analysis. Same executed plan,
  * but the operator composes as a plan node (EXPLAIN shows intent, and
  * future optimizer rules can pattern-match on it).
  *
  * Extension ladder note: the LOWERING already has the plan we want, so
  * this stops at (c)'s first rung — logical node + rule — without a
  * custom SparkStrategy/SparkPlan, which would only re-implement what
  * Catalyst's window machinery does well.
  */
final case class AsOfJoinPlan(left: LogicalPlan, right: LogicalPlan,
                              by: Seq[String], leftTs: String, rightTs: String,
                              valueCols: Seq[String], forward: Boolean,
                              toleranceSec: Option[Long])
  extends BinaryNode {
  // Unresolved by construction: the analyzer keeps iterating until
  // ResolveAsOfJoin rewrites this node away, so no downstream operator
  // ever resolves against this placeholder output.
  override lazy val resolved: Boolean = false
  override def output: Seq[Attribute] = Nil
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Analyzer rule (injected by [[graft.GraftExtensions]]): once both
  * children are resolved, lower [[AsOfJoinPlan]] to the library plan.
  */
final case class ResolveAsOfJoin(spark: SparkSession) extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case AsOfJoinPlan(l, r, by, lts, rts, vals, fwd, tol)
        if l.resolved && r.resolved =>
      TimeSeries.asofJoinOpts(
          ColumnBridge.ofRows(spark, l), ColumnBridge.ofRows(spark, r),
          by, lts, rts, vals, fwd, tol)
        .queryExecution.analyzed
  }
}

/** Public entry for the plan-node form. Falls back to the direct
  * library call when the session was built without graft's extensions
  * (the rule can only be injected at session build time).
  */
object AsOf {
  def ruleInstalled(spark: SparkSession): Boolean =
    spark.sessionState.analyzer.extendedResolutionRules
      .exists(_.isInstanceOf[ResolveAsOfJoin])

  def asofJoin(left: DataFrame, right: DataFrame, by: Seq[String],
               leftTs: String, rightTs: String, valueCols: Seq[String],
               forward: Boolean = false,
               toleranceSec: Option[Long] = None): DataFrame = {
    val spark = left.sparkSession
    if (ruleInstalled(spark))
      ColumnBridge.ofRows(spark,
        AsOfJoinPlan(left.queryExecution.logical, right.queryExecution.logical,
          by, leftTs, rightTs, valueCols, forward, toleranceSec))
    else
      TimeSeries.asofJoinOpts(left, right, by, leftTs, rightTs, valueCols,
        forward, toleranceSec)
  }
}
