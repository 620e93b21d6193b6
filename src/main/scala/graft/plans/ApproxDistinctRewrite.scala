package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{
  AggregateExpression, Complete, Count}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType
import graft.expressions.KmvSketch

/** Opt-in approximate-query rewrite (the fourth extension kind after
  * expressions, aggregates, and the planner strategy — a logical optimizer
  * Rule, registered via SparkSessionExtensions).
  *
  * When `spark.graft.approxCountDistinct.enabled=true`, every exact
  * single-column `count(DISTINCT x)` becomes the KMV sketch estimate
  * ([[graft.expressions.KmvSketch]]) cast back to long. Exact distinct
  * counting is one of the most expensive aggregates at 100 TB (per-group
  * linear state or an Expand pass); flipping one session flag trades <=
  * ~3% error (k=1024) for constant per-group state — without touching a
  * line of query code. Disabled (the default), plans are byte-identical
  * to stock Spark; the rule is a no-op for multi-column distincts and
  * FILTER clauses (left exact rather than silently changing semantics).
  */
case class ApproxDistinctRewrite(spark: SparkSession) extends Rule[LogicalPlan] {

  private def enabled: Boolean =
    spark.conf.getOption("spark.graft.approxCountDistinct.enabled")
      .exists(_.equalsIgnoreCase("true"))

  private def k: Int =
    spark.conf.getOption("spark.graft.approxCountDistinct.k")
      .map(_.toInt).getOrElse(1024)

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled) plan
    else plan.transform {
      case agg: Aggregate =>
        agg.transformExpressions {
          case AggregateExpression(Count(Seq(child: Expression)), _, true, None, _) =>
            Cast(
              AggregateExpression(KmvSketch(child, k), Complete,
                isDistinct = false, filter = None),
              LongType)
        }
    }
}
