package graft.plans

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec

/** THE walk over an executed plan including every AQE-materialized
  * subtree (final adaptive plans, query stages, reused exchanges) —
  * the single shared copy for every metric reader and plan fence
  * (Bench's containment diagnostics, ProfileContain, PlanSpec's
  * exchange/join counts, ScaleGrowthSpec's join/broadcast volume
  * fences). A Spark upgrade that adds a new wrapper node gets fixed
  * HERE, not in four drifting copies. */
object PlanWalk {
  def nodes(p: SparkPlan): Seq[SparkPlan] =
    (p +: p.children.flatMap(nodes)) ++ (p match {
      case a: AdaptiveSparkPlanExec => nodes(a.executedPlan)
      case q: QueryStageExec => nodes(q.plan)
      case r: ReusedExchangeExec => nodes(r.child)
      case _ => Seq.empty
    })
}
