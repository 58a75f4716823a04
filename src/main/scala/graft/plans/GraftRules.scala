package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Custom Catalyst optimizer rule (the §4.1 extension path — reference
  * analog: the DefaultOptimizer rewrites in catalyst/optimizer/
  * Optimizer.scala, e.g. NullPropagation:217, ConstantFolding:278):
  * `graft_hamming64(x, x)` is identically 0, so fold it before it reaches
  * execution — a domain-specific algebraic rewrite Catalyst can't know.
  *
  * Injected through `spark.experimental.extraOptimizations`, the public
  * hook for session-scoped rules (SparkSessionExtensions offers the same
  * at builder time).
  */
object SimplifySelfHamming extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      // !nullable guard: Hamming64 is null-intolerant, so for a nullable
      // input the expression must stay (NULL in → NULL out, not 0).
      case Hamming64(l, r) if l.semanticEquals(r) && l.deterministic && !l.nullable =>
        Literal(0, IntegerType)
    }
}

object GraftRules {
  /** Idempotently install the graft optimizer rules on a session. */
  def install(spark: SparkSession): Unit = {
    val current = spark.experimental.extraOptimizations
    if (!current.contains(SimplifySelfHamming))
      spark.experimental.extraOptimizations = current :+ SimplifySelfHamming
  }
}
