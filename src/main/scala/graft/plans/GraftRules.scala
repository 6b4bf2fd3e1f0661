package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType
import graft.functions.HammingDistance64

/** Engine optimizer rules + their registration surface.
  *
  * SURVEY §4 concluded the reference needs no custom rewrites (Catalyst
  * covers everything); this module exists for the engine's OWN extension
  * operators. First rule: Hamming-distance threshold peepholes —
  * `hamming64(a,b) <= 0` / `== 0` ⇔ `a = b` and `> 0` ⇔ `a != b`
  * (bit_count(xor) is 0 iff equal). Long equality beats xor+popcount and,
  * more importantly, an equality predicate is something the planner can
  * use (hash join keys, pushdown) where a custom expression is opaque.
  *
  * Registration, two deployments:
  *  - existing session: `GraftRules.install(spark)`
  *    (spark.experimental.extraOptimizations);
  *  - session construction: `--conf spark.sql.extensions=graft.plans.GraftExtensions`.
  */
object GraftRules {

  object SimplifyHamming extends Rule[LogicalPlan] {
    private def zero(e: Expression): Boolean = e match {
      case Literal(0, IntegerType) => true
      case _ => false
    }
    override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
      case LessThanOrEqual(HammingDistance64(a, b), z) if zero(z) => EqualTo(a, b)
      case EqualTo(HammingDistance64(a, b), z) if zero(z) => EqualTo(a, b)
      case GreaterThan(HammingDistance64(a, b), z) if zero(z) => Not(EqualTo(a, b))
    }
  }

  def rules: Seq[Rule[LogicalPlan]] = Seq(SimplifyHamming)

  /** Install into a live session via the experimental hook. */
  def install(spark: org.apache.spark.sql.SparkSession): Unit = {
    val existing = spark.experimental.extraOptimizations
    val missing = rules.filterNot(existing.contains)
    spark.experimental.extraOptimizations = existing ++ missing
  }
}

/** `spark.sql.extensions` entry point. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    GraftRules.rules.foreach(r => e.injectOptimizerRule(_ => r))
    e.injectPlannerStrategy(_ => GraftStrategy)
  }
}
