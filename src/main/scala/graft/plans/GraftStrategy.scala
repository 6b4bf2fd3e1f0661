package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy}

/** Planner strategy for the engine's custom operators: maps
  * `AsOfJoinPlan` to `AsOfJoinExec` (everything else falls through to the
  * built-in strategies).
  *
  * Registration, two deployments (mirrors GraftRules):
  *  - existing session: `GraftStrategy.install(spark)`
  *    (spark.experimental.extraStrategies);
  *  - session construction: `--conf spark.sql.extensions=graft.plans.GraftExtensions`.
  */
object GraftStrategy extends SparkStrategy {

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, tb) =>
      AsOfJoinExec(lk, rk, lt, rt, tb, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }

  /** Install into a live session via the experimental hook (idempotent). */
  def install(spark: SparkSession): Unit = {
    val existing = spark.experimental.extraStrategies
    if (!existing.contains(GraftStrategy))
      spark.experimental.extraStrategies = existing :+ GraftStrategy
  }
}
