package graft

import org.apache.spark.sql.functions._
import graft.functions.BitOps
import graft.plans.GraftRules

class GraftRulesSpec extends SparkSpec {
  import spark.implicits._

  // parquet-backed so the Filter survives optimization (a local Seq would
  // be constant-folded into the LocalRelation before we can inspect it)
  private lazy val df = graft.sources.Tables.lineitem(spark, sf001)
    .select($"l_orderkey".as("a"), $"l_partkey".as("b"))

  test("SimplifyHamming rewrites threshold-0 predicates to equality") {
    GraftRules.install(spark)
    try {
      val q = df.filter(BitOps.hamming64($"a", $"b") <= 0)
      val optimized = q.queryExecution.optimizedPlan.toString
      assert(!optimized.contains("hamming64"), optimized)
      // the equality survives alias-collapse and reaches the Filter
      assert(optimized.matches("(?s).*Filter \\([^\n]* = [^\n]*\\).*"), optimized)
      // rewrite preserves semantics vs the plain equality query
      assert(q.count() == df.filter($"a" === $"b").count())
      val neq = df.filter(BitOps.hamming64($"a", $"b") > 0)
      assert(!neq.queryExecution.optimizedPlan.toString.contains("hamming64"))
      assert(neq.count() == df.filter($"a" =!= $"b").count())
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(GraftRules.rules.contains)
    }
  }

  test("non-zero thresholds are left to the native expression") {
    GraftRules.install(spark)
    try {
      val q = df.filter(BitOps.hamming64($"a", $"b") <= 1)
      assert(q.queryExecution.optimizedPlan.toString.contains("hamming64"))
      assert(q.count() >= df.filter($"a" === $"b").count())
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(GraftRules.rules.contains)
    }
  }

  test("install is idempotent") {
    GraftRules.install(spark); GraftRules.install(spark)
    try assert(spark.experimental.extraOptimizations.count(GraftRules.rules.contains) ==
      GraftRules.rules.length)
    finally spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(GraftRules.rules.contains)
  }
}
