package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import graft.functions.GramMatrixAgg
import graft.operators.Pca

class PcaSpec extends SparkSpec {
  import spark.implicits._

  test("GramMatrixAgg matches hand-computed fixed-point sums") {
    val df = Seq(Array(1.0f, 2.0f), Array(3.0f, -4.0f)).toDF("v")
    val got = df.agg(ColumnBridge.column(
        GramMatrixAgg(ColumnBridge.expression(col("v")), 2).toAggregateExpression())
        .as("s"))
      .head().getSeq[Long](0)
    // gram: [1+9, 2-12, 2-12, 4+16] ·1e6 ; sums: [4, -2] ·1e6 ; n = 2
    assert(got == Seq(10000000L, -10000000L, -10000000L, 20000000L,
      4000000L, -2000000L, 2L))
  }

  test("GramMatrixAgg skips null and wrong-dim rows without counting them") {
    val df = Seq(Some(Array(1.0f, 1.0f)), None, Some(Array(1.0f)))
      .toDF("v")
    val got = df.agg(ColumnBridge.column(
        GramMatrixAgg(ColumnBridge.expression(col("v")), 2).toAggregateExpression())
        .as("s"))
      .head().getSeq[Long](0)
    assert(got.last == 1L && got.head == 1000000L)
  }

  test("gram pass plans as ObjectHashAggregate with map-side partials (no row amplification)") {
    val df = Seq(Array(1.0f, 2.0f), Array(3.0f, -4.0f)).toDF("v")
    val agg = df.agg(ColumnBridge.column(
      GramMatrixAgg(ColumnBridge.expression(col("v")), 2).toAggregateExpression()).as("s"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert(plan.contains("partial_gram_matrix"), plan) // map-side combine before the 1-row shuffle
    assert(!plan.toLowerCase.contains("explode"), plan)
  }

  test("power iteration recovers a planted dominant axis") {
    // variance 100 along axis 3, ~1 along the rest; mean offset nonzero so
    // centering matters (uncentered second moment would tilt toward the mean)
    val dim = 8
    val vecs = (0 until 200).map { r =>
      Array.tabulate(dim) { d =>
        val noise = (((r * 31 + d * 17) % 7) - 3).toFloat * 0.3f
        if (d == 3) ((r % 21) - 10).toFloat * 2.0f + 5.0f else noise + 1.0f
      }
    }.toDF("v")
    val comp = Pca.topComponent(vecs, col("v"), dim, 8)
      .orderBy(col("dim_idx")).collect()
    val loadings = comp.map(_.getDouble(1))
    val eig = comp.head.getDouble(2)
    assert(math.abs(loadings(3)) > 0.99, s"axis-3 loading ${loadings(3)}")
    assert(loadings.map(x => x * x).sum > 0.99 && loadings.map(x => x * x).sum < 1.01)
    assert(eig > 100.0 && eig < 200.0, s"eigval $eig") // var of 2·((r%21)-10) ≈ 146
  }
}
