package graft

import org.apache.spark.sql.functions._
import graft.operators.QuantileSketch

/** The sketch's value rests on two exact properties (QuantileSketch
  * scaladoc): bottom-k-by-hash is closed under merge (merged sketches ≡
  * the sketch of the merged population — NOT approximately, exactly), and
  * rank-pick quantiles are exact once a group fits in the sketch. Both
  * are asserted against brute-force recomputation here; the accuracy of
  * estimates ABOVE k is the gate's rel_err rider, not a spec concern.
  */
class QuantileSketchSpec extends SparkSpec {
  import spark.implicits._

  private def rows(g: String, n: Int, seed: Int) =
    (0 until n).map { i =>
      // deterministic pseudo-hash / value pairs, distinct per (g, i)
      val h = ((i * 2654435761L + seed) % 1000003L).abs
      (g, h, (h % 997).toDouble)
    }

  test("merge of per-group sketches equals the direct sketch of the union") {
    val k = 16
    val a = rows("a", 200, 1)
    val b = rows("b", 150, 7)
    val df = (a ++ b).toDF("g", "h", "v")
    val perGroup = QuantileSketch.sketch(df, col("g"), col("h"), col("v"), k)
    val merged = QuantileSketch.merge(perGroup, "ALL", k)
      .select(col("_qk_h"), col("_qk_v")).as[(Long, Double)].collect().toSet
    val direct = QuantileSketch.sketch(
        df.withColumn("g", lit("ALL")), col("g"), col("h"), col("v"), k)
      .select(col("_qk_h"), col("_qk_v")).as[(Long, Double)].collect().toSet
    assert(merged == direct, "bottom-k must be closed under merge")
    assert(merged.size == k)
  }

  test("merge plans as TakeOrderedAndProject, never a partition-less Window") {
    val k = 16
    val df = rows("a", 200, 1).toDF("g", "h", "v")
    val sk = QuantileSketch.sketch(df, col("g"), col("h"), col("v"), k)
    val exec = QuantileSketch.merge(sk, "ALL", k).queryExecution.executedPlan
    val plan = exec.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"global top-k should be TakeOrderedAndProject:\n$plan")
    // the sketch phase's Window is group-partitioned; merge must add no
    // single-partition global-sort Window. Walk the physical tree and
    // require every WindowExec to carry a non-empty PARTITION BY.
    val partitionless = exec.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec
          if w.partitionSpec.isEmpty => w
    }
    assert(partitionless.isEmpty,
      s"merge introduced a partition-less Window:\n$plan")
  }

  test("sketchGlobal equals sketch + merge of an arbitrary partitioning") {
    val k = 16
    val df = (rows("a", 200, 1) ++ rows("b", 150, 7)).toDF("g", "h", "v")
    val direct = QuantileSketch.sketchGlobal(df, col("h"), col("v"), "ALL", k)
      .select(col("_qk_h"), col("_qk_v")).as[(Long, Double)].collect().toSet
    val viaMerge = QuantileSketch.merge(
        QuantileSketch.sketch(df, col("g"), col("h"), col("v"), k), "ALL", k)
      .select(col("_qk_h"), col("_qk_v")).as[(Long, Double)].collect().toSet
    assert(direct == viaMerge && direct.size == k)
    // and the plan is TakeOrderedAndProject with no Window at all
    val exec = QuantileSketch.sketchGlobal(df, col("h"), col("v"), "ALL", k)
      .queryExecution.executedPlan
    assert(exec.toString.contains("TakeOrderedAndProject"))
    assert(exec.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.isEmpty, "sketchGlobal must not plan any Window")
  }

  test("sketchThinned is bit-identical to sketch") {
    val k = 8
    val df = (rows("a", 500, 11) ++ rows("b", 3, 13) ++ rows("c", 64, 17))
      .toDF("g", "h", "v")
    // margin 1 still must be exact on this data or the guard fires —
    // either way, no silent divergence is possible
    for (margin <- Seq(1, 2, 8)) {
      val thin = QuantileSketch.sketchThinned(
          df, col("g"), col("h"), col("v"), k, margin)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
      val full = QuantileSketch.sketch(df, col("g"), col("h"), col("v"), k)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
      assert(thin == full, s"margin=$margin diverged")
    }
  }

  test("sketchThinned starvation guard fires loudly, never returns short") {
    // 100 rows whose hashes all sit ABOVE the margin=1 threshold
    // (2^60 * k / n): the thin filter starves the sketch and the
    // assert_true folded into _qk_h must throw, not return < k rows.
    val k = 4
    val df = (0 until 100).map(i => ("g", (1L << 59) + i, i.toDouble))
      .toDF("g", "h", "v")
    val e = intercept[Exception] {
      QuantileSketch.sketchThinned(df, col("g"), col("h"), col("v"), k, 1)
        .collect()
    }
    assert(e.getMessage.contains("starved"), e.getMessage)
  }

  test("quantiles are exact rank-picks when the group fits the sketch") {
    val k = 64
    val data = rows("g1", 40, 3) // 40 < k: sketch IS the population
    val df = data.toDF("g", "h", "v")
    val sk = QuantileSketch.sketch(df, col("g"), col("h"), col("v"), k)
    val qs = Seq(0.25, 0.5, 0.75, 0.9)
    val got = QuantileSketch.quantiles(sk, qs)
      .select(col("q"), col("est")).as[(Double, Double)].collect().toMap
    val sorted = data.map(_._3).sorted
    qs.foreach { q =>
      val expected = sorted(math.ceil(q * sorted.size).toInt - 1)
      assert(got(q) == expected, s"q=$q: got ${got(q)}, want $expected")
    }
  }

  test("sketch keeps exactly min(k, group size) rows per group") {
    val k = 16
    val df = (rows("big", 100, 5) ++ rows("small", 7, 9)).toDF("g", "h", "v")
    val sizes = QuantileSketch.sketch(df, col("g"), col("h"), col("v"), k)
      .groupBy(col("_qk_g")).count().as[(String, Long)].collect().toMap
    assert(sizes("big") == k)
    assert(sizes("small") == 7)
  }
}
