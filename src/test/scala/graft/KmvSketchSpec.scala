package graft

import org.apache.spark.sql.functions._
import graft.operators.KmvSketch

class KmvSketchSpec extends SparkSpec {
  import spark.implicits._

  test("merge of per-group sketches equals the direct sketch of the union") {
    // overlapping hash sets: the merge must dedup shared hashes, not
    // double-count them (the property that makes sketch tables re-aggregable)
    val hashed = (Seq(10L, 20L, 30L, 40L, 50L).map(("a", _)) ++
      Seq(30L, 40L, 60L, 70L, 80L).map(("b", _))).toDF("g", "h")
    val k = 4
    val sk = KmvSketch.sketch(hashed, $"g", $"h", k)
    val merged = KmvSketch.merge(sk, "ALL", k)
      .select($"_kmv_h").as[Long].collect().toSet
    val direct = KmvSketch.sketch(hashed.select(lit("ALL").as("g"), $"h").distinct(),
        $"g", $"h", k)
      .select($"_kmv_h").as[Long].collect().toSet
    assert(merged == direct && merged == Set(10L, 20L, 30L, 40L))
  }

  test("merge plans as TakeOrderedAndProject, never a partition-less Window") {
    val hashed = (1 to 100).map(i => ("g" + (i % 3), i * 7919L)).toDF("g", "h")
    val exec = KmvSketch.merge(KmvSketch.sketch(hashed, $"g", $"h", 8), "ALL", 8)
      .queryExecution.executedPlan
    val plan = exec.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"global top-k should be TakeOrderedAndProject:\n$plan")
    val partitionless = exec.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec
          if w.partitionSpec.isEmpty => w
    }
    assert(partitionless.isEmpty,
      s"merge introduced a partition-less Window:\n$plan")
  }

  test("estimate: unsaturated sketch is exact; saturated uses (k-1)*2^40/h_k") {
    val hashed = (Seq(100L, 200L, 300L).map(("small", _)) ++
      (1 to 10).map(i => ("big", i * 1000000L))).toDF("g", "h")
    val k = 5
    val est = KmvSketch.estimate(KmvSketch.sketch(hashed, $"g", $"h", k), k)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(est("small") == ((3L, 3.0)))
    val expected = BigDecimal(4.0 * KmvSketch.Space / 5000000L)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(est("big") == ((5L, expected)))
  }

  test("pair intersection: exact below saturation, rho-scaled when saturated") {
    // a = {10,20,30,40}, b = {30,40,50,60}: intersection {30,40}.
    // k=8 keeps every hash -> unsaturated, estimate must be EXACTLY 2.
    val hashed = (Seq(10L, 20L, 30L, 40L).map(("a", _)) ++
      Seq(30L, 40L, 50L, 60L).map(("b", _))).toDF("g", "h")
    val sk = KmvSketch.sketch(hashed, $"g", $"h", 8)
    val row = KmvSketch.pairIntersectEstimates(sk, 8).collect().toSeq
    assert(row.map(r => (r.getString(0), r.getString(1), r.getLong(2),
      r.getLong(3), r.getDouble(4))) == Seq(("a", "b", 6L, 2L, 2.0)))

    // saturated at k=4: union minima {10,20,30,40}, of which {30,40} are
    // in both sketches -> rho = 1/2, est = rho * (k-1)*2^40/h_k
    val sk4 = KmvSketch.sketch(hashed, $"g", $"h", 4)
    val sat = KmvSketch.pairIntersectEstimates(sk4, 4).head()
    val estU = 3.0 * KmvSketch.Space / 40L
    val expected = BigDecimal(0.5 * estU)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert((sat.getLong(2), sat.getLong(3), sat.getDouble(4)) ==
      ((4L, 2L, expected)))
  }
}
