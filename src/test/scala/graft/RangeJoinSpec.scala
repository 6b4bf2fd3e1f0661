package graft

import org.apache.spark.sql.functions._
import graft.operators.RangeJoin

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def naive(points: org.apache.spark.sql.DataFrame,
                    intervals: org.apache.spark.sql.DataFrame) =
    points.join(intervals, col("t") >= col("s") && col("t") <= col("e"))
      .select(col("pid"), col("iid")).as[(Long, Long)].collect().toSet

  test("bucketed range join equals the naive theta-join, boundaries inclusive") {
    // deterministic pseudo-random fixture: points on a jittered grid,
    // intervals of mixed spans (sub-bucket, exact-bucket, multi-bucket)
    val points = (0L until 200L)
      .map(i => (i, i * 37L % 1000L)).toDF("pid", "t")
    val intervals = (0L until 60L).map { j =>
      val s = j * 53L % 900L
      (j, s, s + (j % 4L) * 75L) // spans 0, 75, 150, 225 vs width 100
    }.toDF("iid", "s", "e")
    val got = RangeJoin.pointInInterval(
        points, col("t"), intervals, col("s"), col("e"), bucketWidth = 100L)
      .select(col("pid"), col("iid")).as[(Long, Long)].collect().toSet
    val want = naive(points, intervals)
    assert(got == want && want.nonEmpty)
  }

  test("both interval ends are inclusive, including on bucket boundaries") {
    val points = Seq((1L, 100L), (2L, 200L), (3L, 99L), (4L, 201L)).toDF("pid", "t")
    val intervals = Seq((10L, 100L, 200L), (11L, 150L, 150L)).toDF("iid", "s", "e")
    val got = RangeJoin.pointInInterval(
        points, col("t"), intervals, col("s"), col("e"), bucketWidth = 100L)
      .select(col("pid"), col("iid")).as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 10L), (2L, 10L)))
  }

  test("negative times bucket correctly (floor, not truncate-toward-zero)") {
    val points = Seq((1L, -150L), (2L, -100L), (3L, -1L), (4L, 0L))
      .toDF("pid", "t")
    val intervals = Seq((10L, -160L, -90L), (11L, -50L, 50L)).toDF("iid", "s", "e")
    val got = RangeJoin.pointInInterval(
        points, col("t"), intervals, col("s"), col("e"), bucketWidth = 100L)
      .select(col("pid"), col("iid")).as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 10L), (2L, 10L), (3L, 11L), (4L, 11L)))
  }

  test("plans as an equi-join on the bucket, never a nested-loop product") {
    val points = (0L until 50L).map(i => (i, i * 13L % 500L)).toDF("pid", "t")
    val intervals = (0L until 20L).map(j => (j, j * 29L % 400L, j * 29L % 400L + 80L))
      .toDF("iid", "s", "e")
    val joined = RangeJoin.pointInInterval(
      points, col("t"), intervals, col("s"), col("e"), bucketWidth = 100L)
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan)
  }

  test("interval overlap equals the naive theta-join, exactly once per pair") {
    // mixed spans so pairs share 1..4 buckets — the responsibility rule
    // must still emit each overlapping pair exactly once
    val a = (0L until 60L).map { i =>
      val s = i * 53L % 900L; (i, s, s + (i % 4L) * 75L)
    }.toDF("aid", "as", "ae")
    val b = (0L until 50L).map { j =>
      val s = j * 67L % 880L; (j, s, s + (j % 3L) * 120L)
    }.toDF("bid", "bs", "be")
    val got = RangeJoin.intervalOverlap(a, col("as"), col("ae"),
        b, col("bs"), col("be"), bucketWidth = 100L)
      .select(col("aid"), col("bid")).as[(Long, Long)].collect()
    val want = a.join(b, col("as") <= col("be") && col("bs") <= col("ae"))
      .select(col("aid"), col("bid")).as[(Long, Long)].collect().toSet
    assert(got.toSet == want && want.nonEmpty)
    // multi-shared-bucket pairs must NOT duplicate
    assert(got.length == got.toSet.size,
      s"${got.length - got.toSet.size} duplicate pairs emitted")
    // and the plan is a bucket equi-join, not a product
    val joined = RangeJoin.intervalOverlap(a, col("as"), col("ae"),
      b, col("bs"), col("be"), bucketWidth = 100L)
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan)
  }

  test("non-integral time columns fail fast at call time") {
    val points = Seq((1L, "x")).toDF("pid", "t")
    val intervals = Seq((1L, 0L, 10L)).toDF("iid", "s", "e")
    val err = intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(points, col("t"), intervals,
        col("s"), col("e"), bucketWidth = 100L)
    }
    assert(err.getMessage.contains("integral"))
    intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(points.select(col("pid"), lit(1L).as("t")),
        col("t"), intervals, col("s"), col("e"), bucketWidth = 0L)
    }
  }
}
