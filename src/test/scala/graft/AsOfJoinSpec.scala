package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.operators.AsOfJoin
import graft.functions.TypedAggs

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  test("asOf picks the latest right row at-or-before each left time, per key") {
    val left = Seq(
      (1L, ts(100), "l1"), (1L, ts(200), "l2"), (1L, ts(50), "l0"),
      (2L, ts(150), "l3")).toDF("k", "t", "lbl")
    val right = Seq(
      (1L, ts(90), 901L), (1L, ts(100), 910L), (1L, ts(100), 911L),
      (1L, ts(199), 920L), (2L, ts(151), 930L)).toDF("k", "t", "rid")

    val out = AsOfJoin.asOf(left, right,
        col("k"), col("k"), col("t"), col("t"),
        Seq("rid" -> col("rid")), col("rid"))
      .collect().map(r => r.getAs[String]("lbl") ->
        Option(r.getAs[Any]("asof_rid")).map(_.asInstanceOf[Long])).toMap

    assert(out("l0").isEmpty)              // nothing at-or-before t=50
    assert(out("l1").contains(911L))       // equal-time rows visible; max tiebreak wins
    assert(out("l2").contains(920L))       // latest before 200
    assert(out("l3").isEmpty)              // right row is AFTER the left row
  }

  test("asOf keys never mix") {
    val left = Seq((1L, ts(100), "a"), (2L, ts(100), "b")).toDF("k", "t", "lbl")
    val right = Seq((1L, ts(50), 7L)).toDF("k", "t", "rid")
    val out = AsOfJoin.asOf(left, right, col("k"), col("k"), col("t"), col("t"),
        Seq("rid" -> col("rid")), col("rid"))
      .collect().map(r => r.getAs[String]("lbl") ->
        Option(r.getAs[Any]("asof_rid"))).toMap
    assert(out("a").contains(7L) && out("b").isEmpty)
  }

  test("asOfNative edge cases: same picks as the composed operator") {
    val left = Seq(
      (1L, ts(100), "l1"), (1L, ts(200), "l2"), (1L, ts(50), "l0"),
      (2L, ts(150), "l3")).toDF("k", "t", "lbl")
    val right = Seq(
      (1L, ts(90), 901L), (1L, ts(100), 910L), (1L, ts(100), 911L),
      (1L, ts(199), 920L), (2L, ts(151), 930L))
      .toDF("rk", "rt", "rid")
    val out = AsOfJoin.asOfNative(left, right, "k", "t", "rk", "rt", "rid")
      .collect().map(r => r.getAs[String]("lbl") ->
        Option(r.getAs[Any]("rid")).map(_.asInstanceOf[Long])).toMap
    assert(out("l0").isEmpty)        // nothing at-or-before t=50
    assert(out("l1").contains(911L)) // inclusive <=; max tiebreak at equal time
    assert(out("l2").contains(920L)) // latest before 200
    assert(out("l3").isEmpty)        // right row is after the left row
  }

  test("asOfNative: a null-time right row must not starve its key group") {
    // null times sort NULLS FIRST; if the merge refuses to consume the
    // null-time row, every later (valid) right row of key 1 is unreachable
    val left = Seq((1L, Some(ts(20)), "l1")).toDF("k", "t", "lbl")
    val right = Seq(
      (1L, None: Option[Timestamp], 900L),
      (1L, Some(ts(10)), 901L)).toDF("rk", "rt", "rid")
    val out = AsOfJoin.asOfNative(left, right, "k", "t", "rk", "rt", "rid")
      .collect().map(r => r.getAs[String]("lbl") ->
        Option(r.getAs[Any]("rid")).map(_.asInstanceOf[Long])).toMap
    assert(out("l1").contains(901L))
  }

  test("asOfNative fail-fast guards reject silently-wrong configurations") {
    val left = Seq((1L, ts(1), "x")).toDF("k", "t", "lbl")
    val right = Seq((1L, ts(1), 1L)).toDF("rk", "rt", "rid")
    // self-join without re-aliasing: shared attribute ids
    intercept[IllegalArgumentException] {
      AsOfJoin.asOfNative(left, left, "k", "t", "k", "t", "lbl")
    }
    // mismatched key types
    intercept[IllegalArgumentException] {
      AsOfJoin.asOfNative(left,
        right.select($"rk".cast("string").as("rk"), $"rt", $"rid"),
        "k", "t", "rk", "rt", "rid")
    }
    // mismatched time types
    intercept[IllegalArgumentException] {
      AsOfJoin.asOfNative(left,
        right.select($"rk", $"rt".cast("long").as("rt"), $"rid"),
        "k", "t", "rk", "rt", "rid")
    }
    // fractional keys (no NormalizeFloatingNumbers on the custom node)
    intercept[IllegalArgumentException] {
      AsOfJoin.asOfNative(left.select($"k".cast("double").as("k"), $"t", $"lbl"),
        right.select($"rk".cast("double").as("rk"), $"rt", $"rid"),
        "k", "t", "rk", "rt", "rid")
    }
  }

  test("asOfNative matches the composed asOf row-for-row on real event data") {
    val ev = graft.sources.Tables.events(spark, sf001)
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"ts")
    val clicks = ev.filter($"event_type" === "click")
      .select($"event_id".as("click_id"), $"user_id".as("click_user"),
        $"ts".as("click_ts"))
    val composed = AsOfJoin.asOf(purchases,
        clicks.select($"click_id".as("event_id"), $"click_user".as("user_id"),
          $"click_ts".as("ts")),
        col("user_id"), col("user_id"), col("ts"), col("ts"),
        Seq("click_id" -> col("event_id")), col("event_id"))
      .select($"event_id", $"asof_click_id".as("click_id"))
      .collect().map(r => r.getLong(0) -> Option(r.getAs[Any](1))).toMap
    val native = AsOfJoin.asOfNative(purchases, clicks,
        "user_id", "ts", "click_user", "click_ts", "click_id")
      .select($"event_id", $"click_id")
      .collect().map(r => r.getLong(0) -> Option(r.getAs[Any](1))).toMap
    assert(native.size == composed.size)
    assert(native == composed)
  }

  test("asOfNative plans the custom exec with one exchange and sort per side") {
    val left = Seq((1L, ts(1), "x")).toDF("k", "t", "lbl")
    val right = Seq((1L, ts(1), 1L)).toDF("rk", "rt", "rid")
    val p = AsOfJoin.asOfNative(left, right, "k", "t", "rk", "rt", "rid")
      .queryExecution.executedPlan.toString
    assert(p.contains("AsOfJoin "), p) // exec renders without the Exec suffix
    assert(p.split("Exchange").length - 1 == 2, s"expected one shuffle per side:\n$p")
  }

  test("typed DistinctCountAgg matches count_distinct and handles empty/merge") {
    val ds = Seq("a", "b", "a", "c", "b").toDS()
    val n = ds.select(TypedAggs.distinctCount.toColumn).head()
    assert(n == 3L)
    val empty = spark.emptyDataset[String].select(TypedAggs.distinctCount.toColumn).head()
    assert(empty == 0L) // no {""} ghost element (the reference serde's bug)
    // distributed merge path: many partitions
    val big = (1 to 1000).map(i => s"v${i % 37}").toDS().repartition(13)
    assert(big.select(TypedAggs.distinctCount.toColumn).head() == 37L)
  }
}
