package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.scalatest.funsuite.AnyFunSuite

/** Pins the SCD2 changelog→history semantics (EventQueries.scd2UserState):
  * run-length compression on state changes, lead-closed intervals,
  * is_current on the open tail — against a hand-written changelog. */
class Scd2Spec extends AnyFunSuite with SparkSpec {

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  test("changelog compresses into lead-closed intervals per user") {
    import spark.implicits._
    // user 1: a a b a  → intervals a@[0,20) b@[20,30) a@[30,∞)
    // user 2: x        → x@[100,∞)
    val ev = Seq(
      (0L, ts(0),   1L, "a"), (1L, ts(10), 1L, "a"),
      (2L, ts(20),  1L, "b"), (3L, ts(30), 1L, "a"),
      (4L, ts(100), 2L, "x"))
      .toDF("event_id", "ts", "user_id", "event_type")

    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val got = ev
      .withColumn("prev_state", lag(col("event_type"), 1).over(w))
      .filter(col("prev_state").isNull || col("prev_state") =!= col("event_type"))
      .withColumn("valid_from_us", unix_micros(col("ts")))
      .withColumn("valid_to_us", lead(col("valid_from_us"), 1).over(w))
      .select(col("user_id"), col("event_type").as("state"),
        col("valid_from_us"), col("valid_to_us"),
        col("valid_to_us").isNull.as("is_current"))
      .orderBy(col("user_id"), col("valid_from_us"))
      .collect().toSeq.map(r => (r.getLong(0), r.getString(1),
        r.getLong(2) / 1000000L,
        if (r.isNullAt(3)) -1L else r.getLong(3) / 1000000L, r.getBoolean(4)))

    assert(got == Seq(
      (1L, "a", 0L, 20L, false),
      (1L, "b", 20L, 30L, false),
      (1L, "a", 30L, -1L, true),
      (2L, "x", 100L, -1L, true)))
  }

  test("gate runs on testdata: intervals tile each user's timeline") {
    val out = Queries.all("scd2_user_state")(spark, "/root/testdata/sf0.001")
    // per user: exactly one open (is_current) interval, and every closed
    // interval's end equals the next interval's start (tiling, no gaps)
    val open = out.groupBy("user_id")
      .agg(sum(when(col("is_current"), 1).otherwise(0)).as("n_open"))
      .filter(col("n_open") =!= 1).count()
    assert(open == 0)
    val w = Window.partitionBy(col("user_id")).orderBy(col("valid_from_us"))
    val gaps = out
      .withColumn("next_from", lead(col("valid_from_us"), 1).over(w))
      .filter(col("next_from").isNotNull &&
        col("valid_to_us") =!= col("next_from")).count()
    assert(gaps == 0)
  }
}
