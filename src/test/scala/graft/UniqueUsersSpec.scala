package graft

import org.apache.spark.sql.functions._
import graft.model.LogFrame
import graft.operators.UniqueUsers
import graft.time.TimeOps

/** Core-pipeline semantics against the reference's own interactive probe
  * (FIXTURES.md §3 / reference README.md:171–185): 20 events, uid 1..20,
  * ts stepping 10 s from 1468244340 → expected per-window distinct counts
  * 6, 6, 6, 2 over minutes 14:39–14:42.
  */
class UniqueUsersSpec extends SparkSpec {
  import spark.implicits._

  private def probeFrames: Seq[LogFrame] =
    (0 until 20).map(i => LogFrame(1468244340L + 10L * i, (i + 1).toString))

  private def counts(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  private val expected = Map(
    1468244340L -> 6L, 1468244400L -> 6L, 1468244460L -> 6L, 1468244520L -> 2L)

  test("perMinute matches the reference probe (6,6,6,2)") {
    val df = probeFrames.toDF()
      .select(TimeOps.fromEpochSeconds($"ts").as("eventTime"), $"uid")
    assert(counts(UniqueUsers.perMinute(df, $"eventTime", $"uid")) == expected)
  }

  test("two-phase dedup-then-count ≡ count_distinct (reference topology shape)") {
    val df = probeFrames.toDF()
      .select(TimeOps.fromEpochSeconds($"ts").as("eventTime"), $"uid")
    assert(counts(UniqueUsers.perMinuteTwoPhase(df, $"eventTime", $"uid")) == expected)
  }

  test("duplicate uids within a minute counted once; across minutes once per minute") {
    // same uid at :00 and :30 of one minute, and again in the next minute
    val frames = Seq(
      LogFrame(1468244340L, "a"), LogFrame(1468244370L, "a"),
      LogFrame(1468244400L, "a"), LogFrame(1468244400L, "b"))
    val df = frames.toDF().select(TimeOps.fromEpochSeconds($"ts").as("t"), $"uid")
    assert(counts(UniqueUsers.perMinute(df, $"t", $"uid")) ==
      Map(1468244340L -> 1L, 1468244400L -> 2L))
  }

  test("null/empty uids are the caller's filter concern — engine filter drops them") {
    val df = Seq(("1468244340", "x"), ("1468244350", ""), ("1468244355", null))
      .toDF("ts", "uid")
      .select(TimeOps.fromEpochSeconds($"ts".cast("long")).as("t"), $"uid")
      .filter($"uid".isNotNull && length($"uid") > 0)
    assert(counts(UniqueUsers.perMinute(df, $"t", $"uid")) == Map(1468244340L -> 1L))
  }

  test("empty and single-row inputs produce empty / single results, no errors") {
    val empty = Seq.empty[LogFrame].toDF()
      .select(TimeOps.fromEpochSeconds($"ts").as("t"), $"uid")
    assert(UniqueUsers.perMinute(empty, $"t", $"uid").count() == 0)
    assert(UniqueUsers.perMinuteTwoPhase(empty, $"t", $"uid").count() == 0)
    val one = Seq(LogFrame(1468244340L, "solo")).toDF()
      .select(TimeOps.fromEpochSeconds($"ts").as("t"), $"uid")
    assert(counts(UniqueUsers.perMinute(one, $"t", $"uid")) == Map(1468244340L -> 1L))
  }

  test("uids containing delimiter characters are never corrupted (reference serde bug)") {
    // HashSetStringSerde joined sets with '|' (reference
    // HashSetStringSerde.java:20–27) so uids containing '|' corrupted the
    // buffer; Spark encoders carry opaque strings — counts must be exact
    val frames = Seq(
      LogFrame(1468244340L, "a|b"), LogFrame(1468244340L, "a"),
      LogFrame(1468244340L, "b"), LogFrame(1468244340L, "a|b"),
      LogFrame(1468244340L, ","), LogFrame(1468244340L, ""))
    val df = frames.toDF().select(TimeOps.fromEpochSeconds($"ts").as("t"), $"uid")
      .filter(length($"uid") > 0)
    assert(counts(UniqueUsers.perMinute(df, $"t", $"uid")) == Map(1468244340L -> 4L))
    // the typed set-buffer aggregator agrees
    val viaAgg = df.select($"uid").as[String]
      .select(graft.functions.TypedAggs.distinctCount.toColumn).head()
    assert(viaAgg == 4L)
  }

  test("approx distinct is within rsd of exact on sf0.001 events") {
    val ev = graft.sources.Tables.events(spark, sf001)
    val exact = UniqueUsers.perMinute(ev, $"ts", $"user_id")
      .agg(sum($"unique_users")).as[Long].head()
    val approx = UniqueUsers.perMinuteApprox(ev, $"ts", $"user_id", rsd = 0.02)
      .agg(sum($"unique_users_approx")).as[Long].head()
    assert(math.abs(approx - exact).toDouble / exact < 0.1)
  }
}
