package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.UpsertSink

/** Contract pins for the foreachBatch merge reduction: idempotent batch
  * replay (the sink-failure recovery property) and strict latest-wins. */
class UpsertSinkSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.select("user_id", "event_id", "ts").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("replaying the same batch onto the merged state is a no-op") {
    val state = Seq((1L, 10L, 100L), (2L, 20L, 200L))
      .toDF("user_id", "event_id", "ts")
    val batch = Seq((1L, 11L, 150L), (3L, 30L, 300L))
      .toDF("user_id", "event_id", "ts")
    val once = UpsertSink.mergeLatest(Some(state), batch,
      "user_id", "ts", "event_id")
    val twice = UpsertSink.mergeLatest(Some(once), batch,
      "user_id", "ts", "event_id")
    assert(rows(once) == rows(twice))
    assert(rows(once) ==
      Set((1L, 11L, 150L), (2L, 20L, 200L), (3L, 30L, 300L)))
  }

  test("latest wins by ordering, not by side; tiebreak on event_id") {
    val state = Seq((1L, 99L, 500L)).toDF("user_id", "event_id", "ts")
    // older batch row must LOSE to newer state row
    val older = Seq((1L, 5L, 100L)).toDF("user_id", "event_id", "ts")
    assert(rows(UpsertSink.mergeLatest(Some(state), older,
      "user_id", "ts", "event_id")) == Set((1L, 99L, 500L)))
    // equal ts: higher event_id wins regardless of side
    val tie = Seq((1L, 100L, 500L)).toDF("user_id", "event_id", "ts")
    assert(rows(UpsertSink.mergeLatest(Some(state), tie,
      "user_id", "ts", "event_id")) == Set((1L, 100L, 500L)))
  }

  test("first batch: None state reduces the batch itself") {
    val batch = Seq((1L, 1L, 10L), (1L, 2L, 20L), (2L, 3L, 5L))
      .toDF("user_id", "event_id", "ts")
    assert(rows(UpsertSink.mergeLatest(None, batch,
      "user_id", "ts", "event_id")) == Set((1L, 2L, 20L), (2L, 3L, 5L)))
  }
}
