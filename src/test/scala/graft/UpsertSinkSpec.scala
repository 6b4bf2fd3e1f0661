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

  private def opRows(df: org.apache.spark.sql.DataFrame) =
    df.select("user_id", "event_id", "ts", "op").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSet

  test("tombstone retention: a stale upsert cannot resurrect a deleted key") {
    // key 1: upsert@ts=1 then delete@ts=3 land first; a LATE batch then
    // delivers the out-of-order upsert@ts=2. If the delete had been
    // applied at merge time (row dropped), the stale upsert would find
    // no state row to outrank it and the key would come back to life.
    val b1 = Seq((1L, 10L, 1L, "U"), (1L, 30L, 3L, "D"))
      .toDF("user_id", "event_id", "ts", "op")
    val s1 = UpsertSink.mergeLatest(None, b1, "user_id", "ts", "event_id")
    assert(opRows(s1) == Set((1L, 30L, 3L, "D")),
      "tombstone must persist as the key's state row")
    val late = Seq((1L, 20L, 2L, "U")).toDF("user_id", "event_id", "ts", "op")
    val s2 = UpsertSink.mergeLatest(Some(s1), late, "user_id", "ts", "event_id")
    assert(opRows(s2) == Set((1L, 30L, 3L, "D")),
      "stale upsert outranked the retained tombstone")
    assert(UpsertSink.readView(s2).isEmpty,
      "readers must not observe the deleted key")
  }

  test("readView drops tombstones, keeps live rows") {
    val st = Seq((1L, 1L, 5L, "U"), (2L, 2L, 6L, "D"), (3L, 3L, 7L, "U"))
      .toDF("user_id", "event_id", "ts", "op")
    assert(opRows(UpsertSink.readView(st)) ==
      Set((1L, 1L, 5L, "U"), (3L, 3L, 7L, "U")))
  }
}
