package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TimeMode, TimerValues}

/** `transformWithState` (Spark 4 arbitrary-state v2) form of the
  * reference's per-record emission: a running distinct-user count per
  * window key, updated on every new uid — the modern engine-native way to
  * express what the reference builds from WindowStore + transformer +
  * downstream count with cache buffering disabled (UniqueUsersApp.java:76,
  * 101–129): one state handle per key, typed state variables, update-mode
  * emission per input that changes the count.
  *
  * State: a MapState[String, Boolean] membership set plus a
  * ValueState[Long] running count per bucket key (RocksDB-backed; the
  * provider is a config, not a code change). Membership is a POINT LOOKUP
  * per incoming uid — O(new rows) RocksDB gets — never a scan of the
  * bucket's full seen-set (the ListState predecessor drained the whole
  * list into a heap Set on EVERY micro-batch: O(|seen|) per key per batch
  * and unbounded task memory for a hot bucket).
  *
  * Eviction mirrors the reference's 1-minute store retention
  * (UniqueUsersApp.java:103–106, `Materialized.withRetention`): when a
  * bucket first appears, an EVENT-TIME timer is registered at
  * bucket-close + retention; when the watermark passes it, the bucket's
  * map and count are cleared (handleExpiredTimer) — stream-time
  * retention, exactly the WindowStore semantic, so state size is bounded
  * by (retention / window) × active keys instead of growing forever.
  * Late rows for an evicted bucket re-register the timer and re-count
  * from empty — the same re-open behavior a retention-expired
  * WindowStore gives the reference.
  */
object RunningDistinct {

  final case class In(bucket: Long, uid: String, eventTime: java.sql.Timestamp)
  final case class Out(bucket: Long, uniqueUsers: Long)

  /** Window length and post-close retention, ms (reference:
    * 1-minute windows retained 1 minute, UniqueUsersApp.java:96,103). */
  val WindowMs: Long = 60000L
  val RetentionMs: Long = 60000L

  class Processor extends StatefulProcessor[Long, In, Out] {
    @transient private var seen: org.apache.spark.sql.streaming.MapState[String, Boolean] = _
    @transient private var count: org.apache.spark.sql.streaming.ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      // TTLConfig.NONE on purpose: TTL is PROCESSING-time based; the
      // reference's retention is stream-time, which is what the explicit
      // event-time timer implements.
      seen = getHandle.getMapState[String, Boolean]("seen",
        Encoders.STRING, Encoders.scalaBoolean,
        org.apache.spark.sql.streaming.TTLConfig.NONE)
      count = getHandle.getValueState[Long]("count", Encoders.scalaLong,
        org.apache.spark.sql.streaming.TTLConfig.NONE)
    }

    override def handleInputRows(key: Long, rows: Iterator[In],
                                 timers: TimerValues): Iterator[Out] = {
      val fresh = !count.exists()
      if (fresh) {
        // first sight of this bucket (or first after eviction): arm its
        // stream-time eviction at close + retention
        getHandle.registerTimer(key * 1000L + WindowMs + RetentionMs)
      }
      var c = if (fresh) 0L else count.get()
      var changed = false
      rows.foreach { r =>
        if (!seen.containsKey(r.uid)) {
          seen.updateValue(r.uid, true)
          c += 1
          changed = true
        }
      }
      if (changed) { count.update(c); Iterator.single(Out(key, c)) }
      else Iterator.empty
    }

    override def handleExpiredTimer(key: Long, timers: TimerValues,
                                    expired: ExpiredTimerInfo): Iterator[Out] = {
      seen.clear()
      count.clear()
      Iterator.empty
    }
  }

  /** Running unique count per bucket; emits a row whenever a bucket's
    * count changes (update-mode semantics). `ds.eventTime` drives the
    * watermark that both bounds lateness and fires the retention timers;
    * `delay` is the out-of-order allowance. */
  def runningUniquePerBucket(ds: Dataset[In],
                             delay: String = "0 seconds"): Dataset[Out] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.withWatermark("eventTime", delay)
      .groupByKey(_.bucket)
      .transformWithState(new Processor, TimeMode.EventTime(), OutputMode.Update())
  }
}
