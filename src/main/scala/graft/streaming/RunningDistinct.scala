package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues}

/** `transformWithState` (Spark 4 arbitrary-state v2) form of the
  * reference's per-record emission: a running distinct-user count per
  * window key, updated on every new uid — the modern engine-native way to
  * express what the reference builds from WindowStore + transformer +
  * downstream count with cache buffering disabled (UniqueUsersApp.java:76,
  * 101–129): one state handle per key, typed state variables, update-mode
  * emission per input that changes the count.
  *
  * State: a ValueState[Long] running count plus a ListState[String] of
  * seen uids per bucket key (RocksDB-backed; the provider is a config,
  * not a code change). Used where the built-in
  * dropDuplicates→count pair can't express the semantics (e.g. emit the
  * running value itself, custom eviction); otherwise prefer the built-ins
  * (UniqueUsersStream).
  */
object RunningDistinct {

  final case class In(bucket: Long, uid: String)
  final case class Out(bucket: Long, uniqueUsers: Long)

  class Processor extends StatefulProcessor[Long, In, Out] {
    @transient private var seen: org.apache.spark.sql.streaming.ListState[String] = _
    @transient private var count: org.apache.spark.sql.streaming.ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      seen = getHandle.getListState[String]("seen", Encoders.STRING, org.apache.spark.sql.streaming.TTLConfig.NONE)
      count = getHandle.getValueState[Long]("count", Encoders.scalaLong, org.apache.spark.sql.streaming.TTLConfig.NONE)
    }

    override def handleInputRows(key: Long, rows: Iterator[In],
                                 timers: TimerValues): Iterator[Out] = {
      val already = scala.collection.mutable.Set[String]()
      seen.get().foreach(already += _)
      var c = if (count.exists()) count.get() else 0L
      var changed = false
      rows.foreach { r =>
        if (!already.contains(r.uid)) {
          already += r.uid
          seen.appendValue(r.uid)
          c += 1
          changed = true
        }
      }
      if (changed) { count.update(c); Iterator.single(Out(key, c)) }
      else Iterator.empty
    }
  }

  /** Running unique count per bucket; emits a row whenever a bucket's
    * count changes (update-mode semantics). */
  def runningUniquePerBucket(ds: Dataset[In]): Dataset[Out] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.groupByKey(_.bucket)
      .transformWithState(new Processor, TimeMode.None(), OutputMode.Update())
  }
}
