package graft.model

import org.apache.spark.sql.types._

/** Core record types of the engine.
  *
  * The reference's only input record is the JSON "log frame"
  * `{"ts": <epoch-seconds>, "uid": <string>}` (reference README.md:23,
  * FIXTURES.md §1). `LogFrame` is its typed form; extra JSON fields are
  * ignored by schema-on-read (reference README.md:7, 21).
  */
final case class LogFrame(ts: Long, uid: String)

/** One closed window's metric — the reference's output record
  * (reference UniqueUsersApp.java:129–133): unique users per 1-minute
  * event-time window.
  */
final case class WindowMetric(windowStart: java.sql.Timestamp, uniqueUsers: Long)

object Schemas {
  /** Schema-on-read for log frames (reference parses ad hoc with
    * json-simple at UniqueUsersApp.java:206–216; we declare the schema and
    * let `from_json` reject corrupt rows to null).
    */
  val logFrame: StructType = StructType(Seq(
    StructField("ts", LongType),
    StructField("uid", StringType)))

  /** The driver-provided `events` table (TESTDATA.md): the engine's
    * batch/stream fixture standing in for the Kafka log-frames topic.
    * `user_id` ≙ uid, `ts` ≙ event time (already a timestamp).
    */
  val events: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))
}
