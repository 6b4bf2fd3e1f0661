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

  /** `events` read with an EXPLICIT long ts: the file stores parquet
    * TIMESTAMP(NANOS); Spark 4.1+ decodes that to its internal µs
    * representation (floor ns→µs) and, when the user-supplied schema asks
    * for LongType, surfaces the internal value — so `ts` here is
    * **epoch-MICROS**. (Through Spark 4.0 the `nanosAsLong` legacy conf
    * yielded raw nanos instead; that conf is gone in 4.1, and inferred
    * reads now come back as TIMESTAMP_NTZ — see `Tables.events`.)
    * Streaming readers use this schema because `readStream` requires one. */
  val eventsRawMicros: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** The one place the ns→µs contract lives: floor-convert an epoch-nanos
    * long to TimestampType. Integral DIV, not `/` — an epoch-ns (~1.7e18)
    * exceeds double's 2^53 exact range, so double division would shift
    * timestamps by up to ~0.3 µs. */
  def tsFromNanos(nanos: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    import org.apache.spark.sql.catalyst.expressions.{IntegralDivide, Literal}
    org.apache.spark.sql.functions.timestamp_micros(
      ColumnBridge.column(new IntegralDivide(
        ColumnBridge.expression(nanos), Literal(1000L))))
  }

  /** Epoch-micros long (the [[eventsRawMicros]] contract) → TimestampType. */
  def tsFromMicros(micros: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.timestamp_micros(micros)
}
