package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.model.Schemas

/** JSON log-frame ingestion: raw (key, value) records → typed
  * (eventTime, uid) frames, with explicit reject policy.
  *
  * Reference equivalents: ad-hoc json-simple parsing returning "" on
  * failure (UniqueUsersApp.java:206–216), the empty-uid filter (:114), and
  * the timestamp extractor that silently maps malformed keys to the
  * epoch-0 window (LogFrameTimestampExtractor.java:11–12). Here the schema
  * is declared once, corrupt rows become nulls (`from_json` permissive
  * mode), and rejects are *dropped and counted* — never epoch-0-bucketed
  * (FIXTURES.md §1 engine policy).
  */
object LogFrames {

  /** Parse a raw string/binary value column into (eventTime, uid).
    * Corrupt JSON, missing fields, or non-numeric ts → null columns. */
  def parse(raw: DataFrame, valueCol: Column): DataFrame =
    raw.select(from_json(valueCol.cast("string"), Schemas.logFrame).as("f"))
      .select(timestamp_seconds(col("f.ts")).as("eventTime"), col("f.uid").as("uid"))

  /** The reject filter: both fields present and uid non-empty. */
  def valid(frames: DataFrame): DataFrame =
    frames.filter(col("eventTime").isNotNull &&
      col("uid").isNotNull && length(col("uid")) > 0)

  /** `observe` hook: counts total vs rejected rows per micro-batch so the
    * drop policy is measurable (query-progress listeners / batch metrics).
    */
  def observed(frames: DataFrame, name: String = "log_frames"): DataFrame =
    frames.observe(name,
      count(lit(1)).as("rows"),
      count(when(col("eventTime").isNull ||
        col("uid").isNull || length(col("uid")) === 0, 1)).as("rejects"))
}
