package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's main topology as a Structured Streaming pipeline
  * (SURVEY §3 "Target Spark plan"): watermark → tumbling window → exact
  * in-window dedup → per-window count.
  *
  * `dropDuplicates(window, uid)` is the canonical translation of the
  * reference's WindowStore + DeduplicateValueTransformer (UniqueUsersApp
  * .java:101–110, 118; DeduplicateValueTransformer.java:38–48): keyed
  * first-seen state, evicted by watermark instead of store retention —
  * which fixes the reference's "counts regrow after retention" bug
  * (reference README.md:196).
  *
  * Output-mode contract (SURVEY §2.1 caveat):
  *  - `append` + watermark = one final count per closed window — the
  *    behavior the reference *intended* but couldn't reach (its `suppress`
  *    is commented out "Could not make it work", UniqueUsersApp.java:119);
  *  - `update` = the reference's *observed* behavior (running intermediate
  *    counts, cache buffering disabled at :76);
  *  - `complete` (testing/small state) = full table every trigger.
  * The mode is chosen at `writeStream`; this builder only fixes the plan.
  *
  * State sizing at scale: one dedup state row per (window, uid) until the
  * watermark closes the window — the 100 TB constraint (SURVEY §7 risk 2).
  * The sketch escape hatch is `UniqueUsers.perMinuteApprox`.
  */
object UniqueUsersStream {

  /** Build the windowed-distinct-count plan over typed frames
    * (eventTime: timestamp, uid). `watermark = None` → unbounded state
    * (only for tests/complete mode). */
  def uniquePerWindow(frames: DataFrame,
                      window: String = "1 minute",
                      watermark: Option[String] = Some("1 minute")): DataFrame = {
    val marked = watermark.fold(frames)(w => frames.withWatermark("eventTime", w))
    marked
      .select(org.apache.spark.sql.functions.window(col("eventTime"), window).as("w"),
        col("uid"))
      .dropDuplicates("w", "uid")
      .groupBy(col("w"))
      .agg(count(lit(1)).as("unique_users"))
      .select(col("w.start").as("window_start"),
        col("w.end").as("window_end"),
        col("unique_users"))
  }

  /** Sink projection for Kafka: (key, value) strings — key = window-start
    * epoch seconds (the reference's key shape), value = JSON metric
    * (discharges reference README.md:194 "Produce the metrics as json"). */
  def toKafkaRecords(counts: DataFrame): DataFrame =
    counts.select(
      unix_timestamp(col("window_start")).cast("string").as("key"),
      to_json(struct(
        unix_timestamp(col("window_start")).as("windowStart"),
        col("unique_users").as("uniqueUsers"))).as("value"))
}
