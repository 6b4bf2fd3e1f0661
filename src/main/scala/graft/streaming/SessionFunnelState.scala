package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** The mergeable state recurrence behind `streaming_sessions_funnel`
  * (StreamingQueries): gap sessionization + in-session ordered funnel,
  * versioned as two state relations and advanced one TIME-SPLIT
  * micro-batch at a time.
  *
  *  - per-USER sessionizer state (last_us, last_sidx, first_us): a new
  *    batch's first row per user gaps against last_us, so a session open
  *    at the batch boundary continues, and a > gap boundary opens
  *    session last_sidx + 1;
  *  - per-(user, session) funnel state (n_events, t1, t2, t3): counts
  *    sum, and each funnel step's batch candidates filter against the
  *    step-(k−1) time AS MERGED THIS BATCH — the order argument that
  *    makes the conditional-min chain mergeable under time splits.
  *
  * Extracted from the gate's foreachBatch so the batch-boundary
  * INVARIANCE claim is testable directly: folding this merge over ANY
  * time-split partitioning of the input must land on identical final
  * state relations (EngineProperties re-splits at random quantiles).
  */
object SessionFunnelState {

  val userSchema: StructType = StructType(Seq(
    StructField("user_id", LongType), StructField("last_us", LongType),
    StructField("last_sidx", LongType), StructField("first_us", LongType)))

  val sessSchema: StructType = StructType(Seq(
    StructField("user_id", LongType), StructField("sidx", LongType),
    StructField("n_events", LongType), StructField("t1", LongType),
    StructField("t2", LongType), StructField("t3", LongType)))

  def emptyUser(s: SparkSession): DataFrame =
    s.createDataFrame(new java.util.ArrayList[Row](), userSchema)

  def emptySess(s: SparkSession): DataFrame =
    s.createDataFrame(new java.util.ArrayList[Row](), sessSchema)

  /** Advance both state relations by one micro-batch.
    *
    * `df` carries (user_id, event_id, ts — epoch-µs long, event_type);
    * batches must be TIME-SPLIT (every ts in this batch ≥ every ts
    * already merged). Per call: one batch-sized per-user window +
    * key-cardinality joins against state. */
  def mergeBatch(df: DataFrame, uSt: DataFrame, sSt: DataFrame,
                 gapUs: Long = 1800000000L): (DataFrame, DataFrame) = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val wRun = w.rowsBetween(Window.unboundedPreceding, 0)
    // sessionize the batch; the first row per user gaps against the
    // state's last_us (null for a new user → no break → sidx 0)
    val batch = df
      .join(uSt.select(col("user_id"), col("last_us"),
        col("last_sidx")), Seq("user_id"), "left")
      .withColumn("prev_us",
        coalesce(lag(col("ts"), 1).over(w), col("last_us")))
      .withColumn("is_break",
        coalesce((col("ts") - col("prev_us") > gapUs)
          .cast("long"), lit(0L)))
      .withColumn("sidx", coalesce(col("last_sidx"), lit(0L))
        + sum(col("is_break")).over(wRun))
      .select(col("user_id"), col("event_id"), col("ts"),
        col("event_type"), col("sidx"))
    val key = Seq("user_id", "sidx")
    // merge per-session state: counts sum, funnel mins chain against
    // the state-as-merged-this-batch step times
    val bn = batch.groupBy(col("user_id"), col("sidx"))
      .agg(count(lit(1)).as("bn"))
    val s0 = sSt.join(bn, key, "full_outer")
      .select(col("user_id"), col("sidx"),
        (coalesce(col("n_events"), lit(0L)) +
          coalesce(col("bn"), lit(0L))).as("n_events"),
        col("t1"), col("t2"), col("t3"))
    val b1 = batch.filter(col("event_type") === "view")
      .groupBy(col("user_id"), col("sidx")).agg(min(col("ts")).as("bt1"))
    val s1 = s0.join(b1, key, "left")
      .select(col("user_id"), col("sidx"), col("n_events"),
        least(col("t1"), col("bt1")).as("t1"), col("t2"), col("t3"))
    val b2 = batch.filter(col("event_type") === "click")
      .join(s1.select(col("user_id"), col("sidx"), col("t1")), key)
      .filter(col("ts") > col("t1"))
      .groupBy(col("user_id"), col("sidx")).agg(min(col("ts")).as("bt2"))
    val s2 = s1.join(b2, key, "left")
      .select(col("user_id"), col("sidx"), col("n_events"), col("t1"),
        least(col("t2"), col("bt2")).as("t2"), col("t3"))
    val b3 = batch.filter(col("event_type") === "purchase")
      .join(s2.select(col("user_id"), col("sidx"), col("t2")), key)
      .filter(col("ts") > col("t2"))
      .groupBy(col("user_id"), col("sidx")).agg(min(col("ts")).as("bt3"))
    val s3 = s2.join(b3, key, "left")
      .select(col("user_id"), col("sidx"), col("n_events"), col("t1"),
        col("t2"), least(col("t3"), col("bt3")).as("t3"))
    // merge per-user sessionizer state (time-split: batch max IS the
    // new last_us; batch max sidx IS the new last session)
    val bu = batch.groupBy(col("user_id")).agg(
      max(col("ts")).as("bmax"), min(col("ts")).as("bmin"),
      max(col("sidx")).as("bsidx"))
    val u1 = uSt.join(bu, Seq("user_id"), "full_outer")
      .select(col("user_id"),
        greatest(col("last_us"), col("bmax")).as("last_us"),
        coalesce(col("bsidx"), col("last_sidx")).as("last_sidx"),
        least(col("first_us"), col("bmin")).as("first_us"))
    (u1, s3)
  }
}
