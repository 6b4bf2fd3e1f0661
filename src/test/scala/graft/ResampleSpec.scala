package graft

import org.apache.spark.sql.functions._

/** Semantic pins for resample_ffill beyond the oracle: grid contiguity,
  * fill direction (past only), and observed-point fidelity. */
class ResampleSpec extends SparkSpec {

  private lazy val out =
    Queries.all("resample_ffill")(spark, sf001).cache()

  test("every user's grid is contiguous hourly from first to last observation") {
    val bad = out.groupBy(col("user_id"))
      .agg(min(col("h")).as("h0"), max(col("h")).as("h1"),
        count(lit(1)).as("n"))
      .filter(col("n") =!= (col("h1") - col("h0")) / 3600 + 1)
      .count()
    assert(bad == 0, s"$bad users have holes or duplicates in their grid")
  }

  test("filled points carry the PREVIOUS observation, never a future one") {
    // v_ff at any point must equal v_ff at the latest observed point at
    // or before it — i.e. once set, v_ff only changes AT observed rows
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("h"))
    val changedUnobserved = out
      .withColumn("prev_ff", lag(col("v_ff"), 1).over(w))
      .filter(!col("is_observed") && col("prev_ff").isNotNull &&
        col("v_ff") =!= col("prev_ff"))
      .count()
    assert(changedUnobserved == 0,
      "a filled (unobserved) grid point changed the running value")
  }

  test("ohlc_hourly ≡ window-based first/last; plans as sort-free hash aggregate") {
    val ohlc = Queries.all("ohlc_hourly")(spark, sf001)
    // reference semantics the slow way: first/last per (user, hour) via
    // a per-group sort window over the same composite ordinal
    val ev = graft.sources.Tables.events(spark, sf001).select(
      col("user_id"),
      unix_timestamp(date_trunc("hour", col("ts"))).as("h"),
      unix_micros(col("ts")).as("us"), col("event_id"),
      round(col("value") * 100).cast("long").as("v_fp"))
      .withColumn("ord",
        (col("us") - col("h") * lit(1000000L)) * lit(2147483648L) +
          col("event_id"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"), col("h")).orderBy(col("ord"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    val viaWindow = ev
      .withColumn("open_fp", first(col("v_fp")).over(w))
      .withColumn("close_fp", last(col("v_fp")).over(w))
      .groupBy(col("user_id"), col("h"))
      .agg(first(col("open_fp")).as("open_fp"),
        max(col("v_fp")).as("high_fp"), min(col("v_fp")).as("low_fp"),
        first(col("close_fp")).as("close_fp"),
        count(lit(1)).as("n_events"))
    assert(ohlc.exceptAll(viaWindow).isEmpty &&
      viaWindow.exceptAll(ohlc).isEmpty,
      "min_by/max_by aggregate diverges from the window-based first/last")
    val plan = ohlc.queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate") && !plan.contains("Window"),
      s"OHLC should plan as a windowless hash aggregate:\n$plan")
  }

  test("observed grid points reproduce the per-hour latest event value") {
    val perHour = graft.sources.Tables.events(spark, sf001)
      .select(col("user_id"),
        unix_timestamp(date_trunc("hour", col("ts"))).as("h"),
        unix_micros(col("ts")).as("us"), col("event_id"),
        round(col("value") * 100).cast("long").as("v_fp"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id"), col("h"))
          .orderBy(col("us").desc, col("event_id").desc)))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("h"), col("v_fp"))
    val mismatches = out.filter(col("is_observed"))
      .join(perHour, Seq("user_id", "h"))
      .filter(col("v_ff") =!= col("v_fp")).count()
    assert(mismatches == 0, "observed point diverges from its source event")
    assert(out.filter(col("is_observed")).count() == perHour.count())
  }
}
