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
    // a per-group sort window over the event order (µs, event_id) —
    // lexicographic here, so it independently checks the aggregate's
    // packed decimal ordinal really orders like the pair
    val ev = graft.sources.Tables.events(spark, sf001).select(
      col("user_id"),
      unix_timestamp(date_trunc("hour", col("ts"))).as("h"),
      unix_micros(col("ts")).as("us"), col("event_id"),
      round(col("value") * 100).cast("long").as("v_fp"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"), col("h"))
      .orderBy(col("us"), col("event_id"))
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

  test("pathological grid span fails loudly, never as an executor OOM") {
    import spark.implicits._
    // one user whose observations sit 100 years apart: the grid would be
    // ~876k hourly points in ONE sequence() array — the guard must throw
    // a message naming the user before any array is built
    val century = Seq(("u_runaway", 0L, 1L), ("u_runaway", 3155760000L, 2L))
      .toDF("user_id", "h", "v_fp")
    val ex = intercept[Exception] {
      graft.queries.EventQueries.resampleGrid(century).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => e.getMessage +: msgs(e.getCause))
    assert(msgs(ex).exists(m => m != null &&
      m.contains("grid span exceeds") && m.contains("u_runaway")),
      s"expected the span-guard message, got: $ex")
    // sane spans pass through the same guarded path untouched
    val ok = Seq(("u_ok", 0L, 1L), ("u_ok", 7200L, 2L))
      .toDF("user_id", "h", "v_fp")
    assert(graft.queries.EventQueries.resampleGrid(ok).count() == 3)
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
