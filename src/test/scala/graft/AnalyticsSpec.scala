package graft

import org.apache.spark.sql.functions._

/** Hand-predictable semantic pins for the round-8 analytics family —
  * the cases the fixture-scale oracle could pass by luck: funnel ORDER
  * sensitivity, CUSUM fold arithmetic, discrete winsorize bounds, and
  * point-in-time interval selection. */
class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  test("funnel counts only ordered completions, not mere presence") {
    // u1: view(10) -> click(20) -> purchase(30): full funnel
    // u2: click(10) -> view(20): click BEFORE view must not count as step 2
    // u3: view(10) -> purchase(20): purchase without click stops at step 1
    val ev = Seq(
      (1L, 10L, "view"), (1L, 20L, "click"), (1L, 30L, "purchase"),
      (2L, 10L, "click"), (2L, 20L, "view"),
      (3L, 10L, "view"), (3L, 20L, "purchase"))
      .toDF("user_id", "us", "event_type")
    val t1 = ev.filter($"event_type" === "view")
      .groupBy($"user_id").agg(min($"us").as("t1"))
    val t2 = ev.filter($"event_type" === "click")
      .join(t1, "user_id").filter($"us" > $"t1")
      .groupBy($"user_id").agg(min($"us").as("t2"), min($"t1").as("t1"))
    val t3 = ev.filter($"event_type" === "purchase")
      .join(t2, "user_id").filter($"us" > $"t2")
      .groupBy($"user_id").agg(min($"us").as("t3"), min($"t2").as("t2"))
    assert(t1.count() == 3) // u1, u2, u3 all viewed
    assert(t2.as[(Long, Long, Long)].collect().toSet == Set((1L, 20L, 10L)))
    assert(t3.as[(Long, Long, Long)].collect().toSet == Set((1L, 30L, 20L)))
  }

  test("CUSUM fold: hand-computed drift statistic and crossing count") {
    // one user, values (fp): 10, 10, 40, 40 -> mu = 100 div 4 = 25
    // S: max(0,0+10-25)=0; max(0,0+10-25)=0; max(0,0+40-25)=15;
    //    max(0,15+40-25)=30 -> max S = 30, crossings(>100000) = 0
    val out = graft.queries.AnalyticsQueries.all("cusum_changepoint")
    // build a scratch dir shaped like the events table
    val dir = java.nio.file.Files.createTempDirectory("cusum").toString
    Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:01"), 7L, "a", 0.10, "{}"),
      (2L, java.sql.Timestamp.valueOf("2024-01-01 00:00:02"), 7L, "a", 0.10, "{}"),
      (3L, java.sql.Timestamp.valueOf("2024-01-01 00:00:03"), 7L, "a", 0.40, "{}"),
      (4L, java.sql.Timestamp.valueOf("2024-01-01 00:00:04"), 7L, "a", 0.40, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val row = out(spark, dir).collect().head
    assert(row.getAs[Long]("n_events") == 4)
    assert(row.getAs[Long]("mu_fp") == 25)
    assert(row.getAs[Long]("max_cusum_fp") == 30)
    assert(row.getAs[Long]("n_over") == 0)
  }

  test("winsorize uses discrete rank-pick bounds and clips exactly") {
    // 20 values 1..20 (fp): lo = rank ceil(0.05*20)=1 -> 1,
    // hi = rank ceil(0.95*20)=19 -> 19; clipped: v=20 -> 19 (one high clip)
    val dir = java.nio.file.Files.createTempDirectory("wins").toString
    (1 to 20).map(i =>
        (i.toLong, java.sql.Timestamp.valueOf(f"2024-01-01 00:00:${i}%02d"),
          1L, "a", i / 100.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val row = graft.queries.AnalyticsQueries.all("winsorize_values")(
      spark, dir).collect().head
    assert(row.getAs[Long]("lo_fp") == 1 && row.getAs[Long]("hi_fp") == 19)
    assert(row.getAs[Long]("n_low") == 0 && row.getAs[Long]("n_high") == 1)
    // sum 1..19 + clipped 19 = 190 + 19
    assert(row.getAs[Long]("sum_wins_fp") == 209)
  }

  test("point-in-time probe returns the state BEFORE the purchase") {
    // u: a(10) -> purchase(20) -> purchase(21): probe(19) -> 'a',
    // probe(20) -> 'purchase' (its own run started at 20)
    // first-event purchase user: NULL prior state survives the left join
    val dir = java.nio.file.Files.createTempDirectory("pit").toString
    Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:10"), 1L, "a", 0.0, "{}"),
      (2L, java.sql.Timestamp.valueOf("2024-01-01 00:00:20"), 1L, "purchase", 0.0, "{}"),
      (3L, java.sql.Timestamp.valueOf("2024-01-01 00:00:21"), 1L, "purchase", 0.0, "{}"),
      (4L, java.sql.Timestamp.valueOf("2024-01-01 00:00:05"), 2L, "purchase", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = graft.queries.AnalyticsQueries.all("scd2_point_in_time")(
        spark, dir)
      .select($"event_id", $"prior_state").as[(Long, Option[String])]
      .collect().toMap
    assert(got(2L).contains("a"), "probe at us-1 must see the pre-purchase run")
    assert(got(3L).contains("purchase"),
      "second purchase probes inside the purchase run")
    assert(got(4L).isEmpty, "first-ever event has no prior state")
    // exactly one interval matched per probe (intervals tile)
    assert(got.size == 3)
  }

  test("scd2_point_in_time plans as an equi join, never a product") {
    val p = Queries.all("scd2_point_in_time")(spark, sf001)
      .queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"),
      s"interval containment must ride the user_id equi-join:\n$p")
  }

  test("exact_stratified_split: per-stratum counts are exact floors") {
    val got = Queries.all("exact_stratified_split")(spark, sf001)
      .select($"source", $"split", $"n_docs")
      .as[(String, String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(t => t._2 -> t._3).toMap).toMap
    got.foreach { case (src, m) =>
      val n = m.values.sum
      assert(m("train") == n * 8 / 10, s"$src train ${m("train")} != ${n * 8 / 10}")
      assert(m("train") + m.getOrElse("val", 0L) == n * 9 / 10,
        s"$src train+val must be floor(0.9n)")
      assert(m.values.forall(_ > 0), s"$src: every split populated")
    }
  }

  test("mad_outliers: hand-computed median, MAD and flags") {
    // values (fp): 10,20,30,40,1000 -> med = rank 3 -> 30;
    // |v-30|: 20,10,0,10,970 -> sorted 0,10,10,20,970 -> mad = 10;
    // outliers: d > 30 -> only 970 (the spike) -> 1
    val dir = java.nio.file.Files.createTempDirectory("mad").toString
    Seq(0.10, 0.20, 0.30, 0.40, 10.00).zipWithIndex.map { case (v, i) =>
      ((i + 1).toLong, java.sql.Timestamp.valueOf(f"2024-01-01 00:00:${i}%02d"),
        1L, "a", v, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = graft.queries.AnalyticsQueries.all("mad_outliers")(spark, dir)
      .collect().head
    assert(r.getAs[Long]("med_fp") == 30)
    assert(r.getAs[Long]("mad_fp") == 10)
    assert(r.getAs[Long]("n_outliers") == 1)
  }

  test("twap weights by holding time, not sample count") {
    // one user-day: v=1.00 at 00:00, v=3.00 at 12:00 -> each holds 12h
    // -> twap 2.00 exactly (an event-mean of a bursty day would not be)
    val dir = java.nio.file.Files.createTempDirectory("twap").toString
    Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 1L, "a", 1.00, "{}"),
      (2L, java.sql.Timestamp.valueOf("2024-01-01 12:00:00"), 1L, "a", 3.00, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = graft.queries.AnalyticsQueries.all("twap_user_day")(spark, dir)
      .collect().head
    assert(r.getAs[Double]("twap") == 2.0)
    assert(r.getAs[Long]("span_us") == 86400000000L)
  }

  test("gap sessionization breaks exactly at >30min and indexes runs") {
    val dir = java.nio.file.Files.createTempDirectory("sess").toString
    // gaps: 60s (no break), 3940s (break), 100s (no break)
    Seq(0L, 60L, 4000L, 4100L).zipWithIndex.map { case (sec, i) =>
      ((i + 1).toLong, new java.sql.Timestamp(1704067200000L + sec * 1000),
        1L, "a", 0.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = graft.queries.AnalyticsQueries.all("session_ids_gap")(spark, dir)
      .select($"session_idx", $"n_events", $"duration_us")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((0L, 2L, 60000000L), (1L, 2L, 100000000L)))
  }

  test("association rules: hand-computed support, confidence and lift") {
    val dir = java.nio.file.Files.createTempDirectory("assoc").toString
    // baskets (same hour): u1{view,click}, u2{view} -> 2 baskets;
    // view->click: conf = 1/2, lift = 2*1/(2*1) = 1
    Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:01"), 1L, "view", 0.0, "{}"),
      (2L, java.sql.Timestamp.valueOf("2024-01-01 10:00:02"), 1L, "click", 0.0, "{}"),
      (3L, java.sql.Timestamp.valueOf("2024-01-01 10:00:03"), 2L, "view", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = graft.queries.AnalyticsQueries.all("assoc_rules")(spark, dir)
      .select($"a", $"b", $"n_ab", $"conf_fp", $"lift_fp")
      .as[(String, String, Long, Long, Long)].collect().toSet
    assert(got == Set(
      ("view", "click", 1L, 500000L, 1000000L),
      ("click", "view", 1L, 1000000L, 1000000L)))
  }

  test("event_transitions probabilities are integer-exact shares") {
    val rows = Queries.all("event_transitions")(spark, sf001)
      .groupBy($"from_type").agg(sum($"p_fp").as("sum_p"))
      .select($"sum_p").as[Long].collect()
    // floor-division shares sum to at most 1e6 and within 25 ulps of it
    assert(rows.forall(s => s <= 1000000L && s > 999900L))
  }
}
