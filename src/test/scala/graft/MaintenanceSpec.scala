package graft

import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Semantic pins for the table-maintenance gates (MaintenanceQueries) —
  * properties the DuckDB oracle implies but doesn't state directly. */
class MaintenanceSpec extends SparkSpec {

  private def run(name: String) = Queries.all(name)(spark, sf001)

  test("cdc_apply: delete tombstones drop keys; inserts surface") {
    val out = run("cdc_apply").cache()
    val ev = Tables.events(spark, sf001).select(
      col("user_id"), col("event_type"), col("event_id"),
      unix_micros(col("ts")).as("us"))
    val t1 = ev.agg(expr("min(us) + (max(us) - min(us)) div 2"))
      .head().getLong(0)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"))
      .orderBy(col("us").desc, col("event_id").desc)
    val lastChange = ev.filter(col("us") > t1)
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
    val deleted = lastChange.filter(col("event_type") === "error")
      .select("user_id").collect().map(_.getLong(0)).toSet
    assert(deleted.nonEmpty, "fixture has no delete tombstones — vacuous")
    val outKeys = out.select("user_id").collect().map(_.getLong(0)).toSet
    assert(deleted.intersect(outKeys).isEmpty,
      s"deleted keys survived apply: ${deleted.intersect(outKeys).take(5)}")
    // inserts: keys first seen after the midpoint, latest op not a delete
    val baseKeys = ev.filter(col("us") <= t1)
      .select("user_id").distinct().collect().map(_.getLong(0)).toSet
    val inserts = lastChange.filter(col("event_type") =!= "error")
      .select("user_id").collect().map(_.getLong(0)).toSet -- baseKeys
    assert(inserts.subsetOf(outKeys),
      s"inserted keys missing from apply: ${(inserts -- outKeys).take(5)}")
    out.unpersist()
  }

  test("incremental_mv_refresh ≡ full recompute (Spark-side, not just oracle)") {
    val refreshed = run("incremental_mv_refresh")
    val full = Tables.orders(spark, sf001).select(
        col("o_orderpriority").as("prio"),
        round(col("o_totalprice") * 100).cast("long").as("p_fp"))
      .groupBy("prio").agg(
        sum("p_fp").as("revenue_fp"), count(lit(1)).as("n_orders"),
        max("p_fp").as("max_fp"))
      .select(col("prio"), col("revenue_fp"), col("n_orders"),
        expr("revenue_fp div n_orders").as("avg_fp"), col("max_fp"))
    assert(refreshed.exceptAll(full).isEmpty && full.exceptAll(refreshed).isEmpty,
      "merged partials diverge from the full recompute")
    // the persisted MV is group-cardinality: the refresh must merge a
    // handful of partial rows, never anything event-scale
    val stored = spark.read.parquet(
      graft.queries.scratchPath("mv_prio", sf001))
    assert(stored.count() <= 5, "stored MV is not group-cardinality")
  }

  test("cdc_state_compaction: drops exactly the pre-horizon tombstones, view-invariant") {
    val st = graft.queries.MaintenanceQueries.changelogState(spark, sf001)
      .cache()
    val t2 = st.agg(expr("min(us) + 3 * ((max(us) - min(us)) div 4)"))
      .head().getLong(0)
    val compacted = graft.streaming.UpsertSink.compactTombstones(st, t2, "us")
    val droppable = st.filter(col("op") === "D" && col("us") <= t2).count()
    val survivors = st.filter(col("op") === "D" && col("us") > t2).count()
    assert(droppable > 0, "fixture has no pre-horizon tombstones — vacuous")
    assert(compacted.filter(col("op") === "D").count() == survivors,
      "compaction must drop ALL pre-horizon tombstones and ONLY those")
    assert(compacted.count() == st.count() - droppable,
      "compaction touched a live row")
    val viewBefore = graft.streaming.UpsertSink.readView(st)
    val viewAfter = graft.streaming.UpsertSink.readView(compacted)
    assert(viewBefore.exceptAll(viewAfter).isEmpty &&
      viewAfter.exceptAll(viewBefore).isEmpty,
      "compaction changed the read view")
    st.unpersist()
  }

  test("table_checksum: invariant under physical reordering, sensitive to one row") {
    import graft.queries.MaintenanceQueries.lineitemDigest
    def digest(df: org.apache.spark.sql.DataFrame) =
      lineitemDigest(df).collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val li = Tables.lineitem(spark, sf001)
    val base = digest(li)
    // same logical rows through a different physical layout (repartition
    // + per-partition resort + parquet write/read roundtrip) → identical
    // digest: the canonical serialization survives layout and storage
    val shuffledDir = graft.queries.scratchPath("cksum_shuffled", sf001)
    li.repartition(7, col("l_suppkey"))
      .sortWithinPartitions(col("l_extendedprice"))
      .write.mode("overwrite").parquet(shuffledDir)
    assert(digest(spark.read.parquet(shuffledDir)) == base,
      "digest changed under physical reordering")
    // one tampered row must flip its group's digest AND the ALL rollup
    val victim = li.orderBy(col("l_orderkey"), col("l_linenumber"))
      .select(col("l_orderkey"), col("l_linenumber")).head()
    val tampered = li.withColumn("l_quantity",
      when(col("l_orderkey") === victim.getLong(0)
          && col("l_linenumber") === victim.getInt(1),
        col("l_quantity") + 0.01).otherwise(col("l_quantity")))
    val diff = base -- digest(tampered)
    assert(diff.size == 2 && diff.exists(_._1 == "ALL"),
      s"one-row tamper should flip exactly its group + ALL, flipped: $diff")
  }

  test("table_checksum: digest exact past the int64 overflow boundary") {
    // The mod-2⁶¹−1 fold exists precisely for n·2⁴⁰ ≥ 2⁶³ (≈ 8.4 M rows
    // of 40-bit terms — where a plain BIGINT sum wraps). Cross it with a
    // 18 M-row synthetic lineitem and check the decimal fold against an
    // independent exact reference: 64 per-bucket partial sums (each
    // ≤ 2⁵⁸ — long-safe), folded to BigInt on the driver, reduced mod M.
    import graft.queries.MaintenanceQueries.lineitemDigest
    val n = 18000000L
    val syn = spark.range(n).selectExpr(
      "id AS l_orderkey",
      "cast(id % 7 as int) AS l_linenumber",
      "cast(1 + id % 50 as double) AS l_quantity",
      "cast((id % 90000) as double) / 100 AS l_extendedprice",
      "element_at(array('A','N','R'), cast(id % 3 as int) + 1) AS l_returnflag",
      "element_at(array('O','F'), cast(id % 2 as int) + 1) AS l_linestatus",
      "to_date('1995-01-01') + cast(id % 2000 as int) AS l_shipdate")
    val all = lineitemDigest(syn).filter(col("g") === "ALL").head()
    assert(all.getLong(1) == n)
    val m = BigInt(2305843009213693951L) // 2^61 − 1
    // independent reference: h re-derived row-wise, bucketed partial sums
    val partials = syn.select(
        conv(substring(md5(concat_ws("|",
          col("l_orderkey"), col("l_linenumber"),
          round(col("l_quantity") * 100).cast("long"),
          round(col("l_extendedprice") * 100).cast("long"),
          col("l_returnflag"), col("l_linestatus"),
          unix_timestamp(col("l_shipdate")))), 1, 10), 16, 10)
          .cast("long").as("h"))
      .groupBy(pmod(col("h"), lit(64)).as("b"))
      .agg(sum(col("h")).as("s"))
      .collect().map(_.getLong(1))
    val exact = partials.map(BigInt(_)).sum
    assert(exact > BigInt(2).pow(63),
      "the case must actually cross the int64 boundary, or it proves nothing")
    assert(BigInt(all.getLong(2)) == exact.mod(m),
      s"decimal fold diverged from the exact BigInt reference past 2^63")
  }

  test("profile_columns: one scan, Expand-based multi-distinct, sane metrics") {
    val df = run("profile_columns")
    val plan = df.queryExecution.executedPlan.toString
    val scans = "Scan parquet".r.findAllIn(plan).length
    assert(scans == 1, s"profile must read the table once, saw $scans scans")
    assert(plan.contains("Expand"),
      "multi-column exact NDV should plan as Expand over one scan")
    val rows = df.collect().map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2))).toMap
    assert(rows.keySet == Set("l_orderkey", "l_partkey", "l_quantity",
      "l_extendedprice", "l_returnflag", "l_shipdate"))
    assert(rows.values.forall(_._1 == 0L), "fixture columns have no nulls")
    assert(rows("l_returnflag")._2 == 3L, "l_returnflag NDV should be 3 (A/N/R)")
  }

  test("merkle_bucket_diff: localizes exactly the tampered keys") {
    val out = run("merkle_bucket_diff").cache()
    val li = Tables.lineitem(spark, sf001)
    // the gate's deterministic tamper rule, recomputed independently:
    // per-KEY verdicts (the fixture key is non-unique)
    val want = li.filter(col("l_orderkey") % 997 === 0 &&
        col("l_linenumber") === 1)
      .select(col("l_orderkey"), col("l_linenumber")).distinct()
      .collect().map(r => (r.getLong(0), r.getInt(1).toLong)).toSet
    val got = out.select(col("l_orderkey"), col("l_linenumber"))
      .collect().map(r => (r.getLong(0),
        r.get(1).asInstanceOf[Number].longValue)).toSet
    assert(got == want, s"diff keys $got != tampered keys $want")
    assert(want.nonEmpty, "tamper rule must hit the fixture")
    // every reported key shows the +1-cent-per-tampered-row delta
    out.collect().foreach { r =>
      assert(r.getAs[Long]("price_b_fp") > r.getAs[Long]("price_a_fp"))
    }
  }
}
