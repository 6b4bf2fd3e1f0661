package graft.queries

import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Table-maintenance / warehouse-operations gates: the operations a
  * long-lived 100 TB table needs between queries — applying a CDC
  * changelog (with delete tombstones) to a snapshot, refreshing a
  * materialized aggregate from its stored partials instead of a full
  * rescan, and one-pass column profiling for data-quality audits.
  *
  * These complete the mutation-shaped family started by `scd2_user_state`
  * (history tracking), `snapshot_diff` (derive the changelog) and
  * `streaming_upsert_sink` (idempotent MERGE, inserts/updates only):
  * `cdc_apply` closes the loop by CONSUMING a changelog that includes
  * deletes, and `incremental_mv_refresh` is the aggregate-side analogue —
  * the reason partial aggregates (sum/count/max) matter at scale is
  * exactly that they merge without rereading history.
  *
  * Shared arithmetic conventions (see Queries.scala header): money and
  * event values as 1e-2 fixed-point BIGINT (`round(x*100)`), timestamps
  * as epoch-µs BIGINT, midpoints via integer `div` — every comparison the
  * oracle replays is integer-exact, no FP near any decision boundary.
  */
object MaintenanceQueries {

  /** Apply an ordered CDC changelog with DELETE tombstones to a keyed
    * base snapshot — the consume side of change-data-capture (Debezium /
    * Delta CDF `MERGE ... WHEN MATCHED AND op='D' THEN DELETE` shape).
    *
    * Derivation from the fixture (deterministic, both engines replay it):
    * the per-user event stream splits at the integer-µs timeline midpoint
    * into base (≤ mid: latest row per user = the snapshot) and changelog
    * (> mid: `error` events are delete tombstones, everything else an
    * upsert carrying the new state). Apply = latest change per key wins:
    * `D` drops the key, `U` replaces state, absent keeps base — inserts
    * arise naturally from keys with no base row.
    *
    * Scale shape: the latest-change window runs on the DELTA only (change
    * cardinality, not history); base joins once on the key — a full-outer
    * hash join between two KEY-cardinality relations. Nothing rescans
    * base history, which is the property that makes CDC apply viable when
    * the base is 100 TB and the delta is a million rows: cost ∝ delta +
    * touched keys. (At warehouse scale the base side would be a bucketed
    * table so the join inherits its layout — `bucketed_join_colocated`
    * gates that layout property separately.) */
  private val cdcApply: Q = (s, dir) => {
    val ev = Tables.events(s, dir).select(
      col("user_id"), col("event_type"), col("event_id"),
      unix_micros(col("ts")).as("us"),
      round(col("value") * 100).cast("long").as("v_fp"))
    val mid = ev.agg(
      expr("min(us) + (max(us) - min(us)) div 2").cast("long").as("t1"))
    val evM = ev.crossJoin(broadcast(mid))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"))
      .orderBy(col("us").desc, col("event_id").desc)
    val base = evM.filter(col("us") <= col("t1"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("user_id"), col("event_type").as("b_state"),
        col("v_fp").as("b_v"))
    val chg = evM.filter(col("us") > col("t1"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("user_id"),
        when(col("event_type") === "error", "D").otherwise("U").as("op"),
        col("event_type").as("c_state"), col("v_fp").as("c_v"))
    base.join(chg, Seq("user_id"), "full_outer")
      .filter(col("op").isNull || col("op") =!= "D")
      .select(col("user_id"),
        coalesce(col("c_state"), col("b_state")).as("state"),
        coalesce(col("c_v"), col("b_v")).as("value_fp"))
  }

  // shared with streaming_cdc_upsert (StreamingQueries): the streaming
  // changelog apply must equal the batch apply — same oracle, verbatim
  private[queries] val cdcApplySql =
    """WITH ev AS (
      |  SELECT user_id, event_type, event_id,
      |         epoch_us(date_trunc('microseconds', ts)) AS us,
      |         CAST(round(value * 100) AS BIGINT) AS v_fp
      |  FROM events),
      |mid AS (SELECT min(us) + (max(us) - min(us)) // 2 AS t1 FROM ev),
      |base AS (SELECT user_id, event_type AS b_state, v_fp AS b_v FROM (
      |           SELECT user_id, event_type, v_fp, row_number() OVER (
      |             PARTITION BY user_id ORDER BY us DESC, event_id DESC) AS rn
      |           FROM ev CROSS JOIN mid WHERE us <= t1) WHERE rn = 1),
      |chg AS (SELECT user_id,
      |               CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
      |               event_type AS c_state, v_fp AS c_v FROM (
      |           SELECT user_id, event_type, v_fp, row_number() OVER (
      |             PARTITION BY user_id ORDER BY us DESC, event_id DESC) AS rn
      |           FROM ev CROSS JOIN mid WHERE us > t1) WHERE rn = 1)
      |SELECT COALESCE(c.user_id, b.user_id) AS user_id,
      |       COALESCE(c.c_state, b.b_state) AS state,
      |       COALESCE(c.c_v, b.b_v) AS value_fp
      |FROM base b FULL OUTER JOIN chg c ON b.user_id = c.user_id
      |WHERE c.op IS NULL OR c.op <> 'D'""".stripMargin

  /** Tombstone retention compaction — the vacuum closing the CDC loop
    * (`cdc_apply` consumes, `streaming_cdc_upsert` persists tombstones,
    * this reclaims them): the WHOLE event changelog merges latest-wins
    * per key with `error` tombstones RETAINED as state rows, then
    * `UpsertSink.compactTombstones` physically drops the tombstones at or
    * below the 3/4-point replay horizon (sources provably past it — no
    * stale upsert can arrive). The gated result is the READ VIEW of the
    * compacted state, and its oracle is simply "latest event per user,
    * deleted keys absent" — compaction changing NOTHING visible is the
    * invariant under test; MaintenanceSpec pins the physical half (the
    * pre-horizon tombstones are gone, the post-horizon ones survive).
    * Scale shape: one latest-row window per key plus a row-local filter —
    * at warehouse scale the filter folds into the next state rewrite. */
  private val cdcStateCompaction: Q = (s, dir) => {
    val st = changelogState(s, dir)
    val t2 = st.agg(
        expr("min(us) + 3 * ((max(us) - min(us)) div 4)").cast("long"))
      .head().getLong(0)
    graft.streaming.UpsertSink.readView(
        graft.streaming.UpsertSink.compactTombstones(st, t2, "us"))
      .select(col("user_id"), col("c_state").as("state"), col("value_fp"))
  }

  /** Full-changelog latest-wins state with retained tombstones: every
    * event is a change (`error` = `'D'`), merged per user. Shared by the
    * compaction gate and MaintenanceSpec. */
  private[graft] def changelogState(
      s: org.apache.spark.sql.SparkSession, dir: String) = {
    val ev = Tables.events(s, dir).select(
      col("user_id"), col("event_id"),
      unix_micros(col("ts")).as("us"),
      when(col("event_type") === "error", "D").otherwise("U").as("op"),
      col("event_type").as("c_state"),
      round(col("value") * 100).cast("long").as("value_fp"))
    graft.streaming.UpsertSink.mergeLatest(None, ev, "user_id", "us", "event_id")
  }

  private val cdcStateCompactionSql =
    """WITH ev AS (
      |  SELECT user_id, event_type, event_id,
      |         epoch_us(date_trunc('microseconds', ts)) AS us,
      |         CAST(round(value * 100) AS BIGINT) AS v_fp
      |  FROM events),
      |last AS (SELECT user_id, event_type, v_fp FROM (
      |           SELECT user_id, event_type, v_fp, row_number() OVER (
      |             PARTITION BY user_id ORDER BY us DESC, event_id DESC) AS rn
      |           FROM ev) WHERE rn = 1)
      |SELECT user_id, event_type AS state, v_fp AS value_fp
      |FROM last WHERE event_type <> 'error'""".stripMargin

  /** Incremental materialized-view refresh: merge an append-only delta's
    * PARTIAL aggregates into the stored MV partials — never rescan the
    * base. The MV here is revenue per order priority with sum / count /
    * max / avg; the stored form keeps the MERGEABLE partials (sum_fp, n,
    * max_fp) and derives avg at read time (avg itself is not mergeable —
    * (sum, count) is, which is exactly why the stored form is partials,
    * not finals).
    *
    * The gate performs the real maintenance cycle: base partials (orders
    * ≤ the integer epoch-second date midpoint) are WRITTEN to a scratch parquet
    * table (the persisted MV — group cardinality, driver-scale at any
    * corpus size), then a refresh reads the MV back, aggregates ONLY the
    * delta (> midpoint), unions the two partial relations and re-merges
    * with the same algebra Spark's own partial aggregation uses
    * (sum-of-sums, sum-of-counts, max-of-maxes). The oracle is the FULL
    * recompute over all of orders — the equivalence it certifies is the
    * MV-maintenance contract itself: refresh(MV, Δ) ≡ recompute(base ∪ Δ).
    *
    * Scale shape: refresh cost ∝ |Δ| + |groups|. The 100 TB base is
    * touched zero times; the shuffled relations are the delta's map-side-
    * combined partials (≤ tasks × groups rows) and the group-cardinality
    * MV itself. */
  private val incrementalMvRefresh: Q = (s, dir) => {
    // Three consumers (the split-instant agg, the base write, the delta
    // refresh) each RE-SCAN the pruned parquet projection instead of
    // sharing a checkpoint: the projection is fact-sized, and cached
    // fact-sized blocks hold the storageFraction floor at 100×+ under
    // bench repetition (the no-fact-caching rule — same fix as
    // quantile_sketch / equi_depth_histogram). Three column-pruned scans
    // are the cheap side of that trade at every scale.
    val o = Tables.orders(s, dir).select(
      col("o_orderpriority").as("prio"),
      unix_timestamp(col("o_orderdate")).as("us"),
      round(col("o_totalprice") * 100).cast("long").as("p_fp"))
    val t1 = o.agg(
        expr("min(us) + (max(us) - min(us)) div 2").cast("long").as("t1"))
      .head().getLong(0) // one scalar to the driver: the split instant
    def partials(df: org.apache.spark.sql.DataFrame) =
      df.groupBy(col("prio")).agg(
        sum(col("p_fp")).as("sum_fp"),
        count(lit(1)).as("n"),
        max(col("p_fp")).as("max_fp"))
    val mvPath = scratchPath("mv_prio", dir)
    partials(o.filter(col("us") <= t1))
      .write.mode("overwrite").parquet(mvPath) // the persisted MV
    val stored = s.read.parquet(mvPath)
    val merged = stored.unionByName(partials(o.filter(col("us") > t1)))
      .groupBy(col("prio")).agg(
        sum(col("sum_fp")).as("revenue_fp"),
        sum(col("n")).as("n_orders"),
        max(col("max_fp")).as("max_fp"))
    merged.select(col("prio"), col("revenue_fp"), col("n_orders"),
      expr("revenue_fp div n_orders").as("avg_fp"), col("max_fp"))
  }

  private val incrementalMvRefreshSql =
    """WITH o AS (
      |  SELECT o_orderpriority AS prio,
      |         CAST(round(o_totalprice * 100) AS BIGINT) AS p_fp
      |  FROM orders)
      |SELECT prio,
      |       CAST(sum(p_fp) AS BIGINT) AS revenue_fp,
      |       CAST(count(*) AS BIGINT) AS n_orders,
      |       CAST(sum(p_fp) // count(*) AS BIGINT) AS avg_fp,
      |       CAST(max(p_fp) AS BIGINT) AS max_fp
      |FROM o GROUP BY 1""".stripMargin

  /** One-pass column profiling (the Deequ/dbt-expectations audit shape):
    * per-column null count, exact distinct count, and min/max over six
    * lineitem columns of mixed type — ONE aggregate over ONE scan, then a
    * `stack` to the tall (column, metrics) audit form. At 100 TB you get
    * exactly one pass over the table per audit, not one per column ×
    * metric; the multi-distinct is Spark's Expand strategy (the scan is
    * read once, rows fan out ×6 in-memory before partial aggregation —
    * the standard cost of exact multi-column NDV; swap `count_distinct`
    * for `approx_count_distinct` when estimates suffice and the fan-out
    * disappears, the sketch path `approx_unique_users` gates separately).
    *
    * Values normalize to BIGINT so the audit row is one fixed schema:
    * money/quantity as 1e-2 fixed point, dates as epoch seconds, strings keep
    * NULL min/max (ordering semantics are collation-dependent — a
    * profile that reports them would embed engine collation in the
    * audit; null-rate and NDV are the collation-free string metrics). */
  private val profileColumns: Q = (s, dir) => {
    // FanOut: the Expand ×6 fan-out + partial aggregate of the exact
    // multi-NDV otherwise run inside the single-task scan stage of a
    // single-row-group input (r15 profile: 2.3 s serial of the 3.3 s
    // query at sf0.1); no-op at parallel-scan scale.
    val li = graft.operators.FanOut.bySize(
      Tables.lineitem(s, dir).select(
        col("l_orderkey").as("c_ok"),
        col("l_partkey").as("c_pk"),
        round(col("l_quantity") * 100).cast("long").as("c_q"),
        round(col("l_extendedprice") * 100).cast("long").as("c_p"),
        col("l_returnflag").as("c_rf"),
        unix_timestamp(col("l_shipdate")).as("c_sd")),
      col("c_ok"))
    val wide = li.agg(
      count(lit(1)).as("n_rows"),
      count(col("c_ok")).as("nn_ok"), countDistinct(col("c_ok")).as("d_ok"),
      min(col("c_ok")).as("mn_ok"), max(col("c_ok")).as("mx_ok"),
      count(col("c_pk")).as("nn_pk"), countDistinct(col("c_pk")).as("d_pk"),
      min(col("c_pk")).as("mn_pk"), max(col("c_pk")).as("mx_pk"),
      count(col("c_q")).as("nn_q"), countDistinct(col("c_q")).as("d_q"),
      min(col("c_q")).as("mn_q"), max(col("c_q")).as("mx_q"),
      count(col("c_p")).as("nn_p"), countDistinct(col("c_p")).as("d_p"),
      min(col("c_p")).as("mn_p"), max(col("c_p")).as("mx_p"),
      count(col("c_rf")).as("nn_rf"), countDistinct(col("c_rf")).as("d_rf"),
      count(col("c_sd")).as("nn_sd"), countDistinct(col("c_sd")).as("d_sd"),
      min(col("c_sd")).as("mn_sd"), max(col("c_sd")).as("mx_sd"))
    wide.select(expr(
      """stack(6,
        |  'l_orderkey',      n_rows - nn_ok, d_ok, mn_ok, mx_ok,
        |  'l_partkey',       n_rows - nn_pk, d_pk, mn_pk, mx_pk,
        |  'l_quantity',      n_rows - nn_q,  d_q,  mn_q,  mx_q,
        |  'l_extendedprice', n_rows - nn_p,  d_p,  mn_p,  mx_p,
        |  'l_returnflag',    n_rows - nn_rf, d_rf,
        |                     CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
        |  'l_shipdate',      n_rows - nn_sd, d_sd, mn_sd, mx_sd)
        |""".stripMargin).as(
        Seq("col_name", "n_null", "n_distinct", "min_v", "max_v")))
  }

  private val profileColumnsSql = {
    // the oracle spells each column's profile as its own SELECT — DuckDB
    // pays six scans; the gated plan is the one-scan Expand form
    def num(name: String, v: String) =
      s"""SELECT '$name' AS col_name,
         |  CAST(count(*) - count($v) AS BIGINT) AS n_null,
         |  CAST(count(DISTINCT $v) AS BIGINT) AS n_distinct,
         |  CAST(min($v) AS BIGINT) AS min_v,
         |  CAST(max($v) AS BIGINT) AS max_v FROM li""".stripMargin
    """WITH li AS (
      |  SELECT l_orderkey AS ok, l_partkey AS pk,
      |         CAST(round(l_quantity * 100) AS BIGINT) AS q,
      |         CAST(round(l_extendedprice * 100) AS BIGINT) AS p,
      |         l_returnflag AS rf,
      |         CAST(epoch(l_shipdate) AS BIGINT) AS sd
      |  FROM lineitem)
      |""".stripMargin +
      Seq(num("l_orderkey", "ok"), num("l_partkey", "pk"),
        num("l_quantity", "q"), num("l_extendedprice", "p"),
        s"""SELECT 'l_returnflag' AS col_name,
           |  CAST(count(*) - count(rf) AS BIGINT) AS n_null,
           |  CAST(count(DISTINCT rf) AS BIGINT) AS n_distinct,
           |  CAST(NULL AS BIGINT) AS min_v,
           |  CAST(NULL AS BIGINT) AS max_v FROM li""".stripMargin,
        num("l_shipdate", "sd")).mkString("\nUNION ALL\n")
  }

  /** Order-independent table checksum — the reconciliation primitive for
    * validating a 100 TB replica/migration without moving the data: each
    * row folds to a 40-bit md5-prefix hash of its canonical serialization
    * (explicit `|`-joined column order with fixed-point/epoch
    * normalization — the same engine-replayable hashing every dedup gate
    * uses; NOT Spark's `hash()`, which no other engine reproduces), and a
    * COMMUTATIVE fold (sum + xor + count per group) collapses them so
    * partition order, file order, and merge order all cancel out. Two
    * independent engines computing the same digest over the same logical
    * rows agree bit-for-bit — which is literally what this gate's DuckDB
    * compare demonstrates. 40-bit prefix (not the dedup 60-bit
    * convention) keeps each per-row term far below the fold modulus; the
    * SUM digest accumulates in 38-digit decimal (exact to ~10^26 rows of
    * 2^40 terms — beyond any table) and is then reduced mod 2^61−1, so
    * the digest is overflow-free at ANY row count in both engines
    * (DuckDB's sum promotes to HUGEINT before the identical mod;
    * collisions are irrelevant to a digest, overflow is not).
    * Per-group digests (here: per l_returnflag +
    * an ALL rollup) localize a mismatch to a group instead of one
    * table-wide boolean. Scale shape: one scan, map-side-combinable
    * all the way — the digest of a 100 TB table is one aggregate. */
  /** The digest fold over any lineitem-shaped relation — shared by the
    * gate and MaintenanceSpec (which applies it to physically reordered
    * and row-tampered copies). */
  private[graft] def lineitemDigest(
      src: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    // FanOut before the md5 row hash: on a single-row-group input the
    // whole digest kernel + partial aggregate otherwise run on one core
    // (r15 optimization; no-op at parallel-scan scale).
    val li = graft.operators.FanOut.bySize(
        src.select(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity"), col("l_extendedprice"),
          col("l_returnflag"), col("l_linestatus"), col("l_shipdate")),
        col("l_orderkey"))
      .select(
        col("l_returnflag").as("g"),
        conv(substring(md5(concat_ws("|",
          col("l_orderkey"), col("l_linenumber"),
          round(col("l_quantity") * 100).cast("long"),
          round(col("l_extendedprice") * 100).cast("long"),
          col("l_returnflag"), col("l_linestatus"),
          unix_timestamp(col("l_shipdate")))), 1, 10), 16, 10)
        .cast("long").as("h"))
    // Mersenne-prime fold: exact wide sum (decimal 38 ≈ 10^38 headroom over
    // 2^40-bounded terms), reduced mod 2^61-1 so the published digest is a
    // BIGINT at any relation size — no wrap in Spark, no HUGEINT->BIGINT
    // cast failure in the oracle.
    val mersenne61 = lit(new java.math.BigDecimal(2305843009213693951L))
    // ALL rollup rides the SAME scan via a 2-way explode of the group key
    // (the quantile_sketch "doubled" pattern): md5 computed once per row,
    // only the 10-byte (g, h) pair doubles in-flight — the r14 form's
    // unionByName re-ran the full md5 scan for the ALL leg (2 serial
    // scans measured at sf0.1; 2 full passes at any scale).
    li.withColumn("g", explode(array(col("g"), lit("ALL"))))
      .groupBy(col("g")).agg(
        count(lit(1)).as("n_rows"),
        (sum(col("h").cast("decimal(38,0)")) % mersenne61)
          .cast("long").as("sum_h"),
        expr("bit_xor(h)").as("xor_h"))
  }

  private val tableChecksum: Q = (s, dir) =>
    lineitemDigest(Tables.lineitem(s, dir))

  private val tableChecksumSql = {
    val h = """CAST(('0x' || substring(md5(
              |   CAST(l_orderkey AS VARCHAR) || '|' ||
              |   CAST(l_linenumber AS VARCHAR) || '|' ||
              |   CAST(CAST(round(l_quantity * 100) AS BIGINT) AS VARCHAR) || '|' ||
              |   CAST(CAST(round(l_extendedprice * 100) AS BIGINT) AS VARCHAR) || '|' ||
              |   l_returnflag || '|' || l_linestatus || '|' ||
              |   CAST(CAST(epoch(l_shipdate) AS BIGINT) AS VARCHAR)), 1, 10))
              |  AS BIGINT)""".stripMargin
    s"""WITH r AS (SELECT l_returnflag AS g, $h AS h FROM lineitem),
       |both_g AS (SELECT g, h FROM r UNION ALL SELECT 'ALL' AS g, h FROM r)
       |SELECT g, CAST(count(*) AS BIGINT) AS n_rows,
       |       CAST(sum(h) % 2305843009213693951 AS BIGINT) AS sum_h,
       |       CAST(bit_xor(h) AS BIGINT) AS xor_h
       |FROM both_g GROUP BY 1""".stripMargin
  }

  /** Merkle-style bucket diff — `table_checksum` answers "are the two
    * replicas identical?"; this answers the follow-up a real
    * reconciliation needs: WHICH rows differ, without shipping either
    * table. Rows bucket by key-hash mod 256; each side folds each bucket
    * to a (count, mod-2⁶¹−1 sum, xor) digest (one aggregate pass per
    * side, map-side combinable — the leaf level of a Merkle tree);
    * buckets whose digests disagree become the SUSPECT set, and only
    * rows landing in suspect buckets (a semi-join against the tiny
    * bucket list) are key-joined and value-compared. Cost: two digest
    * passes + row-level work ∝ \|suspect buckets\|, not \|table\| — at a
    * 1/256 bucketing and d differing rows, the row join touches ≤
    * d·(n/256)-ish rows. The "replica" here derives deterministically
    * (every 997th order's first line gets a one-cent price bump), and
    * the oracle replays tamper, digests, suspects, and the row diff. */
  private val merkleBucketDiff: Q = (s, dir) => {
    val nBuckets = 256
    // Replica b derives ROW-WISE from a (the deterministic tamper), so
    // both sides' keyed rows come out of ONE scan+projection: the key
    // hash md5(ok|ln) is shared, and b's row hash only re-runs md5 on
    // the ~1/997·1/|lines| tampered rows (r14 form: 4 independent
    // scan+md5 passes — digest(a), digest(b), perKey(a), perKey(b) —
    // each single-task on a single-row-group input; this form: 2 scans,
    // half the md5 work, FanOut-parallelized). Digest/suspect/per-key
    // semantics and output are unchanged — the oracle SQL is untouched.
    def keyed = graft.operators.FanOut.bySize(
        Tables.lineitem(s, dir).select(
          col("l_orderkey").as("ok"), col("l_linenumber").as("ln"),
          round(col("l_extendedprice") * 100).cast("long").as("p")),
        col("ok"))
      .withColumn("p_b",
        when(col("ok") % 997 === 0 && col("ln") === 1, col("p") + 1)
          .otherwise(col("p")))
      .select(col("ok"), col("ln"), col("p"), col("p_b"),
        pmod(conv(substring(md5(concat_ws("|", col("ok"), col("ln"))), 1, 15),
          16, 10).cast("long"), lit(nBuckets.toLong)).as("bucket"),
        conv(substring(md5(concat_ws("|", col("ok"), col("ln"), col("p"))),
          1, 10), 16, 10).cast("long").as("row_h_a"))
      .withColumn("row_h_b",
        when(col("p_b") === col("p"), col("row_h_a")).otherwise(
          conv(substring(md5(concat_ws("|", col("ok"), col("ln"), col("p_b"))),
            1, 10), 16, 10).cast("long")))
    // Leaf digests for BOTH sides in one aggregate pass. Row counts per
    // bucket are equal by construction (b is a projection of a), so the
    // r14 full-outer-join suspect conditions (n mismatch, one-sided
    // bucket) reduce to sum/xor digest mismatch — same suspect set.
    val mersenne61 = lit(new java.math.BigDecimal(2305843009213693951L))
    val suspects = keyed.groupBy(col("bucket")).agg(
        (sum(col("row_h_a").cast("decimal(38,0)")) % mersenne61)
          .cast("long").as("sh_a"),
        (sum(col("row_h_b").cast("decimal(38,0)")) % mersenne61)
          .cast("long").as("sh_b"),
        expr("bit_xor(row_h_a)").as("xh_a"),
        expr("bit_xor(row_h_b)").as("xh_b"))
      .filter(col("sh_a") =!= col("sh_b") || col("xh_a") =!= col("xh_b"))
      .select(col("bucket"))
    // the fixture key (ok, ln) is NOT unique, so a row-by-row key join
    // would fan out m×n per duplicate key and cross-compare unrelated
    // rows; collapse each side to a per-KEY digest (count, price sum,
    // row-hash xor) first — the diff is then well-defined for any key
    // multiplicity, and the verdict localizes to keys, the granularity
    // a repair job actually re-copies. Both sides' per-key digests ride
    // the same suspect-bucket scan.
    keyed.join(broadcast(suspects), "bucket")
      .groupBy(col("bucket"), col("ok"), col("ln"))
      .agg(sum(col("p")).as("sum_p_a"), sum(col("p_b")).as("sum_p_b"),
        expr("bit_xor(row_h_a)").as("xh_a"),
        expr("bit_xor(row_h_b)").as("xh_b"))
      .filter(col("sum_p_a") =!= col("sum_p_b") ||
        col("xh_a") =!= col("xh_b"))
      .select(col("ok").as("l_orderkey"), col("ln").as("l_linenumber"),
        col("bucket"),
        col("sum_p_a").as("price_a_fp"), col("sum_p_b").as("price_b_fp"))
  }

  private val merkleBucketDiffSql =
    """WITH base AS (
      |  SELECT l_orderkey AS ok, l_linenumber AS ln,
      |         CAST(round(l_extendedprice * 100) AS BIGINT) AS p
      |  FROM lineitem),
      |a AS (SELECT ok, ln, p,
      |             CAST(('0x' || substring(md5(CAST(ok AS VARCHAR) || '|' ||
      |                  CAST(ln AS VARCHAR)), 1, 15)) AS BIGINT) % 256
      |               AS bucket,
      |             CAST(('0x' || substring(md5(CAST(ok AS VARCHAR) || '|' ||
      |                  CAST(ln AS VARCHAR) || '|' || CAST(p AS VARCHAR)),
      |                  1, 10)) AS BIGINT) AS row_h
      |      FROM base),
      |b0 AS (SELECT ok, ln,
      |              CASE WHEN ok % 997 = 0 AND ln = 1 THEN p + 1 ELSE p END
      |                AS p
      |       FROM base),
      |b AS (SELECT ok, ln, p,
      |             CAST(('0x' || substring(md5(CAST(ok AS VARCHAR) || '|' ||
      |                  CAST(ln AS VARCHAR)), 1, 15)) AS BIGINT) % 256
      |               AS bucket,
      |             CAST(('0x' || substring(md5(CAST(ok AS VARCHAR) || '|' ||
      |                  CAST(ln AS VARCHAR) || '|' || CAST(p AS VARCHAR)),
      |                  1, 10)) AS BIGINT) AS row_h
      |      FROM b0),
      |da AS (SELECT bucket, count(*) AS n,
      |              CAST(sum(row_h) % 2305843009213693951 AS BIGINT) AS sh,
      |              bit_xor(row_h) AS xh
      |       FROM a GROUP BY 1),
      |db AS (SELECT bucket, count(*) AS n,
      |              CAST(sum(row_h) % 2305843009213693951 AS BIGINT) AS sh,
      |              bit_xor(row_h) AS xh
      |       FROM b GROUP BY 1),
      |suspects AS (
      |  SELECT coalesce(da.bucket, db.bucket) AS bucket
      |  FROM da FULL OUTER JOIN db ON da.bucket = db.bucket
      |  WHERE da.n IS DISTINCT FROM db.n OR da.sh IS DISTINCT FROM db.sh
      |     OR da.xh IS DISTINCT FROM db.xh),
      |ka AS (SELECT a.bucket, a.ok, a.ln, count(*) AS n,
      |              sum(a.p) AS sum_p, bit_xor(a.row_h) AS xh
      |       FROM a JOIN suspects s ON a.bucket = s.bucket
      |       GROUP BY 1, 2, 3),
      |kb AS (SELECT b.bucket, b.ok, b.ln, count(*) AS n,
      |              sum(b.p) AS sum_p, bit_xor(b.row_h) AS xh
      |       FROM b JOIN suspects s ON b.bucket = s.bucket
      |       GROUP BY 1, 2, 3)
      |SELECT ka.ok AS l_orderkey, ka.ln AS l_linenumber, ka.bucket,
      |       CAST(ka.sum_p AS BIGINT) AS price_a_fp,
      |       CAST(kb.sum_p AS BIGINT) AS price_b_fp
      |FROM ka JOIN kb ON ka.bucket = kb.bucket AND ka.ok = kb.ok
      |                AND ka.ln = kb.ln
      |WHERE ka.n <> kb.n OR ka.sum_p <> kb.sum_p OR ka.xh <> kb.xh""".stripMargin

  val all: Map[String, Q] = Map(
    "merkle_bucket_diff"     -> merkleBucketDiff,
    "table_checksum"         -> tableChecksum,
    "cdc_apply"              -> cdcApply,
    "cdc_state_compaction"   -> cdcStateCompaction,
    "incremental_mv_refresh" -> incrementalMvRefresh,
    "profile_columns"        -> profileColumns)

  val oracles: Map[String, String] = Map(
    "merkle_bucket_diff"     -> merkleBucketDiffSql,
    "table_checksum"         -> tableChecksumSql,
    "cdc_apply"              -> cdcApplySql,
    "cdc_state_compaction"   -> cdcStateCompactionSql,
    "incremental_mv_refresh" -> incrementalMvRefreshSql,
    "profile_columns"        -> profileColumnsSql)
}
