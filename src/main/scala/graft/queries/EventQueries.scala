package graft.queries

import org.apache.spark.sql.functions._
import graft.operators.{UniqueUsers, Windowing}
import graft.sources.Tables
import graft.time.TimeOps

/** Reference-core operators over the `events` table (SURVEY §2.1/§2.2) plus
  * the windowing generalizations (§2.3).
  */
object EventQueries {

  /** Typed row for the Dataset[T] path (top-level so the product encoder
    * derives — local case classes have no stable TypeTag). */
  final case class Ev(user_id: Long, event_type: String, value: Double)

  /** SURVEY §2.1 #4–#7,#12–#13: tumbling 1-minute window + exact distinct
    * count — the whole main topology, batch form. */
  private val uniqueUsersPerMinute: Q = (s, dir) =>
    UniqueUsers.perMinute(Tables.events(s, dir), col("ts"), col("user_id"))

  private val uniqueUsersPerMinuteSql =
    """SELECT CAST(epoch(date_trunc('minute', ts)) AS BIGINT) AS minute,
      |       CAST(count(DISTINCT user_id) AS BIGINT) AS unique_users
      |FROM events GROUP BY 1""".stripMargin

  /** SURVEY §2.1 #7+#13 as the reference literally composes it:
    * dedup-then-count (UniqueUsersApp.java:118→129). */
  private val uniqueUsersTwoPhase: Q = (s, dir) =>
    UniqueUsers.perMinuteTwoPhase(Tables.events(s, dir), col("ts"), col("user_id"))

  /** SURVEY §2.1 #2: JSON field extraction from the `props` column
    * (reference processRecord, UniqueUsersApp.java:206–216). */
  private val jsonExtract: Q = (s, dir) =>
    Tables.events(s, dir)
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .filter(col("k").isNotNull)

  private val jsonExtractSql =
    """SELECT event_id, CAST(regexp_extract(props, '"k": *(-?[0-9]+)', 1) AS BIGINT) AS k
      |FROM events WHERE regexp_extract(props, '"k": *(-?[0-9]+)', 1) <> ''""".stripMargin

  /** SURVEY §2.1 #2–#3: projection + predicate filter (mapValues/filterNot,
    * UniqueUsersApp.java:113–114). */
  private val filterProject: Q = (s, dir) =>
    Tables.events(s, dir)
      .filter(col("event_type") === "purchase" && col("value") > 50.0)
      .select(col("event_id"), col("user_id"),
        TimeOps.minuteBucketEpoch(col("ts")).as("minute"),
        round(col("value"), 2).as("value"))

  private val filterProjectSql =
    """SELECT event_id, user_id,
      |       CAST(epoch(date_trunc('minute', ts)) AS BIGINT) AS minute,
      |       round(value, 2) AS value
      |FROM events WHERE event_type = 'purchase' AND value > 50.0""".stripMargin

  /** SURVEY §2.2 variant 1: windowed count by key (not distinct) —
    * `windowedBy(tw).count()` (UniqueUsersApp.java:152–158), keyed by
    * event_type. */
  private val windowedCountByType: Q = (s, dir) =>
    Tables.events(s, dir)
      .groupBy(TimeOps.minuteBucketEpoch(col("ts")).as("minute"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 4).as("sum_value"))

  private val windowedCountByTypeSql =
    """SELECT CAST(epoch(date_trunc('minute', ts)) AS BIGINT) AS minute,
      |       event_type,
      |       CAST(count(*) AS BIGINT) AS n_events,
      |       round(CAST(sum(value) AS DOUBLE), 4) AS sum_value
      |FROM events GROUP BY 1, 2""".stripMargin

  /** SURVEY §2.1 #7: exact in-window dedup as its own operator — the
    * deduped (minute, uid) pairs themselves (DeduplicateValueTransformer
    * semantics, batch form). */
  private val dedupEventsExact: Q = (s, dir) =>
    Tables.events(s, dir)
      .select(TimeOps.minuteBucketEpoch(col("ts")).as("minute"), col("user_id"))
      .distinct()

  private val dedupEventsExactSql =
    """SELECT DISTINCT CAST(epoch(date_trunc('minute', ts)) AS BIGINT) AS minute, user_id
      |FROM events""".stripMargin

  /** SURVEY §2.1 #6 generalized: last-value-per-key
    * (`aggregate((k,v,agg) -> v)`, UniqueUsersApp.java:117) — latest event
    * per user by event time. Expressed as row_number over a per-key ordering
    * (deterministic tiebreak on event_id; the oracle orders by
    * microsecond-truncated ts because Spark's TimestampType is µs while
    * DuckDB's parquet read keeps ns). */
  private val lastEventPerUser: Q = (s, dir) => {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    Tables.events(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_id").as("last_event_id"),
        unix_timestamp(col("ts")).as("last_ts"))
  }

  private val lastEventPerUserSql =
    """SELECT user_id, event_id AS last_event_id,
      |       CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS last_ts
      |FROM (SELECT *, row_number() OVER (
      |        PARTITION BY user_id
      |        ORDER BY date_trunc('microseconds', ts) DESC, event_id DESC) AS rn
      |      FROM events) WHERE rn = 1""".stripMargin

  /** Sliding windows (absent in the reference, SURVEY §2.3): 10-minute
    * windows sliding by 5. The oracle expands each event into its two
    * member windows — exactly what Spark's `Expand` does under `window()`.
    */
  private val slidingWindowCounts: Q = (s, dir) =>
    Windowing.slidingCounts(Tables.events(s, dir), col("ts"), col("user_id"),
      "10 minutes", "5 minutes")

  private val slidingWindowCountsSql =
    """WITH e AS (SELECT CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS es, user_id FROM events),
      |x AS (SELECT (es // 300) * 300 AS window_start, user_id FROM e
      |      UNION ALL
      |      SELECT (es // 300) * 300 - 300 AS window_start, user_id FROM e)
      |SELECT window_start, CAST(count(*) AS BIGINT) AS n_events,
      |       CAST(count(DISTINCT user_id) AS BIGINT) AS unique_ids
      |FROM x GROUP BY 1""".stripMargin

  /** Session windows (absent in the reference, SURVEY §2.3): 30-minute-gap
    * sessions per user. Oracle = classic gaps-and-islands; session end =
    * last event + gap, matching Spark's `session_window` semantics
    * (merge iff gap <= the threshold: an event exactly one gap-width after
    * the previous still extends the session, verified empirically — so the
    * oracle breaks only on strictly-greater gaps). */
  private val sessionWindowStats: Q = (s, dir) =>
    Windowing.sessionStats(Tables.events(s, dir), col("ts"), col("user_id"),
      "30 minutes")
      .withColumnRenamed("key", "user_id")

  private[queries] val sessionWindowStatsSql =
    """WITH o AS (
      |  SELECT user_id, ts,
      |         CASE WHEN lag(ts) OVER w IS NULL
      |                OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
      |              THEN 1 ELSE 0 END AS brk
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
      |s AS (
      |  SELECT user_id, ts,
      |         SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
      |                        ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM o)
      |SELECT user_id,
      |       CAST(epoch(date_trunc('second', min(ts))) AS BIGINT) AS session_start,
      |       CAST(epoch(date_trunc('second', max(ts))) AS BIGINT) + 1800 AS session_end,
      |       CAST(count(*) AS BIGINT) AS n_events
      |FROM s GROUP BY user_id, sid""".stripMargin

  /** The reference's parse-failure path (SURVEY §1.3: processRecord →
    * `""` → filterNot) as an explicit, observable reject policy: corrupt
    * JSON is injected for every 10th event, `from_json` (PERMISSIVE)
    * nulls the struct for exactly those rows, and the query reports
    * accepted/rejected counts per minute instead of silently dropping —
    * the drop+count policy §1.4 mandates over the reference's epoch-0
    * fallback. Oracle gates via DuckDB `json_valid` on the same rows. */
  private val jsonRejectPolicy: Q = (s, dir) => {
    val raw = when(col("event_id") % 10 === 0,
      concat(lit("CORRUPT"), col("props"))).otherwise(col("props"))
    // PERMISSIVE from_json nulls the FIELDS of a malformed row, not the
    // struct — the unambiguous reject marker is the corrupt-record
    // column, which captures the raw input iff parsing failed
    val parsed = from_json(raw, org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("_corrupt",
        org.apache.spark.sql.types.StringType))),
      Map("columnNameOfCorruptRecord" -> "_corrupt"))
    Tables.events(s, dir)
      .select(TimeOps.minuteBucketEpoch(col("ts")).as("minute"),
        parsed.as("p"))
      .groupBy(col("minute"))
      .agg(count(lit(1)).as("n_total"),
        count(when(col("p._corrupt").isNotNull, 1)).as("n_rejected"),
        sum(col("p.k")).as("sum_k"))
  }

  /** Spark 4 VARIANT — the modern semi-structured path the reference's
    * ad-hoc JSON parsing (UniqueUsersApp.java:206–216) maps onto when the
    * schema is open-ended: `try_parse_json` decodes each props payload
    * ONCE into the binary variant encoding (malformed → null, the same
    * total-function reject stance as the rest of the JSON surface), and
    * typed `variant_get` paths extract without re-parsing. Oracle:
    * DuckDB json_extract over the raw strings. */
  private val variantExtract: Q = (s, dir) => {
    val v = try_parse_json(col("props"))
    Tables.events(s, dir)
      .select(col("event_type"), variant_get(v, "$.k", "long").as("k"))
      .filter(col("k").isNotNull)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_with_k"),
        sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"))
  }

  private val variantExtractSql =
    """SELECT event_type, CAST(count(*) AS BIGINT) AS n_with_k,
      |       CAST(sum(k) AS BIGINT) AS sum_k,
      |       CAST(min(k) AS BIGINT) AS min_k,
      |       CAST(max(k) AS BIGINT) AS max_k
      |FROM (SELECT event_type,
      |             CAST(json_extract(props, '$.k') AS BIGINT) AS k
      |      FROM events)
      |WHERE k IS NOT NULL GROUP BY 1""".stripMargin

  /** VARIANT depth: nested-object and array-element paths plus schema
    * inference — the open-schema surface a real semi-structured column
    * needs beyond top-level field access. The corpus's props are flat,
    * so the nested document is BUILT deterministically from typed
    * columns (`{"a":[{"b":⟨uid+10¹²⟩},{"b":⟨eid+10¹²⟩}],"t":"⟨type⟩"}`)
    * and both engines parse the same strings: Spark through one
    * `try_parse_json` + typed `variant_get` array/nested paths, DuckDB
    * through `json_extract` with the same `$.a[i].b` paths. The +10¹²
    * offset pins `schema_of_variant`'s integer-width inference to BIGINT
    * on every row, so the inferred-schema sanity columns are exact:
    * every row must infer `OBJECT<a: ARRAY<OBJECT<b: BIGINT>>, t:
    * STRING>` (one distinct schema corpus-wide, value hard-pinned in the
    * oracle). */
  private val variantNestedExtract: Q = (s, dir) => {
    val big = 1000000000000L
    val j = format_string("""{"a":[{"b":%d},{"b":%d}],"t":"%s"}""",
      col("user_id") + lit(big), col("event_id") + lit(big), col("event_type"))
    val v = try_parse_json(j)
    Tables.events(s, dir)
      .select(col("event_type"),
        variant_get(v, "$.a[0].b", "long").as("b0"),
        variant_get(v, "$.a[1].b", "long").as("b1"),
        variant_get(v, "$.t", "string").as("t"),
        schema_of_variant(v).as("vschema"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("b0")).as("sum_b0"),
        sum(col("b1")).as("sum_b1"),
        count(when(col("t") === col("event_type"), 1)).as("n_t_match"),
        count_distinct(col("vschema")).as("n_schemas"),
        max(col("vschema")).as("vschema"))
  }

  private val variantNestedExtractSql =
    """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
      |       CAST(sum(CAST(json_extract(j, '$.a[0].b') AS BIGINT)) AS BIGINT) AS sum_b0,
      |       CAST(sum(CAST(json_extract(j, '$.a[1].b') AS BIGINT)) AS BIGINT) AS sum_b1,
      |       CAST(count(CASE WHEN json_extract_string(j, '$.t') = event_type
      |                       THEN 1 END) AS BIGINT) AS n_t_match,
      |       CAST(1 AS BIGINT) AS n_schemas,
      |       'OBJECT<a: ARRAY<OBJECT<b: BIGINT>>, t: STRING>' AS vschema
      |FROM (SELECT event_type,
      |             '{"a":[{"b":' || (user_id + 1000000000000)
      |               || '},{"b":' || (event_id + 1000000000000)
      |               || '}],"t":"' || event_type || '"}' AS j
      |      FROM events)
      |GROUP BY 1""".stripMargin

  /** `Dataset.observe` — the engine-native form of the reference's peek
    * logging (UniqueUsersApp.java:124, :225–227), made ORACLE-CHECKED:
    * observation metrics ride the existing pass as accumulator-style
    * aggregates (zero extra jobs, zero extra scans, zero rows to the
    * driver — the contract that makes observability free at 100 TB).
    * Harvest is the batch pattern: a QueryExecutionListener reads
    * `observedMetrics` off the ACTION'S QueryExecution (an action builds
    * its own QE, so the dataset's own handle never sees the values; the
    * listener bus is async, hence the bounded poll). The gate compares
    * the harvested row against DuckDB recomputing the same aggregates. */
  private val observeMetrics: Q = (s, dir) => {
    val obs = Tables.events(s, dir)
      .filter(col("event_type").isin("view", "purchase", "click"))
      // DISTINCT aggregates are rejected by observe (metrics must merge
      // accumulator-style without a shuffle) — everything here is a
      // plain mergeable aggregate
      .observe("gate_metrics",
        count(lit(1)).as("n_rows"),
        max(col("user_id")).as("max_user"),
        round(sum(col("value")), 2).as("sum_value"),
        count(when(col("event_type") === "purchase", 1)).as("n_purchases"))
    val delivered =
      new java.util.concurrent.LinkedBlockingQueue[org.apache.spark.sql.Row](1)
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit =
        qe.observedMetrics.get("gate_metrics").foreach(delivered.offer)
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    s.listenerManager.register(listener)
    val m = try {
      obs.write.mode("overwrite").format("noop").save() // one scan, no rows moved
      val row = delivered.poll(60, java.util.concurrent.TimeUnit.SECONDS)
      require(row != null, "observed metrics were not delivered")
      row
    } finally s.listenerManager.unregister(listener)
    import s.implicits._
    Seq((m.getAs[Long]("n_rows"), m.getAs[Long]("max_user"),
        m.getAs[Double]("sum_value"), m.getAs[Long]("n_purchases")))
      .toDF("n_rows", "max_user", "sum_value", "n_purchases")
  }

  private val observeMetricsSql =
    """SELECT CAST(count(*) AS BIGINT) AS n_rows,
      |       CAST(max(user_id) AS BIGINT) AS max_user,
      |       round(CAST(sum(value) AS DOUBLE), 2) AS sum_value,
      |       CAST(count(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT) AS n_purchases
      |FROM events WHERE event_type IN ('view', 'purchase', 'click')""".stripMargin

  private val jsonRejectPolicySql =
    """WITH r AS (SELECT CAST(epoch(date_trunc('minute', ts)) AS BIGINT) AS minute,
      |                  CASE WHEN event_id % 10 = 0 THEN 'CORRUPT' || props
      |                       ELSE props END AS raw
      |           FROM events)
      |SELECT minute, CAST(count(*) AS BIGINT) AS n_total,
      |       CAST(sum(CASE WHEN NOT json_valid(raw) THEN 1 ELSE 0 END) AS BIGINT)
      |         AS n_rejected,
      |       CAST(sum(CASE WHEN json_valid(raw)
      |                     THEN CAST(json_extract(raw, '$.k') AS BIGINT) END) AS BIGINT)
      |         AS sum_k
      |FROM r GROUP BY 1""".stripMargin

  /** SURVEY §2.2 variant 2: windowed set-aggregate + set-size projection —
    * the reference's `HashSet` accumulate (UniqueUsersApp.java:173–191) and
    * `.size()` map (:193) as `collect_set` + `size`. The set is emitted
    * sorted/joined so the oracle can compare it; Spark encoders replace
    * the reference's delimiter-bug-prone HashSetStringSerde
    * (HashSetStringSerde.java:20–41). */
  private val userSetPerMinute: Q = (s, dir) =>
    Tables.events(s, dir)
      .select(TimeOps.minuteBucketEpoch(col("ts")).as("minute"),
        col("user_id").cast("string").as("uid"))
      .groupBy(col("minute"))
      .agg(concat_ws(",", array_sort(collect_set(col("uid")))).as("uids"),
        size(collect_set(col("uid"))).cast("long").as("n_unique"))

  private val userSetPerMinuteSql =
    """SELECT CAST(epoch(date_trunc('minute', ts)) AS BIGINT) AS minute,
      |       string_agg(DISTINCT CAST(user_id AS VARCHAR), ','
      |                  ORDER BY CAST(user_id AS VARCHAR)) AS uids,
      |       CAST(count(DISTINCT user_id) AS BIGINT) AS n_unique
      |FROM events GROUP BY 1""".stripMargin

  /** Inter-event gap analytics per user: lag-based time deltas — the
    * temporal profile a sessionization gap threshold is tuned from.
    * Gaps are computed on µs-truncated timestamps in both engines (Spark
    * TimestampType is µs; the oracle truncates its ns reads). */
  private val interEventGaps: Q = (s, dir) => {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(s, dir)
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .filter(col("prev_ts").isNotNull)
      // exact integer µs (a double epoch-seconds cast would round the µs
      // fraction at ~1e9-second magnitudes)
      .withColumn("gap_us", unix_micros(col("ts")) - unix_micros(col("prev_ts")))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_gaps"),
        round(avg(col("gap_us")) / 1e6, 4).as("avg_gap_sec"),
        round(max(col("gap_us")) / 1e6, 4).as("max_gap_sec"))
  }

  private val interEventGapsSql =
    """WITH g AS (
      |  SELECT user_id,
      |         epoch_us(date_trunc('microseconds', ts))
      |           - epoch_us(lag(date_trunc('microseconds', ts), 1)
      |                      OVER (PARTITION BY user_id
      |                            ORDER BY date_trunc('microseconds', ts), event_id)) AS gap_us
      |  FROM events)
      |SELECT user_id, CAST(count(*) AS BIGINT) AS n_gaps,
      |       round(CAST(avg(gap_us) AS DOUBLE) / 1e6, 4) AS avg_gap_sec,
      |       round(CAST(max(gap_us) AS DOUBLE) / 1e6, 4) AS max_gap_sec
      |FROM g WHERE gap_us IS NOT NULL
      |GROUP BY 1""".stripMargin

  /** SCD2 history derivation — the warehouse "slowly changing dimension"
    * operator: an append-only event changelog compressed into per-entity
    * state intervals `[valid_from, valid_to)` with an `is_current` flag.
    * Run-length compression first (keep only rows where the state differs
    * from the previous state), then `lead` over the survivors supplies
    * each interval's end. Both windows partition BY USER — per-entity
    * history is bounded, so partitions stay small at any corpus scale and
    * the plan is two window passes over one hash exchange on user_id (the
    * second window reuses the first's partitioning). Intervals are emitted
    * as exact epoch-µs longs (`inter_event_gaps` precedent: integer
    * round-trips engine-to-engine bit-exactly). */
  private val scd2UserState: Q = (s, dir) => {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(s, dir)
      .withColumn("prev_state", lag(col("event_type"), 1).over(w))
      .filter(col("prev_state").isNull ||
        col("prev_state") =!= col("event_type"))
      .withColumn("valid_from_us", unix_micros(col("ts")))
      .withColumn("valid_to_us", lead(col("valid_from_us"), 1).over(w))
      .select(col("user_id"), col("event_type").as("state"),
        col("valid_from_us"), col("valid_to_us"),
        col("valid_to_us").isNull.as("is_current"))
  }

  private val scd2UserStateSql =
    """WITH ordered AS (
      |  SELECT user_id, event_type, event_id,
      |         date_trunc('microseconds', ts) AS tsu,
      |         lag(event_type, 1) OVER (
      |           PARTITION BY user_id
      |           ORDER BY date_trunc('microseconds', ts), event_id) AS prev_state
      |  FROM events),
      |runs AS (
      |  SELECT user_id, event_type, event_id, tsu FROM ordered
      |  WHERE prev_state IS NULL OR prev_state <> event_type)
      |SELECT user_id, event_type AS state,
      |       epoch_us(tsu) AS valid_from_us,
      |       lead(epoch_us(tsu), 1) OVER (
      |         PARTITION BY user_id ORDER BY tsu, event_id) AS valid_to_us,
      |       lead(epoch_us(tsu), 1) OVER (
      |         PARTITION BY user_id ORDER BY tsu, event_id) IS NULL AS is_current
      |FROM runs""".stripMargin

  /** Snapshot diff — the other direction of the SCD2 coin: given two
    * versions of a keyed table (here: per-user latest state as of the
    * timeline midpoint vs as of the end), derive the CDC verdict per key
    * (insert / update / unchanged; deletes can't arise from an
    * append-only changelog and are documented absent). The midpoint is
    * exact integer µs arithmetic (t_min + (t_max−t_min) div 2) so both
    * engines cut at the identical instant. Scale shape: two latest-row
    * window passes (per-user partitions) + one key-sized full outer join
    * — snapshots are KEY-cardinality relations, never event-cardinality. */
  private val snapshotDiff: Q = (s, dir) => {
    val ev = Tables.events(s, dir)
      .select(col("user_id"), col("event_type"), col("event_id"),
        unix_micros(col("ts")).as("us"))
    // `div` (integer division), not `/`: Spark's `/` on longs is DOUBLE
    // division, which only matched the oracle's integer `//` because
    // epoch-µs values happen to be exactly double-representable
    val mid = ev.agg(
      expr("min(us) + (max(us) - min(us)) div 2")
        .cast("long").as("t1"))
    def latest(df: org.apache.spark.sql.DataFrame) = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("us").desc, col("event_id").desc)
      df.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("user_id"), col("event_type"))
    }
    val a = latest(ev.crossJoin(broadcast(mid)).filter(col("us") <= col("t1")))
      .withColumnRenamed("event_type", "state_t1")
    val b = latest(ev).withColumnRenamed("event_type", "state_t2")
    b.join(a, Seq("user_id"), "left")
      .select(col("user_id"), col("state_t1"), col("state_t2"),
        when(col("state_t1").isNull, "insert")
          .when(col("state_t1") =!= col("state_t2"), "update")
          .otherwise("unchanged").as("change_type"))
  }

  private val snapshotDiffSql =
    """WITH ev AS (
      |  SELECT user_id, event_type, event_id,
      |         epoch_us(date_trunc('microseconds', ts)) AS us
      |  FROM events),
      |mid AS (SELECT min(us) + (max(us) - min(us)) // 2 AS t1 FROM ev),
      |a AS (SELECT user_id, event_type AS state_t1 FROM (
      |        SELECT user_id, event_type, row_number() OVER (
      |          PARTITION BY user_id ORDER BY us DESC, event_id DESC) AS rn
      |        FROM ev CROSS JOIN mid WHERE us <= t1)
      |      WHERE rn = 1),
      |b AS (SELECT user_id, event_type AS state_t2 FROM (
      |        SELECT user_id, event_type, row_number() OVER (
      |          PARTITION BY user_id ORDER BY us DESC, event_id DESC) AS rn
      |        FROM ev)
      |      WHERE rn = 1)
      |SELECT b.user_id, a.state_t1, b.state_t2,
      |       CASE WHEN a.state_t1 IS NULL THEN 'insert'
      |            WHEN a.state_t1 <> b.state_t2 THEN 'update'
      |            ELSE 'unchanged' END AS change_type
      |FROM b LEFT JOIN a ON a.user_id = b.user_id""".stripMargin

  /** Per-user EWMA of event values with α = 1/2 — the streaming-metrics
    * smoothing primitive. EWMA is a non-associative left fold, which is
    * exactly what distributed aggregation CANNOT reorder — so the
    * operator collects each user's (bounded) history into one sorted
    * array and folds it ROW-LOCALLY with a HOF `aggregate`; values are
    * 1e-2 fixed-point longs and α = 1/2 is an integer halving, so the
    * fold is exact integer arithmetic an engine replays bit-for-bit (a
    * double fold would accumulate rounding skew between engines). The
    * oracle is the same recurrence as a per-user recursive CTE. */
  private val ewmaUserValue: Q = (s, dir) => {
    val ev = Tables.events(s, dir).select(col("user_id"),
      unix_micros(col("ts")).as("u"), col("event_id").as("e"),
      round(col("value") * 100).cast("long").as("v"))
    ev.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sort_array(collect_list(struct(col("u"), col("e"), col("v"))))
          .as("arr"))
      .select(col("user_id"), col("n_events"),
        expr("""aggregate(arr,
                named_struct('init', false, 's', CAST(0 AS BIGINT)),
                (acc, x) -> named_struct('init', true,
                  's', CASE WHEN acc.init THEN (acc.s + x.v) div 2
                            ELSE x.v END),
                acc -> acc.s)""").as("ewma_fp"))
      .withColumn("ewma", round(col("ewma_fp") / 100.0, 2))
  }

  private val ewmaUserValueSql =
    """WITH RECURSIVE ev AS (
      |  SELECT user_id, CAST(round(value * 100) AS BIGINT) AS v,
      |         row_number() OVER (
      |           PARTITION BY user_id
      |           ORDER BY date_trunc('microseconds', ts), event_id) AS rn
      |  FROM events),
      |rec AS (
      |  SELECT user_id, rn, v AS s FROM ev WHERE rn = 1
      |  UNION ALL
      |  SELECT e.user_id, e.rn, (r.s + e.v) // 2
      |  FROM rec r JOIN ev e ON e.user_id = r.user_id AND e.rn = r.rn + 1),
      |last AS (SELECT user_id, max(rn) AS mx FROM ev GROUP BY 1)
      |SELECT r.user_id, CAST(l.mx AS BIGINT) AS n_events, r.s AS ewma_fp,
      |       round(r.s / 100.0, 2) AS ewma
      |FROM rec r JOIN last l ON r.user_id = l.user_id AND r.rn = l.mx""".stripMargin

  /** Conditional aggregates: count_if / filtered sums / bool aggregates —
    * the guard-railed forms of CASE-sum pivoting. */
  private val conditionalAgg: Q = (s, dir) =>
    Tables.events(s, dir)
      .groupBy(col("event_type"))
      .agg(
        count_if(col("value") > 100.0).as("n_big"),
        round(sum(when(col("value") > 100.0, col("value")).otherwise(0.0)), 4).as("sum_big"),
        bool_or(col("value") > 499.0).as("any_near_max"),
        bool_and(col("value") >= 0.0).as("all_nonneg"))

  private val conditionalAggSql =
    """SELECT event_type,
      |       CAST(sum(CASE WHEN value > 100.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_big,
      |       round(CAST(sum(CASE WHEN value > 100.0 THEN value ELSE 0 END) AS DOUBLE), 4) AS sum_big,
      |       bool_or(value > 499.0) AS any_near_max,
      |       bool_and(value >= 0.0) AS all_nonneg
      |FROM events GROUP BY 1""".stripMargin

  /** Typed Dataset[T] path: the same engine surface through case-class
    * encoders and groupByKey — compile-time field checks where the
    * DataFrame API is stringly-typed (SURVEY §1.3 "typed Dataset at API
    * boundaries"). Encoders put rows in Tungsten format; the aggregate
    * itself plans identically to the untyped groupBy. */
  private val typedEventStats: Q = (s, dir) => {
    import s.implicits._
    val stats = Tables.events(s, dir)
      .select(col("user_id"), col("event_type"), col("value"))
      .as[Ev]
      .groupByKey(e => (e.user_id, e.event_type))
      .mapGroups { (key: (Long, String), rows: Iterator[Ev]) =>
        var n = 0L; var sum = 0.0
        rows.foreach { e => n += 1; sum += e.value }
        (key._1, key._2, n, sum)
      }
    stats.toDF("user_id", "event_type", "n_events", "sum_value")
      .withColumn("sum_value", round(col("sum_value"), 4))
  }

  private val typedEventStatsSql =
    """SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n_events,
      |       round(CAST(sum(value) AS DOUBLE), 4) AS sum_value
      |FROM events GROUP BY 1, 2""".stripMargin

  /** `KeyValueGroupedDataset.cogroup` — the typed two-sided grouped
    * primitive (the general form of a full-outer grouped join): views
    * and purchases grouped per user, both iterators visited in ONE
    * co-partitioned task. The funnel metrics (counts + conversion flag +
    * first-purchase-value) need user-local logic over BOTH sides, which
    * is exactly what cogroup gives without materializing a join. One
    * shuffle per side on the key — same cost as the equivalent
    * aggregate-then-outer-join, but one pass. */
  private val cogroupUserFunnel: Q = (s, dir) => {
    import s.implicits._
    val ev = Tables.events(s, dir).select(col("user_id"), col("event_type"),
      col("value"), unix_micros(col("ts")).as("tsu"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id").as("uid"), col("tsu")).as[(Long, Long)]
      .groupByKey(_._1)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("uid"), col("value"), col("tsu"))
      .as[(Long, Double, Long)]
      .groupByKey(_._1)
    // (ts, value) min makes the "first purchase" pick iterator-order-
    // independent; rounding stays in the DataFrame layer where the
    // round() semantics are the ones the oracle's round() mirrors
    views.cogroup(purchases) { (uid, vs, ps) =>
      var nViews = 0L
      vs.foreach(_ => nViews += 1)
      var nPurch = 0L; var firstTs = Long.MaxValue
      var firstVal = Double.MaxValue
      ps.foreach { p =>
        nPurch += 1
        if (p._3 < firstTs || (p._3 == firstTs && p._2 < firstVal)) {
          firstTs = p._3; firstVal = p._2
        }
      }
      Iterator.single((uid, nViews, nPurch, nPurch > 0, firstVal))
    }.toDF("user_id", "n_views", "n_purchases", "converted", "raw_first")
      .withColumn("first_purchase_value",
        when(col("converted"), round(col("raw_first"), 4)).otherwise(lit(-1.0)))
      .drop("raw_first")
  }

  // µs-truncated ordering mirrors unix_micros on the Spark side; the
  // row_number window reproduces the kernel's (ts, value) min exactly
  private val cogroupUserFunnelSql =
    """WITH v AS (SELECT user_id, count(*) AS n_views FROM events
      |           WHERE event_type = 'view' GROUP BY 1),
      |p0 AS (SELECT user_id, value,
      |              row_number() OVER (PARTITION BY user_id
      |                ORDER BY date_trunc('microseconds', ts), value) AS rn,
      |              count(*) OVER (PARTITION BY user_id) AS n_purchases
      |       FROM events WHERE event_type = 'purchase'),
      |p AS (SELECT user_id, n_purchases,
      |             round(CAST(value AS DOUBLE), 4) AS first_val
      |      FROM p0 WHERE rn = 1),
      |u AS (SELECT DISTINCT user_id FROM events
      |      WHERE event_type IN ('view', 'purchase'))
      |SELECT u.user_id,
      |       CAST(coalesce(v.n_views, 0) AS BIGINT) AS n_views,
      |       CAST(coalesce(p.n_purchases, 0) AS BIGINT) AS n_purchases,
      |       coalesce(p.n_purchases, 0) > 0 AS converted,
      |       coalesce(p.first_val, -1.0) AS first_purchase_value
      |FROM u LEFT JOIN v ON v.user_id = u.user_id
      |       LEFT JOIN p ON p.user_id = u.user_id""".stripMargin

  /** Per-window top-k (leaderboard): the most active user in each minute —
    * windowed aggregation composed with rank-within-group, the shape of
    * every "top N per time bucket" dashboard query. Deterministic ties:
    * count desc, then user_id. */
  private val topUserPerMinute: Q = (s, dir) => {
    val counts = Tables.events(s, dir)
      .groupBy(TimeOps.minuteBucketEpoch(col("ts")).as("minute"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("minute")).orderBy(col("n_events").desc, col("user_id"))
    counts.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("minute"), col("user_id").as("top_user"), col("n_events"))
  }

  private val topUserPerMinuteSql =
    """WITH c AS (
      |  SELECT CAST(epoch(date_trunc('minute', ts)) AS BIGINT) AS minute,
      |         user_id, count(*) AS n_events
      |  FROM events GROUP BY 1, 2)
      |SELECT minute, user_id AS top_user, CAST(n_events AS BIGINT) AS n_events
      |FROM (SELECT *, row_number() OVER (PARTITION BY minute
      |                                   ORDER BY n_events DESC, user_id) AS rn
      |      FROM c)
      |WHERE rn = 1""".stripMargin

  /** Approximate distinct (HyperLogLog++) — the mergeable-sketch scale path
    * (SURVEY §7 M2). Fully hash-checked despite being a sketch: the query
    * emits the exact count plus a `within_bound` boolean asserting the HLL
    * estimate landed inside max(5, 5%·exact); the DuckDB oracle reproduces
    * the exact side and a literal TRUE, so an out-of-bound sketch fails the
    * gate. Tighter error statistics stay in UniqueUsersSpec. */
  private val approxUniqueUsers: Q = (s, dir) =>
    UniqueUsers.perMinuteApproxChecked(Tables.events(s, dir), col("ts"), col("user_id"))

  private val approxUniqueUsersSql =
    """SELECT CAST(epoch(date_trunc('minute', ts)) AS BIGINT) AS minute,
      |       CAST(count(DISTINCT user_id) AS BIGINT) AS unique_users,
      |       TRUE AS within_bound
      |FROM events GROUP BY 1""".stripMargin

  /** Cohort retention matrix — the product-analytics staple: users
    * cohorted by first-seen hour, activity counted per (cohort, hour
    * offset). Scale shape: the raw stream first collapses to the DISTINCT
    * (user, hour) relation (map-side combinable — the 100 TB reduction
    * step; everything after runs on user×hour, not events); first-seen
    * rides a per-user window min over that SAME relation — ONE pass, no
    * self-join, nothing cached (the former distinct→checkpoint→min-agg→
    * join-back shape held a user×hour relation in memory: sub-fact but
    * still data-∝, the storageFraction-floor family under bench
    * repetition at 100×+). The window partitions per user (bounded by
    * the user's active hours — never global), and the final count is
    * plain (each user appears once per (cohort, offset) by construction
    * — no distinct agg needed). All time arithmetic is exact integer
    * epoch-seconds (`div`, inter_event_gaps precedent). */
  private val cohortRetention: Q = (s, dir) => {
    val ev = Tables.events(s, dir)
      .select(col("user_id"),
        unix_timestamp(date_trunc("hour", col("ts"))).as("h"))
      .distinct()
    val byUser = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"))
    ev.withColumn("cohort", min(col("h")).over(byUser))
      .select(col("cohort").as("cohort_hour"),
        expr("(h - cohort) div 3600").as("offset_hours"))
      .groupBy(col("cohort_hour"), col("offset_hours"))
      .agg(count(lit(1)).as("active_users"))
  }

  private val cohortRetentionSql =
    """WITH e AS (SELECT DISTINCT user_id,
      |                  CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS h
      |           FROM events),
      |f AS (SELECT user_id, min(h) AS cohort FROM e GROUP BY 1)
      |SELECT f.cohort AS cohort_hour,
      |       (e.h - f.cohort) // 3600 AS offset_hours,
      |       CAST(count(*) AS BIGINT) AS active_users
      |FROM e JOIN f USING (user_id) GROUP BY 1, 2""".stripMargin

  /** Rolling anomaly flags with EXACT integer arithmetic: per user, each
    * event is judged against its trailing baseline (the 10 preceding
    * events, current row excluded). The z-score test |v−mean| > 2·std is
    * algebraically cleared of divisions and sqrt —
    * (n·v − S)²·(n−1) > 4·n·(n·Σv² − S²) with v fixed-point (value×100 as
    * long, ewma precedent) — so the flag is integer-exact on both engines;
    * no FP rounding anywhere near the decision boundary. Products stay
    * < 2⁶² for v ≤ 10⁷ (here v ≤ 49 002). One window, one sort per
    * user-partition, three running sums — the plan window_analytics
    * already pins. Baselines under 3 events flag false (no variance). */
  private val rollingZscore: Q = (s, dir) => {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"))
      .orderBy(col("u"), col("event_id"))
      .rowsBetween(-10, -1)
    val nv = col("n") * col("v") - col("s")
    Tables.events(s, dir)
      .select(col("user_id"), unix_micros(col("ts")).as("u"), col("event_id"),
        round(col("value") * 100).cast("long").as("v"))
      .select(col("user_id"), col("event_id"), col("v"),
        count(col("v")).over(w).as("n"),
        sum(col("v")).over(w).as("s"),
        sum(col("v") * col("v")).over(w).as("s2"))
      .select(col("user_id"), col("event_id"),
        round(col("v") / 100.0, 2).as("value"),
        col("n").as("n_baseline"),
        when(col("n") >= 3,
          nv * nv * (col("n") - 1) >
            lit(4L) * col("n") * (col("n") * col("s2") - col("s") * col("s")))
          .otherwise(lit(false)).as("is_anomaly"))
  }

  private val rollingZscoreSql =
    """WITH ev AS (SELECT user_id, event_id,
      |                   CAST(round(value * 100) AS BIGINT) AS v,
      |                   date_trunc('microseconds', ts) AS u
      |            FROM events),
      |w AS (SELECT user_id, event_id, v,
      |             count(v) OVER win AS n,
      |             sum(v) OVER win AS s,
      |             sum(v * v) OVER win AS s2
      |      FROM ev
      |      WINDOW win AS (PARTITION BY user_id ORDER BY u, event_id
      |                     ROWS BETWEEN 10 PRECEDING AND 1 PRECEDING))
      |SELECT user_id, event_id, round(v / 100.0, 2) AS value,
      |       CAST(coalesce(n, 0) AS BIGINT) AS n_baseline,
      |       CASE WHEN n >= 3
      |            THEN (n*v - s)*(n*v - s)*(n - 1) > 4*n*(n*s2 - s*s)
      |            ELSE FALSE END AS is_anomaly
      |FROM w""".stripMargin

  /** Time-series resampling with forward fill — the gap-filling primitive
    * every metrics/sensor pipeline needs before aligned arithmetic:
    * per-user irregular events become a REGULAR hourly grid from the
    * user's first to last observation, each grid point carrying the last
    * value observed at or before it.
    *
    * Shape, chosen for scale: (1) collapse events to one observation per
    * (user, hour) — latest by (µs, event_id), the event-scale reduction
    * step; (2) generate each user's grid ROW-LOCALLY from its (min, max)
    * hour span via `sequence` + `explode` — no time dimension table, no
    * join against a calendar; (3) one left join of grid to observations
    * on (user, hour) — both sides grid/observation-cardinality; (4)
    * forward-fill as a single running `last(_, ignoreNulls)` window per
    * user — NO per-gap self-join or as-of lookup, one sort per user
    * partition. Output size users × span is the resampled series itself
    * — inherent to the operator, not overhead. Integer epoch-second and
    * fixed-point arithmetic throughout; `is_observed` distinguishes
    * measured from filled points. */
  /** The row-local grid for `resample_ffill`, with a LOUD span cap: each
    * user's grid is one `sequence()` array before the explode, so a
    * pathological span (decades of hourly buckets from one stray
    * timestamp) would build a multi-MB row and fail as a quiet executor
    * OOM. `maxGridRows` hourly points (default 200 000 ≈ 23 years ≈
    * 1.6 MB of longs — far beyond any sane resample span, far below task
    * memory) turns that into an error naming the user. The `assert_true`
    * is folded into the sequence's upper bound (passes ⇒ null ⇒ +0), so
    * column pruning can never drop the guard. */
  private[graft] def resampleGrid(
      perHour: org.apache.spark.sql.DataFrame,
      maxGridRows: Long = 200000L): org.apache.spark.sql.DataFrame =
    perHour.groupBy(col("user_id"))
      .agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
      .select(col("user_id"),
        explode(sequence(
          col("h0"),
          col("h1") + coalesce(
            assert_true(
              (col("h1") - col("h0")) / lit(3600L) < lit(maxGridRows),
              concat(lit(s"resample_ffill: grid span exceeds $maxGridRows" +
                " hourly points for user "), col("user_id")))
              .cast("long"),
            lit(0L)),
          lit(3600L))).as("h"))

  private val resampleFfill: Q = (s, dir) => {
    val perHour = Tables.events(s, dir)
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
    val grid = resampleGrid(perHour)
    val ffw = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("h"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    grid.join(perHour, Seq("user_id", "h"), "left")
      .select(col("user_id"), col("h"),
        last(col("v_fp"), ignoreNulls = true).over(ffw).as("v_ff"),
        col("v_fp").isNotNull.as("is_observed"))
  }

  private val resampleFfillSql =
    """WITH ev AS (
      |  SELECT user_id, event_id,
      |         CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS h,
      |         epoch_us(date_trunc('microseconds', ts)) AS us,
      |         CAST(round(value * 100) AS BIGINT) AS v_fp
      |  FROM events),
      |perh AS (SELECT user_id, h, v_fp FROM (
      |           SELECT user_id, h, v_fp, row_number() OVER (
      |             PARTITION BY user_id, h
      |             ORDER BY us DESC, event_id DESC) AS rn
      |           FROM ev) WHERE rn = 1),
      |spans AS (SELECT user_id, min(h) AS h0, max(h) AS h1
      |          FROM perh GROUP BY 1),
      |grid AS (SELECT user_id, unnest(generate_series(h0, h1, 3600)) AS h
      |         FROM spans)
      |SELECT g.user_id, g.h,
      |       last_value(p.v_fp IGNORE NULLS) OVER (
      |         PARTITION BY g.user_id ORDER BY g.h
      |         ROWS UNBOUNDED PRECEDING) AS v_ff,
      |       p.v_fp IS NOT NULL AS is_observed
      |FROM grid g LEFT JOIN perh p
      |  ON g.user_id = p.user_id AND g.h = p.h""".stripMargin

  /** Hourly OHLC downsampling — order-aware aggregation WITHOUT windows:
    * open/close are the first/last values by event order inside each
    * (user, hour) bucket, computed by `min_by`/`max_by` in the SAME
    * single-pass grouped aggregate as high/low/count. That is the
    * operator under test: at 100 TB a window (sort per partition) for
    * "first/last per group" pays a per-group sort the hash aggregate
    * never does — min_by carries one (value, ord) candidate per group
    * per task, map-side combined like any other agg.
    *
    * The ordinal must be IDENTICAL in both engines and order like the
    * lexicographic pair (µs, event_id): packed as µs × 2⁶⁴ + event_id in
    * 128-bit-wide exact arithmetic — decimal(38,0) in Spark, HUGEINT in
    * the oracle (~3×10³⁴ ≪ both domains). Because consecutive µs values
    * differ by ≥ 2⁶⁴ and any two BIGINT event_ids differ by < 2⁶⁴, the
    * packing is order-isomorphic to the pair for EVERY bigint event_id —
    * no width precondition, nothing to overflow at any scale (DuckDB
    * arg_min/arg_max accept no struct ordinal, so a row-value comparison
    * is not portable here). */
  private val ohlcHourly: Q = (s, dir) => {
    val ev = Tables.events(s, dir).select(
      col("user_id"),
      unix_timestamp(date_trunc("hour", col("ts"))).as("h"),
      unix_micros(col("ts")).as("us"), col("event_id"),
      round(col("value") * 100).cast("long").as("v_fp"))
      .withColumn("ord",
        col("us").cast("decimal(20,0)") *
          lit(new java.math.BigDecimal("18446744073709551616")) +
          col("event_id").cast("decimal(20,0)"))
    ev.groupBy(col("user_id"), col("h")).agg(
      min_by(col("v_fp"), col("ord")).as("open_fp"),
      max(col("v_fp")).as("high_fp"),
      min(col("v_fp")).as("low_fp"),
      max_by(col("v_fp"), col("ord")).as("close_fp"),
      count(lit(1)).as("n_events"))
  }

  private val ohlcHourlySql =
    """WITH ev AS (
      |  SELECT user_id,
      |         CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS h,
      |         CAST(epoch_us(date_trunc('microseconds', ts)) AS HUGEINT)
      |           * 18446744073709551616 + event_id AS ord,
      |         CAST(round(value * 100) AS BIGINT) AS v_fp
      |  FROM events)
      |SELECT user_id, h,
      |       arg_min(v_fp, ord) AS open_fp,
      |       CAST(max(v_fp) AS BIGINT) AS high_fp,
      |       CAST(min(v_fp) AS BIGINT) AS low_fp,
      |       arg_max(v_fp, ord) AS close_fp,
      |       CAST(count(*) AS BIGINT) AS n_events
      |FROM ev GROUP BY 1, 2""".stripMargin

  val all: Map[String, Q] = Map(
    "ohlc_hourly"             -> ohlcHourly,
    "resample_ffill"          -> resampleFfill,
    "cohort_retention"        -> cohortRetention,
    "rolling_zscore"          -> rollingZscore,
    "unique_users_per_minute" -> uniqueUsersPerMinute,
    "unique_users_two_phase"  -> uniqueUsersTwoPhase,
    "json_extract"            -> jsonExtract,
    "json_reject_policy"      -> jsonRejectPolicy,
    "filter_project"          -> filterProject,
    "windowed_count_by_type"  -> windowedCountByType,
    "dedup_events_exact"      -> dedupEventsExact,
    "last_event_per_user"     -> lastEventPerUser,
    "sliding_window_counts"   -> slidingWindowCounts,
    "session_window_stats"    -> sessionWindowStats,
    "user_set_per_minute"     -> userSetPerMinute,
    "typed_event_stats"       -> typedEventStats,
    "cogroup_user_funnel"     -> cogroupUserFunnel,
    "observe_metrics"         -> observeMetrics,
    "variant_extract"         -> variantExtract,
    "variant_nested_extract"  -> variantNestedExtract,
    "conditional_agg"         -> conditionalAgg,
    "inter_event_gaps"        -> interEventGaps,
    "top_user_per_minute"     -> topUserPerMinute,
    "approx_unique_users"     -> approxUniqueUsers,
    "scd2_user_state"         -> scd2UserState,
    "snapshot_diff"           -> snapshotDiff,
    "ewma_user_value"         -> ewmaUserValue,
  )

  val oracles: Map[String, String] = Map(
    "cohort_retention"        -> cohortRetentionSql,
    "ohlc_hourly"             -> ohlcHourlySql,
    "resample_ffill"          -> resampleFfillSql,
    "rolling_zscore"          -> rollingZscoreSql,
    "unique_users_per_minute" -> uniqueUsersPerMinuteSql,
    "unique_users_two_phase"  -> uniqueUsersPerMinuteSql,
    "approx_unique_users"     -> approxUniqueUsersSql,
    "json_extract"            -> jsonExtractSql,
    "json_reject_policy"      -> jsonRejectPolicySql,
    "filter_project"          -> filterProjectSql,
    "windowed_count_by_type"  -> windowedCountByTypeSql,
    "dedup_events_exact"      -> dedupEventsExactSql,
    "last_event_per_user"     -> lastEventPerUserSql,
    "sliding_window_counts"   -> slidingWindowCountsSql,
    "session_window_stats"    -> sessionWindowStatsSql,
    "user_set_per_minute"     -> userSetPerMinuteSql,
    "typed_event_stats"       -> typedEventStatsSql,
    "cogroup_user_funnel"     -> cogroupUserFunnelSql,
    "observe_metrics"         -> observeMetricsSql,
    "variant_extract"         -> variantExtractSql,
    "variant_nested_extract"  -> variantNestedExtractSql,
    "conditional_agg"         -> conditionalAggSql,
    "inter_event_gaps"        -> interEventGapsSql,
    "top_user_per_minute"     -> topUserPerMinuteSql,
    "scd2_user_state"         -> scd2UserStateSql,
    "snapshot_diff"           -> snapshotDiffSql,
    "ewma_user_value"         -> ewmaUserValueSql,
  )
}
