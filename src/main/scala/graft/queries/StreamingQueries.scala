package graft.queries

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.streaming.UniqueUsersStream

/** Streaming entries in the correctness gate: a REAL Structured Streaming
  * query (file source → watermarked plan → memory sink) executed to
  * completion inside the query function, returning the materialized result
  * so the driver's DuckDB compare checks batch/stream parity — the test
  * axis SURVEY §3 (entry point 3) makes first-class.
  *
  * Complete output mode is used so every window (including the last,
  * never-closed one) is emitted and the result equals the batch
  * `count_distinct` oracle exactly. Append-mode (watermark-closing)
  * semantics are covered in StreamingSpec where the input is controllable.
  */
object StreamingQueries {

  private val runSeq = new AtomicInteger(0)

  /** Every streaming gate runs on `SparkSession.newSession()` — same
    * SparkContext (executors, block manager), but an ISOLATED SessionState:
    * its own SQLConf, temp views, and listener wiring. The gates mutate
    * session conf by necessity (state-partition sizing, the RocksDB
    * provider class), and on a
    * shared session those sets are a thread-safety hazard (a concurrent
    * query on the same session would observe them mid-flight). On the
    * child session they are free: the mutations die with the gate, no
    * restore protocol needed. The memory-sink temp table and the returned
    * DataFrame are both bound to the child, which stays fully usable after
    * the gate returns (a child session is never "closed" — only the
    * SparkContext owns lifecycle). Applied centrally in `all`, so every
    * gate body may treat its `s` as private. */
  private def isolated(f: Q): Q = (s, dir) => f(s.newSession(), dir)

  /** Set a reduced shuffle-partition count on the gate's (child) session.
    * A streaming query pins its STATE partitioning to
    * `spark.sql.shuffle.partitions` at start, and every micro-batch then
    * pays one state-store instance (for RocksDB: one native DB
    * open/commit) per partition — at the gate's data scale, 32 partitions
    * is pure overhead (measured 8.6 s → ~2 s). State partition count is a
    * per-deployment sizing knob, not a semantic: at cluster scale you size
    * it to executors × cores. No restore: the conf lives on the isolated
    * child session (`isolated`), which no other query shares. */
  /** Streaming gates pin 4 state partitions (deterministic across the
    * driver's 4- and 32-cpu harnesses). `SPARK_GRAFT_STATE_PARTITIONS`
    * overrides for scale probes (e.g. the r15 state-depth-vs-starvation
    * probe on `streaming_running_distinct` at 100 M events); unset in
    * driver runs, so gate behavior is unchanged there. */
  private def setStatePartitions(s: org.apache.spark.sql.SparkSession,
                                 n: Int): Unit =
    s.conf.set("spark.sql.shuffle.partitions",
      sys.env.get("SPARK_GRAFT_STATE_PARTITIONS").map(_.toInt).getOrElse(n))

  // events.parquet carries TIMESTAMP(NANOS); readStream needs an explicit
  // schema, and asking for long ts surfaces Spark's internal epoch-MICROS
  // (Schemas.eventsRawMicros — the ns→µs floor happens in the reader).
  private val eventsRawSchema = graft.model.Schemas.eventsRawMicros

  /** Stop a gate's streaming query, first offering its last micro-batch
    * plan to the audit recorder (a volatile-read no-op outside
    * `graft.Explain` — see StreamPlanCapture). Every gate stops through
    * here so PLANS.md can pin streaming plans like batch ones. */
  private def drainStop(q: org.apache.spark.sql.streaming.StreamingQuery): Unit = {
    graft.plans.StreamPlanCapture.record(q)
    q.stop()
  }

  private val streamingUniqueUsers: Q = (s, dir) => {
    // glob form: FileStreamSource requires a directory or glob, not a
    // bare file path ("Option 'basePath' must be a directory")
    val frames = s.readStream
      .schema(eventsRawSchema)
      .parquet(s"$dir/events.parquet*")
      .select(graft.model.Schemas.tsFromMicros(col("ts")).as("eventTime"),
        col("user_id").cast("string").as("uid"))
    val counts = UniqueUsersStream.uniquePerWindow(frames,
      window = "1 minute", watermark = None)
    val sink = s"streaming_unique_users_${runSeq.incrementAndGet()}"
    setStatePartitions(s, 4)
    locally {
      val q = counts.writeStream
        .format("memory").queryName(sink)
        .outputMode("complete")
        .start()
      try q.processAllAvailable() finally drainStop(q)
    }
    s.table(sink).select(
      unix_timestamp(col("window_start")).as("minute"),
      col("unique_users"))
  }

  // Same oracle as the batch flagship — THE parity statement.
  private val streamingUniqueUsersSql =
    """SELECT CAST(epoch(date_trunc('minute', ts)) AS BIGINT) AS minute,
      |       CAST(count(DISTINCT user_id) AS BIGINT) AS unique_users
      |FROM events GROUP BY 1""".stripMargin

  /** transformWithState in the gate: the RunningDistinct processor over a
    * file-source stream. The whole file arrives in one micro-batch, so
    * each bucket emits exactly one (final) running count — which must
    * equal the batch distinct-count oracle. Requires the RocksDB state
    * store provider (set per-run, restored after). */
  private val streamingRunningDistinct: Q = (s, dir) => {
    // provider set on the gate's isolated child session — no restore
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    locally {
      import s.implicits._
      val frames = s.readStream
        .schema(eventsRawSchema)
        .parquet(s"$dir/events.parquet*")
        .select(
          unix_timestamp(date_trunc("minute",
            graft.model.Schemas.tsFromMicros(col("ts")))).as("bucket"),
          col("user_id").cast("string").as("uid"),
          graft.model.Schemas.tsFromMicros(col("ts")).as("eventTime"))
        .as[graft.streaming.RunningDistinct.In]
      val out = graft.streaming.RunningDistinct.runningUniquePerBucket(frames)
      val sink = s"streaming_running_distinct_${runSeq.incrementAndGet()}"
      setStatePartitions(s, 4)
      locally {
        val q = out.toDF().writeStream.format("memory").queryName(sink)
          .outputMode("update").start()
        try q.processAllAvailable() finally drainStop(q)
      }
      s.table(sink).select(col("bucket").as("minute"),
        col("uniqueUsers").as("unique_users"))
    }
  }

  /** Delete-if-present then recreate a scratch dir (closing the walk
    * stream — Files.walk holds a directory handle until closed). */
  private def freshDir(tmp: java.nio.file.Path): Unit = {
    import java.nio.file.Files
    if (Files.exists(tmp)) {
      val walk = Files.walk(tmp)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => Files.delete(p))
      finally walk.close()
    }
    Files.createDirectories(tmp)
  }

  /** Stage the fixture's events table into `tmp` as micro-batch 1.
    * Driver testdata ships `events.parquet` as ONE file; ScaleGen
    * corpora (the scale probes' inputs) write a multi-part parquet
    * DIRECTORY — stage every part file flat under a `batch1_` prefix so
    * the gate's `*.parquet` glob sees all of them as the initial batch
    * either way (FileStreamSource puts every file available at start
    * into the first batch; later sentinel files still arrive strictly
    * after batch 1 commits, by progressive delivery). */
  private def stageEventsAsBatch1(dir: String,
      tmp: java.nio.file.Path): Unit = {
    import java.nio.file.{Files, Paths}
    val src = Paths.get(dir, "events.parquet")
    if (Files.isDirectory(src)) {
      val list = Files.list(src)
      try {
        val it = list.iterator()
        var i = 0
        while (it.hasNext) {
          val p = it.next()
          if (p.getFileName.toString.endsWith(".parquet")) {
            Files.copy(p, tmp.resolve(f"batch1_$i%05d.parquet"))
            i += 1
          }
        }
      } finally list.close()
    } else Files.copy(src, tmp.resolve("batch1.parquet"))
  }

  /** Write `df` as a single parquet file at `target`. Multi-batch gates
    * get their batch boundaries from PROGRESSIVE DELIVERY (each file is
    * written only after the previous `processAllAvailable` commits), so
    * file mtimes — FileStreamSource's pending-file order — never decide
    * anything and the gates carry no wall-clock coupling.
    *
    * Staging happens in a SIBLING of the watched dir, never inside it:
    * `tmp` is the directory the gate's `readStream` globs with a
    * star-dot-parquet pattern, and a staging DIRECTORY named `_stage_X.parquet`
    * inside it matches that glob — the source's poll can then list the
    * part-file within during the write→move window and fail its next
    * getBatch with FileNotFound once the move takes the file away (the
    * leading underscore hides the dir from a batch read's file index, but
    * glob expansion matches it first). Only the atomic `Files.move`
    * endpoint may ever be visible under the glob. */
  private def writeOneFile(df: org.apache.spark.sql.DataFrame,
      tmp: java.nio.file.Path, target: String): Unit = {
    import java.nio.file.Files
    val scratch = tmp.resolveSibling(
      s"${tmp.getFileName}_stage_$target")
    df.coalesce(1).write.mode("overwrite").parquet(scratch.toString)
    val list = Files.list(scratch)
    val part = try list
      .filter(p => p.getFileName.toString.endsWith(".parquet"))
      .findFirst().get()
    finally list.close()
    Files.move(part, tmp.resolve(target))
    // the staging dir may sit OUTSIDE the gate's scratch root (when the
    // watched dir is the root itself), where freshDir never reclaims it
    val walk = Files.walk(scratch)
    try walk.sorted(java.util.Comparator.reverseOrder())
      .forEach(p => Files.delete(p))
    finally walk.close()
  }

  /** The reference's OBSERVED output semantics gated end-to-end: with its
    * cache buffering disabled (UniqueUsersApp.java:76, cache.max.bytes
    * .buffering=0; README.md:133–136 shows the resulting running counts)
    * the windowed count emits an updated intermediate count as records
    * arrive. Spark's analogue is UPDATE output mode: each window's count
    * is re-emitted in every micro-batch where it changed.
    *
    * Harness: events split into two micro-batches by user-id parity (even
    * users first — the odd file is written only after the even batch
    * commits, so delivery order is explicit, not mtime-derived),
    * update-mode flagship plan, memory sink
    * accumulating the whole changelog. The gate then checks the changelog
    * SHAPE, not just final state — per window:
    *   unique_users  = max emission  = the batch distinct count,
    *   first_emission = min emission = distinct evens (or the full count
    *                    for windows with no even user — single emission),
    *   n_emissions    = number of parity classes present in the window.
    * All three are computable by DuckDB from the raw table, so the
    * reference's running-count changelog is hash-checked, unlike r2 where
    * only spec-level coverage existed (VERDICT r2 "What's missing" #2). */
  private val streamingUpdateChangelog: Q = (s, dir) => {
    import java.nio.file.Paths
    val tmp = Paths.get(scratchPath("streaming_uu_update", dir))
    freshDir(tmp)
    val events = s.read.schema(eventsRawSchema).parquet(s"$dir/events.parquet")
    writeOneFile(events.filter(col("user_id") % 2 === 0), tmp,
      "batch1_even.parquet")
    val frames = s.readStream
      .schema(eventsRawSchema)
      .parquet(s"$tmp/*.parquet")
      .select(graft.model.Schemas.tsFromMicros(col("ts")).as("eventTime"),
        col("user_id").cast("string").as("uid"))
    val counts = UniqueUsersStream.uniquePerWindow(frames,
      window = "1 minute", watermark = None)
    val sink = s"streaming_uu_update_${runSeq.incrementAndGet()}"
    setStatePartitions(s, 4)
    locally {
      val q = counts.writeStream
        .format("memory").queryName(sink)
        .outputMode("update")
        .start()
      try {
        q.processAllAvailable() // batch 1: even users only
        writeOneFile(events.filter(col("user_id") % 2 =!= 0), tmp,
          "batch2_odd.parquet")
        q.processAllAvailable() // batch 2: odd users
        // the changelog-shape oracle below derives n_emissions from the
        // two parity classes arriving as exactly two data micro-batches
        // (progressive delivery). If a FileStreamSource batching change
        // ever merges or splits them, fail HERE, loudly, instead of
        // hash-mismatching obscurely at the driver compare.
        val dataBatches = q.recentProgress.count(_.numInputRows > 0)
        require(dataBatches == 2,
          s"changelog-shape oracle assumes exactly 2 data micro-batches " +
            s"(one per parity class), but the source delivered $dataBatches")
      } finally drainStop(q)
    }
    s.table(sink)
      .groupBy(col("window_start"))
      .agg(max(col("unique_users")).as("unique_users"),
        min(col("unique_users")).as("first_emission"),
        count(lit(1)).as("n_emissions"))
      .select(unix_timestamp(col("window_start")).as("minute"),
        col("unique_users"), col("first_emission"), col("n_emissions"))
  }

  private val streamingUpdateChangelogSql =
    """SELECT CAST(epoch(date_trunc('minute', ts)) AS BIGINT) AS minute,
      |       CAST(count(DISTINCT user_id) AS BIGINT) AS unique_users,
      |       CAST(CASE WHEN count(DISTINCT CASE WHEN user_id % 2 = 0 THEN user_id END) > 0
      |                 THEN count(DISTINCT CASE WHEN user_id % 2 = 0 THEN user_id END)
      |                 ELSE count(DISTINCT user_id) END AS BIGINT) AS first_emission,
      |       CAST((CASE WHEN count(DISTINCT CASE WHEN user_id % 2 = 0 THEN user_id END) > 0
      |              THEN 1 ELSE 0 END)
      |          + (CASE WHEN count(DISTINCT CASE WHEN user_id % 2 <> 0 THEN user_id END) > 0
      |              THEN 1 ELSE 0 END) AS BIGINT) AS n_emissions
      |FROM events GROUP BY 1""".stripMargin

  /** Append-mode gate harness: stream `events.parquet` from a scratch
    * dir, run `build(frames)` with a memory sink in APPEND mode, then
    * inject ONE far-future sentinel event (user_id/event_id = −1, event
    * time = real max + 1 day) as a second micro-batch — advancing the
    * watermark past every real window/session end so append mode emits
    * every final result. The standard "advance event time to flush"
    * pattern; callers filter the sentinel's own row back out.
    *
    * Scratch dir is keyed by (sfDir, pid) so two processes gating the
    * same sfDir concurrently can't delete each other's in-flight files,
    * and all directory walks/listings are closed (try/finally — Files
    * .walk/list hold an open directory handle until closed). */
  private def appendWithSentinelFlush(s: org.apache.spark.sql.SparkSession,
      dir: String, tag: String)(
      build: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    import java.nio.file.{Files, Paths}
    val tmp = Paths.get(scratchPath(tag, dir))
    freshDir(tmp)
    stageEventsAsBatch1(dir, tmp)
    val frames = s.readStream
      .schema(eventsRawSchema)
      .parquet(s"$tmp/*.parquet")
    val out = build(frames)
    val sink = s"${tag}_${runSeq.incrementAndGet()}"
    setStatePartitions(s, 4)
    locally {
      val q = out.writeStream
        .format("memory").queryName(sink)
        .outputMode("append")
        .start()
      try {
        q.processAllAvailable() // batch 1: all real events
        // batch 1 is the whole fixture regardless of layout (one file or
        // staged part files) — read the max event time from the source
        val maxUs = s.read.schema(eventsRawSchema)
          .parquet(s"$dir/events.parquet*")
          .agg(max(col("ts"))).head().getLong(0)
        val dayUs = 86400L * 1000000L
        val sentinel = new java.util.ArrayList[org.apache.spark.sql.Row]()
        sentinel.add(org.apache.spark.sql.Row(
          -1L, maxUs + dayUs, -1L, "sentinel", 0.0, null))
        writeOneFile(s.createDataFrame(sentinel, eventsRawSchema), tmp,
          "zz_batch2.parquet")
        q.processAllAvailable() // batch 2 + no-data flush batch
      } finally drainStop(q)
    }
    s.table(sink)
  }

  /** Session windows through a REAL streaming execution: the same
    * `Windowing.sessionStats` plan as the batch `session_window_stats`,
    * driven by a file stream with a watermark (session windows demand one
    * in streaming — it bounds the merge state — and only support APPEND
    * mode, which emits a session exactly when the watermark passes its
    * end). A session's end is its last event + gap, so the trailing
    * sessions can never close on real data alone; the sentinel flush
    * advances the watermark past every real session end. The final result
    * (sentinel filtered out) must equal the batch gaps-and-islands
    * oracle — streaming/batch parity for stateful session merging,
    * including watermark-driven finalization. */
  private val streamingSessions: Q = (s, dir) =>
    appendWithSentinelFlush(s, dir, "streaming_sessions") { raw =>
      val frames = raw
        .select(graft.model.Schemas.tsFromMicros(col("ts")).as("eventTime"),
          col("user_id"))
        .withWatermark("eventTime", "0 seconds")
      graft.operators.Windowing.sessionStats(
        frames, col("eventTime"), col("user_id"), "30 minutes")
    }.filter(col("key") >= 0)
      .select(col("key").as("user_id"),
        col("session_start"), col("session_end"), col("n_events"))

  /** The flagship pipeline in APPEND output mode — the reference's
    * *intended* semantics (one final count per closed window; its
    * `suppress(untilWindowCloses)` is commented out "Could not make it
    * work", UniqueUsersApp.java:119) gated end-to-end: watermarked
    * in-window dedup → windowed count, each window emitted exactly once
    * when the watermark passes its end, flushed by the sentinel batch.
    * Sentinel's own far-future window is dropped by the time filter; the
    * result must equal the same batch count_distinct oracle as the
    * complete-mode flagship. */
  private val streamingUniqueUsersAppend: Q = (s, dir) => {
    val counts = appendWithSentinelFlush(s, dir, "streaming_uu_append") { raw =>
      val frames = raw.select(
        graft.model.Schemas.tsFromMicros(col("ts")).as("eventTime"),
        col("user_id").cast("string").as("uid"))
      UniqueUsersStream.uniquePerWindow(frames,
        window = "1 minute", watermark = Some("1 minute"))
    }
    // defensive sentinel drop: every real window starts ≤ the real max
    // event time; the sentinel's window (a day later) can only start
    // after it. (With a 1-minute watermark the sentinel's own window
    // never closes, so it shouldn't be emitted at all — but the filter
    // keys on the DATA, not on that emission subtlety.)
    val maxUs = s.read.schema(eventsRawSchema)
      .parquet(s"$dir/events.parquet*")
      .agg(max(col("ts"))).head().getLong(0)
    counts.filter(unix_timestamp(col("window_start")) <=
        Math.floorDiv(maxUs, 1000000L))
      .select(unix_timestamp(col("window_start")).as("minute"),
        col("unique_users"))
  }

  /** The reference's debug store dump (DeduplicateValueTransformer
    * .java:58–68 — `fetchAll` + print of every (window, uid) in the
    * WindowStore), re-expressed on the engine-native surface: Spark 4's
    * state data source reads a streaming checkpoint's state stores as
    * DataFrames. The flagship runs with a real checkpoint; the gate then
    * reads BOTH stateful operators — the windowed-count aggregate
    * (operator 0: key = window, value = running count) and the dedup
    * store (operator 1: key = (window, uid), the exact analogue of the
    * reference's store) — and cross-checks them: per window, the agg
    * state's count AND the number of dedup state keys must both equal
    * the batch distinct count. Unlike the reference's hard-coded epoch
    * range (couples the dump to its 2016 sample), this reads whatever
    * the checkpoint holds. */
  private val stateStoreDump: Q = (s, dir) => {
    import java.nio.file.Paths
    val ckpt = Paths.get(scratchPath("state_dump", dir))
    freshDir(ckpt)
    val frames = s.readStream
      .schema(eventsRawSchema)
      .parquet(s"$dir/events.parquet*")
      .select(graft.model.Schemas.tsFromMicros(col("ts")).as("eventTime"),
        col("user_id").cast("string").as("uid"))
    val counts = UniqueUsersStream.uniquePerWindow(frames,
      window = "1 minute", watermark = None)
    val sink = s"state_dump_${runSeq.incrementAndGet()}"
    setStatePartitions(s, 4)
    locally {
      val q = counts.writeStream
        .format("memory").queryName(sink)
        .option("checkpointLocation", ckpt.toString)
        .outputMode("complete")
        .start()
      try q.processAllAvailable() finally drainStop(q)
    }
    val agg = s.read.format("statestore")
      .option("operatorId", 0).load(ckpt.toString)
      .select(unix_timestamp(col("key.w.start")).as("minute"),
        col("value.count").as("unique_users"))
    val ded = s.read.format("statestore")
      .option("operatorId", 1).load(ckpt.toString)
      .groupBy(unix_timestamp(col("key.w.start")).as("minute"))
      .agg(count(lit(1)).as("uid_state_rows"))
    agg.join(ded, Seq("minute"))
  }

  private val stateStoreDumpSql =
    """SELECT CAST(epoch(date_trunc('minute', ts)) AS BIGINT) AS minute,
      |       CAST(count(DISTINCT user_id) AS BIGINT) AS unique_users,
      |       CAST(count(DISTINCT user_id) AS BIGINT) AS uid_state_rows
      |FROM events GROUP BY 1""".stripMargin

  /** Stream-stream attribution join in the gate: views joined to
    * purchases of the same user within a 60-minute lookback, both sides
    * REAL file streams with watermarks and a time-bounded predicate (the
    * bound is what makes both sides' state evictable — SURVEY §2.3
    * stream-stream joins). Inner joins emit on match, so one micro-batch
    * suffices; the result must equal the batch self-join oracle. */
  private val streamingStreamJoin: Q = (s, dir) => {
    def side(tp: String) = s.readStream
      .schema(eventsRawSchema)
      .parquet(s"$dir/events.parquet*")
      .filter(col("event_type") === tp)
      .select(col("user_id").as("key"),
        graft.model.Schemas.tsFromMicros(col("ts")).as("t"),
        col("event_id").as("id"))
    val joined = graft.streaming.StreamJoins.withinLookback(
      side("view"), side("purchase"),
      watermark = "0 seconds", lookback = "60 minutes")
    val sink = s"streaming_stream_join_${runSeq.incrementAndGet()}"
    setStatePartitions(s, 4)
    locally {
      val q = joined.writeStream
        .format("memory").queryName(sink)
        .outputMode("append")
        .start()
      try q.processAllAvailable() finally drainStop(q)
    }
    s.table(sink).select(col("key").as("user_id"),
      col("left_id").as("view_id"), col("right_id").as("purchase_id"),
      unix_timestamp(col("left_t")).as("view_ts"),
      unix_timestamp(col("right_t")).as("purchase_ts"))
  }

  // µs-truncated comparisons mirror Spark's TimestampType precision
  // (DuckDB reads the parquet ns timestamps losslessly)
  private val streamingStreamJoinSql =
    """WITH v AS (SELECT user_id, event_id, date_trunc('microseconds', ts) AS ts
      |           FROM events WHERE event_type = 'view'),
      |p AS (SELECT user_id, event_id, date_trunc('microseconds', ts) AS ts
      |      FROM events WHERE event_type = 'purchase')
      |SELECT v.user_id, v.event_id AS view_id, p.event_id AS purchase_id,
      |       CAST(epoch(date_trunc('second', v.ts)) AS BIGINT) AS view_ts,
      |       CAST(epoch(date_trunc('second', p.ts)) AS BIGINT) AS purchase_ts
      |FROM v JOIN p ON v.user_id = p.user_id
      | AND v.ts <= p.ts AND v.ts >= p.ts - INTERVAL 60 MINUTE""".stripMargin

  /** LEFT OUTER stream-stream join — the semantics the inner gate can't
    * show: a view whose 60-minute match window closes unmatched is
    * emitted ONCE with null purchase columns when the purchase-side
    * watermark passes view_ts + 60 min (state-expiry null padding, the
    * streaming analogue of batch LEFT JOIN). Harness: real events first;
    * then one far-future sentinel row PER SIDE (event_type 'sentinel'
    * passes both side filters) advances both watermarks a day past the
    * data, expiring every pending view so all null rows flush; sentinel
    * keys are negative and filtered from the result. Oracle: the same
    * batch LEFT JOIN — matched multiplicity and null padding must agree
    * row-for-row. */
  private val streamingOuterJoin: Q = (s, dir) => {
    import java.nio.file.{Files, Paths}
    val tmp = Paths.get(scratchPath("souter", dir))
    freshDir(tmp)
    stageEventsAsBatch1(dir, tmp)
    def side(tp: String) = s.readStream
      .schema(eventsRawSchema)
      .parquet(s"$tmp/*.parquet")
      .filter(col("event_type").isin(tp, "sentinel"))
      .select(col("user_id").as("key"),
        graft.model.Schemas.tsFromMicros(col("ts")).as("t"),
        col("event_id").as("id"))
    val joined = graft.streaming.StreamJoins.withinLookback(
      side("view"), side("purchase"),
      watermark = "0 seconds", lookback = "60 minutes",
      joinType = "left_outer")
    val sink = s"streaming_outer_join_${runSeq.incrementAndGet()}"
    setStatePartitions(s, 4)
    locally {
      val q = joined.writeStream
        .format("memory").queryName(sink)
        .outputMode("append")
        .start()
      try {
        q.processAllAvailable() // batch 1: all real events
        val maxUs = s.read.schema(eventsRawSchema)
          .parquet(s"$dir/events.parquet")
          .agg(max(col("ts"))).head().getLong(0)
        val farUs = maxUs + 86400L * 1000000L
        val sent = new java.util.ArrayList[org.apache.spark.sql.Row]()
        sent.add(org.apache.spark.sql.Row(-1L, farUs, -1L, "sentinel", 0.0, null))
        sent.add(org.apache.spark.sql.Row(-2L, farUs, -2L, "sentinel", 0.0, null))
        writeOneFile(s.createDataFrame(sent, eventsRawSchema), tmp,
          "zz_sentinel.parquet")
        q.processAllAvailable() // sentinel batch + expiry-flush batch
      } finally drainStop(q)
    }
    s.table(sink).filter(col("key") >= 0)
      .select(col("key").as("user_id"),
        col("left_id").as("view_id"), col("right_id").as("purchase_id"),
        unix_timestamp(col("left_t")).as("view_ts"),
        unix_timestamp(col("right_t")).as("purchase_ts"))
  }

  private val streamingOuterJoinSql =
    """WITH v AS (SELECT user_id, event_id, date_trunc('microseconds', ts) AS ts
      |           FROM events WHERE event_type = 'view'),
      |p AS (SELECT user_id, event_id, date_trunc('microseconds', ts) AS ts
      |      FROM events WHERE event_type = 'purchase')
      |SELECT v.user_id, v.event_id AS view_id, p.event_id AS purchase_id,
      |       CAST(epoch(date_trunc('second', v.ts)) AS BIGINT) AS view_ts,
      |       CAST(epoch(date_trunc('second', p.ts)) AS BIGINT) AS purchase_ts
      |FROM v LEFT JOIN p ON v.user_id = p.user_id
      | AND v.ts <= p.ts AND v.ts >= p.ts - INTERVAL 60 MINUTE""".stripMargin

  /** The WATERMARK LATE-DATA POLICY made oracle-visible — the policy the
    * reference gets wrong (README.md:196 admits late frames land in
    * wrong windows; its extractor assigns malformed keys to the epoch
    * window). Harness: events split by minute — everything from the
    * 11th minute on is delivered first, and only after that batch (and
    * its watermark-commit no-data batch) completes is the first-ten-
    * minutes file written, so the late rows arrive under a watermark at
    * (global max event time − 1 min), thousands of minutes past their
    * windows, and the windowed aggregate must DROP every one. A final
    * far-future sentinel flushes append mode. Oracle: the batch
    * aggregate EXCLUDING the first ten minutes — a late row leaking in
    * (or a late-window resurrection) is a hash mismatch.
    *
    * The progressive delivery is essential, not convenience: late-record
    * filtering in a stateful operator uses the watermark ONE BATCH
    * BEHIND eviction (`eventTimeWatermarkForLateEvents`, the Spark 3.4+
    * chained-stateful-operator contract), so a late file processed
    * back-to-back after the on-time batch would still see wm = 0 and be
    * admitted — measured exactly that with pre-written files. */
  private val streamingLateDataDrop: Q = (s, dir) => {
    import java.nio.file.Paths
    val tmp = Paths.get(scratchPath("streaming_late_drop", dir))
    freshDir(tmp)
    val events = s.read.schema(eventsRawSchema).parquet(s"$dir/events.parquet")
    // minute-truncated epoch seconds of the raw epoch-micros ts column
    val minuteCol = unix_timestamp(date_trunc("minute",
      graft.model.Schemas.tsFromMicros(col("ts"))))
    val bounds = events.agg(
      min(minuteCol).as("m0"), max(col("ts")).as("maxUs")).head()
    val (m0, maxUs) = (bounds.getLong(0), bounds.getLong(1))
    writeOneFile(events.filter(minuteCol >= m0 + 600), tmp,
      "batch1_ontime.parquet")
    val frames = s.readStream
      .schema(eventsRawSchema)
      .parquet(s"$tmp/*.parquet")
      .select(graft.model.Schemas.tsFromMicros(col("ts")).as("eventTime"),
        col("user_id").cast("string").as("uid"))
    val counts = UniqueUsersStream.uniquePerWindow(frames,
      window = "1 minute", watermark = Some("1 minute"))
    val sink = s"streaming_late_drop_${runSeq.incrementAndGet()}"
    setStatePartitions(s, 4)
    locally {
      val q = counts.writeStream
        .format("memory").queryName(sink)
        .outputMode("append")
        .start()
      try {
        q.processAllAvailable() // on-time batch + watermark-commit batch
        writeOneFile(events.filter(minuteCol < m0 + 600), tmp,
          "batch2_late.parquet")
        q.processAllAvailable() // late batch: every row behind the watermark
        val sentinel = new java.util.ArrayList[org.apache.spark.sql.Row]()
        sentinel.add(org.apache.spark.sql.Row(
          -1L, maxUs + 86400L * 1000000L, -1L, "sentinel", 0.0, null))
        writeOneFile(s.createDataFrame(sentinel, eventsRawSchema), tmp,
          "zz_batch3_sentinel.parquet")
        q.processAllAvailable() // flush every real window
      } finally drainStop(q)
    }
    s.table(sink)
      .filter(unix_timestamp(col("window_start")) <=
        Math.floorDiv(maxUs, 1000000L)) // sentinel's own window out
      .select(unix_timestamp(col("window_start")).as("minute"),
        col("unique_users"))
  }

  private val streamingLateDataDropSql =
    """WITH m0 AS (SELECT CAST(epoch(date_trunc('minute', min(ts))) AS BIGINT) AS m
      |            FROM events)
      |SELECT CAST(epoch(date_trunc('minute', ts)) AS BIGINT) AS minute,
      |       CAST(count(DISTINCT user_id) AS BIGINT) AS unique_users
      |FROM events, m0
      |WHERE epoch(date_trunc('minute', ts)) >= m0.m + 600
      |GROUP BY 1""".stripMargin

  /** The reference's SINK EDGE (§2.1 #14–15): counts → (key, value)
    * Kafka records — key = window-start epoch seconds as STRING (the
    * reference's key shape, UniqueUsersApp.java:125–130), value = the
    * JSON metric (README.md:194 "Produce the metrics as json"). The
    * exact wire text is the contract, so the oracle rebuilds the same
    * strings character-for-character (to_json emits no whitespace,
    * struct field order). Only the broker handoff itself stays
    * environment-bound (no broker in the sandbox); the record
    * construction is now hash-gated. */
  private val kafkaSinkProjection: Q = (s, dir) => {
    val counts = s.read.schema(eventsRawSchema).parquet(s"$dir/events.parquet")
      .select(graft.model.Schemas.tsFromMicros(col("ts")).as("eventTime"),
        col("user_id").cast("string").as("uid"))
      .groupBy(window(col("eventTime"), "1 minute").as("w"))
      .agg(count_distinct(col("uid")).as("unique_users"))
      .select(col("w.start").as("window_start"), col("w.end").as("window_end"),
        col("unique_users"))
    UniqueUsersStream.toKafkaRecords(counts)
  }

  private val kafkaSinkProjectionSql =
    """SELECT CAST(CAST(epoch(date_trunc('minute', ts)) AS BIGINT) AS VARCHAR) AS key,
      |       '{"windowStart":' || CAST(epoch(date_trunc('minute', ts)) AS BIGINT)
      |         || ',"uniqueUsers":' || CAST(count(DISTINCT user_id) AS BIGINT)
      |         || '}' AS value
      |FROM events GROUP BY date_trunc('minute', ts)""".stripMargin

  /** `dropDuplicatesWithinWatermark` gated end-to-end — the canonical
    * Spark translation of the reference's dedup store (SURVEY §2.1 #7:
    * DeduplicateValueTransformer keeps a key in a windowed store and
    * drops re-deliveries while it lives). Harness: the full event set
    * arrives as micro-batch 1, then every third event is RE-DELIVERED in
    * a later micro-batch (at-least-once source semantics — the redelivery
    * file is written only after batch 1 commits, so the batch split is
    * delivery-ordered, not mtime-derived). The re-deliveries land within the
    * watermark (2-day delay ≫ the data's time span), so the operator
    * must drop every one of them: the appended output equals the batch
    * per-minute aggregate of the ORIGINAL set — event counts prove no
    * duplicate survived, distinct-user counts prove no original was lost
    * (event_id is unique in the source, making the oracle exact). */
  private val streamingDedupWithinWatermark: Q = (s, dir) => {
    import java.nio.file.Paths
    val tmp = Paths.get(scratchPath("streaming_ddww", dir))
    freshDir(tmp)
    val events = s.read.schema(eventsRawSchema).parquet(s"$dir/events.parquet")
    writeOneFile(events, tmp, "batch1_all.parquet")
    val deduped = s.readStream
      .schema(eventsRawSchema)
      .parquet(s"$tmp/*.parquet")
      .select(graft.model.Schemas.tsFromMicros(col("ts")).as("eventTime"),
        col("event_id"), col("user_id"))
      .withWatermark("eventTime", "2 days")
      .dropDuplicatesWithinWatermark("event_id")
    // FILE sink, not memory: append-mode dedup emits every surviving row,
    // so a memory sink is a DRIVER-scale relation — at the 1000× decade
    // (100 M events) one task's serialized result hit 1.68 GiB and killed
    // the query on spark.driver.maxResultSize. The parquet sink keeps the
    // deduped stream distributed; the verification aggregate then reads
    // the sink files batch-side. (Found by the r14 1000× campaign — the
    // operator was fine, the harness wasn't.)
    val sinkDir = Paths.get(scratchPath("streaming_ddww_sink", dir))
    val ckpt = Paths.get(scratchPath("streaming_ddww_ckpt", dir))
    freshDir(sinkDir)
    freshDir(ckpt)
    setStatePartitions(s, 4)
    locally {
      val q = deduped.writeStream
        .format("parquet")
        .option("path", sinkDir.toString)
        .option("checkpointLocation", ckpt.toString)
        .outputMode("append")
        .start()
      try {
        q.processAllAvailable() // batch 1: the full original event set
        writeOneFile(events.filter(col("event_id") % 3 === 0), tmp,
          "batch2_redelivered.parquet")
        q.processAllAvailable() // batch 2: the re-deliveries, all dropped
        // the gate only proves cross-batch dedup if the re-delivery
        // really arrived as a SECOND data micro-batch — fail loudly on
        // source-batching drift rather than silently testing less
        val dataBatches = q.recentProgress.count(_.numInputRows > 0)
        require(dataBatches == 2,
          s"redelivery must arrive as its own micro-batch " +
            s"(expected 2 data batches, source delivered $dataBatches)")
      } finally drainStop(q)
    }
    s.read.parquet(sinkDir.toString)
      .groupBy(unix_timestamp(date_trunc("minute", col("eventTime"))).as("minute"))
      .agg(count(lit(1)).as("n_events"),
        count_distinct(col("user_id")).as("n_users"))
  }

  private val streamingDedupWithinWatermarkSql =
    """SELECT CAST(epoch(date_trunc('minute', ts)) AS BIGINT) AS minute,
      |       CAST(count(*) AS BIGINT) AS n_events,
      |       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
      |FROM events GROUP BY 1""".stripMargin

  // every gate session-isolated at the registry edge (see `isolated`)
  /** Streaming NEAR-duplicate dedup — the dedup library composed with the
    * streaming layer, the operator a streaming ingestion pipeline
    * actually runs: per-document MinHash band keys computed IN-STREAM by
    * the row-local codegen kernels (WordShingleHashes →
    * MinHashBandKeys — zero shuffle, zero state of their own), then
    * `dropDuplicatesWithinWatermark` on the first LSH band key, so any
    * document near-duplicating one seen within the watermark is dropped
    * while the state stays bounded (watermark-evicted). Single-band LSH
    * dedup is the aggressive streaming policy: docs agreeing on band 0
    * (4 of 16 min-hashes) are treated as duplicates.
    *
    * Harness (doc-level deterministic by construction):
    *  - batch 1 = the CANONICAL originals — one doc (min doc_id) per
    *    band key; the fixture contains natural band collisions (real
    *    near-dups), and which of an INTRA-batch colliding set survives
    *    `dropDuplicates` is arrival-order-dependent, so the canonical
    *    selection happens in the (deterministic, oracle-replayed) batch
    *    prep instead — exactly the pre-deduped-history + new-arrivals
    *    shape a production stream has;
    *  - batch 2 (delivered only after batch 1 commits) = every 3rd
    *    original re-ingested as a NEAR-dup: new id (+1e6), text
    *    perturbed by an appended token. Most collide with batch-1 state
    *    on band 0 and must be dropped; the perturbation occasionally
    *    shifts band 0, and those genuinely-new keys must be KEPT — the
    *    oracle recomputes which is which. Batch 2 gets the same
    *    canonical-per-key prep as batch 1 (min doc_id per band key):
    *    planted keys COLLIDE at scale (9/17001 on the 100× corpus) and
    *    an undeduped batch would make the in-stream survivor
    *    arrival-order-dependent (doc-level determinism).
    * Oracle: the same shingle→minhash→band-0 pipeline as CTEs over the
    * union corpus (the minhash_lsh_pairs arithmetic-band-key contract).
    * Output: every kept (doc_id, band_key) — 478 + 16 rows at sf0.01. */
  /** Row-local codegen'd shingle hashes / first-LSH-band key — the
    * in-stream near-dedup kernels, shared by `streaming_near_dedup` and
    * `pipeline_streaming_ingest`. */
  private def hsOf(text: org.apache.spark.sql.Column) = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
    column(graft.functions.WordShingleHashes(expression(text), NdShingleN))
  }
  private def bandKeyOf(hs: org.apache.spark.sql.Column) = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
    import graft.operators.DedupOps
    element_at(
      column(graft.functions.MinHashBandKeys(expression(hs),
        (0 until NdNumHashes).map(DedupOps.mhA),
        (0 until NdNumHashes).map(DedupOps.mhB),
        DedupOps.MinHashP, NdBands,
        graft.functions.TextFunctions.NGramHashB,
        graft.functions.TextFunctions.NGramHashP)), 1)
  }

  private val streamingNearDedup: Q = (s, dir) => {
    import java.nio.file.Paths
    val tmp = Paths.get(scratchPath("streaming_near_dedup", dir))
    freshDir(tmp)
    val docs = graft.sources.Tables.documents(s, dir)
      .select(col("doc_id"), col("text"))
    val withKey = docs
      .withColumn("hs", hsOf(col("text")))
      .filter(size(col("hs")) > 0)
      .withColumn("band_key", bandKeyOf(col("hs")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("band_key")).orderBy(col("doc_id"))
    val canon = withKey.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).select(col("doc_id"), col("text"))
    writeOneFile(canon, tmp, "batch1_canonical.parquet")
    // doc-level determinism: two planted docs sharing one band key would
    // make the in-stream survivor arrival-order-dependent, so batch 2
    // gets the SAME canonical-per-key prep as batch 1 (min doc_id per
    // key, deterministic and oracle-replayed). The r11 form instead
    // REQUIRED planted new keys to be unique — true at gate SFs, but 9
    // of 17001 planted keys collided on the 100× corpus (birthday
    // pressure on band-0 keys over the low-entropy fixture vocabulary)
    // and the gate refused to run; intra-batch collisions are prep
    // concerns, not the cross-batch state semantics under test.
    val plant = docs.filter(col("doc_id") % 3 === 0)
      .select((col("doc_id") + NdPlantOffset).as("doc_id"),
        concat(col("text"), lit(NdPerturb)).as("text"))
      .withColumn("hs", hsOf(col("text")))
      .filter(size(col("hs")) > 0)
      .withColumn("band_key", bandKeyOf(col("hs")))
      .withColumn("rn", row_number().over(org.apache.spark.sql.expressions
        .Window.partitionBy(col("band_key")).orderBy(col("doc_id"))))
      .filter(col("rn") === 1).select(col("doc_id"), col("text"))
    val docSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val deduped = s.readStream
      .schema(docSchema)
      .parquet(s"$tmp/*.parquet")
      .withColumn("hs", hsOf(col("text")))
      .filter(size(col("hs")) > 0)
      .withColumn("band_key", bandKeyOf(col("hs")))
      // deterministic event time from the doc id; a planted doc (+1e6)
      // shares its original's event time, so redeliveries are never late.
      // +3 days keeps doc 0 off the epoch-0 boundary — the initial
      // watermark is 0, and an event AT the watermark is filtered as
      // late by the stateful-op late-record check (observed: doc 0
      // silently dropped without the offset)
      .withColumn("eventTime",
        timestamp_micros((col("doc_id") % NdPlantOffset + 259200L) * 1000000L))
      .withWatermark("eventTime", "2 days")
      .dropDuplicatesWithinWatermark("band_key")
      .select(col("doc_id"), col("band_key"))
    val sink = s"streaming_near_dedup_${runSeq.incrementAndGet()}"
    setStatePartitions(s, 4)
    locally {
      val q = deduped.writeStream
        .format("memory").queryName(sink)
        .outputMode("append")
        .start()
      try {
        q.processAllAvailable() // batch 1: canonical originals, all kept
        writeOneFile(plant, tmp, "batch2_neardups.parquet")
        q.processAllAvailable() // batch 2: near-dups dropped, new keys kept
        val dataBatches = q.recentProgress.count(_.numInputRows > 0)
        require(dataBatches == 2,
          s"near-dups must arrive as their own micro-batch " +
            s"(expected 2 data batches, source delivered $dataBatches)")
      } finally drainStop(q)
    }
    s.table(sink)
  }

  private val NdShingleN = 3
  private val NdNumHashes = 16
  private val NdBands = 4
  private val NdPlantOffset = 1000000L
  private val NdPerturb = " graftdup"

  private lazy val streamingNearDedupSql = {
    import graft.operators.DedupOps
    val rowsPerBand = NdNumHashes / NdBands
    val mins = (0 until rowsPerBand).map(i =>
      s"min((${DedupOps.mhA(i)} * g + ${DedupOps.mhB(i)}) % ${DedupOps.MinHashP}) AS mh$i")
      .mkString(",\n      |       ").stripMargin
    // band-0 arithmetic fold — the MinHashBandKeys contract, identical
    // to minhash_lsh_pairs' arithBandKeys oracle form
    import graft.functions.TextFunctions.{NGramHashB => FB, NGramHashP => FP}
    val fold = (0 until rowsPerBand).foldLeft("CAST(0 AS BIGINT)")(
      (acc, i) => s"((($acc) * $FB + mh$i) % $FP)")
    s"""WITH docs2 AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + $NdPlantOffset, text || '$NdPerturb' FROM documents
      |  WHERE doc_id % 3 = 0),
      |toks AS (SELECT doc_id, str_split(text,' ') AS ws FROM docs2),
      |tok AS (SELECT doc_id, w, i FROM
      |        (SELECT doc_id, unnest(ws) AS w, generate_subscripts(ws,1) AS i FROM toks)
      |        WHERE w <> ''),
      |sh AS (SELECT doc_id,
      |              w || '_' || lead(w,1) OVER win || '_' || lead(w,2) OVER win AS g
      |       FROM tok WINDOW win AS (PARTITION BY doc_id ORDER BY i)),
      |dt AS MATERIALIZED (SELECT DISTINCT doc_id,
      |              CAST(('0x' || substring(md5(g), 1, 10)) AS BIGINT) AS g
      |       FROM sh WHERE g IS NOT NULL),
      |sig AS MATERIALIZED (SELECT doc_id, $mins
      |        FROM dt GROUP BY doc_id),
      |key0 AS (SELECT doc_id, $fold AS band_key FROM sig),
      |-- originals classified by MEMBERSHIP in documents, not by an id
      |-- threshold: scaled corpora (ScaleGen) shift replica doc ids far
      |-- past the +$NdPlantOffset plant offset, so an id comparison
      |-- silently misclassifies replica originals as planted (found by
      |-- the 10x full-registry oracle run)
      |orig AS (SELECT * FROM key0
      |         WHERE doc_id IN (SELECT doc_id FROM documents)),
      |orig_canon AS (SELECT min(doc_id) AS doc_id, band_key
      |               FROM orig GROUP BY band_key),
      |plant AS (SELECT * FROM key0
      |          WHERE doc_id NOT IN (SELECT doc_id FROM documents))
      |SELECT CAST(doc_id AS BIGINT) AS doc_id,
      |       CAST(band_key AS BIGINT) AS band_key
      |FROM orig_canon
      |UNION ALL
      |-- min per key, mirroring the batch-2 canonical prep: planted
      |-- band keys collide at scale (9/17001 at 100×)
      |SELECT CAST(min(doc_id) AS BIGINT) AS doc_id,
      |       CAST(band_key AS BIGINT) AS band_key
      |FROM plant
      |WHERE band_key NOT IN (SELECT band_key FROM orig_canon)
      |GROUP BY band_key""".stripMargin
  }

  // ── stream-static enrichment join ──────────────────────────────────────
  // The most common production streaming pattern: a stream joined against
  // a STATIC dimension (here a literal event-type → category/weight dim,
  // broadcast — re-evaluated per micro-batch, no state store involved),
  // then a running aggregate per enriched category. The weighted sum uses
  // the order-free fixed-point convention (value rounded to 1e-4 longs
  // before the weight multiply and sum), so complete-mode re-emission and
  // the batch oracle agree bit-for-bit — the parity statement: streaming
  // enrichment ≡ the same join in batch.
  private val streamingStaticJoin: Q = (s, dir) => {
    val dim = {
      import s.implicits._
      Seq(("view", "engagement", 1L), ("click", "engagement", 2L),
        ("signup", "conversion", 10L), ("purchase", "conversion", 25L),
        ("error", "ops", 0L)).toDF("event_type", "category", "weight")
    }
    val stream = s.readStream.schema(eventsRawSchema)
      .parquet(s"$dir/events.parquet*")
      .select(col("event_type"), col("user_id"), col("value"))
    val agg = stream.join(broadcast(dim), "event_type")
      .groupBy(col("category"))
      .agg(count(lit(1)).as("n_events"),
        (sum(round(col("value") * lit(1e4)).cast("long") * col("weight")) /
          lit(1e4)).as("weighted_value"))
    val sink = s"streaming_static_join_${runSeq.incrementAndGet()}"
    setStatePartitions(s, 4)
    locally {
      val q = agg.writeStream
        .format("memory").queryName(sink)
        .outputMode("complete")
        .start()
      try q.processAllAvailable() finally drainStop(q)
    }
    s.table(sink).select(col("category"), col("n_events"), col("weighted_value"))
  }

  private val streamingStaticJoinSql =
    """WITH dim(event_type, category, weight) AS (VALUES
      |  ('view', 'engagement', 1), ('click', 'engagement', 2),
      |  ('signup', 'conversion', 10), ('purchase', 'conversion', 25),
      |  ('error', 'ops', 0))
      |SELECT d.category,
      |       CAST(count(*) AS BIGINT) AS n_events,
      |       CAST(SUM(CAST(round(e.value*10000.0) AS BIGINT) * d.weight) AS BIGINT)
      |         / 10000.0 AS weighted_value
      |FROM events e JOIN dim d USING (event_type)
      |GROUP BY 1""".stripMargin

  /** foreachBatch idempotent upsert sink — the production "MERGE INTO
    * keyed table" pattern (the Delta-merge shape without a table format):
    * each micro-batch reduces to its latest row per key, merges into the
    * persisted state table keeping the (ts, event_id)-max row per key,
    * and writes the result to a NEW versioned directory — a reader never
    * observes a half-written table, and replaying batch k deterministically
    * rewrites v_k from v_{k-1} (idempotent recovery, the reason production
    * sinks version or MERGE rather than append). Two micro-batches split
    * at the timeline midpoint (progressive delivery — the second batch
    * UPDATES most keys, not just inserts). Scale shape: per-batch work is
    * batch-sized + one key-cardinality window over the state table; at
    * cluster scale the same code targets a partitioned table where only
    * touched partitions rewrite. Final table ≡ the batch
    * last-event-per-user query — the parity statement (same oracle). */
  private val streamingUpsertSink: Q = (s, dir) => {
    import java.nio.file.{Files, Paths}
    val tmp = Paths.get(scratchPath("upsert", dir))
    freshDir(tmp)
    val in = tmp.resolve("in"); Files.createDirectories(in)
    val evAll = s.read.schema(eventsRawSchema)
      .parquet(s"$dir/events.parquet")
      .select(col("user_id"), col("event_id"), col("ts"))
    // `div` (integer division), not `/`: Spark's `/` on longs is DOUBLE
    // division, which only matched the oracle's integer `//` because
    // epoch-µs values happen to be exactly double-representable
    val bounds = evAll.agg(
      expr("min(ts) + (max(ts) - min(ts)) div 2")
        .cast("long").as("t1")).head()
    val t1 = bounds.getLong(0)

    val merges = new AtomicInteger(0)
    var current: Option[String] = None
    val frames = s.readStream.schema(
        StructType(graft.model.Schemas.eventsRawMicros.fields.filter(f =>
          Seq("user_id", "event_id", "ts").contains(f.name))))
      .parquet(s"$in/*.parquet")
    setStatePartitions(s, 4)
    val q = frames.writeStream.outputMode("append")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        if (!df.isEmpty) {
          val batchLatest = graft.streaming.UpsertSink.mergeLatest(
            None, df, "user_id", "ts", "event_id")
          val merged = graft.streaming.UpsertSink.mergeLatest(
            current.map(s.read.parquet(_)), batchLatest,
            "user_id", "ts", "event_id")
          val out = tmp.resolve(s"state_v$id").toString
          merged.write.mode("overwrite").parquet(out)
          current = Some(out)
          merges.incrementAndGet()
          ()
        }
      }
      .start()
    try {
      writeOneFile(evAll.filter(col("ts") <= t1), in, "batch1.parquet")
      q.processAllAvailable()
      writeOneFile(evAll.filter(col("ts") > t1), in, "batch2.parquet")
      q.processAllAvailable()
    } finally drainStop(q)
    require(merges.get() == 2,
      s"upsert gate expected exactly 2 merged batches, saw ${merges.get()}")
    s.read.parquet(current.get).select(
      col("user_id"), col("event_id").as("last_event_id"),
      expr("ts div 1000000").as("last_ts"))
  }

  /** Streaming CDC apply — `streaming_upsert_sink`'s changelog-consuming
    * counterpart with DELETE TOMBSTONES, and the streaming half of the
    * batch `cdc_apply` gate: it runs the SAME DuckDB oracle verbatim, so
    * the parity statement is "a changelog consumed incrementally through
    * the versioned sink lands on exactly the state the one-shot batch
    * apply computes".
    *
    * Shape: the base snapshot (latest row ≤ the integer-µs midpoint per
    * key, via the same `mergeLatest` algebra) seeds state v0; the
    * post-midpoint changelog — `error` events as `'D'` tombstones,
    * everything else `'U'` — arrives in TWO micro-batches split at the
    * 3/4 point; a THIRD micro-batch replays the second verbatim. The
    * oracle passing therefore proves replay idempotence live, and
    * tombstone RETENTION (UpsertSink.readView scaladoc) is what makes
    * that safe: merge keeps `'D'` rows as state so no stale upsert can
    * outrank a deletion; readers drop them at view time. Scale shape:
    * per batch one window over (batch ∪ state-candidates) on the key —
    * cost ∝ batch + touched keys, exactly `cdc_apply`'s claim, paid
    * incrementally. */
  private val streamingCdcUpsert: Q = (s, dir) => {
    import java.nio.file.{Files, Paths}
    val tmp = Paths.get(scratchPath("cdc_upsert", dir))
    freshDir(tmp)
    val in = tmp.resolve("in"); Files.createDirectories(in)
    val evAll = s.read.schema(eventsRawSchema)
      .parquet(s"$dir/events.parquet")
      .select(col("user_id"), col("event_id"), col("ts"),
        col("event_type").as("state"),
        round(col("value") * 100).cast("long").as("value_fp"))
    // one bounds pass: t2 derives from (t1, max) arithmetically, so the
    // second full scan + head() job the old two-agg form paid is free
    val bounds = evAll.agg(min(col("ts")).as("mn"), max(col("ts")).as("mx"))
      .head()
    val (mnUs, mxUs) = (bounds.getLong(0), bounds.getLong(1))
    val t1 = mnUs + (mxUs - mnUs) / 2
    val t2 = t1 + (mxUs - t1) / 2

    val v0 = graft.streaming.UpsertSink.mergeLatest(
        None, evAll.filter(col("ts") <= t1), "user_id", "ts", "event_id")
      .withColumn("op", lit("U"))
    v0.write.mode("overwrite").parquet(tmp.resolve("state_v0").toString)
    var current = tmp.resolve("state_v0").toString

    val changelog = evAll.filter(col("ts") > t1)
      .withColumn("op",
        when(col("state") === "error", "D").otherwise("U"))
    val merges = new AtomicInteger(0)
    val chgSchema = StructType(Seq(
      StructField("user_id", LongType), StructField("event_id", LongType),
      StructField("ts", LongType), StructField("state", StringType),
      StructField("value_fp", LongType), StructField("op", StringType)))
    val frames = s.readStream.schema(chgSchema).parquet(s"$in/*.parquet")
    setStatePartitions(s, 4)
    val q = frames.writeStream.outputMode("append")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        if (!df.isEmpty) {
          val batchLatest = graft.streaming.UpsertSink.mergeLatest(
            None, df, "user_id", "ts", "event_id")
          val merged = graft.streaming.UpsertSink.mergeLatest(
            Some(s.read.parquet(current)), batchLatest,
            "user_id", "ts", "event_id")
          val out = tmp.resolve(s"state_v${id + 1}").toString
          merged.write.mode("overwrite").parquet(out)
          current = out
          merges.incrementAndGet()
          ()
        }
      }
      .start()
    try {
      writeOneFile(changelog.filter(col("ts") <= t2), in, "batch1.parquet")
      q.processAllAvailable()
      val tail = changelog.filter(col("ts") > t2)
      writeOneFile(tail, in, "batch2.parquet")
      q.processAllAvailable()
      writeOneFile(tail, in, "batch3_replay.parquet") // replay, verbatim
      q.processAllAvailable()
    } finally drainStop(q)
    require(merges.get() == 3,
      s"cdc gate expected 3 merged batches (2 + 1 replay), saw ${merges.get()}")
    graft.streaming.UpsertSink.readView(s.read.parquet(current))
      .select(col("user_id"), col("state"), col("value_fp"))
  }

  /** The full streaming INGESTION path as ONE gated query — the second
    * end-to-end composition gate, at the streaming boundary (the batch
    * `pipeline_end_to_end` gate's counterpart): file-stream ingestion →
    * in-stream near-dedup (the `streaming_near_dedup` machinery:
    * row-local codegen'd MinHash band keys +
    * `dropDuplicatesWithinWatermark` on the first band, watermark-evicted
    * state) → row-local quality filter (non-empty token count ≥
    * `PsiMinTokens` — filtering AFTER dedup so a junk near-dup still
    * counts as a duplicate, the published-pipeline ordering) → foreachBatch
    * versioned upsert sink (`UpsertSink.mergeLatest` keyed on the band
    * key — a reader never observes a half-written table, replay rewrites
    * v_k from v_{k-1}). Two micro-batches: canonical originals, then
    * every-3rd-doc near-dup redeliveries (new ids, perturbed text) of
    * which only genuinely-new band keys may survive.
    *
    * Parity statement (same shape the flagship makes): the final merged
    * state table ≡ the equivalent BATCH chain — union corpus → band keys
    * → canonical-per-key ∪ new-key arrivals → quality filter — which is
    * exactly what the DuckDB oracle computes. Scale shape: every stage is
    * the gated operator's own shape (bounded dedup state, row-local
    * kernels, key-cardinality merges); nothing new materializes at
    * corpus scale. */
  private val pipelineStreamingIngest: Q = (s, dir) => {
    import java.nio.file.Paths
    val tmp = Paths.get(scratchPath("pipeline_streaming_ingest", dir))
    freshDir(tmp)
    val docs = graft.sources.Tables.documents(s, dir)
      .select(col("doc_id"), col("text"))
    val withKey = docs
      .withColumn("hs", hsOf(col("text")))
      .filter(size(col("hs")) > 0)
      .withColumn("band_key", bandKeyOf(col("hs")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("band_key")).orderBy(col("doc_id"))
    val canon = withKey.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).select(col("doc_id"), col("text"))
    writeOneFile(canon, tmp, "batch1_canonical.parquet")
    // canonical-per-key batch-2 prep (min doc_id per band key) — the
    // near-dedup gate's determinism fix: planted band keys COLLIDE at
    // scale (9/17001 on the 100× corpus) and an undeduped batch makes
    // the in-stream survivor arrival-order-dependent
    val plant = docs.filter(col("doc_id") % 3 === 0)
      .select((col("doc_id") + NdPlantOffset).as("doc_id"),
        concat(col("text"), lit(NdPerturb)).as("text"))
      .withColumn("hs", hsOf(col("text")))
      .filter(size(col("hs")) > 0)
      .withColumn("band_key", bandKeyOf(col("hs")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).select(col("doc_id"), col("text"))
    val docSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val ingested = s.readStream
      .schema(docSchema)
      .parquet(s"$tmp/*.parquet")
      .withColumn("hs", hsOf(col("text")))
      .filter(size(col("hs")) > 0)
      .withColumn("band_key", bandKeyOf(col("hs")))
      // deterministic event time from the doc id (the near-dedup gate's
      // convention, +3 days off the epoch-0 watermark boundary)
      .withColumn("eventTime",
        timestamp_micros((col("doc_id") % NdPlantOffset + 259200L) * 1000000L))
      .withWatermark("eventTime", "2 days")
      .dropDuplicatesWithinWatermark("band_key")
      .withColumn("n_tokens",
        size(filter(split(col("text"), " "), t => t =!= "")).cast("long"))
      .filter(col("n_tokens") >= PsiMinTokens)
      .select(col("doc_id"), col("band_key"), col("n_tokens"))
    val merges = new AtomicInteger(0)
    var current: Option[String] = None
    setStatePartitions(s, 4)
    val q = ingested.writeStream.outputMode("append")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        if (!df.isEmpty) {
          // post-dedup band keys are unique across batches, so the merge
          // is insert-shaped by construction — the versioned MERGE
          // plumbing (atomic new dir, idempotent replay) is what's under
          // test, with doc_id recency as the general contract
          val batchLatest = graft.streaming.UpsertSink.mergeLatest(
            None, df, "band_key", "doc_id", "n_tokens")
          val merged = graft.streaming.UpsertSink.mergeLatest(
            current.map(s.read.parquet(_)), batchLatest,
            "band_key", "doc_id", "n_tokens")
          val out = tmp.resolve(s"psi_state_v$id").toString
          merged.write.mode("overwrite").parquet(out)
          current = Some(out)
          merges.incrementAndGet()
          ()
        }
      }
      .start()
    try {
      q.processAllAvailable() // batch 1: canonical originals
      writeOneFile(plant, tmp, "batch2_neardups.parquet")
      q.processAllAvailable() // batch 2: near-dups dropped, new keys kept
    } finally drainStop(q)
    require(merges.get() == 2,
      s"ingest pipeline expected 2 merged batches, saw ${merges.get()}")
    s.read.parquet(current.get)
      .select(col("doc_id"), col("band_key"), col("n_tokens"))
  }

  private val PsiMinTokens = 30L

  private lazy val pipelineStreamingIngestSql = {
    // the streaming_near_dedup oracle chain + the post-dedup quality
    // filter — the batch chain the parity statement names
    import graft.operators.DedupOps
    val rowsPerBand = NdNumHashes / NdBands
    val mins = (0 until rowsPerBand).map(i =>
      s"min((${DedupOps.mhA(i)} * g + ${DedupOps.mhB(i)}) % ${DedupOps.MinHashP}) AS mh$i")
      .mkString(",\n      |       ").stripMargin
    import graft.functions.TextFunctions.{NGramHashB => FB, NGramHashP => FP}
    val fold = (0 until rowsPerBand).foldLeft("CAST(0 AS BIGINT)")(
      (acc, i) => s"((($acc) * $FB + mh$i) % $FP)")
    s"""WITH docs2 AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + $NdPlantOffset, text || '$NdPerturb' FROM documents
      |  WHERE doc_id % 3 = 0),
      |toks AS (SELECT doc_id, str_split(text,' ') AS ws FROM docs2),
      |tok AS (SELECT doc_id, w, i FROM
      |        (SELECT doc_id, unnest(ws) AS w, generate_subscripts(ws,1) AS i FROM toks)
      |        WHERE w <> ''),
      |sh AS (SELECT doc_id,
      |              w || '_' || lead(w,1) OVER win || '_' || lead(w,2) OVER win AS g
      |       FROM tok WINDOW win AS (PARTITION BY doc_id ORDER BY i)),
      |dt AS MATERIALIZED (SELECT DISTINCT doc_id,
      |              CAST(('0x' || substring(md5(g), 1, 10)) AS BIGINT) AS g
      |       FROM sh WHERE g IS NOT NULL),
      |sig AS MATERIALIZED (SELECT doc_id, $mins
      |        FROM dt GROUP BY doc_id),
      |key0 AS (SELECT doc_id, $fold AS band_key FROM sig),
      |-- originals classified by MEMBERSHIP in documents, not by an id
      |-- threshold: scaled corpora (ScaleGen) shift replica doc ids far
      |-- past the +$NdPlantOffset plant offset, so an id comparison
      |-- silently misclassifies replica originals as planted (found by
      |-- the 10x full-registry oracle run)
      |orig AS (SELECT * FROM key0
      |         WHERE doc_id IN (SELECT doc_id FROM documents)),
      |orig_canon AS (SELECT min(doc_id) AS doc_id, band_key
      |               FROM orig GROUP BY band_key),
      |plant AS (SELECT * FROM key0
      |          WHERE doc_id NOT IN (SELECT doc_id FROM documents)),
      |kept AS (SELECT doc_id, band_key FROM orig_canon
      |         UNION ALL
      |         -- min per key ≙ the batch-2 canonical prep (planted band
      |         -- keys collide at scale: 9/17001 at 100×)
      |         SELECT min(doc_id) AS doc_id, band_key FROM plant
      |         WHERE band_key NOT IN (SELECT band_key FROM orig_canon)
      |         GROUP BY band_key),
      |ntok AS (SELECT doc_id, count(*) AS n_tokens FROM tok GROUP BY 1)
      |SELECT CAST(k.doc_id AS BIGINT) AS doc_id,
      |       CAST(k.band_key AS BIGINT) AS band_key,
      |       CAST(n.n_tokens AS BIGINT) AS n_tokens
      |FROM kept k JOIN ntok n ON n.doc_id = k.doc_id
      |WHERE n.n_tokens >= $PsiMinTokens""".stripMargin
  }

  /** Streaming ordered funnel — `funnel_conversion`'s incremental half,
    * run through the versioned foreachBatch state sink and gated against
    * the batch funnel oracle VERBATIM (the `streaming_cdc_upsert`
    * pattern): per-user funnel state (t1, t2, t3) merges with each
    * micro-batch's conditional-min chain, where each step's batch
    * candidates are filtered against the step-(k−1) time AS MERGED THIS
    * BATCH (so view→click inside one batch converts, and a click
    * delivered before any view can never convert — order semantics
    * preserved incrementally; batches are time-split, so a later batch
    * can only APPEND to the timeline, which is what makes the funnel
    * recurrence mergeable). Per batch: three batch-sized conditional
    * aggregates + key-cardinality joins against state — cost ∝ batch +
    * touched users, never a history re-scan. */
  private val streamingFunnel: Q = (s, dir) => {
    import java.nio.file.{Files, Paths}
    val tmp = Paths.get(scratchPath("sfunnel", dir))
    freshDir(tmp)
    val in = tmp.resolve("in"); Files.createDirectories(in)
    val evAll = s.read.schema(eventsRawSchema)
      .parquet(s"$dir/events.parquet")
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
    val mid = evAll.agg(
      expr("min(ts) + (max(ts) - min(ts)) div 2").cast("long").as("t"))
      .head().getLong(0)

    val stateSchema = StructType(Seq(
      StructField("user_id", LongType), StructField("t1", LongType),
      StructField("t2", LongType), StructField("t3", LongType)))
    var current: Option[String] = None
    val merges = new AtomicInteger(0)
    val frames = s.readStream.schema(
        StructType(graft.model.Schemas.eventsRawMicros.fields.filter(f =>
          Seq("user_id", "event_id", "ts", "event_type").contains(f.name))))
      .parquet(s"$in/*.parquet")
    setStatePartitions(s, 4)
    val q = frames.writeStream.outputMode("append")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        if (!df.isEmpty) {
          val st = current.map(s.read.parquet(_)).getOrElse(
            s.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
              stateSchema))
          val b1 = df.filter(col("event_type") === "view")
            .groupBy(col("user_id")).agg(min(col("ts")).as("bt1"))
          // least() skips nulls: an unreached step stays null until its
          // first candidate, then only ever decreases (it can't — later
          // batches carry later times; least() makes that explicit)
          val s1 = st.join(b1, Seq("user_id"), "full_outer")
            .select(col("user_id"), least(col("t1"), col("bt1")).as("t1"),
              col("t2"), col("t3"))
          val b2 = df.filter(col("event_type") === "click")
            .join(s1.select(col("user_id"), col("t1")), "user_id")
            .filter(col("ts") > col("t1"))
            .groupBy(col("user_id")).agg(min(col("ts")).as("bt2"))
          val s2 = s1.join(b2, Seq("user_id"), "left")
            .select(col("user_id"), col("t1"),
              least(col("t2"), col("bt2")).as("t2"), col("t3"))
          val b3 = df.filter(col("event_type") === "purchase")
            .join(s2.select(col("user_id"), col("t2")), "user_id")
            .filter(col("ts") > col("t2"))
            .groupBy(col("user_id")).agg(min(col("ts")).as("bt3"))
          val s3 = s2.join(b3, Seq("user_id"), "left")
            .select(col("user_id"), col("t1"), col("t2"),
              least(col("t3"), col("bt3")).as("t3"))
          val out = tmp.resolve(s"state_v$id").toString
          s3.write.mode("overwrite").parquet(out)
          current = Some(out)
          merges.incrementAndGet()
          ()
        }
      }
      .start()
    try {
      writeOneFile(evAll.filter(col("ts") <= mid), in, "batch1.parquet")
      q.processAllAvailable()
      writeOneFile(evAll.filter(col("ts") > mid), in, "batch2.parquet")
      q.processAllAvailable()
    } finally drainStop(q)
    require(merges.get() == 2,
      s"funnel gate expected exactly 2 merged batches, saw ${merges.get()}")
    val st = s.read.parquet(current.get)
    st.agg(count(col("t1")).as("users"), lit(0L).as("sum_lag_us"))
      .select(lit("1_view").as("step"), col("users"), col("sum_lag_us"))
      .unionByName(st.filter(col("t2").isNotNull)
        .agg(count(lit(1)).as("users"),
          sum(col("t2") - col("t1")).as("sum_lag_us"))
        .select(lit("2_click").as("step"), col("users"), col("sum_lag_us")))
      .unionByName(st.filter(col("t3").isNotNull)
        .agg(count(lit(1)).as("users"),
          sum(col("t3") - col("t2")).as("sum_lag_us"))
        .select(lit("3_purchase").as("step"), col("users"),
          col("sum_lag_us")))
  }

  /** Streaming sessionize→funnel — `pipeline_sessions_funnel`'s
    * incremental half, gated against the batch composition oracle
    * VERBATIM (the `streaming_funnel` contract, lifted from per-user to
    * per-(user, session) keys). Two state relations version through the
    * foreachBatch sink: per-USER sessionizer state (last event time,
    * last session index, first-seen time for the cohort) and
    * per-(user, session) funnel state (n_events, t1, t2, t3). Each
    * micro-batch sessionizes ITS OWN rows with one per-user window whose
    * first-row gap tests against the state's last_us (so a session open
    * at the batch boundary continues, and a > 30 min boundary gap opens
    * session last_sidx + 1); batches are time-split, so a later batch
    * only ever APPENDS to each user's timeline — the recurrence that
    * makes both the sessionizer and the in-session conditional-min
    * funnel mergeable (each step's batch candidates filter against the
    * step-(k−1) time AS MERGED THIS BATCH — the `streaming_funnel`
    * order argument, per session key). Per batch: one batch-sized
    * window + key-cardinality joins against state; the final cohort
    * rollup reads state relations only. */
  private val streamingSessionsFunnel: Q = (s, dir) => {
    import java.nio.file.{Files, Paths}
    val tmp = Paths.get(scratchPath("ssessfunnel", dir))
    freshDir(tmp)
    val in = tmp.resolve("in"); Files.createDirectories(in)
    val evAll = s.read.schema(eventsRawSchema)
      .parquet(s"$dir/events.parquet")
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
    val mid = evAll.agg(
      expr("min(ts) + (max(ts) - min(ts)) div 2").cast("long").as("t"))
      .head().getLong(0)

    var curUser: Option[String] = None
    var curSess: Option[String] = None
    val merges = new AtomicInteger(0)
    val frames = s.readStream.schema(
        StructType(graft.model.Schemas.eventsRawMicros.fields.filter(f =>
          Seq("user_id", "event_id", "ts", "event_type").contains(f.name))))
      .parquet(s"$in/*.parquet")
    setStatePartitions(s, 4)
    val q = frames.writeStream.outputMode("append")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        if (!df.isEmpty) {
          // the merge recurrence lives in SessionFunnelState so the
          // batch-boundary invariance claim is property-tested against
          // the SAME code this gate runs (EngineProperties re-splits
          // the stream at random quantiles)
          import graft.streaming.SessionFunnelState
          val uSt = curUser.map(s.read.parquet(_))
            .getOrElse(SessionFunnelState.emptyUser(s))
          val sSt = curSess.map(s.read.parquet(_))
            .getOrElse(SessionFunnelState.emptySess(s))
          val (u1, s3) = SessionFunnelState.mergeBatch(df, uSt, sSt)
          val outU = tmp.resolve(s"user_v$id").toString
          val outS = tmp.resolve(s"sess_v$id").toString
          // the two state writes are independent actions on disjoint
          // output dirs — submit them concurrently so the second's
          // tasks back-fill the first's stragglers (optimization guide
          // §2.6 "overlap independent jobs"); results are unchanged,
          // only the wall overlaps
          import scala.concurrent.{Await, Future}
          import scala.concurrent.ExecutionContext.Implicits.global
          import scala.concurrent.duration.Duration
          val fu = Future(u1.write.mode("overwrite").parquet(outU))
          s3.write.mode("overwrite").parquet(outS)
          Await.result(fu, Duration.Inf)
          curUser = Some(outU); curSess = Some(outS)
          merges.incrementAndGet()
          ()
        }
      }
      .start()
    try {
      writeOneFile(evAll.filter(col("ts") <= mid), in, "batch1.parquet")
      q.processAllAvailable()
      writeOneFile(evAll.filter(col("ts") > mid), in, "batch2.parquet")
      q.processAllAvailable()
    } finally drainStop(q)
    require(merges.get() == 2,
      s"sessions-funnel gate expected exactly 2 merged batches, saw ${merges.get()}")
    // cohort rollup over state relations only (user- and session-sized)
    val sess = s.read.parquet(curSess.get)
    val cohort = s.read.parquet(curUser.get)
      .select(col("user_id"),
        expr("first_us div 604800000000").as("cohort_week"))
    sess.join(cohort, "user_id")
      .groupBy(col("cohort_week"))
      .agg(count(lit(1)).as("n_sessions"),
        sum(when(col("t3").isNotNull, 1L).otherwise(0L)).as("n_conv"))
      .withColumn("conv_fp", expr("1000000 * n_conv div n_sessions"))
  }

  val all: Map[String, Q] = Map(
    "streaming_funnel" -> streamingFunnel,
    "streaming_sessions_funnel" -> streamingSessionsFunnel,
    "pipeline_streaming_ingest" -> pipelineStreamingIngest,
    "streaming_upsert_sink" -> streamingUpsertSink,
    "streaming_cdc_upsert" -> streamingCdcUpsert,
    "streaming_static_join" -> streamingStaticJoin,
    "streaming_near_dedup" -> streamingNearDedup,
    "streaming_dedup_within_watermark" -> streamingDedupWithinWatermark,
    "streaming_unique_users" -> streamingUniqueUsers,
    "streaming_unique_users_append" -> streamingUniqueUsersAppend,
    "streaming_update_changelog" -> streamingUpdateChangelog,
    "streaming_running_distinct" -> streamingRunningDistinct,
    "streaming_late_data_drop" -> streamingLateDataDrop,
    "streaming_sessions" -> streamingSessions,
    "streaming_stream_join" -> streamingStreamJoin,
    "streaming_outer_join" -> streamingOuterJoin,
    "kafka_sink_projection" -> kafkaSinkProjection,
    "state_store_dump" -> stateStoreDump
  ).map { case (n, f) => n -> isolated(f) }

  val oracles: Map[String, String] = Map(
    // incremental funnel state ≡ the batch ordered funnel — same oracle,
    // verbatim: the streaming-equals-batch parity statement
    "streaming_funnel" -> AnalyticsQueries.oracles("funnel_conversion"),
    // the batch composition oracle VERBATIM — streaming ≡ batch
    "streaming_sessions_funnel" ->
      AnalyticsQueries.oracles("pipeline_sessions_funnel"),
    // the merged upsert table ≡ the batch last-event query — parity
    "streaming_upsert_sink" ->
      """SELECT user_id, event_id AS last_event_id,
        |       CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS last_ts
        |FROM (SELECT *, row_number() OVER (
        |        PARTITION BY user_id
        |        ORDER BY date_trunc('microseconds', ts) DESC, event_id DESC) AS rn
        |      FROM events) WHERE rn = 1""".stripMargin,
    // streaming changelog apply ≡ the batch cdc_apply — same oracle,
    // verbatim; passing it across the replayed batch proves idempotence
    "streaming_cdc_upsert" -> MaintenanceQueries.cdcApplySql,
    // state-expiry null padding ≡ the batch LEFT JOIN — parity
    "streaming_outer_join" -> streamingOuterJoinSql,
    // streaming enrichment ≡ the same join in batch — a parity statement
    "streaming_static_join" -> streamingStaticJoinSql,
    "streaming_near_dedup" -> streamingNearDedupSql,
    // the merged ingest state ≡ the batch dedup→quality chain — parity
    "pipeline_streaming_ingest" -> pipelineStreamingIngestSql,
    "streaming_dedup_within_watermark" -> streamingDedupWithinWatermarkSql,
    "streaming_unique_users" -> streamingUniqueUsersSql,
    "streaming_unique_users_append" -> streamingUniqueUsersSql,
    "streaming_update_changelog" -> streamingUpdateChangelogSql,
    "streaming_running_distinct" -> streamingUniqueUsersSql,
    "streaming_late_data_drop" -> streamingLateDataDropSql,
    // same oracle as the batch session query — THE parity statement
    "streaming_sessions" -> EventQueries.sessionWindowStatsSql,
    "streaming_stream_join" -> streamingStreamJoinSql,
    "kafka_sink_projection" -> kafkaSinkProjectionSql,
    "state_store_dump" -> stateStoreDumpSql)
}
