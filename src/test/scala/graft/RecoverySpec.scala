package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.model.LogFrame

/** Operational semantics: checkpoint/restart recovery (exactly-once over
  * a restart — the durability the reference delegates to Kafka changelogs,
  * SURVEY §4 "Fault tolerance"), observed reject metrics, streaming
  * session windows, and dropDuplicatesWithinWatermark.
  */
class RecoverySpec extends SparkSpec {
  import spark.implicits._
  implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def rm(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
  }

  test("streaming restart from checkpoint does not reprocess consumed input") {
    val base = "target/test-recovery"
    rm(new java.io.File(base))
    val in = s"$base/in"; val out = s"$base/out"; val ckpt = s"$base/ckpt"
    new java.io.File(in).mkdirs()

    def addInput(ids: Range): Unit =
      ids.map(i => LogFrame(1468244340L + i, s"u$i")).toDF()
        .coalesce(1).write.mode("append").parquet(in)

    def runOnce(): Unit = {
      val q = spark.readStream.schema("ts LONG, uid STRING").parquet(in)
        .writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          b.write.mode("append").parquet(out); ()
        }
        .start()
      try q.processAllAvailable() finally q.stop()
    }

    addInput(0 until 50)
    runOnce()
    assert(spark.read.parquet(out).count() == 50)

    addInput(50 until 80)
    runOnce() // restart from the same checkpoint
    val rows = spark.read.parquet(out).as[LogFrame].collect()
    assert(rows.length == 80, s"restart reprocessed or lost input: ${rows.length}")
    assert(rows.map(_.uid).distinct.length == 80) // each input exactly once
  }

  test("replayed micro-batch (lost sink commit) stays exactly-once under batch-keyed overwrite") {
    // the crash window the append-mode sink can't survive: a batch writes
    // its output but dies before the commit log records it — on restart
    // the engine re-runs that batch. foreachBatch with mode(overwrite)
    // into a batch-id-keyed directory makes the replay idempotent (the
    // standard exactly-once sink recipe for non-transactional stores).
    val base = "target/test-replay"
    rm(new java.io.File(base))
    val in = s"$base/in"; val out = s"$base/out"; val ckpt = s"$base/ckpt"
    new java.io.File(in).mkdirs()

    def addInput(ids: Range): Unit =
      ids.map(i => LogFrame(1468244340L + i, s"u$i")).toDF()
        .coalesce(1).write.mode("append").parquet(in)

    def runOnce(): Unit = {
      val q = spark.readStream.schema("ts LONG, uid STRING").parquet(in)
        .writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
          b.write.mode("overwrite").parquet(s"$out/batch=$id"); ()
        }
        .start()
      try q.processAllAvailable() finally q.stop()
    }

    addInput(0 until 40); runOnce()  // batch 0
    addInput(40 until 70); runOnce() // batch 1
    assert(spark.read.parquet(out).count() == 70)
    // lose batch 1's commit marker — the engine must now replay batch 1
    // from the offset log on restart
    val commit = new java.io.File(s"$ckpt/commits/1")
    assert(commit.exists(), "expected commit log entry for batch 1")
    assert(commit.delete())
    // the checksum sibling must go with it — a stale .crc next to a
    // rewritten commit reads as a concurrent-query conflict
    new java.io.File(s"$ckpt/commits/.1.crc").delete()
    runOnce() // replays batch 1 into the same batch=1 directory
    val rows = spark.read.parquet(out).select("uid").as[String].collect()
    assert(rows.length == 70, s"replay duplicated or lost rows: ${rows.length}")
    assert(rows.distinct.length == 70)
  }

  test("observed metrics report rejects per batch (drop-and-count policy)") {
    val raw = Seq(
      """{"ts":1468244340,"uid":"a"}""", """{"ts":1468244341,"uid":""}""",
      """garbage""", """{"ts":1468244342,"uid":"b"}""").toDF("value")
    val frames = graft.streaming.LogFrames.observed(
      graft.streaming.LogFrames.parse(raw, $"value"))
    frames.collect()
    val metrics = frames.queryExecution.observedMetrics("log_frames")
    assert(metrics.getAs[Long]("rows") == 4L)
    assert(metrics.getAs[Long]("rejects") == 2L)
  }

  test("streaming session windows merge within gap and close by watermark") {
    val mem = MemoryStream[LogFrame]
    val sessions = mem.toDF()
      .select(timestamp_seconds($"ts").as("eventTime"), $"uid")
      .withWatermark("eventTime", "10 seconds")
      .groupBy(session_window($"eventTime", "30 seconds").as("w"), $"uid")
      .agg(count(lit(1)).as("n"))
      .select(unix_timestamp($"w.start").as("start"),
        unix_timestamp($"w.end").as("end"), $"uid", $"n")
    val q = sessions.writeStream.format("memory").queryName("sess_probe")
      .outputMode("append").start()
    try {
      // u1: events at 0, 20, 40 (gaps < 30 s → one session [0, 70));
      // u2: events at 0 and 100 (gap > 30 s → two sessions)
      mem.addData(LogFrame(1468244300L, "u1"), LogFrame(1468244320L, "u1"),
        LogFrame(1468244340L, "u1"), LogFrame(1468244300L, "u2"),
        LogFrame(1468244400L, "u2"))
      q.processAllAvailable()
      mem.addData(LogFrame(1468250000L, "sentinel")) // close everything open
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("sess_probe")
      .filter($"uid" =!= "sentinel")
      .collect().map(r => (r.getString(2), r.getLong(0), r.getLong(1), r.getLong(3))).toSet
    assert(got == Set(
      ("u1", 1468244300L, 1468244370L, 3L),
      ("u2", 1468244300L, 1468244330L, 1L),
      ("u2", 1468244400L, 1468244430L, 1L)))
  }

  test("transformWithState emits running unique counts per bucket (update semantics)") {
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      def in(bucket: Long, uid: String, tsSec: Long) =
        graft.streaming.RunningDistinct.In(bucket, uid,
          new java.sql.Timestamp(tsSec * 1000L))
      val mem = MemoryStream[graft.streaming.RunningDistinct.In]
      val out = graft.streaming.RunningDistinct.runningUniquePerBucket(mem.toDS())
      val q = out.toDF().writeStream.format("memory").queryName("tws_probe")
        .outputMode("update").start()
      try {
        // ts stays ahead of the batch-1 watermark (62 s) and below the
        // bucket-60 eviction timer (180 s) so neither lateness filtering
        // nor retention interferes with this test's assertions
        mem.addData(in(60L, "a", 61L), in(60L, "b", 62L))
        q.processAllAvailable()
        mem.addData(in(60L, "a", 63L), // dup: no change
          in(60L, "c", 64L),
          in(120L, "a", 121L))
        q.processAllAvailable()
      } finally q.stop()
      val rows = spark.table("tws_probe").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toList.sorted
      // batch 1: bucket 60 → 2; batch 2: bucket 60 → 3 (dup ignored), 120 → 1
      assert(rows == List((60L, 2L), (60L, 3L), (120L, 1L)))
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("dropDuplicatesWithinWatermark dedups across windows inside the watermark") {
    val mem = MemoryStream[LogFrame]
    val deduped = mem.toDF()
      .select(timestamp_seconds($"ts").as("eventTime"), $"uid")
      .withWatermark("eventTime", "1 minute")
      .dropDuplicatesWithinWatermark("uid")
    val q = deduped.writeStream.format("memory").queryName("ddw_probe")
      .outputMode("append").start()
    try {
      // same uid in two adjacent minutes: plain windowed dedup counts it
      // twice (once per window); within-watermark dedup emits it once
      mem.addData(LogFrame(1468244340L, "x"), LogFrame(1468244401L, "x"),
        LogFrame(1468244360L, "y"))
      q.processAllAvailable()
    } finally q.stop()
    val uids = spark.table("ddw_probe").select($"uid").as[String].collect().sorted
    assert(uids.toSeq == Seq("x", "y"))
  }
}
