package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.model.LogFrame

/** State introspection via the state data source — the engine-native
  * replacement for the reference's debug store dump
  * (DeduplicateValueTransformer.java:58–68, a fetchAll+print over a
  * hard-coded epoch range). Asserts the exact state layout of the
  * flagship's two stateful operators on the synthetic mini-stream
  * (FIXTURES.md §3): the dedup store holds precisely the distinct
  * (window, uid) pairs, the aggregate store the per-window counts.
  */
class StateStoreSpec extends SparkSpec {
  import spark.implicits._
  implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  test("state source exposes dedup keys and agg counts of the flagship checkpoint") {
    val ckpt = java.nio.file.Files.createTempDirectory("state_spec_").toString
    val mem = MemoryStream[LogFrame]
    // 20 events, uids cycle 0..6 → every window's distinct set is capped
    // at 7; duplicate uids within a window must appear ONCE in state
    mem.addData((0 until 20).map(i => LogFrame(1468244340L + 10L * i, (i % 7).toString)): _*)
    val frames = mem.toDF()
      .select(timestamp_seconds($"ts").as("eventTime"), $"uid")
    val counts = graft.streaming.UniqueUsersStream.uniquePerWindow(
      frames, "1 minute", None)
    val q = counts.writeStream.format("memory").queryName("state_spec_sink")
      .option("checkpointLocation", ckpt)
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()

    // operator 0: windowed count aggregate — value.count per window
    val agg = spark.read.format("statestore").option("operatorId", 0).load(ckpt)
      .select(unix_timestamp($"key.w.start").as("m"), $"value.count".as("n"))
      .as[(Long, Long)].collect().toMap
    // operator 1: dedup store — key = (window, uid), value empty
    val dedup = spark.read.format("statestore").option("operatorId", 1).load(ckpt)
      .select(unix_timestamp($"key.w.start").as("m"), $"key.uid".as("uid"))
      .as[(Long, String)].collect().toSeq

    // expected per-window distinct sets from the fixture itself
    val expected = (0 until 20)
      .map(i => (1468244340L + 10L * i) / 60 * 60 -> (i % 7).toString)
      .distinct
    assert(dedup.sorted == expected.sorted)
    assert(dedup.size == dedup.distinct.size, "dedup state holds duplicate keys")
    val expectedCounts = expected.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    assert(agg == expectedCounts)
  }

  test("RunningDistinct evicts a bucket's state once the watermark passes retention") {
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val ckpt = java.nio.file.Files.createTempDirectory("tws_evict_").toString
      def in(bucket: Long, uid: String, tsSec: Long) =
        graft.streaming.RunningDistinct.In(bucket, uid,
          new java.sql.Timestamp(tsSec * 1000L))
      val mem = MemoryStream[graft.streaming.RunningDistinct.In]
      val out = graft.streaming.RunningDistinct.runningUniquePerBucket(mem.toDS())
      val q = out.toDF().writeStream.format("memory").queryName("tws_evict_sink")
        .option("checkpointLocation", ckpt)
        .outputMode("update").start()
      try {
        mem.addData(in(60L, "a", 61L), in(60L, "b", 62L))
        q.processAllAvailable()
        // bucket 60's timer is armed at 60 s + window + retention = 180 s;
        // this batch pushes the watermark to 601 s → timer fires in the
        // trailing timer batch and bucket 60's map+count are cleared
        mem.addData(in(600L, "z", 601L))
        q.processAllAvailable()
      } finally q.stop()

      val seen = spark.read.format("statestore")
        .option("stateVarName", "seen").load(ckpt)
      val seenKeys = seen.select($"key.value".as("bucket"),
          $"user_map_key.value".as("uid"))
        .as[(Long, String)].collect().toSet
      assert(seenKeys == Set((600L, "z")),
        s"expired bucket 60 still present in 'seen': $seenKeys")
      val counts = spark.read.format("statestore")
        .option("stateVarName", "count").load(ckpt)
        .select($"key.value".as("bucket"), $"value.value".as("n"))
        .as[(Long, Long)].collect().toSet
      assert(counts == Set((600L, 1L)),
        s"expired bucket 60 still present in 'count': $counts")
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
