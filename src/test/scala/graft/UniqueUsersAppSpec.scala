package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.model.LogFrame

class UniqueUsersAppSpec extends SparkSpec {
  import spark.implicits._
  implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  test("config loads from properties with env fallback, fails loud on missing keys") {
    val cfg = UniqueUsersApp.loadConfig(Map(
      "graft.kafka.bootstrap" -> "b:9092",
      "graft.checkpoint" -> "/tmp/ckpt",
      "graft.mode" -> "update").get)
    assert(cfg.bootstrap == "b:9092" && cfg.topicIn == "log-frames"
      && cfg.topicOut == "unique-users-metrics" && cfg.mode == "update")
    val err = intercept[IllegalArgumentException] {
      UniqueUsersApp.loadConfig(Map("graft.checkpoint" -> "x").get)
    }
    // unlike the reference's swallowed config failure, the key is named
    assert(err.getMessage.contains("graft.kafka.bootstrap"))
    intercept[IllegalArgumentException] {
      UniqueUsersApp.loadConfig(Map(
        "graft.kafka.bootstrap" -> "b", "graft.checkpoint" -> "c",
        "graft.mode" -> "complete").get)
    }
  }

  test("buildPlan end-to-end over a memory stream emits the contract records") {
    val cfg = UniqueUsersApp.loadConfig(Map(
      "graft.kafka.bootstrap" -> "unused:9092",
      "graft.checkpoint" -> "unused").get)
    val mem = MemoryStream[LogFrame]
    mem.addData((0 until 20).map(i => LogFrame(1468244340L + 10L * i, (i + 1).toString)): _*)
    mem.addData(LogFrame(1468250000L, "sentinel"))
    val frames = mem.toDF()
      .select(timestamp_seconds($"ts").as("eventTime"), $"uid")
    val q = UniqueUsersApp.buildPlan(frames, cfg)
      .writeStream.format("memory").queryName("app_probe")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val recs = spark.table("app_probe")
      .select($"key", get_json_object($"value", "$.uniqueUsers").cast("long").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(recs == Map("1468244340" -> 6L, "1468244400" -> 6L,
      "1468244460" -> 6L, "1468244520" -> 2L))
  }
}
