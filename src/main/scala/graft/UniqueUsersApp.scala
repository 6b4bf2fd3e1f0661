package graft

import org.apache.spark.sql.SparkSession
import graft.streaming.{KafkaTransport, UniqueUsersStream}

/** The runnable production entry point — the engine-native replacement for
  * the reference's `UniqueUsersApp.main` (UniqueUsersApp.java:39–60) +
  * `KafkaConfigurationService` (config.properties:1–5): consume JSON log
  * frames from a Kafka topic, count distinct uids per 1-minute event-time
  * window, produce (epoch-minute key, JSON metric) records to an output
  * topic.
  *
  * Differences by design (SURVEY §7):
  *  - config failures throw with the offending key — never the reference's
  *    swallowed-exception empty bean (KafkaConfigurationService.java:40–42);
  *  - late/malformed frames are dropped and counted, never epoch-0-bucketed;
  *  - output mode is explicit: `append` (default) = one final count per
  *    closed window — what the reference intended; `update` = its observed
  *    running-count behavior.
  *
  * Config via system properties or environment (key → env alias):
  *   graft.kafka.bootstrap  GRAFT_KAFKA_BOOTSTRAP   (required)
  *   graft.topic.in         GRAFT_TOPIC_IN          (default log-frames)
  *   graft.topic.out        GRAFT_TOPIC_OUT         (default unique-users-metrics)
  *   graft.checkpoint       GRAFT_CHECKPOINT        (required)
  *   graft.window           GRAFT_WINDOW            (default "1 minute")
  *   graft.watermark        GRAFT_WATERMARK         (default "1 minute")
  *   graft.mode             GRAFT_MODE              (append | update)
  *
  * Needs the spark-sql-kafka connector on the runtime classpath; the plan
  * construction below is broker-independent and unit-tested via
  * `buildPlan` over any frame source.
  */
object UniqueUsersApp {

  final case class Config(
      bootstrap: String,
      topicIn: String = "log-frames",
      topicOut: String = "unique-users-metrics",
      checkpoint: String = "",
      window: String = "1 minute",
      watermark: String = "1 minute",
      mode: String = "append") {
    require(mode == "append" || mode == "update", s"bad graft.mode: $mode")
  }

  def loadConfig(get: String => Option[String]): Config = {
    def opt(key: String): Option[String] = {
      val env = "GRAFT_" + key.stripPrefix("graft.").replace('.', '_').toUpperCase
      get(key).orElse(sys.env.get(env))
    }
    def req(key: String): String =
      opt(key).getOrElse(throw new IllegalArgumentException(
        s"missing required config '$key' (or its env alias)"))
    Config(
      bootstrap = req("graft.kafka.bootstrap"),
      topicIn = opt("graft.topic.in").getOrElse("log-frames"),
      topicOut = opt("graft.topic.out").getOrElse("unique-users-metrics"),
      checkpoint = req("graft.checkpoint"),
      window = opt("graft.window").getOrElse("1 minute"),
      watermark = opt("graft.watermark").getOrElse("1 minute"),
      mode = opt("graft.mode").getOrElse("append"))
  }

  /** The full logical pipeline from any (eventTime, uid) frame source —
    * broker-independent, reused by tests and by `main`. */
  def buildPlan(frames: org.apache.spark.sql.DataFrame, cfg: Config): org.apache.spark.sql.DataFrame =
    UniqueUsersStream.toKafkaRecords(
      UniqueUsersStream.uniquePerWindow(frames, cfg.window, Some(cfg.watermark)))

  def main(args: Array[String]): Unit = {
    val cfg = loadConfig(k => Option(System.getProperty(k)))
    val builder = SparkSession.builder()
      .appName("graft-unique-users")
      .config("spark.sql.session.timeZone", "UTC")
    // spark-submit injects spark.master; standalone runs default local
    val spark = sys.props.get("spark.master").fold(builder.master("local[*]"))(_ => builder)
      .getOrCreate()
    val frames = KafkaTransport.readLogFrames(spark,
      KafkaTransport.SourceConfig(cfg.bootstrap, cfg.topicIn))
    val records = buildPlan(frames, cfg)
    val query = KafkaTransport.writer(records,
        KafkaTransport.SinkConfig(cfg.bootstrap, cfg.topicOut, cfg.checkpoint))
      .outputMode(cfg.mode)
      .start()
    query.awaitTermination()
  }
}
