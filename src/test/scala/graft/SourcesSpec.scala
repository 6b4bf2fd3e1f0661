package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.StreamJoins

import scala.jdk.CollectionConverters._

/** File-format roundtrips (sources/sinks category: json/csv/parquet) and
  * the stream-stream lookback join.
  */
class SourcesSpec extends SparkSpec {
  import spark.implicits._
  implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def events = graft.sources.Tables.events(spark, sf001)

  private def checksum(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
    val r = df.agg(count(lit(1)), sum(col("event_id"))).head()
    (r.getLong(0), r.getLong(1))
  }

  test("json write/read roundtrip preserves rows") {
    val dir = "target/test-sources/events-json"
    events.write.mode("overwrite").json(dir)
    val back = spark.read.schema(events.schema).json(dir)
    assert(checksum(back) == checksum(events))
  }

  test("csv write/read roundtrip preserves rows (quoted JSON column included)") {
    val dir = "target/test-sources/events-csv"
    events.write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read.schema(events.schema).option("header", "true").csv(dir)
    assert(checksum(back) == checksum(events))
    // the props column holds JSON with commas/quotes — must survive quoting
    assert(back.filter(get_json_object(col("props"), "$.k").isNull).count() == 0)
  }

  test("parquet streaming sink via foreachBatch") {
    val dir = "target/test-sources/stream-parquet"
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
    }
    rm(new java.io.File(dir)) // append-mode sink must start empty on rerun
    val mem = MemoryStream[graft.model.LogFrame]
    mem.addData((0 until 50).map(i => graft.model.LogFrame(1468244340L + i, s"u$i")): _*)
    val q = mem.toDF().writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        batch.write.mode("append").parquet(dir); ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    assert(spark.read.parquet(dir).count() == 50)
  }

  test("stream-stream lookback join matches only in-window pairs") {
    def s(sec: Long) = timestamp_seconds(lit(sec))
    val clicks = MemoryStream[(Long, Long, Long)]   // (key, sec, id)
    val purchases = MemoryStream[(Long, Long, Long)]
    def shape(m: MemoryStream[(Long, Long, Long)]) =
      m.toDF().select(col("_1").as("key"),
        timestamp_seconds(col("_2")).as("t"), col("_3").as("id"))

    val joined = StreamJoins.withinLookback(
      shape(clicks), shape(purchases), watermark = "1 minute", lookback = "10 minutes")
    val q = joined.writeStream.format("memory").queryName("ssj_probe")
      .outputMode("append").start()
    try {
      clicks.addData((1L, 1000L, 1L), (1L, 1500L, 2L), (2L, 1000L, 3L),
        (1L, 2000L, 4L))                             // click AFTER purchase
      purchases.addData((1L, 1600L, 100L))
      q.processAllAvailable()
      // advance both watermarks
      clicks.addData((9L, 99000L, 9L)); purchases.addData((9L, 99000L, 9L))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("ssj_probe")
      .filter(col("key") =!= 9L)   // the watermark sentinels join each other
      .select(col("left_id"), col("right_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // clicks 1 and 2 (key 1, within 10 min before purchase@1600) match;
    // click 3 is another key; click 4 is after the purchase
    assert(rows == Set((1L, 100L), (2L, 100L)))
  }

  test("AvroIO round-trips scalars incl. nulls; rejects non-scalar schemas") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("s", StringType),
      StructField("d", DoubleType), StructField("b", BooleanType)))
    val rows = Seq(
      org.apache.spark.sql.Row(1L, "a,b\"c", 1.5, true),
      org.apache.spark.sql.Row(2L, null, null, false),
      org.apache.spark.sql.Row(null, "", -0.0, null))
    val df = spark.createDataFrame(
      new java.util.ArrayList(rows.asJava), schema).repartition(3)
    val dir = java.nio.file.Files.createTempDirectory("avro_spec_").toString
    graft.sources.AvroIO.write(df, dir)
    val back = graft.sources.AvroIO.read(spark, dir, schema)
    assert(back.schema == schema)
    assert(back.collect().toSet == rows.toSet)
    intercept[IllegalArgumentException] {
      graft.sources.AvroIO.avroSchemaFor(
        StructType(Seq(StructField("a", MapType(LongType, StringType)))), "r")
    }
  }

  test("AvroIO round-trips decimal logical type, enum and fixed overrides") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("k", LongType),
      StructField("price", DecimalType(12, 2)),
      StructField("status", StringType),
      StructField("tag", BinaryType)))
    def dec(s: String) = new java.math.BigDecimal(s).setScale(2)
    val rows = Seq(
      org.apache.spark.sql.Row(1L, dec("12345.67"), "P", Array[Byte](1, 2, 3, 4)),
      org.apache.spark.sql.Row(2L, dec("-0.01"), "F", Array[Byte](-1, 0, 127, -128)),
      org.apache.spark.sql.Row(3L, null, null, null))
    val df = spark.createDataFrame(
      new java.util.ArrayList(rows.asJava), schema).repartition(2)
    val enumS = org.apache.avro.Schema.createEnum(
      "st", null, "graft.avro", java.util.Arrays.asList("P", "O", "F"))
    val fixedS = org.apache.avro.Schema.createFixed("t4", null, "graft.avro", 4)
    val dir = java.nio.file.Files.createTempDirectory("avro_log_").toString
    graft.sources.AvroIO.write(df, dir,
      Map("status" -> enumS, "tag" -> fixedS))
    // the wire really is enum/fixed/decimal-bytes, not strings
    val wire = graft.sources.AvroIO.avroSchemaFor(schema, "row",
      Map("status" -> enumS, "tag" -> fixedS))
    assert(wire.getField("status").schema().getTypes.asScala
      .exists(_.getType == org.apache.avro.Schema.Type.ENUM))
    assert(wire.getField("tag").schema().getTypes.asScala
      .exists(_.getType == org.apache.avro.Schema.Type.FIXED))
    assert(wire.getField("price").schema().getTypes.asScala
      .exists(s => s.getType == org.apache.avro.Schema.Type.BYTES &&
        s.getLogicalType.isInstanceOf[org.apache.avro.LogicalTypes.Decimal]))
    val back = graft.sources.AvroIO.read(spark, dir, schema)
    assert(back.schema == schema)
    val got = back.collect().sortBy(_.getLong(0))
    got.zip(rows).foreach { case (g, w) =>
      (0 to 2).foreach(i => assert(g.get(i) == w.get(i), s"field $i"))
      (g.get(3), w.get(3)) match {
        case (null, null) =>
        case (gb: Array[Byte], wb: Array[Byte]) => assert(gb.sameElements(wb))
        case other => fail(s"fixed mismatch: $other")
      }
    }
    // incompatible override (enum on a long field) fails at build time
    intercept[IllegalArgumentException] {
      graft.sources.AvroIO.avroSchemaFor(schema, "row", Map("k" -> enumS))
    }
  }

  test("AvroIO round-trips arrays, nested records, maps, binary, timestamp-micros") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("k", LongType),
      StructField("emb", ArrayType(DoubleType)),
      StructField("ts", TimestampType),
      StructField("d", DateType),
      StructField("meta", StructType(Seq(
        StructField("a", LongType), StructField("n", IntegerType)))),
      StructField("m", MapType(StringType, LongType)),
      StructField("bin", BinaryType)))
    val t1 = java.sql.Timestamp.valueOf("2024-05-01 12:34:56.123456")
    val t0 = java.sql.Timestamp.valueOf("1969-12-31 23:59:59.000001") // pre-epoch micros
    val d1 = java.sql.Date.valueOf("2024-05-01")
    val d0 = java.sql.Date.valueOf("1969-06-15") // pre-epoch days
    val rows = Seq(
      org.apache.spark.sql.Row(1L, Seq(1.5, -2.5, 0.0), t1, d1,
        org.apache.spark.sql.Row(7L, 3), Map("x" -> 1L, "y" -> 2L),
        Array[Byte](1, 2, 3)),
      org.apache.spark.sql.Row(2L, Seq.empty[Double], t0, d0,
        org.apache.spark.sql.Row(null, null), Map.empty[String, Long], null),
      org.apache.spark.sql.Row(3L, null, null, null, null, null, Array[Byte]()))
    val df = spark.createDataFrame(
      new java.util.ArrayList(rows.asJava), schema).repartition(2)
    val dir = java.nio.file.Files.createTempDirectory("avro_cpx_").toString
    graft.sources.AvroIO.write(df, dir)
    val back = graft.sources.AvroIO.read(spark, dir, schema)
    assert(back.schema == schema)
    val got = back.collect().sortBy(_.getLong(0))
    // binary compares by reference inside Row — check fields explicitly
    got.zip(rows).foreach { case (g, w) =>
      (0 to 5).foreach(i => assert(g.get(i) == w.get(i), s"field $i"))
      (g.get(6), w.get(6)) match {
        case (null, null) =>
        case (gb: Array[Byte], wb: Array[Byte]) => assert(gb.sameElements(wb))
        case other => fail(s"binary mismatch: $other")
      }
    }
  }

  test("AvroIO read resolves fields by name, not position") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("a", LongType), StructField("b", StringType)))
    val df = spark.createDataFrame(
      new java.util.ArrayList(Seq(
        org.apache.spark.sql.Row(1L, "one"),
        org.apache.spark.sql.Row(2L, "two")).asJava), schema)
    val dir = java.nio.file.Files.createTempDirectory("avro_name_").toString
    graft.sources.AvroIO.write(df, dir)
    // reordered + projected read schema: values must follow NAMES
    val reordered = StructType(Seq(StructField("b", StringType)))
    val got = graft.sources.AvroIO.read(spark, dir, reordered)
      .collect().map(_.getString(0)).toSet
    assert(got == Set("one", "two"))
    // a name absent from the writer schema fails loudly
    val ex = intercept[org.apache.spark.SparkException] {
      graft.sources.AvroIO.read(spark, dir,
        StructType(Seq(StructField("nope", LongType)))).collect()
    }
    assert(ex.getMessage.contains("nope") ||
      Option(ex.getCause).exists(_.getMessage.contains("nope")))
    // early-stop consumer (limit) — completion listener closes the stream
    assert(graft.sources.AvroIO.read(spark, dir, schema).limit(1).count() == 1L)
  }
}
