package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Batch table access over the driver-provided parquet star schema
  * (TESTDATA.md). One method per table keeps call sites typo-proof; all
  * reads are plain `spark.read.parquet` so Catalyst's parquet source
  * handles column pruning + predicate pushdown (verify via
  * `.explain("formatted")`: `PushedFilters`, `ReadSchema`).
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's TimestampType
    * (µs) cannot represent — the reader rejects it outright
    * ([PARQUET_TYPE_ILLEGAL]). Read the raw int64 nanos via the
    * `nanosAsLong` conf and floor-convert to µs in-plan, preserving the
    * public schema contract (`ts: TimestampType`). Integer `DIV` keeps the
    * math in long space (an epoch-ns ≈ 1.7e18 overflows double precision).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(spark, dir, "events")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts DIV 1000")))
  }
  def lineitem(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame     = table(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame       = table(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame     = table(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame     = table(spark, dir, "region")
  def documents(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
}
