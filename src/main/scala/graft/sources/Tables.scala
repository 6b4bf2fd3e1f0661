package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Batch table access over the driver-provided parquet star schema
  * (TESTDATA.md). One method per table keeps call sites typo-proof; all
  * reads are plain `spark.read.parquet` so Catalyst's parquet source
  * handles column pruning + predicate pushdown (verify via
  * `.explain("formatted")`: `PushedFilters`, `ReadSchema`).
  */
object Tables {
  // Memoized per (session, dir, name): a DataFrame is an immutable logical
  // plan, and reusing it reuses the resolved relation's file listing and
  // parquet footer schema — re-reading those per query was a flat ~0.1 s
  // tax on every entry in the registry. The testdata directories are
  // immutable for a session's lifetime, so the cached listing cannot go
  // stale; a session restart gets a fresh identity and fresh entries.
  // Keyed by the session object (SparkSession equality is identity), with
  // stopped sessions explicitly evicted on access — a WeakHashMap can't do
  // this job because the cached DataFrames strongly reference their session,
  // which would pin the "weak" entry forever.
  private val cache = new java.util.concurrent.ConcurrentHashMap[SparkSession,
    java.util.concurrent.ConcurrentHashMap[(String, String), DataFrame]]()

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    cache.keySet.removeIf(s => s.sparkContext.isStopped)
    cache.computeIfAbsent(spark,
        _ => new java.util.concurrent.ConcurrentHashMap[(String, String), DataFrame]())
      .computeIfAbsent((dir, name), _ => spark.read.parquet(s"$dir/$name.parquet"))
  }

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's TimestampType
    * (µs) cannot represent — the reader rejects it outright
    * ([PARQUET_TYPE_ILLEGAL]). Read the raw int64 nanos via the
    * `nanosAsLong` conf and floor-convert to µs in-plan
    * (`Schemas.tsFromNanos`), preserving the public schema contract
    * (`ts: TimestampType`).
    *
    * NOTE the conf is a session-level side effect by necessity (the parquet
    * reader has no per-read option for it): after this call, other readers
    * in the session will see nanos columns as LongType instead of erroring.
    * Confined to this loader + the streaming reader so the contract has one
    * owner.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(spark, dir, "events")
      .withColumn("ts", graft.model.Schemas.tsFromNanos(
        org.apache.spark.sql.functions.col("ts")))
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
