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
    * (µs) cannot represent exactly. How the reader surfaces it is
    * version-dependent — Spark ≤ 4.0 rejected it unless the legacy
    * `nanosAsLong` conf exposed raw int64 nanos; Spark 4.1+ drops that
    * conf and infers TIMESTAMP_NTZ (floor ns → µs). Adapt on the ACTUAL
    * resolved type so the public contract (`ts: TimestampType`, µs,
    * session tz UTC) holds under either reader — and no session conf is
    * ever mutated here (the memoized relation is immune to conf races).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val raw = table(spark, dir, "events")
    val ts = raw.schema("ts").dataType match {
      case LongType         => graft.model.Schemas.tsFromNanos(col("ts"))
      case TimestampNTZType =>
        // the NTZ→Timestamp cast reinterprets the wall clock in the
        // SESSION timezone; the data's wall clock is UTC, so a non-UTC
        // session would silently shift every ts — fail loudly instead
        val tz = spark.sessionState.conf.sessionLocalTimeZone
        require(tz == "UTC",
          s"events.ts is TIMESTAMP_NTZ (UTC wall clock); session timezone is '$tz' — " +
            "set spark.sql.session.timeZone=UTC or the cast shifts every timestamp")
        col("ts").cast(TimestampType)
      case _                => col("ts")
    }
    raw.withColumn("ts", ts)
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
