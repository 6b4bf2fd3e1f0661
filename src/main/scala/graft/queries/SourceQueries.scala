package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StringType, StructField, StructType}
import graft.sources.Tables

/** File-format source/sink surface beyond parquet: CSV, JSON-lines, and
  * ORC writers + schema'd readers (SURVEY §2.3 "file formats: none in
  * code" — inherited from Spark, surfaced here as a gated operator).
  *
  * The gate query proves the full write→read cycle preserves values: it
  * writes `orders` to CSV, JSON-lines, and ORC, reads each back through
  * explicit schemas (schema-on-read; no sampling inference pass at scale),
  * and aggregates each — the oracle is the same aggregate computed by
  * DuckDB straight from parquet, so any encode/decode drift (quoting,
  * escaping, double formatting) breaks the hash match.
  *
  * Scale notes: the writers shard per input partition (no coalesce — a
  * single-file write would serialize the job); doubles round-trip exactly
  * through both formats (Java's shortest-repr `Double.toString` is
  * read-back exact); CSV strings are quoted only when needed.
  */
object SourceQueries {

  private val roundtripSchema = StructType(Seq(
    StructField("o_orderkey", LongType),
    StructField("o_orderstatus", StringType),
    StructField("o_totalprice", DoubleType)))

  // exact integer cents, not round(sum(double), 2): a 2-dp-rounded double
  // sum over fact-scale prices is summation-order-dependent — the r11
  // fixed-point class; avro_roundtrip flipped a cent on 2/3 statuses at
  // the 100× corpus (format_roundtrip shares this helper and had only
  // passed there on order luck)
  private def statusAgg(df: DataFrame, fmt: String): DataFrame =
    df.groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
        sum(round(col("o_totalprice") * 100).cast("long")).as("total_price_fp"))
      .withColumn("fmt", lit(fmt))

  private val formatRoundtrip: Q = (s, dir) => {
    // per-(sfDir, process) scratch dir — see queries.scratchPath
    val fmtDir = scratchPath("fmt", dir)
    val base = Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    base.write.mode("overwrite").option("header", "true").csv(s"$fmtDir/csv")
    base.write.mode("overwrite").json(s"$fmtDir/json")
    // ORC: the columnar alternative (predicate pushdown + column pruning
    // like parquet); vectorized reader, schema from the file footer
    base.write.mode("overwrite").orc(s"$fmtDir/orc")
    val csv = s.read.schema(roundtripSchema)
      .option("header", "true").csv(s"$fmtDir/csv")
    val json = s.read.schema(roundtripSchema).json(s"$fmtDir/json")
    val orc = s.read.schema(roundtripSchema).orc(s"$fmtDir/orc")
    statusAgg(csv, "csv").unionByName(statusAgg(json, "json"))
      .unionByName(statusAgg(orc, "orc"))
  }

  private val formatRoundtripSql =
    """WITH a AS (SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_orders,
      |                  CAST(sum(round(o_totalprice * 100)) AS BIGINT) AS total_price_fp
      |           FROM orders GROUP BY 1)
      |SELECT o_orderstatus, n_orders, total_price_fp, 'csv' AS fmt FROM a
      |UNION ALL
      |SELECT o_orderstatus, n_orders, total_price_fp, 'json' AS fmt FROM a
      |UNION ALL
      |SELECT o_orderstatus, n_orders, total_price_fp, 'orc' AS fmt FROM a""".stripMargin

  /** Avro write→read→aggregate — same contract as `format_roundtrip`
    * for the one format the reference names but never uses (dead serde
    * deps, pom.xml:79–93). Sharded executor-side writer + schema'd
    * distributed reader from graft.sources.AvroIO (the container has
    * avro-core but no spark-avro module). Oracle: the same aggregate
    * computed parquet-direct — any Avro encode/decode drift breaks the
    * hash. */
  private val avroRoundtrip: Q = (s, dir) => {
    val avroDir = s"${scratchPath("fmt", dir)}/avro"
    val base = Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    graft.sources.AvroIO.write(base, avroDir)
    statusAgg(graft.sources.AvroIO.read(s, avroDir, roundtripSchema), "avro")
  }

  private val avroRoundtripSql =
    """SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_orders,
      |       CAST(sum(round(o_totalprice * 100)) AS BIGINT) AS total_price_fp,
      |       'avro' AS fmt
      |FROM orders GROUP BY 1""".stripMargin

  /** Complex-typed Avro round-trip: array<double>, a timestamp-micros
    * logical-type column, and a nested record, written and read back
    * through AvroIO's recursive converters. Built from the embeddings
    * table (vec_id, embedding: array<float>, label) with a
    * deterministically derived timestamp, so the DuckDB oracle can
    * recompute the post-roundtrip aggregate parquet-direct:
    *  - `e1_scaled_sum` pins element values exactly (first element
    *    scaled to an integer — float→double widening is IEEE-exact and
    *    identical in both engines, no float-sum ordering drift);
    *  - `total_dims` pins array lengths through the nested record path
    *    (meta.n travels as a record field);
    *  - `max_ts` pins the micros logical type end-to-end. */
  private val avroComplexRoundtrip: Q = (s, dir) => {
    val avroDir = s"${scratchPath("fmt", dir)}/avro_complex"
    val base = Tables.embeddings(s, dir).select(
      col("vec_id"),
      col("embedding").cast("array<double>").as("emb"),
      timestamp_micros(col("vec_id") * lit(1000000L)).as("ts"),
      struct(col("label").cast("long").as("a"),
        size(col("embedding")).as("n")).as("meta"))
    graft.sources.AvroIO.write(base, avroDir)
    val back = graft.sources.AvroIO.read(s, avroDir, base.schema)
    back.groupBy((col("vec_id") % 10).as("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        sum(round(element_at(col("emb"), 1) * 1e6).cast("long")).as("e1_scaled_sum"),
        max(col("ts")).as("max_ts"),
        sum(col("meta.n").cast("long")).as("total_dims"),
        sum(col("meta.a")).as("label_sum"))
  }

  private val avroComplexRoundtripSql =
    """SELECT vec_id % 10 AS bucket, CAST(count(*) AS BIGINT) AS n_rows,
      |       CAST(sum(CAST(round(CAST(embedding[1] AS DOUBLE) * 1e6) AS BIGINT)) AS BIGINT) AS e1_scaled_sum,
      |       make_timestamp(max(vec_id) * 1000000) AS max_ts,
      |       CAST(sum(len(embedding)) AS BIGINT) AS total_dims,
      |       CAST(sum(label) AS BIGINT) AS label_sum
      |FROM embeddings GROUP BY 1""".stripMargin

  /** The Avro logical/wire-type tail — decimal, enum, fixed — gated
    * end-to-end: orders' price travels as a `decimal(12,2)` logical type
    * (unscaled bytes), status as a true Avro ENUM (symbols P/O/F — the
    * writer schema names the symbol set, not a string), and a
    * deterministic 4-byte md5-prefix tag as FIXED(4), via AvroIO's
    * schema-override write. Read back at Spark types (decimal, string,
    * binary) and aggregated; the oracle recomputes parquet-direct.
    *  - `price_sum` (decimal sum emitted as STRING) pins the decimal
    *    scale and every unscaled digit through the bytes round-trip —
    *    a scale slip or dropped sign byte changes the string;
    *  - group-by `status` pins enum symbol fidelity;
    *  - `min_tag`/`max_tag` (hex of the fixed bytes) pin the fixed
    *    payload byte-for-byte across the whole table. */
  private val avroLogicalRoundtrip: Q = (s, dir) => {
    val avroDir = s"${scratchPath("fmt", dir)}/avro_logical"
    val base = Tables.orders(s, dir).select(
      col("o_orderkey"),
      col("o_totalprice").cast("decimal(12,2)").as("price"),
      col("o_orderstatus").as("status"),
      unhex(substring(md5(col("o_orderkey").cast("string")), 1, 8)).as("tag"))
    val enumSchema = org.apache.avro.Schema.createEnum(
      "order_status", null, "graft.avro",
      java.util.Arrays.asList("P", "O", "F"))
    val fixedSchema = org.apache.avro.Schema.createFixed(
      "tag4", null, "graft.avro", 4)
    graft.sources.AvroIO.write(base, avroDir,
      Map("status" -> enumSchema, "tag" -> fixedSchema))
    val back = graft.sources.AvroIO.read(s, avroDir, base.schema)
    back.groupBy(col("status"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("price")).cast("string").as("price_sum"),
        min(hex(col("tag"))).as("min_tag"),
        max(hex(col("tag"))).as("max_tag"))
  }

  private val avroLogicalRoundtripSql =
    """SELECT o_orderstatus AS status, CAST(count(*) AS BIGINT) AS n_orders,
      |       CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS VARCHAR) AS price_sum,
      |       min(upper(substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))) AS min_tag,
      |       max(upper(substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))) AS max_tag
      |FROM orders GROUP BY 1""".stripMargin

  /** Hive-style partitioned layout: write orders partitioned by
    * o_orderstatus (one directory per value — the physical layout that
    * lets a reader skip whole partitions), read it back filtered to one
    * status, and aggregate by priority. The filter must be satisfied by
    * PARTITION PRUNING (directory listing, zero data files of other
    * statuses opened) — PlanAuditSpec pins `PartitionFilters` on the
    * scan. Oracle computes the same aggregate parquet-direct. */
  private val partitionedRoundtrip: Q = (s, dir) => {
    val outDir = scratchPath("part", dir)
    Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_orderpriority"),
        col("o_totalprice"), col("o_orderstatus"))
      .write.mode("overwrite").partitionBy("o_orderstatus").parquet(outDir)
    s.read.parquet(outDir)
      .filter(col("o_orderstatus") === "F")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        sum(round(col("o_totalprice") * 100).cast("long")).as("total_price_fp"))
  }

  private val partitionedRoundtripSql =
    """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders,
      |       CAST(sum(round(o_totalprice * 100)) AS BIGINT) AS total_price_fp
      |FROM orders WHERE o_orderstatus = 'F' GROUP BY 1""".stripMargin

  // ── bucketed write + co-located ZERO-shuffle join ──────────────────────
  // The other half of the layout story (zorder_layout covers scan
  // locality; this covers JOIN locality): write both sides bucketed and
  // sorted on the join key, and the sort-merge join needs no exchange —
  // at 100 TB this is the difference between re-shuffling two fact
  // tables per query and shuffling once at ingest. The repartition(8,
  // key) before each write matches Spark's bucket hashing, so every
  // bucket is exactly one file. (Per-bucket Sort nodes remain: since
  // Spark 3.0 the bucketed scan reports partitioning but not sortBy
  // order — SPARK-28595; the sorts are in-memory per bucket.) Table names carry the scratch tag (sfDir + pid)
  // so concurrent gates over different dirs/processes never collide in
  // the shared session catalog. The merge hint forces the SMJ path (the
  // dim side is small enough to broadcast at gate scale, which would
  // hide the bucketing evidence); the follow-up per-customer aggregate
  // reuses the join's clustering, so the WHOLE plan is exchange-free —
  // PlanAuditSpec pins that.
  private val bucketedJoinColocated: Q = (s, dir) => {
    val outDir = scratchPath("bkt", dir)
    val tag = outDir.substring(outDir.lastIndexOf("graft_bkt_") + "graft_bkt_".length)
      .replaceAll("[^a-zA-Z0-9_]", "_")
    val ordT = s"graft_bkt_orders_$tag"
    val custT = s"graft_bkt_customer_$tag"
    Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .repartition(8, col("o_custkey"))
      .write.mode("overwrite").option("path", s"$outDir/orders")
      .bucketBy(8, "o_custkey").sortBy("o_custkey")
      .saveAsTable(ordT)
    Tables.customer(s, dir)
      .select(col("c_custkey"), col("c_name"))
      .repartition(8, col("c_custkey"))
      .write.mode("overwrite").option("path", s"$outDir/customer")
      .bucketBy(8, "c_custkey").sortBy("c_custkey")
      .saveAsTable(custT)
    s.table(custT)
      .join(s.table(ordT).hint("merge"), col("c_custkey") === col("o_custkey"))
      .groupBy(col("c_custkey"), col("c_name"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice")), 2).as("total_spend"))
  }

  private val bucketedJoinColocatedSql =
    """SELECT c_custkey, c_name, CAST(count(*) AS BIGINT) AS n_orders,
      |       round(CAST(sum(o_totalprice) AS DOUBLE), 2) AS total_spend
      |FROM customer JOIN orders ON c_custkey = o_custkey
      |GROUP BY 1, 2""".stripMargin

  /** Small-file compaction — the operational pass every 100 TB lake runs:
    * a fragmented table (64 files here; in production, thousands of
    * per-micro-batch or per-task files whose open/footer costs dominate
    * the scan) is rewritten to a bounded file count by an exchange-only
    * job. Both layouts are asserted in-query (`require` on the physical
    * file counts), and the compacted table must be row-identical to the
    * source — compaction changes LAYOUT, never content. */
  private val compactSmallFiles: Q = (s, dir) => {
    val outDir = scratchPath("compact", dir)
    def parquetFiles(p: String): Long = {
      val stream = java.nio.file.Files.list(java.nio.file.Paths.get(p))
      try stream.filter(_.getFileName.toString.endsWith(".parquet")).count()
      finally stream.close()
    }
    val src = Tables.events(s, dir)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
    src.repartition(64).write.mode("overwrite").parquet(s"$outDir/small")
    require(parquetFiles(s"$outDir/small") == 64,
      "fragmented layout did not produce 64 files")
    s.read.parquet(s"$outDir/small")
      .repartition(4)
      .write.mode("overwrite").parquet(s"$outDir/compacted")
    require(parquetFiles(s"$outDir/compacted") == 4,
      "compaction did not produce 4 files")
    s.read.parquet(s"$outDir/compacted")
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
  }

  private val compactSmallFilesSql =
    "SELECT event_id, user_id, event_type, value FROM events"

  /** Schema evolution on read: two parquet batches written with DIFFERENT
    * schemas (the second adds a column — the additive evolution a
    * long-lived table accumulates), unified by `mergeSchema`; rows from
    * the narrow batch surface the new column as NULL. The oracle states
    * the same contract as a UNION with an explicit NULL fill. */
  private val schemaEvolutionRead: Q = (s, dir) => {
    val outDir = scratchPath("evolve", dir)
    val orders = Tables.orders(s, dir)
    orders.filter(pmod(col("o_orderkey"), lit(2)) === 0)
      .select(col("o_orderkey"), col("o_totalprice"))
      .write.mode("overwrite").parquet(s"$outDir/batch=1")
    orders.filter(pmod(col("o_orderkey"), lit(2)) === 1)
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"))
      .write.mode("overwrite").parquet(s"$outDir/batch=2")
    s.read.option("mergeSchema", "true").parquet(s"$outDir/batch=1", s"$outDir/batch=2")
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"))
  }

  private val schemaEvolutionReadSql =
    """SELECT o_orderkey, o_totalprice, CAST(NULL AS VARCHAR) AS o_orderpriority
      |FROM orders WHERE o_orderkey % 2 = 0
      |UNION ALL
      |SELECT o_orderkey, o_totalprice, o_orderpriority
      |FROM orders WHERE o_orderkey % 2 = 1""".stripMargin

  /** Dynamic partition overwrite — the partition-scoped BACKFILL
    * primitive: re-deliver one partition's corrected data without
    * touching its siblings. The gate writes events hive-partitioned by
    * event_type, then overwrites ONLY the `click` partition (values
    * re-derived ×2) with `partitionOverwriteMode=dynamic` — the mode
    * where the overwrite's scope is the set of partitions PRESENT IN THE
    * DATA, not the whole table. The oracle is the full relation with the
    * click rows transformed and every other type intact; under the
    * default STATIC mode the second write would have DELETED the four
    * untouched partitions, so the oracle's per-type counts prove the
    * dynamic semantics, not just the arithmetic. At 100 TB this is the
    * daily backfill shape: rewriting one day/source re-lists and
    * replaces one directory, never the table. (Write-side option, not a
    * session conf — no shared-session mutation.) */
  private val dynamicPartitionOverwrite: Q = (s, dir) => {
    val outDir = scratchPath("dpo", dir)
    val ev = Tables.events(s, dir).select(col("event_id"), col("user_id"),
      col("event_type"), round(col("value") * 100).cast("long").as("v_fp"))
    ev.write.mode("overwrite").partitionBy("event_type").parquet(outDir)
    ev.filter(col("event_type") === "click")
      .withColumn("v_fp", col("v_fp") * 2)
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("event_type").parquet(outDir)
    s.read.parquet(outDir).groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("v_fp")).as("sum_fp"))
  }

  private val dynamicPartitionOverwriteSql =
    """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
      |       CAST(sum(CASE WHEN event_type = 'click'
      |                     THEN CAST(round(value * 100) AS BIGINT) * 2
      |                     ELSE CAST(round(value * 100) AS BIGINT) END)
      |            AS BIGINT) AS sum_fp
      |FROM events GROUP BY 1""".stripMargin

  val all: Map[String, Q] = Map(
    "dynamic_partition_overwrite" -> dynamicPartitionOverwrite,
    "compact_small_files" -> compactSmallFiles,
    "schema_evolution_read" -> schemaEvolutionRead,
    "format_roundtrip" -> formatRoundtrip,
    "avro_roundtrip" -> avroRoundtrip,
    "avro_complex_roundtrip" -> avroComplexRoundtrip,
    "avro_logical_roundtrip" -> avroLogicalRoundtrip,
    "partitioned_roundtrip" -> partitionedRoundtrip,
    "bucketed_join_colocated" -> bucketedJoinColocated)

  val oracles: Map[String, String] = Map(
    "dynamic_partition_overwrite" -> dynamicPartitionOverwriteSql,
    "compact_small_files" -> compactSmallFilesSql,
    "schema_evolution_read" -> schemaEvolutionReadSql,
    "format_roundtrip" -> formatRoundtripSql,
    "avro_roundtrip" -> avroRoundtripSql,
    "avro_complex_roundtrip" -> avroComplexRoundtripSql,
    "avro_logical_roundtrip" -> avroLogicalRoundtripSql,
    "partitioned_roundtrip" -> partitionedRoundtripSql,
    "bucketed_join_colocated" -> bucketedJoinColocatedSql)
}
