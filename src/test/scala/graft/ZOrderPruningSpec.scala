package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import graft.functions.BitOps

/** Proof that the `zorder_layout` keys buy actual scan pruning — the
  * payoff VERDICT r2 item 7 asked to demonstrate, not just compute.
  *
  * Two physical layouts of the same orders-derived table, same file count:
  * round-robin (every file spans the full (x, y) range → every parquet
  * footer's min/max covers any predicate → nothing prunes) vs range-
  * partitioned + sorted by the Morton-interleaved zkey (each file covers a
  * contiguous z-range → tight min/max on BOTH x and y → a 2-D box
  * predicate's pushed filters skip whole row groups at the footer).
  *
  * The assertion is on the scan's own numOutputRows — rows actually
  * materialized from parquet BEFORE Spark's Filter node — which is exactly
  * what row-group skipping reduces. Measured numbers go to SCALING.md.
  */
class ZOrderPruningSpec extends SparkSpec {

  private val sf01 = "/root/testdata/sf0.01"
  // 32 files ≈ 470-row row groups at sf0.01 — the granularity knob; a real
  // ingest gets the same effect from ~128 MB row groups over billions of rows
  private val files = 32

  /** orders → (o_orderkey, x, y, zkey): x = custkey, y = order-day offset —
    * comparable spreads (~1.5 k vs ~2.5 k) so the interleave mixes both
    * dimensions' bits at the same depths, as a real ingest would ensure by
    * normalizing dimensions before z-ordering. */
  private def keyed: DataFrame = {
    val o = graft.sources.Tables.orders(spark, sf01)
    val minDay = o.agg(min(expr("unix_timestamp(o_orderdate) div 86400")))
      .head().getLong(0)
    o.select(col("o_orderkey"),
        col("o_custkey").as("x"),
        (expr("unix_timestamp(o_orderdate) div 86400") - lit(minDay)).as("y"))
      .withColumn("zkey", BitOps.zorder2(
        col("x").bitwiseAND(lit(65535L)), col("y").bitwiseAND(lit(65535L))))
  }

  /** Rows the parquet reader materialized (post row-group skip, pre
    * Filter). AQE off so the executed plan holds the live scan node. */
  private def rowsScanned(df: DataFrame): (Long, Long) = {
    df.collect()
    val scan = df.queryExecution.executedPlan.collect {
      case f: FileSourceScanExec => f
    }.head
    (scan.metrics("numOutputRows").value, df.count())
  }

  test("z-sorted layout prunes a 2-D box predicate; round-robin layout cannot") {
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val unsortedDir = "target/test-zorder-unsorted"
      val zsortedDir = "target/test-zorder-sorted"
      keyed.repartition(files)
        .write.mode("overwrite").parquet(unsortedDir)
      keyed.repartitionByRange(files, col("zkey"))
        .sortWithinPartitions(col("zkey"))
        .write.mode("overwrite").parquet(zsortedDir)

      def box(df: DataFrame): DataFrame =
        df.filter(col("x").between(200L, 400L) && col("y").between(400L, 800L))

      val (unsortedRead, unsortedRows) = rowsScanned(box(spark.read.parquet(unsortedDir)))
      val (zsortedRead, zsortedRows) = rowsScanned(box(spark.read.parquet(zsortedDir)))

      // same answer from both layouts
      assert(unsortedRows == zsortedRows && unsortedRows > 0)
      // round-robin: every row group overlaps the box → full table read
      val total = spark.read.parquet(unsortedDir).count()
      assert(unsortedRead == total,
        s"expected no pruning on round-robin, read $unsortedRead of $total")
      // z-sorted: the box lives in few z-ranges → most row groups skipped
      assert(zsortedRead * 3 <= unsortedRead,
        s"z-order pruning too weak: $zsortedRead vs $unsortedRead rows scanned")
      info(s"2-D box: z-sorted scanned $zsortedRead rows, round-robin " +
        s"$unsortedRead (total $total, matches $unsortedRows)")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  test("z-sorted layout also prunes single-dimension predicates") {
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val zsortedDir = "target/test-zorder-sorted-1d"
      keyed.repartitionByRange(files, col("zkey"))
        .sortWithinPartitions(col("zkey"))
        .write.mode("overwrite").parquet(zsortedDir)
      val total = spark.read.parquet(zsortedDir).count()
      // each dimension alone: z-range files still bound BOTH x and y, so a
      // 1-D slice skips the row groups whose slab misses it — weaker than
      // the 2-D box (that's the z-order trade) but far from a full scan
      val (xRead, xRows) = rowsScanned(
        spark.read.parquet(zsortedDir).filter(col("x").between(200L, 400L)))
      val (yRead, yRows) = rowsScanned(
        spark.read.parquet(zsortedDir).filter(col("y").between(400L, 800L)))
      assert(xRows > 0 && yRows > 0)
      assert(xRead < total, s"x-slice read everything: $xRead of $total")
      assert(yRead < total, s"y-slice read everything: $yRead of $total")
      info(s"1-D slices over z-sorted: x read $xRead, y read $yRead of $total")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }
}
