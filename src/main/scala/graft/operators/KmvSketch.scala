package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** KMV (k-minimum-values) distinct-count sketch — the MERGEABLE sketch
  * pattern a 100 TB warehouse runs on: per-partition/per-group sketches
  * are persisted as tiny tables (k longs per group, regardless of group
  * size) and re-aggregated WITHOUT touching raw data — union the sketch
  * rows, dedup, keep the k smallest. Unlike HLL (whose register layout is
  * implementation-private), KMV is pure order statistics over an
  * engine-portable hash, so a DuckDB oracle replays sketches, merges, and
  * estimates BIT-FOR-BIT — an exactly-gateable mergeable sketch.
  *
  * Estimator (Bar-Yossef et al. 2002): with h_k the k-th smallest of the
  * distinct 40-bit hashes, D̂ = (k−1)·2⁴⁰/h_k; groups with fewer than k
  * distinct hashes are exact by their sketch size.
  *
  * Scale shape: input is the DISTINCT (group, hash) relation (map-side
  * combinable distinct); the per-group k-smallest is a group-partitioned
  * window (state = one group's hashes per task); every downstream stage —
  * estimates, merges, global estimate — runs on sketch rows only:
  * n_groups × k longs, driver-scale metadata at any corpus size.
  */
object KmvSketch {

  /** The 40-bit hash domain size (md5-prefix convention, DedupOps). */
  val Space: Double = 1099511627776.0 // 2^40

  /** Per-group sketch rows (group, h) — the k smallest hashes per group
    * from a distinct (group, h) relation. The rank is a filter-internal
    * detail, not part of the sketch schema (h-ascending order recovers
    * it whenever needed). */
  def sketch(hashed: DataFrame, groupCol: Column, hCol: Column, k: Int): DataFrame =
    hashed.select(groupCol.as("_kmv_g"), hCol.as("_kmv_h"))
      .withColumn("_kmv_r", row_number().over(
        Window.partitionBy(col("_kmv_g")).orderBy(col("_kmv_h"))))
      .filter(col("_kmv_r") <= k)
      .drop("_kmv_r")

  /** Merge sketch rows into ONE sketch under a new group label: union →
    * dedup hashes → keep the k smallest. Global top-k as orderBy + limit
    * → TakeOrderedAndProject (per-partition k, then one k-row
    * reduction), NOT a single-partition global-sort window. */
  def merge(sketchRows: DataFrame, label: String, k: Int): DataFrame =
    sketchRows.select(col("_kmv_h")).distinct()
      .orderBy(col("_kmv_h"))
      .limit(k)
      .select(lit(label).as("_kmv_g"), col("_kmv_h"))

  /** All-pairs INTERSECTION estimates from sketch rows only — the
    * warehouse "overlap between any two sources" matrix computed without
    * re-touching raw data (Beyer et al. 2007's ρ·D̂ estimator): for each
    * unordered group pair, take the k smallest hashes of the UNION of the
    * two sketches; ρ = the fraction of those union minima present in BOTH
    * sketches; D̂_∩ = ρ · D̂_union. Exact below saturation (ρ·n_union =
    * |A∩B| when the union sketch holds every hash). Everything is
    * order statistics + one double formula, so an oracle replays it
    * bit-for-bit. Cost: pairs × 2k sketch rows — driver-scale metadata
    * regardless of corpus size. Returns
    * (g1, g2, n_union, n_both, est_intersection). */
  def pairIntersectEstimates(sk: DataFrame, k: Int): DataFrame = {
    val gs = sk.select(col("_kmv_g")).distinct()
    val pairs = gs.select(col("_kmv_g").as("g1"))
      .crossJoin(gs.select(col("_kmv_g").as("g2")))
      .filter(col("g1") < col("g2"))
    val rows = pairs.join(sk, col("_kmv_g") === col("g1"))
      .select(col("g1"), col("g2"), col("_kmv_h"))
      .unionByName(pairs.join(sk, col("_kmv_g") === col("g2"))
        .select(col("g1"), col("g2"), col("_kmv_h")))
      .distinct()
    val minima = rows.withColumn("_kmv_r", row_number().over(
        Window.partitionBy(col("g1"), col("g2")).orderBy(col("_kmv_h"))))
      .filter(col("_kmv_r") <= k)
    val inA = sk.select(col("_kmv_g").as("g1"), col("_kmv_h"))
      .withColumn("_kmv_a", lit(1))
    val inB = sk.select(col("_kmv_g").as("g2"), col("_kmv_h"))
      .withColumn("_kmv_b", lit(1))
    minima
      .join(inA, Seq("g1", "_kmv_h"), "left")
      .join(inB, Seq("g2", "_kmv_h"), "left")
      .groupBy(col("g1"), col("g2"))
      .agg(count(lit(1)).as("n_union"), max(col("_kmv_h")).as("_kmv_hk"),
        sum(when(col("_kmv_a") === 1 && col("_kmv_b") === 1, 1)
          .otherwise(0)).as("n_both"))
      .select(col("g1"), col("g2"), col("n_union"), col("n_both"),
        round((col("n_both").cast("double") / col("n_union")) *
          (when(col("n_union") < k, col("n_union").cast("double"))
            .otherwise(lit((k - 1).toDouble * Space) / col("_kmv_hk"))), 4)
          .as("est_intersection"))
  }

  /** (scope, sketch_n, est) per group from sketch rows: exact when the
    * sketch is unsaturated, (k−1)·2⁴⁰/h_k otherwise, rounded to 4 dp. */
  def estimate(sketchRows: DataFrame, k: Int): DataFrame =
    sketchRows.groupBy(col("_kmv_g").as("scope"))
      .agg(count(lit(1)).as("sketch_n"), max(col("_kmv_h")).as("_kmv_hk"))
      .select(col("scope"), col("sketch_n"),
        round(when(col("sketch_n") < k, col("sketch_n").cast("double"))
          .otherwise(lit((k - 1).toDouble * Space) / col("_kmv_hk")), 4).as("est"))
}
