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

  /** Per-group sketch rows (group, h, rnk ≤ k) from a distinct
    * (group, h) relation. */
  def sketch(hashed: DataFrame, groupCol: Column, hCol: Column, k: Int): DataFrame =
    hashed.select(groupCol.as("_kmv_g"), hCol.as("_kmv_h"))
      .withColumn("_kmv_r", row_number().over(
        Window.partitionBy(col("_kmv_g")).orderBy(col("_kmv_h"))))
      .filter(col("_kmv_r") <= k)

  /** Merge sketch rows into ONE sketch under a new group label: union →
    * dedup hashes → keep the k smallest. Input is sketch rows only
    * (n_groups × k), so the single-partition window is driver-scale. */
  def merge(sketchRows: DataFrame, label: String, k: Int): DataFrame =
    sketchRows.select(col("_kmv_h")).distinct()
      .withColumn("_kmv_r", row_number().over(Window.orderBy(col("_kmv_h"))))
      .filter(col("_kmv_r") <= k)
      .select(lit(label).as("_kmv_g"), col("_kmv_h"), col("_kmv_r"))

  /** (scope, sketch_n, est) per group from sketch rows: exact when the
    * sketch is unsaturated, (k−1)·2⁴⁰/h_k otherwise, rounded to 4 dp. */
  def estimate(sketchRows: DataFrame, k: Int): DataFrame =
    sketchRows.groupBy(col("_kmv_g").as("scope"))
      .agg(count(lit(1)).as("sketch_n"), max(col("_kmv_h")).as("_kmv_hk"))
      .select(col("scope"), col("sketch_n"),
        round(when(col("sketch_n") < k, col("sketch_n").cast("double"))
          .otherwise(lit((k - 1).toDouble * Space) / col("_kmv_hk")), 4).as("est"))
}
