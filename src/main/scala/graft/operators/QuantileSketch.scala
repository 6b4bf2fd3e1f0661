package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mergeable quantile sketch: a bottom-k-by-hash uniform sample.
  *
  * `approx_quantiles_price` covers one-shot approximate quantiles inside
  * a single query; THIS is the warehouse's other quantile shape — the
  * PERSISTED sketch table (KmvSketch's pattern, for order statistics):
  * per-group sketches of k (hash, value) rows are stored once, and any
  * later quantile question — per group, or over any UNION of groups —
  * is answered from sketch rows alone, never re-touching raw data.
  * Keeping the rows with the k smallest key-hashes is a uniform sample
  * of the group's rows (the hash is a random permutation of keys), and
  * merging sketches = union → re-top-k under the same hash order, which
  * is EXACTLY the bottom-k sample of the merged population — the
  * property t-digest/GK sketches get approximately, bottom-k gets by
  * construction. Unlike t-digest (implementation-defined centroids),
  * every step here is order statistics over a portable md5-prefix hash,
  * so a DuckDB oracle replays sketch, merge, and estimates bit-for-bit:
  * an exactly-gateable mergeable quantile sketch. Rank ties on the hash
  * (a non-unique key, or a collision — prefer ≥60 bits over the 40-bit
  * dedup convention) are broken by value, so the sketch's value multiset
  * is uniquely determined even then; ties do bias the "uniform sample"
  * claim marginally, which is why the hash should still be wide.
  *
  * Estimator: discrete quantile over the sketch values — the value at
  * ascending rank ceil(q·n) (exact on groups with ≤ k rows, sampling
  * error ~1/√k above). Rank arithmetic is integer on both engines.
  *
  * Scale shape: phase 1 is one group-partitioned window over the raw
  * relation (state = one group's rows per task — for heavy groups,
  * pre-thin with a per-partition bottom-k before the shuffle); every
  * later stage runs on n_groups × k rows, driver-scale at any corpus
  * size.
  */
object QuantileSketch {

  /** Per-group sketch rows (_qk_g, _qk_h, _qk_v): the k rows with the
    * smallest key-hashes. `hashCol` must be a deterministic per-row hash
    * so retries and the oracle agree; rank ties on the hash (a non-unique
    * key, or a collision) are broken by VALUE, so even then the sketch's
    * value multiset — all that downstream quantiles see — is uniquely
    * determined. */
  def sketch(rows: DataFrame, groupCol: Column, hashCol: Column,
             valueCol: Column, k: Int): DataFrame =
    rows.select(groupCol.as("_qk_g"), hashCol.as("_qk_h"), valueCol.as("_qk_v"))
      .withColumn("_qk_r", row_number().over(
        Window.partitionBy(col("_qk_g")).orderBy(col("_qk_h"), col("_qk_v"))))
      .filter(col("_qk_r") <= k)
      .drop("_qk_r")

  /** Merge sketch rows into ONE sketch under a new label: union → keep
    * the k smallest hashes (value tie-break, as in `sketch`). Identical
    * to sketching the concatenated population (hash order is global), so
    * merged estimates carry the same guarantee as direct ones. Input is
    * sketch rows only. */
  def merge(sketchRows: DataFrame, label: String, k: Int): DataFrame =
    // global top-k as orderBy + limit → TakeOrderedAndProject (per-partition
    // k then one k-row reduction), NOT a single-partition global sort window
    sketchRows
      .orderBy(col("_qk_h"), col("_qk_v"))
      .limit(k)
      .select(lit(label).as("_qk_g"), col("_qk_h"), col("_qk_v"))

  /** (scope, q, est) for each requested quantile from sketch rows only:
    * est = the sketch value at ascending value-rank ceil(q·n). Ranks are
    * integer arithmetic; ties in value order are harmless (any total
    * order over equal values selects the same value). */
  def quantiles(sketchRows: DataFrame, qs: Seq[Double]): DataFrame = {
    val ranked = sketchRows
      .withColumn("_qk_r", row_number().over(
        Window.partitionBy(col("_qk_g")).orderBy(col("_qk_v"), col("_qk_h"))))
      .withColumn("_qk_n", count(lit(1)).over(Window.partitionBy(col("_qk_g"))))
    val targets = qs.map(q =>
      struct(lit(q).as("q"), ceil(lit(q) * col("_qk_n")).as("t")))
    ranked.select(col("_qk_g"), col("_qk_r"), col("_qk_v"),
        explode(array(targets: _*)).as("qt"))
      .filter(col("_qk_r") === col("qt.t"))
      .select(col("_qk_g").as("scope"), col("qt.q").as("q"),
        col("_qk_v").as("est"))
  }
}
