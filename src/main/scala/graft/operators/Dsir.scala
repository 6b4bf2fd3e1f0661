package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** DSIR-style data selection: hashed-n-gram importance weighting of a raw
  * corpus against a target domain (Xie et al. 2023, "Data Selection for
  * Language Models via Importance Resampling" — public paper). Both the
  * target and raw distributions are bags of word-bigrams hashed into a
  * small fixed bucket space; each document's log importance weight is the
  * sum over its bigram instances of log p_target(b) − log p_raw(b) with
  * add-α smoothing. High weights mark documents that look like the target
  * domain — the score a pretraining pipeline resamples by.
  *
  * Scale shape (the 100 TB contract): bigram fan-out is row-local
  * (arrays_zip of two slices — the LmScore shape; no window, no per-doc
  * shuffle); BOTH distributions come from ONE map-side-combinable groupBy
  * over the bucket key (the target count is a conditional sum inside the
  * same aggregate — the corpus is read once, not twice); the bucket table
  * is `buckets` rows, so the ratio table broadcasts; the per-doc sum is
  * one shuffle on the doc id. Nothing scales with vocabulary — the hash
  * space is fixed at `buckets` regardless of corpus size.
  *
  * Hashing is the oracle-portable md5-prefix convention (40-bit int from
  * 10 hex chars — see TextQueries' CMS/fingerprint gates), so DuckDB can
  * replay bucket assignment bit-for-bit.
  */
object Dsir {

  /** @param isTarget   boolean column marking target-domain rows (the
    *                   target is a subset of the raw corpus, as in the
    *                   paper's "target vs raw" formulation)
    * @param buckets    hashed feature-space size (fixed, vocab-independent)
    * @param alpha      add-α smoothing for both distributions
    * @return one row per input doc: (idCol, n_grams, dsir_logw); docs with
    *         < 2 tokens get (0, 0.0). Rounded to 6 dp so the double sum is
    *         replayable across engines. */
  def hashedNgramLogWeights(docs: DataFrame, idCol: String, textCol: String,
                            isTarget: org.apache.spark.sql.Column,
                            buckets: Int, alpha: Double): DataFrame = {
    // FanOut: the tokenize + bigram-explode + per-gram md5 kernel runs
    // fused into the scan (single-task on a single-row-group table);
    // materialized ONCE (localCheckpoint) because BOTH the bucket-count
    // branch and the per-doc scoring branch consume it — each otherwise
    // re-runs the kernel (Profile r15: two ~0.5 s serial single-task
    // stages). Gram rows are (id, bool, bucket) ≈ 25 B/bigram — under
    // the input-text footprint, the posting-relation bound.
    val ws = FanOut.bySize(docs, col(idCol))
      .select(col(idCol), isTarget.as("_ds_t"),
        TextFunctions.tokens(col(textCol)).as("_ds_ws"))
      .withColumn("_ds_n", size(col("_ds_ws")))
    val grams = ws.filter(col("_ds_n") >= 2)
      .select(col(idCol), col("_ds_t"), explode(arrays_zip(
        slice(col("_ds_ws"), lit(1), col("_ds_n") - 1).as("w1"),
        slice(col("_ds_ws"), lit(2), col("_ds_n") - 1).as("w2"))).as("_ds_p"))
      .select(col(idCol), col("_ds_t"),
        (conv(substring(md5(concat_ws(" ",
          col("_ds_p.w1"), col("_ds_p.w2"))), 1, 10), 16, 10)
          .cast("long") % buckets).as("_ds_b"))
      .localCheckpoint()
    // one pass: raw count = count(*), target count = conditional sum
    val counts = grams.groupBy(col("_ds_b"))
      .agg(sum(when(col("_ds_t"), 1L).otherwise(0L)).as("_ds_ct"),
        count(lit(1)).as("_ds_cr"))
    val totals = counts.agg(sum(col("_ds_ct")).as("_ds_tt"),
      sum(col("_ds_cr")).as("_ds_tr"))
    val ratios = counts.crossJoin(broadcast(totals))
      .select(col("_ds_b"),
        (log((col("_ds_ct") + alpha) / (col("_ds_tt") + alpha * buckets))
          - log((col("_ds_cr") + alpha) / (col("_ds_tr") + alpha * buckets)))
          .as("_ds_lr"))
    val scored = grams.join(broadcast(ratios), Seq("_ds_b"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"),
        round(sum(col("_ds_lr")), 6).as("dsir_logw"))
    docs.select(col(idCol)).join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("dsir_logw"), lit(0.0)).as("dsir_logw"))
  }
}
