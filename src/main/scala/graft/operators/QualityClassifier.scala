package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Learned quality scoring — the fastText/CCNet-style step a pretraining
  * pipeline runs AFTER the heuristic filters: train a logistic-regression
  * classifier on hashed bag-of-words features against a labeled slice,
  * then score every document with it (Joulin et al. 2016; CCNet, public).
  * Here the label is caller-provided (the gate uses the corpus' own
  * `lang = 'en'` flag as a stand-in target), training is full-batch
  * gradient descent, and the feature space is a FIXED `buckets`-sized
  * hash space — nothing scales with vocabulary.
  *
  * Scale shape (the 100 TB contract): ONE corpus pass builds the
  * doc×bucket tf table (explode → groupBy, map-side combinable, ≤
  * docs×buckets rows ≪ corpus tokens), `localCheckpoint`ed so no round
  * re-reads the corpus. Each round then shuffles only that compact
  * stats table: 64-row weight vector broadcast in, per-doc margin
  * aggregate (one doc-keyed shuffle of ≤ docs×buckets rows — AQE's
  * coalesced exchanges don't preserve partitioning metadata through the
  * checkpoint, so pre-clustering can't be reused across rounds; the
  * moved bytes are the stats table, never corpus tokens), per-bucket
  * gradient aggregate (map-side-combinable, `buckets` output rows),
  * 64-row weight update checkpointed.
  * Margins, gradients, and weights are rounded to 6 dp
  * per round (the kmeans Lloyd's-round convention), and every
  * floating-point SUM is accumulated in exact integer 1e-12 units (each
  * term rounded to a long before summing — the TPC-H Q9 convention), so
  * the whole training is replayable in DuckDB: per-term products of
  * identical doubles are deterministic, integer sums are order-free, and
  * σ is rounded to 6 dp before entering the gradient so libm exp ULP
  * differences cannot propagate. (The 1e-12 fixed point is an
  * oracle-portability device for gate scale — int64 headroom covers
  * ~1e6 docs per sum; a deployment drops it and sums plain doubles.)
  * Bucket hashing is the oracle-portable md5-prefix 40-bit convention
  * shared with DSIR/CMS.
  */
object QualityClassifier {

  /** Train `rounds` full-batch GD steps from w = 0 and score the corpus.
    *
    * @param label   boolean column on `docs` marking the positive class
    * @param buckets hashed feature-space size (fixed, vocab-independent)
    * @param lr      learning rate
    * @return one row per doc: (idCol, n_words, lr_score) where lr_score
    *         = σ(w·tf) under the final weights, rounded to 4 dp (see the
    *         cross-engine note at the scoring step); docs with no tokens
    *         score exactly 0.5 (zero margin).
    */
  def logRegQualityScores(docs: DataFrame, idCol: String, textCol: String,
                          label: Column, buckets: Int, lr: Double,
                          rounds: Int): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val spark = docs.sparkSession
    // FanOut: the tokenize + per-token md5 feature kernel below otherwise
    // runs single-task fused into a single-row-group scan (Profile r15)
    val ws = FanOut.bySize(docs, col(idCol))
      .select(col(idCol), label.cast("double").as("_qc_y"),
        TextFunctions.tokens(col(textCol)).as("_qc_ws"))
      .withColumn("_qc_n", size(col("_qc_ws")))
      .filter(col("_qc_n") >= 1)
    // the one corpus pass: doc×bucket tf rows, clustered by doc for the loop
    val db = ws
      .select(col(idCol), col("_qc_y"), col("_qc_n"),
        explode(col("_qc_ws")).as("_qc_w"))
      .select(col(idCol), col("_qc_y"), col("_qc_n"),
        (conv(substring(md5(col("_qc_w")), 1, 10), 16, 10)
          .cast("long") % buckets).as("_qc_b"))
      .groupBy(col(idCol), col("_qc_y"), col("_qc_n"), col("_qc_b"))
      .agg(count(lit(1)).as("_qc_c"))
      .withColumn("_qc_tf", col("_qc_c").cast("double") / col("_qc_n"))
      .localCheckpoint()
    val nDocs = db.agg(count_distinct(col(idCol)).as("_qc_nd"))
    var w: DataFrame = spark.range(buckets)
      .select(col("id").as("_qc_b"), lit(0.0).as("_qc_wt"))
      .localCheckpoint()
    // exact integer accumulation: term → long 1e-12 units, order-free sum
    def fixSum(term: Column): Column =
      round(sum(round(term * 1e12, 0).cast("long")) / 1e12, 6)
    for (_ <- 1 to rounds) {
      val zp = db.join(broadcast(w), Seq("_qc_b"))
        .groupBy(col(idCol), col("_qc_y"))
        .agg(fixSum(col("_qc_tf") * col("_qc_wt")).as("_qc_z"))
        .withColumn("_qc_p",
          round(lit(1.0) / (lit(1.0) + exp(-col("_qc_z"))), 6))
      val grad = db.join(zp.select(col(idCol), col("_qc_p")), Seq(idCol))
        .groupBy(col("_qc_b"))
        .agg(fixSum(col("_qc_tf") * (col("_qc_p") - col("_qc_y"))).as("_qc_gs"))
        .crossJoin(broadcast(nDocs))
        .select(col("_qc_b"), round(col("_qc_gs") / col("_qc_nd"), 6).as("_qc_g"))
      w = w.join(grad, Seq("_qc_b"), "left")
        .select(col("_qc_b"),
          round(col("_qc_wt") - lit(lr) * coalesce(col("_qc_g"), lit(0.0)), 6)
            .as("_qc_wt"))
        .localCheckpoint()
    }
    // score at 4 dp, NOT the training's 6: the sigmoid is the one
    // transcendental in an otherwise integer-quantized recurrence, and
    // the engines' exp/rounding differ within an ULP — at the 10× corpus
    // 3/50,000 scores flipped their 6th decimal across engines (the 10×
    // full-registry oracle run). 4 dp keeps the score meaningful for any
    // threshold consumer while making a cross-engine flip ~1e-7-rare per
    // doc through the 1000× decade; training stays at 6-dp quanta.
    val scored = db.join(broadcast(w), Seq("_qc_b"))
      .groupBy(col(idCol), col("_qc_n"))
      .agg(fixSum(col("_qc_tf") * col("_qc_wt")).as("_qc_z"))
      .select(col(idCol), col("_qc_n"),
        round(lit(1.0) / (lit(1.0) + exp(-col("_qc_z"))), 4).as("lr_score"))
    docs.select(col(idCol)).join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("_qc_n"), lit(0L)).cast("long").as("n_words"),
        coalesce(col("lr_score"), lit(0.5)).as("lr_score"))
  }
}
