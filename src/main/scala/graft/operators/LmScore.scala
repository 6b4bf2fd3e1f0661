package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Model-free n-gram LM quality scoring — the KenLM-style filter a
  * training-data pipeline runs before anything learned exists: score each
  * document by the mean log-probability of its bigram transitions under a
  * bigram LM with add-α smoothing trained on the corpus itself:
  *
  *   P(w2 | w1) = (c(w1,w2) + α) / (c(w1·) + α·V)
  *
  * Low scores mark gibberish / OCR noise (improbable transitions), very
  * high scores mark boilerplate; both tails get cut.
  *
  * Scale shape (the 100 TB contract): bigram fan-out is row-local
  * (`arrays_zip` of two slices — no window, no per-doc shuffle), both
  * count tables come from map-side-combinable groupBys, the context total
  * c(w1·) is the row-sum of the bigram table (vocab-bounded, never a
  * second corpus pass), the vocab scalar broadcasts, and the corpus
  * shuffles once on the bigram key for the probability lookup.
  */
object LmScore {
  /** @return one row per input doc: (idCol, n_bigrams, lm_score), where
    *         docs with < 2 tokens get (0, 0.0). `lm_score` is rounded to
    *         6 dp so the double-sum is replayable across engines. */
  def bigramLmScore(docs: DataFrame, idCol: String, textCol: String,
                    alpha: Double): DataFrame = {
    // FanOut: tokenize + bigram explode otherwise run single-task fused
    // into a single-row-group scan, and this kernel is evaluated by three
    // subtrees (bigram counts, vocab, per-doc scoring)
    val ws = FanOut.bySize(docs, col(idCol))
      .select(col(idCol), TextFunctions.tokens(col(textCol)).as("_lm_ws"))
      .withColumn("_lm_n", size(col("_lm_ws")))
    val pairs = ws.filter(col("_lm_n") >= 2)
      .select(col(idCol), explode(arrays_zip(
        slice(col("_lm_ws"), lit(1), col("_lm_n") - 1).as("w1"),
        slice(col("_lm_ws"), lit(2), col("_lm_n") - 1).as("w2"))).as("_lm_p"))
      .select(col(idCol), col("_lm_p.w1").as("w1"), col("_lm_p.w2").as("w2"))
    val cb = pairs.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
    val cu = cb.groupBy(col("w1")).agg(sum(col("c12")).as("c1"))
    val vocab = ws.select(explode(col("_lm_ws")).as("w"))
      .agg(count_distinct(col("w")).as("vocab"))
    val scored = pairs
      .join(cb, Seq("w1", "w2"))
      .join(cu, Seq("w1"))
      .crossJoin(broadcast(vocab))
      .withColumn("lp", log((col("c12") + lit(alpha)) /
        (col("c1") + lit(alpha) * col("vocab"))))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"), round(avg(col("lp")), 6).as("lm_score"))
    docs.select(col(idCol)).join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("lm_score"), lit(0.0)).as("lm_score"))
  }
}
