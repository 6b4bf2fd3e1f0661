package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Training-sequence packing — the concat-and-chunk shape pretraining
  * actually uses: documents are laid end-to-end in id order and the token
  * stream is cut into fixed-`budget` sequences, so a document crossing a
  * boundary contributes a span to EACH sequence it overlaps (unlike
  * `shard_packing`, which bins whole documents by their start offset).
  *
  * Output: one row per (doc, sequence) overlap —
  *   (id, weight, seq_id, doc_offset, seq_offset, span_len)
  * where `doc_offset` is where the span starts inside the document,
  * `seq_offset` where it starts inside the sequence, and consecutive
  * spans tile both every document and every sequence exactly (the
  * per-sequence span lengths sum to `budget` except the final partial
  * sequence). A downstream writer joins spans to token arrays and slices.
  *
  * Scale shape: the global running total comes from `PrefixSum` (two
  * narrow passes, no single-partition window); the span fan-out is a
  * row-local `sequence()` explode of ceil(weight/budget)+1 elements max —
  * proportional to each document's own length, never a shuffle. Zero-
  * weight documents occupy no stream positions and emit no spans.
  */
object Packing {

  def packSequences(weighted: DataFrame, idCol: String, weightCol: String,
                    budget: Long): DataFrame = {
    require(budget > 0, "sequence budget must be positive")
    // internal scratch columns carry a _pk_ prefix (the RangeJoin
    // _rj_bucket convention) so a caller frame already holding `s`/`cum`
    // is neither clobbered nor mis-bound by name resolution; `seq_id` is
    // part of the OUTPUT contract and intentionally unprefixed
    val withCum = PrefixSum.withRunningTotal(
      weighted.filter(col(weightCol) > 0), idCol, weightCol, "_pk_cum")
    // the doc occupies token interval [s, e) of the concatenated stream
    val spans = withCum
      .withColumn("_pk_s", col("_pk_cum") - col(weightCol))
      .withColumn("seq_id",
        explode(sequence(expr(s"_pk_s div $budget"), expr(s"(_pk_cum - 1) div $budget"))))
      .withColumn("_pk_seq_start", col("seq_id") * budget)
    spans.select(
      col(idCol), col(weightCol),
      col("seq_id"),
      (greatest(col("_pk_s"), col("_pk_seq_start")) - col("_pk_s")).as("doc_offset"),
      (greatest(col("_pk_s"), col("_pk_seq_start")) - col("_pk_seq_start")).as("seq_offset"),
      (least(col("_pk_cum"), col("_pk_seq_start") + budget)
        - greatest(col("_pk_s"), col("_pk_seq_start"))).as("span_len"))
  }
}
