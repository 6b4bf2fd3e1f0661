package graft

import org.apache.spark.sql.functions._

/** Composition invariants for `pipeline_curation` (the 4th end-to-end
  * gate): the chained stages must agree with their standalone gated
  * forms, and the packing output must tile. Value parity with the
  * chained-CTE DuckDB oracle is the driver's gate; these pin the
  * cross-stage agreements a refactor of any single stage could break.
  */
class CurationPipelineSpec extends SparkSpec {

  private lazy val out =
    Queries.all("pipeline_curation")(spark, sf001).cache()

  test("probe docs (doc_id % 10 == 0) never reach the packed corpus") {
    assert(out.filter(col("doc_id") % 10 === 0).count() == 0)
  }

  test("surviving docs = canonical ∩ decontaminated ∩ quality-kept") {
    val packed = out.select("doc_id").distinct()
      .collect().map(_.getLong(0)).toSet
    val canon = Queries.all("canonical_docs")(spark, sf001)
      .filter(col("is_canonical")).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val clean = Queries.all("decontaminate_ngrams")(spark, sf001)
      .filter(!col("contaminated")).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val quality = Queries.all("quality_filter")(spark, sf001)
      .filter(col("keep")).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    // packing drops zero-token docs — everything else must agree exactly
    val zeroTok = Queries.all("token_stats")(spark, sf001)
      .filter(col("n_tokens") === 0).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(packed == (canon & clean & quality) -- zeroTok)
  }

  test("dsir_logw on every span equals the standalone dsir_importance weight") {
    val mismatches = out.select(col("doc_id"), col("dsir_logw"))
      .distinct()
      .join(Queries.all("dsir_importance")(spark, sf001)
        .select(col("doc_id"), col("dsir_logw").as("expected")), "doc_id")
      .filter(col("dsir_logw") =!= col("expected"))
      .count()
    assert(mismatches == 0)
  }

  test("spans tile: every sequence except the last is exactly full") {
    val perSeq = out.groupBy(col("seq_id"))
      .agg(sum(col("span_len")).as("filled"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val last = perSeq.keys.max
    perSeq.foreach { case (seq, filled) =>
      if (seq != last) assert(filled == 2048L, s"seq $seq holds $filled")
      else assert(filled > 0 && filled <= 2048L)
    }
    // and within a doc, spans reassemble the whole token count
    val bad = out.groupBy(col("doc_id"), col("n_tokens"))
      .agg(sum(col("span_len")).as("reassembled"))
      .filter(col("reassembled") =!= col("n_tokens")).count()
    assert(bad == 0, "doc spans must reassemble to n_tokens")
  }
}
