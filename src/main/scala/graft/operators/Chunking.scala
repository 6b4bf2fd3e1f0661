package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Content-defined chunking (CDC): split each document at positions where
  * the w-char rolling window hash ≡ 0 (mod m) — the Rabin-style cut rule
  * that keeps chunk boundaries STABLE under insertions/deletions (an edit
  * only moves the cuts inside its own neighborhood), which is what makes
  * chunk-level dedup effective on near-duplicate corpora where whole-doc
  * fingerprints all differ.
  *
  * Everything is ROW-LOCAL: one fused codegen pass (CdcCutPositions)
  * produces the cut positions directly — the full window-hash array is
  * never materialized and no interpreted per-window lambda runs —
  * span derivation is a small HOF over the ~len/m cuts, and the only
  * explode is the final 1→chunks fan-out; the corpus is never shuffled.
  * Average chunk length ≈ m characters (uniform hashes); every doc ends
  * with a final cut at its last character, so docs with no content cut
  * (or shorter than w) yield exactly one whole-doc chunk. Empty docs
  * yield none.
  *
  * Output: (doc_id, chunk_idx 1.., start_pos 1-based, chunk_len,
  * chunk_fp = md5 of the chunk text) — the fingerprint makes cross-doc
  * chunk dedup a plain hash groupBy downstream.
  */
object Chunking {

  def cdcChunks(docs: DataFrame, idCol: Column, textCol: Column,
                w: Int, m: Int): DataFrame = {
    require(w >= 1 && m >= 1, s"window $w and modulus $m must be positive")
    val base = docs.filter(length(textCol) > 0)
      .select(idCol.as("doc_id"), textCol.as("t"),
        TextFunctions.cdcCutPositions(textCol, w, m.toLong).as("cc"))
    // content cuts are already sorted ascending (scan order) and ≤ len;
    // appending the final-length cut and deduping closes the last chunk
    val cuts = array_sort(array_distinct(
      concat(col("cc"), array(length(col("t")).cast("int")))))
    val spans = transform(sequence(lit(0), size(cuts) - 1), j =>
      struct((j + 1).cast("long").as("chunk_idx"),
        (when(j === 0, lit(1)).otherwise(element_at(cuts, j) + 1)).as("s"),
        element_at(cuts, j + 1).as("e")))
    base.select(col("doc_id"), col("t"), explode(spans).as("sp"))
      .select(col("doc_id"),
        col("sp.chunk_idx").as("chunk_idx"),
        col("sp.s").cast("long").as("start_pos"),
        (col("sp.e") - col("sp.s") + 1).cast("long").as("chunk_len"),
        md5(col("t").substr(col("sp.s"), col("sp.e") - col("sp.s") + 1))
          .as("chunk_fp"))
  }

  /** Cross-document duplicated-passage removal with document
    * reconstruction — the Dolma/CCNet-style "paragraph dedup" step, over
    * CDC chunks instead of newline paragraphs (boundary-stable under
    * edits; granularity is the (w, m) knob). For every chunk fingerprint
    * present in ≥ 2 documents, ALL occurrences are dropped except the
    * canonical one (lowest doc id, then lowest chunk index within it);
    * each document is then re-assembled from its surviving chunks in
    * order. Within-doc repeats of a fingerprint no other doc shares are
    * kept (this operator removes CROSS-document boilerplate, not
    * in-document repetition — that's `repeated_spans`' job).
    *
    * Scale shape: dup detection is one map-side-combinable groupBy on
    * chunk_fp; the keep/drop verdict joins chunks to the (small) dup set
    * by fingerprint; reconstruction is a per-doc groupBy whose groups are
    * a document's own chunks (~len/m rows). The corpus text rides only
    * the doc_id-keyed joins — never a fingerprint shuffle.
    *
    * Output: (doc_id, n_chunks, n_removed, scrubbed_len, scrubbed_md5) —
    * one row per input document, empty docs included (0 chunks). */
  def passageScrub(docs: DataFrame, idCol: Column, textCol: Column,
                   w: Int, m: Int): DataFrame = {
    val base = docs.select(idCol.as("doc_id"), textCol.as("text"))
    // FanOut: the CDC cut kernel + per-chunk md5 fused into a
    // single-row-group scan ran single-task (Profile r15: 0.4–0.5 s
    // serial stages); materialized ONCE (localCheckpoint) because three
    // consumers (dup aggregate, keep join, per-doc totals) otherwise
    // each re-run the kernel — chunk rows are ~(56 B per m=64 chars),
    // under the input-text footprint, the set-sim posting-relation bound.
    val chunks = cdcChunks(FanOut.bySize(base, col("doc_id")),
        col("doc_id"), col("text"), w, m)
      .localCheckpoint()

    // dup verdict AND canonical occurrence in ONE fingerprint aggregate:
    // min(struct(doc_id, chunk_idx)) is lexicographic — lowest doc, then
    // lowest chunk_idx within it — exactly the former dups→canon
    // two-aggregate + join chain (one groupBy(chunk_fp) shuffle, not two).
    val canon = chunks.groupBy(col("chunk_fp"))
      .agg(count_distinct(col("doc_id")).as("_ps_nd"),
        min(struct(col("doc_id"), col("chunk_idx"))).as("_ps_mn"))
      .filter(col("_ps_nd") >= 2)
      .select(col("chunk_fp").as("_ps_fp"),
        col("_ps_mn.doc_id").as("_ps_cdoc"),
        col("_ps_mn.chunk_idx").as("_ps_cidx"))
    val kept = chunks.join(canon, col("chunk_fp") === col("_ps_fp"), "left")
      .filter(col("_ps_fp").isNull ||
        (col("doc_id") === col("_ps_cdoc") && col("chunk_idx") === col("_ps_cidx")))
      .select(col("doc_id"), col("chunk_idx"), col("start_pos"), col("chunk_len"))

    val scrub = kept.join(base, "doc_id")
      .select(col("doc_id"), col("chunk_idx"),
        expr("substring(text, CAST(start_pos AS INT), CAST(chunk_len AS INT))").as("_ps_ct"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("_ps_nkept"),
        array_sort(collect_list(struct(col("chunk_idx"), col("_ps_ct")))).as("_ps_arr"))
      .select(col("doc_id"), col("_ps_nkept"),
        array_join(transform(col("_ps_arr"), x => x.getField("_ps_ct")), "").as("_ps_st"))
    val tot = chunks.groupBy(col("doc_id")).agg(count(lit(1)).as("_ps_nch"))

    base.select(col("doc_id"))
      .join(tot, Seq("doc_id"), "left")
      .join(scrub, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("_ps_nch"), lit(0L)).as("n_chunks"),
        (coalesce(col("_ps_nch"), lit(0L)) - coalesce(col("_ps_nkept"), lit(0L)))
          .as("n_removed"),
        length(coalesce(col("_ps_st"), lit(""))).cast("long").as("scrubbed_len"),
        md5(coalesce(col("_ps_st"), lit(""))).as("scrubbed_md5"))
  }
}
