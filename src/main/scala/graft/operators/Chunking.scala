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
}
