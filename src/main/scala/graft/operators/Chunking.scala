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
  * Everything is ROW-LOCAL: the codegen'd CharNGramHashes pass produces
  * the window hashes, higher-order functions derive cut positions and
  * spans inside the row, and the only explode is the final 1→chunks
  * fan-out — the corpus is never shuffled. Average chunk length ≈ m
  * characters (uniform hashes); every doc ends with a final cut at its
  * last character, so docs with no content cut (or shorter than w) yield
  * exactly one whole-doc chunk. Empty docs yield none.
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
        TextFunctions.charNGramHashes(textCol, w).as("hs"))
    // cut after the last char of each matching window: i + w - 1
    // (1-based char positions; i ranges over 1..len-w+1, so cuts ≤ len).
    // sequence(1, 0) counts DOWN in Spark — guard the empty-hash case.
    val contentCuts = when(size(col("hs")) > 0,
        filter(transform(sequence(lit(1), size(col("hs"))),
            i => when(element_at(col("hs"), i) % m === 0, i + lit(w - 1))
              .otherwise(lit(null))),
          c => c.isNotNull))
      .otherwise(array().cast("array<int>"))
    val cuts = array_sort(array_distinct(
      concat(contentCuts, array(length(col("t")).cast("int")))))
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
