package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Edit-distance similarity self-join via PassJoin partitioning (Li,
  * Deng, Feng, "PASS-JOIN: a partition-based method for similarity
  * joins", PVLDB 5(3), 2011).
  *
  * The all-pairs edit-distance join is the fuzzy-matching primitive a
  * training-data pipeline uses for near-identical title/URL/short-doc
  * collapse where token-set similarity (Jaccard/MinHash) is blind to
  * single-character variants. The naive form is O(n²) Levenshtein
  * evaluations; PassJoin's partition scheme makes candidate generation an
  * equi-join:
  *
  *   - Split every string s (length L) into k+1 contiguous segments
  *     (lengths differ by at most 1). If ed(s,t) ≤ k, at most k segments
  *     of s are touched by an optimal edit script, so at least ONE
  *     segment survives verbatim in t (pigeonhole) — and because each
  *     edit shifts later positions by at most 1, that segment occurs in t
  *     within ±k of its position in s.
  *   - So: index side emits (L, i, hash(segment_i)) per string; probe
  *     side emits, for every admissible indexed length L ∈ [M−k, M+k]
  *     and every segment slot i, the substrings of t at the (2k+1)
  *     admissible start positions. Pairs meet in a hash equi-join on
  *     (L, i, hash) — candidate volume is bounded by genuinely-similar
  *     strings plus hash-bucket noise, never n².
  *   - Exact verify: `levenshtein(s, t, k)` (threshold form — bails at
  *     k+1, so verification cost per candidate is O(k·min(L,M)), not
  *     O(L·M)).
  *
  * Scale shape (the 100 TB contract): both fan-outs are row-local and
  * bounded — k+1 index rows and ≤ (2k+1)²·(k+1) probe rows per doc, each
  * carrying a 40-bit hash, not the substring. The join key includes the
  * indexed LENGTH, so hash buckets stay small even on skewed corpora
  * (identical boilerplate strings collapse to one bucket per length —
  * the verify join then touches only those ids). Shuffle ∝ corpus rows ×
  * small constants + candidates; Levenshtein runs on candidates only.
  *
  * Contract: strings shorter than k+1 characters are excluded (the
  * pigeonhole argument needs k+1 non-empty segments); the fixture corpus
  * is far above that. Exactness: candidate generation is recall-complete
  * by the pigeonhole/shift argument (EditDistanceJoinSpec proves equality
  * against the brute-force O(n²) join); the md5-40-bit hash can only ADD
  * candidates (collisions), which the exact verify removes.
  *
  * Reference scope: the reference engine (UniqueUsersApp.java) has no
  * similarity joins at all; this is north-star pipeline surface.
  */
object EditDistanceJoin {

  /** 40-bit numeric hash (first 10 md5 hex digits) — the engine's
    * DuckDB-portable hashing convention (DedupOps.shingleHash40). */
  private def fp40(c: Column): Column =
    conv(substring(md5(c), 1, 10), 16, 10).cast("long")

  /** All unordered pairs within edit distance `k`, exactly:
    * (doc_id_lo, doc_id_hi, edit_dist). */
  def passJoin(docs: DataFrame, idCol: Column, textCol: Column, k: Int): DataFrame = {
    require(k >= 1 && k <= 4, s"passJoin expects 1 <= k <= 4, got $k")
    val nSeg = k + 1

    // FanOut: the segment/probe explode + md5 substring hashing below
    // otherwise fuse into the single-task scan stage of a
    // single-row-group input (r15; no-op at parallel-scan scale)
    val base = FanOut.bySize(docs
      .select(idCol.cast("long").as("_ej_id"), textCol.as("_ej_t"),
        length(textCol).as("_ej_m")), col("_ej_id"))
      .filter(col("_ej_m") >= nSeg)

    // Segment arithmetic for a string of length l, slot i (1-based):
    // q = l div (k+1), r = l mod (k+1); the first (k+1 - r) slots are
    // q chars, the last r slots q+1; starts are cumulative (1-based).
    def segLen(l: Column, i: Column): Column = {
      val q = l.divide(lit(nSeg)).cast("int") // positive ints: trunc == floor
      val nshort = lit(nSeg) - (l % lit(nSeg))
      q + when(i > nshort, 1).otherwise(0)
    }
    def segStart(l: Column, i: Column): Column = {
      val q = l.divide(lit(nSeg)).cast("int")
      val nshort = lit(nSeg) - (l % lit(nSeg))
      lit(1) + (i - 1) * q + greatest(lit(0), i - 1 - nshort)
    }

    // Index side: one row per (string, segment slot).
    val segs = base
      .withColumn("_ej_i", explode(sequence(lit(1), lit(nSeg))))
      .withColumn("_ej_l", col("_ej_m"))
      .withColumn("_ej_ss", segStart(col("_ej_l"), col("_ej_i")))
      .withColumn("_ej_sl", segLen(col("_ej_l"), col("_ej_i")))
      .select(col("_ej_l"), col("_ej_i"),
        fp40(expr("substring(_ej_t, _ej_ss, _ej_sl)")).as("_ej_h"),
        col("_ej_id").as("_ej_sid"))

    // Probe side: for every admissible indexed length and slot, the
    // substrings at the (2k+1) admissible shifted positions.
    val probes = base
      .withColumn("_ej_dl", explode(sequence(lit(-k), lit(k))))
      .withColumn("_ej_l", col("_ej_m") + col("_ej_dl"))
      .filter(col("_ej_l") >= nSeg)
      .withColumn("_ej_i", explode(sequence(lit(1), lit(nSeg))))
      .withColumn("_ej_sl", segLen(col("_ej_l"), col("_ej_i")))
      .withColumn("_ej_d", explode(sequence(lit(-k), lit(k))))
      .withColumn("_ej_p", segStart(col("_ej_l"), col("_ej_i")) + col("_ej_d"))
      .filter(col("_ej_p") >= 1 &&
        col("_ej_p") + col("_ej_sl") - 1 <= col("_ej_m"))
      .select(col("_ej_l"), col("_ej_i"),
        fp40(expr("substring(_ej_t, _ej_p, _ej_sl)")).as("_ej_h"),
        col("_ej_id").as("_ej_pid"))

    val cand = segs.join(probes, Seq("_ej_l", "_ej_i", "_ej_h"))
      .filter(col("_ej_sid") =!= col("_ej_pid"))
      .select(least(col("_ej_sid"), col("_ej_pid")).as("_ej_a"),
        greatest(col("_ej_sid"), col("_ej_pid")).as("_ej_b"))
      .distinct()

    cand
      .join(base.select(col("_ej_id").as("_ej_a"), col("_ej_t").as("_ej_ta")), "_ej_a")
      .join(base.select(col("_ej_id").as("_ej_b"), col("_ej_t").as("_ej_tb")), "_ej_b")
      .withColumn("_ej_dist", levenshtein(col("_ej_ta"), col("_ej_tb"), k))
      .filter(col("_ej_dist") >= 0) // threshold form: -1 means > k
      .select(col("_ej_a").as("doc_id_lo"), col("_ej_b").as("doc_id_hi"),
        col("_ej_dist").cast("long").as("edit_dist"))
  }
}
