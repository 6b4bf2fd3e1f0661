package graft.queries

import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Exact set-similarity joins — round 8. The LSH family (MinHash/SimHash)
  * answers near-dup search PROBABILISTICALLY (tunable recall); these two
  * are the EXACT counterparts a curation pipeline runs when recall must
  * be 1.0 (legal dedup, eval-set decontamination audits):
  *
  *  - `prefix_filter_jaccard`: the PPJoin prefix-filtering principle
  *    (Xiao/Wang/Lin/Yu WWW'08) — order every doc's token set by global
  *    rarity; two sets with Jaccard ≥ τ MUST share a token in their
  *    first |s| − ⌈τ·|s|⌉ + 1 rarest tokens, so candidates meet in an
  *    equi-join on PREFIX tokens only (rare by construction → short
  *    postings), never an all-pairs product, and recall is exact by the
  *    pigeonhole bound, not by luck.
  *  - `sparse_cosine_pairs`: document-document cosine over the sparse
  *    tf vector space via the INVERTED INDEX — pairs meet per shared
  *    term (df-capped: terms in > maxDf docs carry no discrimination
  *    and quadratic postings; dropping them is the standard stopword
  *    economics), dot products accumulate map-side-combinably.
  *
  * Both verdicts are INTEGER-exact (cross-multiplied thresholds — no
  * float compare anywhere near a boundary), so DuckDB replays them
  * bit-for-bit.
  */
object SetSimilarityQueries {

  // τ = 3/5 kept as a ratio: every threshold comparison cross-multiplies
  // by (3, 5) in integer arithmetic, and prefix length uses the integer
  // ceiling (3·sz + 4) div 5 — a 0.6 double literal would ceil() apart
  // from DuckDB's DECIMAL 0.6 on exact multiples of 5.
  private val TauNum = 3L
  private val TauDen = 5L

  // Set elements are word-3-GRAM shingles, not single words: this
  // corpus's shared vocabulary makes word-set Jaccard degenerate
  // (τ = 0.6 would admit ~59% of ALL pairs — measured), while 3-gram
  // sets put unrelated pairs near 0 and keep the planted near-dups
  // (28 pairs at sf0.001 across τ 0.4–0.6 — a real workload shape).
  private val ShingleN = 3

  private val prefixFilterJaccard: Q = (s, dir) => {
    // set elements are 60-bit HASHES of the shingles (identical md5 fold
    // in the oracle): the exact verify ships every candidate pair with
    // both full element arrays, and 8-byte longs instead of ~25-byte
    // shingle strings cut that shuffle ~3× — the 1000×-docs run filled
    // 76 GB of spill with string arrays and finished in ~23 GB hashed
    val toks = graft.operators.DedupOps.shingleSet(
        Tables.documents(s, dir), col("doc_id"), col("text"), ShingleN)
      .select(col("doc_id"),
        graft.operators.DedupOps.shingleHash60(col("g")).as("tok"))
    val dfT = toks.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    // per-doc token array ordered rarest-first (global df, token tiebreak)
    // localCheckpoint: ranked feeds FOUR subtree evaluations (the prefix
    // relation's self-join sides + the verify join's two array sides);
    // un-materialized, the shingle+distinct+rank chain re-runs per
    // reference (the fan-out exchange dedups only the scan below it —
    // r15 executed-plan audit). Footprint is the hashed per-doc arrays,
    // 8 B/distinct token ≈ smaller than the input text, MEMORY_AND_DISK
    // so it degrades to disk, never OOM — unlike the fact-scale CACHE
    // pins the r13/r14 campaigns banned, this is bounded by the corpus'
    // token footprint and released at query end.
    val ranked = toks.join(dfT, "tok")
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(struct(col("df"), col("tok"))))
        .as("ord"))
      .select(col("doc_id"),
        expr("transform(ord, x -> x.tok)").as("toks"),
        size(col("ord")).cast("long").as("sz"))
      .withColumn("p",
        col("sz") - expr(s"(sz * $TauNum + ${TauDen - 1}) div $TauDen") + 1)
      .localCheckpoint()
    val pre = ranked.select(col("doc_id"), col("sz"),
      posexplode(slice(col("toks"), lit(1), col("p"))))
      .select(col("doc_id"), col("sz"), col("pos"), col("col").as("tok"))
    // candidates: share a prefix token + pass the length filter
    // (jaccard >= τ ⇒ τ·max(sz) <= min(sz)) + the PPJoin POSITIONAL
    // filter: a match at (0-based) positions (i, j) of the globally
    // consistent rarest-first order bounds the overlap by
    // 1 + min(s1−i−1, s2−j−1) counting the match and what follows —
    // for the pair's FIRST shared token the bound is exact, so keeping
    // a pair when ANY of its match rows passes never loses a true pair
    // while pruning the candidate set ~an order of magnitude (the
    // verify-join volume is ∝ candidates × array size; at 1000× docs
    // the unpositioned candidate set spilled past the disk). Jaccard
    // o/(s1+s2−o) ≥ τ ⟺ o·(τn+τd) ≥ τn·(s1+s2), all integer.
    val cand = pre.as("a").join(pre.as("b"),
        col("a.tok") === col("b.tok") &&
          col("a.doc_id") < col("b.doc_id") &&
          greatest(col("a.sz"), col("b.sz")) * TauNum <=
            least(col("a.sz"), col("b.sz")) * TauDen &&
          (least(col("a.sz") - col("a.pos"), col("b.sz") - col("b.pos"))) *
            (TauNum + TauDen) >= (col("a.sz") + col("b.sz")) * TauNum)
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .distinct()
    val arrays = ranked.select(col("doc_id"), col("toks"), col("sz"))
    cand
      .join(arrays.select(col("doc_id").as("d1"), col("toks").as("t1"),
        col("sz").as("s1")), "d1")
      .join(arrays.select(col("doc_id").as("d2"), col("toks").as("t2"),
        col("sz").as("s2")), "d2")
      .withColumn("inter", size(array_intersect(col("t1"), col("t2")))
        .cast("long"))
      .withColumn("uni", col("s1") + col("s2") - col("inter"))
      .filter(col("inter") * TauDen >= col("uni") * TauNum)
      .select(col("d1"), col("d2"), col("inter"), col("uni"),
        expr("1000000 * inter div uni").as("jac_fp"))
  }

  // lead()-window shingling mirrors Spark's transform(sequence(...))
  // exactly (empties filtered before adjacency, tail NULLs dropped) —
  // the same equivalence every MinHash gate already rides.
  private val prefixFilterJaccardSql =
    s"""WITH rawtoks AS (SELECT doc_id, str_split(text, ' ') AS ws
       |                FROM documents),
       |tok AS (SELECT doc_id, w, i FROM
       |        (SELECT doc_id, unnest(ws) AS w,
       |                generate_subscripts(ws, 1) AS i FROM rawtoks)
       |        WHERE w <> ''),
       |sh AS (SELECT doc_id,
       |              w || '_' || lead(w, 1) OVER win || '_' ||
       |                lead(w, 2) OVER win AS g
       |       FROM tok WINDOW win AS (PARTITION BY doc_id ORDER BY i)),
       |toks AS (SELECT DISTINCT doc_id,
       |                CAST(('0x' || substring(md5(g), 1, 15)) AS BIGINT) AS tok
       |         FROM sh WHERE g IS NOT NULL),
       |dft AS (SELECT tok, count(*) AS df FROM toks GROUP BY 1),
       |szs AS (SELECT doc_id, count(*) AS sz FROM toks GROUP BY 1),
       |ranked AS (
       |  SELECT t.doc_id, t.tok, s.sz,
       |         row_number() OVER (PARTITION BY t.doc_id
       |                            ORDER BY d.df, t.tok) AS rn
       |  FROM toks t JOIN dft d ON t.tok = d.tok
       |  JOIN szs s ON t.doc_id = s.doc_id),
       |pre AS (SELECT doc_id, tok, sz, rn FROM ranked
       |        WHERE rn <= sz - (sz * $TauNum + ${TauDen - 1}) // $TauDen + 1),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2,
       |         a.sz AS s1, b.sz AS s2
       |  FROM pre a JOIN pre b
       |    ON a.tok = b.tok AND a.doc_id < b.doc_id
       |   AND greatest(a.sz, b.sz) * $TauNum <= least(a.sz, b.sz) * $TauDen
       |   AND least(a.sz - a.rn + 1, b.sz - b.rn + 1) * ${TauNum + TauDen}
       |       >= (a.sz + b.sz) * $TauNum),
       |-- xi MATERIALIZED: forces the verification join to stay DOC-major
       |-- (candidate x d1-tokens first, then match d2-tokens by doc+tok).
       |-- Left to the optimizer, the three-way join can reorder to
       |-- x.tok = y.tok FIRST - df^2 per token, which on a Zipf corpus
       |-- (wide-vocab decade: head df ~ corpus size) is ~1e11 rows and
       |-- out-spilled the box at 650k docs; |xi| is only |cand| x avg_sz.
       |xi AS MATERIALIZED (
       |  SELECT c.d1, c.d2, c.s1, c.s2, x.tok
       |  FROM cand c JOIN toks x ON x.doc_id = c.d1),
       |inter AS (
       |  SELECT xi.d1, xi.d2, xi.s1, xi.s2, count(*) AS inter
       |  FROM xi
       |  JOIN toks y ON y.doc_id = xi.d2 AND y.tok = xi.tok
       |  GROUP BY 1, 2, 3, 4)
       |SELECT d1, d2, CAST(inter AS BIGINT) AS inter,
       |       CAST(s1 + s2 - inter AS BIGINT) AS uni,
       |       CAST(1000000 * inter // (s1 + s2 - inter) AS BIGINT) AS jac_fp
       |FROM inter
       |WHERE inter * $TauDen >= (s1 + s2 - inter) * $TauNum""".stripMargin

  // Terms are the same 3-gram shingles (the corpus's 31-word vocabulary
  // makes word-level vectors geometry-free: min word df is 5% of the
  // corpus). The df cap is RELATIVE — a term is indexed only while it
  // appears in <= 1/DfCapInv of documents (stopword economics made
  // explicit): per-term postings are <= N/DfCapInv, so candidate volume
  // is bounded by Σ df·(df−1)/2 <= (N/DfCapInv)·|postings| — linear in
  // corpus size × the cap fraction, never the unbounded quadratic of an
  // uncapped hot term. Measured here: 11.5 k candidates / 25 pairs at
  // 5 k docs, 1.13 M / 256 at 50 k docs.
  private val DfCapInv = 50L // index terms with df <= 2% of the corpus

  private val sparseCosinePairs: Q = (s, dir) => {
    val docs = Tables.documents(s, dir)
    val tf = graft.operators.DedupOps.shingleBag(
        docs, col("doc_id"), col("text"), ShingleN)
      .groupBy(col("doc_id"), col("g").as("tok"))
      .agg(count(lit(1)).as("tf"))
    val dfT = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val n = docs.select(countDistinct(col("doc_id")).as("n"))
    // localCheckpoint: postings feeds three subtree evaluations (both
    // sides of the dot-product self-join + the norms aggregate); the
    // same bounded, disk-degrading materialization argument as
    // prefix_filter_jaccard's ranked relation (r15).
    val postings = tf.join(dfT, "tok").crossJoin(broadcast(n))
      .filter(col("df") * DfCapInv <= col("n"))
      .select(col("doc_id"), col("tok"), col("tf"))
      .localCheckpoint()
    // norms over the SAME capped space the dots live in: cosine is
    // defined in the discriminative-term subspace (a full-vocabulary
    // norm against capped dots would deflate every score by the
    // stopword mass — inconsistent geometry)
    val norms = postings.groupBy(col("doc_id"))
      .agg(sum(col("tf") * col("tf")).as("nsq"))
    val dots = postings.as("a").join(postings.as("b"),
        col("a.tok") === col("b.tok") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .agg(sum(col("a.tf") * col("b.tf")).as("dot"),
        count(lit(1)).as("n_shared"))
    dots
      .join(norms.select(col("doc_id").as("d1"), col("nsq").as("n1sq")), "d1")
      .join(norms.select(col("doc_id").as("d2"), col("nsq").as("n2sq")), "d2")
      // cos >= 1/2 decided in integers: 4·dot² >= n1²·n2² (dot >= 0)
      .filter(col("dot") * col("dot") * 4 >= col("n1sq") * col("n2sq"))
      .select(col("d1"), col("d2"), col("dot"), col("n_shared"),
        col("n1sq"), col("n2sq"),
        round(col("dot") / (sqrt(col("n1sq")) * sqrt(col("n2sq"))), 6)
          .as("cos6"))
  }

  private val sparseCosinePairsSql =
    s"""WITH rawtoks AS (SELECT doc_id, str_split(text, ' ') AS ws
       |                FROM documents),
       |tok AS (SELECT doc_id, w, i FROM
       |        (SELECT doc_id, unnest(ws) AS w,
       |                generate_subscripts(ws, 1) AS i FROM rawtoks)
       |        WHERE w <> ''),
       |sh AS (SELECT doc_id,
       |              w || '_' || lead(w, 1) OVER win || '_' ||
       |                lead(w, 2) OVER win AS g
       |       FROM tok WINDOW win AS (PARTITION BY doc_id ORDER BY i)),
       |tf AS (SELECT doc_id, g AS tok, count(*) AS tf FROM sh
       |       WHERE g IS NOT NULL GROUP BY 1, 2),
       |dft AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1),
       |nn AS (SELECT count(DISTINCT doc_id) AS n FROM documents),
       |postings AS (SELECT t.doc_id, t.tok, t.tf
       |             FROM tf t JOIN dft d ON t.tok = d.tok CROSS JOIN nn
       |             WHERE d.df * $DfCapInv <= nn.n),
       |norms AS (SELECT doc_id, sum(tf * tf) AS nsq
       |          FROM postings GROUP BY 1),
       |dots AS (
       |  SELECT a.doc_id AS d1, b.doc_id AS d2,
       |         sum(a.tf * b.tf) AS dot, count(*) AS n_shared
       |  FROM postings a JOIN postings b
       |    ON a.tok = b.tok AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)
       |SELECT d.d1, d.d2, CAST(d.dot AS BIGINT) AS dot,
       |       CAST(d.n_shared AS BIGINT) AS n_shared,
       |       CAST(n1.nsq AS BIGINT) AS n1sq, CAST(n2.nsq AS BIGINT) AS n2sq,
       |       round(d.dot / (sqrt(n1.nsq) * sqrt(n2.nsq)), 6) AS cos6
       |FROM dots d
       |JOIN norms n1 ON d.d1 = n1.doc_id
       |JOIN norms n2 ON d.d2 = n2.doc_id
       |WHERE d.dot * d.dot * 4 >= n1.nsq * n2.nsq""".stripMargin

  val all: Map[String, Q] = Map(
    "prefix_filter_jaccard" -> prefixFilterJaccard,
    "sparse_cosine_pairs"   -> sparseCosinePairs)

  val oracles: Map[String, String] = Map(
    "prefix_filter_jaccard" -> prefixFilterJaccardSql,
    "sparse_cosine_pairs"   -> sparseCosinePairsSql)
}
