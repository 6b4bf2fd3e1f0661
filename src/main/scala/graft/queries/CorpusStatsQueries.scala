package graft.queries

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.sources.Tables

/** Corpus-level statistical signals over the `documents` table: PMI
  * collocation mining — the phrase-discovery / tokenizer-vocab signal, a
  * classic train-data-pipeline pass whose shuffles are bounded by the
  * VOCABULARY, not the corpus: counts aggregate map-side into vocab-sized
  * tables that broadcast back to the (linear) token stream. (The
  * companion data-selection signal, DSIR importance weights, is
  * `dsir_importance` in TextQueries.)
  */
object CorpusStatsQueries {

  /** Minimum bigram support for a PMI candidate. */
  private val PmiMinCount = 5L

  /** Pointwise mutual information of adjacent word pairs:
    * pmi = ln( (c_xy / N_big) / ((c_x / N_uni) · (c_y / N_uni)) ), top 20
    * by (pmi, w1, w2). Every count is exact-integer on both engines; the
    * one double expression is evaluated from identical integers with an
    * identical operation tree, then rounded to 6 dp. Shuffle shape at
    * scale: one map-side-combinable bigram aggregate (vocab²-bounded, in
    * practice collocation-sparse) + two broadcast unigram joins; top-k is
    * TakeOrdered, never a global sort. */
  private val pmiCollocations: Q = (s, dir) => {
    val ws = TextFunctions.tokens(col("text"))
    val toks = Tables.documents(s, dir).select(ws.as("ws"))
      .select(col("ws"), size(col("ws")).as("n"))
    val uni = toks.select(explode(col("ws")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
    val bi = toks.filter(col("n") >= 2)
      .select(explode(arrays_zip(
        slice(col("ws"), lit(1), col("n") - 1).as("w1"),
        slice(col("ws"), lit(2), col("n") - 1).as("w2"))).as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c_xy"))
    val totals = uni.agg(sum(col("c")).as("n_uni")).crossJoin(
      bi.agg(sum(col("c_xy")).as("n_big")))
    bi.filter(col("c_xy") >= PmiMinCount)
      .join(broadcast(uni.withColumnRenamed("w", "w1")
        .withColumnRenamed("c", "c_x")), Seq("w1"))
      .join(broadcast(uni.withColumnRenamed("w", "w2")
        .withColumnRenamed("c", "c_y")), Seq("w2"))
      .crossJoin(broadcast(totals))
      .select(col("w1"), col("w2"), col("c_xy"),
        round(log((col("c_xy").cast("double") / col("n_big")) /
          ((col("c_x").cast("double") / col("n_uni")) *
            (col("c_y").cast("double") / col("n_uni")))), 6).as("pmi"))
      .orderBy(col("pmi").desc, col("w1"), col("w2"))
      .limit(20)
  }

  private val pmiCollocationsSql =
    s"""WITH tok AS (
       |  SELECT doc_id, i, w FROM (
       |    SELECT doc_id, unnest(ws) AS w, generate_subscripts(ws, 1) AS i
       |    FROM (SELECT doc_id, list_filter(str_split(text, ' '), x -> x <> '') AS ws
       |          FROM documents))),
       |uni AS (SELECT w, count(*) AS c FROM tok GROUP BY 1),
       |bi AS (
       |  SELECT a.w AS w1, b.w AS w2, count(*) AS c_xy
       |  FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.i = a.i + 1
       |  GROUP BY 1, 2),
       |tot AS (SELECT (SELECT CAST(sum(c) AS BIGINT) FROM uni) AS n_uni,
       |               (SELECT CAST(sum(c_xy) AS BIGINT) FROM bi) AS n_big)
       |SELECT w1, w2, CAST(c_xy AS BIGINT) AS c_xy,
       |       round(ln((CAST(c_xy AS DOUBLE) / n_big) /
       |             ((CAST(cx.c AS DOUBLE) / n_uni) *
       |              (CAST(cy.c AS DOUBLE) / n_uni))), 6) AS pmi
       |FROM bi
       |JOIN uni cx ON cx.w = bi.w1
       |JOIN uni cy ON cy.w = bi.w2
       |CROSS JOIN tot
       |WHERE c_xy >= $PmiMinCount
       |ORDER BY pmi DESC, w1, w2 LIMIT 20""".stripMargin

  /** Per-source document cap for docs kept per source. */
  private val CapPerSource = 20

  /** Deterministic per-source document cap — the "downsample
    * over-represented domains" mix-balancing step: docs rank within their
    * source by a portable md5 hash of doc_id (id tiebreak), the first
    * `CapPerSource` survive. Hash-ranking (not id-ranking) makes the kept
    * subset an unbiased sample of each source rather than its oldest
    * documents. One per-source window over bounded partitions; every doc
    * emitted with its rank and verdict. */
  private val domainCapSample: Q = (s, dir) => {
    val hk = conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
      .cast("long")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("hk"), col("doc_id"))
    Tables.documents(s, dir)
      .select(col("doc_id"), col("source"), hk.as("hk"))
      .withColumn("rank_in_source", row_number().over(w).cast("long"))
      .select(col("doc_id"), col("source"), col("rank_in_source"),
        (col("rank_in_source") <= CapPerSource).as("kept"))
  }

  private val domainCapSampleSql =
    s"""WITH h AS (
       |  SELECT doc_id, source,
       |         CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
       |              AS BIGINT) AS hk
       |  FROM documents)
       |SELECT doc_id, source,
       |       CAST(row_number() OVER (
       |         PARTITION BY source ORDER BY hk, doc_id) AS BIGINT)
       |         AS rank_in_source,
       |       row_number() OVER (PARTITION BY source ORDER BY hk, doc_id)
       |         <= $CapPerSource AS kept
       |FROM h""".stripMargin

  /** Minimum document frequency for an indexed term. */
  private val IdxMinDf = 10L

  /** Inverted-index build (term → postings): the search-index construction
    * pass. Postings are SORTED doc-id lists serialized to one string per
    * term — deterministic on both engines (the raw collect order is not).
    * Shuffle shape: one distinct (term, doc) relation (map-side
    * combinable) + one term-keyed aggregate whose state is each term's
    * own postings; terms below `IdxMinDf` are dropped (the long tail a
    * real index shards separately). */
  private val invertedIndex: Q = (s, dir) => {
    Tables.documents(s, dir)
      .select(col("doc_id"),
        explode(TextFunctions.tokens(col("text"))).as("term"))
      .distinct()
      .groupBy(col("term"))
      .agg(count(lit(1)).as("df"),
        sort_array(collect_list(col("doc_id"))).as("p"))
      .filter(col("df") >= IdxMinDf)
      .select(col("term"), col("df"),
        concat_ws(",", transform(col("p"), _.cast("string"))).as("postings"))
  }

  private val invertedIndexSql =
    s"""WITH td AS (
       |  SELECT DISTINCT doc_id, w AS term
       |  FROM (SELECT doc_id, unnest(str_split(text, ' ')) AS w FROM documents)
       |  WHERE w <> '')
       |SELECT term, CAST(count(*) AS BIGINT) AS df,
       |       string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id)
       |         AS postings
       |FROM td GROUP BY 1 HAVING count(*) >= $IdxMinDf""".stripMargin

  val all: Map[String, Q] = Map(
    "pmi_collocations"  -> pmiCollocations,
    "domain_cap_sample" -> domainCapSample,
    "inverted_index"    -> invertedIndex)

  val oracles: Map[String, String] = Map(
    "pmi_collocations"  -> pmiCollocationsSql,
    "domain_cap_sample" -> domainCapSampleSql,
    "inverted_index"    -> invertedIndexSql)
}
