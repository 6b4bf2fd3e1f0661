package graft.queries

import org.apache.spark.sql.functions._
import graft.operators.LineOps
import graft.sources.Tables

/** Line-structure corpus cleaning gates (C4 / CCNet / Gopher): the
  * document-STRUCTURE operators a pretraining pipeline runs between raw
  * extraction and tokenization. Both gates are single row-local
  * projections of codegen'd higher-order functions — at 100 TB a pure map
  * over the corpus scan, no shuffle, no state (see `operators.LineOps`).
  *
  * The fixture corpus has no newlines, so both gates first plant a
  * deterministic line structure (doc_id-derived widths, decorations, and
  * duplications — `pii_scrub` convention), replayed identically in the
  * DuckDB oracle via list lambdas.
  */
object LineQueries {

  // DuckDB mirrors of LineOps' planted-structure formulas. Both engines
  // evaluate THE SAME congruences — the formulas live here once, as SQL
  // text, and LineOps encodes them as Column expressions; C4LineSpec pins
  // hand-computed cases so the two can't drift silently.
  private val duckWords =
    "list_filter(str_split(text, ' '), x -> x <> '')"

  /** C4-style line filter: keep lines that end in terminal punctuation,
    * have ≥ 5 words, and carry no code/boilerplate marker; a document
    * survives if ≥ 3 lines survive. Emitted per doc: line counts, the
    * doc-level verdict, and the md5 of the reassembled cleaned text (the
    * hash pins reassembly byte-for-byte, passage_scrub convention). */
  private val c4LineFilter: Q = (s, dir) => {
    // words materialized in its OWN projection: HOF lambdas re-evaluate
    // captured subexpressions per element, so passing words(text) straight
    // into c4Lines would re-split the document once per line — O(tokens²)
    // per doc (SCALING.md pitfall; CollapseProject keeps the staging
    // projection because the array is non-cheap and referenced 3×).
    Tables.documents(s, dir)
      .select(col("doc_id"), LineOps.words(col("text")).as("ws"))
      .select(col("doc_id"),
        LineOps.c4Lines(col("doc_id"), col("ws")).as("lines"))
      .select(col("doc_id"), col("lines"),
        LineOps.c4Kept(col("lines")).as("kept"))
      .select(
        col("doc_id"),
        size(col("lines")).cast("long").as("n_lines"),
        size(col("kept")).cast("long").as("n_kept"),
        (size(col("kept")) >= 3).as("keep_doc"),
        md5(array_join(col("kept"), "\n")).as("clean_md5"))
  }

  private val c4LineFilterSql =
    s"""WITH t AS (
       |  SELECT doc_id, $duckWords AS ws, 4 + doc_id % 4 AS w FROM documents),
       |l AS (
       |  SELECT doc_id,
       |    CASE WHEN len(ws) = 0 THEN CAST([] AS VARCHAR[]) ELSE
       |      list_transform(range(0, CAST(ceil(len(ws) * 1.0 / w) AS BIGINT)), i ->
       |        (CASE WHEN (doc_id + i) % 11 = 0 THEN '{' ELSE '' END) ||
       |        array_to_string(list_slice(ws, i*w + 1, i*w + w), ' ') ||
       |        (CASE WHEN (doc_id + i) % 7 = 0 THEN ' javascript' ELSE '' END) ||
       |        (CASE WHEN (doc_id + i) % 3 = 0 THEN '.' ELSE '' END))
       |    END AS lines
       |  FROM t),
       |k AS (
       |  SELECT doc_id, lines,
       |         list_filter(lines, s ->
       |           s LIKE '%.' AND s NOT LIKE '%javascript%'
       |           AND s NOT LIKE '%{%'
       |           AND len(list_filter(str_split(s, ' '), x -> x <> '')) >= 5)
       |           AS kept
       |  FROM l)
       |SELECT doc_id, CAST(len(lines) AS BIGINT) AS n_lines,
       |       CAST(len(kept) AS BIGINT) AS n_kept,
       |       len(kept) >= 3 AS keep_doc,
       |       md5(coalesce(array_to_string(kept, chr(10)), '')) AS clean_md5
       |FROM k""".stripMargin

  /** Gopher-style within-document line repetition: the duplicate-line
    * fraction (count- and character-weighted) over the planted lines,
    * where every 6th line is a copy of line 0 — the "fraction of
    * duplicated lines" quality signal. Distinct-based formulation
    * (1 − distinct/total) so the metric is a pure array expression. */
  private val dupLineFraction: Q = (s, dir) => {
    // same ws staging as c4_line_filter (per-element lambda re-evaluation)
    Tables.documents(s, dir)
      .select(col("doc_id"), LineOps.words(col("text")).as("ws"))
      .select(col("doc_id"),
        LineOps.dupLines(col("doc_id"), col("ws")).as("lines"))
      .select(
        col("doc_id"),
        size(col("lines")).cast("long").as("n_lines"),
        size(array_distinct(col("lines"))).cast("long").as("n_distinct"),
        when(size(col("lines")) > 0,
          round(lit(1.0) - size(array_distinct(col("lines"))).cast("double") /
            size(col("lines")), 6)).as("dup_line_frac"),
        when(LineOps.lineChars(col("lines")) > 0,
          round(lit(1.0) -
            LineOps.lineChars(array_distinct(col("lines"))).cast("double") /
            LineOps.lineChars(col("lines")), 6)).as("dup_char_frac"))
  }

  private val dupLineFractionSql =
    s"""WITH t AS (
       |  SELECT doc_id, $duckWords AS ws, 4 + doc_id % 4 AS w FROM documents),
       |l AS (
       |  SELECT doc_id,
       |    CASE WHEN len(ws) = 0 THEN CAST([] AS VARCHAR[]) ELSE
       |      list_transform(range(0, CAST(ceil(len(ws) * 1.0 / w) AS BIGINT)), i ->
       |        array_to_string(list_slice(ws,
       |          (CASE WHEN (doc_id + i) % 6 = 0 AND i > 0 THEN 0 ELSE i END)*w + 1,
       |          (CASE WHEN (doc_id + i) % 6 = 0 AND i > 0 THEN 0 ELSE i END)*w + w), ' '))
       |    END AS lines
       |  FROM t),
       |m AS (
       |  SELECT doc_id, lines, list_distinct(lines) AS dl,
       |         list_sum(list_transform(lines, x -> length(x))) AS ct,
       |         list_sum(list_transform(list_distinct(lines), x -> length(x))) AS cd
       |  FROM l)
       |SELECT doc_id, CAST(len(lines) AS BIGINT) AS n_lines,
       |       CAST(len(dl) AS BIGINT) AS n_distinct,
       |       CASE WHEN len(lines) > 0
       |            THEN round(1.0 - CAST(len(dl) AS DOUBLE) / len(lines), 6) END
       |         AS dup_line_frac,
       |       CASE WHEN ct > 0
       |            THEN round(1.0 - CAST(cd AS DOUBLE) / ct, 6) END
       |         AS dup_char_frac
       |FROM m""".stripMargin

  val all: Map[String, Q] = Map(
    "c4_line_filter"    -> c4LineFilter,
    "dup_line_fraction" -> dupLineFraction)

  val oracles: Map[String, String] = Map(
    "c4_line_filter"    -> c4LineFilterSql,
    "dup_line_fraction" -> dupLineFractionSql)
}
