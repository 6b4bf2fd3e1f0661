package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Line-level corpus cleaning — the C4 / CCNet / Gopher document-structure
  * operators that work on a document's LINES rather than its words: keep
  * only well-formed sentences (C4's "ends in terminal punctuation, has at
  * least N words, isn't boilerplate/code"), and measure within-document
  * line repetition (Gopher's duplicate-line fraction).
  *
  * Everything here is ROW-LOCAL: one projection of codegen'd higher-order
  * functions (`transform`/`filter`/`aggregate` over the split array) per
  * document — no explode, no shuffle, no state. At 100 TB this pass is a
  * pure map over the corpus scan; cost ∝ bytes read, parallelism ∝ input
  * splits. That is the plan you want for per-document cleaning and exactly
  * how the production pipelines run this step (a flatMap over docs).
  *
  * The driver fixture corpus (TESTDATA.md) has no newlines, so the gates
  * PLANT a deterministic line structure first — same convention as
  * `pii_scrub` (enrichment derived from doc_id, replayed identically in
  * the DuckDB oracle): tokens are grouped into fixed-width lines of
  * `4 + doc_id % 4` words, then decorated/duplicated by doc_id+index
  * congruences so every rule in the operator under test fires on real
  * mixed outcomes (kept lines, dropped lines, duplicated lines).
  */
object LineOps {

  /** Words per planted line for a doc: 4 + doc_id % 4 ∈ [4, 7]. */
  def lineWidth(docId: Column): Column =
    (lit(4) + pmod(docId, lit(4))).cast("int")

  /** Non-empty whitespace tokens of `text`. */
  def words(text: Column): Column =
    filter(split(text, " "), w => w =!= "")

  /** Number of planted lines for `n` words at width `w`: ceil(n / w). */
  private def lineCount(n: Column, w: Column): Column =
    ceil(n.cast("double") / w).cast("int")

  /** C4-style decorated line array. Line i (0-based) is the i-th w-word
    * slice of `ws`, decorated by congruences of (doc_id + i):
    *   - % 7 == 0  → " javascript" appended   (boilerplate marker)
    *   - % 11 == 0 → "{" prepended            (code marker)
    *   - % 3 == 0  → "." appended             (terminal punctuation)
    * A line can carry several decorations — rule precedence in the filter
    * is part of what the gate checks.
    */
  def c4Lines(docId: Column, ws: Column): Column = {
    val w = lineWidth(docId)
    val n = size(ws)
    when(n === 0, array().cast("array<string>")).otherwise(
      transform(sequence(lit(0), lineCount(n, w) - 1), i => {
        val k = docId + i
        concat(
          when(pmod(k, lit(11)) === 0, lit("{")).otherwise(lit("")),
          array_join(slice(ws, i * w + 1, w), " "),
          when(pmod(k, lit(7)) === 0, lit(" javascript")).otherwise(lit("")),
          when(pmod(k, lit(3)) === 0, lit(".")).otherwise(lit("")))
      }))
  }

  /** The C4 line-keep rule: terminal '.', ≥ 5 words, no code/boilerplate
    * marker. Word count is over single-space splits (lines are built by
    * single-space joins, so no empty tokens arise). */
  def keepLine(s: Column): Column =
    s.endsWith(".") && !s.contains("javascript") && !s.contains("{") &&
      (size(split(s, " ")) >= 5)

  /** Kept lines under [[keepLine]]. */
  def c4Kept(lines: Column): Column = filter(lines, keepLine _)

  /** Duplicate-metric line array: UNdecorated w-word slices, where line i
    * with (doc_id + i) % 6 == 0 and i > 0 is replaced by a copy of line 0
    * — planting guaranteed within-doc duplicate lines. */
  def dupLines(docId: Column, ws: Column): Column = {
    val w = lineWidth(docId)
    val n = size(ws)
    when(n === 0, array().cast("array<string>")).otherwise(
      transform(sequence(lit(0), lineCount(n, w) - 1), i => {
        val src = when(pmod(docId + i, lit(6)) === 0 && i > 0, lit(0))
          .otherwise(i)
        array_join(slice(ws, src * w + 1, w), " ")
      }))
  }

  /** Total characters across a line array. */
  def lineChars(lines: Column): Column =
    aggregate(lines, lit(0L), (a, x) => a + length(x))
}
