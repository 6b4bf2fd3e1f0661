package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.LineOps

/** Hand-computed pins for LineOps' planted-line construction and the C4
  * keep rule — the Scala-side formulas the DuckDB oracle mirrors in
  * LineQueries must produce exactly these values. */
class C4LineSpec extends AnyFunSuite with SparkSpec {

  private def linesOf(docId: Long, text: String): (Seq[String], Seq[String]) = {
    import spark.implicits._
    val df = Seq((docId, text)).toDF("doc_id", "text")
      .select(LineOps.c4Lines(col("doc_id"), LineOps.words(col("text"))).as("l"))
      .select(col("l"), LineOps.c4Kept(col("l")).as("k"))
      .head()
    (df.getSeq[String](0), df.getSeq[String](1))
  }

  test("doc 0: width 4, all congruences fire on line 0") {
    // doc_id 0 → w = 4. 9 words → 3 lines (indices 0, 1, 2).
    val (lines, kept) = linesOf(0L, "a b c d e f g h i")
    // line 0: k=0 → %11, %7, %3 all hit: '{' prefix, ' javascript', '.'
    assert(lines(0) == "{a b c d javascript.")
    // line 1: k=1 → nothing fires
    assert(lines(1) == "e f g h")
    // line 2: k=2 → nothing fires (2 % 3 != 0)
    assert(lines(2) == "i")
    // '{' and 'javascript' kill line 0; lines 1-2 lack terminal '.'
    assert(kept.isEmpty)
  }

  test("doc 3: terminal-punct lines with >= 5 words survive") {
    // doc_id 3 → w = 7; 14 words → 2 lines, ks 3 and 4.
    // k=3: %3 fires → '.' appended, 7 words → KEPT.
    // k=4: nothing fires → no '.', dropped.
    val (lines, kept) =
      linesOf(3L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12 w13 w14")
    assert(lines == Seq("w1 w2 w3 w4 w5 w6 w7.", "w8 w9 w10 w11 w12 w13 w14"))
    assert(kept == Seq("w1 w2 w3 w4 w5 w6 w7."))
  }

  test("word-count rule: a 4-word terminal line is dropped") {
    // doc_id 6 → w = 6... use doc 102: w = 4 + 102%4 = 6. k=102: %3 fires.
    // One 4-word line with '.' → only 4 words → dropped by the >=5 rule.
    val (lines, kept) = linesOf(102L, "a b c d")
    assert(lines == Seq("a b c d."))
    assert(kept.isEmpty)
  }

  test("empty text yields zero lines") {
    val (lines, kept) = linesOf(5L, "")
    assert(lines.isEmpty && kept.isEmpty)
  }

  test("dup lines: every 6th line is a copy of line 0") {
    import spark.implicits._
    // doc_id 0 → w = 4; 28 words → 7 lines; (0+i)%6==0 && i>0 → i=6 copies line 0.
    val words = (1 to 28).map(i => s"t$i").mkString(" ")
    val row = Seq((0L, words)).toDF("doc_id", "text")
      .select(LineOps.dupLines(col("doc_id"), LineOps.words(col("text"))).as("l"))
      .select(col("l"), size(array_distinct(col("l"))).as("nd"),
        LineOps.lineChars(col("l")).as("ct"),
        LineOps.lineChars(array_distinct(col("l"))).as("cd"))
      .head()
    val lines = row.getSeq[String](0)
    assert(lines.length == 7)
    assert(lines(6) == lines(0) && lines(6) == "t1 t2 t3 t4")
    assert(row.getInt(1) == 6) // 7 lines, one duplicate
    assert(row.getLong(2) == lines.map(_.length).sum)
    assert(row.getLong(3) == lines.distinct.map(_.length).sum)
  }
}
