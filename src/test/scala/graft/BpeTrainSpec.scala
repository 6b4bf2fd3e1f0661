package graft

import org.apache.spark.sql.functions._

class BpeTrainSpec extends SparkSpec {
  import spark.implicits._

  test("bpeMerges replays textbook greedy BPE with deterministic tie-breaks") {
    // low/lower/lowest: round 1 ties 'l o' vs 'o w' at 3 — pair-asc picks
    // 'l o'; round 4 ties 'lowe r' vs 'lowe s' at 1 — picks 'lowe r'
    val docs = Seq("low lower lowest").toDF("text")
    val m = operators.BpeTrain.bpeMerges(docs, "text", 4)
      .orderBy("step").collect()
    assert(m.map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq ===
      Seq((1L, "l o", "lo", 3L), (2L, "lo w", "low", 3L),
          (3L, "low e", "lowe", 2L), (4L, "lowe r", "lower", 1L)))
  }

  test("merge application is left-to-right non-overlapping (greedy BPE)") {
    // 'aaa' has pair 'a a' twice overlapping; one merge pass must yield
    // 'aa a' (count 2 at selection, ONE application), and round 2 then
    // merges 'aa a'
    val docs = Seq("aaa").toDF("text")
    val m = operators.BpeTrain.bpeMerges(docs, "text", 2)
      .orderBy("step").collect()
    assert(m(0).getString(1) === "a a" && m(0).getLong(3) === 2L)
    assert(m(1).getString(1) === "aa a" && m(1).getString(2) === "aaa")
  }

  test("bpeEncode counts post-merge symbols via the trained vocab") {
    // after the 4 merges above: low → 1 symbol, lower → 1, lowest → 3
    // ('lowe','s','t'); docs with no alnum words keep (0, 0)
    val docs = Seq((1L, "low lower lowest"), (2L, "low low"), (3L, "!!!"))
      .toDF("doc_id", "text")
    val e = operators.BpeTrain.bpeEncode(docs, "doc_id", "text", 4)
      .orderBy("doc_id").collect()
    assert(e.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ===
      Seq((1L, 3L, 5L), (2L, 2L, 2L), (3L, 0L, 0L)))
  }

  test("multi-char merged symbols stay atomic under the space framing") {
    val docs = Seq("abab abab cd").toDF("text")
    val m = operators.BpeTrain.bpeMerges(docs, "text", 3)
      .orderBy("step").collect()
    // 'a b' (4) → 'ab ab' (2) → 'abab' exists as one symbol
    assert(m(0).getString(2) === "ab")
    assert(m(1).getString(1) === "ab ab" && m(1).getString(2) === "abab")
  }
}
