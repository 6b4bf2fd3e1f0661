package graft

import graft.operators.LmScore

class LmScoreSpec extends SparkSpec {
  import spark.implicits._

  // corpus: doc 1 repeats the a<->b transition, doc 2 is all unseen-once
  // transitions, doc 3 has no bigram at all. Hand-computed under α = 0.5,
  // V = 8 ({a,b,x,y,z,q,r,s}):
  //   doc 1: every bigram is (a,b) or (b,a) with c12 = 3, c1 = 3
  //          → lp = ln(3.5 / (3 + 0.5·8)) = ln(0.5)
  //   doc 2: every bigram unique, c12 = 1, c1 = 1
  //          → lp = ln(1.5 / (1 + 0.5·8)) = ln(0.3)
  private lazy val scored = LmScore.bigramLmScore(
    Seq(
      (1L, "a b a b a b a"),
      (2L, "x y z q r s"),
      (3L, "a")).toDF("doc_id", "text"),
    "doc_id", "text", 0.5)
    .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap

  test("repeated transitions outscore one-off transitions") {
    assert(scored(1L)._2 > scored(2L)._2)
  }

  test("scores match the closed-form smoothed log-probabilities") {
    assert(scored(1L) === ((6L, math.round(math.log(3.5 / 7.0) * 1e6) / 1e6)))
    assert(scored(2L) === ((5L, math.round(math.log(1.5 / 5.0) * 1e6) / 1e6)))
  }

  test("docs without bigrams get (0, 0.0), not dropped") {
    assert(scored(3L) === ((0L, 0.0)))
  }
}
