package graft

import org.apache.spark.sql.functions._

class QualityClassifierSpec extends SparkSpec {
  import spark.implicits._

  test("two GD rounds separate disjoint-vocabulary classes") {
    val docs = (1L to 10L).map { i =>
      if (i % 2 == 1) (i, "en", "good clean prose here")
      else (i, "xx", "zz9 qq8 vv7 kk6")
    }.toDF("doc_id", "lang", "text")
      .unionByName(Seq((11L, "en", "")).toDF("doc_id", "lang", "text"))
    val scored = operators.QualityClassifier.logRegQualityScores(
        docs, "doc_id", "text", col("lang") === "en",
        buckets = 64, lr = 10.0, rounds = 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // positives above the boundary, negatives below, empty doc exactly 0.5
    (1L to 10L).foreach { i =>
      if (i % 2 == 1) assert(scored(i) > 0.6, s"doc $i: ${scored(i)}")
      else assert(scored(i) < 0.4, s"doc $i: ${scored(i)}")
    }
    assert(scored(11L) === 0.5)
  }
}
