package graft

import org.apache.spark.sql.functions._

/** The exact-set-similarity claims: prefix filtering must lose NOTHING
  * (recall 1.0 by the pigeonhole bound — verified against the brute-force
  * all-pairs join), and the capped sparse-cosine verdict must be
  * integer-exact at the threshold. */
class SetSimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def writeDocs(rows: Seq[(Long, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("setsim").toString
    rows.toDF("doc_id", "text")
      .withColumn("source", lit("t")).withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("prefix filter finds exactly the brute-force pair set (recall 1.0)") {
    // near-dup family around a base sentence + unrelated docs; 3-gram
    // sets overlap heavily within the family, not across
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val docs = Seq(
      1L -> base,
      2L -> base, // identical: jaccard 1
      3L -> ("a " + base), // prefix insert: high overlap
      4L -> base.replace("lazy", "sleepy"), // one-token edit
      5L -> "completely different words compose this unrelated document text here",
      6L -> "another entirely distinct set of tokens with no shared shingles at all")
    val dir = writeDocs(docs)
    val got = Queries.all("prefix_filter_jaccard")(spark, dir)
      .select($"d1", $"d2").as[(Long, Long)].collect().toSet

    // brute force: all pairs, exact 3-gram Jaccard >= 3/5
    def shingles(t: String): Set[String] =
      t.split(" ").filter(_.nonEmpty).sliding(3).filter(_.length == 3)
        .map(_.mkString("_")).toSet
    val sh = docs.toMap.view.mapValues(shingles).toMap
    val want = (for {
      a <- docs.map(_._1); b <- docs.map(_._1) if a < b
      ia = sh(a).intersect(sh(b)).size; ua = sh(a).union(sh(b)).size
      if ua > 0 && ia * 5L >= ua * 3L
    } yield (a, b)).toSet
    assert(got == want, s"got $got, want $want")
    assert(want.nonEmpty, "fixture must exercise the positive path")
    assert(!want.exists(p => p._1 >= 5L || p._2 >= 5L),
      "unrelated docs must not pair")
  }

  test("sparse cosine threshold decides in integers at the boundary") {
    // two docs sharing exactly half their (rare) shingle mass sit AT
    // cos = 0.5 when dot² * 4 == n1sq * n2sq — the >= must keep them
    val dir = writeDocs(Seq(
      1L -> "alpha beta gamma delta epsilon zeta",
      2L -> "alpha beta gamma delta unrelatedx unrelatedy unrelatedz unrelatedw"))
    val out = Queries.all("sparse_cosine_pairs")(spark, dir)
      .select($"d1", $"d2", $"dot", $"n1sq", $"n2sq").collect()
    out.foreach { r =>
      val (dot, n1, n2) = (r.getAs[Long]("dot"),
        r.getAs[Long]("n1sq"), r.getAs[Long]("n2sq"))
      assert(4 * dot * dot >= n1 * n2, "emitted pair violates the threshold")
    }
  }

  test("equi_depth_histogram buckets partition the relation exactly") {
    val hist = Queries.all("equi_depth_histogram")(spark, sf001)
    val total = hist.agg(sum($"n_rows")).as[Long].head()
    val nRows = graft.sources.Tables.lineitem(spark, sf001).count()
    assert(total == nRows, "bucket counts must sum to the relation size")
    // bucket value ranges must not overlap when ordered by bucket id
    val rows = hist.orderBy($"bucket")
      .select($"bucket", $"min_v", $"max_v")
      .as[(Long, Long, Long)].collect()
    rows.sliding(2).foreach {
      case Array((_, _, hi1), (_, lo2, _)) =>
        assert(hi1 <= lo2, "adjacent buckets overlap in value space")
      case _ =>
    }
    assert(rows.length == 16, "all 16 buckets must be populated here")
  }
}
