package graft

import org.apache.spark.sql.functions._
import graft.functions.SortedSearch

/** SortedCountLE must agree EXACTLY with the HOF form it replaces —
  * size(filter(bs, b -> b <= v)) on an ascending-sorted array — on
  * boundary-heavy inputs (v below all, above all, equal to elements,
  * duplicate elements), for both element types, through BOTH the
  * codegen and interpreted paths (the full-suite run exercises codegen;
  * correctness is the equality itself).
  */
class SortedSearchSpec extends SparkSpec {

  test("binary-search count == HOF count on longs, all boundary shapes") {
    import spark.implicits._
    val arrays = Seq(
      Seq(1L, 3L, 3L, 7L, 9L), Seq(5L), Seq(2L, 2L, 2L, 2L),
      (1L to 256L).toSeq)
    val probes = Seq(Long.MinValue, 0L, 1L, 2L, 3L, 4L, 7L, 9L, 10L, 256L,
      Long.MaxValue)
    val df = arrays.flatMap(a => probes.map(p => (a, p))).toDF("bs", "v")
      .select(col("bs"), col("v"),
        SortedSearch.sortedCountLE(col("bs"), col("v")).as("bin"),
        size(filter(col("bs"), b => b <= col("v"))).as("hof"))
    val bad = df.filter(col("bin") =!= col("hof")).collect()
    assert(bad.isEmpty, s"divergence: ${bad.mkString("; ")}")
  }

  test("binary-search count == HOF count on doubles incl. duplicates") {
    import spark.implicits._
    val a = Seq(0.5, 1.25, 1.25, 2.0, 100.75)
    val probes = Seq(-1.0, 0.5, 1.0, 1.25, 1.9999, 2.0, 2.0001, 1e9)
    val df = probes.map(p => (a, p)).toDF("bs", "v")
      .select(
        SortedSearch.sortedCountLE(col("bs"), col("v")).as("bin"),
        size(filter(col("bs"), b => b <= col("v"))).as("hof"))
    assert(df.filter(col("bin") =!= col("hof")).count() == 0)
  }

  test("empty array counts zero") {
    import spark.implicits._
    val df = Seq((Seq.empty[Long], 5L)).toDF("bs", "v")
      .select(SortedSearch.sortedCountLE(col("bs"), col("v")).as("bin"))
    assert(df.head().getInt(0) == 0)
  }
}
