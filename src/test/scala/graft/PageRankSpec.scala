package graft

import org.apache.spark.sql.functions._
import graft.operators.PageRank

class PageRankSpec extends SparkSpec {
  import spark.implicits._

  test("one iteration matches the hand-computed integer recurrence") {
    // path graph 1-2-3 plus isolated 4: n=4, start units = 2.5e11 each.
    // outdeg: 1->1, 2->2, 3->1, 4->0 (dangling).
    val verts = Seq(1L, 2L, 3L, 4L).toDF("node")
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L)).toDF("src", "dst")
    val r = PageRank.run(verts, edges, iters = 1)
      .collect().map(x => x.getLong(0) -> x.getLong(2)).toMap
    val n = 4L
    val start = PageRank.Scale / n                      // 250000000000
    val base = (PageRank.Scale * 15) / (100 * n)        // 37500000000
    val dangShare = start / n                           // 62500000000
    def next(inflow: Long) = base + (85L * (inflow + dangShare)) / 100
    // node1 inflow = units(2) div 2; node2 = units(1) div 1 + units(3) div 1
    assert(r(1L) == next(start / 2))
    assert(r(2L) == next(start + start))
    assert(r(3L) == next(start / 2))
    assert(r(4L) == next(0L))
  }

  test("three iterations conserve mass to within n floor-losses") {
    val verts = (1L to 6L).toDF("node")
    val e0 = Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 5L))
    val edges = (e0 ++ e0.map(_.swap)).toDF("src", "dst")
    val total = PageRank.run(verts, edges, iters = 3)
      .agg(sum($"units")).as[Long].head()
    // every floor drops < 1 unit; a handful of divisions per node per round
    assert(total <= PageRank.Scale && total > PageRank.Scale - 6 * 3 * 4)
  }
}
