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

  // ── the two rank-propagation paths ───────────────────────────────────
  // Integer rank-units make path equivalence exact: broadcast-hash and
  // shuffle-hash propagation must agree on every unit, not within an ε.

  private def ringGraph(n: Long) = {
    val verts = (1L to n).toDF("node")
    val e0 = (1L until n).map(i => (i, i + 1)) ++ Seq((n, 1L)) ++
      (1L to n).filter(_ % 7 == 0).map(i => (i, (i * 3) % n + 1))
    val edges = (e0 ++ e0.map(_.swap)).toDF("src", "dst")
    (verts, edges)
  }

  test("shuffle and broadcast propagation paths are bit-identical") {
    val (verts, edges) = ringGraph(200L)
    val a = PageRank.run(verts, edges, iters = 3, forceShuffle = Some(false))
      .orderBy($"node").collect()
    val b = PageRank.run(verts, edges, iters = 3, forceShuffle = Some(true))
      .orderBy($"node").collect()
    assert(a.nonEmpty && a.sameElements(b))
  }

  test("forced paths execute the join shape they claim per round") {
    import org.apache.spark.sql.execution.QueryExecution
    import org.apache.spark.sql.util.QueryExecutionListener
    // capture the executed plans of the per-round localCheckpoint
    // actions; `units div outdeg` is the contribution expression and
    // appears ONLY in PageRank's round plans, so the filter is immune
    // to unrelated actions on the shared session
    val plans = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new QueryExecutionListener {
      def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
        plans.add(qe.executedPlan.toString)
      def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit = ()
    }
    def roundPlans(forceShuffle: Boolean): Seq[String] = {
      plans.clear()
      spark.listenerManager.register(listener)
      try {
        val (verts, edges) = ringGraph(60L)
        PageRank.run(verts, edges, iters = 2, forceShuffle = Some(forceShuffle))
        // listener events are posted asynchronously; poll until the two
        // round plans arrived (bounded — a lost event fails the test)
        val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
        def captured() = {
          import scala.jdk.CollectionConverters._
          plans.iterator().asScala.toSeq.filter(_.contains("div"))
            .filter(_.contains("outdeg"))
        }
        while (captured().size < 2 && System.nanoTime() < deadline)
          Thread.sleep(50)
        captured()
      } finally spark.listenerManager.unregister(listener)
    }
    val shj = roundPlans(forceShuffle = true)
    assert(shj.size >= 2, s"expected 2 captured round plans, got ${shj.size}")
    assert(shj.forall(_.contains("ShuffledHashJoin")),
      "shuffle path must shuffle-hash-join ranks every round")
    val bhj = roundPlans(forceShuffle = false)
    assert(bhj.size >= 2, s"expected 2 captured round plans, got ${bhj.size}")
    assert(bhj.forall(p => p.contains("BroadcastHashJoin") && !p.contains("ShuffledHashJoin")),
      "broadcast path must broadcast-hash-join ranks every round")
  }
}
