package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Level-synchronous BFS hop distances — the iterative traversal
  * primitive (Pregel's canonical example) the graph suite still lacked
  * next to components / PageRank / triangles / k-core. The recurrence is
  * the min-union form: dist_i = MIN per node over
  * (dist_{i-1} ∪ {(neighbor(n), d(n)+1) : n ∈ dist_{i-1}}), which reaches
  * each node first at its shortest hop count (level-synchronous BFS) and
  * is IDEMPOTENT once every reachable node is labeled — so a fixed
  * unrolled round count is a sound oracle, and convergence is detected
  * by the labeled-node count going stable.
  *
  * Per round: one hash join of the label relation against the edge
  * relation (shuffle ∝ labeled frontier × degree) + one
  * map-side-combinable min aggregate; per-round localCheckpoint (loop
  * inputs must not re-derive upstream). `maxRounds` is
  * convergence-or-throw: a graph whose eccentricity exceeds the budget
  * raises rather than returning half-labeled distances.
  */
object Bfs {

  /** (node, d) hop distances from `seed` over undirected unique-pair
    * edges (a, b); only REACHED nodes appear. */
  def hopDistances(edges: DataFrame, seed: Long, maxRounds: Int): DataFrame = {
    val und = edges.select(col("a").cast("long"), col("b").cast("long"))
    val e = und
      .unionByName(und.select(col("b").as("a"), col("a").as("b")))
      .localCheckpoint()
    var dist = e.sparkSession.range(1)
      .select(lit(seed).as("node"), lit(0L).as("d"))
      .localCheckpoint()
    var prev = 1L
    var converged = false
    var rounds = 0
    while (!converged && rounds < maxRounds) {
      val upd = dist.unionByName(
          dist.join(e, dist("node") === e("a"))
            .select(col("b").as("node"), (dist("d") + 1).as("d")))
        .groupBy(col("node")).agg(min(col("d")).as("d"))
        .localCheckpoint()
      val cur = upd.count()
      converged = cur == prev
      prev = cur
      dist = upd
      rounds += 1
    }
    require(converged,
      s"BFS did not label a stable node set within $maxRounds rounds")
    dist
  }
}
