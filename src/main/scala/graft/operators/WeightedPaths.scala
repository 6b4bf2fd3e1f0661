package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Level-synchronous single-source WEIGHTED shortest paths —
  * Bellman–Ford as iterated relaxation, the weighted completion of
  * `Bfs.hopDistances` (a longer-hop path can be shorter in weight, so a
  * BFS frontier is not enough): dist_i = MIN per node over
  * (dist_{i-1} ∪ {(b, d(a) + w(a,b))}). Distances only DECREASE and are
  * bounded below, so the fixpoint test is exact integer bookkeeping:
  * converged ⟺ (labeled count, Σ dist) both stable — a float distance
  * would make that test (and the cross-engine oracle) impossible, which
  * is why weights are integer by contract.
  *
  * Per round: one hash join of the label relation against the
  * (checkpointed once) edge relation + one map-side-combinable min
  * aggregate; per-round localCheckpoint; `maxRounds` is
  * convergence-or-throw. Idempotent at the fixpoint, so a fixed
  * unrolled round count is a sound oracle (the Bfs/KCore convention).
  */
object WeightedPaths {

  /** (node, d) integer shortest distances from `seed` over undirected
    * weighted unique-pair edges (a, b, w); only REACHED nodes appear. */
  def shortestDistances(edges: DataFrame, seed: Long,
      maxRounds: Int): DataFrame = {
    val und = edges.select(col("a").cast("long"), col("b").cast("long"),
      col("w").cast("long"))
    val e = und
      .unionByName(und.select(col("b").as("a"), col("a").as("b"), col("w")))
      .localCheckpoint()
    var dist = e.sparkSession.range(1)
      .select(lit(seed).as("node"), lit(0L).as("d"))
      .localCheckpoint()
    var prev = (0L, -1L)
    var converged = false
    var rounds = 0
    while (!converged && rounds < maxRounds) {
      val upd = dist.unionByName(
          dist.join(e, dist("node") === e("a"))
            .select(col("b").as("node"), (dist("d") + col("w")).as("d")))
        .groupBy(col("node")).agg(min(col("d")).as("d"))
        .localCheckpoint()
      val row = upd.agg(count(lit(1)), sum(col("d"))).head()
      val cur = (row.getLong(0), row.getLong(1))
      converged = cur == prev
      prev = cur
      dist = upd
      rounds += 1
    }
    require(converged,
      s"Bellman-Ford did not reach a fixpoint within $maxRounds rounds")
    dist
  }
}
