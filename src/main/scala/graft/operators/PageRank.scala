package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Damped PageRank in INTEGER rank-units — link-analysis centrality, the
  * quality signal web-scale pretraining pipelines compute over a link
  * graph (Common-Crawl-style harmonic/PageRank document ranking).
  *
  * Determinism contract: ranks live in units of 10⁻¹² (long). Every
  * per-iteration operation is integer arithmetic — contribution =
  * `units div outdeg`, damping = `(85 · x) div 100`, dangling
  * redistribution = `dang div n` — so the sum order doesn't matter
  * (bigint addition is associative, unlike double), and an oracle that
  * unrolls the same iterations in any engine reproduces every unit
  * bit-for-bit. Float PageRank can't be cross-engine-gated; this can.
  *
  * Scale shape (per iteration): ranks is VERTEX-scale (broadcast — at
  * 100 TB the edge relation is the big one; vertices ≪ edges), so the
  * contribution join is broadcast-hash with NO edge shuffle; the inflow
  * aggregate is map-side-combinable on dst and reuses the edge
  * relation's checkpointed hash(dst) partitioning — the edge relation
  * is shuffled ONCE at entry, zero exchanges per round after that.
  * Dangling mass is a single-row broadcast aggregate. Edges are
  * localCheckpoint'ed once (loop inputs must not re-derive their
  * upstream per round — same rationale as connectedComponents).
  */
object PageRank {

  /** Rank mass scale: units of 10⁻¹² of total probability mass. */
  val Scale: Long = 1000000000000L

  /** Run `iters` damped rounds over `vertices` (column `node`) and
    * directed `edges` (columns `src`, `dst`; symmetrize upstream for an
    * undirected graph). Returns (node, outdeg, units). */
  def run(vertices: DataFrame, edges: DataFrame, iters: Int,
          dampingPct: Int = 85): DataFrame = {
    val session = vertices.sparkSession
    val confParts = session.conf.get("spark.sql.shuffle.partitions").toInt

    val eRaw = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .localCheckpoint()
    // size loop stages to the edge count, never by mutating session conf
    val loopParts = math.max(1,
      math.min(confParts, math.ceil(eRaw.count() / 50000.0).toInt))
    // hash(dst) BEFORE the checkpoint: the per-round inflow aggregate
    // groups on dst, and localCheckpoint preserves outputPartitioning —
    // one edge shuffle total, not one per round
    val e = eRaw.repartition(loopParts, col("dst")).localCheckpoint()

    val deg = vertices.select(col("node").cast("long"))
      .join(e.groupBy(col("src")).agg(count(lit(1)).as("outdeg")),
        col("node") === col("src"), "left")
      .select(col("node"), coalesce(col("outdeg"), lit(0L)).as("outdeg"))
      .localCheckpoint()
    val n = deg.count()
    require(n > 0, "PageRank needs at least one vertex")
    val base = (Scale * (100 - dampingPct)) / (100L * n)

    var ranks = deg.select(col("node"), col("outdeg"),
      lit(Scale / n).as("units")).localCheckpoint()
    for (_ <- 1 to iters) {
      // src rows always have outdeg >= 1, so the integer div is safe
      val inflow = e.join(broadcast(ranks), col("src") === col("node"))
        .groupBy(col("dst"))
        .agg(sum(expr("units div outdeg")).as("inflow"))
      val dang = ranks.filter(col("outdeg") === 0)
        .agg(coalesce(sum(col("units")), lit(0L)).as("dang"))
      ranks = deg.join(inflow, deg("node") === inflow("dst"), "left")
        .crossJoin(broadcast(dang))
        .select(deg("node"), deg("outdeg"),
          (lit(base) + expr(
            s"($dampingPct * (coalesce(inflow, 0L) + dang div $n)) div 100"))
            .as("units"))
        .localCheckpoint()
    }
    ranks
  }
}
