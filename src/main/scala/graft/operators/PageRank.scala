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
  * Scale shape (per iteration), chosen by vertex count:
  *
  *   - BROADCAST path (vertices ≤ `broadcastMaxVertices`): ranks is
  *     vertex-scale and small, so the contribution join is
  *     broadcast-hash with NO edge shuffle; the inflow aggregate is
  *     map-side-combinable on dst and reuses the edge relation's
  *     checkpointed hash(dst) partitioning — the edge relation is
  *     shuffled ONCE at entry, zero exchanges per round after that.
  *   - SHUFFLE path (above the threshold — a web-scale link graph has
  *     ~10⁹ vertices, and rebuilding a multi-GB broadcast per round is
  *     a driver/executor-memory scale-killer): the edge relation is
  *     checkpointed hash(src)-partitioned instead, and each round
  *     shuffle-hash-joins the VERTEX-scale rank relation to it on
  *     src — the edge side (the 100 TB side) still never re-shuffles;
  *     per round only ranks move, plus the map-side-combined inflow
  *     partials on dst (≤ vertices × tasks rows).
  *
  * Dangling mass is a single-row broadcast aggregate either way. Edges
  * are localCheckpoint'ed once (loop inputs must not re-derive their
  * upstream per round — same rationale as connectedComponents).
  */
object PageRank {

  /** Rank mass scale: units of 10⁻¹² of total probability mass. */
  val Scale: Long = 1000000000000L

  /** Default broadcast/shuffle cutover: a rank row is (node, outdeg,
    * units) ≈ 24 B packed, ~50 B as a broadcast hash relation, so 10⁶
    * vertices ≈ 50 MB per round — about the most one should rebuild
    * and ship every iteration; beyond it the per-round rank join
    * switches to a shuffle-hash join that never touches the edges. */
  val BroadcastMaxVertices: Long = 1000000L

  /** Run `iters` damped rounds over `vertices` (column `node`) and
    * directed `edges` (columns `src`, `dst`; symmetrize upstream for an
    * undirected graph). Returns (node, outdeg, units) — identical
    * through both propagation paths; `forceShuffle` pins the path for
    * tests/gates (None = choose by `broadcastMaxVertices`). */
  def run(vertices: DataFrame, edges: DataFrame, iters: Int,
          dampingPct: Int = 85,
          forceShuffle: Option[Boolean] = None,
          broadcastMaxVertices: Long = BroadcastMaxVertices): DataFrame = {
    val verts = vertices.select(col("node").cast("long"))
    val n = verts.count()
    require(n > 0, "PageRank needs at least one vertex")
    val useShuffle = forceShuffle.getOrElse(n > broadcastMaxVertices)

    // partition BEFORE the checkpoint (localCheckpoint preserves
    // outputPartitioning) on the column the per-round plan keys on, so
    // the edge relation is shuffled ONCE total, not once per round:
    // hash(dst) serves the broadcast path's inflow aggregate; hash(src)
    // serves the shuffle path's rank join (EnsureRequirements then
    // shuffles only the rank side, to e's partition count).
    // Loop-stage sizing is AQE partition coalescing (guide §2: derive
    // partitioning from data size, not a constant): repartition WITHOUT
    // an explicit count is AQE-coalescible, so the checkpointed edge
    // relation lands at advisory-sized partitions at any scale — the r14
    // form materialized the edges twice (checkpoint → count → repartition
    // by a count-derived width → second checkpoint, three jobs) to learn
    // a width AQE already knows.
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .repartition(col(if (useShuffle) "src" else "dst"))
      .localCheckpoint()

    val deg = verts
      .join(e.groupBy(col("src")).agg(count(lit(1)).as("outdeg")),
        col("node") === col("src"), "left")
      .select(col("node"), coalesce(col("outdeg"), lit(0L)).as("outdeg"))
      .localCheckpoint()
    val base = (Scale * (100 - dampingPct)) / (100L * n)

    // no checkpoint: rank₀ is a constant projection of the checkpointed
    // deg — lineage stays depth-1 and the materialization job is saved
    var ranks = deg.select(col("node"), col("outdeg"),
      lit(Scale / n).as("units"))
    for (_ <- 1 to iters) {
      // src rows always have outdeg >= 1, so the integer div is safe
      val contrib =
        if (useShuffle)
          // SHUFFLE_HASH hint beats size-based selection, so neither the
          // optimizer nor AQE can demote this to a per-round broadcast
          e.join(ranks.hint("shuffle_hash"), col("src") === col("node"))
        else
          e.join(broadcast(ranks), col("src") === col("node"))
      val inflow = contrib
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
