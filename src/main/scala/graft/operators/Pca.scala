package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import graft.functions.GramMatrixAgg

/** Principal component analysis over an embedding column — the
  * decorrelation/whitening step a vector pipeline runs before product
  * quantization (OPQ-style rotation), dimensionality reduction, or
  * drift monitoring of an embedding corpus.
  *
  * Scale shape (the 100 TB contract):
  *   1. ONE corpus pass computes all second-moment stats via the custom
  *      `GramMatrixAgg` — a primitive d² multiply-add loop per row, no
  *      row amplification, partials merging as d²+d+1 long buffers, so
  *      the shuffle is tasks × d² longs regardless of corpus size.
  *   2. The covariance (gram/n − μμᵀ) is a d²-row table — driver-scale
  *      metadata, `localCheckpoint`ed once.
  *   3. Power iteration runs ON THE COVARIANCE ONLY: each round is a
  *      d²×d join + d-row normalize. Corpus size never appears again —
  *      the kmeans/quality-classifier training pattern (train on compact
  *      sufficient statistics, never re-read the corpus).
  *
  * Oracle replayability: gram terms are rounded to integer 1e-6 units
  * before order-free Long summation (GramMatrixAgg); covariance entries
  * round to 6 dp; every power-iteration sum accumulates terms rounded to
  * integer 1e-12 units (the TPC-H-Q9 convention) and each round's
  * normalized vector rounds to 6 dp (the kmeans Lloyd's convention) —
  * so DuckDB replays training bit-for-bit as chained CTEs.
  */
object Pca {

  /** (i, j, c): the 6-dp covariance matrix of `vecCol`, 1-based indices,
    * from one `GramMatrixAgg` corpus pass. */
  def covariance(vectors: DataFrame, vecCol: Column, dim: Int): DataFrame = {
    val stats = vectors.agg(ColumnBridge.column(
      GramMatrixAgg(ColumnBridge.expression(vecCol), dim)
        .toAggregateExpression()).as("_pc_s"))
    val n = element_at(col("_pc_s"), dim * dim + dim + 1).cast("double")
    val g = element_at(col("_pc_s"), (col("i") - 1) * dim + col("j")).cast("double")
    def s(ix: Column) = element_at(col("_pc_s"), lit(dim * dim) + ix).cast("double")
    stats
      .select(explode(sequence(lit(1), lit(dim))).as("i"), col("_pc_s"))
      .select(col("i"), explode(sequence(lit(1), lit(dim))).as("j"), col("_pc_s"))
      .select(col("i"), col("j"),
        round(g / (n * lit(1e6)) -
          (s(col("i")) / (n * lit(1e6))) * (s(col("j")) / (n * lit(1e6))), 6).as("c"))
  }

  /** Top principal component by `iters` power-iteration rounds:
    * (dim_idx 1..d, loading, eigval) with eigval the Rayleigh quotient
    * wᵀCw of the final vector (6 dp). Start vector is the uniform unit
    * vector round(1/√d, 6). */
  def topComponent(vectors: DataFrame, vecCol: Column, dim: Int, iters: Int): DataFrame = {
    val spark = vectors.sparkSession
    // ONE distributed corpus pass (GramMatrixAgg) stays on the cluster;
    // the d²-row covariance is driver-scale METADATA (fixed embedding
    // dim, independent of corpus size — 64² = 32 KB here), so the power
    // iteration runs as a driver loop instead of ~5 Spark jobs per round
    // (join + agg + crossJoin + localCheckpoint each round burned ~30
    // jobs / ~2 s of scheduling+planning wall for microseconds of
    // arithmetic — Profile r15). The guide's driver contract (§5) bans
    // DATA-scale driver work, not fixed-d sufficient statistics; this is
    // the kmeans/quality-classifier "train on compact sufficient stats"
    // pattern taken to its driver-scale endpoint.
    //
    // Arithmetic mirrors the former Spark plan (and the DuckDB oracle
    // CTEs) EXACTLY: every product term rounds HALF_UP to integer 1e-12
    // units (Spark round() = BigDecimal HALF_UP) and accumulates into a
    // Long (order-free), each round's vector rounds to 6 dp, same
    // multiply order throughout — bit-identical output by construction.
    def rnd(x: Double, scale: Int): Double =
      java.math.BigDecimal.valueOf(x)
        .setScale(scale, java.math.RoundingMode.HALF_UP).doubleValue()
    val c = Array.ofDim[Double](dim, dim)
    covariance(vectors, vecCol, dim).collect()
      .foreach(r => c(r.getInt(0) - 1)(r.getInt(1) - 1) = r.getDouble(2))

    var w = Array.fill(dim)(rnd(1.0 / math.sqrt(dim.toDouble), 6))
    for (_ <- 1 to iters) {
      // u = C·w: terms (c_ij * w_j) * 1e12, rounded, summed as longs
      val u = Array.tabulate(dim) { i0 =>
        var acc = 0L
        var j0 = 0
        while (j0 < dim) {
          acc += rnd((c(i0)(j0) * w(j0)) * 1e12, 0).toLong
          j0 += 1
        }
        acc / 1e12
      }
      var n2acc = 0L
      u.foreach(ui => n2acc += rnd((ui * ui) * 1e12, 0).toLong)
      val n2 = n2acc / 1e12
      w = u.map(ui => rnd(ui / math.sqrt(n2), 6))
    }
    // Rayleigh quotient wᵀCw with the same fixed-point term convention
    var eacc = 0L
    for (i0 <- 0 until dim; j0 <- 0 until dim)
      eacc += rnd((c(i0)(j0) * w(i0) * w(j0)) * 1e12, 0).toLong
    val eig = rnd(eacc / 1e12, 6)

    import spark.implicits._
    w.toSeq.zipWithIndex
      .map { case (wj, j0) => ((j0 + 1).toLong, wj, eig) }
      .toDF("dim_idx", "loading", "eigval")
  }
}
