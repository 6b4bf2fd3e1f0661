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
    val cov = covariance(vectors, vecCol, dim).localCheckpoint()

    val w0 = java.math.BigDecimal.valueOf(1.0 / math.sqrt(dim.toDouble))
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    var w: DataFrame = spark.range(1, dim + 1)
      .select(col("id").cast("int").as("j"), lit(w0).as("w"))

    for (_ <- 1 to iters) {
      // u = C·w with order-free fixed-point sums (terms rounded to 1e-12)
      val u = cov.join(w, "j")
        .groupBy(col("i"))
        .agg((sum(round((col("c") * col("w")) * lit(1e12)).cast("long")) / lit(1e12)).as("u"))
      val n2 = u.agg(
        (sum(round((col("u") * col("u")) * lit(1e12)).cast("long")) / lit(1e12)).as("n2"))
      w = u.crossJoin(broadcast(n2))
        .select(col("i").as("j"), round(col("u") / sqrt(col("n2")), 6).as("w"))
        .localCheckpoint()
    }

    val ev = cov
      .join(w.select(col("j").as("i"), col("w").as("wi")), "i")
      .join(w.select(col("j"), col("w").as("wj")), "j")
      .agg((sum(round((col("c") * col("wi") * col("wj")) * lit(1e12)).cast("long")) /
        lit(1e12)).as("e"))
    w.crossJoin(broadcast(ev))
      .select(col("j").cast("long").as("dim_idx"), col("w").as("loading"),
        round(col("e"), 6).as("eigval"))
  }
}
