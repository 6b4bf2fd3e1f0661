package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic sampling/splitting for training-data pipelines.
  *
  * Assignment is a pure function of the record key (md5-derived bucket in
  * [0, 100)), so splits are: reproducible across runs and engines, stable
  * under repartitioning, join-free (no membership table), and append-safe
  * (new records never reshuffle old assignments) — the properties
  * `rand()`-based splitting lacks. The bucket formula uses only
  * `md5`/`ascii`/`substring`, which hash bit-identically in any SQL engine
  * (the DuckDB oracle runs the same expression).
  */
object Sampling {

  private val HexDigits = "0123456789abcdef"

  /** Pseudo-uniform bucket in [0, 100) from the key's md5: the first four
    * hex digits as a 16-bit integer, mod 100 (max deviation from uniform:
    * 1/655 per bucket). Digit decoding is position-in-alphabet, which both
    * Spark (`locate`) and DuckDB (`strpos`) compute identically. */
  def bucket100(key: Column): Column = {
    val h = md5(key.cast("string"))
    (0 until 4).map { i =>
      (locate2(substring(h, i + 1, 1)) - 1) * (1 << (4 * (3 - i)))
    }.reduce(_ + _) % 100
  }

  private def locate2(c: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(new org.apache.spark.sql.catalyst.expressions.StringLocate(
      ColumnBridge.expression(c),
      org.apache.spark.sql.catalyst.expressions.Literal(HexDigits)))
  }

  /** SQL text of the same bucket (oracle parity by construction). */
  def bucket100Sql(keyExpr: String): String = {
    val h = s"md5(CAST($keyExpr AS VARCHAR))"
    (0 until 4).map { i =>
      s"(strpos('$HexDigits', substring($h, ${i + 1}, 1)) - 1) * ${1 << (4 * (3 - i))}"
    }.mkString("(", " + ", ") % 100")
  }

  /** Train/val/test assignment with the given percentage cut points. */
  def split(key: Column, trainPct: Int = 80, valPct: Int = 10): Column = {
    val b = bucket100(key)
    when(b < trainPct, "train")
      .when(b < trainPct + valPct, "val")
      .otherwise("test")
  }

  /** Deterministic ~pct% sample filter (stratification comes free: the
    * bucket is key-uniform within any stratum). */
  def samplePredicate(key: Column, pct: Int): Column = bucket100(key) < pct
}
