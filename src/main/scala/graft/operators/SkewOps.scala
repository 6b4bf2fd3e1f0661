package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation: salted two-phase aggregation.
  *
  * A single hot key (the 100 TB failure mode: one partition gets the
  * world) is split across `salts` sub-keys in phase 1 — partial aggregates
  * shuffle under (key, salt), spreading the hot key over `salts` reducers
  * — then phase 2 merges the partials under the key alone, touching only
  * one small row per (key, salt). AQE's skew-join handling covers joins;
  * this is the aggregation-side equivalent, and the final result is
  * bit-identical to the unsalted aggregate for any decomposable aggregate
  * (sum/count/min/max).
  *
  * The salt derives from a deterministic hash of `saltSource` (not
  * rand()): re-runs and retried tasks produce identical partials, keeping
  * the operator safe under speculative execution.
  */
object SkewOps {

  /** count + sum(valueCol) per `key`, computed via salted two-phase
    * aggregation with `salts` sub-keys. */
  def saltedCountSum(df: DataFrame, key: Column, valueCol: Column,
                     saltSource: Column, salts: Int): DataFrame =
    df.select(key.as("key"), valueCol.as("v"),
        pmod(hash(saltSource), lit(salts)).as("salt"))
      .groupBy(col("key"), col("salt"))
      .agg(count(lit(1)).as("pc"), sum(col("v")).as("ps"))
      .groupBy(col("key"))
      .agg(sum(col("pc")).as("n_rows"), sum(col("ps")).as("sum_value"))

  /** Salted replicate-dim shuffle join — the JOIN-side skew fix for when
    * the dim is too big to broadcast AND the fact is hot on a few keys
    * (AQE's skew-join split handles sort-merge joins after the fact; this
    * is the a-priori form that never builds the hot partition at all).
    * Fact rows get salt = hash(saltSource) mod `salts`; dim rows
    * replicate ×`salts` (explode over 0..salts-1, a row-local fan-out of
    * the SMALL side); the equi-join keys become (key, salt), so a hot key
    * spreads over `salts` reducers. Result ≡ the plain equi-join — every
    * fact row still meets exactly its one dim row, in exactly one salt
    * bucket. Dim columns pass through; the `_sk_salt` scratch column is
    * dropped. The dim side carries a SHUFFLE_HASH hint: at gate scale
    * Spark would broadcast the dim (making salting a no-op in the plan);
    * the hint pins the shuffle topology the operator exists for. */
  def saltedJoin(fact: DataFrame, dim: DataFrame,
                 factKey: String, dimKey: String,
                 saltSource: Column, salts: Int): DataFrame = {
    val f = fact.withColumn("_sk_salt", pmod(hash(saltSource), lit(salts)))
    val d = dim.withColumn("_sk_salt",
      explode(array((0 until salts).map(i => lit(i)): _*)))
    f.join(d.hint("shuffle_hash"),
        f(factKey) === d(dimKey) && f("_sk_salt") === d("_sk_salt"))
      .drop("_sk_salt")
  }
}
