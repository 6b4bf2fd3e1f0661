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
}
