package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream joins (absent in the reference — SURVEY §2.3 "Joins:
  * absent"; inherited from Structured Streaming as a first-class engine
  * operator).
  *
  * Both sides carry watermarks and the join predicate bounds event-time
  * distance, so each side's state is evictable: Spark keeps only rows
  * within (watermark − bound), the streaming analogue of a range-pruned
  * shuffle join. Without the time bound the state would grow without
  * limit — the API makes the 100 TB constraint explicit.
  */
object StreamJoins {

  /** Attribution join: each `right` event (e.g. purchase) matched to every
    * `left` event (e.g. click) of the same key within `lookback` before
    * it. Inputs: (key, eventTime, id) streams with column names
    * (key, t, id); output: (key, left_id, right_id, left_t, right_t).
    *
    * `joinType` admits the outer variants: with "left_outer", a left row
    * whose match window closes unmatched (watermark passed l_t + lookback
    * — no future right row can satisfy the bound) is emitted ONCE with
    * null right columns on state expiry. That emission is the streaming
    * analogue of the batch LEFT JOIN's null padding, and only the time
    * bound makes it well-defined: it tells the engine when "no match" is
    * final. */
  def withinLookback(left: DataFrame, right: DataFrame,
                     watermark: String, lookback: String,
                     joinType: String = "inner"): DataFrame = {
    val l = left.select(col("key").as("l_key"), col("t").as("l_t"), col("id").as("l_id"))
      .withWatermark("l_t", watermark)
    val r = right.select(col("key").as("r_key"), col("t").as("r_t"), col("id").as("r_id"))
      .withWatermark("r_t", watermark)
    l.join(r,
      col("l_key") === col("r_key") &&
        col("l_t") <= col("r_t") &&
        col("l_t") >= col("r_t") - expr(s"INTERVAL $lookback"),
      joinType)
      .select(col("l_key").as("key"),
        col("l_id").as("left_id"), col("r_id").as("right_id"),
        col("l_t").as("left_t"), col("r_t").as("right_t"))
  }
}
