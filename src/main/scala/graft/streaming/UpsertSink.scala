package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The MERGE-INTO reduction used by the foreachBatch upsert sink
  * (`streaming_upsert_sink`): fold a micro-batch into a keyed state
  * table, keeping the row with the greatest (ordering, tiebreak) per
  * key. Extracted so its two contract properties are spec-checkable:
  *
  *  - IDEMPOTENT: re-applying the same batch to the merged state is a
  *    no-op — the property that makes batch REPLAY after a sink failure
  *    safe (Structured Streaming re-runs an uncommitted batch id).
  *  - LATEST-WINS: a state row survives a batch row (and vice versa)
  *    strictly by the ordering columns, never by which side it sat on.
  *
  * Scale shape: one window over the union, partitioned by key — per-key
  * state is the handful of candidate rows for that key, and at cluster
  * scale the state table is partitioned storage so only touched
  * partitions rewrite.
  */
object UpsertSink {

  /** Merge `batch` into `state` (None for the first batch), keeping the
    * row with the greatest (`ord` desc, `tiebreak` desc) per `key`. All
    * referenced columns must exist in both relations. */
  def mergeLatest(state: Option[DataFrame], batch: DataFrame,
                  key: String, ord: String, tiebreak: String): DataFrame = {
    val unioned = state.fold(batch)(_.unionByName(batch))
    val w = Window.partitionBy(col(key))
      .orderBy(col(ord).desc, col(tiebreak).desc)
    unioned.withColumn("_us_rn", row_number().over(w))
      .filter(col("_us_rn") === 1).drop("_us_rn")
  }

  /** CDC read view over a changelog-merged state table whose rows carry
    * an op column (`'U'` upsert, `'D'` delete tombstone): deletion is
    * applied at READ time, never at merge time. Tombstones must PERSIST
    * as state rows — dropping a deleted key during the merge forgets the
    * deletion, and a replayed or out-of-order batch carrying an OLDER
    * upsert for that key would then resurrect it (the merge would see no
    * state row to outrank the stale upsert). With the tombstone retained,
    * `mergeLatest`'s latest-wins ordering makes the resurrection
    * impossible by construction; readers simply skip `'D'` rows. This is
    * the standard tombstone-retention contract (Kafka compacted topics,
    * LSM deletes) — at warehouse scale a compaction pass drops tombstones
    * only once every source's replay horizon has passed them. */
  def readView(state: DataFrame, opCol: String = "op"): DataFrame =
    state.filter(col(opCol) =!= "D")

  /** Retention compaction (the vacuum half of the tombstone contract):
    * physically drop tombstones whose ordering value is at or below the
    * REPLAY HORIZON — the point every source has provably progressed
    * past, so no batch carrying an older upsert for the key can ever
    * arrive again. A tombstone exists only to outrank upserts older than
    * itself (see `readView`); once the horizon passes it, it is dead
    * weight, and dropping it is invariant for readers by construction
    * (`readView` never surfaced it). Live rows are never touched —
    * compaction bounds state growth under sustained deletes without
    * changing a single visible row. Row-local filter: at warehouse scale
    * this folds into the next state rewrite for free. */
  def compactTombstones(state: DataFrame, horizonOrd: Long, ord: String,
                        opCol: String = "op"): DataFrame =
    state.filter(col(opCol) =!= "D" || col(ord) > horizonOrd)
}
