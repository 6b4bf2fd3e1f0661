package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Distributed running totals (parallel prefix sum) — the scale-correct
  * form of `sum(...) OVER (ORDER BY id)`.
  *
  * A global ORDER BY window has an empty PARTITION BY, which Spark plans
  * as a SINGLE-partition sort: one task materializes the entire relation —
  * the canonical 100 TB anti-pattern. This operator instead:
  *
  *   1. range-repartitions by the order key and sorts within partitions
  *      (a normal parallel sort), materialized once (localCheckpoint; on
  *      a cluster, reliable checkpoint or a shuffle-reuse);
  *   2. computes one weight total PER PARTITION (tiny: one row per
  *      partition, collected to the driver);
  *   3. prefix-sums those totals into per-partition start offsets and
  *      broadcasts them — each partition then computes its running sum
  *      independently in a single imperative pass.
  *
  * Two narrow passes over the data, no single-task stage. The per-row
  * result is identical to the global window regardless of where the range
  * boundaries land, because a running sum over a globally sorted order is
  * prefix-decomposable.
  *
  * PRECONDITION: `idCol` must be UNIQUE. With duplicate order keys,
  * `repartitionByRange` may split tied rows across partition boundaries,
  * making the relative order of ties (and therefore each tied row's
  * running total) placement-dependent — the same nondeterminism a global
  * window has for ties, but varying with partitioning rather than being
  * stable per plan. Callers with non-unique keys must add a tiebreak
  * column and pass a composite unique key.
  *
  * The imperative per-partition pass is a genuine `mapPartitionsWithIndex`
  * use case (running state across rows in partition order) — exactly the
  * "rarely, for per-partition imperative logic" carve-out, since no
  * Catalyst operator expresses "running sum without a global sort".
  */
object PrefixSum {

  /** Appends `outCol` = inclusive running total of `weightCol` (LongType,
    * must be non-null — coalesce upstream; a null weight fails fast here
    * rather than silently skewing every downstream total) in ascending
    * `idCol` order. `partitions` bounds the parallel width. */
  def withRunningTotal(df: DataFrame, idCol: String, weightCol: String,
                       outCol: String, partitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val n = if (partitions > 0) partitions
      else spark.sessionState.conf.numShufflePartitions
    val ranged = df.repartitionByRange(n, col(idCol))
      .sortWithinPartitions(col(idCol))
      .localCheckpoint()
    val weightIdx = ranged.schema.fieldIndex(weightCol)
    val perPartition = ranged.rdd.mapPartitionsWithIndex { (pid, it) =>
      var s = 0L
      it.foreach(r => s += r.getLong(weightIdx))
      Iterator((pid, s))
    }.collect().toMap
    val numParts = ranged.rdd.getNumPartitions
    var acc = 0L
    val offsets = (0 until numParts).map { p =>
      val start = acc; acc += perPartition.getOrElse(p, 0L); start
    }.toArray
    val bcOffsets = spark.sparkContext.broadcast(offsets)
    val outSchema = ranged.schema.add(outCol, LongType, nullable = false)
    val rows = ranged.rdd.mapPartitionsWithIndex { (pid, it) =>
      var s = bcOffsets.value(pid)
      it.map { r => s += r.getLong(weightIdx); Row.fromSeq(r.toSeq :+ s) }
    }
    spark.createDataFrame(rows, outSchema)
  }
}
