package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact per-group ascending ranks WITHOUT a per-group total sort — the
  * scale-correct plan for rank/ntile/percent_rank/cume_dist over LOW-
  * cardinality groups (the recurring 100× cliff family: a
  * `Window.partitionBy(status)` over 3 statuses drags the whole fact
  * relation through 3 sort partitions, measured 10.1 s at 15 M rows).
  *
  * Plan (the `PrefixSum` offset idea applied to ranks, all-Catalyst so
  * every pass stays inside whole-stage codegen):
  *
  *   1. sample ~`buckets` order-key values by bottom-k-of-hash
  *      (TakeOrderedAndProject — per-partition k, one k-row reduction)
  *      and inline the SORTED bounds as ONE literal array; every row's
  *      bucket is the codegen'd O(log k) binary search
  *      ([[graft.functions.SortedSearch.sortedCountLE]]);
  *   2. count rows per (group, bucket) — one map-side-combinable scan;
  *      exclusive prefix sums per group over the counts relation become
  *      each cell's rank OFFSET and per-group totals `n` (computed as a
  *      running-sum window over the counts relation in [[withGroupRanks]]
  *      — distributed, any group cardinality — or collected to the
  *      driver in [[groupRanks]], whose counts map serves [[headKeys]]);
  *   3. rank within each (group, bucket) CELL (expected n/buckets rows —
  *      never a group-sized partition) and add the cell's offset,
  *      delivered by a join on (group, bucket) (broadcast when the
  *      offsets relation is tiny — AQE flips it at runtime).
  *
  * The result is bit-identical to `row_number() OVER (PARTITION BY group
  * ORDER BY order)`: offsets are exact counts, so where the sampled
  * bounds land never affects ranks — only cell sizes (heavy duplicate
  * order values concentrate a cell but can't break exactness; duplicates
  * are ranked by their cell window's tie order, see PRECONDITION).
  *
  * PRECONDITION: `orderCol` must be UNIQUE within each group and
  * non-null — with ties, rank assignment among tied rows would depend on
  * cell placement (the same caveat as [[PrefixSum]]). Callers with ties
  * must pass a composite unique key.
  *
  * ==Execution contract==
  * Every entry point runs the bounds-sample Spark job at call time (one
  * `buckets−1`-row collect, cardinality-independent). [[withGroupRanks]]
  * is otherwise lazy and UNCAPPED (offsets stay distributed).
  * [[groupRanks]] / [[valuesAtRanks]] / [[headKeys]] additionally
  * collect the (group, bucket) cell counts — BATCH + EAGER, group
  * cardinality ≤ [[QuantileSketch.maxLiteralGroups]] — because their
  * contract is a DRIVER-SIDE map (the literal-CASE / head-picks
  * consumers, the join-tax rule).
  */
object DistributionRanks {

  /** Sentinel standing in for a NULL group key. SQL windows rank a null
    * partition like any other (`PARTITION BY g` groups nulls together);
    * the driver-side maps here key groups by String, where a raw null
    * would NPE `.sorted` and an inner join on `_dr_g` would silently DROP
    * null-group rows. Coalescing to a reserved string (a NUL byte cannot
    * appear in a cast-from-anything group value) keeps null groups as
    * their own partition, bit-identical to the window form. Appears as
    * the key in [[GroupRanks.counts]] / [[valuesAtRanks]] results when
    * the input had null groups. */
  val NullGroupKey: String = "\u0000<null>"

  private def groupKey(groupCol: Column): Column =
    coalesce(groupCol.cast("string"), lit(NullGroupKey))

  /** Input columns + `rnCol` (1-based exact ascending rank of `orderCol`
    * within `groupCol`) + `nCol` (group size). `orderCol` must be a
    * BIGINT-compatible unique-per-group key.
    *
    * FULLY DISTRIBUTED — works at ANY group cardinality (unlike
    * [[groupRanks]], whose driver-side counts map serves [[headKeys]]
    * consumers and keeps the low-cardinality cap). The cell OFFSETS come
    * from a running sum OVER THE COUNTS RELATION itself
    * (`sum(c) OVER (PARTITION BY g ORDER BY b)`): that window's
    * partitions hold at most buckets+1 rows PER GROUP regardless of how
    * many groups exist — high group cardinality only adds partitions,
    * never partition size — so the per-group total-sort cliff this
    * operator exists to avoid cannot reappear in its own offsets pass.
    * The offsets relation (|groups| × ≤ buckets+1 rows) joins back on
    * (group, bucket): tiny for low-cardinality groups (AQE flips the
    * join to broadcast at runtime), and for high-cardinality groups the
    * SMJ's (g, b) hash partitioning is exactly what the cell-rank window
    * needs next, so the window adds a sort but NO extra shuffle.
    *
    * Only the bounds sample is eager (one `buckets−1`-row collect —
    * fixed-size, cardinality-independent); the ranked relation itself is
    * lazy. */
  def withGroupRanks(df: DataFrame, groupCol: Column, orderCol: Column,
      rnCol: String, nCol: String, buckets: Int = 256): DataFrame = {
    val base = df.withColumn("_dr_g", groupKey(groupCol))
      .withColumn("_dr_o", orderCol.cast("long"))
    val bounds = sampleBounds(base, buckets)
    val bucketed = base.withColumn("_dr_b", bucketOf(bounds))
    val counts = bucketed.groupBy(col("_dr_g"), col("_dr_b"))
      .agg(count(lit(1)).as("_dr_c"))
    val wRun = Window.partitionBy(col("_dr_g")).orderBy(col("_dr_b"))
    val wTot = Window.partitionBy(col("_dr_g"))
    val offsets = counts.select(col("_dr_g"), col("_dr_b"),
      (sum(col("_dr_c")).over(wRun) - col("_dr_c")).as("_dr_off"),
      sum(col("_dr_c")).over(wTot).as(nCol))
    val wCell = Window.partitionBy(col("_dr_g"), col("_dr_b"))
      .orderBy(col("_dr_o"))
    bucketed
      .join(offsets, Seq("_dr_g", "_dr_b"))
      .withColumn(rnCol,
        (col("_dr_off") + row_number().over(wCell)).cast("long"))
      .drop("_dr_off", "_dr_g", "_dr_o", "_dr_b")
  }

  /** Bottom-(buckets−1)-by-hash sample of `_dr_o`, sorted ascending —
    * bounds only shape CELLS, never results (see class doc). */
  private def sampleBounds(base: DataFrame, buckets: Int): Seq[Long] =
    base.select(col("_dr_o"))
      .orderBy(xxhash64(col("_dr_o")), col("_dr_o"))
      .limit(buckets - 1)
      .collect().map(_.getLong(0)).sorted.toSeq

  /** Codegen'd O(log buckets) bucket assignment for `_dr_o` (count-of-≤:
    * lower-inclusive, upper-exclusive cells). */
  private def bucketOf(bounds: Seq[Long]): Column =
    if (bounds.isEmpty) lit(0)
    else graft.functions.SortedSearch.sortedCountLE(
      typedLit(bounds), col("_dr_o"))

  /** The driver-side artifacts alongside the ranked relation, for gates
    * that also need head-of-group picks (first/nth keys) without
    * re-executing the ranked subtree: `counts` maps (group, bucket) to
    * its exact row count; `bounds` is the sorted literal bucket-bound
    * array (bucket b holds rows with bounds(b−1) ≤ key < bounds(b) —
    * sortedCountLE's count-of-≤ convention). */
  final case class GroupRanks(
      ranked: DataFrame, // input cols + _dr_b + rnCol + nCol
      counts: Map[(String, Int), Long],
      bounds: Seq[Long])

  def groupRanks(df: DataFrame, groupCol: Column, orderCol: Column,
      rnCol: String, nCol: String, buckets: Int = 256): GroupRanks = {
    val base = df.withColumn("_dr_g", groupKey(groupCol))
      .withColumn("_dr_o", orderCol.cast("long"))
    val bounds = sampleBounds(base, buckets)
    val bucketed = base.withColumn("_dr_b", bucketOf(bounds))
    // 2. exact cell counts → driver (groups × (buckets+1) rows max)
    val countRows = bucketed.groupBy(col("_dr_g"), col("_dr_b"))
      .agg(count(lit(1)).as("_dr_c"))
      .limit(QuantileSketch.maxLiteralGroups * (buckets + 1) + 1)
      .collect()
    require(countRows.length <=
        QuantileSketch.maxLiteralGroups * (buckets + 1),
      "DistributionRanks.groupRanks: group × bucket cardinality above " +
        s"${QuantileSketch.maxLiteralGroups} × ${buckets + 1} — this " +
        "operator collects cell counts to the driver and is for " +
        "LOW-cardinality group columns only")
    val counts = countRows.map(r =>
      (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    val groups = counts.keys.map(_._1).toSeq.distinct.sorted
    // exclusive prefix offsets + totals per group, computed driver-side
    val totals = groups.map(g => g ->
      counts.collect { case ((gg, _), c) if gg == g => c }.sum).toMap
    val offsets: Seq[(String, Int, Long, Long)] = groups.flatMap { g =>
      var acc = 0L
      (0 to bounds.size).flatMap { b =>
        counts.get((g, b)).map { c =>
          val o = acc; acc += c; (g, b, o, totals(g))
        }
      }
    }
    val spark = df.sparkSession
    import spark.implicits._
    val offsetsDf = offsets.toDF("_dr_g", "_dr_b", "_dr_off", nCol)
    // 3. cell-sized windows + broadcast offsets
    val wCell = Window.partitionBy(col("_dr_g"), col("_dr_b"))
      .orderBy(col("_dr_o"))
    val ranked = bucketed
      .join(broadcast(offsetsDf), Seq("_dr_g", "_dr_b"))
      .withColumn(rnCol,
        (col("_dr_off") + row_number().over(wCell)).cast("long"))
      .drop("_dr_off", "_dr_g", "_dr_o")
    GroupRanks(ranked, counts, bounds)
  }

  /** Exact VALUE at one-or-more per-group ranks WITHOUT any group-sized
    * sort — the generic form of the median/percentile rank-pick that
    * kept the exact-rank gates (`mad_outliers`, `winsorize_values`) on
    * per-type total sorts: sampled literal bounds bucket the relation,
    * ONE exact (group, bucket) count pass locates each target rank's
    * cell and in-cell offset on the driver, and a pruned mini-scan
    * ranks ONLY inside target cells (expected n/buckets rows each).
    *
    * `ranksOf` maps a group's row count n to labeled 1-based target
    * ranks (e.g. `n => Seq("med" -> (n + 1) / 2)`); the result maps
    * (group, label) to the value at that ascending `valueCol` rank.
    * Ties need no tiebreak: the VALUE at a rank is tie-order-invariant
    * (any permutation of equal values puts the same value at the rank).
    * Returns a driver-side map — callers inline it as a literal CASE on
    * the group key (the join-tax rule), so the pick never rides a join.
    *
    * ==Execution contract (BATCH + EAGER)== runs three Spark jobs at
    * call time; group cardinality ≤ [[QuantileSketch.maxLiteralGroups]]. */
  def valuesAtRanks(df: DataFrame, groupCol: Column, valueCol: Column,
      ranksOf: Long => Seq[(String, Long)], buckets: Int = 256)
      : Map[(String, String), Long] = {
    val base = df.select(groupKey(groupCol).as("_dr_g"),
      valueCol.cast("long").as("_dr_o"))
    val bounds = sampleBounds(base, buckets)
    val countRows = base.withColumn("_dr_b", bucketOf(bounds))
      .groupBy(col("_dr_g"), col("_dr_b"))
      .agg(count(lit(1)).as("_dr_c"))
      .limit(QuantileSketch.maxLiteralGroups * (buckets + 1) + 1)
      .collect()
    require(countRows.length <=
        QuantileSketch.maxLiteralGroups * (buckets + 1),
      "DistributionRanks.valuesAtRanks: group × bucket cardinality above " +
        "the literal-CASE contract — low-cardinality groups only")
    val counts = countRows.map(r =>
      (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    val groups = counts.keys.map(_._1).toSeq.distinct.sorted
    // locate every (group, label) target: walk buckets in order,
    // accumulate exclusive offsets, stop inside the bucket covering r
    val targets: Map[(String, Int), Seq[(String, Long)]] = groups.flatMap { g =>
      val cells = (0 to bounds.size).flatMap(b =>
        counts.get((g, b)).map(c => (b, c)))
      val n = cells.map(_._2).sum
      ranksOf(n).filter { case (_, r) => r >= 1 && r <= n }.map {
        case (label, r) =>
          var acc = 0L
          val (b, off) = cells.collectFirst {
            case (bb, c) if { val o = acc; acc += c; r > o && r <= o + c } =>
              (bb, acc - counts((g, bb)))
          }.get // total counts cover every 1..n rank — cannot miss
          ((g, b), (label, r - off))
      }
    }.groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    if (targets.isEmpty) return Map.empty
    val cellPred = targets.keys.map { case (g, b) =>
      val lo = if (b == 0) lit(true)
        else col("_dr_o") >= lit(bounds(b - 1))
      val hi = if (bounds.isEmpty || b >= bounds.size) lit(true)
        else col("_dr_o") < lit(bounds(b))
      col("_dr_g") === lit(g) && lo && hi
    }.reduce(_ || _)
    val wCell = Window.partitionBy(col("_dr_g"), col("_dr_b"))
      .orderBy(col("_dr_o"))
    val localRanks = targets.values.flatten.map(_._2).toSeq.distinct
    val picked = base.filter(cellPred)
      .withColumn("_dr_b", bucketOf(bounds))
      .withColumn("_dr_rn", row_number().over(wCell))
      .filter(col("_dr_rn").isin(localRanks: _*))
      .collect()
      .map(r => ((r.getString(0), r.getInt(2)), r.getInt(3).toLong, r.getLong(1)))
    // map collected (g, b, localRank, value) rows back to labels
    picked.flatMap { case (gb, rn, v) =>
      targets.getOrElse(gb, Seq.empty).collect {
        case (label, lr) if lr == rn => (gb._1, label) -> v
      }
    }.toMap
  }

  /** Per-group HEAD keys — the k smallest `orderCol` values per group —
    * from ONE pushed-down mini-scan over only the head cells (the
    * buckets whose exclusive offset is < k), using the artifacts of a
    * prior [[groupRanks]] call. Returns (group → ascending head keys);
    * driver-scale by construction (≤ groups × k values).
    *
    * Bucket convention (MUST mirror sortedCountLE's count-of-≤): bucket
    * b holds rows with bounds(b−1) ≤ key < bounds(b) — lower-INclusive,
    * upper-EXclusive (a key equal to a bound counts that bound and lands
    * in the bucket ABOVE it; the r11 first cut had the convention
    * inverted and missed head keys that collided with a bound —
    * caught by the sf0.001 oracle only, fixture luck elsewhere). */
  def headKeys(df: DataFrame, groupCol: Column, orderCol: Column,
      gr: GroupRanks, k: Int): Map[String, Seq[Long]] = {
    val base = df.select(groupKey(groupCol).as("_dr_g"),
      orderCol.cast("long").as("_dr_o"))
    // per group: walk cells in bucket order until k rows are covered
    val headCells: Seq[(String, Int)] = gr.counts.keys.map(_._1).toSeq
      .distinct.flatMap { g =>
        var acc = 0L
        (0 to gr.bounds.size).iterator.flatMap { b =>
          gr.counts.get((g, b)).map(c => (b, { val o = acc; acc += c; o }))
        }.takeWhile { case (_, off) => off < k }
          .map { case (b, _) => (g, b) }.toSeq
      }
    if (headCells.isEmpty) return Map.empty
    // one literal filter: the scan reads only head cells (the order-key
    // upper bound below prunes parquet row groups; the per-group bucket
    // predicate trims the rest)
    val maxBound = headCells.map { case (_, b) => b }.max
    val keyCap: Column =
      if (gr.bounds.isEmpty || maxBound >= gr.bounds.size) lit(true)
      else col("_dr_o") < lit(gr.bounds(maxBound))
    val cellPred = headCells.map { case (g, b) =>
      val lo = if (b == 0) lit(true)
        else col("_dr_o") >= lit(gr.bounds(b - 1))
      val hi = if (gr.bounds.isEmpty || b >= gr.bounds.size) lit(true)
        else col("_dr_o") < lit(gr.bounds(b))
      col("_dr_g") === lit(g) && lo && hi
    }.reduce(_ || _)
    val wHead = Window.partitionBy(col("_dr_g")).orderBy(col("_dr_o"))
    base.filter(keyCap && cellPred)
      .withColumn("_dr_r", row_number().over(wHead))
      .filter(col("_dr_r") <= k)
      .collect()
      .groupBy(_.getString(0))
      .view.mapValues(_.map(_.getLong(1)).sorted.toSeq).toMap
  }
}
