package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mergeable quantile sketch: a bottom-k-by-hash uniform sample.
  *
  * `approx_quantiles_price` covers one-shot approximate quantiles inside
  * a single query; THIS is the warehouse's other quantile shape — the
  * PERSISTED sketch table (KmvSketch's pattern, for order statistics):
  * per-group sketches of k (hash, value) rows are stored once, and any
  * later quantile question — per group, or over any UNION of groups —
  * is answered from sketch rows alone, never re-touching raw data.
  * Keeping the rows with the k smallest key-hashes is a uniform sample
  * of the group's rows (the hash is a random permutation of keys), and
  * merging sketches = union → re-top-k under the same hash order, which
  * is EXACTLY the bottom-k sample of the merged population — the
  * property t-digest/GK sketches get approximately, bottom-k gets by
  * construction. Unlike t-digest (implementation-defined centroids),
  * every step here is order statistics over a portable md5-prefix hash,
  * so a DuckDB oracle replays sketch, merge, and estimates bit-for-bit:
  * an exactly-gateable mergeable quantile sketch. Rank ties on the hash
  * (a non-unique key, or a collision — prefer ≥60 bits over the 40-bit
  * dedup convention) are broken by value, so the sketch's value multiset
  * is uniquely determined even then; ties do bias the "uniform sample"
  * claim marginally, which is why the hash should still be wide.
  *
  * Estimator: discrete quantile over the sketch values — the value at
  * ascending rank ceil(q·n) (exact on groups with ≤ k rows, sampling
  * error ~1/√k above). Rank arithmetic is integer on both engines.
  *
  * Scale shape: phase 1 is one group-partitioned window over the raw
  * relation (state = one group's rows per task — for heavy groups,
  * pre-thin with a per-partition bottom-k before the shuffle); every
  * later stage runs on n_groups × k rows, driver-scale at any corpus
  * size.
  */
object QuantileSketch {

  /** Cap on distinct groups for the literal-CASE operators
    * ([[sketchThinned]], [[exactQuantilesSketchGuided]]): both collect
    * per-group driver-side state and inline a when-chain on the group
    * key, which is only sane for a handful-to-hundreds of groups. The
    * cap turns a high-cardinality misuse into an immediate, named error
    * instead of a driver OOM or a megabyte-scale codegen unit. */
  val maxLiteralGroups: Int = 1000

  /** Per-group sketch rows (_qk_g, _qk_h, _qk_v): the k rows with the
    * smallest key-hashes. `hashCol` must be a deterministic per-row hash
    * so retries and the oracle agree; rank ties on the hash (a non-unique
    * key, or a collision) are broken by VALUE, so even then the sketch's
    * value multiset — all that downstream quantiles see — is uniquely
    * determined. */
  def sketch(rows: DataFrame, groupCol: Column, hashCol: Column,
             valueCol: Column, k: Int): DataFrame =
    rows.select(groupCol.as("_qk_g"), hashCol.as("_qk_h"), valueCol.as("_qk_v"))
      .withColumn("_qk_r", row_number().over(
        Window.partitionBy(col("_qk_g")).orderBy(col("_qk_h"), col("_qk_v"))))
      .filter(col("_qk_r") <= k)
      .drop("_qk_r")

  /** Single-group sketch DIRECTLY from the raw relation: the global
    * bottom-k as orderBy + limit → TakeOrderedAndProject (per-partition
    * bottom-k on the map side, then one k-row reduction at the driver) —
    * no window, no shuffle of raw rows. Bit-identical to
    * `sketch` + `merge` over any partitioning (bottom-k is closed under
    * merge). Use this instead of `sketch` with a constant group column:
    * the constant partition key constant-folds into a PARTITION-LESS
    * window that drags the whole relation through one partition. */
  def sketchGlobal(rows: DataFrame, hashCol: Column, valueCol: Column,
                   label: String, k: Int): DataFrame =
    rows.select(hashCol.as("_qk_h"), valueCol.as("_qk_v"))
      .orderBy(col("_qk_h"), col("_qk_v"))
      .limit(k)
      .select(lit(label).as("_qk_g"), col("_qk_h"), col("_qk_v"))

  /** Per-group sketch for LOW-cardinality group columns (the shape where
    * `sketch`'s group-partitioned window degenerates to a handful of
    * full-group total sorts): count per group (map-side combinable) →
    * keep only rows whose 60-bit hash falls under `margin`·k/n_g of the
    * hash space (an exact decimal(38,0) threshold, so the oracle-visible
    * RESULT never depends on it) → exact bottom-k window over the ~k·margin
    * survivors per group. Two streaming scans + a driver-scale sort
    * replace the per-group total sort — the plan that holds at 100 TB
    * with 5 groups. The thin filter under-collecting is ~e^(−k)-improbable
    * but is still guarded LOUDLY: an `assert_true` folded into the output
    * hash column (so pruning can't drop it) fires if any sketch ends up
    * smaller than min(k, n_g), naming this method and the fix. Result is
    * bit-identical to `sketch` on the same input.
    *
    * ==Execution contract (BATCH + EAGER)==
    * This method runs Spark jobs AT CALL TIME — a group-count collect()
    * and a localCheckpoint() of the ≤ groups×k sketch — so it cannot be
    * applied to a streaming relation, and callers composing plans lazily
    * will observe immediate cluster work here. The group column must be
    * LOW-cardinality by contract (counts are collected to the driver and
    * inlined as a literal CASE); more than [[maxLiteralGroups]] distinct
    * groups fails fast with a clear message instead of building a giant
    * when-chain or exhausting driver memory — use [[sketch]] (the
    * group-partitioned window form) for high-cardinality keys. */
  def sketchThinned(rows: DataFrame, groupCol: Column, hashCol: Column,
                    valueCol: Column, k: Int, margin: Int = 8): DataFrame = {
    val tagged = rows.select(
      groupCol.as("_qk_g"), hashCol.as("_qk_h"), valueCol.as("_qk_v"))
    val keep = k.toLong * margin
    // Group counts COLLECTED to the driver — this operator is for
    // LOW-cardinality groups by contract, so the count relation is a
    // handful of rows (the allowed side of the no-fact-caching rule,
    // taken one step further: no relation at all). The thin threshold
    // then inlines as a literal CASE on the group key instead of a
    // broadcast join — even a 5-row broadcast hash join prices every
    // fact row through join machinery (measured on psi_drift's thin
    // pass at the 10^8-row decade). Groups with n ≤ keep thin nothing:
    // their threshold is Long.MaxValue (h ≤ MAX ⟺ keep every row —
    // exactly the old n ≤ keep disjunct); otherwise the exact BigInt
    // quotient 2^60·keep/n, always < 2^60 so BIGINT-safe.
    val countRows = tagged.groupBy(col("_qk_g"))
      .agg(count(lit(1)).as("_qk_n")).limit(maxLiteralGroups + 1).collect()
      .map(r => r.get(0) -> r.getLong(1)).toList
    require(countRows.size <= maxLiteralGroups,
      s"QuantileSketch.sketchThinned: more than $maxLiteralGroups distinct " +
        "groups — this operator collects per-group counts to the driver and " +
        "is for LOW-cardinality group columns only; use QuantileSketch.sketch " +
        "(group-partitioned window) for high-cardinality keys")
    val threshOf = countRows.map { case (g, n) =>
      g -> (if (n <= keep) Long.MaxValue
            else (BigInt(1152921504606846976L) * keep / BigInt(n)).toLong)
    }
    val thinned =
      if (threshOf.isEmpty) tagged.filter(lit(false))
      else {
        val expr0 = when(col("_qk_g") === lit(threshOf.head._1),
          lit(threshOf.head._2))
        val threshExpr = threshOf.tail.foldLeft(expr0) {
          case (acc, (gv, t)) => acc.when(col("_qk_g") === lit(gv), lit(t))
        }
        tagged.filter(col("_qk_h") <= threshExpr)
      }
    val sk = thinned
      .withColumn("_qk_r", row_number().over(
        Window.partitionBy(col("_qk_g")).orderBy(col("_qk_h"), col("_qk_v"))))
      .filter(col("_qk_r") <= k)
      .select(col("_qk_g"), col("_qk_h"), col("_qk_v"))
      // ≤ groups×k rows (the allowed cache class): the guard below and
      // the returned relation both read this materialization, so the
      // thin pass over the fact relation runs ONCE per call, not once
      // per consumer — and the sketch can never constant-fold away.
      .localCheckpoint()
    // Starvation guard as a UNION child, not a join: rows exist (and
    // therefore THROW via assert_true on materialization) exactly for
    // groups whose sketch came out smaller than min(k, n). A join-shaped
    // guard riding the main relation can be ELIMINATED without ever
    // evaluating the assert — statically when a foldable input lets the
    // optimizer prove the sketch empty, or at runtime when AQE replaces
    // a join whose probe stage returned 0 rows with an empty relation.
    // A union child survives both: its emptiness is exactly the
    // starvation predicate, so proving it empty means nothing starved.
    // Keyed on the COUNTS list (the authoritative group list) so even a
    // TOTALLY starved group — no sketch row left to carry an assert —
    // produces a throwing row.
    val spark = rows.sparkSession
    val schema = sk.schema
    val countsDf = spark.createDataFrame(
      java.util.Arrays.asList(countRows.map { case (g, n) =>
        org.apache.spark.sql.Row(g, n) }: _*),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("_qk_g", schema("_qk_g").dataType),
        org.apache.spark.sql.types.StructField("_qk_n",
          org.apache.spark.sql.types.LongType))))
    // The starvation CONDITION lives inside assert_true itself — NOT as
    // a separate filter in front of an assert_true(false): predicate
    // pushdown treats a column-free assert as movable anywhere (a
    // downstream join's isnotnull(_qk_g) pushed it below the filter
    // straight onto the counts LocalRelation, where
    // ConvertToLocalRelation evaluated it at OPTIMIZE time and threw on
    // healthy data). With the condition folded in, every evaluation
    // order yields the same semantics: raise iff some group's sketch is
    // smaller than min(k, n); null (row filtered) otherwise. The
    // condition references both join sides, so no optimizer rule can
    // strand it on a foldable relation.
    val starved = countsDf
      .join(sk.groupBy(col("_qk_g")).agg(count(lit(1)).as("_qk_sz")),
        Seq("_qk_g"), "left")
      .select(
        assert_true(coalesce(col("_qk_sz"), lit(0L)) ===
            least(lit(k.toLong), col("_qk_n")),
          lit("QuantileSketch.sketchThinned: thin filter starved a group's " +
            "sketch below min(k, n) — raise `margin`"))
          .cast(schema("_qk_g").dataType).as("_qk_g"),
        lit(null).cast(schema("_qk_h").dataType).as("_qk_h"),
        lit(null).cast(schema("_qk_v").dataType).as("_qk_v"))
      .filter(col("_qk_g").isNotNull) // empty on success — assert is null
    sk.unionByName(starved)
  }

  /** Merge sketch rows into ONE sketch under a new label: union → keep
    * the k smallest hashes (value tie-break, as in `sketch`). Identical
    * to sketching the concatenated population (hash order is global), so
    * merged estimates carry the same guarantee as direct ones. Input is
    * sketch rows only. */
  def merge(sketchRows: DataFrame, label: String, k: Int): DataFrame =
    // global top-k as orderBy + limit → TakeOrderedAndProject (per-partition
    // k then one k-row reduction), NOT a single-partition global sort window
    sketchRows
      .orderBy(col("_qk_h"), col("_qk_v"))
      .limit(k)
      .select(lit(label).as("_qk_g"), col("_qk_h"), col("_qk_v"))

  /** Public row view of sketch rows — (scope, h, v). Consumers that
    * derive NEW sketches from existing ones (e.g. a deviation sketch
    * around a sketched median) read through this and rebuild via
    * `fromRows`; the `_qk_*` column convention stays private, so a
    * rename inside the operator can't silently break callers. */
  def rows(sketchRows: DataFrame): DataFrame =
    sketchRows.select(col("_qk_g").as("scope"), col("_qk_h").as("h"),
      col("_qk_v").as("v"))

  /** Inverse of `rows`: repack a (scope, h, v) relation as sketch rows
    * usable by `merge`/`quantiles`/`ranksAt`. The caller owns the claim
    * that (h, v) still follow the sketch contract (deterministic hash;
    * value-monotone transforms of v preserve rank semantics). */
  def fromRows(df: DataFrame): DataFrame =
    df.select(col("scope").as("_qk_g"), col("h").as("_qk_h"),
      col("v").as("_qk_v"))

  /** One (v, h)-sorted value array per group — (scope, vs): the packing
    * every estimator shares. A sketch holds ≤ k rows per group, so one
    * hash-agg packs each group and integer element_at picks follow — no
    * window at all (a window's partition key would constant-fold away
    * for `sketchGlobal`/`merge` labels, dropping the whole — tiny —
    * relation into one partition and WARNing on every run). */
  def sortedValues(sketchRows: DataFrame): DataFrame =
    sketchRows.groupBy(col("_qk_g").as("scope"))
      .agg(expr("transform(sort_array(collect_list(struct(_qk_v, _qk_h)))," +
        " x -> x._qk_v)").as("vs"))

  /** (scope, q, est) for each requested quantile from sketch rows only:
    * est = the sketch value at ascending value-rank ceil(q·n) (hash
    * tie-break, as everywhere in the sketch). */
  def quantiles(sketchRows: DataFrame, qs: Seq[Double]): DataFrame = {
    val packed = sortedValues(sketchRows)
    val picks = qs.map(q => struct(lit(q).as("q"),
      element_at(col("vs"),
        ceil(lit(q) * size(col("vs"))).cast("int")).as("est")))
    packed.select(col("scope"), explode(array(picks: _*)).as("qe"))
      .select(col("scope"), col("qe.q").as("q"), col("qe.est").as("est"))
  }

  /** EXACT quantiles over a RAW relation, sketch-guided — (scope, q,
    * est) where est is the raw value at ascending (value, hash) rank
    * ceil(q·n) per group, computed WITHOUT ever sorting a whole group or
    * packing it into one array (`quantiles` is for ≤ k-row sketch
    * relations ONLY — feeding it a fact-sized relation collects whole
    * groups into single arrays and OOMs, measured at the 100× probe).
    * Classic two-pass selection with the sketch as the pilot:
    *
    *  1. bucket every row by its group's sorted sketch values (broadcast
    *     arrays, ≤ k longs each) and count rows per (group, bucket) —
    *     one map-side-combinable scan; cumulative offsets over the
    *     ≤ (k+1)-row-per-group counts locate, for every target rank,
    *     the ONE bucket containing it (offsets are exact, so this can't
    *     miss — no starvation mode);
    *  2. re-scan keeping only rows in target buckets (expected n/k of
    *     the data per bucket — the sketch's equi-depth cell; heavy
    *     value-ties concentrate a bucket but never break exactness) and
    *     rank within each (group, bucket) window — partitions are
    *     cell-sized, never group-sized.
    *
    * Rank arithmetic mirrors `quantiles` (float ceil(q·n), the gates'
    * established oracle convention), so est here is bit-identical to
    * the rank-pick a total sort would produce.
    *
    * ==Execution contract (BATCH + EAGER)==
    * Runs Spark jobs AT CALL TIME — the sketch boundaries are
    * collect()ed and the ≤ |qs|·groups target relation is
    * localCheckpoint()ed — so this cannot be applied to streaming
    * relations, and lazy plan composition triggers immediate work.
    * Group cardinality must be ≤ [[maxLiteralGroups]] (boundaries inline
    * as a literal CASE on the group key); beyond that the call fails
    * fast with a named error. */
  def exactQuantilesSketchGuided(rows: DataFrame, groupCol: Column,
      hashCol: Column, valueCol: Column, sketchRows: DataFrame,
      qs: Seq[Double]): DataFrame = {
    // Keep the caller's original columns alongside (_qk_g, _qk_v) so the
    // HASH — typically an md5 derivation, the most expensive per-row
    // expression in sight — can be evaluated AFTER the target-bucket
    // semi-join, i.e. for ~n/k of the rows instead of all of them (and
    // never in the count pass, where column pruning drops it entirely).
    val base = rows
      .withColumn("_qk_g", groupCol)
      .withColumn("_qk_v", valueCol)
    // Sketch boundaries are driver-scale (≤ groups × k rows) — collect
    // them and inline ONE literal sorted array per group in a CASE on
    // the group key, with the O(log k) codegen'd binary search
    // (SortedCountLE) picking the bucket. Two measured traps this
    // avoids, each dominating a probe at scale: (a) size(filter(...))
    // is O(k) interpreted lambda calls per row; (b) joining the bounds
    // RELATION carries the k-element array through the join for every
    // fact row (psi_drift's bucket pass: 9.3 s join-carried vs 2.7 s
    // literal at 10^8 rows). Groups absent from the sketch yield a
    // null bucket and are filtered — the inner-join semantics exactly.
    val boundsLocal = sortedValues(sketchRows).limit(maxLiteralGroups + 1)
      .collect().map(r => r.get(0) -> r.getSeq[Any](1)).toList
    require(boundsLocal.size <= maxLiteralGroups,
      s"QuantileSketch.exactQuantilesSketchGuided: more than " +
        s"$maxLiteralGroups distinct groups in the pilot sketch — bucket " +
        "boundaries inline as a literal CASE on the group key, which is " +
        "for LOW-cardinality groups only")
    val bucketed =
      if (boundsLocal.isEmpty) base.withColumn("_qk_b", lit(null: String).cast("int"))
        .filter(col("_qk_b").isNotNull)
      else {
        val et = sketchRows.schema("_qk_v").dataType
        def pick(bs: Seq[Any]): Column =
          graft.functions.SortedSearch.sortedCountLE(
            org.apache.spark.sql.graftbridge.ColumnBridge.column(
              org.apache.spark.sql.catalyst.expressions.Literal.create(
                bs, org.apache.spark.sql.types.ArrayType(et, containsNull = false))),
            col("_qk_v"))
        val expr0 = when(col("_qk_g") === lit(boundsLocal.head._1),
          pick(boundsLocal.head._2))
        base.withColumn("_qk_b", boundsLocal.tail.foldLeft(expr0) {
            case (acc, (gv, bs)) =>
              acc.when(col("_qk_g") === lit(gv), pick(bs))
          })
          .filter(col("_qk_b").isNotNull)
      }
    val counts = bucketed.groupBy(col("_qk_g"), col("_qk_b"))
      .agg(count(lit(1)).as("_qk_c"))
    val wCum = Window.partitionBy(col("_qk_g")).orderBy(col("_qk_b"))
    val wTot = Window.partitionBy(col("_qk_g"))
    val targets = counts
      .withColumn("_qk_before", sum(col("_qk_c")).over(wCum) - col("_qk_c"))
      .withColumn("_qk_n", sum(col("_qk_c")).over(wTot))
      .select(col("_qk_g"), col("_qk_b"), col("_qk_before"), col("_qk_c"),
        col("_qk_n"), explode(array(qs.map(lit(_)): _*)).as("q"))
      .withColumn("_qk_r",
        ceil(col("q") * col("_qk_n")).cast("long"))
      .filter(col("_qk_r") > col("_qk_before") &&
        col("_qk_r") <= col("_qk_before") + col("_qk_c"))
      .select(col("_qk_g"), col("_qk_b"), col("q"),
        (col("_qk_r") - col("_qk_before")).as("_qk_roff"))
      // targets is ≤ |qs|·groups rows but its SUBTREE is the full count
      // pass — it feeds two broadcasts below, and without materializing
      // it the 100× probe re-ran the fact-sized count scan twice.
      // Checkpointing a ≤16-row relation is the allowed side of the
      // no-fact-caching rule.
      .localCheckpoint()
    val wSel = Window.partitionBy(col("_qk_g"), col("_qk_b"))
      .orderBy(col("_qk_v"), col("_qk_h"))
    bucketed
      .join(broadcast(targets.select(col("_qk_g"), col("_qk_b")).distinct()),
        Seq("_qk_g", "_qk_b"))
      // hash evaluated here — only for rows inside target cells
      .withColumn("_qk_h", hashCol)
      .withColumn("_qk_rn", row_number().over(wSel))
      .join(broadcast(targets), Seq("_qk_g", "_qk_b"))
      .filter(col("_qk_rn") === col("_qk_roff"))
      .select(col("_qk_g").as("scope"), col("q"), col("_qk_v").as("est"))
  }

  /** INTEGER-rank picks — (scope, num, den, est): the sketch value at
    * ascending value-rank ceil(n·num/den), computed as
    * (n·num + den − 1) div den in exact integer arithmetic, so no float
    * rank ever crosses an engine boundary (float ceil() diverges
    * between engines on exact multiples — the reason gated queries pick
    * ranks this way). This is the supported entry point for p05/p95-
    * style bound picks; use it instead of re-inlining the packed-array
    * expression over private columns. */
  def ranksAt(sketchRows: DataFrame, ranks: Seq[(Int, Int)]): DataFrame = {
    val packed = sortedValues(sketchRows)
    val picks = ranks.map { case (num, den) =>
      struct(lit(num).as("num"), lit(den).as("den"),
        element_at(col("vs"),
          expr(s"cast((size(vs) * $num + ${den - 1}) div $den as int)"))
          .as("est"))
    }
    packed.select(col("scope"), explode(array(picks: _*)).as("re"))
      .select(col("scope"), col("re.num").as("num"),
        col("re.den").as("den"), col("re.est").as("est"))
  }
}
