package graft

import java.util.concurrent.Executors
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration._

/** SCALING.md's shared-session-safety claim, as a test instead of prose:
  * a multi-tenant driver runs many registry queries on ONE SparkSession
  * concurrently, so (1) every concurrently-produced result must equal its
  * serial run bit-for-bit — the oracle-gated answer, since each serial
  * run hash-matches DuckDB in the driver gate — and (2) no query may
  * mutate session-level conf as a side effect (a conf mutation under
  * concurrency is a cross-tenant plan change).
  *
  * The subset is deliberately mixed: TPC-H joins, window analytics,
  * LSH dedup, maintenance (cdc/table_checksum — temp-view + scratch-dir
  * users), vector search, and a REAL Structured Streaming gate
  * (streaming_unique_users) racing the batch queries for the session.
  */
class ConcurrencySpec extends SparkSpec {

  private val names = Seq(
    "q1_agg", "q3_topk_revenue", "unique_users_per_minute",
    "minhash_lsh_pairs", "table_checksum", "ohlc_hourly",
    "knn_bruteforce", "cdc_apply", "window_rank_orders",
    "streaming_unique_users",
    // round-8 additions: a scratch-dir foreachBatch gate and the
    // sketch-composed histogram racing the batch queries
    "streaming_funnel", "equi_depth_histogram",
    // round-9 gates raced in round 10: winsorize_sketch's starvation
    // guard rides a broadcast join (assert_true under concurrency is
    // exactly what to race), percentile_bucket shares the sketchThinned
    // machinery, and streaming_sessions_funnel drives TWO versioned
    // foreachBatch state dirs under concurrent session use
    "winsorize_sketch", "percentile_bucket", "streaming_sessions_funnel",
    // round-10 re-plans raced: the kmv pair drives localCheckpoint +
    // runSeq scratch naming under concurrent use, and the two
    // distinct-split gates must keep their two-aggregate join stable
    // when other tenants hold the session
    "kmv_sketch", "approx_quantiles_price", "approx_unique_users",
    // round-10 continuation re-plans: the cache-free cohort window and
    // the re-scan-per-consumer MV refresh (scratch MV write→read→merge
    // racing 19 other tenants; scratchPath isolates per (tag, sf, pid) —
    // concurrent DISTINCT gates may share the process, same-gate
    // self-races are out of contract, documented in SCALING)
    "cohort_retention", "incremental_mv_refresh",
    // round-11 re-plans raced: window_analytics runs DistributionRanks'
    // EAGER bound/count collects + a broadcast-offsets join at gate-build
    // time (driver-side state under concurrent tenants), mad_outliers
    // chains TWO sequential valuesAtRanks picks, and the perceptual-hash
    // gate drives simHashBandedPairs' localCheckpoint under contention
    "window_analytics", "mad_outliers", "multimodal_near_dedup")

  /** Canonical result fingerprint: sorted row renderings (schema-ordered
    * columns, null-safe) — identical iff the row multisets are. */
  private def fingerprint(name: String): Seq[String] =
    Queries.all(name)(spark, sf001).collect()
      .map(r => (0 until r.length).map(i =>
        if (r.isNullAt(i)) "\u0000" else r.get(i).toString).mkString("|"))
      .sorted.toSeq

  test("twenty mixed gates run concurrently on one session, results unchanged") {
    val serial = names.map(n => n -> fingerprint(n)).toMap
    val confBefore = spark.conf.getAll

    val pool = Executors.newFixedThreadPool(names.size)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val concurrent = Await.result(
        Future.sequence(names.map(n => Future(n -> fingerprint(n)))),
        10.minutes).toMap
      names.foreach { n =>
        assert(concurrent(n) == serial(n),
          s"$n diverged under concurrency (${concurrent(n).size} vs " +
            s"${serial(n).size} rows)")
      }
    } finally pool.shutdown()

    val confAfter = spark.conf.getAll
    val drifted = (confBefore.keySet ++ confAfter.keySet).filter(k =>
      confBefore.get(k) != confAfter.get(k))
    assert(drifted.isEmpty,
      s"session conf mutated by a concurrent query: ${drifted.mkString(", ")}")
  }
}
