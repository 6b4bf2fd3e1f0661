package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.DistributionRanks

/** DistributionRanks must be bit-identical to the window form it
  * replaces — `row_number() OVER (PARTITION BY g ORDER BY o)` — for any
  * bucket count (bounds shape only CELLS, never ranks), including the
  * edge that bit r11's first cut: an order key EQUAL to a sampled bound
  * (sortedCountLE counts ≤, so equal keys land in the bucket ABOVE the
  * bound — headKeys must use the same convention). */
class DistributionRanksSpec extends SparkSpec {

  import spark.implicits._

  private def referenceRanks(rows: Seq[(String, Long)]): Map[(String, Long), (Long, Long)] = {
    // hand semantics: ascending rank within group + group size
    rows.groupBy(_._1).flatMap { case (g, rs) =>
      val sorted = rs.map(_._2).sorted
      sorted.zipWithIndex.map { case (o, i) =>
        (g, o) -> ((i + 1).toLong, sorted.size.toLong)
      }
    }
  }

  test("ranks equal the window form for every bucket count") {
    val rows = (1L to 200L).map(i => (s"g${i % 3}", i * 7 % 1009)) ++
      Seq(("g3", 5L)) // a 1-row group: rank 1 of 1
    val df = rows.toDF("g", "o")
    val ref = referenceRanks(rows)
    for (buckets <- Seq(1, 2, 4, 16, 256)) {
      val got = DistributionRanks
        .withGroupRanks(df, col("g"), col("o"), "rn", "n", buckets)
        .select(col("g"), col("o"), col("rn"), col("n"))
        .collect()
        .map(r => (r.getString(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3))))
        .toMap
      assert(got == ref, s"buckets=$buckets diverged from window semantics")
    }
  }

  test("matches row_number()/count() window output on fixture orders") {
    val o = spark.read.parquet(s"$sf001/orders.parquet")
      .select(col("o_orderkey"), col("o_orderstatus"))
    val w = Window.partitionBy(col("o_orderstatus")).orderBy(col("o_orderkey"))
    val expect = o.select(col("o_orderkey"),
        row_number().over(w).cast("long").as("rn"),
        count(lit(1)).over(Window.partitionBy(col("o_orderstatus"))).as("n"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val got = DistributionRanks
      .withGroupRanks(o, col("o_orderstatus"), col("o_orderkey"), "rn", "n", 16)
      .select(col("o_orderkey"), col("rn"), col("n"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == expect)
  }

  test("headKeys returns the k smallest per group, even when a key equals a bound") {
    // keys 10..90 step 10 in one group: with buckets=4 the sampled bounds
    // are drawn FROM the keys themselves, so bound-equal keys are
    // guaranteed to exist — the convention-mismatch regression test
    val rows = (1 to 9).map(i => ("a", i * 10L)) ++ (1 to 5).map(i => ("b", i * 100L))
    val df = rows.toDF("g", "o")
    for (buckets <- Seq(1, 2, 4, 8)) {
      val gr = DistributionRanks.groupRanks(df, col("g"), col("o"), "rn", "n", buckets)
      val heads = DistributionRanks.headKeys(df, col("g"), col("o"), gr, 3)
      assert(heads("a") == Seq(10L, 20L, 30L), s"buckets=$buckets: ${heads("a")}")
      assert(heads("b") == Seq(100L, 200L, 300L), s"buckets=$buckets: ${heads("b")}")
    }
  }

  test("headKeys truncates at the group size for groups smaller than k") {
    val df = Seq(("a", 1L), ("a", 2L), ("b", 9L)).toDF("g", "o")
    val gr = DistributionRanks.groupRanks(df, col("g"), col("o"), "rn", "n", 4)
    val heads = DistributionRanks.headKeys(df, col("g"), col("o"), gr, 3)
    assert(heads("a") == Seq(1L, 2L))
    assert(heads("b") == Seq(9L))
  }

  test("valuesAtRanks picks the exact per-group rank values for every bucket count") {
    val rows = (1L to 301L).map(i => (s"g${i % 3}", i * 13 % 997)) ++
      Seq(("solo", 42L))
    val df = rows.toDF("g", "o")
    // reference: value at 1-based ascending rank, computed by hand
    val ref = rows.groupBy(_._1).flatMap { case (g, rs) =>
      val sorted = rs.map(_._2).sorted
      val n = sorted.size.toLong
      Seq((g, "med") -> sorted(((n + 1) / 2 - 1).toInt),
        (g, "lo") -> sorted(((n + 19) / 20 - 1).toInt))
    }.toMap
    for (buckets <- Seq(1, 2, 7, 64, 256)) {
      val got = DistributionRanks.valuesAtRanks(df, col("g"), col("o"),
        n => Seq("med" -> (n + 1) / 2, "lo" -> (n + 19) / 20), buckets)
      assert(got == ref, s"buckets=$buckets diverged from hand ranks")
    }
  }

  test("valuesAtRanks: ties collapse, out-of-range ranks drop, empty input empty") {
    val ties = Seq(("a", 5L), ("a", 5L), ("a", 5L), ("a", 9L)).toDF("g", "o")
    val got = DistributionRanks.valuesAtRanks(ties, col("g"), col("o"),
      n => Seq("r2" -> 2L, "r4" -> 4L, "over" -> (n + 1), "zero" -> 0L))
    assert(got == Map(("a", "r2") -> 5L, ("a", "r4") -> 9L))
    val empty = Seq.empty[(String, Long)].toDF("g", "o")
    assert(DistributionRanks.valuesAtRanks(empty, col("g"), col("o"),
      n => Seq("med" -> (n + 1) / 2)).isEmpty)
  }

  test("null group keys rank as their own partition (window semantics), never dropped") {
    // `row_number() OVER (PARTITION BY g ...)` groups nulls together; the
    // pre-fix code NPE'd on the driver-side .sorted and would have
    // silently dropped null-group rows through the inner offsets join
    val rows: Seq[(String, Long)] =
      Seq((null, 30L), ("a", 1L), (null, 10L), ("a", 2L), (null, 20L))
    val df = rows.toDF("g", "o")
    val got = DistributionRanks
      .withGroupRanks(df, col("g"), col("o"), "rn", "n", 4)
      .select(col("g"), col("o"), col("rn"), col("n"))
      .collect()
      .map(r => (Option(r.getString(0)), r.getLong(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    assert(got == Map(
      (None, 10L) -> ((1L, 3L)), (None, 20L) -> ((2L, 3L)),
      (None, 30L) -> ((3L, 3L)),
      (Some("a"), 1L) -> ((1L, 2L)), (Some("a"), 2L) -> ((2L, 2L))))
    // counts key null groups by the documented sentinel
    val gr = DistributionRanks.groupRanks(df, col("g"), col("o"), "rn", "n", 4)
    assert(gr.counts.keys.map(_._1).toSet ==
      Set("a", DistributionRanks.NullGroupKey))
  }

  test("withGroupRanks is uncapped: 1e5 groups rank exactly with no driver counts collect") {
    // the pre-r12 path collected (group × bucket) counts to the driver
    // and required ≤ maxLiteralGroups (1000) groups — 1e5 groups would
    // throw. The distributed-offsets path must (a) not throw, (b) stay
    // bit-identical to the window form at high cardinality.
    val n = 100000
    val df = spark.range(3L * n).selectExpr(
      s"concat('u', id % $n) AS g",
      "(id * 2654435761) % 1000003 + id AS o") // unique-per-group keys
    val w = Window.partitionBy(col("g")).orderBy(col("o"))
    val expect = df.select(col("g"), col("o"),
        row_number().over(w).cast("long").as("rn"),
        count(lit(1)).over(Window.partitionBy(col("g"))).as("n"))
    val got = DistributionRanks
      .withGroupRanks(df, col("g"), col("o"), "rn", "n", 64)
      .select(col("g"), col("o"), col("rn"), col("n"))
    assert(got.exceptAll(expect).isEmpty && expect.exceptAll(got).isEmpty,
      "high-cardinality ranks diverged from the window form")
  }

  test("empty input yields an empty ranked relation, not a plan-build error") {
    val df = Seq.empty[(String, Long)].toDF("g", "o")
    val out = DistributionRanks.withGroupRanks(df, col("g"), col("o"), "rn", "n")
    assert(out.count() == 0)
  }
}
