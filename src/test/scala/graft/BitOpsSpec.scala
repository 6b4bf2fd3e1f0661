package graft

import org.apache.spark.sql.functions._
import graft.functions.BitOps
import graft.operators.SkewOps

class BitOpsSpec extends SparkSpec {
  import spark.implicits._

  test("hamming64 matches Long.bitCount(xor) under codegen") {
    val df = Seq(
      (0L, 0L), (0L, 1L), (0L, -1L),
      (0x0f0f0f0f0f0f0f0fL, 0xf0f0f0f0f0f0f0f0L),
      (123456789L, 987654321L)).toDF("a", "b")
    val got = df.select(BitOps.hamming64($"a", $"b")).as[Int].collect().toSeq
    val want = Seq((0L, 0L), (0L, 1L), (0L, -1L),
      (0x0f0f0f0f0f0f0f0fL, 0xf0f0f0f0f0f0f0f0L),
      (123456789L, 987654321L))
      .map { case (a, b) => java.lang.Long.bitCount(a ^ b) }
    assert(got == want)
  }

  test("hamming64 is null-safe") {
    val df = Seq((Some(1L), None: Option[Long]), (None, Some(2L)), (Some(3L), Some(3L)))
      .toDF("a", "b")
    val got = df.select(BitOps.hamming64($"a", $"b").as("h")).collect().map(r =>
      if (r.isNullAt(0)) None else Some(r.getInt(0)))
    assert(got.toSeq == Seq(None, None, Some(0)))
  }

  test("hamming64 rejects non-long inputs at analysis") {
    val df = Seq(("x", 1L)).toDF("a", "b")
    intercept[Exception] { df.select(BitOps.hamming64($"a", $"b")).collect() }
  }

  test("salted aggregation is bit-identical to the plain aggregate") {
    val ev = graft.sources.Tables.events(spark, sf001)
    val salted = SkewOps.saltedCountSum(ev, $"event_type", $"value", $"event_id", 16)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val plain = ev.groupBy($"event_type")
      .agg(count(lit(1)).as("n"), sum($"value").as("s"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(salted.keySet == plain.keySet)
    salted.foreach { case (k, (n, s)) =>
      assert(n == plain(k)._1)
      assert(math.abs(s - plain(k)._2) < 1e-6) // summation order may differ
    }
  }
}
