package graft

import org.apache.spark.sql.functions._
import graft.functions.Sampling

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val keys = (0L until 10000L).toDF("k")

  test("bucket100 is in range and roughly uniform") {
    val hist = keys.select(Sampling.bucket100($"k").as("b"))
      .groupBy($"b").count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(hist.keys.forall(b => b >= 0 && b < 100))
    assert(hist.size == 100)
    // 10k keys over 100 buckets: expect ~100 ± sampling noise
    assert(hist.values.forall(n => n > 60 && n < 150),
      s"min=${hist.values.min} max=${hist.values.max}")
  }

  test("split proportions approximate 80/10/10 and are deterministic") {
    val splits = keys.select(Sampling.split($"k").as("s"))
      .groupBy($"s").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(splits("train") - 8000L) < 400)
    assert(math.abs(splits("val") - 1000L) < 200)
    assert(math.abs(splits("test") - 1000L) < 200)
    // stable across recomputation and repartitioning
    val again = keys.repartition(7).select(Sampling.split($"k").as("s"), $"k")
      .collect().map(r => r.getLong(1) -> r.getString(0)).toMap
    val first = keys.select(Sampling.split($"k").as("s"), $"k")
      .collect().map(r => r.getLong(1) -> r.getString(0)).toMap
    assert(again == first)
  }

  test("sample predicate is a subset of train-style bucketing, append-safe") {
    val sampled = keys.filter(Sampling.samplePredicate($"k", 20))
      .select($"k").as[Long].collect().toSet
    // appending new keys never changes old membership
    val extended = (0L until 20000L).toDF("k")
      .filter(Sampling.samplePredicate($"k", 20))
      .select($"k").as[Long].collect().toSet
    assert(sampled.subsetOf(extended))
    assert(extended.filter(_ < 10000L) == sampled)
  }
}
