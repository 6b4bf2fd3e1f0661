package graft

import org.apache.spark.sql.functions._

/** Pins SCALING.md's claim that join-side skew is handled by AQE, not by
  * hand: a 90%-hot key would hang one reducer at scale; AQE's skew-join
  * rule must split that partition into parallel sub-joins (the executed
  * SMJ prints `skew=true`). Thresholds are shrunk so the fixture-scale
  * shuffle (a few MB) triggers the same code path a 100 TB shuffle does
  * with the defaults — the knobs are per-deployment sizing, the PLAN
  * TRANSFORM is what this asserts.
  */
class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("AQE splits the hot key's partition in a skewed sort-merge join") {
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "100KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "50KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // 200k-row fact, 90% on key 0; payload pads the hot partition past
      // the shrunken skew threshold. dim = 100 distinct keys.
      val fact = spark.range(200000L)
        .select(when(col("id") % 10 =!= 0, lit(0L)).otherwise(col("id") % 100)
          .as("key"),
          concat(lit("x"), col("id").cast("string"),
            lit("p" * 64)).as("payload"))
      val dim = spark.range(100L).select(col("id").as("key"),
        concat(lit("d"), col("id").cast("string")).as("dname"))
      // payload must survive into the aggregate, or column pruning empties
      // the hot partition's bytes and AQE just coalesces
      val joined = fact.join(dim, Seq("key"))
        .groupBy(col("dname")).agg(count(lit(1)).as("n"),
          sum(length(col("payload"))).as("bytes"))
      val rows = joined.collect()
      assert(rows.map(_.getLong(1)).sum == 200000L)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE did not split the skewed partition:\n$plan")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("saltedJoin: result ≡ plain join; shuffle keys carry the salt") {
    // 90%-hot fact key; the a-priori salt form must produce exactly the
    // plain join's rows while shuffling under (key, salt)
    val fact = spark.range(20000L)
      .select(when(col("id") % 10 =!= 0, lit(0L)).otherwise(col("id") % 50)
        .as("fkey"), col("id").as("rowid"))
    val dim = spark.range(50L).select(col("id").as("dkey"),
      concat(lit("d"), col("id").cast("string")).as("dname"))
    val salted = graft.operators.SkewOps
      .saltedJoin(fact, dim, "fkey", "dkey", col("rowid"), salts = 8)
      .groupBy(col("dname")).agg(count(lit(1)).as("n"))
    val plain = fact.join(dim, col("fkey") === col("dkey"))
      .groupBy(col("dname")).agg(count(lit(1)).as("n"))
    val s = salted.as[(String, Long)].collect().toMap
    val p = plain.as[(String, Long)].collect().toMap
    assert(s == p, "salting changed the join result")
    val plan = salted.queryExecution.executedPlan.toString
    assert(plan.contains("_sk_salt"),
      s"join does not shuffle under the salt:\n$plan")
    assert(!plan.contains("BroadcastHashJoin"),
      s"dim broadcast defeats the salted topology under test:\n$plan")
  }
}
