package graft

import org.apache.spark.sql.functions._

/** Physical-layout levers for the 100 TB design: bucketed tables
  * co-locating a join (no exchange), partitioned writes pruning at the
  * scan, and broadcast-vs-shuffle strategy control. These assert on the
  * executed plan, not just results — the plan IS the deliverable.
  */
class PartitioningSpec extends SparkSpec {

  private def planOf(df: org.apache.spark.sql.DataFrame): String = {
    df.collect() // force AQE final plan
    df.queryExecution.executedPlan.toString
  }

  test("bucketed tables join without a shuffle exchange") {
    val li = graft.sources.Tables.lineitem(spark, sf001)
    val o = graft.sources.Tables.orders(spark, sf001)
    // the in-memory catalog forgets tables across JVMs but the warehouse
    // directory survives → LOCATION_ALREADY_EXISTS unless cleaned first
    Seq("li_bucketed", "o_bucketed").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val dir = new java.io.File(s"target/spark-warehouse/$t")
      if (dir.exists()) {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
        }
        rm(dir)
      }
    }
    li.write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("li_bucketed")
    o.write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("o_bucketed")
    val joined = spark.table("li_bucketed")
      .join(spark.table("o_bucketed"), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
    val plan = planOf(joined)
    // the join itself must not shuffle either side; the only exchange
    // allowed is the one feeding the final aggregation
    val joinPart = plan.split("SortMergeJoin|ShuffledHashJoin").drop(1).mkString
    assert(!joinPart.contains("Exchange hashpartitioning(l_orderkey") &&
      !joinPart.contains("Exchange hashpartitioning(o_orderkey"),
      s"bucketed join still shuffles:\n$plan")
    // results must equal the unbucketed join
    val expect = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == expect)
  }

  test("partitioned write prunes partitions at the scan") {
    val dir = "target/test-partitioned-orders"
    graft.sources.Tables.orders(spark, sf001)
      .write.mode("overwrite").partitionBy("o_orderstatus").parquet(dir)
    val pruned = spark.read.parquet(dir).filter(col("o_orderstatus") === "F")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("o_orderstatus"), s"no partition pruning:\n$plan")
    assert(pruned.count() ==
      graft.sources.Tables.orders(spark, sf001)
        .filter(col("o_orderstatus") === "F").count())
  }

  test("dynamic partition pruning: a dim filter prunes fact partitions at runtime") {
    val dir = "target/test-dpp-orders"
    graft.sources.Tables.orders(spark, sf001)
      .write.mode("overwrite").partitionBy("o_orderstatus").parquet(dir)
    val fact = spark.read.parquet(dir)
    // dim carries the filter; only the join reveals which partitions
    // survive — static pruning can't help, DPP must inject the subquery.
    // The dim must be a REAL relation: a local Seq gets constant-folded
    // (filter evaluated at plan time), leaving no selective predicate
    // for the PartitionPruning rule to latch onto.
    import spark.implicits._
    val dimDir = "target/test-dpp-dim"
    Seq(("F", "keep"), ("O", "drop"), ("P", "drop"))
      .toDF("status", "tag").write.mode("overwrite").parquet(dimDir)
    val dim = spark.read.parquet(dimDir)
    val joined = fact.join(dim, col("o_orderstatus") === col("status"))
      .filter(col("tag") === "keep")
      .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
    val n = joined.collect().map(_.getLong(1)).sum
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"no dynamic partition pruning subquery in the fact scan:\n$plan")
    assert(n == graft.sources.Tables.orders(spark, sf001)
      .filter(col("o_orderstatus") === "F").count())
  }

  test("broadcast hint vs merge hint actually change the join strategy") {
    val li = graft.sources.Tables.lineitem(spark, sf001)
    val o = graft.sources.Tables.orders(spark, sf001)
    val b = planOf(li.join(broadcast(o), col("l_orderkey") === col("o_orderkey")))
    assert(b.contains("BroadcastHashJoin"), b)
    val m = planOf(li.hint("merge").join(o, col("l_orderkey") === col("o_orderkey")))
    assert(m.contains("SortMergeJoin"), m)
  }
}
