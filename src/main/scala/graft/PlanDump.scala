package graft

import org.apache.spark.sql.SparkSession

/** AQE-final plan dump for a registry query at an arbitrary corpus:
  * executes the query through the same noop-sink protocol Bench uses
  * (so runtime re-plans — skew splits, runtime broadcasts — actually
  * happen), then prints the EXECUTED plan, which reflects AQE's final
  * decisions rather than the static estimate `.explain()` would show.
  *
  * `runMain graft.PlanDump <sfDir> <query> [runs=1]`
  *
  * Used for the SCALING/PLANS.md plan pins at the deep decades (e.g.
  * does q18's whale semi-join stay SMJ at 600 M rows? does the orders
  * leg still runtime-broadcast?). Timing printed per run (protocol
  * numbers come from Bench; these are corroboration walls).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanDump <sfDir> <query> [runs=1]")
    val dir = args(0)
    val name = args(1)
    val runs = if (args.length > 2) args(2).toInt else 1
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.io.compression.codec", "zstd")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query: $name"))
    var last: org.apache.spark.sql.DataFrame = null
    (1 to runs).foreach { r =>
      val t0 = System.nanoTime()
      last = fn(spark, dir)
      last.write.format("noop").mode("overwrite").save()
      println(f"[plandump] $name run $r: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      spark.catalog.clearCache()
    }
    // executedPlan AFTER the action = the AQE-final physical plan
    println(last.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
