package graft

import org.apache.spark.sql.SparkSession

/** Plan-review tool: dump `explain("formatted")` for every registered
  * query (or the names passed as args) so scan pushdown (`PushedFilters`,
  * `ReadSchema`), broadcast vs shuffle joins, partial aggregation, and
  * WholeStageCodegen spans can be audited per round.
  *
  * With `--executed`, each query is RUN first and the AQE-final
  * `executedPlan` is printed instead — the only place runtime plan
  * features (ReusedExchange dedup of repeated subplans, AQE coalescing,
  * skew splits) are visible; the static formatted plan shows none of them.
  *
  * Usage: runMain graft.Explain [sfDir] [--executed] [queryName...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val executed = args.tail.contains("--executed")
    val rest = args.tail.filterNot(_ == "--executed").toSeq
    val names = if (rest.nonEmpty) rest else SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      // streaming-in-function queries execute on build; skip their plans
      if (n.startsWith("streaming_")) println("(streaming query — plan is per-microbatch IncrementalExecution)")
      else if (executed) {
        val df = SparkEntry.queries(n)(spark, sfDir)
        // collect(), not count(): an action like count() builds its OWN
        // QueryExecution, leaving this dataset's AQE plan un-finalized
        df.collect()
        println(df.queryExecution.executedPlan.toString)
      } else SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
