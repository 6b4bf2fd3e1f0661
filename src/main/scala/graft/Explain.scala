package graft

import org.apache.spark.sql.SparkSession

/** Plan-review tool: dump `explain("formatted")` for every registered
  * query (or the names passed as args) so scan pushdown (`PushedFilters`,
  * `ReadSchema`), broadcast vs shuffle joins, partial aggregation, and
  * WholeStageCodegen spans can be audited per round.
  *
  * Usage: runMain graft.Explain [sfDir] [queryName...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.tail.toSeq else SparkEntry.queries.keys.toSeq.sorted
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
      else SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
