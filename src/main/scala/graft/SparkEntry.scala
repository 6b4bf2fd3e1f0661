package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.UniqueUsers
import graft.sources.Tables

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in `queries` is one operator of SURVEY §2's inventory (or a
  * north-star extension), expressed over the driver-provided parquet tables
  * at `dir` (TESTDATA.md). Each has a matching ANSI-SQL oracle in
  * `oracleSql` runnable by DuckDB over the same tables; column names are
  * aligned pairwise because the driver sorts columns by name before hashing.
  */
object SparkEntry {

  /** Flagship: the reference's one real query — unique users per 1-minute
    * event-time window (reference UniqueUsersApp.java:91–134). */
  def entry(spark: SparkSession): DataFrame =
    UniqueUsers.perMinute(
      Tables.events(spark, "/root/testdata/sf0.001"),
      col("ts"), col("user_id"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Queries.all

  def oracleSql: Map[String, String] = Queries.oracles
}
