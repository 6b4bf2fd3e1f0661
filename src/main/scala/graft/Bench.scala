package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: one JSON line with per-query and total seconds.
  *
  * Two passes: an untimed warmup (JIT, codegen caches, parquet footer
  * cache) then the timed pass — steady-state numbers, not JVM-start
  * artifacts. Queries run in name order for stable cross-round diffs.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Optional comma-separated name filter for local iteration on a
    // hotspot (e.g. SPARK_GRAFT_ONLY=minhash_lsh_pairs); driver leaves
    // it unset and benches the full registry.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    // an unknown name must fail loudly — a silent empty filter would emit
    // a plausible 0-second "clean" line that a consumer records as a pass
    only.foreach { names =>
      val unknown = names -- SparkEntry.queries.keySet
      require(unknown.isEmpty, s"SPARK_GRAFT_ONLY names not in registry: ${unknown.mkString(", ")}")
      require(names.nonEmpty, "SPARK_GRAFT_ONLY is set but names no queries")
    }
    val queries = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }

    def runOne(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): (Double, Option[String]) = {
      val t0 = System.nanoTime()
      val err = try { fn(spark, sfDir).count(); None }
        catch { case e: Throwable => Some(e.getClass.getSimpleName) }
      ((System.nanoTime() - t0) / 1e9, err)
    }

    queries.foreach { case (n, f) => runOne(n, f) } // warmup, untimed
    val results = queries.map { case (n, f) => n -> runOne(n, f) }

    // ms precision keeps the line short enough for tail-buffer parsers
    // (full Double.toString of 67 entries overflowed a ~3 KB tail in r1);
    // Double.toString, not %f — String.format is locale-dependent.
    def fmt(v: Double): String = (math.round(v * 1000) / 1000.0).toString
    val qs = results.map { case (k, (v, _)) => "\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    // a failed query must not masquerade as a fast pass — name it
    val errs = results.collect { case (k, (_, Some(e))) =>
      "\"" + k + "\":\"" + e + "\"" }.mkString("{", ",", "}")
    val total = fmt(results.map(_._2._1).sum)
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
