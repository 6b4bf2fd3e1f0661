package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

import scala.collection.mutable

/** Job-level wall attribution for bench hotspots (optimization guide §1:
  * measure BEFORE changing). For each named query: one untimed warmup
  * pass, then one measured noop-sink run with a SparkListener recording
  * every job's wall time, its first stage's callsite, task count, and
  * summed executor run time. Output: per-job lines sorted by submission,
  * so an iterative operator's per-round overhead, a repeated scan, or a
  * driver-side gap (wall >> Σ job wall) is visible in one read.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=32 \
  *          sbt "runMain graft.Profile <query> [query...]"
  */
object Profile {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: Profile <queryName> [queryName...]")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val unknown = args.toSet -- SparkEntry.queries.keySet
    require(unknown.isEmpty, s"not in registry: ${unknown.mkString(", ")}")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.io.compression.codec", "zstd")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    final case class Job(id: Int, start: Long, var end: Long = 0L,
        var site: String = "", var nTasks: Int = 0, var execMs: Long = 0L,
        var stages: List[String] = Nil)
    val jobs = mutable.LinkedHashMap.empty[Int, Job]
    val stageToJob = mutable.Map.empty[Int, Int]
    @volatile var recording = false
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = if (recording) {
        val site = Option(e.properties)
          .flatMap(p => Option(p.getProperty("callSite.short"))).getOrElse("?")
        jobs.synchronized {
          jobs(e.jobId) = Job(e.jobId, e.time, site = site)
          e.stageIds.foreach(sid => stageToJob(sid) = e.jobId)
        }
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobs.synchronized { jobs.get(e.jobId).foreach(_.end = e.time) }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        jobs.synchronized {
          for (jid <- stageToJob.get(e.stageInfo.stageId);
               j <- jobs.get(jid)) {
            j.nTasks += e.stageInfo.numTasks
            j.execMs += e.stageInfo.taskMetrics.executorRunTime
            j.stages ::= s"${e.stageInfo.stageId}:${e.stageInfo.name.takeWhile(_ != ' ')}"
          }
        }
    }
    spark.sparkContext.addSparkListener(listener)

    args.foreach { name =>
      val fn = SparkEntry.queries(name)
      // warmup (JIT, codegen cache, parquet footers) — mirrors Bench
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      spark.catalog.clearCache()
      jobs.synchronized { jobs.clear(); stageToJob.clear() }
      recording = true
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      recording = false
      spark.catalog.clearCache()
      // settle the async listener bus before reading (no public flush API)
      Thread.sleep(400)
      println(f"%n===== $name wall=$wall%.3f s =====")
      val snap = jobs.synchronized(jobs.values.toList.sortBy(_.start))
      var prevEnd = 0L
      snap.foreach { j =>
        val dur = (j.end - j.start) / 1000.0
        val gap = if (prevEnd == 0) 0.0 else (j.start - prevEnd) / 1000.0
        prevEnd = math.max(prevEnd, j.end)
        println(f"job ${j.id}%3d  dur=$dur%7.3f s  gap=$gap%6.3f s  " +
          f"tasks=${j.nTasks}%4d  execSum=${j.execMs / 1000.0}%8.3f s  " +
          s"site=${j.site}  stages=${j.stages.reverse.mkString(",")}")
      }
      val sumJobs = snap.map(j => (j.end - j.start) / 1000.0).sum
      println(f"jobs=${snap.size}  sum(job wall)=$sumJobs%.3f s  " +
        f"driver/other gap=${wall - sumJobs}%.3f s")
    }
    spark.stop()
  }
}
