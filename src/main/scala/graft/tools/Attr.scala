package graft.tools

import scala.collection.mutable

import org.apache.spark.scheduler._

import graft.{Sessions, SparkEntry}

/** Wall-clock ATTRIBUTION probe (r18, guide §1/§7.3): runs each named
  * query once (after warm-up) under a SparkListener and reports where
  * the wall went — per-job spans (with task-time sums, so a job whose
  * wall ≫ its parallel task time is scheduling/serial-bound) and the
  * DRIVER GAP: wall not covered by any running job, i.e. planning,
  * analysis, AQE re-optimization, broadcast-relation builds on the
  * driver, and collect-side work. The r17 scaling block showed the
  * expensive rows do not parallelize 8→32 cores; this probe names the
  * serial term per query.
  *
  * Usage: sbt "runMain graft.tools.Attr q186_curation_spine ..."
  */
object Attr {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: Attr <query>...")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR",
      java.nio.file.Paths.get(dir).resolveSibling("sf0.001").toString)
    val spark = Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    spark.sparkContext.setLogLevel("WARN")

    final case class Job(id: Int, var start: Long = 0L, var end: Long = 0L,
                         var tasks: Int = 0, var taskMs: Long = 0L,
                         var stages: Int = 0, var desc: String = "")
    val jobs = mutable.LinkedHashMap.empty[Int, Job]
    val stageToJob = mutable.Map.empty[Int, Int]
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val j = Job(e.jobId, start = e.time)
        j.desc = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse("")
        j.stages = e.stageIds.size
        e.stageIds.foreach(s => stageToJob(s) = e.jobId)
        jobs.synchronized { jobs(e.jobId) = j }
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobs.synchronized { jobs.get(e.jobId).foreach(_.end = e.time) }
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
        jobs.synchronized {
          stageToJob.get(e.stageId).flatMap(jobs.get).foreach { j =>
            j.tasks += 1
            if (e.taskInfo != null) j.taskMs += e.taskInfo.duration
          }
        }
    }

    def cleanup(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      System.gc()
    }
    def run(name: String, d: String): Unit = {
      SparkEntry.queries(name)(spark, d)
        .write.format("noop").mode("overwrite").save()
      cleanup()
    }

    args.toSeq.foreach { n =>
      if (new java.io.File(warmDir).exists()) run(n, warmDir)
      run(n, dir) // fixtures + JIT at target SF
      jobs.synchronized { jobs.clear(); stageToJob.clear() }
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.currentTimeMillis()
      run(n, dir)
      val t1 = System.currentTimeMillis()
      // give the async listener bus a moment to drain before reading
      Thread.sleep(1500)
      spark.sparkContext.removeSparkListener(listener)
      val js = jobs.synchronized { jobs.values.toVector }
      val spans = js.filter(j => j.end > 0 && j.start >= t0)
        .map(j => (j.start, j.end)).sortBy(_._1)
      // union coverage of job spans
      var covered = 0L
      var cur = (0L, 0L)
      spans.foreach { case (s, e) =>
        if (s > cur._2) { covered += cur._2 - cur._1; cur = (s, e) }
        else if (e > cur._2) cur = (cur._1, e)
      }
      covered += cur._2 - cur._1
      val wall = t1 - t0
      println(f"[attr] $n wall=${wall / 1000.0}%.2f s  jobs=${js.size}  " +
        f"job-covered=${covered / 1000.0}%.2f s  driver-gap=${(wall - covered) / 1000.0}%.2f s")
      js.sortBy(j => -(j.end - j.start)).take(12).foreach { j =>
        println(f"[attr]   job ${j.id}%4d wall=${(j.end - j.start) / 1000.0}%6.2f s " +
          f"stages=${j.stages}%3d tasks=${j.tasks}%5d taskSum=${j.taskMs / 1000.0}%7.2f s  ${j.desc.take(60)}")
      }
    }
    spark.stop()
  }
}
