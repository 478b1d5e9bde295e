package graft.tools

import graft.{Sessions, SparkEntry}

/** Per-query isolated timing probe (r18): min-of-3 noop-sink timings for
  * named SparkEntry queries under the engine's own session defaults, in
  * ONE JVM — the A/B instrument for this round's targeted optimizations
  * (guide §1: measure first, re-measure after each change).
  *
  * Protocol matches graft.Bench where it matters for comparability
  * (noop sink, min-of-3, inter-run cache/broadcast cleanup) and differs
  * in one deliberate way: each query runs ONCE untimed at the TARGET SF
  * before its timed runs. That both compiles/JITs the exact plan shape
  * and lets any build-if-absent store fixture (q189/q205/q210/... serve
  * paths) construct itself outside the timed window — the same
  * fixture-prebuild discipline Bench.main implements with its explicit
  * prebuild list, without duplicating that list here.
  *
  * Usage: sbt "runMain graft.tools.QBench q186_curation_spine ..."
  */
object QBench {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: QBench <query>...")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR",
      java.nio.file.Paths.get(dir).resolveSibling("sf0.001").toString)
    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "3").toInt
    val spark = Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    spark.sparkContext.setLogLevel("WARN")
    def cleanup(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      System.gc()
    }
    def run(name: String, d: String): Double = {
      spark.sparkContext.setJobDescription(s"qbench: $name @ $d")
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, d)
        .write.format("noop").mode("overwrite").save()
      val s = (System.nanoTime() - t0) / 1e9
      cleanup()
      s
    }
    args.toSeq.foreach { n =>
      if (new java.io.File(warmDir).exists()) run(n, warmDir)
      run(n, dir) // untimed: fixture build + JIT at the target SF
      val ts = (1 to runs).map(_ => run(n, dir))
      println(f"[qbench] $n: min ${ts.min}%.2f s  (${ts.map(t => f"$t%.2f").mkString(", ")})")
    }
    spark.stop()
  }
}
