package graft.tools

import graft.Sessions
import graft.vector.{Ann, Index, Pq}

/** Prints the stored-vs-fresh ANN index timings COVERAGE.md cites (not
  * part of the library surface): build cost, a query answered by
  * training + encoding from scratch, and the same query served from the
  * persisted index. Usage:
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.tools.IndexBench"
  */
object IndexBench {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val idx = java.nio.file.Files.createTempDirectory("graft-index-bench").toString
    val spark = Sessions.local(32)
    spark.sparkContext.setLogLevel("WARN")
    val nq = 50; val k = 10
    def time(label: String)(f: => Unit): Double = {
      val t0 = System.nanoTime()
      f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[index] $label%-34s ${s}%.2f s")
      s
    }
    // warm-up: JIT + codegen off the clock (same protocol as Bench)
    Index.build(spark, "/root/testdata/sf0.001", s"$idx-warm", 4, 1, 4, 16, 1)
    Index.ivfPqTopK(spark, "/root/testdata/sf0.001", s"$idx-warm", 5, 3)
      .write.format("noop").mode("overwrite").save()

    val tBuild = time("build (train+encode+write)") {
      Index.build(spark, dir, idx, nCells = 16, coarseIters = 2, m = 8, k = 16, pqIters = 2)
    }
    val tFresh = time("fresh serve (train+encode+query)") {
      val coarse = Ann.trainCentroids(spark, dir, 16, 2)
      val model = Pq.train(spark, dir, 8, 16, 2)
      Pq.ivfPqTopK(spark, dir, nq, k, model, coarse, nprobe = 2, rerank = 50)
        .write.format("noop").mode("overwrite").save()
    }
    val tStored = time("stored serve (read index+query)") {
      Index.ivfPqTopK(spark, dir, idx, nq, k, nprobe = 2, rerank = 50)
        .write.format("noop").mode("overwrite").save()
    }
    val amortizes =
      if (tFresh > tStored) f"build amortizes after ${math.ceil(tBuild / (tFresh - tStored)).toLong} queries"
      else "stored serve not faster at this scale - build does not amortize"
    println(f"[index] stored serve is ${tFresh / tStored}%.1fx faster than fresh; $amortizes")
    spark.stop()
  }
}
