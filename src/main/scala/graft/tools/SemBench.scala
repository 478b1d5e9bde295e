package graft.tools

import org.apache.spark.sql.functions.col

import graft.Sessions

/** Prints the SemDeDup (k, probes) cost/recall sweep COVERAGE.md cites
  * (not part of the library surface): the fixed-k quadratic cell growth
  * q121/q128 document, and how scaling k with n bounds it. Each variant's
  * drop count is printed alongside its min-of-3 time so the cost/recall
  * trade is one table. Usage:
  *   SPARK_GRAFT_SF_DIR=/tmp/sf1 sbt "runMain graft.tools.SemBench"
  */
object SemBench {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "3").toInt
    val spark = Sessions.local(32)
    spark.sparkContext.setLogLevel("WARN")
    val n = graft.vector.Queries.prepared(spark, dir).count()
    for (k <- Seq(8, 32, 64); probes <- Seq(1, 2)) {
      def once(): (Double, Long) = {
        val t0 = System.nanoTime()
        val out = graft.vector.Queries.semanticDedup(
          spark, graft.vector.Queries.prepared(spark, dir), k, probes)
        val drops = out.filter(col("dropped") === 1).count()
        ((System.nanoTime() - t0) / 1e9, drops)
      }
      val all = (1 to runs).map(_ => once())
      println(f"n=$n k=$k%2d probes=$probes cell≈${n / k}%5d " +
        f"sec=${all.map(_._1).min}%7.2f drops=${all.head._2}")
    }

    // Store lifecycle split (q129): build once on the corpus split, then
    // serve the drop from the stored model — the serve row is the
    // recurring per-drop cost the build amortizes away.
    val storeDir = java.nio.file.Files
      .createTempDirectory("graft-sembench-store").toString
    val corpus = graft.vector.Queries.prepared(spark, dir)
      .filter(col("vec_id") % 3 =!= 0)
    val t0 = System.nanoTime()
    val k = graft.vector.ClusterStore.buildAuto(corpus, storeDir)
    val buildSec = (System.nanoTime() - t0) / 1e9
    def serveOnce(): (Double, Long) = {
      val t = System.nanoTime()
      val out = graft.vector.ClusterStore.dedupNewDropVsStoreReadOnly(
        graft.vector.Queries.prepared(spark, dir)
          .filter(col("vec_id") % 3 === 0), storeDir, probes = 2)
      val drops = out.filter(col("dropped") === 1).count()
      ((System.nanoTime() - t) / 1e9, drops)
    }
    val serves = (1 to runs).map(_ => serveOnce())
    println(f"store: build(autoK=$k) sec=$buildSec%7.2f  " +
      f"serve sec=${serves.map(_._1).min}%7.2f drops=${serves.head._2}")
    spark.stop()
  }
}
