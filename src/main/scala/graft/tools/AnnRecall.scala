package graft.tools

import graft.Sessions
import graft.vector.Ann

/** Prints the ANN recall/cost table COVERAGE.md cites (not part of the
  * library surface). Usage:
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.tools.AnnRecall"
  */
object AnnRecall {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local(32)
    spark.sparkContext.setLogLevel("WARN")
    val nq = 50; val k = 10
    val exact = Ann.exactTopK(spark, dir, nq, k).cache()
    exact.count()
    def m(label: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      val r = Ann.recallAtK(df, exact)
      println(f"[recall] $label%-28s recall@$k = $r%.3f  (${(System.nanoTime() - t0) / 1e9}%.1f s)")
    }
    for (np <- Seq(1, 2, 4)) m(s"ivf raw nprobe=$np")(Ann.ivfTopK(spark, dir, nq, k, 8, np))
    for (np <- Seq(1, 2, 4))
      m(s"ivf kmeans(3) nprobe=$np")(Ann.ivfTopK(spark, dir, nq, k, 8, np, trainIters = 3))
    for (r <- Seq(0, 1)) m(s"lsh radius=$r")(Ann.lshTopK(spark, dir, nq, k, 8, r))
    val pq4 = graft.vector.Pq.train(spark, dir, m = 4, k = 16, iters = 2)
    val pq8 = graft.vector.Pq.train(spark, dir, m = 8, k = 16, iters = 2)
    // index built once, scanned many times — the PQ usage pattern
    val codes8 = Some(graft.vector.Pq.encodeFromDir(spark, dir, pq8).cache())
    m("pq m=4 adc only")(graft.vector.Pq.pqTopK(spark, dir, nq, k, pq4))
    m("pq m=8 adc only")(graft.vector.Pq.pqTopK(spark, dir, nq, k, pq8,
      precomputedCodes = codes8))
    m("pq m=8 adc+rerank50")(graft.vector.Pq.pqTopK(spark, dir, nq, k, pq8, rerank = 50,
      precomputedCodes = codes8))
    m("pq m=8 adc+rerank200")(graft.vector.Pq.pqTopK(spark, dir, nq, k, pq8, rerank = 200,
      precomputedCodes = codes8))
    val coarse = graft.vector.Ann.trainCentroids(spark, dir, k = 8, iters = 2)
    for (np <- Seq(1, 2, 4))
      m(s"ivfpq nprobe=$np rerank=200")(graft.vector.Pq.ivfPqTopK(
        spark, dir, nq, k, pq8, coarse, np, rerank = 200, precomputedCodes = codes8))
    spark.stop()
  }
}
