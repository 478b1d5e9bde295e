package graft

/** Throwaway profiling harness (not part of the library surface): times the
  * named SparkEntry queries with Bench's protocol (sf0.001 warm-up, then 3
  * timed runs at SPARK_GRAFT_SF_DIR, median reported).
  *
  * Usage: sbt "runMain graft.Prof q27_embed_pairs q45_embed_neardup"
  */
object Prof {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local(32)
    spark.sparkContext.setLogLevel("WARN")
    val names = if (args.nonEmpty) args.toSeq else Seq("q48_neardup_clusters")
    def run(name: String, d: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, d).write.format("noop").mode("overwrite").save()
      val s = (System.nanoTime() - t0) / 1e9
      System.gc()
      s
    }
    names.foreach(run(_, "/root/testdata/sf0.001")) // warm-up
    names.foreach { n =>
      val ts = (1 to 3).map(_ => run(n, dir)).sorted
      println(f"[prof] $n: median ${ts(1)}%.2f s  (${ts.map(t => f"$t%.2f").mkString(", ")})")
    }
    spark.stop()
  }
}
