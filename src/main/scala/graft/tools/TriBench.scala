package graft.tools

import graft.{Sessions, SparkEntry}

/** One-off A/B probe (r17): times named SparkEntry queries under join-
  * strategy confs in ONE JVM — default (prefer sort-merge) vs shuffled
  * hash join allowed — min-of-3 each after an sf0.001 warm-up, so the
  * suite-wide `preferSortMergeJoin=false` decision rests on a measured
  * per-query delta rather than the guide's prior alone.
  *
  * Usage: sbt "runMain graft.tools.TriBench q103_triangles ..."
  */
object TriBench {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // warm-up SF derived from the data root (ADVICE r17): a host whose
    // data lives elsewhere warms from the sibling sf0.001, not a
    // hardcoded /root/testdata path
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR",
      java.nio.file.Paths.get(dir).resolveSibling("sf0.001").toString)
    val names = if (args.nonEmpty) args.toSeq else Seq("q103_triangles")
    val spark = Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    spark.sparkContext.setLogLevel("WARN")
    def cleanup(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      System.gc()
    }
    def run(name: String, d: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, d)
        .write.format("noop").mode("overwrite").save()
      val s = (System.nanoTime() - t0) / 1e9
      cleanup()
      s
    }
    val confs = Seq(
      "default" -> Seq(
        "spark.sql.join.preferSortMergeJoin" -> "true",
        "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold" -> "0"),
      "shj" -> Seq(
        "spark.sql.join.preferSortMergeJoin" -> "false",
        "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold" -> "134217728"))
    for ((tag, cs) <- confs) {
      cs.foreach { case (k, v) => spark.conf.set(k, v) }
      names.foreach(run(_, warmDir)) // warm-up per conf
      names.foreach { n =>
        val ts = (1 to 3).map(_ => run(n, dir))
        println(f"[tri] $tag $n: min ${ts.min}%.2f s  (${ts.map(t => f"$t%.2f").mkString(", ")})")
      }
    }
    spark.stop()
  }
}
