package graft.tools

import graft.{Sessions, SparkEntry}

/** In-JVM A/B probe (r18): times queries under a CODE-VARIANT system
  * property toggled between runs, interleaved O/N/O/N so host drift —
  * which invalidated every cross-JVM comparison this round (the q01/q02
  * control floors read 1.5× over their pinned clean-host values in the
  * afternoon phase) — cancels out of the comparison.
  *
  * Usage: sbt "runMain graft.tools.AbBench graft.abPack q186_curation_spine ..."
  * The property is set to "new" for the N legs and cleared for the O
  * legs; each leg is min-of-3 with the QBench cleanup protocol.
  */
object AbBench {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: AbBench <sysprop> [fixedProp=value ...] <query>...")
    val prop = args.head
    val (fixed, names) = args.drop(1).toSeq.partition(_.contains("="))
    fixed.foreach { kv =>
      val Array(k, v) = kv.split("=", 2); sys.props(k) = v
    }
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR",
      java.nio.file.Paths.get(dir).resolveSibling("sf0.001").toString)
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
    // set the literal leg name: opt-in toggles match "new", opt-out
    // toggles (defaults already live) match "old"
    def setVariant(v: String): Unit = sys.props(prop) = v
    names.foreach { n =>
      // warm both variants (JIT both code paths + fixtures)
      for (v <- Seq("old", "new")) {
        setVariant(v)
        if (new java.io.File(warmDir).exists()) run(n, warmDir)
        run(n, dir)
      }
      // interleave: two min-of-3 legs per variant
      val legs = for (v <- Seq("old", "new", "old", "new")) yield {
        setVariant(v)
        (v, (1 to 3).map(_ => run(n, dir)).min)
      }
      val o = legs.filter(_._1 == "old").map(_._2).min
      val nw = legs.filter(_._1 == "new").map(_._2).min
      println(f"[ab] $prop $n: old=$o%.2f new=$nw%.2f  (${legs.map(l => f"${l._1}=${l._2}%.2f").mkString(", ")})")
    }
    spark.stop()
  }
}
