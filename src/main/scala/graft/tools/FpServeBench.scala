package graft.tools

import org.apache.spark.sql.functions._

import graft.Sessions

/** FpStore serve-cost evidence (the r16 persisted-df-counter claim): a
  * FIXED drop served against a 1× history store and a 10× history store
  * (the ScaleGen'd sf1 replica contains sf0.1's rows verbatim, so the
  * sf0.1 drop is a constant-size drop for both). r15's serve
  * re-aggregated the full history fps table per question — cost grew
  * with history regardless of drop size; with the counters the df guard
  * is a drop-scale lookup and history contributes one broadcast-filtered
  * columnar scan (the pair leg), so serve cost should track the DROP,
  * with only the scan term growing in history.
  *
  * Run: `sbt "runMain graft.tools.FpServeBench /root/testdata/sf0.1 /tmp/sf1"`
  */
object FpServeBench {
  def main(args: Array[String]): Unit = {
    val small = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val big = if (args.length > 1) args(1) else "/tmp/sf1"
    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "3").toInt
    val spark = Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    spark.sparkContext.setLogLevel("WARN")
    import graft.multimodal.Binary
    import graft.text.{FpStore, Store}

    def history(dir: String) = Binary.withPayload(
      graft.Tables(spark, dir).documents.filter(col("doc_id") % 3 =!= 0))
    // the FIXED drop: sf0.1's %3==0 slice in both serves
    def drop = Binary.withPayload(
      graft.Tables(spark, small).documents.filter(col("doc_id") % 3 === 0))

    def buildStore(dir: String): String = {
      val sd = java.nio.file.Files
        .createTempDirectory("fp-servebench").toString
      FpStore.build(history(dir), sd, contentCol = "payload",
        universe = Store.Universe.PayloadBytes)
      sd
    }
    def cleanup(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      System.gc()
    }
    def time(label: String, sd: String): Unit = {
      val walls = (1 to runs).map { _ =>
        cleanup()
        val t0 = System.nanoTime()
        FpStore.pairsVsStoreReadOnly(drop, sd, contentCol = "payload")
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      val rows = spark.read.parquet(s"${FpStore.commitsPath(sd)}/*/fps").count()
      println(f"$label%-14s historyRows=$rows%9d  serve min=${walls.min}%6.2f  " +
        s"all=${walls.map(w => f"$w%.2f").mkString(", ")}")
    }

    val a = buildStore(small); cleanup()
    val b = buildStore(big); cleanup()
    time("history-1x", a)
    time("history-10x", b)
    spark.stop()
  }
}
