package graft

import org.apache.spark.sql.functions._

/** Throwaway profiling harness (not part of the library surface). */
object Prof {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local(32)
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    def docs(d: String) = graft.Tables(spark, d).documents
      .repartition(spark.sparkContext.defaultParallelism)
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // Warm-up at sf0.001 (JIT/codegen), mirroring Bench.
    time("warmup q48 sf0.001")(noop(graft.text.Dedup.nearDupClusters(docs("/root/testdata/sf0.001"))))

    for (i <- 1 to 2) {
      // Stage-level breakdown of q48 at target SF.
      time(s"run$i pairs-only")(noop(graft.text.Dedup.nearDupPairs(docs(dir))))
      time(s"run$i full q48")(noop(graft.text.Dedup.nearDupClusters(docs(dir))))
      System.gc()
    }

    // Instrumented copy of nearDupClusters to find where the time goes.
    val d = docs(dir)
    val pairs = time("nearDupPairs construct")(graft.text.Dedup.nearDupPairs(d).select(col("doc_a"), col("doc_b")))
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .unionByName(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .persist()
    val nEdges = time("edges materialize (count)")(edges.count())
    println(s"[prof] n_edges = $nEdges")
    var labels = time("labels init checkpoint")(
      edges.select(col("src").as("node")).distinct().withColumn("label", col("node")).localCheckpoint(true))
    for (i <- 1 to 6) {
      val nbrMin = edges
        .join(labels.select(col("node").as("dst"), col("label").as("dl")), Seq("dst"))
        .groupBy(col("src")).agg(min(col("dl")).as("nl"))
      labels = labels
        .join(nbrMin.select(col("src").as("node"), col("nl")), Seq("node"), "left")
        .select(col("node"), least(col("label"), coalesce(col("nl"), col("label"))).as("label"))
      if (i % 3 == 0 || i == 6) labels = time(s"round $i checkpoint")(labels.localCheckpoint(true))
    }
    time("final write")(noop(labels))
    spark.stop()
  }
}
