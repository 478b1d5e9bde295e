package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Sessions

/** One-off spine-cost probe (not part of the shipped surface): times
  * q186's six-stage selection under different gate/cache shapes to
  * attribute the r14 spine regression (r13 window spine 5.3 s →
  * histogram-gate spine 11-16 s at sf0.1) to the exact subtree.
  * Variants share every stage except the quality gate's plumbing.
  */
object SpineProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "3").toInt
    val spark = Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    spark.sparkContext.setLogLevel("WARN")
    import graft.text.{Curation, Dedup, Dsir}

    def corpus = graft.Tables(spark, dir).documents
    def target = corpus.filter(col("doc_id") % 19 === 0)
    def bench = graft.text.EvalSuite.table(spark)
      .withColumnRenamed("bench_id", "doc_id")

    def scoredOf(c: DataFrame) = c
      .withColumn("ws", graft.text.TextOps.words(col("text")))
      .select(col("doc_id"), col("lang"),
        size(array_distinct(col("ws"))).as("nd"), size(col("ws")).as("nt"))
      .withColumn("score_ppt", expr("(CAST(nd AS BIGINT) * 1000) div nt"))

    // gate variants: each returns the gated corpus frame
    def gateHistKeptCache(c: DataFrame) = {
      val kept = Curation.quartileGateLabels(scoredOf(c))
        .filter(col("kept") === 1).select(col("doc_id")).cache()
      c.join(kept, Seq("doc_id"), "left_semi")
    }
    def gateHistKeptCkpt(c: DataFrame) = {
      val kept = Curation.quartileGateLabels(scoredOf(c))
        .filter(col("kept") === 1).select(col("doc_id")).localCheckpoint(true)
      c.join(kept, Seq("doc_id"), "left_semi")
    }
    def gateHistGatedCache(c: DataFrame) = {
      val kept = Curation.quartileGateLabels(scoredOf(c))
        .filter(col("kept") === 1).select(col("doc_id"))
      c.join(kept, Seq("doc_id"), "left_semi").cache()
    }
    def gateWindow(c: DataFrame) = {
      val scored = scoredOf(c)
      val w = Window.partitionBy(col("lang"))
        .orderBy(col("score_ppt").asc, col("doc_id").asc)
      val kept = scored
        .withColumn("__rk", row_number().over(w).cast("long"))
        .withColumn("__n", count(lit(1)).over(Window.partitionBy(col("lang"))))
        .filter(col("__rk") > col("__n") / 4).select(col("doc_id"))
      c.join(kept, Seq("doc_id"), "left_semi")
    }

    // the rest of the spine, verbatim from Curation.spineFrames
    def tail(gated: DataFrame): DataFrame = {
      val losers = Dedup.nearDupPairs(gated, eager = false)
        .select(col("doc_b").as("doc_id")).distinct()
      val deduped = gated.join(losers, Seq("doc_id"), "left_anti")
      val clean = Dedup.decontaminate(deduped, bench).cache()
      val picked = Dsir.selectTopK(Dsir.score(target, clean), 100)
      // packAndLabel is private; approximate its cost with the selected join
      clean.join(broadcast(picked.select(col("doc_id"))), Seq("doc_id"))
    }

    def time(label: String)(mk: () => DataFrame): Unit = {
      val walls = (1 to runs).map { _ =>
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
        val t0 = System.nanoTime()
        mk().select(count(lit(1))).collect()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$label%-22s min=${walls.min}%6.2f  all=${walls.map(w => f"$w%.2f").mkString(", ")}")
    }

    time("gate-only:hist")(() => gateHistKeptCache(corpus))
    time("gate-only:window")(() => gateWindow(corpus))
    time("spine:hist-keptCache")(() => tail(gateHistKeptCache(corpus)))
    time("spine:hist-keptCkpt")(() => tail(gateHistKeptCkpt(corpus)))
    time("spine:hist-gatedCache")(() => tail(gateHistGatedCache(corpus)))
    time("spine:window-r13")(() => tail(gateWindow(corpus)))
    spark.stop()
  }
}
