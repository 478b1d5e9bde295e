package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Sessions

/** One-off q186-scaling probe (not part of the shipped surface): times
  * the BATCH spine's stages CUMULATIVELY at a given SF dir so a scale
  * run (sf0.1 vs the ScaleGen'd sf1) attributes drift to the exact
  * stage — the r16 verdict put q186 at 1.8× wall for 10× data, the
  * closest row to the 2× line, and asked for the q205 treatment
  * ([[FunnelProbe]]) before it drifts further. Stage bodies mirror
  * `Curation.spineFrames` via the same public faces `spineFunnel`
  * composes from.
  *
  * Run: `SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain
  * graft.tools.SpineScaleProbe"`, then the same with the sf1 dir.
  */
object SpineScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "3").toInt
    val spark = Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    spark.sparkContext.setLogLevel("WARN")
    import graft.text.{Curation, Dedup, Dsir, EvalSuite}

    def docs = graft.Tables(spark, dir).documents
      .repartition(spark.sparkContext.defaultParallelism)
    def corpus = docs.filter(col("doc_id") % 19 =!= 0)
    def target = docs.filter(col("doc_id") % 19 === 0)
    def bench = EvalSuite.table(spark)
      .withColumnRenamed("bench_id", "doc_id")

    def time(label: String)(mk: () => DataFrame): Unit = {
      val walls = (1 to runs).map { _ =>
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
        System.gc()
        val t0 = System.nanoTime()
        mk().write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$label%-18s min=${walls.min}%6.2f  all=${walls.map(w => f"$w%.2f").mkString(", ")}")
    }

    // cumulative prefixes of the batch spine, from the same public
    // faces spineFunnel composes (qualityKeptIds / nearDupPairs /
    // decontaminate / Dsir.score+selectTopK / spineManifest)
    def gIds = Curation.qualityKeptIds(corpus)
    def gated = corpus.join(gIds, Seq("doc_id"), "left_semi")
    def lIds(g: DataFrame) = Dedup.materialize(
      Dedup.nearDupPairs(g, eager = false)
        .select(col("doc_b").as("doc_id")).distinct())
    def cIds(d: DataFrame) = Dedup.materialize(
      Dedup.decontaminate(d, bench).select(col("doc_id")))
    def picked(cl: DataFrame) = Dedup.materialize(
      Dsir.selectTopK(Dsir.score(target, cl), 100))

    time("1:gate")(() => gIds)
    time("2:+neardup")(() => lIds(gated))
    time("3:+decontam")(() => {
      val g = gated; cIds(g.join(lIds(g), Seq("doc_id"), "left_anti"))
    })
    time("4:+dsir")(() => {
      val g = gated
      val d = g.join(lIds(g), Seq("doc_id"), "left_anti")
      picked(d.join(cIds(d), Seq("doc_id"), "left_semi"))
    })
    time("5:full-q186")(() =>
      Curation.spineManifest(corpus, target, bench))
    spark.stop()
  }
}
