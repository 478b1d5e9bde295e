package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Sessions

/** One-off q205-cost probe (not part of the shipped surface): times the
  * incremental drop funnel's stages CUMULATIVELY at a given SF dir so a
  * scale run (sf0.1 vs the ScaleGen'd sf1) attributes super-linear drift
  * to the exact stage — r15's verdict flagged q205 at 2.4× wall for 10×
  * data while the batch funnel (q190, same census) held 1.6×, so the
  * excess must live in the incremental chain: the signature-store serve,
  * the decontaminate, the DSIR store serve, or the funnel tail. Stage
  * bodies mirror `Curation.incrementalSpineFunnel` line for line (the
  * fixtures are the q205 gate's own).
  *
  * Run: `SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain
  * graft.tools.FunnelProbe"`, then the same with the sf1 dir.
  */
object FunnelProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "3").toInt
    val spark = Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    spark.sparkContext.setLogLevel("WARN")
    import graft.text.{Curation, Dedup, Dsir, DsirStore, EvalSuite, Queries, Store}

    // the q205 fixtures (built once, untimed — the serve paths are the
    // question, not the builds)
    val sig = Queries.storeFixture(spark, dir)
    val prof = Queries.spineDsirFixture(spark, dir)
    def docs = graft.Tables(spark, dir).documents
      .repartition(spark.sparkContext.defaultParallelism)
    def drop = docs.filter(col("doc_id") % 3 === 0)
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

    // cumulative prefixes of incrementalSpineFunnel, verbatim
    def gIds = Curation.qualityKeptIds(drop)
    def gated = drop.join(gIds, Seq("doc_id"), "left_semi")
    def dIds(g: DataFrame) = Dedup.materialize(
      Store.dedupNewDropVsCorpusReadOnly(g, sig).select(col("doc_id")))
    def cIds(dd: DataFrame) = Dedup.materialize(
      Dedup.decontaminate(dd, bench).select(col("doc_id")))
    def picked(cl: DataFrame) = Dedup.materialize(Dsir.selectTopK(
      DsirStore.scoreVsDrop(target, cl, prof, eager = false), 50))

    time("1:gate")(() => gIds)
    time("2:+dedup-serve")(() => dIds(gated))
    time("3:+decontam")(() => {
      val g = gated; cIds(g.join(dIds(g), Seq("doc_id"), "left_semi"))
    })
    time("4:+dsir-serve")(() => {
      val g = gated
      val dd = g.join(dIds(g), Seq("doc_id"), "left_semi")
      picked(dd.join(cIds(dd), Seq("doc_id"), "left_semi"))
    })
    time("5:full-q205")(() =>
      Curation.incrementalSpineFunnel(drop, target, bench, sig, prof, k = 50))
    // the batch reference point (q190's shape at the same SF)
    time("6:batch-q190")(() =>
      Curation.spineFunnel(docs.filter(col("doc_id") % 19 =!= 0),
        target, bench))
    spark.stop()
  }
}
