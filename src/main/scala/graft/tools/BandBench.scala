package graft.tools

import org.apache.spark.sql.functions._

import graft.Sessions
import graft.text.Store

/** Prints the signature-store band-shape cost frontier COVERAGE.md cites
  * (not part of the library surface): for each candidate [[Store.SigShape]],
  * build the corpus split into a throwaway store, then time the q106-shaped
  * read-only serve (drop = doc_id % 3 == 0) and report its decisions — so
  * the derived-shape rule's build-cost/serve-cost/recall trade is one
  * table. Usage:
  *   SPARK_GRAFT_SF_DIR=/tmp/sf1 sbt "runMain graft.tools.BandBench"
  */
object BandBench {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "3").toInt
    val spark = Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables(spark, dir).documents
    val corpus = docs.filter(col("doc_id") % 3 =!= 0)
    val drop = docs.filter(col("doc_id") % 3 === 0)
    val n = corpus.count()
    println(s"corpus n=$n (derivedShape -> ${Store.derivedShape(n)})")
    val shapes = Seq(Store.LegacyShape, Store.SigShape(54, 9, 6),
      Store.SigShape(136, 17, 8))
    for (shape <- shapes) {
      val storeDir = java.nio.file.Files
        .createTempDirectory("graft-bandbench").toString
      val tb0 = System.nanoTime()
      Store.build(corpus, storeDir, shape = Some(shape))
      val buildSec = (System.nanoTime() - tb0) / 1e9
      def once(): (Double, Long) = {
        val t0 = System.nanoTime()
        val survivors =
          Store.dedupNewDropVsCorpusReadOnly(drop, storeDir).count()
        ((System.nanoTime() - t0) / 1e9, survivors)
      }
      val all = (1 to runs).map(_ => once())
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      println(f"shape=$shape build=$buildSec%7.2f " +
        f"serve=${all.map(_._1).min}%7.2f survivors=${all.head._2}")
      import scala.jdk.CollectionConverters._
      val p = java.nio.file.Paths.get(storeDir)
      java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverseIterator
        .foreach(q => java.nio.file.Files.deleteIfExists(q))
    }

    // --- planted sub-threshold families: the regime where the wide
    // shapes EARN their band-join overhead. The ScaleGen corpus has zero
    // cross-copy overlap, so false candidates (band-collide, fail
    // verify) grow linearly and never bind; real web corpora carry
    // template/boilerplate families at j BELOW the 0.7 verify point
    // whose collisions cost n²·mass·b·j^r. Plant exactly that: families
    // of `fam` docs sharing a 60-token core with 45 unique tokens each
    // (pairwise j ≈ 0.45 — under threshold, so the verified OUTPUT is
    // empty and every candidate is pure waste). Report candidates +
    // serve time per shape: the wide shapes should cut both.
    import spark.implicits._
    val fam = 120
    val nFam = 300
    val planted = spark.range(0, fam.toLong * nFam).select(
      col("id").as("doc_id"),
      concat_ws(" ",
        // family core: 60 tokens shared by the whole family
        transform(sequence(lit(0), lit(59)),
          i => concat(lit("c"), (col("id") % nFam).cast("string"),
            lit("_"), i.cast("string"))),
        // per-doc salt: 45 unique tokens
        transform(sequence(lit(0), lit(44)),
          i => concat(lit("u"), col("id").cast("string"),
            lit("_"), i.cast("string")))).as("text"))
      .repartition(32)
    val pc = planted.cache(); pc.count()
    for (shape <- shapes) {
      // signatures CACHED before timing: in the store path the corpus
      // side is pre-signed parquet, so the recurring cost is the
      // candidate join + verify, not the one-time signing (reported
      // separately as sign=)
      val ts0 = System.nanoTime()
      val prep = graft.text.Dedup.prepared(pc, "doc_id", "text",
        numHashes = shape.numHashes, numBands = shape.numBands,
        rowsPerBand = shape.rowsPerBand).cache()
      prep.count()
      val signSec = (System.nanoTime() - ts0) / 1e9
      // time the candidate join AND the exact verify it feeds — the
      // false-candidate waste IS the verify of pairs that fail it
      def once(): (Double, Long, Long) = {
        val t0 = System.nanoTime()
        val cands = graft.text.Dedup.candidatePairs(prep)
        val sh = prep.select(col("doc_id"), col("sh"))
        val verified = cands
          .join(sh.toDF("doc_a", "sha"), "doc_a")
          .join(sh.toDF("doc_b", "shb"), "doc_b")
          .select(size(array_intersect(col("sha"), col("shb"))).as("i"),
            (size(col("sha")) + size(col("shb"))).as("ss"))
          .filter(col("i") * 10 >= (col("ss") - col("i")) * lit(7))
          .count()
        val nc = cands.count()
        ((System.nanoTime() - t0) / 1e9, nc, verified)
      }
      val all = (1 to runs).map(_ => once())
      prep.unpersist()
      println(f"planted(j≈0.45, ${fam}×$nFam) shape=$shape " +
        f"cands=${all.head._2}%8d dups=${all.head._3} " +
        f"sign=$signSec%6.2f candverify=${all.map(_._1).min}%7.2f")
    }
    pc.unpersist()
    spark.stop()
  }
}
