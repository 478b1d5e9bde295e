package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.text.{Curation, EvalSuite}

/** The LLM curation spine (q186): composition semantics and artifact
  * determinism. The VALUE gate is the DuckDB oracle (six stage oracles
  * as one CTE chain); these tests pin the properties the oracle can't
  * state — fused-plan ≡ barriered-stages, packing invariants, and the
  * written artifact certifying itself.
  */
class CurationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val dir = "/root/testdata/sf0.001"

  private def inputs = {
    val d = Tables(spark, dir).documents
      .repartition(spark.sparkContext.defaultParallelism)
    (d.filter(col("doc_id") % 19 =!= 0),
      d.filter(col("doc_id") % 19 === 0),
      EvalSuite.table(spark).withColumnRenamed("bench_id", "doc_id"))
  }

  test("spine selection: k rows, distinct docs, greedy-pack invariants hold end-to-end") {
    val (corpus, target, bench) = inputs
    val sel = Curation.spineSelection(corpus, target, bench, k = 100).collect()
    assert(sel.length === 100)
    assert(sel.map(_.getLong(0)).distinct.length === 100, "doc_ids distinct")
    sel.foreach { r =>
      val (n, off) = (r.getAs[Int]("n_tokens"), r.getAs[Long]("tok_offset"))
      assert(off == 0 || off + n <= 256,
        s"doc ${r.getLong(0)}: a non-first doc must fit its sequence ($r)")
    }
    // per (shard, seq) the packed docs' token counts sum within budget
    // unless the sequence is a single oversize doc
    sel.groupBy(r => (r.getAs[Int]("pack_shard"), r.getAs[Long]("seq_id")))
      .foreach { case ((sh, seq), rows) =>
        val total = rows.map(_.getAs[Int]("n_tokens").toLong).sum
        assert(total <= 256 || rows.length == 1,
          s"shard $sh seq $seq overflows with ${rows.length} docs / $total tokens")
      }
  }

  test("one fused lazy plan ≡ localCheckpoint barriers at every stage boundary") {
    val (corpus, target, bench) = inputs
    val fused = Curation.spineSelection(corpus, target, bench)
      .collect().map(_.toSeq).toSet
    val barriered = Curation
      .spineSelection(corpus, target, bench,
        barrier = _.localCheckpoint(eager = true))
      .collect().map(_.toSeq).toSet
    assert(fused === barriered,
      "fusing the six stages into one plan must change nothing but the barrier count")
  }

  test("the manifest certifies the WRITTEN artifact: parquet round-trip preserves it") {
    val (corpus, target, bench) = inputs
    val tmp = java.nio.file.Files.createTempDirectory("graft-spine").toString
    Curation.spineSelection(corpus, target, bench)
      .write.mode("overwrite").parquet(s"$tmp/selection")
    val fromDisk = graft.operators.Audit.manifest(
        spark.read.parquet(s"$tmp/selection"), key = "doc_id",
        cols = Seq("lang", "score_ppm", "pack_shard", "seq_id", "tok_offset",
          "n_tokens"))
      .collect().map(_.toSeq).toSet
    val lazyOne = Curation.spineManifest(corpus, target, bench)
      .collect().map(_.toSeq).toSet
    assert(fromDisk === lazyOne)
  }
}
