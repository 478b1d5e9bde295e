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

  /** The window form quartileGateLabels replaces — the semantic oracle. */
  private def windowGateLabels(scored: org.apache.spark.sql.DataFrame) = {
    import org.apache.spark.sql.expressions.Window
    val wRank = Window.partitionBy(col("lang"))
      .orderBy(col("score_ppt").asc, col("doc_id").asc)
    scored
      .withColumn("rnk", row_number().over(wRank).cast("long"))
      .withColumn("grp_n", count(lit(1)).over(Window.partitionBy(col("lang"))))
      .select(col("doc_id"), col("lang"), col("score_ppt"),
        when(col("rnk") * 4 > col("grp_n"), 1).otherwise(0).as("kept"))
  }

  private def assertGateEquiv(scored: org.apache.spark.sql.DataFrame): Unit = {
    val got = Curation.quartileGateLabels(scored)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getInt(3)))
      .toSet
    val want = windowGateLabels(scored)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getInt(3)))
      .toSet
    assert(got === want)
  }

  test("histogram-cut quality gate ≡ per-lang window on the skew/boundary edge cases") {
    import spark.implicits._
    // en: 1000 docs spread across many doc_id>>16 buckets, 7 tied score
    //     classes — t=250 lands inside a class AND inside a bucket;
    // zz: one degenerate all-same-score class (the whole lang is the
    //     straddling class, the id-bucket refinement does all the work);
    // ex: cum == t exactly at a class edge (no straddling class at all);
    // t0/t1/t2/t3: n < 4 keeps everything; n4: exactly one drops;
    // ng: negative doc_ids — shiftright is an arithmetic (floor) shift,
    //     so bucket order must still follow doc_id order across zero.
    val rows =
      (0 until 1000).map(i => (i.toLong * 40000L, "en", (i % 7).toLong)) ++
        (0 until 100).map(i => (3000000L + i * 777L, "zz", 500L)) ++
        Seq(0L -> 1L, 1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 3L, 5L -> 3L,
          6L -> 4L, 7L -> 4L).map { case (id, sc) => (4000000L + id, "ex", sc) } ++
        Seq((5000000L, "t0", 9L)) ++
        Seq((5100000L, "t1", 9L), (5100001L, "t1", 8L)) ++
        (0 until 3).map(i => (5200000L + i, "t2", 9L - i)) ++
        (0 until 4).map(i => (5300000L + i, "n4", 9L - (i % 2))) ++
        Seq((-70000L, "ng", 5L), (-1L, "ng", 5L), (1L, "ng", 5L),
          (70000L, "ng", 5L))
    assertGateEquiv(rows.toDF("doc_id", "lang", "score_ppt"))
    // and on the real corpus projection (q123's scored frame)
    val d = Tables(spark, dir).documents
      .withColumn("ws", graft.text.TextOps.words(col("text")))
      .select(col("doc_id"), col("lang"),
        size(array_distinct(col("ws"))).as("nd"), size(col("ws")).as("nt"))
      .withColumn("score_ppt", expr("(CAST(nd AS BIGINT) * 1000) div nt"))
      .select(col("doc_id"), col("lang"), col("score_ppt"))
    assertGateEquiv(d)
  }
}
