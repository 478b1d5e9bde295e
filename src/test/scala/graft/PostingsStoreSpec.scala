package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.text.{PostingsStore, Retrieval}

/** Inverted-index store lifecycle: union-merged postings serve BM25 over
  * history ∪ drop without re-tokenizing history; takedown by row deletion
  * is the exact merge inverse; a drained store refuses.
  */
class PostingsStoreSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs(rows: (Long, String)*): DataFrame =
    rows.toDF("doc_id", "text")

  private val filler = (1 to 20).map(_ => "common words here").mkString(" ")

  test("store-served BM25 == from-scratch on the union corpus") {
    val dir = Files.createTempDirectory("postingsstore").toString
    val hist = docs((1L, s"needle $filler"), (2L, filler), (3L, s"rare doc $filler"))
    PostingsStore.build(hist, dir, "d1")
    PostingsStore.append(docs((4L, s"needle needle $filler")), dir, "d2")
    assert(new java.io.File(s"$dir/postings", "drop-d2").isDirectory,
      "appends commit as one atomic drop subdir")
    val drop = docs((10L, s"needle probe $filler"), (11L, filler))
    val probe = col("doc_id") >= 10L
    val served = PostingsStore.bm25TopKVsDrop(drop, dir, probe, k = 3)
      .as[(Long, Long, Long)].collect().toSet
    val scratch = Retrieval.bm25TopKFor(
      hist.unionByName(docs((4L, s"needle needle $filler"))).unionByName(drop),
      probe, k = 3).as[(Long, Long, Long)].collect().toSet
    assert(served === scratch)
    // the needle query must surface the history's needle docs — proof the
    // store side actually contributes candidates
    val q10 = served.filter(_._1 == 10L).map(_._2)
    assert(q10.contains(4L) || q10.contains(1L))
  }

  test("takedown restores never-ingested exactly; duplicate drop refused") {
    val dir = Files.createTempDirectory("postingsstore-td").toString
    val hist = docs((1L, s"needle $filler"), (2L, filler))
    PostingsStore.build(hist, dir, "d1")
    val drop = docs((10L, s"needle probe $filler"))
    val probe = col("doc_id") === 10L
    val before = PostingsStore.bm25TopKVsDrop(drop, dir, probe)
      .as[(Long, Long, Long)].collect().toSet
    // junk drop doubles the corpus content under disjoint ids: df, N, Σdl
    // and the candidate set all shift
    PostingsStore.append(
      hist.withColumn("doc_id", col("doc_id") + lit(1000L)), dir, "junk")
    val inflated = PostingsStore.bm25TopKVsDrop(drop, dir, probe)
      .as[(Long, Long, Long)].collect().toSet
    assert(inflated !== before, "the junk drop must be visible pre-takedown")
    PostingsStore.removeDrop(spark, dir, "junk")
    val after = PostingsStore.bm25TopKVsDrop(drop, dir, probe)
      .as[(Long, Long, Long)].collect().toSet
    assert(after === before, "takedown must serve exactly as never-ingested")
    assertThrows[IllegalArgumentException] {
      PostingsStore.append(docs((99L, "x")), dir, "d1") // stored id
    }
  }

  test("stats sidecar: complete stores serve from partials, legacy/mixed fall back") {
    val dir = Files.createTempDirectory("postingsstore-stats").toString
    val hist = docs((1L, s"needle $filler"), (2L, filler))
    PostingsStore.build(hist, dir, "d1")
    // the sidecar stats equal the from-postings aggregates exactly
    val Some((df, tot)) = PostingsStore.serveStats(spark, dir)
    val post = PostingsStore.servePostings(spark, dir)
    assert(df.as[(String, Long)].collect().toSet ===
      Retrieval.docFreq(post).as[(String, Long)].collect().toSet)
    assert(tot.as[(Long, Long)].collect().head ===
      Retrieval.corpusTotals(post).as[(Long, Long)].collect().head)
    // a pre-sidecar drop (postings rows only, hand-written in the legacy
    // layout) makes the store MIXED: stats must refuse (None) and the
    // serve must fall back to postings aggregation — same answer as a
    // from-scratch union
    Retrieval.postings(docs((5L, s"legacy needle doc $filler")))
      .select(lit("legacy").as("drop_id"), col("doc_id"), col("term"),
        col("tf"), col("dl"))
      .write.parquet(s"$dir/postings/drop-legacy")
    assert(PostingsStore.serveStats(spark, dir).isEmpty,
      "a drop without sidecar rows must disable the stats path")
    val drop = docs((10L, s"needle probe $filler"))
    val probe = col("doc_id") === 10L
    val served = PostingsStore.bm25TopKVsDrop(drop, dir, probe)
      .as[(Long, Long, Long)].collect().toSet
    val scratch = Retrieval.bm25TopKFor(
      hist.unionByName(docs((5L, s"legacy needle doc $filler")))
        .unionByName(drop), probe).as[(Long, Long, Long)].collect().toSet
    assert(served === scratch)
  }

  test("drained store refuses to serve; double removal is loud") {
    val dir = Files.createTempDirectory("postingsstore-dr").toString
    PostingsStore.build(docs((1L, filler)), dir, "d1")
    PostingsStore.removeDrop(spark, dir, "d1")
    assertThrows[IllegalArgumentException] {
      PostingsStore.removeDrop(spark, dir, "d1")
    }
    val e = intercept[IllegalArgumentException] {
      PostingsStore.bm25TopKVsDrop(docs((9L, filler)), dir, col("doc_id") === 9L)
    }
    assert(e.getMessage.contains("no drops"))
  }
}
