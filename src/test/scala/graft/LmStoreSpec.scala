package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.text.{Lm, LmStore}

class LmStoreSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  private def countsOf(m: Lm.Model): (Set[(String, Long)], Set[(String, Long)], Set[(String, Long)], Long) = (
    m.c3.as[(String, Long)].collect().toSet,
    m.c2.as[(String, Long)].collect().toSet,
    m.c1.as[(String, Long)].collect().toSet,
    m.tot.as[Long].head())

  test("served model == Lm.train on the union of drops (counts merge exactly)") {
    val dir = Files.createTempDirectory("graft-lmstore").toString
    val d1 = docs((1L, "a b c a b c"), (2L, "p q r"))
    val d2 = docs((3L, "a b c x y"), (4L, "q r s t"))
    LmStore.build(d1, dir, "d1")
    LmStore.append(d2, dir, "d2")
    val served = countsOf(LmStore.serveModel(spark, dir))
    val direct = countsOf(Lm.train(d1.unionByName(d2)))
    assert(served === direct)
  }

  test("scoring vs store == scoring vs the from-scratch model") {
    val dir = Files.createTempDirectory("graft-lmstore").toString
    val d1 = docs((1L, "the cat sat on the mat"), (2L, "a dog sat on a rug"))
    val d2 = docs((3L, "the dog ran to the mat"))
    LmStore.build(d1, dir, "d1")
    LmStore.append(d2, dir, "d2")
    val cand = docs((10L, "the cat ran to the rug"), (11L, "zz qq ww ee rr"))
    val a = LmStore.scoreVsStore(cand, dir).orderBy("doc_id").collect().toSeq
    val b = Lm.score(cand, Lm.train(d1.unionByName(d2)))
      .orderBy("doc_id").collect().toSeq
    assert(a === b)
  }

  test("minCount prunes AFTER the merge: a gram split 1+1 across drops survives minCount=2") {
    val dir = Files.createTempDirectory("graft-lmstore").toString
    // "p q r" appears once per drop: per-drop pruning at minCount=2 would
    // kill it; post-merge its count is 2 and it must survive
    LmStore.build(docs((1L, "p q r")), dir, "d1")
    LmStore.append(docs((2L, "p q r")), dir, "d2")
    val m = LmStore.serveModel(spark, dir, minCount = 2L)
    assert(m.c3.as[(String, Long)].collect().toSet === Set(("p q r", 2L)))
    val scored = Lm.score(docs((10L, "p q r")), m)
      .as[(Long, Long, Long, Long)].collect().head
    assert(scored === ((10L, 1L, 1000000L, 1000000L)))
  }

  test("staged lifecycle: invisible until commit, duplicate drop refused, compaction identical") {
    val dir = Files.createTempDirectory("graft-lmstore").toString
    val commit = LmStore.buildStaged(docs((1L, "a b c d")), dir, "d1")
    assert(!LmStore.exists(spark, dir))
    commit()
    assert(LmStore.drops(spark, dir) === Set("d1"))
    LmStore.append(docs((2L, "e f g h")), dir, "d2")
    assertThrows[IllegalArgumentException] {
      LmStore.appendStaged(docs((2L, "e f g h")), dir, "d2")
    }
    val before = LmStore.load(spark, dir).orderBy("drop_id", "n", "g").collect().toSeq
    LmStore.compact(spark, dir, targetFiles = 1)
    val after = LmStore.load(spark, dir).orderBy("drop_id", "n", "g").collect().toSeq
    assert(after === before)
    assert(new java.io.File(LmStore.countsPath(dir))
      .listFiles().count(_.getName.startsWith("part-")) === 1)
  }

  test("append commits with ONE rename: a staged drop is fully absent before and fully present after") {
    val dir = Files.createTempDirectory("graft-lmstore").toString
    val d1 = docs((1L, "a b c d"))
    val d2 = docs((2L, "x y z w"))
    LmStore.build(d1, dir, "d1")
    val st = LmStore.stageAppend(d2, dir, "d2")
    // the crash window: staged but uncommitted — the ledger must NOT see
    // d2 (the old per-file commit loop could leave it half-visible, and a
    // retry would then skip the re-append forever)
    assert(LmStore.drops(spark, dir) === Set("d1"))
    // serveModelWith previews the post-commit model without mutating
    val preview = countsOf(LmStore.serveModelWith(spark, dir, Some(st.counts)))
    assert(preview === countsOf(Lm.train(d1.unionByName(d2))))
    assert(LmStore.drops(spark, dir) === Set("d1"))
    st.commit()
    assert(LmStore.drops(spark, dir) === Set("d1", "d2"))
    assert(countsOf(LmStore.serveModel(spark, dir)) === preview)
    // the drop landed as its own atomically-renamed subdirectory...
    assert(new java.io.File(LmStore.countsPath(dir), "drop-d2").isDirectory)
    // ...and a second commit against the same drop dir is refused
    val rogue = Files.createTempDirectory("graft-lmstore-rogue").toString
    assertThrows[IllegalArgumentException] {
      graft.operators.StoreSwap.commitDropDir(
        spark, LmStore.countsPath(dir), rogue, "d2")
    }
  }

  test("removeDrop: post-takedown serve == never-ingested; id freed for re-append; unknown drop refused") {
    val dir = Files.createTempDirectory("graft-lmstore").toString
    val d1 = docs((1L, "a b c a b c"))
    val d2 = docs((2L, "x y z x y z"))
    val d3 = docs((3L, "a b c x y"))
    LmStore.build(d1, dir, "d1")
    LmStore.append(d2, dir, "d2")
    LmStore.append(d3, dir, "d3")
    LmStore.removeDrop(spark, dir, "d2")
    assert(LmStore.drops(spark, dir) === Set("d1", "d3"))
    assert(countsOf(LmStore.serveModel(spark, dir)) ===
      countsOf(Lm.train(d1.unionByName(d3))))
    assertThrows[IllegalArgumentException] {
      LmStore.removeDrop(spark, dir, "d2") // already gone: loud, not silent
    }
    LmStore.append(d2, dir, "d2") // takedown frees the idempotency key
    assert(countsOf(LmStore.serveModel(spark, dir)) ===
      countsOf(Lm.train(d1.unionByName(d3).unionByName(d2))))
  }
}
