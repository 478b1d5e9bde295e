package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.text.GramStore

/** Gram-ownership store lifecycle: min-merge partials serve
  * first-occurrence novelty without re-tokenizing history; takedown
  * re-mins — sole-owner grams become novel again, ties fall back.
  */
class GramStoreSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs(rows: (Long, String)*): DataFrame =
    rows.toDF("doc_id", "text")

  private def novelty(drop: DataFrame, dir: String): Map[Long, (Long, Long, Long)] =
    GramStore.noveltyOfDrop(drop, dir)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap

  test("store-served novelty == q126 on the union; drop-internal firsts count") {
    val dir = Files.createTempDirectory("gramstore").toString
    GramStore.build(docs((1L, "a b c d e")), dir, "d1")   // owns "a b c".."c d e"
    GramStore.append(docs((2L, "x y z w")), dir, "d2")
    // doc 10: "a b c" seen (doc 1 owns), "p q r"/"q r s" novel, and doc
    // 11 repeats 10's grams — 10 is the drop-internal first, 11 is not
    val drop = docs((10L, "a b c p q r s"), (11L, "p q r s"))
    val got = novelty(drop, dir)
    // doc 10 shingles: "a b c","b c p","c p q","p q r","q r s" — only
    // "a b c" is owned by history → 4/5 novel
    assert(got(10L) === ((5L, 4L, 800L)))
    // doc 11: "p q r","q r s" both first-written by doc 10 → 0 novel
    assert(got(11L) === ((2L, 0L, 0L)))
    // scoring is read-only: the store still has exactly two drops
    assert(GramStore.drops(spark, dir) === Set("d1", "d2"))
  }

  test("removeDrop: sole-owner grams become novel again, tied grams fall back; lifecycle is loud") {
    val dir = Files.createTempDirectory("gramstore-td").toString
    GramStore.build(docs((1L, "a b c d")), dir, "d1")     // owns "a b c","b c d"
    GramStore.append(docs((2L, "a b c"), (3L, "m n o")), dir, "d2")
    // "a b c" tied between drops (min doc 1); "m n o" solely drop-2's
    GramStore.removeDrop(spark, dir, "d2")
    val got = novelty(docs((10L, "m n o"), (11L, "a b c")), dir)
    assert(got(10L) === ((1L, 1L, 1000L)),
      "a gram owned only by the removed drop is unseen again")
    assert(got(11L) === ((1L, 0L, 0L)),
      "a tied gram falls back to the surviving drop's ownership")
    assertThrows[IllegalArgumentException] {
      GramStore.removeDrop(spark, dir, "d2")
    }
    assertThrows[IllegalArgumentException] {
      GramStore.append(docs((9L, "q q q")), dir, "d1") // duplicate id refused
    }
    // the freed id can re-enter
    GramStore.append(docs((2L, "a b c"), (3L, "m n o")), dir, "d2")
    assert(novelty(docs((10L, "m n o")), dir)(10L) === ((1L, 0L, 0L)))
  }

  test("a crashed swap is loud: live-missing-with-marker never reads as 'no store'") {
    val dir = Files.createTempDirectory("gramstore-crash").toString
    GramStore.build(docs((1L, "a b c d")), dir, "d1")
    // simulate a crash inside removeDrop's two-rename window: the live
    // dir moved aside, the staged copy never renamed in
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(
      new org.apache.hadoop.fs.Path(GramStore.gramsPath(dir)),
      new org.apache.hadoop.fs.Path(s"$dir/_takedown-old")))
    val e = intercept[IllegalStateException] { GramStore.exists(spark, dir) }
    assert(e.getMessage.contains("crashed swap"),
      "an exists-gated bootstrap must not silently abandon the ledger")
    // recovery: rename back, the store serves again
    assert(fs.rename(new org.apache.hadoop.fs.Path(s"$dir/_takedown-old"),
      new org.apache.hadoop.fs.Path(GramStore.gramsPath(dir))))
    assert(GramStore.exists(spark, dir) &&
      GramStore.drops(spark, dir) === Set("d1"))
  }

  test("mixed layout: subdir appends + flat takedown rewrites + re-appends all serve as one table") {
    val dir = Files.createTempDirectory("gramstore-mixed").toString
    GramStore.build(docs((1L, "a b c d")), dir, "d1")      // flat root files
    GramStore.append(docs((5L, "x y z w")), dir, "d2")     // drop-d2/ subdir
    assert(new java.io.File(GramStore.gramsPath(dir), "drop-d2").isDirectory,
      "an append must land as ONE atomically-renamed subdirectory")
    GramStore.removeDrop(spark, dir, "d1")                 // flattening rewrite
    GramStore.append(docs((7L, "p q r s")), dir, "d3")     // subdir over flat
    assert(GramStore.drops(spark, dir) === Set("d2", "d3"))
    // serve over the mixed layout == from-scratch over the union corpus
    val got = novelty(docs((10L, "x y z"), (11L, "a b c")), dir)
    assert(got(10L) === ((1L, 0L, 0L)), "drop-d2's subdir rows serve")
    assert(got(11L) === ((1L, 1L, 1000L)), "the removed drop's grams are gone")
  }

  test("staged build invisible until commit; compaction identical") {
    val dir = Files.createTempDirectory("gramstore-st").toString
    val commit = GramStore.buildStaged(docs((1L, "a b c d")), dir, "d1")
    assert(!GramStore.exists(spark, dir))
    commit()
    GramStore.append(docs((2L, "x y z w")), dir, "d2")
    val before = GramStore.load(spark, dir)
      .orderBy("drop_id", "gk").collect().toSeq
    GramStore.compact(spark, dir, targetFiles = 1)
    assert(GramStore.load(spark, dir)
      .orderBy("drop_id", "gk").collect().toSeq === before)
    assert(new java.io.File(GramStore.gramsPath(dir))
      .listFiles().count(_.getName.startsWith("part-")) === 1)
  }
}
