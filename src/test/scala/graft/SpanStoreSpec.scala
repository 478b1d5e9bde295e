package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.text.{Queries, SpanStore}

/** Span-family store lifecycle: sum-merged gram df + min-merged keepers
  * serve detection/scrub without re-tokenizing history; takedown re-sums
  * and re-mins; the gram width is store-owned and mismatches are loud.
  */
class SpanStoreSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs(rows: (Long, String)*): DataFrame =
    rows.toDF("doc_id", "text")

  // a 10-word boilerplate sentence shared across fixtures
  private val boiler = (1 to 10).map(i => s"b$i").mkString(" ")

  test("store-served detection == repeatedSpans on the union, restricted to the drop") {
    val dir = Files.createTempDirectory("spanstore").toString
    val hist1 = docs((1L, boiler + " unique one two three"))
    val hist2 = docs((5L, "other words entirely here now"))
    SpanStore.build(hist1, dir, "d1")
    SpanStore.append(hist2, dir, "d2")
    val drop = docs((10L, "lead in tokens " + boiler + " tail"),
      (11L, "totally fresh content with no repeats at all"))
    val served = SpanStore.detectVsDrop(drop, dir)
      .as[(Long, Int, Int, Long, Long, Int)].collect().toSet
    val union = Queries.repeatedSpans(
        hist1.unionByName(hist2).unionByName(drop))
      .as[(Long, Int, Int, Long, Long, Int)].collect().toSet
      .filter(r => r._1 >= 10L)
    assert(served === union)
    assert(served.exists(_._1 == 10L), "the boilerplate span must be flagged")
    assert(!served.exists(_._1 == 11L), "fresh content has no spans")
    // a drop-INTERNAL duplicate also flags (drop df counts toward minDf)
    val intra = docs((20L, "xx " + boiler), (21L, "yy " + boiler))
    val intraSpans = SpanStore.detectVsDrop(intra, dir)
      .select("doc_id").as[Long].collect().toSet
    assert(intraSpans === Set(20L, 21L))
  }

  test("store-served scrub == scrubRepeatedSpans on the union, restricted to the drop") {
    val dir = Files.createTempDirectory("spanstore-sc").toString
    val hist = docs((1L, boiler + " unique history tail"))
    SpanStore.build(hist, dir, "d1")
    val drop = docs((10L, "intro " + boiler + " outro"), (11L, "short"))
    val served = SpanStore.scrubVsDrop(drop, dir)
      .as[(Long, Int, Long, String)].collect().toSet
    val union = Queries.scrubRepeatedSpans(hist.unionByName(drop))
      .as[(Long, Int, Long, String)].collect().toSet
      .filter(_._1 >= 10L)
    assert(served === union)
    val d10 = served.find(_._1 == 10L).get
    assert(d10._3 === 10L, "the pasted boilerplate must scrub token-wise")
    assert(d10._4 === "intro outro")
    assert(served.find(_._1 == 11L).get._4 === "short",
      "sub-k docs pass through untouched")
  }

  test("lifecycle: staged invisible, atomic subdir append, takedown re-sums, k is store-owned") {
    val dir = Files.createTempDirectory("spanstore-lc").toString
    val commit = SpanStore.buildStaged(docs((1L, boiler)), dir, "d1")
    assert(!SpanStore.exists(spark, dir))
    commit()
    assert(SpanStore.drops(spark, dir) === Set("d1"))
    assert(SpanStore.storedK(spark, dir) === 5)
    // append lands as one atomically-renamed subdirectory
    SpanStore.append(docs((2L, boiler + " more words here")), dir, "d2")
    assert(new java.io.File(SpanStore.gramsPath(dir), "drop-d2").isDirectory)
    // duplicate drop refused (sum-merge would double-count df)
    assertThrows[IllegalArgumentException] {
      SpanStore.append(docs((3L, "zz")), dir, "d2")
    }
    // the probe's boilerplate is flagged with df summed across drops + drop
    val got = SpanStore.detectVsDrop(docs((9L, "aa " + boiler + " zz")), dir)
      .as[(Long, Int, Int, Long, Long, Int)].collect()
    assert(got.length === 1 && got.head._5 === 3L,
      s"max_df must merge both drops plus the probe, got ${got.toSeq}")
    // takedown: removing d2 deflates df exactly; double-removal is loud
    SpanStore.removeDrop(spark, dir, "d2")
    val after = SpanStore.detectVsDrop(docs((9L, "aa " + boiler + " zz")), dir)
      .as[(Long, Int, Int, Long, Long, Int)].collect()
    assert(after.length === 1 && after.head._5 === 2L)
    assertThrows[IllegalArgumentException] {
      SpanStore.removeDrop(spark, dir, "d2")
    }
    // compaction: contents identical, one file
    val before = SpanStore.load(spark, dir)
      .orderBy("drop_id", "gram_key").collect().toSeq
    SpanStore.compact(spark, dir, targetFiles = 1)
    assert(SpanStore.load(spark, dir)
      .orderBy("drop_id", "gram_key").collect().toSeq === before)
    assert(new java.io.File(SpanStore.gramsPath(dir))
      .listFiles().count(_.getName.startsWith("part-")) === 1)
  }

  test("mixed gram widths are corrupt and loud; k >= 2 enforced") {
    val dir = Files.createTempDirectory("spanstore-k").toString
    SpanStore.build(docs((1L, boiler)), dir, "d1", k = 3)
    assert(SpanStore.storedK(spark, dir) === 3)
    // simulate corruption: hand-plant a k=5 partial next to the k=3 table
    SpanStore.partials(docs((2L, boiler)), "bad", k = 5)
      .write.mode("append").parquet(SpanStore.gramsPath(dir))
    val e = intercept[IllegalArgumentException] { SpanStore.storedK(spark, dir) }
    assert(e.getMessage.contains("mixed gram widths"))
    assertThrows[IllegalArgumentException] {
      SpanStore.build(docs((1L, boiler)), Files.createTempDirectory("s").toString,
        "d1", k = 1)
    }
  }
}
