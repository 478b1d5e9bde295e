package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.text.{ChunkStore, Dedup}

/** Chunk-frequency store lifecycle: sum-merged chunk df serves the CDC
  * verbatim-share census without re-chunking history; the chunking
  * config is store-owned and mismatches are loud.
  */
class ChunkStoreSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs(rows: (Long, String)*): DataFrame =
    rows.toDF("doc_id", "text")

  private val body = (1 to 80).map(i => s"w$i").mkString(" ")

  test("store-served census == cdcDupStats on the union, restricted to the drop") {
    val dir = Files.createTempDirectory("chunkstore").toString
    val hist = docs((1L, body), (2L, (300 to 340).map(i => s"z$i").mkString(" ")))
    ChunkStore.build(hist, dir, "d1")
    val drop = docs((10L, "prefix inserted " + body),
      (11L, (400 to 440).map(i => s"q$i").mkString(" ")))
    val served = ChunkStore.dupStatsVsDrop(drop, dir)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    val union = Dedup.cdcDupStats(hist.unionByName(drop))
      .as[(Long, Long, Long, Long, Long)].collect().toSet
      .filter(_._1 >= 10L)
    assert(served === union)
    val d10 = served.find(_._1 == 10L).get
    assert(d10._5 >= 60L, s"the shared body must be flagged chunk-wise, got $d10")
    assert(served.find(_._1 == 11L).get._4 === 0L, "fresh content shares nothing")
  }

  test("lifecycle: atomic subdir append, config validation, takedown re-sums") {
    val dir = Files.createTempDirectory("chunkstore-lc").toString
    ChunkStore.build(docs((1L, body)), dir, "d1", k = 3, divisor = 8)
    assert(ChunkStore.storedCfg(spark, dir) === ((3, 8)))
    ChunkStore.append(docs((5L, body + " extra tail words")), dir, "d2")
    assert(new java.io.File(s"$dir/chunks", "drop-d2").isDirectory)
    assertThrows[IllegalArgumentException] {
      ChunkStore.append(docs((6L, "x")), dir, "d2") // duplicate id
    }
    // with both drops stored, a probe repeating the body shares chunks
    val before = ChunkStore.dupStatsVsDrop(docs((9L, body)), dir)
      .as[(Long, Long, Long, Long, Long)].collect().head
    assert(before._4 > 0L)
    // hand-plant a mismatched config row: loud, not silently novel
    ChunkStore.partials(docs((7L, body)), "bad", k = 5, divisor = 16)
      .write.mode("append").parquet(s"$dir/chunks")
    val e = intercept[IllegalArgumentException] { ChunkStore.storedCfg(spark, dir) }
    assert(e.getMessage.contains("mixed configs"))
  }

  test("takedown of every drop leaves a loud store, never a silently-novel serve") {
    val dir = Files.createTempDirectory("chunkstore-td").toString
    ChunkStore.build(docs((1L, body)), dir, "d1")
    ChunkStore.removeDrop(spark, dir, "d1")
    assertThrows[IllegalArgumentException] {
      ChunkStore.removeDrop(spark, dir, "d1") // double removal
    }
    // the chunking config died with the last drop — serving would have
    // to GUESS k/divisor, and a wrong guess reports everything novel,
    // so the drained store refuses instead
    val e = intercept[IllegalArgumentException] {
      ChunkStore.dupStatsVsDrop(docs((9L, body)), dir)
    }
    assert(e.getMessage.contains("no drops"))
  }
}
