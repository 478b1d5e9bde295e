package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Audit, ManifestStore}

/** Manifest-store lifecycle: per-drop certificate partials merge to the
  * exact whole-corpus manifest (xor/sum/count disciplines), divergence
  * between replicas localizes to the drop, takedown re-merges, and
  * mismatched fingerprint configs are loud.
  */
class ManifestStoreSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs(rows: (Long, String)*): DataFrame =
    rows.toDF("doc_id", "text")

  private def rows(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  test("served manifest == Audit.manifest on the union of drops") {
    val dir = Files.createTempDirectory("manstore").toString
    val d1 = docs((1L, "aa"), (2L, "bb"), (3L, "cc"))
    val d2 = docs((10L, "xx"), (11L, "yy"))
    ManifestStore.build(d1, dir, "d1", "doc_id", Seq("text"), shards = 4)
    ManifestStore.append(d2, dir, "d2", "doc_id", Seq("text"), shards = 4)
    assert(rows(ManifestStore.serve(spark, dir)) ===
      rows(Audit.manifest(d1.unionByName(d2), "doc_id", Seq("text"), 4)))
    // the drop landed as its own atomically-renamed subdirectory
    assert(new java.io.File(ManifestStore.rowsPath(dir), "drop-d2").isDirectory)
  }

  test("compare: identical replicas certify empty; a diverged drop is named") {
    val dirA = Files.createTempDirectory("manstore-a").toString
    val dirB = Files.createTempDirectory("manstore-b").toString
    val d1 = docs((1L, "aa"), (2L, "bb"))
    val d2 = docs((10L, "xx"))
    ManifestStore.build(d1, dirA, "d1", "doc_id", Seq("text"), 4)
    ManifestStore.append(d2, dirA, "d2", "doc_id", Seq("text"), 4)
    ManifestStore.build(d1, dirB, "d1", "doc_id", Seq("text"), 4)
    // replica B's d2 is CORRUPTED: one row's text differs
    ManifestStore.append(docs((10L, "xx-corrupted")), dirB, "d2",
      "doc_id", Seq("text"), 4)
    val diff = ManifestStore.compare(spark, dirA, dirB)
    val dropsNamed = diff.select("drop_id").as[String].collect().toSet
    assert(dropsNamed === Set("d2"),
      "the divergence must localize to the corrupted drop only")
    // identical replicas → empty certificate
    assert(ManifestStore.compare(spark, dirA, dirA).isEmpty)
    // a drop present on one side only also surfaces
    ManifestStore.append(docs((20L, "zz")), dirA, "d3",
      "doc_id", Seq("text"), 4)
    assert(ManifestStore.compare(spark, dirA, dirB)
      .select("drop_id").as[String].collect().toSet === Set("d2", "d3"))
    // replicas fingerprinted under DIFFERENT specs must refuse loudly —
    // a row-by-row diff of incompatible fingerprints is all noise
    val dirC = Files.createTempDirectory("manstore-c").toString
    ManifestStore.build(d1, dirC, "d1", "doc_id", Seq("text"), 8)
    val e = intercept[IllegalArgumentException] {
      ManifestStore.compare(spark, dirA, dirC)
    }
    assert(e.getMessage.contains("spec mismatch"), e.getMessage)
  }

  test("takedown re-merges exactly; config mismatches and double appends are loud") {
    val dir = Files.createTempDirectory("manstore-td").toString
    val d1 = docs((1L, "aa"), (2L, "bb"))
    val d2 = docs((10L, "xx"))
    ManifestStore.build(d1, dir, "d1", "doc_id", Seq("text"), 4)
    ManifestStore.append(d2, dir, "d2", "doc_id", Seq("text"), 4)
    ManifestStore.removeDrop(spark, dir, "d2")
    assert(rows(ManifestStore.serve(spark, dir)) ===
      rows(Audit.manifest(d1, "doc_id", Seq("text"), 4)),
      "post-takedown serve must equal never-ingested (xor self-inverse)")
    assertThrows[IllegalArgumentException] {
      ManifestStore.removeDrop(spark, dir, "d2")
    }
    assertThrows[IllegalArgumentException] { // duplicate id
      ManifestStore.append(d1, dir, "d1", "doc_id", Seq("text"), 4)
    }
    assertThrows[IllegalArgumentException] { // different shard count
      ManifestStore.append(d2, dir, "d2", "doc_id", Seq("text"), 8)
    }
    assertThrows[IllegalArgumentException] { // different column set
      ManifestStore.append(d2, dir, "d2", "doc_id", Seq.empty, 4)
    }
    // the freed id re-enters under the matching spec
    ManifestStore.append(d2, dir, "d2", "doc_id", Seq("text"), 4)
    assert(ManifestStore.drops(spark, dir) === Set("d1", "d2"))
  }
}
