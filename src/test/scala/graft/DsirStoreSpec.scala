package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.text.{Dsir, DsirStore}

/** DSIR profile-store lifecycle: raw-pool counts sum-merge across drops
  * so the served importance scores are bit-identical to profiling the
  * union from scratch; takedown is exact unlearning of the selection
  * model (count subtraction); config (bucket count) is stamped and
  * inherited; a drained store refuses to serve.
  */
class DsirStoreSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs(rows: (Long, String)*): DataFrame =
    rows.toDF("doc_id", "text")

  // target talks about "alpha beta"; raw history is mixed
  private val target = docs(
    (100L, "alpha beta alpha"),
    (101L, "beta alpha beta"))
  private val rawA = docs(
    (1L, "alpha noise noise"),
    (2L, "noise junk junk filler"))
  private val rawB = docs(
    (3L, "beta alpha filler"),
    (4L, "junk junk junk"))
  private val probe = docs(
    (10L, "alpha beta alpha beta"), // target-like: should score high
    (11L, "junk noise filler junk")) // junk-like: should score low

  private def scores(dir: String): Set[(Long, Long, Long)] =
    DsirStore.scoreVsDrop(target, probe, dir)
      .as[(Long, Long, Long)].collect().toSet

  test("store-served scores == from-scratch on the union; signal separates") {
    val dir = Files.createTempDirectory("dsirstore").toString
    DsirStore.build(rawA, dir, "d1")
    DsirStore.append(rawB, dir, "d2")
    assert(new java.io.File(s"$dir/dsirprofile", "drop-d2").isDirectory,
      "appends commit as one atomic drop subdir")
    val scratch = Dsir.score(target,
      rawA.unionByName(rawB).unionByName(probe))
      .filter(col("doc_id") >= 10L)
      .as[(Long, Long, Long)].collect().toSet
    assert(scores(dir) === scratch)
    val byDoc = scores(dir).map(r => r._1 -> r._3).toMap
    assert(byDoc(10L) > byDoc(11L),
      "the target-like probe doc must out-score the junk-like one")
  }

  test("takedown is exact unlearning; duplicate drop refused") {
    val dir = Files.createTempDirectory("dsirstore-td").toString
    DsirStore.build(rawA, dir, "d1")
    DsirStore.append(rawB, dir, "d2")
    val before = scores(dir)
    // flooding the raw pool with target-like text craters the ratio of
    // exactly the target features — doc 10's score must drop
    val junk = docs((1000L, Seq.fill(20)("alpha beta").mkString(" ")))
    DsirStore.append(junk, dir, "x")
    val poisoned = scores(dir)
    assert(poisoned !== before, "the junk drop must be visible pre-takedown")
    assert(poisoned.map(r => r._1 -> r._3).toMap.apply(10L) <
      before.map(r => r._1 -> r._3).toMap.apply(10L),
      "target-feature flooding must lower the target-like doc's score")
    DsirStore.removeDrop(spark, dir, "x")
    assert(scores(dir) === before,
      "takedown must restore the never-ingested selection model exactly")
    assertThrows[IllegalArgumentException] {
      DsirStore.append(rawB, dir, "d1") // stored id: would double-count
    }
  }

  test("bucket config is stamped, inherited, and validated") {
    val dir = Files.createTempDirectory("dsirstore-cfg").toString
    DsirStore.build(rawA, dir, "d1", buckets = 1024)
    assert(DsirStore.storedBuckets(spark, dir) === 1024)
    // append has no buckets parameter: it inherits the store's, so a
    // mismatched feature space cannot be introduced
    DsirStore.append(rawB, dir, "d2")
    assert(DsirStore.load(spark, dir).select(col("cfg")).distinct()
      .as[String].collect().toSeq === Seq("1024"))
    // the store profile matches a from-scratch profile at the stored cfg
    val served = DsirStore.serveProfile(spark, dir)
      .as[(Long, Long)].collect().toSet
    val scratch = Dsir.profile(rawA.unionByName(rawB), buckets = 1024)
      .as[(Long, Long)].collect().toSet
    assert(served === scratch)
  }

  test("drained store refuses to serve; double removal is loud") {
    val dir = Files.createTempDirectory("dsirstore-dr").toString
    DsirStore.build(rawA, dir, "d1")
    DsirStore.removeDrop(spark, dir, "d1")
    assertThrows[IllegalArgumentException] {
      DsirStore.removeDrop(spark, dir, "d1")
    }
    val e = intercept[IllegalArgumentException] {
      DsirStore.scoreVsDrop(target, probe, dir)
    }
    assert(e.getMessage.contains("no drops"))
  }
}
