package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.text.Store

/** Persisted-signature-store lifecycle: build once, dedup each new drop
  * against the store without re-tokenizing the stored corpus, append the
  * survivors, stay idempotent.
  */
class StoreSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val textA = (1 to 30).map(i => s"a$i").mkString(" ")
  private val textD = (100 to 130).map(i => s"d$i").mkString(" ")

  test("dedupNewDropVsCorpus drops store-dups and intra-drop dups, appends survivors") {
    val dir = Files.createTempDirectory("sigstore").toString
    val drop1 = Seq((1L, textA), (2L, (50 to 80).map(i => s"b$i").mkString(" ")))
      .toDF("doc_id", "text")
    Store.build(drop1, dir)
    assert(Store.exists(spark, dir))
    assert(Store.load(spark, dir).count() === 2L)

    val drop2 = Seq(
      (3L, textA), // dup of stored doc 1 → dropped, store untouched
      (4L, textD), // unique → survives, appended
      (5L, textD)) // intra-drop dup of 4 (smaller id wins) → dropped
      .toDF("doc_id", "text")
    val survivors = Store.dedupNewDropVsCorpus(drop2, dir)
      .select("doc_id").as[Long].collect().toSet
    assert(survivors === Set(4L))
    assert(Store.load(spark, dir).count() === 3L,
      "exactly the survivor's signatures are appended")

    // idempotent: the same drop again — every doc now matches the store
    val again = Store.dedupNewDropVsCorpus(drop2, dir)
      .select("doc_id").as[Long].collect()
    assert(again.isEmpty)
    assert(Store.load(spark, dir).count() === 3L, "no growth on re-run")
  }

  test("stored signatures equal freshly computed ones (serve ≡ fresh)") {
    val dir = Files.createTempDirectory("sigstore2").toString
    val docs = Seq((7L, textA), (8L, textD)).toDF("doc_id", "text")
    Store.build(docs, dir)
    val stored = Store.load(spark, dir)
      .select("doc_id", "bands").as[(Long, Seq[String])].collect().toMap
    val fresh = graft.text.Dedup.prepared(docs, "doc_id", "text")
      .select("doc_id", "bands").as[(Long, Seq[String])].collect().toMap
    assert(stored === fresh)
  }

  test("dedupNewDropVsCorpus refuses a missing store") {
    val e = intercept[IllegalArgumentException] {
      Store.dedupNewDropVsCorpus(
        Seq((1L, textA)).toDF("doc_id", "text"),
        Files.createTempDirectory("nostore").toString + "/nope")
    }
    assert(e.getMessage.contains("Store.build"))
  }
}
