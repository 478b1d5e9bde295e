package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.text.Dsir

/** DSIR-slot importance scoring on planted corpora: exact hand-computed
  * ratios, target-likeness separation, the unseen-bucket default, and
  * the broadcast shape of the scoring join (the ratio model must never
  * be the shuffled side — it is ≤ B rows by construction).
  */
class DsirSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs(rows: (Long, String)*): DataFrame =
    rows.toDF("doc_id", "text")

  /** JVM-side replica of [[Dsir.bucket]] for hand-math setup checks. */
  private def bucketOf(s: String, buckets: Int = Dsir.DefaultBuckets): Long = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(
      s.getBytes("UTF-8"))
    val hex = d.take(4).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex, 16) % buckets
  }

  test("hand-computed ratios and mean scores, exact in ppm") {
    // target = {"a b"}: features a, b, "a b" (each once)
    // raw    = {"a b", "c c"}: a:1, b:1, "a b":1, c:2, "c c":1
    // r(a) = r(b) = r("a b") = (1+1)*1e6 // (1+1) = 1000000
    // r(c) = 1e6 // 3 = 333333 ; r("c c") = 1e6 // 2 = 500000
    // doc1 = 3000000 // 3 = 1000000 ; doc2 = 1166666 // 3 = 388888
    val feats = Seq("a", "b", "a b", "c", "c c")
    assert(feats.map(bucketOf(_)).distinct.size === feats.size,
      "hand-math premise: no bucket collisions among the planted n-grams")
    val target = docs((100L, "a b"))
    val raw = docs((1L, "a b"), (2L, "c c"))
    val got = Dsir.score(target, raw)
      .as[(Long, Long, Long)].collect().toSet
    assert(got === Set((1L, 3L, 1000000L), (2L, 3L, 388888L)))
  }

  test("selection: target-like raw docs outrank junk, deterministically") {
    val target = docs(
      (100L, "solar panel grid storage"),
      (101L, "wind turbine grid power"))
    val raw = docs(
      (1L, "solar grid power storage"),
      (2L, "lorem ipsum dolor sit amet"),
      (3L, "wind power storage panel"),
      (4L, "qq ww ee rr tt yy"))
    val picked = Dsir.selectTopK(Dsir.score(target, raw), 2)
      .select(col("doc_id")).as[Long].collect().toSet
    assert(picked === Set(1L, 3L))
  }

  test("a one-word doc contributes its unigram only; empty bigram leg") {
    val got = Dsir.score(docs((100L, "x")), docs((1L, "x")))
      .as[(Long, Long, Long)].collect().toSet
    // raw profile x:1; r(x) = (1+1)*1e6 // 2 = 1000000; 1 feature.
    assert(got === Set((1L, 1L, 1000000L)))
  }

  test("scoring a doc with buckets unseen by either corpus uses the smoothed default") {
    val ratio = Dsir.ratios(Dsir.profile(docs((100L, "a"))),
      Dsir.profile(docs((1L, "a"))))
    val got = Dsir.scoreAgainst(docs((2L, "zzz-unseen")), ratio)
      .as[(Long, Long, Long)].collect().toSet
    assert(got === Set((2L, 1L, 1000000L)))
  }

  test("partition invariance: scores identical under any input layout") {
    val target = docs((100L, "solar panel grid"), (101L, "wind grid power"))
    val raw = docs((0 until 40).map(i =>
      (i.toLong, if (i % 3 == 0) "solar grid power" else "noise junk filler")): _*)
    val a = Dsir.score(target, raw).orderBy("doc_id")
      .as[(Long, Long, Long)].collect().toSeq
    val b = Dsir.score(target.repartition(7), raw.repartition(13))
      .orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq
    assert(a === b)
  }

  test("plan: the ratio model joins broadcast; selection is TakeOrdered, not a global sort") {
    val target = docs((100L, "a b c"))
    val raw = docs((1L, "a b"), (2L, "c d"))
    val scored = Dsir.score(target, raw)
    val p = scored.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      s"ratio table must broadcast, got:\n$p")
    val sel = Dsir.selectTopK(scored, 1)
    val ps = sel.queryExecution.executedPlan.toString
    assert(ps.contains("TakeOrderedAndProject"),
      s"fixed-k selection must be a bounded heap, got:\n$ps")
  }
}
