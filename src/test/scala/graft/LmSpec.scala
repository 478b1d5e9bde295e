package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.text.Lm

class LmSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  private def scoreMap(trusted: (Long, String)*)(cand: (Long, String)*)
      : Map[Long, (Long, Long, Long)] =
    Lm.scoreAgainst(docs(trusted: _*), docs(cand: _*))
      .as[(Long, Long, Long, Long)].collect()
      .map { case (id, n, s, p) => id -> (n, s, p) }.toMap

  test("fixed-point stupid backoff: every backoff leg, hand-computed") {
    // train "a b c a b c": c3("a b c")=2, c2("a b")=2/("b c")=2/("c a")=1,
    // c1(a)=c1(b)=c1(c)=2, T=6
    val m = scoreMap((100L, "a b c a b c"))(
      (1L, "a b c"),   // trigram hit: (1e6*2) div 2 = 1_000_000
      (2L, "x b c"),   // bigram backoff: (4e5*c2("b c")=2) div c1(b)=2 = 400_000
      (3L, "x y c"),   // unigram backoff: (16e4*c1(c)=2) div T=6 = 53_333
      (4L, "x y z"),   // OOV floor: 1
      (5L, "a b"))     // < 3 words: unscored
    assert(m(1L) === ((1L, 1000000L, 1000000L)))
    assert(m(2L) === ((1L, 400000L, 400000L)))
    assert(m(3L) === ((1L, 53333L, 53333L)))
    assert(m(4L) === ((1L, 1L, 1L)))
    assert(m(5L) === ((0L, 0L, 0L)))
  }

  test("multi-position docs sum terms; score_ppm is the integer mean") {
    // train as above; "a b c a b c" scores 4 positions:
    //   "a b c" (x2, 1e6 each), "b c a" -> (1e6*1) div c2("b c")=2 = 500_000,
    //   "c a b" -> (1e6*1) div c2("c a")=1 = 1_000_000
    val m = scoreMap((100L, "a b c a b c"))((1L, "a b c a b c"))
    assert(m(1L) === ((4L, 3500000L, 875000L)))
  }

  test("training-corpus docs outscore scrambled ones (the quality gate)") {
    val trusted = docs(
      (100L, "the cat sat on the mat"),
      (101L, "the dog sat on the rug"),
      (102L, "a cat and a dog sat"))
    val m = Lm.score(docs(
        (1L, "the cat sat on the rug"),
        (2L, "rug the on mat cat the")), Lm.train(trusted))
      .as[(Long, Long, Long, Long)].collect()
      .map { case (id, _, _, p) => id -> p }.toMap
    assert(m(1L) > m(2L))
  }

  test("minCount prunes rare trigrams to the backoff leg (both engines' rule)") {
    val trusted = docs((100L, "a b c a b c"), (101L, "p q r"))
    // "p q r" has c3 = 1: pruned at minCount=2 -> bigram "q r" also
    // pruned (c2=1) -> unigram leg: (16e4 * c1(r)=1) div T=9 = 17_777
    val pruned = Lm.score(docs((1L, "p q r")), Lm.train(trusted, minCount = 2L))
      .as[(Long, Long, Long, Long)].collect().head
    assert(pruned === ((1L, 1L, 17777L, 17777L)))
    // unpruned: trigram hit (1e6*1) div c2("p q")=1 = 1_000_000
    val full = Lm.score(docs((1L, "p q r")), Lm.train(trusted))
      .as[(Long, Long, Long, Long)].collect().head
    assert(full === ((1L, 1L, 1000000L, 1000000L)))
  }

  test("partitioning-independent: repartitioned inputs score identically") {
    val trusted = docs((0L to 40L).map(i =>
      (100L + i, s"tok${i % 7} tok${(i + 1) % 7} tok${(i + 2) % 7} tok${i % 5}")): _*)
    val cand = docs((0L to 30L).map(i =>
      (i, s"tok${i % 5} tok${(i + 2) % 7} tok${(i + 3) % 7} novel$i")): _*)
    val a = Lm.scoreAgainst(trusted, cand).orderBy("doc_id").collect().toSeq
    val b = Lm.scoreAgainst(trusted.repartition(7), cand.repartition(5))
      .orderBy("doc_id").collect().toSeq
    assert(a === b)
  }
}
