package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.text.Classify

/** Centroid/NB classifier semantics on planted corpora — the synthetic
  * fixture shares one vocabulary across classes (the oracle gates
  * exactness there), so learnability is pinned here with separable and
  * noisy-but-separable planted signal.
  */
class ClassifySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs(rows: (Long, String, String)*): DataFrame =
    rows.toDF("doc_id", "lang", "text")

  test("hand-computed weights: Laplace smoothing in exact integer ppb") {
    // class A: terms {x:2, y:1} tot 3; class B: {y:2} tot 2; V = 2.
    // w(A,x) = (2+1)*1e9/(3+2) = 600000000; w(A,y) = (1+1)*1e9/5 = 400000000
    // w(B,y) = (2+1)*1e9/(2+2) = 750000000
    val train = docs((1L, "A", "x x y"), (2L, "B", "y y"))
    val w = Classify.trainWeights(train)
      .as[(String, String, Long)].collect().toSet
    assert(w === Set(("A", "x", 600000000L), ("A", "y", 400000000L),
      ("B", "y", 750000000L)))
  }

  test("separable classes: 100% held-out accuracy; unseen terms don't crash") {
    val train = docs(
      (1L, "red", "apple cherry tomato apple"),
      (2L, "red", "cherry cherry apple brick"),
      (3L, "blue", "sky ocean berry sky"),
      (4L, "blue", "ocean ocean sky jeans"))
    val test_ = docs(
      (10L, "red", "apple brick tomato"),
      (11L, "blue", "sky jeans ocean"),
      (12L, "blue", "berry ocean ocean zzz-neverseen"))
    val out = Classify.predict(train, test_)
      .as[(Long, String, String, Long)].collect()
    assert(out.length === 3)
    assert(out.forall(r => r._2 === r._3),
      s"every held-out doc must classify correctly, got ${out.toSeq}")
  }

  test("tf drives the argmax: a doc dominated by the other class's terms flips") {
    val train = docs(
      (1L, "red", "apple apple apple"),
      (2L, "blue", "ocean ocean ocean"))
    val mixed = docs((10L, "red", "apple ocean ocean ocean"))
    val out = Classify.predict(train, mixed)
      .as[(Long, String, String, Long)].collect().head
    assert(out._3 === "blue", s"3:1 ocean majority must predict blue, got $out")
  }

  test("deterministic tie-break: equal scores pick the lexicographically first class") {
    val train = docs((1L, "a", "x"), (2L, "b", "x"))
    // both classes have identical profiles — score ties exactly
    val out = Classify.predict(train, docs((10L, "b", "x x")))
      .as[(Long, String, String, Long)].collect().head
    assert(out._3 === "a")
  }

  test("evaluate: hand-computed confusion feed to exact-ppm precision/recall") {
    // aa: 2 true, predicted aa twice + once for a bb doc → n_pred 3, tp 2
    // bb: 2 true, 1 predicted (the other leaked to aa) → tp 1
    // cc: predicted once, never true — precision 0/1, recall 0 by CASE
    val preds = Seq(
      (1L, "aa", "aa"), (2L, "aa", "aa"),
      (3L, "bb", "aa"), (4L, "bb", "bb"),
      (5L, "aa", "cc"))
      .toDF("doc_id", "true_label", "pred_label")
    val out = Classify.evaluate(preds)
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    assert(out("aa") === ((3L, 3L, 2L, 666666L, 666666L)))
    assert(out("bb") === ((2L, 1L, 1L, 1000000L, 500000L)))
    assert(out("cc") === ((0L, 1L, 0L, 0L, 0L)))
  }
}
