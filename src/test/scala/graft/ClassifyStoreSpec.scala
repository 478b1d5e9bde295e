package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.text.{Classify, ClassifyStore}

/** Classifier count-store lifecycle: counts sum-merge across drops so the
  * served model is bit-identical to from-scratch training on the union;
  * takedown is EXACT UNLEARNING (count subtraction restores the model that
  * never saw the drop); a drained store refuses to predict.
  */
class ClassifyStoreSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs(rows: (Long, String, String)*): DataFrame =
    rows.toDF("doc_id", "lang", "text")

  // two cleanly separable classes plus shared filler vocabulary
  private val trainA = docs(
    (1L, "aa", "alpha alpha beta shared shared"),
    (2L, "aa", "alpha gamma shared"),
    (3L, "bb", "omega omega psi shared shared"))
  private val trainB = docs(
    (4L, "bb", "omega psi psi shared"),
    (5L, "aa", "beta gamma alpha shared"))
  private val heldOut = docs(
    (10L, "aa", "alpha beta shared"),
    (11L, "bb", "omega psi shared"))

  private def predictions(storeDir: String): Set[(Long, String, String, Long)] =
    ClassifyStore.predictVsStore(heldOut, storeDir)
      .as[(Long, String, String, Long)].collect().toSet

  test("store-served model == from-scratch training on the union") {
    val dir = Files.createTempDirectory("classifystore").toString
    ClassifyStore.build(trainA, dir, "d1")
    ClassifyStore.append(trainB, dir, "d2")
    assert(new java.io.File(s"$dir/classcounts", "drop-d2").isDirectory,
      "appends commit as one atomic drop subdir")
    val scratch = Classify.predict(trainA.unionByName(trainB), heldOut)
      .as[(Long, String, String, Long)].collect().toSet
    assert(predictions(dir) === scratch)
    // the planted signal separates: each held-out doc lands in its class
    val byDoc = predictions(dir).map(r => r._1 -> r._3).toMap
    assert(byDoc(10L) === "aa" && byDoc(11L) === "bb")
  }

  test("takedown is exact unlearning; duplicate drop refused") {
    val dir = Files.createTempDirectory("classifystore-td").toString
    ClassifyStore.build(trainA, dir, "d1")
    ClassifyStore.append(trainB, dir, "d2")
    val before = predictions(dir)
    // a phantom class trained on doc 10's text repeated 10× concentrates
    // its smoothed profile hard enough to out-score class aa on doc 10
    // (tot(xx) stays small while its counts on exactly doc 10's terms grow)
    val junk = docs((1010L, "xx",
      Seq.fill(10)("alpha beta shared").mkString(" ")))
    ClassifyStore.append(junk, dir, "x")
    val poisoned = predictions(dir)
    assert(poisoned !== before, "the junk drop must be visible pre-takedown")
    assert(poisoned.find(_._1 == 10L).get._3 === "xx",
      "the phantom class must win doc 10 — proof the drop trained in")
    ClassifyStore.removeDrop(spark, dir, "x")
    assert(predictions(dir) === before,
      "takedown must restore the never-ingested model exactly")
    assertThrows[IllegalArgumentException] {
      ClassifyStore.append(trainB, dir, "d1") // stored id: would double-count
    }
  }

  test("drained store refuses to predict; double removal is loud") {
    val dir = Files.createTempDirectory("classifystore-dr").toString
    ClassifyStore.build(trainA, dir, "d1")
    ClassifyStore.removeDrop(spark, dir, "d1")
    assertThrows[IllegalArgumentException] {
      ClassifyStore.removeDrop(spark, dir, "d1")
    }
    val e = intercept[IllegalArgumentException] {
      ClassifyStore.predictVsStore(heldOut, dir)
    }
    assert(e.getMessage.contains("no drops"))
  }
}
