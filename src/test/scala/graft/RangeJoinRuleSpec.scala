package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RangeJoinRuleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def withRule[T](f: => T): T = {
    spark.conf.set("spark.graft.bucketRangeJoin", "true")
    try f finally spark.conf.set("spark.graft.bucketRangeJoin", "false")
  }

  private val openers = Seq(
    (1L, 1L, 1000L), (2L, 1L, 5000L), (3L, 2L, 100L)).toDF("oid", "k", "o_us")
  private val probes = Seq(
    (10L, 1L, 1100L), (11L, 1L, 1300L), (12L, 1L, 1301L),
    (13L, 2L, 150L), (14L, 2L, 5000L), (15L, 3L, 1100L))
    .toDF("pid", "pk", "p_us")

  private def keyed = openers.join(probes,
    col("k") === col("pk") && col("p_us") > col("o_us") && col("p_us") <= col("o_us") + 300L)

  private def keyless = openers.join(probes,
    col("p_us") > col("o_us") && col("p_us") <= col("o_us") + 300L)

  test("rewritten range join is row-identical to the naive join") {
    val naiveKeyed = keyed.select("oid", "pid").as[(Long, Long)].collect().toSet
    val naiveKeyless = keyless.select("oid", "pid").as[(Long, Long)].collect().toSet
    withRule {
      assert(keyed.select("oid", "pid").as[(Long, Long)].collect().toSet === naiveKeyed)
      assert(keyless.select("oid", "pid").as[(Long, Long)].collect().toSet === naiveKeyless)
    }
    assert(naiveKeyed === Set((1L, 10L), (1L, 11L), (3L, 13L)))
    assert(naiveKeyless === Set((1L, 10L), (1L, 11L), (1L, 15L), (3L, 13L)))
  }

  test("rule turns the keyless θ-join from nested-loop into an equi join") {
    val naivePlan = keyless.queryExecution.executedPlan.toString
    assert(naivePlan.contains("BroadcastNestedLoopJoin"))
    withRule {
      val plan = keyless.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"),
        s"expected equi join after rewrite, got:\n$plan")
      assert(plan.contains("Generate") || plan.contains("explode"))
    }
  }

  test("rule leaves non-matching joins untouched") {
    withRule {
      // unbounded predicate — no rewrite possible
      val unbounded = openers.join(probes, col("p_us") > col("o_us"))
      assert(!unbounded.queryExecution.optimizedPlan.toString.contains("__graft_bucket"))
      assert(unbounded.count() === 11L) // sanity: it still runs
    }
  }
}
