package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class FunctionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("topk_values equals sort-desc-take-k, across partitionings and via SQL") {
    val rows = (1 to 500).map(i => (i % 7, ((i * 131) % 997).toLong))
    for (parts <- Seq(1, 4, 16)) {
      val got = rows.toDF("k", "v").repartition(parts)
        .groupBy("k")
        .agg(call_function("topk_values", col("v"), lit(3)).as("top"))
        .as[(Int, Seq[Long])].collect().toMap
      val expected = rows.groupBy(_._1).view
        .mapValues(_.map(_._2).sorted(Ordering.Long.reverse).take(3)).toMap
      assert(got === expected, s"parts=$parts")
    }
    // group smaller than k: whole group, sorted desc
    val small = Seq((1, 5L), (1, 9L)).toDF("k", "v")
      .groupBy("k").agg(call_function("topk_values", col("v"), lit(4)).as("top"))
      .as[(Int, Seq[Long])].head()
    assert(small._2 === Seq(9L, 5L))
    // resolvable from plain SQL through the registry
    val viaSql = spark.sql(
      "SELECT topk_values(v, 2) AS t FROM VALUES (1L),(7L),(3L) AS tab(v)")
      .as[Seq[Long]].head()
    assert(viaSql === Seq(7L, 3L))
  }

  test("fault tolerance: a task that fails on its first attempt retries and the result is exact") {
    // The reference relies on Spark task retry around external tools (O17);
    // assert the record-level engine inherits it: a partition function that
    // throws on attempt 0 must be retried transparently with no loss and
    // no duplication.
    val df = spark.range(0, 1000, 1, 8).toDF("id")
    val flaky = df.as[Long].mapPartitions { it =>
      val ctx = org.apache.spark.TaskContext.get()
      if (ctx.partitionId() == 3 && ctx.attemptNumber() == 0)
        throw new RuntimeException("injected first-attempt failure")
      it
    }
    assert(flaky.count() === 1000)
    assert(flaky.reduce(_ + _) === (0L until 1000L).sum)
  }
}
