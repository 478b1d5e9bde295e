package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Scale

class ScaleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("saltedAgg equals direct groupBy on skewed data") {
    // one hot key (90%), several cold keys
    val df = ((1 to 900).map(_ => ("hot", 1L)) ++ (1 to 100).map(i => (s"k${i % 7}", i.toLong)))
      .toDF("k", "v")
    val direct = df.groupBy("k").agg(count(lit(1)).as("n_rows"), sum("v").as("v_sum"))
      .as[(String, Long, Long)].collect().toSet
    val saltedDf = Scale.saltedAgg(df, col("k"), salts = 8, "v_sum" -> col("v"))
    // schema parity with the direct groupBy: key column keeps its name
    assert(saltedDf.columns.toSeq === Seq("k", "n_rows", "v_sum"))
    val salted = saltedDf.as[(String, Long, Long)].collect().toSet
    assert(salted === direct)
  }

  test("observe() collects dedup metrics on the same pass") {
    val df = Seq(("a", 1.0, 1L), ("a", 2.0, 2L), ("b", 3.0, 3L)).toDF("k", "q", "id")
    val (marked, obs) = Scale.observedDedupMark(df, Seq(col("k")), col("q"), Seq(col("id")))
    marked.write.format("noop").mode("overwrite").save()
    val m = obs.get
    assert(m("n_records") === 3L && m("n_duplicates") === 1L)
  }

  test("bloom filter membership and count-min heavy hitters") {
    val df = (1 to 1000).map(i => s"item$i").toDF("s")
    val bf = Scale.bloomFilter(df, "s", 1000L, 0.01)
    assert(bf.mightContain("item1") && bf.mightContain("item999"))
    assert(!(1 to 2000).forall(i => bf.mightContain(s"nope$i"))) // fpp ≪ 1

    val skewed = ((1 to 500).map(_ => "hh") ++ (1 to 100).map(i => s"x$i")).toDF("s")
    val cms = Scale.countMinSketch(skewed, "s", 0.01, 0.95, 42)
    assert(cms.estimateCount("hh") >= 500L)
  }

  test("saltedJoin is row-identical to the plain join on skewed data") {
    // one hot key carrying 90% of the fact side
    val fact = ((1 to 900).map(_ => (7, "hot")) ++ (1 to 100).map(i => (i % 5, s"x$i")))
      .toDF("k", "payload")
    val dim = (0 to 9).map(i => (i, s"d$i")).toDF("k", "name")
    val salted = Scale.saltedJoin(fact, dim, "k", salts = 4)
      .select("k", "payload", "name").as[(Int, String, String)].collect()
    val plain = fact.join(dim, Seq("k"))
      .select("k", "payload", "name").as[(Int, String, String)].collect()
    assert(salted.sorted.toSeq === plain.sorted.toSeq) // multiset equality
  }

  test("AQE skew-join splits the hot partition on the default (unsalted) path") {
    // COVERAGE O10-O12 says "AQE first, salting second" — this is the
    // evidence for the FIRST line: a plain equi join over a hot key, no
    // salting, and OptimizeSkewedJoin splits the oversized partition at
    // runtime. Thresholds are lowered to make a unit-test-sized hot
    // partition (≈4 MB vs ≈20 KB siblings) cross the same relative bars a
    // 100 TB hot partition crosses in production (factor × median AND
    // absolute threshold), then the final adaptive plan must carry the
    // skew=true marker on the join.
    val conf = spark.conf
    val keys = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes")
    // Option(...) : conf.get returns a literal null for confs whose
    // default defers to another conf (adaptive.autoBroadcastJoinThreshold)
    val saved = keys.map(k => k -> scala.util.Try(Option(conf.get(k))).toOption.flatten).toMap
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force a shuffle join
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
      val pad = "x" * 64
      val left = spark.range(0, 60000).select(
        when(col("id") < 50000, lit(0L)).otherwise(col("id") % 64).as("k"),
        concat(lit(pad), col("id").cast("string")).as("payload"))
      val right = spark.range(0, 64).select(col("id").as("k"), (col("id") * 2).as("rv"))
      val joined = left.join(right, "k")
      // execute THIS DataFrame's QueryExecution (a DataFrameWriter builds
      // its own) so its AdaptiveSparkPlan finalizes in place
      assert(joined.collect().length === 60000) // row fidelity through the split
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"final adaptive plan must show the skew-split join, got:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }

  test("bloomSemiJoin result is identical to a plain semi join") {
    val fact = (1 to 2000).map(i => (i.toLong % 97, i)).toDF("k", "v")
    val dim = (0 to 96 by 3).map(_.toLong).toDF("k")
    val q = Scale.bloomSemiJoin(fact, "k", dim, "k", 100L, 0.03)
    val bloomed = q.as[(Long, Int)].collect().toSet
    val plain = fact.join(dim, Seq("k"), "left_semi")
      .as[(Long, Int)].collect().toSet
    assert(bloomed === plain)
    assert(bloomed.nonEmpty && bloomed.size < 2000)
  }

  test("bloomSemiJoin probe is the native codegen'd expression, not a UDF") {
    // Range source (not a LocalRelation) so ConvertToLocalRelation can't
    // fold the probe away — over a real source the filter stays in the plan.
    val fact = spark.range(1, 201).select((col("id") % 97).as("k"), col("id").as("v"))
    val dim = (0 to 96 by 3).map(_.toLong).toDF("k")
    val plan = Scale.bloomSemiJoin(fact, "k", dim, "k", 100L, 0.03)
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"),
      s"prefilter must plan BloomFilterMightContain, got:\n$plan")
    assert(!plan.contains("UDF"),
      s"no ScalaUDF may survive in the bloom probe path, got:\n$plan")
  }

  test("heavyHitters is exact and partitioning-independent past the MG decrement path") {
    // 301 distinct cold singletons (well past cap = 2k = 6, forcing
    // constant decrement churn) + two planted heavy keys; n = 1202,
    // k = 3 → threshold ⌈n/3⌉ = 401: "hot" (500) and "warm" (401, the
    // exact boundary) qualify, every singleton must not
    val rows = (1 to 500).map(_ => "hot") ++ (1 to 401).map(_ => "warm") ++
      (1 to 301).map(i => s"cold$i")
    val expected = Set(("hot", 500L), ("warm", 401L))
    for (parts <- Seq(1, 7)) {
      val df = rows.toDF("item").repartition(parts)
      val got = Scale.heavyHitters(df, "item", k = 3)
        .as[(String, Long)].collect().toSet
      assert(got === expected, s"at $parts partitions")
    }
  }

  test("heavyHitters boundary: count*k == n qualifies, one less does not; nulls excluded") {
    val df = ((1 to 5).map(_ => Option("a")) ++ (1 to 4).map(_ => Option("b")) ++
      (1 to 11).map(_ => Option("c")) ++ Seq(Option.empty[String]))
      .toDF("item")
    // non-null n = 20, k = 4 → threshold 5: a (5) in, b (4) out
    val got = Scale.heavyHitters(df, "item", k = 4)
      .as[(String, Long)].collect().toSet
    assert(got === Set(("a", 5L), ("c", 11L)))
  }
}
