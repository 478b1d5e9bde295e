package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Relational

class RelationalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("markDuplicates flags all but the best row, deterministically under permutation") {
    val rows = Seq(
      ("k1", 10.0, 1L), ("k1", 30.0, 2L), ("k1", 30.0, 3L), // tie on quality → min id survives
      ("k2", 5.0, 4L))
    val base = rows.toDF("k", "q", "id")
    def run(df: org.apache.spark.sql.DataFrame) =
      Relational.markDuplicates(df, Seq(col("k")), col("q"), Seq(col("id")))
        .select("id", "is_dup").as[(Long, Int)].collect().toMap
    val a = run(base)
    val b = run(base.orderBy(rand(seed = 7))) // permuted input
    assert(a === b)
    assert(a === Map(1L -> 1, 2L -> 0, 3L -> 1, 4L -> 0))
  }

  test("topK plans TakeOrderedAndProject (no global sort) and is correct") {
    val df = (1 to 100).map(i => (i, 100 - i)).toDF("a", "b")
    val top = Relational.topK(df, 3, col("b").desc, col("a").asc)
    assert(top.queryExecution.executedPlan.toString.contains("TakeOrderedAndProject"))
    assert(top.select("a").as[Int].collect().toSeq === Seq(1, 2, 3))
  }

  test("topKPerKey equals the window row_number formulation and plans the custom exec") {
    import org.apache.spark.sql.expressions.Window
    val df = (1 to 500).map(i => (i % 23, i, (i * 37) % 101)).toDF("k", "id", "v")
    val ours = Relational.topKPerKey(
      df, keys = Seq(col("k")), order = Seq(col("v").desc, col("id")), k = 4)
    // the physical plan is the engine's own partial/final operator pair
    val plan = ours.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKeyPartial") && plan.contains("TopKPerKeyFinal"))
    assert(!plan.toLowerCase.contains("sort "), s"no sort expected:\n$plan")
    val windowed = df
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("k")).orderBy(col("v").desc, col("id"))))
      .filter(col("rn") <= 4).drop("rn")
    val a = ours.as[(Int, Int, Int)].collect().toSet
    val b = windowed.as[(Int, Int, Int)].collect().toSet
    assert(a === b)
    assert(a.size === 23 * 4)
  }

  test("topKPerKey stays correct when the partial-phase key cap forces pass-through") {
    spark.conf.set("spark.graft.topk.maxPartialKeys", "2")
    try {
      val df = (1 to 300).map(i => (i % 29, i)).toDF("k", "v").repartition(4)
      val got = Relational.topKPerKey(df, Seq(col("k")), Seq(col("v").desc), k = 2)
        .as[(Int, Int)].collect().toSet
      val expected = (1 to 300).map(i => (i % 29, i))
        .groupBy(_._1).values.flatMap(_.sortBy(-_._2).take(2)).toSet
      assert(got === expected)
    } finally spark.conf.unset("spark.graft.topk.maxPartialKeys")
  }

  test("topKPerKey: k larger than group size emits whole groups; empty keys = global top-k") {
    val df = Seq((1, 10), (1, 20), (2, 30)).toDF("k", "v")
    val all = Relational.topKPerKey(df, Seq(col("k")), Seq(col("v")), k = 5)
    assert(all.count() === 3)
    val global = Relational.topKPerKey(df, Seq.empty, Seq(col("v").desc), k = 2)
    assert(global.select("v").as[Int].collect().toSet === Set(30, 20))
  }

  test("broadcastJoin plans a BroadcastHashJoin") {
    val fact = (1 to 1000).map(i => (i % 10, i)).toDF("k", "v")
    val dim = (0 until 10).map(i => (i, s"d$i")).toDF("k", "name")
    val j = Relational.broadcastJoin(fact, dim, Seq("k"))
    assert(j.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
    assert(j.count() === 1000)
  }

  test("prunedScan pushes predicate and projection to the parquet scan") {
    val dir = java.nio.file.Files.createTempDirectory("prune").toString
    (1 to 100).map(i => (i, i * 2, s"s$i")).toDF("k", "v", "s")
      .write.mode("overwrite").parquet(dir)
    val scanned = Relational.prunedScan(
      spark.read.parquet(dir), col("k"), 42, Seq(col("v")))
    val formatted = scanned.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(formatted.contains("PushedFilters") && formatted.contains("IsNotNull(k)"))
    assert(!formatted.contains("ReadSchema: struct<k:int,v:int,s:string>"),
      "projection should prune column s from the scan")
    assert(scanned.as[Int].collect().toSeq === Seq(84))
  }

  test("sortedUnion equals union-then-sort semantics") {
    val a = Seq((3, "a"), (1, "a")).toDF("k", "t")
    val b = Seq((2, "b")).toDF("k", "t")
    val u = Relational.sortedUnion(Seq(a, b), col("k").asc)
    assert(u.select("k").as[Int].collect().toSeq === Seq(1, 2, 3))
  }

  test("merge associativity: sorted-union of runs is grouping-order independent") {
    val runs = Seq(
      Seq((1, "a"), (4, "a")), Seq((2, "b")), Seq((3, "c"), (5, "c"))).map(_.toDF("k", "t"))
    val expected = Relational.sortedUnion(runs, col("k").asc).collect().toSeq
    val regrouped = Relational.sortedUnion(
      Seq(Relational.sortedUnion(runs.take(2), col("k").asc), runs(2)), col("k").asc)
    assert(regrouped.collect().toSeq === expected)
  }

  test("sort stability on equal keys via explicit tie-break") {
    val df = Seq((1, "z"), (1, "a"), (0, "m")).toDF("k", "t")
    val sorted = Relational.globalSort(df, col("k").asc, col("t").asc)
      .as[(Int, String)].collect().toSeq
    assert(sorted === Seq((0, "m"), (1, "a"), (1, "z")))
  }

  test("Profile.table: per-column rows/nulls/distinct/min/max in one pass") {
    val df = Seq((1L, Option("a")), (2L, None), (3L, Option("b")), (3L, Option("a")))
      .toDF("id", "s")
    val out = graft.operators.Profile.table(df, Seq("id", "s"))
      .as[(String, Long, Long, Long, String, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(out("id") === (("id", 4L, 0L, 3L, "1", "3")))
    assert(out("s") === (("s", 4L, 1L, 2L, "a", "b")),
      "null is not counted as a distinct value and min/max skip it")
    val bad = intercept[IllegalArgumentException] {
      graft.operators.Profile.table(df, Seq("not a column!"))
    }
    assert(bad.getMessage.contains("plain identifiers"))
  }

  test("Profile.tableApprox: exact columns match Profile.table; sketch within tolerance") {
    import graft.operators.Profile
    val df = Tables(spark, "/root/testdata/sf0.001").orders
      .withColumn("o_totalprice_cents",
        expr("CAST(floor(o_totalprice * 100) AS BIGINT)"))
    val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice_cents")
    val exact = Profile.table(df, cols)
      .as[(String, Long, Long, Long, String, String)].collect()
      .map(r => r._1 -> r).toMap
    val approx = Profile.tableApprox(df, cols, rsd = 0.05)
      .as[(String, Long, Long, Long, Long, String, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(approx.keySet === exact.keySet)
    for (c <- cols) {
      val (_, nRows, nNulls, lo, nd, mn, mx) = approx(c)
      val (_, eRows, eNulls, ed, emn, emx) = exact(c)
      assert((nRows, nNulls, mn, mx) === ((eRows, eNulls, emn, emx)),
        s"$c: non-sketch columns must be exact")
      assert(lo <= ed && lo >= 1L,
        s"$c: md5-bucket witness $lo must lower-bound exact distinct $ed")
      // 5 sigma of rsd=0.05 — deterministic for fixed input, so this is a
      // stable gate, not a flaky statistical one
      assert(math.abs(nd - ed) <= math.max(1L, (ed * 0.25).toLong),
        s"$c: approx distinct $nd too far from exact $ed")
    }
  }

  test("Profile.histogram: counts partition the rows, lo/hi stay inside their bucket") {
    val df = (0L until 1000L).toDF("v")
    val out = graft.operators.Profile.histogram(df, col("v"), width = 128L)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(out.map(_._2).sum === 1000L, "every row lands in exactly one bucket")
    assert(out.map(_._1).toSeq === (0L to 7L), "1000/128 spans buckets 0..7")
    out.foreach { case (b, _, lo, hi) =>
      assert(lo >= b * 128 && hi < (b + 1) * 128 && lo <= hi,
        s"bucket $b extremes [$lo,$hi] outside its range")
    }
    assert(out.last === ((7L, 104L, 896L, 999L)), "partial last bucket is exact")
  }

  test("Profile.histogram rejects negative values (truncating-div contract)") {
    val bad = Seq(5L, -1L).toDF("v")
    val e = intercept[Exception] {
      graft.operators.Profile.histogram(bad, col("v"), width = 10L).collect()
    }
    assert(e.getMessage.contains("non-negative"))
    // nulls still pass through as the null bucket
    val out = graft.operators.Profile.histogram(
      Seq(Option(5L), None).toDF("v"), col("v"), width = 10L).collect()
    assert(out.length === 2)
  }

  test("Profile.outlierCounts flags the exact-z-score outliers per group") {
    // group A: five 1s and a 100 — 100 sits above mean+2σ; group B: flat
    val counts = (Seq.fill(5)(("A", 1L)) :+ ("A", 100L)) ++ Seq.fill(3)(("B", 5L))
    val df = counts.zipWithIndex.map { case ((g, n), i) => (g, i.toLong, n) }
      .toDF("g", "bucket", "n")
    val got = graft.operators.Profile.outlierCounts(df, Seq("g"), "n")
      .select("g", "n").as[(String, Long)].collect().toSeq
    assert(got === Seq(("A", 100L)))
  }

  test("Profile.outlierCounts ungrouped (global) path returns the outliers — not an empty frame") {
    // the r6 bug: groupCols.isEmpty silently produced zero rows
    val df = ((0L until 5L).map(i => (i, 1L)) :+ (5L, 100L)).toDF("bucket", "n")
    val got = graft.operators.Profile.outlierCounts(df, Seq.empty, "n")
      .select("bucket", "n").as[(Long, Long)].collect().toSeq
    assert(got === Seq((5L, 100L)))
  }

  test("Profile.outlierCounts overflow/contract guards actually fire (not pruned)") {
    // totals beyond the exact-long bound must raise, never wrap silently
    // (each n² still fits a long, so the moment agg itself succeeds and
    // it is the |T| ≤ 3·10^9 guard that trips)
    val big = Seq(("A", 2000000000L), ("A", 2000000000L)).toDF("g", "n")
    val e1 = intercept[Exception] {
      graft.operators.Profile.outlierCounts(big, Seq("g"), "n").collect()
    }
    assert(e1.getMessage.contains("pre-scale"))
    // negative counts violate the 0 ≤ n ≤ T precondition the bounds rely on
    val neg = Seq(("A", -5L), ("A", 10L)).toDF("g", "n")
    val e2 = intercept[Exception] {
      graft.operators.Profile.outlierCounts(neg, Seq("g"), "n").collect()
    }
    assert(e2.getMessage.contains("pre-scale"))
  }

  test("Audit.tableDiff classifies added/removed/changed with null-safe compares") {
    val v1 = Seq((1L, Option("a"), 10L), (2L, Option("b"), 20L),
      (3L, Option("c"), 30L), (4L, None, 40L)).toDF("id", "s", "v")
    val v2 = Seq((2L, Option("b"), 20L),       // unchanged
      (3L, None, 30L),                          // changed: s  c→null
      (4L, None, 41L),                          // changed: v  (null==null not a change)
      (5L, Option("e"), 50L))                   // added
    .toDF("id", "s", "v")                       // id 1 removed
    val got = graft.operators.Audit.tableDiff(v1, v2, "id", Seq("s", "v"))
      .as[(String, Long)].collect().toMap
    assert(got === Map("added" -> 1L, "removed" -> 1L, "changed" -> 2L,
      "unchanged" -> 1L, "changed_s" -> 1L, "changed_v" -> 1L))
  }

  test("Audit.manifest: partition/order-independent; any single-field change flips a fingerprint") {
    val base = (1L to 500L).map(i => (i, s"text$i", i * 3)).toDF("id", "t", "v")
    def rows(df: org.apache.spark.sql.DataFrame) =
      graft.operators.Audit.manifest(df, "id", Seq("t", "v"))
        .as[(Int, Long, Long, Long)].collect().toSet
    val m = rows(base)
    assert(m.toSeq.map(_._2).sum === 500L, "counts cover every row")
    for (parts <- Seq(1, 7)) assert(rows(base.repartition(parts)) === m)
    assert(rows(base.orderBy(col("id").desc)) === m, "row order never matters")
    // one field of one row changes -> that shard's fingerprints move
    val tweaked = base.withColumn("v",
      when(col("id") === 137L, col("v") + 1).otherwise(col("v")))
    val d = rows(tweaked)
    assert(d !== m)
    assert(d.toSeq.map(_._2).sum === 500L, "counts unchanged — only fingerprints move")
    assert((m diff d).size === 1 && (d diff m).size === 1,
      "exactly the one affected shard differs")
    // NULL vs the string rendering of an empty field are distinct rows
    val withNull = Seq((9000L, null.asInstanceOf[String], 1L)).toDF("id", "t", "v")
    val withEmpty = Seq((9000L, "", 1L)).toDF("id", "t", "v")
    assert(rows(base.unionByName(withNull)) !== rows(base.unionByName(withEmpty)))
    // mergeable: per-drop manifests fold to the whole-corpus manifest
    // (count/xor/mod-sum are all commutative monoids over fixed shards)
    val (a, b) = (base.filter(col("id") <= 250), base.filter(col("id") > 250))
    val merged = graft.operators.Audit.manifest(a, "id", Seq("t", "v"))
      .unionByName(graft.operators.Audit.manifest(b, "id", Seq("t", "v")))
      .groupBy("shard")
      .agg(sum("n_rows").as("n_rows"),
        expr("bit_xor(xor_fp)").as("xor_fp"),
        sum("sum_fp").as("sum_fp"))
      .as[(Int, Long, Long, Long)].collect().toSet
    assert(merged === m, "union of drop manifests == corpus manifest")
  }

  test("scatter/gather invariant: per-key agg is partitioning-independent") {
    val df = (1 to 1000).map(i => (i % 7, i.toLong)).toDF("k", "v")
    val expected = df.groupBy("k").agg(sum("v")).as[(Int, Long)].collect().toMap
    for (parts <- Seq(1, 3, 13)) {
      val got = df.repartition(parts).groupBy("k").agg(sum("v"))
        .as[(Int, Long)].collect().toMap
      assert(got === expected, s"partitioning $parts changed the aggregate")
    }
  }
}
