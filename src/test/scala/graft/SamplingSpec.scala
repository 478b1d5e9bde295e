package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sampling

class SamplingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ids(n: Int) = (1 to n).map(_.toLong).toDF("id")

  test("deterministicSample: reproducible, rate-accurate, partition-invariant") {
    val df = ids(5000)
    val a = Sampling.deterministicSample(df, col("id"), 100).as[Long].collect().toSet
    val b = Sampling.deterministicSample(df.repartition(7), col("id"), 100)
      .as[Long].collect().toSet
    assert(a === b, "same keys must be selected regardless of partitioning")
    // 10% of 5000 = 500 expected; md5 buckets are uniform (±4σ ≈ ±85)
    assert(a.size > 400 && a.size < 600, s"rate off: ${a.size}/5000")
  }

  test("deterministicSample: nested — sample(r) is a subset of sample(r') for r < r'") {
    val df = ids(2000)
    val small = Sampling.deterministicSample(df, col("id"), 50).as[Long].collect().toSet
    val big = Sampling.deterministicSample(df, col("id"), 200).as[Long].collect().toSet
    assert(small.subsetOf(big))
  }

  test("different seeds give independent samples") {
    val df = ids(2000)
    val s1 = Sampling.deterministicSample(df, col("id"), 500, seed = "a").as[Long].collect().toSet
    val s2 = Sampling.deterministicSample(df, col("id"), 500, seed = "b").as[Long].collect().toSet
    assert(s1 !== s2)
    // independence: |overlap| ≈ 0.25·n = 500 (±4σ ≈ ±90)
    val overlap = (s1 & s2).size
    assert(overlap > 380 && overlap < 620, s"seeds look correlated: overlap $overlap")
  }

  test("mixtureSample: per-stratum rates, nested in the per-stratum rate") {
    val df = (1 to 3000).map(i => (i.toLong, if (i % 3 == 0) "en" else "de"))
      .toDF("id", "lang")
    val out = Sampling.mixtureSample(df, col("id"), col("lang"),
      Map("en" -> 800, "de" -> 100), defaultPerMille = 0)
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    // en: 1000 docs @80% = 800 expected; de: 2000 @10% = 200 expected
    assert(out("en") > 720 && out("en") < 880, s"en rate off: ${out("en")}")
    assert(out("de") > 140 && out("de") < 260, s"de rate off: ${out("de")}")
    // nested: the mixture's en-rows are exactly deterministicSample(800) ∩ en
    val mixEn = Sampling.mixtureSample(df, col("id"), col("lang"),
      Map("en" -> 800), defaultPerMille = 0).as[(Long, String)].collect().toSet
    val plain = Sampling.deterministicSample(df.filter(col("lang") === "en"), col("id"), 800)
      .as[(Long, String)].collect().toSet
    assert(mixEn === plain)
  }

  test("stratifiedK: exactly k per stratum (all rows when stratum smaller), deterministic") {
    val df = (1 to 300).map(i => (i.toLong, if (i <= 3) "tiny" else s"s${i % 4}"))
      .toDF("id", "g")
    val out = Sampling.stratifiedK(df, col("id"), col("g"), 10)
    val byG = out.groupBy("g").count().as[(String, Long)].collect().toMap
    assert(byG("tiny") === 3, "stratum smaller than k keeps all rows")
    assert(Seq("s0", "s1", "s2", "s3").forall(byG(_) === 10))
    val again = Sampling.stratifiedK(df.repartition(11), col("id"), col("g"), 10)
      .as[(Long, String)].collect().toSet
    assert(again === out.as[(Long, String)].collect().toSet,
      "pick must be partition-invariant")
  }

  test("Budget.apportion + selectToBudget: exact sum, greedy prefix, partition-invariant") {
    import graft.operators.Budget
    val docs = (1L to 400L)
      .map(i => (i, s"s${i % 4}", 10L + i % 7)) // 4 sources, masses 10..16
      .toDF("doc_id", "source", "nt")
    val alloc = Budget.apportion(docs, "source", col("nt"), budget = 1000L)
      .as[(String, Long, Long)].collect()
    assert(alloc.map(_._3).sum === 1000L, "allocations sum EXACTLY to the budget")

    val sel = Budget.selectToBudget(docs, "source", "doc_id", col("nt"), 1000L)
      .as[(Long, String)].collect().toSet
    // per source: selected mass <= allocation, and adding the NEXT doc in
    // md5 order would exceed it (greedy-prefix maximality)
    val mass = docs.as[(Long, String, Long)].collect().map(r => r._1 -> r._3).toMap
    val order = docs.as[(Long, String, Long)].collect()
      .groupBy(_._2).view.mapValues(_.map(_._1).sortBy(id =>
        (java.security.MessageDigest.getInstance("MD5")
          .digest(s"sel:$id".getBytes("UTF-8"))
          .map("%02x".format(_)).mkString, id))).toMap
    for ((src, allocTokens) <- alloc.map(a => a._1 -> a._3)) {
      val picked = order(src).takeWhile { id =>
        // replicate the running-total rule
        val upto = order(src).take(order(src).indexOf(id) + 1)
        upto.map(mass).sum <= allocTokens
      }.toSet
      assert(sel.filter(_._2 == src).map(_._1) === picked,
        s"$src: selection must be exactly the greedy md5-order prefix")
    }
    // partition invariance: the repartitioned input picks the same docs
    val sel2 = Budget.selectToBudget(docs.repartition(13), "source", "doc_id",
      col("nt"), 1000L).as[(Long, String)].collect().toSet
    assert(sel2 === sel)
  }

  test("hashBucket: stable shard assignment covers all buckets") {
    val buckets = ids(1000)
      .select(Sampling.hashBucket(col("id"), 8).as("b")).as[Int].collect()
    assert(buckets.forall(b => b >= 0 && b < 8))
    assert(buckets.distinct.sorted.toSeq === (0 until 8))
  }

  test("weightedSample: per-row rates, nested in the weight, clamps at the edges") {
    val df = ids(4000).withColumn("w",
      when(col("id") % 4 === 0, 0)          // never kept
        .when(col("id") % 4 === 1, 100)
        .when(col("id") % 4 === 2, 400)
        .otherwise(1000))                   // always kept
    val kept = Sampling.weightedSample(df, col("id"), col("w"))
      .select(col("id"), col("w")).as[(Long, Int)].collect()
    val byW = kept.groupBy(_._2).view.mapValues(_.length).toMap
    assert(!byW.contains(0), "rate 0 must drop every row")
    assert(byW(1000) === 1000, "rate 1000 must keep every row")
    // 1000 rows per class; binomial ±4 sigma
    assert(byW(100) > 60 && byW(100) < 140, s"10% class off: ${byW(100)}")
    assert(byW(400) > 340 && byW(400) < 460, s"40% class off: ${byW(400)}")
    // nested: the SAME rows survive when their rate rises (constant 100 ->
    // per-row w >= 100 everywhere except the zero class)
    val flat100 = Sampling.deterministicSample(
      df.filter(col("w") >= 100), col("id"), 100)
      .select(col("id")).as[Long].collect().toSet
    assert(flat100.subsetOf(kept.map(_._1).toSet))
  }

  test("assignSplit: exhaustive, deterministic, boundary-stable as a split widens") {
    val df = (1L to 2000L).toDF("id")
    def splits(cuts: Seq[(String, Int)]) = df
      .select(col("id"), Sampling.assignSplit(col("id"), cuts).as("s"))
      .as[(Long, String)].collect().toMap
    val a = splits(Seq("train" -> 900, "val" -> 950, "test" -> 1000))
    assert(a.values.toSet === Set("train", "val", "test"), "every split populated")
    assert(a.size === 2000, "every row assigned")
    assert(splits(Seq("train" -> 900, "val" -> 950, "test" -> 1000)) === a,
      "re-run identical")
    // widening val at train's expense moves ONLY train docs into val:
    // test membership (the 950 cut) is untouched
    val b = splits(Seq("train" -> 800, "val" -> 950, "test" -> 1000))
    assert(a.filter(_._2 == "test") === b.filter(_._2 == "test"))
    assert(a.collect { case (id, "val") => id }.toSet
      .subsetOf(b.collect { case (id, "val") => id }.toSet))
    assertThrows[IllegalArgumentException] {
      Sampling.assignSplit(col("id"), Seq("train" -> 900, "val" -> 950))
    }
    assertThrows[IllegalArgumentException] {
      Sampling.assignSplit(col("id"), Seq("a" -> 950, "b" -> 900, "c" -> 1000))
    }
  }

  test("crossSplitLeakage flags only near-dup pairs that span splits") {
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    val other = (100 to 140).map(i => s"x$i").mkString(" ")
    val df = (1L to 60L).map(i => (i, s"doc $i " + (1 to 30).map(j => s"u${i}_$j").mkString(" ")))
      .toDF("doc_id", "text")
    val cuts = Seq("train" -> 500, "test" -> 1000)
    val sp = df.select(col("doc_id"),
      Sampling.assignSplit(col("doc_id"), cuts).as("s"))
      .as[(Long, String)].collect().toMap
    val train = sp.collect { case (id, "train") => id }.toSeq.sorted
    val test = sp.collect { case (id, "test") => id }.toSeq.sorted
    // plant: a cross-split near-dup (train(0), test(0)) and a same-split
    // near-dup (train(1), train(2)) — only the first may be reported
    val planted = Map(
      train(0) -> base, test(0) -> base,
      train(1) -> other, train(2) -> other)
    val docs = df.as[(Long, String)].map { case (id, t) =>
      (id, planted.getOrElse(id, t)) }.toDF("doc_id", "text")
    val got = graft.text.Dedup.crossSplitLeakage(docs, cuts)
      .select(col("doc_a"), col("doc_b")).as[(Long, Long)].collect().toSet
    val exp = Set((math.min(train(0), test(0)), math.max(train(0), test(0))))
    assert(got === exp)
  }

  test("temperatureRebalance: √-flattening rates, rarest stratum whole, nested membership") {
    import graft.operators.Sampling
    // strata of size 400 / 100 / 25: rates 1000·√(25/n) = 250 / 500 / 1000
    val df = ((1L to 400L).map(i => (i, "big")) ++
      (1001L to 1100L).map(i => (i, "mid")) ++
      (2001L to 2025L).map(i => (i, "rare"))).toDF("doc_id", "source")
    val rates = Sampling.temperatureRates(df, "source")
      .as[(String, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(rates === Map(
      "big" -> ((400L, 250L)), "mid" -> ((100L, 500L)), "rare" -> ((25L, 1000L))))
    val kept = Sampling.temperatureRebalance(df, col("doc_id"), "source")
    val keptIds = kept.select("doc_id").as[Long].collect().toSet
    // the rare stratum survives WHOLE; the head is flattened toward √n
    assert((2001L to 2025L).forall(keptIds.contains))
    // nested membership vs the same decision through mixtureSample: the
    // derived-rate path must keep EXACTLY the rows the hand-configured
    // rates would (one decision function across the sampler family)
    val viaMixture = Sampling.mixtureSample(df, col("doc_id"), col("source"),
        Map("big" -> 250, "mid" -> 500, "rare" -> 1000), seed = "temp")
      .select("doc_id").as[Long].collect().toSet
    assert(keptIds === viaMixture)
  }
}
