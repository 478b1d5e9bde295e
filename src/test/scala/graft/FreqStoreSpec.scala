package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.text.{FreqSketch, FreqStore}

/** Count-Min sketch + store lifecycle: counters are LINEAR, so drops
  * sum-merge to the union's counters (serve ≡ from-scratch when drops
  * partition the docs), drop takedown re-sums to the never-ingested
  * table, and — the family's distinguishing law — documents SUBTRACT
  * out exactly from one scan of the purged docs alone. Plus the
  * estimator's one-sided guarantee (est ≥ exact, always) and the
  * dual-algorithm slot-recipe cross-check (the SketchStoreSpec
  * discipline applied to the depth-tagged hash).
  */
class FreqStoreSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs(rows: (Long, String)*): DataFrame =
    rows.toDF("doc_id", "text")

  private val dropA = docs(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "pack my box with five dozen liquor jugs"))
  private val dropB = docs(
    (3L, "how vexingly quick daft zebras jump"),
    (4L, "the quick brown fox jumps over the lazy dog again"))

  private def served(dir: String): Set[(Long, Long, Long)] =
    FreqStore.serveCounters(spark, dir).as[(Long, Long, Long)]
      .collect().toSet

  private def scratch(d: DataFrame, n: Int = 3): Set[(Long, Long, Long)] =
    FreqSketch.counters(FreqSketch.grams(d, n = n))
      .as[(Long, Long, Long)].collect().toSet

  test("store-served counters == from-scratch on the union; sums are linear") {
    val dir = Files.createTempDirectory("freqstore").toString
    FreqStore.build(dropA, dir, "d1")
    FreqStore.append(dropB, dir, "d2")
    assert(new java.io.File(s"$dir/freqsketch", "drop-d2").isDirectory,
      "appends commit as one atomic drop subdir")
    assert(served(dir) === scratch(dropA.unionByName(dropB)))
    // linearity: re-ingesting the SAME texts under a new drop id counts
    // them AGAIN — sum-merge, the opposite of the max-merge family's
    // idempotence; serve must equal from-scratch of the doubled corpus
    FreqStore.append(dropA.withColumn("doc_id", col("doc_id") + 100L),
      dir, "dup")
    assert(served(dir) ===
      scratch(dropA.unionByName(dropB).unionByName(dropA)),
      "a duplicate drop must count twice under a sum-merge")
  }

  test("drop takedown restores the never-ingested counters; stored id refused") {
    val dir = Files.createTempDirectory("freqstore-td").toString
    FreqStore.build(dropA, dir, "d1")
    FreqStore.append(dropB, dir, "d2")
    val before = served(dir)
    val junk = docs((1000L, (1 to 60).map(i => s"zq$i").mkString(" ")))
    FreqStore.append(junk, dir, "x")
    assert(served(dir) !== before,
      "the junk drop's grams must perturb the served counters")
    FreqStore.removeDrop(spark, dir, "x")
    assert(served(dir) === before,
      "removing the drop's counter rows must re-sum to the " +
        "never-ingested table exactly")
    assertThrows[IllegalArgumentException] {
      FreqStore.append(dropB, dir, "d1") // stored id
    }
  }

  test("unlearnDocs subtracts exactly from the purged docs alone; non-subset is loud") {
    val dir = Files.createTempDirectory("freqstore-ul").toString
    val junk = docs(
      (1000L, (1 to 40).map(i => s"zq$i").mkString(" ")),
      (1001L, "the quick brown fox jumps over the lazy dog"))
    FreqStore.build(dropA, dir, "d1")
    // the polluted drop: dropB's docs PLUS the junk — note junk doc
    // 1001 repeats dropA/dropB text, so its counters overlap real mass
    // and only an exact subtraction can unpick them
    FreqStore.append(dropB.unionByName(junk), dir, "d2")
    assert(served(dir) !== scratch(dropA.unionByName(dropB)))
    FreqStore.unlearnDocs(junk, dir, "d2")
    assert(served(dir) === scratch(dropA.unionByName(dropB)),
      "subtracting the purged docs' own sketch must restore the " +
        "never-ingested counters bit-for-bit")
    // and the stored drop rows themselves equal a fresh partial of the
    // remainder (zeroed slots dropped — not just the merged serve)
    val stored = FreqStore.load(spark, dir)
      .filter(col("drop_id") === "d2")
      .select(col("depth"), col("slot"), col("cnt"))
      .as[(Long, Long, Long)].collect().toSet
    assert(stored === scratch(dropB),
      "the drop's stored rows must be bit-identical to a fresh partial")
    // purging content the drop never held drives a counter negative —
    // loud refusal, not a corrupt ledger
    val alien = docs((2000L, (1 to 30).map(i => s"xw$i").mkString(" ")))
    val e = intercept[IllegalArgumentException] {
      FreqStore.unlearnDocs(alien, dir, "d2")
    }
    assert(e.getMessage.contains("negative"))
    assert(served(dir) === scratch(dropA.unionByName(dropB)),
      "a refused unlearn must leave the store untouched")
  }

  test("gram config is stamped, inherited, and validated; drained store refuses") {
    val dir = Files.createTempDirectory("freqstore-cfg").toString
    FreqStore.build(dropA, dir, "d1", gram = 2)
    assert(FreqStore.storedCfg(spark, dir) === "g2-w1024-d4")
    FreqStore.append(dropB, dir, "d2") // inherits gram = 2
    assert(served(dir) === scratch(dropA.unionByName(dropB), n = 2),
      "the inherited config must reproduce the from-scratch 2-gram counters")
    FreqStore.removeDrop(spark, dir, "d1")
    FreqStore.removeDrop(spark, dir, "d2")
    val e = intercept[IllegalArgumentException] {
      FreqStore.serveCounters(spark, dir)
    }
    assert(e.getMessage.contains("no drops"))
  }

  test("estimator: est >= exact for EVERY probe; zero for never-seen slots") {
    // 5,000 planted items in 1024 slots per row force real collisions,
    // so the one-sided guarantee is exercised where overcounts exist
    // (deterministic: same hashes every run)
    val items = (1 to 5000).flatMap(i =>
      Seq.fill(1 + i % 7)(s"item-$i")).toDF("g")
    val cms = FreqSketch.counters(items)
    val probes = (1 to 5000 by 97).map(i => s"item-$i").toDF("term")
    val exact = items.groupBy(col("g").as("term"))
      .agg(count(lit(1)).as("n_exact"))
    val got = FreqSketch.estimates(cms, probes)
      .join(exact, Seq("term")).as[(String, Long, Long)].collect()
    assert(got.length === 52) // every probe term present (5000/97 + 1)
    got.foreach { case (t, est, ex) =>
      assert(est >= ex, s"one-sided guarantee violated for '$t': $est < $ex")
    }
    assert(got.exists { case (_, est, ex) => est > ex },
      "the planted collision regime should show at least one overcount")
    // a probe the corpus never saw: every depth row still has SOME slot
    // value, but min over 4 independent rows of a 5k-item table is
    // near-certainly a small collision mass — assert only the contract:
    // est >= 0 and the never-seen item's exact is 0
    val unseen = FreqSketch.estimates(cms, Seq("never-seen-xq").toDF("term"))
      .as[(String, Long)].collect().head
    assert(unseen._2 >= 0L)
  }

  test("driftEstimates: a phrase planted in one drop reads high there and zero elsewhere") {
    val dir = Files.createTempDirectory("freqstore-drift").toString
    // drop d2 is flooded with one boilerplate trigram; d1 never saw it
    val flood = docs((10L,
      Seq.fill(50)("click here now").mkString(" ")))
    FreqStore.build(dropA, dir, "d1")
    FreqStore.append(dropB.unionByName(flood), dir, "d2")
    val probes = Seq("click here now", "the quick brown").toDF("term")
    val got = FreqStore.driftEstimates(spark, probes, dir)
      .as[(String, String, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._5))).toMap
    // est >= exact per drop (the one-sided guarantee, per partial):
    // the flooded phrase occurs >= 50x in d2 ("click here now click
    // here now" chains every 3rd-word offset too), none in d1
    assert(got(("d2", "click here now"))._1 >= 50L)
    assert(got(("d1", "click here now"))._1 <= 2L,
      "a phrase d1 never ingested must read ~0 there (collision mass only)")
    // and the ppm face makes the drift visible regardless of drop size
    assert(got(("d2", "click here now"))._2 >
        50L * got(("d1", "click here now"))._2 + 1000L,
      s"the flooded drop's ppm must dominate: $got")
    // a phrase only d1 saw: present there, absent in d2
    assert(got(("d1", "the quick brown"))._1 >= 1L)
    // every (drop, term) pair is present — missing slots read 0, they
    // do not drop out
    assert(got.size === 4)
  }

  test("slot recipe: dual-algorithm cross-check on 500 values") {
    // the engine's conv(substring(md5...)) % 1024 recipe vs an
    // INDEPENDENT JDK MessageDigest implementation — two algorithms,
    // one answer, for every depth row (the SketchStoreSpec discipline)
    val vals = (1 to 496).map(i => s"val-$i") ++ Seq("a", "b", "c", "xyz")
    val cols = (1 to FreqSketch.Depth).map(i =>
      FreqSketch.slotOf(col("g"), i).as(s"s$i"))
    val got = vals.toDF("g").select(col("g") +: cols: _*)
      .collect().map(r => r.getString(0) ->
        (1 to FreqSketch.Depth).map(i => r.getLong(i))).toMap
    def ref(v: String, depth: Int): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"$depth:$v".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 8), 16) % FreqSketch.Width
    }
    vals.foreach { v =>
      (1 to FreqSketch.Depth).foreach { d =>
        assert(got(v)(d - 1) === ref(v, d), s"slot_$d('$v')")
      }
    }
    // depth rows must be genuinely independent hashes: the same value
    // should land on different slots in at least one pair of rows
    assert(vals.exists(v => got(v).distinct.size > 1))
  }

  test("width is a config knob: builds stamp it, appends inherit it, serves hash by it") {
    val dir = Files.createTempDirectory("freqstore-w").toString
    FreqStore.build(dropA, dir, "d1", width = 4096)
    FreqStore.append(dropB, dir, "d2")
    assert(FreqStore.storedCfg(spark, dir) === "g3-w4096-d4",
      "the chosen width stamps the cfg and the append inherited it")
    // serve ≡ from-scratch at the STORE's width, and the estimate path
    // must hash probes with that width too (a 1024-hashed probe against
    // 4096-wide counters would silently read the wrong slots)
    assert(served(dir) ===
      FreqSketch.counters(FreqSketch.grams(dropA.unionByName(dropB)),
        width = 4096).as[(Long, Long, Long)].collect().toSet)
    val probes = Seq("the quick brown").toDF("term")
    val est = FreqStore.serveEstimates(spark, probes, dir)
      .collect().head.getLong(1)
    val exact = 2L // once in dropA doc 1, once in dropB doc 4
    assert(est >= exact, "one-sided guarantee holds at the stored width")
    // a mixed-width append is refused loudly by the cfg stamp: simulate
    // by building a second store at the default width and checking the
    // stamps differ (the single-cfg validator is exercised in the gram
    // config test above)
    val dir2 = Files.createTempDirectory("freqstore-w2").toString
    FreqStore.build(dropA, dir2, "d1")
    assert(FreqStore.storedCfg(spark, dir2) === "g3-w1024-d4")
  }

  test("wider sketch never estimates worse in aggregate: total overcount shrinks 64x width") {
    val corpus = docs((1 to 60).map(i =>
      (i.toLong, s"token$i alpha beta gamma token${i % 7} delta")): _*)
    val probes = corpus.filter(col("doc_id") % 5 === 0)
    def totalOvercount(width: Int): Long =
      FreqSketch.audited(corpus, probes, width = width)
        .agg(sum(col("overcount"))).collect().head.getLong(0)
    val (narrow, wide) = (totalOvercount(64), totalOvercount(4096))
    // per-term monotonicity is NOT guaranteed (different hash slots);
    // aggregate collision mass on a fixed deterministic corpus is the
    // honest comparison — and at 64x the width it must strictly shrink
    // here because the 64-slot table provably collides this vocabulary
    assert(narrow > wide,
      s"total overcount: w=64 gives $narrow, w=4096 gives $wide")
    assert(wide >= 0L, "one-sided: overcount can never be negative")
  }

  test("deriveWidth: the data-derived knob honors the bound, the floor and the cap") {
    import graft.text.FreqSketch.{deriveWidth, Depth, Width}
    // bound: ε·N = (e/w)·N ≤ target whenever the cap didn't bind
    for ((target, n) <- Seq((1000L, 2000000L), (10000L, 10000000000L),
                            (1000000L, 10000000000000L))) {
      val w = deriveWidth(target, n)
      assert(math.E * n / w <= target,
        s"derived w=$w misses the bound for target=$target, n=$n")
      assert((w & (w - 1)) === 0, "power of two")
    }
    // floor: tiny corpora never shrink below the historical default
    assert(deriveWidth(1000000L, 0L) === Width)
    assert(deriveWidth(1000000L, 1000L) === Width)
    // monotone in N, antitone in target
    assert(deriveWidth(1000L, 1000000000L) >= deriveWidth(1000L, 1000000L))
    assert(deriveWidth(100L, 1000000000L) >= deriveWidth(10000L, 1000000000L))
    // cap: the knob refuses to silently inflate past 2^26 — the bound
    // then DEGRADES and the caller can see it (the scaladoc regime table)
    val capped = deriveWidth(1000000L, 100000000000000L)
    assert(capped === (1 << 26))
    assert(math.E * 1e14 / capped > 1000000L,
      "past the cap the guarantee honestly degrades rather than the " +
        "counter table growing past metadata scale")
    assert(capped.toLong * Depth < 300000000L, "counter rows stay low-GBs")
    // and a derived-width build is a valid store width end-to-end
    val dir = java.nio.file.Files.createTempDirectory("freq-derivew").toString
    val corpus = Seq((1L, "a b c d e f"), (2L, "a b c x y z"))
      .toDF("doc_id", "text")
    val w = deriveWidth(1000L, 12L)
    FreqStore.build(corpus, dir, "d1", width = w)
    assert(FreqStore.storedCfg(spark, dir).contains(s"w$w"))
  }
}
