package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.text.{DistinctSketch, SketchStore}

/** Distinct-sketch store lifecycle: registers max-merge across drops so
  * the served sketch is bit-identical to sketching the union corpus
  * from scratch — for ANY drop overlap, max being idempotent; takedown
  * removes the drop's register rows and the re-max is exactly the
  * never-ingested sketch; the gram config is stamped and inherited; a
  * drained store refuses to serve. Plus the estimator itself: exact
  * 64-bit arithmetic, monotone under ingest, and accurate on a planted
  * cardinality.
  */
class SketchStoreSpec extends AnyFunSuite {
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

  private def served(dir: String): Set[(Long, Long)] =
    SketchStore.serveRegisters(spark, dir).as[(Long, Long)].collect().toSet

  test("store-served registers == from-scratch on the union; overlap is free") {
    val dir = Files.createTempDirectory("sketchstore").toString
    SketchStore.build(dropA, dir, "d1")
    SketchStore.append(dropB, dir, "d2")
    assert(new java.io.File(s"$dir/distinctsketch", "drop-d2").isDirectory,
      "appends commit as one atomic drop subdir")
    val scratch = DistinctSketch.registers(
      DistinctSketch.grams(dropA.unionByName(dropB)))
      .as[(Long, Long)].collect().toSet
    assert(served(dir) === scratch)
    // max-merge is idempotent: re-ingesting the SAME texts under a new
    // drop id must not change the served sketch (sum-merge families
    // would double-count here — the sketch family's distinguishing law)
    SketchStore.append(dropA.withColumn("doc_id", col("doc_id") + 100L),
      dir, "dup")
    assert(served(dir) === scratch,
      "duplicate values across drops must be invisible to a max-merge")
  }

  test("takedown restores the never-ingested sketch; duplicate drop refused") {
    val dir = Files.createTempDirectory("sketchstore-td").toString
    SketchStore.build(dropA, dir, "d1")
    SketchStore.append(dropB, dir, "d2")
    val before = served(dir)
    // novel salted grams: with ~60 fresh values over 256 buckets some
    // register maxima move (deterministic for this fixed data — the
    // assert below pins that it DID)
    val junk = docs((1000L,
      (1 to 60).map(i => s"zq$i").mkString(" ")))
    SketchStore.append(junk, dir, "x")
    assert(served(dir) !== before,
      "the junk drop's novel grams must perturb the served registers")
    SketchStore.removeDrop(spark, dir, "x")
    assert(served(dir) === before,
      "removing the drop's register rows must re-max to the " +
        "never-ingested sketch exactly")
    assertThrows[IllegalArgumentException] {
      SketchStore.append(dropB, dir, "d1") // stored id
    }
  }

  test("gram config is stamped, inherited, and validated") {
    val dir = Files.createTempDirectory("sketchstore-cfg").toString
    SketchStore.build(dropA, dir, "d1", gram = 3)
    assert(SketchStore.storedCfg(spark, dir) === "g3-m256-r32")
    SketchStore.append(dropB, dir, "d2") // inherits gram = 3
    val scratch = DistinctSketch.registers(
      DistinctSketch.grams(dropA.unionByName(dropB), n = 3))
      .as[(Long, Long)].collect().toSet
    assert(served(dir) === scratch,
      "the inherited config must reproduce the from-scratch 3-gram sketch")
  }

  test("drained store refuses to serve; double removal is loud") {
    val dir = Files.createTempDirectory("sketchstore-dr").toString
    SketchStore.build(dropA, dir, "d1")
    SketchStore.removeDrop(spark, dir, "d1")
    assertThrows[IllegalArgumentException] {
      SketchStore.removeDrop(spark, dir, "d1")
    }
    val e = intercept[IllegalArgumentException] {
      SketchStore.serveRegisters(spark, dir)
    }
    assert(e.getMessage.contains("no drops"))
  }

  test("estimator: exact arithmetic regime, planted-cardinality accuracy, growth monotone") {
    // 20,000 distinct planted values — deep in the raw-estimator regime
    // (n >> 5m/2 = 640); HLL rse at m = 256 is 6.5%, so ±20% is a
    // 3-sigma band (and the value is deterministic: same hashes every
    // run, the gate would catch any drift)
    val vals = (1 to 20000).map(i => s"value-$i").toDF("g")
    val est = DistinctSketch.estimate(DistinctSketch.registers(vals))
      .as[(Long, Long, Long)].collect().head
    assert(est._1 === 256L)
    assert(est._3 > 16000L && est._3 < 24000L,
      s"planted 20k distinct estimated as ${est._3}")

    // the growth curve over three drops of FRESH values must be
    // strictly increasing in est_distinct (new drops are all novelty)
    val dir = Files.createTempDirectory("sketchstore-gr").toString
    def slab(lo: Int, hi: Int): DataFrame =
      docs((lo.toLong, (lo to hi).map(i => s"w$i").mkString(" ")))
    SketchStore.build(slab(1, 2000), dir, "a")
    SketchStore.append(slab(2001, 4000), dir, "b")
    SketchStore.append(slab(4001, 6000), dir, "c")
    val curve = SketchStore.growthCurve(spark, dir)
      .orderBy(col("drops_seen"))
      .as[(Long, String, Long, Long)].collect()
    assert(curve.map(_._2).toSeq === Seq("a", "b", "c"))
    assert(curve(0)._4 < curve(1)._4 && curve(1)._4 < curve(2)._4,
      s"all-novel drops must grow the estimate: ${curve.mkString(", ")}")
    // and the last prefix is exactly the full-store serve estimate
    val full = SketchStore.serveEstimate(spark, dir)
      .as[(Long, Long, Long)].collect().head
    assert(curve(2)._4 === full._3 && curve(2)._3 === full._2)
  }

  test("overlap matrix: identical drops read as contained, disjoint drops as empty") {
    val dir = Files.createTempDirectory("sketchstore-ov").toString
    def slab(name: String, lo: Int, hi: Int): DataFrame =
      docs((lo.toLong, (lo to hi).map(i => s"$name$i").mkString(" ")))
    // a and b share NO values; c is a verbatim copy of a's values
    SketchStore.build(slab("x", 1, 3000), dir, "a")
    SketchStore.append(slab("y", 1, 3000), dir, "b")
    SketchStore.append(slab("x", 1, 3000), dir, "c")
    val m = SketchStore.overlapMatrix(spark, dir)
      .as[(String, String, Long, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    assert(m.keySet === Set(("a", "b"), ("a", "c"), ("b", "c")))
    val ac = m(("a", "c"))
    // identical value sets: union est == each side's est, overlap == est,
    // containment == exactly 10^6 (integer arithmetic, no tolerance)
    assert(ac._3 === ac._4 && ac._4 === ac._5 && ac._6 === ac._3)
    assert(ac._7 === 1000000L)
    // disjoint drops: overlap is sketch noise around 0 — well under the
    // ~3000 true cardinality (deterministic for this fixed data)
    val ab = m(("a", "b"))
    assert(math.abs(ab._6) < ab._3 / 3,
      s"disjoint overlap should be noise, got ${ab._6} vs est ${ab._3}")
    assert(ab._7 < 350000L,
      s"disjoint containment should be far from 10^6, got ${ab._7}")
  }

  test("admission: a re-fetched drop reads as contained, a fresh one as novel") {
    val dir = Files.createTempDirectory("sketchstore-adm").toString
    def slab(name: String, lo: Int, hi: Int): DataFrame =
      docs((lo.toLong, (lo to hi).map(i => s"$name$i").mkString(" ")))
    SketchStore.build(slab("x", 1, 3000), dir, "a")
    // candidate 1: the history re-fetched verbatim — nothing new
    val contained = SketchStore.admission(slab("x", 1, 3000), dir)
      .as[(Long, Long, Long, Long, Long)].collect().head
    assert(contained._1 === contained._2 && contained._3 === contained._2,
      "identical value sets must sketch identically")
    assert(contained._4 === 0L && contained._5 === 1000000L,
      s"re-fetch must read as fully contained, got $contained")
    // candidate 2: all-new values — novelty ≈ its own estimate,
    // containment far from 10^6 (deterministic for this fixed data)
    val fresh = SketchStore.admission(slab("y", 1, 3000), dir)
      .as[(Long, Long, Long, Long, Long)].collect().head
    assert(fresh._5 < 350000L,
      s"an all-new drop must read as mostly novel, got $fresh")
    assert(fresh._4 > fresh._1 / 3,
      s"novelty_est must be a large share of the fresh drop's estimate: $fresh")
  }

  test("bytes universe: a replayed binary drop is rejected from one register scan") {
    val dir = Files.createTempDirectory("sketchstore-bin").toString
    def rndBytes(seed: Long, n: Int): Array[Byte] = {
      val a = new Array[Byte](n); new java.util.Random(seed).nextBytes(a); a
    }
    def blobs(name: String, seeds: Range): DataFrame =
      seeds.map(i => (i.toLong, rndBytes(name.hashCode * 1000L + i, 400)))
        .toDF("doc_id", "payload")
    // history: a media drop's byte 12-gram registers, universe stamped
    SketchStore.build(blobs("x", 1 to 50), dir, "day1",
      textCol = "payload", universe = graft.text.Store.Universe.PayloadBytes)
    // the replayed crawl: identical bytes — fully contained, REJECTED by
    // the gated ingest before any curation/dedup cost, verdict logged
    val admitted = SketchStore.ingestGated(blobs("x", 1 to 50), dir, "day1b",
      textCol = "payload")
    assert(!admitted, "a byte-identical re-crawl must be rejected")
    assert(SketchStore.drops(spark, dir).toSet === Set("day1"),
      "the rejected drop contributed no registers")
    val log = SketchStore.admissionLog(spark, dir)
      .filter(col("drop_id") === "day1b")
      .select("verdict").as[String].collect()
    assert(log.length === 1 && log.head === "rejected-stale")
    // a genuinely fresh media drop passes the same gate and appends —
    // universe inherited from the cfg stamp, never re-declared
    assert(SketchStore.ingestGated(blobs("y", 1 to 50), dir, "day2",
      textCol = "payload"))
    assert(SketchStore.drops(spark, dir).toSet === Set("day1", "day2"))
    // cross-universe probes refuse loudly in BOTH directions
    val e1 = intercept[IllegalArgumentException] {
      SketchStore.admission(
        Seq((1L, "some text")).toDF("doc_id", "text"), dir).collect()
    }
    assert(e1.getMessage.contains("binary column"))
    val dirT = Files.createTempDirectory("sketchstore-txt").toString
    SketchStore.build(dropA, dirT, "a")
    val e2 = intercept[IllegalArgumentException] {
      SketchStore.admission(blobs("x", 1 to 3), dirT,
        textCol = "payload").collect()
    }
    assert(e2.getMessage.contains("string column"))
  }

  test("rho recipe: bit-granular positions and the cap") {
    // reference values computed from the md5 hex by hand: for value v,
    // rho = 1 + (leading zero bits of md5[3..15] as 52 bits), capped 32
    // 500 deterministic values cross-checked against an INDEPENDENT
    // bit-level implementation (JDK MessageDigest + binary strings vs
    // the engine's hex-string CASE arithmetic) — two algorithms, one
    // answer, the ScaleGateSpec discipline applied to the register
    // recipe; plus the bucket split on the same values
    val vals = (1 to 496).map(i => s"val-$i") ++ Seq("a", "b", "c", "xyz")
    val got = vals.toDF("g").select(col("g"),
      DistinctSketch.bucketOf(col("g")).as("bucket"),
      DistinctSketch.rhoOf(col("g")).as("rho"))
      .as[(String, Long, Int)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    def ref(v: String): (Long, Int) = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(v.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val bits = hex.substring(2, 15).flatMap(c =>
        String.format("%4s", Integer.toBinaryString(Integer.parseInt(c.toString, 16)))
          .replace(' ', '0'))
      val rho = math.min(bits.indexOf('1') match { case -1 => 52; case i => i + 1 }, 32)
      (java.lang.Long.parseLong(hex.substring(0, 2), 16), rho)
    }
    vals.foreach { v =>
      assert(got(v) === ref(v), s"(bucket, rho)('$v')")
    }
    // the planted set must exercise deep registers, not just rho 1-2
    assert(vals.map(v => ref(v)._2).max >= 7,
      "the cross-check set should cover multi-bit leading-zero runs")
  }
}
