package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.text.{KmvSample, SampleStore}

/** Bottom-k sample + store lifecycle: the order-statistic merge law
  * (a global bottom-k member is inside its own drop's bottom-k, so
  * drops×k stored rows re-cut to the exact from-scratch sample),
  * takedown by the same subset argument, doc-granular purge by drop
  * rebuild, the nested-prefix property, and the hash-recipe
  * dual-algorithm cross-check (the SketchStoreSpec discipline).
  */
class SampleStoreSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs(ids: Range, tag: String = "w"): DataFrame =
    ids.map(i => (i.toLong, (s"$tag$i " * (1 + i % 5)).trim, "en"))
      .toDF("doc_id", "text", "lang")

  private def served(dir: String): Seq[(Long, Long, Long, String, Long)] =
    SampleStore.serveSample(spark, dir)
      .as[(Long, Long, Long, String, Long)].collect().toSeq.sortBy(_._1)

  private def scratch(d: DataFrame, k: Int = KmvSample.K): Seq[(Long, Long, Long, String, Long)] =
    KmvSample.sample(d, k)
      .as[(Long, Long, Long, String, Long)].collect().toSeq.sortBy(_._1)

  test("store-served sample == from-scratch on the union (order-statistic merge)") {
    val dir = Files.createTempDirectory("samplestore").toString
    val a = docs(1 to 300)
    val b = docs(301 to 700)
    SampleStore.build(a, dir, "d1")
    SampleStore.append(b, dir, "d2")
    assert(new java.io.File(s"$dir/kmvsample", "drop-d2").isDirectory,
      "appends commit as one atomic drop subdir")
    assert(served(dir) === scratch(a.unionByName(b)))
    // each drop stores AT MOST k rows — the store reads drops×k,
    // never the corpus
    val stored = SampleStore.load(spark, dir)
      .groupBy(col("drop_id")).count().as[(String, Long)].collect().toMap
    assert(stored.values.forall(_ <= KmvSample.K.toLong))
  }

  test("takedown restores the never-ingested sample; duplicate drop refused") {
    val dir = Files.createTempDirectory("samplestore-td").toString
    val a = docs(1 to 300)
    val b = docs(301 to 700)
    SampleStore.build(a, dir, "d1")
    SampleStore.append(b, dir, "d2")
    val before = served(dir)
    // fresh ids at +10M: new hash values, some of which crack the
    // bottom-k (deterministic for this fixed data — pinned below)
    val junk = docs(1 to 300).withColumn("doc_id", col("doc_id") + 10000000L)
    SampleStore.append(junk, dir, "x")
    assert(served(dir) !== before,
      "the junk drop's hashes must perturb the served sample")
    SampleStore.removeDrop(spark, dir, "x")
    assert(served(dir) === before,
      "removing the drop's rows must re-cut to the never-ingested sample")
    assertThrows[IllegalArgumentException] {
      SampleStore.append(b, dir, "d1") // stored id
    }
  }

  test("purgeDocs rebuilds the drop; serve == a store that never held the docs") {
    val dir = Files.createTempDirectory("samplestore-pg").toString
    val a = docs(1 to 300)
    val b = docs(301 to 700)
    SampleStore.build(a, dir, "d1")
    SampleStore.append(b, dir, "d2")
    // purge the 50 docs of drop d2 whose hashes sort smallest — the
    // worst case: every one of them sits in the stored sample rows
    val victims = KmvSample.sample(b, 50).select(col("doc_id"))
      .as[Long].collect().toSet
    val remaining = b.filter(!col("doc_id").isin(victims.toSeq: _*))
    SampleStore.purgeDocs(remaining, dir, "d2")
    assert(served(dir) === scratch(a.unionByName(remaining)),
      "post-purge serve must equal a store whose drop never held the docs " +
        "(the rebuild recovers the drop's (k+1)th.. candidates — row " +
        "deletion alone could not)")
    assert(SampleStore.drops(spark, dir) === Set("d1", "d2"),
      "purge rebuilt the drop, not removed it")
  }

  test("k is stamped, inherited, and validated; drained store refuses") {
    val dir = Files.createTempDirectory("samplestore-cfg").toString
    SampleStore.build(docs(1 to 100), dir, "d1", k = 16)
    assert(SampleStore.storedCfg(spark, dir) === "k16-md5id")
    SampleStore.append(docs(101 to 200), dir, "d2") // inherits k = 16
    assert(served(dir) === scratch(docs(1 to 200), k = 16),
      "the inherited k must reproduce the from-scratch bottom-16")
    SampleStore.removeDrop(spark, dir, "d1")
    SampleStore.removeDrop(spark, dir, "d2")
    val e = intercept[IllegalArgumentException] {
      SampleStore.serveSample(spark, dir)
    }
    assert(e.getMessage.contains("no drops"))
  }

  test("nested-prefix law: the rank-j prefix IS the bottom-j sample") {
    val d = docs(1 to 500)
    val k128 = scratch(d, 128)
    Seq(1, 7, 32, 100).foreach { j =>
      assert(k128.filter(_._1 <= j) === scratch(d, j),
        s"prefix $j of the bottom-128 must equal the bottom-$j sample")
    }
  }

  test("sample audit: integer-exact columns; estimate within a believable band") {
    val d = docs(1 to 2000)
    val audit = KmvSample.auditMeanTokens(KmvSample.sample(d), d)
      .as[(Long, Long, Long, Long, Long)].collect().head
    assert(audit._1 === 128L && audit._2 === 2000L)
    // exact mean of 1 + i % 5 over 1..2000 is exactly 3.0 tokens/doc
    assert(audit._4 === 3000L)
    // the estimate reads ONLY the 128 sample rows; rse of a mean over a
    // [1,5]-valued payload at k=128 is ~4% — 25% is a wide deterministic
    // band (fixed hashes: the gate pins the exact value anyway)
    assert(audit._5 < 250L,
      s"sample-estimated mean ${audit._3} vs exact ${audit._4} " +
        s"(err ${audit._5} pml) is outside any plausible sampling error")
  }

  test("stratified mode: per-lang serve == from-scratch per-lang cut; modes refuse each other") {
    val dir = Files.createTempDirectory("samplestore-strat").toString
    // two languages with a 10:1 skew — the balanced cut must keep k
    // rows of the minority language a global cut would mostly drop
    def mixed(ids: Range): DataFrame =
      ids.map(i => (i.toLong, (s"w$i " * (1 + i % 3)).trim,
        if (i % 11 == 0) "de" else "en")).toDF("doc_id", "text", "lang")
    val a = mixed(1 to 400)
    val b = mixed(401 to 900)
    SampleStore.build(a, dir, "d1", k = 8, stratified = true)
    assert(SampleStore.storedCfg(spark, dir) === "k8-md5id-bylang")
    SampleStore.append(b, dir, "d2") // inherits k AND the cut discipline
    def strat(d: DataFrame): Set[(String, Long, Long, Long)] =
      graft.operators.Relational.topKPerKey(
        d.select(col("lang"), KmvSample.hashOf(col("doc_id")).as("hv"),
          col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("n_tokens")),
        keys = Seq(col("lang")),
        order = Seq(col("hv").asc, col("doc_id").asc), k = 8)
        .as[(String, Long, Long, Long)].collect().toSet
    val got = SampleStore.serveStratified(spark, dir)
      .as[(String, Long, Long, Long)].collect().toSet
    assert(got === strat(a.unionByName(b)),
      "per-stratum serve must equal the from-scratch per-lang cut")
    assert(got.count(_._1 == "de") === 8 && got.count(_._1 == "en") === 8,
      "the minority language must keep its full k — that is the point")
    // takedown: the same subset argument, within each stratum
    val junk = mixed(1 to 300)
      .withColumn("doc_id", col("doc_id") + 10000000L)
    SampleStore.append(junk, dir, "x")
    assert(SampleStore.serveStratified(spark, dir)
      .as[(String, Long, Long, Long)].collect().toSet !== got)
    SampleStore.removeDrop(spark, dir, "x")
    assert(SampleStore.serveStratified(spark, dir)
      .as[(String, Long, Long, Long)].collect().toSet === got)
    // cross-mode serves are LOUD refusals, never silently-wrong cuts
    val e1 = intercept[IllegalArgumentException] {
      SampleStore.serveSample(spark, dir)
    }
    assert(e1.getMessage.contains("serveStratified"))
    val gdir = Files.createTempDirectory("samplestore-glob").toString
    SampleStore.build(a, gdir, "d1", k = 8)
    val e2 = intercept[IllegalArgumentException] {
      SampleStore.serveStratified(spark, gdir)
    }
    assert(e2.getMessage.contains("serveSample"))
  }

  test("hash recipe: dual-algorithm cross-check on 500 ids") {
    // conv(substring(md5(cast id))) vs an independent JDK MessageDigest
    // implementation — two algorithms, one answer
    val ids = (1L to 496L) ++ Seq(9999999L, 123456789L, 0L, 42L)
    val got = ids.toDF("doc_id")
      .select(col("doc_id"), KmvSample.hashOf(col("doc_id")).as("hv"))
      .as[(Long, Long)].collect().toMap
    def ref(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16)
    }
    ids.foreach(id => assert(got(id) === ref(id), s"hv($id)"))
    // 60-bit values: positive and spread over the full range
    assert(got.values.forall(_ >= 0L))
    assert(got.values.max > (1L << 55),
      "the planted ids should exercise the high end of the hash range")
  }
}
