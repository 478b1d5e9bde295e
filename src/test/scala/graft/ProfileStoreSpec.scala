package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ProfileStore

class ProfileStoreSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmpDir(): String =
    Files.createTempDirectory("graft-profstore").toString

  private def rows(ids: Range, nullEvery: Int = 0) =
    ids.map { i =>
      val s = if (nullEvery > 0 && i % nullEvery == 0) null
              else s"cat${i % 5}"
      (i.toLong, s)
    }.toDF("k", "s")

  private def served(storeDir: String): Map[String, (Long, Long, Long, String, String)] =
    ProfileStore.serve(spark, storeDir)
      .select(col("column_name"), col("n_rows"), col("n_nulls"),
        col("n_distinct_lo"), col("min_s"), col("max_s"))
      .as[(String, Long, Long, Long, String, String)].collect()
      .map { case (c, n, nl, lo, mn, mx) => c -> (n, nl, lo, mn, mx) }.toMap

  test("serve over drops == single-scan profile on the union (exact fields)") {
    val dir = tmpDir()
    val all = rows(0 until 300, nullEvery = 7)
    ProfileStore.build(all.filter(col("k") % 3 === 0), Seq("k", "s"), dir, "d0")
    ProfileStore.append(all.filter(col("k") % 3 === 1), Seq("k", "s"), dir, "d1")
    ProfileStore.append(all.filter(col("k") % 3 === 2), Seq("k", "s"), dir, "d2")
    val m = served(dir)
    // exact fields replayed from the union directly
    val exactLo = all.select(countDistinct(substring(md5(col("k").cast("string")), 1, 3)))
      .as[Long].head()
    assert(m("k") === ((300L, 0L, exactLo, "0", "299")))
    val nNullS = (0 until 300).count(_ % 7 == 0).toLong
    val exactLoS = all.filter(col("s").isNotNull)
      .select(countDistinct(substring(md5(col("s")), 1, 3))).as[Long].head()
    assert(m("s") === ((300L, nNullS, exactLoS, "cat0", "cat4")))
  }

  test("typed min/max merge: numeric order, not lexicographic") {
    val dir = tmpDir()
    // "9" > "10" lexicographically — a stringified merge would get max wrong
    ProfileStore.build(Seq((9L, "x")).toDF("k", "s"), Seq("k"), dir, "d0")
    ProfileStore.append(Seq((10L, "y")).toDF("k", "s"), Seq("k"), dir, "d1")
    val m = served(dir)
    assert(m("k")._4 === "9" && m("k")._5 === "10")
  }

  test("HLL estimate lands inside the certified band") {
    val dir = tmpDir()
    val all = rows(0 until 2000)
    ProfileStore.build(all.filter(col("k") < 1000), Seq("k"), dir, "d0")
    ProfileStore.append(all.filter(col("k") >= 1000), Seq("k"), dir, "d1")
    val (lo, approx, n) = ProfileStore.serve(spark, dir)
      .select(col("n_distinct_lo"), col("n_distinct_approx"), col("n_rows"))
      .as[(Long, Long, Long)].head()
    assert(approx * 10 >= lo * 7 && approx * 10 <= n * 13)
  }

  test("staged commits: store invisible until the thunk runs; duplicate drop refused") {
    val dir = tmpDir()
    val commit = ProfileStore.buildStaged(rows(0 until 50), Seq("k", "s"), dir, "d0")
    assert(!ProfileStore.exists(spark, dir))
    commit()
    assert(ProfileStore.exists(spark, dir))
    assert(ProfileStore.drops(spark, dir) === Set("d0"))
    val app = ProfileStore.appendStaged(rows(50 until 80), Seq("k", "s"), dir, "d1")
    assert(ProfileStore.drops(spark, dir) === Set("d0")) // not yet
    app()
    assert(ProfileStore.drops(spark, dir) === Set("d0", "d1"))
    val before = served(dir)
    assertThrows[IllegalArgumentException] {
      ProfileStore.appendStaged(rows(50 until 80), Seq("k", "s"), dir, "d1")
    }
    assert(served(dir) === before) // refusal left the store untouched
  }

  test("compact shrinks files, serves identically") {
    val dir = tmpDir()
    ProfileStore.build(rows(0 until 100), Seq("k", "s"), dir, "d0")
    (1 to 5).foreach(i =>
      ProfileStore.append(rows(100 * i until 100 * (i + 1)), Seq("k", "s"), dir, s"d$i"))
    val before = served(dir)
    // appended drops live in atomically-renamed drop-<id>/ subdirs (the
    // shared DropLedger layout), so count part-files RECURSIVELY
    def nFiles: Int = {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(
          java.nio.file.Paths.get(ProfileStore.partialsPath(dir)))
        .iterator().asScala
        .count(_.getFileName.toString.startsWith("part-"))
    }
    assert(nFiles >= 6)
    assert(new java.io.File(ProfileStore.partialsPath(dir), "drop-d1")
      .isDirectory, "appends land as their own drop subdirectories")
    ProfileStore.compact(spark, dir, targetFiles = 1)
    assert(nFiles === 1)
    assert(served(dir) === before)
  }

  test("drift flags null-rate jumps drop-over-drop; first drop's deltas are null") {
    val dir = tmpDir()
    ProfileStore.build(rows(0 until 100), Seq("k", "s"), dir, "d0")
    ProfileStore.append(rows(100 until 200, nullEvery = 2), Seq("k", "s"), dir, "d1")
    val drift = ProfileStore.drift(spark, dir)
      .select(col("drop_id"), col("column_name"), col("n_rows"),
        col("null_ppm"), col("d_rows"), col("d_null_ppm"))
      .as[(String, String, Long, Long, Option[Long], Option[Long])]
      .collect().map(r => (r._1, r._2) -> r).toMap
    assert(drift(("d0", "s"))._4 === 0L)
    assert(drift(("d0", "s"))._5.isEmpty && drift(("d0", "s"))._6.isEmpty)
    // d1: s is null for the 50 even ids of 100..199 -> 500000 ppm, jump +500000
    assert(drift(("d1", "s"))._4 === 500000L)
    assert(drift(("d1", "s"))._5 === Some(0L))
    assert(drift(("d1", "s"))._6 === Some(500000L))
  }

  test("removeDrop: serve re-merges as never-ingested (min/max and bounds genuinely un-see the drop)") {
    val dir = tmpDir()
    ProfileStore.build(rows(0 until 100), Seq("k", "s"), dir, "d0")
    ProfileStore.append(rows(100 until 200), Seq("k", "s"), dir, "d1")
    ProfileStore.append(rows(200 until 300), Seq("k", "s"), dir, "d2")
    ProfileStore.removeDrop(spark, dir, "d2")
    assert(ProfileStore.drops(spark, dir) === Set("d0", "d1"))
    val ref = tmpDir() // a store that never saw d2
    ProfileStore.build(rows(0 until 100), Seq("k", "s"), ref, "d0")
    ProfileStore.append(rows(100 until 200), Seq("k", "s"), ref, "d1")
    assert(served(dir) === served(ref))
    assert(served(dir)("k")._5 === "199", "max re-merges below the removed drop's 299")
    assertThrows[IllegalArgumentException] {
      ProfileStore.removeDrop(spark, dir, "d2") // already gone: loud
    }
  }

  test("non-exact column types are refused with the conversion hint") {
    val dir = tmpDir()
    val e = intercept[IllegalArgumentException] {
      ProfileStore.build(Seq((1L, 2.5)).toDF("k", "d"), Seq("d"), dir, "d0")
    }
    assert(e.getMessage.contains("cents"))
  }
}
