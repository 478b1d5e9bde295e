package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.text.{FpStore, Store, Winnow}

/** Winnowing-fingerprint store lifecycle: the INCREMENTAL form of the
  * partial-copy detector — fingerprint history once, serve each drop's
  * pairs from the stored table, append, take down by doc, compact —
  * across BOTH gram universes.
  */
class FpStoreSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def rndBytes(seed: Long, n: Int): Array[Byte] = {
    val a = new Array[Byte](n); new java.util.Random(seed).nextBytes(a); a
  }

  test("bytes universe: the embedded-copy twin is found ACROSS a drop boundary") {
    val dir = Files.createTempDirectory("fpstore").toString
    // one 64-byte verbatim block (>= k+w-1 = 19 bytes) shared between a
    // HISTORY doc and a later DROP doc, at different offsets, inside
    // otherwise-unrelated payloads — whole-set Jaccard ~64/800, invisible
    // to MinHash (MultimodalSpec proves q204 returns zero on this), and
    // previously only findable by re-fingerprinting all of history.
    val block = rndBytes(7L, 64)
    val history = Seq(
      (1L, rndBytes(1L, 300) ++ block ++ rndBytes(2L, 100)),
      (3L, rndBytes(5L, 400)))
      .toDF("doc_id", "payload")
    FpStore.build(history, dir, contentCol = "payload",
      universe = Store.Universe.PayloadBytes)
    assert(FpStore.storedParams(spark, dir) ===
      FpStore.FpParams(12, 8, Store.Universe.PayloadBytes))

    val drop = Seq(
      (2L, rndBytes(3L, 50) ++ block ++ rndBytes(4L, 350)),
      (5L, rndBytes(9L, 400)))
      .toDF("doc_id", "payload")
    val (pairs, commit) = FpStore.pairsVsStoreStaged(drop, dir,
      contentCol = "payload")
    val got = pairs.select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(got === Set((2L, 1L)),
      "exactly the cross-boundary embedded-copy pair, drop doc first")
    // staged: the store is untouched until commit
    assert(FpStore.load(spark, dir).select("doc_id").distinct().count() === 2L)
    commit()
    assert(FpStore.load(spark, dir).select("doc_id").distinct().count() === 4L,
      "commit appends the DROP's fingerprints (both drop docs)")

    // day 2: a new drop doc carrying the block now pairs against BOTH
    // carriers — yesterday's drop is today's history, no rebuild
    val day2 = Seq((7L, rndBytes(11L, 20) ++ block ++ rndBytes(12L, 200)))
      .toDF("doc_id", "payload")
    val got2 = FpStore.pairsVsStoreReadOnly(day2, dir, contentCol = "payload")
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(got2 === Set((7L, 1L), (7L, 2L)))
  }

  test("takedown: delete-and-done, pairs vanish, marker survives the rewrite") {
    val dir = Files.createTempDirectory("fpstore-td").toString
    val block = rndBytes(7L, 64)
    val history = Seq(
      (1L, rndBytes(1L, 300) ++ block ++ rndBytes(2L, 100)),
      (3L, rndBytes(5L, 400)))
      .toDF("doc_id", "payload")
    FpStore.build(history, dir, contentCol = "payload",
      universe = Store.Universe.PayloadBytes)
    val nFps1 = FpStore.load(spark, dir).filter(col("doc_id") === 1L).count()
    assert(nFps1 > 0L)
    val removed = FpStore.removeDocs(spark, dir, Seq(1L).toDF("doc_id"))
    assert(removed === nFps1, "the audit count is the removed doc's rows")
    val drop = Seq((2L, rndBytes(3L, 50) ++ block ++ rndBytes(4L, 350)))
      .toDF("doc_id", "payload")
    assert(FpStore.pairsVsStoreReadOnly(drop, dir, contentCol = "payload")
      .count() === 0L,
      "a pair that existed only via the taken-down doc is gone")
    // the marker survived the rewrite: a bytes-universe probe still preps
    // as bytes (a lost marker would be a loud failure, not empty output)
    assert(FpStore.storedParams(spark, dir).universe ===
      Store.Universe.PayloadBytes)
  }

  test("text universe: store serve == from-scratch Winnow pairs on the drop slice") {
    val dir = Files.createTempDirectory("fpstore-txt").toString
    val base = (1 to 40).map(i => s"w$i")
    // doc 11 shares a 10-word run with history doc 1 (>= k+w-1 = 6 words)
    val docs = Seq(
      (1L, base.mkString(" ")),
      (2L, (100 to 140).map(i => s"x$i").mkString(" ")),
      (11L, ((200 to 230).map(i => s"y$i") ++ base.slice(5, 15)).mkString(" ")),
      (12L, (300 to 340).map(i => s"z$i").mkString(" ")))
      .toDF("doc_id", "text")
    val history = docs.filter(col("doc_id") < 10L)
    val drop = docs.filter(col("doc_id") >= 10L)
    FpStore.build(history, dir)
    val served = FpStore.pairsVsStoreReadOnly(drop, dir)
      .select("doc_a", "doc_b", "n_shared").as[(Long, Long, Long)]
      .collect().map { case (a, b, n) => (math.min(a, b), math.max(a, b), n) }
      .toSet
    // ground truth: the from-scratch miner over history ∪ drop, keeping
    // pairs with at least one drop-side doc
    val scratch = Winnow.nearDupPairsByFingerprint(docs, "doc_id", "text",
        minShared = 2, maxDf = 8)
      .filter(col("doc_a") >= 10L || col("doc_b") >= 10L)
      .select("doc_a", "doc_b", "n_shared").as[(Long, Long, Long)]
      .collect().map { case (a, b, n) => (math.min(a, b), math.max(a, b), n) }
      .toSet
    assert(served === scratch && served.nonEmpty,
      s"store serve must land on the from-scratch answer, got $served vs $scratch")
  }

  test("stop-fingerprint guard counts over history UNION drop") {
    val dir = Files.createTempDirectory("fpstore-df").toString
    val block = rndBytes(7L, 64)
    // block is rare in history (2 carriers) but the drop adds 7 more —
    // df = 9 > maxDf = 8 over the union, so the guard must kill it even
    // though a history-only count (2) would have let it through
    val history = Seq(
      (1L, rndBytes(1L, 200) ++ block),
      (2L, rndBytes(2L, 200) ++ block))
      .toDF("doc_id", "payload")
    FpStore.build(history, dir, contentCol = "payload",
      universe = Store.Universe.PayloadBytes)
    val drop = (10L to 16L).map(i =>
        (i, rndBytes(i * 31L, 100) ++ block))
      .toDF("doc_id", "payload")
    val pairs = FpStore.pairsVsStoreReadOnly(drop, dir, contentCol = "payload")
    // every pair here shares ONLY block-derived fingerprints; with the
    // union-side df at 9 they are all stop-fingerprints → zero pairs.
    // (The block sits at a different random-prefix boundary per doc, so
    // a handful of boundary-window fps can differ per doc — but every
    // SHARED fp comes from the block's interior, carried by all 9 docs.)
    assert(pairs.count() === 0L,
      "a run that turns boilerplate only once the drop lands must be guarded")
  }

  test("cross-universe probes and builds refuse loudly") {
    val dir = Files.createTempDirectory("fpstore-x").toString
    FpStore.build(Seq((1L, "a b c d e f g h")).toDF("doc_id", "text"), dir)
    // text store probed with a binary column
    val binDrop = Seq((2L, rndBytes(1L, 40))).toDF("doc_id", "payload")
    val e1 = intercept[IllegalArgumentException] {
      FpStore.pairsVsStoreReadOnly(binDrop, dir, contentCol = "payload").count()
    }
    assert(e1.getMessage.contains("string column"))
    // bytes store probed with a string column
    val dirB = Files.createTempDirectory("fpstore-xb").toString
    FpStore.build(binDrop, dirB, contentCol = "payload",
      universe = Store.Universe.PayloadBytes)
    val e2 = intercept[IllegalArgumentException] {
      FpStore.pairsVsStoreReadOnly(
        Seq((3L, "a b c")).toDF("doc_id", "text"), dirB).count()
    }
    assert(e2.getMessage.contains("binary column"))
    // and a build whose declared universe contradicts the column type
    val e3 = intercept[IllegalArgumentException] {
      FpStore.build(binDrop, dir, contentCol = "payload")
    }
    assert(e3.getMessage.contains("string column"))
  }

  test("a legacy pre-ledger layout refuses loudly instead of reading as absent") {
    // the r15 layout kept rows in storeDir/fingerprints + _drops; the
    // commit ledger can't read it, and exists() returning false would
    // let every exists-gated face (pairsStream's bootstrap branch, the
    // CLI --fp-store path) silently re-bootstrap a FRESH store and
    // serve all later drops against empty history — no error, just
    // missing pairs (ADVICE r16)
    val dir = Files.createTempDirectory("fpstore-legacy").toString
    Seq((1L, 100L)).toDF("doc_id", "fp")
      .write.parquet(s"$dir/fingerprints")
    val e = intercept[IllegalArgumentException](FpStore.exists(spark, dir))
    assert(e.getMessage.contains("legacy") &&
      e.getMessage.contains("rebuild"), s"got: ${e.getMessage}")
    // the serve faces route through the same guard
    val e2 = intercept[IllegalArgumentException] {
      FpStore.pairsVsStoreReadOnly(
        Seq((2L, "a b c")).toDF("doc_id", "text"), dir)
    }
    assert(e2.getMessage.contains("legacy"))
    // a REAL (ledgered) store next to an unrelated dir is unaffected
    val ok = Files.createTempDirectory("fpstore-ok").toString
    FpStore.build(Seq((1L, "a b c d e f g h")).toDF("doc_id", "text"), ok)
    assert(FpStore.exists(spark, ok))
  }

  test("pairsStream: epoch serve + enroll, exactly-once across a crash replay") {
    import org.apache.spark.sql.DataFrame
    val root = Files.createTempDirectory("fpstream")
    val inDir = s"$root/in"; val ckpt = s"$root/ckpt"
    Files.createDirectories(java.nio.file.Paths.get(inDir))
    val run = (1 to 12).map(i => s"s$i").mkString(" ")
    def addDrop(name: String, df: DataFrame): Unit = {
      val scratch = s"$root/stage-$name"
      df.coalesce(1).write.mode("overwrite").parquet(scratch)
      val part = new java.io.File(scratch).listFiles()
        .filter(_.getName.startsWith("part-")).head
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(s"$inDir/$name.parquet"))
    }
    def start() = FpStore.pairsStream(
      spark.readStream.schema("doc_id LONG, text STRING")
        .option("maxFilesPerTrigger", "1").parquet(inDir),
      s"$root/fp", s"$root/out", ckpt)

    // epoch 0 bootstraps the store; epoch 1 carries a partial copy of a
    // day-1 doc (the shared 12-word run) plus an unrelated doc
    addDrop("day1", Seq(
      (1L, run + " " + (1 to 20).map(i => s"a$i").mkString(" ")),
      (2L, (100 to 130).map(i => s"b$i").mkString(" ")))
      .toDF("doc_id", "text"))
    val q1 = start()
    try {
      q1.processAllAvailable()
      addDrop("day2", Seq(
        (11L, (200 to 220).map(i => s"c$i").mkString(" ") + " " + run),
        (12L, (300 to 330).map(i => s"d$i").mkString(" ")))
        .toDF("doc_id", "text"))
      q1.processAllAvailable()
    } finally q1.stop()
    // the bootstrap epoch emits its INTRA-batch pairs (none here — the
    // two day-1 docs share nothing) rather than silently writing no dir
    assert(spark.read.parquet(s"$root/out/epoch-000000").count() === 0L,
      "bootstrap epoch serves intra-batch pairs; this batch has none")
    val pairs = spark.read.parquet(s"$root/out/epoch-000001")
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs === Set((11L, 1L)))
    assert(FpStore.drops(spark, s"$root/fp") ===
      Seq("epoch-000000", "epoch-000001"))
    val rowsAfter = FpStore.load(spark, s"$root/fp").count()

    // crash replay: delete the last checkpoint commit marker so the
    // restarted query re-runs epoch 1 — the marker guard must skip it
    // (pairs already on disk) and the store must not double
    val commits = new java.io.File(s"$ckpt/commits").listFiles()
      .filter(_.getName.forall(_.isDigit)).sortBy(_.getName.toLong)
    assert(commits.nonEmpty)
    assert(commits.last.delete(), "crash simulation: drop the last commit")
    // the local FS keeps a .crc sidecar per commit file; leaving it
    // behind makes the re-commit's rename fail as a phantom concurrent
    // writer — a real crash loses both together
    new java.io.File(s"$ckpt/commits/.${commits.last.getName}.crc").delete()
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    assert(FpStore.load(spark, s"$root/fp").count() === rowsAfter,
      "a replayed epoch must not re-append fingerprint rows")
    assert(FpStore.drops(spark, s"$root/fp") ===
      Seq("epoch-000000", "epoch-000001"))
  }

  test("pairsStream bootstrap epoch emits INTRA-batch pairs before the store exists") {
    import org.apache.spark.sql.DataFrame
    val root = Files.createTempDirectory("fpstream-b0")
    val inDir = s"$root/in"
    Files.createDirectories(java.nio.file.Paths.get(inDir))
    val run = (1 to 12).map(i => s"p$i").mkString(" ")
    // the very first batch carries a partial copy of ITSELF: doc 2 embeds
    // doc 1's 12-word run — r15 wrote no epoch-0 dir at all, conflating
    // "no history ⇒ no cross pairs" with "no pairs"
    val scratch = s"$root/stage"
    Seq(
      (1L, run + " " + (1 to 20).map(i => s"a$i").mkString(" ")),
      (2L, (100 to 120).map(i => s"b$i").mkString(" ") + " " + run),
      (3L, (200 to 230).map(i => s"c$i").mkString(" ")))
      .toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite").parquet(scratch)
    val part = new java.io.File(scratch).listFiles()
      .filter(_.getName.startsWith("part-")).head
    java.nio.file.Files.move(part.toPath,
      java.nio.file.Paths.get(s"$inDir/day1.parquet"))
    val q = FpStore.pairsStream(
      spark.readStream.schema("doc_id LONG, text STRING").parquet(inDir),
      s"$root/fp", s"$root/out", s"$root/ckpt", availableNow = true)
    try q.awaitTermination() finally q.stop()
    val pairs = spark.read.parquet(s"$root/out/epoch-000000")
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs === Set((1L, 2L)),
      "the intra-batch partial copy, ordered doc_a < doc_b")
    assert(FpStore.drops(spark, s"$root/fp") === Seq("epoch-000000"),
      "enrollment is atomic with the bootstrap commit")
  }

  test("compact: contents identical, marker preserved, file count bounded") {
    val dir = Files.createTempDirectory("fpstore-c").toString
    val docs = (1L to 6L).map(i =>
        (i, (1 to 30).map(j => s"t${i}_$j").mkString(" ")))
      .toDF("doc_id", "text").repartition(6)
    FpStore.build(docs, dir)
    val before = FpStore.load(spark, dir)
      .as[(Long, Long)].collect().toSet
    FpStore.compact(spark, dir, targetFiles = 1)
    val after = FpStore.load(spark, dir).as[(Long, Long)].collect().toSet
    assert(after === before, "compaction must not disturb contents")
    assert(FpStore.storedParams(spark, dir) ===
      FpStore.FpParams(3, 4, Store.Universe.TextWords))
    val files = java.nio.file.Files
      .walk(java.nio.file.Paths.get(FpStore.commitsPath(dir)))
      .iterator()
    val parts = scala.jdk.CollectionConverters.IteratorHasAsScala(files)
      .asScala.count(p => p.toString.contains("/fps/") &&
        p.getFileName.toString.startsWith("part-"))
    assert(parts === 1)
    // the df partials folded to one row per fp: Σcnt per fp over every
    // commit ≡ the fps table's own per-fp doc count (the counter
    // invariant every serve's stop-fingerprint guard depends on)
    val fromCounters = FpStore.counters(spark, dir)
      .groupBy("fp").agg(sum("cnt").as("df"))
      .as[(Long, Long)].collect().toMap
    val fromRows = FpStore.load(spark, dir)
      .groupBy("fp").count().as[(Long, Long)].collect().toMap
    assert(fromCounters === fromRows)
  }

  test("append commit is ONE atomic rename carrying fps, df and docs together") {
    val dir = Files.createTempDirectory("fpstore-atomic").toString
    val base = (1 to 40).map(i => s"w$i")
    FpStore.build(Seq((1L, base.mkString(" "))).toDF("doc_id", "text"), dir)
    val drop = Seq(
      (11L, ((200 to 230).map(i => s"y$i") ++ base.slice(5, 15)).mkString(" ")))
      .toDF("doc_id", "text")
    val (pairs, commit) = FpStore.pairsVsStoreStaged(drop, dir,
      dropId = Some("d1"))
    assert(pairs.count() === 1L)
    // before the commit: nothing visible — no rows, no counters, no
    // enrollment (staging lives OUTSIDE the commits ledger)
    assert(FpStore.load(spark, dir).select("doc_id").distinct().count() === 1L)
    assert(FpStore.drops(spark, dir) === Seq.empty)
    val dfBefore = FpStore.counters(spark, dir)
      .agg(sum("cnt")).as[Long].head()
    commit()
    // after: all three tables and the enrollment marker appeared together
    assert(FpStore.load(spark, dir).select("doc_id").distinct().count() === 2L)
    assert(FpStore.drops(spark, dir) === Seq("d1"))
    assert(FpStore.counters(spark, dir).agg(sum("cnt")).as[Long].head()
      > dfBefore)
    assert(FpStore.enrolledDocs(spark, dir).as[Long].collect().toSet ===
      Set(1L, 11L))
    // a replayed serve of the SAME docs stages only empty tables — the
    // doc-level anti-join against the enrolled set converges exactly
    val (_, commit2) = FpStore.pairsVsStoreStaged(drop, dir,
      dropId = Some("d2"))
    val rowsBefore = FpStore.load(spark, dir).count()
    commit2()
    assert(FpStore.load(spark, dir).count() === rowsBefore,
      "already-enrolled docs must not re-append rows")
  }

  test("takedown recounts the df guard: boilerplate-only-with-removed-docs returns") {
    val dir = Files.createTempDirectory("fpstore-recount").toString
    val block = rndBytes(7L, 64)
    // 8 history carriers + the drop's 1 ⇒ df 9 > maxDf 8: guarded out;
    // after taking down 5 carriers, df 3 + 1 ⇒ the pairs come back
    val history = (1L to 8L).map(i => (i, rndBytes(i * 17L, 100) ++ block))
      .toDF("doc_id", "payload")
    FpStore.build(history, dir, contentCol = "payload",
      universe = Store.Universe.PayloadBytes)
    val drop = Seq((20L, rndBytes(99L, 80) ++ block)).toDF("doc_id", "payload")
    assert(FpStore.pairsVsStoreReadOnly(drop, dir, contentCol = "payload")
      .count() === 0L)
    FpStore.removeDocs(spark, dir, (4L to 8L).toDF("doc_id"))
    val got = FpStore.pairsVsStoreReadOnly(drop, dir, contentCol = "payload")
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(got === Set((20L, 1L), (20L, 2L), (20L, 3L)),
      "the purged history's df guard must recount from the counters")
  }
}
