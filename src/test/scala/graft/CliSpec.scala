package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

class CliSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("Corpus CLI end-to-end: filter -> decontaminate -> dedup -> pack -> sharded write") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = Files.createTempDirectory("corpus")
    val common = (1 to 40).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, common + " tail one"),                                  // near-dup pair with 2
      (2L, common + " tail two"),
      (3L, (100 to 160).map(i => s"v$i").mkString(" ")),           // clean
      (4L, "leaky contains the secret eval trigram here plus filler " +
        (200 to 240).map(i => s"u$i").mkString(" ")),              // contaminated
      (5L, "too short"))                                           // fails min-tokens
      .toDF("doc_id", "text")
    val bench = Seq((100L, "benchmark with the secret eval trigram inside"))
      .toDF("doc_id", "text")
    docs.write.parquet(s"$dir/corpus")
    bench.write.parquet(s"$dir/bench")

    graft.cli.Corpus.run(spark, Array(
      "-I", s"$dir/corpus", "-O", s"$dir/out",
      "--benchmark", s"$dir/bench", "--dedup",
      "--min-tokens", "5", "--pack", "64", "--shards", "2"))

    val out = spark.read.parquet(s"$dir/out")
    // 5 dropped (short), 4 dropped (contaminated), 2 dropped (near-dup of 1)
    assert(out.select("doc_id").as[Long].collect().toSet === Set(1L, 3L))
    assert(out.columns.contains("seq_id") && out.columns.contains("shard"))
    // deterministic: a second run over the same input is identical
    graft.cli.Corpus.run(spark, Array(
      "-I", s"$dir/corpus", "-O", s"$dir/out2",
      "--benchmark", s"$dir/bench", "--dedup",
      "--min-tokens", "5", "--pack", "64", "--shards", "2"))
    val a = out.orderBy("doc_id").collect().toSeq
    val b = spark.read.parquet(s"$dir/out2").orderBy("doc_id").collect().toSeq
    assert(a === b)
  }

  test("Corpus CLI: --fp-store bootstrap, partial-copy pairs on day 2, ticket takedown") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = Files.createTempDirectory("corpus-fp")
    val run10 = (1 to 10).map(i => s"fpr$i").mkString(" ")
    // day 1: one doc carrying the 10-word run, one unrelated
    Seq(
      (1L, run10 + " " + (1 to 20).map(i => s"a$i").mkString(" ")),
      (2L, (100 to 130).map(i => s"b$i").mkString(" ")))
      .toDF("doc_id", "text").write.parquet(s"$dir/day1")
    graft.cli.Corpus.run(spark, Array(
      "-I", s"$dir/day1", "-O", s"$dir/out1",
      "--fp-store", s"$dir/fp"))
    assert(graft.text.FpStore.exists(spark, s"$dir/fp"),
      "bootstrap run builds the store (committed after the output write)")
    assert(!new java.io.File(s"$dir/out1/_fppairs").exists(),
      "no pairs report on the bootstrap run — there is no history yet")

    // day 2: a doc embedding the SAME run inside otherwise-new words —
    // the partial copy the signature store's whole-set similarity misses
    Seq(
      (11L, (200 to 220).map(i => s"c$i").mkString(" ") + " " + run10),
      (12L, (300 to 330).map(i => s"d$i").mkString(" ")))
      .toDF("doc_id", "text").write.parquet(s"$dir/day2")
    graft.cli.Corpus.run(spark, Array(
      "-I", s"$dir/day2", "-O", s"$dir/out2",
      "--fp-store", s"$dir/fp"))
    val pairs = spark.read.parquet(s"$dir/out2/_fppairs")
    assert(pairs.select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
      === Set((11L, 1L)), "the cross-day partial-copy pair, drop doc first")
    // the audit signal does NOT filter the corpus — both day-2 docs ship
    assert(spark.read.parquet(s"$dir/out2").select("doc_id")
      .as[Long].collect().toSet === Set(11L, 12L))
    // and the drop was enrolled: the store now serves day-2 docs as history
    assert(graft.text.FpStore.load(spark, s"$dir/fp")
      .select("doc_id").distinct().count() === 4L,
      "day-1 docs 1,2 plus the appended day-2 docs 11,12")

    // one-ticket takedown purges the fingerprint store too
    Seq(1L).toDF("doc_id").write.parquet(s"$dir/ticket")
    graft.cli.Corpus.run(spark, Array(
      "--fp-store", s"$dir/fp", "--takedown", s"$dir/ticket"))
    assert(graft.text.FpStore.load(spark, s"$dir/fp")
      .filter(col("doc_id") === 1L).count() === 0L)
    // compaction maintains the fp store standalone as well
    graft.cli.Corpus.run(spark, Array(
      "--fp-store", s"$dir/fp", "--compact-store", "1"))
    val fpParts = java.nio.file.Files
      .walk(java.nio.file.Paths.get(graft.text.FpStore.commitsPath(s"$dir/fp")))
      .iterator()
    assert(scala.jdk.CollectionConverters.IteratorHasAsScala(fpParts)
      .asScala.count(p => p.toString.contains("/fps/") &&
        p.getFileName.toString.startsWith("part-")) === 1)
  }

  test("Corpus CLI: --hash-store bootstrap, re-upload pairs on day 2, both ticket kinds") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    import graft.multimodal.HashStore
    val dir = Files.createTempDirectory("corpus-hash")
    def blob(seed: Int): Array[Byte] = {
      var x = seed * 0x9E3779B97F4A7C15L
      Array.fill(300) {
        x = x * 6364136223846793005L + 1442695040888963407L
        (x >>> 33).toByte
      }
    }
    // day 1: two docs with binary payloads (text rides along for the
    // pipeline's token accounting)
    Seq(
      (1L, "alpha doc one " + (1 to 20).map(i => s"a$i").mkString(" "), blob(1)),
      (2L, "beta doc two " + (1 to 20).map(i => s"b$i").mkString(" "), blob(2)))
      .toDF("doc_id", "text", "payload").write.parquet(s"$dir/day1")
    graft.cli.Corpus.run(spark, Array(
      "-I", s"$dir/day1", "-O", s"$dir/out1",
      "--hash-store", s"$dir/hs", "--payload-col", "payload"))
    assert(HashStore.exists(spark, s"$dir/hs"),
      "bootstrap run builds the hash store")
    // the bootstrap emits its INTRA-drop pairs (a day-1 drop can carry
    // re-encodes of itself — ADVICE r16); day 1's payloads are distinct,
    // so the report exists and is empty
    assert(spark.read.parquet(s"$dir/out1/_hashpairs").count() === 0L,
      "bootstrap pairs report must exist (intra-drop mine) and be empty here")

    // day 2: doc 11 re-uploads doc 1's exact payload under a new id
    Seq(
      (11L, "gamma doc " + (1 to 20).map(i => s"c$i").mkString(" "), blob(1)),
      (12L, "delta doc " + (1 to 20).map(i => s"d$i").mkString(" "), blob(9)))
      .toDF("doc_id", "text", "payload").write.parquet(s"$dir/day2")
    graft.cli.Corpus.run(spark, Array(
      "-I", s"$dir/day2", "-O", s"$dir/out2",
      "--hash-store", s"$dir/hs", "--payload-col", "payload"))
    val pairs = spark.read.parquet(s"$dir/out2/_hashpairs")
      .select("doc_a", "doc_b", "modality").as[(Long, Long, String)]
      .collect().toSet
    assert(pairs.contains((11L, 1L, "bytes")),
      s"the re-uploaded payload pairs against day-1 history: $pairs")
    assert(HashStore.load(spark, s"$dir/hs")
      .select("doc_id").distinct().count() === 4L,
      "day-2 docs enrolled after the pairs report")

    // doc_id ticket purges the doc's hash rows
    Seq(1L).toDF("doc_id").write.parquet(s"$dir/ticket-doc")
    graft.cli.Corpus.run(spark, Array(
      "--hash-store", s"$dir/hs", "--takedown", s"$dir/ticket-doc"))
    assert(HashStore.load(spark, s"$dir/hs")
      .filter(col("doc_id") === 1L).count() === 0L)

    // drop_id ticket removes a whole enrolled drop (the ledgered surface)
    val dropIds = HashStore.load(spark, s"$dir/hs")
      .filter(col("doc_id") === 11L).select("drop_id")
      .as[String].distinct().collect()
    assert(dropIds.length === 1, "doc 11 belongs to exactly the day-2 drop")
    Seq(dropIds.head).toDF("drop_id").write.parquet(s"$dir/ticket-drop")
    graft.cli.Corpus.run(spark, Array(
      "--hash-store", s"$dir/hs", "--takedown", s"$dir/ticket-drop"))
    assert(HashStore.load(spark, s"$dir/hs")
      .filter(col("doc_id") === 11L).count() === 0L,
      "a drop_id ticket removes the enrolled drop's rows")
  }

  test("Corpus CLI: bootstrap intra-drop pairs; --retrieve-clips probes the stamped audio_win leg") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    import graft.multimodal.HashStore
    import javax.sound.sampled._
    // the MultimodalSpec retrieval waveform family: deterministic
    // amplitude envelope over a fixed carrier, 8 kHz 16-bit mono WAV
    def fa(i: Int): Int =
      (((i / 100) * 2654435761L % 97 + 3) * ((i % 17) - 8) * 16).toInt
    def fb(i: Int): Int =
      (((i / 100 * 40503L + 7) % 101) * ((i % 23) - 11) * 16).toInt
    def wavOf(f: Int => Int, from: Int, until: Int): Array[Byte] = {
      val n = until - from
      val pcm = new Array[Byte](n * 2)
      var i = 0
      while (i < n) {
        val v = f(from + i)
        pcm(2 * i) = (v & 0xff).toByte
        pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
        i += 1
      }
      val baos = new java.io.ByteArrayOutputStream()
      AudioSystem.write(new AudioInputStream(
        new java.io.ByteArrayInputStream(pcm),
        new AudioFormat(8000f, 16, 1, true, false), n.toLong),
        AudioFileFormat.Type.WAVE, baos)
      baos.toByteArray
    }
    val dir = Files.createTempDirectory("corpus-clips")
    // day 1 bootstrap: track 2 is a byte-identical copy of track 1 — the
    // intra-drop mine must surface it even though there is no history yet
    val t1 = wavOf(fa, 0, 6500)
    Seq(
      (1L, "track one " + (1 to 20).map(i => s"a$i").mkString(" "), t1),
      (2L, "track two " + (1 to 20).map(i => s"b$i").mkString(" "), t1),
      (3L, "track three " + (1 to 20).map(i => s"c$i").mkString(" "),
        wavOf(fb, 0, 6500)))
      .toDF("doc_id", "text", "payload").write.parquet(s"$dir/day1")
    graft.cli.Corpus.run(spark, Array(
      "-I", s"$dir/day1", "-O", s"$dir/out1",
      "--hash-store", s"$dir/hs", "--payload-col", "payload",
      "--hash-modalities", "audio,bytes,audio_win", "--hash-win", "2048"))
    val boot = spark.read.parquet(s"$dir/out1/_hashpairs")
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(boot.contains((1L, 2L)),
      s"the day-1 twin must surface in the bootstrap intra-drop mine: $boot")
    assert(!boot.exists(p => p._1 == 3L || p._2 == 3L),
      s"the unrelated track must not pair: $boot")
    // the recipe is stamped: enrolled legs + the audio_win window size
    assert(HashStore.storedRecipe(spark, s"$dir/hs") ===
      Some(HashStore.Recipe(Set("audio", "bytes", "audio_win"), Some(2048), None, None)))
    // the probe: track 1 TRIMMED at two hops — whole-clip hashes miss it,
    // the retrieval leg finds both byte-identical enrolled copies; the
    // window size comes from the stamp (no --hash-win on the probe run)
    Seq((100L, "probe clip " + (1 to 20).map(i => s"p$i").mkString(" "),
        wavOf(fa, 2048, 6500)))
      .toDF("doc_id", "text", "payload").write.parquet(s"$dir/clips")
    graft.cli.Corpus.run(spark, Array(
      "-I", s"$dir/clips", "-O", s"$dir/outp",
      "--retrieve-clips", s"$dir/hs", "--payload-col", "payload"))
    val got = spark.read.parquet(s"$dir/outp/_retrieved")
      .select("probe_id", "doc_id").as[(Long, Long)].collect().toSet
    assert(got === Set((100L, 1L), (100L, 2L)),
      s"the trimmed clip retrieves exactly its track (and its enrolled " +
        s"byte-identical copy): $got")
    // a contradicting --hash-win on the probe run refuses loudly instead
    // of silently retrieving nothing
    val e = intercept[IllegalArgumentException](graft.cli.Corpus.run(spark,
      Array("-I", s"$dir/clips", "-O", s"$dir/outp2",
        "--retrieve-clips", s"$dir/hs", "--payload-col", "payload",
        "--hash-win", "4096")))
    assert(e.getMessage.contains("2048"), s"got: ${e.getMessage}")
  }

  test("Corpus CLI: --hash-bwin enrolls the bytes_win leg; --retrieve-spans probes by the stamp") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    import graft.multimodal.HashStore
    def bytesOf(seed: Long, n: Int): Array[Byte] =
      Array.tabulate(n)(i => ((i * seed + 11) % 251).toByte)
    val target = bytesOf(2654435761L, 400)
    val dir = Files.createTempDirectory("corpus-spans")
    Seq(
      (1L, "doc one " + (1 to 20).map(i => s"a$i").mkString(" "), target),
      (3L, "doc three " + (1 to 20).map(i => s"c$i").mkString(" "),
        bytesOf(40503L, 400)))
      .toDF("doc_id", "text", "payload").write.parquet(s"$dir/day1")
    graft.cli.Corpus.run(spark, Array(
      "-I", s"$dir/day1", "-O", s"$dir/out1",
      "--hash-store", s"$dir/hs", "--payload-col", "payload",
      "--hash-modalities", "bytes_win", "--hash-bwin", "64"))
    // the recipe stamps the byte-window size next to the enrolled leg
    assert(HashStore.storedRecipe(spark, s"$dir/hs") ===
      Some(HashStore.Recipe(Set("bytes_win"), None, None, Some(64))))
    // the probe: doc 1's payload trimmed by one hop (32 bytes) — the
    // window size comes from the stamp (no --hash-bwin on the probe run)
    Seq((100L, "probe span " + (1 to 20).map(i => s"p$i").mkString(" "),
        target.drop(32)))
      .toDF("doc_id", "text", "payload").write.parquet(s"$dir/spans")
    graft.cli.Corpus.run(spark, Array(
      "-I", s"$dir/spans", "-O", s"$dir/outp",
      "--retrieve-spans", s"$dir/hs", "--payload-col", "payload"))
    val got = spark.read.parquet(s"$dir/outp/_retrieved_span")
      .select("probe_id", "doc_id", "n_matched")
      .as[(Long, Long, Long)].collect().toSet
    assert(got === Set((100L, 1L, 10L)),
      s"the trimmed span retrieves exactly its source payload: $got")
    // a contradicting --hash-bwin on the probe run refuses loudly
    val e = intercept[IllegalArgumentException](graft.cli.Corpus.run(spark,
      Array("-I", s"$dir/spans", "-O", s"$dir/outp2",
        "--retrieve-spans", s"$dir/hs", "--payload-col", "payload",
        "--hash-bwin", "128")))
    assert(e.getMessage.contains("64"), s"got: ${e.getMessage}")
  }

  test("Corpus CLI: --hash-stream drains media drops as epochs on the hash ledger") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    import graft.multimodal.HashStore
    def bytesOf(seed: Long, n: Int): Array[Byte] =
      Array.tabulate(n)(i => ((i * seed + 11) % 251).toByte)
    val target = bytesOf(2654435761L, 300)
    val dir = Files.createTempDirectory("corpus-hashstream")
    val inDir = s"$dir/in"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(inDir))
    def addDrop(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val scratch = s"$dir/stage-$name"
      df.coalesce(1).write.mode("overwrite").parquet(scratch)
      val part = new java.io.File(scratch).listFiles()
        .filter(_.getName.startsWith("part-")).head
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(s"$inDir/$name.parquet"))
    }
    def drain(): Unit = graft.cli.Corpus.run(spark, Array(
      "-I", inDir, "-O", s"$dir/out", "--payload-col", "payload",
      "--hash-modalities", "bytes",
      "--hash-store", s"$dir/hs", "--hash-stream", s"$dir/ckpt"))

    // epoch 0 bootstraps the store AND carries a copy of itself
    addDrop("day1", Seq((1L, "d1", target), (2L, "d2", target),
      (3L, "d3", bytesOf(40503L, 300))).toDF("doc_id", "text", "payload"))
    drain()
    assert(spark.read.parquet(s"$dir/out/_hashpairs/epoch-000000")
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet ===
      Set((1L, 2L)), "bootstrap intra-batch copy")
    assert(HashStore.drops(spark, s"$dir/hs") === Set("epoch-000000"))
    assert(HashStore.storedRecipe(spark, s"$dir/hs") ===
      Some(HashStore.Recipe(Set("bytes"), None, None, None)))

    // day 2 lands later; a fresh cron invocation picks up ONLY it
    addDrop("day2", Seq((11L, "d11", target),
      (12L, "d12", bytesOf(97L, 300))).toDF("doc_id", "text", "payload"))
    drain()
    assert(spark.read.parquet(s"$dir/out/_hashpairs/epoch-000001")
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet ===
      Set((11L, 1L), (11L, 2L)), "drop doc first vs both carriers")
    val rows = HashStore.load(spark, s"$dir/hs").count()

    // a third drain with nothing new: no epochs, no store growth
    drain()
    assert(HashStore.load(spark, s"$dir/hs").count() === rows)
    assert(HashStore.drops(spark, s"$dir/hs") ===
      Set("epoch-000000", "epoch-000001"))
  }

  test("Corpus CLI: --fp-stream drains drops as epochs; a restart skips the enrolled ones") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = Files.createTempDirectory("corpus-fpstream")
    val inDir = s"$dir/in"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(inDir))
    val run10 = (1 to 10).map(i => s"fsr$i").mkString(" ")
    def addDrop(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val scratch = s"$dir/stage-$name"
      df.coalesce(1).write.mode("overwrite").parquet(scratch)
      val part = new java.io.File(scratch).listFiles()
        .filter(_.getName.startsWith("part-")).head
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(s"$inDir/$name.parquet"))
    }
    def drain(): Unit = graft.cli.Corpus.run(spark, Array(
      "-I", inDir, "-O", s"$dir/out",
      "--fp-store", s"$dir/fp", "--fp-stream", s"$dir/ckpt"))

    // epoch 0 bootstraps the store (intra-batch pairs: none here)
    addDrop("day1", Seq(
      (1L, run10 + " " + (1 to 20).map(i => s"a$i").mkString(" ")),
      (2L, (100 to 130).map(i => s"b$i").mkString(" ")))
      .toDF("doc_id", "text"))
    drain()
    assert(spark.read.parquet(s"$dir/out/_fppairs/epoch-000000").count() === 0L)
    assert(graft.text.FpStore.drops(spark, s"$dir/fp") === Seq("epoch-000000"))

    // day 2 lands later; a fresh cron invocation picks up ONLY it
    addDrop("day2", Seq(
      (11L, (200 to 220).map(i => s"c$i").mkString(" ") + " " + run10),
      (12L, (300 to 330).map(i => s"d$i").mkString(" ")))
      .toDF("doc_id", "text"))
    drain()
    val pairs = spark.read.parquet(s"$dir/out/_fppairs/epoch-000001")
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs === Set((11L, 1L)), "cross-epoch partial copy, drop doc first")
    assert(graft.text.FpStore.drops(spark, s"$dir/fp") ===
      Seq("epoch-000000", "epoch-000001"))
    val rows = graft.text.FpStore.load(spark, s"$dir/fp").count()

    // a third drain with nothing new: no epochs, no store growth
    drain()
    assert(graft.text.FpStore.load(spark, s"$dir/fp").count() === rows)
    assert(graft.text.FpStore.drops(spark, s"$dir/fp") ===
      Seq("epoch-000000", "epoch-000001"))
  }

  test("Corpus CLI: --fp-store is refused on the convenience pipeline faces") {
    // pipelineWithHandles has no slot for the pairs and commits before
    // any caller output write — enrolling there would discard the drop's
    // evidence unrecoverably (ADVICE r15): loud refusal, not a silent
    // commit-first append
    val e = intercept[IllegalArgumentException] {
      graft.cli.Corpus.pipelineWithHandles(spark, graft.cli.Corpus.Args(
        input = "/nonexistent", out = "/nonexistent-out",
        fpStore = Some("/nonexistent-store")))
    }
    assert(e.getMessage.contains("pipelineFull"))
  }

  test("Corpus CLI: --freq-width builds at a non-default width, serves by the stamp, refuses a mixed-width append") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = Files.createTempDirectory("corpus-freqw")
    def drop(name: String, ids: Range) = ids.map(i =>
        (i.toLong, (1 to 25).map(j => s"$name${i}_$j").mkString(" ")))
      .toDF("doc_id", "text")
    drop("a", 1 to 8).write.parquet(s"$dir/day1")
    graft.cli.Corpus.run(spark, Array(
      "-I", s"$dir/day1", "-O", s"$dir/out1",
      "--freq-store", s"$dir/freq", "--freq-width", "4096",
      "--drop-id", "d1"))
    assert(graft.text.FreqStore.storedWidth(spark, s"$dir/freq") === 4096,
      "the bootstrap width is the store's width for life")
    // serve derives its probe hashing from the STAMP: a point estimate
    // through the store equals the from-scratch sketch at w=4096
    val probes = Seq("a1_1 a1_2 a1_3").toDF("term")
    val viaStore = graft.text.FreqStore.serveEstimates(spark, probes,
      s"$dir/freq").select("est").as[Long].head()
    val scratch = graft.text.FreqSketch.estimates(
      graft.text.FreqSketch.counters(
        graft.text.FreqSketch.grams(spark.read.parquet(s"$dir/day1")),
        width = 4096),
      probes, width = 4096).select("est").as[Long].head()
    assert(viaStore === scratch && viaStore >= 1L)
    // a contradicting explicit width on append refuses loudly
    drop("b", 100 to 107).write.parquet(s"$dir/day2")
    val e = intercept[IllegalArgumentException] {
      graft.cli.Corpus.run(spark, Array(
        "-I", s"$dir/day2", "-O", s"$dir/out2",
        "--freq-store", s"$dir/freq", "--freq-width", "1024",
        "--drop-id", "d2"))
    }
    assert(e.getMessage.contains("contradicts the store's stamped width"))
    // same width (or no flag) appends normally
    graft.cli.Corpus.run(spark, Array(
      "-I", s"$dir/day2", "-O", s"$dir/out2",
      "--freq-store", s"$dir/freq", "--freq-width", "4096",
      "--drop-id", "d2"))
    assert(graft.text.FreqStore.drops(spark, s"$dir/freq").toSet ===
      Set("d1", "d2"))
    // auto derives a floored width on a tiny bootstrap corpus
    graft.cli.Corpus.run(spark, Array(
      "-I", s"$dir/day1", "-O", s"$dir/out3",
      "--freq-store", s"$dir/freq-auto", "--freq-width", "auto",
      "--drop-id", "d1"))
    assert(graft.text.FreqStore.storedWidth(spark, s"$dir/freq-auto") === 1024,
      "200 occurrences at target 1000 floors at the 1024 default")
  }

  test("Corpus CLI: explicit token bounds on a binary-only drop refuse loudly") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = Files.createTempDirectory("corpus-binbounds")
    Seq((1L, Array[Byte](1, 2, 3, 4, 5, 6, 7, 8)))
      .toDF("doc_id", "blob").write.parquet(s"$dir/drop")
    val e = intercept[IllegalArgumentException] {
      graft.cli.Corpus.run(spark, Array(
        "-I", s"$dir/drop", "-O", s"$dir/out",
        "--payload-col", "blob", "--min-tokens", "5",
        "--dedup-store", s"$dir/sig"))
    }
    assert(e.getMessage.contains("need a text column"),
      "a requested gate must never be silently dropped")
  }

  test("Corpus CLI: --manifest certifies byte-identical re-runs via the fingerprint table") {
    import spark.implicits._
    val dir = Files.createTempDirectory("corpus-manifest")
    (1L to 20L).map(i => (i, (1 to 20).map(j => s"m${i}_$j").mkString(" ")))
      .toDF("doc_id", "text").write.parquet(s"$dir/corpus")
    def run(out: String) = graft.cli.Corpus.run(spark, Array(
      "-I", s"$dir/corpus", "-O", s"$dir/$out", "--manifest", "--shards", "4"))
    run("out1"); run("out2")
    def mf(out: String) = spark.read.parquet(s"$dir/$out/_manifest")
      .as[(Int, Long, Long, Long)].collect().toSet
    val m1 = mf("out1")
    assert(m1.toSeq.map(_._2).sum === 20L, "manifest covers every written row")
    assert(m1 === mf("out2"),
      "two identical builds must produce the identical certificate")
    // the manifest rides next to the corpus but never inside it
    assert(!spark.read.parquet(s"$dir/out1").columns.contains("xor_fp"))
  }

  test("Corpus CLI: --dedup-store two-drop pipeline dedups drop 2 against drop 1's store") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = Files.createTempDirectory("corpus-store")
    val keep = (1 to 30).map(i => s"k$i").mkString(" ")
    val uniq = (50 to 80).map(i => s"u$i").mkString(" ")
    Seq((1L, keep), (2L, keep), (3L, uniq))          // 2 intra-dups 1
      .toDF("doc_id", "text").write.parquet(s"$dir/drop1")
    Seq((10L, keep), (11L, (200 to 230).map(i => s"n$i").mkString(" ")))
      .toDF("doc_id", "text").write.parquet(s"$dir/drop2")

    // drop 1 bootstraps the store (intra-dedup first: 2 never enters it)
    graft.cli.Corpus.run(spark, Array(
      "-I", s"$dir/drop1", "-O", s"$dir/out1", "--dedup-store", s"$dir/store"))
    assert(spark.read.parquet(s"$dir/out1").select("doc_id").as[Long]
      .collect().toSet === Set(1L, 3L))
    assert(graft.text.Store.load(spark, s"$dir/store").count() === 2L)

    // drop 2: doc 10 dups STORED doc 1 — dropped without drop 1 being
    // re-read (only the store is consulted); 11 survives and is appended
    graft.cli.Corpus.run(spark, Array(
      "-I", s"$dir/drop2", "-O", s"$dir/out2", "--dedup-store", s"$dir/store"))
    assert(spark.read.parquet(s"$dir/out2").select("doc_id").as[Long]
      .collect().toSet === Set(11L))
    assert(graft.text.Store.load(spark, s"$dir/store")
      .select("doc_id").as[Long].collect().toSet === Set(1L, 3L, 11L))
  }

  test("Corpus CLI: --payload-col runs the two-drop store pipeline over the BYTES universe") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = Files.createTempDirectory("corpus-binstore")
    // aperiodic per-seed blobs (StoreSpec's generator): truncations are
    // near-dups, different seeds share zero byte shingles
    def blob(seed: Int, n: Int = 400): Array[Byte] = {
      var x = seed * 0x9E3779B97F4A7C15L
      Array.fill(n) {
        x = x * 6364136223846793005L + 1442695040888963407L
        (x >>> 33).toByte
      }
    }
    // binary-only drops: no text column — the token gate is skipped
    Seq((1L, blob(1)), (2L, blob(1).take(384)), (3L, blob(3)))
      .toDF("doc_id", "payload").write.parquet(s"$dir/drop1")
    Seq((10L, blob(1).take(390)), (11L, blob(9)))
      .toDF("doc_id", "payload").write.parquet(s"$dir/drop2")

    // drop 1 bootstraps: 2 is an intra-drop truncation dup of 1
    graft.cli.Corpus.run(spark, Array(
      "-I", s"$dir/drop1", "-O", s"$dir/out1",
      "--dedup-store", s"$dir/store", "--payload-col", "payload"))
    assert(spark.read.parquet(s"$dir/out1").select("doc_id").as[Long]
      .collect().toSet === Set(1L, 3L))
    assert(graft.text.Store.storedUniverse(spark, s"$dir/store") ===
      graft.text.Store.Universe.PayloadBytes)

    // drop 2: 10 is a truncation of STORED 1 — dropped via the store
    // (marker-driven byte prep, no flag repetition needed for the
    // universe); 11 is unrelated — survives and is appended
    graft.cli.Corpus.run(spark, Array(
      "-I", s"$dir/drop2", "-O", s"$dir/out2",
      "--dedup-store", s"$dir/store", "--payload-col", "payload"))
    assert(spark.read.parquet(s"$dir/out2").select("doc_id").as[Long]
      .collect().toSet === Set(11L))
    assert(graft.text.Store.load(spark, s"$dir/store")
      .select("doc_id").as[Long].collect().toSet === Set(1L, 3L, 11L))

    // one-ticket takedown purges the binary store like any text store
    // and PRESERVES the universe marker
    Seq(Tuple1(1L)).toDF("doc_id").write.parquet(s"$dir/ticket")
    graft.cli.Corpus.run(spark, Array(
      "--dedup-store", s"$dir/store", "--takedown-ids", s"$dir/ticket"))
    assert(graft.text.Store.load(spark, s"$dir/store")
      .select("doc_id").as[Long].collect().toSet === Set(3L, 11L))
    assert(graft.text.Store.storedUniverse(spark, s"$dir/store") ===
      graft.text.Store.Universe.PayloadBytes)
    // a re-run of 1's truncation now survives — never-ingested semantics
    Seq((20L, blob(1).take(390))).toDF("doc_id", "payload")
      .write.parquet(s"$dir/drop3")
    graft.cli.Corpus.run(spark, Array(
      "-I", s"$dir/drop3", "-O", s"$dir/out3",
      "--dedup-store", s"$dir/store", "--payload-col", "payload"))
    assert(spark.read.parquet(s"$dir/out3").select("doc_id").as[Long]
      .collect().toSet === Set(20L))
  }

  test("Corpus CLI: --compact-store rewrites the appended store into one file, contents identical") {
    import spark.implicits._
    val dir = Files.createTempDirectory("corpus-compact")
    def drop(id: Long) =
      Seq((id, (1 to 30).map(i => s"w${id}_$i").mkString(" ")))
        .toDF("doc_id", "text")
    drop(1L).write.parquet(s"$dir/drop1")
    drop(2L).write.parquet(s"$dir/drop2")
    graft.cli.Corpus.run(spark, Array(
      "-I", s"$dir/drop1", "-O", s"$dir/out1", "--dedup-store", s"$dir/store"))
    graft.cli.Corpus.run(spark, Array(
      "-I", s"$dir/drop2", "-O", s"$dir/out2", "--dedup-store", s"$dir/store"))
    def partFiles = new java.io.File(
      graft.text.Store.sigPath(s"$dir/store"))
      .listFiles().count(_.getName.startsWith("part-"))
    assert(partFiles > 1, "two drops must have left multiple part files")
    val before = graft.text.Store.load(spark, s"$dir/store")
      .select("doc_id").as[Long].collect().toSet

    // standalone maintenance invocation: no -I/-O, just the store
    graft.cli.Corpus.run(spark, Array(
      "--dedup-store", s"$dir/store", "--compact-store", "1"))
    assert(partFiles === 1, "compaction must funnel to the target file count")
    assert(graft.text.Store.load(spark, s"$dir/store")
      .select("doc_id").as[Long].collect().toSet === before,
      "compaction must not disturb a single row")

    // in-run maintenance: a third drop with --compact-store stays compact
    drop(3L).write.parquet(s"$dir/drop3")
    graft.cli.Corpus.run(spark, Array(
      "-I", s"$dir/drop3", "-O", s"$dir/out3",
      "--dedup-store", s"$dir/store", "--compact-store", "1"))
    assert(partFiles === 1)
    assert(graft.text.Store.load(spark, s"$dir/store")
      .select("doc_id").as[Long].collect().toSet === (before + 3L),
      "the appended survivor must be inside the compacted store")
  }

  test("Corpus CLI: standalone takedown — --takedown-ids purges the signature store, --lm-remove-drop the LM store") {
    import spark.implicits._
    val dir = Files.createTempDirectory("corpus-takedown")
    val keep = (1 to 30).map(i => s"k$i").mkString(" ")
    val uniq = (50 to 80).map(i => s"u$i").mkString(" ")
    Seq((1L, keep), (3L, uniq)).toDF("doc_id", "text")
      .write.parquet(s"$dir/drop1")
    graft.cli.Corpus.run(spark, Array(
      "-I", s"$dir/drop1", "-O", s"$dir/out1", "--dedup-store", s"$dir/store"))

    // takedown ticket: purge doc 1, then its incoming dup must survive
    Seq(1L).toDF("doc_id").write.parquet(s"$dir/ticket")
    graft.cli.Corpus.run(spark, Array(
      "--dedup-store", s"$dir/store", "--takedown-ids", s"$dir/ticket"))
    assert(graft.text.Store.load(spark, s"$dir/store")
      .select("doc_id").as[Long].collect().toSet === Set(3L))
    Seq((10L, keep)).toDF("doc_id", "text").write.parquet(s"$dir/drop2")
    graft.cli.Corpus.run(spark, Array(
      "-I", s"$dir/drop2", "-O", s"$dir/out2", "--dedup-store", s"$dir/store"))
    assert(spark.read.parquet(s"$dir/out2").select("doc_id").as[Long]
      .collect().toSet === Set(10L), "post-takedown serve == never-ingested")

    // LM store takedown: drop removed, id freed
    graft.text.LmStore.build(
      Seq((1L, "a b c d")).toDF("doc_id", "text"), s"$dir/lm", "d1")
    graft.text.LmStore.append(
      Seq((2L, "x y z w")).toDF("doc_id", "text"), s"$dir/lm", "d2")
    graft.cli.Corpus.run(spark, Array(
      "--lm-store", s"$dir/lm", "--lm-remove-drop", "d2"))
    assert(graft.text.LmStore.drops(spark, s"$dir/lm") === Set("d1"))

    // takedown flags are standalone-only: combining one with -I/-O must
    // fail loudly, never run the pipeline while skipping the removal
    val e = intercept[IllegalArgumentException] {
      graft.cli.Corpus.run(spark, Array(
        "-I", s"$dir/drop2", "-O", s"$dir/out3",
        "--dedup-store", s"$dir/store", "--takedown-ids", s"$dir/ticket"))
    }
    assert(e.getMessage.contains("standalone"))
    // and a combined standalone takedown + compaction does BOTH
    Seq(3L).toDF("doc_id").write.parquet(s"$dir/ticket2")
    graft.cli.Corpus.run(spark, Array(
      "--dedup-store", s"$dir/store", "--takedown-ids", s"$dir/ticket2",
      "--compact-store", "1"))
    assert(graft.text.Store.load(spark, s"$dir/store")
      .select("doc_id").as[Long].collect().toSet === Set(10L))
    assert(new java.io.File(graft.text.Store.sigPath(s"$dir/store"))
      .listFiles().count(_.getName.startsWith("part-")) === 1)
  }

  test("Corpus CLI: --novelty-store scores each drop vs history and grows the gram ledger") {
    import spark.implicits._
    val dir = Files.createTempDirectory("corpus-novelty")
    docsOf(1L -> "alpha beta gamma delta").write.parquet(s"$dir/drop1")
    // drop 2: doc 10 repeats drop 1's opening trigram, doc 11 is fresh
    docsOf(10L -> "alpha beta gamma", 11L -> "eps zeta eta theta")
      .write.parquet(s"$dir/drop2")
    def run(in: String, out: String) = graft.cli.Corpus.run(spark, Array(
      "-I", s"$dir/$in", "-O", s"$dir/$out", "--novelty-store", s"$dir/store"))
    run("drop1", "out1") // bootstrap: no _novelty yet (nothing to compare)
    assert(!new java.io.File(s"$dir/out1/_novelty").exists())
    run("drop2", "out2")
    val nov = spark.read.parquet(s"$dir/out2/_novelty")
      .select("doc_id", "n_novel", "n_grams").as[(Long, Long, Long)]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(nov(10L) === ((0L, 1L)), "the repeated trigram is owned by drop 1")
    assert(nov(11L) === ((2L, 2L)), "fresh content is fully novel")
    assert(graft.text.GramStore.drops(spark, s"$dir/store").size === 2)
    // standalone takedown frees drop 1's ownership
    val d1Id = graft.text.GramStore.drops(spark, s"$dir/store")
    graft.cli.Corpus.run(spark, Array("--novelty-store", s"$dir/store",
      "--novelty-remove-drop",
      d1Id.find(_ != novDropId(s"$dir/drop2")).get))
    assert(graft.text.GramStore.drops(spark, s"$dir/store") ===
      Set(novDropId(s"$dir/drop2")))
  }

  private def docsOf(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  /** The CLI's deterministic drop id for an input path. */
  private def novDropId(input: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    "drop-" + md.digest(input.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(12)
  }

  test("Corpus CLI: --dup-graph-stats emits the per-source triangle census before dedup") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = Files.createTempDirectory("corpus-dupgraph")
    val tmpl = (1 to 30).map(i => s"t$i").mkString(" ")
    val docs = Seq(
      (1L, "tmpl", tmpl), (2L, "tmpl", tmpl), (3L, "tmpl", tmpl), // dup triangle
      (4L, "web", (50 to 80).map(i => s"w$i").mkString(" ")))     // clean
      .toDF("doc_id", "source", "text")
    docs.write.parquet(s"$dir/corpus")
    graft.cli.Corpus.run(spark, Array(
      "-I", s"$dir/corpus", "-O", s"$dir/out",
      "--dedup", "--dup-graph-stats", "source"))
    val stats = spark.read.parquet(s"$dir/out/_dupgraph")
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(stats("tmpl") === (("tmpl", 3L, 3L, 1L)),
      "the template family censuses as one dup triangle")
    assert(!stats.contains("web"), "clean sources have no dup edges")
    // the diagnostic ran BEFORE dedup: training output keeps only doc 1 of
    // the family, yet the census saw all three
    assert(spark.read.parquet(s"$dir/out").select("doc_id").as[Long]
      .collect().toSet === Set(1L, 4L))
  }

  test("Corpus CLI: --span-stats censuses the pasted paragraph doc-level dedup misses") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = Files.createTempDirectory("corpus-spans")
    val pasted = (1 to 10).map(i => s"p$i").mkString(" ") // 10-token shared block
    val docs = Seq(
      // two otherwise-unique docs sharing only the pasted block — NOT
      // near-dups (Jaccard way below 0.7), so --dedup keeps both
      (1L, (100 to 140).map(i => s"a$i").mkString(" ") + " " + pasted),
      (2L, pasted + " " + (200 to 240).map(i => s"b$i").mkString(" ")),
      (3L, (300 to 340).map(i => s"c$i").mkString(" ")))
      .toDF("doc_id", "text")
    docs.write.parquet(s"$dir/corpus")
    graft.cli.Corpus.run(spark, Array(
      "-I", s"$dir/corpus", "-O", s"$dir/out", "--dedup", "--span-stats"))
    // dedup kept all three (substring overlap is invisible to it)...
    assert(spark.read.parquet(s"$dir/out").select("doc_id").as[Long]
      .collect().toSet === Set(1L, 2L, 3L))
    // ...but the span census found the 10-token pasted block in both docs
    val stats = spark.read.parquet(s"$dir/out/_spanstats")
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(stats(1L)._2 === 1L && stats(1L)._3 === 10L && stats(1L)._4 === 2L)
    assert(stats(2L)._2 === 1L && stats(2L)._3 === 10L)
    assert(!stats.contains(3L), "clean docs emit no span rows")
  }

  test("Corpus CLI: eval carve-out + mixture weights are disjoint, exact, deterministic") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = Files.createTempDirectory("corpus-mix")
    val docs = (1 to 60).map { i =>
      val src = if (i % 2 == 0) "web" else "books"
      (i.toLong, src, (1 to 30).map(j => s"t$i-$j").mkString(" "))
    }.toDF("doc_id", "source", "text")
    docs.write.parquet(s"$dir/corpus")

    graft.cli.Corpus.run(spark, Array(
      "-I", s"$dir/corpus", "-O", s"$dir/out",
      "--eval-k", "3", "--eval-by", "source",
      "--mixture", "web=1000,books=0"))

    val eval = spark.read.parquet(s"$dir/out/_eval")
    val train = spark.read.parquet(s"$dir/out")
    // exactly 3 eval docs per stratum, both strata present
    assert(eval.groupBy("source").count().as[(String, Long)].collect().toSet ===
      Set(("web", 3L), ("books", 3L)))
    // train and eval are disjoint; _eval did not leak into the train read
    val evalIds = eval.select("doc_id").as[Long].collect().toSet
    val trainIds = train.select("doc_id").as[Long].collect().toSet
    assert((trainIds & evalIds).isEmpty)
    // mixture: every remaining books doc dropped, all remaining web kept
    assert(train.filter(col("source") === "books").count() === 0)
    assert(trainIds === (2L to 60L by 2).toSet -- evalIds)
    // deterministic: the carve-out repeats identically
    graft.cli.Corpus.run(spark, Array(
      "-I", s"$dir/corpus", "-O", s"$dir/out2",
      "--eval-k", "3", "--eval-by", "source",
      "--mixture", "web=1000,books=0"))
    assert(spark.read.parquet(s"$dir/out2/_eval").select("doc_id").as[Long]
      .collect().toSet === evalIds)
  }

  test("Corpus CLI: string-keyed corpus packs end-to-end via dense ids") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = Files.createTempDirectory("corpus-str")
    val docs = (1 to 50).map { i =>
      (s"url-${i * 13}", (1 to (10 + i % 40)).map(j => s"w$i-$j").mkString(" "))
    }.toDF("doc_id", "text")
    docs.write.parquet(s"$dir/corpus")

    graft.cli.Corpus.run(spark, Array(
      "-I", s"$dir/corpus", "-O", s"$dir/out", "--pack", "64", "--shards", "2"))

    val out = spark.read.parquet(s"$dir/out")
    // every doc packed exactly once, original string keys preserved
    assert(out.count() === 50)
    assert(out.select("doc_id").as[String].collect().toSet ===
      docs.select("doc_id").as[String].collect().toSet)
    assert(Seq("shard", "seq_id", "tok_offset").forall(out.columns.contains))
    // no sequence overflows its budget
    val joined = out.join(
      docs.withColumn("n", size(split(col("text"), " "))).select("doc_id", "n"), "doc_id")
    assert(joined.groupBy("shard", "seq_id").agg(sum("n").as("t"))
      .filter(col("t") > 64).count() === 0)
  }

  test("Corpus CLI: JSONL input + --scrub-pii redacts before tokenizing") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = Files.createTempDirectory("corpus-jsonl")
    Seq(
      (1L, "please write to someone@example.com for help with the cluster setup"),
      (2L, "clean document with no contact information at all in it"))
      .toDF("doc_id", "text")
      .write.json(s"$dir/corpus")

    graft.cli.Corpus.run(spark, Array(
      "-I", s"$dir/corpus", "-O", s"$dir/out",
      "--format", "json", "--scrub-pii"))

    val out = spark.read.parquet(s"$dir/out")
    assert(out.count() === 2)
    val t1 = out.filter(col("doc_id") === 1L).select("text").as[String].head()
    assert(t1.contains("<EMAIL>") && !t1.contains("@"),
      s"email must be redacted in the written corpus, got: $t1")
  }

  test("Corpus CLI: --scrub-pii scrubs the benchmark too, so PII-spanning contamination is still caught") {
    import spark.implicits._
    val dir = Files.createTempDirectory("corpus-scrub-bench")
    // the ONLY shared span crosses an email token; if the benchmark were
    // shingled raw while the corpus is scrubbed, no trigram would match
    val sharedSpan = "contact admin@example.com today please right"
    val docs = Seq(
      (1L, s"$sharedSpan unique1 unique2 unique3 unique4 unique5"),
      (2L, "completely clean document with many distinct words here"))
      .toDF("doc_id", "text")
    val bench = Seq((100L, sharedSpan)).toDF("doc_id", "text")
    docs.write.parquet(s"$dir/corpus")
    bench.write.parquet(s"$dir/bench")

    graft.cli.Corpus.run(spark, Array(
      "-I", s"$dir/corpus", "-O", s"$dir/out",
      "--scrub-pii", "--benchmark", s"$dir/bench"))

    val kept = spark.read.parquet(s"$dir/out").select("doc_id").as[Long].collect().toSet
    assert(kept === Set(2L),
      s"the contaminated doc must drop even though the shared span crosses PII, kept=$kept")
  }

  test("Corpus CLI: --remove-boilerplate cleans text before the quality bounds") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = Files.createTempDirectory("corpus-bp")
    val header = "shared legal header words"   // 4-word segment at w=4
    val docs = Seq(
      (1L, s"$header body one keeps going strong"),
      (2L, s"$header body two keeps going along"),
      (3L, s"$header body three keeps going fine"),
      // all boilerplate: after cleaning this is empty -> min-tokens drops it
      (4L, header),
      (5L, "independent document body with plenty words"))
      .toDF("doc_id", "text")
    docs.write.parquet(s"$dir/corpus")

    graft.cli.Corpus.run(spark, Array(
      "-I", s"$dir/corpus", "-O", s"$dir/out",
      "--remove-boilerplate", "3", "--boilerplate-w", "4",
      "--min-tokens", "2"))

    val out = spark.read.parquet(s"$dir/out")
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    assert(out.keySet === Set(1L, 2L, 3L, 5L),
      "the all-boilerplate doc must fail min-tokens on its cleaned text")
    assert(out(1L) === "body one keeps going strong",
      "the hot header segment is removed, the unique tail kept in order")
    assert(out(5L) === "independent document body with plenty words")
    assert(!out.values.exists(_.contains("shared legal header")))
  }

  test("Corpus CLI: --bpe-merges denominates quality bounds and packing in BPE tokens") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = Files.createTempDirectory("corpus-bpe")
    // no merges apply to these words → BPE count = character count per
    // word, summed: "ab cd" = 4 tokens (vs 2 whitespace words)
    val docs = Seq(
      (1L, "ab cd"),            // 2 words / 4 BPE tokens
      (2L, "ab cd ef gh ij"))   // 5 words / 10 BPE tokens
      .toDF("doc_id", "text")
    docs.write.parquet(s"$dir/corpus")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/merges.txt"), "x y\nq r\n")

    // same --max-tokens 5 bound, different denomination: whitespace mode
    // keeps both docs (2 and 5 words), BPE mode keeps only doc 1
    // (4 tokens; doc 2 is 10)
    graft.cli.Corpus.run(spark, Array(
      "-I", s"$dir/corpus", "-O", s"$dir/out-ws",
      "--min-tokens", "1", "--max-tokens", "5", "--pack", "8", "--shards", "1"))
    assert(spark.read.parquet(s"$dir/out-ws").select("doc_id").as[Long]
      .collect().toSet === Set(1L, 2L),
      "whitespace mode: both docs within 5 words")

    graft.cli.Corpus.run(spark, Array(
      "-I", s"$dir/corpus", "-O", s"$dir/out-bpe",
      "--bpe-merges", s"$dir/merges.txt",
      "--min-tokens", "1", "--max-tokens", "5", "--pack", "8", "--shards", "1"))
    val bpe = spark.read.parquet(s"$dir/out-bpe")
    assert(bpe.select("doc_id").as[Long].collect().toSet === Set(1L),
      "BPE mode: doc 1 = 4 tokens kept, doc 2 = 10 tokens dropped")

    // packing offsets are in BPE tokens: doc 1 alone in shard, offset 0
    assert(bpe.select("tok_offset").as[Long].head() === 0L)

    val bad = intercept[IllegalArgumentException] {
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$dir/bad.txt"), "justone\n")
      graft.cli.Corpus.run(spark, Array(
        "-I", s"$dir/corpus", "-O", s"$dir/out-bad",
        "--bpe-merges", s"$dir/bad.txt"))
    }
    assert(bad.getMessage.contains("left right"))
  }

  test("Corpus CLI: --bpe-learn emits a merges file --bpe-merges consumes next run") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = Files.createTempDirectory("corpus-bpelearn")
    val docs = (1L to 20L).map(i => (i, "low lower lowest"))
      .toDF("doc_id", "text")
    docs.write.parquet(s"$dir/corpus")
    // run 1: learn a 3-merge tokenizer from the written corpus
    graft.cli.Corpus.run(spark, Array(
      "-I", s"$dir/corpus", "-O", s"$dir/out1", "--bpe-learn", "3"))
    val merges = scala.io.Source.fromFile(s"$dir/out1/_merges").getLines().toSeq
    // hand-computed: (l,o)=60 -> (lo,w)=60 -> (low,e)=40
    assert(merges === Seq("l o", "lo w", "low e"))
    // run 2: denominate quality bounds in the learned tokenizer. Each doc
    // is 3 WORDS but 6 BPE tokens (low=1, lower=lowe+r=2, lowest=
    // lowe+s+t=3) — min-tokens 4 keeps every doc in BPE denomination and
    // would drop every doc in whitespace denomination: the 2-3x drift the
    // flag exists to fix
    graft.cli.Corpus.run(spark, Array(
      "-I", s"$dir/corpus", "-O", s"$dir/out2",
      "--bpe-merges", s"$dir/out1/_merges", "--min-tokens", "4"))
    assert(spark.read.parquet(s"$dir/out2").count() === 20)
    val n = spark.read.parquet(s"$dir/corpus")
      .select(size(graft.text.Bpe.encode(
        graft.text.TextOps.words(col("text")),
        merges)).as("n")).as[Int].head()
    assert(n === 6, s"BPE token count under learned merges was $n")
  }

  test("Corpus CLI: --lm-trusted gates on corpus-likeness, junk drops below --lm-min-ppm") {
    import spark.implicits._
    val dir = Files.createTempDirectory("corpus-lm")
    val trusted = (1L to 10L).map(i =>
      (100L + i, "the cat sat on the mat and the dog sat on the rug"))
      .toDF("doc_id", "text")
    val docs = Seq(
      (1L, "the cat sat on the rug and the dog sat on the mat"), // trusted-like
      (2L, "zq xv qqj lkm vvw pqr zzt nbg hjk lop mnb erq"))     // OOV junk -> ppm 1
      .toDF("doc_id", "text")
    trusted.write.parquet(s"$dir/trusted")
    docs.write.parquet(s"$dir/corpus")
    graft.cli.Corpus.run(spark, Array(
      "-I", s"$dir/corpus", "-O", s"$dir/out",
      "--lm-trusted", s"$dir/trusted", "--lm-min-ppm", "1000"))
    val kept = spark.read.parquet(s"$dir/out").select("doc_id").as[Long].collect().toSet
    assert(kept === Set(1L))
  }

  test("Corpus CLI: --lm-store persists trusted counts once, later runs serve the merged model") {
    import spark.implicits._
    val dir = Files.createTempDirectory("corpus-lmstore")
    val store = s"$dir/lmstore"
    (1L to 10L).map(i => (100L + i, "the cat sat on the mat and the dog sat"))
      .toDF("doc_id", "text").write.parquet(s"$dir/trusted")
    Seq(
      (1L, "the cat sat on the mat near the dog"),
      (2L, "zq xv qqj lkm vvw pqr zzt nbg hjk lop"))
      .toDF("doc_id", "text").write.parquet(s"$dir/corpus")
    // run 1: bootstraps the store from --lm-trusted, gates through it
    graft.cli.Corpus.run(spark, Array(
      "-I", s"$dir/corpus", "-O", s"$dir/out1",
      "--lm-trusted", s"$dir/trusted", "--lm-store", store,
      "--lm-min-ppm", "1000"))
    assert(graft.text.LmStore.drops(spark, store).size === 1)
    assert(spark.read.parquet(s"$dir/out1")
      .select("doc_id").as[Long].collect().toSet === Set(1L))
    // run 2: same trusted path — append skipped (idempotent), store serves
    graft.cli.Corpus.run(spark, Array(
      "-I", s"$dir/corpus", "-O", s"$dir/out2",
      "--lm-trusted", s"$dir/trusted", "--lm-store", store,
      "--lm-min-ppm", "1000"))
    assert(graft.text.LmStore.drops(spark, store).size === 1)
    // run 3: store alone (no trusted read at all) — same gate decisions
    graft.cli.Corpus.run(spark, Array(
      "-I", s"$dir/corpus", "-O", s"$dir/out3",
      "--lm-store", store, "--lm-min-ppm", "1000"))
    assert(spark.read.parquet(s"$dir/out3")
      .select("doc_id").as[Long].collect().toSet === Set(1L))
  }

  test("Corpus CLI: the LM store mutation commits LAST — a failed output write leaves the ledger untouched") {
    import spark.implicits._
    val dir = Files.createTempDirectory("corpus-lmlast")
    val store = s"$dir/lmstore"
    (1L to 5L).map(i => (100L + i, "the cat sat on the mat"))
      .toDF("doc_id", "text").write.parquet(s"$dir/trusted")
    Seq((1L, "the cat sat on the mat"))
      .toDF("doc_id", "text").write.parquet(s"$dir/corpus")
    // pipelineFull stages the bootstrap but must not mutate the store:
    // the commit belongs to whoever lands the output write
    val r = graft.cli.Corpus.pipelineFull(spark, graft.cli.Corpus.Args(
      input = s"$dir/corpus", out = s"$dir/never-written",
      lmTrusted = Some(s"$dir/trusted"), lmStore = Some(store)))
    assert(!graft.text.LmStore.exists(spark, store),
      "staging must leave the LM ledger untouched until the commit thunk runs")
    // the gate still served the staged model (doc 1 matches trusted text)
    assert(r.train.select("doc_id").as[Long].collect().toSet === Set(1L))
    r.commitLm.foreach(_.apply())
    assert(graft.text.LmStore.drops(spark, store).size === 1)
    r.cached.foreach(_.unpersist())
  }

  test("Corpus CLI: --span-store detects each drop's repeated spans vs history and grows the gram-df ledger") {
    import spark.implicits._
    import graft.text.SpanStore
    val dir = Files.createTempDirectory("corpus-spans")
    val boiler = (1 to 10).map(i => s"s$i").mkString(" ")
    def run(in: String, out: String): Unit = {
      docsOf(in match {
        case "drop1" => (1L, boiler + " first unique tail")
        case _       => (10L, "lead tokens " + boiler + " trailing bits")
      }).write.parquet(s"$dir/$in")
      graft.cli.Corpus.run(spark, Array(
        "-I", s"$dir/$in", "-O", s"$dir/$out", "--span-store", s"$dir/store"))
    }
    run("drop1", "out1") // bootstrap: no _spans yet (nothing to compare)
    assert(!new java.io.File(s"$dir/out1/_spans").exists())
    assert(SpanStore.drops(spark, s"$dir/store").size === 1)
    run("drop2", "out2") // drop 2's boilerplate is flagged vs drop 1
    val spans = spark.read.parquet(s"$dir/out2/_spans")
      .as[(Long, Int, Int, Long, Long, Int)].collect()
    assert(spans.length === 1 && spans.head._1 === 10L &&
      spans.head._5 === 2L, s"got ${spans.toSeq}")
    assert(SpanStore.drops(spark, s"$dir/store").size === 2)
    // standalone takedown removes drop 2's partials again
    val d2 = SpanStore.drops(spark, s"$dir/store")
      .find(_ != novDropId(s"$dir/drop1")).get
    graft.cli.Corpus.run(spark, Array("--span-store", s"$dir/store",
      "--span-remove-drop", d2))
    assert(SpanStore.drops(spark, s"$dir/store") ===
      Set(novDropId(s"$dir/drop1")))
  }

  test("Corpus CLI: --scrub-spans rewrites text; with a span store the history owns the keepers") {
    import spark.implicits._
    val dir = Files.createTempDirectory("corpus-scrubspans")
    val boiler = (1 to 10).map(i => s"p$i").mkString(" ")
    docsOf((1L, boiler + " first unique tail here")).write.parquet(s"$dir/drop1")
    docsOf((10L, "intro " + boiler + " aa bb cc dd ee")).write.parquet(s"$dir/drop2")
    // run 1 bootstraps the store; its lone doc has no df>=2 grams, so
    // --scrub-spans leaves it untouched
    graft.cli.Corpus.run(spark, Array(
      "-I", s"$dir/drop1", "-O", s"$dir/out1",
      "--span-store", s"$dir/store", "--scrub-spans"))
    val t1 = spark.read.parquet(s"$dir/out1")
      .select("text").as[String].head()
    assert(t1 === boiler + " first unique tail here")
    // run 2: the store's history owns the boilerplate (doc 1 < doc 10),
    // so drop 2's copy is scrubbed token-wise from the WRITTEN output
    graft.cli.Corpus.run(spark, Array(
      "-I", s"$dir/drop2", "-O", s"$dir/out2",
      "--span-store", s"$dir/store", "--scrub-spans"))
    val t2 = spark.read.parquet(s"$dir/out2")
      .select("text").as[String].head()
    assert(t2 === "intro aa bb cc dd ee", s"got '$t2'")
    // the appended drop-2 partials reflect the SCRUBBED text: the store
    // grows by exactly the 2 grams of what was KEPT ("intro aa bb cc dd
    // ee"), never by the boilerplate the scrub deleted
    assert(graft.text.SpanStore.drops(spark, s"$dir/store").size === 2)
    val served = graft.text.SpanStore
      .serveStats(spark, s"$dir/store").count()
    val fresh = graft.text.SpanStore
      .partials(docsOf((1L, boiler + " first unique tail here")), "x").count()
    assert(served === fresh + 2)
  }

  test("Corpus CLI: the full daily-drop recipe — six stores, scrub, dedup, one invocation per drop") {
    import spark.implicits._
    import graft.text.{GramStore, LmStore, SpanStore}
    import graft.operators.{ManifestStore, ProfileStore}
    val dir = Files.createTempDirectory("corpus-daily")
    val template = (1 to 40).map(i => s"t$i").mkString(" ")
    val fresh2 = (200 to 240).map(i => s"f$i").mkString(" ")
    docsOf((100L, "the cat sat on the mat and slept"))
      .write.parquet(s"$dir/trusted")
    docsOf((1L, template), (2L, (300 to 340).map(i => s"g$i").mkString(" ")))
      .write.parquet(s"$dir/drop1")
    // drop 2: one doc that repeats drop 1's template verbatim plus a
    // unique tail, one genuinely fresh doc
    docsOf((20L, template + " tweak99"), (21L, fresh2))
      .write.parquet(s"$dir/drop2")
    def daily(in: String, out: String): Unit =
      graft.cli.Corpus.run(spark, Array(
        "-I", s"$dir/$in", "-O", s"$dir/$out",
        "--scrub-pii", "--scrub-spans", "--min-tokens", "1",
        "--lm-trusted", s"$dir/trusted", "--lm-store", s"$dir/lm",
        "--lm-min-ppm", "0",
        "--dedup-store", s"$dir/sig",
        "--profile-store", s"$dir/prof",
        "--novelty-store", s"$dir/nov",
        "--span-store", s"$dir/spans",
        "--manifest-store", s"$dir/man"))
    daily("drop1", "out1")
    assert(spark.read.parquet(s"$dir/out1").count() === 2L)
    Seq(ProfileStore.drops(spark, s"$dir/prof"),
      GramStore.drops(spark, s"$dir/nov"),
      SpanStore.drops(spark, s"$dir/spans"),
      ManifestStore.drops(spark, s"$dir/man"))
      .foreach(d => assert(d.size === 1, s"bootstrap must file one drop, got $d"))
    assert(LmStore.drops(spark, s"$dir/lm").size === 1)
    daily("drop2", "out2")
    // the template repeat was handled SPAN-wise: the store's history owns
    // every 5-gram of the template, so doc 20 scrubs down to its unique
    // tail (and then no longer near-dups doc-level) — dedup-by-layers
    val out2 = spark.read.parquet(s"$dir/out2")
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    assert(out2(20L) === "tweak99", s"got '${out2.get(20L)}'")
    assert(out2(21L) === fresh2)
    // every ledgered store filed the second drop; the trusted LM drop is
    // the same path, so its ledger stays at one
    Seq(ProfileStore.drops(spark, s"$dir/prof"),
      GramStore.drops(spark, s"$dir/nov"),
      SpanStore.drops(spark, s"$dir/spans"),
      ManifestStore.drops(spark, s"$dir/man"))
      .foreach(d => assert(d.size === 2, s"run 2 must append, got $d"))
    assert(LmStore.drops(spark, s"$dir/lm").size === 1)
    // per-drop reports rode along on run 2
    assert(new java.io.File(s"$dir/out2/_novelty").exists())
    assert(new java.io.File(s"$dir/out2/_spans").exists())
    // the cross-store ledgers agree (the --ledger-report audit)
    val buf = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(buf, true, "UTF-8")) {
      graft.cli.Corpus.run(spark, Array("--ledger-report",
        "--profile-store", s"$dir/prof", "--novelty-store", s"$dir/nov",
        "--span-store", s"$dir/spans", "--manifest-store", s"$dir/man"))
    }
    assert(buf.toString("UTF-8").contains("ledger: consistent"),
      buf.toString("UTF-8"))
  }

  test("Corpus CLI: --temperature-by flattens the source distribution toward sqrt(n)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("corpus-temp")
    (((1L to 400L).map(i => (i, "big", s"w$i words here for doc $i")) ++
      (1001L to 1025L).map(i => (i, "rare", s"v$i rare doc body $i")))
      .toDF("doc_id", "source", "text"))
      .write.parquet(s"$dir/corpus")
    graft.cli.Corpus.run(spark, Array(
      "-I", s"$dir/corpus", "-O", s"$dir/out", "--temperature-by", "source"))
    val out = spark.read.parquet(s"$dir/out")
      .groupBy("source").count().as[(String, Long)].collect().toMap
    // 400 vs 25 → rates 250‰ vs 1000‰: the rare source survives whole,
    // the head lands near 100 (the exact count is the deterministic
    // hash-bucket census, asserted through the library op)
    val expected = graft.operators.Sampling.temperatureRebalance(
        spark.read.parquet(s"$dir/corpus"),
        org.apache.spark.sql.functions.col("doc_id"), "source")
      .groupBy("source").count().as[(String, Long)].collect().toMap
    assert(out === expected)
    assert(out("rare") === 25L)
    assert(out("big") < 400L)
  }

  test("Corpus CLI: --manifest-store accumulates per-run certificate partials") {
    import graft.operators.{Audit, ManifestStore}
    val dir = Files.createTempDirectory("corpus-manstore")
    def run(in: String, out: String, rows: (Long, String)*): Unit = {
      docsOf(rows: _*).write.parquet(s"$dir/$in")
      graft.cli.Corpus.run(spark, Array(
        "-I", s"$dir/$in", "-O", s"$dir/$out",
        "--manifest-store", s"$dir/store"))
    }
    run("drop1", "out1", (1L, "aa bb"), (2L, "cc dd"))
    run("drop2", "out2", (10L, "xx yy"))
    assert(ManifestStore.drops(spark, s"$dir/store").size === 2)
    // the served certificate equals the manifest of BOTH written outputs
    val union = spark.read.parquet(s"$dir/out1")
      .unionByName(spark.read.parquet(s"$dir/out2"))
    val cols = union.schema.fieldNames.toSeq.filter(_ != "doc_id")
    assert(ManifestStore.serve(spark, s"$dir/store")
      .collect().map(_.toSeq).toSet ===
      Audit.manifest(union, "doc_id", cols, shards = 16)
        .collect().map(_.toSeq).toSet)
    // identical re-run: skipped (already-stored drop id), store unchanged
    graft.cli.Corpus.run(spark, Array(
      "-I", s"$dir/drop2", "-O", s"$dir/out3",
      "--manifest-store", s"$dir/store"))
    assert(ManifestStore.drops(spark, s"$dir/store").size === 2)
  }

  test("Corpus CLI: one-ticket takedown converges across all stores; --ledger-report names the divergence") {
    import spark.implicits._
    import graft.text.{GramStore, Lm, LmStore, Store}
    import graft.operators.ProfileStore
    val dir = Files.createTempDirectory("corpus-ticket")
    val d1 = docsOf((1L, "aa bb cc dd ee"), (2L, "ff gg hh ii jj"))
    val d2 = docsOf((10L, "kk ll mm nn oo"), (11L, "pp qq rr ss tt"))
    LmStore.build(d1, s"$dir/lm", "d1"); LmStore.append(d2, s"$dir/lm", "d2")
    ProfileStore.build(d1, Seq("text"), s"$dir/prof", "d1")
    ProfileStore.append(d2, Seq("text"), s"$dir/prof", "d2")
    GramStore.build(d1, s"$dir/nov", "d1"); GramStore.append(d2, s"$dir/nov", "d2")
    graft.text.SpanStore.build(d1, s"$dir/spans", "d1")
    graft.text.SpanStore.append(d2, s"$dir/spans", "d2")
    Store.build(d1.unionByName(d2), s"$dir/sig")
    def capture(args: String*): String = {
      val buf = new java.io.ByteArrayOutputStream()
      Console.withOut(new java.io.PrintStream(buf, true, "UTF-8")) {
        graft.cli.Corpus.run(spark, args.toArray)
      }
      buf.toString("UTF-8")
    }
    val stores = Seq("--lm-store", s"$dir/lm", "--profile-store", s"$dir/prof",
      "--novelty-store", s"$dir/nov", "--span-store", s"$dir/spans",
      "--dedup-store", s"$dir/sig")
    // simulate a crash mid-sequence: drop d2 already removed from the LM
    // store, still live everywhere else
    LmStore.removeDrop(spark, s"$dir/lm", "d2")
    val report = capture(("--ledger-report" +: stores): _*)
    assert(report.contains("DISAGREEMENT") && report.contains("'d2'"),
      s"the audit must name the diverged drop, got:\n$report")
    assert(report.contains("absent from {--lm-store}"), report)
    // the one-ticket retry: doc ids purge the signature store, the drop id
    // converges the ledgers (removes where present, skips where absent)
    Seq((10L, "d2"), (11L, "d2")).toDF("doc_id", "drop_id")
      .write.parquet(s"$dir/ticket")
    val td = capture(("--takedown" +: s"$dir/ticket" +:
      "--ledger-report" +: stores): _*)
    assert(td.contains("removed 2 signature(s)"), td)
    assert(td.contains("already absent from --lm-store") &&
      td.contains("skipped"), td)
    assert(td.contains("removed drop 'd2' from --profile-store") &&
      td.contains("removed drop 'd2' from --novelty-store") &&
      td.contains("removed drop 'd2' from --span-store"), td)
    assert(td.contains("ledger: consistent"), td)
    // post-takedown serve ≡ never-ingested, through the unified path
    assert(LmStore.drops(spark, s"$dir/lm") === Set("d1"))
    assert(ProfileStore.drops(spark, s"$dir/prof") === Set("d1"))
    assert(GramStore.drops(spark, s"$dir/nov") === Set("d1"))
    assert(graft.text.SpanStore.drops(spark, s"$dir/spans") === Set("d1"))
    val served = LmStore.serveModel(spark, s"$dir/lm")
      .c1.as[(String, Long)].collect().toSet
    assert(served === Lm.train(d1).c1.as[(String, Long)].collect().toSet)
    ProfileStore.build(d1, Seq("text"), s"$dir/prof-fresh", "d1")
    assert(ProfileStore.serve(spark, s"$dir/prof").collect().toSeq ===
      ProfileStore.serve(spark, s"$dir/prof-fresh").collect().toSeq)
    assert(Store.load(spark, s"$dir/sig")
      .filter(org.apache.spark.sql.functions.col("doc_id").isin(10L, 11L))
      .count() === 0L)
    // a full re-run of the SAME ticket is a no-op that still exits clean
    val again = capture(("--takedown" +: s"$dir/ticket" +: stores): _*)
    assert(again.contains("removed 0 signature(s)"), again)
    assert(!again.contains("removed drop"), again)

    // machine-readable report: re-introduce a divergence, then assert the
    // parquet artifact states exactly what the printed report states
    LmStore.removeDrop(spark, s"$dir/lm", "d1")
    val printed = capture(("--ledger-report-out" +: s"$dir/report" +: stores): _*)
    assert(printed.contains("DISAGREEMENT") && printed.contains("'d1'"), printed)
    val art = spark.read.parquet(s"$dir/report")
    val dropRows = art.filter(org.apache.spark.sql.functions.col("kind") === "drop")
      .select("store_flag", "drop_id", "disagreement")
      .as[(String, String, Boolean)].collect().toSet
    // d1 lives everywhere except the LM store -> disagreement=true rows
    // in the three OTHER ledgered stores; the artifact and stdout agree
    assert(dropRows === Set(
      ("--profile-store", "d1", true),
      ("--novelty-store", "d1", true),
      ("--span-store", "d1", true)))
    val counts = art.filter(org.apache.spark.sql.functions.col("kind") === "rowcount")
      .select("store_flag", "n_rows").as[(String, Long)].collect().toMap
    assert(counts("--dedup-store") ===
      graft.text.Store.load(spark, s"$dir/sig").count())
    assert(printed.contains(s"${counts("--dedup-store")} signature row(s)"),
      printed)
  }

  test("Corpus CLI: a drop_id ticket against ONLY a new-family ledgered store is honored") {
    // r10 ADVICE regression: the unified --takedown guards were a
    // hand-maintained flag list that omitted --span-store/--manifest-store/
    // --chunk-store, so a ticket whose ONLY configured store was one of
    // the new families was REFUSED — contradicting the "one ticket applied
    // to EVERY configured store" contract. Both guards now derive from
    // ledgeredStores(a); this pins the previously-refused shape.
    import spark.implicits._
    import graft.text.ChunkStore
    val dir = Files.createTempDirectory("corpus-ticket-chunk")
    ChunkStore.build(docsOf((1L, "aa bb cc dd ee ff gg hh"),
      (2L, "ii jj kk ll mm nn oo pp")), s"$dir/chunks", "d1")
    ChunkStore.append(docsOf((10L, "qq rr ss tt uu vv ww xx")),
      s"$dir/chunks", "d2")
    Seq("d2").toDF("drop_id").write.parquet(s"$dir/ticket")
    graft.cli.Corpus.run(spark, Array(
      "--takedown", s"$dir/ticket", "--chunk-store", s"$dir/chunks"))
    assert(ChunkStore.drops(spark, s"$dir/chunks") === Set("d1"))
    // and a ticket with NO store flag at all still refuses loudly
    val e = intercept[IllegalArgumentException] {
      graft.cli.Corpus.run(spark, Array("--takedown", s"$dir/ticket"))
    }
    assert(e.getMessage.contains("must not exit 0"), e.getMessage)
  }

  test("Corpus CLI: --postings-store ingests drops; one-ticket takedown serves as never-ingested") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import graft.text.{PostingsStore, Retrieval}
    val dir = Files.createTempDirectory("corpus-postings")
    def run(in: String, out: String, rows: (Long, String)*): Unit = {
      docsOf(rows: _*).write.parquet(s"$dir/$in")
      graft.cli.Corpus.run(spark, Array(
        "-I", s"$dir/$in", "-O", s"$dir/$out",
        "--postings-store", s"$dir/post"))
    }
    run("drop1", "out1", (1L, "needle aa bb cc dd"), (2L, "ee ff gg hh ii"))
    run("drop2", "out2", (10L, "needle needle jj kk ll"))
    assert(PostingsStore.drops(spark, s"$dir/post").size === 2)
    // identical re-run: skipped (already-stored drop id), store unchanged
    graft.cli.Corpus.run(spark, Array(
      "-I", s"$dir/drop2", "-O", s"$dir/out3",
      "--postings-store", s"$dir/post"))
    assert(PostingsStore.drops(spark, s"$dir/post").size === 2)
    // a drop_id ticket through the unified surface removes drop2's postings
    val withDoc10 = PostingsStore.servePostings(spark, s"$dir/post")
      .filter(col("doc_id") === 10L).count()
    assert(withDoc10 > 0L)
    val target = spark.read.option("recursiveFileLookup", "true")
      .parquet(s"$dir/post/postings").filter(col("doc_id") === 10L)
      .select("drop_id").distinct().as[String].collect().head
    Seq(target).toDF("drop_id").write.parquet(s"$dir/ticket")
    graft.cli.Corpus.run(spark, Array(
      "--takedown", s"$dir/ticket", "--postings-store", s"$dir/post"))
    assert(PostingsStore.drops(spark, s"$dir/post").size === 1)
    // post-takedown retrieval ≡ the never-ingested corpus
    val probe = col("doc_id") === 100L
    val drop = docsOf((100L, "needle probe mm nn oo"))
    val served = PostingsStore
      .bm25TopKVsDrop(drop, s"$dir/post", probe)
      .collect().map(_.toSeq).toSet
    val scratch = Retrieval.bm25TopKFor(
      docsOf((1L, "needle aa bb cc dd"), (2L, "ee ff gg hh ii"))
        .unionByName(drop), probe)
      .collect().map(_.toSeq).toSet
    assert(served === scratch)
  }

  test("Corpus CLI: --classifier-store trains across drops; one-ticket takedown unlearns exactly") {
    import spark.implicits._
    import graft.text.{Classify, ClassifyStore}
    val dir = Files.createTempDirectory("corpus-classify")
    def labeled(rows: (Long, String, String)*) =
      rows.toDF("doc_id", "lang", "text")
    def run(in: String, out: String, rows: (Long, String, String)*): Unit = {
      labeled(rows: _*).write.parquet(s"$dir/$in")
      graft.cli.Corpus.run(spark, Array(
        "-I", s"$dir/$in", "-O", s"$dir/$out",
        "--classifier-store", s"$dir/cls"))
    }
    val d1 = Seq((1L, "aa", "alpha alpha beta shared"),
      (2L, "bb", "omega psi psi shared"))
    val d2 = Seq((3L, "aa", "alpha gamma shared"))
    run("drop1", "out1", d1: _*)
    run("drop2", "out2", d2: _*)
    assert(ClassifyStore.drops(spark, s"$dir/cls").size === 2)
    // identical re-run: skipped (already-stored drop id), store unchanged
    graft.cli.Corpus.run(spark, Array(
      "-I", s"$dir/drop2", "-O", s"$dir/out3",
      "--classifier-store", s"$dir/cls"))
    assert(ClassifyStore.drops(spark, s"$dir/cls").size === 2)
    // a drop_id ticket through the unified surface unlearns drop2 exactly
    Seq(novDropId(s"$dir/drop2")).toDF("drop_id").write.parquet(s"$dir/ticket")
    graft.cli.Corpus.run(spark, Array(
      "--takedown", s"$dir/ticket", "--classifier-store", s"$dir/cls"))
    assert(ClassifyStore.drops(spark, s"$dir/cls").size === 1)
    val probe = labeled((10L, "aa", "alpha beta shared"))
    val served = ClassifyStore.predictVsStore(probe, s"$dir/cls")
      .collect().map(_.toSeq).toSet
    val scratch = Classify.predict(labeled(d1: _*), probe)
      .collect().map(_.toSeq).toSet
    assert(served === scratch, "post-takedown model ≡ never saw drop2")
    // a corpus without the label column fails loudly, naming the fix
    docsOf((20L, "unlabeled text")).write.parquet(s"$dir/nolabel")
    val e = intercept[IllegalArgumentException] {
      graft.cli.Corpus.run(spark, Array(
        "-I", s"$dir/nolabel", "-O", s"$dir/out4",
        "--classifier-store", s"$dir/cls2"))
    }
    assert(e.getMessage.contains("--classifier-label"))
  }

  test("Corpus CLI: --dsir-store ingests raw profiles; scores drops; one-ticket takedown unlearns") {
    import spark.implicits._
    import graft.text.{Dsir, DsirStore}
    val dir = Files.createTempDirectory("corpus-dsir")
    docsOf((100L, "alpha beta alpha")).write.parquet(s"$dir/target")
    val d1 = Seq((1L, "alpha noise noise"), (2L, "junk junk filler"))
    val d2 = Seq((3L, "beta alpha filler"))
    docsOf(d1: _*).write.parquet(s"$dir/drop1")
    docsOf(d2: _*).write.parquet(s"$dir/drop2")
    // first run bootstraps; second scores drop2 vs store ∪ drop2 into
    // OUT/_dsir, then appends
    graft.cli.Corpus.run(spark, Array(
      "-I", s"$dir/drop1", "-O", s"$dir/out1",
      "--dsir-store", s"$dir/dsir", "--dsir-target", s"$dir/target"))
    graft.cli.Corpus.run(spark, Array(
      "-I", s"$dir/drop2", "-O", s"$dir/out2",
      "--dsir-store", s"$dir/dsir", "--dsir-target", s"$dir/target"))
    assert(DsirStore.drops(spark, s"$dir/dsir").size === 2)
    // the FIRST run already honored --dsir-target: its _dsir scores
    // drop1 against an empty history (raw side = the drop itself)
    val firstArtifact = spark.read.parquet(s"$dir/out1/_dsir")
      .collect().map(_.toSeq).toSet
    val firstScratch = Dsir.score(
        spark.read.parquet(s"$dir/target"), docsOf(d1: _*))
      .collect().map(_.toSeq).toSet
    assert(firstArtifact === firstScratch,
      "first-build _dsir ≡ scoring the bootstrap drop against itself")
    val artifact = spark.read.parquet(s"$dir/out2/_dsir")
      .collect().map(_.toSeq).toSet
    val scratch = Dsir.score(
        spark.read.parquet(s"$dir/target"),
        docsOf(d1: _*).unionByName(docsOf(d2: _*)))
      .filter(org.apache.spark.sql.functions.col("doc_id") === 3L)
      .collect().map(_.toSeq).toSet
    assert(artifact === scratch,
      "_dsir artifact ≡ from-scratch scoring on history ∪ drop")
    // a RE-RUN of an already-ingested drop must not write an artifact at
    // all: the history already holds drop2's profile, so scoring would
    // count the drop twice on the raw side and silently rewrite a
    // different _dsir than the original run produced
    graft.cli.Corpus.run(spark, Array(
      "-I", s"$dir/drop2", "-O", s"$dir/out3",
      "--dsir-store", s"$dir/dsir", "--dsir-target", s"$dir/target"))
    assert(DsirStore.drops(spark, s"$dir/dsir").size === 2)
    assert(!Files.exists(java.nio.file.Paths.get(s"$dir/out3/_dsir")),
      "re-run of a stored drop must skip the _dsir artifact, not rewrite it")
    // a drop_id ticket through the unified surface unlearns drop2 exactly
    Seq(novDropId(s"$dir/drop2")).toDF("drop_id").write.parquet(s"$dir/ticket")
    graft.cli.Corpus.run(spark, Array(
      "--takedown", s"$dir/ticket", "--dsir-store", s"$dir/dsir"))
    assert(DsirStore.drops(spark, s"$dir/dsir").size === 1)
    val served = DsirStore.serveProfile(spark, s"$dir/dsir")
      .collect().map(_.toSeq).toSet
    val neverIngested = Dsir.profile(docsOf(d1: _*))
      .collect().map(_.toSeq).toSet
    assert(served === neverIngested, "post-takedown profile ≡ never saw drop2")
  }

  test("Corpus CLI: --sketch-store accrues registers, writes _saturation; one-ticket takedown re-maxes") {
    import spark.implicits._
    import graft.text.{DistinctSketch, SketchStore}
    val dir = Files.createTempDirectory("corpus-sketch")
    // in-regime cardinalities (the raw estimator's floor sits near 184
    // below ~640 distinct values — SketchStoreSpec pins the regime; here
    // each drop carries ~2000 distinct grams so novelty is measurable)
    val d1 = Seq((1L, (1 to 2000).map(i => s"x$i").mkString(" ")))
    val d2 = Seq((2L, (1 to 2000).map(i => s"y$i").mkString(" ")))
    docsOf(d1: _*).write.parquet(s"$dir/drop1")
    docsOf(d2: _*).write.parquet(s"$dir/drop2")
    graft.cli.Corpus.run(spark, Array(
      "-I", s"$dir/drop1", "-O", s"$dir/out1", "--sketch-store", s"$dir/sk"))
    graft.cli.Corpus.run(spark, Array(
      "-I", s"$dir/drop2", "-O", s"$dir/out2", "--sketch-store", s"$dir/sk"))
    assert(SketchStore.drops(spark, s"$dir/sk").size === 2)
    // the pre-append _admission artifact scored drop2 against drop1's
    // registers only — all-new values, so novelty ≈ its own estimate
    val adm = spark.read.parquet(s"$dir/out2/_admission").collect().head
    assert(adm.getAs[Long]("novelty_est") > adm.getAs[Long]("est_drop") / 3,
      s"fresh drop2 must read as mostly novel on arrival: $adm")
    // the _saturation artifact is the growth curve over both drops and
    // its last point is the full-union sketch estimate
    val sat = spark.read.parquet(s"$dir/out2/_saturation")
      .orderBy(org.apache.spark.sql.functions.col("drops_seen"))
      .collect()
    assert(sat.length === 2)
    val fullEst = DistinctSketch.estimate(DistinctSketch.registers(
        DistinctSketch.grams(docsOf(d1: _*).unionByName(docsOf(d2: _*)))))
      .select("est_distinct").as[Long].head()
    assert(sat.last.getAs[Long]("est_distinct") === fullEst)
    // drop2's ticket through the unified surface: re-max ≡ never ingested
    Seq(novDropId(s"$dir/drop2")).toDF("drop_id").write.parquet(s"$dir/tk")
    graft.cli.Corpus.run(spark, Array(
      "--takedown", s"$dir/tk", "--sketch-store", s"$dir/sk"))
    val served = SketchStore.serveRegisters(spark, s"$dir/sk")
      .collect().map(_.toSeq).toSet
    val neverIngested = DistinctSketch.registers(
        DistinctSketch.grams(docsOf(d1: _*)))
      .collect().map(_.toSeq).toSet
    assert(served === neverIngested,
      "post-takedown registers ≡ never saw drop2")
  }

  test("Corpus CLI: --curation-spine runs the q186 pipeline; artifacts match the gate") {
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("corpus-spine")
    val d = Tables(spark, "/root/testdata/sf0.001").documents
    d.filter(col("doc_id") % 19 =!= 0).write.parquet(s"$dir/corpus")
    d.filter(col("doc_id") % 19 === 0).write.parquet(s"$dir/target")
    // scoped caches (r13 verdict #8, DELTA-scoped r15): assert the run
    // ADDED nothing, not that context-global state is empty — under
    // parallel suites another test's cache landing between the CLI's
    // finally and this assert made the absolute form flaky, and the
    // absolute CLEANUP it asserted had the same blast radius (it would
    // clear that other test's caches). Pre-existing state must also
    // SURVIVE the run: the session is shared.
    import spark.implicits._
    val bystander = Seq((1L, "bystander")).toDF("doc_id", "text").cache()
    assert(bystander.count() === 1L) // materialize the bystander entry
    import org.apache.spark.sql.graftx.Bridge
    val cachedBefore = Bridge.numCachedEntries(spark)
    val rddsBefore = spark.sparkContext.getPersistentRDDs.keySet
    graft.cli.Corpus.run(spark, Array(
      "-I", s"$dir/corpus", "-O", s"$dir/out",
      "--curation-spine", "--dsir-target", s"$dir/target"))
    assert(spark.read.parquet(s"$dir/out/selection").count() === 100)
    assert(Bridge.numCachedEntries(spark) === cachedBefore,
      "the --curation-spine run must leave no cached plans OF ITS OWN behind")
    assert(spark.sparkContext.getPersistentRDDs.keySet === rddsBefore,
      "the --curation-spine run must add no persisted RDDs and kill none")
    assert(Bridge.isCached(bystander),
      "a bystander's cache must survive the spine's cleanup")
    bystander.unpersist()
    // the CLI's on-disk manifest ≡ the q186 gate over the same split —
    // the flag runs the exact spine the oracle checks
    val manifest = spark.read.parquet(s"$dir/out/_manifest")
      .collect().map(_.toSeq).toSet
    val gate = SparkEntry.queries("q186_curation_spine")(
        spark, "/root/testdata/sf0.001")
      .collect().map(_.toSeq).toSet
    assert(manifest === gate)
  }

  test("Corpus CLI: --curation-spine with both ledgers runs the q189 incremental form; half-config refused") {
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("corpus-spine-incr")
    val d = Tables(spark, "/root/testdata/sf0.001").documents
    val hist = d.filter(col("doc_id") % 3 =!= 0)
    d.filter(col("doc_id") % 3 === 0).write.parquet(s"$dir/drop")
    d.filter(col("doc_id") % 19 === 0).write.parquet(s"$dir/target")
    graft.text.Store.build(hist, s"$dir/sig")
    graft.text.DsirStore.build(hist, s"$dir/dsir", "hist")
    graft.cli.Corpus.run(spark, Array(
      "-I", s"$dir/drop", "-O", s"$dir/out", "--curation-spine",
      "--dsir-target", s"$dir/target",
      "--dedup-store", s"$dir/sig", "--dsir-store", s"$dir/dsir"))
    val got = spark.read.parquet(s"$dir/out/_manifest")
      .collect().map(_.toSeq).toSet
    val want = graft.text.Curation.incrementalSpineManifest(
        spark.read.parquet(s"$dir/drop"),
        spark.read.parquet(s"$dir/target"),
        graft.text.EvalSuite.table(spark)
          .withColumnRenamed("bench_id", "doc_id"),
        s"$dir/sig", s"$dir/dsir")
      .collect().map(_.toSeq).toSet
    assert(got === want,
      "the CLI's incremental spine must route both ledgers into q189's operator")
    // one ledger without the other is a loud refusal, never a silent
    // batch fallback that re-admits known duplicates
    val e = intercept[IllegalArgumentException] {
      graft.cli.Corpus.run(spark, Array(
        "-I", s"$dir/drop", "-O", s"$dir/out2", "--curation-spine",
        "--dsir-target", s"$dir/target", "--dedup-store", s"$dir/sig"))
    }
    assert(e.getMessage.contains("BOTH"))
  }

  test("Corpus CLI: --spine-ingest closes the daily loop — day 2 sees day 1; replay refused") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = Files.createTempDirectory("corpus-spine-loop")
    val d = Tables(spark, "/root/testdata/sf0.001").documents
    val hist = d.filter(col("doc_id") % 3 === 0)
    val day1 = d.filter(col("doc_id") % 3 === 1)
    d.filter(col("doc_id") % 19 === 0).write.parquet(s"$dir/target")
    graft.text.Store.build(hist, s"$dir/sig")
    graft.text.DsirStore.build(hist, s"$dir/dsir", "hist")
    day1.write.parquet(s"$dir/day1")
    graft.cli.Corpus.run(spark, Array(
      "-I", s"$dir/day1", "-O", s"$dir/out1", "--curation-spine",
      "--dsir-target", s"$dir/target",
      "--dedup-store", s"$dir/sig", "--dsir-store", s"$dir/dsir",
      "--spine-ingest"))
    // day 1 enrolled: the DSIR ledger gained the drop, the signature
    // store gained day-1 survivor ids
    assert(graft.text.DsirStore.drops(spark, s"$dir/dsir").size === 2)
    val sigIds = graft.text.Store.load(spark, s"$dir/sig")
      .select("doc_id").distinct().as[Long].collect().toSet
    val day1Selected = spark.read.parquet(s"$dir/out1/selection")
      .select("doc_id").as[Long].collect().toSet
    assert(day1Selected.nonEmpty && day1Selected.subsetOf(sigIds),
      "every selected day-1 doc must be a survivor the store now knows")
    // day 2 carries a VERBATIM copy of a day-1 survivor under a fresh
    // id — only a store that learned day 1 can catch it
    val dupSrc = day1Selected.head
    val day2 = d.filter(col("doc_id") % 3 === 2).unionByName(
      day1.filter(col("doc_id") === dupSrc)
        .withColumn("doc_id", lit(90000001L)))
    day2.write.parquet(s"$dir/day2")
    graft.cli.Corpus.run(spark, Array(
      "-I", s"$dir/day2", "-O", s"$dir/out2", "--curation-spine",
      "--dsir-target", s"$dir/target",
      "--dedup-store", s"$dir/sig", "--dsir-store", s"$dir/dsir",
      "--spine-ingest"))
    val sigIds2 = graft.text.Store.load(spark, s"$dir/sig")
      .select("doc_id").distinct().as[Long].collect().toSet
    assert(!sigIds2.contains(90000001L),
      "the cross-day verbatim dup must be caught by day-1's enrolled " +
        "signatures and never enter the store")
    assert((sigIds2 -- sigIds).nonEmpty,
      "day 2's genuinely new survivors must have enrolled")
    // replaying an enrolled drop is a LOUD refusal — the history now
    // contains the drop's own survivors, so a re-serve would dedup it
    // against itself and silently select nothing
    val e = intercept[IllegalArgumentException] {
      graft.cli.Corpus.run(spark, Array(
        "-I", s"$dir/day2", "-O", s"$dir/out3", "--curation-spine",
        "--dsir-target", s"$dir/target",
        "--dedup-store", s"$dir/sig", "--dsir-store", s"$dir/dsir",
        "--spine-ingest"))
    }
    assert(e.getMessage.contains("already enrolled"))
    // and --spine-ingest without the ledgers is refused up front
    val e2 = intercept[IllegalArgumentException] {
      graft.cli.Corpus.run(spark, Array(
        "-I", s"$dir/day1", "-O", s"$dir/out4", "--curation-spine",
        "--dsir-target", s"$dir/target", "--spine-ingest"))
    }
    assert(e2.getMessage.contains("incremental form"))
  }

  test("Corpus CLI: --spine-ingest + --sketch-store rejects a stale crawl BEFORE curation cost") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = Files.createTempDirectory("corpus-spine-adm")
    val d = Tables(spark, "/root/testdata/sf0.001").documents
    val hist = d.filter(col("doc_id") % 3 === 0)
    val day1 = d.filter(col("doc_id") % 3 === 1)
    d.filter(col("doc_id") % 19 === 0).write.parquet(s"$dir/target")
    graft.text.Store.build(hist, s"$dir/sig")
    graft.text.DsirStore.build(hist, s"$dir/dsir", "hist")
    day1.write.parquet(s"$dir/day1")
    def runSpine(in: String, out: String): Unit =
      graft.cli.Corpus.run(spark, Array(
        "-I", in, "-O", out, "--curation-spine",
        "--dsir-target", s"$dir/target",
        "--dedup-store", s"$dir/sig", "--dsir-store", s"$dir/dsir",
        "--sketch-store", s"$dir/nov", "--spine-ingest"))
    // day 1: novelty store doesn't exist — bootstrap drop is novel by
    // definition; the spine runs and ALL THREE ledgers enroll on commit
    runSpine(s"$dir/day1", s"$dir/out1")
    assert(new java.io.File(s"$dir/out1/selection").isDirectory)
    assert(graft.text.SketchStore.drops(spark, s"$dir/nov").size === 1)
    assert(graft.text.DsirStore.drops(spark, s"$dir/dsir").size === 2)
    val log1 = graft.text.SketchStore.admissionLog(spark, s"$dir/nov")
      .select("verdict").as[String].collect().toSeq
    assert(log1 === Seq("admitted-bootstrap"))
    // day 2: the SAME content re-crawled under fresh doc ids and a new
    // drop id — a stale crawl. Admission rejects it from one register
    // scan: no selection, no ledger mutated, verdict in the log
    day1.withColumn("doc_id", col("doc_id") + 10000000L)
      .write.parquet(s"$dir/day2")
    runSpine(s"$dir/day2", s"$dir/out2")
    assert(!new java.io.File(s"$dir/out2/selection").exists,
      "a rejected drop must not produce a selection")
    assert(graft.text.SketchStore.drops(spark, s"$dir/nov").size === 1,
      "a rejected drop must not enroll in the novelty store")
    assert(graft.text.DsirStore.drops(spark, s"$dir/dsir").size === 2,
      "a rejected drop must never reach the DSIR ledger")
    val log2 = graft.text.SketchStore.admissionLog(spark, s"$dir/nov")
      .orderBy("seq").select("verdict").as[String].collect().toSeq
    assert(log2 === Seq("admitted-bootstrap", "rejected-stale"))
    // day 3: genuinely new content — admitted, curated, all ledgers gain
    d.filter(col("doc_id") % 3 === 2).write.parquet(s"$dir/day3")
    runSpine(s"$dir/day3", s"$dir/out3")
    assert(new java.io.File(s"$dir/out3/selection").isDirectory)
    assert(graft.text.SketchStore.drops(spark, s"$dir/nov").size === 2)
    assert(graft.text.DsirStore.drops(spark, s"$dir/dsir").size === 3)
    val log3 = graft.text.SketchStore.admissionLog(spark, s"$dir/nov")
      .orderBy("seq").select("verdict").as[String].collect().toSeq
    assert(log3 === Seq("admitted-bootstrap", "rejected-stale", "admitted"))
  }

  test("Corpus CLI: --spine-stream drains pending drops exactly-once per invocation") {
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("corpus-spine-stream")
    val d = Tables(spark, "/root/testdata/sf0.001").documents
      .select("doc_id", "source", "lang", "text")
    val hist = d.filter(col("doc_id") % 3 === 0)
    graft.text.Store.build(hist, s"$dir/sig")
    graft.text.DsirStore.build(hist, s"$dir/dsir", "hist")
    d.filter(col("doc_id") % 19 === 0).write.parquet(s"$dir/target")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$dir/in"))
    def addDrop(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val scratch = s"$dir/stage-$name"
      df.coalesce(1).write.mode("overwrite").parquet(scratch)
      val part = new java.io.File(scratch).listFiles()
        .filter(_.getName.startsWith("part-")).head
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(s"$dir/in/$name.parquet"))
    }
    def drain(): Unit = graft.cli.Corpus.run(spark, Array(
      "-I", s"$dir/in", "-O", s"$dir/out", "--spine-stream", s"$dir/ckpt",
      "--dsir-target", s"$dir/target",
      "--dedup-store", s"$dir/sig", "--dsir-store", s"$dir/dsir",
      "--sketch-store", s"$dir/nov"))
    // run 1: one pending drop — curated as epoch 0, query stops
    addDrop("day1", d.filter(col("doc_id") % 3 === 1))
    drain()
    assert(new java.io.File(s"$dir/out/epoch-000000").isDirectory)
    assert(graft.text.DsirStore.drops(spark, s"$dir/dsir") ===
      Set("hist", "epoch-000000"))
    // run 2: nothing new arrived — the checkpoint skips day1, nothing
    // double-ingests, and the invocation still exits cleanly
    drain()
    assert(graft.text.DsirStore.drops(spark, s"$dir/dsir") ===
      Set("hist", "epoch-000000"))
    // run 3: a new drop landed since — exactly it is processed
    addDrop("day2", d.filter(col("doc_id") % 3 === 2))
    drain()
    assert(new java.io.File(s"$dir/out/epoch-000001").isDirectory)
    assert(graft.text.DsirStore.drops(spark, s"$dir/dsir") ===
      Set("hist", "epoch-000000", "epoch-000001"))
    assert(graft.text.SketchStore.drops(spark, s"$dir/nov") ===
      Set("epoch-000000", "epoch-000001"))
    // flag hygiene: the stream mode refuses the batch-form flags and
    // demands all three ledgers
    val e = intercept[IllegalArgumentException] {
      graft.cli.Corpus.run(spark, Array(
        "-I", s"$dir/in", "-O", s"$dir/out", "--spine-stream", s"$dir/ckpt",
        "--dsir-target", s"$dir/target",
        "--dedup-store", s"$dir/sig", "--dsir-store", s"$dir/dsir"))
    }
    assert(e.getMessage.contains("--sketch-store"))
  }

  test("Corpus CLI: --takedown doc ticket + --sketch-raw rebuilds the drop; serve ≡ never-contained") {
    import spark.implicits._
    import graft.text.{DistinctSketch, SketchStore}
    val dir = Files.createTempDirectory("corpus-sketch-purge")
    // in-regime cardinalities (the estimator floors below ~640 distinct)
    val d1 = (1L, (1 to 2000).map(i => s"x$i").mkString(" "))
    val d2a = (2L, (1 to 2000).map(i => s"y$i").mkString(" "))
    val d2b = (3L, (1 to 2000).map(i => s"z$i").mkString(" "))
    docsOf(d1).write.parquet(s"$dir/drop1")
    docsOf(d2a, d2b).write.parquet(s"$dir/drop2")
    graft.cli.Corpus.run(spark, Array(
      "-I", s"$dir/drop1", "-O", s"$dir/o1", "--sketch-store", s"$dir/sk"))
    graft.cli.Corpus.run(spark, Array(
      "-I", s"$dir/drop2", "-O", s"$dir/o2", "--sketch-store", s"$dir/sk"))
    // doc-granular ticket: purge doc 3 from drop2 — max can't subtract,
    // so the CLI rebuilds drop2's registers from its raw corpus minus
    // the ticket and swaps atomically
    Seq(3L).toDF("doc_id").write.parquet(s"$dir/ticket")
    graft.cli.Corpus.run(spark, Array(
      "--takedown", s"$dir/ticket", "--sketch-store", s"$dir/sk",
      "--sketch-raw", s"${novDropId(s"$dir/drop2")}=$dir/drop2"))
    val served = SketchStore.serveRegisters(spark, s"$dir/sk")
      .collect().map(_.toSeq).toSet
    val neverContained = DistinctSketch.registers(
        DistinctSketch.grams(docsOf(d1, d2a)))
      .collect().map(_.toSeq).toSet
    assert(served === neverContained,
      "post-purge serve must equal a store whose drop2 never held doc 3")
    // the ledger still lists both drops: purge REBUILT drop2, not removed it
    assert(SketchStore.drops(spark, s"$dir/sk") ===
      Set(novDropId(s"$dir/drop1"), novDropId(s"$dir/drop2")))
  }

  test("Corpus CLI: --freq-store ingests; --freq-raw subtracts a doc; drop ticket removes") {
    import spark.implicits._
    import graft.text.{FreqSketch, FreqStore}
    val dir = Files.createTempDirectory("corpus-freq")
    val d1 = (1L, (1 to 200).map(i => s"x${i % 40}").mkString(" "))
    val d2a = (2L, (1 to 200).map(i => s"y${i % 40}").mkString(" "))
    val d2b = (3L, (1 to 200).map(i => s"z${i % 40}").mkString(" "))
    docsOf(d1).write.parquet(s"$dir/drop1")
    docsOf(d2a, d2b).write.parquet(s"$dir/drop2")
    graft.cli.Corpus.run(spark, Array(
      "-I", s"$dir/drop1", "-O", s"$dir/o1", "--freq-store", s"$dir/cms"))
    graft.cli.Corpus.run(spark, Array(
      "-I", s"$dir/drop2", "-O", s"$dir/o2", "--freq-store", s"$dir/cms"))
    def counters(d: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
      FreqSketch.counters(FreqSketch.grams(d))
        .collect().map(_.toSeq).toSet
    def served: Set[Seq[Any]] =
      FreqStore.serveCounters(spark, s"$dir/cms")
        .collect().map(_.toSeq).toSet
    assert(served === counters(docsOf(d1, d2a, d2b)))
    // doc-granular ticket: purge doc 3 from drop2 — counters are
    // LINEAR, so the CLI sketches the ticket's docs (read from the raw
    // dir with doc_id pushdown) and SUBTRACTS them from the drop's rows
    Seq(3L).toDF("doc_id").write.parquet(s"$dir/ticket")
    graft.cli.Corpus.run(spark, Array(
      "--takedown", s"$dir/ticket", "--freq-store", s"$dir/cms",
      "--freq-raw", s"${novDropId(s"$dir/drop2")}=$dir/drop2"))
    assert(served === counters(docsOf(d1, d2a)),
      "post-subtract serve must equal a store whose drop2 never held doc 3")
    // the ledger still lists both drops: the purge subtracted rows, not
    // the drop
    assert(FreqStore.drops(spark, s"$dir/cms") ===
      Set(novDropId(s"$dir/drop1"), novDropId(s"$dir/drop2")))
    // drop-granular ticket through the unified takedown: drop2 removed,
    // serve re-sums to drop1 alone
    Seq(novDropId(s"$dir/drop2")).toDF("drop_id")
      .write.parquet(s"$dir/ticket2")
    graft.cli.Corpus.run(spark, Array(
      "--takedown", s"$dir/ticket2", "--freq-store", s"$dir/cms"))
    assert(served === counters(docsOf(d1)))
    assert(FreqStore.drops(spark, s"$dir/cms") ===
      Set(novDropId(s"$dir/drop1")))
  }

  test("Corpus CLI: --sample-store ingests; --sample-raw re-cuts a drop; drop ticket removes") {
    import spark.implicits._
    import graft.text.{KmvSample, SampleStore}
    val dir = Files.createTempDirectory("corpus-sample")
    val d1 = (1L to 200L).map(i => (i, s"x$i x$i x$i"))
    val d2 = (201L to 500L).map(i => (i, s"y$i y$i"))
    d1.toDF("doc_id", "text").write.parquet(s"$dir/drop1")
    d2.toDF("doc_id", "text").write.parquet(s"$dir/drop2")
    graft.cli.Corpus.run(spark, Array(
      "-I", s"$dir/drop1", "-O", s"$dir/o1", "--sample-store", s"$dir/kmv"))
    graft.cli.Corpus.run(spark, Array(
      "-I", s"$dir/drop2", "-O", s"$dir/o2", "--sample-store", s"$dir/kmv"))
    def served: Set[Seq[Any]] =
      SampleStore.serveSample(spark, s"$dir/kmv")
        .collect().map(_.toSeq).toSet
    def scratchOf(rows: Seq[(Long, String)]): Set[Seq[Any]] =
      KmvSample.sample(rows.toDF("doc_id", "text"))
        .collect().map(_.toSeq).toSet
    assert(served === scratchOf(d1 ++ d2))
    // doc-granular ticket: the sampled doc with the smallest hash is
    // purged from drop2 — the CLI re-cuts that drop's rows from its raw
    // dir minus the ticket (an order statistic can't subtract)
    val victim = SampleStore.serveSample(spark, s"$dir/kmv")
      .filter(org.apache.spark.sql.functions.col("doc_id") >= 201L)
      .orderBy("rank").select("doc_id").as[Long].head()
    Seq(victim).toDF("doc_id").write.parquet(s"$dir/ticket")
    graft.cli.Corpus.run(spark, Array(
      "--takedown", s"$dir/ticket", "--sample-store", s"$dir/kmv",
      "--sample-raw", s"${novDropId(s"$dir/drop2")}=$dir/drop2"))
    assert(served === scratchOf(d1 ++ d2.filterNot(_._1 == victim)),
      "post-purge serve must equal a store whose drop2 never held the doc")
    assert(SampleStore.drops(spark, s"$dir/kmv") ===
      Set(novDropId(s"$dir/drop1"), novDropId(s"$dir/drop2")))
    // drop-granular ticket through the unified takedown
    Seq(novDropId(s"$dir/drop2")).toDF("drop_id")
      .write.parquet(s"$dir/ticket2")
    graft.cli.Corpus.run(spark, Array(
      "--takedown", s"$dir/ticket2", "--sample-store", s"$dir/kmv"))
    assert(served === scratchOf(d1))
  }

  test("Corpus CLI: --profile-store accumulates per-drop partials; re-runs idempotent") {
    import spark.implicits._
    val dir = Files.createTempDirectory("corpus-profstore")
    val store = s"$dir/profstore"
    Seq((1L, "alpha beta gamma delta"), (2L, "epsilon zeta eta theta"))
      .toDF("doc_id", "text").write.parquet(s"$dir/drop1")
    Seq((3L, "iota kappa lambda mu"))
      .toDF("doc_id", "text").write.parquet(s"$dir/drop2")

    graft.cli.Corpus.run(spark, Array(
      "-I", s"$dir/drop1", "-O", s"$dir/out1", "--profile-store", store))
    assert(graft.operators.ProfileStore.drops(spark, store).size === 1)
    def nRows: Long = graft.operators.ProfileStore.serve(spark, store)
      .filter(org.apache.spark.sql.functions.col("column_name") === "doc_id")
      .select("n_rows").as[Long].head()
    assert(nRows === 2L)
    // same input again (retry): drop id repeats -> profiled once, no double count
    graft.cli.Corpus.run(spark, Array(
      "-I", s"$dir/drop1", "-O", s"$dir/out1b", "--profile-store", store))
    assert(graft.operators.ProfileStore.drops(spark, store).size === 1)
    assert(nRows === 2L)
    // a second drop appends its partial; served stats cover both drops
    graft.cli.Corpus.run(spark, Array(
      "-I", s"$dir/drop2", "-O", s"$dir/out2", "--profile-store", store))
    assert(graft.operators.ProfileStore.drops(spark, store).size === 2)
    assert(nRows === 3L)
    // text is profiled too (string column); shard/pack columns are not
    val cols = graft.operators.ProfileStore.serve(spark, store)
      .select("column_name").as[String].collect().toSet
    assert(cols === Set("doc_id", "text"))
  }

  test("Corpus CLI refuses an input that already has reserved pipeline columns") {
    import spark.implicits._
    val dir = Files.createTempDirectory("corpus-resv")
    Seq((1L, "some text here", 9)).toDF("doc_id", "text", "shard")
      .write.parquet(s"$dir/corpus")
    val e = intercept[IllegalArgumentException] {
      graft.cli.Corpus.run(spark, Array("-I", s"$dir/corpus", "-O", s"$dir/out"))
    }
    assert(e.getMessage.contains("shard"))
  }

  test("CLI end-to-end: SAM-like text + properties config -> parquet outputs") {
    val dir = Files.createTempDirectory("cli")
    val sam = dir.resolve("in.sam")
    Files.writeString(sam,
      """@HD	VN:1.6
        |r1	0	chr1	100	60	4M	*	0	0	ACGT	IIII
        |r2	0	chr1	100	60	4M	*	0	0	ACGT	####
        |r3	0	chr1	200	60	4M	*	0	0	ACGT	IIII
        |r4	0	chr1	200	60	4M	*	0	0	ACGT	IIII
        |""".stripMargin)
    val conf = dir.resolve("pipeline.properties")
    Files.writeString(conf, "MarkDuplicates=\n")
    val out = dir.resolve("out").toString

    graft.cli.Main.run(spark, Array(
      "-I", sam.toString, "-C", conf.toString, "-O", out, "-F", "sam"))

    val pre = spark.read.parquet(s"$out/preprocessed")
    assert(pre.count() === 4)
    // r2 has the lower quality sum at chr1:100 → duplicate-flagged
    val dups = pre.filter(org.apache.spark.sql.functions.expr(s"(flag & 1024) != 0"))
      .select("qname").collect().map(_.getString(0)).toSet
    assert(dups === Set("r2", "r4")) // r4 loses the (r3,r4) tie on qname
    // HaplotypeCaller key absent → discovery gated off, no variants output
    assert(!new java.io.File(s"$out/variants").exists())
  }

  test("CLI enforces the reference's -S requirement for BaseRecalibrator") {
    val dir = Files.createTempDirectory("cli2")
    val conf = dir.resolve("p.properties")
    Files.writeString(conf, "BaseRecalibrator=\nPrintReads=\n")
    val e = intercept[IllegalArgumentException] {
      graft.cli.Main.run(spark, Array(
        "-I", dir.toString, "-C", conf.toString, "-O", dir.resolve("o").toString))
    }
    assert(e.getMessage.contains("known sites"))
  }
}
