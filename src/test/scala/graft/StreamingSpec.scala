package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Streams

class StreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  test("hourlyCounts over a memory stream matches the batch window agg") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String)]
    val df = mem.toDF().toDF("ts", "event_type")
    val q = Streams.toMemorySink(
      Streams.hourlyCounts(df), "hourly_test",
      org.apache.spark.sql.streaming.OutputMode.Update())
    try {
      mem.addData((ts(10), "a"), (ts(20), "a"), (ts(3700), "a"), (ts(30), "b"))
      q.processAllAvailable()
      val got = spark.table("hourly_test")
        .select(unix_micros(col("hour_start")).as("h"), col("event_type"), col("n"))
        .as[(Long, String, Long)].collect().toSet
      assert(got === Set((0L, "a", 2L), (3600000000L, "a", 1L), (0L, "b", 1L)))
    } finally q.stop()
  }

  test("bpe_encode runs in a streaming plan: per-batch token counts match the batch path") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val counted = mem.toDF().toDF("doc_id", "text")
      .select(col("doc_id"),
        size(graft.text.Bpe.encode(graft.text.TextOps.words(col("text"))))
          .as("n_bpe"))
    val q = Streams.toMemorySink(counted, "bpe_stream",
      org.apache.spark.sql.streaming.OutputMode.Append())
    try {
      mem.addData((1L, "the row"), (2L, "order small"))
      q.processAllAvailable()
      val got = spark.table("bpe_stream").as[(Long, Int)].collect().toMap
      // the -> [the] (1), row -> [row] (1); order -> [or,d,er] (3),
      // small -> [s,m,al,l] (4) — identical to the batch expression
      assert(got === Map(1L -> 2, 2L -> 7))
    } finally q.stop()
  }

  test("tokenBudgetStream: windowed BPE budgets honor the watermark (late-in counts, too-late drops)") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, String)]
    val q = Streams.toMemorySink(
      Streams.tokenBudgetStream(mem.toDF().toDF("ts", "source", "text")),
      "bpe_budget_stream", org.apache.spark.sql.streaming.OutputMode.Update())
    try {
      // batch 1: "the row" = 2 BPE tokens into window [0h,1h); "order" = 3
      // into [1h,2h). Watermark after the batch: 4900s - 10min = 4300s —
      // PAST the first window's end (3600s), so [0h,1h) is finalized and
      // its state evicted.
      mem.addData((ts(100), "s1", "the row"), (ts(4900), "s1", "order"))
      q.processAllAvailable()
      // batch 2: ts=4000s is LATE (out of order) but lands in the still-
      // open [1h,2h) window → its 5 tokens ("table" → t,a,b,l,e) count;
      // ts=3200s targets the CLOSED [0h,1h) window → dropped ("small" = 4
      // tokens must not appear anywhere).
      mem.addData((ts(4000), "s1", "table"), (ts(3200), "s1", "small"))
      q.processAllAvailable()
      // Update mode re-emits a window on every change; counts only grow,
      // so the final state per window is its max emission.
      val finals = spark.table("bpe_budget_stream")
        .select(unix_micros(col("window_start")).as("w"), col("source"),
          col("n_tokens"), col("n_docs"))
        .as[(Long, String, Long, Long)].collect()
        .groupBy(r => (r._1, r._2))
        .map { case (k, rows) => k -> rows.map(r => (r._3, r._4)).max }
      assert(finals === Map(
        (0L, "s1") -> ((2L, 1L)),          // "the row"; closed before batch 2
        (3600000000L, "s1") -> ((8L, 2L)))) // "order" + late-but-open "table"
    } finally q.stop()
  }

  test("sliding chunks apply stateless to a stream, matching the batch layout") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    def chunked(df: org.apache.spark.sql.DataFrame) =
      graft.operators.Packing.slidingChunks(
        df.withColumn("ws", split(col("text"), " ")),
        "doc_id", "ws", size = 4, stride = 3)
        .select(col("doc_id"), col("chunk_idx"), col("start_tok"),
          col("end_tok"), array_join(col("chunk"), " ").as("chunk_text"))
    val q = Streams.toMemorySink(chunked(mem.toDF().toDF("doc_id", "text")),
      "chunk_stream", org.apache.spark.sql.streaming.OutputMode.Append())
    try {
      val rows = Seq(
        (1L, (1 to 10).map(_.toString).mkString(" ")),
        (2L, "a b"))
      mem.addData(rows: _*)
      q.processAllAvailable()
      val got = spark.table("chunk_stream")
        .as[(Long, Int, Int, Int, String)].collect().toSet
      val batch = chunked(rows.toDF("doc_id", "text"))
        .as[(Long, Int, Int, Int, String)].collect().toSet
      assert(got === batch, "map-only chunking must be layout-identical on a stream")
      assert(got.count(_._1 == 1L) === 3 && got.count(_._1 == 2L) === 1)
    } finally q.stop()
  }

  test("decontaminateStream drops benchmark-overlapping docs statelessly") {
    implicit val sq = spark.sqlContext
    val bench = Seq((100L, "the secret eval trigram is here"))
      .toDF("doc_id", "text")
    val mem = MemoryStream[(Long, String)]
    val q = Streams.toMemorySink(
      Streams.decontaminateStream(mem.toDF().toDF("doc_id", "text"), bench),
      "decon_stream", org.apache.spark.sql.streaming.OutputMode.Append())
    try {
      mem.addData(
        (1L, "clean doc with fresh words only"),
        (2L, "contains the secret eval trigram here plus filler"),
        (3L, "short"))  // <3 words: whole-text shingle, no overlap
      q.processAllAvailable()
      mem.addData((4L, "another clean one"), (5L, "secret eval trigram quoted"))
      q.processAllAvailable()
      val kept = spark.table("decon_stream").as[(Long, String)]
        .collect().map(_._1).toSet
      assert(kept === Set(1L, 3L, 4L),
        "docs 2 and 5 share a benchmark 3-gram and must drop in-stream")
    } finally q.stop()
  }

  test("file-source stream over the real events table matches the batch hourly agg") {
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$dir/events.parquet").exists())
    // the file stream source needs a DIRECTORY of files
    val streamDir = java.nio.file.Files.createTempDirectory("evstream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      streamDir.resolve("part-0.parquet"))
    val schema = spark.read.parquet(streamDir.toString).schema
    val stream = Tables.normalizeTs(
      spark.readStream.schema(schema).parquet(streamDir.toString), "ts")
    val q = Streams.toMemorySink(Streams.hourlyCounts(stream), "file_hourly")
    try {
      q.processAllAvailable()
      val streamed = spark.table("file_hourly")
        .select(unix_micros(col("hour_start")).as("h"), col("event_type"), col("n"))
        .as[(Long, String, Long)].collect().toSet
      val batch = Tables(spark, dir).events
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(unix_micros(col("window.start")).as("h"), col("event_type"), col("n"))
        .as[(Long, String, Long)].collect().toSet
      assert(streamed === batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("streaming dedup keeps first occurrence across micro-batches") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp)]
    val df = mem.toDF().toDF("event_id", "ts")
    val q = Streams.toMemorySink(
      Streams.dedupStream(df, "1 hour", Seq("event_id")), "dedup_stream",
      org.apache.spark.sql.streaming.OutputMode.Append())
    try {
      mem.addData((1L, ts(10)), (2L, ts(20)))
      q.processAllAvailable()
      mem.addData((1L, ts(30)), (3L, ts(40))) // 1 is a duplicate
      q.processAllAvailable()
      val ids = spark.table("dedup_stream").select("event_id").as[Long].collect().sorted
      assert(ids.toSeq === Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("streaming near-dup dedup drops signature-identical texts within the watermark") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, String, Timestamp)]
    val docs = mem.toDF().toDF("doc_id", "text", "ts")
    val q = Streams.nearDupDedupStream(docs, "1 hour")
      .writeStream.format("memory").queryName("neardup_stream")
      .outputMode("append").start()
    val common = (1 to 40).map(i => s"w$i").mkString(" ")
    try {
      mem.addData((1L, common, ts(10)), (2L, "totally different words here now", ts(20)))
      q.processAllAvailable()
      // identical text, later micro-batch → same signature → dropped
      mem.addData((3L, common, ts(30)))
      q.processAllAvailable()
      val ids = spark.table("neardup_stream").select("doc_id").as[Long].collect().sorted
      assert(ids.toSeq === Seq(1L, 2L))
      // signature key is internal — the output schema is the input's
      assert(spark.table("neardup_stream").columns.toSet === Set("doc_id", "text", "ts"))
    } finally q.stop()
  }

  test("streaming near-dup dedup passes short/empty docs through untouched") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, String, Timestamp)]
    val docs = mem.toDF().toDF("doc_id", "text", "ts")
    val q = Streams.nearDupDedupStream(docs, "1 hour")
      .writeStream.format("memory").queryName("neardup_short_stream")
      .outputMode("append").start()
    try {
      // three unshingleable docs (empty / null-ish blank / two words):
      // a constant-signature key would collapse them to one survivor
      mem.addData((1L, "", ts(10)), (2L, "   ", ts(20)), (3L, "two words", ts(30)))
      q.processAllAvailable()
      // ...but byte-identical short spam must still dedup (exact-text key)
      mem.addData((4L, "two words", ts(40)), (5L, "other pair", ts(50)))
      q.processAllAvailable()
      val ids = spark.table("neardup_short_stream")
        .select("doc_id").as[Long].collect().sorted
      assert(ids.toSeq === Seq(1L, 2L, 3L, 5L),
        "blank docs keep per-doc keys; identical short text dedups on content")
    } finally q.stop()
  }

  test("stream-static near-dup: docs already in the seen-corpus are dropped at ingest") {
    implicit val sq = spark.sqlContext
    val common = (1 to 40).map(i => s"w$i").mkString(" ")
    val fresh = (100 to 140).map(i => s"v$i").mkString(" ")
    val corpus = Seq((900L, common, ts(0)), (901L, "hey there", ts(0)))
      .toDF("doc_id", "text", "ts")
    val mem = MemoryStream[(Long, String, Timestamp)]
    val docs = mem.toDF().toDF("doc_id", "text", "ts")
    val q = Streams.nearDupVsCorpusStream(docs, corpus, "1 hour")
      .writeStream.format("memory").queryName("neardup_corpus_stream")
      .outputMode("append").start()
    try {
      // 1 = signature match with corpus doc 900 → dropped; 2 = new → kept;
      // 3 = new short doc passes; 5 = short doc byte-identical to corpus
      // doc 901 → dropped on its exact-text key
      mem.addData((1L, common, ts(10)), (2L, fresh, ts(20)), (3L, "hi", ts(25)),
        (5L, "hey there", ts(26)))
      q.processAllAvailable()
      // 4 repeats 2 within the stream → dropped by the in-stream stage
      mem.addData((4L, fresh, ts(30)))
      q.processAllAvailable()
      val ids = spark.table("neardup_corpus_stream")
        .select("doc_id").as[Long].collect().sorted
      assert(ids.toSeq === Seq(2L, 3L))
    } finally q.stop()
  }

  test("stream-vs-store near-dup: ingest dedups against the persisted signature store") {
    implicit val sq = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("sigstore-stream").toString
    val common = (1 to 40).map(i => s"w$i").mkString(" ")
    val fresh = (100 to 140).map(i => s"v$i").mkString(" ")
    // the store is built ONCE from the corpus; the stream never sees the
    // corpus text — only the stored sig_key column
    graft.text.Store.build(
      Seq((900L, common), (901L, "hey there")).toDF("doc_id", "text"), dir)
    val mem = MemoryStream[(Long, String, Timestamp)]
    val docs = mem.toDF().toDF("doc_id", "text", "ts")
    val q = Streams.nearDupVsStoreStream(docs, dir, "1 hour")
      .writeStream.format("memory").queryName("neardup_store_stream")
      .outputMode("append").start()
    try {
      // 1 matches stored 900's signature → dropped; 2 fresh → kept;
      // 5 byte-identical to stored short doc 901 → dropped on exact-text key
      mem.addData((1L, common, ts(10)), (2L, fresh, ts(20)),
        (5L, "hey there", ts(26)))
      q.processAllAvailable()
      // 4 repeats 2 within the stream → dropped by the in-stream stage
      mem.addData((4L, fresh, ts(30)))
      q.processAllAvailable()
      val ids = spark.table("neardup_store_stream")
        .select("doc_id").as[Long].collect().sorted
      assert(ids.toSeq === Seq(2L))
    } finally q.stop()
  }

  test("stream-vs-store near-dup over the BYTES universe: the probe key follows the marker") {
    implicit val sq = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("binstore-stream").toString
    // aperiodic per-seed blobs (StoreSpec's generator)
    def blob(seed: Int, n: Int = 400): Array[Byte] = {
      var x = seed * 0x9E3779B97F4A7C15L
      Array.fill(n) {
        x = x * 6364136223846793005L + 1442695040888963407L
        (x >>> 33).toByte
      }
    }
    graft.text.Store.build(
      Seq((900L, blob(1))).toDF("doc_id", "payload"), dir,
      textCol = "payload", universe = graft.text.Store.Universe.PayloadBytes)
    val mem = MemoryStream[(Long, Array[Byte], Timestamp)]
    val docs = mem.toDF().toDF("doc_id", "payload", "ts")
    val q = Streams.nearDupVsStoreStream(docs, dir, "1 hour",
        textCol = "payload")
      .writeStream.format("memory").queryName("neardup_binstore_stream")
      .outputMode("append").start()
    try {
      // 1 re-sends the stored payload byte-identically → its MinHash key
      // equals the stored sig_key → dropped; 2 is unrelated → kept;
      // 3/103 are empty payloads → per-doc raw: keys, BOTH pass
      mem.addData((1L, blob(1), ts(10)), (2L, blob(9), ts(20)),
        (3L, Array.emptyByteArray, ts(22)), (103L, Array.emptyByteArray, ts(23)))
      q.processAllAvailable()
      // 4 repeats 2's exact bytes within the stream → in-stream key dedup
      mem.addData((4L, blob(9), ts(30)))
      q.processAllAvailable()
      val ids = spark.table("neardup_binstore_stream")
        .select("doc_id").as[Long].collect().sorted
      assert(ids.toSeq === Seq(2L, 3L, 103L),
        "stored replay dropped; fresh kept; empty blobs always pass")
    } finally q.stop()
  }

  test("takedown during a running store stream fails LOUDLY; a restart honors the ticket") {
    // r10 VERDICT #3b / r9 #8: what happens when a removal ticket lands
    // while nearDupVsStoreStream is running? The static store side's
    // file listing is frozen at query start, and the takedown's
    // crash-safe swap REPLACES the signatures dir — so the next
    // micro-batch fails with FAILED_READ_FILE, never silently keeps
    // suppressing ingest with the removed docs' signatures (the
    // compliance-bug direction) and never silently serves a half-swapped
    // store. The documented contract is RESTART-TO-HONOR: the restarted
    // stream re-lists and serves the post-takedown store. A pipeline
    // that must absorb takedowns without a restart runs the batch serve
    // inside foreachBatch, where the store frame (and its listing) is
    // rebuilt per micro-batch.
    implicit val sq = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("sigstore-takedown-stream").toString
    val common = (1 to 40).map(i => s"w$i").mkString(" ")
    graft.text.Store.build(
      Seq((900L, common)).toDF("doc_id", "text"), dir)
    val mem = MemoryStream[(Long, String, Timestamp)]
    def start(name: String) = Streams.nearDupVsStoreStream(
        mem.toDF().toDF("doc_id", "text", "ts"), dir, "1 hour")
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    val q = start("takedown_stream")
    try {
      mem.addData((1L, common, ts(10)))
      q.processAllAvailable()
      assert(spark.table("takedown_stream").isEmpty,
        "doc 1 near-dups the stored doc 900 — suppressed")
      // the ticket lands mid-stream: the swap replaces the signatures dir
      graft.text.Store.removeDocs(spark, dir, Seq(900L).toDF("doc_id"))
      mem.addData((2L, common, ts(7200)))
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      assert(e.getMessage.contains("FAILED_READ_FILE") ||
        e.getCause.getMessage.contains("FAILED_READ_FILE"), e.getMessage)
    } finally q.stop()
    // restart-to-honor: the fresh query lists the post-takedown store,
    // so the same content now SURVIVES (900's suppression is gone) and
    // doc 2 — unprocessed when the query died — is delivered by the
    // replayed micro-batch exactly once
    val q2 = start("takedown_stream_restarted")
    try {
      // fresh content (a repeat of `common` would be dropped by the
      // in-stream exact-repeat stage — doc 2 already carries it)
      mem.addData((3L, (200 to 240).map(i => s"z$i").mkString(" "), ts(14400)))
      q2.processAllAvailable()
      val ids = spark.table("takedown_stream_restarted")
        .select("doc_id").as[Long].collect().toSet
      assert(ids === Set(2L, 3L),
        "post-restart: doc 2 (blocked mid-takedown, content matching only " +
          "REMOVED signatures) is delivered, and the stream is live")
    } finally q2.stop()
  }

  test("cluster-store embedding ingest: foreachBatch serve dedups each drop vs the growing store") {
    // The production shape for incremental SEMANTIC dedup on a stream:
    // the pair leg needs the corpus-sized stored-vectors table, so it
    // runs as the BATCH serve inside foreachBatch (the same advice
    // decontaminateStream documents for large benchmarks) — each
    // micro-batch is one "drop" against the persisted cluster store,
    // survivors append, so batch N+1 sees batch N's survivors.
    import graft.vector.ClusterStore
    implicit val sq = spark.sqlContext
    def prep(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("n2", graft.functions.VectorDot.of(col("q"), col("q")))
    val dir = java.nio.file.Files.createTempDirectory("stream-clusterstore").toString
    ClusterStore.build(prep(Seq(
      (1L, Seq(10L, 0L, 0L, 0L)), (2L, Seq(0L, 10L, 0L, 0L))).toDF("vec_id", "q")),
      dir, k = 1)

    val survivors = scala.collection.mutable.Set.empty[Long]
    val mem = MemoryStream[(Long, Seq[Long])]
    val q = mem.toDF().toDF("vec_id", "q").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val dec = ClusterStore.dedupNewDropVsStore(prep(batch), dir)
        survivors ++= dec.filter(col("dropped") === 0)
          .select("vec_id").as[Long].collect()
        ()
      }
      .start()
    try {
      mem.addData((3L, Seq(10L, 0L, 0L, 0L)), (4L, Seq(0L, 0L, 10L, 0L)))
      q.processAllAvailable() // 3 dups stored 1; 4 survives + appends
      mem.addData((9L, Seq(0L, 0L, 20L, 0L)))
      q.processAllAvailable() // 9 dups batch-1's APPENDED survivor 4
      assert(survivors.toSet === Set(4L))
      assert(ClusterStore.loadVectors(spark, dir).count() === 3L)
    } finally q.stop()
  }

  test("profile-store ingest: foreachBatch appends per-batch partials; drift sees each batch as a drop") {
    // The streaming half of q136/q138: each micro-batch contributes its
    // constant-size mergeable partial row per column (batch id = drop
    // id — unique per epoch, so a foreachBatch retry of the SAME epoch
    // is refused by the store instead of double-counting), and corpus
    // stats / per-drop drift are served from the store without the
    // stream ever being replayed.
    import graft.operators.ProfileStore
    implicit val sq = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("stream-profstore").toString
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("k", "s").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, epoch: Long) =>
        val dropId = f"batch-$epoch%06d" // zero-padded: drift's drop order
        if (!ProfileStore.exists(spark, dir))
          ProfileStore.build(batch, Seq("k", "s"), dir, dropId)
        else if (!ProfileStore.drops(spark, dir).contains(dropId))
          ProfileStore.append(batch, Seq("k", "s"), dir, dropId)
        ()
      }
      .start()
    try {
      mem.addData((1L, "a"), (2L, "b"))
      q.processAllAvailable()
      mem.addData((3L, null), (4L, null), (5L, "c"), (6L, "d"))
      q.processAllAvailable()
      val m = ProfileStore.serve(spark, dir)
        .select("column_name", "n_rows", "n_nulls")
        .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
      assert(m("k") === ((6L, 0L)) && m("s") === ((6L, 2L)))
      val drift = ProfileStore.drift(spark, dir)
        .filter(col("column_name") === "s")
        .select("drop_id", "null_ppm", "d_null_ppm")
        .as[(String, Long, Option[Long])].collect()
        .map(r => r._1 -> (r._2, r._3)).toMap
      assert(drift.size === 2)
      val perBatch = drift.toSeq.sortBy(_._1).map(_._2)
      assert(perBatch.head === ((0L, None)), "first batch: no nulls, no prior drop")
      assert(perBatch.last === ((500000L, Some(500000L))),
        "second batch: the null explosion surfaces in the drift report")
    } finally q.stop()
  }

  test("checkpointed restart: store ingest is exactly-once across a crash-replayed epoch") {
    // r10 VERDICT #6: the foreachBatch ingest paths claim per-epoch drop
    // ids + retry-refusal as their idempotency story, but no test killed
    // a query and restarted it from its checkpoint. This does, over a
    // real FILE source: process two batches, stop, DELETE the last
    // commit marker from the checkpoint (exactly the on-disk state after
    // a crash between the epoch's foreachBatch and its commit — Spark
    // must then replay that epoch on restart), restart, add a third
    // file. Exactly-once = the replayed epoch is refused by the ledger
    // (skip, not double-ingest), the new file lands once, and the served
    // model equals a one-shot batch ingest of all three files.
    import graft.text.{Lm, LmStore}
    val root = java.nio.file.Files.createTempDirectory("stream-restart")
    val inDir = s"$root/in"; val ckpt = s"$root/ckpt"; val store = s"$root/lm"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(inDir))
    def addFile(name: String, rows: (Long, String)*): Unit = {
      // the file source lists FILES under inDir, not nested dirs: write
      // to a scratch dir, move the single part-file in as <name>.parquet
      val scratch = s"$root/stage-$name"
      rows.toDF("doc_id", "text").coalesce(1)
        .write.mode("overwrite").parquet(scratch)
      val part = new java.io.File(scratch).listFiles()
        .filter(_.getName.startsWith("part-")).head
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(s"$inDir/$name.parquet"))
    }
    def ingest(batch: org.apache.spark.sql.DataFrame, epoch: Long): Unit = {
      val dropId = f"epoch-$epoch%06d"
      if (!LmStore.exists(spark, store))
        LmStore.build(batch, store, dropId)
      else if (!LmStore.drops(spark, store).contains(dropId))
        LmStore.append(batch, store, dropId)
      // already stored: the crash-replay of a committed epoch — skip
    }
    val schema = "doc_id LONG, text STRING"
    def start() = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(inDir)
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch(ingest _).start()

    addFile("a", (1L, "aa bb cc"))
    val q1 = start()
    try {
      q1.processAllAvailable()
      addFile("b", (2L, "dd ee ff"))
      q1.processAllAvailable()
    } finally q1.stop()
    val drops1 = LmStore.drops(spark, store)
    assert(drops1.size === 2, s"two epochs ingested, got $drops1")

    // simulate the crash: the LAST epoch ran its foreachBatch (the drop
    // is in the ledger) but its commit marker never landed
    val commits = new java.io.File(s"$ckpt/commits").listFiles()
      .filter(_.getName.forall(_.isDigit)).sortBy(_.getName.toLong)
    assert(commits.nonEmpty)
    assert(commits.last.delete(), "crash simulation: drop the last commit")
    // the local FS keeps a .crc sidecar per commit file; leaving it
    // behind makes the re-commit's rename fail as a phantom concurrent
    // writer — a real crash loses both together
    new java.io.File(s"$ckpt/commits/.${commits.last.getName}.crc").delete()

    val q2 = start()
    try {
      q2.processAllAvailable() // replays the uncommitted epoch: must skip
      addFile("c", (3L, "gg hh ii"))
      q2.processAllAvailable()
    } finally q2.stop()

    assert(LmStore.drops(spark, store).size === 3,
      "replayed epoch skipped (not re-ingested), new epoch landed once")
    val served = LmStore.serveModel(spark, store)
      .c1.as[(String, Long)].collect().toSet
    val oneShot = Lm.train(Seq((1L, "aa bb cc"), (2L, "dd ee ff"),
        (3L, "gg hh ii")).toDF("doc_id", "text"))
      .c1.as[(String, Long)].collect().toSet
    assert(served === oneShot,
      "served model == one-shot ingest: nothing lost, nothing doubled")
  }

  test("gram-store ingest: foreachBatch novelty scoring against the growing ledger") {
    // The streaming half of q147: each micro-batch is scored against the
    // history ∪ itself, then its partials join the store — batch N+1's
    // novelty reflects batch N's grams.
    import graft.text.GramStore
    implicit val sq = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("stream-gramstore").toString
    GramStore.build(Seq((1L, "a b c d")).toDF("doc_id", "text"), dir, "seed")
    val scores = scala.collection.mutable.Map.empty[Long, Long]
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, epoch: Long) =>
        val dropId = f"batch-$epoch%06d"
        scores ++= GramStore.noveltyOfDrop(batch, dir)
          .select("doc_id", "n_novel").as[(Long, Long)].collect()
        if (!GramStore.drops(spark, dir).contains(dropId))
          GramStore.appendStaged(batch, dir, dropId)()
        ()
      }
      .start()
    try {
      mem.addData((10L, "a b c"), (11L, "x y z"))
      q.processAllAvailable() // 10 repeats the seed's gram, 11 is fresh
      mem.addData((20L, "x y z"))
      q.processAllAvailable() // 20 repeats batch-1's APPENDED gram
      assert(scores(10L) === 0L && scores(11L) === 1L && scores(20L) === 0L)
    } finally q.stop()
  }

  test("sketch-store ingest: admission-gated foreachBatch — a stale replayed batch is recorded-and-skipped") {
    // The q185 decision CLOSED into the ingest loop (r12 verdict #8):
    // each micro-batch passes SketchStore.ingestGated, which sketches
    // the candidate ONCE, rejects drops whose containment vs the stored
    // history crosses the gate, and records EVERY verdict in the store's
    // _admissions log — so a replayed/stale crawl never joins the
    // ledger, and the skip is auditable state rather than a lost log line.
    import graft.text.SketchStore
    implicit val sq = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("stream-sketchgate").toString
    def text(prefix: String) = (1 to 2000).map(i => s"$prefix$i").mkString(" ")
    val verdicts = scala.collection.mutable.ArrayBuffer.empty[(String, Boolean)]
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, epoch: Long) =>
        val dropId = f"batch-$epoch%06d"
        verdicts += dropId ->
          SketchStore.ingestGated(batch, dir, dropId, maxContainmentPpm = 900000L)
        ()
      }
      .start()
    try {
      mem.addData((1L, text("x")))
      q.processAllAvailable() // epoch 0: bootstrap — admitted
      mem.addData((2L, text("y")))
      q.processAllAvailable() // epoch 1: all-new grams — admitted
      mem.addData((3L, text("y")))
      q.processAllAvailable() // epoch 2: a STALE replay of epoch 1's
                              // content under a fresh id — rejected
      assert(verdicts.toSeq === Seq(
        "batch-000000" -> true, "batch-000001" -> true,
        "batch-000002" -> false))
      // the ledger holds only the admitted drops…
      assert(SketchStore.drops(spark, dir) ===
        Set("batch-000000", "batch-000001"))
      // …and the admission log shows all three verdicts, the rejection
      // with its measured containment above the gate
      val log = SketchStore.admissionLog(spark, dir)
        .orderBy("seq")
        .select("drop_id", "verdict", "containment_ppm")
        .collect().map(r => (r.getString(0), r.getString(1),
          Option(r.get(2)).map(_.asInstanceOf[Long])))
      assert(log.map(x => (x._1, x._2)).toSeq === Seq(
        ("batch-000000", "admitted-bootstrap"),
        ("batch-000001", "admitted"),
        ("batch-000002", "rejected-stale")))
      assert(log.last._3.exists(_ >= 900000L),
        s"the rejection must carry the containment that triggered it: ${log.toSeq}")
      // a foreachBatch RETRY of an already-ingested epoch id converges:
      // recorded-and-skipped, never a double append
      assert(!SketchStore.ingestGated(
        Seq((2L, text("y"))).toDF("doc_id", "text"), dir, "batch-000001"))
      assert(SketchStore.admissionLog(spark, dir)
        .filter(org.apache.spark.sql.functions.col("verdict") ===
          "skipped-duplicate-drop").count() === 1L)
    } finally q.stop()
  }

  test("span-store ingest: foreachBatch scrubs each batch vs history, appends kept grams") {
    // The streaming half of q151: each micro-batch's text is scrubbed
    // against the store ∪ itself, the KEPT text's gram-df partials join
    // the store — batch N+1's keepers include what batch N kept (and
    // nothing batch N scrubbed away, the --scrub-spans store contract).
    import graft.text.SpanStore
    implicit val sq = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("stream-spanstore").toString
    val boiler = (1 to 10).map(i => s"s$i").mkString(" ")
    SpanStore.build(Seq((1L, boiler + " unique history tail"))
      .toDF("doc_id", "text"), dir, "seed")
    val out = scala.collection.mutable.Map.empty[Long, String]
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, epoch: Long) =>
        val dropId = f"batch-$epoch%06d"
        val scrubbed = SpanStore.scrubVsDrop(batch, dir)
          .select(col("doc_id"), col("scrubbed_text"))
        out ++= scrubbed.as[(Long, String)].collect()
        val kept = scrubbed.withColumnRenamed("scrubbed_text", "text")
        if (!SpanStore.drops(spark, dir).contains(dropId))
          SpanStore.appendStaged(kept, dir, dropId)()
        ()
      }
      .start()
    try {
      mem.addData((10L, "lead " + boiler + " aa bb cc dd ee"))
      q.processAllAvailable() // seed owns the boilerplate: scrubbed out
      assert(out(10L) === "lead aa bb cc dd ee")
      mem.addData((20L, "aa bb cc dd ee trailing"))
      q.processAllAvailable() // batch-1's KEPT tail owns "aa bb cc dd ee"
      assert(out(20L) === "trailing")
    } finally q.stop()
  }

  test("chunk-store ingest: foreachBatch CDC census against the growing history") {
    // The streaming half of q162: each micro-batch is censused against
    // store ∪ batch, then its chunk partials join the store — batch
    // N+1's shared chunks include batch N's.
    import graft.text.ChunkStore
    implicit val sq = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("stream-chunkstore").toString
    val body = (1 to 60).map(i => s"c$i").mkString(" ")
    ChunkStore.build(Seq((1L, body)).toDF("doc_id", "text"), dir, "seed")
    val shares = scala.collection.mutable.Map.empty[Long, Long]
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, epoch: Long) =>
        val dropId = f"batch-$epoch%06d"
        shares ++= ChunkStore.dupStatsVsDrop(batch, dir)
          .select("doc_id", "n_dup_chunks").as[(Long, Long)].collect()
        if (!ChunkStore.drops(spark, dir).contains(dropId))
          ChunkStore.appendStaged(batch, dir, dropId)()
        ()
      }
      .start()
    try {
      val fresh = (200 to 260).map(i => s"f$i").mkString(" ")
      mem.addData((10L, "intro " + body), (11L, fresh))
      q.processAllAvailable() // 10 shares the seed's chunks, 11 is fresh
      assert(shares(10L) > 0L && shares(11L) === 0L, shares.toString)
      mem.addData((20L, fresh + " outro"))
      q.processAllAvailable() // 20 shares batch-1's APPENDED fresh chunks
      assert(shares(20L) > 0L, shares.toString)
    } finally q.stop()
  }

  test("postings-store ingest: foreachBatch retrieval against the growing index") {
    // The streaming half of q165: each micro-batch's probe docs retrieve
    // over store ∪ batch, then the batch's postings join the store —
    // batch N+1's queries surface batch N's docs without re-tokenizing
    // any earlier batch.
    import org.apache.spark.sql.functions.col
    import graft.text.PostingsStore
    implicit val sq = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("stream-postings").toString
    val filler = (1 to 20).map(_ => "common filler words").mkString(" ")
    PostingsStore.build(
      Seq((1L, s"needle $filler")).toDF("doc_id", "text"), dir, "seed")
    val hits = scala.collection.mutable.Map.empty[Long, Set[Long]]
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, epoch: Long) =>
        val dropId = f"batch-$epoch%06d"
        val topk = PostingsStore
          .bm25TopKVsDrop(batch, dir, probe = col("doc_id") >= 0L)
          .select("query_id", "doc_id")
          .as[(Long, Long)].collect()
        topk.groupBy(_._1).foreach { case (qid, rows) =>
          hits(qid) = rows.map(_._2).toSet }
        if (!PostingsStore.drops(spark, dir).contains(dropId))
          PostingsStore.appendStaged(batch, dir, dropId)()
        ()
      }
      .start()
    try {
      mem.addData((10L, s"needle probe $filler"))
      q.processAllAvailable() // 10's needle query retrieves the seed doc
      assert(hits(10L).contains(1L), hits.toString)
      mem.addData((20L, s"needle needle again $filler"))
      q.processAllAvailable() // 20 sees both the seed and batch-0's doc 10
      assert(hits(20L).contains(1L) && hits(20L).contains(10L), hits.toString)
    } finally q.stop()
  }

  test("classifier-store ingest: foreachBatch training on the growing count store") {
    // The streaming half of q169: each micro-batch of LABELED docs appends
    // its (label, term, cnt) partials; a fixed held-out probe is classified
    // against the store-so-far, so batch N+1's predictions reflect batch
    // N's classes without retraining on any earlier batch. Counts
    // sum-merge, so the model after K batches ≡ from-scratch on their
    // union — the same invariant q169 hash-gates.
    import graft.text.ClassifyStore
    implicit val sq = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("stream-classify").toString
    ClassifyStore.build(
      Seq((1L, "aa", "alpha alpha beta shared")).toDF("doc_id", "lang", "text"),
      dir, "seed")
    val probe = Seq((100L, "?", "omega psi shared"))
      .toDF("doc_id", "lang", "text")
    val preds = scala.collection.mutable.ArrayBuffer.empty[String]
    val mem = MemoryStream[(Long, String, String)]
    val q = mem.toDF().toDF("doc_id", "lang", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, epoch: Long) =>
        val dropId = f"batch-$epoch%06d"
        if (!ClassifyStore.drops(spark, dir).contains(dropId))
          ClassifyStore.appendStaged(batch, dir, dropId)()
        preds += ClassifyStore.predictVsStore(probe, dir)
          .select("pred_label").as[String].collect().head
        ()
      }
      .start()
    try {
      mem.addData((2L, "aa", "alpha gamma shared"))
      q.processAllAvailable() // only class aa exists: the probe must say aa
      assert(preds.last === "aa", preds.toString)
      mem.addData((3L, "bb", "omega omega psi psi shared"))
      q.processAllAvailable() // batch-1 taught bb: the probe flips to bb
      assert(preds.last === "bb", preds.toString)
    } finally q.stop()
  }

  test("dsir-store ingest: foreachBatch scoring against the growing raw profile") {
    // The streaming half of q176: each micro-batch of RAW docs is scored
    // against the trusted target + the raw profile accrued so far ∪ the
    // batch, then its (f, cnt) partials append. The raw pool growing with
    // target-like text must DEPRESS later identical batches' scores (their
    // features stop looking rare in the raw pool) — and every batch's
    // scores ≡ from-scratch Dsir.score on the union so far, the same
    // invariant q176 hash-gates.
    import graft.text.{Dsir, DsirStore}
    implicit val sq = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("stream-dsir").toString
    val target = Seq((100L, "alpha beta alpha beta"))
      .toDF("doc_id", "text")
    val seed = Seq((1L, "noise junk filler junk"))
      .toDF("doc_id", "text")
    DsirStore.build(seed, dir, "seed")
    val scores = scala.collection.mutable.Map.empty[Long, Long]
    var lastVsScratch = true
    var history = seed
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, epoch: Long) =>
        val dropId = f"batch-$epoch%06d"
        val got = DsirStore.scoreVsDrop(target, batch, dir)
          .select("doc_id", "score_ppm").as[(Long, Long)].collect()
        got.foreach { case (id, sc) => scores(id) = sc }
        val scratch = Dsir.score(target, history.unionByName(batch))
          .join(batch.select("doc_id"), "doc_id")
          .select("doc_id", "score_ppm").as[(Long, Long)].collect()
        lastVsScratch = got.sorted.sameElements(scratch.sorted)
        if (!DsirStore.drops(spark, dir).contains(dropId))
          DsirStore.appendStaged(batch, dir, dropId)()
        history = history.unionByName(batch)
        ()
      }
      .start()
    try {
      mem.addData((10L, "alpha beta"))
      q.processAllAvailable()
      assert(lastVsScratch, "batch-0 scores must match from-scratch")
      mem.addData((20L, "alpha beta"))
      q.processAllAvailable()
      assert(lastVsScratch, "batch-1 scores must match from-scratch")
      assert(scores(20L) < scores(10L),
        "batch-0's ingested text must depress batch-1's identical doc: " +
          scores.toString)
    } finally q.stop()
  }

  test("sketch-store ingest: foreachBatch appends per-batch registers; serve tracks the union") {
    import graft.text.{DistinctSketch, SketchStore}
    implicit val sq = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("stream-sketch").toString
    val seed = Seq((1L, "alpha beta gamma delta epsilon"))
      .toDF("doc_id", "text")
    SketchStore.build(seed, dir, "seed")
    var history = seed
    var lastVsScratch = true
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, epoch: Long) =>
        val dropId = f"batch-$epoch%06d"
        if (!SketchStore.drops(spark, dir).contains(dropId))
          SketchStore.appendStaged(batch, dir, dropId)()
        history = history.unionByName(batch)
        val got = SketchStore.serveRegisters(spark, dir)
          .as[(Long, Long)].collect().toSet
        val scratch = DistinctSketch.registers(DistinctSketch.grams(history))
          .as[(Long, Long)].collect().toSet
        lastVsScratch = got == scratch
        ()
      }
      .start()
    try {
      mem.addData((10L, "zeta eta theta iota kappa"))
      q.processAllAvailable()
      assert(lastVsScratch,
        "served registers must equal from-scratch after batch 0")
      mem.addData((20L, "lambda mu nu xi omicron pi"))
      q.processAllAvailable()
      assert(lastVsScratch,
        "served registers must equal from-scratch after batch 1")
      assert(SketchStore.drops(spark, dir) ===
        Set("seed", "batch-000000", "batch-000001"))
    } finally q.stop()
  }

  test("freq-store ingest: foreachBatch appends per-batch counters; serve tracks the union; mid-stream unlearn subtracts") {
    import graft.text.{FreqSketch, FreqStore}
    implicit val sq = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("stream-freq").toString
    val seed = Seq((1L, "alpha beta gamma delta epsilon"))
      .toDF("doc_id", "text")
    FreqStore.build(seed, dir, "seed")
    var history = seed
    var lastVsScratch = true
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, epoch: Long) =>
        val dropId = f"batch-$epoch%06d"
        // per-epoch drop id: a foreachBatch RETRY of the same epoch is
        // skipped — mandatory for a sum-merge (a replay would double-count)
        if (!FreqStore.drops(spark, dir).contains(dropId))
          FreqStore.appendStaged(batch, dir, dropId)()
        history = history.unionByName(batch)
        val got = FreqStore.serveCounters(spark, dir)
          .as[(Long, Long, Long)].collect().toSet
        val scratch = FreqSketch.counters(FreqSketch.grams(history))
          .as[(Long, Long, Long)].collect().toSet
        lastVsScratch = got == scratch
        ()
      }
      .start()
    try {
      mem.addData((10L, "zeta eta theta iota kappa"))
      q.processAllAvailable()
      assert(lastVsScratch,
        "served counters must equal from-scratch after batch 0")
      mem.addData((20L, "lambda mu nu xi omicron pi"),
        (21L, "alpha beta gamma delta epsilon"))
      q.processAllAvailable()
      assert(lastVsScratch,
        "served counters must equal from-scratch after batch 1 " +
          "(incl. doc 21 repeating the seed text — sums, not maxes)")
    } finally q.stop()
    // a removal ticket arrives for doc 21: subtract its own sketch from
    // the batch drop it arrived in — the stream's history is untouched
    val purged = Seq((21L, "alpha beta gamma delta epsilon"))
      .toDF("doc_id", "text")
    FreqStore.unlearnDocs(purged, dir, "batch-000001")
    val got = FreqStore.serveCounters(spark, dir)
      .as[(Long, Long, Long)].collect().toSet
    val want = FreqSketch.counters(FreqSketch.grams(
        seed.unionByName(Seq(
          (10L, "zeta eta theta iota kappa"),
          (20L, "lambda mu nu xi omicron pi")).toDF("doc_id", "text"))))
      .as[(Long, Long, Long)].collect().toSet
    assert(got === want,
      "post-unlearn serve must equal a stream that never saw doc 21")
  }

  test("sample-store ingest: foreachBatch appends per-batch cuts; serve is the exact union sample") {
    import graft.text.{KmvSample, SampleStore}
    implicit val sq = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("stream-sample").toString
    val seed = (1L to 40L).map(i => (i, s"s$i s$i"))
    SampleStore.build(seed.toDF("doc_id", "text"), dir, "seed", k = 16)
    var history = seed
    var lastVsScratch = true
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, epoch: Long) =>
        val dropId = f"batch-$epoch%06d"
        // per-epoch drop id: a retry is skipped (a double-append would
        // hand the epoch's docs two chances at the cut)
        if (!SampleStore.drops(spark, dir).contains(dropId))
          SampleStore.appendStaged(batch, dir, dropId)()
        history = history ++ batch.as[(Long, String)].collect()
        val got = SampleStore.serveSample(spark, dir)
          .collect().map(_.toSeq).toSet
        val scratch = KmvSample.sample(history.toDF("doc_id", "text"), 16)
          .collect().map(_.toSeq).toSet
        lastVsScratch = got == scratch
        ()
      }
      .start()
    try {
      mem.addData((41L to 80L).map(i => (i, s"t$i")): _*)
      q.processAllAvailable()
      assert(lastVsScratch,
        "served sample must equal from-scratch after batch 0")
      mem.addData((81L to 160L).map(i => (i, s"u$i u$i u$i")): _*)
      q.processAllAvailable()
      assert(lastVsScratch,
        "served sample must equal from-scratch after batch 1")
      assert(SampleStore.drops(spark, dir) ===
        Set("seed", "batch-000000", "batch-000001"))
    } finally q.stop()
  }

  test("stream-static broadcast enrichment join (dimension lookup on a stream)") {
    implicit val sq = spark.sqlContext
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("user_id", "tier")
    val mem = MemoryStream[(Long, Timestamp)]
    val events = mem.toDF().toDF("user_id", "ts")
    val q = events.join(broadcast(dim), Seq("user_id"), "left")
      .writeStream.format("memory").queryName("enriched_stream")
      .outputMode("append").start()
    try {
      mem.addData((1L, ts(10)), (2L, ts(20)), (3L, ts(30)))
      q.processAllAvailable()
      val out = spark.table("enriched_stream")
        .select("user_id", "tier").as[(Long, Option[String])].collect().toMap
      assert(out === Map(1L -> Some("gold"), 2L -> Some("silver"), 3L -> None))
    } finally q.stop()
  }

  test("deterministic sampling composes with a stream (stateless, same keys as batch)") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp)]
    val df = mem.toDF().toDF("event_id", "ts")
    val q = graft.operators.Sampling
      .deterministicSample(df, col("event_id"), 300)
      .writeStream.format("memory").queryName("sampled_stream")
      .outputMode("append").start()
    try {
      mem.addData((1L to 200L).map(i => (i, ts(10))): _*)
      q.processAllAvailable()
      val streamed = spark.table("sampled_stream")
        .select("event_id").as[Long].collect().toSet
      val batch = graft.operators.Sampling
        .deterministicSample(
          (1L to 200L).toDF("event_id"), col("event_id"), 300)
        .as[Long].collect().toSet
      assert(streamed === batch,
        "the stream must sample exactly the keys the batch pipeline samples")
    } finally q.stop()
  }

  test("watermarked stream-stream interval join matches within the window only") {
    implicit val sq = spark.sqlContext
    val lm = MemoryStream[(Long, Long, Timestamp)]
    val rm = MemoryStream[(Long, Long, Timestamp)]
    val l = lm.toDF().toDF("event_id", "user_id", "ts")
    val r = rm.toDF().toDF("event_id", "user_id", "ts")
    val q = Streams.toMemorySink(
      Streams.intervalJoinStream(l, r, "user_id", 300L, "10 minutes"),
      "sjoin", org.apache.spark.sql.streaming.OutputMode.Append())
    try {
      lm.addData((1L, 7L, ts(1000)), (2L, 8L, ts(1000)))
      rm.addData((10L, 7L, ts(1100)), (11L, 7L, ts(1400)), (12L, 8L, ts(1200)))
      q.processAllAvailable()
      val pairs = spark.table("sjoin").select("l_id", "r_id").as[(Long, Long)].collect().toSet
      assert(pairs === Set((1L, 10L), (2L, 12L))) // 11 is outside (1000, 1300]
    } finally q.stop()
  }

  test("stateful sessionization accumulates across micro-batches") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Streams.SessEvent]
    val q = Streams.toMemorySink(
      Streams.sessionizeStream(mem.toDS(), gapSec = 1800L).toDF(), "sess_test")
    try {
      // Start above t=0: the initial watermark is 0 and the stateful op's
      // late-data filter drops rows with ts <= watermark (boundary inclusive).
      mem.addData(Streams.SessEvent(1L, ts(10)), Streams.SessEvent(1L, ts(100)))
      q.processAllAvailable()
      mem.addData(Streams.SessEvent(1L, ts(10000))) // > gap → new session
      q.processAllAvailable()
      val got = spark.table("sess_test")
        .groupBy("user_id").agg(max("n_sessions").as("s"), max("n_events").as("e"))
        .as[(Long, Long, Long)].collect()
        .map { case (u, s2, e) => u -> ((s2, e)) }.toMap
      assert(got(1L) === ((2L, 3L)))
    } finally q.stop()
  }

  test("sessionization evicts inactive keys once the watermark passes their gap") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Streams.SessEvent]
    val q = Streams.toMemorySink(
      Streams.sessionizeStream(mem.toDS(), gapSec = 600L, lateness = "1 minute").toDF(),
      "sess_evict")
    try {
      // ts > 0: rows with ts <= the initial watermark (0) are dropped late.
      mem.addData(Streams.SessEvent(1L, ts(5)), Streams.SessEvent(2L, ts(10)))
      q.processAllAvailable() // both keys live; watermark ≈ 0
      def stateRows: Long = q.lastProgress.stateOperators.head.numRowsTotal
      assert(stateRows === 2L)
      // user 2 keeps going far in the future → watermark passes user 1's
      // timeout (5 + 600 s) after this batch commits...
      mem.addData(Streams.SessEvent(2L, ts(100000)))
      q.processAllAvailable()
      // ...and the NEXT batch fires the timeout: user 1 is emitted closed
      // and evicted from the store.
      mem.addData(Streams.SessEvent(2L, ts(100010)))
      q.processAllAvailable()
      assert(stateRows === 1L, "inactive key must be evicted from the state store")
      val closed = spark.table("sess_evict")
        .filter(col("closed"))
        .select("user_id", "n_sessions", "n_events")
        .as[(Long, Long, Long)].collect().toSet
      assert(closed === Set((1L, 1L, 1L)), "evicted key emits one final closed summary")
    } finally q.stop()
  }

  test("semanticDedupVsStoreStream: store near-dups drop at ingest, exact repeats dedup in-stream") {
    implicit val sq = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-semstream").toString
    // store: two orthogonal unit vectors, one cell (k=1) — only the
    // cosine >= 1/2 rule decides
    val corpus = Seq(
        900L -> Seq(1.0, 0.0, 0.0, 0.0),
        901L -> Seq(0.0, 1.0, 0.0, 0.0))
      .toDF("vec_id", "embedding")
      .select(col("vec_id"),
        graft.vector.VectorOps.quantize(col("embedding")).as("q"))
      .withColumn("n2", graft.functions.VectorDot.of(col("q"), col("q")))
    graft.vector.ClusterStore.build(corpus, dir, k = 1)

    val mem = MemoryStream[(Long, Seq[Double], Timestamp)]
    val vecs = mem.toDF().toDF("vec_id", "embedding", "ts")
    val q = Streams.semanticDedupVsStoreStream(vecs, dir, "1 hour")
      .writeStream.format("memory").queryName("sem_stream")
      .outputMode("append").start()
    try {
      mem.addData(
        (10L, Seq(0.99, 0.05, 0.0, 0.0), ts(10)), // cos ≈ 0.999 vs stored 900 → dropped
        (11L, Seq(0.0, 0.0, 1.0, 0.0), ts(20)))   // orthogonal to the store → kept
      q.processAllAvailable()
      // identical direction, later micro-batch: quantized-exact key → dropped
      mem.addData((12L, Seq(0.0, 0.0, 1.0, 0.0), ts(30)))
      // near-dups BOTH stored vectors (cos ≈ 0.69 each) → dropped
      mem.addData((13L, Seq(0.6, 0.6, 0.2, 0.0), ts(40)))
      q.processAllAvailable()
      val out = spark.table("sem_stream")
      assert(out.select("vec_id").as[Long].collect().toSeq === Seq(11L))
      // internal columns dropped; home cell exposed
      assert(out.columns.toSet === Set("vec_id", "embedding", "ts", "cid"))
      // the batch path agrees: replaying the stream rows through the
      // read-only batch serve drops 10 and 13 too (11/12 split differs
      // only by the in-stream exact guard vs batch smallest-id rule)
      val batch = graft.vector.ClusterStore.dedupNewDropVsStoreReadOnly(
        Seq(10L -> Seq(0.99, 0.05, 0.0, 0.0), 13L -> Seq(0.6, 0.6, 0.2, 0.0))
          .toDF("vec_id", "embedding")
          .select(col("vec_id"),
            graft.vector.VectorOps.quantize(col("embedding")).as("q"))
          .withColumn("n2", graft.functions.VectorDot.of(col("q"), col("q"))),
        dir)
      assert(batch.filter(col("dropped") === 0).count() === 0L)
    } finally q.stop()
  }

  test("curation spine as a STREAM: admission-gated epochs, exactly-once across a crash replay") {
    // r13 VERDICT missing #1 + #2 closed together: the daily spine runs
    // as one foreachBatch loop — each epoch is replay-guarded (DSIR
    // ledger), admission-gated (novelty store, BEFORE curation cost),
    // curated against the ledger-served history, and committed to all
    // three ledgers only after its selection lands. Driven over a real
    // FILE source with the same crash simulation as the LmStore restart
    // test: delete the last checkpoint commit marker, restart, and the
    // replayed epoch must converge by SKIPPING (recorded), not by
    // re-curating or double-enrolling.
    import graft.text.{Curation, DsirStore, EvalSuite, SketchStore, Store}
    val root = java.nio.file.Files.createTempDirectory("stream-spine")
    val inDir = s"$root/in"; val ckpt = s"$root/ckpt"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(inDir))
    val d = Tables(spark, "/root/testdata/sf0.001").documents
      .select("doc_id", "source", "lang", "text")
    val hist = d.filter(col("doc_id") % 3 === 0)
    Store.build(hist, s"$root/sig")
    DsirStore.build(hist, s"$root/dsir", "hist")
    val target = d.filter(col("doc_id") % 19 === 0)
    target.write.parquet(s"$root/target")
    val bench = EvalSuite.table(spark).withColumnRenamed("bench_id", "doc_id")
    def addDrop(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val scratch = s"$root/stage-$name"
      df.coalesce(1).write.mode("overwrite").parquet(scratch)
      val part = new java.io.File(scratch).listFiles()
        .filter(_.getName.startsWith("part-")).head
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(s"$inDir/$name.parquet"))
    }
    val schema = "doc_id LONG, source STRING, lang STRING, text STRING"
    def start() = Curation.spineStream(
      spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(inDir),
      spark.read.parquet(s"$root/target"), bench,
      s"$root/sig", s"$root/dsir", s"$root/nov", s"$root/out", ckpt)

    val day1 = d.filter(col("doc_id") % 3 === 1)
    addDrop("day1", day1)
    val q1 = start()
    try {
      q1.processAllAvailable() // epoch 0: bootstrap-admitted, curated
      // epoch 1: day 1's content re-crawled under fresh ids — STALE;
      // admission must reject it before the spine runs
      addDrop("day2", day1.withColumn("doc_id", col("doc_id") + 10000000L))
      q1.processAllAvailable()
    } finally q1.stop()
    assert(new java.io.File(s"$root/out/epoch-000000").isDirectory,
      "admitted epoch writes its selection")
    assert(!new java.io.File(s"$root/out/epoch-000001").exists,
      "rejected epoch writes nothing")
    assert(DsirStore.drops(spark, s"$root/dsir") === Set("hist", "epoch-000000"),
      "only the admitted epoch reached the DSIR ledger")
    assert(SketchStore.drops(spark, s"$root/nov") === Set("epoch-000000"))
    val verdicts0 = SketchStore.admissionLog(spark, s"$root/nov")
      .orderBy("seq").select("verdict").as[String].collect().toSeq
    assert(verdicts0 === Seq("admitted-bootstrap", "rejected-stale"))

    // crash simulation: the last epoch processed but its checkpoint
    // commit marker never landed — Spark replays it on restart
    val commits = new java.io.File(s"$ckpt/commits").listFiles()
      .filter(_.getName.forall(_.isDigit)).sortBy(_.getName.toLong)
    assert(commits.last.delete())
    new java.io.File(s"$ckpt/commits/.${commits.last.getName}.crc").delete()
    val q2 = start()
    try {
      q2.processAllAvailable() // replays epoch 1: still stale, rejected again
      addDrop("day3", d.filter(col("doc_id") % 3 === 2))
      q2.processAllAvailable() // epoch 2: genuinely new — admitted
    } finally q2.stop()
    assert(new java.io.File(s"$root/out/epoch-000002").isDirectory)
    assert(DsirStore.drops(spark, s"$root/dsir") ===
      Set("hist", "epoch-000000", "epoch-000002"))
    assert(SketchStore.drops(spark, s"$root/nov") ===
      Set("epoch-000000", "epoch-000002"))
    val verdicts = SketchStore.admissionLog(spark, s"$root/nov")
      .orderBy("seq").select("verdict", "drop_id")
      .as[(String, String)].collect().toSeq
    assert(verdicts === Seq(
      ("admitted-bootstrap", "epoch-000000"),
      ("rejected-stale", "epoch-000001"),
      ("rejected-stale", "epoch-000001"), // the crash-replayed epoch
      ("admitted", "epoch-000002")))
    // the streamed epoch-0 selection ≡ the batch CLI's daily run on the
    // same drop against the same history (composition, not just counts)
    val streamed = spark.read.parquet(s"$root/out/epoch-000000")
      .collect().map(_.toSeq).toSet
    val sigB = s"$root/sigB"; val dsirB = s"$root/dsirB"
    Store.build(hist, sigB); DsirStore.build(hist, dsirB, "hist")
    val batchSel = Curation.incrementalSpineSelection(
      day1, spark.read.parquet(s"$root/target"), bench, sigB, dsirB)
      .collect().map(_.toSeq).toSet
    assert(streamed === batchSel)
  }
}
