package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface of the engine: event-time windowed
  * aggregation with watermarked late-data handling, and stateful gap
  * sessionization via flatMapGroupsWithState.
  *
  * The reference is batch-only (SURVEY.md §2.10 "Streaming: absent") — this
  * module is the capability extension the Spark-native engine gets from
  * Structured Streaming. Every transform here is source-agnostic: pass any
  * streaming DataFrame with (ts: timestamp, user_id: long, event_type:
  * string, value: double) — file source, Kafka-shaped source, or
  * MemoryStream in tests.
  *
  * Scale notes: windowed counts shuffle on (window, event_type) with
  * partial aggregation and state-store-backed incremental merge; the
  * watermark bounds state (windows older than watermark are evicted), which
  * is what makes unbounded streams tractable — state size is
  * O(active windows × types), not O(stream).
  */
object Streams {

  /** Hourly tumbling-window counts per event_type, tolerating `lateness`
    * of event-time disorder before dropping data (watermark).
    * Batch-equivalent: q41_event_hourly.
    */
  def hourlyCounts(events: DataFrame, lateness: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("hour_start"), col("event_type"), col("n"))

  final case class SessEvent(user_id: Long, ts: java.sql.Timestamp)
  final case class SessState(sessions: Long, events: Long, lastTsMs: Long)
  final case class SessUpdate(user_id: Long, n_sessions: Long, n_events: Long, closed: Boolean)

  /** Stateful gap sessionization (batch analog: q36_sessionize /
    * Events.sessionize; counts agree when events arrive in event-time
    * order across batches — see the in-batch note below for the online
    * approximation under cross-batch disorder): per-user session counting
    * with a `gapSec` inactivity gap, state kept per key in the state
    * store and emitted on every update (Update output mode).
    *
    * State is O(1) per user (three longs) AND the key set is bounded: the
    * stream is watermarked and the state uses `EventTimeTimeout` with the
    * timeout set to `lastSeen + gap`, so once the watermark passes an
    * inactive user's gap the key fires a final `closed = true` update and
    * its state is REMOVED from the store. Without eviction (the
    * `NoTimeout` formulation) per-key state lives forever and a
    * long-running stream with an unbounded user population OOMs the state
    * store — eviction is what makes this viable at 100 TB/day event
    * volumes, the same watermark contract that bounds the windowed aggs
    * above.
    */
  def sessionizeStream(events: Dataset[SessEvent], gapSec: Long,
                       lateness: String = "10 minutes")(
      implicit s: SparkSession): Dataset[SessUpdate] = {
    import s.implicits._
    val gapMs = gapSec * 1000L
    events
      .withWatermark("ts", lateness)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessState, SessUpdate](
        OutputMode.Update, GroupStateTimeout.EventTimeTimeout) {
        (uid, batch, state: GroupState[SessState]) =>
          if (state.hasTimedOut) {
            // Watermark passed lastSeen + gap: the session can never be
            // extended (later events would be dropped as late) — emit the
            // final summary and evict the key.
            val st = state.get
            state.remove()
            Iterator.single(SessUpdate(uid, st.sessions, st.events, closed = true))
          } else {
            // Within a micro-batch, events are processed in event-time
            // order. ACROSS batches the fold is online: a late-but-within-
            // watermark event landing in a later batch is counted into
            // `events` but compared against the max-seen timestamp, so a
            // session split it would have caused in event-time order can
            // be missed — streaming counts are an online approximation
            // under cross-batch disorder; the exact count is the batch
            // sessionize (q36) over the landed data. Counting exactly
            // online would mean buffering every event until the watermark
            // passes it (state O(events-in-lateness-window), emissions
            // delayed by the full lateness) — the wrong default for a
            // live session monitor. The watermark still holds the TIMEOUT
            // open correctly, so eviction and the final closed=true
            // summary never fire early.
            val evs = batch.toArray.sortBy(_.ts.getTime)
            var st = state.getOption.getOrElse(SessState(0L, 0L, Long.MinValue))
            evs.foreach { e =>
              val tsMs = e.ts.getTime
              val newSession = st.lastTsMs == Long.MinValue || tsMs - st.lastTsMs > gapMs
              st = SessState(
                st.sessions + (if (newSession) 1 else 0),
                st.events + 1,
                math.max(st.lastTsMs, tsMs))
            }
            state.update(st)
            // Timeout must be strictly beyond the current watermark or
            // Spark rejects it (the key would time out immediately anyway).
            state.setTimeoutTimestamp(
              math.max(st.lastTsMs + gapMs, state.getCurrentWatermarkMs() + 1))
            Iterator.single(SessUpdate(uid, st.sessions, st.events, closed = false))
          }
      }
  }

  /** Streaming exact deduplication: first occurrence of each `idCols` key
    * wins — the streaming face of the engine's exact-dedup operator, and
    * the standard exactly-once ingest guard for training-data pipelines.
    *
    * Uses `dropDuplicatesWithinWatermark`, NOT `dropDuplicates`: plain
    * dropDuplicates only evicts state when the event-time column is part of
    * the dedup keys, so with business keys like `event_id` its state grows
    * without bound on a real stream. The WithinWatermark variant evicts any
    * key once the watermark passes its event time, making state
    * O(keys seen within `lateness`) — the contract is "duplicates arriving
    * within the watermark delay of the first occurrence are dropped", which
    * is exactly the at-least-once-source dedup guarantee needed here.
    */
  def dedupStream(events: DataFrame, lateness: String, idCols: Seq[String]): DataFrame =
    events.withWatermark("ts", lateness).dropDuplicatesWithinWatermark(idCols)

  /** Streaming NEAR-dup deduplication: first document per MinHash
    * signature wins. The signature (map-only, codegen'd — the same
    * `minhash_signature` expression the batch LSH dedup uses) collapses
    * near-identical texts to one state key, so re-crawls/boilerplate
    * near-copies arriving within the watermark are dropped at ingest —
    * the streaming front door of the dedup taxonomy (full banded LSH with
    * exact verify stays a batch job over the deduped landing table).
    * Signature equality ≈ Jaccard near 1 (P[sig match] = j^numHashes);
    * the key is the md5 of the signature so state is one string per
    * distinct signature within `lateness`, evicted by the watermark.
    */
  def nearDupDedupStream(docs: DataFrame, lateness: String,
                         textCol: String = "text",
                         idCol: String = "doc_id",
                         numHashes: Int = 8): DataFrame = {
    docs
      .withColumn("__sig_key", sigKey(textCol, idCol, numHashes))
      .withWatermark("ts", lateness)
      .dropDuplicatesWithinWatermark(Seq("__sig_key"))
      .drop("__sig_key")
  }

  /** Near-dup state key: MinHash signature md5 for shingleable text;
    * short-but-real text (1-2 words) keys on the EXACT text digest, so
    * byte-identical short spam ("click here" twice) still dedups; only
    * null/blank docs get a PER-DOC key — a constant key there would
    * collapse every unrelated empty doc into one "near-dup" group and
    * drop all but the first (they carry no content to match on).
    */
  private[graft] def sigKey(textCol: String, idCol: String, numHashes: Int) = {
    import graft.text.TextOps
    val ws = TextOps.words(col(textCol))
    val sig = graft.functions.MinHashSignature.of(TextOps.shingleSet(ws, 3), numHashes)
    when(col(textCol).isNull || trim(col(textCol)) === "",
      concat(lit("raw:"), col(idCol).cast("string")))
      .when(size(ws) < 3, concat(lit("txt:"), md5(col(textCol))))
      .otherwise(md5(concat_ws("|", transform(sig, x => x.cast("string")))))
  }

  /** Streaming near-dup ingest against a STATIC seen-corpus: drop incoming
    * docs whose MinHash signature already exists in `corpus` (e.g. the
    * 100 TB landing table), THEN dedup within the stream itself — new
    * near-copies of old corpus content never land twice.
    *
    * Scale shape: the static side reduces to its DISTINCT signature keys
    * (one short string per corpus doc) before the join; the stream-static
    * left_anti is a per-micro-batch join against that static frame — no
    * streaming state for the corpus side at all (Spark re-plans the static
    * side per batch; persist the corpus keys for a long-running query).
    * Short docs match on their exact text digest; null/blank docs pass
    * through untouched (per-doc keys never match).
    */
  def nearDupVsCorpusStream(docs: DataFrame, corpus: DataFrame, lateness: String,
                            textCol: String = "text",
                            idCol: String = "doc_id",
                            numHashes: Int = 8): DataFrame = {
    val seen = corpus
      .select(sigKey(textCol, idCol, numHashes).as("__sig_key"))
      .filter(!col("__sig_key").startsWith("raw:"))
      .distinct()
    docs
      .withColumn("__sig_key", sigKey(textCol, idCol, numHashes))
      .join(seen, Seq("__sig_key"), "left_anti")
      .withWatermark("ts", lateness)
      .dropDuplicatesWithinWatermark(Seq("__sig_key"))
      .drop("__sig_key")
  }

  /** [[nearDupVsCorpusStream]] served from the PERSISTED signature store
    * (`text.Store`): the static side is the stored `sig_key` column — a
    * columnar scan of one string column — so starting (or restarting) a
    * long-running ingest stream never re-tokenizes the corpus. The batch
    * `Store.dedupNewDropVsCorpus` appends survivors' keys, so a daily
    * batch compaction and this stream share one source of truth. The key
    * is computed with the store's own hash count ([[graft.text.Store
    * .SigKeyHashes]]) — probing with a different signature would silently
    * never match.
    *
    * TAKEDOWN CONTRACT (restart-to-honor, StreamingSpec-pinned): the
    * store side's file listing is frozen at query start, and a takedown
    * swap REPLACES the signatures dir — so a ticket landing mid-stream
    * fails the next micro-batch LOUDLY (FAILED_READ_FILE), never
    * silently keeps suppressing ingest with removed signatures and never
    * reads a half-swapped store; the restarted query lists the
    * post-takedown store and replays the failed batch exactly once. A
    * pipeline that must absorb takedowns without restart runs the batch
    * serve inside `foreachBatch`, where the store frame is rebuilt per
    * micro-batch.
    */
  def nearDupVsStoreStream(docs: DataFrame, storeDir: String,
                           lateness: String,
                           textCol: String = "text",
                           idCol: String = "doc_id"): DataFrame = {
    val seen = graft.text.Store.load(docs.sparkSession, storeDir)
      .select(col("sig_key").as("__sig_key"))
      .filter(!col("__sig_key").startsWith("raw:"))
      .distinct()
    // the probe key follows the STORE's universe (its marker), exactly
    // like the batch serve: a bytes store is probed with the byte-shingle
    // MinHash key over `textCol`-as-payload — probing it with the word
    // key would silently match nothing, the cross-universe failure the
    // marker exists to prevent. The hx/sh projections are real columns
    // (the byteShingles contract: HOF arguments must be projected
    // attributes, or interpreted lambdas re-evaluate them per element).
    val probeType = docs.schema(textCol).dataType
    val keyed = graft.text.Store.storedUniverse(
        docs.sparkSession, storeDir) match {
      case graft.text.Store.Universe.TextWords =>
        // the batch serve's loud type check, mirrored: a bytes column
        // keyed through words() would mis-key every row and silently
        // suppress nothing/everything
        require(probeType == org.apache.spark.sql.types.StringType,
          s"text-universe store expects a string column, got $textCol: $probeType")
        docs.withColumn("__sig_key",
          sigKey(textCol, idCol, graft.text.Store.SigKeyHashes))
      case graft.text.Store.Universe.PayloadBytes =>
        // a STRING column hex()ed here would be the UTF-8 bytes of the
        // text — a silently different universe than the store's payloads
        require(probeType == org.apache.spark.sql.types.BinaryType,
          s"bytes-universe store expects a binary column, got $textCol: $probeType")
        docs
          .withColumn("__hx", hex(col(textCol)))
          .withColumn("__sh",
            graft.multimodal.Binary.byteShingles(col("__hx")))
          .withColumn("__sig_key",
            when(col("__hx").isNull || length(col("__hx")) === 0,
              concat(lit("raw:"), col(idCol).cast("string")))
              .otherwise(graft.text.Store.bytesSigKeyOf(col("__sh"))))
          .drop("__hx", "__sh")
    }
    keyed
      .join(seen, Seq("__sig_key"), "left_anti")
      .withWatermark("ts", lateness)
      .dropDuplicatesWithinWatermark(Seq("__sig_key"))
      .drop("__sig_key")
  }

  /** In-stream benchmark decontamination: drop incoming docs sharing ANY
    * word 3-gram with the (static, small) benchmark set — the streaming
    * form of `Dedup.decontaminate`, so an ingest pipeline applies the same
    * leakage guard as the batch rebuild. The benchmark side is exploded to
    * distinct shingles and BROADCAST (eval suites are MBs against the
    * stream); the stream side stays UN-exploded and anti-joins on
    * `array_contains(doc shingles, bench shingle)` — a per-batch broadcast
    * probe with NO watermark and NO state store (a doc-level decision
    * never needs reassembly because the doc row was never exploded), which
    * is what keeps it composable before the stateful dedup stages.
    * Worst-case probe cost: the BNLJ condition scans the doc's shingle
    * array per bench row, so a CLEAN doc (no early match) costs
    * O(|bench shingles| × |doc shingles|) comparisons — fine for MB-scale
    * eval suites against normal docs; for an unusually large benchmark (or
    * very long docs) run the batch `Dedup.decontaminate` inside
    * `foreachBatch` instead (equi-join plan, cost linear in both sides).
    */
  def decontaminateStream(docs: DataFrame, bench: DataFrame,
                          textCol: String = "text"): DataFrame = {
    val benchShingles = broadcast(
      bench.select(explode(graft.text.TextOps.shingleSet(
        graft.text.TextOps.words(col(textCol)), 3)).as("__g")).distinct())
    docs
      .withColumn("__sh",
        graft.text.TextOps.shingleSet(graft.text.TextOps.words(col(textCol)), 3))
      .join(benchShingles, array_contains(col("__sh"), col("__g")), "left_anti")
      .drop("__sh")
  }

  /** Streaming tokenizer-denominated budget monitor: BPE token totals per
    * (event-time window, source) with watermarked late-data handling —
    * the incremental-ingest face of the batch token-budget operators
    * (q116's apportionment denominator, computed as drops land instead of
    * by corpus rescan). `Bpe.encode` is a pure map-side expression, so
    * the only streaming state is the windowed aggregation's — bounded by
    * the watermark exactly like [[hourlyCounts]]; a 50k-merge production
    * table rides the plan as a literal, never a join.
    */
  def tokenBudgetStream(docs: DataFrame,
                        merges: Seq[String] = graft.text.Bpe.DemoMerges,
                        lateness: String = "10 minutes",
                        windowLen: String = "1 hour",
                        textCol: String = "text"): DataFrame =
    docs
      .withColumn("__n_bpe",
        size(graft.text.Bpe.encode(
          graft.text.TextOps.words(col(textCol)), merges)).cast("long"))
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), windowLen).as("w"), col("source"))
      .agg(sum(col("__n_bpe")).as("n_tokens"), count(lit(1)).as("n_docs"))
      .select(col("w.start").as("window_start"), col("source"),
        col("n_tokens"), col("n_docs"))

  /** Streaming semantic dedup served from the PERSISTED embedding-cluster
    * store (`vector.ClusterStore`): incoming vectors are assigned to their
    * home cell against the STORED centroids (a driver-sized k×dims model
    * inlined as a literal — pure map-side argmin, no window, so it is
    * stream-legal), anti-joined against stored vectors of that cell under
    * the exact integer cosine ≥ 1/2 rule (the q121/q129 decision,
    * bit-identical to the batch path), and exact in-stream repeats are
    * dropped by quantized-vector key within the watermark. Input contract:
    * (`idCol`, `embCol`: array<float/double>, ts: timestamp); output is
    * the surviving rows plus their `cid`.
    *
    * Scale shape: the anti join is a stream-static equi join on cell id
    * with the cosine test as a residual — shuffle scales with
    * stream-batch × 1 probed cell, and the stored table is read columnar
    * per micro-batch (same serve economics as the batch
    * `dedupNewDropVsStore`). Two documented narrowings vs batch: home
    * cell ONLY (multi-probe recall needs the per-vector top-p ranking —
    * run `ClusterStore.dedupNewDropVsStore` in `foreachBatch` when
    * cell-boundary recall matters, q128's trade), and intra-stream
    * near-dups are caught only when quantized-exact (cross-row cosine
    * within a micro-batch is a stream-stream self-join — batch ground:
    * q129). The stream never appends to the store: ingestion that must
    * also grow the store does that in `foreachBatch` via the staged
    * append, where the commit can ride the sink's success.
    *
    * TAKEDOWN CONTRACT: same restart-to-honor as
    * [[nearDupVsStoreStream]] (a mid-stream takedown swap of the vectors
    * table fails the next micro-batch loudly; restart serves the purged
    * store), with one addition — the CENTROID model is collected at
    * query start and inlined as a literal, so it stays the pre-takedown
    * geometry until restart either way. That is benign for removal
    * (takedown deletes vector rows, and cells only decide WHERE to
    * probe), but it is one more reason restart is the honoring act.
    */
  def semanticDedupVsStoreStream(vecs: DataFrame, storeDir: String,
                                 lateness: String,
                                 idCol: String = "vec_id",
                                 embCol: String = "embedding"): DataFrame = {
    val s = vecs.sparkSession
    val model = graft.vector.ClusterStore.loadCentroids(s, storeDir)
    require(model.nonEmpty, s"empty centroid model under $storeDir")
    val cells = array(model.map { case (cid, cq) =>
      struct(
        lit(cid).as("cid"),
        array(cq.map(lit(_)): _*).as("cq"),
        lit(cq.map(x => x * x).sum).as("cn2"))
    }: _*)
    // array_sort on struct(d2, cid) orders by d2 then cid — exactly
    // Ann.rankCells' home-cell rule, without the (stream-illegal) window
    val scored = transform(cells, c =>
      struct(
        (col("__n2") - lit(2) * graft.functions.VectorDot.of(col("__q"), c.getField("cq"))
          + c.getField("cn2")).as("d2"),
        c.getField("cid").as("cid")))
    val prep = vecs
      .withColumn("__q",
        graft.vector.VectorOps.quantize(col(embCol), graft.vector.Queries.Scale))
      .withColumn("__n2", graft.functions.VectorDot.of(col("__q"), col("__q")))
      .withColumn("__cid", element_at(array_sort(scored), 1).getField("cid"))
    val stored = graft.vector.ClusterStore.loadVectors(s, storeDir)
      .select(col("cid").as("__s_cid"), col("q").as("__s_q"), col("n2").as("__s_n2"))
    val dot = graft.functions.VectorDot.of(col("__q"), col("__s_q"))
    prep
      .join(stored,
        col("__cid") === col("__s_cid") && dot > lit(0L) &&
          lit(4L) * dot * dot >= col("__n2") * col("__s_n2"),
        "left_anti")
      .withColumn("__key", md5(concat_ws(",", transform(col("__q"), _.cast("string")))))
      .withWatermark("ts", lateness)
      .dropDuplicatesWithinWatermark(Seq("__key"))
      .withColumn("cid", col("__cid"))
      .drop("__q", "__n2", "__cid", "__key")
  }

  /** Watermarked stream-stream interval join: for each left event, right
    * events of the same key within `(l.ts, l.ts + windowSec]` — the
    * streaming form of the batch bucketed range join (Events
    * .windowedMatchCount). Both sides carry watermarks and the join
    * condition time-bounds both directions, so Spark can evict join state
    * (unbounded state is the failure mode of naive stream joins).
    */
  def intervalJoinStream(left: DataFrame, right: DataFrame, key: String,
                         windowSec: Long, lateness: String): DataFrame = {
    val l = left.withWatermark("ts", lateness)
      .select(col(key).as("l_key"), col("ts").as("l_ts"), col("event_id").as("l_id"))
    val r = right.withWatermark("ts", lateness)
      .select(col(key).as("r_key"), col("ts").as("r_ts"), col("event_id").as("r_id"))
    l.join(r, expr(
      s"""l_key = r_key AND
         |r_ts > l_ts AND
         |r_ts <= l_ts + interval $windowSec seconds""".stripMargin))
  }

  /** Write helper: stream to an in-memory table (tests/interactive) in the
    * given output mode; production sinks swap `format`.
    */
  def toMemorySink(df: DataFrame, queryName: String, mode: OutputMode = OutputMode.Update()) =
    df.writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode(mode)
      .start()
}
