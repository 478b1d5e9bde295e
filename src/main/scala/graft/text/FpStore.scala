package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted winnowing-fingerprint store: the INCREMENTAL form of the
  * partial-copy detector ([[Winnow]] / `Binary.byteFingerprints`) —
  * fingerprint each document once, serve every later drop's
  * "does any of this share a long verbatim run with history?" question
  * from the stored table. The 14th store family, closing the one dedup
  * signal that had no ledgered incremental form: MinHash signatures
  * ([[Store]]), CDC chunks, grams, spans all serve drops from persisted
  * state, while the winnow path — the binary taxonomy's SCALE path, and
  * the only signal with a detection GUARANTEE (any shared run of
  * ≥ k + w − 1 grams) — re-fingerprinted the entire history per question.
  *
  * Three tables, committed TOGETHER (see the commit layout below):
  *
  *  - `fps`  — (doc_id, fp), distinct per doc: the fingerprint rows.
  *  - `df`   — (fp, cnt) document-frequency PARTIALS: each commit carries
  *    the per-fp doc count of ITS OWN fps rows, so summing partials per
  *    fp reproduces `fps.groupBy(fp).count` exactly (fp rows are
  *    doc-distinct). The serve's stop-fingerprint guard reads THIS table
  *    instead of re-aggregating the corpus-scale fps table per drop —
  *    the same persisted-counter recipe as [[FreqStore]]'s sum-merge,
  *    and the record-level analog of the reference persisting its `.bai`
  *    index instead of rescanning (SparkCaller.java:205-214).
  *  - `docs` — (doc_id), one row per enrolled doc: the append's
  *    seen-before anti-join reads this metadata-scale table instead of
  *    `fps.select(doc_id).distinct` over all of history.
  *
  * With those two side tables, a daily serve touches the corpus-scale
  * fps table EXACTLY ONCE (the history leg of the pair join); the rare
  * set is built from the drop's own fingerprint counts joined against
  * the df counters — no Exchange over, and no scan of, the full-history
  * fps table feeds it ([[graft.PlanSpec]] pins the single-scan shape).
  *
  * Commit layout — every mutation of the store is ONE atomic directory
  * rename (`StoreSwap.commitDropDir` discipline), fixing the r15
  * per-part-file rename loop whose mid-crash window permanently lost the
  * tail of a drop's rows (the doc-level replay anti-join saw the doc as
  * enrolled and staged nothing):
  *
  * {{{
  * storeDir/commits/
  *   base-<tag>/   _shape  fps/  df/  docs/     (build / takedown / compact)
  *   drop-<id>/    _shape [fps/  df/  docs/]    (appends with a drop id;
  *                                               bare `_shape` = tombstone)
  *   append-<tag>/ _shape  fps/  df/  docs/     (appends without one)
  * }}}
  *
  * A commit stages all three tables plus the `_shape` recipe marker in
  * one staging dir and renames it into `commits/` in a single atomic
  * move — fps rows, df partials, doc enrollment and (for `drop-<id>`
  * commits) the streaming replay marker become visible TOGETHER, so no
  * crash ordering can make the three tables disagree or lose the
  * enrollment marker separately from the rows (the r15 stream bootstrap
  * wrote them in two steps). Takedown/compact rewrite the whole
  * `commits/` tree behind the crash-safe [[graft.operators.StoreSwap]]
  * markers, preserving enrolled drop ids as `_shape`-only tombstones so
  * a crash-replayed epoch is still skipped after a compaction.
  *
  * Daily-drop cost shape at 100 TB: fingerprinting is O(drop) map work;
  * the history side is one columnar scan of a 16-byte-per-row
  * (doc_id, fp) table that is itself only ~2/(w+1) of the corpus's gram
  * count, filtered by the drop's rare-fp set (AQE broadcasts it for
  * daily-sized drops — no history shuffle); the df counters are
  * one-row-per-fp after compaction, read only to look up the DROP's fps.
  *
  * Takedown is delete-and-done: fingerprint rows are doc-keyed with no
  * cross-doc rollup, so removing a doc's rows makes every later serve
  * behave exactly as if it was never ingested; the df/docs tables are
  * re-derived from the surviving rows in the same rewrite (a full
  * recount, exact by construction).
  *
  * The `_shape` marker (`v1 <k> <w> <universe>`) makes the store
  * self-describing across BOTH gram universes: `text` = word k-grams
  * ([[Winnow.fingerprints]]), `bytes` = byte k-grams of a binary column
  * (`Binary.byteFingerprints`). Every serve preps the incoming drop per
  * the STORED parameters with a loud column-type check — probing a
  * bytes store with a string column would otherwise silently share
  * nothing, the empty-candidate failure the [[Store]] marker exists to
  * prevent.
  */
object FpStore {

  /** The live ledger of commit directories. */
  def commitsPath(storeDir: String): String = s"$storeDir/commits"

  /** The concrete per-commit paths of one table (`fps`/`df`/`docs`),
    * resolved driver-side (a metadata-scale listing) — tombstone commits
    * carry none and drop out here.
    */
  private def tablePaths(s: SparkSession, storeDir: String,
                         table: String): Seq[String] = {
    val fs = fileSystem(s, storeDir)
    val paths = commitDirs(s, storeDir)
      .map(c => new org.apache.hadoop.fs.Path(c, table))
      .filter(fs.exists).map(_.toString)
    require(paths.nonEmpty,
      s"fingerprint store $storeDir has no $table data — run FpStore.build first")
    paths
  }

  /** A store's fingerprint recipe: gram width k, window w (detection
    * guarantee = any shared run of ≥ k + w − 1 grams), and the gram
    * universe. Persisted in the marker; every serve preps with it.
    */
  final case class FpParams(k: Int, w: Int, universe: Store.Universe) {
    require(k >= 1 && w >= 1, s"k and w must be positive, got $this")
    def guarantee: Int = k + w - 1
  }

  /** Per-universe defaults = the from-scratch miners' defaults (q77/q79
    * text: 3-word grams, window 4; q208/q209 bytes: 12-byte grams,
    * window 8), so a store-served answer is comparable row-for-row with
    * the from-scratch gate over the same frame.
    */
  def defaultParams(universe: Store.Universe): FpParams = universe match {
    case Store.Universe.TextWords    => FpParams(3, 4, universe)
    case Store.Universe.PayloadBytes => FpParams(12, 8, universe)
  }

  private def writeMarker(fs: org.apache.hadoop.fs.FileSystem,
                          commitDir: String, p: FpParams): Unit = {
    val out =
      fs.create(new org.apache.hadoop.fs.Path(commitDir, "_shape"), true)
    try out.write(s"v1 ${p.k} ${p.w} ${p.universe.tag}\n".getBytes("UTF-8"))
    finally out.close()
  }

  /** The recipe this store's fingerprints were selected with, read from
    * any commit's `_shape` (every commit carries one — identical by
    * construction, appends copy the stored recipe). Unlike [[Store]]
    * there is no markerless legacy cohort — the family was born with the
    * marker, so a commit missing one is corruption, not history.
    */
  def storedParams(s: SparkSession, storeDir: String): FpParams = {
    require(exists(s, storeDir),
      s"no fingerprint store under $storeDir — run FpStore.build first")
    val fs = fileSystem(s, storeDir)
    val commit = commitDirs(s, storeDir).head
    val f = new org.apache.hadoop.fs.Path(commit, "_shape")
    require(fs.exists(f),
      s"fingerprint-store commit $commit has no _shape marker")
    val in = fs.open(f)
    val line = try scala.io.Source.fromInputStream(in, "UTF-8")
      .getLines().next().trim finally in.close()
    line.split(" ") match {
      case Array("v1", k, w, u) =>
        FpParams(k.toInt, w.toInt, Store.Universe.fromTag(u))
      case _ => throw new IllegalStateException(
        s"unreadable fingerprint-store marker in $commit: '$line'")
    }
  }

  /** Fingerprint `docs` per the recipe, with the loud universe/type
    * check every store face routes through: (doc_id, fp) rows, distinct
    * per doc, md5-derived positive longs in both universes (the
    * oracle-checkable domain).
    */
  private def fingerprintsFor(docs: DataFrame, idCol: String,
                              contentCol: String, p: FpParams): DataFrame = {
    val dt = docs.schema(contentCol).dataType
    p.universe match {
      case Store.Universe.TextWords =>
        require(dt == org.apache.spark.sql.types.StringType,
          s"text-universe fingerprint store expects a string column, got $contentCol: $dt")
        Winnow.fingerprints(docs, idCol, contentCol, p.k, p.w)
          .select(col(idCol).as("doc_id"), col("fp"))
      case Store.Universe.PayloadBytes =>
        require(dt == org.apache.spark.sql.types.BinaryType,
          s"bytes-universe fingerprint store expects a binary column, got $contentCol: $dt")
        graft.multimodal.Binary.byteFingerprints(
            docs.select(col(idCol).as("doc_id"), col(contentCol).as("payload")),
            p.k, p.w)
          .select(col("doc_id"), col("fp"))
    }
  }

  def exists(s: SparkSession, storeDir: String): Boolean = {
    graft.operators.StoreSwap.requireNotCrashed(s, storeDir,
      commitsPath(storeDir))
    // a pre-ledger (r15-layout) store kept its rows in
    // storeDir/fingerprints + a _drops marker; treating one as
    // "no store" would let every exists-gated face (pairsStream's
    // bootstrap branch, the CLI --fp-store path) silently re-bootstrap
    // a FRESH store and serve every later drop against empty history —
    // no error, just missing pairs. There is no in-place migration
    // (the ledger needs per-commit df/docs partials the old layout
    // never kept): rebuild from the corpus, loudly.
    val legacy = new org.apache.hadoop.fs.Path(storeDir, "fingerprints")
    require(!fileSystem(s, storeDir).exists(legacy),
      s"$storeDir holds a legacy (pre-commit-ledger) fingerprint store " +
        "layout (fingerprints/ at the root) — rebuild it with " +
        "FpStore.build into the commits/ ledger, or remove the legacy " +
        "dir explicitly; treating it as absent would silently serve " +
        "drops against empty history")
    commitDirs(s, storeDir).nonEmpty
  }

  /** The commit directories under the live ledger, sorted by name. */
  private def commitDirs(s: SparkSession,
                         storeDir: String): Seq[org.apache.hadoop.fs.Path] = {
    val c = new org.apache.hadoop.fs.Path(commitsPath(storeDir))
    val fs = fileSystem(s, storeDir)
    if (!fs.exists(c)) Seq.empty
    else fs.listStatus(c).filter(_.isDirectory).map(_.getPath)
      .sortBy(_.getName).toSeq
  }

  /** Fingerprint the corpus once; persist (doc_id, fp) plus the df
    * counter and doc-enrollment side tables. Overwrites — build is the
    * scheduled full (re)bootstrap. k/w default per universe
    * ([[defaultParams]]); 0 = "use the default" so a caller overriding
    * only the universe never silently mixes recipes.
    */
  def build(docs: DataFrame, storeDir: String,
            idCol: String = "doc_id", contentCol: String = "text",
            universe: Store.Universe = Store.Universe.TextWords,
            k: Int = 0, w: Int = 0): Unit =
    buildStaged(docs, storeDir, idCol, contentCol, universe, k, w)()

  /** [[build]] split into compute and commit (the [[Store.buildStaged]]
    * discipline): the bootstrap commit lands in a staging dir now, the
    * store only starts existing when the returned thunk runs — pipelines
    * that bootstrap the store as a side effect of another output commit
    * after THAT output succeeds, so a failed run's retry never finds a
    * store already containing the drop (which would report every re-run
    * pair in both orientations). `dropId` names the bootstrap commit
    * `drop-<id>` so streaming enrollment is atomic with the build — the
    * r15 two-step (build, then marker) window is gone.
    */
  def buildStaged(docs: DataFrame, storeDir: String,
                  idCol: String = "doc_id", contentCol: String = "text",
                  universe: Store.Universe = Store.Universe.TextWords,
                  k: Int = 0, w: Int = 0,
                  dropId: Option[String] = None): () => Unit = {
    val d = defaultParams(universe)
    val p = FpParams(if (k > 0) k else d.k, if (w > 0) w else d.w, universe)
    val s = docs.sparkSession
    val staging = stagingPath(storeDir)
    stageCommit(s, staging, p,
      fingerprintsFor(docs, idCol, contentCol, p))
    val name = commitName(dropId, "base")
    () => {
      val fs = fileSystem(s, storeDir)
      val commits = new org.apache.hadoop.fs.Path(commitsPath(storeDir))
      fs.delete(commits, true)
      fs.mkdirs(commits)
      require(fs.rename(new org.apache.hadoop.fs.Path(staging),
          new org.apache.hadoop.fs.Path(commits, name)),
        s"could not commit staged fingerprint store $staging -> $commits/$name")
    }
  }

  /** Write one commit's three tables + marker into `staging`: fps as
    * given, then df partials and doc enrollment DERIVED BY READING THE
    * STAGED fps BACK — the side tables describe exactly the rows that
    * were persisted, never a recomputation that could diverge.
    */
  private def stageCommit(s: SparkSession, staging: String, p: FpParams,
                          fps: DataFrame): Unit = {
    fps.write.mode("overwrite").parquet(s"$staging/fps")
    val staged = s.read.parquet(s"$staging/fps")
    staged.groupBy(col("fp")).agg(count(lit(1)).as("cnt"))
      .write.mode("overwrite").parquet(s"$staging/df")
    staged.select(col("doc_id")).distinct()
      .write.mode("overwrite").parquet(s"$staging/docs")
    writeMarker(fileSystem(s, staging), staging, p)
  }

  private def commitName(dropId: Option[String], prefix: String): String = {
    dropId.foreach(id => require(
      id.nonEmpty && id.matches("[A-Za-z0-9._-]+"), s"bad drop id '$id'"))
    dropId.map(id => s"drop-$id").getOrElse(
      s"$prefix-${java.util.UUID.randomUUID().toString.take(8)}")
  }

  private def stagingPath(storeDir: String): String =
    s"$storeDir/_staging-${java.util.UUID.randomUUID().toString.take(8)}"

  private def fileSystem(s: SparkSession, dir: String) =
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(s.sparkContext.hadoopConfiguration)

  /** The stored fingerprint table: (doc_id, fp) across every commit. */
  def load(s: SparkSession, storeDir: String): DataFrame =
    s.read.parquet(tablePaths(s, storeDir, "fps"): _*)

  /** The stored df partials: (fp, cnt); Σcnt per fp ≡ document frequency
    * (fps rows are doc-distinct, each commit counts only its own rows).
    * One row per fp after [[compact]].
    */
  def counters(s: SparkSession, storeDir: String): DataFrame =
    s.read.parquet(tablePaths(s, storeDir, "df"): _*)

  /** The enrolled documents: (doc_id), one row per doc with stored rows. */
  def enrolledDocs(s: SparkSession, storeDir: String): DataFrame =
    s.read.parquet(tablePaths(s, storeDir, "docs"): _*)

  /** Partial-copy pairs of a NEW drop vs the stored history (plus
    * intra-drop pairs), then append the drop's fingerprints — the daily
    * serve. Output: (doc_a, doc_b, n_shared) with doc_a always the drop
    * doc; intra-drop pairs ordered doc_a < doc_b. `minShared` and the
    * stop-fingerprint guard `maxDf` are [[Winnow.pairsFromFingerprints]]'
    * knobs, with df counted over history ∪ drop — a run that only turns
    * boilerplate once the drop lands is still dropped before the join.
    *
    * Serve semantics assume drop ids are NEW (self-pairs are excluded by
    * id, so re-serving an already-appended drop reports each surviving
    * pair in both orientations rather than erroring — the idempotence
    * caveat the staged commit below exists to manage).
    */
  def pairsVsStore(drop: DataFrame, storeDir: String,
                   minShared: Int = 2, maxDf: Int = 8,
                   idCol: String = "doc_id",
                   contentCol: String = "text"): DataFrame = {
    val (pairs, commit) =
      pairsVsStoreStaged(drop, storeDir, minShared, maxDf, idCol, contentCol)
    commit()
    pairs
  }

  /** [[pairsVsStore]] with the fingerprint append SPLIT from the mine:
    * pairs compute now, the store mutates only when the commit thunk
    * runs — callers that act on the pairs (quarantine, output write)
    * commit AFTER that action succeeds, the [[Store]] crash-retry
    * discipline (an eager append + failed downstream write would make
    * the retry see the drop as its own history).
    */
  def pairsVsStoreStaged(drop: DataFrame, storeDir: String,
                         minShared: Int = 2, maxDf: Int = 8,
                         idCol: String = "doc_id",
                         contentCol: String = "text",
                         dropId: Option[String] = None): (DataFrame, () => Unit) = {
    val s = drop.sparkSession
    dropId.foreach(id => require(!drops(s, storeDir).contains(id),
      s"drop '$id' is already enrolled in the fingerprint store $storeDir — " +
        "a re-append would double its fingerprint rows and skew the df guard"))
    val (pairs, dropFps) =
      mine(drop, storeDir, minShared, maxDf, idCol, contentCol)
    val staging = stagingPath(storeDir)
    // append-once PER DOC: ids already enrolled (the metadata-scale docs
    // table, NOT a full-history distinct) stage nothing, so a
    // crash-replayed serve (or a caller re-serving yesterday's drop)
    // converges instead of doubling those docs' rows and skewing every
    // later df guard. Ids are immutable identities here — re-ingesting
    // CHANGED content under an old id is an upstream versioning bug this
    // store will not paper over. Safe at doc granularity because the
    // commit below is ONE rename: a drop is never half-visible.
    stageCommit(s, staging, storedParams(s, storeDir),
      dropFps.join(enrolledDocs(s, storeDir), Seq("doc_id"), "left_anti"))
    val name = commitName(dropId, "append")
    val commit = () => {
      val fs = fileSystem(s, storeDir)
      val dest =
        new org.apache.hadoop.fs.Path(commitsPath(storeDir), name)
      require(!fs.exists(dest),
        s"fingerprint-store commit $dest already exists — a concurrent or " +
          "retried append must be refused, not overlaid")
      require(fs.rename(new org.apache.hadoop.fs.Path(staging), dest),
        s"could not commit staged fingerprint append $staging -> $dest")
    }
    (pairs, commit)
  }

  /** Drop ids enrolled through the dropId-supplying faces (the streaming
    * replay guard): the `drop-<id>` commit names — atomic with the rows
    * they enroll, preserved as tombstones through takedown/compaction.
    */
  def drops(s: SparkSession, storeDir: String): Seq[String] =
    commitDirs(s, storeDir).map(_.getName)
      .filter(_.startsWith("drop-")).map(_.stripPrefix("drop-")).sorted

  /** The partial-copy detector as a STRUCTURED-STREAMING loop — each
    * epoch of `dropStream` (a streaming DataFrame of document rows)
    * serves its pairs against the store, writes them to
    * `outDir/<dropId>/`, and only then appends its fingerprints
    * (commit-LAST — a crash before the commit leaves the store
    * untouched and the rewritten pairs converge on replay; a crash
    * after it leaves the `drop-<id>` commit, and the replayed epoch is
    * skipped — its pairs are already on disk). The bootstrap epoch
    * writes its INTRA-batch pairs (no history yet, but the batch can
    * carry partial copies of itself) and then builds the store, with
    * enrollment atomic in the build's single rename. `availableNow` =
    * the cron-able drain, the [[Curation.spineStream]] shape.
    */
  def pairsStream(dropStream: DataFrame, storeDir: String, outDir: String,
                  checkpoint: String, contentCol: String = "text",
                  universe: Store.Universe = Store.Universe.TextWords,
                  minShared: Int = 2, maxDf: Int = 8,
                  availableNow: Boolean = false)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val writer = dropStream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, epoch: Long) =>
        val s = batch.sparkSession
        val dropId = f"epoch-$epoch%06d"
        if (batch.isEmpty) ()
        else if (!exists(s, storeDir)) {
          intraPairs(batch, defaultParams(universe), minShared, maxDf,
              "doc_id", contentCol)
            .write.mode("overwrite").parquet(s"$outDir/$dropId")
          buildStaged(batch, storeDir, contentCol = contentCol,
            universe = universe, dropId = Some(dropId))()
        } else if (drops(s, storeDir).contains(dropId)) {
          () // crash-replay of a committed epoch: pairs already on disk
        } else {
          val (pairs, commit) = pairsVsStoreStaged(batch, storeDir,
            minShared, maxDf, "doc_id", contentCol, dropId = Some(dropId))
          pairs.write.mode("overwrite").parquet(s"$outDir/$dropId")
          commit()
        }
      }
    (if (availableNow)
       writer.trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
     else writer).start()
  }

  /** Serve-only: same pairs as [[pairsVsStore]], the store never touched —
    * repeatable gates/benchmarks over a fixed snapshot, and dry-run
    * "what would this drop collide with" questions. `eager=false` is the
    * TVF face (analysis must never run the drop's fingerprint job).
    */
  def pairsVsStoreReadOnly(drop: DataFrame, storeDir: String,
                           minShared: Int = 2, maxDf: Int = 8,
                           idCol: String = "doc_id",
                           contentCol: String = "text",
                           eager: Boolean = true): DataFrame =
    mine(drop, storeDir, minShared, maxDf, idCol, contentCol, eager)._1

  /** The shared mine: (pairs, the drop's fingerprint frame). The drop
    * frame feeds four branches (its fp counts, both drop-side joins, the
    * append), so it gets the real barrier. The stored side is touched
    * exactly once at corpus scale — the history leg of the pair join —
    * because the stop-fingerprint guard's df comes from the PERSISTED
    * counters: df(fp over history ∪ drop) = Σ stored partials + the
    * drop's own count, looked up only for fps the drop actually carries
    * (fps unique to history can't pair with anything). Both lookups are
    * plans whose big side is scanned, never shuffled, when the drop is
    * daily-sized — AQE broadcasts the drop-scale side at runtime; for a
    * backfill-sized "drop" it degrades to a shuffle join on fp of the
    * metadata-scale df table, still never the fps table.
    */
  private def mine(drop: DataFrame, storeDir: String, minShared: Int,
                   maxDf: Int, idCol: String, contentCol: String,
                   eager: Boolean = true): (DataFrame, DataFrame) = {
    require(minShared >= 1 && maxDf >= 2, "minShared >= 1, maxDf >= 2")
    val s = drop.sparkSession
    val p = storedParams(s, storeDir)
    val fps0 = fingerprintsFor(drop, idCol, contentCol, p)
    val dropFps = if (eager) Dedup.materialize(fps0) else fps0.cache()
    // drop-side document frequency per fp (rows are doc-distinct)
    val dropDf = dropFps.groupBy(col("fp")).agg(count(lit(1)).as("drop_cnt"))
    // history-side df for the drop's fps only: counter partials summed
    // AFTER the semi restriction to the drop's fp set
    val histDf = counters(s, storeDir)
      .join(dropDf.select(col("fp")), Seq("fp"), "left_semi")
      .groupBy(col("fp")).agg(sum(col("cnt")).as("hist_cnt"))
    // stop-fingerprint guard over history ∪ drop: a re-ingested id
    // double-counts itself — the NEW-ids assumption, as before.
    // Materialized: it feeds four join legs, which would otherwise
    // re-instantiate the counter lookup per leg (4 df scans).
    val rare0 = dropDf.join(histDf, Seq("fp"), "left")
      .filter(col("drop_cnt") + coalesce(col("hist_cnt"), lit(0L)) <= maxDf)
      .select(col("fp"))
    val rare = if (eager) Dedup.materialize(rare0) else rare0.cache()
    val dp = dropFps.join(rare, "fp")
    val sp = load(s, storeDir).join(rare, "fp")
    def paired(a: DataFrame, b: DataFrame,
               cond: org.apache.spark.sql.Column): DataFrame =
      a.as("a").join(b.as("b"), col("a.fp") === col("b.fp") && cond)
        .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .agg(count(lit(1)).as("n_shared"))
    // distinct fps per doc ⇒ per-pair row count = shared-fp count, the
    // Winnow.pairsFromFingerprints argument, on both legs
    val cross = paired(dp, sp, col("a.doc_id") =!= col("b.doc_id"))
    val intra = paired(dp, dp, col("a.doc_id") < col("b.doc_id"))
    val pairs = cross.unionByName(intra)
      .filter(col("n_shared") >= minShared)
    (pairs, dropFps)
  }

  /** Intra-batch pairs with NO store — the streaming bootstrap's epoch-0
    * serve (the batch can carry partial copies of itself even before any
    * history exists). Same guard and join shape as [[mine]]'s intra leg.
    */
  private def intraPairs(batch: DataFrame, p: FpParams, minShared: Int,
                         maxDf: Int, idCol: String,
                         contentCol: String): DataFrame = {
    val fps = Dedup.materialize(fingerprintsFor(batch, idCol, contentCol, p))
    val rare = fps.groupBy(col("fp")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf).select(col("fp"))
    val dp = fps.join(rare, "fp")
    dp.as("a").join(dp.as("b"),
        col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** Takedown: remove the given documents' fingerprints — one
    * left-anti rewrite of the whole ledger (fps, df and docs re-derived
    * from the surviving rows — an exact recount), crash-safe swap,
    * marker and enrolled-drop tombstones carried through. Returns the
    * number of fingerprint rows removed (the audit line). Exact by
    * construction: rows are doc-keyed, no cross-doc state.
    */
  def removeDocs(s: SparkSession, storeDir: String, docIds: DataFrame): Long = {
    require(exists(s, storeDir), s"no fingerprint store under $storeDir")
    require(docIds.columns.sameElements(Array("doc_id")),
      s"docIds must be a single-column (doc_id) frame, got: ${docIds.columns.mkString(", ")}")
    // the audit count is observed ON the rewrite plan (rows in minus
    // rows surviving, collected by the staged write's own job) — the
    // r16 shape paid two extra full ledger scans (before.count() −
    // after.count()) to produce the same number
    val obsIn = org.apache.spark.sql.Observation()
    val obsOut = org.apache.spark.sql.Observation()
    rewrite(s, storeDir, "_takedown-old",
      load(s, storeDir).observe(obsIn, count(lit(1)).as("n"))
        .join(docIds, Seq("doc_id"), "left_anti")
        .observe(obsOut, count(lit(1)).as("n")))
    obsIn.get("n").asInstanceOf[Long] - obsOut.get("n").asInstanceOf[Long]
  }

  /** Maintenance compaction — contents identical, fps in `targetFiles`
    * files and the df partials folded to ONE row per fp; daily appends
    * otherwise accumulate part-files and per-fp partial rows until
    * footer/open overhead dominates the serve scan.
    */
  def compact(s: SparkSession, storeDir: String, targetFiles: Int = 1): Unit = {
    require(targetFiles >= 1, s"targetFiles must be >= 1, got $targetFiles")
    require(exists(s, storeDir), s"no fingerprint store under $storeDir")
    rewrite(s, storeDir, "_compact-old",
      load(s, storeDir).coalesce(targetFiles))
  }

  /** Rewrite the whole ledger from `newFps`: one fresh base commit (df
    * and docs re-derived from the staged rows) plus `_shape`-only
    * tombstones for every enrolled drop id, swapped in crash-safely.
    * Audit counts are the caller's business — [[removeDocs]] observes
    * them on the `newFps` plan it passes in.
    */
  private def rewrite(s: SparkSession, storeDir: String, marker: String,
                      newFps: DataFrame): Unit = {
    val p = storedParams(s, storeDir)
    val enrolled = drops(s, storeDir)
    val staging = stagingPath(storeDir)
    val base = s"$staging/${commitName(None, "base")}"
    stageCommit(s, base, p, newFps)
    val fs = fileSystem(s, storeDir)
    enrolled.foreach { id =>
      val t = s"$staging/drop-$id"
      fs.mkdirs(new org.apache.hadoop.fs.Path(t))
      writeMarker(fs, t, p)
    }
    graft.operators.StoreSwap.swapIn(s, storeDir, commitsPath(storeDir),
      staging, marker)
  }
}
