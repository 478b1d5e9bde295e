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
  * Daily-drop cost shape at 100 TB: fingerprinting is O(drop) map work;
  * the history side is one columnar scan of an 16-byte-per-row
  * (doc_id, fp) table that is itself only ~2/(w+1) of the corpus's gram
  * count; the pair mine is the [[Winnow.pairsFromFingerprints]] equi
  * join with the stop-fingerprint guard, whose df counts are computed
  * over history ∪ drop so a boilerplate run that only becomes hot once
  * the drop lands is still killed BEFORE the join.
  *
  * Takedown is delete-and-done: fingerprint rows are doc-keyed with no
  * cross-doc rollup, so removing a doc's rows makes every later serve
  * behave exactly as if it was never ingested — the Freq-family
  * subtract/rebuild recipes aren't even needed (the same exactness
  * argument as [[Store.removeDocs]], at one table rewrite).
  *
  * The `_shape` marker (`v1 <k> <w> <universe>`) makes the store
  * self-describing across BOTH gram universes: `text` = word k-grams
  * ([[Winnow.fingerprints]]), `bytes` = byte k-grams of a binary column
  * (`Binary.byteFingerprints`). Every serve preps the incoming drop per
  * the STORED parameters with a loud column-type check — probing a
  * bytes store with a string column would otherwise silently share
  * nothing, the empty-candidate failure the [[Store]] marker exists to
  * prevent. Reference lineage: the reference's only "index" is a
  * file-level BAM index rebuild per pass (SparkCaller.java:205-214);
  * persisting derived per-record state so later passes skip the rescan
  * is exactly the record-level re-expression this store family is.
  */
object FpStore {

  def fpPath(storeDir: String): String = s"$storeDir/fingerprints"

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

  private def shapeFile(storeDir: String) =
    new org.apache.hadoop.fs.Path(fpPath(storeDir), "_shape")

  private def writeMarker(fs: org.apache.hadoop.fs.FileSystem,
                          dir: String, p: FpParams): Unit = {
    val out = fs.create(new org.apache.hadoop.fs.Path(dir, "_shape"), true)
    try out.write(s"v1 ${p.k} ${p.w} ${p.universe.tag}\n".getBytes("UTF-8"))
    finally out.close()
  }

  /** The recipe this store's fingerprints were selected with. Unlike
    * [[Store]] there is no markerless legacy cohort — the family was
    * born with the marker, so a missing one is corruption, not history.
    */
  def storedParams(s: SparkSession, storeDir: String): FpParams = {
    require(exists(s, storeDir),
      s"no fingerprint store under $storeDir — run FpStore.build first")
    val f = shapeFile(storeDir)
    val fs = f.getFileSystem(s.sparkContext.hadoopConfiguration)
    require(fs.exists(f), s"fingerprint store $storeDir has no _shape marker")
    val in = fs.open(f)
    val line = try scala.io.Source.fromInputStream(in, "UTF-8")
      .getLines().next().trim finally in.close()
    line.split(" ") match {
      case Array("v1", k, w, u) =>
        FpParams(k.toInt, w.toInt, Store.Universe.fromTag(u))
      case _ => throw new IllegalStateException(
        s"unreadable fingerprint-store marker in $storeDir: '$line'")
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
    graft.operators.StoreSwap.requireNotCrashed(s, storeDir, fpPath(storeDir))
    val p = new org.apache.hadoop.fs.Path(fpPath(storeDir))
    p.getFileSystem(s.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Fingerprint the corpus once; persist (doc_id, fp). Overwrites —
    * build is the scheduled full (re)bootstrap. k/w default per universe
    * ([[defaultParams]]); 0 = "use the default" so a caller overriding
    * only the universe never silently mixes recipes.
    */
  def build(docs: DataFrame, storeDir: String,
            idCol: String = "doc_id", contentCol: String = "text",
            universe: Store.Universe = Store.Universe.TextWords,
            k: Int = 0, w: Int = 0): Unit =
    buildStaged(docs, storeDir, idCol, contentCol, universe, k, w)()

  /** [[build]] split into compute and commit (the [[Store.buildStaged]]
    * discipline): fingerprints land in a staging dir now, the store only
    * starts existing when the returned thunk runs — pipelines that
    * bootstrap the store as a side effect of another output commit after
    * THAT output succeeds, so a failed run's retry never finds a store
    * already containing the drop (which would report every re-run pair
    * in both orientations).
    */
  def buildStaged(docs: DataFrame, storeDir: String,
                  idCol: String = "doc_id", contentCol: String = "text",
                  universe: Store.Universe = Store.Universe.TextWords,
                  k: Int = 0, w: Int = 0): () => Unit = {
    val d = defaultParams(universe)
    val p = FpParams(if (k > 0) k else d.k, if (w > 0) w else d.w, universe)
    val s = docs.sparkSession
    val staging = stagingPath(storeDir)
    fingerprintsFor(docs, idCol, contentCol, p)
      .write.mode("overwrite").parquet(staging)
    writeMarker(fileSystem(s, storeDir), staging, p)
    () => {
      val fs = fileSystem(s, storeDir)
      val live = new org.apache.hadoop.fs.Path(fpPath(storeDir))
      fs.delete(live, true)
      require(fs.rename(new org.apache.hadoop.fs.Path(staging), live),
        s"could not commit staged fingerprint store $staging -> $live")
    }
  }

  private def stagingPath(storeDir: String): String =
    s"$storeDir/_staging-${java.util.UUID.randomUUID().toString.take(8)}"

  private def fileSystem(s: SparkSession, dir: String) =
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(s.sparkContext.hadoopConfiguration)

  /** The stored fingerprint table: (doc_id, fp). */
  def load(s: SparkSession, storeDir: String): DataFrame =
    s.read.parquet(fpPath(storeDir))

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
    // append-once PER DOC: ids already in the store stage nothing, so a
    // crash-replayed serve (or a caller re-serving yesterday's drop)
    // converges instead of doubling those docs' rows and skewing every
    // later df guard. Ids are immutable identities here — re-ingesting
    // CHANGED content under an old id is an upstream versioning bug this
    // store will not paper over.
    dropFps.join(load(s, storeDir).select(col("doc_id")).distinct(),
        Seq("doc_id"), "left_anti")
      .write.mode("overwrite").parquet(staging)
    val commit = () => {
      val fs = fileSystem(s, storeDir)
      val live = new org.apache.hadoop.fs.Path(fpPath(storeDir))
      val src = new org.apache.hadoop.fs.Path(staging)
      fs.listStatus(src).foreach { f =>
        if (f.getPath.getName.startsWith("part-"))
          require(fs.rename(f.getPath,
            new org.apache.hadoop.fs.Path(live, f.getPath.getName)),
            s"could not commit staged fingerprint append ${f.getPath} -> $live")
      }
      fs.delete(src, true)
      dropId.foreach(writeDropMarker(fs, storeDir, _))
    }
    (pairs, commit)
  }

  /** Optional drop-enrollment markers (`_drops/<id>` — empty files):
    * written only when a caller supplies a dropId (the streaming face's
    * replay guard; plain API appends stay marker-free). Markers record
    * ENROLLMENT, not rows — takedown stays doc-keyed and never consults
    * them.
    */
  private def dropsDir(storeDir: String) =
    new org.apache.hadoop.fs.Path(s"$storeDir/_drops")

  private def writeDropMarker(fs: org.apache.hadoop.fs.FileSystem,
                              storeDir: String, dropId: String): Unit = {
    require(dropId.nonEmpty && !dropId.contains("/"),
      s"bad drop id '$dropId'")
    fs.create(new org.apache.hadoop.fs.Path(dropsDir(storeDir), dropId), true)
      .close()
  }

  /** Drop ids enrolled through the marker-writing faces. */
  def drops(s: SparkSession, storeDir: String): Seq[String] = {
    val d = dropsDir(storeDir)
    val fs = d.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(d)) Seq.empty
    else fs.listStatus(d).map(_.getPath.getName).toSeq.sorted
  }

  /** The partial-copy detector as a STRUCTURED-STREAMING loop — each
    * epoch of `dropStream` (a streaming DataFrame of document rows)
    * serves its pairs against the store, writes them to
    * `outDir/<dropId>/`, and only then appends its fingerprints
    * (commit-LAST — a crash before the commit leaves the store
    * untouched and the rewritten pairs converge on replay; a crash
    * after it leaves the `_drops` marker, and the replayed epoch is
    * skipped — its pairs are already on disk). Bootstrap epoch builds
    * the store (no history ⇒ no pairs dir). `availableNow` = the
    * cron-able drain, the [[Curation.spineStream]] shape.
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
          buildStaged(batch, storeDir, contentCol = contentCol,
            universe = universe)()
          writeDropMarker(
            dropsDir(storeDir).getFileSystem(s.sparkContext.hadoopConfiguration),
            storeDir, dropId)
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
    * frame feeds four branches (df counts, both drop-side joins, the
    * append), so it gets the real barrier; the STORED side is read
    * per-branch from parquet — a columnar scan per branch beats caching
    * a corpus-sized table (the store is the barrier).
    */
  private def mine(drop: DataFrame, storeDir: String, minShared: Int,
                   maxDf: Int, idCol: String, contentCol: String,
                   eager: Boolean = true): (DataFrame, DataFrame) = {
    require(minShared >= 1 && maxDf >= 2, "minShared >= 1, maxDf >= 2")
    val s = drop.sparkSession
    val p = storedParams(s, storeDir)
    val fps0 = fingerprintsFor(drop, idCol, contentCol, p)
    val dropFps = if (eager) Dedup.materialize(fps0) else fps0.cache()
    val stored = load(s, storeDir)
    // stop-fingerprint guard over history ∪ drop: rows are distinct per
    // doc on both sides, so the count per fp IS its document frequency
    // (a re-ingested id double-counts itself — the NEW-ids assumption)
    val rare = stored.unionByName(dropFps)
      .groupBy(col("fp")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf)
      .select(col("fp"))
    val dp = dropFps.join(rare, "fp")
    val sp = stored.join(rare, "fp")
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

  /** Takedown: remove the given documents' fingerprints — one
    * left-anti table rewrite, crash-safe swap, marker carried through.
    * Returns the number of fingerprint rows removed (the audit line).
    * Exact by construction: rows are doc-keyed, no cross-doc state.
    */
  def removeDocs(s: SparkSession, storeDir: String, docIds: DataFrame): Long = {
    require(exists(s, storeDir), s"no fingerprint store under $storeDir")
    require(docIds.columns.sameElements(Array("doc_id")),
      s"docIds must be a single-column (doc_id) frame, got: ${docIds.columns.mkString(", ")}")
    val p = storedParams(s, storeDir)
    val staging = stagingPath(storeDir)
    val before = load(s, storeDir)
    before.join(docIds, Seq("doc_id"), "left_anti")
      .write.mode("overwrite").parquet(staging)
    writeMarker(fileSystem(s, storeDir), staging, p)
    val removed = before.count() - s.read.parquet(staging).count()
    graft.operators.StoreSwap.swapIn(s, storeDir, fpPath(storeDir),
      staging, "_takedown-old")
    removed
  }

  /** Maintenance compaction — contents identical, `targetFiles` files;
    * daily appends otherwise accumulate part-files until footer/open
    * overhead dominates the serve scan. coalesce (no shuffle), the
    * [[Store.compact]] discipline and crash-safe swap.
    */
  def compact(s: SparkSession, storeDir: String, targetFiles: Int = 1): Unit = {
    require(targetFiles >= 1, s"targetFiles must be >= 1, got $targetFiles")
    require(exists(s, storeDir), s"no fingerprint store under $storeDir")
    val p = storedParams(s, storeDir)
    val staging = stagingPath(storeDir)
    load(s, storeDir).coalesce(targetFiles)
      .write.mode("overwrite").parquet(staging)
    writeMarker(fileSystem(s, storeDir), staging, p)
    graft.operators.StoreSwap.swapIn(s, storeDir, fpPath(storeDir),
      staging, "_compact-old")
  }
}
