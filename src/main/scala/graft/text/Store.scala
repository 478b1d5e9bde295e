package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted MinHash signature store: compute each document's dedup
  * signatures ONCE, serve every later drop from the stored table — the
  * batch analog of `Streams.nearDupVsCorpusStream` and the dedup
  * counterpart of `vector.Index`'s build/serve split.
  *
  * A real 100 TB pipeline ingests drops daily; recomputing the corpus
  * side's shingles + signatures per drop is an O(corpus) map cost paid
  * for an O(drop) question. The store makes the recurring cost
  * O(drop) + one columnar scan of the stored table:
  *
  *   - `build` tokenizes/shingles/signs the initial corpus once and
  *     persists (doc_id, sh, bands) as parquet (the raw 16-hash signature
  *     is subsumed by its band keys and not stored).
  *   - `dedupNewDropVsCorpus` signs ONLY the new drop, finds cross
  *     candidates via the banded equi join (new bands × stored bands —
  *     never a theta join), verifies exact Jaccard on candidates only
  *     against the STORED shingle sets (the old corpus is never
  *     re-tokenized), removes intra-drop dups the same way (smallest-id
  *     survivorship, q26's policy), and appends the SURVIVORS' already
  *     computed signatures to the store. Idempotent: re-running the same
  *     drop finds every doc identical to its stored self (Jaccard 1) and
  *     appends nothing.
  *
  * Store-side scan shape: the band-join branch reads only (doc_id,
  * bands); the verify branch reads (doc_id, sh) joined to the tiny
  * candidate set (AQE broadcasts it), so no corpus-sized shuffle of the
  * store — column pruning keeps each branch at the columns it needs.
  *
  * Determinism: signatures and band keys are md5-derived (TextOps), the
  * Jaccard decision is the integer 10·|∩| ≥ t·|∪| rule, survivorship is
  * smallest-id — the stored table and every survivor set are re-run
  * byte-identical (the training-data audit property).
  */
object Store {

  def sigPath(storeDir: String): String = s"$storeDir/signatures"

  /** A store's LSH signature shape: `numHashes` minhashes banded as
    * `numBands` × `rowsPerBand`. The S-curve threshold (1/b)^(1/r) of
    * every shape the engine derives sits at ≈0.7 — the verify
    * threshold — so CANDIDATE recall at the decision boundary is stable
    * across shapes while the false-candidate rate b·j^r for sub-threshold
    * pairs falls geometrically with r (the exact verify then makes the
    * OUTPUT identical up to borderline-candidate recall).
    */
  final case class SigShape(numHashes: Int, numBands: Int, rowsPerBand: Int) {
    require(numBands * rowsPerBand == numHashes,
      s"bands × rows must cover the signature, got $this")
  }

  /** The historical fixed shape (16 hashes, 4×4; S-curve ≈ 0.71) — what
    * every store built before shapes were persisted used, and still the
    * derived shape at test scale.
    */
  val LegacyShape: SigShape = SigShape(16, 4, 4)

  /** The shingle UNIVERSE a store's signatures were computed over — the
    * second half of the store's self-description (the shape says how
    * signatures band; the universe says what they were hashed FROM).
    * The banding, candidate-join, verify and survivorship stages were
    * always universe-agnostic (q204 proved it by running the text LSH
    * tail over hex byte shingles verbatim); only the PREP differs:
    *
    *   - [[Universe.TextWords]]: word 3-gram shingles of a string
    *     column (the text dedup family, q106/q141/q171).
    *   - [[Universe.PayloadBytes]]: hex byte 12-shingles of a BINARY
    *     column ([[graft.multimodal.Binary.byteShingles]]) — the
    *     container-level near-dup a crawled media corpus needs
    *     (re-wrapped / truncated / watermark-appended payloads), with
    *     no decoder in the loop.
    *
    * The universe rides in the shape marker, so every serve preps the
    * incoming drop the way the STORE was built — probing a bytes store
    * with word shingles would silently match nothing, the exact
    * cross-shape failure the marker exists to prevent. Serves
    * additionally type-check the probed column (binary vs string)
    * so a mis-wired caller fails loudly, not emptily.
    */
  sealed abstract class Universe(val tag: String)
  object Universe {
    case object TextWords extends Universe("text")
    case object PayloadBytes extends Universe("bytes")
    def fromTag(t: String): Universe = t match {
      case "text"  => TextWords
      case "bytes" => PayloadBytes
      case other => throw new IllegalStateException(
        s"unknown signature universe '$other' — this build understands {text, bytes}")
    }
  }

  /** Size-derived signature shape — the autoK lesson applied to banding.
    * The failure a fixed shape walks into: false candidates — pairs that
    * band-collide but fail the exact verify — cost ~n²·mass·b·j^r, where
    * `mass` is the corpus's SUB-threshold similarity density. Raising
    * rows-per-band r cuts a Jaccard-j pair's collision rate by j per
    * row; raising bands b alongside keeps the S-curve threshold
    * (1/b)^(1/r) pinned at the 0.7 verify point. Signing is map-only
    * and linear in numHashes, so trading 3–8× hash work for a
    * geometrically smaller quadratic term is the q61 5×12-vs-8×6 move.
    *
    *   n < 1e6   → 16 hashes, 4×4  (S ≈ 0.71)  — every measured regime
    *   n < 1e8   → 54 hashes, 9×6  (S ≈ 0.69)
    *   else      → 136 hashes, 17×8 (S ≈ 0.70)
    *
    * Detection at j = 0.9 stays ≥ 0.98 for all three (1-(1-j^r)^b);
    * false-candidate rate at j = 0.5 falls 25% → 14% → 7.8%.
    *
    * Thresholds are set from MEASUREMENT, not the asymptote alone: on
    * the ScaleGen corpus cross-copy shingle overlap is zero by
    * construction, candidates grow linearly, and the wider shapes only
    * add band-join input — legacy wins the serve through the largest
    * generated store (n = 333k: 5.5 s vs 6.4 s vs 8.2 s, BandBench
    * r11). The n²-side of the trade is real but needs sub-threshold
    * mass to bind; BandBench's planted-family experiment measures that
    * regime directly (36k docs in j ≈ 0.45 families of 120: false
    * candidates 200,745 → 70,824 → 23,767 across the three shapes at
    * identical verified output, candidate+verify wall-clock already
    * crossing over at that size — 3.4 → 3.0 → 2.7 s with the corpus
    * side pre-signed, as a store serve is), so the rule switches only
    * ABOVE every measured legacy-wins point, where any nonzero mass has
    * n² behind it.
    */
  def derivedShape(n: Long): SigShape =
    if (n < 1000000L) LegacyShape
    else if (n < 100000000L) SigShape(54, 9, 6)
    else SigShape(136, 17, 8)

  /** The shape marker rides INSIDE the signatures dir as `_shape` (one
    * line — `v1 <hashes> <bands> <rows>` for text-universe stores, the
    * unchanged historical format, or `v2 <hashes> <bands> <rows>
    * <universe>` once the universe is non-default): parquet scans skip
    * underscore-prefixed files, and the build commit's whole-dir rename
    * publishes data, shape and universe atomically. A store without the
    * marker is a pre-shape store → [[LegacyShape]] over text.
    */
  private def shapeFile(storeDir: String) =
    new org.apache.hadoop.fs.Path(sigPath(storeDir), "_shape")

  private def writeShapeMarker(fs: org.apache.hadoop.fs.FileSystem,
                               dir: String, shape: SigShape,
                               universe: Universe = Universe.TextWords): Unit = {
    val out = fs.create(new org.apache.hadoop.fs.Path(dir, "_shape"), true)
    val line = universe match {
      case Universe.TextWords =>
        s"v1 ${shape.numHashes} ${shape.numBands} ${shape.rowsPerBand}\n"
      case u =>
        s"v2 ${shape.numHashes} ${shape.numBands} ${shape.rowsPerBand} ${u.tag}\n"
    }
    try out.write(line.getBytes("UTF-8")) finally out.close()
  }

  private def readMarker(s: SparkSession,
                         storeDir: String): (SigShape, Universe) = {
    require(exists(s, storeDir),
      s"no signature store under $storeDir — run Store.build first")
    val f = shapeFile(storeDir)
    val fs = f.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(f)) (LegacyShape, Universe.TextWords)
    else {
      val in = fs.open(f)
      val line = try scala.io.Source.fromInputStream(in, "UTF-8")
        .getLines().next().trim finally in.close()
      line.split(" ") match {
        case Array("v1", h, b, r) =>
          (SigShape(h.toInt, b.toInt, r.toInt), Universe.TextWords)
        case Array("v2", h, b, r, u) =>
          (SigShape(h.toInt, b.toInt, r.toInt), Universe.fromTag(u))
        case _ => throw new IllegalStateException(
          s"unreadable shape marker in $storeDir: '$line'")
      }
    }
  }

  /** The shape this store's signatures were built with. */
  def storedShape(s: SparkSession, storeDir: String): SigShape =
    readMarker(s, storeDir)._1

  /** The shingle universe this store's signatures were computed over. */
  def storedUniverse(s: SparkSession, storeDir: String): Universe =
    readMarker(s, storeDir)._2

  /** Hash count of the streaming signature key stored alongside the batch
    * signatures — `Streams.nearDupVsStoreStream` must probe with the SAME
    * key the store was built with, so both sides read this constant.
    */
  val SigKeyHashes: Int = 8

  /** (doc_id, sh, bands, sig_key): the batch signatures from
    * [[Dedup.prepared]] plus the streaming dedup key — computed once here
    * so a long-running ingest stream can left-anti against the store
    * without ever touching the corpus text.
    */
  private def signed(docs: DataFrame, idCol: String, textCol: String,
                     shape: SigShape): DataFrame =
    Dedup.prepared(docs, idCol, textCol, numHashes = shape.numHashes,
        numBands = shape.numBands, rowsPerBand = shape.rowsPerBand)
      .join(docs.select(col(idCol).as("doc_id"),
        graft.streaming.Streams.sigKey(textCol, idCol, SigKeyHashes)
          .as("sig_key")), Seq("doc_id"))
      .select(col("doc_id"), col("sh"), col("bands"), col("sig_key"))

  /** The [[Universe.PayloadBytes]] prep: hex byte 12-shingles
    * ([[graft.multimodal.Binary.byteShingles]] — stride 1 byte,
    * whole-hex fallback under 12 bytes) minhashed and banded exactly
    * like the text prep. The sig_key mirrors `Streams.sigKey`'s policy
    * bit for bit: null/EMPTY payloads get a per-doc `raw:` key (a
    * constant key would collapse every unrelated empty blob into one
    * "near-dup" group), everything else keys on the md5 of its
    * [[SigKeyHashes]]-hash MinHash signature — so a streaming ingest
    * probes the bytes store with the SAME near-dup key the text side
    * uses, and short payloads (whose only shingle is their whole hex —
    * the byteShingles fallback) key deterministically on exact bytes
    * through it, the `txt:` behavior without needing the prefix.
    * Each projection step keeps `hx` a PROJECTED attribute (the
    * byteShingles contract: interpreted higher-order functions
    * re-evaluate captured expressions per element).
    */
  private def signedBytes(docs: DataFrame, idCol: String,
                          payloadCol: String, shape: SigShape): DataFrame =
    docs
      .select(col(idCol).as("doc_id"), hex(col(payloadCol)).as("hx"))
      .select(col("doc_id"), col("hx"),
        graft.multimodal.Binary.byteShingles(col("hx")).as("sh"))
      .select(col("doc_id"), col("sh"), col("hx"),
        graft.functions.MinHashSignature.of(col("sh"), shape.numHashes)
          .as("sig"))
      .select(col("doc_id"), col("sh"),
        TextOps.lshBands(col("sig"), shape.numBands, shape.rowsPerBand)
          .as("bands"),
        when(col("hx").isNull || length(col("hx")) === 0,
          concat(lit("raw:"), col("doc_id").cast("string")))
          .otherwise(bytesSigKeyOf(col("sh"))).as("sig_key"))

  /** md5 of the [[SigKeyHashes]]-hash MinHash signature of a byte-shingle
    * set — the non-blank arm of the bytes universe's streaming/dedup key.
    * One definition shared by the batch prep above and
    * [[graft.streaming.Streams.nearDupVsStoreStream]]'s probe side: the
    * key only works if both compute it identically.
    */
  private[graft] def bytesSigKeyOf(sh: org.apache.spark.sql.Column) =
    md5(concat_ws("|", transform(
      graft.functions.MinHashSignature.of(sh, SigKeyHashes),
      x => x.cast("string"))))


  /** Prep `docs` for this store's universe: the column named by
    * `contentCol` is tokenized/shingled per the universe, with a loud
    * type check — a bytes store probed with a string column (or vice
    * versa) is a mis-wired pipeline, and the silent outcome would be an
    * empty candidate set, the failure mode the marker exists to stop.
    */
  private def signedFor(docs: DataFrame, idCol: String, contentCol: String,
                        shape: SigShape, universe: Universe): DataFrame = {
    val dt = docs.schema(contentCol).dataType
    universe match {
      case Universe.TextWords =>
        require(dt == org.apache.spark.sql.types.StringType,
          s"text-universe store expects a string column, got $contentCol: $dt")
        signed(docs, idCol, contentCol, shape)
      case Universe.PayloadBytes =>
        require(dt == org.apache.spark.sql.types.BinaryType,
          s"bytes-universe store expects a binary column, got $contentCol: $dt")
        signedBytes(docs, idCol, contentCol, shape)
    }
  }

  def exists(s: SparkSession, storeDir: String): Boolean = {
    graft.operators.StoreSwap.requireNotCrashed(s, storeDir, sigPath(storeDir))
    val p = new org.apache.hadoop.fs.Path(sigPath(storeDir))
    p.getFileSystem(s.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Tokenize + shingle + sign the corpus once; persist the signature
    * table. Overwrites: build is the scheduled full (re)bootstrap, like
    * `Index.build`.
    */
  def build(docs: DataFrame, storeDir: String,
            idCol: String = "doc_id", textCol: String = "text",
            shape: Option[SigShape] = None,
            universe: Universe = Universe.TextWords): Unit =
    buildStaged(docs, storeDir, idCol, textCol, shape, universe)()

  /** [[build]] split into compute and commit: the signatures land in a
    * staging dir inside `storeDir` NOW; the store only starts existing
    * (for [[exists]]/[[load]]) when the returned commit thunk runs. The
    * crash-retry guard for pipelines that bootstrap the store as a side
    * effect of producing another output (CLI `--dedup-store`): commit
    * after THAT output succeeds, or a failed run's retry would find a
    * store already containing the drop and dedup it against itself —
    * silently writing an empty corpus.
    */
  def buildStaged(docs: DataFrame, storeDir: String,
                  idCol: String = "doc_id",
                  textCol: String = "text",
                  shape: Option[SigShape] = None,
                  universe: Universe = Universe.TextWords): () => Unit = {
    val s = docs.sparkSession
    // shape: explicit > derived-from-corpus-size (one count job, the
    // buildAuto discipline — the caller-free default must not lock a
    // 10^9-doc store into the test-scale shape)
    val sh = shape.getOrElse(derivedShape(docs.count()))
    val staging = stagingPath(storeDir)
    signedFor(docs, idCol, textCol, sh, universe)
      .write.mode("overwrite").parquet(staging)
    writeShapeMarker(fileSystem(s, storeDir), staging, sh, universe)
    () => {
      val fs = fileSystem(s, storeDir)
      val sig = new org.apache.hadoop.fs.Path(sigPath(storeDir))
      fs.delete(sig, true)
      require(fs.rename(new org.apache.hadoop.fs.Path(staging), sig),
        s"could not commit staged store $staging -> $sig")
    }
  }

  /** Staging dirs live beside (never inside) the signatures dir, so
    * [[load]]'s parquet scan never sees half-committed files; the leading
    * underscore additionally makes any recursive reader skip them.
    */
  private def stagingPath(storeDir: String): String =
    s"$storeDir/_staging-${java.util.UUID.randomUUID().toString.take(8)}"

  private def fileSystem(s: SparkSession, dir: String) =
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(s.sparkContext.hadoopConfiguration)

  /** The stored signature table: (doc_id, sh, bands, sig_key). */
  def load(s: SparkSession, storeDir: String): DataFrame =
    s.read.parquet(sigPath(storeDir))

  /** Maintenance: rewrite the signature table into `targetFiles` parquet
    * files, contents IDENTICAL (same rows, every column — the audit
    * property compaction must not disturb). Daily drops append a handful
    * of part-files each ([[dedupNewDropVsCorpusStaged]]'s commit renames
    * per-job files into the dir), so a store serving a 100 TB corpus
    * accumulates thousands of small files within weeks — footer/open
    * overhead then dominates the serve scan. Run this on the maintenance
    * schedule, like any LSM/lakehouse compaction.
    *
    * coalesce, not repartition: a rewrite wants NO shuffle — read tasks
    * funnel straight into `targetFiles` writers. Crash-safe swap: the
    * compacted copy lands in a staging dir, the live dir is moved aside,
    * staging is renamed in, then the old dir is deleted — a crash leaves
    * either the old store live or (between the two renames) the old dir
    * intact under `_compact-old`, never a half-written mix.
    */
  def compact(s: SparkSession, storeDir: String, targetFiles: Int = 1): Unit = {
    require(targetFiles >= 1, s"targetFiles must be >= 1, got $targetFiles")
    require(exists(s, storeDir), s"no signature store under $storeDir")
    val (shape, universe) = readMarker(s, storeDir)
    val staging = stagingPath(storeDir)
    load(s, storeDir).coalesce(targetFiles)
      .write.mode("overwrite").parquet(staging)
    writeShapeMarker(fileSystem(s, storeDir), staging, shape, universe)
    graft.operators.StoreSwap.swapIn(s, storeDir, sigPath(storeDir),
      staging, "_compact-old")
  }

  /** Takedown: remove the given documents' signatures from the store —
    * a takedown request (license revocation, PII discovery, opt-out)
    * honored by one signature-table rewrite, with the corpus text never
    * re-read. `docIds` is a one-column (doc_id) frame — a DataFrame, not
    * a collected set, because a source-level takedown over a 100 TB
    * corpus can name millions of ids; the filter is a left-anti equi
    * join (shuffle or broadcast as the ids frame's size dictates —
    * Catalyst/AQE's call, never the driver's).
    *
    * After removal, every [[dedupNewDropVsCorpus]] serve behaves EXACTLY
    * as if the removed docs were never ingested (q141's gate replays the
    * serve against the store built without them): signatures are per-doc
    * rows with no cross-doc rollup, so deletion is exact — the property
    * that makes THIS store takedown-able in O(store) while a
    * near-dup-graph rollup would need a corpus rescan. Returns the
    * number of signatures removed (an audit line the takedown ticket
    * records). Crash-safe `_takedown-old` swap, compact's discipline.
    */
  def removeDocs(s: SparkSession, storeDir: String, docIds: DataFrame): Long = {
    require(exists(s, storeDir), s"no signature store under $storeDir")
    require(docIds.columns.sameElements(Array("doc_id")),
      s"docIds must be a single-column (doc_id) frame, got: ${docIds.columns.mkString(", ")}")
    val (shape, universe) = readMarker(s, storeDir)
    val staging = stagingPath(storeDir)
    val before = load(s, storeDir)
    val kept = before.join(docIds, Seq("doc_id"), "left_anti")
    kept.write.mode("overwrite").parquet(staging)
    writeShapeMarker(fileSystem(s, storeDir), staging, shape, universe)
    // both counts are parquet footer-metadata reads (count pushdown),
    // not data scans — the audit number is cheap even at store scale
    val removed =
      before.count() - s.read.parquet(staging).count()
    graft.operators.StoreSwap.swapIn(s, storeDir, sigPath(storeDir),
      staging, "_takedown-old")
    removed
  }

  /** Dedup a new drop against the stored corpus WITHOUT recomputing any
    * stored signature, append the survivors' signatures, and return the
    * surviving rows of `newDocs`.
    *
    * A new doc is dropped when it near-dups (exact Jaccard ≥ t/10 among
    * banded candidates) ANY stored doc, or a smaller-id doc of its own
    * drop (intra-drop smallest-id survivorship — applied unconditionally,
    * so the kept set never depends on join evaluation order).
    *
    * The dup-id set is materialized BEFORE the append (same discipline as
    * `Index.append`): the survivor plan must never scan the directory it
    * is appending to mid-write.
    */
  def dedupNewDropVsCorpus(newDocs: DataFrame, storeDir: String,
                           thresholdTenths: Int = 7,
                           idCol: String = "doc_id",
                           textCol: String = "text"): DataFrame = {
    val (survivors, commit) =
      dedupNewDropVsCorpusStaged(newDocs, storeDir, thresholdTenths, idCol, textCol)
    commit()
    survivors
  }

  /** [[dedupNewDropVsCorpus]] with the survivor-signature append SPLIT
    * from the dedup: the mining runs now (survivor signatures land in a
    * staging dir), but the store is only mutated when the returned commit
    * thunk runs. Callers that write the survivors somewhere (the CLI's
    * training output) must commit AFTER that write succeeds: an eager
    * append + failed output write would make the retry see every doc of
    * the drop as a dup of its own stored signature and emit an empty
    * output with no error. Uncommitted staging dirs are inert (never
    * read) and re-staged work simply replaces them.
    */
  def dedupNewDropVsCorpusStaged(newDocs: DataFrame, storeDir: String,
                                 thresholdTenths: Int = 7,
                                 idCol: String = "doc_id",
                                 textCol: String = "text"): (DataFrame, () => Unit) = {
    val s = newDocs.sparkSession
    val (survivors, prep, dups) =
      mine(newDocs, storeDir, thresholdTenths, idCol, textCol)
    val staging = stagingPath(storeDir)
    prep.join(dups.withColumnRenamed("new_id", "doc_id"),
        Seq("doc_id"), "left_anti")
      .write.mode("overwrite").parquet(staging)
    val commit = () => {
      val fs = fileSystem(s, storeDir)
      val sig = new org.apache.hadoop.fs.Path(sigPath(storeDir))
      val src = new org.apache.hadoop.fs.Path(staging)
      // move data files only: Spark part-file names carry the writing
      // job's UUID, so names are unique within the signatures dir
      fs.listStatus(src).foreach { f =>
        if (f.getPath.getName.startsWith("part-"))
          require(fs.rename(f.getPath, new org.apache.hadoop.fs.Path(sig, f.getPath.getName)),
            s"could not commit staged append ${f.getPath} -> $sig")
      }
      fs.delete(src, true)
      ()
    }
    (survivors, commit)
  }

  /** Serve-only dedup: same decisions as [[dedupNewDropVsCorpus]] but the
    * store directory is NEVER touched — no staging write, no append. The
    * path for repeatable queries/benchmarks over a fixed corpus snapshot
    * (q106) and for dry-run "what would this drop add" questions: a
    * staged-but-uncommitted run would still leave one inert staging dir
    * per invocation behind; this leaves nothing.
    */
  def dedupNewDropVsCorpusReadOnly(newDocs: DataFrame, storeDir: String,
                                   thresholdTenths: Int = 7,
                                   idCol: String = "doc_id",
                                   textCol: String = "text",
                                   eager: Boolean = true): DataFrame =
    mine(newDocs, storeDir, thresholdTenths, idCol, textCol, eager)._1

  /** The shared mining core: (survivors of `newDocs`, the drop's signed
    * frame, the dup-id frame) — pure computation, no store mutation.
    */
  private def mine(newDocs: DataFrame, storeDir: String,
                   thresholdTenths: Int, idCol: String,
                   textCol: String,
                   eager: Boolean = true): (DataFrame, DataFrame, DataFrame) = {
    val s = newDocs.sparkSession
    require(exists(s, storeDir),
      s"no signature store under $storeDir — run Store.build first")
    // materialized: prep feeds the band join, both intra verify sides,
    // the cross verify side, and the survivor append — five branches.
    // `signedFor` with the STORED shape AND universe (not a fresh
    // derivation): band keys only collide between signatures of the same
    // shape over the same shingle universe, so a drop probed under a
    // different shape/universe would silently match NOTHING — the shape
    // marker is what makes the store's layout self-describing
    // eager=false (the TVF / fused-plan face): cache() shares the five
    // branches just as well but lazily — analysis/EXPLAIN must not run
    // the drop's signing job (the nearDupPairs eager-flag convention)
    val (shape, universe) = readMarker(s, storeDir)
    val signedDrop = signedFor(newDocs, idCol, textCol, shape, universe)
    val prep = if (eager) Dedup.materialize(signedDrop) else signedDrop.cache()
    val stored = load(s, storeDir)

    // BLANK docs are excluded from both band-join sides (their `raw:`
    // sig_key marks them — same set as the shingle-fallback's blank
    // singleton): every blank doc shares one degenerate singleton shingle
    // set, so once ONE blank doc is stored, banding would silently drop
    // every blank doc of every later drop despite matching no content.
    // Mirrors `Streams.sigKey`'s policy: blank docs always survive
    // (per-doc keys); short-but-real docs stay banded — their fallback
    // shingle is their exact text, so the banded path dedups them by
    // exact text (the batch analog of sigKey's `txt:` keys), and
    // candidatePairs applies the same blank guard on the intra side.
    val nb = prep.filter(!col("sig_key").startsWith("raw:"))
      .select(col("doc_id"),
        posexplode(col("bands")).as(Seq("band_idx", "band_key")))
    val ob = stored.filter(!col("sig_key").startsWith("raw:"))
      .select(col("doc_id"),
        posexplode(col("bands")).as(Seq("band_idx", "band_key")))
    val crossCand = nb.as("n").join(ob.as("o"),
        col("n.band_idx") === col("o.band_idx") &&
          col("n.band_key") === col("o.band_key"))
      .select(col("n.doc_id").as("new_id"), col("o.doc_id").as("old_id"))
      .distinct()

    val newSh = prep.select(col("doc_id").as("new_id"), col("sh").as("nsh"))
    val oldSh = stored.select(col("doc_id").as("old_id"), col("sh").as("osh"))
    def verified(cand: DataFrame, aSh: DataFrame, bSh: DataFrame,
                 aKey: String, bKey: String): DataFrame =
      cand.join(aSh, aKey).join(bSh, bKey)
        .select(col(aKey), col(bKey),
          size(array_intersect(col(aSh.columns(1)), col(bSh.columns(1)))).as("i"),
          (size(col(aSh.columns(1))) + size(col(bSh.columns(1)))).as("ss"))
        .filter(col("i") * 10 >= (col("ss") - col("i")) * lit(thresholdTenths))

    val crossDup = verified(crossCand, newSh, oldSh, "new_id", "old_id")
      .select(col("new_id")).distinct()
    val intraPairs = Dedup.candidatePairs(prep)
    val intraDup = verified(intraPairs,
        newSh.toDF("doc_a", "sha"), newSh.toDF("doc_b", "shb"),
        "doc_a", "doc_b")
      .select(col("doc_b").as("new_id")).distinct()

    // tiny (dup ids only) — materialize to cut lineage to the store dir
    // before appending to it, and so the returned survivor frame never
    // re-runs the mining when the caller acts on it
    val dups = Dedup.materialize(crossDup.unionByName(intraDup).distinct())

    val survivors =
      newDocs.join(dups.select(col("new_id").as(idCol)), Seq(idCol), "left_anti")
    (survivors, prep, dups)
  }
}
