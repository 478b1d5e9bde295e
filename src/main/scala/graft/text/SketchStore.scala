package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted distinct-count sketch ([[DistinctSketch]]'s build/serve
  * split) — the corpus-saturation ledger: each drop contributes its own
  * ≤ m register rows, and the served sketch of the whole ingest history
  * is one per-bucket MAX over drops×m rows — metadata-scale, history
  * text never re-hashed. Registers of disjoint corpus slices max-merge
  * to the union's registers by construction (max is associative,
  * commutative, idempotent — duplicate VALUES across drops are free,
  * unlike the sum-merge families where drops must partition the data),
  * so serve ≡ from-scratch bit-for-bit (q179's gate).
  *
  * Takedown is the family's one genuinely different case: MAX does not
  * subtract. Exactness comes from the ledger granularity instead —
  * removing a drop deletes its register ROWS and the serve re-maxes
  * the survivors, which is exactly the sketch of the never-ingested
  * history (q180's gate). The corollary is honest and documented:
  * unlearning is DROP-level; purging a single document from inside a
  * drop means rebuilding that drop's partial from its remaining raw
  * docs (the standard production answer for sketch state — registers
  * hold no per-doc rows to delete).
  *
  * What this buys at 100 TB: the distinct-gram growth curve
  * ([[growthCurve]]) — the "is new data still novel?" monitor — read
  * from drops×m stored rows instead of re-scanning an ever-growing
  * corpus per point; appending a day's drop hashes that drop once.
  *
  * Storage: one parquet table `distinctsketch` (drop_id, cfg, bucket,
  * rho); `cfg` stamps the gram width + the pinned m/MaxRho recipe —
  * registers over different gram universes are incommensurable, so
  * append and serve validate it single-valued and loud (the
  * [[ChunkStore]] rule). Lifecycle is the shared
  * [[graft.operators.DropLedger]] discipline (atomic per-drop subdir
  * append, staged commit-last, crash-safe swaps, loud double-remove).
  */
object SketchStore extends graft.operators.DropLedger {

  protected def tableName: String = "distinctsketch"
  protected def kind: String = "sketch store"

  /** cfg's leading letter is the GRAM UNIVERSE: `g` = word grams of a
    * string column (the unchanged historical format), `b` = byte grams
    * of a binary column — the media-drop form, so a crawled binary
    * corpus gets the same one-register-scan admission gate the text
    * pipeline has. Universes are incommensurable; the stamp is what
    * makes every later append/probe prep the SAME way.
    */
  private def cfgOf(gram: Int,
                    universe: Store.Universe = Store.Universe.TextWords): String =
    universe match {
      case Store.Universe.TextWords =>
        s"g$gram-m${DistinctSketch.Buckets}-r${DistinctSketch.MaxRho}"
      case Store.Universe.PayloadBytes =>
        s"b$gram-m${DistinctSketch.Buckets}-r${DistinctSketch.MaxRho}"
    }

  private def parseCfg(cfg: String): (Int, Store.Universe) = {
    val u = cfg.head match {
      case 'g' => Store.Universe.TextWords
      case 'b' => Store.Universe.PayloadBytes
      case _ => throw new IllegalStateException(
        s"unreadable sketch cfg '$cfg' — this build understands g*/b*")
    }
    (cfg.drop(1).takeWhile(_ != '-').toInt, u)
  }

  /** Per-universe default gram width: word 5-grams (the historical
    * default) / byte 12-grams (the byte-shingle family's k).
    */
  private def defaultGram(universe: Store.Universe): Int = universe match {
    case Store.Universe.TextWords    => 5
    case Store.Universe.PayloadBytes => 12
  }

  /** Gram stream per universe, with the loud column-type check every
    * marker-driven prep carries (probing a bytes store with a string
    * column would silently hex the text and match nothing).
    */
  private def gramsFor(docs: DataFrame, contentCol: String, gram: Int,
                       universe: Store.Universe): DataFrame = {
    val dt = docs.schema(contentCol).dataType
    universe match {
      case Store.Universe.TextWords =>
        require(dt == org.apache.spark.sql.types.StringType,
          s"text-universe sketch store expects a string column, got $contentCol: $dt")
        DistinctSketch.grams(docs, contentCol, gram)
      case Store.Universe.PayloadBytes =>
        require(dt == org.apache.spark.sql.types.BinaryType,
          s"bytes-universe sketch store expects a binary column, got $contentCol: $dt")
        DistinctSketch.byteGrams(docs, contentCol, gram)
    }
  }

  /** (drop_id, cfg, bucket, rho) for one drop — ≤ m rows. gram = 0
    * means the universe's default ([[defaultGram]]).
    */
  def partials(docs: DataFrame, dropId: String, textCol: String = "text",
               gram: Int = 0,
               universe: Store.Universe = Store.Universe.TextWords): DataFrame = {
    requireDropId(dropId)
    val g = if (gram > 0) gram else defaultGram(universe)
    DistinctSketch.registers(gramsFor(docs, textCol, g, universe))
      .select(lit(dropId).as("drop_id"), lit(cfgOf(g, universe)).as("cfg"),
        col("bucket"), col("rho"))
  }

  /** The store's config stamp — single-valued or loud; a drained store
    * (every drop removed) refuses here, the family rule.
    */
  def storedCfg(s: SparkSession, storeDir: String): String = {
    requireStore(s, storeDir)
    val cfgs = load(s, storeDir).select(col("cfg")).distinct()
      .collect().map(_.getString(0))
    require(cfgs.nonEmpty,
      s"$kind $storeDir has no drops (every drop was removed) — " +
        "build or append before serving")
    require(cfgs.length == 1,
      s"$kind $storeDir holds mixed sketch configs " +
        s"${cfgs.sorted.mkString(", ")} — corrupt")
    cfgs.head
  }

  /** Bootstrap from the first drop (overwrites). */
  def build(docs: DataFrame, storeDir: String, dropId: String,
            textCol: String = "text", gram: Int = 0,
            universe: Store.Universe = Store.Universe.TextWords): Unit =
    buildStaged(docs, storeDir, dropId, textCol, gram, universe)()

  def buildStaged(docs: DataFrame, storeDir: String, dropId: String,
                  textCol: String = "text", gram: Int = 0,
                  universe: Store.Universe = Store.Universe.TextWords): () => Unit =
    stagePartialsBuild(partials(docs, dropId, textCol, gram, universe),
      storeDir, coalesceTo = Some(1)).commit

  /** Append a new drop's registers (staged, single-rename atomic
    * commit). Refuses a stored id and inherits the store's gram config —
    * a caller cannot mix register universes.
    */
  def appendStaged(docs: DataFrame, storeDir: String,
                   dropId: String, textCol: String = "text"): () => Unit = {
    val s = docs.sparkSession
    val (gram, universe) = parseCfg(storedCfg(s, storeDir))
    requireNewDrop(s, storeDir, dropId)
    stagePartialsAppend(partials(docs, dropId, textCol, gram, universe),
      storeDir, dropId, coalesceTo = Some(1)).commit
  }

  def append(docs: DataFrame, storeDir: String, dropId: String,
             textCol: String = "text"): Unit =
    appendStaged(docs, storeDir, dropId, textCol)()

  /** Served sketch: (bucket, rho) max-merged across surviving drops —
    * exactly [[DistinctSketch.registers]] of the union corpus.
    */
  def serveRegisters(s: SparkSession, storeDir: String): DataFrame = {
    storedCfg(s, storeDir) // existence + non-drained + single-cfg
    load(s, storeDir).groupBy(col("bucket")).agg(max(col("rho")).as("rho"))
  }

  /** One-row estimate of the whole history's distinct count — the
    * recurring monitoring read: drops×m stored rows in, constants out.
    */
  def serveEstimate(s: SparkSession, storeDir: String): DataFrame =
    DistinctSketch.estimate(serveRegisters(s, storeDir))

  /** Pairwise drop-overlap estimates from stored partials ONLY — the
    * inter-drop redundancy matrix ("is Tuesday's crawl re-fetching
    * Monday's?") by inclusion–exclusion on the sketch estimates:
    * overlap_est = est_a + est_b − est_union, where est_union comes
    * from max-merging just the two drops' register rows (HLL union is
    * exact-in-the-sketch; intersection is the derived quantity). At
    * 100 TB this replaces a corpus × corpus join with drops² × m stored
    * rows. Sketch error can drive a small true-zero overlap NEGATIVE —
    * reported raw (clamping here would hide the error band; the
    * containment column floors at 0 because a ratio is a decision
    * feed). containment_ppm = overlap relative to the SMALLER drop in
    * integer ppm — near 10^6 means one drop is essentially inside the
    * other.
    */
  def overlapMatrix(s: SparkSession, storeDir: String): DataFrame = {
    import s.implicits._
    storedCfg(s, storeDir)
    val ordered = drops(s, storeDir).toSeq.sorted
    val pairs = (for {
      i <- ordered.indices; j <- (i + 1) until ordered.size
    } yield (ordered(i), ordered(j))).toDF("drop_a", "drop_b")
    val parts = load(s, storeDir)
    // a drop's partial rows ARE its registers (per-bucket max at build)
    val single = DistinctSketch.estimateAgg(
      parts.select(col("drop_id"), col("bucket"), col("rho")),
      Seq(col("drop_id")))
    val unionRegs = parts
      .join(broadcast(pairs),
        col("drop_id") === col("drop_a") || col("drop_id") === col("drop_b"))
      .groupBy(col("drop_a"), col("drop_b"), col("bucket"))
      .agg(max(col("rho")).as("rho"))
    DistinctSketch.estimateAgg(unionRegs, Seq(col("drop_a"), col("drop_b")))
      .select(col("drop_a"), col("drop_b"),
        col("est_distinct").as("est_union"))
      .join(broadcast(single.select(col("drop_id").as("drop_a"),
        col("est_distinct").as("est_a"))), Seq("drop_a"))
      .join(broadcast(single.select(col("drop_id").as("drop_b"),
        col("est_distinct").as("est_b"))), Seq("drop_b"))
      .select(col("drop_a"), col("drop_b"), col("est_a"), col("est_b"),
        col("est_union"),
        (col("est_a") + col("est_b") - col("est_union")).as("overlap_est"))
      .withColumn("containment_ppm",
        expr("(greatest(overlap_est, 0L) * 1000000) div least(est_a, est_b)"))
  }

  /** Pre-ingest admission check: how much of a CANDIDATE drop is new
    * against the stored history, decided before the drop ever joins the
    * store — sketch the candidate (one pass over the drop only),
    * max-merge against the served registers, and report
    * (est_drop, est_store, est_union, novelty_est, containment_ppm) in
    * one row: novelty_est = est_union − est_store (what the drop would
    * ADD), containment_ppm = the drop's overlap share of itself (near
    * 10^6 ⇒ the drop is essentially already ingested — skip it). The
    * history is never re-read beyond drops × m register rows, so the
    * admission decision for a day's crawl costs one scan OF THAT CRAWL
    * — the gate that keeps a 100 TB pool from paying full dedup cost on
    * a drop that was 95% old news. Sketch error can drive novelty_est
    * slightly negative on a fully-contained drop — reported raw, like
    * [[overlapMatrix]].
    */
  def admission(docs: DataFrame, storeDir: String, textCol: String = "text",
                eager: Boolean = true): DataFrame = {
    val s = docs.sparkSession
    val (gram, universe) = parseCfg(storedCfg(s, storeDir))
    val dropRegs0 = DistinctSketch.registers(
      gramsFor(docs, textCol, gram, universe))
    val dropRegs = if (eager) Dedup.materialize(dropRegs0) else dropRegs0
    val storeRegs = serveRegisters(s, storeDir)
    val estOf = (regs: DataFrame, name: String) =>
      DistinctSketch.estimateAgg(regs, Seq.empty)
        .select(col("est_distinct").as(name))
    estOf(dropRegs, "est_drop")
      .crossJoin(broadcast(estOf(storeRegs, "est_store")))
      .crossJoin(broadcast(estOf(
        dropRegs.unionByName(storeRegs)
          .groupBy(col("bucket")).agg(max(col("rho")).as("rho")),
        "est_union")))
      .withColumn("novelty_est", expr("est_union - est_store"))
      .withColumn("containment_ppm",
        expr("(greatest(est_drop - novelty_est, 0L) * 1000000) div est_drop"))
  }

  /** Doc-granular PURGE — the max-merge family's takedown-parity recipe
    * (max cannot subtract, so the ledger REBUILDS): re-sketch drop
    * `dropId` from its remaining raw docs and swap the drop's register
    * rows atomically ([[graft.operators.DropLedger.replaceDropRows]]).
    * Serve afterwards ≡ a from-scratch store whose drop never contained
    * the purged docs (CliSpec gates this literally). `remainingDocs` is
    * the drop's raw corpus MINUS the purged docs — the caller owns raw
    * access (the store holds registers only; that is what makes its
    * serve metadata-scale); the CLI wires a removal ticket to this via
    * `--takedown ticket --sketch-store sd --sketch-raw drop=rawDir`.
    * Cost: one scan of THAT DROP's raw docs — never the history.
    */
  def purgeDocs(remainingDocs: DataFrame, storeDir: String, dropId: String,
                textCol: String = "text"): Unit = {
    val s = remainingDocs.sparkSession
    val (gram, universe) = parseCfg(storedCfg(s, storeDir))
    replaceDropRows(s, storeDir, dropId,
      partials(remainingDocs, dropId, textCol, gram, universe))
  }

  /** Admission-GATED ingest — [[admission]] wired into the ingest loop
    * (the foreachBatch streaming path and the CLI both call this): the
    * candidate drop is sketched ONCE; if the store already holds its id
    * the drop is recorded-and-skipped (replay convergence — exactly-once
    * across foreachBatch retries); if its containment_ppm ≥
    * `maxContainmentPpm` it is recorded-and-REJECTED (a stale/replayed
    * crawl never pays ingest or downstream dedup cost); otherwise it is
    * appended. EVERY verdict — admitted, duplicate-drop, rejected-stale
    * — lands as one row in the store's admission LOG
    * (`storeDir/_admissions/<n>-<dropId>/`, read back by
    * [[admissionLog]]), so the decision trail is auditable state, not
    * stdout. The log is decision metadata, NOT register rows: a
    * rejected drop contributes nothing to the serve. Returns true iff
    * the drop was appended.
    */
  def ingestGated(docs: DataFrame, storeDir: String, dropId: String,
                  maxContainmentPpm: Long = 950000L,
                  textCol: String = "text",
                  universe: Store.Universe = Store.Universe.TextWords): Boolean = {
    requireDropId(dropId)
    val s = docs.sparkSession
    if (!exists(s, storeDir)) {
      // only the bootstrap consults the universe arg — every later call
      // inherits the cfg stamp, so a caller can't flip it mid-ledger
      build(docs, storeDir, dropId, textCol, universe = universe)
      recordAdmission(s, storeDir, dropId, "admitted-bootstrap", None)
      true
    } else if (drops(s, storeDir).contains(dropId)) {
      recordAdmission(s, storeDir, dropId, "skipped-duplicate-drop", None)
      false
    } else {
      val adm = admission(docs, storeDir, textCol).collect().head
      if (adm.getAs[Long]("containment_ppm") >= maxContainmentPpm) {
        recordAdmission(s, storeDir, dropId, "rejected-stale", Some(adm))
        false
      } else {
        append(docs, storeDir, dropId, textCol)
        recordAdmission(s, storeDir, dropId, "admitted", Some(adm))
        true
      }
    }
  }

  /** One verdict row into the admission log — shared by [[ingestGated]]
    * and the curation spine's admission gate
    * ([[Curation.incrementalSpineGated]]), so BOTH decision loops leave
    * the same auditable trail in the same place.
    */
  private[text] def recordAdmission(s: SparkSession, storeDir: String,
                                    dropId: String, verdict: String,
                                    adm: Option[org.apache.spark.sql.Row]): Unit = {
    import s.implicits._
    val seq = admissionLogEntries(s, storeDir).size + 1L
    val row = adm match {
      case Some(r) => Seq((seq, dropId, verdict, Some(r.getLong(0)),
        Some(r.getLong(1)), Some(r.getLong(2)), Some(r.getLong(3)),
        Some(r.getLong(4))))
      case None => Seq((seq, dropId, verdict, None: Option[Long],
        None: Option[Long], None: Option[Long], None: Option[Long],
        None: Option[Long]))
    }
    row.toDF("seq", "drop_id", "verdict", "est_drop", "est_store",
        "est_union", "novelty_est", "containment_ppm")
      .coalesce(1).write.mode("overwrite")
      .parquet(f"$storeDir/_admissions/$seq%06d-$dropId")
  }

  private def admissionLogEntries(s: SparkSession, storeDir: String): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(s"$storeDir/_admissions")
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq.map(_.getPath.getName).sorted
  }

  /** The admission decision trail: one row per [[ingestGated]] verdict,
    * in decision order (`seq`). Estimates are NULL for verdicts that
    * never scored (bootstrap, duplicate-drop replay).
    */
  def admissionLog(s: SparkSession, storeDir: String): DataFrame = {
    require(admissionLogEntries(s, storeDir).nonEmpty,
      s"no admission log under $storeDir/_admissions — ingest through " +
        "ingestGated to record verdicts")
    s.read.option("recursiveFileLookup", "true")
      .parquet(s"$storeDir/_admissions")
  }

  /** The saturation curve: one row per ingest PREFIX of the
    * lexicographically-ordered drops (date-shaped ids sort themselves) —
    * (drops_seen, last_drop, occupied, est_distinct). A flattening
    * est_distinct across prefixes is the "new drops add volume, not
    * novelty" signal. Plan: stored partials ⋈ broadcast drop-index ⋈
    * broadcast prefix frame (idx ≤ prefix) → per-(prefix, bucket) max →
    * the constant-size estimate agg; everything after the store scan is
    * drops² × m rows — metadata-scale.
    */
  def growthCurve(s: SparkSession, storeDir: String): DataFrame = {
    import s.implicits._
    storedCfg(s, storeDir)
    val ordered = drops(s, storeDir).toSeq.sorted // driver-sized: drop ids
    val idx = ordered.zipWithIndex
      .map { case (d, i) => (d, i + 1L) }.toDF("drop_id", "__idx")
    val prefixes = ordered.zipWithIndex
      .map { case (d, i) => (i + 1L, d) }.toDF("drops_seen", "last_drop")
    val regs = load(s, storeDir)
      .join(broadcast(idx), Seq("drop_id"))
      .join(broadcast(prefixes), col("__idx") <= col("drops_seen"))
      .groupBy(col("drops_seen"), col("last_drop"), col("bucket"))
      .agg(max(col("rho")).as("rho"))
    DistinctSketch.estimateAgg(regs, Seq(col("drops_seen"), col("last_drop")))
      .select(col("drops_seen"), col("last_drop"),
        col("occupied").cast("long"), col("est_distinct"))
  }
}
