package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted frequency sketch ([[FreqSketch]]'s build/serve split) —
  * the per-item frequency ledger: each drop contributes its own ≤
  * Depth×Width counter rows, and the served sketch of the whole ingest
  * history is one per-(depth, slot) SUM over drops×4096 rows —
  * metadata-scale, history text never re-hashed. Counters of disjoint
  * drops sum-merge to the union's counters because counts are linear
  * (drops must PARTITION the docs — the sum-merge family rule shared
  * with [[ClassifyStore]]/[[DsirStore]]), so serve ≡ from-scratch
  * bit-for-bit (q192's gate).
  *
  * Linearity is also what sets this family's takedown apart: beyond
  * the drop-level row deletion every sum-merge ledger gets for free,
  * counters SUBTRACT — purging documents from inside a drop re-derives
  * that drop's rows as (stored rows) − (the purged docs' own sketch),
  * computed from ONE SCAN OF THE PURGED DOCS ONLY ([[unlearnDocs]]).
  * Contrast the max-merge [[SketchStore]], whose doc purge must
  * re-sketch the drop's REMAINDER ([[SketchStore.purgeDocs]]): here the
  * removal ticket's own content is the entire cost, however large the
  * drop it came from. q193 gates the result ≡ a store whose drop never
  * contained the purged docs.
  *
  * What this buys at 100 TB: corpus-wide occurrence counts for any
  * probe workload — contamination phrases, boilerplate candidates,
  * stopword drift — answered from drops×4096 stored rows + one
  * workload-sized join ([[serveEstimates]], q194), with the one-sided
  * est ≥ exact guarantee and the ε = e/w error band documented on
  * [[FreqSketch]].
  *
  * Storage: one parquet table `freqsketch` (drop_id, cfg, depth, slot,
  * cnt); `cfg` stamps the gram width + the pinned w/d recipe — counters
  * over different universes are incommensurable, so append and serve
  * validate it single-valued and loud (the [[ChunkStore]] rule).
  * Lifecycle is the shared [[graft.operators.DropLedger]] discipline
  * (atomic per-drop subdir append, staged commit-last, crash-safe
  * swaps, loud double-remove).
  */
object FreqStore extends graft.operators.DropLedger {

  protected def tableName: String = "freqsketch"
  protected def kind: String = "frequency-sketch store"

  /** (drop_id, cfg, depth, slot, cnt) for one drop — ≤ Depth×width
    * rows. `width` sizes the error band (ε = e/width of total
    * occurrences — see [[FreqSketch.Width]] for the scale guidance) and
    * is stamped into cfg so serves derive their probe hashing from it.
    */
  def partials(docs: DataFrame, dropId: String, textCol: String = "text",
               gram: Int = 3, width: Int = FreqSketch.Width): DataFrame = {
    requireDropId(dropId)
    FreqSketch.counters(FreqSketch.grams(docs, textCol, gram), width = width)
      .select(lit(dropId).as("drop_id"),
        lit(FreqSketch.cfgOf(gram, width)).as("cfg"),
        col("depth"), col("slot"), col("cnt"))
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

  private def gramOf(cfg: String): Int = cfg.drop(1).takeWhile(_ != '-').toInt

  private def widthOf(cfg: String): Int =
    cfg.split('-').find(_.startsWith("w")).get.drop(1).toInt

  /** The width this store's counters were built at — the stamp every
    * serve/append derives its hashing from, exposed so the CLI's
    * `--freq-width` knob can refuse a contradicting append loudly.
    */
  def storedWidth(s: SparkSession, storeDir: String): Int =
    widthOf(storedCfg(s, storeDir))

  /** The store's EXACT total gram-occurrence count, from stored rows
    * only: every occurrence contributes 1 to exactly one slot of each
    * depth row, so one depth row's Σcnt is the total (and unlearned
    * occurrences subtract out). The `totalOccurrences` input
    * [[FreqSketch.deriveWidth]] wants on an append-time re-derivation —
    * drops×width stored rows in, one long out, the corpus never read.
    */
  def storedTotal(s: SparkSession, storeDir: String): Long =
    serveCounters(s, storeDir).filter(col("depth") === 0)
      .agg(coalesce(sum(col("cnt")), lit(0L))).collect().head.getLong(0)

  /** Bootstrap from the first drop (overwrites). The width chosen here
    * is the STORE's width for life — appends inherit it from the stamp.
    */
  def build(docs: DataFrame, storeDir: String, dropId: String,
            textCol: String = "text", gram: Int = 3,
            width: Int = FreqSketch.Width): Unit =
    buildStaged(docs, storeDir, dropId, textCol, gram, width)()

  def buildStaged(docs: DataFrame, storeDir: String, dropId: String,
                  textCol: String = "text", gram: Int = 3,
                  width: Int = FreqSketch.Width): () => Unit =
    stagePartialsBuild(partials(docs, dropId, textCol, gram, width),
      storeDir, coalesceTo = Some(1)).commit

  /** Append a new drop's counters (staged, single-rename atomic
    * commit). Refuses a stored id and inherits the store's gram config —
    * a caller cannot mix counter universes.
    */
  def appendStaged(docs: DataFrame, storeDir: String,
                   dropId: String, textCol: String = "text"): () => Unit = {
    val s = docs.sparkSession
    val cfg = storedCfg(s, storeDir)
    requireNewDrop(s, storeDir, dropId)
    stagePartialsAppend(partials(docs, dropId, textCol, gramOf(cfg), widthOf(cfg)),
      storeDir, dropId, coalesceTo = Some(1)).commit
  }

  def append(docs: DataFrame, storeDir: String, dropId: String,
             textCol: String = "text"): Unit =
    appendStaged(docs, storeDir, dropId, textCol)()

  /** Served counter table: (depth, slot, cnt) sum-merged across
    * surviving drops — exactly [[FreqSketch.counters]] of the union
    * corpus (q192's gate). drops×4096 stored rows in, ≤ 4096 out.
    */
  def serveCounters(s: SparkSession, storeDir: String): DataFrame = {
    storedCfg(s, storeDir) // existence + non-drained + single-cfg
    load(s, storeDir).groupBy(col("depth"), col("slot"))
      .agg(sum(col("cnt")).as("cnt"))
      // subtraction can zero a slot no other drop holds; from-scratch
      // counters never emit an unoccupied slot, so neither does serve
      .filter(col("cnt") =!= 0L)
  }

  /** Point estimates for a probe workload served from the store —
    * (term, est): the corpus never appears, only drops×4096 stored rows
    * and the workload itself ([[FreqSketch.estimates]]'s plan).
    */
  def serveEstimates(s: SparkSession, probes: DataFrame, storeDir: String,
                     termCol: String = "term"): DataFrame =
    FreqSketch.estimates(serveCounters(s, storeDir), probes, termCol,
      width = widthOf(storedCfg(s, storeDir)))

  /** The FREQUENCY-DRIFT monitor: per-drop point estimates for a probe
    * workload, answered from stored partials only — (drop_id, term,
    * est, drop_occ, est_ppm), where est is the term's Count-Min
    * estimate WITHIN that drop (a drop's stored rows ARE its own
    * sketch — partials are per-drop by construction), drop_occ is the
    * drop's total gram occurrences (Σ cnt over one depth row — exact,
    * also from stored rows), and est_ppm = est·10⁶ div drop_occ
    * normalizes away drop size so "is 'click here to subscribe'
    * exploding in this week's crawl?" reads directly across drops of
    * different sizes. Plan: W probes × Depth × drops rows against the
    * broadcast drops×4096 stored table — the corpus never appears.
    */
  def driftEstimates(s: SparkSession, probes: DataFrame, storeDir: String,
                     termCol: String = "term"): DataFrame = {
    import s.implicits._
    val width = widthOf(storedCfg(s, storeDir))
    val parts = load(s, storeDir)
      .select(col("drop_id"), col("depth"), col("slot"), col("cnt"))
    // the drop list comes from the LEDGER (drops() — the canonical
    // enrollment record), not from which drops happen to hold counter
    // rows: a drop whose every slot was subtracted to zero (fully
    // unlearned remainder) must still REPORT in the drift monitor — as
    // est = 0, est_ppm = 0 — not silently vanish from the output
    val dropsDf = drops(s, storeDir).toSeq.sorted.toDF("drop_id")
    // exact per-drop occurrence totals: every occurrence contributes 1
    // to exactly one slot of EACH depth row, so one row's sum is the
    // total; left-joined so a zero-mass drop totals 0, not a dropped row
    val dropTotals = dropsDf.join(
        parts.filter(col("depth") === 1L)
          .groupBy(col("drop_id")).agg(sum(col("cnt")).as("drop_occ")),
        Seq("drop_id"), "left")
      .select(col("drop_id"), coalesce(col("drop_occ"), lit(0L)).as("drop_occ"))
    val rows = (1 to FreqSketch.Depth).map(i => struct(
      lit(i.toLong).as("depth"),
      FreqSketch.slotOf(col(termCol), i, width).as("slot")))
    probes.select(col(termCol), explode(array(rows: _*)).as("ds"))
      .select(col(termCol), col("ds.depth"), col("ds.slot"))
      // drops frame is ledger-sized (one row per drop) — a k-row cross
      .crossJoin(broadcast(dropTotals.select(col("drop_id"))))
      .join(broadcast(parts), Seq("drop_id", "depth", "slot"), "left")
      .groupBy(col("drop_id"), col(termCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
      .join(broadcast(dropTotals), Seq("drop_id"))
      // zero-mass guard: est is necessarily 0 when drop_occ is 0 (no
      // counter can exceed its row total), so 0 ppm is exact, not a cap
      .withColumn("est_ppm",
        expr("CASE WHEN drop_occ = 0 THEN 0L ELSE (est * 1000000) div drop_occ END"))
  }

  /** Doc-granular EXACT unlearning by linearity — the sum-merge
    * family's answer to the removal ticket: sketch the PURGED docs
    * (one scan of the ticket's own content — never the drop's
    * remainder, never the history), subtract from the named drop's
    * stored rows, swap atomically
    * ([[graft.operators.DropLedger.replaceDropRows]]). Serve afterwards
    * ≡ a from-scratch store whose drop never contained the purged docs
    * (q193's gate) — counts are linear, so the subtraction is exact,
    * not drop-granular like the max-merge [[SketchStore]]'s. Zeroed
    * slots are dropped so the stored rows stay bit-identical to a
    * fresh partial of the remainder.
    */
  def unlearnDocs(purgedDocs: DataFrame, storeDir: String, dropId: String,
                  textCol: String = "text"): Unit = {
    val s = purgedDocs.sparkSession
    val cfg = storedCfg(s, storeDir)
    require(drops(s, storeDir).contains(dropId),
      s"drop '$dropId' is not in $kind $storeDir — nothing to unlearn")
    val neg = partials(purgedDocs, dropId, textCol, gramOf(cfg), widthOf(cfg))
      .withColumn("cnt", -col("cnt"))
    // materialized: the ≤ Depth×Width-row frame feeds both the negative
    // guard and the swap without re-scanning the purged docs
    val fresh = Dedup.materialize(load(s, storeDir)
      .filter(col("drop_id") === dropId)
      .unionByName(neg)
      .groupBy(col("drop_id"), col("cfg"), col("depth"), col("slot"))
      .agg(sum(col("cnt")).as("cnt"))
      .filter(col("cnt") =!= 0L)
      .select(col("drop_id"), col("cfg"), col("depth"), col("slot"), col("cnt")))
    // a negative survivor means the ticket named content the drop never
    // held (subtraction only inverts an ingest it mirrors) — loud, not
    // a corrupt ledger; the check reads ≤ Depth×Width rows
    val negRows = fresh.filter(col("cnt") < 0L).count()
    require(negRows == 0L,
      s"unlearnDocs for drop '$dropId' in $kind $storeDir drove $negRows " +
        "counter(s) negative — the purged docs are not a subset of what " +
        "that drop ingested; purge must mirror the original ingest rows")
    replaceDropRows(s, storeDir, dropId, fresh)
  }
}
