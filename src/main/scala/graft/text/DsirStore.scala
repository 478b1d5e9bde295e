package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted raw-pool profile for DSIR data selection ([[Dsir]]'s
  * build/serve split): each drop of raw-web documents contributes its
  * hashed-feature count profile (f, cnt), and a NEW drop is scored
  * against a ratio model whose raw side is the ENTIRE ingest history ∪
  * the drop — history text is never re-tokenized. Counts sum across
  * drops (drops partition the raw pool), so the served raw profile is
  * bit-identical to profiling the union corpus from scratch (q176's
  * gate), and takedown is EXACT UNLEARNING by subtraction: deleting a
  * drop's count rows re-derives precisely the importance model that
  * never saw that drop (q177's gate) — the same count-factored-model
  * argument as [[ClassifyStore]], here for the selection model that
  * decides which raw documents enter the corpus at all.
  *
  * Why the RAW side is what persists: the target corpus is small and
  * trusted (it fits a broadcast by the same argument as the ratio
  * table) and is supplied at serve time, while the raw pool is the
  * 100 TB side that accrues daily — its profile is the store. The
  * profile is at most `buckets` rows per drop, so store size grows with
  * DROPS, not with corpus size: the whole store scan at serve is
  * drops × buckets rows, metadata-scale next to the documents.
  *
  * Storage: one parquet table `dsirprofile` (drop_id, cfg, f, cnt) —
  * `cfg` stamps the bucket count; mismatched bucket spaces produce
  * incommensurable feature ids and would silently corrupt the
  * sum-merge, so append and serve validate it single-valued and loud
  * (the [[ChunkStore]] rule). Lifecycle is the shared
  * [[graft.operators.DropLedger]] discipline (atomic per-drop subdir
  * append, staged commit-last, crash-safe swaps, loud double-remove).
  */
object DsirStore extends graft.operators.DropLedger {

  protected def tableName: String = "dsirprofile"
  protected def kind: String = "dsir store"

  /** (drop_id, cfg, f, cnt) for one drop of raw docs. */
  def partials(docs: DataFrame, dropId: String, textCol: String = "text",
               buckets: Int = Dsir.DefaultBuckets): DataFrame = {
    requireDropId(dropId)
    Dsir.profile(docs, textCol, buckets)
      .select(lit(dropId).as("drop_id"), lit(buckets.toString).as("cfg"),
        col("f"), col("cnt"))
  }

  /** The store's bucket count — single-valued or loud; a drained store
    * (every drop removed) refuses here, the family rule.
    */
  def storedBuckets(s: SparkSession, storeDir: String): Int = {
    requireStore(s, storeDir)
    val cfgs = load(s, storeDir).select(col("cfg")).distinct()
      .collect().map(_.getString(0))
    require(cfgs.nonEmpty,
      s"$kind $storeDir has no drops (every drop was removed) — " +
        "build or append before serving")
    require(cfgs.length == 1,
      s"$kind $storeDir holds mixed bucket configs " +
        s"${cfgs.sorted.mkString(", ")} — corrupt")
    cfgs.head.toInt
  }

  /** Bootstrap from the first drop (overwrites). */
  def build(docs: DataFrame, storeDir: String, dropId: String,
            textCol: String = "text",
            buckets: Int = Dsir.DefaultBuckets): Unit =
    buildStaged(docs, storeDir, dropId, textCol, buckets)()

  def buildStaged(docs: DataFrame, storeDir: String, dropId: String,
                  textCol: String = "text",
                  buckets: Int = Dsir.DefaultBuckets): () => Unit =
    stagePartialsBuild(partials(docs, dropId, textCol, buckets),
      storeDir, coalesceTo = Some(1)).commit

  /** Append a new drop's profile (staged, single-rename atomic commit).
    * Refuses a stored id (sum-merge) and inherits the store's bucket
    * count — a caller cannot introduce a mismatched feature space.
    */
  def appendStaged(docs: DataFrame, storeDir: String,
                   dropId: String, textCol: String = "text"): () => Unit = {
    val s = docs.sparkSession
    val buckets = storedBuckets(s, storeDir)
    requireNewDrop(s, storeDir, dropId)
    stagePartialsAppend(partials(docs, dropId, textCol, buckets),
      storeDir, dropId, coalesceTo = Some(1)).commit
  }

  def append(docs: DataFrame, storeDir: String, dropId: String,
             textCol: String = "text"): Unit =
    appendStaged(docs, storeDir, dropId, textCol)()

  /** Merged raw profile: (f, cnt) summed across surviving drops —
    * exactly [[Dsir.profile]] of the union raw pool.
    */
  def serveProfile(s: SparkSession, storeDir: String): DataFrame = {
    storedBuckets(s, storeDir) // existence + non-drained + single-cfg
    load(s, storeDir).groupBy(col("f")).agg(sum(col("cnt")).as("cnt"))
  }

  /** Score a new drop against target ∪ (history ∪ drop) — bit-identical
    * to [[Dsir.score]](target, union raw pool) restricted to the drop's
    * docs (the q176 gate; q177 re-gates after a takedown): the raw side
    * of every ratio counts the full surviving history PLUS the drop
    * itself, from one drops×buckets-row store scan. Read-only;
    * [[append]] the drop separately once accepted.
    *
    * The drop's exploded features feed its own profile AND the score
    * join; `eager` materializes them once (the store-serve convention:
    * programmatic callers keep the default, the SQL TVF passes false so
    * EXPLAIN stays plan-only).
    */
  def scoreVsDrop(target: DataFrame, newDocs: DataFrame, storeDir: String,
                  idCol: String = "doc_id", textCol: String = "text",
                  eager: Boolean = true): DataFrame = {
    val s = newDocs.sparkSession
    val buckets = storedBuckets(s, storeDir)
    val feats0 = Dsir.explodedFeatures(newDocs, idCol, textCol, buckets)
    val feats = if (eager) Dedup.materialize(feats0) else feats0
    val raw = serveProfile(s, storeDir)
      .unionByName(feats.groupBy(col("f")).agg(count(lit(1)).as("cnt")))
      .groupBy(col("f")).agg(sum(col("cnt")).as("cnt"))
    Dsir.scoreFeatures(feats,
      Dsir.ratios(Dsir.profile(target, textCol, buckets), raw), idCol)
  }
}
