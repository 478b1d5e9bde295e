package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted gram-OWNERSHIP store for first-occurrence novelty scoring
  * (q126's build/serve split): each corpus drop contributes one
  * (gram key → min doc_id) partial; the corpus-wide owner of a gram is
  * the MIN over the stored partials — so a new drop's novelty against
  * the ENTIRE ingest history costs one store scan plus the drop's own
  * grams, with the historical corpus never re-tokenized.
  *
  * Min is the third merge discipline in the store family, after sum
  * (`LmStore` counts) and union/register-max (`ProfileStore` buckets/
  * HLL): min-of-mins over per-drop partials is EXACTLY the min over the
  * union, so store-served novelty is bit-identical to the from-scratch
  * q126 computation on corpus ∪ drop (the q147 gate replays exactly
  * that). Unlike a sum, min is also idempotent — a double-appended drop
  * could not CORRUPT the answer — but the drop-id refusal is kept
  * anyway: the ledger of ingested drops must stay truthful for
  * [[removeDrop]] to mean anything, and duplicate partials bloat the
  * serve scan for nothing.
  *
  * Takedown ([[removeDrop]]) is exact for the same reason the profile
  * store's is: the stored rows are PER-DROP partials, so deleting a
  * drop's rows makes the serve re-min over what remains — a gram whose
  * only owner was the removed drop disappears entirely (novel again for
  * whoever writes it next), and a gram the removed drop merely tied on
  * falls back to the surviving drops' min. A corpus-level rollup (one
  * global min per gram) could not un-see a drop without rescanning the
  * corpus; per-drop partials can (q148's gate proves it).
  *
  * Storage: one parquet table `grams` (drop_id, gk, first_doc) — gk the
  * 16-hex-char md5 prefix of the word-3-gram shingle (q126's key), one
  * row per DISTINCT gram per drop (gram-type sized, Zipf ≪ tokens).
  * Serve is one partial/final min-aggregation partitioned by gk.
  * Lifecycle (atomic per-drop appends, crash-loud exists, staged
  * commits, takedown/compaction swaps) is the shared
  * [[graft.operators.DropLedger]] discipline.
  */
object GramStore extends graft.operators.DropLedger {

  protected def tableName: String = "grams"
  protected def kind: String = "gram store"

  def gramsPath(storeDir: String): String = tablePath(storeDir)

  /** (drop_id, gk, first_doc): the drop's per-gram minimum doc id — the
    * same shingle set + key as q126 (`TextOps.shingleSet(words, 3)` with
    * the <3-word self-shingle fallback, md5-prefix key).
    */
  def partials(docs: DataFrame, dropId: String, idCol: String = "doc_id",
               textCol: String = "text"): DataFrame = {
    requireDropId(dropId)
    gramRows(docs, idCol, textCol)
      .groupBy(col("gk")).agg(min(col("doc_id")).as("first_doc"))
      .select(lit(dropId).as("drop_id"), col("gk"), col("first_doc"))
  }

  /** (doc_id, gk) rows of a frame — one per (doc, distinct gram). */
  private def gramRows(docs: DataFrame, idCol: String,
                       textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        explode(TextOps.shingleSet(TextOps.words(col(textCol)), 3)).as("g"))
      .select(col("doc_id"), substring(md5(col("g")), 1, 16).as("gk"))

  /** Bootstrap from the first drop (overwrites). */
  def build(docs: DataFrame, storeDir: String, dropId: String,
            idCol: String = "doc_id", textCol: String = "text"): Unit =
    buildStaged(docs, storeDir, dropId, idCol, textCol)()

  /** [[build]] split compute-now / commit-later (`text.Store`'s
    * crash-retry discipline).
    */
  def buildStaged(docs: DataFrame, storeDir: String, dropId: String,
                  idCol: String = "doc_id",
                  textCol: String = "text"): () => Unit =
    stagePartialsBuild(partials(docs, dropId, idCol, textCol), storeDir).commit

  /** Append a new drop's gram partials (staged, single-rename atomic
    * commit; refuses a stored id — see the scaladoc on why despite min's
    * idempotence).
    */
  def appendStaged(docs: DataFrame, storeDir: String, dropId: String,
                   idCol: String = "doc_id",
                   textCol: String = "text"): () => Unit = {
    val s = docs.sparkSession
    requireStore(s, storeDir)
    requireNewDrop(s, storeDir, dropId)
    stagePartialsAppend(partials(docs, dropId, idCol, textCol),
      storeDir, dropId).commit
  }

  def append(docs: DataFrame, storeDir: String, dropId: String,
             idCol: String = "doc_id", textCol: String = "text"): Unit =
    appendStaged(docs, storeDir, dropId, idCol, textCol)()

  /** The corpus-wide gram ownership: (gk, first_doc) with first_doc the
    * min over every stored drop — exactly the `first` table q126 builds
    * from a full corpus scan, served from gram-type-sized partials.
    */
  def serveOwnership(s: SparkSession, storeDir: String): DataFrame = {
    requireStore(s, storeDir)
    load(s, storeDir).groupBy(col("gk"))
      .agg(min(col("first_doc")).as("first_doc"))
  }

  /** Per-doc novelty of a NEW drop against the stored history ∪ the drop
    * itself — bit-identical to running q126 on the union corpus and
    * keeping the drop's rows (the q147 gate): a doc's gram is novel iff
    * the doc IS the global first owner, where the global owner is the
    * min of the stored owner (if any) and the drop's own first writer.
    * Output: (doc_id, n_grams, n_novel, novelty_ppt) — exact integers.
    *
    * Scale shape: the drop's gram rows join the stored ownership on gk
    * (both sides hash-partition on the gram key; the stored side is
    * gram-TYPE sized) — the history is never re-tokenized, and nothing
    * here mutates the store: scoring a candidate drop is read-only;
    * [[append]] it only once it's accepted.
    *
    * Ownership is MIN doc_id (q126's rule, replayed faithfully), so a
    * drop doc with a smaller id than a historical owner takes the gram
    * over. For "history always owns what it saw first" semantics,
    * assign ingest-ordered (monotonic) doc ids across drops — the
    * natural scheme for a daily pipeline, and the one the CLI's
    * dense-id path produces.
    */
  def noveltyOfDrop(newDocs: DataFrame, storeDir: String,
                    idCol: String = "doc_id",
                    textCol: String = "text",
                    eager: Boolean = true): DataFrame = {
    val s = newDocs.sparkSession
    // rows feeds two plan branches (drop-first agg + the final join);
    // eager=false is the SQL-TVF path — analysis must not run a job, and
    // a .cache() here would outlive the query (nothing ever unpersists a
    // TVF's plan), accumulating blocks for the session's lifetime. The
    // TVF path therefore recomputes the drop's grams per branch (two
    // scans of the NEW drop only — the store side is never re-derived).
    val rows0 = gramRows(newDocs, idCol, textCol)
    val rows = if (eager) Dedup.materialize(rows0) else rows0
    val dropFirst = rows.groupBy(col("gk")).agg(min(col("doc_id")).as("drop_first"))
    val stored = serveOwnership(s, storeDir)
      .select(col("gk"), col("first_doc").as("stored_first"))
    val owner = dropFirst.join(stored, Seq("gk"), "left")
      .select(col("gk"),
        least(col("drop_first"), coalesce(col("stored_first"), col("drop_first")))
          .as("first_doc"))
    rows.join(owner, "gk")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("doc_id") === col("first_doc"), 1L).otherwise(0L))
          .as("n_novel"))
      .withColumn("novelty_ppt", expr("(n_novel * 1000) div n_grams"))
  }
}
