package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted inverted index for BM25 retrieval ([[Retrieval]]'s build/serve
  * split): each drop contributes its postings rows (doc_id, term, tf, dl),
  * and a NEW drop is searched against the ENTIRE ingest history ∪ the drop
  * from one store scan — history text is never re-tokenized. The merge is
  * a plain UNION (drops partition the corpus by doc, so posting rows are
  * disjoint; df / N / Σdl re-aggregate from the union exactly), which makes
  * takedown trivially exact: deleting a drop's rows IS the never-ingested
  * index. Lifecycle is the shared [[graft.operators.DropLedger]]
  * discipline (atomic per-drop subdir append, staged commit-last,
  * crash-safe swaps, loud double-remove).
  *
  * Why postings rows and not pre-merged (term, df) partials: retrieval
  * needs per-(doc, term) tf at serve time — the index IS the partial.
  * Corpus-level stats (df, N, Σdl) are SIDECARED per drop as extra rows
  * in the SAME table, tagged `doc_id IS NULL` (term rows carry the
  * drop's per-term df in `tf` and Σtf in `dl`; one `term IS NULL` row
  * carries the drop's doc count in `tf` and token count in `dl`). One
  * table keeps the lifecycle's single-rename atomicity — a drop's
  * postings and its stats commit, and are taken down, together; the
  * sum-merge of stats across drops is exact because drops partition the
  * corpus by doc. Parquet's null-count file statistics make the split
  * free at scan time: the serve's stats aggregate pushes IsNull(doc_id)
  * and skips every all-postings file at the footer, and
  * [[servePostings]]'s IsNotNull(doc_id) skips the stats files — so at
  * 10^11 docs the corpus stats come from drop-count-sized partials, not
  * a full store re-aggregation. A pre-sidecar store (no stats rows)
  * serves by falling back to aggregating the postings; a mixed store
  * (legacy drops + sidecar drops) falls back too — stats are used only
  * when EVERY surviving drop carries them ([[serveStats]]).
  *
  * No tunable configuration is stamped: the only "config" is the
  * tokenization (corpus-contract whitespace words, [[TextOps.words]]),
  * fixed by construction — there is no cross-drop mismatch to validate,
  * unlike [[ChunkStore]]'s (k, divisor).
  */
object PostingsStore extends graft.operators.DropLedger {

  protected def tableName: String = "postings"
  protected def kind: String = "postings store"

  /** (drop_id, doc_id, term, tf, dl) for one drop — the drop's postings
    * plus its stats-sidecar rows (see the class doc for the tagging).
    * Doc ids must be disjoint across drops (the store partitions the
    * corpus by doc — the same contract every sum-merge family carries).
    */
  def partials(docs: DataFrame, dropId: String, idCol: String = "doc_id",
               textCol: String = "text"): DataFrame = {
    requireDropId(dropId)
    val post = Dedup.materialize( // one tokenize feeds rows + both stats
      Retrieval.postings(docs, idCol, textCol))
    val rows = post.select(lit(dropId).as("drop_id"), col("doc_id"),
      col("term"), col("tf"), col("dl"))
    val termStats = post.groupBy(col("term"))
      .agg(count(lit(1)).as("df"), sum(col("tf")).as("tfs"))
      .select(lit(dropId).as("drop_id"), lit(null).cast("long").as("doc_id"),
        col("term"), col("df").as("tf"), col("tfs").as("dl"))
    val totals = Retrieval.corpusTotals(post)
      .select(lit(dropId).as("drop_id"), lit(null).cast("long").as("doc_id"),
        lit(null).cast("string").as("term"), col("n").as("tf"),
        col("t").as("dl"))
    rows.unionByName(termStats).unionByName(totals)
  }

  /** Bootstrap from the first drop (overwrites). */
  def build(docs: DataFrame, storeDir: String, dropId: String,
            idCol: String = "doc_id", textCol: String = "text"): Unit =
    buildStaged(docs, storeDir, dropId, idCol, textCol)()

  def buildStaged(docs: DataFrame, storeDir: String, dropId: String,
                  idCol: String = "doc_id",
                  textCol: String = "text"): () => Unit =
    stagePartialsBuild(partials(docs, dropId, idCol, textCol), storeDir).commit

  /** Append a new drop's postings (staged, single-rename atomic commit).
    * Refuses a stored id — re-appending would double the drop's postings
    * under the union merge.
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

  /** The merged index: (doc_id, term, tf, dl) across all surviving drops —
    * exactly [[Retrieval.postings]] of the union corpus.
    */
  def servePostings(s: SparkSession, storeDir: String): DataFrame = {
    requireStore(s, storeDir)
    // A drained store (every drop removed) serves nothing — refusing is
    // the family rule: a silent empty history would mask a takedown bug
    // as "no candidates retrieved".
    require(drops(s, storeDir).nonEmpty,
      s"$kind $storeDir has no drops (every drop was removed) — " +
        "build or append before serving")
    postingsOf(s, storeDir)
  }

  // IsNotNull(doc_id) reaches the parquet footers: stats-only files
  // (every doc_id null) are skipped wholesale
  private def postingsOf(s: SparkSession, storeDir: String): DataFrame =
    load(s, storeDir).filter(col("doc_id").isNotNull)
      .select(col("doc_id"), col("term"), col("tf"), col("dl"))

  /** ONE metadata-sized job answering both ledger questions a serve asks:
    * which drops survive, and which of them carry sidecar totals. The
    * scan touches three columns (drop_id dictionary + two null flags) —
    * never tf/dl data pages.
    */
  private def dropsAndStats(s: SparkSession,
                            storeDir: String): (Set[String], Set[String]) = {
    val rows = load(s, storeDir).groupBy(col("drop_id"))
      .agg(max(col("doc_id").isNull && col("term").isNull).as("has_stats"))
      .collect()
    (rows.map(_.getString(0)).toSet,
      rows.filter(_.getBoolean(1)).map(_.getString(0)).toSet)
  }

  // (df, totals) frames from the sidecar rows; IsNull(doc_id) prunes the
  // scan to stats files at the footer level
  private def statsFrames(s: SparkSession,
                          storeDir: String): (DataFrame, DataFrame) = {
    val stats = load(s, storeDir).filter(col("doc_id").isNull)
    (stats.filter(col("term").isNotNull).groupBy(col("term"))
       .agg(sum(col("tf")).as("df")),
     stats.filter(col("term").isNull)
       .agg(sum(col("tf")).as("n"), sum(col("dl")).as("t")))
  }

  /** The store's corpus statistics from the per-drop sidecar rows:
    * (term, df) and a one-row (n, t), sum-merged across surviving drops —
    * `None` when any surviving drop predates the sidecar (mixed stats
    * would under-count; the caller falls back to aggregating the
    * postings).
    */
  def serveStats(s: SparkSession, storeDir: String): Option[(DataFrame, DataFrame)] = {
    requireStore(s, storeDir)
    val (all, withStats) = dropsAndStats(s, storeDir)
    if (withStats != all) None else Some(statsFrames(s, storeDir))
  }

  /** BM25 top-k of queries derived from a new drop's probe docs, searched
    * over history ∪ drop — bit-identical to [[Retrieval.bm25TopKFor]] on
    * the union corpus (the q165 gate): df, N, Σdl and the candidate lists
    * all come from the merged index plus the drop's own postings; the
    * history side is one store scan. Read-only; [[append]] the drop
    * separately once accepted.
    */
  def bm25TopKVsDrop(newDocs: DataFrame, storeDir: String, probe: Column,
                     k: Int = Retrieval.TopK,
                     qTerms: Int = Retrieval.QueryTerms,
                     idCol: String = "doc_id",
                     textCol: String = "text"): DataFrame = {
    val s = newDocs.sparkSession
    requireStore(s, storeDir)
    val (all, withStats) = dropsAndStats(s, storeDir) // one metadata job
    require(all.nonEmpty,
      s"$kind $storeDir has no drops (every drop was removed) — " +
        "build or append before serving")
    if (withStats == all) {
      // stats path: df/N/Σdl come from the drop-sized sidecar partials
      // plus the drop's own aggregates — the full store scan is paid
      // only by the term-pruned score join and the probe-pruned query
      // derivation, never by a corpus-stats re-aggregation, so nothing
      // corpus-sized is checkpointed
      val dropPost = Dedup.materialize(
        Retrieval.postings(newDocs, idCol, textCol))
      val (storeDf, storeTot) = statsFrames(s, storeDir)
      val df = storeDf.unionByName(Retrieval.docFreq(dropPost))
        .groupBy(col("term")).agg(sum(col("df")).as("df"))
      val totals = storeTot.unionByName(Retrieval.corpusTotals(dropPost)
          .select(col("n"), col("t")))
        .agg(sum(col("n")).as("n"), sum(col("t")).as("t"))
      val post = postingsOf(s, storeDir).unionByName(dropPost)
      Retrieval.bm25TopKWith(post, df, totals,
        Retrieval.queriesFor(post, df, probe, qTerms), k)
    } else { // pre-sidecar store: aggregate stats from the postings
      val post = Dedup.materialize(
        postingsOf(s, storeDir)
          .unionByName(Retrieval.postings(newDocs, idCol, textCol)))
      Retrieval.bm25TopK(post,
        Retrieval.queriesFor(post, Retrieval.docFreq(post), probe, qTerms),
        k, eager = false)
    }
  }

  /** [[bm25TopKVsDrop]] with a caller-supplied (query_id, term) workload
    * instead of derived more-like-this probes — the SQL-TVF face, where
    * the query set is a table, not a predicate. The TVF passes
    * `eager = false` (the file-wide TVF convention: no checkpoint job at
    * SQL analysis time — EXPLAIN must stay plan-only); programmatic
    * callers keep the default, which materializes the merged postings once
    * for their three consumers (df, totals, score join).
    */
  def bm25ForQueriesVsDrop(newDocs: DataFrame, storeDir: String,
                           queries: DataFrame, k: Int = Retrieval.TopK,
                           idCol: String = "doc_id",
                           textCol: String = "text",
                           eager: Boolean = true): DataFrame = {
    val s = newDocs.sparkSession
    requireStore(s, storeDir)
    val (all, withStats) = dropsAndStats(s, storeDir) // one metadata job
    require(all.nonEmpty,
      s"$kind $storeDir has no drops (every drop was removed) — " +
        "build or append before serving")
    if (withStats == all) {
      val dropPost =
        if (eager) Dedup.materialize(Retrieval.postings(newDocs, idCol, textCol))
        else Retrieval.postings(newDocs, idCol, textCol)
      val (storeDf, storeTot) = statsFrames(s, storeDir)
      val df = storeDf.unionByName(Retrieval.docFreq(dropPost))
        .groupBy(col("term")).agg(sum(col("df")).as("df"))
      val totals = storeTot.unionByName(Retrieval.corpusTotals(dropPost)
          .select(col("n"), col("t")))
        .agg(sum(col("n")).as("n"), sum(col("t")).as("t"))
      Retrieval.bm25TopKWith(
        postingsOf(s, storeDir).unionByName(dropPost), df, totals,
        queries, k)
    } else {
      Retrieval.bm25TopK(
        postingsOf(s, storeDir)
          .unionByName(Retrieval.postings(newDocs, idCol, textCol)),
        queries, k, eager = eager)
    }
  }
}
