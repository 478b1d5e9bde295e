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
  * Corpus-level stats (df, N, Σdl) are cheap aggregates of the store scan
  * the serve already pays for; a production deployment at 10^11 docs would
  * sidecar them per drop, which composes with this layout (sum-merge)
  * without changing the stored table.
  *
  * No tunable configuration is stamped: the only "config" is the
  * tokenization (corpus-contract whitespace words, [[TextOps.words]]),
  * fixed by construction — there is no cross-drop mismatch to validate,
  * unlike [[ChunkStore]]'s (k, divisor).
  */
object PostingsStore extends graft.operators.DropLedger {

  protected def tableName: String = "postings"
  protected def kind: String = "postings store"

  /** (drop_id, doc_id, term, tf, dl) for one drop. Doc ids must be
    * disjoint across drops (the store partitions the corpus by doc — the
    * same contract every sum-merge family carries).
    */
  def partials(docs: DataFrame, dropId: String, idCol: String = "doc_id",
               textCol: String = "text"): DataFrame = {
    requireDropId(dropId)
    Retrieval.postings(docs, idCol, textCol)
      .select(lit(dropId).as("drop_id"), col("doc_id"), col("term"),
        col("tf"), col("dl"))
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
    load(s, storeDir).select(col("doc_id"), col("term"), col("tf"), col("dl"))
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
    val post = Dedup.materialize(
      servePostings(s, storeDir)
        .unionByName(Retrieval.postings(newDocs, idCol, textCol)))
    Retrieval.bm25TopK(post,
      Retrieval.queriesFor(post, Retrieval.docFreq(post), probe, qTerms),
      k, eager = false)
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
    Retrieval.bm25TopK(
      servePostings(s, storeDir)
        .unionByName(Retrieval.postings(newDocs, idCol, textCol)),
      queries, k, eager = eager)
  }
}
