package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid retrieval by Reciprocal-Rank Fusion (Cormack, Clarke &
  * Büttcher, SIGIR 2009): fuse a lexical top-k list and a vector top-k
  * list into one ranking by summed reciprocal ranks, Σ 1/(c + rank) —
  * the standard RAG-stack move that needs no score calibration between
  * legs (BM25 ppt and cosine are incommensurable; RANKS fuse cleanly).
  * The engine's rational surrogate applies as everywhere
  * ([[Dsir]]/[[Classify]]/[[Retrieval]]): each reciprocal becomes the
  * exact integer `10^9 div (c + rank)`, so the fused score and the
  * final ordering hash-gate against the oracle. The relative error of
  * the surrogate is < 10^-7 per term (c + rank ≤ ~70 at gated k), far
  * below any rank-flip threshold; ties break by doc_id ASC,
  * deterministic across engines.
  *
  * 100 TB shape: fusion itself touches only WORKLOAD-sized frames —
  * each leg is queries × k rows, so the full-outer rank join and the
  * per-query re-rank cost nothing at any corpus size. The corpus-scale
  * work lives in the LEGS, each with its own scale path already gated:
  * BM25 is a postings equi-join + bounded-heap top-k (q164, MaxScore-
  * pruned q173, store-served q165); the vector leg here is the exact
  * brute-force baseline (the q27/q45 labeled-recall discipline), and
  * production swaps in the IVF index serve (q50/q134) or LSH (q29) —
  * same (query_id, doc_id, rank) contract, so the fusion is
  * leg-agnostic by construction.
  */
object Hybrid {

  /** The standard RRF constant (the SIGIR 2009 paper's k = 60). */
  val RrfC = 60

  /** Rank a scored leg into (key, ..., rankCol ≤ k): row_number over
    * `order` within `key`. The window partitions by query over a frame
    * that is already per-query bounded (a top-k list or a probe × corpus
    * score set the caller has reduced) — for corpus-sized score sets
    * prefer [[graft.operators.Relational.topKPerKey]] first and rank the
    * k-row result.
    */
  def addRank(leg: DataFrame, key: Column, order: Seq[Column],
              rankCol: String, k: Int): DataFrame =
    leg.withColumn(rankCol,
        row_number().over(Window.partitionBy(key).orderBy(order: _*)))
      .filter(col(rankCol) <= k)

  /** Fuse two rank lists — `lex` (query_id, doc_id, lex_rank), `vec`
    * (query_id, doc_id, vec_rank) — into the RRF top-k:
    * (query_id, doc_id, lex_rank, vec_rank, rrf_ppb, rank). A doc on
    * only one list contributes that leg's term alone (its other rank is
    * NULL — reported, not imputed: "found by both" vs "found by one" is
    * signal). Candidates per query ≤ 2k, so the re-rank window is
    * workload-bounded.
    */
  def rrfFuse(lex: DataFrame, vec: DataFrame, k: Int,
              c: Int = RrfC): DataFrame = {
    val fused = lex.select(col("query_id"), col("doc_id"), col("lex_rank"))
      .join(vec.select(col("query_id"), col("doc_id"), col("vec_rank")),
        Seq("query_id", "doc_id"), "full_outer")
      .withColumn("rrf_ppb",
        expr(s"coalesce(1000000000 div ($c + lex_rank), 0L) + " +
          s"coalesce(1000000000 div ($c + vec_rank), 0L)"))
    fused.withColumn("rank",
        row_number().over(Window.partitionBy(col("query_id"))
          .orderBy(col("rrf_ppb").desc, col("doc_id").asc)))
      .filter(col("rank") <= k)
  }

  /** Known-item evaluation of one ranked system: each query's relevant
    * doc is the probe it was derived from (doc_id = query_id — the
    * standard self-retrieval diagnostic), so retrieval quality is a
    * measured fact with NO labeled judgments needed. One row:
    * (system, n_queries, n_found, mrr_ppb) with the reciprocal rank as
    * the exact integer `10^9 div rank` (missing-at-k contributes 0) and
    * MRR its integer mean — rational metrics only (MRR/found@k, not
    * NDCG, whose log2 discount has no exact surrogate). Workload-sized
    * end to end: `probes` is the query list, `ranked` a top-k frame.
    */
  def selfEval(probes: DataFrame, ranked: DataFrame,
               system: String): DataFrame =
    probes.join(
        ranked.filter(col("doc_id") === col("query_id"))
          .select(col("query_id"), col("rank")),
        Seq("query_id"), "left")
      .agg(count(lit(1)).as("n_queries"), count(col("rank")).as("n_found"),
        sum(coalesce(expr("1000000000 div rank"), lit(0L))).as("__rr"))
      .select(lit(system).as("system"), col("n_queries"), col("n_found"),
        expr("__rr div n_queries").as("mrr_ppb"))
}
