package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Bottom-k (KMV) uniform document sample — "show me k uniformly
  * random docs of the 100 TB corpus" as a DETERMINISTIC, mergeable,
  * engine-portable order statistic (Bar-Yossef et al. 2002's k-minimum
  * values, used here for the sample itself rather than the distinct
  * estimate the HLL family already owns).
  *
  * The primitive: h(doc) = the first 15 md5 hex chars of the doc_id as
  * a 60-bit integer — a fixed pseudo-random total order over documents
  * (exactly `('0x'||substr(md5(CAST(doc_id AS VARCHAR)),1,15))::BIGINT`
  * in DuckDB, so the sample hash-gates with no tolerance). The sample
  * is the k smallest h values: a uniform without-replacement draw
  * under the hash order, reproducible run-to-run and engine-to-engine
  * — the [[graft.operators.Sampling]] determinism discipline applied
  * to an order statistic instead of a threshold.
  *
  * Why an engine needs it persisted: evals, labeling batches, quality
  * spot-checks and drift audits all want "a random slice of everything
  * we have ingested so far" — and re-drawing it from raw data is a
  * full-corpus scan per audit. Bottom-k is MERGEABLE: every member of
  * the union's bottom-k has, within its own slice, rank ≤ its global
  * rank ≤ k, so the union's bottom-k ⊆ the union of per-slice
  * bottom-k's — [[SampleStore]] keeps k rows per drop and serves the
  * history's exact sample from drops×k stored rows, the corpus never
  * re-read. (The same subset argument makes drop REMOVAL exact: see
  * the store's takedown note.)
  *
  * Two properties the queries exploit:
  *  - NESTED: the rank-j prefix of a bottom-k sample is itself the
  *    exact bottom-j sample — one stored sample serves every size ≤ k.
  *  - STATS-READY: each row carries its token count at ingest, so a
  *    sample-estimated corpus statistic ([[auditMeanTokens]]) reads k
  *    stored rows; the exact column next to it is the deliberate audit
  *    cost (the q178/q191 discipline).
  *
  * The reference has no sampling surface (daas-apps
  * `SparkCaller.java:125-344` is file-level scatter/gather); this
  * extends SURVEY.md §2's LLM-pipeline set alongside the hash
  * per-mille sampler (q62) and the weighted/stratified samplers
  * (q90/q71).
  */
object KmvSample {

  /** Default sample size — k rows per drop in the store. */
  val K: Int = 128

  /** The 60-bit hash order over documents: first 15 md5 hex chars of
    * the id rendered in decimal. Positive, collision-free in practice
    * (2^60 space), and replayed bit-identically by DuckDB.
    */
  def hashOf(id: Column): Column =
    conv(substring(md5(id.cast("string")), 1, 15), 16, 10).cast("long")

  /** The bottom-k sample of a corpus: (rank, hv, doc_id, lang,
    * n_tokens) — the k smallest hash values with a total (hv, doc_id)
    * tie-break. Plan: one map-side projection, then
    * TakeOrderedAndProject (per-partition bounded heap + a k-row
    * gather) — no global sort at any corpus size; the rank window runs
    * AFTER the cut, over exactly k rows.
    */
  def sample(docs: DataFrame, k: Int = K): DataFrame = {
    // lang is payload, not contract: a corpus without it samples with a
    // NULL lang column instead of refusing (CLI corpora vary)
    val lang = if (docs.columns.contains("lang")) col("lang")
               else lit(null).cast("string").as("lang")
    withRank(graft.operators.Relational.topK(
      docs.select(
        hashOf(col("doc_id")).as("hv"), col("doc_id"), lang.as("lang"),
        size(TextOps.words(col("text"))).cast("long").as("n_tokens")),
      k, col("hv").asc, col("doc_id").asc))
  }

  /** Rank 1..k over an ALREADY-CUT k-row frame (the single-partition
    * window is k-bounded by contract — corpus-sized callers must cut
    * with topK first).
    */
  private[graft] def withRank(cut: DataFrame): DataFrame =
    cut.withColumn("rank", row_number().over(
        Window.orderBy(col("hv").asc, col("doc_id").asc)).cast("long"))
      .select(col("rank"), col("hv"), col("doc_id"), col("lang"),
        col("n_tokens"))

  /** Sample-estimated vs exact corpus mean tokens per doc, one row:
    * (sample_k, n_docs, est_mean_tokens_x1000, exact_mean_tokens_x1000,
    * err_pml) — every column exact integer arithmetic (milli-token
    * units; err relative to the exact mean, integer per-mille). The
    * estimate reads the k sample rows ONLY (their n_tokens payload was
    * carried at ingest); the exact side re-scans the corpus — the
    * deliberate audit cost that measures the sampling error instead of
    * assuming the √k bound.
    */
  /** [[auditMeanTokens]] per STRATUM: one row per language — (lang,
    * sample_k, n_docs, est_mean_tokens_x1000, exact_mean_tokens_x1000,
    * err_pml) — the per-language drift monitor a stratified store
    * serves for k×strata stored rows ("German docs suddenly average
    * half the tokens" is invisible in the global mean). Same integer
    * arithmetic; the join is strata-sized on both sides.
    */
  def auditMeanTokensByLang(sample: DataFrame, docs: DataFrame): DataFrame = {
    val est = sample.groupBy(col("lang")).agg(
      count(lit(1)).as("sample_k"), sum(col("n_tokens")).as("__st"))
    val exact = docs.groupBy(col("lang")).agg(
      count(lit(1)).as("n_docs"),
      sum(size(TextOps.words(col("text"))).cast("long")).as("__ct"))
    est.join(broadcast(exact), Seq("lang"))
      .withColumn("est_mean_tokens_x1000", expr("(__st * 1000) div sample_k"))
      .withColumn("exact_mean_tokens_x1000", expr("(__ct * 1000) div n_docs"))
      .withColumn("err_pml",
        expr("(abs(est_mean_tokens_x1000 - exact_mean_tokens_x1000) " +
          "* 1000) div exact_mean_tokens_x1000"))
      .select(col("lang"), col("sample_k"), col("n_docs"),
        col("est_mean_tokens_x1000"), col("exact_mean_tokens_x1000"),
        col("err_pml"))
  }

  def auditMeanTokens(sample: DataFrame, docs: DataFrame): DataFrame = {
    val est = sample.agg(
      count(lit(1)).as("sample_k"), sum(col("n_tokens")).as("__st"))
    val exact = docs.agg(
      count(lit(1)).as("n_docs"),
      sum(size(TextOps.words(col("text"))).cast("long")).as("__ct"))
    // integer `div` throughout — Spark's `/` on longs is a double
    est.crossJoin(broadcast(exact))
      .withColumn("est_mean_tokens_x1000", expr("(__st * 1000) div sample_k"))
      .withColumn("exact_mean_tokens_x1000", expr("(__ct * 1000) div n_docs"))
      .withColumn("err_pml",
        expr("(abs(est_mean_tokens_x1000 - exact_mean_tokens_x1000) " +
          "* 1000) div exact_mean_tokens_x1000"))
      .select(col("sample_k"), col("n_docs"),
        col("est_mean_tokens_x1000"), col("exact_mean_tokens_x1000"),
        col("err_pml"))
  }
}
