package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact BM25 full-text retrieval over the documents table — the ranking
  * leg a data-curation pipeline uses for relevance filtering ("keep docs
  * that retrieve well against seed queries"), decontamination lookup
  * (retrieve the corpus neighborhood of an eval item before the n-gram
  * gate), and near-dup triage ("more-like-this" against a suspect doc).
  * The reference has no retrieval surface (its closest analog is the
  * per-file grep-shaped scatter in daas-apps
  * `sparkcaller/.../SparkCaller.java:125-344`); this is the record-level
  * re-expression the engine's other text families follow.
  *
  * Scoring is Robertson/Sparck-Jones BM25 (k1 = 1.2, b = 0.75) with ONE
  * documented substitution: the log in the idf is replaced by its exact
  * rational argument, idf_ppt = 1000·(N − df + ½)/(df + ½) evaluated as
  * `((2·(N − df) + 1) · 1000) div (2·df + 1)` — integer floor-division
  * end-to-end, so the score is a hashable fact that DuckDB reproduces
  * bit-for-bit (the same fixed-point discipline as [[Lm]]'s ppm CASE;
  * both engines truncate non-negative operands identically). The rational
  * idf is strictly monotone in df exactly like the log form, so PER-TERM
  * candidate ordering is unchanged; only the relative weighting of
  * multi-term sums differs from textbook BM25, which is a calibration
  * choice, not a correctness one. All arithmetic stays inside 64 bits for
  * N·max_dl·1000 < 2^63 (N ≤ ~9·10^10 docs at dl ≤ 10^5 words — beyond
  * any 100 TB corpus).
  *
  * Scale shape: the score join is query_terms ⋈ postings on `term` — the
  * classic posting-list traversal, bounded by Σ_q Σ_t df(t). With a
  * Zipfian vocabulary and characteristic (high-tf, low-df) query terms the
  * candidate lists are short; the synthetic fixture's 31-word vocabulary
  * is the adversarial dense case (every posting list ≈ the whole corpus)
  * and still runs as one equi-join + hash-agg, no shuffle of the corpus
  * text itself. The final per-query top-k goes through the engine's own
  * bounded-heap exec ([[graft.plans.TopKPerKeyNode]]) — map-side heaps,
  * shuffle of heads only — never a full window sort. The query workload is
  * FIXED-SIZE by construction (a query set does not grow with the corpus),
  * so the whole plan is linear in corpus tokens. History serving at scale
  * is [[PostingsStore]]'s job; impact-ordered early-exit (WAND) is the
  * documented next pruning step if query volume ever grows with N.
  */
object Retrieval {

  /** Terms per derived query — the probe doc's most characteristic terms. */
  val QueryTerms = 8

  /** Results per query. */
  val TopK = 5

  /** Candidate-doc rows above which the MaxScore doc semi-join stops
    * force-broadcasting the candidate set and falls back to a shuffled
    * semi-join — one long column at ~24 bytes/unsafe row keeps 4M rows
    * near 100 MB, comfortably inside an executor while far above any
    * gated fixture. Same discipline as [[Classify.MaxBroadcastModelRows]]:
    * the hint is a performance choice that must never be able to OOM.
    */
  val MaxBroadcastCandidateRows: Long = 4000000L

  /** The inverted index as a frame: (doc_id, term, tf, dl) — one row per
    * distinct (doc, term), `tf` the in-doc term frequency, `dl` the doc
    * length in words (ridden along so scoring never re-joins a doc-stats
    * side).
    */
  def postings(docs: DataFrame, idCol: String = "doc_id",
               textCol: String = "text"): DataFrame =
    docs.select(col(idCol).as("doc_id"), TextOps.words(col(textCol)).as("ws"))
      .select(col("doc_id"), size(col("ws")).cast("long").as("dl"),
        explode(col("ws")).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"), max(col("dl")).as("dl"))

  /** (term, df) — document frequency; one row per (doc, term) in the
    * postings makes this a plain row count.
    */
  def docFreq(post: DataFrame): DataFrame =
    post.groupBy(col("term")).agg(count(lit(1)).as("df"))

  /** One-row (n, t): corpus doc count and total token count (Σ tf over a
    * doc = its dl, so t = Σ dl — avgdl is t/n, kept rational).
    */
  def corpusTotals(post: DataFrame): DataFrame =
    post.agg(countDistinct(col("doc_id")).as("n"), sum(col("tf")).as("t"))

  /** Derive a "more-like-this" query per probe doc: its `qTerms` most
    * characteristic terms, ranked tf DESC (what the doc is about), df ASC
    * (prefer discriminative), term ASC (total order → deterministic).
    * `probe` selects the probe docs by predicate on the postings columns —
    * the workload stays fixed-size while the corpus grows.
    */
  def queriesFor(post: DataFrame, df: DataFrame, probe: Column,
                 qTerms: Int = QueryTerms): DataFrame =
    graft.operators.Relational.topKPerKey(
      post.filter(probe).join(df, Seq("term"))
        .select(col("doc_id").as("query_id"), col("term"), col("tf"), col("df")),
      Seq(col("query_id")),
      Seq(col("tf").desc, col("df").asc, col("term").asc), qTerms)
      .select(col("query_id"), col("term"))

  /** Exact BM25 top-k: (query_id, doc_id, score_ppt), the k highest-scored
    * docs per query (ties by doc_id ASC). `queries` is (query_id, term);
    * `post` the corpus postings. Pass `eager = false` when the caller
    * already materialized `post` (it feeds df, totals, and the score join —
    * three consumers).
    *
    * A duplicate (query_id, term) row in `queries` would double-count that
    * term's contribution, so the workload is deduplicated here — the
    * internal [[queriesFor]] path is unique by construction, but the SQL
    * TVF face (`graft_bm25`/`graft_bm25_store`) takes an arbitrary user
    * table. The dedup agg is workload-sized (queries are fixed-size by
    * contract), never corpus-sized.
    */
  def bm25TopK(post: DataFrame, queries: DataFrame, k: Int = TopK,
               eager: Boolean = true): DataFrame = {
    val p = if (eager) Dedup.materialize(post) else post
    bm25TopKWith(p, docFreq(p), corpusTotals(p), queries, k)
  }

  /** [[bm25TopK]] with caller-supplied corpus statistics: `df` is
    * (term, df), `totals` a one-row (n, t). The stats-sidecar serve
    * ([[PostingsStore]]) uses this so df/N/Σdl come from per-drop
    * sum-merged partials instead of re-aggregating the full postings
    * scan — the scoring itself is unchanged, so the supplied stats must
    * equal [[docFreq]]/[[corpusTotals]] of `post` exactly.
    */
  def bm25TopKWith(post: DataFrame, df: DataFrame, totals: DataFrame,
                   queries: DataFrame, k: Int = TopK): DataFrame =
    graft.operators.Relational.topKPerKey(
      scoredPairs(post, df, totals, queries),
      Seq(col("query_id")), Seq(col("score_ppt").desc, col("doc_id").asc), k)

  /** Every (query, doc) exact BM25 score — the pre-top-k frame both the
    * full traversal and the MaxScore-pruned path share.
    */
  private def scoredPairs(post: DataFrame, df: DataFrame, totals: DataFrame,
                          queries: DataFrame): DataFrame =
    queries
      .dropDuplicates("query_id", "term")
      .join(post, Seq("term"))
      .join(df, Seq("term"))
      .crossJoin(broadcast(totals))
      .withColumn("idf_ppt", expr("((2*(n - df) + 1) * 1000) div (2*df + 1)"))
      .withColumn("dlr_ppt", expr("(dl * n * 1000) div t"))
      .withColumn("tf_ppt",
        expr("(2200000000 * tf) div (1000000*tf + 300000 + 900*dlr_ppt)"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(expr("(idf_ppt * tf_ppt) div 1000")).as("score_ppt"))

  /** MaxScore/WAND-style pruned BM25 top-k — bit-identical output to
    * [[bm25TopKWith]] (q173's gate), traversing only a fraction of the
    * postings when the workload allows it. The batch re-expression of
    * impact-ordered early exit (Turtle & Flood's MaxScore; WAND's
    * per-term upper bounds), which is inherently per-query-sequential in
    * a search engine but becomes a three-join certificate here:
    *
    *  1. Split each query's terms by document frequency: `df ≤
    *     essentialDfMax` is ESSENTIAL (rare, high-impact), the rest
    *     non-essential (frequent, low-idf — the stopword lists that
    *     dominate traversal cost).
    *  2. Candidates = docs sharing ≥ 1 essential term with ANY query
    *     (the rare-term postings are short by definition: |candidates| ≤
    *     Σ df over essential terms). Score candidates EXACTLY over the
    *     doc-pruned postings (semi-join by doc_id — every term of a
    *     candidate doc participates, so candidate scores are full
    *     scores; the frequent lists are traversed only for candidate
    *     docs, never end-to-end).
    *  3. Per-query exactness CERTIFICATE: any non-candidate doc shares
    *     only non-essential terms with the query, so its score is at
    *     most Σ ub(t) over the query's non-essential terms, where
    *     ub(t) = (idf_ppt(t) · 2200) div 1000 bounds a term's per-doc
    *     contribution (tf_ppt < 2200 = (k1+1)·1000 for every tf, dl).
    *     A query that skipped NO corpus-present term is trivially exact
    *     (its candidates are every doc sharing any scoring term; absent
    *     terms contribute no rows to the full traversal either). A query
    *     that DID skip a corpus-present term is exact only with k
    *     certified hits whose k-th score STRICTLY exceeds the skipped
    *     bound — strict, because a tie could still displace the k-th hit
    *     through the doc_id tie-break, and required even when the bound
    *     is 0: a skipped term whose idf floors to 0 (df within ~0.05% of
    *     N) still matches docs at score 0, which the full traversal ranks
    *     when fewer than k positive-score docs exist. A query that fails
    *     the certificate (or has no essential term, or fewer than k
    *     certified hits) re-runs the full traversal — correctness never
    *     depends on the cutoff choice, only the savings do. Both branches
    *     live in one lazy plan: the fallback join processes exactly the
    *     failed queries' rows.
    *
    * Scale shape: candidate generation is bounded by essential-term df
    * sums; the frequent posting lists — the O(N)-per-term cost WAND
    * exists to avoid — are read through a candidate-doc semi-join.
    * Candidates ≤ Σ essential df is bounded PER TERM by the cutoff but
    * unbounded in the number of distinct essential terms a large query
    * workload contributes, so the semi-join hint is SIZE-GATED like the
    * classifier model broadcast ([[Classify.MaxBroadcastModelRows]]): the
    * eager path counts the materialized candidate set and broadcasts only
    * under [[MaxBroadcastCandidateRows]], falling back to a shuffled
    * semi-join above it; the lazy face leaves the join unhinted and AQE
    * makes the same call from runtime sizes. With per-drop
    * sidecar stats ([[PostingsStore]]) df/N/Σdl never touch the
    * postings at all, so a needle-query workload over a 10^11-doc corpus
    * costs O(Σ rare df), not O(N · |query terms|).
    * [[tools.MaxScoreBench]] measures the crossover on a planted
    * Zipfian corpus; [[deriveEssentialDfMax]] picks the cutoff from the
    * df distribution so pruning survives corpus growth without retuning.
    */
  def bm25TopKMaxScore(post: DataFrame, df: DataFrame, totals: DataFrame,
                       queries: DataFrame, k: Int = TopK,
                       essentialDfMax: Long = 1000L,
                       eager: Boolean = true,
                       maxBroadcastCandidateRows: Long =
                         MaxBroadcastCandidateRows): DataFrame = {
    val q = queries.dropDuplicates("query_id", "term")
    // per-(query, term) upper bound; a term absent from the corpus (null
    // df) has empty postings and bound 0
    val qdf = q.join(df, Seq("term"), "left")
      .crossJoin(broadcast(totals.select(col("n"))))
      .withColumn("ub_ppt", expr(
        "CASE WHEN df IS NULL THEN 0L ELSE " +
          "((((2*(n - df) + 1) * 1000) div (2*df + 1)) * 2200) div 1000 END"))
    val essTerms = qdf.filter(col("df").isNotNull &&
      col("df") <= essentialDfMax)
    // candidates are bounded by Σ essential df — per-term by the cutoff's
    // construction, but a million-query workload's distinct essential
    // terms can push the union past executor memory, so the broadcast is
    // size-gated: counted when eager (the materialization makes the count
    // free), AQE-decided on the lazy face
    val candDocsRaw = essTerms.select(col("term")).distinct()
      .join(post, Seq("term")).select(col("doc_id")).distinct()
    val prunedTopk = Dedup.materialize(bm25TopKWith(
      candidateScan(post, candDocsRaw, eager, maxBroadcastCandidateRows),
      df, totals, q, k))
    // certificate: k certified hits whose k-th score dominates the sum of
    // skipped-term bounds; trivially exact only when NO corpus-present
    // term was skipped (ub_rest = 0 is NOT enough — a skipped zero-idf
    // term still matches docs at score 0, see the contract above)
    val ubRest = qdf.groupBy(col("query_id")).agg(
      sum(when(col("df").isNull || col("df") > essentialDfMax,
        col("ub_ppt")).otherwise(lit(0L))).as("ub_rest"),
      sum(when(col("df").isNotNull && col("df") > essentialDfMax,
        lit(1L)).otherwise(lit(0L))).as("n_skipped"))
    val cert = prunedTopk.groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_hits"), min(col("score_ppt")).as("kth_ppt"))
      .join(ubRest, Seq("query_id"), "full_outer")
      // STRICT kth > bound: a non-candidate scoring exactly the bound
      // could still displace the k-th hit through the doc_id tie-break
      .withColumn("exact", coalesce(
        coalesce(col("n_skipped"), lit(0L)) === 0L ||
          (coalesce(col("n_hits"), lit(0L)) === k &&
            col("kth_ppt") > coalesce(col("ub_rest"), lit(0L))), lit(false)))
    if (eager) {
      // the certificate verdict is WORKLOAD-sized (one row per query):
      // collect it and emit the fallback traversal only for the queries
      // that need one — an all-certified workload never rescans the
      // postings. The lazy face (eager=false, the TVF convention) keeps
      // both branches in one plan instead; the fallback join then costs
      // an extra postings scan even when it produces zero rows.
      // query_id is collected generically — the contract admits any
      // equatable id type (BIGINT in the fixtures, strings from a TVF
      // caller), and isInCollection handles either.
      val failed = cert.filter(!col("exact")).select(col("query_id"))
        .collect().map(_.get(0)).toSeq
      val certified = prunedTopk
        .join(cert.filter(col("exact")).select(col("query_id")).hint("broadcast"),
          Seq("query_id"), "left_semi")
      if (failed.isEmpty) certified
      else certified.unionByName(bm25TopKWith(post, df, totals,
        q.filter(col("query_id").isInCollection(failed)), k))
    } else {
      val okIds = cert.filter(col("exact")).select(col("query_id"))
      val failedIds = cert.filter(!col("exact")).select(col("query_id"))
      prunedTopk.join(okIds, Seq("query_id"), "left_semi")
        .unionByName(bm25TopKWith(post, df, totals,
          q.join(failedIds, Seq("query_id"), "left_semi"), k))
    }
  }

  /** postings → queries → top-k in one call, for a corpus given as docs. */
  def bm25TopKFor(docs: DataFrame, probe: Column, k: Int = TopK,
                  qTerms: Int = QueryTerms): DataFrame = {
    val p = Dedup.materialize(postings(docs))
    bm25TopK(p, queriesFor(p, docFreq(p), probe, qTerms), k, eager = false)
  }

  /** The postings scan pruned to the MaxScore candidate docs — the
    * semi-join whose hint the size gate governs (factored out so
    * PlanSpec can assert the gate on the pre-materialization plan).
    * Eager: count the materialized candidates, broadcast only under the
    * gate; lazy: unhinted, AQE decides from runtime sizes.
    */
  private[graft] def candidateScan(post: DataFrame, candDocsRaw: DataFrame,
                                   eager: Boolean,
                                   maxBroadcastCandidateRows: Long): DataFrame = {
    val candDocs =
      if (!eager) candDocsRaw
      else {
        val cd = Dedup.materialize(candDocsRaw)
        if (cd.count() <= maxBroadcastCandidateRows) broadcast(cd) else cd
      }
    post.join(candDocs, Seq("doc_id"), "left_semi")
  }

  /** Derive the essential-df cutoff from the corpus df distribution
    * instead of hand-tuning it: the largest cutoff whose total candidate
    * exposure — Σ df over terms with df ≤ cutoff — stays within
    * `candidateBudget`, so the MaxScore candidate set is bounded under
    * the broadcast gate BY CONSTRUCTION and pruning survives corpus
    * growth without retuning (a mis-set fixed cutoff silently degrades
    * to full traversal + a wasted pruned pass).
    *
    * Pass the FULL df frame for a workload-agnostic cutoff, or
    * `df.join(queries.select("term").distinct, Seq("term"), "left_semi")`
    * for a workload-aware one (only terms the workload can contribute
    * count against the budget — strictly larger cutoffs). Returns 0 when
    * even the rarest df class overflows the budget (MaxScore then falls
    * back to the full traversal globally, which is the right call).
    *
    * Scale shape: the frame under the cumulative window is one row per
    * DISTINCT df VALUE — Zipfian df values cluster heavily (the long tail
    * is df = 1, 2, 3, …; the head a handful of giants), so this is
    * metadata-scale (≪ vocabulary, ≪ corpus) and the single-partition
    * ordered window over it is deliberate, not an oversight.
    */
  def deriveEssentialDfMax(df: DataFrame,
                           candidateBudget: Long =
                             MaxBroadcastCandidateRows): Long = {
    import org.apache.spark.sql.expressions.Window
    val byDf = df.groupBy(col("df")).agg(sum(col("df")).as("exposure"))
    val cum = byDf.withColumn("cum", sum(col("exposure")).over(
      Window.orderBy(col("df"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val r = cum.filter(col("cum") <= candidateBudget)
      .agg(max(col("df"))).collect()(0)
    if (r.isNullAt(0)) 0L else r.getLong(0)
  }

  /** [[bm25TopKFor]] through the MaxScore-pruned path — same output by
    * construction (certificate or fallback), q173's gate.
    */
  def bm25TopKForMaxScore(docs: DataFrame, probe: Column, k: Int = TopK,
                          qTerms: Int = QueryTerms,
                          essentialDfMax: Long = 1000L): DataFrame = {
    val p = Dedup.materialize(postings(docs))
    val df = Dedup.materialize(docFreq(p)) // feeds queries, bounds, scoring
    bm25TopKMaxScore(p, df, corpusTotals(p),
      queriesFor(p, df, probe, qTerms), k, essentialDfMax)
  }
}
