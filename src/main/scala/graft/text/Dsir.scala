package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Hashed n-gram importance scoring — the DSIR slot in a curation
  * pipeline (Xie et al., "Data Selection for Language Models via
  * Importance Resampling", NeurIPS 2023): pick raw-web documents whose
  * hashed n-gram profile looks like a small trusted TARGET corpus, by
  * the ratio of smoothed target/raw feature probabilities.
  *
  * Model: each document is a bag of hashed features — its unigrams and
  * bigrams bucketed to `buckets` ids by md5 (engine-portable, exact).
  * Target and raw corpora each reduce to a B-row count profile; a
  * feature's importance ratio is the Laplace-smoothed count ratio in
  * exact integer ppm, `((tgt_f + 1) * 10^6) div (raw_f + 1)`, and a
  * document's score is the per-token MEAN ratio,
  * `(Σ_occurrences r_ppm) div n_feats`. Two deliberate, documented
  * departures from the paper, both the engine's standard
  * rational-surrogate moves (see [[Classify]], [[Retrieval]]):
  *
  *   - log p/q is replaced by the identity on the smoothed count ratio.
  *     The corpus-total normalizers (TgtTot + B)/(RawTot + B) scale every
  *     feature's true probability ratio by ONE global positive constant,
  *     so omitting them rescales every document's score identically —
  *     ranking-irrelevant — and keeps the per-feature intermediate at
  *     (tgt_f + 1)·10^6, 64-bit safe while any single target bucket
  *     holds < ~9.2·10^12 occurrences (a full-corpus-scale ceiling;
  *     [[Classify]] documents the same class of bound).
  *   - the Gumbel-noised sampling becomes deterministic top-k by
  *     (score, doc_id) — reproducible across engines and runs, which is
  *     what a hash-gated curation decision needs.
  *
  * 100 TB shape: the ratio table is AT MOST `buckets` rows regardless of
  * corpus size — that is what the feature hashing buys — so scoring is
  * exploded-features ⋈ broadcast(ratio) + ONE hash aggregation by doc:
  * map-side join, partial aggregation, a single doc-sized shuffle, no
  * corpus-wide sort anywhere. Selection is [[graft.operators.Relational
  * .topK]] (TakeOrderedAndProject: per-partition bounded heap + a k-row
  * gather). Profiles are plain sum-aggregations, and because counts
  * sum-merge across disjoint drops the raw profile persists incrementally
  * as a ledgered store ([[DsirStore]]) with exact unlearning.
  *
  * The reference has no data-selection surface at all (its pipeline ends
  * at variant calls, daas-apps `SparkCaller.java:125-344`); this is part
  * of SURVEY.md §2's LLM-pipeline extension set.
  */
object Dsir {

  /** Feature-space size. 2^16 keeps the ratio table trivially
    * broadcastable (a few MB) while collisions stay rare below ~10^4
    * distinct n-grams per corpus; the paper uses a same-order 10^4.
    */
  val DefaultBuckets: Int = 65536

  /** md5 bucket of one n-gram string — first 8 hex digits as an integer
    * (exactly `('0x'||substr(md5(s),1,8))::BIGINT` in DuckDB), mod B.
    */
  def bucket(s: Column, buckets: Int): Column =
    conv(substring(md5(s), 1, 8), 16, 10).cast("long") % buckets

  /** Per-document raw feature-gram OCCURRENCES, one row per occurrence:
    * (id, s). Features are the doc's unigrams plus its bigrams (a
    * one-word doc contributes its unigram only), so a doc yields
    * 2·words − 1 rows. Pure map-side: project + explode, no shuffle.
    * This is the pre-hash stream [[explodedFeatures]] buckets — exposed
    * separately so the occupancy audit (q188) can count the raw gram
    * universe against the bucket universe.
    */
  def explodedGrams(docs: DataFrame, idCol: String = "doc_id",
                    textCol: String = "text"): DataFrame = {
    val ws = split(col(textCol), " ")
    val bigrams = when(size(col("ws")) >= 2,
      slice(zip_with(col("ws"), slice(col("ws"), lit(2), size(col("ws"))),
        (a, b) => concat_ws(" ", a, b)), lit(1), size(col("ws")) - 1))
      .otherwise(array().cast("array<string>"))
    docs.select(col(idCol).as("id"), ws.as("ws"))
      .select(col("id"), explode(concat(col("ws"), bigrams)).as("s"))
  }

  /** [[explodedGrams]] hashed into buckets: (id, f). */
  def explodedFeatures(docs: DataFrame, idCol: String = "doc_id",
                       textCol: String = "text",
                       buckets: Int = DefaultBuckets): DataFrame =
    explodedGrams(docs, idCol, textCol)
      .select(col("id"), bucket(col("s"), buckets).as("f"))

  /** Feature-hash OCCUPANCY audit (q188) — the honesty surface for
    * [[DefaultBuckets]]: feature hashing folds distinct n-grams into
    * shared buckets, and past ~10^4 distinct grams (a real web corpus
    * has 10^8+ distinct bigrams) the folding starts blending unrelated
    * features into one importance ratio. This makes the regime VISIBLE
    * next to the score instead of assumed in a comment: one row —
    * (side, n_occurrences, n_distinct_grams [exact], occupied [buckets
    * holding ≥ 1 gram], folded [grams beyond their bucket's first —
    * the collision excess], fold_ppm [folded per distinct gram, exact
    * integer]). fold_ppm near 0: ratios are per-gram; approaching 10^6:
    * the model is measuring bucket traffic, not gram importance — raise
    * `buckets` or shrink the gram space.
    *
    * Exactness note: n_distinct_grams is an EXACT corpus-wide distinct
    * over raw gram strings — one Expand-style multi-distinct agg,
    * affordable at gate scale and the right gate semantics. At 100 TB
    * swap the exact distinct for the integer-exact [[DistinctSketch]]
    * estimate (±2% at 256 stored rows — the q178 family measures
    * exactly this cardinality shape); the audit row and the decision it
    * feeds are unchanged.
    */
  def occupancyAudit(docs: DataFrame, side: String,
                     idCol: String = "doc_id", textCol: String = "text",
                     buckets: Int = DefaultBuckets): DataFrame =
    explodedGrams(docs, idCol, textCol)
      .select(col("s"), bucket(col("s"), buckets).as("f"))
      .agg(count(lit(1)).as("n_occurrences"),
        countDistinct(col("s")).as("n_distinct_grams"),
        countDistinct(col("f")).as("occupied"))
      .select(lit(side).as("side"), col("n_occurrences"),
        col("n_distinct_grams"), col("occupied"),
        (col("n_distinct_grams") - col("occupied")).as("folded"),
        expr("CASE WHEN n_distinct_grams = 0 THEN 0L ELSE " +
          "((n_distinct_grams - occupied) * 1000000) div n_distinct_grams " +
          "END").as("fold_ppm"))

  /** Corpus profile: (f, cnt) summed over every feature occurrence —
    * the sufficient statistic for one side of the ratio. ≤ B rows out;
    * partial aggregation makes it one map-side-combined shuffle of at
    * most B·partitions rows. Profiles of disjoint corpora sum-merge to
    * the union's profile (the [[DsirStore]] contract).
    */
  def profile(docs: DataFrame, textCol: String = "text",
              buckets: Int = DefaultBuckets): DataFrame =
    explodedFeatures(docs, textCol = textCol, buckets = buckets)
      .groupBy(col("f")).agg(count(lit(1)).as("cnt"))

  /** Importance-ratio table from two profiles: (f, r_ppm) over features
    * present in EITHER corpus, r_ppm = ((tgt + 1) * 10^6) div (raw + 1).
    * Absent-everywhere buckets score the smoothed default 10^6 (= ratio
    * (0+1)/(0+1)) via the scorer's coalesce, so the table never needs
    * densifying. ≤ B rows: broadcastable by construction.
    */
  def ratios(targetProfile: DataFrame, rawProfile: DataFrame): DataFrame =
    targetProfile.withColumnRenamed("cnt", "tgt")
      .join(rawProfile.withColumnRenamed("cnt", "raw"), Seq("f"), "full_outer")
      .select(col("f"),
        expr("((coalesce(tgt, 0) + 1) * 1000000) div (coalesce(raw, 0) + 1)")
          .as("r_ppm"))

  /** [[ratios]] as union + ONE hash aggregation — identical output when
    * both profiles are unique on f (each side contributes at most one
    * row per f, so sum(tgt)/sum(raw) reproduce the full-outer join's
    * coalesced columns exactly). The BATCH path ([[score]]) uses this
    * shape: both of its profiles are fresh aggregates in the same plan
    * and the union form drops the FullOuter SortMergeJoin's two sort
    * exchanges — in-JVM A/B (tools.AbBench): q186 5.90 -> 5.08 s. The
    * STORE serve ([[DsirStore.scoreVsDrop]]) keeps the join form: its
    * raw profile is already a union+groupBy over the persisted
    * counters, and stacking a second union+groupBy on top measured
    * FLAT-to-worse there (q189 6.06 -> 6.16, q205 6.42 -> 6.74).
    */
  private[text] def ratiosUnion(targetProfile: DataFrame,
                                rawProfile: DataFrame): DataFrame =
    targetProfile.select(col("f"), col("cnt").as("tgt"), lit(0L).as("raw"))
      .unionAll(rawProfile.select(col("f"), lit(0L).as("tgt"),
        col("cnt").as("raw")))
      .groupBy(col("f"))
      .agg(sum(col("tgt")).as("tgt"), sum(col("raw")).as("raw"))
      .select(col("f"),
        expr("((coalesce(tgt, 0) + 1) * 1000000) div (coalesce(raw, 0) + 1)")
          .as("r_ppm"))

  /** Score documents against a ratio table: (doc_id, n_feats, score_ppm)
    * where score_ppm is the mean occurrence ratio,
    * (Σ r_ppm) div n_feats. One broadcast left-join (unseen bucket →
    * the smoothed default 10^6) + one hash agg by doc — the only
    * shuffle is doc-sized and partially aggregated map-side.
    *
    * Overflow: Σ r_ppm ≤ n_feats · max_r; with max_r = (TgtMax+1)·10^6
    * this wraps only past ~9.2·10^18 / max_r occurrences per doc —
    * unreachable for any real document.
    */
  def scoreAgainst(docs: DataFrame, ratioTable: DataFrame,
                   idCol: String = "doc_id", textCol: String = "text",
                   buckets: Int = DefaultBuckets): DataFrame =
    scoreFeatures(explodedFeatures(docs, idCol, textCol, buckets),
      ratioTable, idCol)

  /** [[scoreAgainst]] from already-exploded (id, f) occurrence rows —
    * the store serve computes those once for both its profile and this
    * join ([[DsirStore.scoreVsDrop]]). The broadcast hint is safe by
    * construction: the ratio table is ≤ `buckets` rows at ANY corpus
    * size (contrast [[Classify]]'s vocabulary-sized model, which must
    * size-gate its hint).
    */
  private[text] def scoreFeatures(feats: DataFrame, ratioTable: DataFrame,
                                  idCol: String): DataFrame =
    feats.join(broadcast(ratioTable), Seq("f"), "left")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_feats"),
        sum(coalesce(col("r_ppm"), lit(1000000L))).as("rsum"))
      .select(col("id").as(idCol), col("n_feats"),
        expr("rsum div n_feats").as("score_ppm"))

  /** End-to-end: profile both corpora, build ratios, score `raw`'s own
    * documents — the batch data-selection pass (score once, then select
    * with [[selectTopK]] or any threshold).
    */
  def score(target: DataFrame, raw: DataFrame, idCol: String = "doc_id",
            textCol: String = "text",
            buckets: Int = DefaultBuckets): DataFrame =
    scoreFeatures(explodedFeatures(raw, idCol, textCol, buckets),
      ratiosUnion(profile(target, textCol, buckets),
        profile(raw, textCol, buckets)),
      idCol)

  /** Deterministic selection: global top-k by (score_ppm DESC, doc_id
    * ASC) — the reproducible stand-in for the paper's Gumbel sampling.
    * Fixed k ⇒ TakeOrderedAndProject's bounded per-partition heap; no
    * global sort at any corpus size.
    */
  def selectTopK(scored: DataFrame, k: Int,
                 idCol: String = "doc_id"): DataFrame =
    graft.operators.Relational.topK(scored, k,
      col("score_ppm").desc, col(idCol).asc)
}
