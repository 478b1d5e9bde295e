package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-based n-gram language-model quality scoring — the CCNet-style
  * "score every document against an LM trained on a trusted corpus" filter
  * (Wenzek et al., arXiv:1911.00359, which scores Common Crawl against a
  * Wikipedia KenLM; Brown et al., arXiv:2005.14165 §A use the same
  * corpus-level LM-filter shape for GPT-3's training data). The reference
  * engine has no LM surface (its quality gates are per-file shell stages,
  * daas-apps `sparkcaller/.../PreprocessingPipeline.java`); this is the
  * record-level, cluster-parallel re-expression a 100 TB text pipeline
  * needs: TRAIN on a trusted split (one pass of counting aggregations),
  * SCORE every candidate document (equi-joins against the count tables),
  * gate on the score.
  *
  * Model: trigram stupid backoff (Brants et al., EMNLP 2007, "Large
  * Language Models in Machine Translation") — no discounting, a fixed
  * backoff penalty α = 0.4, which Brants showed matches Kneser-Ney at
  * web scale while keeping the model a set of PLAIN COUNT TABLES that
  * distribute as ordinary DataFrames. Per scored position i (3rd word
  * onward):
  *
  *   S(w_i | w_{i-2} w_{i-1}) =
  *     c3(w_{i-2} w_{i-1} w_i) / c2(w_{i-2} w_{i-1})   if c3 > 0
  *     0.4 · c2(w_{i-1} w_i)   / c1(w_{i-1})           else if c2 > 0
  *     0.4² · c1(w_i) / T                              else if c1 > 0
  *     OOV floor                                        otherwise
  *
  * Fixed-point exactness (the engine's hash-gate discipline): scores are
  * integers in parts-per-million — `(1_000_000 · c3) div c2ctx`,
  * `(400_000 · c2) div c1`, `(160_000 · c1) div T`, OOV = 1 ppm — so every
  * per-position term is one integer multiply + one integer floor-division
  * of exact counts, the per-document score is an order-independent integer
  * SUM of terms (no float accumulation, no log), and the DuckDB oracle
  * replays it bit-for-bit (q135). A float KenLM sums log-probs and is not
  * reproducible across engines or reduction orders; the fixed-point form
  * preserves the RANKING the filter gates on (per-term relative error
  * ≤ 1 ppm) while making the result a hashable fact.
  *
  * Scale shape: training is three partial/final counting aggregations over
  * the trusted split (map-side combine, shuffle bytes bounded by n-gram
  * TYPE counts, not token volume). Scoring groups the candidate's
  * positions to per-doc DISTINCT trigrams first (`m` = multiplicity), so
  * the five count lookups join against type-level rows — web-scale Zipf
  * means types ≪ tokens. The joins are plain equi-joins that co-partition
  * by n-gram key; when the trusted split is small (the usual CCNet shape:
  * Wikipedia vs Common Crawl) the count tables sit under the broadcast
  * threshold and every lookup is map-side. `minCount` prunes singleton
  * n-grams from the model (Brants' entropy pruning, simplified) — at
  * 100 TB the c3 table is the one model piece that scales with the
  * trusted corpus, and pruning it only shifts pruned positions to the
  * backoff leg, which both engines replay identically.
  */
object Lm {

  /** Trained model: trigram/bigram/unigram count tables (`g` = space-joined
    * n-gram, `c` = exact count) plus the 1-row total-token frame `tot(t)`.
    * All four are ordinary DataFrames — persistable as parquet, joinable,
    * broadcastable when small.
    */
  final case class Model(c3: DataFrame, c2: DataFrame, c1: DataFrame, tot: DataFrame)

  /** One counting pass per order over the trusted split. `minCount` > 1
    * drops rare trigrams/bigrams from the model (unigrams and T are kept
    * exact — the backoff floor must cover the full trusted vocabulary).
    */
  def train(trusted: DataFrame, textCol: String = "text",
            minCount: Long = 1L): Model = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    val ws = TextOps.words(col(textCol))
    def grams(n: Int, prune: Boolean): DataFrame = {
      val base = trusted.select(ws.as("ws")).filter(size(col("ws")) >= n)
        .select(explode(TextOps.shingles(col("ws"), n)).as("g"))
        .groupBy(col("g")).agg(count(lit(1)).as("c"))
      if (prune && minCount > 1) base.filter(col("c") >= minCount) else base
    }
    val c1 = trusted.select(ws.as("ws"))
      .select(explode(col("ws")).as("g"))
      .groupBy(col("g")).agg(count(lit(1)).as("c"))
    Model(grams(3, prune = true), grams(2, prune = true), c1,
      c1.agg(sum(col("c")).cast("long").as("t")))
  }

  /** Score every document: (doc_id, n_scored, score_sum, score_ppm) —
    * `n_scored` = scored positions (tokens from the 3rd on), `score_sum`
    * the integer ppm sum, `score_ppm` its per-position mean
    * (`score_sum div n_scored`). Documents with < 3 words score
    * (0, 0, 0) — too short for a trigram judgment; gate them with the
    * q22/q123 length filters instead. Higher = more like the trusted
    * corpus; a quality gate keeps the top band (see
    * `Queries.q123`-style percentile gating for the threshold-free form).
    */
  def score(docs: DataFrame, model: Model, idCol: String = "doc_id",
            textCol: String = "text"): DataFrame = {
    val ws = TextOps.words(col(textCol))
    val dt = docs.select(col(idCol), ws.as("ws"))
      .filter(size(col("ws")) >= 3)
      .select(col(idCol), explode(TextOps.shingles(col("ws"), 3)).as("tri"))
      .groupBy(col(idCol), col("tri")).agg(count(lit(1)).as("m"))
      .withColumn("p", split(col("tri"), " "))
      .withColumn("ctx2",
        concat_ws(" ", element_at(col("p"), 1), element_at(col("p"), 2)))
      .withColumn("bg",
        concat_ws(" ", element_at(col("p"), 2), element_at(col("p"), 3)))
      .withColumn("w2", element_at(col("p"), 2))
      .withColumn("w3", element_at(col("p"), 3))
      .drop("p")
    // c3 hit implies its prefix bigram is in c2 unpruned... only when
    // minCount prunes both orders at the same threshold: c2(ctx) >= c3(g)
    // always, so c3 >= minCount => c2ctx >= minCount — the div is never
    // null on the first branch. Same containment gives c1w2 > 0 on the
    // second (unigrams are never pruned).
    val scored = dt
      .join(model.c3.select(col("g").as("tri"), col("c").as("c3")), Seq("tri"), "left")
      .join(model.c2.select(col("g").as("ctx2"), col("c").as("c2ctx")), Seq("ctx2"), "left")
      .join(model.c2.select(col("g").as("bg"), col("c").as("c2bg")), Seq("bg"), "left")
      .join(model.c1.select(col("g").as("w3"), col("c").as("c1w3")), Seq("w3"), "left")
      .join(model.c1.select(col("g").as("w2"), col("c").as("c1w2")), Seq("w2"), "left")
      .crossJoin(broadcast(model.tot))
      .withColumn("s",
        when(col("c3").isNotNull, expr("(1000000 * c3) div c2ctx"))
          .when(col("c2bg").isNotNull, expr("(400000 * c2bg) div c1w2"))
          .when(col("c1w3").isNotNull, expr("(160000 * c1w3) div t"))
          .otherwise(lit(1L)))
      .groupBy(col(idCol))
      .agg(sum(col("m")).as("n_scored"), sum(col("m") * col("s")).as("score_sum"))
    docs.select(col(idCol)).join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_scored"), lit(0L)).as("n_scored"),
        coalesce(col("score_sum"), lit(0L)).as("score_sum"),
        when(col("n_scored").isNull, lit(0L))
          .otherwise(expr("score_sum div n_scored")).as("score_ppm"))
  }

  /** Train-on-A, score-B convenience (the q135 shape). */
  def scoreAgainst(trusted: DataFrame, docs: DataFrame,
                   minCount: Long = 1L): DataFrame =
    score(docs, train(trusted, minCount = minCount))

  /** The q135 oracle CTE chain: replays [[train]] (split = trusted
    * predicate over `documents`) and [[score]] in DuckDB — exact counts,
    * the same fixed-point CASE, `//` floor-division (all operands
    * non-negative, so DuckDB's floor and Spark's `div` truncation agree).
    * Emits CTE `lm_sc(doc_id, n_scored, score_sum)`; callers left-join it
    * to their candidate set (docs under 3 words never enter `lm_pos`).
    */
  def oracleCtes(trustedWhere: String, candWhere: String): String =
    s"""lm_tr AS (SELECT doc_id, string_split(text, ' ') AS ws
       |  FROM documents WHERE $trustedWhere),
       |lm_t3p AS (SELECT ws, unnest(range(3, len(ws)+1)) AS i FROM lm_tr
       |  WHERE len(ws) >= 3),
       |lm_c3 AS (SELECT ws[i-2]||' '||ws[i-1]||' '||ws[i] AS g,
       |    count(*) AS c FROM lm_t3p GROUP BY 1),
       |lm_t2p AS (SELECT ws, unnest(range(2, len(ws)+1)) AS i FROM lm_tr
       |  WHERE len(ws) >= 2),
       |lm_c2 AS (SELECT ws[i-1]||' '||ws[i] AS g, count(*) AS c
       |  FROM lm_t2p GROUP BY 1),
       |lm_c1 AS (SELECT w AS g, count(*) AS c
       |  FROM (SELECT unnest(ws) AS w FROM lm_tr) GROUP BY 1),
       |lm_tot AS (SELECT CAST(sum(c) AS BIGINT) AS t FROM lm_c1),
       |lm_ho AS (SELECT doc_id, string_split(text, ' ') AS ws
       |  FROM documents WHERE $candWhere),
       |lm_pos AS (SELECT doc_id, ws[i-2] AS w1, ws[i-1] AS w2, ws[i] AS w3
       |  FROM (SELECT doc_id, ws, unnest(range(3, len(ws)+1)) AS i
       |        FROM lm_ho WHERE len(ws) >= 3)),
       |lm_dt AS (SELECT doc_id, w1||' '||w2||' '||w3 AS tri,
       |    w1||' '||w2 AS ctx2, w2||' '||w3 AS bg, w2, w3,
       |    count(*) AS m FROM lm_pos GROUP BY ALL),
       |lm_terms AS (SELECT lm_dt.doc_id, lm_dt.m,
       |    CASE WHEN t3.c IS NOT NULL THEN (1000000 * t3.c) // b2c.c
       |         WHEN b2.c IS NOT NULL THEN (400000 * b2.c) // u2.c
       |         WHEN u3.c IS NOT NULL THEN (160000 * u3.c) // lm_tot.t
       |         ELSE 1 END AS s
       |  FROM lm_dt
       |  LEFT JOIN lm_c3 t3 ON lm_dt.tri = t3.g
       |  LEFT JOIN lm_c2 b2c ON lm_dt.ctx2 = b2c.g
       |  LEFT JOIN lm_c2 b2 ON lm_dt.bg = b2.g
       |  LEFT JOIN lm_c1 u2 ON lm_dt.w2 = u2.g
       |  LEFT JOIN lm_c1 u3 ON lm_dt.w3 = u3.g, lm_tot),
       |lm_sc AS (SELECT doc_id, CAST(sum(m) AS BIGINT) AS n_scored,
       |    CAST(sum(m*s) AS BIGINT) AS score_sum FROM lm_terms GROUP BY 1)""".stripMargin
}
