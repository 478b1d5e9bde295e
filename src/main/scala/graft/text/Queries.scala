package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Text-analysis / dedup queries over the `documents` table, each with an
  * exact DuckDB oracle. Hash domains are md5 hex strings and decisions are
  * made on integers, so results are engine-exact (see TextOps/Dedup docs).
  */
object Queries {

  def all: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Token counting: whitespace tokens, distinct types, alpha-run tokens
    // (BPE-ish regex), chars-per-token.
    "q20_token_stats" -> ((s, dir) => {
      val ws = TextOps.words(col("text"))
      Tables(s, dir).documents.select(
        col("doc_id"),
        size(ws).as("n_tokens"),
        size(array_distinct(ws)).as("n_types"),
        size(regexp_extract_all(col("text"), lit("[a-z]+"), lit(0))).as("n_alpha"),
        (col("n_chars").cast("double") / size(ws)).as("chars_per_token"))
    }),

    // Heuristic language ID: stopword-profile scores + argmax with
    // deterministic tie-break (profile order, then "und").
    "q21_lang_id" -> ((s, dir) => {
      val d = Tables(s, dir).documents.withColumn("ws", TextOps.words(col("text")))
      val scores = TextOps.langProfiles.map { case (lang, vocab) =>
        TextOps.vocabHits(col("ws"), vocab).as(s"score_$lang")
      }
      d.select(Seq(col("doc_id"), col("lang")) ++ scores
        :+ TextOps.langId(col("ws")).as("pred_lang"): _*)
    }),

    // Quality scoring: type/token ratio, stopword ratio, mean token length,
    // and a composite keep/drop flag — all decisions on exact int ratios.
    "q22_quality" -> ((s, dir) => {
      val d = Tables(s, dir).documents.withColumn("ws", TextOps.words(col("text")))
      d.select(
          col("doc_id"),
          size(col("ws")).as("n_tokens"),
          (size(array_distinct(col("ws"))).cast("double") / size(col("ws"))).as("ttr"),
          (TextOps.vocabHits(col("ws"), Seq("the", "a", "of", "and", "to")).cast("double") /
            size(col("ws"))).as("stop_ratio"),
          ((col("n_chars") - (size(col("ws")) - 1)).cast("double") / size(col("ws")))
            .as("mean_tok_len"))
        .withColumn("quality_ok",
          when(col("n_tokens").between(20, 90) && col("ttr") >= 0.25, 1).otherwise(0))
    }),

    // Document fingerprinting: whole-doc digest + content-defined
    // min-shingle fingerprint (stable under head/tail edits).
    "q23_fingerprint" -> ((s, dir) => {
      Tables(s, dir).documents
        .select(col("doc_id"), col("text"), TextOps.words(col("text")).as("ws"))
        .select(
          col("doc_id"),
          TextOps.docFingerprint(col("text")).as("fp_doc"),
          TextOps.minShingleFingerprint(TextOps.shingleSet(col("ws"), 3)).as("fp_shingle"))
    }),

    // MinHash+LSH near-dup pairs, exact-Jaccard verified (j ≥ 0.7).
    // repartition: the small test file is one split; signature work is
    // map-heavy and should use every core (no-op on real multi-split data).
    "q24_minhash_pairs" -> ((s, dir) =>
      Dedup.nearDupPairs(
        Tables(s, dir).documents.repartition(s.sparkContext.defaultParallelism))),

    // SimHash document signatures (16-bit, ±1 bit votes).
    "q25_simhash" -> ((s, dir) => {
      Tables(s, dir).documents
        .select(col("doc_id"), TextOps.wordHashes(TextOps.words(col("text"))).as("hs"))
        .select(col("doc_id"), TextOps.simhashFromHashes(col("hs"), 16).as("simhash16"))
    }),

    // Near-dup survivorship per source: docs flagged duplicate iff they have
    // a smaller-id near-dup partner (MarkDuplicates-style keep-best).
    "q26_neardup_keep" -> ((s, dir) =>
      Dedup.survivorStats(
        Tables(s, dir).documents.repartition(s.sparkContext.defaultParallelism), "source")),

    // Transitive near-dup clusters (connected components by min-label
    // propagation, fixed rounds — Dedup.nearDupClusters' default, mirrored
    // exactly in the oracle).
    "q48_neardup_clusters" -> ((s, dir) =>
      Dedup.nearDupClusters(
        Tables(s, dir).documents.repartition(s.sparkContext.defaultParallelism)))
  )

  // ---- DuckDB oracles ------------------------------------------------------

  /** Shared CTE: word-3-gram shingle sets per doc (data contract: ≥3 words,
    * single-space separated — enforced by TESTDATA generator; the Spark side
    * additionally guards short docs).
    */
  private val docsCte =
    """docs AS (
      |  SELECT doc_id, source, list_distinct(list_transform(
      |    range(1, len(string_split(text,' '))-1),
      |    i -> array_to_string((string_split(text,' '))[i:i+2], ' '))) AS sh
      |  FROM documents)""".stripMargin

  private val sigEntries = (0 until 16)
    .map { i =>
      val g = i / 4
      val off = (i % 4) * 8 + 1
      s"list_min(list_transform(sh, s -> ('0x'||substr(md5('$g:'||s),$off,8))::BIGINT))"
    }
    .mkString(",\n    ")

  private val bandKeys = (0 until 4)
    .map(b => s"md5(sig[${b * 4 + 1}]||'|'||sig[${b * 4 + 2}]||'|'||sig[${b * 4 + 3}]||'|'||sig[${b * 4 + 4}])")
    .mkString(", ")

  /** Shared CTE chain computing verified near-dup pairs (mirrors Dedup). */
  private val pairsCtes =
    s"""$docsCte,
       |sigs AS (SELECT doc_id, sh, [
       |    $sigEntries] AS sig FROM docs),
       |bands AS (SELECT doc_id, unnest([0,1,2,3]) AS band_idx,
       |  unnest([$bandKeys]) AS band_key FROM sigs),
       |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM bands a JOIN bands b
       |  ON a.band_idx = b.band_idx AND a.band_key = b.band_key AND a.doc_id < b.doc_id),
       |pairs AS (
       |  SELECT doc_a, doc_b,
       |    CAST(len(list_intersect(sa.sh, sb.sh)) AS INT) AS inter_size,
       |    CAST(len(list_distinct(sa.sh || sb.sh)) AS INT) AS union_size
       |  FROM cand
       |  JOIN docs sa ON doc_a = sa.doc_id
       |  JOIN docs sb ON doc_b = sb.doc_id)""".stripMargin

  private val simhashExpr = (0 until 16).map { j =>
    s"""(CASE WHEN list_sum(list_transform(hs,
       |    h -> CASE WHEN (h >> $j) & 1 = 1 THEN 1 ELSE -1 END)) > 0
       |  THEN ${1L << j} ELSE 0 END)""".stripMargin
  }.mkString(" +\n  ")

  private val langScoreSql = TextOps.langProfiles.map { case (lang, vocab) =>
    val set = vocab.map(w => s"'$w'").mkString(", ")
    lang -> s"CAST(len(list_filter(ws, w -> w IN ($set))) AS INT)"
  }

  def oracles: Map[String, String] = Map(
    "q20_token_stats" ->
      """SELECT doc_id,
        |  CAST(len(string_split(text,' ')) AS INT) AS n_tokens,
        |  CAST(len(list_distinct(string_split(text,' '))) AS INT) AS n_types,
        |  CAST(len(regexp_extract_all(text, '[a-z]+')) AS INT) AS n_alpha,
        |  CAST(n_chars AS DOUBLE)/len(string_split(text,' ')) AS chars_per_token
        |FROM documents""".stripMargin,
    "q21_lang_id" -> {
      val scores = langScoreSql.map { case (l, e) => s"$e AS score_$l" }.mkString(",\n  ")
      val best = "greatest(" + langScoreSql.map(_._2).mkString(", ") + ")"
      val pred = langScoreSql.map { case (l, e) =>
        s"WHEN $e > 0 AND $e = $best THEN '$l'"
      }.mkString(" ")
      s"""WITH t AS (SELECT doc_id, lang, string_split(text,' ') AS ws FROM documents)
         |SELECT doc_id, lang,
         |  $scores,
         |  CASE $pred ELSE 'und' END AS pred_lang
         |FROM t""".stripMargin
    },
    "q22_quality" ->
      """WITH t AS (SELECT doc_id, n_chars, string_split(text,' ') AS ws FROM documents),
        |m AS (SELECT doc_id,
        |  CAST(len(ws) AS INT) AS n_tokens,
        |  CAST(len(list_distinct(ws)) AS DOUBLE)/len(ws) AS ttr,
        |  CAST(len(list_filter(ws, w -> w IN ('the','a','of','and','to'))) AS DOUBLE)
        |    /len(ws) AS stop_ratio,
        |  CAST(n_chars - (len(ws)-1) AS DOUBLE)/len(ws) AS mean_tok_len
        |  FROM t)
        |SELECT *, CASE WHEN n_tokens BETWEEN 20 AND 90 AND ttr >= 0.25
        |  THEN 1 ELSE 0 END AS quality_ok FROM m""".stripMargin,
    "q23_fingerprint" ->
      s"""WITH $docsCte
         |SELECT d.doc_id, md5(d2.text) AS fp_doc,
         |  list_min(list_transform(d.sh, s -> md5(s))) AS fp_shingle
         |FROM docs d JOIN documents d2 ON d.doc_id = d2.doc_id""".stripMargin,
    "q24_minhash_pairs" ->
      s"""WITH $pairsCtes
         |SELECT doc_a, doc_b, inter_size, union_size,
         |  CAST(inter_size AS DOUBLE)/union_size AS jaccard
         |FROM pairs WHERE inter_size*10 >= union_size*7""".stripMargin,
    "q25_simhash" ->
      s"""WITH t AS (SELECT doc_id, list_transform(string_split(text,' '),
         |    w -> ('0x'||substr(md5(w),1,7))::BIGINT) AS hs FROM documents)
         |SELECT doc_id, CAST($simhashExpr AS BIGINT) AS simhash16 FROM t""".stripMargin
  ) ++ survivorOracle

  /** Min-label propagation unrolled to the same fixed 6 rounds as
    * Dedup.nearDupClusters' default — identical results even
    * pre-convergence.
    */
  private def clustersOracle: String = {
    // MATERIALIZED is load-bearing: each round references the previous CTE
    // twice; DuckDB inlines plain CTEs, which would duplicate the whole
    // minhash pipeline 2^rounds times. Round count MUST equal
    // Dedup.nearDupClusters' iterations.
    val rounds = (1 to 6).map { i =>
      s"""l$i AS MATERIALIZED (SELECT n.node,
         |  least(n.label, coalesce(m.ml, n.label)) AS label
         |  FROM l${i - 1} n LEFT JOIN (
         |    SELECT e.s, min(l.label) AS ml
         |    FROM edges e JOIN l${i - 1} l ON e.d = l.node GROUP BY e.s) m
         |  ON n.node = m.s)""".stripMargin
    }.mkString(",\n")
    s"""WITH $pairsCtes,
       |np AS MATERIALIZED (SELECT doc_a, doc_b FROM pairs
       |  WHERE inter_size*10 >= union_size*7),
       |edges AS MATERIALIZED (SELECT doc_a AS s, doc_b AS d FROM np
       |  UNION ALL SELECT doc_b, doc_a FROM np),
       |l0 AS MATERIALIZED (SELECT DISTINCT s AS node, s AS label FROM edges),
       |$rounds
       |SELECT node AS doc_id, label AS cluster_id FROM l6""".stripMargin
  }

  private def survivorOracle: Map[String, String] = Map(
    "q48_neardup_clusters" -> clustersOracle,
    "q26_neardup_keep" ->
      s"""WITH $pairsCtes,
         |losers AS (SELECT DISTINCT doc_b AS doc_id
         |  FROM pairs WHERE inter_size*10 >= union_size*7)
         |SELECT d.source, count(*) AS n_docs,
         |  CAST(sum(CASE WHEN l.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
         |  count(*) - CAST(sum(CASE WHEN l.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
         |FROM documents d LEFT JOIN losers l ON d.doc_id = l.doc_id
         |GROUP BY d.source""".stripMargin
  )
}
