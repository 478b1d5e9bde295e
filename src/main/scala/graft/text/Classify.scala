package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Learned bag-of-words text classifier — the CCNet/fastText slot in a
  * curation pipeline (language ID, source/domain routing, learned quality
  * gates), trained and served entirely as DataFrame aggregates so both
  * halves are DuckDB-gateable facts.
  *
  * The model is a CENTROID classifier over Laplace-smoothed unigram class
  * profiles (Rocchio-style; Han & Karypis, "Centroid-Based Document
  * Classification", PKDD 2000): weight(term, class) =
  * (cnt(term, class) + 1) / (tot(class) + V), the smoothed class unigram
  * probability, and a document scores each class by the inner product of
  * its tf vector with that profile. This is multinomial Naive Bayes with
  * the log replaced by identity — the same rational-surrogate move as
  * [[Retrieval]]'s idf: per-term monotonicity in the class-conditional
  * probability is preserved, sums replace products, and every quantity is
  * an exact integer (weights in ppb via `div`, scores a Σ tf·w_ppb), so
  * training AND inference hash-match across engines bit-for-bit. Unseen
  * (term, class) pairs fall back to the class's smoothed-zero weight
  * 10^9 div (tot + V), exactly NB's Laplace floor.
  *
  * Overflow: on the score side, score ≤ dl · max_w ≤ dl · 10^9 — safe for
  * docs to ~10^9 tokens. On the TRAINING side, the intermediate
  * (cnt + 1) · 10^9 caps cnt at ~9.2·10^9 before 64-bit wrap — a single
  * (term, class) pair may own at most ~9 billion token occurrences, which
  * bounds the trainable corpus at roughly 10^10 tokens per class for its
  * worst stopword (a ~100 TB-of-text ceiling per class; beyond it, divide
  * cnt and tot by a common power of two first — the ratio, hence the
  * model, is unchanged).
  *
  * Weights are model-sized (V × classes rows), so inference joins the
  * model AGAINST the corpus' exploded terms, never the reverse: a
  * broadcast hash join + hash agg + the bounded-heap top-1, linear in
  * corpus tokens with no corpus shuffle. The broadcast is SIZE-GATED
  * ([[MaxBroadcastModelRows]]): a real web-corpus vocabulary (10^7–10^9
  * distinct terms) would OOM executors if force-hinted, so above the gate
  * the model side joins as a plain shuffled equi-join — the corpus side
  * shuffles once on (term, label), still linear, just not map-side.
  * Crossover note: at ~48 bytes/row of unsafe-row footprint the default
  * gate (4M rows) caps the broadcast at ~200 MB — comfortably inside a
  * multi-GiB executor while far above any gated fixture (sf0.1 trains
  * ~31 distinct terms × 4 classes).
  *
  * The reference has no learned-classifier surface; this fills the
  * curation gap its file-level pipeline never reaches (SURVEY.md §2's
  * LLM-pipeline extension set).
  */
object Classify {

  /** Model rows (V × classes) above which the inference join stops
    * broadcasting the weights and falls back to a shuffled equi-join —
    * ~200 MB of unsafe rows, the "fits every executor comfortably" line
    * (see the crossover note above).
    */
  val MaxBroadcastModelRows: Long = 4000000L

  /** Train: (label, term, w_ppb) — Laplace-smoothed class unigram
    * profiles in parts-per-billion, exact integers.
    */
  def trainWeights(docs: DataFrame, labelCol: String = "lang",
                   textCol: String = "text"): DataFrame = {
    val cnt = termCounts(docs, labelCol, textCol)
    cnt.join(classTotals(cnt), Seq("label"))
      .crossJoin(broadcast(vocabSize(cnt)))
      .select(col("label"), col("term"),
        expr("((cnt + 1) * 1000000000) div (tot + v)").as("w_ppb"))
  }

  /** Held-out prediction: (doc_id, true_label, pred_label, score_ppb) —
    * argmax class by summed tf·w_ppb (ties by label ASC), unseen terms at
    * the class's Laplace floor. `train` and `docs` are disjoint splits of
    * a labeled corpus; `docs`' labels ride through as `true_label` so the
    * output doubles as a confusion-matrix feed.
    */
  def predict(train: DataFrame, docs: DataFrame, labelCol: String = "lang",
              idCol: String = "doc_id", textCol: String = "text",
              maxBroadcastModelRows: Long = MaxBroadcastModelRows): DataFrame =
    predictWithCounts(termCounts(train, labelCol, textCol), docs,
      labelCol, idCol, textCol,
      maxBroadcastModelRows = maxBroadcastModelRows)

  /** [[predict]] from a (label, term, cnt) count table instead of raw
    * train docs — the serve face [[ClassifyStore]] uses: counts are
    * sum-mergeable across drops, so a persisted count store trains
    * incrementally and unlearns exactly.
    *
    * `eager = true` (the default) materializes the model-sized count
    * table once — it feeds class totals, the vocabulary size, the weight
    * join AND the broadcast size gate, so the underlying corpus/store agg
    * runs exactly once. The SQL TVF face passes `eager = false` (no job
    * at analysis time); there the model join is left unhinted and AQE's
    * runtime size gate makes the same broadcast-or-shuffle call from the
    * actual shuffle statistics.
    */
  def predictWithCounts(cnt: DataFrame, docs: DataFrame,
                        labelCol: String = "lang", idCol: String = "doc_id",
                        textCol: String = "text",
                        eager: Boolean = true,
                        maxBroadcastModelRows: Long =
                          MaxBroadcastModelRows): DataFrame = {
    val c = if (eager) Dedup.materialize(cnt) else cnt
    // the gate reads the materialized model's row count (free after the
    // checkpoint); the lazy face defers the same decision to AQE
    val hintModel: DataFrame => DataFrame =
      if (eager && c.count() <= maxBroadcastModelRows) df => broadcast(df)
      else identity
    val totV = classTotals(c).crossJoin(broadcast(vocabSize(c)))
    val weights = c.join(totV, Seq("label"))
      .select(col("label"), col("term"),
        expr("((cnt + 1) * 1000000000) div (tot + v)").as("w_ppb"))
    val defaults = totV.select(col("label"),
      expr("1000000000 div (tot + v)").as("dflt_ppb"))
    val tf = docs.select(col(idCol).as("doc_id"),
        col(labelCol).as("true_label"),
        explode(TextOps.words(col(textCol))).as("term"))
      .groupBy(col("doc_id"), col("true_label"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val scored = tf
      .crossJoin(broadcast(defaults)) // classes are few: the model axis
      .join(hintModel(weights), Seq("term", "label"), "left")
      .withColumn("w", coalesce(col("w_ppb"), col("dflt_ppb")))
      .groupBy(col("doc_id"), col("true_label"), col("label"))
      .agg(sum(col("tf") * col("w")).as("score_ppb"))
    graft.operators.Relational.topKPerKey(scored,
      Seq(col("doc_id")), Seq(col("score_ppb").desc, col("label").asc), 1)
      .select(col("doc_id"), col("true_label"),
        col("label").as("pred_label"), col("score_ppb"))
  }

  /** Per-class evaluation of a (doc_id, true_label, pred_label, …)
    * confusion feed ([[predict]]'s output): (label, n_true, n_pred, tp,
    * precision_ppm, recall_ppm) — exact integer parts-per-million, so the
    * curation gate's quality is a hash-gated FACT, not a float summary.
    * Classes appear whether seen as truth, as prediction, or both (full
    * outer over the two marginals); a class never predicted has
    * precision 0 by convention (CASE, not a division error), and a class
    * with no true members recall 0 — both signal "look here", which is
    * the monitoring purpose. The predictions frame is folded ONCE into
    * the classes²-sized confusion matrix (one partial+final hash agg —
    * the inference pipeline upstream is never re-executed per marginal),
    * and every marginal derives from that tiny frame.
    */
  def evaluate(predictions: DataFrame): DataFrame = {
    val conf = predictions
      .groupBy(col("true_label"), col("pred_label"))
      .agg(count(lit(1)).as("cnt"))
    val act = conf.groupBy(col("true_label").as("label"))
      .agg(sum(col("cnt")).as("n_true"))
    val prd = conf.groupBy(col("pred_label").as("label"))
      .agg(sum(col("cnt")).as("n_pred"))
    val tp = conf.filter(col("true_label") === col("pred_label"))
      .select(col("true_label").as("label"), col("cnt").as("tp"))
    act.join(prd, Seq("label"), "full_outer")
      .join(tp, Seq("label"), "left")
      .select(col("label"),
        coalesce(col("n_true"), lit(0L)).as("n_true"),
        coalesce(col("n_pred"), lit(0L)).as("n_pred"),
        coalesce(col("tp"), lit(0L)).as("tp"))
      .withColumn("precision_ppm",
        expr("CASE WHEN n_pred = 0 THEN 0 ELSE (tp * 1000000) div n_pred END"))
      .withColumn("recall_ppm",
        expr("CASE WHEN n_true = 0 THEN 0 ELSE (tp * 1000000) div n_true END"))
  }

  /** (label, term, cnt) term counts — [[ClassifyStore]]'s partial unit. */
  private[text] def termCounts(docs: DataFrame, labelCol: String,
                               textCol: String): DataFrame =
    docs.select(col(labelCol).as("label"),
        explode(TextOps.words(col(textCol))).as("term"))
      .groupBy(col("label"), col("term"))
      .agg(count(lit(1)).as("cnt"))

  private def classTotals(cnt: DataFrame): DataFrame =
    cnt.groupBy(col("label")).agg(sum(col("cnt")).as("tot"))

  private def vocabSize(cnt: DataFrame): DataFrame =
    cnt.select(col("term")).distinct().agg(count(lit(1)).as("v"))
}
