package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted classifier-count store ([[Classify]]'s build/serve split):
  * each drop contributes its (label, term, cnt) term counts, and the
  * served model is trained on the ENTIRE ingest history from one store
  * scan — labeled corpora accrue daily without any earlier drop being
  * re-tokenized. Counts SUM across drops (drops partition the labeled
  * corpus), and the Laplace weights / class totals / vocabulary are
  * derived from the merged counts at serve time, so the served model is
  * bit-identical to training from scratch on the union (q169's gate).
  *
  * The sum-merge makes takedown EXACT UNLEARNING: deleting a drop's
  * count rows re-derives precisely the model that never saw that drop —
  * the machine-unlearning contract a compliance ticket needs from a
  * learned component, gated as q170 (post-takedown predictions ≡
  * never-ingested, not approximately but hash-identically). Most learned
  * models can only retrain to forget; a count-factored model forgets by
  * subtraction, which is the reason the classifier's training state is
  * persisted as counts rather than as finished weights.
  *
  * Lifecycle is the shared [[graft.operators.DropLedger]] discipline
  * (atomic per-drop subdir append, staged commit-last, crash-safe swaps,
  * loud double-remove). No tunable configuration is stamped: tokenization
  * is the corpus contract and smoothing is derived, not stored.
  */
object ClassifyStore extends graft.operators.DropLedger {

  protected def tableName: String = "classcounts"
  protected def kind: String = "classifier store"

  /** (drop_id, label, term, cnt) for one drop of labeled docs. */
  def partials(docs: DataFrame, dropId: String, labelCol: String = "lang",
               textCol: String = "text"): DataFrame = {
    requireDropId(dropId)
    Classify.termCounts(docs, labelCol, textCol)
      .select(lit(dropId).as("drop_id"), col("label"), col("term"), col("cnt"))
  }

  /** Bootstrap from the first drop (overwrites). */
  def build(docs: DataFrame, storeDir: String, dropId: String,
            labelCol: String = "lang", textCol: String = "text"): Unit =
    buildStaged(docs, storeDir, dropId, labelCol, textCol)()

  def buildStaged(docs: DataFrame, storeDir: String, dropId: String,
                  labelCol: String = "lang",
                  textCol: String = "text"): () => Unit =
    stagePartialsBuild(partials(docs, dropId, labelCol, textCol),
      storeDir).commit

  /** Append a new drop's counts (staged, single-rename atomic commit).
    * Refuses a stored id — re-appending would double-count under the
    * sum-merge.
    */
  def appendStaged(docs: DataFrame, storeDir: String, dropId: String,
                   labelCol: String = "lang",
                   textCol: String = "text"): () => Unit = {
    val s = docs.sparkSession
    requireStore(s, storeDir)
    requireNewDrop(s, storeDir, dropId)
    stagePartialsAppend(partials(docs, dropId, labelCol, textCol),
      storeDir, dropId).commit
  }

  def append(docs: DataFrame, storeDir: String, dropId: String,
             labelCol: String = "lang", textCol: String = "text"): Unit =
    appendStaged(docs, storeDir, dropId, labelCol, textCol)()

  /** Merged (label, term, cnt) across surviving drops — exactly
    * `Classify.termCounts` of the union corpus. A drained store refuses
    * (a model with zero classes predicts nothing; silence would mask a
    * takedown bug).
    */
  def serveCounts(s: SparkSession, storeDir: String): DataFrame = {
    requireStore(s, storeDir)
    require(drops(s, storeDir).nonEmpty,
      s"$kind $storeDir has no drops (every drop was removed) — " +
        "build or append before serving")
    load(s, storeDir).groupBy(col("label"), col("term"))
      .agg(sum(col("cnt")).as("cnt"))
  }

  /** The served model as weights: (label, term, w_ppb) — bit-identical
    * to `Classify.trainWeights` on the union of surviving drops.
    */
  def serveWeights(s: SparkSession, storeDir: String): DataFrame = {
    val cnt = serveCounts(s, storeDir)
    val totV = cnt.groupBy(col("label")).agg(sum(col("cnt")).as("tot"))
      .crossJoin(broadcast(
        cnt.select(col("term")).distinct().agg(count(lit(1)).as("v"))))
    cnt.join(totV, Seq("label"))
      .select(col("label"), col("term"),
        expr("((cnt + 1) * 1000000000) div (tot + v)").as("w_ppb"))
  }

  /** Classify docs with the store-trained model — bit-identical to
    * `Classify.predict` trained from scratch on the union corpus (q169's
    * gate; q170 re-gates it after a takedown). Read-only. `eager = false`
    * is the SQL-TVF face (no job at analysis; AQE size-gates the model
    * join at runtime — see [[Classify.predictWithCounts]]).
    */
  def predictVsStore(docs: DataFrame, storeDir: String,
                     labelCol: String = "lang", idCol: String = "doc_id",
                     textCol: String = "text",
                     eager: Boolean = true): DataFrame =
    Classify.predictWithCounts(
      serveCounts(docs.sparkSession, storeDir), docs, labelCol, idCol,
      textCol, eager = eager)
}
