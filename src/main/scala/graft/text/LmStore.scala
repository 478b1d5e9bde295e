package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted, MERGEABLE n-gram count store for the LM quality gate
  * (`text.Lm`): each trusted-corpus drop contributes its exact
  * trigram/bigram/unigram counts once; the scoring model is served by
  * summing the stored partials — the trusted corpus is never re-tokenized.
  *
  * N-gram counts are the textbook algebraic merge (count tables add), so
  * the served model is EXACTLY the model `Lm.train` would produce on the
  * union of all drops — not an approximation. That makes this the
  * build/serve split q106 (MinHash signatures), q129 (cluster
  * assignments), and q136 (profile partials) established, applied to the
  * quality-LM path: a CCNet-style pipeline whose trusted corpus grows
  * monthly re-scores new crawls against `serveModel` at the cost of one
  * partials scan, instead of recounting the trusted corpus per run.
  *
  * Model pruning (`minCount`) happens at SERVE time, after the merge —
  * pruning per-drop partials would drop a gram whose count crosses the
  * threshold only across drops, silently diverging from the
  * whole-corpus model the oracle (q137) replays. Takedown
  * ([[removeDrop]], q139's gate) is exact because removal IS subtraction
  * under the sum-merge; `drop_id` is the idempotency key — a double
  * append would double-count, so it is refused.
  *
  * Storage: ONE parquet table `counts` (drop_id, n, g, c) — n ∈ {1,2,3},
  * `g` the space-joined gram, `c` its exact count in that drop. The table
  * scales with n-gram TYPES per drop (Zipf: types ≪ tokens); `serveModel`
  * is one partial/final sum-aggregation per order, partitioned by gram
  * key. Lifecycle (atomic per-drop appends, crash-loud exists, staged
  * commits, takedown/compaction swaps) is the shared
  * [[graft.operators.DropLedger]] discipline.
  */
object LmStore extends graft.operators.DropLedger {

  protected def tableName: String = "counts"
  protected def kind: String = "LM store"

  def countsPath(storeDir: String): String = tablePath(storeDir)

  /** (drop_id, n, g, c) for one drop: `Lm.train`'s three counting passes,
    * tagged by order and stacked into the one mergeable table.
    */
  def partials(trusted: DataFrame, dropId: String,
               textCol: String = "text"): DataFrame = {
    requireDropId(dropId)
    val m = Lm.train(trusted, textCol) // unpruned: partials must stay exact
    m.c3.withColumn("n", lit(3))
      .unionByName(m.c2.withColumn("n", lit(2)))
      .unionByName(m.c1.withColumn("n", lit(1)))
      .select(lit(dropId).as("drop_id"), col("n"), col("g"), col("c"))
  }

  /** A staged drop, not yet visible to the store: `counts` is the drop's
    * MATERIALIZED partials (read back from the staging parquet — serving
    * from it costs a scan, never a re-tokenize), `commit` the atomic
    * publish. Lets a caller score against store ∪ staged-drop while
    * keeping the actual mutation for after its own output commits
    * (the CLI's store-mutation-commits-LAST discipline).
    */
  final case class Staged(counts: DataFrame, commit: () => Unit)

  /** Bootstrap from the first trusted drop (overwrites). */
  def build(trusted: DataFrame, storeDir: String, dropId: String,
            textCol: String = "text"): Unit =
    buildStaged(trusted, storeDir, dropId, textCol)()

  /** [[build]] split compute-now / commit-later (`text.Store`'s
    * crash-retry discipline).
    */
  def buildStaged(trusted: DataFrame, storeDir: String, dropId: String,
                  textCol: String = "text"): () => Unit =
    stageBuild(trusted, storeDir, dropId, textCol).commit

  /** [[buildStaged]] that also hands back the staged counts. */
  def stageBuild(trusted: DataFrame, storeDir: String, dropId: String,
                 textCol: String = "text"): Staged = {
    val sw = stagePartialsBuild(partials(trusted, dropId, textCol), storeDir)
    Staged(trusted.sparkSession.read.parquet(sw.stagingDir), sw.commit)
  }

  /** Add a new trusted drop's counts (staged). Refuses an already-stored
    * `dropId` — counts merge by sum, so a double append double-counts.
    */
  def appendStaged(trusted: DataFrame, storeDir: String, dropId: String,
                   textCol: String = "text"): () => Unit =
    stageAppend(trusted, storeDir, dropId, textCol).commit

  /** [[appendStaged]] that also hands back the staged counts. */
  def stageAppend(trusted: DataFrame, storeDir: String, dropId: String,
                  textCol: String = "text"): Staged = {
    val s = trusted.sparkSession
    requireStore(s, storeDir)
    requireNewDrop(s, storeDir, dropId)
    val sw = stagePartialsAppend(partials(trusted, dropId, textCol),
      storeDir, dropId)
    Staged(s.read.parquet(sw.stagingDir), sw.commit)
  }

  def append(trusted: DataFrame, storeDir: String, dropId: String,
             textCol: String = "text"): Unit =
    appendStaged(trusted, storeDir, dropId, textCol)()

  /** The merged scoring model: per order, counts summed across drops —
    * bit-identical to `Lm.train` on the union of every stored drop
    * (count addition is exact), with `minCount` pruning applied AFTER
    * the merge. One sum-aggregation per order over the partials table.
    */
  def serveModel(s: SparkSession, storeDir: String,
                 minCount: Long = 1L): Lm.Model = {
    requireStore(s, storeDir)
    serveModelWith(s, storeDir, extra = None, minCount)
  }

  /** The model the store WOULD serve after committing `extra` (a staged
    * drop's partials, [[Staged.counts]]) — counts add, so this is exactly
    * [[serveModel]] post-commit, computed pre-commit. An absent store
    * with a staged bootstrap serves the staged counts alone.
    */
  def serveModelWith(s: SparkSession, storeDir: String,
                     extra: Option[DataFrame],
                     minCount: Long = 1L): Lm.Model = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    val counts = (if (exists(s, storeDir)) Some(load(s, storeDir)) else None,
        extra) match {
      case (Some(b), Some(e)) => b.unionByName(e)
      case (Some(b), None)    => b
      case (None, Some(e))    => e
      case (None, None)       => throw new IllegalArgumentException(
        s"no LM store under $storeDir and no staged drop to serve")
    }
    def order(n: Int, prune: Boolean): DataFrame = {
      val merged = counts.filter(col("n") === n)
        .groupBy(col("g")).agg(sum(col("c")).as("c"))
      if (prune && minCount > 1) merged.filter(col("c") >= minCount) else merged
    }
    val c1 = order(1, prune = false)
    Lm.Model(order(3, prune = true), order(2, prune = true), c1,
      c1.agg(sum(col("c")).cast("long").as("t")))
  }

  /** Score documents against the store-served model — `Lm.score` under
    * [[serveModel]]; the recurring-run entry point.
    */
  def scoreVsStore(docs: DataFrame, storeDir: String,
                   minCount: Long = 1L, idCol: String = "doc_id",
                   textCol: String = "text"): DataFrame =
    Lm.score(docs, serveModel(docs.sparkSession, storeDir, minCount),
      idCol, textCol)
}
