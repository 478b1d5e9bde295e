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
  * whole-corpus model the oracle (q137) replays.
  *
  * Storage: ONE parquet table `counts` (drop_id, n, g, c) — n ∈ {1,2,3},
  * `g` the space-joined gram, `c` its exact count in that drop. The table
  * scales with n-gram TYPES per drop (Zipf: types ≪ tokens); `serveModel`
  * is one partial/final sum-aggregation per order, partitioned by gram key.
  * `drop_id` is the idempotency key — double-appending a drop would
  * double its counts, so it is refused (ProfileStore's rule).
  */
object LmStore {

  def countsPath(storeDir: String): String = s"$storeDir/counts"

  /** (drop_id, n, g, c) for one drop: `Lm.train`'s three counting passes,
    * tagged by order and stacked into the one mergeable table.
    */
  def partials(trusted: DataFrame, dropId: String,
               textCol: String = "text"): DataFrame = {
    require(dropId.matches("[A-Za-z0-9._-]+"),
      s"drop_id must be a plain token, got '$dropId'")
    val m = Lm.train(trusted, textCol) // unpruned: partials must stay exact
    m.c3.withColumn("n", lit(3))
      .unionByName(m.c2.withColumn("n", lit(2)))
      .unionByName(m.c1.withColumn("n", lit(1)))
      .select(lit(dropId).as("drop_id"), col("n"), col("g"), col("c"))
  }

  def exists(s: SparkSession, storeDir: String): Boolean = {
    // loud on a crashed swap: live-missing-with-marker must never read
    // as "no store" (an exists-gated bootstrap would abandon the ledger)
    graft.operators.StoreSwap.requireNotCrashed(s, storeDir, countsPath(storeDir))
    val p = new org.apache.hadoop.fs.Path(countsPath(storeDir))
    p.getFileSystem(s.sparkContext.hadoopConfiguration).exists(p)
  }

  /** The bootstrap drop's files sit at the table root; appended drops
    * each live in their own `drop-<id>/` subdirectory (the single-rename
    * atomic commit — [[graft.operators.StoreSwap.commitDropDir]]), and a
    * takedown/compact rewrite flattens everything back to root files.
    * `recursiveFileLookup` reads all three layouts in one pass.
    */
  def load(s: SparkSession, storeDir: String): DataFrame =
    s.read.option("recursiveFileLookup", "true").parquet(countsPath(storeDir))

  /** Drop ids already counted (driver-sized: one string per drop). */
  def drops(s: SparkSession, storeDir: String): Set[String] =
    if (!exists(s, storeDir)) Set.empty
    else load(s, storeDir).select(col("drop_id")).distinct()
      .collect().map(_.getString(0)).toSet

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
    val s = trusted.sparkSession
    val staging = stagingPath(storeDir)
    partials(trusted, dropId, textCol).write.mode("overwrite").parquet(staging)
    Staged(s.read.parquet(staging), () => {
      val fs = fileSystem(s, storeDir)
      val live = new org.apache.hadoop.fs.Path(countsPath(storeDir))
      fs.delete(live, true)
      require(fs.rename(new org.apache.hadoop.fs.Path(staging), live),
        s"could not commit staged LM store $staging -> $live")
    })
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
    require(exists(s, storeDir),
      s"no LM store under $storeDir — run LmStore.build first")
    require(!drops(s, storeDir).contains(dropId),
      s"drop '$dropId' is already counted in $storeDir — appending it again would double-count")
    val staging = stagingPath(storeDir)
    partials(trusted, dropId, textCol).write.mode("overwrite").parquet(staging)
    Staged(s.read.parquet(staging), () => graft.operators.StoreSwap
      .commitDropDir(s, countsPath(storeDir), staging, dropId))
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
    require(exists(s, storeDir),
      s"no LM store under $storeDir — run LmStore.build first")
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

  /** Takedown: remove one drop's counts from the store — the corpus-free
    * inverse of [[append]]. Because the store holds per-drop PARTIALS and
    * the merge is a sum, deleting a drop's rows makes every later
    * [[serveModel]] EXACTLY the model `Lm.train` would produce on the
    * union of the REMAINING drops — not an approximation and not a
    * re-train: a takedown request (license revocation, contaminated
    * drop, right-to-be-forgotten) is honored by one partials-table
    * rewrite, with the trusted corpus never re-read (q139's gate proves
    * post-removal serve ≡ never-ingested). Crash-safe swap: the filtered
    * copy lands in staging, the live table moves aside, staging renames
    * in — a crash leaves the old store live or intact under
    * `_takedown-old`, never half-removed (double-running a takedown is
    * refused by the drops() check, so a retry after the final delete is
    * loud, not silently destructive).
    */
  def removeDrop(s: SparkSession, storeDir: String, dropId: String): Unit = {
    require(exists(s, storeDir),
      s"no LM store under $storeDir — run LmStore.build first")
    require(drops(s, storeDir).contains(dropId),
      s"drop '$dropId' is not in $storeDir — nothing to remove")
    val staging = stagingPath(storeDir)
    load(s, storeDir).filter(col("drop_id") =!= dropId)
      .write.mode("overwrite").parquet(staging)
    graft.operators.StoreSwap.swapIn(s, storeDir, countsPath(storeDir),
      staging, "_takedown-old")
  }

  /** Maintenance: rewrite the counts table into `targetFiles` files,
    * contents identical (crash-safe swap — `text.Store.compact`).
    */
  def compact(s: SparkSession, storeDir: String, targetFiles: Int = 1): Unit = {
    require(targetFiles >= 1, s"targetFiles must be >= 1, got $targetFiles")
    require(exists(s, storeDir), s"no LM store under $storeDir")
    val staging = stagingPath(storeDir)
    load(s, storeDir).coalesce(targetFiles)
      .write.mode("overwrite").parquet(staging)
    graft.operators.StoreSwap.swapIn(s, storeDir, countsPath(storeDir),
      staging, "_compact-old")
  }

  private def stagingPath(storeDir: String): String =
    s"$storeDir/_staging-${java.util.UUID.randomUUID().toString.take(8)}"

  private def fileSystem(s: SparkSession, dir: String) =
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
}
