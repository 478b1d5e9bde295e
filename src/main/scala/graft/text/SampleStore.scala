package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted bottom-k document sample ([[KmvSample]]'s build/serve
  * split) — the corpus's standing uniform sample: each drop contributes
  * its own k sample rows, and the served sample of the whole ingest
  * history is the k smallest hashes over drops×k stored rows —
  * metadata-scale, history never re-read. Correct because bottom-k is
  * an ORDER-STATISTIC merge: any doc in the union's bottom-k has,
  * within its own drop, rank ≤ its global rank ≤ k, so it is present
  * among that drop's stored rows — the union of per-drop bottom-k's is
  * a superset of the union's bottom-k, and one more k-cut over the
  * stored rows lands exactly on the from-scratch sample (q196's gate;
  * drops must PARTITION the docs, as for the sum-merge families —
  * a doc ingested twice is two candidate rows).
  *
  * Takedown has the same superset shape: removing a drop deletes its
  * sample ROWS, and every member of the remaining corpus's bottom-k
  * still sits in its own surviving drop's rows, so the re-cut is
  * exactly the never-ingested sample (q197's gate) — exact like the
  * sum-merge ledgers, by subset argument rather than subtraction.
  * Doc-granular purge is the one op order statistics do NOT give for
  * free (deleting a sampled row loses the drop's (k+1)-th candidate,
  * like the max-merge registers): [[purgeDocs]] REBUILDS the named
  * drop's k rows from its remaining raw docs — the
  * [[graft.operators.DropLedger.replaceDropRows]] recipe shared with
  * [[SketchStore]].
  *
  * What this buys at 100 TB: "k uniformly random docs of everything
  * ingested so far" — the eval carve-out, labeling batch, or drift
  * audit — answered from drops×k stored rows; and because the rank-j
  * prefix of a bottom-k sample is itself the exact bottom-j sample,
  * one store serves every audit size ≤ k. Each row carries (lang,
  * n_tokens) captured at ingest, so sample-estimated corpus statistics
  * ([[KmvSample.auditMeanTokens]], q198) never touch raw text.
  *
  * Storage: one parquet table `kmvsample` (drop_id, cfg, hv, doc_id,
  * lang, n_tokens); `cfg` stamps k and the hash recipe — samples cut
  * at different k are incommensurable (a k=64 drop inside a k=128
  * store would silently bias the merge), so append and serve validate
  * it single-valued and loud (the [[ChunkStore]] rule). Lifecycle is
  * the shared [[graft.operators.DropLedger]] discipline.
  */
object SampleStore extends graft.operators.DropLedger {

  protected def tableName: String = "kmvsample"
  protected def kind: String = "sample store"

  private def cfgOf(k: Int, stratified: Boolean): String =
    s"k$k-md5id" + (if (stratified) "-bylang" else "")

  private def kOf(cfg: String): Int = cfg.drop(1).takeWhile(_ != '-').toInt

  private def isStratified(cfg: String): Boolean = cfg.endsWith("-bylang")

  /** (drop_id, cfg, hv, doc_id, lang, n_tokens) for one drop — ≤ k
    * rows global (fewer iff the drop holds fewer docs), ≤ k × strata
    * rows stratified (the per-LANGUAGE bottom-k, cut by the
    * bounded-heap [[graft.operators.Relational.topKPerKey]] exec — a
    * standing BALANCED sample: strata keep their k regardless of the
    * corpus's language mix). Same table schema either way; the cfg
    * stamp keeps the two cut disciplines incommensurable.
    */
  def partials(docs: DataFrame, dropId: String, k: Int = KmvSample.K,
               stratified: Boolean = false): DataFrame = {
    requireDropId(dropId)
    val cut =
      if (!stratified) KmvSample.sample(docs, k)
      else graft.operators.Relational.topKPerKey(
        docs.select(col("lang"), KmvSample.hashOf(col("doc_id")).as("hv"),
          col("doc_id"),
          size(TextOps.words(col("text"))).cast("long").as("n_tokens")),
        keys = Seq(col("lang")),
        order = Seq(col("hv").asc, col("doc_id").asc), k = k)
    cut.select(lit(dropId).as("drop_id"),
      lit(cfgOf(k, stratified)).as("cfg"),
      col("hv"), col("doc_id"), col("lang"), col("n_tokens"))
  }

  /** The store's config stamp — single-valued or loud; a drained store
    * (every drop removed) refuses here, the family rule.
    */
  def storedCfg(s: SparkSession, storeDir: String): String = {
    requireStore(s, storeDir)
    val cfgs = load(s, storeDir).select(col("cfg")).distinct()
      .collect().map(_.getString(0))
    require(cfgs.nonEmpty,
      s"$kind $storeDir has no drops (every drop was removed) — " +
        "build or append before serving")
    require(cfgs.length == 1,
      s"$kind $storeDir holds mixed sample configs " +
        s"${cfgs.sorted.mkString(", ")} — corrupt")
    cfgs.head
  }

  /** Bootstrap from the first drop (overwrites). */
  def build(docs: DataFrame, storeDir: String, dropId: String,
            k: Int = KmvSample.K, stratified: Boolean = false): Unit =
    buildStaged(docs, storeDir, dropId, k, stratified)()

  def buildStaged(docs: DataFrame, storeDir: String, dropId: String,
                  k: Int = KmvSample.K,
                  stratified: Boolean = false): () => Unit =
    stagePartialsBuild(partials(docs, dropId, k, stratified),
      storeDir, coalesceTo = Some(1)).commit

  /** Append a new drop's sample rows (staged, single-rename atomic
    * commit). Refuses a stored id and inherits the store's k AND cut
    * discipline (global vs per-language) — a caller cannot mix either.
    */
  def appendStaged(docs: DataFrame, storeDir: String,
                   dropId: String): () => Unit = {
    val s = docs.sparkSession
    val cfg = storedCfg(s, storeDir)
    requireNewDrop(s, storeDir, dropId)
    stagePartialsAppend(partials(docs, dropId, kOf(cfg), isStratified(cfg)),
      storeDir, dropId, coalesceTo = Some(1)).commit
  }

  def append(docs: DataFrame, storeDir: String, dropId: String): Unit =
    appendStaged(docs, storeDir, dropId)()

  /** The served sample: (rank, hv, doc_id, lang, n_tokens) — the k
    * smallest hashes over surviving drops' stored rows, exactly
    * [[KmvSample.sample]] of the union corpus (q196's gate). drops×k
    * rows in, k out.
    */
  def serveSample(s: SparkSession, storeDir: String): DataFrame = {
    val cfg = storedCfg(s, storeDir)
    require(!isStratified(cfg),
      s"$kind $storeDir was built per-language ($cfg) — serve it with " +
        "serveStratified; a global re-cut over per-stratum partials " +
        "would NOT be the corpus's global bottom-k")
    KmvSample.withRank(graft.operators.Relational.topK(
      load(s, storeDir)
        .select(col("hv"), col("doc_id"), col("lang"), col("n_tokens")),
      kOf(cfg), col("hv").asc, col("doc_id").asc))
  }

  /** The served BALANCED sample: (lang, hv, doc_id, n_tokens) — the k
    * smallest hashes PER LANGUAGE over surviving drops' stored rows,
    * exactly the per-stratum cut of the union corpus (q200's gate —
    * the order-statistic merge argument applies within each stratum
    * independently). drops × k × strata rows in, ≤ k × strata out,
    * re-cut by the same bounded-heap exec. Refuses a global store: a
    * per-language cut over GLOBAL partials would under-serve minority
    * languages (their rows lose the global cut before reaching the
    * stratum heap).
    */
  def serveStratified(s: SparkSession, storeDir: String): DataFrame = {
    val cfg = storedCfg(s, storeDir)
    require(isStratified(cfg),
      s"$kind $storeDir was built globally ($cfg) — serve it with " +
        "serveSample; minority strata are not fully represented in " +
        "global partials")
    graft.operators.Relational.topKPerKey(
      load(s, storeDir)
        .select(col("lang"), col("hv"), col("doc_id"), col("n_tokens")),
      keys = Seq(col("lang")),
      order = Seq(col("hv").asc, col("doc_id").asc), k = kOf(cfg))
  }

  /** Doc-granular PURGE — order statistics, like the max-merge
    * registers, hold no subtractable per-doc contribution beyond the
    * sampled rows themselves (deleting one loses the drop's (k+1)-th
    * candidate), so the ledger REBUILDS: re-cut drop `dropId`'s k rows
    * from its remaining raw docs and swap atomically. Serve afterwards
    * ≡ a from-scratch store whose drop never contained the purged docs.
    * Cost: one scan of THAT DROP's raw docs — never the history.
    */
  def purgeDocs(remainingDocs: DataFrame, storeDir: String,
                dropId: String): Unit = {
    val s = remainingDocs.sparkSession
    val cfg = storedCfg(s, storeDir)
    replaceDropRows(s, storeDir, dropId,
      partials(remainingDocs, dropId, kOf(cfg), isStratified(cfg)))
  }
}
