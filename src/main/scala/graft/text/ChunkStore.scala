package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted chunk-frequency store for CDC dedup (q160/q161's build/serve
  * split): each drop contributes one (chunk_key → distinct-doc count)
  * partial over its content-defined chunks, and a NEW drop's
  * verbatim-share census against the ENTIRE ingest history is served
  * from one store scan plus the drop's own chunking — the history is
  * never re-chunked. Sum-merge (drops partition the corpus, so
  * distinct-doc counts add), the `LmStore` discipline at chunk
  * granularity; takedown is df subtraction (q163's gate).
  *
  * Why chunks get a store when spans already have one: they answer
  * different questions at different costs. The span store flags
  * ANY repeated k-gram run (gram-type-sized partials); the chunk store
  * tracks only CDC chunk boundaries (≈ one row per `divisor` tokens —
  * an order of magnitude smaller state) and detects whole verbatim
  * blocks that survive insertion shift, which is the right granularity
  * for quote/append-heavy corpora ingested daily.
  *
  * Storage: one parquet table `chunks` (drop_id, cfg, chunk_key, df_c) —
  * `cfg` stamps the chunking configuration (gram width k + divisor);
  * mismatched configs produce disjoint chunk keys and would silently
  * report everything novel, so append and serve validate it
  * single-valued and loud (ManifestStore's spec rule). Lifecycle is the
  * shared [[graft.operators.DropLedger]] discipline.
  */
object ChunkStore extends graft.operators.DropLedger {

  protected def tableName: String = "chunks"
  protected def kind: String = "chunk store"

  private def cfgOf(k: Int, divisor: Int): String = s"$k#$divisor"

  /** (drop_id, cfg, chunk_key, df_c) for one drop. */
  def partials(docs: DataFrame, dropId: String, k: Int = 3, divisor: Int = 8,
               idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    requireDropId(dropId)
    Dedup.cdcChunks(docs, k, divisor, idCol, textCol)
      .groupBy(col("chunk_key"))
      .agg(countDistinct(col("doc_id")).as("df_c"))
      .select(lit(dropId).as("drop_id"), lit(cfgOf(k, divisor)).as("cfg"),
        col("chunk_key"), col("df_c"))
  }

  /** The store's chunking configuration — single-valued or loud. */
  def storedCfg(s: SparkSession, storeDir: String): (Int, Int) = {
    requireStore(s, storeDir)
    val cfgs = load(s, storeDir).select(col("cfg")).distinct()
      .collect().map(_.getString(0))
    require(cfgs.nonEmpty,
      s"chunk store $storeDir has no drops (every drop was removed) — " +
        "build or append before serving")
    require(cfgs.length == 1,
      s"chunk store $storeDir holds mixed configs ${cfgs.sorted.mkString(", ")} — corrupt")
    val Array(k, d) = cfgs.head.split("#")
    (k.toInt, d.toInt)
  }

  /** Bootstrap from the first drop (overwrites). */
  def build(docs: DataFrame, storeDir: String, dropId: String, k: Int = 3,
            divisor: Int = 8, idCol: String = "doc_id",
            textCol: String = "text"): Unit =
    buildStaged(docs, storeDir, dropId, k, divisor, idCol, textCol)()

  def buildStaged(docs: DataFrame, storeDir: String, dropId: String,
                  k: Int = 3, divisor: Int = 8, idCol: String = "doc_id",
                  textCol: String = "text"): () => Unit =
    stagePartialsBuild(partials(docs, dropId, k, divisor, idCol, textCol),
      storeDir).commit

  /** Append a new drop's chunk partials (staged, single-rename atomic
    * commit). Refuses a stored id (sum-merge) and a config different
    * from the store's.
    */
  def appendStaged(docs: DataFrame, storeDir: String, dropId: String,
                   idCol: String = "doc_id",
                   textCol: String = "text"): () => Unit = {
    val s = docs.sparkSession
    val (k, divisor) = storedCfg(s, storeDir)
    requireNewDrop(s, storeDir, dropId)
    stagePartialsAppend(partials(docs, dropId, k, divisor, idCol, textCol),
      storeDir, dropId).commit
  }

  def append(docs: DataFrame, storeDir: String, dropId: String,
             idCol: String = "doc_id", textCol: String = "text"): Unit =
    appendStaged(docs, storeDir, dropId, idCol, textCol)()

  /** Merged chunk frequencies: (chunk_key, df) summed across drops —
    * exactly the distinct-doc counts q161 computes from a full corpus
    * chunking.
    */
  def serveStats(s: SparkSession, storeDir: String): DataFrame = {
    requireStore(s, storeDir)
    load(s, storeDir).groupBy(col("chunk_key"))
      .agg(sum(col("df_c")).as("df"))
  }

  /** CDC duplication census of a new drop against history ∪ drop —
    * bit-identical to q161 on the union corpus, restricted to the drop's
    * docs (the q162 gate): a chunk is shared iff its merged distinct-doc
    * count (stored sum + the drop's own) reaches 2. Read-only; [[append]]
    * the drop separately once accepted.
    */
  def dupStatsVsDrop(newDocs: DataFrame, storeDir: String,
                     idCol: String = "doc_id", textCol: String = "text",
                     eager: Boolean = true): DataFrame = {
    val s = newDocs.sparkSession
    val (k, divisor) = storedCfg(s, storeDir)
    val chunks0 = Dedup.cdcChunks(newDocs, k, divisor, idCol, textCol)
    // chunks feeds the drop-df agg AND the census rollup
    val chunks = if (eager) Dedup.materialize(chunks0) else chunks0
    val dup = chunks.groupBy(col("chunk_key"))
      .agg(countDistinct(col("doc_id")).as("df_d"))
      .join(serveStats(s, storeDir), Seq("chunk_key"), "left")
      .filter(col("df_d") + coalesce(col("df"), lit(0L)) >= 2)
      .select(col("chunk_key"))
    chunks.join(dup.withColumn("__dup", lit(1)), Seq("chunk_key"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(col("n_words")).as("n_words"),
        sum(when(col("__dup").isNotNull, 1L).otherwise(0L)).as("n_dup_chunks"),
        sum(when(col("__dup").isNotNull, col("n_words")).otherwise(0L))
          .as("dup_words"))
  }
}
