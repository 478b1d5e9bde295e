package graft.vector

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ANN index lifecycle: train once, serve many.
  *
  * [[build]] trains the IVF coarse quantizer and the PQ codebooks, encodes
  * the corpus, and persists the whole index as three parquet tables under
  * `indexDir`:
  *
  *   - `centroids` (cid, cq) — the coarse cells (driver-sized: nCells rows)
  *   - `codebooks` (j, code, cq) — the PQ model (driver-sized: m×k rows)
  *   - `codes` (vec_id, cid, codes) — the big table: home cell + m small
  *     codes per corpus vector. This is the ONLY table that scales with
  *     the corpus, and it is the m-bytes-per-vector scan the PQ deal is
  *     about — queries never touch the raw vectors except in the exact
  *     re-rank of a top-R candidate set.
  *
  * [[ivfPqTopK]] answers queries from the stored index: the two model
  * tables are collected (driver-sized by construction), the codes table is
  * scanned as-is, and only the QUERY vectors (nQueries rows) do any
  * ranking work — no training, no corpus-wide cell assignment, no
  * re-encoding. That turns the per-call cost from O(corpus × iters) into
  * O(queries × cells + candidates), which is the difference between an
  * index and a cache.
  *
  * Everything stored is exact integers (the quantized grid of VectorOps),
  * so a loaded index reproduces the fresh-trained results BIT-identically
  * (VectorSpec pins this), and re-running [[build]] on the same corpus
  * rewrites byte-identical tables — safe to re-entrantly rebuild.
  */
object Index {

  /** Train + encode + persist. Returns nothing: the index IS the three
    * parquet tables. Deterministic end to end (integer Lloyd, lowest-id
    * init, argmin ties to the smaller id).
    */
  def build(s: SparkSession, dir: String, indexDir: String,
            nCells: Int = 8, coarseIters: Int = 2,
            m: Int = 4, k: Int = 16, pqIters: Int = 3): Unit = {
    // ONE cached prepared scan shared by all four stages (coarse train,
    // PQ train, cell assignment, encode) — the dir-based trainCentroids /
    // Pq.train entry points each cache their own copy, which on a large
    // corpus means paying the parquet scan + quantize pass per stage
    val e = Queries.prepared(s, dir).cache()
    try {
      val coarse = Ann.trainCentroidsFrom(s, e, nCells, coarseIters)
      val model = Pq.trainFrom(s, e, m, k, pqIters)
      Ann.centroidsDF(s, coarse)
        .write.mode("overwrite").parquet(s"$indexDir/centroids")
      Pq.codebookDF(s, model)
        .write.mode("overwrite").parquet(s"$indexDir/codebooks")
      // one pass each for home cells and codes, joined on vec_id — both
      // are metadata-width (id + small ints), the raw vectors stay in the
      // source table
      val home = Ann.assignCells(e, Ann.centroidsDF(s, coarse))
        .select(col("vec_id"), col("cid"))
      Pq.encode(s, e, model)
        .join(home, "vec_id")
        .select(col("vec_id"), col("cid"), col("codes"))
        .write.mode("overwrite").parquet(s"$indexDir/codes")
    } finally e.unpersist()
  }

  /** Incrementally index vectors not yet in the stored codes table,
    * using the STORED models (no retraining — the coarse cells and
    * codebooks stay frozen, which is how production ANN indexes grow:
    * re-train is a scheduled rebuild, not an ingest step). Encodes and
    * cell-assigns only the new vectors (anti-join against stored ids)
    * and appends them to `codes`; the result is bit-identical to having
    * built with those vectors present, given the same models.
    *
    * Returns the number of vectors appended. The fresh frame is
    * materialized BEFORE the append write so the job never scans the
    * directory it is appending to mid-write.
    */
  def append(s: SparkSession, dir: String, indexDir: String): Long = {
    val model = loadModel(s, indexDir)
    val coarse = loadCoarse(s, indexDir)
    val existing = s.read.parquet(s"$indexDir/codes").select(col("vec_id"))
    val fresh = Queries.prepared(s, dir)
      .join(existing, Seq("vec_id"), "left_anti")
      .cache()
    try {
      val n = fresh.count() // materializes the cache: the append below reads
                            // the InMemoryRelation, not the codes dir again
      if (n > 0) {
        val home = Ann.assignCells(fresh, Ann.centroidsDF(s, coarse))
          .select(col("vec_id"), col("cid"))
        Pq.encode(s, fresh, model)
          .join(home, "vec_id")
          .select(col("vec_id"), col("cid"), col("codes"))
          .write.mode("append").parquet(s"$indexDir/codes")
      }
      n
    } finally fresh.unpersist()
  }

  /** Takedown: remove the given vectors' code rows from the index — the
    * ANN half of the store-takedown family (`ClusterStore.removeDocs`):
    * codes are per-vector rows with no rollup, so deletion is exact and
    * a removed vector can never again appear in a top-k answer. The
    * model tables (coarse centroids, PQ codebooks) stay frozen — the
    * same scheduled-rebuild contract as [[append]]; they memorize
    * nothing row-recoverable (k×dims and m×k×dims means). A removed id
    * is also free to [[append]] again (the left-anti guard no longer
    * sees it). Crash-safe `_takedown-old` swap; returns rows removed.
    */
  def removeDocs(s: SparkSession, indexDir: String, docIds: DataFrame): Long = {
    require(docIds.columns.sameElements(Array("vec_id")),
      s"docIds must be a single-column (vec_id) frame, got: ${docIds.columns.mkString(", ")}")
    val codes = new org.apache.hadoop.fs.Path(s"$indexDir/codes")
    val fs = codes.getFileSystem(s.sparkContext.hadoopConfiguration)
    // codes-missing-with-marker is a crashed swap mid-recovery, not "no
    // index" — must be the loud marker-naming error, not the bare require
    graft.operators.StoreSwap.requireNotCrashed(s, indexDir, codes.toString)
    require(fs.exists(codes), s"no codes table under $indexDir")
    val staging = new org.apache.hadoop.fs.Path(
      s"$indexDir/_staging-${java.util.UUID.randomUUID().toString.take(8)}")
    val before = s.read.parquet(codes.toString)
    before.join(docIds, Seq("vec_id"), "left_anti")
      .write.mode("overwrite").parquet(staging.toString)
    // footer-metadata counts, not data scans (parquet count pushdown)
    val removed = before.count() - s.read.parquet(staging.toString).count()
    graft.operators.StoreSwap.swapIn(s, indexDir, codes.toString,
      staging.toString, "_takedown-old")
    removed
  }

  /** Maintenance: rewrite the appended `codes` table into `targetFiles`
    * parquet files, rows identical — the small-files compaction for an
    * index that grows by daily [[append]]s (each append writes its own
    * part-files; a year of drops is hundreds of files whose open/footer
    * cost dominates the serve scan). Same crash-safe swap as
    * `text.Store.compact`: compacted copy → staging, live dir moved
    * aside, staging renamed in, old dir deleted. The model tables
    * (centroids/codebooks) are single-write and never need this.
    */
  def compact(s: SparkSession, indexDir: String, targetFiles: Int = 1): Unit = {
    require(targetFiles >= 1, s"targetFiles must be >= 1, got $targetFiles")
    val codes = new org.apache.hadoop.fs.Path(s"$indexDir/codes")
    val fs = codes.getFileSystem(s.sparkContext.hadoopConfiguration)
    graft.operators.StoreSwap.requireNotCrashed(s, indexDir, codes.toString)
    require(fs.exists(codes), s"no codes table under $indexDir")
    val staging = new org.apache.hadoop.fs.Path(
      s"$indexDir/_staging-${java.util.UUID.randomUUID().toString.take(8)}")
    s.read.parquet(codes.toString).coalesce(targetFiles)
      .write.mode("overwrite").parquet(staging.toString)
    graft.operators.StoreSwap.swapIn(s, indexDir, codes.toString,
      staging.toString, "_compact-old")
  }

  /** The stored coarse model, sorted by cell id. */
  def loadCoarse(s: SparkSession, indexDir: String): Seq[(Long, Seq[Long])] =
    s.read.parquet(s"$indexDir/centroids")
      .select(col("cid"), col("cq"))
      .as[(Long, Seq[Long])](org.apache.spark.sql.Encoders.product[(Long, Seq[Long])])
      .collect().toSeq.sortBy(_._1)

  /** The stored PQ model; m and dsub are recovered from the table shape. */
  def loadModel(s: SparkSession, indexDir: String): Pq.Model = {
    val rows = s.read.parquet(s"$indexDir/codebooks")
      .select(col("j"), col("code"), col("cq"))
      .as[(Int, Int, Seq[Long])](org.apache.spark.sql.Encoders.product[(Int, Int, Seq[Long])])
      .collect()
    require(rows.nonEmpty, s"no codebooks found under $indexDir")
    val books = rows.groupBy(_._1).toSeq.sortBy(_._1).map { case (_, b) =>
      b.sortBy(_._2).map(_._3).toSeq
    }
    val kCodes = books.head.size
    require(books.forall(_.size == kCodes),
      s"codebooks table is ragged (expected $kCodes codes per subspace)")
    Pq.Model(books.size, books.head.head.size, books)
  }

  /** IVF-PQ top-k served from the stored index — same semantics and
    * bit-identical results as a fresh `Pq.ivfPqTopK` with the same
    * (nCells, m, k, iters) training, without retraining or re-encoding.
    */
  def ivfPqTopK(s: SparkSession, dir: String, indexDir: String,
                nQueries: Int, k: Int, nprobe: Int = 1,
                rerank: Int = 0): DataFrame = {
    // the one corpus-sized table is passed whole: cid and codes live in
    // the same row, so the serve path scans it once and never pays a
    // reunite join (passing them as two selects would read it twice)
    Pq.ivfPqTopK(s, dir, nQueries, k,
      loadModel(s, indexDir), loadCoarse(s, indexDir), nprobe, rerank,
      precomputedIndex = Some(s.read.parquet(s"$indexDir/codes")))
  }
}
