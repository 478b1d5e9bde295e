package graft.vector

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization: compress each vector to `m` small codes (one
  * argmin-L2 codebook entry per subspace) and score queries against the
  * CODES via ADC (asymmetric distance computation) lookup tables — never
  * against the raw vectors.
  *
  * This is the 100 TB memory lever of the modern ANN stack (IVF-PQ): the
  * candidate scan touches m bytes per vector instead of dims×4, so a
  * billion-vector index fits where raw vectors can't, and the scan is a
  * table lookup per subspace instead of a dims-long dot product. Recall is
  * bounded by quantization error — tuned by m (subspaces) and k (codes per
  * book) — and production systems re-rank the ADC top-R with exact
  * distances, which is exactly what [[pqTopK]]'s `rerank` flag does here.
  *
  * Everything is deterministic and integer-exact end to end: codebooks are
  * integer-grid Lloyd (Ann.lloyd — lowest-id init, floor-div means), code
  * assignment and ADC tables are exact integer d², ties break to the
  * smaller code/id. The model (m × k × dsub longs) is driver-sized by
  * definition; training and encoding only ever shuffle (cell, dim) sums
  * and per-vector codes.
  */
object Pq {

  /** codebooks(j) = the k centroids of subspace j, index = code. */
  final case class Model(m: Int, dsub: Int, codebooks: Seq[Seq[Seq[Long]]])

  /** (j, code, cq) rows over the codebooks, for broadcast joins. */
  private[vector] def codebookDF(s: SparkSession, model: Model): DataFrame = {
    import s.implicits._
    model.codebooks.zipWithIndex.flatMap { case (book, j) =>
      book.zipWithIndex.map { case (cq, code) => (j, code, cq) }
    }.toDF("j", "code", "cq")
  }

  /** Per-subspace slice of the full quantized vector (1-based slice). */
  private def subvec(q: org.apache.spark.sql.Column, j: Int, dsub: Int) =
    slice(q, j * dsub + 1, dsub)

  /** Train m codebooks of k codes each: independent integer Lloyd per
    * subspace over the sliced vectors.
    */
  def train(s: SparkSession, dir: String, m: Int = 4, k: Int = 16,
            iters: Int = 3): Model = {
    val e = Queries.prepared(s, dir).select(col("vec_id"), col("q")).cache()
    try trainFrom(s, e, m, k, iters) finally e.unpersist()
  }

  /** [[train]] over an ALREADY-prepared (and ideally cached) frame — for
    * callers like `Index.build` sharing one prepared scan across stages.
    */
  def trainFrom(s: SparkSession, prepared: DataFrame, m: Int, k: Int,
                iters: Int): Model = {
    val e = prepared.select(col("vec_id"), col("q"))
    val dimsRow = e.select(size(col("q"))).limit(1).collect()
    require(dimsRow.nonEmpty, "PQ training needs a non-empty embeddings frame")
    val dims = dimsRow(0).getInt(0)
    require(dims % m == 0, s"m=$m must divide dims=$dims")
    val dsub = dims / m
    val books = (0 until m).map { j =>
      val sub = e.select(col("vec_id"), subvec(col("q"), j, dsub).as("q"))
        .withColumn("n2", graft.functions.VectorDot.of(col("q"), col("q")))
        .cache()
      try {
        val model = Ann.lloyd(s, sub, k, iters)
        model.sortBy(_._1).map(_._2) // code = position (init ids are 0..k-1)
      } finally sub.unpersist()
    }
    Model(m, dsub, books)
  }

  /** Encode every vector to its m codes: one broadcast crossJoin with the
    * m×k codebook rows, per-(vector, subspace) argmin-L2, codes gathered
    * in subspace order. Map-only up to the per-vector argmin windows.
    * Returns (vec_id, codes: array<int>).
    */
  def encode(s: SparkSession, prepared: DataFrame, model: Model): DataFrame = {
    val w = Window.partitionBy(col("vec_id"), col("j"))
      .orderBy(col("d2").asc, col("code").asc)
    prepared.select(col("vec_id"), col("q"))
      .crossJoin(broadcast(codebookDF(s, model)))
      .withColumn("subq", slice(col("q"), col("j") * model.dsub + 1, lit(model.dsub)))
      .withColumn("d2",
        graft.functions.VectorDot.of(col("subq"), col("subq"))
          - lit(2) * graft.functions.VectorDot.of(col("subq"), col("cq"))
          + graft.functions.VectorDot.of(col("cq"), col("cq")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .groupBy(col("vec_id"))
      .agg(transform(array_sort(collect_list(struct(col("j"), col("code")))),
        e => e.getField("code")).as("codes"))
  }

  /** [[encode]] straight from a testdata dir (the quantized read used by
    * every vector query) — the index-build step callers persist/write
    * once and hand to [[pqTopK]] many times.
    */
  def encodeFromDir(s: SparkSession, dir: String, model: Model): DataFrame =
    encode(s, Queries.prepared(s, dir), model)

  /** ADC top-k: query vectors get an m×k lookup table of exact integer
    * sub-distances (tiny — one broadcast join against the codebooks), and
    * every encoded vector is scored by m TABLE LOOKUPS (sum over
    * subspaces of lut[j·k + code_j]) — the raw vectors never flow through
    * the scan. With `rerank` ≥ k, the ADC top-`rerank` per query is
    * re-scored with exact integer cosine and re-ranked — the standard
    * two-stage shape (cheap approximate scan → exact re-rank of a small
    * candidate set).
    */
  def pqTopK(s: SparkSession, dir: String, nQueries: Int, k: Int,
             model: Model, rerank: Int = 0,
             precomputedCodes: Option[DataFrame] = None): DataFrame = {
    val e = Queries.prepared(s, dir)
    // the scan side holds ONLY (id, codes) — m small ints per vector.
    // Pass `precomputedCodes` (an encode() output, typically persisted or
    // written as the index table) to skip re-encoding the base — encoding
    // once at build time and scanning codes many times IS the PQ deal.
    val baseCodes = precomputedCodes.getOrElse(encode(s, e, model))
      .select(col("vec_id").as("b_id"), col("codes"))
    val queries = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("a_id"), col("q").as("aq"), col("n2").as("na"))
    // exhaustive ADC: every (query, vector) pair is a candidate
    val candidates = baseCodes.join(broadcast(lutsFor(s, queries, model)),
      col("a_id") =!= col("b_id"))
    finishTopK(adcScore(candidates, model), e, queries, k, rerank)
  }

  /** IVF-PQ proper: candidates restricted to the query's `nprobe` nearest
    * coarse cells (Ann.rankCells — the same L2 ranking the coarse
    * quantizer trains with), then ADC-scored and optionally exact
    * re-ranked. The full modern ANN index: coarse cells cut the scan to
    * ~nprobe/cells of the corpus, PQ codes cut the bytes per scanned
    * vector to m, and the re-rank restores recall — three independent
    * knobs (nprobe, m, rerank).
    */
  def ivfPqTopK(s: SparkSession, dir: String, nQueries: Int, k: Int,
                model: Model, coarse: Seq[(Long, Seq[Long])], nprobe: Int = 1,
                rerank: Int = 0,
                precomputedCodes: Option[DataFrame] = None,
                precomputedHome: Option[DataFrame] = None,
                precomputedIndex: Option[DataFrame] = None): DataFrame = {
    val e = Queries.prepared(s, dir)
    val cents = Ann.centroidsDF(s, coarse)
    val probes = Ann.rankCells(e.filter(col("vec_id") < nQueries), cents)
      .filter(col("rn") <= nprobe)
      .select(col("vec_id").as("a_id"), col("cid"))
    val queries = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("a_id"), col("q").as("aq"), col("n2").as("na"))
    // Cell-pruned candidates: equi join on cid (each base vector lives in
    // exactly ONE home cell, so probing distinct cells never duplicates).
    // A stored index passes `precomputedIndex` — (vec_id, cid, codes) in
    // one frame, because cid and codes live in the SAME parquet row — so
    // the corpus-sized table is scanned ONCE and there is no reunite
    // join. The fresh path ranks the FULL corpus once for home cells
    // (probe cells are ranked over just the nQueries query vectors —
    // deriving both from one ranked frame would run the corpus-wide
    // crossJoin+window twice), prunes to the probed cells FIRST, and only
    // then attaches codes by id to the surviving candidates.
    val pruned: DataFrame = precomputedIndex match {
      case Some(ix) =>
        probes
          .join(ix.select(col("vec_id").as("b_id"), col("cid"), col("codes")), Seq("cid"))
          .filter(col("a_id") =!= col("b_id"))
      case None =>
        val home = precomputedHome.getOrElse(
          Ann.assignCells(e, cents).select(col("vec_id"), col("cid")))
          .select(col("vec_id").as("b_id"), col("cid"))
        val baseCodes = precomputedCodes.getOrElse(encode(s, e, model))
          .select(col("vec_id").as("b_id"), col("codes"))
        probes
          .join(home, Seq("cid"))
          .filter(col("a_id") =!= col("b_id"))
          .join(baseCodes, "b_id")
    }
    val candidates = pruned.join(broadcast(lutsFor(s, queries, model)), "a_id")
    finishTopK(adcScore(candidates, model), e, queries, k, rerank)
  }

  /** Per-query LUT: lut[j·k + code + 1] = d²(subq_j(query), codebook_j[code]). */
  private def lutsFor(s: SparkSession, queries: DataFrame, model: Model): DataFrame = {
    val kCodes = model.codebooks.head.size
    queries
      .crossJoin(broadcast(codebookDF(s, model)))
      .withColumn("subq", slice(col("aq"), col("j") * model.dsub + 1, lit(model.dsub)))
      .withColumn("d2",
        graft.functions.VectorDot.of(col("subq"), col("subq"))
          - lit(2) * graft.functions.VectorDot.of(col("subq"), col("cq"))
          + graft.functions.VectorDot.of(col("cq"), col("cq")))
      .groupBy(col("a_id"))
      .agg(transform(array_sort(collect_list(struct(
        (col("j") * kCodes + col("code")).as("idx"), col("d2")))),
        x => x.getField("d2")).as("lut"))
  }

  /** ADC scan: m table lookups per candidate — raw vectors never flow
    * through this join.
    */
  private def adcScore(candidates: DataFrame, model: Model): DataFrame = {
    val kCodes = model.codebooks.head.size
    candidates.withColumn("adc",
      aggregate(
        zip_with(col("codes"), sequence(lit(0), lit(model.m - 1)),
          (c, j) => element_at(col("lut"), (j * kCodes + c + 1).cast("int"))),
        lit(0L), (acc, x) => acc + x))
  }

  /** ADC top-k, or two-stage top-k when `rerank` > 0: the ADC top-R
    * candidates fetch their raw vectors (a per-id join, NOT a scan) and
    * re-rank by exact integer cosine.
    */
  private def finishTopK(scored: DataFrame, e: DataFrame, queries: DataFrame,
                         k: Int, rerank: Int): DataFrame = {
    val wAdc = Window.partitionBy(col("a_id")).orderBy(col("adc").asc, col("b_id").asc)
    if (rerank <= 0) {
      scored.withColumn("rank", row_number().over(wAdc))
        .filter(col("rank") <= k)
        .select(col("a_id"), col("b_id"), col("rank"), col("adc"))
    } else {
      val r = math.max(rerank, k)
      val cand = scored.withColumn("rn", row_number().over(wAdc))
        .filter(col("rn") <= r)
        .select(col("a_id"), col("b_id"))
      val wSim = Window.partitionBy(col("a_id")).orderBy(col("sim").desc, col("b_id").asc)
      cand
        .join(e.select(col("vec_id").as("b_id"), col("q").as("bq"), col("n2").as("nb")), "b_id")
        .join(broadcast(queries), "a_id")
        .withColumn("dot_q", graft.functions.VectorDot.of(col("aq"), col("bq")))
        .withColumn("sim", VectorOps.cosineQ(col("dot_q"), col("na"), col("nb")))
        .withColumn("rank", row_number().over(wSim))
        .filter(col("rank") <= k)
        .select(col("a_id"), col("b_id"), col("rank"), col("sim"))
    }
  }
}
