package graft.vector

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ANN recall/cost harness: parameterized IVF and multi-probe LSH top-k,
  * measured against the exact brute-force baseline.
  *
  * At 100 TB the number a user actually tunes is recall@k vs candidates
  * scanned — q29/q50 fix one operating point each; this module exposes the
  * knobs (`nprobe` cells for IVF, hamming-radius multi-probe for LSH) so
  * the recall curve is measurable and regression-tested (VectorSpec pins
  * floors; COVERAGE.md records the measured curve at sf0.1).
  *
  * All variants share the exact-integer scoring of `VectorOps` (decisions
  * on integer dot products, never floats), and every candidate-generation
  * join is an equi join on a bucket key — the same never-all-pairs
  * discipline as q29/q50/q61. Only the explicit `exactTopK` baseline is
  * O(queries × n), and its query side is a filtered broadcast.
  */
object Ann {

  /** Exact top-k neighbors (ground truth) for query vectors
    * `vec_id < nQueries`: brute-force scored against the whole table.
    * Output: (a_id, b_id, rank, sim).
    */
  def exactTopK(s: SparkSession, dir: String, nQueries: Int, k: Int): DataFrame = {
    val e = Queries.prepared(s, dir)
    val qs = e.filter(col("vec_id") < nQueries)
    rankTopK(withSim(
      broadcast(qs.as("a")).join(
        e.repartition(s.sparkContext.defaultParallelism * 2).as("b"),
        col("a.vec_id") =!= col("b.vec_id"))), k)
  }

  /** Lloyd k-means over the quantized vectors — trains the IVF coarse
    * quantizer instead of using raw lowest-id vectors as cells. Proper
    * Lloyd (argmin quantized L2 assignment, per-cell mean update), so the
    * L2 objective is non-increasing (up to integer-grid rounding — tested).
    * Fully deterministic: lowest-id init, per-dimension sums are exact
    * integer arithmetic, means are floor-divided back to the integer
    * grid — so the model is independent of partitioning and task order (a
    * float mean would not be: fp addition isn't associative across an
    * unordered shuffle). Per iteration: one broadcast-centroid argmin
    * assignment (map-only) + one (cell, dim) aggregation; only the k×dims
    * centroid matrix is collected — the model is driver-sized by
    * definition, the data never is. Empty cells keep their previous
    * centroid.
    */
  def trainCentroids(s: SparkSession, dir: String, k: Int,
                     iters: Int): Seq[(Long, Seq[Long])] = {
    // cache: every iteration re-reads the training set; without this the
    // scan+quantize work would repeat `iters` times
    val e = Queries.prepared(s, dir).select(col("vec_id"), col("q"), col("n2")).cache()
    try lloyd(s, e, k, iters) finally e.unpersist()
  }

  /** [[trainCentroids]] over an ALREADY-prepared (and ideally cached)
    * frame — for callers like `Index.build` that share one prepared scan
    * across training, encoding, and cell assignment instead of paying a
    * parquet scan + quantize pass per stage.
    */
  def trainCentroidsFrom(s: SparkSession, prepared: DataFrame, k: Int,
                         iters: Int): Seq[(Long, Seq[Long])] =
    lloyd(s, prepared.select(col("vec_id"), col("q"), col("n2")), k, iters)

  /** The Lloyd loop over ANY (vec_id, q, n2) frame — shared by the IVF
    * coarse quantizer ([[trainCentroids]]) and the per-subspace PQ
    * codebooks ([[Pq.train]]). Callers cache `data` (each iteration
    * re-reads it).
    */
  private[vector] def lloyd(s: SparkSession, data: DataFrame, k: Int,
                            iters: Int): Seq[(Long, Seq[Long])] = {
    // init from the k SMALLEST ids, not filter(id < k): after sampling or
    // dedup ids are sparse/offset, and a < k filter would silently train
    // fewer than k cells (shrinking every downstream IVF/PQ index)
    var model: Seq[(Long, Seq[Long])] = data.orderBy(col("vec_id")).limit(k)
      .select(col("vec_id"), col("q")).as[(Long, Seq[Long])](
        org.apache.spark.sql.Encoders.product[(Long, Seq[Long])])
      .collect().toSeq.sortBy(_._1)
    require(model.size == k,
      s"k-means needs >= $k training vectors, found ${model.size}")
    for (_ <- 1 to iters) {
      val updated = assignCells(data, centroidsDF(s, model))
        .select(col("cid"), posexplode(col("q")).as(Seq("d", "v")))
        .groupBy(col("cid"), col("d"))
        .agg(sum(col("v")).as("sv"), count(lit(1)).as("n"))
        // exact integer floor-div (sums can be negative, so clear the
        // pmod remainder first); floor(sv/n) on doubles drifts past 2^53
        .select(col("cid"), col("d"), expr("(sv - pmod(sv, n)) div n").as("m"))
        .collect()
        .groupBy(_.getLong(0))
        .map { case (cid, rows) =>
          cid -> rows.sortBy(_.getInt(1)).map(_.getLong(2)).toSeq
        }
      model = model.map { case (cid, prev) => cid -> updated.getOrElse(cid, prev) }
    }
    model
  }

  /** (cid, cq) frame over a driver-side centroid model. */
  def centroidsDF(s: SparkSession, model: Seq[(Long, Seq[Long])]): DataFrame = {
    import s.implicits._
    model.toDF("cid", "cq")
  }

  /** Cells ranked per vector by exact-integer d² = |x|² − 2⟨x,c⟩ + |c|²
    * (ties to the smaller cell id), `rn` = 1 being the home cell. The ONE
    * definition of "which cell" both training and trained-index probing
    * use — a divergence between them would probe cells that were never
    * built.
    */
  def rankCells(prepared: DataFrame, cents: DataFrame): DataFrame = {
    val withNorm = cents.withColumn("cn2",
      graft.functions.VectorDot.of(col("cq"), col("cq")))
    val w = Window.partitionBy(col("vec_id")).orderBy(col("d2").asc, col("cid").asc)
    prepared.crossJoin(broadcast(withNorm))
      .withColumn("d2",
        col("n2") - lit(2) * graft.functions.VectorDot.of(col("q"), col("cq")) + col("cn2"))
      .withColumn("rn", row_number().over(w))
  }

  /** Argmin-L2 cell assignment: [[rankCells]] kept at rn = 1 — one row
    * per vector. Map-only up to the per-vector argmin window.
    */
  def assignCells(prepared: DataFrame, cents: DataFrame): DataFrame =
    rankCells(prepared, cents)
      .filter(col("rn") === 1)
      .drop("rn", "cq", "cn2")

  /** Sum of squared distance to the assigned centroid — the k-means
    * objective [[trainCentroids]] descends; exposed for tests/tuning.
    */
  def kmeansCost(s: SparkSession, dir: String, model: Seq[(Long, Seq[Long])]): Long =
    // coalesce: sum over an empty frame is null — surface cost 0, not NPE
    assignCells(Queries.prepared(s, dir), centroidsDF(s, model))
      .agg(coalesce(sum(col("d2")), lit(0L))).head().getLong(0)

  /** IVF top-k with `nprobe` probed cells: every vector is assigned to its
    * argmax-dot centroid cell (map-only after a broadcast of `nCentroids`
    * centroid vectors); query vectors additionally keep their `nprobe`
    * best cells and candidates come from an equi join on cell id. Shuffle
    * volume scales with nprobe/nCentroids (the cost knob), never n².
    * `trainIters` > 0 replaces the raw lowest-id centroids with a Lloyd
    * k-means model ([[trainCentroids]]) — balanced cells put the same
    * recall at a lower nprobe.
    */
  def ivfTopK(s: SparkSession, dir: String, nQueries: Int, k: Int,
              nCentroids: Int = 8, nprobe: Int = 1, trainIters: Int = 0): DataFrame = {
    val e = Queries.prepared(s, dir)
    // One ranking pass over the FULL corpus (home cells) and a second over
    // only the nQueries query vectors (probe cells) — deriving both from a
    // single corpus-wide ranked frame would execute the corpus-wide
    // crossJoin+window twice (the shape Pq.ivfPqTopK documents and avoids).
    // centroids computed ONCE (training is collect-driven — it must not
    // re-run per ranking pass)
    val cents: DataFrame =
      if (trainIters > 0) centroidsDF(s, trainCentroids(s, dir, nCentroids, trainIters))
      else e.filter(col("vec_id") < nCentroids)
        .select(col("vec_id").as("cid"), col("q").as("cq"))
    def rank(in: DataFrame): DataFrame =
      if (trainIters > 0) {
        // trained quantizer → rank cells by the SAME metric training used
        // (rankCells is shared with trainCentroids for exactly this reason)
        rankCells(in, cents)
      } else {
        val wAssign = Window.partitionBy(col("vec_id"))
          .orderBy(col("cdot").desc, col("cid").asc)
        in.crossJoin(broadcast(cents))
          .withColumn("cdot", graft.functions.VectorDot.of(col("q"), col("cq")))
          .withColumn("rn", row_number().over(wAssign))
      }
    // Base side: each vector lives in exactly ONE cell (rn=1), so a query
    // probing distinct cells never sees a candidate twice — no distinct
    // needed on the pair stream.
    val base = rank(e).filter(col("rn") === 1)
      .select(col("vec_id"), col("q"), col("n2"), col("cid"))
    val probes = rank(e.filter(col("vec_id") < nQueries))
      .filter(col("rn") <= nprobe)
      .select(col("vec_id"), col("q"), col("n2"), col("cid"))
    rankTopK(withSim(
      probes.as("a").join(base.as("b"),
        col("a.cid") === col("b.cid") && col("a.vec_id") =!= col("b.vec_id"))), k)
  }

  /** Multi-probe LSH top-k: `bits`-wide hyperplane signature buckets; the
    * query side probes its own bucket plus every bucket within hamming
    * distance `probeRadius` (radius 1 = `bits` extra probes per query —
    * the standard multi-probe trade: more probes on the small query side
    * instead of shorter signatures inflating every bucket). Candidates
    * come from an equi join on the probed signature.
    */
  def lshTopK(s: SparkSession, dir: String, nQueries: Int, k: Int,
              bits: Int = 8, probeRadius: Int = 0): DataFrame = {
    require(probeRadius <= 1, "only radius 0/1 probing is implemented")
    val e = Queries.prepared(s, dir)
      .withColumn("sig", VectorOps.hyperplaneSig(col("q"), bits, Dims))
    val flips: Seq[org.apache.spark.sql.Column] =
      col("sig") +: (if (probeRadius >= 1)
        (0 until bits).map(i => col("sig").bitwiseXOR(lit(1L << i)))
      else Seq.empty)
    val probes = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id"), col("q"), col("n2"),
        explode(array(flips: _*)).as("probe_sig"))
    rankTopK(withSim(
      probes.as("a").join(e.as("b"),
        col("a.probe_sig") === col("b.sig") && col("a.vec_id") =!= col("b.vec_id"))), k)
  }

  /** recall@k of `approx` against ground-truth `exact` (both shaped
    * (a_id, b_id, rank, sim)): the fraction of true top-k pairs the
    * approximate index surfaced. One tiny aggregate — fine to collect.
    */
  def recallAtK(approx: DataFrame, exact: DataFrame): Double = {
    val hit = exact.select(col("a_id"), col("b_id"))
      .join(approx.select(col("a_id"), col("b_id")), Seq("a_id", "b_id"), "left_semi")
      .count()
    val total = exact.count()
    if (total == 0) 1.0 else hit.toDouble / total
  }

  private val Dims = 64

  private def withSim(pairs: DataFrame): DataFrame =
    pairs
      .select(
        col("a.vec_id").as("a_id"), col("b.vec_id").as("b_id"),
        graft.functions.VectorDot.of(col("a.q"), col("b.q")).as("dot_q"),
        col("a.n2").as("na"), col("b.n2").as("nb"))
      .withColumn("sim", VectorOps.cosineQ(col("dot_q"), col("na"), col("nb")))

  private def rankTopK(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("a_id")).orderBy(col("sim").desc, col("b_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("a_id"), col("b_id"), col("rank"), col("sim"))
  }
}
