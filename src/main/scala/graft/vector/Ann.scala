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

  /** IVF top-k with `nprobe` probed cells: every vector is assigned to its
    * argmax-dot centroid cell (map-only after a broadcast of `nCentroids`
    * centroid vectors); query vectors additionally keep their `nprobe`
    * best cells and candidates come from an equi join on cell id. Shuffle
    * volume scales with nprobe/nCentroids (the cost knob), never n².
    */
  def ivfTopK(s: SparkSession, dir: String, nQueries: Int, k: Int,
              nCentroids: Int = 8, nprobe: Int = 1): DataFrame = {
    val e = Queries.prepared(s, dir)
    val cents = e.filter(col("vec_id") < nCentroids)
      .select(col("vec_id").as("cid"), col("q").as("cq"))
    val wAssign = Window.partitionBy(col("vec_id"))
      .orderBy(col("cdot").desc, col("cid").asc)
    val ranked = e
      .crossJoin(broadcast(cents))
      .withColumn("cdot", graft.functions.VectorDot.of(col("q"), col("cq")))
      .withColumn("rn", row_number().over(wAssign))
    // Base side: each vector lives in exactly ONE cell (rn=1), so a query
    // probing distinct cells never sees a candidate twice — no distinct
    // needed on the pair stream.
    val base = ranked.filter(col("rn") === 1)
      .select(col("vec_id"), col("q"), col("n2"), col("cid"))
    val probes = ranked.filter(col("vec_id") < nQueries && col("rn") <= nprobe)
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
