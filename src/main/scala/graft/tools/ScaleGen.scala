package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic scale-up generator: replicates an existing test-data dir
  * `copies`× with workload-shape-preserving transforms, for scaling
  * benchmarks (sf0.1 → sf1 → …) without touching the read-only driver
  * data. Usage: `runMain graft.tools.ScaleGen <srcDir> <outDir> [copies]`.
  *
  * Shape preservation is the whole design — naive replication would
  * corrupt exactly the workloads the scaling bench exists to measure:
  *
  *   - **Keys** (customers/suppliers/parts/orders/events/docs/vectors) are
  *     shifted by `copy × 2³³` so copies interleave nothing: join
  *     fan-outs, group cardinalities, and per-key row counts all scale
  *     linearly, FK joins stay within-copy (each order keeps its copy's
  *     customer), and dimension tables region/nation stay fixed (TPC-H
  *     convention).
  *   - **documents.text**: every token gets a per-copy suffix (c>0), a
  *     bijection on each copy's shingle space — within-copy Jaccard/
  *     MinHash/SimHash structure is preserved EXACTLY while cross-copy
  *     shingle overlap is zero. Without it, 10 verbatim copies of every
  *     doc would make the whole corpus one giant near-dup clique and the
  *     dedup bench would measure an artifact. n_chars is recomputed.
  *   - **embeddings.embedding**: each copy's vectors are dimension-rotated
  *     by `7·copy mod 64`. Rotation is orthogonal, so every within-copy
  *     inner product (cosine/threshold/top-k structure) is preserved
  *     exactly, while cross-copy cosines are those of unrelated
  *     near-random vectors. NOTE: hyperplane SIGNATURES are computed
  *     against fixed md5-derived planes, so a rotated copy lands in
  *     different LSH buckets than copy 0 — banding behavior is preserved
  *     statistically (same similarity distribution), not bit-for-bit;
  *     per-copy candidate volume/recall varies around copy 0's.
  *     Verbatim copies would instead pair every vector with 9 exact
  *     duplicates (cos=1) and explode the near-dup output quadratically.
  *   - **events.ts** is left unchanged: event-time density scales 10×
  *     (more users in the same window), matching how a real stream grows.
  */
object ScaleGen {

  private val Stride = 1L << 33

  /** The documents-table scale transform, exposed for the scale gate
    * (ScaleGateSpec runs correctness cross-checks on 10× the gated SF
    * without writing the full table set): keys shifted copy×2³³, every
    * token of copy c > 0 suffixed `c<c>` — a bijection on each copy's
    * shingle space, so within-copy near-dup structure is EXACT and
    * cross-copy shingle overlap is zero. Deterministic by construction:
    * the output is a pure function of (input rows, copies).
    */
  def scaledDocuments(docs: DataFrame, copies: Int): DataFrame =
    (0 until copies).map { c =>
      val keyed = docs.withColumn("doc_id", col("doc_id") + lit(c * Stride))
      if (c == 0) keyed
      else keyed
        .withColumn("text", regexp_replace(col("text"), "\\S+", s"$$0c$c"))
        .withColumn("n_chars", length(col("text")).cast("long"))
    }.reduce(_ unionByName _)

  def main(args: Array[String]): Unit = {
    val src = args(0)
    val out = args(1)
    val copies = if (args.length > 2) args(2).toInt else 10
    val spark = graft.Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    generate(spark, src, out, copies)
    spark.stop()
  }

  def generate(spark: SparkSession, src: String, out: String, copies: Int): Unit = {
    def read(t: String) = spark.read.parquet(s"$src/$t.parquet")
    def write(t: String, df: DataFrame, parts: Int = 32): Unit =
      df.repartition(parts).write.mode("overwrite").parquet(s"$out/$t.parquet")

    def shifted(df: DataFrame, keyCols: Seq[String])(
        perCopy: (DataFrame, Int) => DataFrame = (d, _) => d): DataFrame =
      (0 until copies).map { c =>
        val keyed = keyCols.foldLeft(df)((d, k) => d.withColumn(k, col(k) + lit(c * Stride)))
        perCopy(keyed, c)
      }.reduce(_ unionByName _)

    // dimension tables: fixed (TPC-H convention — joins fan out, dims don't)
    write("region", read("region"), 1)
    write("nation", read("nation"), 1)

    write("customer", shifted(read("customer"), Seq("c_custkey"))())
    write("supplier", shifted(read("supplier"), Seq("s_suppkey"))())
    write("part", shifted(read("part"), Seq("p_partkey"))())
    write("orders", shifted(read("orders"), Seq("o_orderkey", "o_custkey"))())
    write("lineitem", shifted(read("lineitem"),
      Seq("l_orderkey", "l_partkey", "l_suppkey"))())
    write("events", shifted(read("events"), Seq("event_id", "user_id"))())

    write("documents", scaledDocuments(read("documents"), copies))

    write("embeddings", shifted(read("embeddings"), Seq("vec_id")) { (d, c) =>
      val shift = (7 * c) % 64
      if (shift == 0) d
      else d.withColumn("embedding",
        expr(s"transform(sequence(0, 63), i -> element_at(embedding, ((i + $shift) % 64) + 1))")
          .cast("array<float>"))
    })
  }
}
