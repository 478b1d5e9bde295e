package graft.tools

import org.apache.spark.sql.functions.col

import graft.Sessions

/** Prints the SemDeDup (k, probes) cost/recall sweep COVERAGE.md cites
  * (not part of the library surface): the fixed-k quadratic cell growth
  * q121/q128 document, and how scaling k with n bounds it. Each variant's
  * drop count is printed alongside its min-of-3 time so the cost/recall
  * trade is one table. Usage:
  *   SPARK_GRAFT_SF_DIR=/tmp/sf1 sbt "runMain graft.tools.SemBench"
  */
object SemBench {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "3").toInt
    val spark = Sessions.local(32)
    spark.sparkContext.setLogLevel("WARN")
    val n = graft.vector.Queries.prepared(spark, dir).count()
    for (k <- Seq(8, 32, 64); probes <- Seq(1, 2)) {
      def once(): (Double, Long) = {
        val t0 = System.nanoTime()
        val out = graft.vector.Queries.semanticDedup(
          spark, graft.vector.Queries.prepared(spark, dir), k, probes)
        val drops = out.filter(col("dropped") === 1).count()
        ((System.nanoTime() - t0) / 1e9, drops)
      }
      val all = (1 to runs).map(_ => once())
      println(f"n=$n k=$k%2d probes=$probes cell≈${n / k}%5d " +
        f"sec=${all.map(_._1).min}%7.2f drops=${all.head._2}")
    }

    // --- τ=0.9 regime (r9 VERDICT #5): the synthetic embeddings have ZERO
    // pairs above cos 0.7 (their max is ~0.5), so the production-τ
    // frontier must be PLANTED to be measurable. Twins for every 20th
    // vector at three tightness levels (cos ≈ 0.98 / 0.95 / 0.92), built
    // by exact pairwise rotation: r = q with adjacent coordinate pairs
    // swapped-and-negated is exactly orthogonal to q with |r| = |q|, so
    // q' = cosθ·q + sinθ·r has cos(q, q') = cosθ up to quantization
    // rounding. Recall = fraction of the exact global prune's drops the
    // clustered variant finds; spurious drops are impossible (a
    // cell-local qualifying pair qualifies globally).
    import org.apache.spark.sql.functions.{broadcast, expr}
    val base = graft.vector.Queries.prepared(spark, dir)
    val twins = base.filter(col("vec_id") % 20 === 0)
      .withColumn("c", expr(
        "CASE WHEN (vec_id div 20) % 3 = 0 THEN 0.98 " +
          "WHEN (vec_id div 20) % 3 = 1 THEN 0.95 ELSE 0.92 END"))
      .withColumn("s", expr("sqrt(1.0 - c*c)"))
      .select((col("vec_id") + expr("10000000")).as("vec_id"),
        expr("transform(q, (x, i) -> CAST(round(c*x + s*(CASE WHEN i % 2 = 0 " +
          "THEN -q[i+1] ELSE q[i-1] END)) AS BIGINT))").as("q"))
      .withColumn("n2", graft.functions.VectorDot.of(col("q"), col("q")))
    val planted = graft.text.Dedup.materialize(
      base.select(col("vec_id"), col("q"), col("n2")).unionByName(twins))
    val nPl = planted.count()
    def exactDrops(tauTenths: Int): Set[Long] = {
      val t2 = tauTenths.toLong * tauTenths
      val side = planted
      side.repartition(64).as("a")
        .join(broadcast(side.as("b")), col("a.vec_id") < col("b.vec_id"))
        .select(col("b.vec_id").as("vid"),
          graft.functions.VectorDot.of(col("a.q"), col("b.q")).as("dot"),
          col("a.n2").as("na"), col("b.n2").as("nb"))
        .filter(col("dot") > 0 &&
          col("dot") * col("dot") * 100L >= col("na") * col("nb") * t2)
        .select(col("vid")).distinct()
        .collect().map(_.getLong(0)).toSet
    }
    val exact9 = exactDrops(9)
    println(f"tau=0.9 planted: n=$nPl exact_drops=${exact9.size}")
    val autoK = graft.vector.ClusterStore.autoK(nPl, 64)
    val balK = graft.vector.ClusterStore.balancedK(nPl)
    for (k <- Seq(8, 32, balK, autoK).distinct; probes <- Seq(1, 2)) {
      def once(): (Double, Set[Long]) = {
        val t0 = System.nanoTime()
        val got = graft.vector.Queries
          .semanticDedup(spark, planted, k, probes, tauTenths = 9)
          .filter(col("dropped") === 1).select(col("vec_id"))
          .collect().map(_.getLong(0)).toSet
        ((System.nanoTime() - t0) / 1e9, got)
      }
      val all = (1 to runs).map(_ => once())
      val got = all.head._2
      val inter = (got & exact9).size
      val tag = if (k == balK) " [balancedK default]"
                else if (k == autoK) " [old autoK]" else ""
      println(f"tau=0.9 k=$k%3d probes=$probes cell≈${nPl / k}%5d " +
        f"sec=${all.map(_._1).min}%7.2f drops=${got.size} " +
        f"recall=$inter/${exact9.size}$tag")
    }

    // Store lifecycle split (q129): build once on the corpus split, then
    // serve the drop from the stored model — the serve row is the
    // recurring per-drop cost the build amortizes away.
    val storeDir = java.nio.file.Files
      .createTempDirectory("graft-sembench-store").toString
    val corpus = graft.vector.Queries.prepared(spark, dir)
      .filter(col("vec_id") % 3 =!= 0)
    val t0 = System.nanoTime()
    val k = graft.vector.ClusterStore.buildAuto(corpus, storeDir)
    val buildSec = (System.nanoTime() - t0) / 1e9
    def serveOnce(): (Double, Long) = {
      val t = System.nanoTime()
      val out = graft.vector.ClusterStore.dedupNewDropVsStoreReadOnly(
        graft.vector.Queries.prepared(spark, dir)
          .filter(col("vec_id") % 3 === 0), storeDir, probes = 2)
      val drops = out.filter(col("dropped") === 1).count()
      ((System.nanoTime() - t) / 1e9, drops)
    }
    val serves = (1 to runs).map(_ => serveOnce())
    println(f"store: build(autoK=$k) sec=$buildSec%7.2f  " +
      f"serve sec=${serves.map(_._1).min}%7.2f drops=${serves.head._2}")
    spark.stop()
  }
}
