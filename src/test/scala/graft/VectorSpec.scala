package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.vector.VectorOps

class VectorSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("quantized dot/norm are exact integers; cosine of identical vectors is 1") {
    val df = Seq(
      (1L, Seq(0.6f, 0.8f)),
      (2L, Seq(0.6f, 0.8f)),
      (3L, Seq(-0.8f, 0.6f))).toDF("vec_id", "embedding")
    val q = df.select(col("vec_id"), VectorOps.quantize(col("embedding")).as("q"))
      .withColumn("n2", VectorOps.norm2Q(col("q")))
    val rows = q.as[(Long, Seq[Long], Long)].collect().sortBy(_._1)
    assert(rows(0)._2 === Seq(6000L, 8000L))
    assert(rows(0)._3 === 6000L * 6000 + 8000L * 8000)
    val sim = q.as("a").join(q.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(
        col("a.vec_id"), col("b.vec_id"),
        VectorOps.cosineQ(
          VectorOps.dotQ(col("a.q"), col("b.q")), col("a.n2"), col("b.n2")).as("sim"))
      .as[(Long, Long, Double)].collect()
      .map { case (a, b, s) => (a, b) -> s }.toMap
    assert(sim((1L, 2L)) === 1.0)
    assert(math.abs(sim((1L, 3L))) < 1e-9) // orthogonal
  }

  test("native vector_dot equals the declarative dotQ") {
    val df = Seq(
      (1L, Seq(3L, -4L, 5L)), (2L, Seq(10L, 20L, -30L))).toDF("id", "q")
    val rows = df.as("a").join(df.as("b"), col("a.id") <= col("b.id"))
      .select(
        graft.functions.VectorDot.of(col("a.q"), col("b.q")).as("native"),
        graft.vector.VectorOps.dotQ(col("a.q"), col("b.q")).as("decl"))
      .as[(Long, Long)].collect()
    rows.foreach { case (n, d) => assert(n === d) }
    assert(rows.map(_._1).toSet === Set(50L, -200L, 1400L))
  }

  test("native vector_dot matches dotQ on unequal-length inputs (both null)") {
    val df = Seq((Seq(1L, 2L, 3L), Seq(4L, 5L))).toDF("a", "b")
    val row = df.select(
        graft.functions.VectorDot.of(col("a"), col("b")).as("native"),
        graft.vector.VectorOps.dotQ(col("a"), col("b")).as("decl"))
      .as[(Option[Long], Option[Long])].head()
    assert(row === ((None, None)))
  }

  test("native vector_dot and hyperplane_sig match the declarative forms on null ELEMENTS") {
    // a null slot (e.g. quantize of a vector with a null component) nulls
    // the dot in the declarative aggregate; the native loop must agree —
    // not read the slot as 0 and return a concrete wrong product
    val df = spark.range(1).select(
      array(lit(1L), lit(null).cast("long"), lit(3L)).as("a"),
      array(lit(4L), lit(5L), lit(6L)).as("b"))
    val dot = df.select(
        graft.functions.VectorDot.of(col("a"), col("b")).as("native"),
        graft.vector.VectorOps.dotQ(col("a"), col("b")).as("decl"))
      .as[(Option[Long], Option[Long])].head()
    assert(dot === ((None, None)))
    // hyperplane sig: null dot → every when(dot > 0) is false → sig 0
    val sig = df.select(
        graft.functions.HyperplaneSig.of(col("a"), 8, 3).as("native"),
        graft.vector.VectorOps.hyperplaneSigDeclarative(col("a"), 8, 3).as("decl"))
      .as[(Long, Long)].head()
    assert(sig === ((0L, 0L)))
  }

  test("q61 banded near-dup pairs are a subset of the exact q45 pairs") {
    // sf0.01, not sf0.001: the smallest scale has ZERO exact cos>=0.5 pairs,
    // so only sf0.01 exercises the recall side of the subset relation.
    val dir = "/root/testdata/sf0.01"
    assume(new java.io.File(s"$dir/embeddings.parquet").exists())
    def pairs(q: String) = SparkEntry.queries(q)(spark, dir)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val banded = pairs("q61_embed_lsh_neardup")
    val exact = pairs("q45_embed_neardup")
    assert(banded.subsetOf(exact),
      "LSH banding may drop pairs (false negatives) but must never invent one")
    assert(banded.nonEmpty, "test data has at least one banded cos>=0.5 pair")
  }

  test("ANN recall@k rises monotonically with the probe knobs") {
    // Recall is DETERMINISTIC here: hyperplanes are md5-derived, centroids
    // are the lowest-id vectors, ties break on id — so floors can sit just
    // under the measured values (sf0.01, 50 queries, k=10: IVF nprobe
    // 1/2/4 → 0.328/0.498/0.744; LSH radius 0→1 → 0.026/0.110. The
    // absolute levels are a property of the near-random test embeddings —
    // top-10 "neighbors" of a random vector are barely more similar than
    // the bulk, the hardest regime for LSH — what the harness pins is the
    // SHAPE: more probes, more recall, approaching 1.0 as probes → cells).
    val dir = "/root/testdata/sf0.01"
    assume(new java.io.File(s"$dir/embeddings.parquet").exists())
    val nq = 50; val k = 10
    val exact = graft.vector.Ann.exactTopK(spark, dir, nq, k).cache()
    try {
      def r(df: org.apache.spark.sql.DataFrame): Double =
        graft.vector.Ann.recallAtK(df, exact)
      val np1 = r(graft.vector.Ann.ivfTopK(spark, dir, nq, k, nCentroids = 8, nprobe = 1))
      val np2 = r(graft.vector.Ann.ivfTopK(spark, dir, nq, k, nCentroids = 8, nprobe = 2))
      val np4 = r(graft.vector.Ann.ivfTopK(spark, dir, nq, k, nCentroids = 8, nprobe = 4))
      assert(np1 >= 0.30, s"IVF nprobe=1 recall $np1")
      assert(np2 >= np1 && np4 >= np2, s"IVF recall must not drop with nprobe: $np1 $np2 $np4")
      assert(np4 >= 0.70, s"IVF nprobe=4 recall $np4")
      val r0 = r(graft.vector.Ann.lshTopK(spark, dir, nq, k, bits = 8, probeRadius = 0))
      val r1 = r(graft.vector.Ann.lshTopK(spark, dir, nq, k, bits = 8, probeRadius = 1))
      assert(r1 >= r0, s"multi-probe must not lose recall: $r0 -> $r1")
      assert(r1 >= 0.10, s"LSH radius-1 recall $r1")
    } finally exact.unpersist()
  }

  test("k-means centroid training: deterministic, cost descends, cells partition the data") {
    val dir = "/root/testdata/sf0.01"
    assume(new java.io.File(s"$dir/embeddings.parquet").exists())
    val m1 = graft.vector.Ann.trainCentroids(spark, dir, k = 8, iters = 2)
    val m2 = graft.vector.Ann.trainCentroids(spark, dir, k = 8, iters = 2)
    assert(m1 === m2, "training must be run-to-run deterministic")
    assert(m1.map(_._1).sorted === (0L until 8L), "every cell id present")
    assert(m1.forall(_._2.length === m1.head._2.length), "all centroids same dims")
    // Lloyd's step never increases the k-means objective (the floor
    // rounding's slack is far below the objective's scale)
    val init = graft.vector.Ann.trainCentroids(spark, dir, k = 8, iters = 0)
    val c0 = graft.vector.Ann.kmeansCost(spark, dir, init)
    val c1 = graft.vector.Ann.kmeansCost(spark, dir,
      graft.vector.Ann.trainCentroids(spark, dir, k = 8, iters = 1))
    val c2 = graft.vector.Ann.kmeansCost(spark, dir, m1)
    assert(c1 <= c0 && c2 <= c1, s"objective must descend: $c0 -> $c1 -> $c2")
  }

  test("semanticDedup drops the larger id of every intra-cluster near-dup pair") {
    // Two orthogonal clusters, seeds (lowest ids 0,1) one per cluster.
    // Near-dups of each seed must drop; the seeds themselves survive.
    val e = Seq(
      (0L, Seq(100L, 0L)),   // cluster 0 seed
      (1L, Seq(0L, 100L)),   // cluster 1 seed
      (2L, Seq(99L, 1L)),    // near-dup of 0 → dropped
      (3L, Seq(98L, 2L)),    // near-dup of 0 and 2 → dropped
      (4L, Seq(1L, 99L)))    // near-dup of 1 → dropped
      .toDF("vec_id", "q")
      .withColumn("n2", graft.functions.VectorDot.of(col("q"), col("q")))
    val r = graft.vector.Queries.semanticDedup(spark, e, k = 2)
      .as[(Long, Long, Int)].collect().map(x => x._1 -> ((x._2, x._3))).toMap
    assert(r.view.mapValues(_._2).toMap ===
      Map(0L -> 0, 1L -> 0, 2L -> 1, 3L -> 1, 4L -> 1))
    assert(r(2L)._1 === r(0L)._1 && r(3L)._1 === r(0L)._1,
      "near-dups of seed 0 must land in seed 0's cluster")
    assert(r(4L)._1 === r(1L)._1)
    assert(r(0L)._1 !== r(1L)._1, "orthogonal seeds must be distinct clusters")
  }

  test("multi-probe SemDeDup keeps home cells and never loses single-probe drops") {
    val dir = "/root/testdata/sf0.01"
    assume(new java.io.File(s"$dir/embeddings.parquet").exists())
    def run(name: String) = SparkEntry.queries(name)(spark, dir)
      .as[(Long, Long, Int)].collect()
    val p1 = run("q121_semantic_dedup")
    val p2 = run("q128_semantic_dedup_p2")
    assert(p1.map(r => r._1 -> r._2).toMap === p2.map(r => r._1 -> r._2).toMap,
      "probe depth must not change the home-cell assignment")
    val d1 = p1.filter(_._3 == 1).map(_._1).toSet
    val d2 = p2.filter(_._3 == 1).map(_._1).toSet
    assert(d1.subsetOf(d2),
      "widening the probe can only ADD candidate pairs, never drop fewer")
    assert(d1.nonEmpty, "sf0.01 plants at least one intra-cell near-dup")
  }

  test("trained IVF centroids do not lose recall at nprobe=2") {
    val dir = "/root/testdata/sf0.01"
    assume(new java.io.File(s"$dir/embeddings.parquet").exists())
    val nq = 50; val k = 10
    val exact = graft.vector.Ann.exactTopK(spark, dir, nq, k).cache()
    try {
      val raw = graft.vector.Ann.recallAtK(
        graft.vector.Ann.ivfTopK(spark, dir, nq, k, nCentroids = 8, nprobe = 2), exact)
      val trained = graft.vector.Ann.recallAtK(
        graft.vector.Ann.ivfTopK(spark, dir, nq, k, nCentroids = 8, nprobe = 2,
          trainIters = 3), exact)
      assert(trained >= raw - 0.02,
        s"k-means cells should match or beat raw lowest-id cells: $raw -> $trained")
    } finally exact.unpersist()
  }

  test("PQ: codes well-formed, encode deterministic, ADC recall rises with m and rerank") {
    val dir = "/root/testdata/sf0.01"
    assume(new java.io.File(s"$dir/embeddings.parquet").exists())
    import org.apache.spark.sql.functions._
    val nq = 50; val k = 10
    val m4 = graft.vector.Pq.train(spark, dir, m = 4, k = 16, iters = 2)
    val m8 = graft.vector.Pq.train(spark, dir, m = 8, k = 16, iters = 2)
    assert(m8.codebooks.length === 8 && m8.codebooks.forall(_.size === 16))

    // every vector encoded, all codes in [0, 16)
    val docs = spark.read.parquet(s"$dir/embeddings.parquet").count()
    val codes = graft.vector.Pq.encode(spark,
      spark.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id"), graft.vector.VectorOps.quantize(col("embedding"), 10000).as("q")),
      m8)
    assert(codes.count() === docs)
    assert(codes.filter(exists(col("codes"), c => c < 0 || c >= 16)).count() === 0)

    // recall shape + floors (measured sf0.01: 0.188 / 0.278 / 0.662 / 0.954)
    val exact = graft.vector.Ann.exactTopK(spark, dir, nq, k).cache()
    try {
      def r(df: org.apache.spark.sql.DataFrame) = graft.vector.Ann.recallAtK(df, exact)
      val adc4 = r(graft.vector.Pq.pqTopK(spark, dir, nq, k, m4))
      val adc8 = r(graft.vector.Pq.pqTopK(spark, dir, nq, k, m8))
      val rr50 = r(graft.vector.Pq.pqTopK(spark, dir, nq, k, m8, rerank = 50))
      val rr200 = r(graft.vector.Pq.pqTopK(spark, dir, nq, k, m8, rerank = 200))
      assert(adc8 >= adc4, s"finer quantization must not lose recall: $adc4 -> $adc8")
      assert(rr50 >= adc8 && rr200 >= rr50,
        s"exact re-rank must not lose recall: $adc8 -> $rr50 -> $rr200")
      assert(adc8 >= 0.20, s"ADC m=8 recall $adc8")
      assert(rr200 >= 0.90, s"rerank-200 recall $rr200")
    } finally exact.unpersist()
  }

  test("IVF-PQ: probing all cells equals exhaustive ADC; recall monotone in nprobe") {
    val dir = "/root/testdata/sf0.01"
    assume(new java.io.File(s"$dir/embeddings.parquet").exists())
    val nq = 50; val k = 10
    val pq8 = graft.vector.Pq.train(spark, dir, m = 8, k = 16, iters = 2)
    val coarse = graft.vector.Ann.trainCentroids(spark, dir, k = 8, iters = 2)
    // encode once — the index-build-once / scan-many usage pattern
    val codes = Some(graft.vector.Pq.encodeFromDir(spark, dir, pq8).cache())
    val exact = graft.vector.Ann.exactTopK(spark, dir, nq, k).cache()
    try {
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.select("a_id", "b_id", "rank").as[(Long, Long, Int)].collect().toSet
      // nprobe = all cells ⟹ every vector is a candidate exactly once ⟹
      // identical to the exhaustive ADC scan (a true identity)
      val all = rows(graft.vector.Pq.ivfPqTopK(spark, dir, nq, k, pq8, coarse,
        nprobe = 8, precomputedCodes = codes))
      val exhaustive = rows(graft.vector.Pq.pqTopK(spark, dir, nq, k, pq8,
        precomputedCodes = codes))
      assert(all === exhaustive)
      // recall vs nprobe: NOT a strict invariant at fixed rerank (a wider
      // candidate pool can evict a true neighbor from the ADC top-R), so
      // assert the trend with slack plus an absolute floor
      def r(df: org.apache.spark.sql.DataFrame) = graft.vector.Ann.recallAtK(df, exact)
      val r1 = r(graft.vector.Pq.ivfPqTopK(spark, dir, nq, k, pq8, coarse, 1,
        rerank = 50, precomputedCodes = codes))
      val r4 = r(graft.vector.Pq.ivfPqTopK(spark, dir, nq, k, pq8, coarse, 4,
        rerank = 50, precomputedCodes = codes))
      assert(r4 >= r1 - 0.05, s"nprobe=4 should not lose materially vs nprobe=1: $r1 -> $r4")
      assert(r4 > 0.2, s"IVF-PQ nprobe=4 rerank=50 recall $r4")
    } finally exact.unpersist()
  }

  test("stored IVF-PQ index round-trips: loaded model == trained, served == fresh (bit-identical)") {
    val dir = "/root/testdata/sf0.01"
    assume(new java.io.File(s"$dir/embeddings.parquet").exists())
    val idx = java.nio.file.Files.createTempDirectory("graft-ann-index").toString
    val nq = 40; val k = 10
    graft.vector.Index.build(spark, dir, idx,
      nCells = 8, coarseIters = 2, m = 4, k = 16, pqIters = 2)
    // model round-trip: stored tables reload to the exact trained model
    assert(graft.vector.Index.loadCoarse(spark, idx) ===
      graft.vector.Ann.trainCentroids(spark, dir, k = 8, iters = 2))
    val fresh = graft.vector.Pq.train(spark, dir, m = 4, k = 16, iters = 2)
    assert(graft.vector.Index.loadModel(spark, idx) === fresh)
    // served results: stored index == fresh train+encode, bit-identical,
    // with and without the exact re-rank stage
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    for (rerank <- Seq(0, 50)) {
      val stored = rows(graft.vector.Index.ivfPqTopK(spark, dir, idx, nq, k,
        nprobe = 2, rerank = rerank))
      val coarse = graft.vector.Ann.trainCentroids(spark, dir, k = 8, iters = 2)
      val direct = rows(graft.vector.Pq.ivfPqTopK(spark, dir, nq, k, fresh, coarse,
        nprobe = 2, rerank = rerank))
      assert(stored === direct, s"stored != fresh at rerank=$rerank")
    }
    // rebuild is byte-stable at the result level: build again, same answers
    graft.vector.Index.build(spark, dir, idx,
      nCells = 8, coarseIters = 2, m = 4, k = 16, pqIters = 2)
    assert(rows(graft.vector.Index.ivfPqTopK(spark, dir, idx, nq, k, 2, 50)) ===
      rows(graft.vector.Index.ivfPqTopK(spark, dir, idx, nq, k, 2, 50)))
  }

  test("Index.append grows the stored codes incrementally, bit-identical to a full build") {
    val dir = "/root/testdata/sf0.01"
    assume(new java.io.File(s"$dir/embeddings.parquet").exists())
    val idx = java.nio.file.Files.createTempDirectory("graft-ann-append").toString
    graft.vector.Index.build(spark, dir, idx,
      nCells = 8, coarseIters = 1, m = 4, k = 16, pqIters = 1)
    val full = spark.read.parquet(s"$idx/codes").collect().map(_.toSeq).toSet
    // shrink the stored codes to a prefix, then append the rest back
    val subset = spark.read.parquet(s"$idx/codes")
      .filter(org.apache.spark.sql.functions.col("vec_id") < 100).collect()
    val schema = spark.read.parquet(s"$idx/codes").schema
    spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](java.util.Arrays.asList(subset: _*)),
        schema)
      .write.mode("overwrite").parquet(s"$idx/codes")
    val appended = graft.vector.Index.append(spark, dir, idx)
    assert(appended === full.size - subset.length)
    assert(spark.read.parquet(s"$idx/codes").collect().map(_.toSeq).toSet === full,
      "append with the stored model must reproduce the full build's codes exactly")
    // idempotent: nothing new on a second call
    assert(graft.vector.Index.append(spark, dir, idx) === 0L)
  }

  test("Index.compact coalesces the appended codes files; contents identical") {
    val dir = "/root/testdata/sf0.01"
    assume(new java.io.File(s"$dir/embeddings.parquet").exists())
    val idx = java.nio.file.Files.createTempDirectory("graft-ann-compact").toString
    graft.vector.Index.build(spark, dir, idx,
      nCells = 8, coarseIters = 1, m = 4, k = 16, pqIters = 1)
    // simulate the daily-append lifecycle: shrink to a prefix, append back
    // in two drops — each append leaves its own part-files behind
    val full = spark.read.parquet(s"$idx/codes")
    val schema = full.schema
    def rewrite(rows: Array[org.apache.spark.sql.Row]): Unit =
      spark.createDataFrame(
          new java.util.ArrayList[org.apache.spark.sql.Row](java.util.Arrays.asList(rows: _*)),
          schema)
        .write.mode("overwrite").parquet(s"$idx/codes")
    val before = full.collect().map(_.toSeq).toSet
    rewrite(full.filter(col("vec_id") < 50).collect())
    graft.vector.Index.append(spark, dir, idx)
    def partFiles() = new java.io.File(s"$idx/codes").listFiles()
      .count(f => f.getName.startsWith("part-"))
    assert(partFiles() > 1, "appends must have left multiple part-files")
    graft.vector.Index.compact(spark, idx, targetFiles = 1)
    assert(partFiles() === 1, "compaction must coalesce to the target file count")
    assert(spark.read.parquet(s"$idx/codes").collect().map(_.toSeq).toSet === before,
      "compaction must not change a single row")
  }

  test("Index.removeDocs purges codes exactly; model frozen; id free to re-append") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.01"
    assume(new java.io.File(s"$dir/embeddings.parquet").exists())
    val idx = java.nio.file.Files.createTempDirectory("graft-ann-td").toString
    graft.vector.Index.build(spark, dir, idx,
      nCells = 8, coarseIters = 1, m = 4, k = 16, pqIters = 1)
    val full = spark.read.parquet(s"$idx/codes").collect().map(_.toSeq).toSet
    val coarse = graft.vector.Index.loadCoarse(spark, idx)
    val model = graft.vector.Index.loadModel(spark, idx)
    val victims = Seq(3L, 7L, 11L, 99999L).toDF("vec_id")
    val removed = graft.vector.Index.removeDocs(spark, idx, victims)
    assert(removed === 3L, "absent ids are not billed")
    val after = spark.read.parquet(s"$idx/codes")
    assert(!after.select("vec_id").as[Long].collect().toSet
      .exists(Set(3L, 7L, 11L)), "purged ids gone from the index")
    assert(graft.vector.Index.loadCoarse(spark, idx) === coarse &&
      graft.vector.Index.loadModel(spark, idx) === model,
      "takedown must not retrain the model")
    // a removed vector can never appear in a top-k answer
    val served = graft.vector.Index.ivfPqTopK(spark, dir, idx,
        nQueries = 20, k = 5, nprobe = 8, rerank = 50)
      .select("b_id").as[Long].collect().toSet
    assert(!served.exists(Set(3L, 7L, 11L)))
    // the left-anti append guard no longer sees the purged ids: they
    // re-enter with codes identical to the original build's
    assert(graft.vector.Index.append(spark, dir, idx) === 3L)
    assert(spark.read.parquet(s"$idx/codes").collect().map(_.toSeq).toSet === full)
  }

  test("native hyperplane_sig equals the declarative formulation (8, 48 and 63 bit)") {
    val dims = 16
    val rnd = new scala.util.Random(7)
    val df = (1L to 40L).map(i => (i, Seq.fill(dims)(rnd.nextFloat() - 0.5f)))
      .toDF("vec_id", "embedding")
      .select(col("vec_id"), VectorOps.quantize(col("embedding")).as("q"))
    for (bits <- Seq(8, 48, 63)) {
      val got = df.select(col("vec_id"),
          VectorOps.hyperplaneSig(col("q"), bits, dims).as("native"),
          VectorOps.hyperplaneSigDeclarative(col("q"), bits, dims).as("declarative"))
        .as[(Long, Long, Long)].collect()
      got.foreach { case (id, n, d) => assert(n === d, s"vec $id at $bits bits") }
    }
    // declarative-parity on a length-mismatched vector: both yield 0
    val short = Seq((1L, Seq(1000L, -2000L))).toDF("vec_id", "q")
      .select(
        VectorOps.hyperplaneSig(col("q"), 8, dims).as("n"),
        VectorOps.hyperplaneSigDeclarative(col("q"), 8, dims).as("d"))
      .as[(Long, Long)].head()
    assert(short === ((0L, 0L)))
    // declarative-parity on a NULL vector: both yield 0 (a null embedding
    // must land in band 0, not vanish from the Spark-side joins only)
    val nul = Seq(Tuple1(1L)).toDF("vec_id")
      .select(
        VectorOps.hyperplaneSig(lit(null).cast("array<bigint>"), 8, dims).as("n"),
        VectorOps.hyperplaneSigDeclarative(lit(null).cast("array<bigint>"), 8, dims).as("d"))
      .as[(Long, Long)].head()
    assert(nul === ((0L, 0L)))
    // resolvable from plain SQL through the registry
    val viaSql = spark.sql("SELECT hyperplane_sig(array(5L, -3L), 4, 2) AS s").as[Long].head()
    assert(viaSql >= 0L && viaSql < 16L)
  }

  test("hyperplane signature is deterministic and bucket-stable") {
    val df = Seq(
      (1L, Seq.fill(8)(0.25f)),
      (2L, Seq.fill(8)(0.25f)),
      (3L, Seq.fill(8)(-0.25f))).toDF("vec_id", "embedding")
    val sigs = df.select(col("vec_id"),
        VectorOps.hyperplaneSig(VectorOps.quantize(col("embedding")), 8, 8).as("sig"))
      .as[(Long, Long)].collect().toMap
    assert(sigs(1L) === sigs(2L))
    // opposite vector flips every non-zero projection: signature differs
    assert(sigs(1L) !== sigs(3L))
  }
}
