package graft.vector

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Relational

/** Similarity-search queries over the `embeddings` table (ANN baseline +
  * LSH scale path), DuckDB-oracle exact via integer quantization.
  */
object Queries {

  // private[graft]: the streaming store probe (Streams
  // .semanticDedupVsStoreStream) must quantize with the SAME scale the
  // store was built with, or no stream vector would ever match a stored one
  private[graft] val Scale = 10000
  private val Dims = 64
  private val SigBits = 8
  private val Centroids = 8
  // q61 banding: 8 bands × 6 bits = 48 hyperplanes. Noise: a random pair
  // (cos≈0) collides in a band with (1/2)⁶ ≈ 1.6%, so candidates ≈ 12.5%
  // of all pairs at this weak τ=0.5 threshold (measured 12.7% on the test
  // embeddings); at a production near-dup threshold (cos ≥ 0.9, per-bit
  // agreement p = 1-arccos(0.9)/π ≈ 0.86) the same parameters give
  // 1-(1-0.86⁶)⁸ ≈ 0.98 recall with the same 1.6%/band noise — the knobs
  // (bands, rowBits) trade recall for candidate volume exactly as in
  // MinHash LSH (text/Dedup.scala banding math).
  private val Bands = 8
  private val RowBits = 6

  /** (vec_id, q: array<long>, n2: long) — quantized vectors with norms.
    * Dot products through the native `vector_dot` expression (identical
    * integer results to VectorOps.dotQ; ~100× faster than interpreted HOF
    * lambdas on the n² brute-force pair joins).
    */
  private[graft] def prepared(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir).embeddings
      // small test files arrive as ONE split; spread the map-heavy
      // signature/norm work (a real 100 TB table has many splits and
      // would skip this)
      .repartition(s.sparkContext.defaultParallelism)
      .select(col("vec_id"), VectorOps.quantize(col("embedding"), Scale).as("q"))
      .withColumn("n2", graft.functions.VectorDot.of(col("q"), col("q")))

  private def withSim(pairs: DataFrame): DataFrame =
    pairs
      .select(
        col("a.vec_id").as("a_id"), col("b.vec_id").as("b_id"),
        graft.functions.VectorDot.of(col("a.q"), col("b.q")).as("dot_q"),
        col("a.n2").as("na"), col("b.n2").as("nb"))
      .withColumn("sim", VectorOps.cosineQ(col("dot_q"), col("na"), col("nb")))

  def all: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Brute-force all-pairs cosine: top-20 most similar pairs. The O(n²)
    // correctness baseline every ANN variant is judged against. The
    // streamed side is explicitly repartitioned: a small parquet file
    // arrives as ONE split, and a broadcast nested-loop join inherits the
    // probe side's partitioning — without the repartition all n² pairs
    // evaluate in a single task regardless of cores.
    "q27_embed_pairs" -> ((s, dir) => {
      val e = prepared(s, dir)
      val pairs = withSim(
        e.repartition(s.sparkContext.defaultParallelism * 2).as("a")
          .join(broadcast(e.as("b")), col("a.vec_id") < col("b.vec_id")))
      Relational.topK(
        pairs.select(col("a_id"), col("b_id"), col("dot_q"), col("sim")),
        20, col("sim").desc, col("a_id").asc, col("b_id").asc)
    }),

    // ANN top-k: 5 nearest neighbors for each query vector (vec_id < 10),
    // brute-force scored, ranked per query with total-order tie-break.
    "q28_ann_topk" -> ((s, dir) => {
      val e = prepared(s, dir)
      val qs = e.filter(col("vec_id") < 10)
      val scored = withSim(
        broadcast(qs.as("a")).join(
          e.repartition(s.sparkContext.defaultParallelism * 2).as("b"),
          col("a.vec_id") =!= col("b.vec_id")))
      val w = Window.partitionBy(col("a_id")).orderBy(col("sim").desc, col("b_id").asc)
      scored
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .select(col("a_id"), col("b_id"), col("rank"), col("sim"))
    }),

    // Embedding-cosine near-dup pairs, EXACT brute-force baseline: cos ≥ 0.5
    // decided ENTIRELY on integers (dot > 0 ∧ 4·dot² ≥ na·nb ⟺ cos ≥ 1/2;
    // all terms < 2⁶³ at this quantization). Like q27 this is the O(n²)
    // correctness reference the bucketed path is judged against — the
    // PRODUCTION embedding leg of the dedup taxonomy is q61 (LSH-banded,
    // equi-join, never all-pairs).
    "q45_embed_neardup" -> ((s, dir) => {
      val e = prepared(s, dir)
      withSim(
        e.repartition(s.sparkContext.defaultParallelism * 2).as("a")
          .join(broadcast(e.as("b")), col("a.vec_id") < col("b.vec_id")))
        .filter(col("dot_q") > 0 &&
          lit(4) * col("dot_q") * col("dot_q") >= col("na") * col("nb"))
        .select(col("a_id"), col("b_id"), col("dot_q"), col("sim"))
    }),

    // IVF-style ANN (the other 100 TB scale path, alongside q29's LSH): a
    // deterministic coarse quantizer — centroids = the K lowest-id vectors,
    // cells assigned by argmax dot product (MIPS quantizer; exact-integer
    // argmax, ties to the smaller centroid id) — then probing only the
    // query's own cell (nprobe=1). At scale the cell assignment is one
    // broadcast join + per-row argmax (map-only), and the probe join
    // shuffles on cell id instead of materializing n² pairs; recall/cost
    // is tuned by K and nprobe exactly as in a production IVF index.
    "q50_ann_ivf" -> ((s, dir) => {
      val e = prepared(s, dir)
      val cents = e.filter(col("vec_id") < Centroids)
        .select(col("vec_id").as("cid"), col("q").as("cq"))
      val wAssign = Window.partitionBy(col("vec_id"))
        .orderBy(col("cdot").desc, col("cid").asc)
      val assigned = e
        .crossJoin(broadcast(cents))
        .withColumn("cdot", graft.functions.VectorDot.of(col("q"), col("cq")))
        .withColumn("rn", row_number().over(wAssign))
        .filter(col("rn") === 1)
        .select(col("vec_id"), col("q"), col("n2"), col("cid"))
      val scored = withSim(
        assigned.filter(col("vec_id") < 10).as("a")
          .join(assigned.as("b"),
            col("a.cid") === col("b.cid") && col("a.vec_id") =!= col("b.vec_id")))
      val wRank = Window.partitionBy(col("a_id")).orderBy(col("sim").desc, col("b_id").asc)
      scored
        .withColumn("rank", row_number().over(wRank))
        .filter(col("rank") <= 3)
        .select(col("a_id"), col("b_id"), col("rank"), col("sim"))
    }),

    // Bucketed embedding near-dup — the 100 TB production path (q45's
    // semantics without the all-pairs join). Shape mirrors the MinHash text
    // dedup (q24): map-only 48-bit hyperplane signature → band explode →
    // band-key equi self-join (the ONLY shuffle that grows with n; keys are
    // 8 bands × 64 buckets, hash-partitioned) → distinct candidates → exact
    // integer-cosine verify on candidates only. No broadcast of the table,
    // no nested loop — plan-asserted in PlanSpec. False positives die in
    // the verify; false negatives are governed by the (Bands, RowBits)
    // recall math above and mirrored bit-for-bit by the DuckDB oracle (the
    // md5-derived hyperplanes are engine-identical), so the oracle checks
    // the banded result exactly.
    "q61_embed_lsh_neardup" -> ((s, dir) => bandedNearDup(s, dir, Bands, RowBits)),

    // SemDeDup (Abbas et al., arXiv:2303.09540): semantic dedup — cluster
    // the embedding space, then prune near-duplicates ONLY within each
    // cluster, so the pair search is O(Σ cell²) instead of n². Here the
    // clustering is the engine's own deterministic integer Lloyd
    // (`Ann.trainCentroids`: lowest-id seeds, exact-integer argmin
    // assignment, floor-div mean update — partitioning-order independent,
    // so the DuckDB oracle replays the whole training loop bit-for-bit),
    // one update iteration, then per-cluster pairwise exact-integer cosine
    // (q45's τ=0.5 threshold) dropping the larger vec_id of each
    // qualifying pair. At 100 TB: training collects only the k×dims model,
    // assignment is a broadcast-centroid map, and the pair join shuffles
    // on cid — a cluster is the unit of comparison, never the corpus.
    // Recall caveat (inherent to SemDeDup, documented): a near-dup pair
    // split across two cells is not compared — the production guard is
    // raising k's granularity or multi-probe assignment, cf. Ann.rankCells.
    "q121_semantic_dedup" -> ((s, dir) =>
      semanticDedup(s, prepared(s, dir), Centroids)),

    // Multi-probe SemDeDup: pairs compared when the vectors share ANY of
    // their top-2 cells — closes most of single-probe's cell-boundary
    // recall gap (measured 6/14 → 12/14 of the exact global prune's drops
    // at sf0.1, zero spurious in both) for ≤4× the per-cell pair volume.
    "q128_semantic_dedup_p2" -> ((s, dir) =>
      semanticDedup(s, prepared(s, dir), Centroids, probes = 2)),

    // Store-served SemDeDup — the q106 build/serve split for the embedding
    // path: the clustering is TRAINED ONCE on the stored corpus
    // (vec_id % 3 != 0, auto-sized k = ⌈n/64⌉ — ClusterStore.autoK pins
    // cell population, and with it the quadratic pair leg, constant in n)
    // and PERSISTED; this query assigns only the new drop (vec_id % 3 = 0)
    // to the STORED centroids (top-2 probe cells) and pair-checks it
    // against same-cell stored vectors + smaller-id drop-mates. The stored
    // corpus is never re-trained or self-compared. Output: (vec_id, home
    // cid, dropped) per drop vector. The oracle replays build AND serve
    // bit-for-bit (integer Lloyd on the corpus split, then the probed
    // assignment + exact-integer cosine drops).
    "q129_store_semdedup" -> ((s, dir) => {
      val storeDir = clusterStoreFixture(s, dir)
      ClusterStore.dedupNewDropVsStoreReadOnly(
        prepared(s, dir).filter(col("vec_id") % 3 === 0), storeDir, probes = 2)
    }),

    // The APPEND path gated end-to-end: drop 1 (vec_id % 6 == 0) was
    // served against the built store and its SURVIVORS appended (the
    // fixture commits a real staged parquet append); drop 2
    // (vec_id % 6 == 3) then serves against corpus ∪ survivors — a
    // decision here can hinge on a row that only exists because the
    // append ran correctly, so the hash gate covers build → serve →
    // append → serve. The oracle replays all four stages.
    "q134_store_append_serve" -> ((s, dir) => {
      val storeDir = appendedClusterStoreFixture(s, dir)
      ClusterStore.dedupNewDropVsStoreReadOnly(
        prepared(s, dir).filter(col("vec_id") % 6 === 3), storeDir, probes = 2)
    }),

    // Cluster-store TAKEDOWN gated end-to-end: q134's appended store is
    // purged of vec_id % 5 == 1 (ClusterStore.removeDocs — one
    // vectors-table rewrite; centroids stay frozen, the Index.append
    // model contract), then drop 2 serves against what remains. A drop-2
    // vector whose only near-dup was purged must now SURVIVE — the
    // oracle replays build → serve → append → purge → serve, so a
    // takedown that left a stale row (or removed a live one) hash-fails.
    "q142_cluster_takedown" -> ((s, dir) => {
      val storeDir = takedownClusterStoreFixture(s, dir)
      ClusterStore.dedupNewDropVsStoreReadOnly(
        prepared(s, dir).filter(col("vec_id") % 6 === 3), storeDir, probes = 2)
    }),

    // Per-cell occupancy of the stored assignment — the rebuild-policy
    // monitor (appends against frozen centroids only DEEPEN cells; the
    // serve pair leg is quadratic in cell population, so occupancy drift
    // is the signal to retrain). Oracle replays auto-k + the Lloyd build
    // + home-cell assignment, then counts per cell.
    "q156_cluster_occupancy" -> ((s, dir) =>
      ClusterStore.cellStats(s, clusterStoreFixture(s, dir))),

    // LSH-bucketed ANN (the 100 TB scale path): 8-bit random-hyperplane
    // signature, candidates restricted to the same bucket, best match per
    // query. Shuffles on the signature instead of materializing n² pairs.
    "q29_ann_lsh" -> ((s, dir) => {
      val e = prepared(s, dir)
        .withColumn("sig", VectorOps.hyperplaneSig(col("q"), SigBits, Dims))
      val qs = e.filter(col("vec_id") < 50)
      val scored = withSim(
        qs.as("a").join(e.as("b"),
          col("a.sig") === col("b.sig") && col("a.vec_id") =!= col("b.vec_id")))
      val w = Window.partitionBy(col("a_id")).orderBy(col("sim").desc, col("b_id").asc)
      scored
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") === 1)
        .select(col("a_id"), col("b_id"), col("sim"))
    })
  )

  /** Parameterized banded embedding near-dup (cos ≥ 0.5 pairs; the body
    * behind q61). `rowBits` is THE scale knob: buckets per band =
    * 2^rowBits, so per-band candidate volume is ~n²/2^(rowBits+1) —
    * size it as rowBits ≈ log₂(n / targetBucketSize) so bucket occupancy
    * (and with it the only super-linear term) stays constant as n grows.
    * `bands` then buys recall: 1-(1-p^rowBits)^bands with p = 1-θ/π the
    * per-hyperplane agreement at the target similarity. bands·rowBits ≤ 63
    * (single-long signature; the DuckDB oracle mirrors any such setting).
    * The q61 defaults (8×6) size 64 buckets/band to the THOUSANDS-of-rows
    * test tables; at 10⁹ rows the same recall/noise point wants e.g.
    * rowBits ≈ 24 at a production (high-τ, p→1) threshold.
    */
  def bandedNearDup(s: SparkSession, dir: String, bands: Int, rowBits: Int): DataFrame = {
    require(bands * rowBits <= 63, "signature must fit one long")
    val e = prepared(s, dir)
      .withColumn("sig", VectorOps.hyperplaneSig(col("q"), bands * rowBits, Dims))
    val mask = lit(((1L << rowBits) - 1))
    val banded = e.select(
      col("vec_id"),
      posexplode(array((0 until bands).map(b =>
        shiftright(col("sig"), b * rowBits).bitwiseAND(mask)): _*))
        .as(Seq("band_idx", "band_key")))
    val cand = banded.as("x")
      .join(banded.as("y"),
        col("x.band_idx") === col("y.band_idx") &&
          col("x.band_key") === col("y.band_key") &&
          col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("a_vid"), col("y.vec_id").as("b_vid"))
      .distinct()
    val side = e.select(col("vec_id"), col("q"), col("n2"))
    withSim(
      cand
        .join(side.as("a"), col("a_vid") === col("a.vec_id"))
        .join(side.as("b"), col("b_vid") === col("b.vec_id")))
      .filter(col("dot_q") > 0 &&
        lit(4) * col("dot_q") * col("dot_q") >= col("na") * col("nb"))
      .select(col("a_id"), col("b_id"), col("dot_q"), col("sim"))
  }

  /** SemDeDup core over ANY (vec_id, q, n2) frame (see q121's scaladoc):
    * one deterministic Lloyd iteration (`Ann.lloyd` — lowest-id seeds,
    * integer argmin, floor-div mean), then per-cluster pairwise
    * exact-integer cosine at τ=0.5, dropping the larger vec_id of each
    * qualifying pair. Output: (vec_id, cid, dropped 0|1) for every input
    * vector (cid = HOME cell) — the keep/drop decision table a pipeline
    * filters on.
    *
    * `probes` is the recall knob (the same multi-probe idea the ANN suite
    * pins laws for): a pair is compared when the two vectors share ANY of
    * their top-`probes` cells, so a near-dup pair straddling a cell
    * boundary is still caught. Measured on the sf0.1 embeddings (k=8,
    * τ=0.5, vs the exact q45 global prune): probes=1 finds 6/14 drops,
    * probes=2 finds 12/14 — both with zero spurious drops (COVERAGE.md);
    * candidate volume grows ≤ probes² per cell.
    */
  def semanticDedup(s: SparkSession, e: DataFrame, k: Int,
                    probes: Int = 1, tauTenths: Int = 5): DataFrame = {
    require(probes >= 1 && probes <= k, s"need 1 <= probes <= k, got $probes")
    require(tauTenths >= 1 && tauTenths <= 9,
      s"need 1 <= tauTenths <= 9, got $tauTenths")
    val model = Ann.trainCentroidsFrom(s, e, k, iters = 1)
    // the ranked assignment feeds THREE branches (both pair-join sides +
    // the output keep/drop table) and each re-execution re-pays the
    // broadcast argmin — materialize once (nearDupPairs' shared-prep
    // discipline)
    val ranked = graft.text.Dedup.materialize(Ann
      .rankCells(e, Ann.centroidsDF(s, model))
      .filter(col("rn") <= probes)
      .select(col("vec_id"), col("q"), col("n2"), col("cid"), col("rn")))
    // cos ≥ t/10 on integers: (10·dot)² ≥ t²·na·nb with dot > 0 — exact,
    // and at the default t=5 identical decisions to the historical
    // 4·dot² ≥ na·nb rule (q121/q128's oracle replays it). Headroom: for
    // scale-1e4 unit vectors dot ≤ ~1e8, so 100·dot² ≤ 1e18 < Long.Max.
    val tSq = tauTenths.toLong * tauTenths
    // Explicit-width repartition on the join key (r18): the per-cell
    // pair join's shuffle bytes are small but every output row pays an
    // exact-integer dot product — AQE's bytes-based coalescing narrowed
    // the verify stage (the q108 disease; q128's 8→32 core scaling read
    // 0.70 in the r17 driver block). The repartition REPLACES the
    // join's own exchange on that side, nothing extra is shuffled.
    // In-JVM A/B (tools.AbBench): q128 1.92 -> 1.32 s, q121 1.42 -> 1.37.
    val rankedW = ranked.repartition(
      s.sparkContext.defaultParallelism, col("cid"))
    val drops = withSim(
      rankedW.as("a").join(rankedW.as("b"),
        col("a.cid") === col("b.cid") && col("a.vec_id") < col("b.vec_id")))
      .filter(col("dot_q") > 0 &&
        lit(100L) * col("dot_q") * col("dot_q") >= lit(tSq) * col("na") * col("nb"))
      .select(col("b_id").as("vec_id")).distinct()
    ranked.filter(col("rn") === 1).select(col("vec_id"), col("cid"))
      .join(drops.withColumn("dropped", lit(1)), Seq("vec_id"), "left")
      .na.fill(0, Seq("dropped"))
  }

  /** [[semanticDedup]] with the k DERIVED instead of caller-known — the
    * in-session default entry point. Pays one count job to derive k.
    *
    * `targetCellSize = 0` (the default) sizes k by `ClusterStore
    * .balancedK`: k* = √(n/6), the measured cost/recall KNEE that
    * balances the n·k assignment leg against the n²/k pair leg. The old
    * default — autoK's k = ⌈n/64⌉ — pinned CELL population (bounding
    * the pair leg) but made assignment quadratic in n AND costs recall
    * (small cells split more twin pairs): the r11 idle-box τ=0.9 sweep
    * at n=21k measures k=59 at 2.44 s / 965 of 1000 vs autoK=329's
    * 1.90 s / 941 and k=32's 3.34 s / 969 — see balancedK's scaladoc
    * for the full frontier and the r10-artifact correction. A positive
    * `targetCellSize` keeps the explicit autoK sizing for callers who
    * need a specific cell geometry (the store path's build uses it:
    * serve-side assignment is drop×k, so bounded cells are right
    * THERE).
    *
    * probes defaults to 2 here (unlike the raw-k [[semanticDedup]], whose
    * q121-pinned default stays 1): derived-k regimes are where near-dup
    * pairs straddle cell boundaries, and the measured τ=0.9 frontier
    * (SemBench planted twins, COVERAGE.md) shows probes=2 recovering the
    * straddled pairs for ~zero marginal cost.
    */
  def semanticDedupByCellSize(s: SparkSession, e: DataFrame,
                              targetCellSize: Int = 0,
                              probes: Int = 2,
                              tauTenths: Int = 5): DataFrame = {
    val k =
      if (targetCellSize == 0) ClusterStore.balancedK(e.count())
      else ClusterStore.autoK(e.count(), targetCellSize)
    semanticDedup(s, e, k, probes, tauTenths)
  }

  /** q129's cluster store, built ONCE per (session, sf-dir) from the
    * corpus split (vec_id % 3 != 0) with auto-sized k and reused by every
    * q129 invocation in the JVM (Bench times the build separately as
    * q129_build). Temp dir removed on JVM exit; reuse is safe because
    * q129 serves read-only, so the store is immutable after build.
    */
  private val clusterStores =
    new java.util.concurrent.ConcurrentHashMap[(Int, String), String]()

  private[graft] def clusterStoreFixture(s: SparkSession, dir: String): String =
    clusterStores.computeIfAbsent((System.identityHashCode(s), dir), { _ =>
      val storeDir = java.nio.file.Files
        .createTempDirectory("graft-clusterstore").toString
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        import java.nio.file.{Files => F, Paths}
        import scala.jdk.CollectionConverters._
        val p = Paths.get(storeDir)
        if (F.exists(p))
          F.walk(p).iterator().asScala.toSeq.reverseIterator
            .foreach(q => F.deleteIfExists(q))
      }))
      ClusterStore.buildAuto(
        prepared(s, dir).filter(col("vec_id") % 3 =!= 0), storeDir,
        targetCellSize = StoreCellSize, iters = 1)
      storeDir
    })

  /** q129's targetCellSize — shared with the oracle's `(n + 63) // 64`. */
  private val StoreCellSize = 64

  /** q134's fixture: the q129 store AFTER absorbing drop 1 — built from
    * the corpus split, then drop 1 (vec_id % 6 == 0) served through the
    * STAGED commit path so its survivors land in the vectors table via a
    * real parquet append. Separate dir from [[clusterStoreFixture]] (q129
    * must keep serving against the un-appended store).
    */
  private[graft] def appendedClusterStoreFixture(s: SparkSession, dir: String): String =
    clusterStores.computeIfAbsent((System.identityHashCode(s), dir + "#appended"), { _ =>
      val storeDir = java.nio.file.Files
        .createTempDirectory("graft-clusterstore-app").toString
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        import java.nio.file.{Files => F, Paths}
        import scala.jdk.CollectionConverters._
        val p = Paths.get(storeDir)
        if (F.exists(p))
          F.walk(p).iterator().asScala.toSeq.reverseIterator
            .foreach(q => F.deleteIfExists(q))
      }))
      ClusterStore.buildAuto(
        prepared(s, dir).filter(col("vec_id") % 3 =!= 0), storeDir,
        targetCellSize = StoreCellSize, iters = 1)
      ClusterStore.dedupNewDropVsStore(
        prepared(s, dir).filter(col("vec_id") % 6 === 0), storeDir, probes = 2)
      storeDir
    })

  /** q142's store: the q134 lifecycle (build + drop-1 append) followed by
    * `ClusterStore.removeDocs` of every stored vector with vec_id % 5 ==
    * 1 — corpus rows and appended survivors alike. Separate dir from
    * [[appendedClusterStoreFixture]] (q134 keeps the un-purged store);
    * q142 serves read-only, so reuse is safe.
    */
  private[graft] def takedownClusterStoreFixture(s: SparkSession, dir: String): String =
    clusterStores.computeIfAbsent((System.identityHashCode(s), dir + "#takedown"), { _ =>
      val storeDir = java.nio.file.Files
        .createTempDirectory("graft-clusterstore-td").toString
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        import java.nio.file.{Files => F, Paths}
        import scala.jdk.CollectionConverters._
        val p = Paths.get(storeDir)
        if (F.exists(p))
          F.walk(p).iterator().asScala.toSeq.reverseIterator
            .foreach(q => F.deleteIfExists(q))
      }))
      ClusterStore.buildAuto(
        prepared(s, dir).filter(col("vec_id") % 3 =!= 0), storeDir,
        targetCellSize = StoreCellSize, iters = 1)
      ClusterStore.dedupNewDropVsStore(
        prepared(s, dir).filter(col("vec_id") % 6 === 0), storeDir, probes = 2)
      ClusterStore.removeDocs(s, storeDir,
        prepared(s, dir).filter(col("vec_id") % 5 === 1).select(col("vec_id")))
      storeDir
    })

  // ---- DuckDB oracles ------------------------------------------------------

  private[graft] val quantCte =
    s"""e AS (SELECT vec_id, list_transform(embedding,
       |    x -> CAST(round(CAST(x AS DOUBLE)*$Scale) AS BIGINT)) AS q
       |  FROM embeddings),
       |n AS (SELECT vec_id, q, CAST(list_sum(list_transform(
       |    range(1, len(q)+1), i -> q[i]*q[i])) AS BIGINT) AS n2 FROM e)""".stripMargin

  private[graft] val dotExpr =
    "CAST(list_sum(list_transform(range(1, len(a.q)+1), i -> a.q[i]*b.q[i])) AS BIGINT)"

  /** One-iteration Lloyd-replay CTE chain over source CTE `src`
    * (vec_id, q, n2 columns) with `kSel` seed cells (`kSel` is any scalar
    * SQL expression — a literal for the fixed-k gates, a scalar subquery
    * for the auto-k store): seed cells → argmin d² assignment →
    * exact-integer floor-div mean update → trained model `c1n(cid, cq,
    * cn2)`. Rank assignments against the model with [[rankCte]].
    */
  private def lloydChain(src: String, kSel: String): String =
    s"""c0 AS (SELECT vec_id AS cid, q AS cq FROM $src
       |  QUALIFY row_number() OVER (ORDER BY vec_id) <= $kSel),
       |c0n AS (SELECT cid, cq, CAST(list_sum(list_transform(range(1, len(cq)+1),
       |    i -> cq[i]*cq[i])) AS BIGINT) AS cn2 FROM c0),
       |a1 AS (SELECT vec_id, q, cid FROM (
       |  SELECT v.vec_id, v.q, c.cid,
       |    row_number() OVER (PARTITION BY v.vec_id ORDER BY
       |      v.n2 - 2*CAST(list_sum(list_transform(range(1, len(v.q)+1),
       |        i -> v.q[i]*c.cq[i])) AS BIGINT) + c.cn2 ASC, c.cid ASC) AS rn
       |  FROM $src v CROSS JOIN c0n c) WHERE rn = 1),
       |e1 AS (SELECT cid, unnest(range(1, len(q)+1)) AS d, q FROM a1),
       |s1 AS (SELECT cid, d, sum(q[d]) AS sv, count(*) AS nn FROM e1 GROUP BY 1,2),
       |m1 AS (SELECT cid, list(CAST((sv - ((sv % nn) + nn) % nn) // nn AS BIGINT)
       |    ORDER BY d) AS mq FROM s1 GROUP BY cid),
       |c1 AS (SELECT c0n.cid, coalesce(m1.mq, c0n.cq) AS cq
       |  FROM c0n LEFT JOIN m1 USING (cid)),
       |c1n AS (SELECT cid, cq, CAST(list_sum(list_transform(range(1, len(cq)+1),
       |    i -> cq[i]*cq[i])) AS BIGINT) AS cn2 FROM c1)""".stripMargin

  /** `$name(vec_id, q, n2, cid, rn)`: `src` ranked against the trained
    * `c1n` model by exact-integer d² (rn = 1 is the home cell; consumers
    * filter the probe depth they need) — the SQL mirror of
    * `Ann.rankCells`.
    */
  private def rankCte(name: String, src: String): String =
    s"""$name AS (
       |  SELECT v.vec_id, v.q, v.n2, c.cid,
       |    row_number() OVER (PARTITION BY v.vec_id ORDER BY
       |      v.n2 - 2*CAST(list_sum(list_transform(range(1, len(v.q)+1),
       |        i -> v.q[i]*c.cq[i])) AS BIGINT) + c.cn2 ASC, c.cid ASC) AS rn
       |  FROM $src v CROSS JOIN c1n c)""".stripMargin

  /** Shared chain for the fixed-k SemDeDup oracles (q121/q128): the whole
    * table trains the model and `ranked` is its re-ranked assignment.
    */
  private val lloydCtes =
    s"""$quantCte,
       |${lloydChain("n", Centroids.toString)},
       |${rankCte("ranked", "n")}""".stripMargin

  private def sigExprOf(bits: Int): String = (0 until bits).map { i =>
    s"""(CASE WHEN list_sum(list_transform(range(1, len(q)+1),
       |    j -> q[j] * (CASE WHEN ('0x'||substr(md5('$i:'||j),1,1))::INT % 2 = 1
       |                 THEN 1 ELSE -1 END))) > 0
       |  THEN ${1L << i} ELSE 0 END)""".stripMargin
  }.mkString(" +\n  ")

  private val sigExpr = sigExprOf(SigBits)

  /** q134's full-lifecycle replay — build on the corpus split, drop-1
    * serve, survivor append, drop-2 serve. With `keepWhere`, a takedown
    * filter is applied to the STORED side between the append and the
    * final serve (q142's `ClusterStore.removeDocs`): assignments are
    * per-vector rows, so removal is a plain filter here too, and the
    * centroid model stays frozen in both engines.
    */
  private def storeAppendServeOracle(keepWhere: Option[String]): String = {
    val storedFinal = keepWhere match {
      case Some(w) => s"stored2 AS (SELECT * FROM stored1 WHERE $w)"
      case None    => "stored2 AS (SELECT * FROM stored1)"
    }
    s"""WITH $quantCte,
       |corp AS (SELECT vec_id, q, n2 FROM n WHERE vec_id % 3 <> 0),
       |kk AS (SELECT (count(*) + ${StoreCellSize - 1}) // $StoreCellSize AS k
       |  FROM corp),
       |${lloydChain("corp", "(SELECT k FROM kk)")},
       |${rankCte("storedr", "corp")},
       |stored0 AS (SELECT vec_id, q, n2, cid FROM storedr WHERE rn = 1),
       |d1 AS (SELECT vec_id, q, n2 FROM n WHERE vec_id % 6 = 0),
       |${rankCte("d1r", "d1")},
       |d1p AS (SELECT vec_id, q, n2, cid FROM d1r WHERE rn <= 2),
       |x1 AS (SELECT a.vec_id AS a_id, $dotExpr AS dot_q, a.n2 na, b.n2 nb
       |  FROM d1p a JOIN stored0 b ON a.cid = b.cid),
       |i1 AS (SELECT a.vec_id a_id, b.vec_id b_id, $dotExpr AS dot_q,
       |    a.n2 na, b.n2 nb
       |  FROM d1p a JOIN d1p b ON a.cid = b.cid AND a.vec_id < b.vec_id),
       |dr1 AS (SELECT DISTINCT a_id AS vec_id FROM x1
       |    WHERE dot_q > 0 AND 4*dot_q*dot_q >= na*nb
       |  UNION
       |  SELECT DISTINCT b_id AS vec_id FROM i1
       |    WHERE dot_q > 0 AND 4*dot_q*dot_q >= na*nb),
       |surv1 AS (SELECT vec_id, q, n2, cid FROM d1r
       |  WHERE rn = 1 AND vec_id NOT IN (SELECT vec_id FROM dr1)),
       |stored1 AS (SELECT * FROM stored0 UNION ALL SELECT * FROM surv1),
       |$storedFinal,
       |d2 AS (SELECT vec_id, q, n2 FROM n WHERE vec_id % 6 = 3),
       |${rankCte("d2r", "d2")},
       |d2p AS (SELECT vec_id, q, n2, cid FROM d2r WHERE rn <= 2),
       |x2 AS (SELECT a.vec_id AS a_id, $dotExpr AS dot_q, a.n2 na, b.n2 nb
       |  FROM d2p a JOIN stored2 b ON a.cid = b.cid),
       |i2 AS (SELECT a.vec_id a_id, b.vec_id b_id, $dotExpr AS dot_q,
       |    a.n2 na, b.n2 nb
       |  FROM d2p a JOIN d2p b ON a.cid = b.cid AND a.vec_id < b.vec_id),
       |dr2 AS (SELECT DISTINCT a_id AS vec_id FROM x2
       |    WHERE dot_q > 0 AND 4*dot_q*dot_q >= na*nb
       |  UNION
       |  SELECT DISTINCT b_id AS vec_id FROM i2
       |    WHERE dot_q > 0 AND 4*dot_q*dot_q >= na*nb),
       |home AS (SELECT vec_id, cid FROM d2r WHERE rn = 1)
       |SELECT home.vec_id, home.cid,
       |  CAST(CASE WHEN dr2.vec_id IS NULL THEN 0 ELSE 1 END AS INT) AS dropped
       |FROM home LEFT JOIN dr2 USING (vec_id)""".stripMargin
  }

  def oracles: Map[String, String] = Map(
    // Replays the ENTIRE deterministic Lloyd iteration (seed cells → argmin
    // d² assignment → exact-integer floor-div mean → reassignment) before
    // the intra-cluster prune — possible only because the Spark training
    // loop is integer-exact and partitioning-order independent.
    "q121_semantic_dedup" ->
      s"""WITH $lloydCtes,
         |a2 AS (SELECT vec_id, q, n2, cid FROM ranked WHERE rn = 1),
         |p AS (SELECT a.vec_id a_id, b.vec_id b_id, $dotExpr AS dot_q,
         |    a.n2 na, b.n2 nb
         |  FROM a2 a JOIN a2 b ON a.cid = b.cid AND a.vec_id < b.vec_id),
         |dr AS (SELECT DISTINCT b_id FROM p
         |  WHERE dot_q > 0 AND 4*dot_q*dot_q >= na*nb)
         |SELECT a2.vec_id, a2.cid,
         |  CAST(CASE WHEN dr.b_id IS NULL THEN 0 ELSE 1 END AS INT) AS dropped
         |FROM a2 LEFT JOIN dr ON a2.vec_id = dr.b_id""".stripMargin,
    // Replays the ENTIRE store lifecycle: auto-k (⌈n/64⌉ over the corpus
    // split), the integer Lloyd build on vec_id % 3 != 0, home-cell stored
    // assignment, then the serve — top-2 probe assignment of the drop
    // (vec_id % 3 = 0) against the STORED model, cross drops vs same-cell
    // stored vectors, intra-drop smallest-id survivorship.
    "q129_store_semdedup" ->
      s"""WITH $quantCte,
         |corp AS (SELECT vec_id, q, n2 FROM n WHERE vec_id % 3 <> 0),
         |kk AS (SELECT (count(*) + ${StoreCellSize - 1}) // $StoreCellSize AS k
         |  FROM corp),
         |${lloydChain("corp", "(SELECT k FROM kk)")},
         |${rankCte("storedr", "corp")},
         |stored AS (SELECT vec_id, q, n2, cid FROM storedr WHERE rn = 1),
         |newv AS (SELECT vec_id, q, n2 FROM n WHERE vec_id % 3 = 0),
         |${rankCte("newr", "newv")},
         |np AS (SELECT vec_id, q, n2, cid FROM newr WHERE rn <= 2),
         |xp AS (SELECT a.vec_id AS a_id, $dotExpr AS dot_q, a.n2 na, b.n2 nb
         |  FROM np a JOIN stored b ON a.cid = b.cid),
         |ip AS (SELECT a.vec_id a_id, b.vec_id b_id, $dotExpr AS dot_q,
         |    a.n2 na, b.n2 nb
         |  FROM np a JOIN np b ON a.cid = b.cid AND a.vec_id < b.vec_id),
         |dr AS (SELECT DISTINCT a_id AS vec_id FROM xp
         |    WHERE dot_q > 0 AND 4*dot_q*dot_q >= na*nb
         |  UNION
         |  SELECT DISTINCT b_id AS vec_id FROM ip
         |    WHERE dot_q > 0 AND 4*dot_q*dot_q >= na*nb),
         |home AS (SELECT vec_id, cid FROM newr WHERE rn = 1)
         |SELECT home.vec_id, home.cid,
         |  CAST(CASE WHEN dr.vec_id IS NULL THEN 0 ELSE 1 END AS INT) AS dropped
         |FROM home LEFT JOIN dr USING (vec_id)""".stripMargin,
    // q156: the same auto-k + Lloyd + home-cell assignment replay as
    // q129, rolled up to per-cell counts.
    "q156_cluster_occupancy" ->
      s"""WITH $quantCte,
         |corp AS (SELECT vec_id, q, n2 FROM n WHERE vec_id % 3 <> 0),
         |kk AS (SELECT (count(*) + ${StoreCellSize - 1}) // $StoreCellSize AS k
         |  FROM corp),
         |${lloydChain("corp", "(SELECT k FROM kk)")},
         |${rankCte("storedr", "corp")}
         |SELECT cid, count(*) AS n_vec FROM storedr WHERE rn = 1
         |GROUP BY cid""".stripMargin,
    // Replays the full store lifecycle TWICE over: build on the corpus
    // split, drop-1 serve (cross + intra legs), survivor append, then the
    // gated drop-2 serve against corpus ∪ survivors.
    "q134_store_append_serve" -> storeAppendServeOracle(keepWhere = None),
    // q142 purged vec_id % 5 = 1 from the appended store before the
    // drop-2 serve (ClusterStore.removeDocs); stored assignments are
    // per-vector rows with no rollup, so the exact oracle is q134's
    // replay with the stored side filtered — the model (centroids) stays
    // frozen in BOTH engines.
    "q142_cluster_takedown" ->
      storeAppendServeOracle(keepWhere = Some("vec_id % 5 <> 1")),
    "q128_semantic_dedup_p2" ->
      s"""WITH $lloydCtes,
         |ap AS (SELECT vec_id, q, n2, cid FROM ranked WHERE rn <= 2),
         |p AS (SELECT a.vec_id a_id, b.vec_id b_id, $dotExpr AS dot_q,
         |    a.n2 na, b.n2 nb
         |  FROM ap a JOIN ap b ON a.cid = b.cid AND a.vec_id < b.vec_id),
         |dr AS (SELECT DISTINCT b_id FROM p
         |  WHERE dot_q > 0 AND 4*dot_q*dot_q >= na*nb),
         |ah AS (SELECT vec_id, cid FROM ranked WHERE rn = 1)
         |SELECT ah.vec_id, ah.cid,
         |  CAST(CASE WHEN dr.b_id IS NULL THEN 0 ELSE 1 END AS INT) AS dropped
         |FROM ah LEFT JOIN dr ON ah.vec_id = dr.b_id""".stripMargin,
    "q50_ann_ivf" ->
      s"""WITH $quantCte,
         |c AS (SELECT vec_id AS cid, q AS cq FROM n WHERE vec_id < $Centroids),
         |ass AS (SELECT vec_id, q, n2, cid FROM (
         |  SELECT v.vec_id, v.q, v.n2, c.cid,
         |    row_number() OVER (PARTITION BY v.vec_id ORDER BY
         |      CAST(list_sum(list_transform(range(1, len(v.q)+1),
         |        i -> v.q[i]*c.cq[i])) AS BIGINT) DESC, c.cid) AS rn
         |  FROM n v CROSS JOIN c) WHERE rn = 1),
         |p AS (SELECT a.vec_id a_id, b.vec_id b_id, $dotExpr AS dot_q,
         |    a.n2 na, b.n2 nb
         |  FROM ass a JOIN ass b
         |  ON a.cid = b.cid AND a.vec_id < 10 AND a.vec_id != b.vec_id),
         |r AS (SELECT a_id, b_id,
         |    CAST(dot_q AS DOUBLE)/sqrt(CAST(na*nb AS DOUBLE)) AS sim
         |  FROM p)
         |SELECT a_id, b_id,
         |  CAST(row_number() OVER (PARTITION BY a_id ORDER BY sim DESC, b_id) AS INT) AS rank,
         |  sim
         |FROM r QUALIFY rank <= 3""".stripMargin,
    "q27_embed_pairs" ->
      s"""WITH $quantCte,
         |p AS (SELECT a.vec_id a_id, b.vec_id b_id, $dotExpr AS dot_q,
         |    a.n2 na, b.n2 nb
         |  FROM n a JOIN n b ON a.vec_id < b.vec_id)
         |SELECT a_id, b_id, dot_q,
         |  CAST(dot_q AS DOUBLE)/sqrt(CAST(na*nb AS DOUBLE)) AS sim
         |FROM p ORDER BY sim DESC, a_id, b_id LIMIT 20""".stripMargin,
    "q28_ann_topk" ->
      s"""WITH $quantCte,
         |p AS (SELECT a.vec_id a_id, b.vec_id b_id, $dotExpr AS dot_q,
         |    a.n2 na, b.n2 nb
         |  FROM n a JOIN n b ON a.vec_id < 10 AND a.vec_id != b.vec_id),
         |r AS (SELECT a_id, b_id,
         |    CAST(dot_q AS DOUBLE)/sqrt(CAST(na*nb AS DOUBLE)) AS sim
         |  FROM p)
         |SELECT a_id, b_id,
         |  CAST(row_number() OVER (PARTITION BY a_id ORDER BY sim DESC, b_id) AS INT) AS rank,
         |  sim
         |FROM r QUALIFY rank <= 5""".stripMargin,
    "q45_embed_neardup" ->
      s"""WITH $quantCte,
         |p AS (SELECT a.vec_id a_id, b.vec_id b_id, $dotExpr AS dot_q,
         |    a.n2 na, b.n2 nb
         |  FROM n a JOIN n b ON a.vec_id < b.vec_id)
         |SELECT a_id, b_id, dot_q,
         |  CAST(dot_q AS DOUBLE)/sqrt(CAST(na*nb AS DOUBLE)) AS sim
         |FROM p WHERE dot_q > 0 AND 4*dot_q*dot_q >= na*nb""".stripMargin,
    "q61_embed_lsh_neardup" ->
      s"""WITH $quantCte,
         |sigs AS (SELECT vec_id, q, n2, CAST(${sigExprOf(Bands * RowBits)} AS BIGINT) AS sig
         |  FROM n),
         |banded AS (SELECT vec_id, b.band_idx,
         |    (sig >> (b.band_idx * $RowBits)) & ${(1 << RowBits) - 1} AS band_key
         |  FROM sigs, (SELECT unnest(range($Bands)) AS band_idx) b),
         |cand AS (SELECT DISTINCT x.vec_id AS a_vid, y.vec_id AS b_vid
         |  FROM banded x JOIN banded y
         |  ON x.band_idx = y.band_idx AND x.band_key = y.band_key
         |    AND x.vec_id < y.vec_id),
         |p AS (SELECT a.vec_id a_id, b.vec_id b_id, $dotExpr AS dot_q,
         |    a.n2 na, b.n2 nb
         |  FROM cand JOIN sigs a ON a_vid = a.vec_id JOIN sigs b ON b_vid = b.vec_id)
         |SELECT a_id, b_id, dot_q,
         |  CAST(dot_q AS DOUBLE)/sqrt(CAST(na*nb AS DOUBLE)) AS sim
         |FROM p WHERE dot_q > 0 AND 4*dot_q*dot_q >= na*nb""".stripMargin,
    "q29_ann_lsh" ->
      s"""WITH $quantCte,
         |sigs AS (SELECT vec_id, q, n2, CAST($sigExpr AS BIGINT) AS sig FROM n),
         |p AS (SELECT a.vec_id a_id, b.vec_id b_id, $dotExpr AS dot_q,
         |    a.n2 na, b.n2 nb
         |  FROM sigs a JOIN sigs b
         |  ON a.sig = b.sig AND a.vec_id < 50 AND a.vec_id != b.vec_id),
         |r AS (SELECT a_id, b_id,
         |    CAST(dot_q AS DOUBLE)/sqrt(CAST(na*nb AS DOUBLE)) AS sim
         |  FROM p)
         |SELECT a_id, b_id, sim FROM r
         |QUALIFY row_number() OVER (PARTITION BY a_id ORDER BY sim DESC, b_id) = 1""".stripMargin
  )
}
