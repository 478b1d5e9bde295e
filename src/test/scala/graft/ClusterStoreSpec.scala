package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.vector.{ClusterStore, Queries}

/** Persisted embedding-cluster-store lifecycle (the q106 build/serve split
  * for the semantic-dedup path): build trains+persists once, serve assigns
  * only the drop against the STORED model, survivors append, staged
  * commits mutate nothing until the thunk runs, and re-runs are
  * idempotent.
  */
class ClusterStoreSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** (vec_id, q, n2) — the `Queries.prepared` shape over literal
    * quantized vectors.
    */
  private def prep(vecs: Seq[(Long, Seq[Long])]): DataFrame =
    vecs.toDF("vec_id", "q")
      .withColumn("n2", graft.functions.VectorDot.of(col("q"), col("q")))

  // one cell (k=1) keeps the geometry trivial: every pair is same-cell,
  // so only the cosine rule decides
  private val corpus = prep(Seq(
    1L -> Seq(10L, 0L, 0L, 0L),
    2L -> Seq(0L, 10L, 0L, 0L)))

  test("staged build commits atomically; serve drops vs store and intra-drop, appends survivors, idempotent") {
    val dir = Files.createTempDirectory("clusterstore").toString
    val commit = ClusterStore.buildStaged(corpus, dir, k = 1)
    assert(!ClusterStore.exists(spark, dir), "store absent until commit")
    commit()
    assert(ClusterStore.exists(spark, dir))
    assert(ClusterStore.loadVectors(spark, dir).count() === 2L)
    assert(ClusterStore.loadCentroids(spark, dir).size === 1)

    val drop = prep(Seq(
      3L -> Seq(10L, 0L, 0L, 0L), // dup of stored 1 → dropped
      4L -> Seq(0L, 0L, 10L, 0L), // orthogonal to everything → survives
      5L -> Seq(0L, 0L, 10L, 1L))) // near-dup of drop-mate 4 → dropped
    val decisions = ClusterStore.dedupNewDropVsStore(drop, dir)
      .select("vec_id", "dropped").as[(Long, Int)].collect().toMap
    assert(decisions === Map(3L -> 1, 4L -> 0, 5L -> 1))
    assert(ClusterStore.loadVectors(spark, dir).count() === 3L,
      "exactly the survivor's row is appended")

    // idempotent: same drop again — 4 now matches its stored self
    val again = ClusterStore.dedupNewDropVsStore(drop, dir)
      .filter(col("dropped") === 0).count()
    assert(again === 0L)
    assert(ClusterStore.loadVectors(spark, dir).count() === 3L, "no growth on re-run")

    // cross-drop dependence: vector 9 near-dups ONLY the appended
    // survivor 4 (cos = 1 with [0,0,10,0]; orthogonal to the original
    // corpus) — it can drop only because the drop-1 append really landed
    val drop2 = prep(Seq(9L -> Seq(0L, 0L, 20L, 0L)))
    val d2 = ClusterStore.dedupNewDropVsStore(drop2, dir)
      .select("vec_id", "dropped").as[(Long, Int)].collect().toMap
    assert(d2 === Map(9L -> 1),
      "a drop-2 decision must see drop-1's appended survivors")
  }

  test("staged serve mutates nothing until commit; read-only serve never stages") {
    val dir = Files.createTempDirectory("clusterstore-staged").toString
    ClusterStore.build(corpus, dir, k = 1)
    val drop = prep(Seq(6L -> Seq(0L, 0L, 0L, 7L)))

    val (decisions, commit) = ClusterStore.dedupNewDropVsStoreStaged(drop, dir)
    assert(decisions.filter(col("dropped") === 0).count() === 1L)
    assert(ClusterStore.loadVectors(spark, dir).count() === 2L,
      "append not visible before commit")
    commit()
    assert(ClusterStore.loadVectors(spark, dir).count() === 3L)

    def listing = {
      val root = new java.io.File(dir)
      def walk(f: java.io.File): Seq[(String, Long)] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
        else Seq(f.getPath -> f.length())
      walk(root).sortBy(_._1)
    }
    val before = listing
    val ro = ClusterStore.dedupNewDropVsStoreReadOnly(drop, dir)
    assert(ro.filter(col("dropped") === 1).count() === 1L,
      "6 now dups its own stored copy")
    assert(listing === before, "read-only serve leaves the store byte-identical")
  }

  test("autoK pins cell population: k = ceil(n/cell), floor 1") {
    assert(ClusterStore.autoK(0, 64) === 1)
    assert(ClusterStore.autoK(64, 64) === 1)
    assert(ClusterStore.autoK(65, 64) === 2)
    assert(ClusterStore.autoK(6400, 64) === 100)
    intercept[IllegalArgumentException](ClusterStore.autoK(10, 0))
  }

  test("balancedK: k* = round(sqrt(n/6)), floor 1 — grows as sqrt(n)") {
    assert(ClusterStore.balancedK(0) === 1)
    assert(ClusterStore.balancedK(6) === 1)
    assert(ClusterStore.balancedK(600) === 10)
    assert(ClusterStore.balancedK(21000) === 59)
    // 100x the data -> 10x the k (not 100x, the autoK shape that made
    // the assignment leg quadratic)
    assert(ClusterStore.balancedK(2100000) === 592)
    intercept[IllegalArgumentException](ClusterStore.balancedK(10, 0))
  }

  test("semanticDedupByCellSize == semanticDedup at the derived k (sf0.001)") {
    val e = Queries.prepared(spark, "/root/testdata/sf0.001")
    val n = e.count()
    val k = ClusterStore.autoK(n, 64)
    // by-cell-size defaults to probes=2 (the measured τ=0.9 frontier's
    // recall-closing knob); parity holds against the raw-k call at the
    // same probes
    val auto = Queries.semanticDedupByCellSize(spark, e, 64)
      .as[(Long, Long, Int)].collect().toSet
    val fixed = Queries.semanticDedup(spark, e, k, probes = 2)
      .as[(Long, Long, Int)].collect().toSet
    assert(auto === fixed)
    // the DEFAULT (targetCellSize = 0) sizes by balancedK instead
    val bal = Queries.semanticDedupByCellSize(spark, e)
      .as[(Long, Long, Int)].collect().toSet
    val fixedBal = Queries.semanticDedup(spark, e,
        ClusterStore.balancedK(n), probes = 2)
      .as[(Long, Long, Int)].collect().toSet
    assert(bal === fixedBal)
  }

  test("compact rewrites the vectors table identically into fewer files") {
    val dir = Files.createTempDirectory("clusterstore-compact").toString
    ClusterStore.build(corpus, dir, k = 1)
    // two appends → extra part files
    ClusterStore.dedupNewDropVsStore(prep(Seq(7L -> Seq(0L, 0L, 9L, 0L))), dir)
    ClusterStore.dedupNewDropVsStore(prep(Seq(8L -> Seq(0L, 0L, 0L, 9L))), dir)
    val before = ClusterStore.loadVectors(spark, dir)
      .as[(Long, Seq[Long], Long, Long)].collect().toSet
    ClusterStore.compact(spark, dir, targetFiles = 1)
    val after = ClusterStore.loadVectors(spark, dir)
      .as[(Long, Seq[Long], Long, Long)].collect().toSet
    assert(after === before, "compaction must not disturb a single row")
    val parts = new java.io.File(ClusterStore.vectorsPath(dir))
      .listFiles().count(_.getName.startsWith("part-"))
    assert(parts === 1)
  }

  test("removeDocs purges stored vectors, freezes centroids; a purged-dup incomer now survives") {
    val dir = Files.createTempDirectory("clusterstore-td").toString
    ClusterStore.build(corpus, dir, k = 1)
    val centroidsBefore = ClusterStore.loadCentroids(spark, dir)
    // vec 1 (10,0,0,0) is the only near-dup of the incoming vec 20
    val removed = ClusterStore.removeDocs(spark, dir, Seq(1L, 999L).toDF("vec_id"))
    assert(removed === 1L, "absent ids are not billed")
    assert(ClusterStore.loadVectors(spark, dir)
      .select("vec_id").as[Long].collect().toSet === Set(2L))
    assert(ClusterStore.loadCentroids(spark, dir) === centroidsBefore,
      "takedown must not retrain the model")
    val dec = ClusterStore
      .dedupNewDropVsStoreReadOnly(prep(Seq(20L -> Seq(9L, 0L, 0L, 0L))), dir)
      .select("vec_id", "dropped").as[(Long, Int)].collect().toSet
    assert(dec === Set((20L, 0)), "post-takedown serve == never-ingested")
    assertThrows[IllegalArgumentException] {
      ClusterStore.removeDocs(spark, dir, Seq(1L).toDF("doc_id"))
    }
  }
}
