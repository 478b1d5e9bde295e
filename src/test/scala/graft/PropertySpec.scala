package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Relational

/** FIXTURES.md §3 invariants as ScalaCheck properties over randomized
  * micro-datasets (the scatter/gather decomposability the reference
  * ASSUMES from GATK's docs, `sparkcaller/README.md:10-17`, here actually
  * property-tested).
  */
class PropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val params = SCTest.Parameters.default.withMinSuccessfulTests(10)

  private def check(name: String, prop: Prop,
                    p: SCTest.Parameters = params): Unit = {
    val res = SCTest.check(p, prop)
    assert(res.passed, s"$name: ${res.status}")
  }

  private val rowsGen: Gen[List[(Int, Long)]] =
    Gen.listOfN(60, Gen.zip(Gen.choose(0, 5), Gen.choose(-100L, 100L)))

  test("property: per-key aggregation is partitioning-independent (scatter/gather)") {
    check("scatter-gather", Prop.forAll(rowsGen, Gen.choose(1, 8)) { (rows, parts) =>
      val expected = rows.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      val got = rows.toDF("k", "v").repartition(parts)
        .groupBy("k").agg(sum("v")).as[(Int, Long)].collect().toMap
      got == expected
    })
  }

  test("property: duplicate-mark survivors are invariant under input permutation") {
    val gen = Gen.zip(rowsGen, Gen.choose(0L, 1000L))
    check("dedup-determinism", Prop.forAll(gen) { case (rows, seed) =>
      val df = rows.zipWithIndex.map { case ((k, v), i) => (k, v, i.toLong) }
        .toDF("k", "q", "id")
      def survivors(d: org.apache.spark.sql.DataFrame) =
        Relational.markDuplicates(d, Seq(col("k")), col("q"), Seq(col("id")))
          .filter(col("is_dup") === 0).select("id").as[Long].collect().toSet
      survivors(df) == survivors(df.orderBy(rand(seed)))
    })
  }

  test("property: topKPerKey equals the window formulation for random data/k/partitioning") {
    val gen = Gen.zip(rowsGen, Gen.choose(1, 6), Gen.choose(1, 8))
    check("topk-per-key", Prop.forAll(gen) { case (rows, k, parts) =>
      val df = rows.zipWithIndex.map { case ((key, v), i) => (key, v, i.toLong) }
        .toDF("k", "v", "id").repartition(parts)
      val ours = Relational.topKPerKey(
          df, Seq(col("k")), Seq(col("v").desc, col("id")), k)
        .as[(Int, Long, Long)].collect().toSet
      val expected = rows.zipWithIndex
        .map { case ((key, v), i) => (key, v, i.toLong) }
        .groupBy(_._1).values
        .flatMap(_.sortBy(t => (-t._2, t._3)).take(k))
        .toSet
      ours == expected
    })
  }

  test("property: sorted-union is associative over run grouping") {
    val runsGen = Gen.listOfN(3, Gen.listOfN(10, Gen.choose(-50, 50)))
    check("merge-associativity", Prop.forAll(runsGen) { runs =>
      val dfs = runs.map(_.zipWithIndex.toDF("k", "t"))
      val flat = Relational.sortedUnion(dfs, col("k").asc, col("t").asc)
        .as[(Int, Int)].collect().toSeq
      val nested = Relational.sortedUnion(
        Seq(Relational.sortedUnion(dfs.take(2), col("k").asc, col("t").asc), dfs(2)),
        col("k").asc, col("t").asc).as[(Int, Int)].collect().toSeq
      flat == nested
    })
  }

  test("property: greedy packing never overflows and packs every doc exactly once") {
    val docsGen = Gen.listOfN(40, Gen.choose(1L, 50L))
    check("pack-invariants", Prop.forAll(docsGen, Gen.choose(50, 120)) { (lens, maxTok) =>
      val df = lens.zipWithIndex.map { case (n, i) => (i.toLong + 1, n) }
        .toDF("doc_id", "n_tokens")
      val out = graft.operators.Packing
        .greedyPack(df, "doc_id", "n_tokens", maxTok, shards = 3)
        .join(df, "doc_id")
        .as[(Long, Int, Long, Long, Long)].collect()
      val once = out.map(_._1).distinct.length == lens.length
      val noOverflow = out.groupBy(r => (r._2, r._3)).values
        .forall(seq => seq.map(_._5).sum <= maxTok || seq.length == 1)
      once && noOverflow
    })
  }

  test("property: sliding chunks cover every token; strides reconstruct the doc") {
    val gen = Gen.zip(
      Gen.choose(1, 60),                          // doc length
      Gen.choose(2, 12).flatMap(sz => Gen.choose(1, sz).map(st => (sz, st))))
    check("chunk-invariants", Prop.forAll(gen) { case (n, (size, stride)) =>
      val toks = (1 to n).map(_.toString)
      val df = Seq((1L, toks)).toDF("doc_id", "ws")
      val chunks = graft.operators.Packing
        .slidingChunks(df, "doc_id", "ws", size, stride)
        .select("chunk_idx", "start_tok", "end_tok", "chunk")
        .as[(Int, Int, Int, Seq[String])].collect().sortBy(_._1)
      val starts = chunks.map(_._2).toSeq
      val expectedCount = if (n <= size) 1 else (n - size + stride - 1) / stride + 1
      val covered = chunks.flatMap(c => c._2 to c._3).distinct.sorted.toSeq
      // taking each chunk's first `stride` tokens (all of the last chunk)
      // reconstructs the doc exactly — the data-loader contract
      val rebuilt = chunks.dropRight(1).flatMap(_._4.take(stride)) ++
        chunks.last._4
      chunks.length == expectedCount &&
        starts == Seq.tabulate(chunks.length)(i => i * stride + 1) &&
        covered == (1 to n) &&
        rebuilt.toSeq == toks &&
        chunks.forall(c => c._4 == (c._2 to c._3).map(_.toString))
    })
  }

  test("property: heavyHitters equals brute-force groupBy-filter on random skewed data") {
    // items drawn from a small alphabet with a zipf-ish tilt so some runs
    // have qualifiers and some don't; k small enough that cap = 2k keeps
    // the MG decrement path busy
    val itemsGen = Gen.listOfN(120,
      Gen.frequency(8 -> Gen.const("hot"), 5 -> Gen.const("warm"),
        3 -> Gen.oneOf("c1", "c2", "c3"),
        2 -> Gen.choose(1, 500).map(i => s"r$i")))
    check("heavy-hitters", Prop.forAll(itemsGen, Gen.choose(2, 6),
      Gen.choose(1, 7)) { (items, k, parts) =>
        val df = items.toDF("item").repartition(parts)
        val n = items.size
        val expected = items.groupBy(identity).view.mapValues(_.size.toLong)
          .filter { case (_, c) => c * k >= n }.toMap
        val got = graft.operators.Scale.heavyHitters(df, "item", k)
          .as[(String, Long)].collect().toMap
        got == expected
    })
  }

  test("property: store-served novelty equals q126 from-scratch on the union, for any drop split") {
    // random tiny corpus of word sequences; an arbitrary subset is
    // "history" (split into two stored drops), the rest is the new drop
    val corpusGen = Gen.listOfN(14, Gen.zip(
      Gen.choose(1L, 10000L),
      Gen.listOfN(6, Gen.oneOf("a", "b", "c", "d", "e")).map(_.mkString(" "))))
      .map(_.distinctBy(_._1))
    check("gram-store-union", Prop.forAll(corpusGen, Gen.choose(0, 100)) {
      (corpus, splitSeed) =>
        val (hist, drop) = corpus.partition(r =>
          (r._1 + splitSeed) % 3 != 0)
        // vacuously true when the random split leaves either side empty
        (hist.isEmpty || drop.isEmpty) || {
          val dir = java.nio.file.Files
            .createTempDirectory("prop-gramstore").toString
          val (h1, h2) = hist.partition(_._1 % 2 == 0)
          graft.text.GramStore.build(
            (if (h1.nonEmpty) h1 else hist.take(1)).toDF("doc_id", "text"),
            dir, "d1")
          val rest = if (h1.nonEmpty) h2 else hist.drop(1)
          if (rest.nonEmpty)
            graft.text.GramStore.append(rest.toDF("doc_id", "text"), dir, "d2")
          val served = graft.text.GramStore
            .noveltyOfDrop(drop.toDF("doc_id", "text"), dir)
            .as[(Long, Long, Long, Long)].collect().toSet
          // brute force: q126 semantics over the union, drop rows kept
          val dropIds = drop.map(_._1).toSet
          val rows = corpus.flatMap { case (id, text) =>
            val ws = text.split(" ")
            val sh = if (ws.length >= 3)
              ws.sliding(3).map(_.mkString(" ")).toSeq.distinct
            else Seq(text)
            sh.map(g => (id, g))
          }
          val first = rows.groupBy(_._2).view.mapValues(_.map(_._1).min).toMap
          val expected = rows.groupBy(_._1).collect {
            case (id, rs) if dropIds(id) =>
              val novel = rs.count { case (i, g) => first(g) == i }.toLong
              (id, rs.size.toLong, novel, novel * 1000 / rs.size)
          }.toSet
          served == expected
        }
    })
  }

  test("property: deterministic samples nest across any pair of rates") {
    val idsGen = Gen.listOfN(80, Gen.choose(1L, 100000L)).map(_.distinct)
    check("sample-nesting", Prop.forAll(idsGen, Gen.choose(0, 1000), Gen.choose(0, 1000)) {
      (ids, r1, r2) =>
        val df = ids.toDF("id")
        val lo = math.min(r1, r2); val hi = math.max(r1, r2)
        val small = graft.operators.Sampling.deterministicSample(df, col("id"), lo)
          .as[Long].collect().toSet
        val big = graft.operators.Sampling.deterministicSample(df, col("id"), hi)
          .as[Long].collect().toSet
        small.subsetOf(big)
    })
  }

  test("property: large/small-star components == union-find on random graphs") {
    def unionFind(edges: List[(Long, Long)]): Map[Long, Long] = {
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (u, v) =>
        val (ru, rv) = (find(u), find(v))
        if (ru != rv) parent(math.max(ru, rv)) = math.min(ru, rv)
      }
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
      // canonical label = min of component: find() already roots at the
      // min because unions always point the larger root at the smaller
      nodes.map(n => n -> find(n)).toMap
    }
    val edgesGen = Gen.nonEmptyListOf(
      Gen.zip(Gen.choose(0L, 25L), Gen.choose(0L, 25L)))
    check("cc-stars", Prop.forAll(edgesGen) { raw =>
      val edges = raw.filter(e => e._1 != e._2)
      edges.isEmpty || {
        val got = graft.operators.Graph
          .connectedComponents(edges.toDF("u", "v"))
          .as[(Long, Long)].collect().toMap
        got == unionFind(edges)
      }
    })
  }

  test("property: the drop-ledger lifecycle serves the union of surviving drops") {
    // randomized build → appends → takedowns → one re-append, against the
    // LmStore instance of the shared DropLedger scaffold: whatever the
    // op sequence, the served model must equal Lm.train over exactly the
    // docs of the drops still in the ledger (the generalization of the
    // q137/q139 gates the per-store specs pin concretely)
    val word = Gen.oneOf("aa", "bb", "cc", "dd", "ee", "ff")
    val textGen = Gen.listOfN(6, word).map(_.mkString(" "))
    val dropGen = Gen.listOfN(3, textGen) // 3 docs per drop
    val caseGen = for {
      drops <- Gen.listOfN(3, dropGen)          // drops d0, d1, d2
      removeMask <- Gen.listOfN(3, Gen.oneOf(true, false))
      reTexts <- dropGen                        // content for one re-append
    } yield (drops, removeMask, reTexts)
    val params = SCTest.Parameters.default.withMinSuccessfulTests(5)
    val prop = Prop.forAll(caseGen) { case (drops, removeMask, reTexts) =>
      import graft.text.{Lm, LmStore}
      val dir = java.nio.file.Files.createTempDirectory("prop-ledger").toString
      def frame(i: Int, texts: List[String]) =
        texts.zipWithIndex.map { case (t, j) => (i * 100L + j, t) }
          .toDF("doc_id", "text")
      LmStore.build(frame(0, drops.head), dir, "d0")
      drops.zipWithIndex.tail.foreach { case (d, i) =>
        LmStore.append(frame(i, d), dir, s"d$i")
      }
      val removed = removeMask.zipWithIndex.collect { case (true, i) => i }
      // never drain the store completely (a drained ledger refuses to
      // serve by design); keep at least one drop
      val toRemove = removed.take(2)
      toRemove.foreach(i => LmStore.removeDrop(spark, dir, s"d$i"))
      // a removed id is free to re-enter with NEW content
      val reAdded = toRemove.headOption.map { i =>
        LmStore.append(frame(i + 10, reTexts), dir, s"d$i")
        i
      }
      val survivorDocs =
        drops.zipWithIndex.collect {
          case (d, i) if !toRemove.contains(i) => frame(i, d)
        } ++ reAdded.map(i => frame(i + 10, reTexts))
      val expected = Lm.train(survivorDocs.reduce(_ unionByName _))
        .c1.as[(String, Long)].collect().toSet
      val served = LmStore.serveModel(spark, dir)
        .c1.as[(String, Long)].collect().toSet
      served == expected
    }
    check("drop-ledger-union", prop, params)
  }

  test("property: near-dup clustering is invariant under input partitioning") {
    // three template families + two singletons; the converged fixed point
    // (per-component min id) must not depend on how the input is split
    // across partitions or ordered within them
    val common1 = (1 to 30).map(i => s"a$i").mkString(" ")
    val common2 = (50 to 80).map(i => s"b$i").mkString(" ")
    val rows = Seq(
      (1L, common1 + " x"), (2L, common1 + " y"), (3L, common1 + " z"),
      (10L, common2 + " p"), (11L, common2 + " q"),
      (20L, (200 to 230).map(i => s"c$i").mkString(" ")),
      (21L, (300 to 330).map(i => s"d$i").mkString(" ")))
    val reference = graft.text.Dedup.nearDupClusters(rows.toDF("doc_id", "text"))
      .as[(Long, Long)].collect().toSet
    assert(reference.nonEmpty)
    check("cluster-partitioning", Prop.forAll(Gen.choose(1, 8), Gen.long) {
      (parts, shuffleSeed) =>
        val permuted = new scala.util.Random(shuffleSeed).shuffle(rows)
        val got = graft.text.Dedup
          .nearDupClusters(permuted.toDF("doc_id", "text").repartition(parts))
          .as[(Long, Long)].collect().toSet
        got == reference
    })
  }

  test("property: CMS counters are linear — counters(a ++ b) == sum-merge of the parts, any split") {
    // the law FreqStore's serve AND its subtraction unlearn both rest
    // on: over any random corpus and any random 2-way split, building
    // per-part counters and sum-merging them equals building over the
    // union (and therefore subtracting one part's counters from the
    // union's leaves exactly the other part's)
    val docGen = Gen.listOfN(12,
      Gen.zip(Gen.choose(1L, 1000L), Gen.choose(0, 1),
        Gen.listOfN(8, Gen.choose(1, 9)).map(_.mkString("w", " w", ""))))
    check("cms-linearity", Prop.forAll(docGen) { rows =>
      import graft.text.FreqSketch
      val df = rows.map { case (id, part, text) => (id, part, text) }
        .toDF("doc_id", "part", "text")
      def counters(d: org.apache.spark.sql.DataFrame) =
        FreqSketch.counters(FreqSketch.grams(d))
          .as[(Long, Long, Long)].collect().toSet
      val whole = counters(df)
      val merged = FreqSketch.counters(FreqSketch.grams(
          df.filter(col("part") === 0)))
        .unionByName(FreqSketch.counters(FreqSketch.grams(
          df.filter(col("part") === 1))))
        .groupBy(col("depth"), col("slot")).agg(sum(col("cnt")).as("cnt"))
        .as[(Long, Long, Long)].collect().toSet
      merged == whole
    })
  }

  test("property: bottom-k merge law — the union's bottom-k survives any drop split") {
    // SampleStore's serve/takedown correctness: cutting each random
    // part to its own bottom-k and re-cutting the union of the partials
    // equals cutting the whole corpus directly, for any split and any k
    val gen = Gen.zip(
      Gen.listOfN(40, Gen.zip(Gen.choose(1L, 100000L), Gen.choose(0, 2))),
      Gen.choose(1, 12))
    check("kmv-merge", Prop.forAll(gen) { case (rows, k) =>
      import graft.text.KmvSample
      val docs = rows.distinct.map { case (id, part) =>
        (id, part, s"t$id t$id") }.toDF("doc_id", "part", "text")
      def cut(d: org.apache.spark.sql.DataFrame) =
        KmvSample.sample(d, k)
          .as[(Long, Long, Long, Option[String], Long)].collect().toSeq
      val whole = cut(docs)
      val partials = (0 to 2).map(p =>
          KmvSample.sample(docs.filter(col("part") === p), k)
            .select(col("hv"), col("doc_id"), col("lang"), col("n_tokens")))
        .reduce(_ unionByName _)
      val served = KmvSample.withRank(
          graft.operators.Relational.topK(partials, k,
            col("hv").asc, col("doc_id").asc))
        .as[(Long, Long, Long, Option[String], Long)].collect().toSeq
      served == whole
    })
  }
}
