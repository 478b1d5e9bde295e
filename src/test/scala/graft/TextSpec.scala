package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.text.{Dedup, TextOps}

class TextSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  test("shingles: indexed construction matches the naive definition") {
    val df = docs((1L, "a b c d e")).select(
      TextOps.shingles(TextOps.words(col("text")), 3).as("sh"))
    assert(df.as[Seq[String]].head() === Seq("a b c", "b c d", "c d e"))
  }

  test("shingles: short doc falls back to whole-text single shingle") {
    val df = docs((1L, "a b")).select(
      TextOps.shingles(TextOps.words(col("text")), 3).as("sh"))
    assert(df.as[Seq[String]].head() === Seq("a b"))
  }

  test("segments: non-overlapping chunks including the partial tail") {
    val df = docs((1L, "a b c d e f g h"), (2L, "x y"), (3L, "p q r"))
      .select(col("doc_id"),
        TextOps.segments(TextOps.words(col("text")), 3).as("segs"))
      .as[(Long, Seq[String])].collect().toMap
    assert(df(1L) === Seq("a b c", "d e f", "g h"))
    assert(df(2L) === Seq("x y"))
    assert(df(3L) === Seq("p q r"))
  }

  test("removeBoilerplate drops corpus-hot segments, keeps order, keeps all-hot docs") {
    val corpus = docs(
      (1L, "the same header unique one two"),
      (2L, "the same header other body words"),
      (3L, "the same header more unique stuff"),
      (4L, "the same header"),
      (5L, "totally different text here now ok"))
    val out = Dedup.removeBoilerplate(corpus, w = 3, minDf = 3)
      .select("doc_id", "n_segs", "n_kept", "clean_text")
      .as[(Long, Int, Int, String)].collect().map(r => r._1 -> r).toMap
    assert(out(1L) === ((1L, 2, 1, "unique one two")))
    assert(out(2L) === ((2L, 2, 1, "other body words")))
    assert(out(4L) === ((4L, 1, 0, "")),
      "a doc that is ALL boilerplate stays in the output with empty text")
    assert(out(5L) === ((5L, 2, 2, "totally different text here now ok")))
  }

  test("minhash signature is insensitive to shingle order and has the declared width") {
    val base = docs((1L, "x y z w v u t s"), (2L, "s t u v w z y x"))
      .select(col("doc_id"), TextOps.words(col("text")).as("ws"))
      .select(col("doc_id"), TextOps.shingleSet(col("ws"), 1).as("sh"))
      .select(col("doc_id"), TextOps.minhash(col("sh"), 16).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    // same word SET (1-shingles) in different order → identical signature
    assert(base(1L) === base(2L))
    assert(base(1L).size === 16)
    assert(base(1L).forall(h => h >= 0 && h < 4294967296L))
  }

  test("native minhash_signature expression equals the declarative formulation") {
    val d = docs((1L, (1 to 30).map(i => s"t$i").mkString(" ")),
        (2L, "alpha beta gamma delta epsilon zeta"))
      .select(col("doc_id"), TextOps.words(col("text")).as("ws"))
      .select(col("doc_id"), TextOps.shingleSet(col("ws"), 3).as("sh"))
      .select(col("doc_id"),
        graft.functions.MinHashSignature.of(col("sh"), 16).as("native"),
        TextOps.minhash(col("sh"), 16).as("declarative"))
      .as[(Long, Seq[Long], Seq[Long])].collect()
    d.foreach { case (id, nat, dec) => assert(nat === dec, s"doc $id") }
    // also resolvable from plain SQL through the registry
    val viaSql = spark.sql("SELECT minhash_signature(array('a','b'), 4) AS s")
      .as[Seq[Long]].head()
    assert(viaSql.size === 4)
  }

  test("near-dup pipeline finds a planted near-duplicate and only that") {
    val common = (1 to 40).map(i => s"w$i").mkString(" ")
    val d = docs(
      (1L, common + " tail one"),
      (2L, common + " tail two"),   // near-dup of 1
      (3L, (100 to 140).map(i => s"v$i").mkString(" ")))
    val pairs = Dedup.nearDupPairs(d).select("doc_a", "doc_b").as[(Long, Long)].collect()
    assert(pairs.toSeq === Seq((1L, 2L)))
  }

  test("sourceTriage blocks template farms and short-page sources, passes clean ones") {
    def longDoc(seed: Int) =
      (seed * 100 to seed * 100 + 60).map(i => s"t$i").mkString(" ")
    val template = (1 to 40).map(i => s"tpl$i").mkString(" ")
    val rows =
      // "farm": every doc a near-copy of the template -> dup_ppm 10^6
      (1L to 4L).map(i => (i, template + s" tail$i", "farm")) ++
      // "stub": unique but 3-word docs -> mean_words below the floor
      (11L to 14L).map(i => (i, s"a$i b$i c$i", "stub")) ++
      // "clean": unique long docs
      (21L to 24L).map(i => (i, longDoc(i.toInt), "clean"))
    val d = rows.toDF("doc_id", "text", "source")
    val got = graft.text.Dedup.sourceTriage(d)
      .select("source", "n_docs", "dup_ppm", "mean_words", "passed")
      .as[(String, Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("farm")._3 === 1000000L && !got("farm")._5,
      "a template farm fails on dup density")
    assert(got("stub")._3 === 0L && got("stub")._4 === 3L && !got("stub")._5,
      "a short-page source fails on mean length")
    assert(got("clean")._5, "a clean source passes both rules")
  }

  test("nearDupPairs reports exact inter/union sizes (|a|+|b|-|∩| identity)") {
    val common = (1 to 40).map(i => s"w$i").mkString(" ")
    val d = docs((1L, common + " tail one"), (2L, common + " tail two"))
    val row = Dedup.nearDupPairs(d)
      .select("inter_size", "union_size").as[(Int, Int)].head()
    val sh = Dedup.prepared(d, "doc_id", "text")
      .select("doc_id", "sh").as[(Long, Seq[String])].collect().toMap
    val inter = sh(1L).toSet.intersect(sh(2L).toSet).size
    val union = sh(1L).toSet.union(sh(2L).toSet).size
    assert(row === ((inter, union)))
  }

  test("survivorsByQuality keeps the richer doc of a near-dup pair, id breaks ties") {
    import org.apache.spark.sql.functions.{array_distinct, col, size}
    val common = (1 to 40).map(i => s"w$i").mkString(" ")
    val other = (1 to 40).map(i => s"t$i").mkString(" ")   // disjoint vocab:
    val d = docs(                                          // no cross-pairing
      (1L, common),                                   // near-dup of 2, poorer
      (2L, common + " extra unique rich tail"),       // near-dup of 1, richer
      (3L, "totally unrelated words nothing shared here at all"),
      (10L, other), (11L, other))                     // exact tie: smaller id wins
    val quality = size(array_distinct(graft.text.TextOps.words(col("text"))))
    val kept = Dedup.survivorsByQuality(d, quality)
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(2L, 3L, 10L),
      "doc 1 loses to richer 2; tie pair 10/11 keeps the smaller id; 3 untouched")
    // degenerates to survivorStats' keep-smallest-id policy under constant quality
    val keptConst = Dedup.survivorsByQuality(d, org.apache.spark.sql.functions.lit(1))
      .select("doc_id").as[Long].collect().toSet
    assert(keptConst === Set(1L, 3L, 10L))
  }

  test("decontaminate drops exactly the corpus docs sharing a 3-gram with the benchmark") {
    val corpus = docs(
      (1L, "the quick brown fox jumps over the lazy dog"), // contains "quick brown fox"
      (2L, "completely unrelated text about spark engines and scale"),
      (3L, "another clean document with its own fresh words here"))
    val bench = docs((100L, "benchmark asks about the quick brown fox riddle"))
    val kept = Dedup.decontaminate(corpus, bench)
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(2L, 3L))
  }

  test("decontaminate with an empty benchmark keeps the whole corpus") {
    val corpus = docs((1L, "a b c d e"), (2L, "f g h i j"))
    val bench = docs((1L, "a b c d e")).filter(col("doc_id") < 0)
    val kept = Dedup.decontaminate(corpus, bench)
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(1L, 2L))
  }

  test("exact jaccard ints are right for a hand case") {
    val d = docs((1L, "a b c d"), (2L, "b c d e"))
    // 2-shingles: {ab,bc,cd} vs {bc,cd,de} → inter 2, union 4
    val prep = Dedup.prepared(d, "doc_id", "text", shingleN = 2)
    val sh = prep.select("doc_id", "sh").as[(Long, Seq[String])].collect().toMap
    assert(sh(1L).toSet.intersect(sh(2L).toSet).size === 2)
    assert(sh(1L).toSet.union(sh(2L).toSet).size === 4)
  }

  test("simhash: identical docs equal; near-identical docs near in hamming") {
    val common = (1 to 60).map(i => s"w$i").mkString(" ")
    val d = docs((1L, common), (2L, common), (3L, common + " extra trailing tokens here"),
        (4L, (200 to 260).map(i => s"z$i").mkString(" ")))
      .select(col("doc_id"), TextOps.wordHashes(TextOps.words(col("text"))).as("hs"))
      .select(col("doc_id"), TextOps.simhashFromHashes(col("hs"), 16).as("sim"))
      .as[(Long, Long)].collect().toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(d(1L) === d(2L))
    assert(ham(d(1L), d(3L)) <= 4)
    assert(ham(d(1L), d(4L)) >= 3)
  }

  test("native simhash_bits equals the declarative formulation (16 and 56 bit)") {
    val d = docs(
        (1L, (1 to 45).map(i => s"w$i").mkString(" ")),
        (2L, "alpha beta gamma delta epsilon zeta eta theta"),
        (3L, "solo"))
      .select(col("doc_id"),
        TextOps.wordHashes(TextOps.words(col("text"))).as("h28"),
        TextOps.wordHashesHex(TextOps.words(col("text")), 14).as("h56"))
      .select(col("doc_id"),
        graft.functions.SimHashBits.of(col("h28"), 16).as("n16"),
        TextOps.simhashFromHashes(col("h28"), 16).as("d16"),
        graft.functions.SimHashBits.of(col("h56"), 56).as("n56"),
        TextOps.simhashFromHashes(col("h56"), 56).as("d56"))
      .as[(Long, Long, Long, Long, Long)].collect()
    d.foreach { case (id, n16, d16, n56, d56) =>
      assert(n16 === d16, s"doc $id 16-bit")
      assert(n56 === d56, s"doc $id 56-bit")
    }
    // also resolvable from plain SQL through the registry
    val viaSql = spark.sql("SELECT simhash_bits(array(7L, 7L, 1L), 3) AS s")
      .as[Long].head()
    assert(viaSql === 7L) // bits 0: 3/3 set; 1,2: 2/3 set → majority everywhere
    // null ELEMENT parity: declarative nulls the vote sum → all-zero result
    val withNull = spark.sql(
      "SELECT simhash_bits(array(7L, CAST(NULL AS BIGINT)), 3) AS s")
      .as[Long].head()
    assert(withNull === 0L)
  }

  test("CDC chunks re-align after a prefix insertion; fixed-width chunking would not") {
    import graft.text.Dedup
    val body = (1 to 80).map(i => s"w$i")
    val d = docs(
      (1L, body.mkString(" ")),
      (2L, "inserted preamble tokens " + body.mkString(" ")))
    val chunks = Dedup.cdcChunks(d)
      .as[(Long, Int, Long, String)].collect()
    val keys1 = chunks.filter(_._1 == 1L).map(_._4).toSet
    val keys2 = chunks.filter(_._1 == 2L).map(_._4).toSet
    assert(keys1.size >= 4, s"divisor 8 over 80 tokens should cut several chunks, got ${keys1.size}")
    // content-defined boundaries: every doc-1 chunk except (at most) the
    // first — whose start fuses with the inserted preamble — reappears
    // VERBATIM in doc 2. A fixed-width chunker shares zero chunks after
    // a 3-token shift.
    assert((keys1 -- keys2).size <= 1,
      s"insertion must re-align, lost ${(keys1 -- keys2).size} of ${keys1.size}")
    // the census sees the share: doc 2's dup_words cover most of the body
    val census = Dedup.cdcDupStats(d)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(census(2L)._5 >= 60L,
      s"most of the repeated body must be flagged, got ${census(2L)}")
    // totals conserve: chunk words sum to doc words
    assert(census(1L)._3 === 80L && census(2L)._3 === 83L)
  }

  test("nearDupClusters converges past any fixed round count: a long edit chain fully merges") {
    // A sliding-window chain: doc i = 40 words starting at position 2i,
    // so consecutive docs share 38/42 of their shingle-union (J ≈ 0.9)
    // and docs ≥4 apart fall under the 0.7 threshold — a path-shaped
    // component whose min label needs MANY propagation rounds to reach
    // the far end (the r8 fixed-6-round implementation under-merged it).
    val words = (0 until 100).map(i => s"w$i")
    val chain = (0 until 30).map { i =>
      (i + 1L, words.slice(2 * i, 2 * i + 40).mkString(" "))
    }
    val d = docs(chain: _*)
    // guard: the planted component's propagation distance really exceeds
    // 6 (BFS from the min node over the ACTUAL verified pair graph) —
    // otherwise this test wouldn't exercise the >fixed-rounds regime
    val edges = Dedup.nearDupPairs(d).select("doc_a", "doc_b")
      .as[(Long, Long)].collect()
    val adj = (edges ++ edges.map(_.swap)).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    var frontier = Set(1L); var seen = Set(1L); var depth = 0
    while (frontier.nonEmpty) {
      frontier = frontier.flatMap(adj.getOrElse(_, Set.empty)) -- seen
      seen ++= frontier; if (frontier.nonEmpty) depth += 1
    }
    assert(seen === (1L to 30L).toSet, "the planted chain must be connected")
    assert(depth > 6, s"planted propagation distance must exceed the old cap, got $depth")
    val clusters = Dedup.nearDupClusters(d).as[(Long, Long)].collect().toSet
    assert(clusters === (1L to 30L).map(i => (i, 1L)).toSet,
      "every doc in the chain must converge to the component-min label")
  }

  test("nearDupClusters uses reliable checkpoints when a checkpoint dir is set") {
    val common = (1 to 40).map(i => s"w$i").mkString(" ")
    val d = docs(
      (1L, common + " tail one"),
      (2L, common + " tail two"),  // near-dup of 1
      (3L, common + " tail three"), // near-dup of 1 and 2 → one cluster {1,2,3}
      (4L, (100 to 140).map(i => s"v$i").mkString(" ")))
    val expected = Set((1L, 1L), (2L, 1L), (3L, 1L))
    val sc = spark.sparkContext
    assert(sc.getCheckpointDir.isEmpty, "suite assumes no global checkpoint dir")
    // Fallback path (no dir): localCheckpoint.
    val viaLocal = Dedup.nearDupClusters(d).as[(Long, Long)].collect().toSet
    assert(viaLocal === expected)
    // Reliable path: with a dir set, the same computation must (a) be
    // byte-identical in its result and (b) actually write RDD checkpoint
    // files to the dir (the durability evidence).
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toFile
    sc.setCheckpointDir(dir.getAbsolutePath)
    try {
      val viaReliable = Dedup.nearDupClusters(d).as[(Long, Long)].collect().toSet
      assert(viaReliable === expected)
      def files(f: java.io.File): Seq[java.io.File] = {
        val kids = Option(f.listFiles()).map(_.toSeq).getOrElse(Seq.empty)
        kids.filter(_.isFile) ++ kids.filter(_.isDirectory).flatMap(files)
      }
      assert(files(dir).nonEmpty, "reliable checkpoint must persist RDD blocks to the dir")
    } finally {
      // restore the no-dir default for the rest of the (shared-session) suite
      val f = classOf[org.apache.spark.SparkContext].getDeclaredField("checkpointDir")
      f.setAccessible(true)
      f.set(sc, None)
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(dir)
    }
  }

  test("containmentPairs flags a partial copy that symmetric Jaccard misses") {
    import graft.text.Dedup
    val a = (1 to 20).map(i => s"w$i").mkString(" ")
    val extra = (100 to 114).map(i => s"x$i").mkString(" ")
    val docs = Seq(
      (1L, a),                 // the original
      (2L, s"$a $extra"),      // original embedded in a longer doc
      (3L, (200 to 240).map(i => s"z$i").mkString(" ")))
      .toDF("doc_id", "text")
    val cont = Dedup.containmentPairs(docs)
      .select("doc_a", "doc_b", "containment")
      .as[(Long, Long, Double)].collect()
    // doc1's shingles are a strict subset of doc2's -> containment 1.0
    assert(cont.exists(p => p._1 == 1L && p._2 == 2L && p._3 === 1.0),
      s"expected the (1,2) partial copy, got ${cont.toSeq}")
    // while symmetric Jaccard (18/33 = 0.55) stays below the 0.7 near-dup bar
    val sym = Dedup.nearDupPairs(docs).select("doc_a", "doc_b")
      .as[(Long, Long)].collect()
    assert(!sym.contains((1L, 2L)),
      "the same pair must NOT pass the symmetric near-dup threshold")
    assert(!cont.exists(p => p._2 == 3L), "unrelated doc stays clean")
  }

  test("containmentJoinExact finds the quoted-inside-larger pair banding can miss") {
    import graft.text.Dedup
    // a 12-word doc quoted verbatim inside a 120-word doc: containment is
    // 1.0 but symmetric Jaccard ≈ 10/118 ≈ 0.08 — the banded candidate
    // path (containmentPairs' documented caveat) has essentially no
    // chance; the prefix-filtered join must STILL find it (completeness
    // is by construction, not by luck)
    val quoted = (1 to 12).map(i => s"q$i").mkString(" ")
    val filler = (100 to 207).map(i => s"f$i").mkString(" ")
    val docs = Seq(
      (1L, quoted),
      (2L, s"$quoted $filler"),
      (3L, (300 to 340).map(i => s"z$i").mkString(" ")))
      .toDF("doc_id", "text")
    val got = Dedup.containmentJoinExact(docs)
      .select("doc_a", "doc_b", "inter_size", "min_size")
      .as[(Long, Long, Int, Int)].collect()
    assert(got.toSeq === Seq((1L, 2L, 10, 10)),
      s"expected exactly the fully-contained (1,2) pair, got ${got.toSeq}")
  }

  test("winnowing guarantee: docs sharing >= k+w-1 consecutive words share a fingerprint") {
    import graft.text.Winnow
    // two docs sharing a 6-word run (k=3, w=4 -> k+w-1=6) amid distinct text
    val shared = "alpha beta gamma delta epsilon zeta"
    val docs = Seq(
      (1L, s"one two three $shared four five six seven"),
      (2L, s"red green blue $shared yellow purple orange pink"),
      (3L, "entirely different words with no overlap at all here"))
      .toDF("doc_id", "text")
    val fps = Winnow.fingerprints(docs, "doc_id", "text", k = 3, w = 4)
      .as[(Long, Long)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert((fps(1L) & fps(2L)).nonEmpty,
      "a shared 6-word substring must produce at least one common fingerprint")
    assert((fps(1L) & fps(3L)).isEmpty && (fps(2L) & fps(3L)).isEmpty,
      "unrelated docs share no fingerprints")
    // compression: far fewer fingerprints than k-grams
    val nGrams = 14 - 3 + 1
    assert(fps(1L).size < nGrams)
  }

  test("fingerprint-join pairs find shared runs; the stop-fp guard kills boilerplate-only pairs") {
    import graft.text.Winnow
    val boiler = (1 to 10).map(i => s"b$i").mkString(" ")   // in ALL three docs
    // long enough that several distinct window-minima fall fully inside
    // the run (one 6-word run only guarantees ONE shared fingerprint)
    val run = (20 to 39).map(i => s"r$i").mkString(" ")     // only in docs 1 and 2
    val docs = Seq(
      (1L, s"$boiler one two $run"),
      (2L, s"$boiler six seven $run"),
      (3L, s"$boiler four five alpha beta gamma delta"))
      .toDF("doc_id", "text")
    def pairs(maxDf: Int) =
      Winnow.nearDupPairsByFingerprint(docs, "doc_id", "text", minShared = 2, maxDf = maxDf)
        .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    // generous guard: the boilerplate links every pair
    assert(pairs(8) === Set((1L, 2L), (1L, 3L), (2L, 3L)))
    // tight guard (maxDf=2): boilerplate fps have df=3 -> dropped; only the
    // genuinely shared run (df=2 fps) links docs 1 and 2
    assert(pairs(2) === Set((1L, 2L)),
      "boilerplate-only pairs must disappear once the hot fps are pruned")
  }

  test("winnowing is deterministic and skips docs shorter than k+w-1 words") {
    import graft.text.Winnow
    val docs = Seq((1L, "a b c d e"), (2L, "a b c d e f g h i j")).toDF("doc_id", "text")
    val a = Winnow.fingerprints(docs, "doc_id", "text").as[(Long, Long)].collect().toSet
    val b = Winnow.fingerprints(docs.repartition(7), "doc_id", "text")
      .as[(Long, Long)].collect().toSet
    assert(a === b)
    assert(!a.exists(_._1 == 1L), "a 5-word doc has no full window at k=3, w=4")
    assert(a.exists(_._1 == 2L))
  }

  test("Pii.scrub redacts emails, phones and IPv4 with per-kind tags") {
    import graft.text.Pii
    val docs = Seq(
      (1L, "mail me at some.user+tag@example.co.uk or call +1 415-555-2671 " +
        "from host 192.168.0.1 thanks"),
      (2L, "no pii in this row at all"))
      .toDF("doc_id", "text")
    val out = docs.select(col("doc_id"), Pii.scrub(col("text")).as("clean"),
        Pii.countMatches(col("text"), Pii.EmailPattern).as("ne"),
        Pii.countMatches(col("text"), Pii.PhonePattern).as("np"),
        Pii.countMatches(col("text"), Pii.Ipv4Pattern).as("ni"))
      .as[(Long, String, Int, Int, Int)].collect().map(r => r._1 -> r).toMap
    val r1 = out(1L)
    assert(r1._2 === "mail me at <EMAIL> or call <PHONE> from host <IP> thanks")
    assert((r1._3, r1._4, r1._5) === ((1, 1, 1)))
    val r2 = out(2L)
    assert(r2._2 === "no pii in this row at all" && (r2._3, r2._4, r2._5) === ((0, 0, 0)))
  }

  test("PhonePattern: common formats redacted, embedded digit runs untouched") {
    import graft.text.Pii
    val docs = Seq(
      (1L, "ticket 91234-567-89016 is open"),   // id superset — no match
      (2L, "call 415-555-2671 now"),            // bare 3-3-4
      (3L, "call (415)555-1234 now"),           // parenthesized area code
      (4L, "call +1415-555-0123 now"),          // +1 with no separator
      (5L, "ref 91234-567-8901 end"),           // mid-run suffix match bait
      (6L, "order 4155551234 shipped"))         // separator-less run = id, kept
      .toDF("doc_id", "text")
    val out = docs.select(col("doc_id"), Pii.scrub(col("text")).as("clean"))
      .as[(Long, String)].collect().toMap
    assert(out(1L) === "ticket 91234-567-89016 is open")
    assert(out(2L) === "call <PHONE> now")
    assert(out(3L) === "call <PHONE> now")
    assert(out(4L) === "call <PHONE> now")
    assert(out(5L) === "ref 91234-567-8901 end",
      "a match must not start mid-digit-run")
    assert(out(6L) === "order 4155551234 shipped")
  }

  test("repetitionStats counts the most-repeated word and bigram exactly") {
    val docs = Seq(
      (1L, "spam spam spam ham eggs"),            // top word spam=3; top bigram "spam spam"=2
      (2L, "a b a b a"),                          // top word a=3; "a b"=2, "b a"=2
      (3L, "single"))                             // no bigram -> dropped (oracle parity)
      .toDF("doc_id", "text")
    val r = graft.text.Queries.repetitionStats(docs)
      .select("doc_id", "n_words", "n_distinct", "top_word_n", "top_bigram_n")
      .as[(Long, Long, Long, Long, Long)].collect().map(x => x._1 -> x).toMap
    assert(r(1L) === ((1L, 5L, 3L, 3L, 2L)))
    assert(r(2L) === ((2L, 5L, 2L, 3L, 2L)))
    assert(!r.contains(3L),
      "a 1-word doc has no bigram and must drop (the shingles fallback is not a bigram)")
  }

  test("repeatedSpans merges overlapping and adjacent flagged grams, splits on gaps") {
    val d = docs(
      // d1/d2 share the 6-word block p1..p6 → two overlapping 5-grams,
      // one merged span each (d1: tokens 3..8, d2: tokens 2..7)
      (1L, "u1 u2 p1 p2 p3 p4 p5 p6 u3 u4 u5"),
      (2L, "v1 p1 p2 p3 p4 p5 p6 v2 v3 v4"),
      // unique doc → no flagged grams → no rows
      (3L, "w1 w2 w3 w4 w5 w6"),
      // d5/d6 share two DISJOINT 5-grams; in d5 they sit adjacent
      // (positions 1 and 6 → one span 1..10), in d6 a zz gap splits them
      (5L, "q1 q2 q3 q4 q5 r1 r2 r3 r4 r5"),
      (6L, "q1 q2 q3 q4 q5 zz r1 r2 r3 r4 r5"))
    val r = graft.text.Queries.repeatedSpans(d)
      .select("doc_id", "span_start", "span_end", "n_grams", "max_df", "span_toks")
      .as[(Long, Int, Int, Long, Long, Int)].collect().toSet
    assert(r === Set(
      (1L, 3, 8, 2L, 2L, 6),
      (2L, 2, 7, 2L, 2L, 6),
      (5L, 1, 10, 2L, 2L, 10),
      (6L, 1, 5, 1L, 2L, 5),
      (6L, 7, 11, 1L, 2L, 5)))
  }

  test("scrubRepeatedSpans keeps exactly one corpus copy of a pasted block") {
    val pasted = (1 to 10).map(i => s"P$i").mkString(" ")
    val d = docs(
      (1L, "a1 a2 a3 " + pasted),  // keeper (corpus-min doc id): intact
      (2L, pasted + " b1 b2 b3"),  // loses the block
      (3L, "c1 c2 c3 c4 c5 c6"),   // clean: untouched
      (4L, pasted))                // pure boilerplate: scrubs to ""
    val r = graft.text.Queries.scrubRepeatedSpans(d)
      .as[(Long, Int, Long, String)].collect().map(x => x._1 -> x).toMap
    assert(r(1L) === ((1L, 13, 0L, "a1 a2 a3 " + pasted)))
    assert(r(2L) === ((2L, 13, 10L, "b1 b2 b3")))
    assert(r(3L) === ((3L, 6, 0L, "c1 c2 c3 c4 c5 c6")))
    assert(r(4L) === ((4L, 10, 10L, "")))
  }

  test("langId picks the profile with most hits, und when none") {
    val d = docs((1L, "the cat and the dog of a town"), (2L, "qqq zzz www"))
      .select(col("doc_id"), TextOps.langId(TextOps.words(col("text"))).as("lang"))
      .as[(Long, String)].collect().toMap
    assert(d(1L) === "en")
    assert(d(2L) === "und")
  }
}
