package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.text.{Bpe, TextOps}

/** Semantics of the native greedy-BPE expression (graft.functions.BpeEncode)
  * against a direct Scala reference implementation of the same algorithm
  * (lowest rank wins, leftmost occurrence on ties, merge one pair per step)
  * plus hand-computed decision-point cases.
  */
class BpeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Reference implementation — deliberately naive. */
  private def refBpe(word: String, merges: Seq[String]): Seq[String] = {
    val rank = merges.zipWithIndex.filter { case (m, i) =>
      merges.indexOf(m) == i // first occurrence wins, like the expression
    }.toMap
    var toks = word.map(_.toString).toVector
    var go = true
    while (go && toks.length > 1) {
      val cands = toks.indices.dropRight(1)
        .flatMap(i => rank.get(toks(i) + " " + toks(i + 1)).map(r => (r, i)))
      if (cands.isEmpty) go = false
      else {
        val (_, bi) = cands.min // min rank, then leftmost index
        toks = (toks.take(bi) :+ (toks(bi) + toks(bi + 1))) ++ toks.drop(bi + 2)
      }
    }
    toks
  }

  private def encode(text: String, merges: Seq[String] = Bpe.DemoMerges): Seq[String] =
    Seq(text).toDF("text")
      .select(Bpe.encode(TextOps.words(col("text")), merges).as("toks"))
      .as[Seq[String]].head()

  test("multi-level merge builds on an earlier merge (t h, then th e)") {
    assert(encode("the") === Seq("the"))
  }

  test("rank beats position: er (rank 7) fires before or (rank 8) in 'order'") {
    assert(encode("order") === Seq("or", "d", "er"))
  }

  test("a merge can destroy a later-ranked candidate pair (small: a+l kills l+l)") {
    assert(encode("small") === Seq("s", "m", "al", "l"))
  }

  test("merged tokens can themselves merge (jo + in -> join)") {
    assert(encode("join") === Seq("join"))
  }

  test("leftmost occurrence wins when the best pair repeats") {
    // merges: only "a b"; 'ababab' word -> chars a,b,a,b,a,b; three merges
    // always at the leftmost remaining occurrence
    assert(encode("ababab", Seq("a b")) === Seq("ab", "ab", "ab"))
    // overlapping occurrences: 'aaa' with "a a" merges the leftmost,
    // leaving (aa, a) which is NOT a listed pair
    assert(encode("aaa", Seq("a a")) === Seq("aa", "a"))
  }

  test("words never merge across a boundary; empty words contribute nothing") {
    val toks = Seq("the row").toDF("text")
      .select(Bpe.encode(TextOps.words(col("text"))).as("toks"))
      .as[Seq[String]].head()
    assert(toks === Seq("the", "row"))
    // split("") yields [""] — zero tokens, not a crash
    assert(encode("") === Seq.empty)
  }

  test("expression matches the reference on every corpus word and random strings") {
    val vocab = Seq("a", "agg", "batch", "big", "column", "customer", "data",
      "dup", "fast", "filter", "group", "hash", "join", "key", "line", "merge",
      "order", "part", "query", "row", "scan", "slow", "small", "sort",
      "spark", "stream", "table", "the", "value", "vector", "window")
    val rnd = new scala.util.Random(42)
    val randoms = Seq.fill(50)(
      (0 until (1 + rnd.nextInt(12))).map(_ => ('a' + rnd.nextInt(6)).toChar).mkString)
    // random merges over the same tiny alphabet so merges actually fire
    val rndMerges = Seq("a b", "b c", "ab c", "c c", "a a", "d e", "e f", "de f")
    for (w <- vocab)
      assert(encode(w) === refBpe(w, Bpe.DemoMerges), s"word=$w demo merges")
    val got = Seq(randoms.mkString(" ")).toDF("text")
      .select(Bpe.encode(TextOps.words(col("text")), rndMerges).as("toks"))
      .as[Seq[String]].head()
    assert(got === randoms.flatMap(refBpe(_, rndMerges)), "random words, random merges")
  }

  test("astral-plane characters tokenize as whole code points, never surrogate halves") {
    // U+1F600 is two UTF-16 code units; a charAt split would emit two
    // invalid lone-surrogate tokens (and diverge from the code-point
    // oracle); merges must still apply around it
    assert(encode("a😀b", Seq("x y")) === Seq("a", "😀", "b"))
    assert(encode("a😀b", Seq("a 😀")) ===
      Seq("a😀", "b"))
  }

  test("idSequences: frequency-ranked ids, reading order, empty doc -> empty array") {
    // corpus tokens under DemoMerges: "the the row" -> the,the,row;
    // "row big" -> row,b,i,g. freq: the=2, row=2, b=i=g=1
    // rank (count desc, token asc): row=0, the=1 ('row' < 'the'), b=2, g=3, i=4
    val docs = Seq((1L, "the the row"), (2L, "row big"), (3L, ""))
      .toDF("doc_id", "text")
    val got = Bpe.idSequences(docs)
      .as[(Long, Seq[Long])].collect().toMap
    assert(got(1L) === Seq(1L, 1L, 0L))
    assert(got(2L) === Seq(0L, 2L, 4L, 3L), "big -> b,i,g in reading order")
    assert(got(3L) === Seq.empty, "blank doc keeps its row with an empty sequence")
  }

  test("decode inverts idSequences to the space-stripped stream; unknown id raises") {
    val docs = Seq((1L, "the the row"), (2L, "row big"), (3L, ""))
      .toDF("doc_id", "text")
    val vocab = Bpe.vocabulary(docs)
    val got = Bpe.decode(Bpe.idSequences(docs), vocab)
      .as[(Long, String)].collect().toMap
    assert(got === Map(1L -> "thetherow", 2L -> "rowbig", 3L -> ""))
    // an id outside the vocab must fail loudly, never silently shorten
    val bad = Seq((9L, Seq(0L, 999L))).toDF("doc_id", "ids")
    val e = intercept[Exception] {
      Bpe.decode(bad, vocab).collect()
    }
    assert(e.getMessage.contains("missing from vocabulary") ||
      Option(e.getCause).exists(_.getMessage.contains("missing from vocabulary")))
  }

  test("bpe_encode is registered for SQL and duplicate merge pairs keep the first rank") {
    spark.range(1).createOrReplaceTempView("one")
    val row = spark.sql(
      "SELECT bpe_encode(array('order'), array('e r', 'o r', 'e r')) AS t FROM one")
      .as[Seq[String]].head()
    // duplicate 'e r' at rank 2 must not shadow rank 0
    assert(row === Seq("or", "d", "er"))
  }

  test("learnMerges: hand-computed frequencies, lexicographic ties, rank order") {
    // words: low ×2, lower ×1. Pair counts round 1: (l,o)=3, (o,w)=3,
    // (w,e)=1, (e,r)=1 — count tie, ("l","o") < ("o","w") lexicographic.
    // Round 2: (lo,w)=3. Round 3: (low,e)=1 vs (e,r)=1 — "e" < "low".
    // Round 4: (low,er)=1 (after e+r, the only pair left in 'lower').
    val docs = Seq((1L, "low low lower")).toDF("doc_id", "text")
    assert(Bpe.learnMerges(docs, nMerges = 4) ===
      Seq("l o", "lo w", "e r", "low er"))
  }

  test("learnMerges stops early when the vocab is fully merged") {
    val docs = Seq((1L, "ab ab")).toDF("doc_id", "text")
    assert(Bpe.learnMerges(docs, nMerges = 50) === Seq("a b"))
  }

  test("learned merges round-trip through the encode expression") {
    val docs = Seq((1L, "low low lower")).toDF("doc_id", "text")
    val merges = Bpe.learnMerges(docs, nMerges = 4)
    val toks = docs.select(Bpe.encode(TextOps.words(col("text")), merges).as("t"))
      .as[Seq[String]].head()
    assert(toks === Seq("low", "low", "lower"),
      "a fully-trained vocab must tokenize its own corpus to whole words")
  }

  test("learnMerges fails loudly on an empty corpus") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      Bpe.learnMerges(empty, nMerges = 3)
    }
    assert(e.getMessage.contains("no words"))
  }

  test("learnMerges is invariant to input partitioning") {
    val docs = Seq.tabulate(40)(i => (i.toLong, s"alpha beta gamma${i % 3}"))
      .toDF("doc_id", "text")
    val a = Bpe.learnMerges(docs, nMerges = 10)
    val b = Bpe.learnMerges(docs.repartition(7), nMerges = 10)
    assert(a === b)
  }

  test("q130 fixture: learned table is deterministic and NOT the DemoMerges fixture") {
    val dir = "/root/testdata/sf0.001"
    val m1 = graft.text.Queries.learnedMergesFixture(spark, dir)
    // the memoized fixture must equal a fresh replay of the same split
    val fresh = Bpe.learnMerges(
      graft.Tables(spark, dir).documents
        .filter(org.apache.spark.sql.functions.col("doc_id") % 7 === 0),
      nMerges = 24)
    assert(m1 === fresh)
    assert(m1.size === 24)
    // the gate must exercise a genuinely learned table, not the demo one
    assert(m1 !== Bpe.DemoMerges)
  }
}
