package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.text.Retrieval

/** Exact BM25 retrieval semantics on planted corpora — the synthetic
  * fixture's dense 31-word vocabulary exercises the gate but not the
  * RANKING, so these plant Zipf-shaped signal: rare discriminative terms,
  * tf monotonicity, and the length penalty.
  */
class RetrievalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs(rows: (Long, String)*): DataFrame =
    rows.toDF("doc_id", "text")

  private val filler = (1 to 30).map(_ => "the common word").mkString(" ")

  test("planted needle: the rare-term doc outranks every common-term doc") {
    // doc 1 is the probe; docs 2-3 share its rare term 'needle', the rest
    // only the ubiquitous filler. BM25 must put the needle docs on top.
    val corpus = docs(
      (1L, s"needle needle probe $filler"),
      (2L, s"needle $filler"),
      (3L, s"needle needle needle $filler"),
      (4L, filler), (5L, filler), (6L, filler))
    val top = Retrieval.bm25TopKFor(corpus, probe = col("doc_id") === 1L, k = 3)
      .as[(Long, Long, Long)].collect().sortBy(-_._3)
    assert(top.forall(_._1 == 1L))
    val ranked = top.map(_._2).toSeq
    // probe retrieves itself plus the two needle docs — never a filler doc
    assert(ranked.toSet === Set(1L, 2L, 3L))
  }

  test("tf monotone, length penalized: more hits rank higher, padding hurts") {
    val pad = (1 to 40).map(i => s"pad$i").mkString(" ")
    val corpus = docs(
      (1L, "query term here"),
      (2L, "term term term term"), // high tf, short
      (3L, "term term"), // lower tf, same-ish length
      (4L, s"term term term term $pad")) // same tf as 2 but 11x longer
    val p = Retrieval.postings(corpus)
    val q = Seq((100L, "term")).toDF("query_id", "term")
    val scores = Retrieval.bm25TopK(p, q, k = 4)
      .as[(Long, Long, Long)].collect().map(r => r._2 -> r._3).toMap
    assert(scores(2L) > scores(3L), "tf 4 must beat tf 2 at equal length")
    assert(scores(2L) > scores(4L), "the padded doc must pay the dl penalty")
    assert(scores(3L) > 0L && scores(4L) > 0L)
  }

  test("queriesFor picks characteristic terms: tf desc, then rarest-first") {
    val corpus = docs(
      (1L, "alpha alpha alpha beta beta gamma"),
      (2L, "beta zeta"), (3L, "beta zeta"), (4L, "gamma zeta"))
    val p = Retrieval.postings(corpus)
    val q = Retrieval.queriesFor(p, Retrieval.docFreq(p),
      probe = col("doc_id") === 1L, qTerms = 2)
      .as[(Long, String)].collect().toSet
    // alpha (tf 3) first; beta and gamma tie at tf-rank by tf (beta 2 > gamma 1)
    assert(q === Set((1L, "alpha"), (1L, "beta")))
  }

  test("integer-exact scoring: a hand-computed single-term corpus") {
    // 2 docs, 2 words each: N=2, T=4, dl=2 → dlr_ppt = (2*2*1000)/4 = 1000.
    // 'x' appears in doc 1 only (tf 2): df=1 → idf_ppt = (2*(2-1)+1)*1000/3
    // = 1000; tf_ppt = 2200000000*2 / (2000000+300000+900000) = 1375;
    // score = 1000*1375/1000 = 1375.
    val corpus = docs((1L, "x x"), (2L, "y y"))
    val p = Retrieval.postings(corpus)
    val q = Seq((9L, "x")).toDF("query_id", "term")
    val out = Retrieval.bm25TopK(p, q).as[(Long, Long, Long)].collect()
    assert(out.toSeq === Seq((9L, 1L, 1375L)))
  }

  test("MaxScore pruning is bit-identical to the full traversal on every branch") {
    // 20 stopword-only docs + 3 needle docs: a needle query certifies
    // (rare-term candidates dominate the skipped stopword bound), a
    // stopword-only query must FALL BACK (no essential term), and a
    // query naming an absent term exercises the ub=0 path — all three
    // must equal the full traversal exactly.
    val corpus = docs(
      (Seq((1L, s"needle needle $filler"), (2L, s"needle alpha $filler"),
        (3L, s"alpha needle needle $filler")) ++
        (10L to 29L).map(i => i -> filler)): _*)
    val p = Retrieval.postings(corpus)
    val df = Retrieval.docFreq(p)
    val tot = Retrieval.corpusTotals(p)
    val qs = Seq(
      (100L, "needle"), (100L, "the"),   // rare + stopword: certifies
      (101L, "the"), (101L, "common"),   // stopwords only: falls back
      (102L, "needle"), (102L, "zzz"))   // absent term: ub 0, certifies
      .toDF("query_id", "term")
    def rows(d: DataFrame) = d.as[(Long, Long, Long)].collect().toSet
    val full = rows(Retrieval.bm25TopKWith(p, df, tot, qs, k = 3))
    // df('needle') = 3, stopword dfs = 23: the cutoff splits them
    val pruned = rows(Retrieval.bm25TopKMaxScore(p, df, tot, qs, k = 3,
      essentialDfMax = 10L))
    assert(pruned === full)
    // every query answered (101 via fallback — its top-3 are present)
    assert(pruned.map(_._1) === Set(100L, 101L, 102L))
    // cutoff 0 forces global fallback; cutoff ∞ makes everything
    // essential (certificate trivially exact) — both still identical
    assert(rows(Retrieval.bm25TopKMaxScore(p, df, tot, qs, k = 3,
      essentialDfMax = 0L)) === full)
    assert(rows(Retrieval.bm25TopKMaxScore(p, df, tot, qs, k = 3,
      essentialDfMax = Long.MaxValue)) === full)
  }

  test("a skipped zero-idf term (df ≈ N) cannot short-circuit the certificate") {
    // 'every' appears in all 502 docs: idf_ppt = 1000 div (2·502+1) = 0,
    // so its skipped-term bound is 0 — but the full traversal still ranks
    // its zero-score matches when fewer than k positive-score docs exist.
    // The certificate must therefore NOT treat ub_rest = 0 as exact when
    // a corpus-present term was skipped: this query has 2 candidates for
    // k = 3, must fall back, and the outputs must match bit-for-bit.
    val corpus = docs(
      (Seq((1L, "needle every"), (2L, "needle every")) ++
        (10L to 509L).map(i => i -> "every")): _*)
    val p = Retrieval.postings(corpus)
    val df = Retrieval.docFreq(p)
    val tot = Retrieval.corpusTotals(p)
    val qs = Seq((1L, "needle"), (1L, "every")).toDF("query_id", "term")
    def rows(d: DataFrame) = d.as[(Long, Long, Long)].collect().toSet
    val full = rows(Retrieval.bm25TopKWith(p, df, tot, qs, k = 3))
    // the full top-3 includes a zero-score 'every'-only doc as the 3rd hit
    assert(full.exists(_._3 === 0L),
      "fixture precondition: the skipped term's idf must floor to 0")
    assert(rows(Retrieval.bm25TopKMaxScore(p, df, tot, qs, k = 3,
      essentialDfMax = 10L)) === full)
    assert(rows(Retrieval.bm25TopKMaxScore(p, df, tot, qs, k = 3,
      essentialDfMax = 10L, eager = false)) === full)
  }

  test("certificate fallback collects non-BIGINT query ids generically") {
    // the eager branch collects failed query ids — a string-keyed
    // workload must flow through isInCollection without a cast error
    val corpus = docs((1L, s"needle $filler"), (2L, filler), (3L, filler),
      (4L, filler))
    val p = Retrieval.postings(corpus)
    val qs = Seq(("qa", "needle"), ("qb", "the")).toDF("query_id", "term")
    val out = Retrieval.bm25TopKMaxScore(p, Retrieval.docFreq(p),
      Retrieval.corpusTotals(p), qs, k = 2, essentialDfMax = 2L)
      .as[(String, Long, Long)].collect()
    val full = Retrieval.bm25TopKWith(p, Retrieval.docFreq(p),
      Retrieval.corpusTotals(p), qs, k = 2).as[(String, Long, Long)].collect()
    assert(out.toSet === full.toSet)
    assert(out.map(_._1).toSet === Set("qa", "qb"))
  }

  test("deriveEssentialDfMax: largest cutoff whose Σ essential df fits the budget") {
    val df = Seq(("a", 1L), ("b", 1L), ("c", 3L), ("d", 5L), ("e", 100L))
      .toDF("term", "df")
    // cumulative exposure by df value: df=1 → 2, df=3 → 5, df=5 → 10,
    // df=100 → 110
    assert(Retrieval.deriveEssentialDfMax(df, candidateBudget = 10L) === 5L)
    assert(Retrieval.deriveEssentialDfMax(df, candidateBudget = 9L) === 3L)
    assert(Retrieval.deriveEssentialDfMax(df, candidateBudget = 2L) === 1L)
    // even the rarest class overflows → 0 (global fallback, by design)
    assert(Retrieval.deriveEssentialDfMax(df, candidateBudget = 1L) === 0L)
    assert(Retrieval.deriveEssentialDfMax(df, candidateBudget = 1000L) === 100L)
  }
}
