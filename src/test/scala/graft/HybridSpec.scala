package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.text.Hybrid

/** RRF fusion semantics on planted rank lists: exact integer scores,
  * both-legs dominance, one-leg NULL reporting, deterministic
  * tie-breaks, and the k cut.
  */
class HybridSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def leg(rankCol: String, rows: (Long, Long, Int)*) =
    rows.toDF("query_id", "doc_id", rankCol)

  test("fused scores are the exact integer reciprocal sums; both-legs docs dominate") {
    val lex = leg("lex_rank", (1L, 10L, 1), (1L, 20L, 2))
    val vec = leg("vec_rank", (1L, 20L, 1), (1L, 30L, 2))
    val got = Hybrid.rrfFuse(lex, vec, k = 10)
      .orderBy(col("rank"))
      .select("doc_id", "rrf_ppb", "rank")
      .as[(Long, Long, Int)].collect().toSeq
    val r1 = 1000000000L / 61 // rank 1 term
    val r2 = 1000000000L / 62 // rank 2 term
    // doc 20 is on BOTH legs (ranks 2 and 1) and must out-score the
    // single-leg rank-1 docs; docs 10 and 30 tie on score -> doc_id asc
    assert(got === Seq((20L, r2 + r1, 1), (10L, r1, 2), (30L, r2, 3)))
  }

  test("one-leg docs report the other rank as NULL; k cuts the fused list") {
    val lex = leg("lex_rank", (1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3))
    val vec = leg("vec_rank", (1L, 12L, 1))
    val fused = Hybrid.rrfFuse(lex, vec, k = 2)
    val rows = fused.orderBy(col("rank"))
      .select("doc_id", "lex_rank", "vec_rank")
      .collect().map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2))))
    assert(rows.length === 2, "k must cut the fused list")
    assert(rows.head === ((12L, Some(3), Some(1))))
    assert(rows(1) === ((10L, Some(1), None)),
      "a lex-only doc must carry vec_rank NULL, not an imputed value")
  }

  test("selfEval: known-item metrics in exact integers; misses count as 0") {
    val probes = Seq(1L, 2L, 3L, 4L).toDF("query_id")
    // self-hits: q1 at rank 1, q2 at rank 4, q4 at rank 2; q3 never
    // finds itself (and q2's top hit is some other doc — ignored)
    val ranked = Seq(
      (1L, 1L, 1), (2L, 99L, 1), (2L, 2L, 4), (4L, 4L, 2))
      .toDF("query_id", "doc_id", "rank")
    val got = Hybrid.selfEval(probes, ranked, "sys")
      .as[(String, Long, Long, Long)].collect().head
    assert(got === (("sys", 4L, 3L,
      (1000000000L + 250000000L + 500000000L) / 4)))
  }

  test("addRank ranks per query and cuts at k") {
    val scored = Seq((1L, 10L, 900L), (1L, 11L, 800L), (1L, 12L, 700L),
      (2L, 10L, 100L)).toDF("query_id", "doc_id", "score")
    val got = Hybrid.addRank(scored, col("query_id"),
      Seq(col("score").desc, col("doc_id").asc), "r", 2)
      .select("query_id", "doc_id", "r")
      .as[(Long, Long, Int)].collect().toSet
    assert(got === Set((1L, 10L, 1), (1L, 11L, 2), (2L, 10L, 1)))
  }

  // q187's PRECONDITION, pinned: the gate compares an IVF-served vector
  // leg (Scala) against an exact brute-force leg (oracle), which is only
  // a leg-agnosticism proof if the planted embeddings make ANN recall@10
  // exactly 100%. This test states that plant property as two checkable
  // facts on the actual test data — if TESTDATA changes in a way that
  // breaks the plant, this fails loudly instead of q187 silently gating
  // a lossy leg (the r12-advice q171/q106 oracle-precondition lesson).
  test("q187 planted vectors: every vector assigns to its own group's centroid; exact top-10 is cell-local") {
    val dir = "/root/testdata/sf0.001"
    val e = graft.text.Queries.plantedVectors(spark, dir).cache()
    val cents = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cid"), col("q").as("cq"))
    // (1) argmax-dot assignment lands every vector in group vec_id % 8
    val misassigned = e.crossJoin(broadcast(cents))
      .withColumn("cdot", graft.functions.VectorDot.of(col("q"), col("cq")))
      .withColumn("rn", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("vec_id"))
          .orderBy(col("cdot").desc, col("cid").asc)))
      .filter(col("rn") === 1 && col("cid") =!= col("vec_id") % 8)
      .count()
    assert(misassigned === 0L, "the dominant coordinate must decide the cell")
    // (2) each probe's exact top-10 (self included, q183's contract)
    // stays inside the probe's own group — so nprobe=1 recall@10 = 100%
    val qs = e.filter(col("vec_id") % 5 === 0 && col("vec_id") < 60)
    val exact = e.as("b").crossJoin(broadcast(qs.as("a")))
      .select(col("a.vec_id").as("query_id"), col("b.vec_id").as("doc_id"),
        graft.vector.VectorOps.cosineQ(
          graft.functions.VectorDot.of(col("a.q"), col("b.q")),
          col("a.n2"), col("b.n2")).as("sim"))
    val crossGroupInTop10 = Hybrid.addRank(exact, col("query_id"),
        Seq(col("sim").desc, col("doc_id").asc), "r", 10)
      .filter(col("doc_id") % 8 =!= col("query_id") % 8)
      .count()
    assert(crossGroupInTop10 === 0L,
      "an exact top-10 hit outside the query's cell breaks q187's recall-100% plant")
    // the locality claim must not be vacuous: every group holds >= 10
    val minGroup = e.groupBy(col("vec_id") % 8).count()
      .agg(org.apache.spark.sql.functions.min("count")).as[Long].head()
    assert(minGroup >= 10L, s"groups too small for top-10 locality: $minGroup")
  }
}
