package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Audit
import graft.tools.ScaleGen

/** Correctness AT SCALE, in CI shape (r10 VERDICT #5): the per-round
  * oracle gates check sf0.01 and the scaling runs check WALL-CLOCK at
  * sf1/sf10 — nothing re-checked an ANSWER above the gated SF, so a
  * scale-only wrong answer (overflow, hash-collision regime, iteration
  * ceiling) could ride under green gates. Two gates close that:
  *
  *  1. the scale DATA is provably the claimed shape: ScaleGen's
  *     documents transform is deterministic, so its manifest
  *     (`Audit.manifest` — per-shard count/xor/sum fingerprints) against
  *     a checked-in certificate pins every byte of the 10× corpus the
  *     ratios are measured on. Any edit to ScaleGen or the driver data
  *     fails this loudly instead of silently shifting the bench's basis.
  *
  *  2. two INDEPENDENT algorithms agree at 10× the gated SF: q48's
  *     label-propagation fixed point and q153's large-star/small-star
  *     contraction compute per-component min labels by different
  *     mechanisms (iterated neighbor-min vs alternating star rewires);
  *     their equality on the 10×-scaled documents' near-dup graph is a
  *     correctness statement no single-algorithm rerun can make.
  */
class ScaleGateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val scaled = ScaleGen
    .scaledDocuments(Tables(spark, "/root/testdata/sf0.1").documents, 10)

  test("ScaleGen documents manifest matches the checked-in certificate (10x sf0.1)") {
    val got = Audit.manifest(scaled, "doc_id", Seq("text", "n_chars"), shards = 8)
      .orderBy(col("shard"))
      .as[(Int, Long, Long, Long)].collect().toSeq
    println(s"SCALE-CERT: ${got.mkString("; ")}")
    // certified 2026-08-14 against the round-11 driver testdata
    val expected = Seq(
      (0, 6261L, 919431703931395759L, 3107369108L),
      (1, 6288L, 647512829955289197L, 3135039614L),
      (2, 6220L, 1029625082025481980L, 3138103595L),
      (3, 6209L, 100918367799042118L, 3078007584L),
      (4, 6315L, 525108115662393871L, 3137031023L),
      (5, 6273L, 340466255280254811L, 3116225143L),
      (6, 6268L, 857301137616676862L, 3124545711L),
      (7, 6166L, 887521433835365082L, 3071253163L))
    assert(got === expected,
      "the 10x-scaled documents table changed shape — ScaleGen or the " +
        "driver testdata moved; re-certify deliberately, never silently")
  }

  test("q48 fixed-point labels == q153 star labels on the 10x near-dup graph") {
    val pairs = graft.text.Dedup.materialize(
      graft.text.Dedup.nearDupPairs(scaled).select(col("doc_a"), col("doc_b")))
    assert(pairs.count() > 0, "the scaled corpus must carry near-dup pairs")
    val viaFixedPoint = graft.text.Dedup.nearDupClusters(scaled)
      .as[(Long, Long)].collect().toSet
    val viaStars = graft.operators.Graph.connectedComponents(
        pairs.select(col("doc_a").as("u"), col("doc_b").as("v")))
      .select(col("node"), col("component"))
      .as[(Long, Long)].collect().toSet
    assert(viaFixedPoint === viaStars)
  }
}
