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
