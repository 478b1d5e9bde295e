package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Sources

class LayoutSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("mortonInterleave spreads and interleaves bits correctly") {
    val out = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (65535L, 65535L))
      .toDF("a", "b")
      .select(Sources.mortonInterleave(col("a"), col("b")).as("z"))
      .as[Long].collect().toSeq
    // by hand: z(1,0)=1, z(0,1)=2, z(3,5) = interleave(011, 101) = 100111 = 39
    assert(out === Seq(0L, 1L, 2L, 39L, (1L << 32) - 1))
  }

  test("writeZOrdered clusters BOTH dimensions into tight per-file ranges") {
    val n = 40000
    // two independent uniform dims — a single-column sort would leave the
    // other dim spanning the full range in every file
    val df = (0 until n).map { i =>
      (((i * 2654435761L) % 10000).toInt, ((i * 40503L + 7) % 10000).toInt)
    }.toDF("x", "y")
    val dir = java.nio.file.Files.createTempDirectory("zorder").toString
    Sources.writeZOrdered(df, dir, "x", "y", files = 16)

    val spans = spark.read.parquet(dir)
      .groupBy(input_file_name().as("f"))
      .agg((max("x") - min("x")).as("sx"), (max("y") - min("y")).as("sy"),
        count(lit(1)).as("rows"))
      .select(avg("sx"), avg("sy"), sum("rows"))
      .head()
    val (avgSx, avgSy, total) = (spans.getDouble(0), spans.getDouble(1), spans.getLong(2))
    assert(total === n, "no rows lost in the layout write")
    // 16 z-range files over a 10000×10000 space → each file covers ~1/16 of
    // the curve ≈ a quarter of each dim; a sort on x alone would give
    // avg(sy) ≈ 10000. Assert well under half the span for BOTH dims.
    assert(avgSx < 5000, s"x not clustered: avg span $avgSx")
    assert(avgSy < 5000, s"y not clustered: avg span $avgSy")
  }

  test("quantile z-order beats linear z-order on a skewed dimension") {
    val n = 40000
    // x zipf-ish: 90% of rows in [0, 100), tail out to 1e6; y uniform
    val df = (0 until n).map { i =>
      val x = if (i % 10 != 0) (i * 2654435761L % 100).toInt
              else (1000 + (i * 40503L % 999000)).toInt
      (x, ((i * 48271L + 11) % 10000).toInt)
    }.toDF("x", "y")
    val linDir = java.nio.file.Files.createTempDirectory("zlin").toString
    val qDir = java.nio.file.Files.createTempDirectory("zq").toString
    Sources.writeZOrdered(df, linDir, "x", "y", files = 64)
    Sources.writeZOrderedByQuantile(df, qDir, "x", "y", files = 64, buckets = 1024)

    // Inside the DENSE region (90% of rows, x < 100) linear bucketing
    // collapses x to ~6 of 65536 buckets — files cannot subdivide x where
    // the data lives, so each file's dense-x span stays ≈ the whole dense
    // range. Quantile buckets spend their resolution on occupancy and cut
    // per-file dense-x spans by an order of magnitude.
    def denseSpan(dir: String): Double = spark.read.parquet(dir)
      .filter(col("x") < 100)
      .groupBy(input_file_name().as("f"))
      .agg((max("x") - min("x")).as("span"), count(lit(1)).as("rows"))
      .filter(col("rows") > 100) // files with real dense mass
      .select(avg("span")).head().getDouble(0)
    val (lin, q) = (denseSpan(linDir), denseSpan(qDir))
    assert(q < lin / 2,
      s"quantile layout must resolve the dense region: linear=$lin quantile=$q")
    // content identical either way
    assert(spark.read.parquet(qDir).count() === n)
  }

  test("z-ordered layout prunes files for a 2-D box predicate") {
    val n = 40000
    val df = (0 until n).map { i =>
      (((i * 2654435761L) % 10000).toInt, ((i * 40503L + 7) % 10000).toInt)
    }.toDF("x", "y")
    val dir = java.nio.file.Files.createTempDirectory("zorder2").toString
    Sources.writeZOrdered(df, dir, "x", "y", files = 16)
    val read = spark.read.parquet(dir)
      .filter(col("x").between(100, 600) && col("y").between(100, 600))
    // the box touches ~1/16 of the files' (x,y) rectangles; count the files
    // whose rows survive — with footer stats those are the only ones read
    val filesTouched = read.select(input_file_name()).distinct().count()
    assert(filesTouched <= 4, s"2-D box should live in few z-files, touched $filesTouched")
    // and the result is still exactly right
    val expected = df.filter(col("x").between(100, 600) && col("y").between(100, 600)).count()
    assert(read.count() === expected)
  }
}
