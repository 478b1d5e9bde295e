package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

class CliSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("CLI end-to-end: SAM-like text + properties config -> parquet outputs") {
    val dir = Files.createTempDirectory("cli")
    val sam = dir.resolve("in.sam")
    Files.writeString(sam,
      """@HD	VN:1.6
        |r1	0	chr1	100	60	4M	*	0	0	ACGT	IIII
        |r2	0	chr1	100	60	4M	*	0	0	ACGT	####
        |r3	0	chr1	200	60	4M	*	0	0	ACGT	IIII
        |r4	0	chr1	200	60	4M	*	0	0	ACGT	IIII
        |""".stripMargin)
    val conf = dir.resolve("pipeline.properties")
    Files.writeString(conf, "MarkDuplicates=\n")
    val out = dir.resolve("out").toString

    graft.cli.Main.run(spark, Array(
      "-I", sam.toString, "-C", conf.toString, "-O", out, "-F", "sam"))

    val pre = spark.read.parquet(s"$out/preprocessed")
    assert(pre.count() === 4)
    // r2 has the lower quality sum at chr1:100 → duplicate-flagged
    val dups = pre.filter(org.apache.spark.sql.functions.expr(s"(flag & 1024) != 0"))
      .select("qname").collect().map(_.getString(0)).toSet
    assert(dups === Set("r2", "r4")) // r4 loses the (r3,r4) tie on qname
    // HaplotypeCaller key absent → discovery gated off, no variants output
    assert(!new java.io.File(s"$out/variants").exists())
  }

  test("CLI enforces the reference's -S requirement for BaseRecalibrator") {
    val dir = Files.createTempDirectory("cli2")
    val conf = dir.resolve("p.properties")
    Files.writeString(conf, "BaseRecalibrator=\nPrintReads=\n")
    val e = intercept[IllegalArgumentException] {
      graft.cli.Main.run(spark, Array(
        "-I", dir.toString, "-C", conf.toString, "-O", dir.resolve("o").toString))
    }
    assert(e.getMessage.contains("known sites"))
  }
}
