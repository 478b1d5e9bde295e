package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

class CliSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("Corpus CLI end-to-end: filter -> decontaminate -> dedup -> pack -> sharded write") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = Files.createTempDirectory("corpus")
    val common = (1 to 40).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, common + " tail one"),                                  // near-dup pair with 2
      (2L, common + " tail two"),
      (3L, (100 to 160).map(i => s"v$i").mkString(" ")),           // clean
      (4L, "leaky contains the secret eval trigram here plus filler " +
        (200 to 240).map(i => s"u$i").mkString(" ")),              // contaminated
      (5L, "too short"))                                           // fails min-tokens
      .toDF("doc_id", "text")
    val bench = Seq((100L, "benchmark with the secret eval trigram inside"))
      .toDF("doc_id", "text")
    docs.write.parquet(s"$dir/corpus")
    bench.write.parquet(s"$dir/bench")

    graft.cli.Corpus.run(spark, Array(
      "-I", s"$dir/corpus", "-O", s"$dir/out",
      "--benchmark", s"$dir/bench", "--dedup",
      "--min-tokens", "5", "--pack", "64", "--shards", "2"))

    val out = spark.read.parquet(s"$dir/out")
    // 5 dropped (short), 4 dropped (contaminated), 2 dropped (near-dup of 1)
    assert(out.select("doc_id").as[Long].collect().toSet === Set(1L, 3L))
    assert(out.columns.contains("seq_id") && out.columns.contains("shard"))
    // deterministic: a second run over the same input is identical
    graft.cli.Corpus.run(spark, Array(
      "-I", s"$dir/corpus", "-O", s"$dir/out2",
      "--benchmark", s"$dir/bench", "--dedup",
      "--min-tokens", "5", "--pack", "64", "--shards", "2"))
    val a = out.orderBy("doc_id").collect().toSeq
    val b = spark.read.parquet(s"$dir/out2").orderBy("doc_id").collect().toSeq
    assert(a === b)
  }

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
