package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Formats

class FormatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def write(name: String, content: String): String = {
    val dir = Files.createTempDirectory("fmt")
    val f = dir.resolve(name)
    Files.writeString(f, content)
    f.toString
  }

  test("readSamLike parses mandatory fields and trailing attrs, skips headers") {
    val sam = write("t.sam",
      """@HD	VN:1.6
        |@SQ	SN:chr1	LN:1000
        |r1	0	chr1	100	60	4M	*	0	0	ACGT	FFFF	NM:i:0	RG:Z:rg1
        |r2	1024	chr1	100	60	4M	*	0	0	ACGT	FFFF
        |""".stripMargin)
    val df = Formats.readSamLike(spark, sam)
    val rows = df.collect()
    assert(rows.length === 2)
    val r1 = df.filter($"qname" === "r1").head()
    assert(r1.getAs[String]("contig") === "chr1" && r1.getAs[Long]("pos") === 100L)
    assert(r1.getAs[Map[String, String]]("attrs") === Map("NM" -> "0", "RG" -> "rg1"))
    val r2 = df.filter($"qname" === "r2").head()
    assert(r2.getAs[Int]("flag") === 1024)
    assert(r2.getAs[Map[String, String]]("attrs") === Map.empty)
  }

  test("graft-sam DataSourceV2: row parity with readSamLike, split-stable, prunes and pushes") {
    // 200 records so several 256-byte splits land mid-line.
    val body = (1 to 200).map { i =>
      s"r$i\t${i % 2}\tchr${i % 3}\t${i * 10}\t60\t4M\t*\t0\t0\tACGT\tFFFF\tNM:i:$i"
    }.mkString("\n")
    val sam = write("big.sam", "@HD\tVN:1.6\n" + body + "\n")

    val v2 = spark.read.format("graft-sam")
      .option("maxPartitionBytes", "256").load(sam)
    val v1 = Formats.readSamLike(spark, sam)
    assert(v2.rdd.getNumPartitions > 1, "byte-range splitting must yield multiple partitions")
    assert(v2.count() === 200)
    val a = v2.select($"qname", $"flag", $"pos", $"attrs"("NM").as("nm"))
      .as[(String, Int, Long, String)].collect().toSet
    val b = v1.select($"qname", $"flag", $"pos", $"attrs"("NM").as("nm"))
      .as[(String, Int, Long, String)].collect().toSet
    assert(a === b)

    // pruning + contig pushdown visible in the v2 scan, and correct
    val pruned = spark.read.format("graft-sam").load(sam)
      .filter($"contig" === "chr1").select("pos")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("EqualTo(contig,chr1)"), s"pushed filter missing:\n$plan")
    assert(plan.contains("ReadSchema: struct<pos:bigint>"), s"pruned schema missing:\n$plan")
    assert(pruned.as[Long].collect().toSet ===
      (1 to 200).filter(_ % 3 == 1).map(_ * 10L).toSet)
  }

  test("graft-sam conjunctive contig equalities are ALL enforced, not just the first") {
    val body = (1 to 30).map { i =>
      s"r$i\t0\tchr${i % 3}\t${i * 10}\t60\t4M\t*\t0\t0\tACGT\tFFFF"
    }.mkString("\n")
    val sam = write("conj.sam", body + "\n")
    val base = spark.read.format("graft-sam").load(sam)
    // contradictory equalities: the correct answer is EMPTY — a reader
    // applying only the first pushed filter would return chr1's rows
    assert(base.filter($"contig" === "chr1" && $"contig" === "chr2").count() === 0)
    // redundant duplicates stay correct too
    assert(base.filter($"contig" === "chr1" && $"contig" === "chr1").count() === 10)
  }

  test("graft-sam write: round-trips records, overwrite truncates, append adds") {
    val src = write("rt.sam",
      (1 to 50).map(i => s"r$i\t0\tchr${i % 2}\t$i\t60\t4M\t*\t0\t0\tACGT\tFFFF\tNM:i:$i")
        .mkString("", "\n", "\n"))
    val outDir = Files.createTempDirectory("samout").toString
    val df = spark.read.format("graft-sam").load(src)

    df.write.format("graft-sam").mode("overwrite").save(outDir)
    val back = spark.read.format("graft-sam").load(outDir)
    def key(d: org.apache.spark.sql.DataFrame) =
      d.select($"qname", $"flag", $"contig", $"pos", $"attrs"("NM").as("nm"))
        .as[(String, Int, String, Long, String)].collect().toSet
    assert(key(back) === key(df))

    df.write.format("graft-sam").mode("append").save(outDir)
    assert(spark.read.format("graft-sam").load(outDir).count() === 100)

    df.write.format("graft-sam").mode("overwrite").save(outDir)
    assert(spark.read.format("graft-sam").load(outDir).count() === 50)
  }

  test("graft-sam micro-batch stream picks up new files exactly once") {
    val dir = Files.createTempDirectory("samstream")
    def writeFile(name: String, n: Int, off: Int): Unit =
      Files.writeString(dir.resolve(name),
        (1 to n).map(i => s"r${off + i}\t0\tchr1\t${off + i}\t60\t4M\t*\t0\t0\tACGT\tFFFF")
          .mkString("", "\n", "\n"))
    writeFile("a.sam", 10, 0)
    val ckpt = Files.createTempDirectory("samckpt").toString
    val q = spark.readStream.format("graft-sam").load(dir.toString)
      .select($"qname", $"pos")
      .writeStream.format("memory").queryName("sam_stream")
      .option("checkpointLocation", ckpt).start()
    try {
      q.processAllAvailable()
      assert(spark.table("sam_stream").count() === 10)
      writeFile("b.sam", 7, 100)
      q.processAllAvailable()
      assert(spark.table("sam_stream").count() === 17)
      // append to an EXISTING file (at a line boundary, per the contract):
      // the first appended line must not be swallowed by split semantics
      val appended = (1 to 5)
        .map(i => s"r${200 + i}\t0\tchr1\t${200 + i}\t60\t4M\t*\t0\t0\tACGT\tFFFF")
        .mkString("", "\n", "\n")
      Files.writeString(dir.resolve("a.sam"),
        Files.readString(dir.resolve("a.sam")) + appended)
      q.processAllAvailable()
      assert(spark.table("sam_stream").count() === 22)
      assert(spark.table("sam_stream").select("qname").distinct().count() === 22)
    } finally q.stop()
  }

  test("graft-sam end-to-end streaming: source directory tailed into a sink directory") {
    val in = Files.createTempDirectory("samsin")
    val out = Files.createTempDirectory("samsout").toString
    def rec(i: Int) = s"r$i\t0\tchr1\t$i\t60\t4M\t*\t0\t0\tACGT\tFFFF"
    Files.writeString(in.resolve("a.sam"), (1 to 10).map(rec).mkString("", "\n", "\n"))
    val ckpt = Files.createTempDirectory("samsck").toString
    val q = spark.readStream.format("graft-sam").load(in.toString)
      .writeStream.format("graft-sam").option("path", out)
      .option("checkpointLocation", ckpt).start()
    try {
      q.processAllAvailable()
      Files.writeString(in.resolve("b.sam"), (11 to 17).map(rec).mkString("", "\n", "\n"))
      q.processAllAvailable()
    } finally q.stop()
    val result = spark.read.format("graft-sam").load(out)
    assert(result.count() === 17)
    assert(result.select($"pos").as[Long].collect().toSet === (1L to 17L).toSet)
  }

  test("graft-sam streaming sink survives a query restart without duplicating rows") {
    val in = Files.createTempDirectory("samrin")
    val out = Files.createTempDirectory("samrout").toString
    val ckpt = Files.createTempDirectory("samrck").toString
    def rec(i: Int) = s"r$i\t0\tchr1\t$i\t60\t4M\t*\t0\t0\tACGT\tFFFF"
    def startQuery() = spark.readStream.format("graft-sam").load(in.toString)
      .writeStream.format("graft-sam").option("path", out)
      .option("checkpointLocation", ckpt).start()

    Files.writeString(in.resolve("a.sam"), (1 to 8).map(rec).mkString("", "\n", "\n"))
    val q1 = startQuery()
    try q1.processAllAvailable() finally q1.stop()

    // restart from the same checkpoint; new data plus (possibly) replayed
    // epochs must not duplicate anything
    Files.writeString(in.resolve("b.sam"), (9 to 12).map(rec).mkString("", "\n", "\n"))
    val q2 = startQuery()
    try q2.processAllAvailable() finally q2.stop()

    val result = spark.read.format("graft-sam").load(out)
    assert(result.count() === 12)
    assert(result.select($"pos").as[Long].collect().toSet === (1L to 12L).toSet)
  }

  test("readVcfLike parses alt lists and info maps, skips headers") {
    val vcf = write("t.vcf",
      """##fileformat=VCFv4.2
        |#CHROM	POS	ID	REF	ALT	QUAL	FILTER	INFO
        |chr1	100	rs1	A	T,C	50.0	PASS	DP=10;AF=0.5
        |""".stripMargin)
    val df = Formats.readVcfLike(spark, vcf)
    val r = df.head()
    assert(r.getAs[Seq[String]]("alt") === Seq("T", "C"))
    assert(r.getAs[Double]("qual") === 50.0)
    assert(r.getAs[Map[String, String]]("info") === Map("DP" -> "10", "AF" -> "0.5"))
  }

  test("readFastq stitches 4-line records") {
    val fq = write("t.fastq",
      """@read1
        |ACGT
        |+
        |FFFF
        |@read2
        |GGCC
        |+
        |!!!!
        |""".stripMargin)
    val rows = Formats.readFastq(spark, fq)
      .as[(String, String, String)].collect().toSet
    assert(rows === Set(("read1", "ACGT", "FFFF"), ("read2", "GGCC", "!!!!")))
  }

  test("readFastq fails loudly on truncated or misframed input instead of garbling records") {
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    // truncated tail: last record has 3 of 4 lines
    val trunc = write("trunc.fastq", "@r1\nACGT\n+\nFFFF\n@r2\nGGCC\n+\n")
    val e1 = intercept[Exception] { Formats.readFastq(spark, trunc).collect() }
    assert(msgs(e1).exists(_.contains("truncated")))
    // a stray blank line shifts the framing of everything after it
    val shifted = write("shift.fastq", "@r1\nACGT\n+\nFFFF\n\n@r2\nGGCC\n+\n!!!!\n")
    val e2 = intercept[Exception] { Formats.readFastq(spark, shifted).collect() }
    assert(msgs(e2).exists(m => m.contains("misframed") || m.contains("truncated")))
  }
}
