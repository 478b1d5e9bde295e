package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plan.{Plan, Stage}
import graft.sources.Sources

class PipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("config-gated plan runs exactly the enabled stages, in order") {
    val df = Seq((1, 10.0), (2, 20.0), (3, 30.0)).toDF("id", "v")
    val plan = Plan(Seq(
      "filter" -> Stage.Filter(col("v") > 10),
      "proj" -> Stage.Project(Seq("v2" -> (col("v") * 2)))))
    val all = plan.build(df, Map("filter" -> "", "proj" -> ""))
    assert(all.columns.contains("v2") && all.count() === 2)
    val onlyProj = plan.build(df, Map("proj" -> ""))
    assert(onlyProj.count() === 3 && onlyProj.columns.contains("v2"))
    val none = plan.build(df, Map.empty)
    assert(none.collect().length === 3 && !none.columns.contains("v2"))
  }

  test("markDuplicates stage + broadcastApply stage compose into one lazy plan") {
    val df = Seq((1, "k", 5.0), (2, "k", 9.0)).toDF("id", "g", "q")
    val dim = Seq(("k", "dimval")).toDF("g", "extra")
    val plan = Plan(Seq(
      "dedup" -> Stage.MarkDuplicates(Seq(col("g")), col("q"), Seq(col("id"))),
      "apply" -> Stage.BroadcastApply(dim, Seq("g"))))
    val out = plan.build(df, Map("dedup" -> "", "apply" -> ""))
    val rows = out.select("id", "is_dup", "extra").as[(Int, Int, String)].collect().toSet
    assert(rows === Set((1, 1, "dimval"), (2, 0, "dimval")))
  }

  test("scanDatasets tags the top-level subdirectory as dataset_id, even for nested layouts") {
    val root = java.nio.file.Files.createTempDirectory("scan").toString
    Seq((1, "a")).toDF("id", "x").write.parquet(s"$root/ds1/part.parquet")
    Seq((2, "b")).toDF("id", "x").write.parquet(s"$root/ds2/part.parquet")
    // nested layout: recursiveFileLookup's whole point — the dataset must
    // still be ds3, NOT the inner year=2020 directory
    Seq((3, "c")).toDF("id", "x").write.parquet(s"$root/ds3/year=2020/part.parquet")
    val got = Sources.scanDatasets(spark, root)
      .select("id", "dataset_id").as[(Int, String)].collect().toSet
    assert(got === Set((1, "ds1"), (2, "ds2"), (3, "ds3")))
  }

  test("writePartitioned keeps sortCols order inside each partition's files") {
    val out = java.nio.file.Files.createTempDirectory("sortsink").toString + "/t"
    val df = Seq((5, "x"), (1, "x"), (3, "x"), (2, "y"), (9, "y"), (4, "y"))
      .toDF("id", "part").repartition(1)
    Sources.writePartitioned(df, out, Seq("part"), Seq("id"))
    for (p <- Seq("x", "y")) {
      val files = new java.io.File(s"$out/part=$p").listFiles()
        .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_"))
      assert(files.nonEmpty)
      files.foreach { f =>
        val ids = spark.read.parquet(f.toString).select("id").as[Int].collect().toSeq
        assert(ids === ids.sorted, s"file $f lost the sortCols order: $ids")
      }
    }
  }

  test("writePartitioned round-trips with partition pruning available") {
    val out = java.nio.file.Files.createTempDirectory("sink").toString + "/t"
    val df = Seq((1, "x", 1.0), (2, "y", 2.0)).toDF("id", "part", "v")
    Sources.writePartitioned(df, out, Seq("part"), Seq("id"))
    val back = spark.read.parquet(out)
    assert(back.filter(col("part") === "x").select("id").as[Int].collect().toSeq === Seq(1))
  }

  test("ORC source/sink round-trip with predicate pushdown") {
    val out = java.nio.file.Files.createTempDirectory("orc").toString + "/t"
    val df = (1 to 100).map(i => (i, s"s$i")).toDF("id", "s")
    Sources.writePartitioned(df, out, Seq.empty, Seq("id"), format = "orc")
    val back = Sources.orc(spark, out).filter(col("id") > 90)
    assert(back.count() === 10)
    val scan = back.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters: [IsNotNull(id), GreaterThan(id,90)]"),
      s"ORC scan must receive the pushed predicate, got:\n$scan")
  }
}
