package graft.cli

import org.apache.spark.sql.SparkSession

import graft.{GraftSession, Sessions}
import graft.domain.CallerPipeline
import graft.domain.Model.{Interval, KnownSite}
import graft.sources.{Formats, Sources}

/** CLI entry point mirroring the reference's spark-submit surface
  * (daas-apps `SparkCaller.main`, `SparkCaller.java:388-421`, SURVEY.md
  * §3.1): input folder + properties config → config-gated pipeline →
  * partitioned parquet output. Flags follow the reference's letters
  * (-I input, -C config, -O output; -S known-sites is optional like the
  * reference's, but absence + BaseRecalibrator is an error there and here,
  * `SparkCaller.java:401-404`).
  *
  * Usage:
  *   spark-submit --class graft.cli.Main graft.jar \
  *     -I /data/sam_or_parquet -C pipeline.properties -O /out [-S known.parquet]
  *
  * Unlike the reference there is no per-stage collect(): the whole
  * preprocess composes into one lazy plan and materializes once at the
  * sink.
  */
object Main {

  private final case class Args(
      input: String = "", config: String = "", out: String = "",
      knownSites: Option[String] = None, format: String = "sam")

  private def parse(argv: List[String], acc: Args = Args()): Args = argv match {
    case "-I" :: v :: rest => parse(rest, acc.copy(input = v))
    case "-C" :: v :: rest => parse(rest, acc.copy(config = v))
    case "-O" :: v :: rest => parse(rest, acc.copy(out = v))
    case "-S" :: v :: rest => parse(rest, acc.copy(knownSites = Some(v)))
    case "-F" :: v :: rest => parse(rest, acc.copy(format = v))
    case Nil => acc
    case other => throw new IllegalArgumentException(s"unknown args: $other")
  }

  def run(spark: SparkSession, argv: Array[String]): Unit = {
    implicit val s: SparkSession = spark
    import s.implicits._
    val a = parse(argv.toList)
    require(a.input.nonEmpty && a.config.nonEmpty && a.out.nonEmpty,
      "usage: -I <input> -C <config.properties> -O <out> [-S <knownSites.parquet>] [-F sam|parquet]")

    val g = GraftSession.fromProperties(a.config, spark)
    // -S required iff BaseRecalibrator is enabled (the reference's check).
    require(
      a.knownSites.isDefined || !g.config.contains(CallerPipeline.BaseRecalibrator),
      "-S <known sites> is required when BaseRecalibrator is enabled")

    val reads = a.format match {
      case "sam" =>
        Formats.readSamLike(spark, a.input)
          .selectExpr("qname", "flag", "contig", "pos", "mapq",
            // SAM encodes per-base quality as phred+33 chars
            "transform(sequence(1, length(qual)), i -> ascii(substring(qual, i, 1)) - 33) AS qual",
            "named_struct('id','','lib','','pl','','pu','','sm','') AS read_group",
            "'ds1' AS dataset_id")
      case "parquet" => spark.read.parquet(a.input)
      case other => throw new IllegalArgumentException(s"unknown format $other")
    }

    val dict = reads.sparkSession.createDataFrame(
      Seq.empty[graft.domain.Model.ContigInfo])
    val known = a.knownSites
      .map(p => spark.read.parquet(p).as[KnownSite])
      .getOrElse(spark.emptyDataset[KnownSite])
    val targets = spark.emptyDataset[Interval]

    val pre = CallerPipeline.preprocess(reads, dict, targets, known, g.config)
    Sources.writePartitioned(pre, s"${a.out}/preprocessed", Seq("dataset_id"), Seq("contig", "pos"))
    CallerPipeline.discover(pre, g.config).foreach { variants =>
      Sources.writePartitioned(variants.toDF(), s"${a.out}/variants", Seq("dataset_id"), Seq("chrom", "pos"))
    }
  }

  def main(argv: Array[String]): Unit = {
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt)
    try run(spark, argv) finally spark.stop()
  }
}
