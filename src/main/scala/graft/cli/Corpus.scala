package graft.cli

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Sessions
import graft.operators.{Packing, Sampling}
import graft.sources.Sources
import graft.text.{Dedup, TextOps}

/** Corpus-pipeline CLI: the training-data counterpart of [[Main]] — one
  * spark-submit surface running the LLM-pipeline stages (quality filter →
  * decontaminate → near-dup dedup → sample → pack → sharded write) as ONE
  * lazy plan per stage chain, over a parquet corpus with (doc_id, text,
  * ...) columns.
  *
  * Usage:
  *   spark-submit --class graft.cli.Corpus graft.jar \
  *     -I /data/corpus.parquet -O /out \
  *     [--benchmark /data/eval.parquet]   drop docs sharing a 3-gram with it
  *     [--dedup]                          MinHash-LSH near-dup removal (keep smallest id)
  *     [--min-tokens n] [--max-tokens n]  quality bounds (default 1/2^31)
  *     [--sample perMille]                deterministic hash sample
  *     [--pack maxTokens]                 greedy no-split packing annotation
  *     [--shards n]                       output shards (default 16)
  *
  * Every decision is deterministic (md5 hash buckets, integer thresholds,
  * smallest-id survivorship), so re-runs produce identical corpora —
  * the property that makes training data auditable. Stages compose
  * lazily; nothing is collected at the driver.
  */
object Corpus {

  final case class Args(
      input: String = "", out: String = "", benchmark: Option[String] = None,
      dedup: Boolean = false, minTokens: Int = 1, maxTokens: Int = Int.MaxValue,
      samplePerMille: Option[Int] = None, packTokens: Option[Int] = None,
      shards: Int = 16)

  private def parse(argv: List[String], acc: Args = Args()): Args = argv match {
    case "-I" :: v :: rest            => parse(rest, acc.copy(input = v))
    case "-O" :: v :: rest            => parse(rest, acc.copy(out = v))
    case "--benchmark" :: v :: rest   => parse(rest, acc.copy(benchmark = Some(v)))
    case "--dedup" :: rest            => parse(rest, acc.copy(dedup = true))
    case "--min-tokens" :: v :: rest  => parse(rest, acc.copy(minTokens = v.toInt))
    case "--max-tokens" :: v :: rest  => parse(rest, acc.copy(maxTokens = v.toInt))
    case "--sample" :: v :: rest      => parse(rest, acc.copy(samplePerMille = Some(v.toInt)))
    case "--pack" :: v :: rest        => parse(rest, acc.copy(packTokens = Some(v.toInt)))
    case "--shards" :: v :: rest      => parse(rest, acc.copy(shards = v.toInt))
    case Nil                          => acc
    case other => throw new IllegalArgumentException(s"unknown args: $other")
  }

  /** The composed pipeline, exposed for tests: returns the final corpus
    * (plus packing columns when --pack is set). Frames persisted along the
    * way are returned by [[pipelineWithHandles]] so [[run]] can unpersist
    * them after the write — callers of this convenience form in a
    * long-lived session should prefer that variant.
    */
  def pipeline(spark: SparkSession, a: Args): DataFrame =
    pipelineWithHandles(spark, a)._1

  /** [[pipeline]] plus the frames it persisted (unpersist after the final
    * action or the cached corpus copies outlive the run).
    */
  def pipelineWithHandles(spark: SparkSession, a: Args): (DataFrame, Seq[DataFrame]) = {
    require(a.shards > 0, "--shards must be positive")
    val cached = Seq.newBuilder[DataFrame]
    var corpus = spark.read.parquet(a.input)
      .withColumn("__n_tokens", size(TextOps.words(col("text"))))
      .filter(col("__n_tokens") >= a.minTokens && col("__n_tokens") <= a.maxTokens)

    a.benchmark.foreach { b =>
      corpus = Dedup.decontaminate(corpus, spark.read.parquet(b))
    }
    if (a.dedup) {
      // the corpus subtree feeds BOTH the LSH pair mining and the anti
      // join (and later the pack/join pair) — persist it or the scan +
      // filter + decontaminate chain recomputes once per reference
      corpus = corpus.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      cached += corpus
      // no broadcast hint: losers can be corpus-scale on duplicate-heavy
      // crawls; AQE picks broadcast when they happen to be small
      val losers = Dedup.nearDupPairs(corpus)
        .select(col("doc_b").as("doc_id")).distinct()
      corpus = corpus.join(losers, Seq("doc_id"), "left_anti")
    }
    a.samplePerMille.foreach { pm =>
      corpus = Sampling.deterministicSample(corpus, col("doc_id"), pm)
    }
    val out = a.packTokens match {
      case Some(max) =>
        // corpus feeds both the packer and the join-back — persist here too
        corpus = corpus.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        cached += corpus
        val packed = Packing.greedyPack(
          corpus.select(col("doc_id"), col("__n_tokens")),
          "doc_id", "__n_tokens", max, a.shards)
        corpus.join(packed, "doc_id")
      case None =>
        corpus.withColumn("shard",
          Sampling.hashBucket(col("doc_id"), a.shards, seed = "pack"))
    }
    (out.drop("__n_tokens"), cached.result())
  }

  def run(spark: SparkSession, argv: Array[String]): Unit = {
    val a = parse(argv.toList)
    require(a.input.nonEmpty && a.out.nonEmpty,
      "usage: -I <corpus.parquet> -O <out> [--benchmark p] [--dedup] " +
        "[--min-tokens n] [--max-tokens n] [--sample perMille] [--pack maxTokens] [--shards n]")
    val (out, cached) = pipelineWithHandles(spark, a)
    try Sources.writePartitioned(out, a.out, Seq("shard"), Seq("doc_id"))
    finally cached.foreach(_.unpersist())
  }

  def main(argv: Array[String]): Unit = {
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt)
    try run(spark, argv) finally spark.stop()
  }
}
