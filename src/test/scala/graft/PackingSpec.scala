package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Packing

class PackingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def corpus(n: Int) =
    (1 to n).map(i => (i.toLong, 1L + (i * 37) % 100)).toDF("doc_id", "n_tokens")

  test("greedyPack: every doc exactly once, no sequence overflows, offsets dense") {
    val df = corpus(500)
    val packed = Packing.greedyPack(df, "doc_id", "n_tokens", maxTokens = 128, shards = 4)
      .join(df, "doc_id")
    assert(packed.count() === 500)
    assert(packed.select(countDistinct("doc_id")).as[Long].head() === 500)
    // no sequence exceeds maxTokens (no doc here is oversize)
    val seqTotals = packed.groupBy("shard", "seq_id")
      .agg(sum("n_tokens").as("total"), min("tok_offset").as("min_off"))
    assert(seqTotals.filter(col("total") > 128).count() === 0)
    // every sequence starts at offset 0
    assert(seqTotals.filter(col("min_off") =!= 0).count() === 0)
    // offsets are the running sum of earlier docs in the same sequence
    val bad = packed.as[(Long, Int, Long, Long, Long)].collect()
      .groupBy(r => (r._2, r._3)).values.exists { seq =>
        val sorted = seq.sortBy(_._1)
        sorted.scanLeft(0L)(_ + _._5).zip(sorted.map(_._4)).exists { case (exp, got) => exp != got }
      }
    assert(!bad, "tok_offset must equal the sum of preceding doc lengths in its sequence")
  }

  test("greedyPack: deterministic under repartitioning") {
    val df = corpus(300)
    val a = Packing.greedyPack(df, "doc_id", "n_tokens", 128, 4)
      .as[(Long, Int, Long, Long)].collect().toSet
    val b = Packing.greedyPack(df.repartition(13), "doc_id", "n_tokens", 128, 4)
      .as[(Long, Int, Long, Long)].collect().toSet
    assert(a === b)
  }

  test("greedyPack: oversize doc gets its own sequence, stream continues") {
    val df = Seq((1L, 50L), (2L, 300L), (3L, 60L), (4L, 60L))
      .toDF("doc_id", "n_tokens")
    val out = Packing.greedyPack(df, "doc_id", "n_tokens", maxTokens = 128, shards = 1)
      .as[(Long, Int, Long, Long)].collect().sortBy(_._1)
    assert(out.map(r => (r._1, r._3, r._4)).toSeq ===
      Seq((1L, 0L, 0L), (2L, 1L, 0L), (3L, 2L, 0L), (4L, 2L, 60L)))
  }

  test("packing shards are decorrelated from sampling decisions (own hash seed)") {
    // with a shared seed, a perMille=4 sample keeps keys with H%1000 < 4,
    // and since 8 | 1000 those keys can only land in shards 0-3 — half the
    // shards would be empty. The packers' own "pack" seed breaks the link.
    val df = corpus(20000)
    val sampled = graft.operators.Sampling.deterministicSample(df, col("doc_id"), 4)
    val shards = Packing.greedyPack(sampled, "doc_id", "n_tokens", 128, 8)
      .select("shard").distinct().as[Int].collect().toSet
    assert(shards === (0 until 8).toSet,
      s"a thin sample must still spread over every shard, got $shards")
  }

  test("greedyPack rejects non-integral id columns instead of nulling them") {
    val df = Seq(("doc-a", 10L), ("doc-b", 20L)).toDF("doc_id", "n_tokens")
    val e = intercept[IllegalArgumentException] {
      Packing.greedyPack(df, "doc_id", "n_tokens", 128, 2)
    }
    assert(e.getMessage.contains("integral"))
  }

  test("withDenseId: dense 0..n-1, deterministic, partitioning-invariant") {
    val df = (1 to 700).map(i => (s"url-$i", i.toLong)).toDF("doc_key", "n_tokens")
    val a = Packing.withDenseId(df, "doc_key")
      .select("doc_key", "dense_id").as[(String, Long)].collect()
    // a bijection onto 0..n-1
    assert(a.map(_._2).sorted.toSeq === (0L until 700L))
    // invariant to input partitioning AND bucket width
    val b = Packing.withDenseId(df.repartition(17), "doc_key")
      .select("doc_key", "dense_id").as[(String, Long)].collect()
    assert(a.toSet === b.toSet)
    val c = Packing.withDenseId(df, "doc_key", prefixChars = 1)
      .select("doc_key", "dense_id").as[(String, Long)].collect()
    assert(a.toSet === c.toSet,
      "bucket prefix width must not change the assignment (prefix order == key order)")
  }

  test("withDenseId feeds greedyPack: string-keyed corpus packs end-to-end") {
    val df = (1 to 300).map(i => (s"uuid-${i * 7}", 1L + (i * 37) % 100))
      .toDF("doc_key", "n_tokens")
    val withIds = Packing.withDenseId(df, "doc_key")
    val packed = Packing.greedyPack(withIds, "dense_id", "n_tokens", 128, 4)
    assert(packed.count() === 300)
    // join back to the string keys: exactly one packed row per input doc
    val joined = packed.join(withIds, packed("doc_id") === withIds("dense_id"))
    assert(joined.select(countDistinct("doc_key")).as[Long].head() === 300)
  }

  test("withDenseId rejects a pre-existing output column") {
    val df = Seq(("a", 1L)).toDF("doc_key", "dense_id")
    val e = intercept[IllegalArgumentException] {
      Packing.withDenseId(df, "doc_key")
    }
    assert(e.getMessage.contains("dense_id"))
  }

  test("withDenseId fails loudly on null ids instead of dropping the row") {
    val df = Seq(Some("a"), None, Some("c")).toDF("doc_key")
    val e = intercept[Exception] {
      Packing.withDenseId(df, "doc_key").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("non-null")))
  }

  test("q122 snake sharding: rank is a permutation, shards count- and token-balanced") {
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$dir/documents.parquet").exists())
    val r = SparkEntry.queries("q122_shard_snake")(spark, dir)
      .select("doc_id", "n_toks", "rank", "shard")
      .as[(Long, Int, Long, Int)].collect()
    val n = r.length
    assert(r.map(_._3).sorted.toSeq === (1L to n).toSeq,
      "segmented rank must be the exact global permutation")
    assert(r.forall(x => x._4 >= 0 && x._4 < 8))
    val byShard = r.groupBy(_._4)
    val counts = byShard.view.mapValues(_.length).values
    assert(counts.max - counts.min <= 2,
      s"snake doc counts must stay within one 2S block: ${counts.toSeq.sorted}")
    val loads = byShard.view.mapValues(_.map(_._2.toLong).sum).values
    val maxDoc = r.map(_._2).max
    assert(loads.max - loads.min <= 2L * maxDoc,
      s"snake token spread must be bounded by the largest doc, got " +
        s"${loads.max - loads.min} vs maxDoc $maxDoc")
  }

  test("slidingChunks: exact starts/overlap, clamped tail, short doc = one chunk") {
    val df = Seq(
      (1L, (1 to 10).map(_.toString)),  // 10 toks, size 4 stride 3 → 3 chunks
      (2L, Seq("a", "b")),              // shorter than size → one chunk
      (3L, (1 to 4).map(_.toString)))   // exactly size → one chunk
      .toDF("doc_id", "ws")
    val r = Packing.slidingChunks(df, "doc_id", "ws", size = 4, stride = 3)
      .select("doc_id", "chunk_idx", "start_tok", "end_tok", "chunk")
      .as[(Long, Int, Int, Int, Seq[String])].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    assert(r(1L).map(x => (x._3, x._4)) === Seq((1, 4), (4, 7), (7, 10)),
      "chunks start every stride and the tail clamps to the doc end")
    assert(r(1L)(1)._5 === Seq("4", "5", "6", "7"))
    // neighbor overlap is exactly size - stride tokens
    assert(r(1L)(0)._5.drop(3) === r(1L)(1)._5.take(1))
    assert(r(2L).map(x => (x._3, x._4, x._5)) === Seq((1, 2, Seq("a", "b"))))
    assert(r(3L).map(x => (x._3, x._4)) === Seq((1, 4)))
    // every token position is covered
    assert(r(1L).flatMap(x => x._3 to x._4).distinct.sorted === (1 to 10).toSeq)
  }

  test("slidingChunks rejects stride wider than the window") {
    val df = Seq((1L, Seq("a"))).toDF("doc_id", "ws")
    intercept[IllegalArgumentException] {
      Packing.slidingChunks(df, "doc_id", "ws", size = 4, stride = 5)
    }
  }

  test("packers fail loudly on null or non-positive token counts") {
    val df = Seq((1L, 10L), (2L, 0L)).toDF("doc_id", "n_tokens")
    val e = intercept[Exception] {
      Packing.concatChunkPack(df, "doc_id", "n_tokens", 128, 2).collect()
    }
    assert(e.getMessage.contains("must be >= 1") ||
      e.getCause != null && e.getCause.getMessage.contains("must be >= 1"))
  }

  test("concatChunkPack: offsets are contiguous per shard and chunk ids consistent") {
    val df = corpus(400)
    val out = Packing.concatChunkPack(df, "doc_id", "n_tokens", maxTokens = 256, shards = 4)
      .join(df, "doc_id")
    // per shard: tok_start of the id-ordered docs is the exclusive cumsum
    val rows = out.select("doc_id", "shard", "tok_start", "n_tokens")
      .as[(Long, Int, Long, Long)].collect()
    rows.groupBy(_._2).values.foreach { shard =>
      val sorted = shard.sortBy(_._1)
      val expected = sorted.scanLeft(0L)(_ + _._4)
      sorted.map(_._3).zip(expected).foreach { case (got, exp) => assert(got === exp) }
    }
    // first/last chunk ids follow from tok_start and length
    val bad = out.filter(
      col("first_seq") =!= floor(col("tok_start") / 256) ||
      col("last_seq") =!= floor((col("tok_start") + col("n_tokens") - 1) / 256))
    assert(bad.count() === 0)
  }
}
