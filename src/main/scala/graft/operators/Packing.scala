package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing: lay tokenized documents out into fixed-length training
  * sequences — the step between a deduped corpus and a pretraining data
  * loader.
  *
  * Both packers shard the corpus by a stable hash of the doc id
  * ([[Sampling.hashBucket]]) and pack each shard independently in doc-id
  * order, so the layout is fully deterministic: independent of input
  * partitioning, task scheduling, and retries — re-running the pipeline
  * reproduces byte-identical shards, which is what makes training runs
  * resumable and ablations comparable. Shards are the unit of parallelism;
  * size `shards` so one shard's METADATA (id + token count, ~16 bytes/doc)
  * fits an executor — the text itself never flows through the packer, it
  * is joined back by doc_id afterwards.
  *
  * [[concatChunkPack]] is the GPT-style pretraining layout (concatenate
  * everything, cut every `maxTokens`, documents may span cuts): pure
  * window arithmetic — one shuffle on shard, codegen'd, SQL-expressible
  * (oracle-checked as q65). [[greedyPack]] is the no-split layout used for
  * SFT/packing-aware training (a doc never crosses a sequence boundary):
  * greedy sequential fill, inherently a scan with reset, so it runs as
  * `groupByKey(shard).flatMapGroups` — the documented escape hatch for
  * genuinely sequential per-group logic.
  */
object Packing {

  /** Token-count column guarded in the same pass (no extra scan): a null
    * or < 1 count would silently poison the running cumsum / invert a
    * doc's chunk range, so it fails the task with a clear message instead.
    */
  private def checkedTokens(nTokensCol: String): Column = {
    val n = col(nTokensCol).cast("long")
    when(n.isNull || n < 1,
      raise_error(concat(lit(s"$nTokensCol must be >= 1, got "),
        coalesce(n.cast("string"), lit("null")))))
      .otherwise(n)
  }

  /** Concatenate-then-chunk layout. Returns one row per doc:
    * (idCol, shard, tok_start — offset of the doc's first token in its
    * shard's token stream, first_seq/last_seq — the [maxTokens]-sized
    * chunks the doc touches). Token counts must be ≥ 1.
    */
  def concatChunkPack(df: DataFrame, idCol: String, nTokensCol: String,
                      maxTokens: Int, shards: Int): DataFrame = {
    require(maxTokens > 0 && shards > 0, "maxTokens and shards must be positive")
    val w = Window.partitionBy(col("shard")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(col(idCol),
        Sampling.hashBucket(col(idCol), shards, seed = "pack").as("shard"),
        checkedTokens(nTokensCol).as("__n"))
      .withColumn("__tok_end", sum(col("__n")).over(w))
      .withColumn("__tok_start", col("__tok_end") - col("__n"))
      // `div` (integral divide on longs), not floor(a / b): the latter
      // round-trips through double and loses exactness past 2^53 — a real
      // risk for cumulative token offsets at corpus scale.
      .select(col(idCol), col("shard"),
        col("__tok_start").as("tok_start"),
        expr(s"__tok_start div ${maxTokens}L").as("first_seq"),
        expr(s"(__tok_end - 1L) div ${maxTokens}L").as("last_seq"))
  }

  /** Deterministic dense-id assignment for string-keyed corpora (UUIDs,
    * URL hashes): every row gets a unique `outCol` long in 0..n-1, ordered
    * by (md5 of the id, id) — a data-deterministic total order, so the
    * mapping is reproducible across runs, partitionings, and retries,
    * which is what [[greedyPack]] and any id-ordered layout needs.
    *
    * Scale shape — NO global sort and NO driver collect of data: rows are
    * bucketed by the first `prefixChars` hex chars of the md5 key (the
    * bucket is a PREFIX, so bucket order == key order); each bucket ranks
    * independently (one hash-shuffle window over 16^prefixChars ~4096
    * groups); bucket offsets are an exclusive cumsum over the tiny
    * per-bucket count frame (≤4096 rows — broadcast back). Two shuffles
    * of metadata-width rows total, all buckets in parallel — the same
    * zipWithIndex shape, expressed declaratively so Catalyst keeps it
    * codegen'd.
    *
    * `idCol` values must be unique (duplicate keys would get arbitrary
    * relative order within their tie — the id→dense mapping wouldn't be a
    * function) and NON-NULL (checked in the same pass: a null key has a
    * null bucket, which would silently drop the row at the offsets join).
    */
  def withDenseId(df: DataFrame, idCol: String, outCol: String = "dense_id",
                  prefixChars: Int = 3): DataFrame = {
    require(prefixChars >= 1 && prefixChars <= 8, "prefixChars must be in [1, 8]")
    require(!df.columns.contains(outCol),
      s"input already has a column named $outCol")
    val checkedId = when(col(idCol).isNull,
      raise_error(lit(s"withDenseId: $idCol must be non-null")))
      .otherwise(col(idCol).cast("string"))
    val keyed = df
      .withColumn("__dk", md5(concat(lit("dense:"), checkedId)))
      .withColumn("__db", substring(col("__dk"), 1, prefixChars))
    val w = Window.partitionBy(col("__db")).orderBy(col("__dk"), col(idCol))
    val local = keyed.withColumn("__dr", row_number().over(w))
    val offsets = keyed.groupBy(col("__db")).agg(count(lit(1)).as("__dn"))
      .withColumn("__off",
        coalesce(sum(col("__dn")).over(Window.orderBy(col("__db"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__db"), col("__off"))
    local.join(broadcast(offsets), "__db")
      .withColumn(outCol, col("__off") + col("__dr") - 1)
      .drop("__dk", "__db", "__dr", "__off")
  }

  /** Whether `idCol` has an integral type the packers can order on
    * directly; non-integral (string UUID/URL) keys go through
    * [[withDenseId]] first. Shared by the greedyPack precondition and the
    * CLI's routing so the two can't drift.
    */
  def isIntegralId(df: DataFrame, idCol: String): Boolean =
    Set[org.apache.spark.sql.types.DataType](
      org.apache.spark.sql.types.LongType, org.apache.spark.sql.types.IntegerType,
      org.apache.spark.sql.types.ShortType, org.apache.spark.sql.types.ByteType)
      .contains(df.schema(idCol).dataType)

  /** Greedy no-split packing: docs fill a sequence in id order until the
    * next doc would overflow `maxTokens`, then a new sequence starts. A
    * doc longer than `maxTokens` gets a sequence of its own (callers
    * truncate or segment oversize docs upstream). Returns one row per doc:
    * (doc_id, shard, seq_id — per-shard counter, tok_offset — position
    * inside the sequence).
    */
  def greedyPack(df: DataFrame, idCol: String, nTokensCol: String,
                 maxTokens: Int, shards: Int): DataFrame = {
    require(maxTokens > 0 && shards > 0, "maxTokens and shards must be positive")
    // explicit contract, checked up front: a silent cast("long") on string
    // ids (UUIDs, URL hashes) would null every id instead of erroring
    require(isIntegralId(df, idCol),
      s"greedyPack needs an integral $idCol (got ${df.schema(idCol).dataType.simpleString}); " +
        "map string ids to longs first (e.g. withDenseId)")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(
        Sampling.hashBucket(col(idCol), shards, seed = "pack").as("shard"),
        col(idCol).cast("long").as("id"),
        checkedTokens(nTokensCol).as("n"))
      .as[(Int, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (shard, it) =>
        val docs = it.map { case (_, id, n) => (id, n) }.toArray
        java.util.Arrays.sort(docs, Ordering.by((d: (Long, Long)) => d._1))
        val out = Array.newBuilder[(Long, Int, Long, Long)]
        var seq = 0L
        var used = 0L
        for ((id, n) <- docs) {
          if (used > 0 && used + n > maxTokens) { seq += 1; used = 0 }
          out += ((id, shard, seq, used))
          used += n
        }
        out.result().iterator
      }
      .toDF("doc_id", "shard", "seq_id", "tok_offset")
  }

  /** Overlapping sliding-window chunks over a token array — the context-
    * window layout for long-document training and retrieval indexing
    * (each chunk carries `size - stride` tokens of its predecessor for
    * continuity). Chunk count is closed-form (1 + ⌈max(0, n−size)/stride⌉,
    * integer arithmetic only), so the whole op is ONE map-side explode per
    * doc: no shuffle, no window, no state — it scales with tokens scanned
    * and parallelizes per input split. The final chunk is clamped to the
    * doc end (it may be shorter than `size` but is never empty, and a doc
    * shorter than one chunk yields exactly one chunk).
    *
    * `tokensCol` is an array column; output keeps `idCol` plus
    * (chunk_idx, start_tok 1-based, end_tok inclusive, n_chunk_toks,
    * chunk: array slice).
    */
  def slidingChunks(df: DataFrame, idCol: String, tokensCol: String,
                    size: Int, stride: Int): DataFrame = {
    require(size > 0 && stride > 0 && stride <= size,
      s"need 0 < stride <= size, got size=$size stride=$stride")
    // Column arithmetic throughout — interpolating the raw tokensCol name
    // into an expr() string breaks on names needing backticks (spaces,
    // dots); `div` as a Column op is floorDiv on ints like the SQL form
    val n = org.apache.spark.sql.functions.size(col(tokensCol))
    val nChunks = when(n <= size, lit(1))
      .otherwise(((n - lit(size) + lit(stride - 1)) / lit(stride)).cast("int") + lit(1))
    df.filter(n > 0)
      .select(col(idCol), col(tokensCol).as("__toks"),
        explode(sequence(lit(0), (nChunks - 1).cast("int"))).as("chunk_idx"))
      .withColumn("start_tok", col("chunk_idx") * stride + 1)
      .withColumn("end_tok", least(col("start_tok") + lit(size - 1),
        org.apache.spark.sql.functions.size(col("__toks"))))
      .select(col(idCol), col("chunk_idx"), col("start_tok"), col("end_tok"),
        (col("end_tok") - col("start_tok") + 1).as("n_chunk_toks"),
        slice(col("__toks"), col("start_tok"),
          col("end_tok") - col("start_tok") + 1).as("chunk"))
  }
}
