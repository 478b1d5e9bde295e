package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scale-specific operators: skew mitigation and pipeline observability.
  *
  * The reference's skew answer is driver-side greedy bin-packing of contigs
  * by length (daas-apps `SparkCaller.java:190-243`, `BinPartitioner.java`);
  * the engine's first line is AQE (runtime skew splitting), and `saltedAgg`
  * is the explicit fallback for EXTREME aggregation skew AQE can't fix
  * (a single key exceeding one task's memory): salt → partial agg on
  * (key, salt) → final agg on key. Works for any algebraic aggregate
  * expressed as (partial, merge) pairs; exposed here for the common
  * count/sum case.
  */
object Scale {

  /** Two-phase salted aggregation: count + sums per key, immune to
    * single-hot-key skew. `salts` bounds the fan-out (keys × salts partial
    * groups); result is identical to the direct groupBy (integer/algebraic
    * merges are associative), including the output schema — the grouping
    * column keeps the caller's key name (resolved the same way Spark names
    * an unaliased select of `key`), not an internal alias.
    */
  def saltedAgg(df: DataFrame, key: Column, salts: Int, sums: (String, Column)*): DataFrame = {
    val keyName = df.select(key).schema.head.name
    val partialAggs = count(lit(1)).as("__cnt") +:
      sums.map { case (n, c) => sum(c).as(s"__sum_$n") }
    val finalAggs = sum(col("__cnt")).as("n_rows") +:
      sums.map { case (n, _) => sum(col(s"__sum_$n")).as(n) }
    df
      .withColumn("__salt", pmod(hash(monotonically_increasing_id()), lit(salts)))
      .groupBy(key.as("__key"), col("__salt"))
      .agg(partialAggs.head, partialAggs.tail: _*)
      .groupBy(col("__key").as(keyName))
      .agg(finalAggs.head, finalAggs.tail: _*)
  }

  /** O3's metrics side-channel (Picard MarkDuplicates writes a metrics
    * file, `DuplicateMarker.java:38-39`) done the Spark way: `observe`
    * accumulates named aggregates ON THE SAME PASS as the main query — no
    * second scan, readable from the returned observation after an action.
    */
  def observedDedupMark(
      df: DataFrame, groupKeys: Seq[Column], quality: Column, tieBreak: Seq[Column])
      : (DataFrame, org.apache.spark.sql.Observation) = {
    val obs = org.apache.spark.sql.Observation("dedup_metrics")
    val marked = Relational.markDuplicates(df, groupKeys, quality, tieBreak)
      .observe(obs,
        count(lit(1)).as("n_records"),
        sum(col("is_dup")).as("n_duplicates"))
    (marked, obs)
  }

  /** Sketch builders over a column — the approximate structures a 100 TB
    * pipeline uses where exact answers don't fit: Bloom filter (membership
    * pre-filter before an expensive join) and count-min sketch (heavy-hitter
    * estimation). Both are Spark-native `DataFrameStatFunctions` (single
    * pass, mergeable partials).
    */
  def bloomFilter(df: DataFrame, colName: String, expectedItems: Long, fpp: Double) =
    df.stat.bloomFilter(colName, expectedItems, fpp)

  def countMinSketch(df: DataFrame, colName: String, eps: Double, confidence: Double, seed: Int) =
    df.stat.countMinSketch(colName, eps, confidence, seed)

  /** Salted equi-join for EXTREME key skew: the fact side gets a
    * deterministic-per-row salt in [0, salts), the dim side is replicated
    * once per salt value, and the join key becomes (key, salt) — a single
    * hot key's rows now spread over `salts` reducers instead of one. Row
    * set is identical to the plain join (every fact row meets every dim
    * row of its key exactly once, whatever its salt). This is the explicit
    * form of what AQE's skew-join split does at runtime; use it when the
    * skew is known ahead of time or AQE's thresholds don't trigger (e.g.
    * one key is 90% of a 100 TB fact table). Cost: dim side ×salts.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String, salts: Int): DataFrame = {
    require(salts >= 1, "salts must be >= 1")
    val salted = fact.withColumn("__salt",
      pmod(hash(monotonically_increasing_id()), lit(salts)))
    val dimExp = dim.withColumn("__salt",
      explode(array((0 until salts).map(lit(_)): _*)))
    salted.join(dimExp, Seq(key, "__salt")).drop("__salt")
  }

  /** Bloom-prefiltered semi join — THE 100 TB shape for "keep fact rows
    * whose key exists in a large-ish dim": build a Bloom filter over the
    * dim keys (one pass, mergeable partials), broadcast the bits (MBs even
    * for 10⁸ keys — far under broadcast-join thresholds), drop
    * non-matching fact rows BEFORE the shuffle, then run the exact semi
    * join on the survivors. False positives only ⇒ the exact join makes
    * the result identical to a plain semi join (oracle-checkable), but the
    * shuffle moves only ~|matches| + fpp·|fact| rows instead of |fact|.
    * Spark's runtime row-level filtering does this automatically for some
    * shuffle joins; this is the explicit, always-on form. The membership
    * probe is Spark's own codegen'd [[org.apache.spark.sql.catalyst
    * .expressions.BloomFilterMightContain]] — the expression the optimizer
    * plans for its automatic runtime filters, reused here directly (via
    * graftx.Bridge) with the serialized filter as a binary literal, so the
    * probe stays inside whole-stage codegen instead of falling out to a
    * ScalaUDF call per row.
    */
  def bloomSemiJoin(
      fact: DataFrame, factKey: String, dim: DataFrame, dimKey: String,
      expectedItems: Long, fpp: Double): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    import org.apache.spark.sql.graftx.Bridge
    // the probe casts the fact key to long, so the dim filter must be
    // built over the same long domain: a string-keyed dim would insert
    // via putString while the probe hashes longs — near-every true match
    // silently dropped (and non-numeric strings cast to null -> all rows
    // filtered). Integral keys only, checked up front.
    require(Packing.isIntegralId(fact, factKey) && Packing.isIntegralId(dim, dimKey),
      s"bloomSemiJoin needs integral join keys (got " +
        s"$factKey: ${fact.schema(factKey).dataType.simpleString}, " +
        s"$dimKey: ${dim.schema(dimKey).dataType.simpleString}); " +
        "hash or dense-map string keys to longs first")
    val bf = dim.stat.bloomFilter(dimKey, expectedItems, fpp)
    // The serialized bits ride in the plan as a literal → shipped once per
    // stage via the task binary and garbage-collected with the query plan.
    // An explicit sparkContext.broadcast would pin them on every executor
    // for the session lifetime (nothing here could ever destroy() it).
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    val might = Bridge.column(BloomFilterMightContain(
      Literal(bos.toByteArray),
      Bridge.expression(fact.sparkSession, col(factKey).cast("long"))))
    fact
      .filter(might)
      .join(dim.select(col(dimKey).as(factKey)), Seq(factKey), "left_semi")
  }

  /** EXACT heavy hitters with BOUNDED intermediate state: every item
    * whose count c satisfies c·k ≥ n (n = non-null rows), with its exact
    * count — the hot-key census that sizes salts for [[saltedAgg]]/
    * [[saltedJoin]] and finds the stop-token tail a tokenizer vocab
    * should special-case.
    *
    * A plain groupBy-then-filter is exact but its partial-aggregation
    * state is DISTINCT-KEY sized — at 100 TB of tokens that hash map
    * spills long before the answer (which is ≤ k rows) needs any of it.
    * Two passes instead (Misra-Gries '82 / Agarwal et al. "Mergeable
    * Summaries", PODS'12):
    *
    *   1. candidates: per-partition Misra-Gries summaries of capacity
    *      `capFactor·k` via mapPartitions — state is cap entries per
    *      task, NEVER key-cardinality sized. An item absent from a
    *      partition's summary has partition count ≤ n_p/(cap+1), so an
    *      item absent from EVERY summary has global count ≤ n/(cap+1) <
    *      n/k (capFactor ≥ 2) — the candidate union (≤ partitions × cap
    *      rows, distinct-folded) is a PROVABLE superset of the true
    *      heavy hitters. No false negatives, by construction.
    *   2. recount: one broadcast semi join of the stream against the
    *      candidate set, groupBy over ≤ partitions×cap keys, exact
    *      threshold filter. False candidates die here, so the OUTPUT is
    *      exact and partitioning-independent even though the candidate
    *      set is not (spec-pinned: 1 vs 7 partitions, same answer).
    *
    * The decrement-all step is amortized O(1) per input row: every
    * decrement pays back one earlier increment. Nulls are excluded from
    * both the count and the census (document the denominator you gate
    * on). The summaries never visit the driver — they stay a DataFrame
    * and ship as a broadcast build side.
    */
  def heavyHitters(items: DataFrame, itemCol: String, k: Int,
                   capFactor: Int = 2): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(capFactor >= 2,
      s"capFactor must be >= 2 for the superset guarantee, got $capFactor")
    val spark = items.sparkSession
    import spark.implicits._
    val vals = items.select(col(itemCol).cast("string"))
      .filter(col(itemCol).isNotNull).as[String]
    val cap = capFactor * k
    val candidates = vals.mapPartitions { it =>
      val m = scala.collection.mutable.HashMap.empty[String, Long]
      it.foreach { v =>
        m.get(v) match {
          case Some(c)              => m(v) = c + 1
          case None if m.size < cap => m(v) = 1L
          case None =>
            val dead = List.newBuilder[String]
            m.foreach { case (key, c) =>
              if (c == 1L) dead += key else m(key) = c - 1 }
            dead.result().foreach(m.remove)
        }
      }
      m.keysIterator
    }.toDF(itemCol).distinct()
    // a third pass, but the cheapest kind: count() prunes to an empty
    // projection (columnar sources read only row counts), while folding n
    // into phase 1 would force caching/recomputing the summaries to read
    // them twice — costlier than the count it saves
    val n = vals.count()
    vals.toDF(itemCol)
      .join(broadcast(candidates), Seq(itemCol), "left_semi")
      .groupBy(col(itemCol))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * k >= lit(n))
  }
}
