package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines.
  *
  * Everything here hashes a stable row key instead of drawing random
  * numbers, which is THE sampling design at 100 TB:
  *   - **reproducible** — re-running the pipeline (or re-reading after a
  *     task retry) selects exactly the same rows; `df.sample()` draws from
  *     a per-partition RNG, so its output changes whenever partitioning,
  *     task retries, or Spark versions do;
  *   - **join-stable** — sampling two tables by the same key keeps them
  *     consistent (a sampled doc keeps its sampled embedding);
  *   - **engine-exact** — the hash domain is md5 hex (identical across
  *     Spark/DuckDB/any engine), so sampled sets are oracle-checkable and
  *     survive engine migrations;
  *   - **map-only** — a codegen'd filter; no shuffle, no driver state.
  *
  * The reference has no sampling stage (its unit of work is a whole exome);
  * this is part of the LLM-pipeline surface the brief adds on top.
  */
object Sampling {

  /** Stable bucket in [0, buckets) for a row key: the first 7 hex digits
    * (28 bits, non-negative) of md5(seed ":" key), mod buckets. Different
    * `seed`s give independent assignments — use one seed per decision
    * (sampling, sharding, train/val split) so the splits don't correlate.
    * Doubles as the shard assigner for training-shard writes
    * (`writePartitioned(df.withColumn("shard", hashBucket(...)), "shard")`).
    * A NULL key yields a NULL bucket — the sample filters drop such rows
    * (no bucket is "theirs"); coalesce the key upstream if null must
    * participate.
    */
  def hashBucket(key: Column, buckets: Int, seed: String = ""): Column =
    (conv(substring(md5(concat(lit(seed), lit(":"), key.cast("string"))), 1, 7), 16, 10)
      .cast("long") % buckets).cast("int")

  /** Keep rows whose bucket falls below `perMille` (rate = perMille/1000).
    * Rate is exact in expectation and deterministic per key.
    */
  def deterministicSample(df: DataFrame, key: Column, perMille: Int,
                          seed: String = ""): DataFrame = {
    require(perMille >= 0 && perMille <= 1000, "perMille must be in [0, 1000]")
    df.filter(hashBucket(key, 1000, seed) < perMille)
  }

  /** Deterministic train/val/test (or any n-way) split assignment:
    * `cuts` are (name, cumulative per-mille upper bound) in ascending
    * order ending at 1000 — e.g. Seq("train" -> 900, "val" -> 950,
    * "test" -> 1000). The decision is the same map-only md5-bucket as
    * [[deterministicSample]], so membership is reproducible across
    * runs, partitionings, and engines, and a re-ingested doc always
    * lands in the SAME split (the property that keeps eval sets stable
    * as the corpus grows — `df.randomSplit` gives neither). Widening a
    * split only moves the boundary: docs never swap between two splits
    * whose shared cut didn't move.
    */
  def assignSplit(key: Column, cuts: Seq[(String, Int)],
                  seed: String = "split"): Column = {
    require(cuts.nonEmpty && cuts.last._2 == 1000,
      s"cuts must end at 1000 per mille, got: $cuts")
    require(cuts.map(_._2) == cuts.map(_._2).sorted &&
        cuts.map(_._2).distinct.size == cuts.size && cuts.head._2 > 0,
      s"cuts must be strictly ascending positive per-mille bounds, got: $cuts")
    val b = hashBucket(key, 1000, seed)
    cuts.init.foldRight(lit(cuts.last._1)) { case ((name, hi), els) =>
      when(b < hi, lit(name)).otherwise(els)
    }
  }

  /** Per-ROW keep rates: `perMille` is a column, so each row carries its
    * own acceptance probability — importance sampling by a quality score,
    * length-proportional downsampling, per-domain rates joined in from a
    * side table. Same hash-bucket decision as [[deterministicSample]], so
    * it inherits every property that matters in a pipeline: deterministic
    * per key, reproducible across runs/partitionings/engines, map-only
    * (no shuffle), and NESTED — raising a row's rate can only ADD it, a
    * re-run with gentler weights is a superset.
    *
    * Rates clamp naturally: perMille ≥ 1000 always keeps, ≤ 0 always
    * drops, NULL drops (no bucket is "theirs" — same null contract as
    * hashBucket).
    */
  def weightedSample(df: DataFrame, key: Column, perMille: Column,
                     seed: String = ""): DataFrame =
    df.filter(hashBucket(key, 1000, seed) < perMille)

  /** Exactly-k-per-stratum sampling: the deterministic way to build a
    * balanced eval/calibration set ("5 docs per language"). Rows are
    * ranked inside each stratum by md5(seed ":" key) — a uniform, stable
    * shuffle order — and the first k win.
    *
    * Contract: `key` must be UNIQUE and NON-NULL (it is the row identity,
    * like every hash decision here) — duplicate keys tie on both sort
    * columns (the pick among them would be partition-order-dependent) and
    * null keys order differently across engines (Spark NULLS FIRST,
    * DuckDB NULLS LAST).
    *
    * Runs through the engine's own `TopKPerKey` operator (bounded
    * map-side heaps, only heap heads shuffle) rather than a
    * row_number window, which would shuffle + fully sort every stratum
    * to keep k rows — the difference between O(k·partitions) and
    * O(stratum) state at 100 TB.
    */
  def stratifiedK(df: DataFrame, key: Column, stratum: Column, k: Int,
                  seed: String = ""): DataFrame = {
    require(k > 0, "k must be positive")
    graft.operators.Relational.topKPerKey(df, Seq(stratum),
      Seq(md5(concat(lit(seed), lit(":"), key.cast("string"))).asc, key.asc), k)
  }

  /** Stratified mixture sampling: per-stratum keep rates, the way a
    * training mixture downweights over-represented sources/languages.
    * Strata absent from `ratesPerMille` get `defaultPerMille`. Same
    * hash-bucket decision as [[deterministicSample]], so a stratum's
    * sample at rate r is a SUBSET of its sample at rate r' > r (nested
    * samples — raising a mixture weight only adds rows, never churns
    * the ones already selected).
    */
  def mixtureSample(df: DataFrame, key: Column, stratum: Column,
                    ratesPerMille: Map[String, Int], defaultPerMille: Int = 1000,
                    seed: String = ""): DataFrame = {
    require((defaultPerMille +: ratesPerMille.values.toSeq).forall(r => r >= 0 && r <= 1000),
      "rates must be in [0, 1000]")
    val rate = ratesPerMille.foldLeft(lit(defaultPerMille): Column) {
      case (acc, (s, r)) => when(stratum === lit(s), lit(r)).otherwise(acc)
    }
    df.filter(hashBucket(key, 1000, seed) < rate)
  }

  /** Per-stratum TEMPERATURE rates at α = 1/2 — the mT5/XLM-R "flatten
    * the language distribution" move, expressed as head-downsampling:
    * post-sample stratum sizes ∝ √n_s (rate_s = 1000·√(n_min/n_s)‰, the
    * rarest stratum kept whole), so a 100×-larger stratum ends only 10×
    * larger instead of drowning the tail. Unlike [[mixtureSample]] the
    * rates are DERIVED from the corpus itself — one count aggregation —
    * not hand-configured. Determinism note: the rate uses floor over
    * IEEE sqrt/division of exact integer counts — correctly-rounded ops,
    * so any engine computes the identical per-mille (the q158 gate
    * hash-checks this against DuckDB).
    *
    * Returns (stratum, n_docs, rate_pm) — feed it to [[weightedSample]]
    * via a broadcast join, or use [[temperatureRebalance]] directly.
    */
  def temperatureRates(df: DataFrame, stratumCol: String): DataFrame = {
    val counts = df.groupBy(col(stratumCol)).agg(count(lit(1)).as("n_docs"))
    counts
      .crossJoin(broadcast(counts.agg(min(col("n_docs")).as("__n_min"))))
      .withColumn("rate_pm", least(lit(1000L),
        floor(lit(1000.0) * sqrt(col("__n_min").cast("double")) /
          sqrt(col("n_docs").cast("double"))).cast("long")))
      .drop("__n_min")
  }

  /** Apply [[temperatureRates]]: keep each stratum at its derived rate,
    * same nested hash-bucket decision as every sampler here (stable
    * membership as the corpus grows a stratum's rate downward only
    * removes rows, never churns survivors). Rates broadcast (stratum
    * count is tiny); the data side stays map-only.
    */
  def temperatureRebalance(df: DataFrame, key: Column, stratumCol: String,
                           seed: String = "temp"): DataFrame =
    df.join(broadcast(temperatureRates(df, stratumCol)
        .select(col(stratumCol), col("rate_pm"))), stratumCol)
      .filter(hashBucket(key, 1000, seed) < col("rate_pm"))
      .drop("rate_pm")
}
