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
}
