package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Core relational operators of the engine, re-expressing the reference's
  * file-at-a-time stages (daas-apps `SparkCaller.java`) as record-level,
  * Catalyst-optimizable DataFrame transforms.
  *
  * Everything here is lazy and codegen-friendly: no UDFs, no collect(), no
  * per-stage materialization barriers (the reference ends every stage in
  * `collect()`, `SparkCaller.java:98,111,154,172,260,310` — the single
  * biggest scale limiter we remove).
  */
object Relational {

  /** O1 SAMToSortedBAM analog: global coordinate sort.
    * Spark plans a range-partitioned sort (sampled range exchange + local
    * sort) — the distributed equivalent of Picard SortSam
    * (`preprocessing/SAMToSortedBAM.java:11-31`).
    */
  def globalSort(df: DataFrame, keys: Column*): DataFrame = df.orderBy(keys: _*)

  /** O1 variant preserving partitioning: sort within partitions only —
    * the "already partitioned by contig, just order locally" shape that at
    * 100 TB avoids a full range shuffle when downstream only needs
    * per-partition order (e.g. partitioned writes).
    */
  def sortWithinPartitions(df: DataFrame, partKey: Column, keys: Column*): DataFrame =
    df.repartition(partKey).sortWithinPartitions(keys: _*)

  /** Total-order top-k (absent in the reference; SURVEY §2.10 "Limits").
    * `orderBy.limit` plans TakeOrderedAndProject: per-partition heap top-k +
    * single gather of k rows — no global sort, scale-safe.
    * Callers must pass a TOTAL ordering or results are nondeterministic.
    */
  def topK(df: DataFrame, k: Int, keys: Column*): DataFrame =
    df.orderBy(keys: _*).limit(k)

  /** O3 DuplicateMarker analog (Picard MarkDuplicates,
    * `preprocessing/DuplicateMarker.java:14-54`): within each duplicate group
    * keep the best row (highest `quality`), FLAG — not drop — the rest.
    * The window ordering must be total: we append `tieBreak` so permuting
    * input order can never change the survivor (SURVEY §7.3.1).
    */
  def markDuplicates(
      df: DataFrame,
      groupKeys: Seq[Column],
      quality: Column,
      tieBreak: Seq[Column],
      flagCol: String = "is_dup"): DataFrame = {
    val w = Window
      .partitionBy(groupKeys: _*)
      .orderBy(quality.desc +: tieBreak.map(_.asc): _*)
    df.withColumn(flagCol, when(row_number().over(w) > 1, 1).otherwise(0))
  }

  /** Exact deduplication: hash-aggregate distinct on the key columns.
    * Partial (map-side) aggregation halves the shuffle before the exchange.
    */
  def dedupExact(df: DataFrame, keys: Seq[String]): DataFrame =
    df.select(keys.map(col): _*).distinct()

  /** O5/O8 analog: hash aggregation with map-side partial aggregation
    * (GATK BaseRecalibrator's covariate group-by,
    * `preprocessing/BQSRTargetGenerator.java:19-44`). Catalyst plans
    * HashAggregate(partial) → Exchange → HashAggregate(final) automatically.
    */
  def hashAgg(df: DataFrame, keys: Seq[Column], aggs: Seq[Column]): DataFrame =
    df.groupBy(keys: _*).agg(aggs.head, aggs.tail: _*)

  /** O6/O9 analog: broadcast-hash lookup join — the reference collects the
    * small side to a driver HashMap and ships it in closures
    * (`SparkCaller.java:276-283`); we declare `broadcast()` and let Spark
    * ship it once per executor, no driver barrier.
    */
  def broadcastJoin(fact: DataFrame, dim: DataFrame, keys: Seq[String]): DataFrame =
    fact.join(broadcast(dim), keys)

  /** O8's known-sites exclusion: broadcast ANTI join
    * (`BQSRTargetGenerator.java` `-knownSites` semantics).
    */
  def antiJoin(left: DataFrame, right: DataFrame, keys: Seq[String]): DataFrame =
    left.join(broadcast(right), keys, "left_anti")

  /** EXISTS-style semi join, broadcast when the right side is dimension-sized. */
  def semiJoin(left: DataFrame, right: DataFrame, keys: Seq[String]): DataFrame =
    left.join(broadcast(right), keys, "left_semi")

  /** O14/O15 analog: gather = sorted union of per-slice results
    * (samtools merge / Picard MergeVcfs, `utils/BAMMerger.java`,
    * `utils/VCFMerger.java`). Spark's union is metadata-only; the final
    * orderBy is the k-way merge.
    */
  def sortedUnion(parts: Seq[DataFrame], keys: Column*): DataFrame =
    parts.reduce(_.unionByName(_)).orderBy(keys: _*)

  /** O10–O12 analog: partition-pruned scan. With parquet row-group stats the
    * equality predicate is pushed to the scan (PushedFilters), replacing the
    * reference's .bai-index `samtools view <contig>` extraction
    * (`utils/SAMSplitter.java:25-32`).
    */
  def prunedScan(df: DataFrame, key: Column, value: Any, projection: Seq[Column]): DataFrame =
    df.filter(key === lit(value)).select(projection: _*)

  /** Per-key top-k through the engine's own physical operator
    * ([[graft.plans.TopKPerKeyNode]]): bounded heaps map-side, then a
    * shuffle of only the per-partition heads — the scalable form of
    * `row_number() OVER (PARTITION BY keys ORDER BY order) <= k`, which
    * must shuffle + fully sort every row. `order` columns may carry
    * `.desc`/`.asc` and should form a total order within a key for
    * deterministic output. Requires a session built with GraftExtensions.
    */
  def topKPerKey(df: DataFrame, keys: Seq[Column], order: Seq[Column], k: Int): DataFrame = {
    import org.apache.spark.sql.graftx.Bridge
    import org.apache.spark.sql.catalyst.expressions.{Ascending, SortOrder}
    val spark = df.sparkSession
    val sortOrders = order.map(c => Bridge.expression(spark, c) match {
      case so: SortOrder => so
      case e => SortOrder(e, Ascending)
    })
    Bridge.ofRows(spark,
      graft.plans.TopKPerKeyNode(
        keys.map(Bridge.expression(spark, _)), sortOrders, k, Bridge.logicalPlan(df)))
  }
}
