package org.apache.spark.sql.graftx

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{SparkSession => ClassicSession, Dataset => ClassicDataset}

/** Narrow bridge into `private[sql]` constructors that Spark does not expose
  * publicly but that any library adding its own logical/physical operators
  * needs: build a DataFrame from a custom [[LogicalPlan]] and convert a
  * public [[Column]] to its Catalyst [[Expression]]. Living under
  * `org.apache.spark.sql` is the established pattern for Spark-native
  * extension libraries (the alternative — reflection — trades compile-time
  * checking for nothing). Everything else in graft uses public APIs only.
  */
object Bridge {

  /** DataFrame over a (possibly unresolved) logical plan; runs the full
    * analyzer/optimizer on first action, so custom nodes get standard
    * expression resolution against their children.
    */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    ClassicDataset.ofRows(spark.asInstanceOf[ClassicSession], plan)

  /** Catalyst expression backing a public Column, fully converted through
    * the session's ColumnNode converter (ExpressionUtils.expression alone
    * returns a lazy non-serializable wrapper).
    */
  def expression(spark: SparkSession, c: Column): Expression =
    spark.asInstanceOf[ClassicSession].expression(c)

  /** The analyzed logical plan of a DataFrame (stable child for a custom
    * logical node built on top of an existing frame).
    */
  def logicalPlan(df: DataFrame): LogicalPlan =
    df.asInstanceOf[ClassicDataset[_]].queryExecution.analyzed

  /** Public Column over a raw Catalyst expression — the inverse of
    * [[expression]]. Needed to use internal codegen'd expressions Spark
    * ships but doesn't expose as functions (e.g.
    * `BloomFilterMightContain`, which otherwise exists only inside the
    * optimizer's runtime-filter rewrite).
    */
  def column(e: Expression): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)

  /** Everything the session holds cached at a moment: the CacheManager's
    * entry plans (by object identity) + the context's persistent RDD
    * ids. The "release only what I created" half of a scoped cleanup —
    * a CLI command that blanket-called `catalog.clearCache()` +
    * unpersist-all would clear OTHER sessions' cached plans on the
    * shared context and kill unrelated localCheckpoint blocks (frames
    * depending on an unpersisted checkpoint fail with missing blocks,
    * they don't recompute).
    */
  final case class CacheScope(plans: Seq[LogicalPlan], rddIds: Set[Int])

  def cacheScopeSnapshot(spark: SparkSession): CacheScope = {
    val cs = spark.asInstanceOf[ClassicSession]
    CacheScope(cachedPlans(cs), cs.sparkContext.getPersistentRDDs.keySet.toSet)
  }

  /** Release exactly what appeared since `snap`: uncache the NEW
    * CacheManager entries (cascade=false — dependents of pre-existing
    * entries are not ours to drop), then unpersist the remaining NEW
    * persistent RDDs (localCheckpoint blocks the uncache didn't own).
    * Pre-existing entries and RDDs are untouched, so a long-lived
    * in-session caller keeps its own caches across the call.
    */
  def releaseCacheScopeDelta(spark: SparkSession, snap: CacheScope): Unit = {
    val cs = spark.asInstanceOf[ClassicSession]
    cachedPlans(cs)
      .filterNot(p => snap.plans.exists(_ eq p))
      .foreach(p => cs.sharedState.cacheManager
        .uncacheQuery(cs, p, cascade = false))
    cs.sparkContext.getPersistentRDDs
      .filterNot { case (id, _) => snap.rddIds.contains(id) }
      .values.foreach(_.unpersist(false))
  }

  /** Number of CacheManager entries — `numCachedEntries` itself is
    * `private[sql]`; exposed for delta asserts in tests.
    */
  def numCachedEntries(spark: SparkSession): Int =
    cachedPlans(spark.asInstanceOf[ClassicSession]).size

  /** Whether this exact frame has a live CacheManager entry. */
  def isCached(df: DataFrame): Boolean = {
    val cs = df.sparkSession.asInstanceOf[ClassicSession]
    cs.sharedState.cacheManager
      .lookupCachedData(df.asInstanceOf[ClassicDataset[_]]).nonEmpty
  }

  /** The CacheManager's entry plans. `cachedData` is object-private (not
    * even `private[sql]`), so this is the Bridge's one reflective read —
    * a listing, never a mutation; mutations go through the public
    * `uncacheQuery`.
    */
  private def cachedPlans(cs: ClassicSession): Seq[LogicalPlan] = {
    val cm = cs.sharedState.cacheManager
    val m = cm.getClass.getDeclaredMethod("cachedData")
    m.setAccessible(true)
    m.invoke(cm).asInstanceOf[Seq[_]]
      .map(_.asInstanceOf[org.apache.spark.sql.execution.CachedData].plan)
  }
}
