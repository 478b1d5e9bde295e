package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.graftx.Bridge

/** The Bridge's ONE reflective read — `CacheManager.cachedData` is
  * object-private, so `Bridge.cachedPlans` reaches it by method name. A
  * Spark upgrade renaming or retyping that member must fail HERE, in
  * `sbt test`, with a message naming the recovery — not at a CLI user's
  * spine cleanup as a NoSuchMethodException three stages deep (r15
  * VERDICT finding #5).
  */
class BridgeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("Spark-upgrade canary: the CacheManager reflective read resolves and counts") {
    val before =
      try Bridge.numCachedEntries(spark)
      catch {
        case e: ReflectiveOperationException => fail(
          "Bridge.cachedPlans can no longer read CacheManager.cachedData " +
            s"reflectively (${e.getClass.getSimpleName}: ${e.getMessage}) — " +
            "this Spark version renamed/retyped it; update the Bridge's " +
            "reflective read (and re-check releaseCacheScopeDelta) before " +
            "anything else: every scoped cache cleanup routes through it")
      }
    val df = spark.range(64).toDF("n").cache()
    try {
      df.count()
      assert(Bridge.numCachedEntries(spark) === before + 1,
        "the reflective listing must see a freshly cached frame")
      assert(Bridge.isCached(df))
      // and the delta-release built on it still releases exactly the new entry
      val snap0 = Bridge.cacheScopeSnapshot(spark)
      val extra = spark.range(8).toDF("m").cache()
      extra.count()
      assert(Bridge.numCachedEntries(spark) === before + 2)
      Bridge.releaseCacheScopeDelta(spark, snap0)
      assert(Bridge.numCachedEntries(spark) === before + 1,
        "delta release must drop the post-snapshot entry and keep the rest")
      assert(Bridge.isCached(df) && !Bridge.isCached(extra))
    } finally df.unpersist(true)
  }
}
