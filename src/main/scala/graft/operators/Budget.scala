package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Integer budget apportionment (largest-remainder method): split a fixed
  * budget across keys proportionally to a per-row mass, EXACTLY — floor
  * quotas from exact long arithmetic, the leftover distributed one unit at
  * a time by largest remainder (ties: key ascending). The mixture planner
  * that turns "N training tokens, weighted by availability" into per-source
  * integer allocations summing exactly to N. Shared by q110 (whitespace
  * tokens) and q116 (BPE tokens) — ONE implementation, the mass expression
  * is the only degree of freedom.
  *
  * Scale shape: one corpus-scan aggregation reduces to a per-key frame (a
  * handful of rows), then every step — totals, quota ranking, leftover —
  * runs on that tiny frame (broadcast cross joins, one window). Output:
  * (keyCol, toks — the key's total mass, alloc_tokens).
  *
  * Overflow guard, the assert_true-rides-the-column pattern
  * (Profile.outlierCounts): budget·toks is exact only while
  * toks ≤ Long.MaxValue/budget; the guard is folded into `toks` itself
  * (null → +0 on success) so every consumer evaluates it — violations
  * raise, never wrap.
  */
object Budget {

  def apportion(docs: DataFrame, keyCol: String, mass: Column,
                budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    // materialized: the per-key frame feeds the totals, the quota ranking,
    // and the leftover agg — one corpus scan, three tiny consumers
    val perKey = graft.text.Dedup.materialize(docs
      .select(col(keyCol), mass.as("nt"))
      .groupBy(col(keyCol)).agg(sum(col("nt")).as("toks"))
      .withColumn("toks",
        col("toks") + coalesce(
          assert_true(
            col("toks") >= 0 && col("toks") <= lit(Long.MaxValue / budget),
            lit(s"Budget.apportion: per-$keyCol mass too large for exact " +
              "long apportionment — pre-scale the counts")).cast("long"),
          lit(0L))))
    val tot = perKey.agg(sum(col("toks")).as("tt"))
    val quotas = perKey.crossJoin(broadcast(tot))
      .withColumn("base", expr(s"(${budget}L * toks) div tt"))
      .withColumn("rem", expr(s"(${budget}L * toks) % tt"))
    val wRem = Window.orderBy(col("rem").desc, col(keyCol).asc)
    quotas
      .withColumn("rk", row_number().over(wRem))
      .crossJoin(broadcast(
        quotas.agg((lit(budget) - sum(col("base"))).as("left_over"))))
      .select(col(keyCol), col("toks"),
        (col("base") + when(col("rk") <= col("left_over"), 1L).otherwise(0L))
          .as("alloc_tokens"))
  }

  /** Materialize an [[apportion]]ment: SELECT the documents that fill each
    * key's allocation — docs taken in deterministic md5 order (seed
    * "sel:", the [[Sampling]] convention: reproducible, partition- and
    * retry-invariant) until the key's running token total would exceed its
    * allocation. Greedy prefix, not knapsack: a doc that would overflow
    * the remaining allocation is dropped along with everything after it —
    * the deterministic contract a re-runnable mixture needs (an
    * exactly-fill packing would be input-order sensitive).
    *
    * Scale shape: NO per-key window over the corpus (a key's docs can be
    * terabytes — one window partition per source would serialize into
    * single tasks). Instead the q74/q109 segmented-cumsum shape: docs
    * bucket by the first `prefixChars` hex chars of their md5 order key
    * (bucket order == selection order, the withDenseId property), each
    * (key, bucket) cumsums independently, and per-bucket carry-in offsets
    * come from a (keys × 16^prefixChars)-row frame — computed with one
    * tiny window and broadcast back.
    */
  def selectToBudget(docs: DataFrame, keyCol: String, idCol: String,
                     mass: Column, budget: Long,
                     prefixChars: Int = 2): DataFrame = {
    require(prefixChars >= 1 && prefixChars <= 8, "prefixChars must be in [1, 8]")
    val alloc = apportion(docs, keyCol, mass, budget)
      .select(col(keyCol), col("alloc_tokens"))
    val keyed = docs
      .select(col(idCol), col(keyCol), mass.cast("long").as("__nt"))
      .withColumn("__mk", md5(concat(lit("sel:"), col(idCol).cast("string"))))
      .withColumn("__mb", substring(col("__mk"), 1, prefixChars))
    val wIn = Window.partitionBy(col(keyCol), col("__mb"))
      .orderBy(col("__mk"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // the offsets frame is keys × 16^prefixChars rows — the documented
    // broadcast-carry shape, not a corpus-sized window
    val wSeg = Window.partitionBy(col(keyCol)).orderBy(col("__mb"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = keyed.groupBy(col(keyCol), col("__mb"))
      .agg(sum(col("__nt")).as("__bn"))
      .withColumn("__off", coalesce(sum(col("__bn")).over(wSeg), lit(0L)))
      .select(col(keyCol), col("__mb"), col("__off"))
    keyed
      .withColumn("__cin", sum(col("__nt")).over(wIn))
      .join(broadcast(offs), Seq(keyCol, "__mb"))
      .join(broadcast(alloc), Seq(keyCol))
      .filter(col("__off") + col("__cin") <= col("alloc_tokens"))
      .select(col(idCol), col(keyCol))
  }
}
