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
}
