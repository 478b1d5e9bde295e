package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ANALYZE-style table profiling: per-column row/null/distinct counts and
  * min/max, the stats pass a pipeline runs before trusting a new 100 TB
  * drop (schema drift, null explosions, truncated loads all surface
  * here).
  */
object Profile {

  /** One row per profiled column: (column_name, n_rows, n_nulls,
    * n_distinct, min_s, max_s), min/max cast to string so the output
    * schema is uniform across column types.
    *
    * Two physical shapes, same answer (RelationalSpec gates both):
    *
    *  - MELT (types whose string rendering is injective — integrals,
    *    strings, dates, booleans): counts/min/max in one plain
    *    hash-aggregable pass, and the exact distincts from a melted
    *    (column, value-as-string) stream deduped by hash aggregation.
    *    This replaces the multi-countDistinct plan — one Expand (rows ×
    *    columns) followed by SORT aggregates over every profiled column
    *    as sort key — which ran as a single 3.1 s task at sf0.1 (r18
    *    tools.Attr; the sort dominates and the widened rows defeat
    *    partial aggregation). The melt's per-partition hash dedup ships
    *    only distinct (column, value) pairs into one exchange: no sort
    *    anywhere, partial aggregation intact (guide §2.3 "aggregate
    *    before you shuffle").
    *  - EXPAND (everything else — doubles/timestamps, where -0.0/NaN
    *    normalization makes string-distinct ≠ value-distinct): the
    *    original single-scan multi-countDistinct aggregation.
    *
    * Columns must be plain identifiers (no dots/backticks) — they are
    * spliced into a `stack` SQL expression.
    */
  def table(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    require(cols.forall(_.matches("[A-Za-z_][A-Za-z0-9_]*")),
      s"profile column names must be plain identifiers, got: ${cols.mkString(", ")}")
    import org.apache.spark.sql.types._
    val meltSafe = df.select(cols.map(col): _*).schema.fields.forall(_.dataType match {
      case ByteType | ShortType | IntegerType | LongType |
           StringType | DateType | BooleanType => true
      case _ => false
    })
    if (meltSafe) tableMelt(df, cols) else tableExpand(df, cols)
  }

  /** [[table]]'s melt shape: distinct counts via an injective cast to
    * string, so two hash aggregations replace the Expand + sort-agg
    * chain. Exactness: for integral/string/date/boolean columns the cast
    * is injective and total, so |distinct casts| = |distinct values|.
    */
  private def tableMelt(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = count(lit(1)).as("__n") +: cols.zipWithIndex.flatMap { case (c, i) =>
      Seq(count(col(c)).as(s"__c$i"),
        min(col(c)).cast("string").as(s"__mn$i"),
        max(col(c)).cast("string").as(s"__mx$i"))
    }
    val base = df.agg(aggs.head, aggs.tail: _*)
    val meltArgs = cols.map(c => s"'$c', CAST($c AS STRING)").mkString(", ")
    val dcounts = df
      .select(expr(s"stack(${cols.size}, $meltArgs) AS (__col, __v)"))
      .filter(col("__v").isNotNull)
      .distinct()
      .groupBy(col("__col")).agg(count(lit(1)).as("__d"))
    val dAggs = cols.zipWithIndex.map { case (c, i) =>
      max(when(col("__col") === c, col("__d"))).as(s"__d$i")
    }
    val dRow = dcounts.agg(dAggs.head, dAggs.tail: _*)
    val stackArgs = cols.zipWithIndex.map { case (c, i) =>
      s"'$c', __n, __n - __c$i, coalesce(__d$i, CAST(0 AS BIGINT)), __mn$i, __mx$i"
    }.mkString(", ")
    base.crossJoin(dRow)
      .select(expr(s"stack(${cols.size}, $stackArgs) AS " +
        "(column_name, n_rows, n_nulls, n_distinct, min_s, max_s)"))
  }

  /** [[table]]'s original single-scan shape: multi-countDistinct (one
    * Expand over the scan) — kept for column types whose string
    * rendering is not injective.
    */
  private def tableExpand(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = count(lit(1)).as("__n") +: cols.zipWithIndex.flatMap { case (c, i) =>
      Seq(count(col(c)).as(s"__c$i"), countDistinct(col(c)).as(s"__d$i"),
        min(col(c)).cast("string").as(s"__mn$i"),
        max(col(c)).cast("string").as(s"__mx$i"))
    }
    val stackArgs = cols.zipWithIndex.map { case (c, i) =>
      s"'$c', __n, __n - __c$i, __d$i, __mn$i, __mx$i"
    }.mkString(", ")
    df.agg(aggs.head, aggs.tail: _*)
      .select(expr(s"stack(${cols.size}, $stackArgs) AS " +
        "(column_name, n_rows, n_nulls, n_distinct, min_s, max_s)"))
  }

  /** The monitoring-path variant of [[table]]: `n_distinct_approx`
    * (HyperLogLog++, `rsd` relative standard deviation) in place of the
    * exact distinct count. The exact variant plans ONE Expand that
    * multiplies every scanned row by the column count before the shuffle —
    * the right cost for a hash-gated answer, the wrong one for a daily
    * drop-health check. Here every aggregate is constant-size, so the plan
    * is a plain partial/final agg: shuffle bytes independent of row count
    * (plan-asserted: no Expand — PlanSpec q115).
    *
    * The sketch value is deterministic for a given input but NOT
    * SQL-replayable (DuckDB's approx_count_distinct is a different
    * sketch), so alongside it the profile emits `n_distinct_lo` — the
    * count of OCCUPIED md5 buckets (first 3 hex chars of md5 of the value
    * string, K = 4096): an exact, engine-portable LOWER bound on the
    * distinct count (bucketing can only collide values, never invent
    * them), still Expand-free because it is one set-sized aggregate per
    * column (≤ K entries per partial buffer). The q115 gate hashes the
    * exact columns plus the sketch folded into a certified-bounds boolean
    * (approx within [0.7·lo, 1.3·non-null]; HLL error is ≪ the margins),
    * and RelationalSpec gates the rsd tolerance against the exact profile.
    *
    * `cast(value AS string)` feeds the bucket hash — portable for the
    * integer/string/date columns a profile runs on (same rendering in
    * both engines); profile doubles as exact cents first (see
    * extra.Queries determinism note), which [[table]] requires anyway.
    */
  def tableApprox(df: DataFrame, cols: Seq[String], rsd: Double = 0.05): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    require(cols.forall(_.matches("[A-Za-z_][A-Za-z0-9_]*")),
      s"profile column names must be plain identifiers, got: ${cols.mkString(", ")}")
    require(rsd > 0 && rsd < 0.4, s"rsd must be in (0, 0.4), got $rsd")
    val aggs = count(lit(1)).as("__n") +: cols.zipWithIndex.flatMap { case (c, i) =>
      Seq(count(col(c)).as(s"__c$i"),
        size(collect_set(substring(md5(col(c).cast("string")), 1, 3)))
          .cast("long").as(s"__lo$i"),
        approx_count_distinct(col(c), rsd).as(s"__d$i"),
        min(col(c)).cast("string").as(s"__mn$i"),
        max(col(c)).cast("string").as(s"__mx$i"))
    }
    val stackArgs = cols.zipWithIndex.map { case (c, i) =>
      s"'$c', __n, __n - __c$i, __lo$i, __d$i, __mn$i, __mx$i"
    }.mkString(", ")
    df.agg(aggs.head, aggs.tail: _*)
      .select(expr(s"stack(${cols.size}, $stackArgs) AS " +
        "(column_name, n_rows, n_nulls, n_distinct_lo, n_distinct_approx, min_s, max_s)"))
  }

  /** Fixed-width histogram over an exact integer measure: one row per
    * occupied bucket — (bucket, n, lo, hi), where `bucket` = value div
    * `width` and lo/hi are the exact extremes observed inside it.
    *
    * Scale shape: map-side bucket assignment + ONE partial/final hash
    * aggregation — each partition contributes at most n_buckets rows to
    * the shuffle regardless of data size, and the result is bounded by
    * the value range, not the row count. The distribution pass that sizes
    * quality filters (token-count cutoffs, price bands) before committing
    * to them.
    *
    * `value` must be an exact integer expression (floor doubles to
    * cents/milli-units first — see the determinism note in extra.Queries)
    * and NON-NEGATIVE: bucket ids use integral `div`, which truncates
    * toward zero, so negative values would straddle bucket 0 (DuckDB's
    * `//` floors; shifting the measure keeps both engines exact and
    * identical).
    */
  def histogram(df: DataFrame, value: org.apache.spark.sql.Column,
                width: Long): DataFrame = {
    require(width > 0, s"bucket width must be positive, got $width")
    // The non-negativity contract is ENFORCED, not just documented: the
    // guard is folded into __v itself (assert_true → null → +0 on success)
    // so the filter/agg that consumes __v keeps it alive — a standalone
    // guard column would be pruned by Catalyst and never fire (the
    // outlierCounts lesson). Nulls pass through (null buckets group
    // together in both engines).
    df.select(value.cast("long").as("__v0"))
      .select((col("__v0") + coalesce(
        assert_true(coalesce(col("__v0") >= 0, lit(true)),
          lit("histogram: values must be non-negative (truncating div would " +
            "straddle bucket 0; shift the measure first)")).cast("long"),
        lit(0L))).as("__v"))
      .groupBy(expr(s"__v div ${width}L").as("bucket"))
      .agg(count(lit(1)).as("n"), min(col("__v")).as("lo"),
        max(col("__v")).as("hi"))
  }

  /** Exact z-score outliers over a pre-aggregated counts frame: keeps the
    * rows whose count exceeds its group's mean by more than `sigmas`
    * standard deviations. The test is EXACT integer arithmetic — with H
    * buckets, total T and second moment S2 per group, `n > mean + kσ` is
    * evaluated as `nH > T && (nH − T)² > k²(H·S2 − T²)` (both sides scaled
    * by H²) — no double ever exists, so the flag is engine-exact and
    * immune to float-summation order (same rule as q94's cross-multiplied
    * mean). The anomaly pass a pipeline runs over ingest-rate or
    * per-source volume counts before trusting a drop.
    *
    * Overflow bounds are ENFORCED (division-form checks, themselves
    * overflow-free), folded into columns the filter consumes so Catalyst
    * cannot prune them: per group, counts must be non-negative,
    * |T| ≤ 3·10^9 (so T² fits a long), S2 ≤ Long.Max/(k²·H) (so k²·H·S2
    * fits), |T| ≤ Long.Max/H (so n·H ≤ T·H fits); per ROW, |nH − T| ≤
    * 3·10^9 (so its square fits). Violations raise, never wrap.
    *
    * Scale shape: `counts` is already reduced (buckets × groups, tiny);
    * per-group moments are one partial/final agg over it and join back on
    * the group key — broadcast when small (the groupCols.isEmpty global
    * case is a 1-row broadcast cross join). Nothing corpus-sized moves.
    */
  def outlierCounts(counts: DataFrame, groupCols: Seq[String], nCol: String,
                    sigmas: Int = 2): DataFrame = {
    require(sigmas >= 1, s"sigmas must be >= 1, got $sigmas")
    val n = col(nCol).cast("long")
    val grp = groupCols.map(col)
    val k2 = sigmas.toLong * sigmas
    val err = "outlierCounts: totals too large for exact long arithmetic — " +
      "pre-scale the counts"
    // group-level guard rides inside __t (assert_true → null → +0 when the
    // bounds hold), so any consumer of __t evaluates it
    val stats = counts.groupBy(grp: _*)
      .agg(count(lit(1)).as("__h"), sum(n).as("__t"), sum(n * n).as("__s2"),
        min(n).as("__mn"))
      .withColumn("__t",
        col("__t") + coalesce(
          assert_true(
            col("__mn") >= 0 && abs(col("__t")) <= lit(3000000000L) &&
              col("__s2") <= lit(Long.MaxValue / k2) / col("__h") &&
              abs(col("__t")) <= lit(Long.MaxValue) / col("__h"),
            lit(err)).cast("long"),
          lit(0L)))
      .drop("__mn")
    // the global (ungrouped) case is a 1-row stats frame: broadcast cross
    // join, NOT a using-columns join (there are no using columns — r6's
    // empty-frame construction silently returned zero rows)
    val joined =
      if (groupCols.isEmpty) counts.crossJoin(broadcast(stats))
      else counts.join(stats, groupCols)
    val diff = n * col("__h") - col("__t")
    // per-row guard: |nH − T| must fit squaring; a conjunct the filter
    // keeps (references live columns — not foldable, not prunable)
    val rowGuard = coalesce(
      assert_true(abs(diff) <= lit(3000000000L), lit(err)).cast("boolean"),
      lit(true))
    joined
      .filter(rowGuard && diff > 0 &&
        diff * diff > lit(k2) * (col("__h") * col("__s2") - col("__t") * col("__t")))
      .drop("__h", "__t", "__s2")
  }
}
