package graft.extra

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.multimodal.Binary
import graft.operators.{Analytic, Audit, Events, Graph, Pipe, Profile, Relational, Scale}

/** Event-time analytics, grouping-set/pivot/json/window-function surface,
  * typed per-group analytics, the external-pipe escape hatch, and the
  * multimodal batch path — each with a DuckDB oracle.
  *
  * Determinism: all aggregates over doubles are first floored to integer
  * milli-units (floor is engine-exact on IEEE doubles; summing longs is
  * associative) — never `round(sum(double))`.
  */
object Queries {

  private val EventTypes = Seq("click", "view", "purchase", "signup", "error")

  def all: Map[String, (SparkSession, String) => DataFrame] = Map(
    // O7 interval-join analog, bucketed-equi-join scale path: views within
    // 5 minutes after each error, per user.
    "q30_range_join" -> ((s, dir) => {
      val ev = Tables(s, dir).events
      Events.windowedMatchCount(
        ev.filter(col("event_type") === "error"),
        ev.filter(col("event_type") === "view"),
        "user_id", 300L)
    }),

    // Ordered funnel: earliest view, then earliest click within a day of
    // it, then earliest purchase within a day of that — per-user stage
    // reached. Chained per-key conditional-min aggregations, no window
    // over the stream.
    "q81_funnel" -> ((s, dir) =>
      Events.funnel(Tables(s, dir).events, "user_id",
        Seq("view", "click", "purchase"), withinSec = 86400L)),

    // Cohort retention: signup-anchored distinct-active-user counts per
    // (cohort day, day offset).
    "q82_retention" -> ((s, dir) =>
      Events.retention(Tables(s, dir).events, "user_id", "signup")),

    // Event-type transition matrix (Markov counts): consecutive event
    // pairs per user via lag over (event-time µs, event_id) — the
    // tie-break that keeps both engines on the same total order.
    "q88_transitions" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("us").asc, col("event_id").asc)
      Tables(s, dir).events
        .select(col("user_id"), col("event_id"), col("event_type"),
          unix_micros(col("ts")).as("us"))
        .withColumn("prev_type", lag(col("event_type"), 1).over(w))
        .filter(col("prev_type").isNotNull)
        .groupBy(col("prev_type"), col("event_type").as("next_type"))
        .agg(count(lit(1)).as("n"))
    }),

    // Sliding (hopping) event-time window: 1-hour windows every 30
    // minutes, per event type — each event lands in exactly width/hop = 2
    // windows. Spark's `window()` helper assigns both map-side (an
    // Expand, no self-join), then ONE partial/final aggregation on
    // (window, type); the batch twin of the streaming hopping agg.
    "q91_hop_window" -> ((s, dir) =>
      Tables(s, dir).events
        .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"),
          col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(unix_micros(col("w.start")).as("win_start_us"),
          col("event_type"), col("n"))),

    // Fixed-width value histogram: $5000 buckets over extendedprice
    // cents. Bucket assignment is map-side integral `div` on exact cents;
    // one partial/final agg bounded by bucket count, not row count.
    "q93_histogram" -> ((s, dir) =>
      Profile.histogram(Tables(s, dir).lineitem,
        floor(col("l_extendedprice") * 100), width = 500000L)),

    // Hot-hour detection: hours whose event count exceeds 1.5× the mean
    // hourly load. The mean is never materialized as a double — the
    // predicate cross-multiplies exact integers (2·n·n_hours > 3·total),
    // so the flag is engine-exact. Totals come from the already-reduced
    // hourly frame (hours ≪ events) and broadcast back as one row;
    // materialize() computes that frame ONCE (it feeds both the totals
    // branch and the output) so the events scan + hour agg never repeats.
    "q94_hot_hours" -> ((s, dir) => {
      val hourly = graft.text.Dedup.materialize(
        Tables(s, dir).events
          .groupBy(date_trunc("hour", col("ts")).as("hr"))
          .agg(count(lit(1)).as("n")))
      val totals = hourly.agg(sum(col("n")).as("total"),
        count(lit(1)).as("nh"))
      hourly.crossJoin(broadcast(totals))
        .filter(col("n") * col("nh") * 2 > col("total") * 3)
        .select(unix_micros(col("hr")).as("hr_us"), col("n"))
    }),

    // Navigation-family window functions (ntile/lead/first_value/
    // nth_value) over the same tie-free total order as q86 — completing
    // the window-function surface. All outputs are exact integers (or
    // null before the frame reaches offset), so cross-engine hashing is
    // safe; per-returnflag partitions keep the sort distributed.
    "q96_window_nav" -> ((s, dir) => {
      val cents = floor(col("l_extendedprice") * 100).cast("long")
      val w = Window.partitionBy(col("l_returnflag"))
        .orderBy(col("cents").asc, col("l_orderkey").asc, col("l_linenumber").asc)
      Tables(s, dir).lineitem
        .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
          cents.as("cents"))
        .select(col("l_orderkey"), col("l_linenumber"),
          ntile(10).over(w).as("decile"),
          lead(col("cents"), 1).over(w).as("next_cents"),
          first_value(col("cents")).over(w).as("min_cents"),
          nth_value(col("cents"), 3).over(w).as("third_cents"))
    }),

    // Null-aware NOT IN anti join — semantically distinct from the
    // left_anti of q08 (NOT EXISTS): a NULL outer key, or any NULL in the
    // subquery, eliminates the row under ANSI three-valued logic. Spark
    // plans the single-column case as a broadcast null-aware anti join
    // (NAAJ) rather than a nested loop; the outer key is made nullable on
    // purpose so the null path is exercised, and the subquery excludes
    // residues 40..49 so the result is non-empty.
    "q97_not_in" -> ((s, dir) => {
      Tables(s, dir).customer.createOrReplaceTempView("customer_v")
      Tables(s, dir).orders.createOrReplaceTempView("orders_v")
      s.sql(
        """SELECT c_custkey, c_name FROM customer_v
          |WHERE nullif(c_custkey % 50, 7) NOT IN
          |  (SELECT o_custkey % 50 FROM orders_v
          |   WHERE o_orderpriority = '1-URGENT' AND o_custkey % 50 < 40)""".stripMargin)
    }),

    // Sweep-line max-concurrency: each event holds a resource for 30
    // minutes; the peak number held simultaneously, per event type. The
    // classic interval→(±1 endpoint)→running-sum shape: 2 rows per event,
    // exact integers throughout. Ends sort before starts at equal
    // timestamps (delta −1 < +1), i.e. half-open intervals.
    //
    // TWO-PASS SEGMENTED prefix sum (the r6 single-window version
    // partitioned by event_type — 5 hot keys, 20% of ALL endpoints in one
    // task at any scale): the running sum is computed per (type, DAY) —
    // partition cardinality grows with the data — and each day adds the
    // broadcast carry-in offset (the prefix sum of prior days' net deltas
    // over the tiny types×days frame). day = t div 86400000000 is
    // non-decreasing in t, so segmented order (day, then (t, delta))
    // equals the global (t, delta) order and the result is IDENTICAL to
    // the one-window formulation — which remains the oracle.
    "q98_concurrency" -> ((s, dir) => {
      val ev = Tables(s, dir).events
        .select(col("event_type"), unix_micros(col("ts")).as("us"))
      val pts = ev.select(col("event_type"), col("us").as("t"), lit(1).as("delta"))
        .unionAll(ev.select(col("event_type"),
          (col("us") + lit(1800000000L)).as("t"), lit(-1).as("delta")))
        .withColumn("day", expr("t div 86400000000"))
      val wIn = Window.partitionBy(col("event_type"), col("day"))
        .orderBy(col("t"), col("delta"))
      val daily = pts.groupBy(col("event_type"), col("day"))
        .agg(sum(col("delta")).as("net"))
      val wCarry = Window.partitionBy(col("event_type")).orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val offsets = daily.select(col("event_type"), col("day"),
        coalesce(sum(col("net")).over(wCarry), lit(0L)).as("carry"))
      pts
        .withColumn("cur_in_day", sum(col("delta")).over(wIn))
        .join(broadcast(offsets), Seq("event_type", "day"))
        .groupBy(col("event_type"))
        .agg(max(col("cur_in_day") + col("carry")).cast("long")
          .as("max_concurrent"))
    }),

    // Per-user ordered event-sequence assembly — the "build the training
    // sequence" op (conversation turns, clickstreams → one ordered record
    // per key). collect_list + array_sort on a (time, id, payload) struct
    // gives a deterministic total order without a global sort; state per
    // key is bounded by that key's history (a production pipeline caps it
    // with slice(..., 1, N) after the sort — same plan shape).
    "q99_user_paths" -> ((s, dir) => {
      val ev = Tables(s, dir).events.select(col("user_id"),
        struct(unix_micros(col("ts")).as("us"), col("event_id"),
          col("event_type")).as("e"))
      ev.groupBy("user_id").agg(
        count(lit(1)).as("n_events"),
        array_join(transform(array_sort(collect_list(col("e"))),
          x => x.getField("event_type")), ">").as("path"))
    }),

    // SCD2 dimension build: the event stream collapsed into validity
    // intervals (one lead() window per key partition, open intervals closed
    // by the 2^62 sentinel) — the type-2 dimension every feature pipeline
    // builds before a point-in-time join.
    "q100_scd2" -> ((s, dir) =>
      Events.scd2(Tables(s, dir).events, "user_id", col("event_type"),
        "event_type")),

    // Point-in-time join: each click picks up the purchase state (cents)
    // valid AT its timestamp — equi join on the key + interval post-filter,
    // never a generic range join (SCD2 intervals partition the timeline, so
    // each fact matches at most one dimension row).
    "q101_pit_join" -> ((s, dir) => {
      val ev = Tables(s, dir).events
      val dim = Events.scd2(ev.filter(col("event_type") === "purchase"),
        "user_id", expr("CAST(floor(value * 100) AS BIGINT)"), "state_cents")
      Events.pointInTimeJoin(ev.filter(col("event_type") === "click"), dim,
        "user_id")
    }),

    // Exact z-score outliers over per-(type, hour) event counts: the
    // ingest-anomaly pass. All-integer test (cross-multiplied by H²), so
    // the flag is engine-exact; stats join back per group on an
    // already-reduced counts frame.
    "q102_outliers" -> ((s, dir) => {
      val counts = Tables(s, dir).events
        .groupBy(col("event_type"),
          unix_micros(date_trunc("hour", col("ts"))).as("hr_us"))
        .agg(count(lit(1)).as("n"))
      Profile.outlierCounts(counts, Seq("event_type"), "n", sigmas = 2)
    }),

    // Exact triangle census of the parts-co-ordered-together graph:
    // degree-oriented wedge closure bounds intermediate volume at O(m^1.5)
    // regardless of hub skew — the dup-graph density diagnostic.
    "q103_triangles" -> ((s, dir) =>
      Graph.triangleStats(Graph.coOccurrenceEdges(
        Tables(s, dir).lineitem, "l_orderkey", "l_partkey"),
        edgesDistinct = true)),

    // DOULION-sampled triangle estimate — q103's monitoring-path variant
    // (the q83→q115 precedent): md5-deterministic edge sampling at
    // p = 1/4, exact count on the sparsified graph, ×64 unbiased scale-up.
    // Everything emitted is deterministic and hash-gated (the oracle
    // replays the same sampled subgraph); accuracy vs the exact census is
    // spec-gated in GraphSpec.
    "q131_triangles_approx" -> ((s, dir) =>
      Graph.triangleStatsSampled(Graph.coOccurrenceEdges(
        Tables(s, dir).lineitem, "l_orderkey", "l_partkey"), keepDenom = 4,
        edgesDistinct = true)),

    // Fixed-iteration integer PageRank (ppm longs, floor-div contributions)
    // over the same co-occurrence graph: one equi join + partial/final agg
    // per iteration, bit-identical across engines by construction.
    "q104_pagerank" -> ((s, dir) =>
      Graph.pageRankInt(Graph.coOccurrenceEdges(
        Tables(s, dir).lineitem, "l_orderkey", "l_partkey"), iters = 3)),

    // The co-occurrence edge list itself (distinct u < v part pairs sharing
    // an order): EQUI self-join on the container key — pairs are generated
    // locally after one shuffle, quadratic only in container size.
    "q105_cooccur" -> ((s, dir) =>
      Graph.coOccurrenceEdges(Tables(s, dir).lineitem, "l_orderkey",
        "l_partkey")),

    // Bucketed co-located join: both sides written bucketBy(8) on the
    // join key, so the join AND the following same-key aggregation read
    // pre-partitioned buckets — ZERO shuffle exchanges in the whole plan
    // (plan-asserted). THE layout feature for a fact table joined on the
    // same key daily at 100 TB: the shuffle is paid once at write time,
    // not per query.
    "q111_bucketed_join" -> ((s, dir) => {
      val (liTable, ordTable) = bucketedFixture(s, dir)
      s.table(liTable)
        .join(s.table(ordTable)
            .filter(col("o_orderpriority") === "1-URGENT"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey"))
        .agg(count(lit(1)).as("n_items"),
          sum(floor(col("l_extendedprice") * (lit(1) - col("l_discount"))
            * lit(100))).as("revenue_cents"))
    }),

    // Drop-to-drop audit: exact per-kind change counts between two corpus
    // versions (v2 deterministically derived: every 11th doc removed,
    // every 7th surviving doc's lang changed, every 13th re-added under a
    // shifted id) — one full-outer join on the key + one fixed-size
    // summary aggregation; null-safe comparisons.
    "q112_table_diff" -> ((s, dir) => {
      val d = Tables(s, dir).documents
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
      val base = d.filter(col("doc_id") % 11 =!= 0)
        .withColumn("lang",
          when(col("doc_id") % 7 === 0, lit("xx")).otherwise(col("lang")))
      val v2 = base.unionByName(d.filter(col("doc_id") % 13 === 0)
        .withColumn("doc_id", col("doc_id") + 1000000))
      Audit.tableDiff(d, v2, "doc_id", Seq("lang", "source", "n_chars"))
    }),

    // EXACT equi-depth histogram (quantile buckets) without a global
    // sort: per-VALUE counts (bounded by the value domain, not the row
    // count), cumulative starts via the q98 segmented-prefix-sum shape —
    // running sum per value-segment + broadcast carry-in offsets, so no
    // single-task window over the domain — then bucket = (start·B) div N
    // (ties share a bucket; buckets are exact rank ranges). The ANALYZE
    // companion to q93's equi-WIDTH histogram: this one sizes quantile
    // cutoffs (p99 token counts, price bands) exactly at any scale.
    "q109_equidepth" -> ((s, dir) => {
      val B = 8
      // materialized: the value-count frame (domain-sized, ≪ rows) feeds
      // the carry-offsets branch, the totals branch, and the main cumsum —
      // without this the lineitem scan+agg runs three times
      val vc = graft.text.Dedup.materialize(Tables(s, dir).lineitem
        .select(expr("CAST(floor(l_extendedprice*100) AS BIGINT)").as("v"))
        .groupBy(col("v")).agg(count(lit(1)).as("c"))
        .withColumn("seg", expr("v div 100000")))
      val wIn = Window.partitionBy(col("seg")).orderBy(col("v"))
      val wSeg = Window.orderBy(col("seg"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val offs = vc.groupBy(col("seg")).agg(sum(col("c")).as("net"))
        .select(col("seg"),
          coalesce(sum(col("net")).over(wSeg), lit(0L)).as("carry"))
      val tot = vc.agg(sum(col("c")).as("nn"))
      vc.withColumn("cin", sum(col("c")).over(wIn))
        .join(broadcast(offs), Seq("seg"))
        .crossJoin(broadcast(tot))
        .withColumn("start", col("cin") + col("carry") - col("c"))
        .groupBy(expr(s"(start * $B) div nn").as("bucket"))
        .agg(sum(col("c")).as("n_rows"), min(col("v")).as("lo"),
          max(col("v")).as("hi"))
    }),

    // Integer token-budget apportionment (largest-remainder method): give
    // each source a share of a fixed training-token budget proportional
    // to its corpus token mass, EXACTLY — floor quotas + the leftover
    // distributed by largest remainder (ties: source asc). The mixture
    // planner that turns "1M tokens, weighted by availability" into
    // per-source integer allocations summing exactly to the budget; all
    // integer arithmetic, one tiny per-source frame after one corpus agg.
    "q110_token_budget" -> ((s, dir) =>
      graft.operators.Budget.apportion(
        Tables(s, dir).documents, "source",
        size(graft.text.TextOps.words(col("text"))), budget = 1000000L)),

    // Materialized mixture: q110's allocation turned into an actual doc
    // subset — each source's docs taken in deterministic md5 order until
    // the next doc would exceed the source's integer allocation (greedy
    // prefix; budget 10k tokens « corpus mass so the cut is real). The
    // segmented-cumsum shape means no source-sized window partition
    // exists (see Budget.selectToBudget).
    "q119_budget_select" -> ((s, dir) =>
      graft.operators.Budget.selectToBudget(
        Tables(s, dir).documents, "source", "doc_id",
        size(graft.text.TextOps.words(col("text"))), budget = 10000L)),

    // Token-balanced shard assignment: snake (boustrophedon) distribution
    // over docs ranked by token count — the deterministic one-pass answer
    // to "write N training shards with even token mass" (greedy
    // bin-packing is sequential; snake bounds the shard token spread by
    // one max-doc weight, and every engine computes it identically). The
    // global rank is SEGMENTED, never a corpus-wide window: per-value
    // counts (domain-sized — token counts, not docs) cumsum into carry
    // offsets broadcast back, within-value ranks window per n_toks
    // partition (q109's equi-depth machinery over a discrete key).
    "q122_shard_snake" -> ((s, dir) => {
      val S = 8
      val d = Tables(s, dir).documents
        .select(col("doc_id"),
          size(graft.text.TextOps.words(col("text"))).as("n_toks"))
      val vc = graft.text.Dedup.materialize(
        d.groupBy(col("n_toks")).agg(count(lit(1)).as("c")))
      val wVal = Window.orderBy(col("n_toks").desc)
        .rowsBetween(Window.unboundedPreceding, -1)
      val offs = vc.select(col("n_toks"),
        coalesce(sum(col("c")).over(wVal), lit(0L)).as("carry"))
      val wIn = Window.partitionBy(col("n_toks")).orderBy(col("doc_id").asc)
      d.withColumn("rin", row_number().over(wIn))
        .join(broadcast(offs), Seq("n_toks"))
        .withColumn("rank", col("carry") + col("rin"))
        .withColumn("pos", (col("rank") - 1) % (2 * S))
        .select(col("doc_id"), col("n_toks"), col("rank"),
          when(col("pos") < S, col("pos"))
            .otherwise(lit(2 * S - 1) - col("pos")).cast("int").as("shard"))
    }),

    // Rank-family window functions over a deterministic total order:
    // rank/dense_rank (ties impossible by construction), percent_rank
    // and cume_dist (exact rationals of the same integer operands in
    // both engines — IEEE-identical).
    "q86_rank_fns" -> ((s, dir) => {
      val w = Window.partitionBy(col("l_returnflag"))
        .orderBy(col("cents").asc, col("l_orderkey").asc, col("l_linenumber").asc)
      Tables(s, dir).lineitem
        .withColumn("cents", expr("CAST(floor(l_extendedprice * 100) AS BIGINT)"))
        .select(col("l_orderkey"), col("l_linenumber"),
          rank().over(w).as("rnk"), dense_rank().over(w).as("drnk"),
          percent_rank().over(w).as("prank"), cume_dist().over(w).as("cdist"))
    }),

    // Gaps-and-islands: per-user runs of CONSECUTIVE active days via the
    // classic day-minus-row_number grouping — one window per user
    // partition, two partial-agg'd groupBys, nothing corpus-wide.
    "q87_islands" -> ((s, dir) => {
      val days = Tables(s, dir).events
        .select(col("user_id"), to_date(col("ts")).as("d")).distinct()
      val w = Window.partitionBy(col("user_id")).orderBy(col("d").asc)
      days
        .withColumn("grp",
          datediff(col("d"), lit("1970-01-01")) - row_number().over(w))
        .groupBy(col("user_id"), col("grp"))
        .agg(count(lit(1)).as("run_days"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).cast("int").as("n_islands"),
          max(col("run_days")).cast("int").as("longest_run_days"))
    }),

    // ANALYZE-style table profile: per-column row/null/exact-distinct/
    // min/max in ONE scan + stack unpivot (the oracle's per-column UNION
    // of scans is the shape this operator exists to avoid). Doubles
    // profiled as exact cents, dates as days.
    "q83_profile" -> ((s, dir) =>
      Profile.table(
        Tables(s, dir).orders
          .withColumn("o_totalprice_cents",
            expr("CAST(floor(o_totalprice * 100) AS BIGINT)"))
          .withColumn("o_orderdate_day", to_date(col("o_orderdate"))),
        Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice_cents",
          "o_orderdate_day", "o_orderpriority"))),

    // q83's monitoring-path variant: approx_count_distinct profile — same
    // columns, sketch-sized aggregates, NO Expand in the plan (the exact
    // profile's dominant cost; bench documents the drop vs q83). The HLL
    // value itself is not SQL-replayable, so the gated output hashes the
    // exact columns (incl. the md5-bucket lower-bound witness) plus the
    // sketch folded into approx_ok := approx ∈ [0.7·lo, 1.3·non-null] —
    // the oracle asserts TRUE, so a broken sketch (zero, garbage,
    // overflow) hash-fails; the tight 5%-rsd tolerance is spec-gated
    // against the exact profile in RelationalSpec. Margins vs guarantees:
    // lo ≤ true distinct and HLL ≥ 0.85·true at 3σ ⇒ approx ≥ 0.85·lo;
    // approx ≤ 1.05·true ≤ 1.05·non-null — both ≫ clear of 0.7/1.3.
    "q115_profile_approx" -> ((s, dir) =>
      Profile.tableApprox(
        Tables(s, dir).orders
          .withColumn("o_totalprice_cents",
            expr("CAST(floor(o_totalprice * 100) AS BIGINT)"))
          .withColumn("o_orderdate_day", to_date(col("o_orderdate"))),
        Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice_cents",
          "o_orderdate_day", "o_orderpriority"))
        .select(col("column_name"), col("n_rows"), col("n_nulls"),
          col("n_distinct_lo"),
          (col("n_distinct_approx") * 10 >= col("n_distinct_lo") * 7 &&
            col("n_distinct_approx") * 10 <= (col("n_rows") - col("n_nulls")) * 13)
            .as("approx_ok"),
          col("min_s"), col("max_s"))),

    // Profile-store serve (the q106/q129 build/serve split for ANALYZE
    // stats): orders arrives as three drops, each contributing one
    // constant-size mergeable partial row per column (exact sums/typed
    // min-max/md5-bucket sets + an HLL sketch); corpus stats are served
    // from the stored partials ONLY — the corpus is never rescanned. The
    // oracle replays the exact fields over the whole table (bucket-set
    // union ≡ single-scan bucket set), and the merged HLL estimate is
    // folded into the q115 certified-bounds boolean.
    "q136_profile_store" -> ((s, dir) => {
      val storeDir = profileStoreFixture(s, dir)
      graft.operators.ProfileStore.serve(s, storeDir)
        .select(col("column_name"), col("n_rows"), col("n_nulls"),
          col("n_distinct_lo"),
          (col("n_distinct_approx") * 10 >= col("n_distinct_lo") * 7 &&
            col("n_distinct_approx") * 10 <= (col("n_rows") - col("n_nulls")) * 13)
            .as("approx_ok"),
          col("min_s"), col("max_s"))
    }),

    // Profile-store TAKEDOWN gated end-to-end: drop1 of q136's three
    // drops is removed (ProfileStore.removeDrop — one partials-table
    // rewrite, the corpus never rescanned) and corpus stats are served
    // from what remains. Every stored statistic re-merges from per-drop
    // partials (sums, typed min/max, bucket-set union, HLL
    // register-max), so the serve must equal a store that never ingested
    // the drop — which is exactly what the oracle computes (q136's
    // replay over orders minus the drop): min/max and distinct bounds
    // genuinely un-see the removed rows, not just the counts.
    "q140_profile_takedown" -> ((s, dir) => {
      val storeDir = profileTakedownFixture(s, dir)
      graft.operators.ProfileStore.serve(s, storeDir)
        .select(col("column_name"), col("n_rows"), col("n_nulls"),
          col("n_distinct_lo"),
          (col("n_distinct_approx") * 10 >= col("n_distinct_lo") * 7 &&
            col("n_distinct_approx") * 10 <= (col("n_rows") - col("n_nulls")) * 13)
            .as("approx_ok"),
          col("min_s"), col("max_s"))
    }),

    // Profile-store DRIFT report (q136's store, read per-drop instead of
    // merged): per (drop, column) exact stats plus deltas vs the previous
    // drop in drop order — the null-explosion / distinct-collapse signal
    // a daily ingest watches, computed from O(drops × columns) stored
    // partial rows with the corpus never rescanned. The oracle replays
    // each drop's stats over orders and the same lag window.
    "q138_profile_drift" -> ((s, dir) => {
      val storeDir = profileStoreFixture(s, dir)
      graft.operators.ProfileStore.drift(s, storeDir)
    }),

    // Unpivot/melt (inverse of the q33 pivot): wide per-flag metrics to
    // long (flag, metric, value) rows via stack — exact integer values.
    "q84_unpivot" -> ((s, dir) => {
      Tables(s, dir).lineitem
        .groupBy(col("l_returnflag"))
        .agg(
          // floor, not a bare long cast: Spark's double→long cast
          // truncates while DuckDB's rounds — floor is engine-exact
          // (file-header determinism rule)
          sum(expr("CAST(floor(l_quantity) AS BIGINT)")).as("sum_qty"),
          sum(expr("CAST(floor(l_extendedprice * 100) AS BIGINT)")).as("sum_price_cents"),
          count(lit(1)).as("n_items"))
        .select(col("l_returnflag"), expr(
          "stack(3, 'sum_qty', sum_qty, 'sum_price_cents', sum_price_cents, " +
            "'n_items', n_items) AS (metric, value)"))
    }),

    // Full outer join: order-placement days vs ship days, day-level
    // reconciliation with presence tag (both exclusive sides non-empty).
    "q85_full_outer" -> ((s, dir) => {
      val o = Tables(s, dir).orders
        .groupBy(to_date(col("o_orderdate")).as("d"))
        .agg(count(lit(1)).as("n_orders"))
      val l = Tables(s, dir).lineitem
        .groupBy(to_date(col("l_shipdate")).as("d"))
        .agg(count(lit(1)).as("n_ships"))
      o.join(l, Seq("d"), "full_outer")
        .select(col("d").cast("string").as("day"),
          coalesce(col("n_orders"), lit(0L)).as("n_orders"),
          coalesce(col("n_ships"), lit(0L)).as("n_ships"),
          when(col("n_orders").isNull, "ship_only")
            .when(col("n_ships").isNull, "order_only")
            .otherwise("both").as("presence"))
    }),

    // As-of join: latest click at-or-before each purchase, per user.
    "q31_asof_join" -> ((s, dir) => {
      val ev = Tables(s, dir).events
      Events.asOfJoin(
        ev.filter(col("event_type") === "click"),
        ev.filter(col("event_type") === "purchase"),
        "user_id")
    }),

    // Grouping sets: CUBE over (event_type, day) — counts + exact
    // milli-sums.
    "q32_cube" -> ((s, dir) => {
      Tables(s, dir).events
        .select(col("event_type"), to_date(col("ts")).cast("string").as("day"),
          floor(col("value") * 1000).as("value_milli"))
        .cube(col("event_type"), col("day"))
        .agg(count(lit(1)).as("n"), sum(col("value_milli")).as("milli_sum"))
    }),

    // Pivot: per-day event counts fanned to one column per type.
    "q33_pivot" -> ((s, dir) => {
      val p = Tables(s, dir).events
        .select(to_date(col("ts")).cast("string").as("day"), col("event_type"))
        .groupBy(col("day"))
        .pivot("event_type", EventTypes)
        .count()
      p.select(col("day") +: EventTypes.map(t => coalesce(col(t), lit(0L)).as(t)): _*)
    }),

    // JSON functions: extract props.k, bucket and aggregate.
    "q34_json" -> ((s, dir) => {
      Tables(s, dir).events
        .select(get_json_object(col("props"), "$.k").cast("int").as("k"))
        .groupBy((col("k") % 10).as("k_mod"))
        .agg(count(lit(1)).as("n"), min(col("k")).as("k_min"), max(col("k")).as("k_max"))
    }),

    // Window-function surface: row_number / lag / lead / ntile over a total
    // per-customer order, all on exact cents.
    "q35_window_fns" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      Tables(s, dir).orders
        .withColumn("cents", floor(col("o_totalprice") * 100))
        .select(
          col("o_orderkey"), col("o_custkey"),
          row_number().over(w).as("rn"),
          lag(col("cents"), 1).over(w).as("prev_cents"),
          lead(col("cents"), 1).over(w).as("next_cents"),
          ntile(4).over(w).as("quartile"))
    }),

    // Gap-based sessionization (30-minute inactivity gap) per user.
    "q36_sessionize" -> ((s, dir) =>
      Events.sessionize(Tables(s, dir).events, "user_id", 1800L)),

    // O13 per-group analytic through the typed flatMapGroups slot.
    "q37_longest_run" -> ((s, dir) =>
      Analytic.longestRun(Tables(s, dir).events)(s).toDF()),

    // S7/O21 external-pipe escape hatch: awk over (doc_id, n_chars) lines.
    "q38_pipe" -> ((s, dir) =>
      Pipe.pipeLongs(
        Tables(s, dir).documents,
        Seq("doc_id", "n_chars"),
        Seq("/usr/bin/awk", "-F\t", "{print $1\"\\t\"($2*3+7)}"),
        Seq("doc_id", "derived"))(s)),

    // Exact interpolated percentiles over integer cents.
    "q39_percentiles" -> ((s, dir) => {
      Tables(s, dir).orders
        .withColumn("cents", floor(col("o_totalprice") * 100))
        .groupBy(col("o_orderpriority"))
        .agg(
          percentile(col("cents"), lit(0.5)).as("median_cents"),
          percentile(col("cents"), lit(0.95)).as("p95_cents"),
          count(lit(1)).as("n"))
    }),

    // Multimodal batch path: payload bytes → stride-sampled digests via
    // typed mapPartitions (see graft.multimodal.Binary).
    "q40_multimodal" -> ((s, dir) =>
      Binary.extractFeatures(
        Binary.withPayload(Tables(s, dir).documents), 10)(s).toDF()),

    // Exact blob-level dedup over binary payloads: content digest →
    // hash-groupBy → copies + survivor per digest. The first-line media
    // dedup at 100 TB (identical bytes regardless of metadata); one
    // shuffle on the digest, near-dup variants live in the vector path.
    "q67_blob_dedup" -> ((s, dir) =>
      Binary.withPayload(Tables(s, dir).documents)
        .groupBy(md5(col("payload")).as("content_md5"))
        .agg(count(lit(1)).as("n_copies"), min(col("doc_id")).as("keeper_id"))),

    // Event-time tumbling window (batch form of the streaming hourly agg).
    "q41_event_hourly" -> ((s, dir) => {
      Tables(s, dir).events
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(unix_micros(col("w.start")).as("hour_start_us"), col("event_type"), col("n"))
    }),

    // Array-function surface: collect → sort → element access/containment
    // (scalar outputs only; deterministic via sort_array over the multiset).
    "q42_array_fns" -> ((s, dir) => {
      Tables(s, dir).lineitem
        .groupBy(col("l_orderkey"))
        .agg(sort_array(collect_list(col("l_linenumber"))).as("lns"))
        .select(
          col("l_orderkey"),
          size(col("lns")).as("n_lines"),
          element_at(col("lns"), 1).as("ln_first"),
          element_at(col("lns"), -1).as("ln_last"),
          array_contains(col("lns"), 1).cast("int").as("has_one"))
    }),

    // Explicit GROUPING SETS (beyond rollup/cube) through the SQL surface,
    // with grouping_id disambiguating aggregation levels.
    "q46_grouping_sets" -> ((s, dir) => {
      Tables(s, dir).orders.createOrReplaceTempView("orders_v")
      s.sql(
        """SELECT o_orderpriority, o_orderstatus, count(*) AS n,
          |  CAST(grouping_id(o_orderpriority, o_orderstatus) AS INT) AS gid
          |FROM orders_v
          |GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
          |  (o_orderpriority), ())""".stripMargin)
    }),

    // Time-series resample: per-type hourly grid over each type's own
    // span (sequence + explode generates ONLY missing rows, never a
    // cross join), zero-filled counts and a forward-filled last-observed
    // sum (`last(..., ignoreNulls)` window) — the gap-filling shape every
    // metrics/feature pipeline needs. Integer sums (floor) for parity.
    "q70_resample" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val ev = Tables(s, dir).events.select(
        col("event_type"), date_trunc("hour", col("ts")).as("h"),
        floor(col("value")).as("v"))
      // the hourly aggregate feeds BOTH the span grid and the join probe;
      // materialize() computes it once (types × hours rows — tiny) instead
      // of scanning + aggregating the events table twice. The shared helper
      // picks a RELIABLE checkpoint when a checkpoint dir is configured —
      // a bare localCheckpoint would die with any lost executor on a real
      // cluster (truncated lineage + executor-local blocks).
      val agg = graft.text.Dedup.materialize(
        ev.groupBy(col("event_type"), col("h"))
          .agg(count(lit(1)).as("n"), sum(col("v")).as("sv")))
      val grid = agg.groupBy(col("event_type"))
        .agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
        .select(col("event_type"),
          explode(sequence(col("h0"), col("h1"), expr("interval 1 hour"))).as("h"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("h"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      grid.join(agg, Seq("event_type", "h"), "left")
        .select(col("event_type"), unix_micros(col("h")).as("hour_us"),
          coalesce(col("n"), lit(0L)).as("n"),
          coalesce(col("sv"), lit(0L)).as("sv"),
          coalesce(last(col("sv"), ignoreNulls = true).over(w), lit(0L)).as("sv_ffill"))
    }),

    // Correlated EXISTS / NOT EXISTS through the SQL surface — Catalyst
    // rewrites both to broadcast semi/anti joins (no per-row subquery
    // execution, the plan a 100 TB engine must produce).
    "q68_exists" -> ((s, dir) => {
      Tables(s, dir).customer.createOrReplaceTempView("customer_v")
      Tables(s, dir).orders.createOrReplaceTempView("orders_v")
      s.sql(
        """SELECT c_custkey, c_name FROM customer_v c
          |WHERE EXISTS (SELECT 1 FROM orders_v o
          |    WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000)
          |  AND NOT EXISTS (SELECT 1 FROM orders_v o2
          |    WHERE o2.o_custkey = c.c_custkey AND o2.o_orderstatus = 'F')""".stripMargin)
    }),

    // Scalar + correlated scalar subqueries: global average (one broadcast
    // scalar) and per-customer order count (rewritten to an aggregated
    // left join). Parity: the threshold is computed on integer CENTS
    // (floor(x*100) per row, exact long sum, one double division) — a
    // floor(avg(double)) would be partition-order-dependent and could
    // flip the gate when the true average sits within an ulp of an
    // integer (the q47 cents discipline).
    "q69_scalar_subquery" -> ((s, dir) => {
      Tables(s, dir).customer.createOrReplaceTempView("customer_v")
      Tables(s, dir).orders.createOrReplaceTempView("orders_v")
      s.sql(
        """SELECT c_custkey,
          |  (SELECT count(*) FROM orders_v o WHERE o.o_custkey = c.c_custkey)
          |    AS n_orders
          |FROM customer_v c
          |WHERE CAST(floor(c_acctbal*100) AS BIGINT) >
          |  (SELECT CAST(floor(CAST(sum(CAST(floor(c_acctbal*100) AS BIGINT)) AS BIGINT)
          |    / count(*)) AS BIGINT) FROM customer_v)""".stripMargin)
    }),

    // Correlated LATERAL subquery (top-2 orders per customer): Catalyst
    // decorrelates the per-row ORDER BY/LIMIT into a ranked join — no
    // per-customer subquery execution. Total order (price desc, key asc)
    // for engine parity.
    "q73_lateral" -> ((s, dir) => {
      Tables(s, dir).customer.createOrReplaceTempView("customer_v")
      Tables(s, dir).orders.createOrReplaceTempView("orders_v")
      s.sql(
        """SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
          |FROM customer_v c JOIN LATERAL (
          |  SELECT o_orderkey, o_totalprice FROM orders_v
          |  WHERE o_custkey = c.c_custkey
          |  ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 2) o""".stripMargin)
    }),

    // Exact second-moment statistics: variance/stddev/correlation derived
    // from exact integer sums (n, Σx, Σy, Σxy, Σx², Σy²) with the SAME
    // double expression shape in both engines — deterministic, unlike
    // built-in stddev/corr whose streaming accumulation is order-dependent.
    "q47_exact_stats" -> ((s, dir) => {
      val li = Tables(s, dir).lineitem.select(
        col("l_returnflag"),
        col("l_quantity").cast("long").as("x"), // integral by construction
        floor(col("l_extendedprice")).as("y"))
      val agg = li.groupBy(col("l_returnflag")).agg(
        count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      val n = col("n").cast("double")
      def d(c: String) = col(c).cast("double")
      agg.select(
        col("l_returnflag"), col("n"),
        ((n * d("sxx") - d("sx") * d("sx")) / (n * (n - lit(1.0)))).as("var_x"),
        sqrt((n * d("sxx") - d("sx") * d("sx")) / (n * (n - lit(1.0)))).as("stddev_x"),
        ((n * d("sxy") - d("sx") * d("sy")) /
          (sqrt(n * d("sxx") - d("sx") * d("sx")) * sqrt(n * d("syy") - d("sy") * d("sy"))))
          .as("corr_xy"))
    }),

    // Per-key top-k through the engine's OWN physical operator
    // (TopKPerKeyNode → partial heap → shuffle heads → final heap; see
    // graft.plans.TopKPerKey): best 3 lineitems per part by price, total
    // order via (orderkey, linenumber) tiebreak. The oracle is the window
    // row_number formulation — identical rows, radically different plan
    // (the window plan shuffles + sorts all n rows; this shuffles ≤
    // partitions·keys·k heap heads and never sorts).
    "q51_topk_per_key" -> ((s, dir) => {
      Relational.topKPerKey(
        Tables(s, dir).lineitem.select(
          col("l_partkey"), col("l_orderkey"), col("l_linenumber"), col("l_extendedprice")),
        keys = Seq(col("l_partkey")),
        order = Seq(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber")),
        k = 3)
    }),

    // Salted skew join (Scale.saltedJoin): fact rows salted, dim replicated
    // per salt, join on (key, salt) — row-identical to the plain join the
    // oracle runs, but a hot key spreads over `salts` reducers. sort_array
    // on the dim's small payload keeps nothing order-dependent.
    "q60_salted_join" -> ((s, dir) => {
      val t = Tables(s, dir)
      Scale.saltedJoin(
          t.lineitem.withColumnRenamed("l_partkey", "p_partkey"),
          t.part.select(col("p_partkey"), col("p_brand")), "p_partkey", salts = 8)
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n"),
          sum(floor(col("l_extendedprice"))).as("price_floor_sum"))
    }),

    // Generator/UDTF surface: posexplode fan-out (one row per token with
    // its position) followed by a re-aggregation — the lateral-view shape
    // (and the record-level form of the reference's per-chromosome
    // scatter). Generate is pipelined inside codegen: no shuffle until the
    // groupBy.
    "q59_explode" -> ((s, dir) => {
      Tables(s, dir).documents
        .select(col("doc_id"),
          posexplode(graft.text.TextOps.words(col("text"))).as(Seq("pos", "word")))
        .groupBy(col("word"))
        .agg(
          count(lit(1)).as("n"),
          min(col("doc_id")).as("first_doc"),
          min(col("pos")).as("min_pos"))
        .filter(col("n") >= 50)
    }),

    // Six-table join graph (TPC-H Q5 shape): the optimizer's join-reorder /
    // broadcast-selection showcase — two dim tables broadcast, the
    // customer-supplier nation equality closes the cycle, revenue in exact
    // cents. At 100 TB the plan property that matters is that region/nation
    // stay broadcasts and the filter reaches the region scan.
    "q58_multijoin_reorder" -> ((s, dir) => {
      val t = Tables(s, dir)
      t.customer
        .join(t.orders, col("c_custkey") === col("o_custkey"))
        .join(t.lineitem, col("o_orderkey") === col("l_orderkey"))
        .join(t.supplier,
          col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(t.nation), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(t.region), col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name") === "ASIA")
        .groupBy(col("n_name"))
        .agg(
          count(lit(1)).as("n_items"),
          sum(floor(col("l_extendedprice") * (lit(1) - col("l_discount")) * lit(100)))
            .as("revenue_cents"))
    }),

    // Native bounded-heap aggregate (functions.TopKValues,
    // TypedImperativeAggregate): k largest values per group in O(k) buffer
    // memory — the collect_list-free form of "top values per key". Output
    // joined to a string (the compare harness needs scalar columns).
    "q57_topk_agg" -> ((s, dir) => {
      Tables(s, dir).lineitem
        .groupBy(col("l_returnflag"))
        .agg(call_function("topk_values",
          floor(col("l_extendedprice") * lit(100)), lit(5)).as("arr"))
        .select(
          col("l_returnflag"),
          concat_ws(",", transform(col("arr"), v => v.cast("string"))).as("top5_cents"))
    }),

    // RANGE window frame (value-based, vs q10's ROWS frame): running sums
    // over a sliding VALUE interval. Deterministic because a range frame
    // includes ALL peers of the boundary values, and the summed column is
    // integer (sum order can't matter).
    "q56_range_frame" -> ((s, dir) => {
      val qd = floor(col("l_quantity")) // floor not cast: cast rounds in DuckDB
      val w = Window.partitionBy(col("l_returnflag")).orderBy(qd).rangeBetween(-2, 0)
      Tables(s, dir).lineitem.select(
        col("l_orderkey"), col("l_linenumber"), col("l_returnflag"), col("l_quantity"),
        sum(qd).over(w).as("range_sum"),
        count(lit(1)).over(w).as("range_cnt"),
        first(qd).over(w).as("range_min_qty"))
    }),

    // Bloom-prefiltered semi join (Scale.bloomSemiJoin): membership sketch
    // broadcast, fact rows dropped before the shuffle, exact semi join on
    // survivors. False-positives-only ⇒ result identical to the plain semi
    // join the oracle runs.
    "q54_bloom_join" -> ((s, dir) => {
      val t = Tables(s, dir)
      Scale.bloomSemiJoin(
          t.lineitem, "l_partkey",
          t.part.filter(col("p_size") >= 40).select(col("p_partkey")), "p_partkey",
          expectedItems = 2000L, fpp = 0.01)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"))
    }),

    // Salted two-phase aggregation (Scale.saltedAgg): identical result and
    // schema to the direct groupBy the oracle runs, immune to single-hot-key
    // skew (the partial phase groups on (key, salt)).
    "q55_salted_agg" -> ((s, dir) => {
      Scale.saltedAgg(
        Tables(s, dir).lineitem, col("l_returnflag"), salts = 8,
        "qty_sum" -> floor(col("l_quantity")), // floor not cast: cast rounds in DuckDB
        "price_floor_sum" -> floor(col("l_extendedprice")))
    }),

    // Order-independent corpus MANIFEST (the reproducibility
    // certificate): per md5-shard, exact count + bit_xor/mod-sum row
    // fingerprints — constant per-shard agg state, no sort, no
    // collect_list, so the certificate itself is cheap at 100 TB and
    // partitioning-independent by construction. Two engines computing
    // the same manifest from the same table IS the audit property the
    // whole suite leans on, stated as one 8-row table.
    "q146_manifest" -> ((s, dir) =>
      graft.operators.Audit.manifest(Tables(s, dir).documents,
        key = "doc_id", cols = Seq("text", "lang", "source", "n_chars"))),

    // Store-SERVED manifest: the q146 certificate merged from per-drop
    // partials (three drops by doc_id % 3) — count/mod-sum add, xor of
    // per-drop xors IS the union xor, so the serve must hash-match q146's
    // from-scratch single pass exactly. The growing-corpus certificate:
    // the daily cost is the new drop's scan, never a corpus rescan.
    "q154_manifest_store" -> ((s, dir) =>
      graft.operators.ManifestStore.serve(s, manifestStoreFixture(s, dir))),

    // Manifest-store takedown: drop "c" (doc_id % 3 == 0) removed after
    // ingest — the re-merge must equal the manifest of a corpus that
    // never contained it (xor is self-inverse; sums subtract by
    // omission).
    "q155_manifest_takedown" -> ((s, dir) =>
      graft.operators.ManifestStore.serve(s,
        manifestTakedownFixture(s, dir))),

    // EXACT heavy hitters with BOUNDED state (Misra-Gries candidates +
    // exact recount): every token with count·29 ≥ n over the corpus
    // token stream — the hot-key census that sizes q55/q60's salts.
    // A plain groupBy's partial-agg state is distinct-key sized; phase 1
    // here caps task state at 2k entries and provably keeps every true
    // heavy hitter as a candidate (no false negatives), phase 2 recounts
    // candidates exactly — so the output is exact and partitioning-
    // independent while the state bound holds at any cardinality. k=29
    // lands the threshold INSIDE the corpus's near-uniform token band:
    // some tokens qualify by a handful of occurrences and the nearest
    // miss is ~1 count below, so an off-by-one in either phase flips
    // membership and hash-fails.
    "q143_heavy_hitters" -> ((s, dir) => {
      val toks = Tables(s, dir).documents
        .select(explode(split(col("text"), " ")).as("token"))
      Scale.heavyHitters(toks, "token", k = 29)
    }),

    // Nested-type + conditional function surface: struct build/extract, map
    // build/lookup/size, nullif/coalesce, greatest/least. Output stays
    // scalar (the nested values are built and immediately consumed) so the
    // oracle compare is on plain columns.
    "q52_nested_fns" -> ((s, dir) => {
      val st = struct(col("p_brand").as("b"), col("p_size").as("s"))
      val mp = map(lit("brand"), col("p_brand"), lit("type"), col("p_type"))
      Tables(s, dir).part.select(
        col("p_partkey"),
        st.getField("b").as("sb"),
        (st.getField("s") + 1).as("s1"),
        element_at(mp, "type").as("mtype"),
        size(mp).as("msize"),
        coalesce(nullif(col("p_brand"), lit("Brand#13")), lit("OTHER")).as("brand_or_other"),
        greatest(col("p_size"), lit(25)).as("gsize"),
        least(col("p_size"), lit(25)).as("lsize"))
    }),

    // Regex surface beyond q43's replace: group extraction, match flag,
    // match count (patterns portable across Java regex and DuckDB's RE2).
    "q53_regex_fns" -> ((s, dir) => {
      Tables(s, dir).part.select(
        col("p_partkey"),
        regexp_extract(col("p_name"), "^([a-z]+)", 1).as("first_tok"),
        regexp_extract(col("p_name"), "([a-z]+)$", 1).as("last_tok"),
        col("p_name").rlike("re").cast("int").as("has_re"),
        size(regexp_extract_all(col("p_name"), lit("[aeiou]+"), lit(0))).as("n_vowel_runs"))
    }),

    // String-function surface: regexp_replace/translate/lpad/reverse/
    // instr/split (patterns chosen portable across Java regex and RE2).
    "q43_string_fns" -> ((s, dir) => {
      Tables(s, dir).part.select(
        col("p_partkey"),
        regexp_replace(col("p_name"), "[aeiou]", "").as("devoweled"),
        translate(col("p_name"), "abc", "xyz").as("translated"),
        lpad(col("p_brand"), 12, "*").as("padded"),
        reverse(col("p_type")).as("reversed"),
        instr(col("p_name"), "a").as("a_pos"),
        element_at(split(col("p_type"), " "), 1).as("first_word"))
    })
  )

  // ---- DuckDB oracles ------------------------------------------------------

  def oracles: Map[String, String] = Map(
    "q60_salted_join" ->
      """SELECT p_brand, count(*) AS n,
        |  CAST(sum(CAST(floor(l_extendedprice) AS BIGINT)) AS BIGINT) AS price_floor_sum
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand""".stripMargin,
    "q59_explode" ->
      """WITH t AS (SELECT doc_id,
        |  unnest(string_split(text,' ')) AS word,
        |  unnest(range(len(string_split(text,' ')))) AS pos
        |  FROM documents)
        |SELECT word, count(*) AS n, min(doc_id) AS first_doc,
        |  CAST(min(pos) AS INT) AS min_pos
        |FROM t GROUP BY word HAVING count(*) >= 50""".stripMargin,
    "q58_multijoin_reorder" ->
      """SELECT n_name, count(*) AS n_items,
        |  CAST(sum(CAST(floor(l_extendedprice*(1-l_discount)*100) AS BIGINT)) AS BIGINT)
        |    AS revenue_cents
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name""".stripMargin,
    "q57_topk_agg" ->
      """SELECT l_returnflag,
        |  array_to_string(
        |    (list_sort(list(CAST(floor(l_extendedprice*100) AS BIGINT)), 'DESC'))[1:5],
        |    ',') AS top5_cents
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q56_range_frame" ->
      """SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity,
        |  CAST(sum(CAST(floor(l_quantity) AS BIGINT)) OVER w AS BIGINT) AS range_sum,
        |  count(*) OVER w AS range_cnt,
        |  CAST(first_value(CAST(floor(l_quantity) AS BIGINT)) OVER w AS BIGINT)
        |    AS range_min_qty
        |FROM lineitem
        |WINDOW w AS (PARTITION BY l_returnflag ORDER BY CAST(floor(l_quantity) AS BIGINT)
        |  RANGE BETWEEN 2 PRECEDING AND CURRENT ROW)""".stripMargin,
    "q54_bloom_join" ->
      """SELECT l_orderkey, l_linenumber, l_partkey FROM lineitem
        |WHERE EXISTS (SELECT 1 FROM part
        |              WHERE p_partkey = l_partkey AND p_size >= 40)""".stripMargin,
    "q55_salted_agg" ->
      """SELECT l_returnflag, count(*) AS n_rows,
        |  CAST(sum(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT) AS qty_sum,
        |  CAST(sum(CAST(floor(l_extendedprice) AS BIGINT)) AS BIGINT) AS price_floor_sum
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q52_nested_fns" ->
      """SELECT p_partkey,
        |  (struct_pack(b := p_brand, s := p_size)).b AS sb,
        |  CAST((struct_pack(b := p_brand, s := p_size)).s + 1 AS INT) AS s1,
        |  map(['brand','type'], [p_brand, p_type])['type'][1] AS mtype,
        |  CAST(cardinality(map(['brand','type'], [p_brand, p_type])) AS INT) AS msize,
        |  coalesce(nullif(p_brand, 'Brand#13'), 'OTHER') AS brand_or_other,
        |  CAST(greatest(p_size, 25) AS INT) AS gsize,
        |  CAST(least(p_size, 25) AS INT) AS lsize
        |FROM part""".stripMargin,
    "q53_regex_fns" ->
      """SELECT p_partkey,
        |  regexp_extract(p_name, '^([a-z]+)', 1) AS first_tok,
        |  regexp_extract(p_name, '([a-z]+)$', 1) AS last_tok,
        |  CAST(CASE WHEN regexp_matches(p_name, 're') THEN 1 ELSE 0 END AS INT) AS has_re,
        |  CAST(len(regexp_extract_all(p_name, '[aeiou]+')) AS INT) AS n_vowel_runs
        |FROM part""".stripMargin,
    "q51_topk_per_key" ->
      """SELECT l_partkey, l_orderkey, l_linenumber, l_extendedprice
        |FROM (SELECT l_partkey, l_orderkey, l_linenumber, l_extendedprice,
        |        row_number() OVER (PARTITION BY l_partkey
        |          ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
        |      FROM lineitem)
        |WHERE rn <= 3""".stripMargin,
    "q30_range_join" ->
      """SELECT e.event_id, e.user_id, count(v.event_id) AS n_matches
        |FROM events e LEFT JOIN events v
        |  ON v.user_id = e.user_id AND v.event_type = 'view'
        |  AND v.ts > e.ts AND v.ts <= e.ts + INTERVAL 300 SECOND
        |WHERE e.event_type = 'error'
        |GROUP BY e.event_id, e.user_id""".stripMargin,
    "q31_asof_join" ->
      """SELECT p.event_id, p.user_id, epoch_us(p.ts) AS ts_us,
        |  (SELECT max(epoch_us(c.ts)) FROM events c
        |   WHERE c.user_id = p.user_id AND c.event_type = 'click'
        |     AND c.ts <= p.ts) AS asof_ts_us
        |FROM events p WHERE p.event_type = 'purchase'""".stripMargin,
    "q88_transitions" ->
      """WITH seq AS (SELECT user_id, event_type,
        |  lag(event_type) OVER (PARTITION BY user_id
        |    ORDER BY epoch_us(ts), event_id) AS prev_type
        |  FROM events)
        |SELECT prev_type, event_type AS next_type, count(*) AS n
        |FROM seq WHERE prev_type IS NOT NULL
        |GROUP BY 1, 2""".stripMargin,
    "q96_window_nav" ->
      """WITH t AS (SELECT l_orderkey, l_linenumber, l_returnflag,
        |  CAST(floor(l_extendedprice*100) AS BIGINT) AS cents FROM lineitem)
        |SELECT l_orderkey, l_linenumber,
        |  CAST(ntile(10) OVER w AS INT) AS decile,
        |  lead(cents, 1) OVER w AS next_cents,
        |  first_value(cents) OVER w AS min_cents,
        |  nth_value(cents, 3) OVER w AS third_cents
        |FROM t WINDOW w AS (PARTITION BY l_returnflag
        |  ORDER BY cents, l_orderkey, l_linenumber)""".stripMargin,
    "q97_not_in" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE nullif(c_custkey % 50, 7) NOT IN
        |  (SELECT o_custkey % 50 FROM orders
        |   WHERE o_orderpriority = '1-URGENT' AND o_custkey % 50 < 40)""".stripMargin,
    "q111_bucketed_join" ->
      """SELECT l_orderkey, count(*) AS n_items,
        |  CAST(sum(CAST(floor(l_extendedprice*(1-l_discount)*100) AS BIGINT))
        |    AS BIGINT) AS revenue_cents
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderpriority = '1-URGENT'
        |GROUP BY 1""".stripMargin,
    "q112_table_diff" ->
      """WITH v1 AS (SELECT doc_id, lang, source, n_chars FROM documents),
        |v2 AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 7 = 0 THEN 'xx' ELSE lang END AS lang,
        |    source, n_chars
        |  FROM documents WHERE doc_id % 11 <> 0
        |  UNION ALL
        |  SELECT doc_id + 1000000, lang, source, n_chars FROM documents
        |  WHERE doc_id % 13 = 0),
        |j AS (SELECT
        |    a.doc_id IS NOT NULL AS pa, b.doc_id IS NOT NULL AS pb,
        |    (a.lang IS DISTINCT FROM b.lang) AS ch_lang,
        |    (a.source IS DISTINCT FROM b.source) AS ch_source,
        |    (a.n_chars IS DISTINCT FROM b.n_chars) AS ch_n_chars
        |  FROM v1 a FULL OUTER JOIN v2 b ON a.doc_id = b.doc_id)
        |SELECT 'added' AS change,
        |  CAST(count(*) FILTER (WHERE NOT pa) AS BIGINT) AS n FROM j
        |UNION ALL SELECT 'removed',
        |  CAST(count(*) FILTER (WHERE NOT pb) AS BIGINT) FROM j
        |UNION ALL SELECT 'changed', CAST(count(*) FILTER
        |  (WHERE pa AND pb AND (ch_lang OR ch_source OR ch_n_chars))
        |  AS BIGINT) FROM j
        |UNION ALL SELECT 'unchanged', CAST(count(*) FILTER
        |  (WHERE pa AND pb AND NOT (ch_lang OR ch_source OR ch_n_chars))
        |  AS BIGINT) FROM j
        |UNION ALL SELECT 'changed_lang',
        |  CAST(count(*) FILTER (WHERE pa AND pb AND ch_lang) AS BIGINT) FROM j
        |UNION ALL SELECT 'changed_source',
        |  CAST(count(*) FILTER (WHERE pa AND pb AND ch_source) AS BIGINT) FROM j
        |UNION ALL SELECT 'changed_n_chars',
        |  CAST(count(*) FILTER (WHERE pa AND pb AND ch_n_chars) AS BIGINT)
        |  FROM j""".stripMargin,
    "q109_equidepth" ->
      """WITH vc AS (SELECT CAST(floor(l_extendedprice*100) AS BIGINT) AS v,
        |    count(*) AS c
        |  FROM lineitem GROUP BY 1),
        |cum AS (SELECT v, c,
        |  CAST(sum(c) OVER (ORDER BY v) - c AS BIGINT) AS start FROM vc),
        |tot AS (SELECT CAST(sum(c) AS BIGINT) AS nn FROM vc)
        |SELECT (start * 8) // nn AS bucket,
        |  CAST(sum(c) AS BIGINT) AS n_rows, min(v) AS lo, max(v) AS hi
        |FROM cum, tot GROUP BY 1""".stripMargin,
    "q110_token_budget" ->
      """WITH ps AS (SELECT source,
        |    CAST(sum(len(string_split(text,' '))) AS BIGINT) AS toks
        |  FROM documents GROUP BY 1),
        |tot AS (SELECT CAST(sum(toks) AS BIGINT) AS tt FROM ps),
        |q AS (SELECT source, toks, (1000000 * toks) // tt AS base,
        |    (1000000 * toks) % tt AS rem FROM ps, tot),
        |r AS (SELECT *, row_number() OVER (ORDER BY rem DESC, source) AS rk
        |  FROM q),
        |lo AS (SELECT 1000000 - CAST(sum(base) AS BIGINT) AS left_over FROM q)
        |SELECT source, toks,
        |  CAST(base + CASE WHEN rk <= left_over THEN 1 ELSE 0 END AS BIGINT)
        |    AS alloc_tokens
        |FROM r, lo""".stripMargin,
    // replays selectToBudget: the apportionment CTEs (q110's, at budget
    // 10000) + one per-source md5-order cumsum — the oracle can afford
    // the plain window; the Spark side's segmented form is order-identical
    // because the bucket is a PREFIX of the order key
    "q119_budget_select" ->
      """WITH ps AS (SELECT source,
        |    CAST(sum(len(string_split(text,' '))) AS BIGINT) AS toks
        |  FROM documents GROUP BY 1),
        |tot AS (SELECT CAST(sum(toks) AS BIGINT) AS tt FROM ps),
        |q AS (SELECT source, toks, (10000 * toks) // tt AS base,
        |    (10000 * toks) % tt AS rem FROM ps, tot),
        |r AS (SELECT *, row_number() OVER (ORDER BY rem DESC, source) AS rk
        |  FROM q),
        |lo AS (SELECT 10000 - CAST(sum(base) AS BIGINT) AS left_over FROM q),
        |alloc AS (SELECT source,
        |  CAST(base + CASE WHEN rk <= left_over THEN 1 ELSE 0 END AS BIGINT)
        |    AS alloc_tokens
        |  FROM r, lo),
        |t AS (SELECT doc_id, source,
        |  CAST(len(string_split(text,' ')) AS BIGINT) AS nt,
        |  md5('sel:'||CAST(doc_id AS VARCHAR)) AS mk FROM documents),
        |c AS (SELECT doc_id, source, CAST(sum(nt) OVER (PARTITION BY source
        |  ORDER BY mk, doc_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        |  FROM t)
        |SELECT c.doc_id, c.source FROM c JOIN alloc a ON c.source = a.source
        |WHERE c.cum <= a.alloc_tokens""".stripMargin,
    "q122_shard_snake" ->
      """WITH d AS (SELECT doc_id,
        |    CAST(len(string_split(text,' ')) AS INT) AS n_toks
        |  FROM documents),
        |r AS (SELECT doc_id, n_toks,
        |    CAST(row_number() OVER (ORDER BY n_toks DESC, doc_id) AS BIGINT)
        |      AS rank
        |  FROM d)
        |SELECT doc_id, n_toks, rank,
        |  CAST(CASE WHEN (rank-1)%16 < 8 THEN (rank-1)%16
        |       ELSE 15-((rank-1)%16) END AS INT) AS shard
        |FROM r""".stripMargin,
    "q100_scd2" ->
      """SELECT user_id, event_type, epoch_us(ts) AS valid_from_us,
        |  coalesce(lead(epoch_us(ts)) OVER (
        |      PARTITION BY user_id ORDER BY epoch_us(ts), event_id),
        |    4611686018427387904) AS valid_to_us
        |FROM events""".stripMargin,
    "q101_pit_join" ->
      """WITH dim AS (
        |  SELECT user_id, CAST(floor(value*100) AS BIGINT) AS state_cents,
        |    epoch_us(ts) AS valid_from_us,
        |    coalesce(lead(epoch_us(ts)) OVER (
        |        PARTITION BY user_id ORDER BY epoch_us(ts), event_id),
        |      4611686018427387904) AS valid_to_us
        |  FROM events WHERE event_type = 'purchase')
        |SELECT f.event_id, f.user_id, d.state_cents, d.valid_from_us,
        |  d.valid_to_us
        |FROM events f JOIN dim d ON f.user_id = d.user_id
        |  AND epoch_us(f.ts) >= d.valid_from_us
        |  AND epoch_us(f.ts) < d.valid_to_us
        |WHERE f.event_type = 'click'""".stripMargin,
    "q102_outliers" ->
      """WITH counts AS (
        |  SELECT event_type, epoch_us(date_trunc('hour', ts)) AS hr_us,
        |    count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |stats AS (SELECT event_type, count(*) AS h, sum(n) AS t,
        |    sum(n*n) AS s2
        |  FROM counts GROUP BY 1)
        |SELECT c.event_type, c.hr_us, CAST(c.n AS BIGINT) AS n
        |FROM counts c JOIN stats s USING (event_type)
        |WHERE c.n*s.h > s.t
        |  AND (c.n*s.h - s.t)*(c.n*s.h - s.t) > 4*(s.h*s.s2 - s.t*s.t)""".stripMargin,
    "q103_triangles" ->
      """WITH p AS (SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        |  FROM lineitem a JOIN lineitem b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey)
        |SELECT
        |  (SELECT count(DISTINCT x) FROM
        |    (SELECT u AS x FROM p UNION ALL SELECT v AS x FROM p)) AS n_nodes,
        |  (SELECT count(*) FROM p) AS n_edges,
        |  (SELECT count(*) FROM p e1
        |    JOIN p e2 ON e1.v = e2.u
        |    JOIN p e3 ON e1.u = e3.u AND e2.v = e3.v) AS n_triangles""".stripMargin,
    // Replays the md5 edge sampling, the exact count on the sparsified
    // graph, the ×64 scale-up, and the floor(3·sqrt) spread column.
    "q131_triangles_approx" ->
      """WITH p AS (SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        |  FROM lineitem a JOIN lineitem b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
        |sp AS (SELECT u, v FROM p
        |  WHERE ('0x'||substr(md5('tri:'||CAST(u AS VARCHAR)||':'||
        |    CAST(v AS VARCHAR)),1,7))::BIGINT % 4 < 1),
        |tri AS (SELECT count(*) AS t FROM sp e1
        |  JOIN sp e2 ON e1.v = e2.u
        |  JOIN sp e3 ON e1.u = e3.u AND e2.v = e3.v)
        |SELECT (SELECT count(*) FROM p) AS n_edges,
        |  (SELECT count(*) FROM sp) AS n_edges_sampled,
        |  t AS tri_sampled,
        |  t * 64 AS est_triangles,
        |  CAST(floor(3 * sqrt(CAST(t AS DOUBLE))) AS BIGINT) * 64 AS est_pm3sd
        |FROM tri""".stripMargin,
    "q104_pagerank" ->
      """WITH p AS (SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        |  FROM lineitem a JOIN lineitem b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
        |sym AS (SELECT u AS src, v AS dst FROM p
        |  UNION ALL SELECT v AS src, u AS dst FROM p),
        |deg AS (SELECT src, count(*) AS d FROM sym GROUP BY 1),
        |pr0 AS (SELECT src AS node, CAST(1000000 AS BIGINT) AS pr FROM deg),
        |c1 AS (SELECT node, pr // d AS c FROM pr0 JOIN deg ON node = src),
        |pr1 AS (SELECT dst AS node,
        |    CAST(150000 + (85 * sum(c)) // 100 AS BIGINT) AS pr
        |  FROM sym JOIN c1 ON src = node GROUP BY dst),
        |c2 AS (SELECT node, pr // d AS c FROM pr1 JOIN deg ON node = src),
        |pr2 AS (SELECT dst AS node,
        |    CAST(150000 + (85 * sum(c)) // 100 AS BIGINT) AS pr
        |  FROM sym JOIN c2 ON src = node GROUP BY dst),
        |c3 AS (SELECT node, pr // d AS c FROM pr2 JOIN deg ON node = src),
        |pr3 AS (SELECT dst AS node,
        |    CAST(150000 + (85 * sum(c)) // 100 AS BIGINT) AS pr
        |  FROM sym JOIN c3 ON src = node GROUP BY dst)
        |SELECT node, pr FROM pr3""".stripMargin,
    "q105_cooccur" ->
      """SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        |FROM lineitem a JOIN lineitem b
        |  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey""".stripMargin,
    "q98_concurrency" ->
      """WITH pts AS (
        |  SELECT event_type, epoch_us(ts) AS t, 1 AS delta FROM events
        |  UNION ALL
        |  SELECT event_type, epoch_us(ts) + 1800000000 AS t, -1 AS delta
        |  FROM events),
        |run AS (SELECT event_type,
        |  sum(delta) OVER (PARTITION BY event_type ORDER BY t, delta) AS cur
        |  FROM pts)
        |SELECT event_type, CAST(max(cur) AS BIGINT) AS max_concurrent
        |FROM run GROUP BY 1""".stripMargin,
    "q99_user_paths" ->
      """SELECT user_id, count(*) AS n_events,
        |  string_agg(event_type, '>' ORDER BY epoch_us(ts), event_id) AS path
        |FROM events GROUP BY 1""".stripMargin,
    "q91_hop_window" ->
      """WITH e AS (SELECT epoch_us(ts) AS us, event_type FROM events),
        |x AS (SELECT event_type,
        |  ((us // 1800000000) - i) * 1800000000 AS win_start_us
        |  FROM e CROSS JOIN (SELECT unnest([0,1]) AS i)
        |  WHERE ((us // 1800000000) - i) * 1800000000 + 3600000000 > us)
        |SELECT win_start_us, event_type, count(*) AS n
        |FROM x GROUP BY 1, 2""".stripMargin,
    "q93_histogram" ->
      """SELECT CAST(floor(l_extendedprice*100) AS BIGINT) // 500000 AS bucket,
        |  count(*) AS n,
        |  CAST(min(floor(l_extendedprice*100)) AS BIGINT) AS lo,
        |  CAST(max(floor(l_extendedprice*100)) AS BIGINT) AS hi
        |FROM lineitem GROUP BY 1""".stripMargin,
    "q94_hot_hours" ->
      """WITH h AS (SELECT date_trunc('hour', ts) AS hr, count(*) AS n
        |  FROM events GROUP BY 1),
        |t AS (SELECT CAST(sum(n) AS BIGINT) AS total, count(*) AS nh FROM h)
        |SELECT epoch_us(hr) AS hr_us, n FROM h, t
        |WHERE 2 * n * nh > 3 * total""".stripMargin,
    "q86_rank_fns" ->
      """WITH t AS (SELECT l_orderkey, l_linenumber, l_returnflag,
        |  CAST(floor(l_extendedprice*100) AS BIGINT) AS cents FROM lineitem)
        |SELECT l_orderkey, l_linenumber,
        |  CAST(rank() OVER w AS INT) AS rnk,
        |  CAST(dense_rank() OVER w AS INT) AS drnk,
        |  percent_rank() OVER w AS prank, cume_dist() OVER w AS cdist
        |FROM t
        |WINDOW w AS (PARTITION BY l_returnflag
        |  ORDER BY cents, l_orderkey, l_linenumber)""".stripMargin,
    "q87_islands" ->
      """WITH days AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
        |g AS (SELECT user_id, d,
        |  date_diff('day', DATE '1970-01-01', d)
        |    - row_number() OVER (PARTITION BY user_id ORDER BY d) AS grp
        |  FROM days),
        |runs AS (SELECT user_id, grp, count(*) AS run_days FROM g GROUP BY 1, 2)
        |SELECT user_id, CAST(count(*) AS INT) AS n_islands,
        |  CAST(max(run_days) AS INT) AS longest_run_days
        |FROM runs GROUP BY user_id""".stripMargin,
    // Per-column UNION of scans — the naive shape; the Spark side does
    // one scan + stack.
    "q83_profile" ->
      """SELECT 'o_orderkey' AS column_name, count(*) AS n_rows,
        |  count(*) - count(o_orderkey) AS n_nulls,
        |  count(DISTINCT o_orderkey) AS n_distinct,
        |  CAST(min(o_orderkey) AS VARCHAR) AS min_s,
        |  CAST(max(o_orderkey) AS VARCHAR) AS max_s
        |FROM orders
        |UNION ALL
        |SELECT 'o_custkey', count(*), count(*) - count(o_custkey),
        |  count(DISTINCT o_custkey),
        |  CAST(min(o_custkey) AS VARCHAR), CAST(max(o_custkey) AS VARCHAR)
        |FROM orders
        |UNION ALL
        |SELECT 'o_orderstatus', count(*), count(*) - count(o_orderstatus),
        |  count(DISTINCT o_orderstatus), min(o_orderstatus), max(o_orderstatus)
        |FROM orders
        |UNION ALL
        |SELECT 'o_totalprice_cents', count(*), count(*) - count(o_totalprice),
        |  count(DISTINCT CAST(floor(o_totalprice*100) AS BIGINT)),
        |  CAST(min(CAST(floor(o_totalprice*100) AS BIGINT)) AS VARCHAR),
        |  CAST(max(CAST(floor(o_totalprice*100) AS BIGINT)) AS VARCHAR)
        |FROM orders
        |UNION ALL
        |SELECT 'o_orderdate_day', count(*), count(*) - count(o_orderdate),
        |  count(DISTINCT CAST(o_orderdate AS DATE)),
        |  CAST(min(CAST(o_orderdate AS DATE)) AS VARCHAR),
        |  CAST(max(CAST(o_orderdate AS DATE)) AS VARCHAR)
        |FROM orders
        |UNION ALL
        |SELECT 'o_orderpriority', count(*), count(*) - count(o_orderpriority),
        |  count(DISTINCT o_orderpriority), min(o_orderpriority), max(o_orderpriority)
        |FROM orders""".stripMargin,
    // n_distinct_lo replays Spark's md5-bucket witness exactly (md5 of the
    // value's string rendering, first 3 hex chars — engine-portable);
    // approx_ok is asserted TRUE: the Spark side folds its HLL value into
    // certified bounds, so sketch breakage hash-fails here.
    "q138_profile_drift" -> {
      val branches = ProfileCols.map { c =>
        val isInt = c != "o_orderstatus" && c != "o_orderpriority"
        val v = if (isInt) s"CAST($c AS VARCHAR)" else c
        s"""SELECT drop_id, '$c' AS column_name, count(*) AS n_rows,
           |  ((count(*) - count($c)) * 1000000) // count(*) AS null_ppm,
           |  count(DISTINCT substr(md5($v),1,3)) AS n_distinct_lo,
           |  CAST(min($c) AS VARCHAR) AS min_s,
           |  CAST(max($c) AS VARCHAR) AS max_s
           |FROM o GROUP BY 1""".stripMargin
      }
      s"""WITH o AS (SELECT *,
         |  CAST(floor(o_totalprice * 100) AS BIGINT) AS o_totalprice_cents,
         |  'drop' || CAST(o_orderkey % 3 AS VARCHAR) AS drop_id
         |  FROM orders),
         |d AS (${branches.mkString("\nUNION ALL\n")})
         |SELECT *,
         |  n_rows - lag(n_rows) OVER w AS d_rows,
         |  null_ppm - lag(null_ppm) OVER w AS d_null_ppm,
         |  n_distinct_lo - lag(n_distinct_lo) OVER w AS d_distinct_lo
         |FROM d WINDOW w AS (PARTITION BY column_name ORDER BY drop_id)""".stripMargin
    },
    "q146_manifest" -> manifestOracle("TRUE"),
    // q154 serves the SAME manifest from per-drop partials (the three
    // drops cover the whole table); q155 removed drop c (% 3 = 0), so
    // its exact oracle is the replay over the remaining rows
    "q154_manifest_store" -> manifestOracle("TRUE"),
    "q155_manifest_takedown" -> manifestOracle("doc_id % 3 <> 0"),
    "q143_heavy_hitters" ->
      """WITH w AS (SELECT unnest(string_split(text, ' ')) AS token
        |  FROM documents WHERE text IS NOT NULL)
        |SELECT token, count(*) AS cnt FROM w
        |GROUP BY token
        |HAVING count(*) * 29 >= (SELECT count(*) FROM w)""".stripMargin,
    "q136_profile_store" -> profileServeOracle(takedown = false),
    // q140 removed drop1 (o_orderkey % 3 == 1); partials re-merge, so
    // the exact oracle is the q136 replay over the REMAINING rows
    "q140_profile_takedown" -> profileServeOracle(takedown = true),
    "q115_profile_approx" ->
      """SELECT 'o_orderkey' AS column_name, count(*) AS n_rows,
        |  count(*) - count(o_orderkey) AS n_nulls,
        |  count(DISTINCT substr(md5(CAST(o_orderkey AS VARCHAR)),1,3)) AS n_distinct_lo,
        |  TRUE AS approx_ok,
        |  CAST(min(o_orderkey) AS VARCHAR) AS min_s,
        |  CAST(max(o_orderkey) AS VARCHAR) AS max_s
        |FROM orders
        |UNION ALL
        |SELECT 'o_custkey', count(*), count(*) - count(o_custkey),
        |  count(DISTINCT substr(md5(CAST(o_custkey AS VARCHAR)),1,3)), TRUE,
        |  CAST(min(o_custkey) AS VARCHAR), CAST(max(o_custkey) AS VARCHAR)
        |FROM orders
        |UNION ALL
        |SELECT 'o_orderstatus', count(*), count(*) - count(o_orderstatus),
        |  count(DISTINCT substr(md5(o_orderstatus),1,3)), TRUE,
        |  min(o_orderstatus), max(o_orderstatus)
        |FROM orders
        |UNION ALL
        |SELECT 'o_totalprice_cents', count(*), count(*) - count(o_totalprice),
        |  count(DISTINCT substr(md5(CAST(CAST(floor(o_totalprice*100) AS BIGINT)
        |    AS VARCHAR)),1,3)), TRUE,
        |  CAST(min(CAST(floor(o_totalprice*100) AS BIGINT)) AS VARCHAR),
        |  CAST(max(CAST(floor(o_totalprice*100) AS BIGINT)) AS VARCHAR)
        |FROM orders
        |UNION ALL
        |SELECT 'o_orderdate_day', count(*), count(*) - count(o_orderdate),
        |  count(DISTINCT substr(md5(CAST(CAST(o_orderdate AS DATE) AS VARCHAR)),1,3)),
        |  TRUE,
        |  CAST(min(CAST(o_orderdate AS DATE)) AS VARCHAR),
        |  CAST(max(CAST(o_orderdate AS DATE)) AS VARCHAR)
        |FROM orders
        |UNION ALL
        |SELECT 'o_orderpriority', count(*), count(*) - count(o_orderpriority),
        |  count(DISTINCT substr(md5(o_orderpriority),1,3)), TRUE,
        |  min(o_orderpriority), max(o_orderpriority)
        |FROM orders""".stripMargin,
    "q84_unpivot" ->
      """WITH w AS (
        |  SELECT l_returnflag,
        |    CAST(sum(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
        |    CAST(sum(CAST(floor(l_extendedprice*100) AS BIGINT)) AS BIGINT)
        |      AS sum_price_cents,
        |    count(*) AS n_items
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS value FROM w
        |UNION ALL
        |SELECT l_returnflag, 'sum_price_cents', sum_price_cents FROM w
        |UNION ALL
        |SELECT l_returnflag, 'n_items', n_items FROM w""".stripMargin,
    "q85_full_outer" ->
      """WITH o AS (SELECT CAST(o_orderdate AS DATE) AS d, count(*) AS n_orders
        |  FROM orders GROUP BY 1),
        |l AS (SELECT CAST(l_shipdate AS DATE) AS d, count(*) AS n_ships
        |  FROM lineitem GROUP BY 1)
        |SELECT CAST(coalesce(o.d, l.d) AS VARCHAR) AS day,
        |  coalesce(n_orders, 0) AS n_orders, coalesce(n_ships, 0) AS n_ships,
        |  CASE WHEN o.d IS NULL THEN 'ship_only'
        |       WHEN l.d IS NULL THEN 'order_only' ELSE 'both' END AS presence
        |FROM o FULL OUTER JOIN l ON o.d = l.d""".stripMargin,
    "q82_retention" ->
      """WITH cohort AS (
        |  SELECT user_id, min(CAST(ts AS DATE)) AS cohort_day FROM events
        |  WHERE event_type = 'signup' GROUP BY user_id
        |), act AS (
        |  SELECT DISTINCT e.user_id, c.cohort_day,
        |    date_diff('day', c.cohort_day, CAST(e.ts AS DATE)) AS offset_day
        |  FROM events e JOIN cohort c USING (user_id)
        |  WHERE CAST(e.ts AS DATE) >= c.cohort_day
        |)
        |SELECT cohort_day::VARCHAR AS cohort_day,
        |  CAST(offset_day AS INT) AS offset_day, count(*) AS n_users
        |FROM act GROUP BY 1, 2""".stripMargin,
    // Same chained-min shape as the Spark fold: each CTE joins the stage's
    // keys back to events and takes the conditional earliest-next.
    "q81_funnel" ->
      """WITH v AS (
        |  SELECT user_id, min(epoch_us(ts)) AS view_us FROM events
        |  WHERE event_type = 'view' GROUP BY user_id
        |), c AS (
        |  SELECT v.user_id, v.view_us,
        |    min(CASE WHEN e.event_type = 'click' AND epoch_us(e.ts) > v.view_us
        |          AND epoch_us(e.ts) <= v.view_us + 86400000000 THEN epoch_us(e.ts) END)
        |      AS click_us
        |  FROM v LEFT JOIN events e ON e.user_id = v.user_id
        |  GROUP BY v.user_id, v.view_us
        |), p AS (
        |  SELECT c.user_id, c.view_us, c.click_us,
        |    min(CASE WHEN c.click_us IS NOT NULL AND e.event_type = 'purchase'
        |          AND epoch_us(e.ts) > c.click_us
        |          AND epoch_us(e.ts) <= c.click_us + 86400000000 THEN epoch_us(e.ts) END)
        |      AS purchase_us
        |  FROM c LEFT JOIN events e ON e.user_id = c.user_id
        |  GROUP BY c.user_id, c.view_us, c.click_us
        |)
        |SELECT user_id, view_us, click_us, purchase_us,
        |  CAST(1 + CASE WHEN click_us IS NOT NULL THEN 1 ELSE 0 END
        |         + CASE WHEN purchase_us IS NOT NULL THEN 1 ELSE 0 END AS INT) AS stage
        |FROM p""".stripMargin,
    "q32_cube" ->
      """SELECT event_type, CAST(ts AS DATE)::VARCHAR AS day,
        |  count(*) AS n,
        |  CAST(sum(CAST(floor(value*1000) AS BIGINT)) AS BIGINT) AS milli_sum
        |FROM events GROUP BY CUBE (event_type, day)""".stripMargin,
    "q33_pivot" ->
      """SELECT CAST(ts AS DATE)::VARCHAR AS day,
        |  CAST(sum(CASE WHEN event_type='click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
        |  CAST(sum(CASE WHEN event_type='view' THEN 1 ELSE 0 END) AS BIGINT) AS view,
        |  CAST(sum(CASE WHEN event_type='purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
        |  CAST(sum(CASE WHEN event_type='signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
        |  CAST(sum(CASE WHEN event_type='error' THEN 1 ELSE 0 END) AS BIGINT) AS error
        |FROM events GROUP BY 1""".stripMargin,
    "q34_json" ->
      """WITH t AS (SELECT CAST(json_extract(props, '$.k') AS INT) AS k FROM events)
        |SELECT k % 10 AS k_mod, count(*) AS n, min(k) AS k_min, max(k) AS k_max
        |FROM t GROUP BY 1""".stripMargin,
    "q35_window_fns" ->
      """WITH t AS (SELECT o_orderkey, o_custkey, o_orderdate,
        |  CAST(floor(o_totalprice*100) AS BIGINT) AS cents FROM orders)
        |SELECT o_orderkey, o_custkey,
        |  CAST(row_number() OVER w AS INT) AS rn,
        |  lag(cents, 1) OVER w AS prev_cents,
        |  lead(cents, 1) OVER w AS next_cents,
        |  CAST(ntile(4) OVER w AS INT) AS quartile
        |FROM t WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""".stripMargin,
    "q36_sessionize" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id FROM events),
        |g AS (SELECT user_id,
        |  CASE WHEN ts_us - lag(ts_us) OVER w <= 1800000000 THEN 0 ELSE 1 END AS new_sess
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id))
        |SELECT user_id, CAST(sum(new_sess) AS BIGINT) AS n_sessions,
        |  count(*) AS n_events
        |FROM g GROUP BY user_id""".stripMargin,
    "q37_longest_run" ->
      """WITH e AS (SELECT user_id, event_type,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
        |    row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS rn_t
        |  FROM events),
        |runs AS (SELECT user_id, event_type, count(*) AS run_len
        |  FROM e GROUP BY user_id, event_type, rn - rn_t),
        |best AS (SELECT user_id, max(run_len) AS m FROM runs GROUP BY user_id)
        |SELECT r.user_id, CAST(r.run_len AS INT) AS run_len,
        |  min(r.event_type) AS run_type
        |FROM runs r JOIN best b ON r.user_id = b.user_id AND r.run_len = b.m
        |GROUP BY r.user_id, r.run_len""".stripMargin,
    "q38_pipe" ->
      "SELECT doc_id, n_chars*3+7 AS derived FROM documents",
    "q39_percentiles" ->
      """WITH t AS (SELECT o_orderpriority,
        |  CAST(floor(o_totalprice*100) AS BIGINT) AS cents FROM orders)
        |SELECT o_orderpriority,
        |  quantile_cont(cents, 0.5) AS median_cents,
        |  quantile_cont(cents, 0.95) AS p95_cents,
        |  count(*) AS n
        |FROM t GROUP BY 1""".stripMargin,
    "q40_multimodal" ->
      """SELECT doc_id, CAST(octet_length(encode(text)) AS INT) AS n_bytes,
        |  md5(text) AS md5_hex,
        |  md5(array_to_string(list_transform(
        |    range(1, length(text)+1, 10), i -> substr(text, CAST(i AS INT), 1)), ''))
        |    AS strided_md5
        |FROM documents""".stripMargin,
    "q67_blob_dedup" ->
      """SELECT md5(text) AS content_md5, count(*) AS n_copies,
        |  min(doc_id) AS keeper_id
        |FROM documents GROUP BY 1""".stripMargin,
    "q41_event_hourly" ->
      """SELECT epoch_us(date_trunc('hour', ts)) AS hour_start_us,
        |  event_type, count(*) AS n
        |FROM events GROUP BY 1, 2""".stripMargin,
    "q42_array_fns" ->
      """WITH t AS (SELECT l_orderkey, list_sort(list(l_linenumber)) AS lns
        |  FROM lineitem GROUP BY 1)
        |SELECT l_orderkey,
        |  CAST(len(lns) AS INT) AS n_lines,
        |  lns[1] AS ln_first,
        |  lns[-1] AS ln_last,
        |  CASE WHEN list_contains(lns, 1) THEN 1 ELSE 0 END AS has_one
        |FROM t""".stripMargin,
    "q46_grouping_sets" ->
      """SELECT o_orderpriority, o_orderstatus, count(*) AS n,
        |  CAST(CASE WHEN o_orderpriority IS NULL AND o_orderstatus IS NULL THEN 3
        |       WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END AS INT) AS gid
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
        |  (o_orderpriority), ())""".stripMargin,
    "q70_resample" ->
      """WITH ev AS (SELECT event_type, date_trunc('hour', ts) AS h,
        |    CAST(floor(value) AS BIGINT) AS v FROM events),
        |agg AS (SELECT event_type, h, count(*) AS n,
        |    CAST(sum(v) AS BIGINT) AS sv FROM ev GROUP BY 1, 2),
        |spans AS (SELECT event_type, min(h) AS h0, max(h) AS h1 FROM agg GROUP BY 1),
        |grid AS (SELECT event_type,
        |    unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h FROM spans)
        |SELECT g.event_type, epoch_us(g.h) AS hour_us,
        |  coalesce(a.n, 0) AS n, coalesce(a.sv, 0) AS sv,
        |  coalesce(last_value(a.sv IGNORE NULLS) OVER (PARTITION BY g.event_type
        |    ORDER BY g.h ROWS UNBOUNDED PRECEDING), 0) AS sv_ffill
        |FROM grid g LEFT JOIN agg a
        |  ON g.event_type = a.event_type AND g.h = a.h""".stripMargin,
    "q68_exists" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |    WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000)
        |  AND NOT EXISTS (SELECT 1 FROM orders o2
        |    WHERE o2.o_custkey = c.c_custkey AND o2.o_orderstatus = 'F')""".stripMargin,
    "q69_scalar_subquery" ->
      """SELECT c_custkey,
        |  (SELECT count(*) FROM orders o WHERE o.o_custkey = c.c_custkey)
        |    AS n_orders
        |FROM customer c
        |WHERE CAST(floor(c_acctbal*100) AS BIGINT) >
        |  (SELECT CAST(floor(CAST(sum(CAST(floor(c_acctbal*100) AS BIGINT)) AS BIGINT)
        |    / count(*)) AS BIGINT) FROM customer)""".stripMargin,
    "q73_lateral" ->
      """SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
        |FROM customer c JOIN LATERAL (
        |  SELECT o_orderkey, o_totalprice FROM orders
        |  WHERE o_custkey = c.c_custkey
        |  ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 2) o ON true""".stripMargin,
    "q47_exact_stats" ->
      """WITH t AS (SELECT l_returnflag,
        |    CAST(l_quantity AS BIGINT) AS x,
        |    CAST(floor(l_extendedprice) AS BIGINT) AS y
        |  FROM lineitem),
        |a AS (SELECT l_returnflag, count(*) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(x*y) AS BIGINT) AS sxy,
        |    CAST(sum(x*x) AS BIGINT) AS sxx,
        |    CAST(sum(y*y) AS BIGINT) AS syy
        |  FROM t GROUP BY 1)
        |SELECT l_returnflag, n,
        |  (n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE)
        |    / (n::DOUBLE * (n::DOUBLE - 1.0)) AS var_x,
        |  sqrt((n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE)
        |    / (n::DOUBLE * (n::DOUBLE - 1.0))) AS stddev_x,
        |  (n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
        |    / (sqrt(n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE)
        |       * sqrt(n::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE)) AS corr_xy
        |FROM a""".stripMargin,
    "q43_string_fns" ->
      """SELECT p_partkey,
        |  regexp_replace(p_name, '[aeiou]', '', 'g') AS devoweled,
        |  translate(p_name, 'abc', 'xyz') AS translated,
        |  lpad(p_brand, 12, '*') AS padded,
        |  reverse(p_type) AS reversed,
        |  CAST(strpos(p_name, 'a') AS INT) AS a_pos,
        |  string_split(p_type, ' ')[1] AS first_word
        |FROM part""".stripMargin
  )

  /** q111's bucketed tables, built ONCE per (session, sf-dir) and reused:
    * re-invocations (Verify then Bench's min-of-3) read the same buckets
    * instead of leaking a full lineitem+orders copy per run — which also
    * makes the bench measure the bucketed READ path, the thing bucketing
    * exists to pay for at write time. Table names carry a per-JVM nonce
    * so two sessions sharing a metastore never race on a fixed name; the
    * temp dirs are removed on JVM exit.
    */
  private val bucketedTables =
    new java.util.concurrent.ConcurrentHashMap[(Int, String), (String, String)]()
  private val fixtureNonce = java.util.UUID.randomUUID().toString.take(8)

  /** q136's store, built ONCE per (session, sf-dir): orders split into
    * three drops by o_orderkey % 3, bootstrapped with build + two appends
    * so the gated serve path covers the whole store lifecycle. Temp dir
    * removed on JVM exit; reuse is safe because serve never mutates.
    */
  private val profileStores =
    new java.util.concurrent.ConcurrentHashMap[(Int, String), String]()

  private val ProfileCols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
    "o_totalprice_cents", "o_orderpriority")

  private[graft] def profileStoreFixture(s: SparkSession, dir: String): String =
    profileStores.computeIfAbsent((System.identityHashCode(s), dir), { _ =>
      val storeDir = java.nio.file.Files
        .createTempDirectory("graft-profstore").toString
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        import java.nio.file.{Files => F, Paths}
        import scala.jdk.CollectionConverters._
        val p = Paths.get(storeDir)
        if (F.exists(p))
          F.walk(p).iterator().asScala.toSeq.reverseIterator
            .foreach(q => F.deleteIfExists(q))
      }))
      profileStoreBuild(s, dir, storeDir)
      storeDir
    })

  /** q154/q155's manifest store: the documents table as three drops by
    * doc_id % 3 (build + two atomic appends, q146's key/columns/shards);
    * the takedown variant then removes drop "c" (% 3 == 0). Serve never
    * mutates, so session-wide reuse is safe.
    */
  private[graft] def manifestStoreFixture(s: SparkSession, dir: String): String =
    profileStores.computeIfAbsent((System.identityHashCode(s), dir + "#manifest"), { _ =>
      val storeDir = java.nio.file.Files
        .createTempDirectory("graft-manifeststore").toString
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        import java.nio.file.{Files => F, Paths}
        import scala.jdk.CollectionConverters._
        val p = Paths.get(storeDir)
        if (F.exists(p))
          F.walk(p).iterator().asScala.toSeq.reverseIterator
            .foreach(q => F.deleteIfExists(q))
      }))
      manifestStoreBuild(s, dir, storeDir, withC = true)
      storeDir
    })

  private[graft] def manifestTakedownFixture(s: SparkSession, dir: String): String =
    profileStores.computeIfAbsent((System.identityHashCode(s), dir + "#manifest-td"), { _ =>
      val storeDir = java.nio.file.Files
        .createTempDirectory("graft-manifeststore-td").toString
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        import java.nio.file.{Files => F, Paths}
        import scala.jdk.CollectionConverters._
        val p = Paths.get(storeDir)
        if (F.exists(p))
          F.walk(p).iterator().asScala.toSeq.reverseIterator
            .foreach(q => F.deleteIfExists(q))
      }))
      manifestStoreBuild(s, dir, storeDir, withC = true)
      graft.operators.ManifestStore.removeDrop(s, storeDir, "c")
      storeDir
    })

  private[graft] def manifestStoreBuild(s: SparkSession, dir: String,
                                        storeDir: String,
                                        withC: Boolean): Unit = {
    import graft.operators.ManifestStore
    val d = Tables(s, dir).documents
    val cols = Seq("text", "lang", "source", "n_chars")
    ManifestStore.build(d.filter(col("doc_id") % 3 === 1), storeDir, "a",
      "doc_id", cols)
    ManifestStore.append(d.filter(col("doc_id") % 3 === 2), storeDir, "b",
      "doc_id", cols)
    if (withC)
      ManifestStore.append(d.filter(col("doc_id") % 3 === 0), storeDir, "c",
        "doc_id", cols)
  }

  /** q146's manifest replay, with `filter` restricting which DOCS
    * participate — "TRUE" for the full table (q146/q154), the surviving
    * split for the q155 takedown.
    */
  private def manifestOracle(filter: String): String =
    s"""WITH r AS (SELECT
       |  CAST(('0x'||substr(md5('manifest:'||CAST(doc_id AS VARCHAR)),1,7))::BIGINT
       |    % 8 AS INT) AS shard,
       |  ('0x'||substr(md5(concat_ws(chr(1),
       |    coalesce(CAST(doc_id AS VARCHAR), chr(2)),
       |    coalesce(text, chr(2)),
       |    coalesce(lang, chr(2)),
       |    coalesce(source, chr(2)),
       |    coalesce(CAST(n_chars AS VARCHAR), chr(2)))),1,15))::BIGINT AS fp
       |  FROM documents WHERE $filter)
       |SELECT shard, count(*) AS n_rows, bit_xor(fp) AS xor_fp,
       |  CAST(sum(fp % 1000003) AS BIGINT) AS sum_fp
       |FROM r GROUP BY shard""".stripMargin

  /** q136's serve replay over orders — with `takedown`, over orders
    * minus q140's removed drop (o_orderkey % 3 == 1).
    */
  private def profileServeOracle(takedown: Boolean): String = {
    val kinds = Map("o_orderkey" -> "i", "o_custkey" -> "i",
      "o_orderstatus" -> "s", "o_totalprice_cents" -> "i",
      "o_orderpriority" -> "s")
    val branches = ProfileCols.map { c =>
      val v = if (kinds(c) == "i") s"CAST($c AS VARCHAR)" else c
      s"""SELECT '$c' AS column_name, count(*) AS n_rows,
         |  count(*) - count($c) AS n_nulls,
         |  count(DISTINCT substr(md5($v),1,3)) AS n_distinct_lo,
         |  TRUE AS approx_ok,
         |  CAST(min($c) AS VARCHAR) AS min_s,
         |  CAST(max($c) AS VARCHAR) AS max_s
         |FROM o""".stripMargin
    }
    val where = if (takedown) "WHERE o_orderkey % 3 <> 1" else ""
    s"""WITH o AS (SELECT *,
       |  CAST(floor(o_totalprice * 100) AS BIGINT) AS o_totalprice_cents
       |  FROM orders $where)
       |${branches.mkString("\nUNION ALL\n")}""".stripMargin
  }

  /** q140's store: q136's three-drop build followed by
    * `ProfileStore.removeDrop("drop1")` — the served stats must equal a
    * store that never saw o_orderkey % 3 == 1. Separate dir from
    * [[profileStoreFixture]] (q136/q138 keep the intact store).
    */
  private[graft] def profileTakedownFixture(s: SparkSession, dir: String): String =
    profileStores.computeIfAbsent((System.identityHashCode(s), dir + "#takedown"), { _ =>
      val storeDir = java.nio.file.Files
        .createTempDirectory("graft-profstore-td").toString
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        import java.nio.file.{Files => F, Paths}
        import scala.jdk.CollectionConverters._
        val p = Paths.get(storeDir)
        if (F.exists(p))
          F.walk(p).iterator().asScala.toSeq.reverseIterator
            .foreach(q => F.deleteIfExists(q))
      }))
      profileStoreBuild(s, dir, storeDir)
      graft.operators.ProfileStore.removeDrop(s, storeDir, "drop1")
      storeDir
    })

  /** The three-drop build q136's fixture (and Bench's q136_build row)
    * runs: orders split by o_orderkey % 3, bootstrap + two appends.
    */
  private[graft] def profileStoreBuild(s: SparkSession, dir: String,
                                       storeDir: String): Unit = {
    val o = Tables(s, dir).orders.withColumn("o_totalprice_cents",
      expr("CAST(floor(o_totalprice * 100) AS BIGINT)"))
    graft.operators.ProfileStore.build(
      o.filter(col("o_orderkey") % 3 === 0), ProfileCols, storeDir, "drop0")
    graft.operators.ProfileStore.append(
      o.filter(col("o_orderkey") % 3 === 1), ProfileCols, storeDir, "drop1")
    graft.operators.ProfileStore.append(
      o.filter(col("o_orderkey") % 3 === 2), ProfileCols, storeDir, "drop2")
  }

  private def bucketedFixture(s: SparkSession, dir: String): (String, String) =
    bucketedTables.computeIfAbsent((System.identityHashCode(s), dir), { _ =>
      val t = Tables(s, dir)
      val wh = java.nio.file.Files.createTempDirectory("graft-bucketed")
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        import java.nio.file.{Files => F}
        import scala.jdk.CollectionConverters._
        F.walk(wh).iterator().asScala.toSeq.reverseIterator
          .foreach(p => F.deleteIfExists(p))
      }))
      val suffix = s"${fixtureNonce}_${bucketedTables.size()}"
      val (li, ord) = (s"graft_li_bucketed_$suffix", s"graft_ord_bucketed_$suffix")
      t.lineitem.select(col("l_orderkey"), col("l_extendedprice"),
          col("l_discount"))
        .write.mode("overwrite").format("parquet")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .option("path", s"$wh/li").saveAsTable(li)
      t.orders.select(col("o_orderkey"), col("o_orderpriority"))
        .write.mode("overwrite").format("parquet")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .option("path", s"$wh/ord").saveAsTable(ord)
      (li, ord)
    })
}
