package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode
import org.scalatest.funsuite.AnyFunSuite

/** Plan-regression assertions: each headline query must keep the physical
  * plan shape it was tuned to (broadcast stays broadcast, pushdown reaches
  * the scan, top-k never becomes a global sort, the hot expression stays
  * inside whole-stage codegen). These are the properties that decide
  * whether the plan survives a 100×/1000× scale-up — a silent regression
  * here (e.g. a broadcast threshold change turning a dim join into a
  * SortMergeJoin) can be invisible at sf0.001 and fatal at 100 TB, so they
  * are asserted, not just eyeballed in PLANS.md.
  */
class PlanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def q(name: String): DataFrame = SparkEntry.queries(name)(spark, sfDir)
  private def planOf(name: String): String = q(name).queryExecution.executedPlan.toString
  private def formatted(name: String): String =
    q(name).queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("q03_topk plans TakeOrderedAndProject, not a global sort") {
    val p = planOf("q03_topk")
    assert(p.contains("TakeOrderedAndProject"))
    assert(!p.contains("rangepartitioning"),
      "top-k must not range-shuffle the whole input")
  }

  test("q14_multijoin_topk keeps the top-k as TakeOrderedAndProject") {
    assert(planOf("q14_multijoin_topk").contains("TakeOrderedAndProject"))
  }

  test("q02_sort is a range-partitioned global sort") {
    assert(planOf("q02_sort").toLowerCase.contains("rangepartitioning"))
  }

  test("q19_prune pushes predicate and projection into the parquet scan") {
    val f = formatted("q19_prune")
    assert(f.contains("PushedFilters") && f.contains("EqualTo(l_partkey,42)"))
    assert(!f.contains("l_extendedprice"),
      "column pruning must drop unreferenced lineitem columns from ReadSchema")
  }

  test("q07_join_broadcast stays a broadcast hash join") {
    val p = planOf("q07_join_broadcast")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("q01_agg is a partial+final hash aggregate") {
    val p = planOf("q01_agg")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "expected map-side partial + final HashAggregate")
  }

  test("q24 LSH band join is an equi join, never a nested loop") {
    assert(!planOf("q24_minhash_pairs").contains("BroadcastNestedLoop"),
      "band-key candidate join must hash on (band_idx, band_key)")
  }

  test("q49 simhash band join is an equi join, never a nested loop") {
    assert(!planOf("q49_simhash_pairs").contains("BroadcastNestedLoop"))
  }

  test("q71 stratified-k runs through the bounded-heap TopKPerKey operator, no window sort") {
    val p = planOf("q71_stratified_k")
    assert(p.contains("TopKPerKey"), s"expected the custom operator, got:\n$p")
    assert(!p.contains("Window"), s"must not fall back to a row_number window:\n$p")
  }

  test("q73 correlated LATERAL decorrelates to a ranked join, never a per-row loop") {
    val p = planOf("q73_lateral")
    assert(p.contains("Window"), s"expected rank-based decorrelation, got:\n$p")
    assert(!p.contains("BroadcastNestedLoop"), s"must not nested-loop per customer:\n$p")
  }

  test("q68 correlated EXISTS/NOT EXISTS rewrite to semi/anti joins") {
    val p = planOf("q68_exists")
    assert(p.contains("LeftSemi") && p.contains("LeftAnti"),
      s"EXISTS must decorrelate to joins, got:\n$p")
  }

  test("q97 NOT IN plans as a null-aware broadcast hash anti join, not BNLJ") {
    val p = planOf("q97_not_in")
    assert(p.contains("LeftAnti") && !p.contains("BroadcastNestedLoop"),
      s"single-column NOT IN must take Spark's NAAJ hash path:\n$p")
    assert(p.contains("LeftAnti, BuildRight, true"),
      "the BroadcastHashJoin must carry the isNullAwareAntiJoin=true flag")
  }

  test("q95 fuzzy-pair block join is an equi join with a bounded-heap block cap") {
    val p = planOf("q95_fuzzy_pairs")
    assert(!p.contains("BroadcastNestedLoop") && !p.contains("CartesianProduct"),
      "blocked levenshtein must hash-join on the block key, not evaluate n² pairs")
    assert(p.contains("TopKPerKey"),
      "hot blocks must be capped by the bounded-heap operator — without it a " +
        "stop-word block is a single-task O(b²) straggler at scale")
    assert(!p.contains("Window"),
      "the cap must ride TopKPerKey, not a row_number window sort")
  }

  test("q61 embedding LSH candidate join is an equi join, never all-pairs") {
    val p = planOf("q61_embed_lsh_neardup")
    assert(!p.contains("BroadcastNestedLoop") && !p.contains("CartesianProduct"),
      "banded candidate join must hash on (band_idx, band_key), not evaluate n² pairs")
  }

  test("q27 evaluates vector_dot inside whole-stage codegen") {
    // Codegen spans only exist in the FINAL adaptive plan — run the query
    // through its OWN QueryExecution first (a DataFrameWriter would build a
    // separate one and leave this plan isFinalPlan=false), then inspect.
    val df = q("q27_embed_pairs")
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    val dotLines = p.linesIterator.filter(_.contains("vector_dot")).toSeq
    assert(dotLines.nonEmpty)
    assert(dotLines.exists(_.trim.stripPrefix("+- ").stripPrefix(":- ").startsWith("*(")),
      s"vector_dot must run in a WholeStageCodegen span; got:\n${dotLines.mkString("\n")}")
  }

  test("q132 fixed-suite contamination probe broadcasts the benchmark side") {
    val p = planOf("q132_contamination_fixed")
    assert(p.contains("BroadcastHashJoin"),
      s"the constant eval-suite probe must stay a broadcast hash join:\n$p")
    assert(!p.contains("SortMergeJoin"),
      "a benchmark constant in corpus size must never shuffle the corpus for the probe")
  }

  test("q50 IVF cell assignment broadcasts the centroids") {
    val p = planOf("q50_ann_ivf")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      "centroid cross join must broadcast the K-row centroid side")
  }

  test("q58 six-table join keeps region/nation broadcast and pushes the region filter") {
    val f = formatted("q58_multijoin_reorder")
    assert("BroadcastHashJoin".r.findAllIn(f).size >= 2,
      "nation and region must stay broadcast joins")
    assert(f.contains("EqualTo(r_name,ASIA)"), "region filter must reach the scan")
    assert(!f.contains("CartesianProduct") && !f.contains("BroadcastNestedLoop"))
  }

  test("q51 per-key top-k is the custom partial/final heap operator, no sort, one exchange") {
    val p = planOf("q51_topk_per_key")
    assert(p.contains("TopKPerKeyPartial") && p.contains("TopKPerKeyFinal"))
    assert(!p.contains("Sort "), "bounded-heap top-k must not sort")
    assert(!p.contains("Window"), "must not fall back to the window formulation")
    assert("Exchange".r.findAllIn(p).size === 1,
      "exactly one exchange: the heap-head shuffle inserted by EnsureRequirements")
  }

  test("q74 dense-id ranks inside md5-prefix buckets: no global range sort of the data") {
    val p = planOf("q74_dense_id")
    // the data side must hash-shuffle by bucket for the rank window; a
    // global ordering would show as rangepartitioning over the doc rows
    assert(p.toLowerCase.contains("hashpartitioning"))
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      "bucket offsets must broadcast back, not shuffle the data side again")
    // the only rangepartitioning allowed is the tiny (<=16^prefix rows)
    // offsets cumsum — assert the data-side window is the bucketed one
    assert(p.contains("windowspecdefinition(__db"),
      "the rank window must partition by the md5-prefix bucket")
  }

  test("q77 winnowing window is per-doc partitioned (no single-partition window)") {
    val p = planOf("q77_winnow")
    assert(p.contains("windowspecdefinition(doc_id"),
      "the min-hash window must partition by doc_id")
    assert(!p.contains("windowspecdefinition(ORDER"),
      "no partitionless (single-task) window in the fingerprint path")
  }

  test("q75 repetition stats are partial+final hash aggregates, no window, no sort") {
    val p = planOf("q75_repetition")
    assert(p.contains("HashAggregate"))
    assert(!p.contains("Window"), "repetition stats must not use windows")
    assert(p.contains("partial_"), "word/bigram counts must map-side combine")
  }

  test("q76 redaction is map-only over the scan: no exchange at all") {
    val p = planOf("q76_redact")
    assert(!p.contains("Exchange"),
      "regex scrub must stay a projection over the scan - zero shuffles")
  }

  test("q80 boilerplate removal joins equi-only and scans the corpus at most twice") {
    val p = planOf("q80_boilerplate")
    assert(!p.contains("BroadcastNestedLoop") && !p.contains("CartesianProduct"),
      "hot-segment marking must stay an equi join")
    assert("Scan parquet".r.findAllIn(p).size <= 2,
      "df-count branch + keep branch: two corpus scans, no third for reassembly")
  }

  test("q83 profile is TWO hash-agg passes: no Expand, no sort-agg, no per-column unions") {
    // r18 melt shape: counts/min-max in one scan, exact distincts from a
    // melted (column, value) stream in a second — replacing the single
    // scan whose Expand(rows × columns) + sort-aggregate chain ran as
    // one serial task (OPTIMIZATION_r18.md #1)
    val p = planOf("q83_profile")
    assert("Scan parquet".r.findAllIn(p).size == 2,
      "base stats pass + melted distinct pass — never per-column scans")
    assert(!p.contains("Expand"),
      "the melt replaces the multi-countDistinct Expand")
    assert(!p.contains("Union"), "no per-column UNION of scans")
  }

  test("q81 funnel shuffles on the key only - no window, no nested loop") {
    val p = planOf("q81_funnel")
    assert(!p.contains("Window"), "funnel must not sort the event stream")
    assert(!p.contains("BroadcastNestedLoop") && !p.contains("CartesianProduct"))
  }

  test("q89 capped postings ride the bounded-heap aggregate, never collect_list") {
    val p = planOf("q89_inverted_index")
    assert(p.contains("topk_values"), "postings must use the O(k)-buffer aggregate")
    assert(!p.toLowerCase.contains("collect_list"),
      "an unbounded collect_list would ship every posting of a hot term to one reducer")
    assert(p.contains("partial_"), "df + postings must map-side combine")
    assert(!p.contains("Window"), "no row_number ranking pass")
  }

  test("q91 hopping windows assign map-side (Expand), never via self-join") {
    val p = planOf("q91_hop_window")
    assert(p.contains("Expand") || p.contains("Generate"),
      "each event must emit its width/hop windows in the map stage")
    assert(!p.contains("Join"), "window assignment must not join events to a window table")
    assert("Exchange".r.findAllIn(p).size === 1,
      "one shuffle: the (window, type) aggregation")
  }

  test("q93 histogram is one partial+final aggregation, bounded by buckets") {
    val p = planOf("q93_histogram")
    assert(p.contains("HashAggregate") && p.contains("partial_"),
      "bucket counts must map-side combine")
    assert("Exchange".r.findAllIn(p).size === 1)
    assert(!p.contains("Sort "), "histogram needs no ordering")
  }

  test("q94 hot-hours broadcasts the one-row totals, hour agg computed once") {
    val p = planOf("q94_hot_hours")
    assert(p.contains("BroadcastExchange") || p.contains("BroadcastNestedLoop"),
      "the totals row must broadcast back over the hourly frame")
    assert("Scan parquet".r.findAllIn(p).size <= 1,
      "the materialized hourly frame must feed both branches - no second events scan")
  }

  test("q98 concurrency running sum is segmented per (type, day) with broadcast carry-ins") {
    val p = planOf("q98_concurrency")
    assert(p.contains("windowspecdefinition(event_type") && p.contains("day"),
      "the endpoint running sum must partition by (event_type, day) — " +
        "partitioning by type alone puts 20% of all endpoints in one task")
    assert(p.contains("BroadcastExchange") || p.contains("BroadcastHashJoin"),
      "the tiny types×days carry-in frame must broadcast back, never shuffle " +
        "the endpoint stream again")
  }

  test("q96 navigation windows are per-key partitioned (no single-task window)") {
    val p = planOf("q96_window_nav")
    assert(p.contains("windowspecdefinition(l_returnflag"),
      "nav functions must partition by the group key")
    assert(!p.contains("windowspecdefinition(ORDER"),
      "no partitionless (single-task) window")
  }

  test("q99 sequence assembly is one per-key aggregation, no window sort") {
    val p = planOf("q99_user_paths")
    assert(p.toLowerCase.contains("collect_list"),
      "per-key state must ride the aggregation buffer (array_sort after), " +
        "bounded by that key's history")
    assert(!p.contains("Window"), "no window over the event stream")
    assert("Exchange".r.findAllIn(p).size === 1, "one shuffle on the key")
  }

  test("q100 SCD2 lead-window is per-key partitioned") {
    val p = planOf("q100_scd2")
    assert(p.contains("windowspecdefinition(user_id"),
      "interval build must partition by the dimension key")
    assert(!p.contains("windowspecdefinition(ORDER"), "no single-task window")
  }

  test("q101 point-in-time join stays an equi join (interval as post-filter)") {
    val p = planOf("q101_pit_join")
    assert(!p.contains("BroadcastNestedLoop") && !p.contains("CartesianProduct"),
      "PIT must equi-join on the key — SCD2 intervals partition the " +
        "timeline, a range/theta join would BNLJ")
  }

  test("q103/q104/q105 graph joins are equi joins, never all-pairs wedges") {
    for (q <- Seq("q103_triangles", "q104_pagerank", "q105_cooccur")) {
      val p = planOf(q)
      assert(!p.contains("CartesianProduct"),
        s"$q: wedge/contribution joins must hash on their keys")
    }
    // q105 (the raw edge list) must not even contain a broadcast loop —
    // q103's two 1-row summary cross-joins are the only allowed BNLJs
    assert(!planOf("q105_cooccur").contains("BroadcastNestedLoop"))
    assert(!planOf("q104_pagerank").contains("BroadcastNestedLoop"))
  }

  test("q107 per-group dup-graph census joins equi-only on (group, vertex) keys") {
    val p = planOf("q107_dup_graph")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      "wedge closure must hash on (g, src/dst) — groups never mix")
  }

  test("q108 exact simjoin: prefix-filtered equi candidates, no all-pairs, no window") {
    val p = planOf("q108_simjoin_exact")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      "the completeness guarantee must come from prefix filtering, not brute force")
    assert(!p.contains("Window"), "per-doc shingle ordering rides the agg buffer")
  }

  test("q109 equi-depth cumsum is segmented with broadcast carries (no single-task window over the domain)") {
    val p = planOf("q109_equidepth")
    assert(p.contains("windowspecdefinition(seg"),
      "the value-domain cumsum must partition by segment")
    assert(p.contains("BroadcastExchange") || p.contains("BroadcastHashJoin"),
      "carry-ins and totals must broadcast back")
  }

  test("q122 snake sharding ranks segmented: per-value windows + broadcast carries") {
    val p = planOf("q122_shard_snake")
    assert(p.contains("windowspecdefinition(n_toks"),
      "within-value ranking must partition by the token-count value")
    assert(p.contains("BroadcastExchange") || p.contains("BroadcastHashJoin"),
      "value carry offsets must broadcast back, never shuffle the docs")
    assert(!p.contains("windowspecdefinition(doc_id"),
      "no doc-partitioned or corpus-global doc window may appear")
  }

  test("q110 apportionment windows only the per-source frame") {
    val p = planOf("q110_token_budget")
    // the row_number ranking runs over the handful of sources — assert the
    // corpus-sized side never reaches a window (no doc-level columns in it)
    assert(!p.contains("windowspecdefinition(doc_id"),
      "ranking must happen after the per-source reduction")
  }

  test("q111 bucketed join reads pre-partitioned buckets: zero shuffle exchanges") {
    val f = formatted("q111_bucketed_join")
    assert(f.contains("Bucketed: true"),
      "both scans must report the bucketed layout — otherwise the write-time " +
        "shuffle is being paid again at read time")
    assert(!f.contains("Exchange hashpartitioning") &&
        !f.contains("Exchange rangepartitioning"),
      "join on the bucket key + same-key aggregation must not shuffle at all")
  }

  test("q112 table diff is one full-outer join + one fixed-size summary") {
    val p = planOf("q112_table_diff")
    assert(p.toLowerCase.contains("fullouter"), "diff must join full-outer once")
    assert(!p.contains("Window"), "no per-row ranking — the summary is one agg")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"))
  }

  test("q113 BPE encode is map-only: no shuffle, no join, no window") {
    val p = planOf("q113_bpe_encode")
    assert(!p.contains("Exchange"),
      "tokenizer application must not move data — merges ride the plan as a literal")
    assert(!p.contains("Join") && !p.contains("Window"))
  }

  test("q124 sliding chunks are map-only: no shuffle, no join, no window") {
    val p = planOf("q124_chunk_overlap")
    assert(!p.contains("Exchange"),
      "chunk count is closed-form per row — nothing may move")
    assert(!p.contains("Join") && !p.contains("Window"))
  }

  test("q114 exact containment: prefix-filtered equi candidates, no all-pairs, no window") {
    val p = planOf("q114_containment_exact")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      "completeness must come from the probe-prefix × full-index equi join, not brute force")
    assert(!p.contains("Window"), "per-doc prefix ordering rides the agg buffer")
  }

  test("q120 repeated spans: key-unique flag join, per-doc windows only") {
    val p = planOf("q120_repeated_spans")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      "flagged-gram lookup must stay an equi join on gram_key")
    assert(p.contains("windowspecdefinition(doc_id"),
      "span merging must window per doc")
    assert(!p.contains("windowspecdefinition(pos"),
      "no global (un-partitioned) window may appear")
  }

  test("q121 semantic dedup: pair search is an equi join on cid, never all-pairs") {
    val p = planOf("q121_semantic_dedup")
    assert(!p.contains("CartesianProduct"))
    // the ONLY nested-loop allowed is the broadcast of the k-row centroid
    // model (Ann.rankCells crossJoin) — the vector-vs-vector pair join
    // must shuffle on cid
    assert(p.contains("cid"), "pair join must key on the cluster id")
  }

  test("q125 span scrub: equi joins only, reassembly via agg (no window, no BNLJ)") {
    val p = planOf("q125_span_scrub")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"))
    assert(!p.contains("windowspecdefinition"),
      "token reassembly must sort inside the agg buffer, not a window")
  }

  test("q126 novelty: gram ownership is an agg + key-unique join, no window") {
    val p = planOf("q126_novelty")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"))
    assert(!p.contains("windowspecdefinition"),
      "first-occurrence ownership must be a min agg, never a window rank")
  }

  test("q127 contamination report probes a BROADCAST benchmark side") {
    val p = planOf("q127_contamination")
    assert(p.contains("BroadcastHashJoin"),
      "the eval-shingle side is MBs vs a 100 TB corpus — it must broadcast")
    assert(!p.contains("SortMergeJoin"),
      "the corpus must never shuffle for the probe")
  }

  test("q115 approx profile has NO Expand; exact melt profile avoids it too") {
    assert(!planOf("q115_profile_approx").contains("Expand"),
      "sketch aggregates must plan as a plain partial/final agg")
    // r18: the exact profile's melt shape dropped its Expand as well —
    // only the non-injective-type fallback (Profile.tableExpand) still
    // plans one, and no declared query uses it
    assert(!planOf("q83_profile").contains("Expand"),
      "q83's melt shape must not reintroduce the Expand")
  }

  test("q116 BPE apportionment windows only the per-source frame") {
    val p = planOf("q116_budget_bpe")
    assert(!p.contains("windowspecdefinition(doc_id"),
      "ranking must happen after the per-source reduction")
    assert(!p.contains("CartesianProduct"))
  }

  test("q119 budget selection cumsums per (source, bucket) — no source-sized window partition") {
    val p = planOf("q119_budget_select")
    assert(p.contains("windowspecdefinition(source"), "windows must exist")
    assert(p.contains("windowspecdefinition(source#") &&
        p.contains("__mb"),
      "the corpus-side cumsum must partition by (source, md5 bucket), not source alone")
    assert(p.contains("BroadcastExchange") || p.contains("BroadcastHashJoin"),
      "carry-in offsets and allocations must broadcast back")
  }

  test("q118 token-id lookup broadcasts the vocab; ranking never sees doc columns") {
    val p = planOf("q118_token_ids")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      "the bounded vocab must broadcast to the id lookup")
    assert(!p.contains("windowspecdefinition(doc_id"),
      "the frequency ranking runs over the vocab frame, not per-doc rows")
  }

  test("q143 heavy-hitter recount broadcasts the bounded candidate set") {
    val p = planOf("q143_heavy_hitters")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      "phase 2 must semi-join against broadcast candidates (parts × cap rows)")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      "the stream side must never shuffle for the candidate filter")
  }

  test("q146 manifest is one partial/final agg — no sort, no join, no window") {
    val p = planOf("q146_manifest")
    assert(p.contains("HashAggregate"),
      "the fingerprint fold must be a hash aggregate")
    assert(!p.toLowerCase.contains("sortaggregate") &&
        !p.contains("windowspecdefinition") && !p.contains("Join"),
      "order independence must come from commutative aggregates, not ordering")
  }

  test("q147 store-served novelty joins on the gram key, never re-reads history text") {
    val p = planOf("q147_novelty_store")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "ownership resolution must be equi joins on gk")
    // history comes from the store's parquet partials (the drop side is
    // a checkpointed gram frame, so no documents scan appears at all)
    assert(p.contains("grams"),
      "the serve must read the stored partials, not re-tokenize history")
    assert(!p.contains("documents.parquet"),
      "the corpus itself must never be rescanned at serve time")
  }

  test("q150 store-served span detection joins on the gram key, history from the store only") {
    val p = planOf("q150_span_store")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "flag resolution must be equi joins on gram_key")
    assert(p.contains("spangrams"),
      "the serve must read the stored gram-df partials")
    // the drop side is a checkpointed gram frame and the history side is
    // the store — the corpus parquet must not appear in the serve plan
    assert(!p.contains("documents.parquet"),
      "the corpus itself must never be rescanned at serve time")
  }

  test("q154 manifest serve is one aggregation over the stored partials, nothing else") {
    val p = planOf("q154_manifest_store")
    assert(p.contains("manifests"),
      "the certificate must come from the stored partials")
    assert(!p.contains("documents.parquet"),
      "serving the certificate must not rescan any corpus")
    assert(!p.contains("Join"), s"the serve is a single re-aggregation:\n$p")
  }

  test("q92 survivor-best candidate generation stays an equi band join") {
    val p = planOf("q92_survivor_best")
    assert(!p.contains("CartesianProduct"),
      "pair generation must come from the banded LSH join, not all-pairs")
    assert(p.toLowerCase.contains("leftanti"),
      "losers must be removed by an anti join")
  }

  test("q168 classifier inference broadcasts the model below the size gate, not above") {
    // gated scale: V×classes is far under MaxBroadcastModelRows, so the
    // model join onto the corpus' exploded terms must be a map-side
    // broadcast — the corpus never shuffles against the model
    val p = planOf("q168_classifier_predict")
    assert(p.contains("BroadcastHashJoin"),
      "the model (V×classes rows) must broadcast at gated scale")
    assert(!p.contains("SortMergeJoin"),
      "the corpus-side tf frame must not sort-merge against the model")
    // the gate itself: above the threshold the forced hint must vanish
    // from the logical plan (a 10^9-term web vocabulary would OOM a
    // force-hinted broadcast; the fallback is a plain shuffled equi-join,
    // with AQE still free to broadcast from real runtime sizes)
    import spark.implicits._
    val train = Seq((1L, "aa", "alpha beta"), (2L, "bb", "omega psi"))
      .toDF("doc_id", "lang", "text")
    val probe = Seq((10L, "aa", "alpha omega")).toDF("doc_id", "lang", "text")
    def hintCount(df: DataFrame): Int =
      "ResolvedHint".r.findAllIn(df.queryExecution.analyzed.toString).size
    val gated = graft.text.Classify.predict(train, probe,
      maxBroadcastModelRows = 0L)
    val hinted = graft.text.Classify.predict(train, probe)
    assert(hintCount(gated) === hintCount(hinted) - 1,
      "above the gate exactly the model-join hint must be dropped " +
        "(the classes-sized defaults and vocab hints stay)")
    // both faces of the gate still produce the same predictions
    assert(gated.collect().toSet === hinted.collect().toSet)
  }

  test("MaxScore candidate semi-join broadcasts below the size gate, not above") {
    // gated scale: candidates ≤ Σ essential df is tiny, so the doc
    // semi-join that prunes the postings must be a map-side broadcast —
    // the frequent posting lists are read through it, never shuffled.
    // Above the gate the forced hint must vanish (a million-query
    // workload's Σ essential df is unbounded by the per-term cutoff; the
    // fallback is a shuffled semi-join, with AQE still free to broadcast
    // from real runtime sizes). Asserted on the factored-out candidate
    // scan because the full MaxScore path checkpoints it away.
    import spark.implicits._
    val corpus = Seq((1L, "needle common"), (2L, "common word"),
      (3L, "common word")).toDF("doc_id", "text")
    val post = graft.text.Retrieval.postings(corpus)
    val cands = Seq(1L).toDF("doc_id")
    def hintCount(d: DataFrame): Int =
      "ResolvedHint".r.findAllIn(d.queryExecution.analyzed.toString).size
    val hinted = graft.text.Retrieval.candidateScan(post, cands,
      eager = true, maxBroadcastCandidateRows = 4000000L)
    assert(hintCount(hinted) === 1 &&
      hinted.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"),
      "under the gate the candidate set must force-broadcast")
    val gated = graft.text.Retrieval.candidateScan(post, cands,
      eager = true, maxBroadcastCandidateRows = 0L)
    assert(hintCount(gated) === 0,
      "above the gate the forced candidate hint must be dropped")
    val lazyFace = graft.text.Retrieval.candidateScan(post, cands,
      eager = false, maxBroadcastCandidateRows = 4000000L)
    assert(hintCount(lazyFace) === 0,
      "the lazy face must leave the candidate semi-join unhinted for AQE")
    // both faces of the gate still produce the same pruned scan
    assert(gated.collect().toSet === hinted.collect().toSet)
  }

  test("q179 sketch serve prunes the store scan to (bucket, rho) and is one partial/final max") {
    val f = formatted("q179_sketch_store")
    // column pruning must reach the parquet footer: drop_id/cfg are
    // ledger metadata the serve never reads
    assert(f.contains("ReadSchema: struct<bucket:bigint,rho:bigint>"),
      s"serve must scan only the register columns:\n$f")
    assert(f.contains("partial_max"),
      "the max-merge must combine map-side before the exchange")
    assert(!f.contains("SortMergeJoin") && !f.contains("Window"),
      "serve is one aggregation — no join, no window")
  }

  test("q178 sketch registers partial-aggregate the gram stream; estimate joins a broadcast 1-row audit") {
    val f = formatted("q178_distinct_sketch")
    assert(f.contains("partial_max"),
      "register construction must map-side combine (shuffle <= m x partitions rows)")
    assert(f.contains("BroadcastNestedLoopJoin") ||
        f.contains("BroadcastExchange"),
      "the exact-audit column must join as a broadcast 1-row frame")
    assert(!f.contains("SortMergeJoin"),
      "nothing corpus-sized may sort-merge in the sketch path")
  }

  test("q185 admission never shuffles the history: store registers + candidate registers only") {
    val f = formatted("q185_sketch_admission")
    // both sides reduce to <= 256-row register frames before any join;
    // the only joins are the broadcast 1-row estimate crosses
    assert(!f.contains("SortMergeJoin"),
      "admission must not sort-merge anything")
    assert(f.contains("partial_max"),
      "the candidate's registers must map-side combine")
  }

  test("q192 CMS serve prunes the store scan to (depth, slot, cnt) and is one partial/final sum") {
    val f = formatted("q192_cms_store")
    // drop_id/cfg are ledger metadata the serve never reads
    assert(f.contains("ReadSchema: struct<depth:bigint,slot:bigint,cnt:bigint>"),
      s"serve must scan only the counter columns:\n$f")
    assert(f.contains("partial_sum"),
      "the sum-merge must combine map-side before the exchange")
    assert(!f.contains("SortMergeJoin") && !f.contains("Window"),
      "serve is one aggregation — no join, no window")
  }

  test("q194 CMS workload estimates broadcast the <= 4096-row counter table") {
    val f = formatted("q194_cms_serve")
    assert(f.contains("partial_count") || f.contains("partial_sum"),
      "counter construction must map-side combine " +
        "(shuffle <= depth x width x partitions rows)")
    assert(f.contains("BroadcastHashJoin"),
      "probe rows must equi-join the BROADCAST counter table — the " +
        "corpus never shuffles for an estimate")
  }

  test("q199/q200 stratified cuts ride the partial/final TopKPerKey exec — no corpus window") {
    Seq("q199_sample_stratified", "q200_sample_store_strat").foreach { name =>
      val p = planOf(name)
      assert(p.contains("TopKPerKeyPartial") && p.contains("TopKPerKeyFinal"),
        s"$name: per-stratum cuts must be map-side bounded heaps + a " +
          s"heads-only shuffle, never a window sort:\n$p")
      assert(!p.contains("windowspecdefinition"),
        s"$name must not window anything")
    }
  }

  test("q123 quality gate: two-level histogram cut, never a per-language corpus window") {
    val p = planOf("q123_quality_gate")
    // the old form's single window ordered by (score_ppt, doc_id) within
    // a lang partition — one task sorts the dominant language's whole
    // corpus slice. The histogram cut's windows are: cumsum over the
    // (lang, score_ppt) histogram, cumsum over the (lang, bucket)
    // histogram, and a row_number within (lang, doc_id>>16) — whose
    // partition holds <= 65536 rows BY doc_id uniqueness. No window spec
    // may order by (score_ppt, doc_id) together.
    assert("windowspecdefinition\\([^)]*score_ppt[^)]*doc_id".r
        .findFirstIn(p).isEmpty,
      s"the corpus-sorting window form is back:\n$p")
    assert(p.contains("__bkt"), "the doc_id-bucket refinement must exist")
    assert(p.contains("Union"), "settled + boundary branches union")
  }

  test("winnow explodes never re-evaluate the gram transform inside a filter") {
    // InferFiltersFromGenerate (excluded in Sessions.local) would copy
    // the per-gram md5 transform into an inferred size/isnotnull filter
    // that filter-pushdown substitutes through the defining Project —
    // re-computing the WHOLE gram array per input row (measured 5.4x on
    // q208's shape, tools.GuardProbe). Pin that no Filter condition in
    // the winnow family carries a higher-order transform.
    Seq("q208_binary_winnow", "q77_winnow", "q209_binary_winnow_pairs")
      .foreach { name =>
        val filters = q(name).queryExecution.optimizedPlan.collect {
          case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
            f.condition.toString
        }
        assert(!filters.exists(_.contains("lambdafunction")),
          s"$name: an inferred filter re-computes the gram array per input row")
      }
  }

  test("q214 span retrieval: one store scan, banded equi-join, no nested loop") {
    // the retrieval serve's 100 TB contract: the stored window table
    // feeds EXACTLY one columnar scan (never a re-hash of history), and
    // the probe×history match is the 4-band equi-join — a Hamming
    // predicate alone would be a nested-loop cross product
    val f = formatted("q214_span_retrieve")
    val storeScans = "graft-bwinstore[0-9]+".r.findAllIn(f).toSet.size
    assert(storeScans === 1,
      s"the stored window table must feed exactly one scan, got $storeScans")
    assert(!f.contains("CartesianProduct") &&
      !f.contains("BroadcastNestedLoop"),
      "the banded join must stay an equi-join")
  }

  test("q210 fp-store serve: history scanned ONCE, rare set from the persisted counters") {
    // r15 computed the stop-fingerprint df guard by unionByName(stored,
    // drop).groupBy(fp) — a full scan + hash-aggregate of the
    // corpus-scale fps table per daily serve, plus the pair-leg scan
    // (two history scans). With the persisted (fp, cnt) counters the
    // rare set is a drop-scale lookup against the metadata-scale df
    // table (materialized before this plan), so the serve's plan must
    // reference the corpus-scale fps table EXACTLY once — the history
    // leg of the pair join — and the df counter table not at all (its
    // lookup ran at rare-set materialization, never over fps rows).
    val f = formatted("q210_fp_store")
    val fpsScans = "commits/[A-Za-z0-9_.-]+/fps".r.findAllIn(f).size
    assert(fpsScans === 1,
      s"the corpus-scale fps table must feed exactly one scan, got $fpsScans")
    val dfScans = "commits/[A-Za-z0-9_.-]+/df".r.findAllIn(f).size
    assert(dfScans === 0,
      s"the rare set must be resolved before the serve plan (got $dfScans df scans)")
  }

  test("q190/q205 funnel is single-pass: one labeled aggregation, a 2-branch union") {
    // r14's funnel unioned SIX per-stage censuses over checkpointed
    // stage frames; the single-pass form labels each doc with the
    // furthest stage it survived and ONE conditional aggregation emits
    // all five census rows, plus the k-row packed census — so the
    // top-level Union must have exactly 2 children, not 6. (Logical
    // plan: adjacent unions flatten, so arity IS the branch count.)
    Seq("q190_spine_funnel", "q205_drop_funnel").foreach { name =>
      val unions = q(name).queryExecution.optimizedPlan.collect {
        case u: org.apache.spark.sql.catalyst.plans.logical.Union => u
      }
      assert(unions.nonEmpty, s"$name: census rows + packed row union")
      val top = unions.head
      assert(top.children.size === 2,
        s"$name: the funnel must be ONE labeled aggregation + the packed " +
          s"row — got a ${top.children.size}-branch union (the 6-census " +
          "shape is back)")
    }
  }

  test("q72 tfidf top-3-per-source rides the bounded-heap exec, not a vocabulary window") {
    val p = planOf("q72_tfidf")
    assert(p.contains("TopKPerKeyPartial") && p.contains("TopKPerKeyFinal"),
      s"per-source cut must be the map-side heap operator:\n$p")
    // the surviving window only ranks the <= 3-rows-per-source result
    assert("Window".r.findAllIn(p).size <= 2,
      "only the rank-label window over the heap output may remain")
  }

  test("q195/q196 sample cut is TakeOrderedAndProject — bounded heap, no global sort") {
    Seq("q195_kmv_sample", "q196_sample_store").foreach { name =>
      val f = formatted(name)
      assert(f.contains("TakeOrderedAndProject"),
        s"$name: the bottom-k cut must be a per-partition bounded heap " +
          s"+ k-row gather, never a full Sort+Limit:\n$f")
      assert(!f.contains("SortMergeJoin"),
        s"$name must not sort-merge anything")
    }
    // the store serve additionally prunes the ledger metadata columns
    val f = formatted("q196_sample_store")
    assert(f.contains("ReadSchema: struct<hv:bigint,doc_id:bigint," +
        "lang:string,n_tokens:bigint>"),
      s"serve must scan only the sample payload columns:\n$f")
  }
}
