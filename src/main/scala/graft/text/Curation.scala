package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The LLM curation SPINE — the engine's reason to exist, composed as
  * ONE lazy plan (the q44 move, `domain/CallerPipeline.scala`, applied
  * to the pipeline the LLM-data side is FOR):
  *
  *   per-lang quality gate (q123) → near-dup dedup, keep-smallest-id
  *   (q26) → decontaminate vs a benchmark (q133) → DSIR top-k selection
  *   vs a trusted target (q175) → greedy no-split packing (q66) →
  *   order-independent manifest certificate (q146).
  *
  * Per-stage hash gates cannot catch CROSS-STAGE wiring bugs — a column
  * contract drifting between stages, an ordering assumption one stage
  * makes and the next breaks — so the spine's gate is the final
  * manifest: any mis-composition anywhere flips a fingerprint.
  *
  * No CORPUS-scale frame materializes and nothing is collected at the
  * driver. The lazy plan-sharing caches (`clean` — feeding four
  * branches: raw profile, scoring, packing, manifest provenance — and
  * the dedup prep inside `nearDupPairs(eager = false)`) populate inside
  * the first action's DAG. The one eager concession is DOC-COUNT-scale:
  * the quality gate's keep list (8 B per surviving doc) is a real
  * barrier, because the spine's concurrent branches would otherwise
  * race its lazy cache and re-run the multi-stage histogram cut — the
  * measured shapes are tabled in [[qualityGated]]. Contrast the
  * reference's corpus-sized collect()-separated stages (daas-apps
  * `SparkCaller.java:125-344`, one barrier per tool).
  *
  * 100 TB shape — each stage keeps its own audited plan:
  *  - quality gate: per-lang window (the q123 percentile contract; a
  *    language is the natural partition and the rank IS the semantics);
  *  - dedup: banded MinHash LSH equi-join, never all-pairs;
  *  - decontamination: benchmark-sized broadcast semi/anti joins;
  *  - DSIR: ≤ 2^16-row ratio model broadcast + one doc-sized hash agg;
  *  - selection: TakeOrderedAndProject bounded heap (k rows to driver
  *    memory never — the heap lives per partition);
  *  - packing: k selected rows, one tiny shuffle;
  *  - manifest: constant per-shard agg state.
  */
object Curation {

  /** Packed, provenance-carrying selection: one row per selected doc —
    * (doc_id, lang, n_tokens, score_ppm, pack_shard, seq_id,
    * tok_offset). `corpus` flows the gates; `target` only feeds the
    * DSIR ratio numerator; `bench` (id `doc_id`, text `text`) is the
    * decontamination blocklist.
    *
    * `barrier` is applied at every stage boundary and defaults to
    * identity (the production shape: one fused lazy plan). CurationSpec
    * passes `_.localCheckpoint()` and asserts the fused run ≡ the
    * barriered run — the executable proof that fusing the stages into
    * one plan changed nothing but the barrier count.
    */
  def spineSelection(corpus: DataFrame, target: DataFrame, bench: DataFrame,
                     k: Int = 100,
                     barrier: DataFrame => DataFrame = identity,
                     eager: Boolean = true): DataFrame = {
    val st = spineFrames(corpus, target, bench, k, barrier, eager)
    packAndLabel(st.clean, st.picked)
  }

  /** Every stage's output frame — [[spineSelection]] is `packAndLabel`
    * over the last two; [[spineFunnel]] censuses all of them.
    */
  private final case class SpineFrames(gated: DataFrame, deduped: DataFrame,
                                       clean: DataFrame, picked: DataFrame)

  private def spineFrames(corpus: DataFrame, target: DataFrame,
                          bench: DataFrame, k: Int,
                          barrier: DataFrame => DataFrame,
                          eager: Boolean = true): SpineFrames = {
    // NOT cached: `gated` carries the corpus's TEXT rows, so caching it
    // columnar-compresses the whole surviving corpus — a cost per byte
    // of text (r14 tried it: 5.3 → 6.9 s at sf0.1, SpineProbe), and at
    // 100 TB a guaranteed disk spill. The plan-sharing the branches need
    // lives one level down, in [[qualityGated]]'s KEEP-LIST barrier —
    // see the regime table there; each gated consumer then re-reads the
    // corpus scan + one cheap semi join, the same two-scan shape the
    // r13 window spine had, while the multi-stage histogram cut runs
    // exactly once.
    val gated = barrier(qualityGated(corpus, eager))

    // stage 2 — q26's survivorship: a doc is dropped iff it has a
    // verified near-dup partner with a smaller id (banded LSH + exact
    // Jaccard >= 0.7; eager=false keeps the prep cache lazy so the
    // spine stays one unexecuted plan until its first action).
    // The loser ID SET is materialized (r18; 8 B/doc — the same
    // doc-count-scale concession as the keep list one stage up, and the
    // discipline spineFunnel already ran): `deduped` is expanded TWICE
    // downstream (decontaminate's shingled probe side and its anti-join
    // base), and without the cut each expansion re-ran the whole banded
    // candidate join + exact verify — the spine's second-heaviest stage,
    // twice. eager=false (the TVF face) demotes it to a lazy cache.
    // In-JVM A/B vs the r17 fully-lazy shape (tools.AbBench, interleaved
    // legs, sf0.1): materialized 5.82 s vs lazy 7.46 s for q186.
    val mat: DataFrame => DataFrame =
      if (eager) Dedup.materialize else (df => df.cache())
    val losers = mat(Dedup.nearDupPairs(gated, eager = false)
      .select(col("doc_b").as("doc_id")).distinct())
    val deduped = barrier(gated.join(losers, Seq("doc_id"), "left_anti"))

    // stage 3 — q133: drop every doc sharing a 3-gram with the benchmark
    val clean = barrier(Dedup.decontaminate(deduped, bench)).cache()

    // stage 4 — q175: DSIR importance scoring of the survivors against
    // the trusted target profile, deterministic top-k by (score, id).
    // Materialized (r18): k rows, but the frame is broadcast twice by
    // packAndLabel (id filter + score join) and each broadcast would
    // otherwise re-run the whole scoring subtree.
    val picked = mat(barrier(Dsir.selectTopK(Dsir.score(target, clean), k)))
    SpineFrames(gated, deduped, clean, picked)
  }

  /** The spine's ATTRITION FUNNEL (q190) — per-stage census of what
    * each gate cut: one row per stage, (stage_idx, stage, n_docs,
    * n_tokens, n_seqs), exact integers. This is the observability a
    * production curation run is flown by: a drop whose `gated` row
    * collapses means the quality gate misfired (or the crawl really was
    * junk); a `deduped` cliff names a template farm; a near-empty
    * `clean` flags benchmark leakage in the source; `packed`'s n_seqs
    * against n_tokens states the padding efficiency. n_seqs counts
    * distinct (shard, seq) pairs at the pack stage and is 0 before it
    * (docs aren't in sequences yet — 0, not NULL, keeps the column
    * sum-able).
    *
    * Plan shape — SINGLE-PASS (r15; replaces r14's six unioned censuses
    * over checkpointed stage frames): each stage's DECISION is captured
    * as a doc-id set (8 B/doc — the keep list, the dedup losers, the
    * clean ids, the k picked rows), materialized in dependency order so
    * each gate's subtree runs exactly once; then every doc is labeled
    * with the furthest stage it survived and ONE conditional
    * aggregation over that labeled frame emits all five census rows at
    * once ([[funnelSingle]]). No corpus-text frame is ever checkpointed
    * (r14 localCheckpointed four text snapshots — corpus-scale writes
    * the census never needed), no census union races a lazy cache (the
    * r14 3× measurement — the reason those barriers existed), and the
    * TVF face no longer carries a racing-cache trade: the only shared
    * frames are the id sets.
    */
  def spineFunnel(corpus: DataFrame, target: DataFrame, bench: DataFrame,
                  k: Int = 100, eager: Boolean = true): DataFrame = {
    val mat: DataFrame => DataFrame =
      if (eager) Dedup.materialize else (df => df.cache())
    val gIds = qualityKeptIds(corpus, eager)
    val gated = corpus.join(gIds, Seq("doc_id"), "left_semi")
    val lIds = mat(Dedup.nearDupPairs(gated, eager = false)
      .select(col("doc_b").as("doc_id")).distinct())
    val dIds = gIds.join(lIds, Seq("doc_id"), "left_anti")
    val deduped = gated.join(lIds, Seq("doc_id"), "left_anti")
    val cIds = mat(Dedup.decontaminate(deduped, bench).select(col("doc_id")))
    val clean = deduped.join(cIds, Seq("doc_id"), "left_semi")
    val picked = mat(Dsir.selectTopK(Dsir.score(target, clean), k))
    funnelSingle(corpus, gIds, dIds, cIds, picked, clean)
  }

  /** The daily-drop funnel (q205) — q190's per-stage census over the
    * INCREMENTAL spine's stages: the drop enters, ranks within itself,
    * dedups against the signature STORE (cross-history and intra-drop
    * in one banded pass), decontaminates, and is selected by DSIR
    * scores served from the profile STORE. The row a crawl operator
    * reads every morning: a `deduped` cliff here means the crawler is
    * re-fetching yesterday (vs q190's batch funnel, where it means a
    * template farm inside one corpus); a near-empty `gated` row means
    * today's crawl was junk. Same single-pass shape as [[spineFunnel]]:
    * per-stage id sets in dependency order, one labeled aggregation.
    */
  def incrementalSpineFunnel(drop: DataFrame, target: DataFrame,
                             bench: DataFrame, dedupStore: String,
                             dsirStore: String, k: Int = 100,
                             eager: Boolean = true): DataFrame = {
    val mat: DataFrame => DataFrame =
      if (eager) Dedup.materialize else (df => df.cache())
    val gIds = qualityKeptIds(drop, eager)
    val gated = drop.join(gIds, Seq("doc_id"), "left_semi")
    val dIds = mat(Store.dedupNewDropVsCorpusReadOnly(gated, dedupStore,
      eager = eager).select(col("doc_id")))
    val deduped = gated.join(dIds, Seq("doc_id"), "left_semi")
    val cIds = mat(Dedup.decontaminate(deduped, bench).select(col("doc_id")))
    val clean = deduped.join(cIds, Seq("doc_id"), "left_semi")
    val picked = mat(Dsir.selectTopK(
      DsirStore.scoreVsDrop(target, clean, dsirStore, eager = false), k))
    funnelSingle(drop, gIds, dIds, cIds, picked, clean)
  }

  /** ONE conditional aggregation produces every census row: docs are
    * labeled with the furthest stage they survived (stage membership
    * frames are nested subsets by construction — picked ⊆ cleanIds ⊆
    * dedupedIds ⊆ gatedIds), and row i of the funnel is
    * `sum(last_stage >= i)` over the labeled frame. The whole census is
    * then one corpus-column scan + four id-scale joins + one
    * constant-state aggregation — no 6-branch union, no stage frame
    * read twice, and a SQL user executing the TVF face pays the same
    * plan the eager face runs. The packed row (stage 5) keeps its own
    * tiny aggregation over the k-row packed frame.
    */
  private def funnelSingle(corpus: DataFrame, gatedIds: DataFrame,
                           dedupedIds: DataFrame, cleanIds: DataFrame,
                           picked: DataFrame, clean: DataFrame): DataFrame = {
    val stages = Seq("corpus", "gated", "deduped", "clean", "selected")
    // MEASURED REJECTION (r18): replacing this four-left-join label
    // chain with unionAll(4 id sets) + groupBy(doc_id).count + ONE left
    // join — valid because the sets are nested subsets, so membership
    // count = furthest stage — was tried and reverted: the id frames are
    // small enough that the planner runs these joins as broadcast
    // map-joins in a single corpus-side stage, while the union form
    // forces a real groupBy exchange plus a shuffled corpus join
    // (q205 5.17 -> 6.50 s, q190 4.93 -> 5.44 s, QBench min-of-3).
    val labeled = corpus
      .select(col("doc_id"),
        size(TextOps.words(col("text"))).cast("long").as("__tok"))
      .join(gatedIds.select(col("doc_id"), lit(1).as("__g")),
        Seq("doc_id"), "left")
      .join(dedupedIds.select(col("doc_id"), lit(1).as("__d")),
        Seq("doc_id"), "left")
      .join(cleanIds.select(col("doc_id"), lit(1).as("__c")),
        Seq("doc_id"), "left")
      .join(broadcast(picked.select(col("doc_id"), lit(1).as("__p"))),
        Seq("doc_id"), "left")
      .withColumn("__last",
        when(col("__p") === 1, 4).when(col("__c") === 1, 3)
          .when(col("__d") === 1, 2).when(col("__g") === 1, 1)
          .otherwise(0))
    val sums = (0 to 4).flatMap { i =>
      Seq(sum(when(col("__last") >= i, 1L).otherwise(0L)).as(s"__nd$i"),
        sum(when(col("__last") >= i, col("__tok")).otherwise(0L))
          .as(s"__nt$i"))
    }
    val censusRows = labeled.agg(sums.head, sums.tail: _*)
      .select(explode(array((0 to 4).map(i => struct(
          lit(i).as("stage_idx"), lit(stages(i)).as("stage"),
          coalesce(col(s"__nd$i"), lit(0L)).as("n_docs"),
          coalesce(col(s"__nt$i"), lit(0L)).as("n_tokens"),
          lit(0L).as("n_seqs"))): _*)).as("__r"))
      .select(col("__r.*"))
    val packRow = packAndLabel(clean, picked)
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens").cast("long")).as("n_tokens"),
        countDistinct(col("pack_shard"), col("seq_id")).as("n_seqs"))
      .select(lit(5).as("stage_idx"), lit("packed").as("stage"),
        coalesce(col("n_docs"), lit(0L)).as("n_docs"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_seqs"), lit(0L)).as("n_seqs"))
    censusRows.unionByName(packRow)
  }

  /** The per-language bottom-quartile verdict, computed WITHOUT a
    * per-language corpus sort — the scale-safe form of
    * `row_number() OVER (PARTITION BY lang ORDER BY score_ppt, doc_id)
    * * 4 > count(*) OVER (PARTITION BY lang)`. A window partition is ONE
    * task, so the window form single-task-sorts the dominant language's
    * whole slice (~half a natural crawl is English); this replaces it
    * with a two-level histogram refinement with IDENTICAL semantics:
    *
    *  1. score-class cut: `score_ppt` has ≤ 1001 distinct values, so the
    *     (lang, score_ppt) histogram is metadata-scale (≤ 1001 rows per
    *     language). Ranks by (score_ppt, doc_id) assign each class a
    *     contiguous rank range [cum_prev+1, cum]; with t = ⌊n/4⌋ docs to
    *     drop, a class is wholly dropped iff cum ≤ t, wholly kept iff
    *     cum_prev ≥ t, and at most ONE class per language straddles t —
    *     within it exactly m = t − cum_prev smallest doc_ids drop.
    *  2. id-bucket cut inside the straddling class: bucket =
    *     doc_id >> 16 (arithmetic shift = floor division — monotone in
    *     doc_id for all signed longs), so buckets are contiguous doc_id
    *     ranges AND each holds ≤ 2^16 rows because doc_id is unique (the
    *     same uniqueness the window form's total order relied on). The
    *     per-(lang, bucket) histogram cuts again: whole buckets drop/
    *     keep by cumulative count, and only the one straddling bucket is
    *     ranked — a row_number whose partition is ≤ 65536 rows BY
    *     CONSTRUCTION, whatever the corpus size or skew.
    *
    * Every corpus-row-bearing sort is therefore bounded at 2^16 rows;
    * the only single-task frames are the two count histograms (≤ 1001
    * rows per language; the bucket histogram is one 24-byte row per
    * occupied bucket of ONE score class — worst case class-count rows,
    * ~10^3× smaller than the class's text rows the window form sorted).
    * The boundary-class shuffle moves ~1/1001 of the corpus.
    *
    * Input: (doc_id, lang, score_ppt) with doc_id unique; output: the
    * same three columns plus `kept` (1/0). The input projection is
    * cached (MEMORY_AND_DISK, LRU-evictable): the cut reads it three
    * times (histogram, non-boundary labels, boundary refinement) and at
    * ~24 B/doc the cache is doc-count-scale, not corpus-scale.
    */
  def quartileGateLabels(scored0: DataFrame): DataFrame = {
    val scored = scored0.select(col("doc_id"), col("lang"), col("score_ppt"))
      .cache()
    val wCum = Window.partitionBy(col("lang")).orderBy(col("score_ppt").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cut = scored.groupBy(col("lang"), col("score_ppt"))
      .agg(count(lit(1)).as("__c"))
      .withColumn("__cum", sum(col("__c")).over(wCum))
      .withColumn("__t",
        expr("(sum(__c) OVER (PARTITION BY lang)) div 4"))
      .withColumn("__cum_prev", col("__cum") - col("__c"))
      .select(col("lang"), col("score_ppt"),
        when(col("__cum") <= col("__t"), lit("drop"))
          .when(col("__cum_prev") >= col("__t"), lit("keep"))
          .otherwise(lit("edge")).as("__cls"),
        (col("__t") - col("__cum_prev")).as("__m"))
    val labeled = scored.join(broadcast(cut), Seq("lang", "score_ppt"))
    val settled = labeled.filter(col("__cls") =!= "edge")
      .select(col("doc_id"), col("lang"), col("score_ppt"),
        when(col("__cls") === "keep", 1).otherwise(0).as("kept"))
    // level 2 — the one straddling score class per language, re-cut on
    // doc_id buckets; only its one straddling BUCKET reaches row_number
    val edge = labeled.filter(col("__cls") === "edge")
      .withColumn("__bkt", shiftright(col("doc_id"), 16))
    val wBCum = Window.partitionBy(col("lang")).orderBy(col("__bkt").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val bCut = edge.groupBy(col("lang"), col("__bkt"))
      .agg(count(lit(1)).as("__bc"), min(col("__m")).as("__m2"))
      .withColumn("__bcum", sum(col("__bc")).over(wBCum))
      .withColumn("__bcum_prev", col("__bcum") - col("__bc"))
      .select(col("lang"), col("__bkt"),
        when(col("__bcum") <= col("__m2"), lit("drop"))
          .when(col("__bcum_prev") >= col("__m2"), lit("keep"))
          .otherwise(lit("edge")).as("__bcls"),
        (col("__m2") - col("__bcum_prev")).as("__bm"))
    val wRank = Window.partitionBy(col("lang"), col("__bkt"))
      .orderBy(col("doc_id").asc)
    val edgeSettled = edge.join(bCut, Seq("lang", "__bkt"))
      .withColumn("__rk", row_number().over(wRank).cast("long"))
      .select(col("doc_id"), col("lang"), col("score_ppt"),
        when(col("__bcls") === "keep", 1)
          .when(col("__bcls") === "drop", 0)
          .otherwise(when(col("__rk") > col("__bm"), 1).otherwise(0))
          .as("kept"))
    settled.unionByName(edgeSettled)
  }

  /** stage 1 — q123's per-lang percentile gate: keep each language's
    * top three quality quartiles (distinct/total tokens, exact ppt; the
    * cut is rank*4 > n, never a float percentile), via the histogram cut
    * [[quartileGateLabels]] — no per-language corpus sort. Shared
    * verbatim by the batch and incremental spines — the incremental form
    * ranks WITHIN the drop, which is this same function applied to a
    * smaller corpus, not different logic.
    */
  private def qualityGated(corpus: DataFrame,
                           eager: Boolean = true): DataFrame =
    corpus.join(qualityKeptIds(corpus, eager), Seq("doc_id"), "left_semi")

  /** The gate's KEEP LIST (doc_id of every surviving doc) — the stage's
    * barrier, exposed separately because the funnel labels against it
    * directly. 8 bytes per surviving doc, doc-count-scale, never
    * corpus-scale (the dedup serve's signed-frame materialization is
    * the same concession one stage later). Every shape was measured at
    * sf0.1 before this one landed (tools.SpineProbe, min-of-3 over the
    * full six-stage spine):
    *   keep list materialized  5.0 s   <- this
    *   r13 window gate         4.1 s   (the single-task-sort baseline)
    *   gated rows cached       6.9 s   (columnar-compresses corpus text)
    *   keep list merely cached 10.0 s  (min; 22-25 s typical — the
    *                                    spine's branches RACE the lazy
    *                                    cache and re-run the whole
    *                                    multi-stage cut concurrently)
    * eager=false (the TVF/EXPLAIN face) keeps the lazy cache — analysis
    * must never run a job; the race trade is documented there.
    */
  private[graft] def qualityKeptIds(corpus: DataFrame,
                                    eager: Boolean = true): DataFrame = {
    val scored = corpus
      .withColumn("ws", TextOps.words(col("text")))
      .select(col("doc_id"), col("lang"),
        size(array_distinct(col("ws"))).as("nd"), size(col("ws")).as("nt"))
      .withColumn("score_ppt", expr("(CAST(nd AS BIGINT) * 1000) div nt"))
    val kept0 = quartileGateLabels(scored)
      .filter(col("kept") === 1).select(col("doc_id"))
    if (eager) Dedup.materialize(kept0) else kept0.cache()
  }

  /** stages 5+6's shared tail — q66's greedy no-split packing of the
    * selection, labeled with its provenance (lang, score, layout).
    */
  private def packAndLabel(clean: DataFrame, picked: DataFrame): DataFrame = {
    // MEASURED REJECTION (r18): pre-filtering `clean` to the picked ids
    // with a broadcast semi join BEFORE tokenizing (so only k docs pay
    // words()) was tried and reverted — in-JVM A/B (tools.AbBench,
    // interleaved legs): q205 5.49 -> 6.35 s, q190 5.71 -> 6.16 s,
    // q186 4.70 -> 4.90 s. At bench SFs the corpus-side tokenize is
    // cheaper than the extra broadcast-build plumbing per expansion.
    val withTok = clean.select(col("doc_id"), col("lang"),
      size(TextOps.words(col("text"))).as("n_tokens"))
    val packed = graft.operators.Packing.greedyPack(
      withTok.join(broadcast(picked.select(col("doc_id"))), Seq("doc_id"))
        .select(col("doc_id"), col("n_tokens")),
      "doc_id", "n_tokens", maxTokens = 256, shards = 8)
    packed.withColumnRenamed("shard", "pack_shard")
      .join(withTok.select(col("doc_id"), col("lang"), col("n_tokens")),
        Seq("doc_id"))
      .join(broadcast(picked.select(col("doc_id"), col("score_ppm"))),
        Seq("doc_id"))
      .select(col("doc_id"), col("lang"), col("n_tokens"), col("score_ppm"),
        col("pack_shard"), col("seq_id"), col("tok_offset"))
  }

  /** The spine's DAILY-DROP form (q189) — the batch pipeline above is
    * how a corpus is curated ONCE; this is how it is curated every day
    * after: the plan touches ONLY the drop, and the corpus history
    * participates through two persisted ledgers —
    *
    *  - dedup vs the signature STORE ([[Store.dedupNewDropVsCorpusReadOnly]],
    *    q106's serve): cross-history dups and intra-drop dups drop in
    *    one banded pass; the history is never re-shingled;
    *  - DSIR vs the profile STORE ([[DsirStore.scoreVsDrop]], q176's
    *    serve): the raw side of every ratio counts history ∪ drop from
    *    a drops×buckets-row scan.
    *
    * The quality gate ranks WITHIN the drop (drop-relative quartiles —
    * the daily decision is "this crawl's best three quartiles");
    * decontamination, selection, packing and the manifest are the batch
    * stages unchanged. Cost at 100 TB, stated honestly per ledger: one
    * scan of the DROP; a metadata-scale DSIR profile scan (drops ×
    * buckets rows); and a SIGNATURE-table scan that is one ~50 B row
    * per stored doc — doc-count-scale, NOT metadata-scale, but ~2-3
    * orders cheaper than re-reading and re-shingling the history's
    * text, and the band join against it is equi-keyed and
    * partition-parallel. The history's raw bytes re-enter nothing.
    *
    * One internal materialization, documented: the dedup serve
    * materializes the drop's signed frame (drop-sized, five plan
    * branches — the store-serve convention). `eager = false` (the TVF
    * face) demotes it to a lazy cache so ANALYSIS/EXPLAIN never runs a
    * job; the DSIR serve always runs eager=false here.
    */
  def incrementalSpineSelection(drop: DataFrame, target: DataFrame,
                                bench: DataFrame, dedupStore: String,
                                dsirStore: String, k: Int = 100,
                                eager: Boolean = true): DataFrame = {
    val gated = qualityGated(drop, eager)
    val deduped = Store.dedupNewDropVsCorpusReadOnly(gated, dedupStore,
      eager = eager)
    val clean = Dedup.decontaminate(deduped, bench).cache()
    // picked materialized (r18, k rows): packAndLabel broadcasts it
    // twice (the pack-input id filter + the score join) and each
    // broadcast build would otherwise re-run the whole store-served
    // scoring subtree
    val mat: DataFrame => DataFrame =
      if (eager) Dedup.materialize else (df => df.cache())
    val picked = mat(Dsir.selectTopK(
      DsirStore.scoreVsDrop(target, clean, dsirStore, eager = false), k))
    packAndLabel(clean, picked)
  }

  /** The daily loop CLOSED — q189's incremental spine PLUS the ledger
    * ingest that makes tomorrow's history include today: returns the
    * selection frame and ONE deferred commit that (a) appends the drop's
    * CLEAN frame's profile to the DSIR store under `dropId` and then (b)
    * publishes the drop's dedup-surviving signatures into the signature
    * store (staged by the dedup pass itself — the mining is never
    * re-run). Without this, every `--curation-spine` run is a dry-run
    * serve: the drop is curated against history but never JOINS it, so
    * tomorrow would re-admit today's near-dups.
    *
    * Commit AFTER the selection write succeeds (the
    * store-mutation-commits-LAST discipline, [[Store
    * .dedupNewDropVsCorpusStaged]]'s contract): an eager commit + a
    * failed output write would make the retry dedup the drop against
    * its own signatures and silently emit an empty selection.
    *
    * What each ledger learns, stated precisely: the signature store
    * learns the quality-gated dedup SURVIVORS (the docs tomorrow's
    * near-dup decisions must see); the DSIR store learns the CLEAN
    * frame (gated + deduped + decontaminated — the retained raw pool
    * the selection model's ratios should reflect). A decontaminated-away
    * doc enters neither: the corpus does not retain it, and an
    * identical doc tomorrow faces the same benchmark blocklist anyway.
    */
  def incrementalSpineWithIngest(drop: DataFrame, target: DataFrame,
                                 bench: DataFrame, dedupStore: String,
                                 dsirStore: String, dropId: String,
                                 k: Int = 100): (DataFrame, () => Unit) = {
    val gated = qualityGated(drop)
    val (deduped, commitSig) =
      Store.dedupNewDropVsCorpusStaged(gated, dedupStore)
    val clean = Dedup.decontaminate(deduped, bench).cache()
    // materialized for the same reason as incrementalSpineSelection's
    // picked: two broadcast builds downstream
    val picked = Dedup.materialize(Dsir.selectTopK(
      DsirStore.scoreVsDrop(target, clean, dsirStore, eager = false), k))
    val commitDsir = DsirStore.appendStaged(clean, dsirStore, dropId)
    // DSIR ledger commits FIRST: the --spine-ingest replay guard checks
    // DsirStore enrollment, so committing the GUARDED store before the
    // signature store means any crash between the two leaves a state the
    // guard refuses loudly. The reverse order had a silent hole: sigs
    // enrolled + DSIR absent passes the guard, and the retry dedups the
    // drop against its own signatures — a (near-)empty selection with no
    // error, the exact failure the guard exists to prevent.
    // The clean cache releases after both commits land — the daily CLI
    // path runs this once per drop inside a potentially long-lived
    // session, and unreleased per-drop caches would accumulate.
    (packAndLabel(clean, picked),
      () => { commitDsir(); commitSig(); clean.unpersist() })
  }

  /** The daily loop with ADMISSION IN FRONT — the missing consult the
    * gated stores exposed: [[SketchStore.ingestGated]] rejects a stale
    * drop before INGEST cost, but the spine would still curate any drop
    * handed to it, paying the full six stages before dedup dropped a
    * replayed crawl's docs one by one. Here the cheap novelty verdict
    * (one register-scale scan of the DROP vs the novelty store's
    * drops×m stored rows — [[SketchStore.admission]]) gates the
    * expensive pipeline:
    *
    *  - `Left(reason)` — the drop is a stored id (replay) or its
    *    containment_ppm ≥ `maxContainmentPpm` (stale): NO curation cost
    *    was paid, and the verdict is recorded in the novelty store's
    *    admission log ([[SketchStore.recordAdmission]] — the same
    *    auditable trail the ingest loop writes).
    *  - `Right((selection, commit))` — admitted (or the novelty store
    *    doesn't exist yet — the bootstrap drop is novel by definition):
    *    the spine runs as [[incrementalSpineWithIngest]], and the ONE
    *    deferred commit additionally enrolls the drop in the novelty
    *    store + logs the admitted verdict — commits-LAST like the other
    *    two ledgers, so a crashed run leaves no store believing the
    *    drop landed.
    *
    * The admission threshold composes with, not replaces, dedup: a 40%-
    * contained drop passes admission (most of it is new) and the
    * signature store still drops its old 40% doc by doc.
    */
  def incrementalSpineGated(drop: DataFrame, target: DataFrame,
                            bench: DataFrame, dedupStore: String,
                            dsirStore: String, noveltyStore: String,
                            dropId: String, k: Int = 100,
                            maxContainmentPpm: Long = 950000L)
      : Either[String, (DataFrame, () => Unit)] = {
    val s = drop.sparkSession
    if (!SketchStore.exists(s, noveltyStore)) {
      val stageNov = SketchStore.buildStaged(drop, noveltyStore, dropId)
      val (sel, commit0) = incrementalSpineWithIngest(
        drop, target, bench, dedupStore, dsirStore, dropId, k)
      Right((sel, () => {
        commit0(); stageNov()
        SketchStore.recordAdmission(s, noveltyStore, dropId,
          "admitted-bootstrap", None)
      }))
    } else if (SketchStore.drops(s, noveltyStore).contains(dropId)) {
      SketchStore.recordAdmission(s, noveltyStore, dropId,
        "skipped-duplicate-drop", None)
      Left(s"drop '$dropId' is already enrolled in the novelty store " +
        s"$noveltyStore — replay skipped before any curation cost")
    } else {
      val adm = SketchStore.admission(drop, noveltyStore).collect().head
      val containment = adm.getAs[Long]("containment_ppm")
      if (containment >= maxContainmentPpm) {
        SketchStore.recordAdmission(s, noveltyStore, dropId,
          "rejected-stale", Some(adm))
        Left(s"drop '$dropId' is ${containment / 10000}% contained in the " +
          s"history (>= ${maxContainmentPpm / 10000}%) — rejected before " +
          "any curation cost; the verdict is in the admission log")
      } else {
        val stageNov = SketchStore.appendStaged(drop, noveltyStore, dropId)
        val (sel, commit0) = incrementalSpineWithIngest(
          drop, target, bench, dedupStore, dsirStore, dropId, k)
        Right((sel, () => {
          commit0(); stageNov()
          SketchStore.recordAdmission(s, noveltyStore, dropId,
            "admitted", Some(adm))
        }))
      }
    }
  }

  /** The daily spine as a STRUCTURED-STREAMING loop — the last manual
    * step removed: a production crawl arrives as a stream, and until now
    * each micro-batch needed its own `--spine-ingest` CLI invocation.
    * Each epoch of `drops` (a streaming DataFrame of document rows) runs
    * the ADMISSION-GATED incremental spine ([[incrementalSpineGated]])
    * as one foreachBatch:
    *
    *   1. replay guard first ([[DsirStore]] enrollment — the same check
    *      the CLI runs): a crash-replayed epoch whose commit already
    *      landed is recorded-and-skipped, never re-curated (exactly-once
    *      across checkpoint restarts, the LmStore/SketchStore ingest
    *      discipline);
    *   2. admission next: a stale epoch is rejected from one register
    *      scan before any curation cost, verdict in the admission log;
    *   3. admitted epochs curate against the ledger-served history,
    *      write their selection to `outDir/<dropId>/` (overwrite — a
    *      crash-replayed UNcommitted epoch converges on rewrite), and
    *      only then commit all three ledgers (DSIR first — the guarded
    *      store — then signatures, then novelty: any crash inside the
    *      chain leaves a state step 1 or the DSIR append refuses
    *      LOUDLY, never a silent self-dedup).
    *
    * Epoch ids are the drop ids (`epoch-NNNNNN`, stable across restarts
    * because the checkpoint owns the numbering). Per-epoch cost is the
    * batch-path cost: one scan of the EPOCH plus metadata-scale ledger
    * serves — the history's raw bytes enter nothing, so the loop's cost
    * tracks the crawl rate, not the corpus size.
    */
  def spineStream(drops: DataFrame, target: DataFrame, bench: DataFrame,
                  dedupStore: String, dsirStore: String,
                  noveltyStore: String, outDir: String, checkpoint: String,
                  k: Int = 100, maxContainmentPpm: Long = 950000L,
                  availableNow: Boolean = false)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val writer = drops.writeStream.option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, epoch: Long) =>
        spineEpoch(batch, epoch, target, bench, dedupStore, dsirStore,
          noveltyStore, outDir, k, maxContainmentPpm)
      }
    // availableNow: the DRAIN mode — process every pending drop exactly
    // once, then stop. The cron-or-CLI-driven operational shape: each
    // invocation picks up where the checkpoint left off (the CLI's
    // --spine-stream); a standing query passes false and keeps running.
    (if (availableNow)
       writer.trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
     else writer).start()
  }

  /** One epoch of [[spineStream]] — factored so the replay/admission/
    * commit chain is testable without a running query.
    */
  private[graft] def spineEpoch(batch: DataFrame, epoch: Long,
                                target: DataFrame, bench: DataFrame,
                                dedupStore: String, dsirStore: String,
                                noveltyStore: String, outDir: String,
                                k: Int, maxContainmentPpm: Long): Unit = {
    val s = batch.sparkSession
    val dropId = f"epoch-$epoch%06d"
    if (batch.isEmpty) ()
    else if (DsirStore.exists(s, dsirStore) &&
        DsirStore.drops(s, dsirStore).contains(dropId)) {
      // crash-replay of a committed epoch: the selection is already on
      // disk and the ledgers hold the drop — converge by skipping, and
      // leave the skip in the audit trail the admission log provides
      if (SketchStore.exists(s, noveltyStore))
        SketchStore.recordAdmission(s, noveltyStore, dropId,
          "skipped-duplicate-drop", None)
    } else incrementalSpineGated(batch, target, bench, dedupStore,
        dsirStore, noveltyStore, dropId, k, maxContainmentPpm) match {
      case Left(_) => () // verdict already recorded by the gate
      case Right((sel, commit)) =>
        sel.write.mode("overwrite").parquet(s"$outDir/$dropId")
        commit()
    }
  }

  /** q189's gate face: the manifest certificate of the daily-drop run. */
  def incrementalSpineManifest(drop: DataFrame, target: DataFrame,
                               bench: DataFrame, dedupStore: String,
                               dsirStore: String, k: Int = 100): DataFrame =
    graft.operators.Audit.manifest(
      incrementalSpineSelection(drop, target, bench, dedupStore, dsirStore, k),
      key = "doc_id",
      cols = Seq("lang", "score_ppm", "pack_shard", "seq_id", "tok_offset",
        "n_tokens"))

  /** stage 6 — q146: the 8-row manifest CERTIFICATE over
    * [[spineSelection]] — the reproducibility statement "these exact
    * docs, with these exact scores, in this exact layout" as constant
    * per-shard agg state. Two engines composing the same six stages
    * from the same corpus match iff these 8 rows match.
    */
  def spineManifest(corpus: DataFrame, target: DataFrame, bench: DataFrame,
                    k: Int = 100): DataFrame =
    graft.operators.Audit.manifest(
      spineSelection(corpus, target, bench, k), key = "doc_id",
      cols = Seq("lang", "score_ppm", "pack_shard", "seq_id", "tok_offset",
        "n_tokens"))
}
