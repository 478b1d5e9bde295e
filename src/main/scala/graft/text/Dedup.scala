package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Near-duplicate detection pipeline: shingle → MinHash → LSH band →
  * bucket self-join → exact-Jaccard verification.
  *
  * Scale shape (the reason this is THE dedup design for 100 TB corpora):
  *   1. signature/band computation is map-only (no shuffle, codegen'd md5);
  *   2. the only shuffle is the band-key self-join, whose keys are
  *      fine-grained (numBands × md5 space) so it hash-partitions evenly —
  *      no single reducer sees more than one bucket's docs;
  *   3. exact verification runs only on candidate pairs (|candidates| ≪
  *      |pairs|), each verified independently.
  * AQE handles residual bucket skew (a viral boilerplate text that lands
  * thousands of docs in one band bucket becomes a skew-split join at
  * runtime).
  *
  * Detection probability for Jaccard j with b bands × r rows: 1-(1-j^r)^b;
  * defaults (b=4, r=4) give ≈0.99 at j=0.9, ≈6e-6 per band at j=0.05 —
  * false candidates are then discarded by the exact verify stage, so the
  * output is exactly {pairs with Jaccard ≥ threshold} among banded pairs.
  */
object Dedup {

  /** (doc_id, sh:array<string>, sig, bands) per document. */
  def prepared(docs: DataFrame, idCol: String, textCol: String,
               shingleN: Int = 3, numHashes: Int = 16,
               numBands: Int = 4, rowsPerBand: Int = 4): DataFrame = {
    require(numBands * rowsPerBand == numHashes, "bands × rows must cover the signature")
    // Signature via the native one-pass expression (identical results to
    // TextOps.minhash — asserted in TextSpec); separate projections keep
    // lambdas capturing cheap column references.
    docs
      .select(col(idCol).as("doc_id"), TextOps.words(col(textCol)).as("ws"))
      .select(col("doc_id"), TextOps.shingleSet(col("ws"), shingleN).as("sh"))
      .select(col("doc_id"), col("sh"),
        graft.functions.MinHashSignature.of(col("sh"), numHashes).as("sig"))
      .select(col("doc_id"), col("sh"), TextOps.lshBands(col("sig"), numBands, rowsPerBand).as("bands"))
  }

  /** Candidate pairs (doc_a < doc_b) sharing ≥1 LSH band bucket.
    *
    * BLANK (empty/whitespace) docs are excluded from banding: the
    * `shingles` <n fallback gives every blank doc the same singleton
    * shingle set ([""]), so one band bucket would hold EVERY blank doc
    * and the verify's Jaccard-1 on identical singletons would "near-dup"
    * all of them into one survivor despite carrying no content — the
    * exact failure `Streams.sigKey` guards with per-doc `raw:` keys on
    * the streaming path. Short-but-real docs (1-2 words) stay IN: their
    * fallback shingle is their full text, so banding dedups them by
    * exact text (a singleton set can only reach Jaccard ≥ 0.7 against an
    * identical singleton) — the batch analog of sigKey's `txt:` keys.
    */
  def candidatePairs(prep: DataFrame): DataFrame = {
    val banded = prep
      .filter(!(size(col("sh")) === 1 && trim(element_at(col("sh"), 1)) === ""))
      .select(col("doc_id"), posexplode(col("bands")).as(Seq("band_idx", "band_key")))
    banded.as("a")
      .join(
        banded.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_key") === col("b.band_key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
  }

  /** Exact-Jaccard verified near-dup pairs.
    * Threshold is applied on integers (10·|∩| ≥ thresholdTenths·|∪|) so the
    * decision is engine-exact; the `jaccard` column is derived afterwards.
    * Union size is computed as |a|+|b|−|∩| (exact — shingle sets are
    * distinct), so the verify stage builds ONE hash set per pair
    * (array_intersect) instead of two (the array_union it replaced
    * materialized an (|a|+|b|)-element set per candidate just to count it).
    */
  def nearDupPairs(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
                   thresholdTenths: Int = 7, eager: Boolean = true): DataFrame = {
    // materialize: prep feeds THREE plan branches (the banded candidate
    // join plus both verify sides), and Catalyst does not deduplicate
    // common subtrees — without this the scan + tokenize + shingle + md5
    // signature work (the dominant map cost) runs three times per query.
    // Same reliable-checkpoint discipline as nearDupClusters.
    // eager=false (the SQL TVF path): checkpointing is a Spark JOB, and a
    // TVF builder runs at ANALYSIS time — an EXPLAIN must not execute the
    // pipeline's heaviest stage. cache() shares the branches just as well
    // but lazily (populated at first action, LRU-evictable afterwards).
    verifiedPairsFromPrep(prepared(docs, idCol, textCol), thresholdTenths,
      eager)
  }

  /** Band-join + exact-Jaccard verify over an already-prepared
    * (doc_id, sh, sig, bands) frame — the shingle-UNIVERSE-agnostic
    * tail of [[nearDupPairs]]: word shingles (text), hex byte shingles
    * ([[graft.multimodal.Binary.nearDupPayloadPairs]]), or anything
    * else set-shaped runs through the same LSH machinery.
    */
  private[graft] def verifiedPairsFromPrep(prep0: DataFrame,
                                           thresholdTenths: Int,
                                           eager: Boolean): DataFrame = {
    val prep = if (eager) materialize(prep0) else prep0.cache()
    val sh = prep.select(col("doc_id"), col("sh"))
    candidatePairs(prep)
      .join(sh.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(sh.as("sb"), col("doc_b") === col("sb.doc_id"))
      .select(
        col("doc_a"), col("doc_b"),
        size(array_intersect(col("sa.sh"), col("sb.sh"))).as("inter_size"),
        (size(col("sa.sh")) + size(col("sb.sh"))).as("__size_sum"))
      .withColumn("union_size", col("__size_sum") - col("inter_size"))
      .drop("__size_sum")
      .filter(col("inter_size") * 10 >= col("union_size") * lit(thresholdTenths))
      .withColumn("jaccard", col("inter_size").cast("double") / col("union_size"))
  }

  /** Cross-split leakage census: near-dup pairs (exact-Jaccard verified,
    * [[nearDupPairs]]) that SPAN two different splits of a deterministic
    * train/val/test assignment (`Sampling.assignSplit` on `idCol`) —
    * the contamination a random split can't prevent: an eval doc whose
    * near-copy sits in train is memorization fuel that exact-match
    * decontamination misses. Run this census BEFORE training; a
    * non-empty result names the pairs to evict (move both sides to the
    * same split, or drop the train-side copy).
    *
    * Scale shape: the pair leg is the banded LSH equi join (never
    * all-pairs); the split columns ride in on two broadcast-or-shuffled
    * id joins against the per-doc assignment — adding the census to an
    * existing dedup pass costs two id-equi joins, not a second
    * signature scan.
    */
  def crossSplitLeakage(docs: DataFrame, cuts: Seq[(String, Int)],
                        seed: String = "split",
                        idCol: String = "doc_id", textCol: String = "text",
                        thresholdTenths: Int = 7,
                        eager: Boolean = true): DataFrame = {
    val sp = docs.select(col(idCol).as("doc_id"),
      graft.operators.Sampling.assignSplit(col(idCol), cuts, seed).as("split"))
    nearDupPairs(docs, idCol, textCol, thresholdTenths, eager)
      .join(sp.select(col("doc_id").as("doc_a"), col("split").as("split_a")), "doc_a")
      .join(sp.select(col("doc_id").as("doc_b"), col("split").as("split_b")), "doc_b")
      .filter(col("split_a") =!= col("split_b"))
      .select(col("doc_a"), col("doc_b"), col("split_a"), col("split_b"),
        col("inter_size"), col("union_size"))
  }

  /** Source-level TRIAGE: the per-source health report that derives a
    * domain blocklist — the FineWeb/CCNet-style decision of which
    * SOURCES to keep crawling, made from evidence the engine already
    * computes per doc: near-dup density (a template-farm signal) and
    * mean document length (a boilerplate/short-page signal). Output per
    * source: (source, n_docs, n_dup_docs, dup_ppm, mean_words, passed)
    * — all integers (ppm, floor-div mean) so the decision is
    * engine-exact and the gate (q149) hashes the DECISIONS, not just
    * the stats.
    *
    * Scale shape: the near-dup leg is the banded LSH pair join (never
    * all-pairs); everything after is one distinct on dup ids + one
    * per-source aggregation. Sources are group keys, never collected.
    */
  def sourceTriage(docs: DataFrame, maxDupPpm: Long = 120000L,
                   minMeanWords: Long = 50L,
                   idCol: String = "doc_id", textCol: String = "text",
                   sourceCol: String = "source"): DataFrame = {
    val pairs = nearDupPairs(docs, idCol, textCol)
    val dupIds = pairs.select(col("doc_a").as("doc_id"))
      .unionByName(pairs.select(col("doc_b").as("doc_id")))
      .distinct().withColumn("__dup", lit(1L))
    docs.select(col(idCol).as("doc_id"), col(sourceCol).as("source"),
        size(TextOps.words(col(textCol))).cast("long").as("__nw"))
      .join(dupIds, Seq("doc_id"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(coalesce(col("__dup"), lit(0L))).as("n_dup_docs"),
        sum(col("__nw")).as("__w"))
      .select(col("source"), col("n_docs"), col("n_dup_docs"),
        expr("(n_dup_docs * 1000000) div n_docs").as("dup_ppm"),
        expr("__w div n_docs").as("mean_words"))
      .withColumn("passed",
        col("dup_ppm") <= maxDupPpm && col("mean_words") >= minMeanWords)
  }

  /** Containment-verified candidate pairs: asymmetric Jaccard
    * |A∩B| / min(|A|, |B|) ≥ thresholdTenths/10 — catches PARTIAL copies
    * (a doc quoted or embedded inside a larger one) that symmetric
    * Jaccard misses because the larger doc dilutes the union.
    *
    * Honest scale caveat: candidates still come from the MinHash band
    * join, whose collision probability tracks SYMMETRIC Jaccard — a tiny
    * doc fully contained in a huge one can evade the bands (the known
    * limitation; full containment search needs prefix filtering or an
    * LSH-Ensemble-style index). Within the candidate set the decision is
    * exact and engine-portable (integer threshold, one derived double).
    */
  def containmentPairs(docs: DataFrame, idCol: String = "doc_id",
                       textCol: String = "text",
                       thresholdTenths: Int = 8): DataFrame = {
    // three-branch reuse — materialized for the same reason as
    // nearDupPairs above
    val prep = materialize(prepared(docs, idCol, textCol))
    val sh = prep.select(col("doc_id"), col("sh"))
    candidatePairs(prep)
      .join(sh.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(sh.as("sb"), col("doc_b") === col("sb.doc_id"))
      .select(
        col("doc_a"), col("doc_b"),
        size(array_intersect(col("sa.sh"), col("sb.sh"))).as("inter_size"),
        size(col("sa.sh")).as("size_a"),
        size(col("sb.sh")).as("size_b"))
      .filter(col("inter_size") * 10 >=
        least(col("size_a"), col("size_b")) * lit(thresholdTenths))
      .withColumn("containment",
        col("inter_size").cast("double") / least(col("size_a"), col("size_b")))
  }

  /** EXACT containment self-join — the complete-recall answer to
    * [[containmentPairs]]' caveat: ALL pairs with
    * |A∩B| ≥ (thresholdTenths/10)·min(|A|,|B|) over 3-shingle sets, no
    * banding, no missed pairs. "Find every doc quoted inside a larger
    * one" with a completeness guarantee (oracle-gated as q114 against the
    * brute-force all-pairs join).
    *
    * Asymmetric prefix filtering (the q108 machinery adapted per VERDICT
    * r7 #2): in any qualifying pair, designate the doc with the smaller
    * (set size, id) as the PROBE. The probe emits only its prefix — its
    * |x|−⌈τ·|x|⌉+1 RAREST shingles under the global (df, shingle) order —
    * while every doc is indexed by ALL its shingles. A qualifying pair
    * shares o ≥ ⌈τ·min⌉ shingles and the probe's non-prefix elements
    * number ⌈τ·min⌉−1 < o, so at least one shared shingle lands in the
    * probe's prefix: every qualifying pair surfaces as a candidate.
    *
    * Scale shape: candidate volume per shingle = prefix-df × full-df;
    * boilerplate shingles have full-df in the millions but prefix-df ≈ 0
    * (rarest-first prefixes), so the equi join's hot keys carry almost no
    * probe rows — the skew guard is intrinsic to the algorithm. The
    * universe is shingleable (≥ 3-word) docs; shorter docs dedup exactly
    * via [[Store]]/[[Streams]] text fallbacks instead.
    */
  def containmentJoinExact(docs: DataFrame, idCol: String = "doc_id",
                           textCol: String = "text",
                           thresholdTenths: Int = 8,
                           eager: Boolean = true): DataFrame = {
    require(thresholdTenths >= 1 && thresholdTenths <= 10,
      s"thresholdTenths must be in [1, 10], got $thresholdTenths")
    // eager=false: lazy cache() instead of checkpoint for the SQL TVF
    // path, which builds this plan at analysis time (see nearDupPairs)
    val toks0 = docs
      .select(col(idCol).as("doc_id"), TextOps.words(col(textCol)).as("ws"))
      .filter(size(col("ws")) >= 3)
      .select(col("doc_id"), TextOps.shingleSet(col("ws"), 3).as("ts"))
      .withColumn("sz", size(col("ts")))
    val toks = if (eager) materialize(toks0) else toks0.cache()
    val dfc = toks.select(explode(col("ts")).as("t"))
      .groupBy("t").agg(count(lit(1)).as("df"))
    val pref = toks.select(col("doc_id"), col("sz"), explode(col("ts")).as("t"))
      .join(dfc, "t")
      .groupBy(col("doc_id"), col("sz"))
      .agg(array_sort(collect_list(struct(col("df"), col("t")))).as("ord"))
      .select(col("doc_id"), col("sz"),
        explode(expr("slice(ord, 1, " +
          s"CAST(sz - (($thresholdTenths*sz+9) div 10) + 1 AS INT))")).as("p"))
      .select(col("doc_id"), col("sz"), col("p.t").as("t"))
    val full = toks.select(col("doc_id"), col("sz"), explode(col("ts")).as("t"))
    val cand = pref.as("a").join(full.as("b"),
        col("a.t") === col("b.t") &&
          (col("a.sz") < col("b.sz") ||
            (col("a.sz") === col("b.sz") && col("a.doc_id") < col("b.doc_id"))))
      .select(least(col("a.doc_id"), col("b.doc_id")).as("doc_a"),
        greatest(col("a.doc_id"), col("b.doc_id")).as("doc_b"))
      .distinct()
    val sh = toks.select(col("doc_id"), col("ts"))
    // doc_b repartition: pins the exact-verify join's width (r18 — AQE's
    // bytes-based coalescing serialized the array_intersect stage; the
    // explicit count replaces the join's own exchange, see the q108 note)
    cand
      .join(sh.toDF("doc_a", "ta"), "doc_a")
      .repartition(docs.sparkSession.sparkContext.defaultParallelism,
        col("doc_b"))
      .join(sh.toDF("doc_b", "tb"), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        size(array_intersect(col("ta"), col("tb"))).as("inter_size"),
        least(size(col("ta")), size(col("tb"))).as("min_size"))
      .filter(col("inter_size") * 10 >= col("min_size") * lit(thresholdTenths))
  }

  /** Transitive near-dup clusters: connected components over the verified
    * pair graph via min-label propagation — rounds of
    * "label(n) ← min(label(n), min over neighbors)", run as DataFrame
    * joins UNTIL NO LABEL CHANGES. The fixed point is the per-component
    * minimum doc id — unique, so the result is deterministic and
    * independent of the iteration count (the r8 design fixed rounds at 6
    * for determinism; that silently under-merged any component whose
    * propagation distance exceeded 6, e.g. a template family with a long
    * edit chain — exactly the failure the fixture's short chains could
    * not catch). The convergence check is one count over the
    * already-materialized label frame per round; `maxIterations` is a
    * LOUD ceiling (throws, never truncates): min-label propagation needs
    * one round per hop of propagation distance, so a corpus that trips
    * 50 has pathological chain structure and wants the alternating
    * large-star/small-star contraction (O(log n) rounds) instead. At
    * 100 TB each round is one shuffled join over the verified edge list
    * (≪ corpus size).
    *
    * Iteration discipline (profiled, round 3): the cost of this query is
    * NOT the per-round jobs (sub-second at sf0.1) but driver-side
    * re-analysis + whole-stage-codegen of the growing plan — letting 3
    * rounds accumulate before a checkpoint made the round-3 plan cost ~19 s
    * of pure compilation. So: (1) the LSH pipeline is materialized ONCE via
    * an eager checkpoint (also avoids computing it twice through the
    * symmetric union), and (2) `labels` is checkpointed EVERY round, keeping
    * plan depth — and therefore planning/codegen time — constant per round.
    *
    * Durability: if the session has a checkpoint dir configured
    * (`sc.setCheckpointDir`, i.e. a reliable store — HDFS/S3 on a real
    * cluster), every materialization is a RELIABLE `checkpoint()`: a
    * multi-round job survives executor loss, which localCheckpoint does
    * not (executor-local blocks die with the executor, and the truncated
    * lineage makes recompute impossible — the whole job fails). Without a
    * checkpoint dir it falls back to `localCheckpoint` (the right default
    * for single-JVM/test runs where replication is meaningless). Set the
    * dir in production.
    *
    * Returns (doc_id, cluster_id = min doc_id in the doc's connected
    * component) for every doc appearing in a near-dup pair.
    */
  def nearDupClusters(docs: DataFrame, maxIterations: Int = 50): DataFrame = {
    val pairs = materialize(nearDupPairs(docs)
      .select(col("doc_a"), col("doc_b")))
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .unionByName(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
    var labels = materialize(edges.select(col("src").as("node")).distinct()
      .withColumn("label", col("node")))
    var round = 0
    var changed = 1L
    while (changed > 0) {
      round += 1
      if (round > maxIterations) throw new IllegalStateException(
        s"nearDupClusters did not converge within $maxIterations rounds — " +
          "a near-dup component's propagation distance exceeds the ceiling " +
          "(a template family with a very long edit chain). Raise " +
          "maxIterations, or switch this corpus to an alternating " +
          "large-star/small-star contraction.")
      val nbrMin = edges
        .join(labels.select(col("node").as("dst"), col("label").as("dl")), Seq("dst"))
        .groupBy(col("src"))
        .agg(min(col("dl")).as("nl"))
      // __improved rides inside the SAME materialized frame, so counting
      // the changed labels scans checkpointed rows — no plan re-execution
      // and no second join just to detect the fixed point.
      val next = materialize(labels
        .join(nbrMin.select(col("src").as("node"), col("nl")), Seq("node"), "left")
        .select(col("node"),
          least(col("label"), coalesce(col("nl"), col("label"))).as("label"),
          (col("nl") < col("label")).as("__improved")))
      changed = next.filter(col("__improved")).count()
      labels = next.drop("__improved")
    }
    labels.select(col("node").as("doc_id"), col("label").as("cluster_id"))
  }

  /** Content-defined chunking (CDC, the rsync/LBFS boundary rule): split
    * each doc's token stream AFTER every position whose trailing k-gram
    * hashes to 0 mod `divisor` — boundaries are decided by CONTENT, so
    * inserting a sentence re-chunks only the chunk it lands in while
    * every later chunk re-aligns byte-identically (fixed-width chunking
    * shifts ALL downstream chunks, which is why storage dedup abandoned
    * it). The dedup granularity for append/prepend-heavy corpora — mail
    * threads, forum quotes, versioned documents — where doc-level
    * near-dup misses the share and span-level detection pays gram-level
    * costs for it. Expected chunk length ≈ `divisor` tokens; docs
    * shorter than k form one whole-doc chunk.
    *
    * Output: (doc_id, chunk_idx 1-based, n_words, chunk_key = md5 of the
    * chunk's space-joined words). Scale shape: one shingle explode
    * (map-side), the boundary flags join back position-equi, the
    * chunk-id assignment is a per-doc running sum (window partitioned by
    * doc — never global), and reassembly is one hash agg per (doc,
    * chunk) exactly like the span scrub's — no sorts outside the agg
    * buffer, no driver-side text.
    */
  def cdcChunks(docs: DataFrame, k: Int = 3, divisor: Int = 8,
                idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1, s"k must be >= 1, got $k")
    require(divisor >= 2, s"divisor must be >= 2, got $divisor")
    val d = docs.select(col(idCol).as("doc_id"), TextOps.words(col(textCol)).as("ws"))
    // boundary AFTER 1-based position p0 + k (the shingle's end); a cut
    // after the final token would open an empty chunk, so it is dropped
    val flags = d
      .select(col("doc_id"), size(col("ws")).as("n"),
        posexplode(TextOps.shingles(col("ws"), k)).as(Seq("p0", "g")))
      .filter(col("p0") + lit(k) < col("n"))
      .filter(graft.operators.Sampling.hashBucket(col("g"), divisor, "cdc") === 0)
      .select(col("doc_id"), (col("p0") + lit(k)).as("cut_after"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    d.select(col("doc_id"), posexplode(col("ws")).as(Seq("t0", "w")))
      .select(col("doc_id"), (col("t0") + lit(1)).as("pos"), col("w"))
      .join(flags.select(col("doc_id"), col("cut_after").as("pos"),
        lit(1).as("__b")), Seq("doc_id", "pos"), "left")
      .withColumn("chunk_idx", lit(1) +
        coalesce(sum(col("__b")).over(w.rowsBetween(Window.unboundedPreceding, -1)),
          lit(0)).cast("int"))
      .groupBy(col("doc_id"), col("chunk_idx"))
      .agg(count(lit(1)).as("n_words"),
        md5(array_join(
          transform(array_sort(collect_list(struct(col("pos"), col("w")))),
            x => x.getField("w")), " ")).as("chunk_key"))
  }

  /** Per-doc CDC duplication census: how much of each doc consists of
    * chunks that also appear in ANOTHER doc (chunk-key match across
    * doc ids — verbatim shared blocks under content-defined alignment).
    * Output: (doc_id, n_chunks, n_words, n_dup_chunks, dup_words).
    */
  def cdcDupStats(docs: DataFrame, k: Int = 3, divisor: Int = 8,
                  idCol: String = "doc_id", textCol: String = "text",
                  eager: Boolean = true): DataFrame = {
    val chunks0 = cdcChunks(docs, k, divisor, idCol, textCol)
    // chunks feeds the cross-doc df agg AND the per-doc rollup
    val chunks = if (eager) materialize(chunks0) else chunks0
    val shared = chunks
      .groupBy(col("chunk_key"))
      .agg(countDistinct(col("doc_id")).as("key_docs"))
      .filter(col("key_docs") >= 2)
      .select(col("chunk_key"))
    chunks.join(shared.withColumn("__dup", lit(1)), Seq("chunk_key"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(col("n_words")).as("n_words"),
        sum(when(col("__dup").isNotNull, 1L).otherwise(0L)).as("n_dup_chunks"),
        sum(when(col("__dup").isNotNull, col("n_words")).otherwise(0L))
          .as("dup_words"))
  }

  /** Eager lineage cut, reliable when the session can be: `checkpoint()`
    * to the configured checkpoint dir (survives executor loss), else
    * `localCheckpoint` (executor-local, test/single-JVM fallback).
    *
    * Retention: Spark does NOT delete reliable checkpoint files by default
    * — a recurring clustering job accumulates ~2+rounds directories per
    * run. Set `spark.cleaner.referenceTracking.cleanCheckpoints=true` (the
    * ContextCleaner then removes them as the RDDs are GC'd) or point the
    * checkpoint dir at a per-run path and delete it once the result is
    * consumed.
    */
  private[graft] def materialize(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) df.checkpoint(true)
    else df.localCheckpoint(true)

  /** Benchmark decontamination: drop corpus docs sharing ANY word n-gram
    * with an eval/benchmark set — the standard guard against test-set
    * leakage into training data.
    *
    * Scale shape: the benchmark is small (eval suites are MBs against a
    * 100 TB corpus), so its distinct shingles BROADCAST; the corpus-side
    * probe is then a map-only broadcast semi join over exploded shingles —
    * no corpus shuffle. Only the matched (contaminated) doc ids — a tiny
    * set — are shuffled for the distinct, then broadcast back for the
    * anti join. If contamination were ever corpus-sized, drop the second
    * `broadcast` hint and let the anti join shuffle.
    */
  def decontaminate(corpus: DataFrame, benchmark: DataFrame,
                    idCol: String = "doc_id", textCol: String = "text",
                    shingleN: Int = 3): DataFrame = {
    def shingled(df: DataFrame) = df
      .select(col(idCol), TextOps.words(col(textCol)).as("ws"))
      .select(col(idCol), explode(TextOps.shingleSet(col("ws"), shingleN)).as("s"))
    val benchShingles = shingled(benchmark).select(col("s")).distinct()
    val contaminated = shingled(corpus)
      .join(broadcast(benchShingles), Seq("s"), "left_semi")
      .select(col(idCol))
      .distinct()
    corpus.join(broadcast(contaminated), Seq(idCol), "left_anti")
  }

  /** Corpus-level boilerplate removal (the paragraph-dedup step of a
    * CCNet-style pipeline, expressed at word-segment granularity since the
    * unit of repetition is configurable): segment every doc into
    * non-overlapping `w`-word chunks, count each distinct segment's
    * document frequency across the WHOLE corpus, drop segments appearing
    * in >= `minDf` docs (headers, footers, license blocks, nav chrome),
    * and reassemble the surviving segments in order. Docs whose every
    * segment is boilerplate stay in the output with an empty clean text —
    * dropping them is a separate quality decision.
    *
    * Scale shape: two scans of the corpus (one feeding the df count, one
    * feeding the keep side — the exploded segment stream is bigger than
    * the source, so re-scanning beats caching it), one shuffle on segment
    * text for the df count (partial-agg'd), one join marking hot segments
    * (the hot set is small by construction: boilerplate is few DISTINCT
    * strings, so it broadcasts), and ONE per-doc aggregation computing
    * total, kept, and reassembly together (`collect_list` skips nulls, so
    * the conditional struct collects exactly the kept segments — no
    * anti-join + reunite round trip). No window over the corpus, no
    * driver-side state.
    *
    * Output: (doc_id, n_segs, n_kept, clean_text) — counts as ints,
    * decisions on exact integer df, so engine-exact vs the DuckDB oracle.
    */
  def removeBoilerplate(docs: DataFrame, idCol: String = "doc_id",
                        textCol: String = "text",
                        w: Int = 3, minDf: Int = 3): DataFrame = {
    val prep = docs
      .select(col(idCol).as("doc_id"), TextOps.words(col(textCol)).as("ws"))
      .select(col("doc_id"), posexplode(TextOps.segments(col("ws"), w))
        .as(Seq("seg_id", "seg")))
    val hot = prep.groupBy(col("seg"))
      .agg(countDistinct(col("doc_id")).as("df"))
      .filter(col("df") >= minDf)
      .select(col("seg"), lit(1).as("__hot"))
    prep.join(hot, Seq("seg"), "left")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).cast("int").as("n_segs"),
        count(when(col("__hot").isNull, 1)).cast("int").as("n_kept"),
        array_join(
          transform(
            array_sort(collect_list(
              when(col("__hot").isNull, struct(col("seg_id"), col("seg"))))),
            x => x.getField("seg")), " ").as("clean_text"))
  }

  /** Near-dup survivorship: keep the smallest doc_id of each near-dup
    * pair-chain's local comparisons (a doc is a duplicate iff it has ANY
    * near-dup partner with a smaller id — deterministic without computing
    * full connected components). Returns per-`groupCol` counts.
    */
  def survivorStats(docs: DataFrame, groupCol: String): DataFrame = {
    val losers = nearDupPairs(docs)
      .select(col("doc_b").as("doc_id"))
      .distinct()
      .withColumn("is_dup", lit(1))
    docs
      .join(losers, Seq("doc_id"), "left")
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(coalesce(col("is_dup"), lit(0))).as("n_dup"))
      .withColumn("n_kept", col("n_docs") - col("n_dup"))
  }

  /** Quality-aware near-dup survivorship: of every verified near-dup
    * pair, the LOWER-quality doc loses (tie → the larger id loses, so the
    * tie rule degrades to the keep-smallest-id policy of
    * [[survivorStats]]). A doc survives iff it loses no pair — the same
    * local pair-chain decision as survivorStats, deterministic without
    * computing full connected components, but keeping the doc you'd
    * actually want in a training corpus (longest / richest / highest
    * scoring) instead of whichever crawl happened to get the smaller id.
    *
    * `quality` must be an exact integer expression over the doc's columns
    * (a double score invites cross-engine ties that flip the winner;
    * floor it to milli-units first).
    *
    * Scale shape: pairs come from the banded LSH join (equi, verified),
    * and are ≪ corpus; the per-side quality lookups join the tiny pair
    * list against the corpus (broadcastable pair side), and the final
    * anti join removes the loser set. No window, no sort, no CC rounds.
    */
  def survivorsByQuality(docs: DataFrame, quality: Column,
                         idCol: String = "doc_id", textCol: String = "text",
                         thresholdTenths: Int = 7): DataFrame = {
    val q = docs.select(col(idCol).as("__qid"), quality.cast("long").as("__q"))
    val losers = nearDupPairs(docs, idCol, textCol, thresholdTenths)
      .join(q.as("qa"), col("doc_a") === col("qa.__qid"))
      .join(q.as("qb"), col("doc_b") === col("qb.__qid"))
      .select(when(col("qa.__q") < col("qb.__q"), col("doc_a"))
        .otherwise(col("doc_b")).as(idCol))
      .distinct()
    docs.join(losers, Seq(idCol), "left_anti")
  }
}
