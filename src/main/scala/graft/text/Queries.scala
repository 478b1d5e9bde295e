package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Text-analysis / dedup queries over the `documents` table, each with an
  * exact DuckDB oracle. Hash domains are md5 hex strings and decisions are
  * made on integers, so results are engine-exact (see TextOps/Dedup docs).
  */
object Queries {

  def all: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Token counting: whitespace tokens, distinct types, alpha-run tokens
    // (BPE-ish regex), chars-per-token.
    "q20_token_stats" -> ((s, dir) => {
      val ws = TextOps.words(col("text"))
      Tables(s, dir).documents.select(
        col("doc_id"),
        size(ws).as("n_tokens"),
        size(array_distinct(ws)).as("n_types"),
        size(regexp_extract_all(col("text"), lit("[a-z]+"), lit(0))).as("n_alpha"),
        (col("n_chars").cast("double") / size(ws)).as("chars_per_token"))
    }),

    // Heuristic language ID: stopword-profile scores + argmax with
    // deterministic tie-break (profile order, then "und").
    "q21_lang_id" -> ((s, dir) => {
      val d = Tables(s, dir).documents.withColumn("ws", TextOps.words(col("text")))
      val scores = TextOps.langProfiles.map { case (lang, vocab) =>
        TextOps.vocabHits(col("ws"), vocab).as(s"score_$lang")
      }
      d.select(Seq(col("doc_id"), col("lang")) ++ scores
        :+ TextOps.langId(col("ws")).as("pred_lang"): _*)
    }),

    // Quality scoring: type/token ratio, stopword ratio, mean token length,
    // and a composite keep/drop flag — all decisions on exact int ratios.
    "q22_quality" -> ((s, dir) => {
      val d = Tables(s, dir).documents.withColumn("ws", TextOps.words(col("text")))
      d.select(
          col("doc_id"),
          size(col("ws")).as("n_tokens"),
          (size(array_distinct(col("ws"))).cast("double") / size(col("ws"))).as("ttr"),
          (TextOps.vocabHits(col("ws"), Seq("the", "a", "of", "and", "to")).cast("double") /
            size(col("ws"))).as("stop_ratio"),
          ((col("n_chars") - (size(col("ws")) - 1)).cast("double") / size(col("ws")))
            .as("mean_tok_len"))
        .withColumn("quality_ok",
          when(col("n_tokens").between(20, 90) && col("ttr") >= 0.25, 1).otherwise(0))
    }),

    // Document fingerprinting: whole-doc digest + content-defined
    // min-shingle fingerprint (stable under head/tail edits).
    "q23_fingerprint" -> ((s, dir) => {
      Tables(s, dir).documents
        .select(col("doc_id"), col("text"), TextOps.words(col("text")).as("ws"))
        .select(
          col("doc_id"),
          TextOps.docFingerprint(col("text")).as("fp_doc"),
          TextOps.minShingleFingerprint(TextOps.shingleSet(col("ws"), 3)).as("fp_shingle"))
    }),

    // MinHash+LSH near-dup pairs, exact-Jaccard verified (j ≥ 0.7).
    // repartition: the small test file is one split; signature work is
    // map-heavy and should use every core (no-op on real multi-split data).
    "q24_minhash_pairs" -> ((s, dir) =>
      Dedup.nearDupPairs(
        Tables(s, dir).documents.repartition(s.sparkContext.defaultParallelism))),

    // Near-dup for the BINARY column (multimodal leg of the dedup
    // taxonomy): hex byte 12-shingles → the SAME 16-hash/4×4-band LSH +
    // exact-Jaccard verify the text path runs — container-level dup
    // detection (re-wrapped/truncated/watermark-appended payloads) that
    // exact blob digests (q67) miss and that needs no decoder; the
    // content-aware leg (dHash banding for recompressed images) is
    // MultimodalSpec-gated since DuckDB can't decode pixels. Payload =
    // UTF-8 bytes of text (withPayload — TESTDATA has no true media;
    // the byte path is codec-blind by construction).
    "q204_binary_neardup" -> ((s, dir) =>
      graft.multimodal.Binary.nearDupPayloadPairs(
        graft.multimodal.Binary.withPayload(
          Tables(s, dir).documents
            .repartition(s.sparkContext.defaultParallelism)))),

    // q204's dedup as a STORE SERVE — the incremental form a daily media
    // crawl actually runs: the history's byte-shingle signatures are
    // persisted once (bytes-universe marker), the new drop alone is
    // hex-shingled/signed, and survivorship (cross-history + intra-drop,
    // smallest-id) replays q106's semantics over the binary column. The
    // oracle recomputes everything from scratch, so the gate proves the
    // marker-driven prep, the stored-side reuse and the verify land on
    // the brute-force dup set.
    "q206_binary_store" -> ((s, dir) => {
      // repartition before the payload signing (r18): the sf-scale
      // parquet scan is one split, and the byte-shingle prep is the
      // serve's dominant map cost — the same parallelism the winnow
      // siblings (q208/q209) already request. Results are per-doc;
      // layout-independent.
      val d = Tables(s, dir).documents
      Store.dedupNewDropVsCorpusReadOnly(
          graft.multimodal.Binary.withPayload(d.filter(col("doc_id") % 3 === 0)
            .repartition(s.sparkContext.defaultParallelism)),
          binaryStoreFixture(s, dir), textCol = "payload")
        .select(col("doc_id"), col("source"))
    }),

    // Byte-level winnowing fingerprints (q77 on the bytes universe — the
    // SCALE PATH of the binary dedup taxonomy): min md5-hash per sliding
    // 8-window of byte 12-grams, guaranteed detection of any shared
    // ≥ 19-byte run at ~2/9 the stride-1 row volume q204 shuffles. The
    // window-select stage is Winnow's verbatim; only the gram prep is
    // byte-universe.
    "q208_binary_winnow" -> ((s, dir) =>
      graft.multimodal.Binary.byteFingerprints(
        graft.multimodal.Binary.withPayload(
          Tables(s, dir).documents
            .repartition(s.sparkContext.defaultParallelism)))),

    // Partial-copy payload pairs by shared winnowing fingerprints (q79
    // on bytes): the embedded-verbatim-block detector MinHash can't
    // express, with the stop-fingerprint skew guard dropping boilerplate
    // byte runs before the self-join.
    "q209_binary_winnow_pairs" -> ((s, dir) =>
      graft.multimodal.Binary.nearDupPayloadPairsByFingerprint(
        graft.multimodal.Binary.withPayload(
          Tables(s, dir).documents
            .repartition(s.sparkContext.defaultParallelism)))),

    // The winnow path's INCREMENTAL form (closing r14's "what's missing
    // #1"): the history's byte fingerprints are persisted once
    // (bytes-universe marker), the drop alone is fingerprinted, and the
    // partial-copy pairs (drop×history + intra-drop) come from the
    // stored table — a daily drop's embedded-verbatim-block check
    // without re-fingerprinting 100 TB of history. The stop-fingerprint
    // df guard counts over history ∪ drop, and the oracle replays the
    // whole mine from scratch, so the gate proves the stored side, the
    // marker-driven prep and the union-side guard all land on the
    // from-scratch answer.
    "q210_fp_store" -> ((s, dir) =>
      // repartition: parallelize the drop's fingerprint map (r18 — see
      // the q206 note; tools.Attr measured the signing as ONE 1.9 s task)
      FpStore.pairsVsStoreReadOnly(
        graft.multimodal.Binary.withPayload(
          Tables(s, dir).documents.filter(col("doc_id") % 3 === 0)
            .repartition(s.sparkContext.defaultParallelism)),
        fpStoreFixture(s, dir), contentCol = "payload")),

    // q210's serve against the PURGED fingerprint store: pairs that
    // existed only via a taken-down source's fingerprints must vanish,
    // the df guard must recount over the purged history (a fingerprint
    // that was boilerplate only WITH the removed docs comes back), and
    // the takedown rewrite must carry the k/w/universe marker through.
    "q211_fp_takedown" -> ((s, dir) =>
      FpStore.pairsVsStoreReadOnly(
        graft.multimodal.Binary.withPayload(
          Tables(s, dir).documents.filter(col("doc_id") % 3 === 0)
            .repartition(s.sparkContext.defaultParallelism)),
        fpPurgedStoreFixture(s, dir), contentCol = "payload")),

    // The perceptual-hash STORE's serve (closing r15's "what's missing
    // #2"): history is hashed ONCE into a persisted (doc_id, modality,
    // h) table — 17 B/row — and a drop's "is this a re-encode of
    // anything in history?" question is the banded 64-bit-Hamming
    // equi-join against that scan, never a corpus re-decode. The gate
    // runs the oracle-checkable bytes leg (56-bit SimHash over byte
    // 12-grams); the decode-dependent dHash/aHash legs share every line
    // of the store and the band join and are spec-pinned bit-exact
    // (MultimodalSpec), since no SQL engine can decode a PNG.
    "q212_hash_store" -> ((s, dir) =>
      graft.multimodal.HashStore.pairsVsStoreReadOnly(
        graft.multimodal.Binary.withPayload(
          Tables(s, dir).documents.filter(col("doc_id") % 3 === 0)
            .repartition(s.sparkContext.defaultParallelism)),
        hashStoreFixture(s, dir), modalities = Seq("bytes"))),

    // q212's serve against the PURGED hash store: pairs that existed
    // only via a taken-down source's doc must vanish — doc-keyed
    // delete-and-done, the same takedown recipe as every doc-keyed
    // ledger (rows carry no cross-doc state, so removal is exact).
    "q213_hash_takedown" -> ((s, dir) =>
      graft.multimodal.HashStore.pairsVsStoreReadOnly(
        graft.multimodal.Binary.withPayload(
          Tables(s, dir).documents.filter(col("doc_id") % 3 === 0)
            .repartition(s.sparkContext.defaultParallelism)),
        hashPurgedStoreFixture(s, dir), modalities = Seq("bytes"))),

    // Span-containment RETRIEVAL (the "which stored payload contains
    // this probe?" question the whole-doc hashes deliberately don't
    // answer) on the oracle-checkable bytes_win leg: probes are stored
    // docs trimmed by exactly one hop (32 bytes), so their windows
    // re-align with the source's (Hamming 0) and n_matched counts the
    // aligned distinct probe windows. The oracle replays the ENTIRE
    // serve from scratch — hex windowing, per-window distinct-gram
    // 56-bit simhash, BRUTE-FORCE Hamming ≤ 3, the distinct-win_idx
    // count and the minMatched floor — so the gate independently proves
    // the shared retrieveByLeg core (banded join + window counting)
    // that the decode-dependent audio_win/image_tile legs run through.
    "q214_span_retrieve" -> ((s, dir) =>
      graft.multimodal.HashStore.retrieveSpans(
        spanProbes(Tables(s, dir).documents),
        bwinStoreFixture(s, dir))),

    // q214's probes against the PURGED span store: retrieval rows whose
    // stored side was taken down must vanish (a trimmed probe of a
    // removed doc stops finding its source), doc-keyed delete-and-done.
    "q215_span_takedown" -> ((s, dir) =>
      graft.multimodal.HashStore.retrieveSpans(
        spanProbes(Tables(s, dir).documents),
        bwinPurgedStoreFixture(s, dir))),

    // q206's serve against the PURGED store (q141 on the bytes
    // universe): payload near-dups that existed only via a taken-down
    // source's doc must no longer drop the new doc, and the takedown
    // rewrite must carry the `v2 … bytes` marker through — the serve
    // would silently match nothing under a lost universe.
    "q207_binary_takedown" -> ((s, dir) => {
      val d = Tables(s, dir).documents
      Store.dedupNewDropVsCorpusReadOnly(
          graft.multimodal.Binary.withPayload(d.filter(col("doc_id") % 3 === 0)
            .repartition(s.sparkContext.defaultParallelism)),
          binaryPurgedStoreFixture(s, dir), textCol = "payload")
        .select(col("doc_id"), col("source"))
    }),

    // Source-level triage (the domain-blocklist decision): per source,
    // near-dup doc density + mean doc length → an integer-exact
    // keep/block decision. The thresholds sit INSIDE the corpus's
    // observed ranges (dup_ppm 0–200000, mean words 45–62), so both
    // rules actually fire: template-farm sources fail on dup_ppm,
    // short-page sources on mean_words, and the oracle replays the full
    // LSH+verify dup census plus the word means — a mis-filed source
    // flips a hashed boolean.
    "q149_source_triage" -> ((s, dir) =>
      Dedup.sourceTriage(
        Tables(s, dir).documents.repartition(s.sparkContext.defaultParallelism))),

    // Cross-split leakage census: deterministic 900/950/1000-per-mille
    // train/val/test assignment (the q62 md5-bucket decision, so a doc's
    // split never changes across runs), then every verified near-dup
    // pair (j ≥ 0.7) that SPANS two splits — the eval-contamination
    // report a split must pass before training. The oracle replays the
    // split expression AND the full LSH+verify pipeline; a pair leaking
    // across the boundary that the census misses hash-fails.
    "q144_split_leakage" -> ((s, dir) =>
      Dedup.crossSplitLeakage(
        Tables(s, dir).documents.repartition(s.sparkContext.defaultParallelism),
        cuts = Seq("train" -> 900, "val" -> 950, "test" -> 1000))),

    // SimHash document signatures (16-bit, ±1 bit votes) via the native
    // one-pass expression (declarative parity asserted in TextSpec).
    "q25_simhash" -> ((s, dir) => {
      Tables(s, dir).documents
        .select(col("doc_id"), TextOps.wordHashes(TextOps.words(col("text"))).as("hs"))
        .select(col("doc_id"), graft.functions.SimHashBits.of(col("hs"), 16).as("simhash16"))
    }),

    // Near-dup survivorship per source: docs flagged duplicate iff they have
    // a smaller-id near-dup partner (MarkDuplicates-style keep-best).
    "q26_neardup_keep" -> ((s, dir) =>
      Dedup.survivorStats(
        Tables(s, dir).documents.repartition(s.sparkContext.defaultParallelism), "source")),

    // Transitive near-dup clusters (connected components by min-label
    // propagation iterated to the fixed point; the oracle computes the
    // same fixed point via a recursive reachability CTE).
    "q48_neardup_clusters" -> ((s, dir) =>
      Dedup.nearDupClusters(
        Tables(s, dir).documents.repartition(s.sparkContext.defaultParallelism))),

    // Template-family SIZE census: how many near-dup clusters exist at
    // each size — the one-glance answer to "is duplication pairwise
    // noise or industrial template farms" (a heavy tail here is what
    // justifies span-level and source-level dedup). Rolls up q48's
    // converged components; two tiny aggs over the label table.
    "q159_dup_cluster_sizes" -> ((s, dir) =>
      Dedup.nearDupClusters(
          Tables(s, dir).documents.repartition(s.sparkContext.defaultParallelism))
        .groupBy(col("cluster_id")).agg(count(lit(1)).as("cluster_size"))
        .groupBy(col("cluster_size")).agg(count(lit(1)).as("n_clusters"))),

    // The SAME components via alternating large-star/small-star
    // contraction (O(log n) rounds vs label propagation's O(distance)) —
    // cross-gated against q48's fixed-point oracle, so the two
    // interchangeable implementations can never drift apart.
    "q153_cc_stars" -> ((s, dir) => {
      val pairs = Dedup.nearDupPairs(
          Tables(s, dir).documents.repartition(s.sparkContext.defaultParallelism))
        .select(col("doc_a").as("u"), col("doc_b").as("v"))
      graft.operators.Graph.connectedComponents(pairs)
        .select(col("node").as("doc_id"), col("component").as("cluster_id"))
    }),

    // SimHash near-dup pairs: 56-bit signatures, candidates generated by
    // exact-match on one of 4 14-bit bands (pigeonhole: hamming ≤ 3 can
    // touch at most 3 of the 4 bands, so ≥1 band is identical — zero false
    // negatives), verified by exact hamming distance. The SimHash leg of
    // the dedup taxonomy — same band-join shape as MinHash LSH but on
    // integer signature slices, so the shuffle key is a (band, slice) pair
    // and the verify step is a single xor+popcount per candidate (vs.
    // array intersection for Jaccard). Integer decisions throughout →
    // engine-exact. Width matters at scale: 14-bit bands give 16,384
    // buckets per band, so unrelated-doc collisions (candidate-set size)
    // scale as n²/2¹⁴ per band instead of the n²/2⁴ a nibble band would —
    // the band width is THE knob that keeps the verify stage ≪ n².
    "q49_simhash_pairs" -> ((s, dir) => {
      val sims = Tables(s, dir).documents
        .repartition(s.sparkContext.defaultParallelism)
        .select(col("doc_id"),
          TextOps.wordHashesHex(TextOps.words(col("text")), 14).as("hs"))
        .select(col("doc_id"), graft.functions.SimHashBits.of(col("hs"), 56).as("sh56"))
      val banded = sims.select(col("doc_id"), col("sh56"),
        posexplode(array((0 until 4).map(g =>
          shiftright(col("sh56"), g * 14).bitwiseAND(lit(0x3fffL))): _*))
          .as(Seq("band", "slice")))
      banded.as("a")
        .join(banded.as("b"),
          col("a.band") === col("b.band") && col("a.slice") === col("b.slice") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
          TextOps.hamming(col("a.sh56"), col("b.sh56")).as("hamming"))
        .filter(col("hamming") <= 3)
        .distinct()
    }),

    // Deterministic hash sampling (10%): md5-bucket filter — reproducible
    // across runs/partitionings/engines, which `df.sample()`'s
    // per-partition RNG is not. Map-only (codegen'd filter, no shuffle).
    "q62_sample_hash" -> ((s, dir) =>
      graft.operators.Sampling.deterministicSample(
          Tables(s, dir).documents, col("doc_id"), 100)
        .select(col("doc_id"), col("lang"), col("source"))),

    // Per-row weighted sampling: each doc's keep rate is derived from its
    // own length (clamped at 999‰) — importance sampling where bigger
    // docs are likelier to survive. Same map-only md5-bucket decision as
    // q62; the rate column is the only difference.
    "q90_weighted_sample" -> ((s, dir) =>
      graft.operators.Sampling.weightedSample(
          Tables(s, dir).documents, col("doc_id"),
          least(lit(999), col("n_chars") * 2), seed = "w")
        .select(col("doc_id"), col("lang"), col("n_chars"))),

    // Capped inverted index: per term, the doc frequency plus the FIRST
    // 10 doc ids as a posting string. ONE partial/final aggregation:
    // array_distinct before explode makes (doc, term) unique map-side (no
    // pre-shuffle distinct), df is then a plain count, and the capped
    // posting list rides the native bounded-heap topk_values aggregate —
    // negated ids turn "k largest" into "k smallest", so a hot term
    // costs O(k) buffer and ≤ k shuffled values per partition where
    // collect_list would ship every posting to one reducer.
    "q89_inverted_index" -> ((s, dir) =>
      Tables(s, dir).documents
        .select(col("doc_id"),
          explode(array_distinct(TextOps.words(col("text")))).as("term"))
        .groupBy(col("term"))
        .agg(
          count(lit(1)).as("df"),
          call_function("topk_values", -col("doc_id"), lit(10)).as("__negs"))
        .select(col("term"), col("df"),
          concat_ws(",",
            transform(col("__negs"), v => (-v).cast("string")))
            .as("postings"))),

    // Fuzzy short-string dedup (title matching): candidate pairs by a
    // cheap COMPOUND blocking key — (first word, title-length div 4) —
    // verified by exact edit distance: the classic blocked-levenshtein
    // shape for titles/names where shingle Jaccard has nothing to chew
    // on. Block join is EQUI (never all-pairs); the length bucket splits
    // stop-word-heavy hot blocks (r6's raw first-word key put every
    // "the ..." title in ONE block — a single-task O(b²) straggler at
    // scale), and a hard per-block cap (k smallest doc_ids via the
    // bounded-heap TopKPerKey, O(k) memory per block) bounds worst-case
    // block work to C(k,2) pairs no matter how skewed the corpus — the
    // same guard shape as q79's maxDf stop-fingerprint. The cap is a
    // documented recall trade (same as any production blocker); the
    // oracle replicates it exactly via row_number, so the decision stays
    // engine-exact integers throughout.
    "q95_fuzzy_pairs" -> ((s, dir) => {
      val t0 = Tables(s, dir).documents.select(
        col("doc_id"),
        array_join(slice(TextOps.words(col("text")), 1, 5), " ").as("title"),
        element_at(TextOps.words(col("text")), 1).as("blk_w"))
        .withColumn("blk_len", expr("length(title) div 4"))
      val t = graft.operators.Relational.topKPerKey(
        t0, keys = Seq(col("blk_w"), col("blk_len")),
        order = Seq(col("doc_id").asc), k = 64)
      t.as("a").join(t.as("b"),
          col("a.blk_w") === col("b.blk_w") &&
            col("a.blk_len") === col("b.blk_len") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
          // threshold form: the DP abandons a row once every cell exceeds
          // 6 (returns -1) — O(k·len) per pair instead of O(len²), exact
          // distance for every pair that passes
          levenshtein(col("a.title"), col("b.title"), 6).as("dist"))
        .filter(col("dist") >= 0 && col("dist") <= 6)
    }),

    // Incremental cross-drop dedup against the PERSISTED signature store:
    // drop 1 (doc_id % 3 != 0) is built into the store once; drop 2's
    // docs are signed fresh, near-dups vs the STORED signatures (banded
    // equi join + exact verify against stored shingles — drop 1 is never
    // re-tokenized) and intra-drop dups (smallest-id) are removed, and
    // survivors' signatures are appended. The daily-ingest lifecycle a
    // 100 TB corpus actually runs — q24 recomputes everything per run,
    // this recomputes only the new drop.
    "q106_incr_dedup" -> ((s, dir) => {
      val d = Tables(s, dir).documents
      // the store is a per-(session, sf-dir) FIXTURE (built once, reused
      // across Verify + Bench's warm-up/min-of-3 — the q111 bucketed-table
      // pattern): the measured cost is the SERVE path, which is what the
      // operator exists to provide (r7 VERDICT wrong #2; Bench records the
      // build separately as q106_build). Serving is READ-ONLY — no append,
      // not even a staging write — so the fixture store is never mutated
      // and every re-run deduplicates against the same corpus: idempotence
      // by construction, with nothing accumulating per invocation.
      val storeDir = storeFixture(s, dir)
      Store.dedupNewDropVsCorpusReadOnly(d.filter(col("doc_id") % 3 === 0), storeDir)
        .select(col("doc_id"), col("source"))
    }),

    // q106's serve with the store FORCE-BUILT at the non-legacy 9×6 band
    // shape (the ≥10⁶-doc regime of Store.derivedShape): the stored
    // marker drives the drop's signing, the 9-band equi-join generates
    // candidates, and the exact-Jaccard verify must land on the SAME dup
    // set the 4×4 legacy serve (and the brute-force oracle) produce —
    // the code path a 100 TB corpus actually runs, hash-gated end-to-end.
    "q171_incr_dedup_wide" -> ((s, dir) => {
      val d = Tables(s, dir).documents
      Store.dedupNewDropVsCorpusReadOnly(
          d.filter(col("doc_id") % 3 === 0), wideStoreFixture(s, dir))
        .select(col("doc_id"), col("source"))
    }),

    // EXACT similarity self-join via prefix filtering (PPJoin-style):
    // ALL pairs with shingle-set Jaccard ≥ 0.7 — the completeness
    // guarantee LSH (q24) can't give: candidates here are pairs sharing
    // ≥1 shingle in their PREFIXES under the global (df, shingle) order
    // (rarest first), where prefix length |x|−⌈0.7·|x|⌉+1 provably
    // covers every qualifying pair; a length filter (10·min ≥ 7·max)
    // prunes size-incompatible candidates before the verify. Scale
    // shape: prefixes hold each doc's RAREST shingles, so the candidate
    // equi join's keys are low-df by construction — the skew guard is
    // built into the algorithm, not bolted on. The oracle is the
    // brute-force all-pairs join: any missing pair hash-fails.
    "q108_simjoin_exact" -> ((s, dir) => {
      val d = Tables(s, dir).documents
      // the universe is SHINGLEABLE docs (>= 3 words), filtered in BOTH
      // this query and its oracle (`WHERE len(ts) > 0`, which for the
      // oracle's fallback-free shingling is exactly ws >= 3): without the
      // mirrored filter the two engines disagree on short docs — Spark's
      // shingle fallback would pair exact-duplicate short docs while the
      // oracle's empty ts admits 0 >= 0 empty-empty pairs — a latent
      // divergence the generator (no <3-word docs) would otherwise hide.
      val toks = Dedup.materialize(d
        .select(col("doc_id"), TextOps.words(col("text")).as("ws"))
        .filter(size(col("ws")) >= 3)
        .select(col("doc_id"), TextOps.shingleSet(col("ws"), 3).as("ts"))
        .withColumn("sz", size(col("ts"))))
      val dfc = toks.select(explode(col("ts")).as("t"))
        .groupBy("t").agg(count(lit(1)).as("df"))
      // materialized (r18): pref feeds BOTH sides of the candidate self
      // join — without the cut the explode+df-join+collect_list prefix
      // pipeline ran twice (Catalyst does not share common subtrees)
      val pref = Dedup.materialize(
        toks.select(col("doc_id"), col("sz"), explode(col("ts")).as("t"))
        .join(dfc, "t")
        .groupBy(col("doc_id"), col("sz"))
        .agg(array_sort(collect_list(struct(col("df"), col("t")))).as("ord"))
        .select(col("doc_id"), col("sz"),
          explode(expr(
            "slice(ord, 1, CAST(sz - ((7*sz+9) div 10) + 1 AS INT))")).as("p"))
        .select(col("doc_id"), col("sz"), col("p.t").as("t")))
      val cand = pref.as("a").join(pref.as("b"),
          col("a.t") === col("b.t") && col("a.doc_id") < col("b.doc_id") &&
            col("a.sz") * 10 >= col("b.sz") * 7 &&
            col("b.sz") * 10 >= col("a.sz") * 7)
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .distinct()
      val sh = toks.select(col("doc_id"), col("ts"))
      // the doc_b repartition pins the verify join's partition count
      // (r18, tools.Attr: AQE's bytes-based coalescing ran the whole
      // array_intersect verify as ONE 3.4 s task — shingle arrays carry
      // far more CPU per byte than the 1 MB target assumes). Explicit
      // count = the join's own exchange is replaced, not added; nothing
      // extra is shuffled, the stage just stays wide.
      cand
        .join(sh.toDF("doc_a", "ta"), "doc_a")
        .repartition(s.sparkContext.defaultParallelism, col("doc_b"))
        .join(sh.toDF("doc_b", "tb"), "doc_b")
        .select(col("doc_a"), col("doc_b"),
          size(array_intersect(col("ta"), col("tb"))).as("inter_size"),
          (size(col("ta")) + size(col("tb"))).as("__ss"))
        .withColumn("union_size", col("__ss") - col("inter_size"))
        .drop("__ss")
        .filter(col("inter_size") * 10 >= col("union_size") * 7)
    }),

    // EXACT containment self-join (asymmetric q108): ALL pairs with
    // |A∩B| ≥ 0.8·min(|A|,|B|) via probe-prefix × full-index filtering —
    // closes q78's banded-recall caveat (completeness proof and skew
    // shape in Dedup.containmentJoinExact's scaladoc). Oracle =
    // brute-force all-pairs: a missing pair hash-fails.
    "q114_containment_exact" -> ((s, dir) =>
      Dedup.containmentJoinExact(Tables(s, dir).documents)),

    // Dup-graph triangle density per template family: the verified
    // near-dup pair graph restricted to same-source edges, triangle-
    // censused per source (degree-oriented closure, per-group keys on
    // every join). Density separates "this source is one template"
    // (dense dup triangles) from pairwise-noise matches — the corpus
    // quality diagnostic the CLI emits as --dup-graph-stats.
    "q107_dup_graph" -> ((s, dir) => {
      val d = Tables(s, dir).documents
      val pairs = Dedup.nearDupPairs(d).select(col("doc_a"), col("doc_b"))
      val srcs = d.select(col("doc_id"), col("source"))
      val edges = pairs
        .join(srcs.toDF("doc_a", "src_a"), "doc_a")
        .join(srcs.toDF("doc_b", "src_b"), "doc_b")
        .filter(col("src_a") === col("src_b"))
        .select(col("src_a").as("source"), col("doc_a").as("u"),
          col("doc_b").as("v"))
      graft.operators.Graph.triangleStatsPerGroup(edges, "source")
    }),

    // Quality-aware near-dup survivorship: the best doc of each verified
    // pair wins (quality = distinct-token count — an exact integer; tie →
    // smaller id). The keep-the-richest-doc policy a training corpus
    // actually wants, vs q26's keep-smallest-id.
    "q92_survivor_best" -> ((s, dir) =>
      Dedup.survivorsByQuality(
          Tables(s, dir).documents.repartition(s.sparkContext.defaultParallelism),
          size(array_distinct(TextOps.words(col("text")))))
        .select(col("doc_id"), col("lang"), col("source"))),

    // Training-mixture weighting: per-language keep rates (downweight
    // over-represented en, upweight zh), same nested hash-bucket decision
    // as q62 so raising a weight only ADDS rows.
    "q63_mixture" -> ((s, dir) =>
      graft.operators.Sampling.mixtureSample(
          Tables(s, dir).documents, col("doc_id"), col("lang"),
          Map("en" -> 300, "zh" -> 800), defaultPerMille = 500)
        .select(col("doc_id"), col("lang"))),

    // Temperature rebalancing census (α = 1/2, the mT5/XLM-R language
    // flattening): per-source corpus count, the DERIVED keep rate
    // (1000·√(n_min/n_s)‰, rarest source kept whole), and the resulting
    // survivor count under the nested hash-bucket decision — the report
    // a multilingual pipeline reads before committing the mixture.
    "q158_temperature_mix" -> ((s, dir) => {
      val d = Tables(s, dir).documents
      // derive the rates ONCE and reuse the frame for the keep decision
      // (temperatureRebalance would re-derive them — a second counts agg
      // and a second 1-row-min crossJoin for nothing)
      val rates = graft.operators.Sampling.temperatureRates(d, "source")
      val kept = d
        .join(broadcast(rates.select(col("source"), col("rate_pm"))), "source")
        .filter(graft.operators.Sampling
          .hashBucket(col("doc_id"), 1000, "temp") < col("rate_pm"))
        .groupBy(col("source")).agg(count(lit(1)).as("n_kept"))
      rates.join(kept, Seq("source"), "left")
        .na.fill(0L, Seq("n_kept"))
        .select(col("source"), col("n_docs"), col("rate_pm"), col("n_kept"))
    }),

    // Benchmark decontamination: every 19th doc plays the eval set; corpus
    // docs sharing ANY word 3-gram with it are dropped (test-set-leakage
    // guard). Broadcast semi-join on exploded shingles — no corpus shuffle.
    "q64_decontaminate" -> ((s, dir) => {
      val d = Tables(s, dir).documents
      Dedup.decontaminate(
          d.filter(col("doc_id") % 19 =!= 0), d.filter(col("doc_id") % 19 === 0))
        .select(col("doc_id"), col("source"))
    }),

    // Corpus term statistics: top-3 tokens per source by tf/df (TF-IDF
    // without the log — same ranking for a fixed corpus). Parity: tf and
    // df are exact integers; the score is ONE double division of exact
    // ints (IEEE-identical across engines); total order via (score desc,
    // token asc).
    "q72_tfidf" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val tok = Tables(s, dir).documents
        .select(col("source"), col("doc_id"),
          explode(TextOps.words(col("text"))).as("token"))
      val tf = tok.groupBy(col("source"), col("token")).agg(count(lit(1)).as("tf"))
      val dfreq = tok.groupBy(col("token"))
        .agg(countDistinct(col("doc_id")).as("df"))
      // top-3 through the engine's bounded-heap TopKPerKey exec — a
      // row_number window here is a per-source VOCABULARY sort on one
      // task (10^7-10^8 rows per source at corpus scale); the heap keeps
      // 3 rows per key map-side and shuffles only partition heads. The
      // rank label is then a window over the ≤ 3-rows-per-source result.
      val top3 = graft.operators.Relational.topKPerKey(
        tf.join(dfreq, "token")
          .withColumn("score", col("tf").cast("double") / col("df")),
        Seq(col("source")), Seq(col("score").desc, col("token").asc), 3)
      val w = Window.partitionBy(col("source"))
        .orderBy(col("score").desc, col("token").asc)
      top3.withColumn("rk", row_number().over(w))
        .select(col("source"), col("token"), col("tf"), col("df"),
          col("rk").cast("int").as("rk"))
    }),

    // Exactly-k-per-stratum deterministic sample: 5 docs per language,
    // picked by md5 order — balanced eval-set construction, reproducible
    // across engines (one window per stratum, no RNG).
    "q71_stratified_k" -> ((s, dir) =>
      graft.operators.Sampling.stratifiedK(
          Tables(s, dir).documents, col("doc_id"), col("lang"), 5)
        .select(col("doc_id"), col("lang"))),

    // Sequence packing, concat-then-chunk (GPT pretraining layout): docs
    // laid out in 8 deterministic shards, cut every 256 tokens. Pure
    // window cumsum — one shuffle, engine-exact integers.
    "q65_pack_chunks" -> ((s, dir) =>
      graft.operators.Packing.concatChunkPack(
        Tables(s, dir).documents
          .select(col("doc_id"), size(TextOps.words(col("text"))).as("n_tokens")),
        "doc_id", "n_tokens", maxTokens = 256, shards = 8)),

    // Sequence packing, greedy no-split (SFT layout): a doc never crosses
    // a sequence boundary. Sequential scan-with-reset per shard →
    // flatMapGroups; invariants property-tested (PackingSpec) AND
    // hash-gated vs a recursive-CTE DuckDB oracle that replays the greedy
    // reset row by row (see oracles below).
    "q66_pack_greedy" -> ((s, dir) =>
      graft.operators.Packing.greedyPack(
        Tables(s, dir).documents
          .select(col("doc_id"), size(TextOps.words(col("text"))).as("n_tokens")),
        "doc_id", "n_tokens", maxTokens = 256, shards = 8)),

    // Dense-id assignment for string-keyed corpora: deterministic
    // md5-order dense longs 0..n-1 over synthetic string keys — the
    // bridge that lets UUID/URL-keyed corpora into greedyPack and any
    // other id-ordered layout. Bucketed-prefix ranking, no global sort.
    "q74_dense_id" -> ((s, dir) =>
      graft.operators.Packing.withDenseId(
        Tables(s, dir).documents
          .select(concat(lit("doc-"), col("doc_id")).as("doc_key")),
        "doc_key")
        .select(col("doc_key"), col("dense_id"))),

    // Repetition stats (Gopher-style quality rules, Rae et al. 2021): the
    // most-repeated word and bigram per doc — the filter that catches
    // boilerplate/spam ("click here click here ...") that TTR alone
    // misses. Exact integer counts; one exact division for the fraction.
    "q75_repetition" -> ((s, dir) => repetitionStats(Tables(s, dir).documents)),

    // PII redaction: scrub emails/phones/IPs injected deterministically
    // from the real corpus (testdata has no PII, so both engines append
    // the same synthetic contact lines — the regexes are what is under
    // test). Output: per-kind match counts + digest of the FULLY scrubbed
    // text (tiny rows, the redacted corpus itself never leaves the
    // executors). Exercises the same Pii.scrub the CLI's --scrub-pii runs.
    "q76_redact" -> ((s, dir) => {
      val withPii = Tables(s, dir).documents.select(col("doc_id"),
        concat(col("text"),
          lit(" contact contact-"), col("doc_id"), lit("@example.com or"),
          lit(" backup-"), col("doc_id"), lit("-admin@mail.example.org now"),
          lit(" call 415-555-"), lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
          lit(" from 10.0."), (col("doc_id") % 256), lit("."), (col("doc_id") % 100),
          lit(" end")).as("text"))
      withPii.select(col("doc_id"),
        Pii.countMatches(col("text"), Pii.EmailPattern).as("n_emails"),
        Pii.countMatches(col("text"), Pii.PhonePattern).as("n_phones"),
        Pii.countMatches(col("text"), Pii.Ipv4Pattern).as("n_ips"),
        md5(Pii.scrub(col("text"))).as("redacted_md5"))
    }),

    // Winnowing fingerprints (MOSS): min k-gram hash per sliding window —
    // detects any shared >= k+w-1-word substring while keeping ~2/(w+1)
    // of the hashes. Distinct (doc, fp) pairs, engine-exact hash domain.
    "q77_winnow" -> ((s, dir) =>
      Winnow.fingerprints(Tables(s, dir).documents, "doc_id", "text", k = 3, w = 4)),

    // Containment (asymmetric Jaccard |∩|/min(|A|,|B|) >= 0.8): partial-
    // copy detection over the same banded candidates — integer decision,
    // one derived double.
    "q78_containment" -> ((s, dir) =>
      Dedup.containmentPairs(Tables(s, dir).documents)),

    // Fingerprint-join near-dup pairs: docs sharing >= 2 winnowing
    // fingerprints (equi self-join on fp, hot fps with df > 8 dropped
    // first — the stop-shingle skew guard). The substring-overlap dedup
    // path on top of q77.
    "q79_winnow_pairs" -> ((s, dir) =>
      Winnow.nearDupPairsByFingerprint(Tables(s, dir).documents, "doc_id", "text",
        k = 3, w = 4, minShared = 2, maxDf = 8)),

    // Corpus-level boilerplate removal (CCNet-style paragraph dedup at
    // word-segment granularity): drop every 3-word segment appearing in
    // >= 3 docs, keep the rest in order. The cleaning TRANSFORM on top of
    // the detection queries — returns the cleaned text itself.
    "q80_boilerplate" -> ((s, dir) =>
      Dedup.removeBoilerplate(Tables(s, dir).documents, w = 3, minDf = 3)),

    // Tokenizer-apply: deterministic greedy BPE per word (native
    // expression, merges table as input), per-doc token count + digest of
    // the full token stream — so the HASH gate proves the token SEQUENCE,
    // not just counts. The capability that re-bases budget/packing
    // decisions from whitespace words onto real tokenizer tokens
    // (VERDICT r7 missing #1); oracle = recursive-CTE replay of the merge
    // loop over the corpus's distinct words (the q66 precedent).
    "q113_bpe_encode" -> ((s, dir) =>
      Tables(s, dir).documents
        .select(col("doc_id"),
          Bpe.encode(TextOps.words(col("text"))).as("toks"))
        .select(col("doc_id"),
          size(col("toks")).cast("long").as("n_tokens"),
          md5(array_join(col("toks"), " ")).as("tokens_md5"))),

    // Tokenizer FERTILITY per language: BPE tokens per whitespace word,
    // in exact integer ppm — the budget-disparity report a multilingual
    // pipeline runs before fixing per-language mixture rates (a language
    // the tokenizer fragments 2× pays 2× the context budget per word;
    // fertility is the standard name). Map-only encode + one partial/
    // final agg per language; all decisions integer.
    "q157_bpe_fertility" -> ((s, dir) =>
      Tables(s, dir).documents
        .select(col("lang"), TextOps.words(col("text")).as("ws"))
        .select(col("lang"), size(col("ws")).cast("long").as("nw"),
          size(Bpe.encode(col("ws"))).cast("long").as("nt"))
        .groupBy(col("lang"))
        .agg(sum(col("nw")).as("n_words"), sum(col("nt")).as("n_tokens"))
        .withColumn("fertility_ppm",
          expr("(n_tokens * 1000000) div n_words"))),

    // Learned-merges end-to-end gate: the tokenizer is TRAINED on split A
    // (doc_id % 7 == 0, Bpe.learnMerges — exact word-frequency counts on
    // a capped TakeOrdered table, driver-sized model) and APPLIED to the
    // held-out split B under the learned table — closing the loop
    // q113–q118 pin with the DemoMerges fixture. Learning is
    // deterministic (exact counts, (l,r) tie-break), so the oracle
    // replays encode under the SAME learned table, baked into the SQL at
    // dump time (Verify pins graft.sf.dir; see oracleLearnedMerges).
    "q130_bpe_learned" -> ((s, dir) => {
      val merges = learnedMergesFixture(s, dir)
      Tables(s, dir).documents.filter(col("doc_id") % 7 =!= 0)
        .select(col("doc_id"),
          Bpe.encode(TextOps.words(col("text")), merges).as("toks"))
        .select(col("doc_id"),
          size(col("toks")).cast("long").as("n_tokens"),
          md5(array_join(col("toks"), " ")).as("tokens_md5"))
    }),

    // LM quality scoring (CCNet shape, arXiv:1911.00359): a trigram
    // stupid-backoff model is TRAINED on the trusted split (doc_id % 7
    // == 0 — the q130 training split) and every held-out doc is scored
    // in integer ppm (fixed-point stupid backoff, see text.Lm) — the
    // "how much does this doc look like the trusted corpus" gate a
    // 100 TB crawl pipeline runs after dedup. Exact integer counts,
    // integer floor-div terms, order-independent integer sums — the
    // oracle replays train AND score bit-for-bit.
    "q135_lm_score" -> ((s, dir) => {
      val d = Tables(s, dir).documents
      Lm.scoreAgainst(
        d.filter(col("doc_id") % 7 === 0),
        d.filter(col("doc_id") % 7 =!= 0))
    }),

    // Store-served LM scoring (the q106/q129/q136 build/serve split for
    // the quality LM): the trusted split arrives as TWO drops whose
    // n-gram counts were persisted once (LmStore — counts merge by sum,
    // so the served model is EXACTLY the whole-split model); held-out
    // docs are scored against the merged store. Same oracle as q135 —
    // the hash gate proves store-served ≡ trained-from-scratch.
    "q137_lm_store" -> ((s, dir) => {
      val storeDir = lmStoreFixture(s, dir)
      LmStore.scoreVsStore(
        Tables(s, dir).documents.filter(col("doc_id") % 7 =!= 0), storeDir)
    }),

    // Gram-ownership store SERVE gated end-to-end (q126's build/serve
    // split): the corpus history lands as two drops of (gram → min
    // doc_id) partials — min-of-mins ≡ min-over-union, the third merge
    // discipline after sum (LmStore) and union/register-max
    // (ProfileStore) — and a NEW drop's first-occurrence novelty is
    // scored against history ∪ itself without the history ever being
    // re-tokenized. The oracle is q126's full-corpus replay restricted
    // to the drop's rows: store-served novelty must be bit-identical to
    // from-scratch.
    "q147_novelty_store" -> ((s, dir) => {
      val storeDir = gramStoreFixture(s, dir)
      GramStore.noveltyOfDrop(
        Tables(s, dir).documents.filter(col("doc_id") % 3 === 0), storeDir)
    }),

    // Gram-store TAKEDOWN gated end-to-end: drop "b" (doc_id % 3 == 2)
    // is removed and the same new drop re-scored. Min is NOT
    // subtractable from a rollup — only per-drop partials can un-see a
    // drop: a gram owned solely by "b" must become novel again for the
    // incoming writer, and a tied gram must fall back to the surviving
    // drop's min. The oracle replays q126 on the corpus MINUS the
    // removed drop.
    "q148_novelty_takedown" -> ((s, dir) => {
      val storeDir = gramTakedownFixture(s, dir)
      GramStore.noveltyOfDrop(
        Tables(s, dir).documents.filter(col("doc_id") % 3 === 0), storeDir)
    }),

    // LM-store TAKEDOWN gated end-to-end: the trusted split lands as
    // THREE drops, one is removed (LmStore.removeDrop — a partials-table
    // rewrite, the trusted corpus never re-read), and held-out docs are
    // scored against what remains. Counts are per-drop partials under a
    // sum-merge, so the oracle is simply the q135 replay trained on the
    // two REMAINING drops: the hash gate proves post-takedown serve ≡
    // never-ingested — the compliance property (license revocation,
    // contaminated drop) a 100 TB trusted corpus needs to honor without
    // a retrain.
    "q139_lm_takedown" -> ((s, dir) => {
      val storeDir = lmTakedownFixture(s, dir)
      LmStore.scoreVsStore(
        Tables(s, dir).documents.filter(col("doc_id") % 7 =!= 0), storeDir)
    }),

    // Signature-store TAKEDOWN gated end-to-end: two sources are purged
    // from the stored corpus (Store.removeDocs — one signature-table
    // rewrite, anti-join on the takedown ids; the corpus text never
    // re-read), then a new drop is deduplicated against the purged
    // store. The oracle replays q106's full MinHash dedup with the
    // stored side filtered to the surviving sources: a doc that should
    // have been kept because its only near-dup was purged — or dropped
    // because the purge missed a signature — hash-fails here.
    "q141_store_takedown" -> ((s, dir) => {
      val d = Tables(s, dir).documents
      val storeDir = purgedStoreFixture(s, dir)
      Store.dedupNewDropVsCorpusReadOnly(d.filter(col("doc_id") % 3 === 0), storeDir)
        .select(col("doc_id"), col("source"))
    }),

    // Tokenizer-aware token-budget apportionment: the shared
    // largest-remainder allocator (operators.Budget — q110's engine)
    // denominated in BPE tokens instead of whitespace words — the whole
    // point of the tokenizer operator (whitespace vs BPE drift is 2–3×
    // per language, so word-budgeted mixtures mis-allocate).
    "q116_budget_bpe" -> ((s, dir) =>
      graft.operators.Budget.apportion(
        Tables(s, dir).documents, "source",
        size(Bpe.encode(TextOps.words(col("text")))).cast("long"),
        budget = 1000000L)),

    // Document → token-ID sequences (the training-loader handoff): BPE
    // tokens numbered by corpus frequency (count desc, token asc — hot
    // tokens get small ids), each doc hashed as its comma-joined id
    // sequence so the gate proves ids AND order. Vocabulary is bounded by
    // |merges|+|alphabet| by construction (see Bpe.idSequences), so the
    // ranking window and the id lookup are vocab-sized, never corpus-sized.
    "q118_token_ids" -> ((s, dir) =>
      Bpe.idSequences(Tables(s, dir).documents)
        .select(col("doc_id"),
          size(col("ids")).cast("long").as("n_tokens"),
          md5(concat_ws(",", transform(col("ids"), _.cast("string"))))
            .as("ids_md5"))),

    // Tokenizer ROUNDTRIP gated end-to-end: encode → number (q118's id
    // sequences) → decode via the vocabulary — and the oracle never
    // replays BPE at all: it hashes the raw corpus's space-stripped
    // character stream directly, which is exactly what a lossless
    // (ids, vocab) pair must reconstruct (merges never cross word
    // boundaries; the flattened stream drops only the spaces). Any
    // defect anywhere in the encode/number/decode chain breaks the
    // equality — the strongest kind of gate, because the two sides share
    // NO code path.
    "q145_bpe_roundtrip" -> ((s, dir) => {
      val d = Tables(s, dir).documents
      val (seqs, vocab) = Bpe.idSequencesAndVocab(d)
      Bpe.decode(seqs, vocab)
        .select(col("doc_id"), md5(col("decoded")).as("decoded_md5"))
    }),

    // Tokenizer-aware greedy packing: q66's no-split layout with sequence
    // lengths measured in BPE tokens — what an SFT data loader actually
    // fills against. Zero-token docs are excluded in BOTH engines (packing
    // a 0-length doc is meaningless; greedyPack raises on n < 1 rather
    // than silently misplacing offsets). maxTokens=512 because BPE token
    // counts run ~3–4× word counts under the fixture merges.
    "q117_pack_bpe" -> ((s, dir) =>
      graft.operators.Packing.greedyPack(
        Tables(s, dir).documents
          .select(col("doc_id"),
            size(Bpe.encode(TextOps.words(col("text")))).cast("long")
              .as("n_tokens"))
          .filter(col("n_tokens") >= 1),
        "doc_id", "n_tokens", maxTokens = 512, shards = 8)),

    // Substring-level repeated-span detection: every maximal token range
    // covered by 5-grams that recur in ≥2 docs — the span-level
    // (not doc-level) dedup granularity.
    "q120_repeated_spans" -> ((s, dir) =>
      repeatedSpans(Tables(s, dir).documents
        .repartition(s.sparkContext.defaultParallelism))),

    // Per-language percentile quality gate: drop each language's bottom
    // quality quartile — absolute thresholds (q22's quality_ok) misfire
    // when quality DISTRIBUTIONS differ by language, so production
    // filters gate on the per-group rank instead. Exact and engine-safe:
    // the score is an integer (type/token ratio in ppt, floor division),
    // the cut is rank*4 > n (never a float percentile). Computed by
    // Curation.quartileGateLabels' two-level histogram cut — per-lang
    // window SEMANTICS without a per-lang corpus sort (a window
    // partition is one task, and half a natural crawl is one language);
    // the oracle replays the window form, so the hash gate IS the proof
    // the histogram cut preserves it.
    "q123_quality_gate" -> ((s, dir) => {
      val d = Tables(s, dir).documents
        .withColumn("ws", TextOps.words(col("text")))
        .select(col("doc_id"), col("lang"),
          size(array_distinct(col("ws"))).as("nd"), size(col("ws")).as("nt"))
        .withColumn("score_ppt", expr("(CAST(nd AS BIGINT) * 1000) div nt"))
      Curation.quartileGateLabels(d)
    }),

    // Span-level scrub: q120's detection turned into the actual removal —
    // every repeated 5-gram occurrence outside its keeper doc (corpus-min
    // doc_id) is deleted token-wise; the keeper retains the only copy.
    "q125_span_scrub" -> ((s, dir) =>
      scrubRepeatedSpans(Tables(s, dir).documents
        .repartition(s.sparkContext.defaultParallelism))),

    // Content-defined chunking (rsync/LBFS boundaries): variable chunks
    // cut where the trailing 3-gram hashes to 0 mod 8, so insertions
    // re-align instead of shifting every downstream chunk — the
    // storage-dedup granularity for quote/append-heavy corpora.
    "q160_cdc_chunks" -> ((s, dir) =>
      Dedup.cdcChunks(Tables(s, dir).documents
        .repartition(s.sparkContext.defaultParallelism))),

    // CDC duplication census: per doc, how many of its chunks (and
    // words) appear verbatim in ANOTHER doc under content-defined
    // alignment.
    "q161_cdc_dedup" -> ((s, dir) =>
      Dedup.cdcDupStats(Tables(s, dir).documents
        .repartition(s.sparkContext.defaultParallelism))),

    // Store-served CDC census: q161 of a new drop against the persisted
    // chunk-frequency store's history ∪ the drop — the history is never
    // re-chunked; its contribution is one store scan of chunk-sized
    // partials (≈ one row per `divisor` tokens).
    "q162_chunk_store" -> ((s, dir) =>
      ChunkStore.dupStatsVsDrop(
        Tables(s, dir).documents.filter(col("doc_id") % 3 === 0)
          .repartition(s.sparkContext.defaultParallelism),
        chunkStoreFixture(s, dir))),

    // Chunk-store takedown: the junk drop (the probe's own texts under
    // disjoint ids) removed — post-takedown census ≡ never-ingested
    // (df subtraction under the sum-merge).
    "q163_chunk_takedown" -> ((s, dir) =>
      ChunkStore.dupStatsVsDrop(
        Tables(s, dir).documents.filter(col("doc_id") % 3 === 0)
          .repartition(s.sparkContext.defaultParallelism),
        chunkTakedownFixture(s, dir))),

    // Store-served span DETECTION: q120 of a new drop against the
    // persisted gram-df store's history ∪ the drop — gated bit-for-bit
    // against the from-scratch union replay restricted to the drop (the
    // history is never re-tokenized; its contribution is one store scan).
    "q150_span_store" -> ((s, dir) => {
      val storeDir = spanStoreFixture(s, dir)
      SpanStore.detectVsDrop(
        Tables(s, dir).documents.filter(col("doc_id") % 3 === 0)
          .repartition(s.sparkContext.defaultParallelism), storeDir)
    }),

    // Store-served span SCRUB: q125 of the drop against history ∪ drop —
    // keepers elected as min(store keeper, drop min), the exact union
    // survivorship.
    "q151_span_store_scrub" -> ((s, dir) => {
      val storeDir = spanStoreFixture(s, dir)
      SpanStore.scrubVsDrop(
        Tables(s, dir).documents.filter(col("doc_id") % 3 === 0)
          .repartition(s.sparkContext.defaultParallelism), storeDir)
    }),

    // Span-store takedown: a junk drop (the probe's own texts under
    // disjoint ids) ingested then REMOVED — post-takedown detection must
    // equal q150's never-ingested store exactly (df subtraction under
    // the sum-merge; the junk drop had inflated precisely the probe
    // grams' df, so any residue would surface as phantom spans).
    "q152_span_takedown" -> ((s, dir) => {
      val storeDir = spanTakedownFixture(s, dir)
      SpanStore.detectVsDrop(
        Tables(s, dir).documents.filter(col("doc_id") % 3 === 0)
          .repartition(s.sparkContext.defaultParallelism), storeDir)
    }),

    // Exact BM25 retrieval: a fixed-size "more-like-this" workload (each
    // probe doc's 8 most characteristic terms) ranked over the whole
    // corpus with integer-exact rational-idf BM25 — the relevance leg of
    // curation (seed-query filtering, decontamination lookup, near-dup
    // triage). Posting-list equi-join + hash agg; the per-query top-k is
    // the engine's bounded-heap exec, never a window sort.
    "q164_bm25_topk" -> ((s, dir) =>
      Retrieval.bm25TopKFor(
        Tables(s, dir).documents
          .repartition(s.sparkContext.defaultParallelism),
        probe = col("doc_id") % 5 === 0 && col("doc_id") < 60)),

    // q164 through the MaxScore/WAND-pruned path: candidates from the
    // rare (df ≤ 200) term postings only, exact scoring over doc-pruned
    // lists, per-query exactness certificate with declarative fallback —
    // output must be BIT-IDENTICAL to the full traversal (shares q164's
    // oracle), which is the whole point: pruning buys cost, never
    // answers. The df-200 cutoff splits this corpus's 31-term vocabulary
    // (dfs 25..402) so BOTH branches — certified-pruned and fallback —
    // are exercised under the hash gate.
    "q173_bm25_maxscore" -> ((s, dir) =>
      Retrieval.bm25TopKForMaxScore(
        Tables(s, dir).documents
          .repartition(s.sparkContext.defaultParallelism),
        probe = col("doc_id") % 5 === 0 && col("doc_id") < 60,
        essentialDfMax = 200L)),

    // Store-served BM25: q164's retrieval of probe queries from a NEW
    // drop, searched over the persisted inverted index ∪ the drop —
    // history text is never re-tokenized; df/N/Σdl re-aggregate from the
    // merged postings. Gated bit-for-bit against the from-scratch
    // full-corpus run (store corpus ∪ drop = the full table).
    "q165_postings_store" -> ((s, dir) =>
      PostingsStore.bm25TopKVsDrop(
        Tables(s, dir).documents.filter(col("doc_id") % 3 === 0)
          .repartition(s.sparkContext.defaultParallelism),
        postingsStoreFixture(s, dir),
        probe = col("doc_id") % 15 === 0 && col("doc_id") < 300)),

    // Postings-store takedown: a junk drop (the probe's own texts under
    // disjoint ids) ingested then REMOVED — the junk had doubled exactly
    // the probe docs' content (duplicate candidates ranking at the same
    // scores, df/N/Σdl all inflated), so any residue would surface as
    // phantom results or shifted scores. Post-takedown serve must equal
    // never-ingested exactly (row deletion IS the union-merge inverse).
    "q166_postings_takedown" -> ((s, dir) =>
      PostingsStore.bm25TopKVsDrop(
        Tables(s, dir).documents.filter(col("doc_id") % 3 === 0)
          .repartition(s.sparkContext.defaultParallelism),
        postingsTakedownFixture(s, dir),
        probe = col("doc_id") % 15 === 0 && col("doc_id") < 300)),

    // Learned classifier TRAINING as a hashable fact: Laplace-smoothed
    // unigram class profiles (the centroid/NB model) over the % 5 != 0
    // train split — weights in exact integer ppb, so the trained model
    // itself hash-matches DuckDB (no float fit, no RNG).
    "q167_classifier_train" -> ((s, dir) =>
      Classify.trainWeights(
        Tables(s, dir).documents.filter(col("doc_id") % 5 =!= 0)
          .repartition(s.sparkContext.defaultParallelism))),

    // Learned classifier INFERENCE on the held-out % 5 == 0 split:
    // argmax-class by summed tf·w_ppb with the Laplace floor for unseen
    // terms — train + predict gated end-to-end (the CCNet/fastText slot:
    // language ID, source routing, learned quality gates). One broadcast
    // join of the model against exploded terms; no corpus shuffle.
    "q168_classifier_predict" -> ((s, dir) => {
      val d = Tables(s, dir).documents
        .repartition(s.sparkContext.defaultParallelism)
      Classify.predict(
        d.filter(col("doc_id") % 5 =!= 0), d.filter(col("doc_id") % 5 === 0))
    }),

    // Store-served classifier: q168's inference with the model trained
    // INCREMENTALLY — the train split ingested as two drops of summed
    // (label, term, cnt) partials; the served model is bit-identical to
    // from-scratch training on the union (counts add; weights/totals/
    // vocab derive at serve time). Shares q168's oracle.
    "q169_classifier_store" -> ((s, dir) =>
      ClassifyStore.predictVsStore(
        Tables(s, dir).documents.filter(col("doc_id") % 5 === 0)
          .repartition(s.sparkContext.defaultParallelism),
        classifyStoreFixture(s, dir))),

    // Classifier EXACT UNLEARNING: a junk drop (the train texts re-keyed
    // under a phantom class "xx" — which would win every prediction for
    // its own texts and shift all smoothing denominators) ingested then
    // REMOVED. Post-takedown predictions must be hash-identical to the
    // never-ingested model: count subtraction IS machine unlearning for
    // a count-factored model. Shares q168's oracle.
    "q170_classifier_unlearn" -> ((s, dir) =>
      ClassifyStore.predictVsStore(
        Tables(s, dir).documents.filter(col("doc_id") % 5 === 0)
          .repartition(s.sparkContext.defaultParallelism),
        classifyUnlearnFixture(s, dir))),

    // Classifier QUALITY as a monitored fact: q168's confusion feed
    // aggregated to per-class precision/recall in exact integer ppm —
    // the number a curation gate alerts on (a class whose precision
    // collapses is routing junk into the corpus). Three class-sized
    // marginal aggs joined on label; zero-marginal classes report 0 by
    // CASE, not a division error.
    "q172_classifier_eval" -> ((s, dir) => {
      val d = Tables(s, dir).documents
        .repartition(s.sparkContext.defaultParallelism)
      Classify.evaluate(Classify.predict(
        d.filter(col("doc_id") % 5 =!= 0), d.filter(col("doc_id") % 5 === 0)))
    }),

    // First-occurrence novelty scoring: what fraction of each doc's
    // 3-gram vocabulary does the corpus see FIRST in this doc (ownership
    // by minimum doc_id — deterministic, order-free)? The curation signal
    // for "which docs contribute new content vs restate it": 1000‰ = all
    // novel, boilerplate restatements score near 0. Shape = q120's gram
    // machinery: one gram-ownership agg (min doc_id per 64-bit gram key,
    // partial-agg'd) + a key-unique join back — no windows, no BNLJ.
    "q126_novelty" -> ((s, dir) => {
      val rows = graft.text.Dedup.materialize(
        Tables(s, dir).documents
          .repartition(s.sparkContext.defaultParallelism)
          .select(col("doc_id"),
            explode(TextOps.shingleSet(TextOps.words(col("text")), 3)).as("g"))
          .select(col("doc_id"), substring(md5(col("g")), 1, 16).as("gk")))
      val first = rows.groupBy(col("gk")).agg(min(col("doc_id")).as("first_doc"))
      rows.join(first, "gk")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_grams"),
          sum(when(col("doc_id") === col("first_doc"), 1L).otherwise(0L))
            .as("n_novel"))
        .withColumn("novelty_ppt", expr("(n_novel * 1000) div n_grams"))
    }),

    // q127 against a genuinely FIXED eval suite: the benchmark side is the
    // checked-in EvalSuite TABLE (read from its own parquet fixture path),
    // so the broadcast probe set is CONSTANT in corpus size — the shape
    // q127's corpus-derived split (doc_id % 19, probe grows with n) only
    // approximates. Plan-asserted broadcast (PlanSpec); the oracle inlines
    // the same constant shingle set as VALUES.
    "q132_contamination_fixed" -> ((s, dir) => {
      val bsh = EvalSuite.table(s)
        .select(explode(TextOps.shingleSet(TextOps.words(col("text")), 3)).as("g"))
        .distinct()
      Tables(s, dir).documents
        .select(col("doc_id"),
          TextOps.shingleSet(TextOps.words(col("text")), 3).as("sh"))
        .select(col("doc_id"), size(col("sh")).as("n_shingles"),
          explode(col("sh")).as("g"))
        .join(broadcast(bsh.withColumn("hit", lit(1L))), Seq("g"), "left")
        .groupBy(col("doc_id"), col("n_shingles"))
        .agg(sum(coalesce(col("hit"), lit(0L))).as("n_hits"))
        .select(col("doc_id"), col("n_shingles"), col("n_hits"),
          when(col("n_hits") > 0, 1).otherwise(0).as("contaminated"))
    }),

    // q64's decontamination against the same fixed suite: drop every doc
    // sharing a 3-gram with the checked-in benchmark — the leakage guard
    // as production runs it (eval suite beside the pipeline, constant
    // broadcast, corpus-side cost linear in corpus).
    "q133_decontaminate_fixed" -> ((s, dir) =>
      Dedup.decontaminate(Tables(s, dir).documents,
          // decontaminate shingles both sides under idCol
          EvalSuite.table(s).withColumnRenamed("bench_id", "doc_id"))
        .select(col("doc_id"), col("source"))),

    // Contamination REPORT — q64's audit complement: instead of silently
    // dropping docs sharing an n-gram with the benchmark, quantify the
    // overlap per doc (how many of its distinct 3-grams appear in the
    // eval set). The benchmark side broadcasts (eval suites are MBs
    // against a 100 TB corpus), so the probe is a map-side broadcast
    // left join + per-doc agg — no corpus shuffle beyond the agg.
    "q127_contamination" -> ((s, dir) => {
      val d = Tables(s, dir).documents
      val bench = d.filter(col("doc_id") % 19 === 0)
        .select(explode(TextOps.shingleSet(TextOps.words(col("text")), 3)).as("g"))
        .distinct()
      d.filter(col("doc_id") % 19 =!= 0)
        .select(col("doc_id"),
          TextOps.shingleSet(TextOps.words(col("text")), 3).as("sh"))
        .select(col("doc_id"), size(col("sh")).as("n_shingles"),
          explode(col("sh")).as("g"))
        .join(broadcast(bench.withColumn("hit", lit(1L))), Seq("g"), "left")
        .groupBy(col("doc_id"), col("n_shingles"))
        .agg(sum(coalesce(col("hit"), lit(0L))).as("n_hits"))
        .select(col("doc_id"), col("n_shingles"), col("n_hits"),
          when(col("n_hits") > 0, 1).otherwise(0).as("contaminated"))
    }),

    // Overlapping context-window chunking (size 32, stride 24 → 8 tokens
    // of continuity between neighbors): the long-document layout for
    // training and retrieval indexing. Map-only — see
    // Packing.slidingChunks.
    "q124_chunk_overlap" -> ((s, dir) =>
      graft.operators.Packing.slidingChunks(
        Tables(s, dir).documents
          .select(col("doc_id"), TextOps.words(col("text")).as("ws")),
        "doc_id", "ws", size = 32, stride = 24)
        .select(col("doc_id"), col("chunk_idx"), col("start_tok"),
          col("end_tok"), col("n_chunk_toks"),
          array_join(col("chunk"), " ").as("chunk_text"))),

    // DSIR-slot data selection (see Dsir): the % 19 == 0 split plays
    // the trusted target corpus, the rest is the raw pool. q174 scores
    // every raw doc by its mean hashed-n-gram importance ratio in exact
    // ppm; q175 is the curation decision — the deterministic top-100 by
    // (score, doc_id), lang attached for the census reader. The ratio
    // model is ≤ 2^16 rows whatever the corpus size (that is what the
    // feature hashing buys), so scoring is a broadcast map-side join +
    // one doc-sized hash agg and selection is a bounded-heap top-k.
    "q174_dsir_score" -> ((s, dir) => {
      val d = Tables(s, dir).documents
        .repartition(s.sparkContext.defaultParallelism)
      Dsir.score(d.filter(col("doc_id") % 19 === 0),
        d.filter(col("doc_id") % 19 =!= 0))
    }),

    "q175_dsir_select" -> ((s, dir) => {
      val d = Tables(s, dir).documents
        .repartition(s.sparkContext.defaultParallelism)
      val picked = Dsir.selectTopK(
        Dsir.score(d.filter(col("doc_id") % 19 === 0),
          d.filter(col("doc_id") % 19 =!= 0)), 100)
      d.select(col("doc_id"), col("lang"))
        .join(broadcast(picked), Seq("doc_id"))
        .select(col("doc_id"), col("lang"), col("n_feats"), col("score_ppm"))
    }),

    // The q174 split's bucket-collision honesty row (see
    // Dsir.occupancyAudit): exact distinct-gram count vs occupied
    // buckets per corpus side, so the feature-hashing regime the DSIR
    // scores live in is a gated MEASUREMENT, not a scaladoc assumption.
    "q188_dsir_occupancy" -> ((s, dir) => {
      val d = Tables(s, dir).documents
        .repartition(s.sparkContext.defaultParallelism)
      Dsir.occupancyAudit(d.filter(col("doc_id") % 19 === 0), "target")
        .unionByName(
          Dsir.occupancyAudit(d.filter(col("doc_id") % 19 =!= 0), "raw"))
    }),

    // Store-served DSIR: q174's scoring with the raw profile accrued
    // INCREMENTALLY — the raw history ingested as two drops of summed
    // (f, cnt) partials, the % 7 == 1 slice arriving as the new drop to
    // score. Counts sum-merge, so the served ratio model is bit-identical
    // to profiling the union raw pool from scratch; the store scan is
    // drops × buckets rows whatever the corpus size.
    "q176_dsir_store" -> ((s, dir) => {
      val d = Tables(s, dir).documents
        .repartition(s.sparkContext.defaultParallelism)
      DsirStore.scoreVsDrop(d.filter(col("doc_id") % 19 === 0),
        d.filter(col("doc_id") % 19 =!= 0 && col("doc_id") % 7 === 1),
        dsirStoreFixture(s, dir))
    }),

    // DSIR EXACT UNLEARNING: a junk drop (the raw texts duplicated —
    // which would double every raw count and so halve every importance
    // ratio) ingested then REMOVED. Post-takedown scores must be
    // hash-identical to the never-ingested model: count subtraction IS
    // unlearning for the selection model too. Shares q176's oracle.
    "q177_dsir_unlearn" -> ((s, dir) => {
      val d = Tables(s, dir).documents
        .repartition(s.sparkContext.defaultParallelism)
      DsirStore.scoreVsDrop(d.filter(col("doc_id") % 19 === 0),
        d.filter(col("doc_id") % 19 =!= 0 && col("doc_id") % 7 === 1),
        dsirUnlearnFixture(s, dir))
    }),

    // Portable HLL distinct-gram sketch (see DistinctSketch): register
    // table + integer-exact estimate + the exact audit column side by
    // side — the corpus-saturation measurement whose shuffle is ≤
    // 256 × partitions rows however large the corpus (the exact column
    // is the deliberate audit cost, the q83-vs-q115 split).
    "q178_distinct_sketch" -> ((s, dir) =>
      DistinctSketch.summary(Tables(s, dir).documents
        .repartition(s.sparkContext.defaultParallelism))),

    // Store-served sketch: the corpus ingested as three drops of ≤ 256
    // register rows each; the served per-bucket MAX must be bit-identical
    // to sketching the union corpus from scratch (max-merge is exact for
    // ANY drop overlap — registers are value-keyed, not doc-keyed).
    "q179_sketch_store" -> ((s, dir) =>
      SketchStore.serveRegisters(s, sketchStoreFixture(s, dir))),

    // Sketch takedown: a junk drop of salted texts (novel grams that
    // perturb the served registers) ingested then REMOVED. MAX does not
    // subtract — exactness comes from deleting the drop's own register
    // ROWS and re-maxing survivors, which is exactly the never-ingested
    // sketch. Shares q179's oracle.
    "q180_sketch_unlearn" -> ((s, dir) =>
      SketchStore.serveRegisters(s, sketchUnlearnFixture(s, dir))),

    // The saturation curve: distinct-gram estimate after each ingest
    // prefix (a, ab, abc) from stored partials only — the "is new data
    // still novel?" monitor that never re-scans history.
    "q181_sketch_growth" -> ((s, dir) =>
      SketchStore.growthCurve(s, sketchStoreFixture(s, dir))),

    // Inter-drop redundancy matrix: pairwise overlap estimates by
    // inclusion–exclusion on the stored registers (HLL union is exact
    // in-the-sketch; intersection is derived) — drops² × 256 stored
    // rows replace what would otherwise be a corpus × corpus join.
    "q182_sketch_overlap" -> ((s, dir) =>
      SketchStore.overlapMatrix(s, sketchStoreFixture(s, dir))),

    // Hybrid retrieval: q164's BM25 workload fused with the exact-cosine
    // vector leg by Reciprocal-Rank Fusion in integer ppb (see Hybrid).
    // vec_id ≡ doc_id in TESTDATA, so the two legs rank one candidate
    // space; the vector leg is the brute-force baseline (production
    // swaps in the IVF/LSH serve — the fusion is leg-agnostic).
    "q183_hybrid_rrf" -> ((s, dir) => hybridLegs(s, dir)._3),

    // Pre-ingest admission: the % 3 = 0 slice arrives as a CANDIDATE
    // drop against a store holding only the other two thirds — one
    // sketch pass over the candidate + drops × 256 stored rows decide
    // how much of it is new BEFORE any ingest or dedup cost.
    "q185_sketch_admission" -> ((s, dir) =>
      SketchStore.admission(
        Tables(s, dir).documents.filter(col("doc_id") % 3 === 0)
          .repartition(s.sparkContext.defaultParallelism),
        sketchAdmitFixture(s, dir))),

    // Known-item retrieval evaluation (the q172 move for the retrieval
    // stack): each q164-probe's relevant doc is itself, so found@10 and
    // MRR (exact integer ppb) are measured facts per system — the
    // lexical leg, the vector leg (a control: self-cosine is 1, rank 1
    // by construction), and the fusion, one inference pass each.
    "q184_retrieval_eval" -> ((s, dir) => {
      val (lex, vec, fused) = hybridLegs(s, dir)
      val probes = Tables(s, dir).documents
        .filter(col("doc_id") % 5 === 0 && col("doc_id") < 60)
        .select(col("doc_id").as("query_id"))
      Hybrid.selfEval(probes,
          lex.withColumnRenamed("lex_rank", "rank"), "bm25")
        .unionByName(Hybrid.selfEval(probes,
          vec.withColumnRenamed("vec_rank", "rank"), "vector"))
        .unionByName(Hybrid.selfEval(probes, fused, "hybrid"))
    }),

    // The LLM curation spine END-TO-END as one lazy plan (see Curation):
    // quality gate (q123) → near-dup dedup (q26) → decontaminate vs the
    // fixed eval suite (q133) → DSIR top-100 vs the trusted % 19 == 0
    // target (q175) → greedy pack (q66) → manifest (q146). The gated
    // output is the final 8-row manifest certificate, so a composition
    // bug anywhere in the chain — exactly what the six per-stage gates
    // cannot see — flips a fingerprint here. The oracle replays all six
    // stages as one CTE chain of the stage oracles.
    "q186_curation_spine" -> ((s, dir) => {
      val d = Tables(s, dir).documents
        .repartition(s.sparkContext.defaultParallelism)
      Curation.spineManifest(
        corpus = d.filter(col("doc_id") % 19 =!= 0),
        target = d.filter(col("doc_id") % 19 === 0),
        bench = EvalSuite.table(s).withColumnRenamed("bench_id", "doc_id"))
    }),

    // The spine's DAILY-DROP form, gated (see Curation
    // .incrementalSpineSelection): the % 3 == 0 drop is curated against
    // HISTORY THAT LIVES IN THE LEDGERS — near-dup dedup serves q106's
    // signature store, DSIR scoring serves the profile store (history ∪
    // drop by count sum-merge) — while quality gating ranks within the
    // drop and decontamination/selection/packing/manifest are the batch
    // stages unchanged. The oracle replays everything from scratch
    // (drop-scoped quartiles, the 4×4-banded cross+intra dedup of
    // q106's oracle restricted to the gated drop, raw counts over
    // history ∪ survivors), so the hash gate simultaneously proves the
    // composition AND that both store serves equal their from-scratch
    // definitions inside it. k=50: a real selection cut at every SF.
    "q189_spine_drop" -> ((s, dir) => {
      val d = Tables(s, dir).documents
        .repartition(s.sparkContext.defaultParallelism)
      Curation.incrementalSpineManifest(
        drop = d.filter(col("doc_id") % 3 === 0),
        target = d.filter(col("doc_id") % 19 === 0),
        bench = EvalSuite.table(s).withColumnRenamed("bench_id", "doc_id"),
        dedupStore = storeFixture(s, dir),
        dsirStore = spineDsirFixture(s, dir),
        k = 50)
    }),

    // The spine's attrition FUNNEL (see Curation.spineFunnel): one row
    // per stage — exact (n_docs, n_tokens, n_seqs) after each gate —
    // the observability a production curation run is flown by. Same
    // stage chain as q186 (shared CTEs in the oracle), different face:
    // q186 certifies WHAT came out, q190 reports WHERE the rest went.
    "q190_spine_funnel" -> ((s, dir) => {
      val d = Tables(s, dir).documents
        .repartition(s.sparkContext.defaultParallelism)
      Curation.spineFunnel(
        corpus = d.filter(col("doc_id") % 19 =!= 0),
        target = d.filter(col("doc_id") % 19 === 0),
        bench = EvalSuite.table(s).withColumnRenamed("bench_id", "doc_id"))
    }),

    // The DAILY-DROP attrition funnel (q190's face over q189's chain):
    // per-stage exact (n_docs, n_tokens, n_seqs) for the incremental
    // spine — the morning read of a production crawl loop. A `deduped`
    // cliff HERE means the crawler re-fetched yesterday (the store
    // caught it); near-empty `gated` means the crawl was junk. Both
    // store serves sit inside the censused chain, so the oracle's
    // from-scratch replay gates serve ≡ scratch at every stage edge.
    "q205_drop_funnel" -> ((s, dir) => {
      val d = Tables(s, dir).documents
        .repartition(s.sparkContext.defaultParallelism)
      Curation.incrementalSpineFunnel(
        drop = d.filter(col("doc_id") % 3 === 0),
        target = d.filter(col("doc_id") % 19 === 0),
        bench = EvalSuite.table(s).withColumnRenamed("bench_id", "doc_id"),
        dedupStore = storeFixture(s, dir),
        dsirStore = spineDsirFixture(s, dir),
        k = 50)
    }),

    // The hybrid's PRODUCTION shape, gated: q183's fusion with the
    // exact-cosine vector leg swapped for an IVF-SERVED leg (q50's
    // deterministic MIPS quantizer, nprobe=1) over PLANTED embeddings —
    // each vector's group (vec_id % 8) dominates one coordinate, so (a)
    // every vector provably assigns to its own group's centroid and (b)
    // every exact top-10 lives inside the query's own cell: ANN
    // recall@10 is 100% BY CONSTRUCTION (HybridSpec pins the
    // precondition pairwise). The oracle fuses the BM25 leg with the
    // EXACT brute-force leg over the same planted vectors — so the gate
    // proves the leg-agnostic contract as a fact: an IVF-served fusion
    // hash-matches the exact-leg fusion whenever the leg meets its
    // recall contract. Plant margins: dominant coord 3·10^4 vs residual
    // < 997 keeps same-group cosine ≥ 0.93 vs cross-group ≤ 0.14, and
    // n2 ≈ 9·10^8 keeps na·nb < 10^18 — inside BIGINT in both engines.
    "q187_hybrid_ann" -> ((s, dir) => hybridAnnFused(s, dir)),

    // Portable Count-Min frequency sketch (see FreqSketch): per-probe
    // corpus-wide occurrence estimates NEXT TO the exact counts — the
    // one-sided est ≥ exact guarantee as a visible overcount column.
    // Probe workload = the distinct 3-grams of the doc_id % 97 slice;
    // the counter table is ≤ 4×1024 rows however large the corpus (the
    // exact column is the deliberate audit cost, the q178 discipline).
    "q191_cms_sketch" -> ((s, dir) => {
      val d = Tables(s, dir).documents
        .repartition(s.sparkContext.defaultParallelism)
      FreqSketch.audited(d, d.filter(col("doc_id") % 97 === 0))
    }),

    // The Count-Min width as a SCALE knob (q191 at the production
    // shape): the same audited recipe at w = 65536 — ε = e/w falls 64×,
    // and the counter table is still ≤ 4×65536 rows ≈ 2 MB at ANY
    // corpus size. At 100 TB the w=1024 default's absolute overcount
    // (~0.27% of 10^13-10^14 occurrences) swamps non-top-1000 probes;
    // a production store picks w = 2^20-2^24 the same way — nothing in
    // the recipe pins the width, and the store cfg stamps whichever
    // was chosen (FreqSpec pins append/serve inheriting it).
    "q203_cms_wide" -> ((s, dir) => {
      val d = Tables(s, dir).documents
        .repartition(s.sparkContext.defaultParallelism)
      FreqSketch.audited(d, d.filter(col("doc_id") % 97 === 0),
        width = 65536)
    }),

    // Store-served counters: the corpus ingested as three drops of ≤
    // 4096 counter rows each; the served per-(depth, slot) SUM must be
    // bit-identical to sketching the union corpus from scratch (counts
    // are linear and store drops partition the docs — the sum-merge
    // family contract).
    "q192_cms_store" -> ((s, dir) =>
      FreqStore.serveCounters(s, freqStoreFixture(s, dir))),

    // Doc-granular EXACT unlearning by linearity: drop "c" was ingested
    // WITH junk docs (salted texts at doc_id + 10M); unlearnDocs
    // subtracts the junk docs' own sketch — one scan of the PURGED
    // docs, never the drop's remainder — and the serve must restore the
    // never-ingested counters bit-for-bit. Shares q192's oracle (the
    // sum-merge contrast to the max-merge family's rebuild, q180).
    "q193_cms_unlearn" -> ((s, dir) =>
      FreqStore.serveCounters(s, freqUnlearnFixture(s, dir))),

    // The store's workload face: q191's audited estimates answered from
    // the PERSISTED counters (drops × 4096 stored rows + the workload —
    // the corpus appears only in the exact audit column). Store drops
    // partition the full table, so it shares q191's oracle: the serve ≡
    // from-scratch gate applied at the estimate surface.
    "q194_cms_serve" -> ((s, dir) => {
      val d = Tables(s, dir).documents
        .repartition(s.sparkContext.defaultParallelism)
      val g = Dedup.materialize(FreqSketch.grams(d))
      val probes = FreqSketch.grams(d.filter(col("doc_id") % 97 === 0))
        .select(col("g").as("term")).distinct()
      FreqStore.serveEstimates(s, probes, freqStoreFixture(s, dir))
        .join(g.groupBy(col("g").as("term"))
          .agg(count(lit(1)).as("n_exact")), Seq("term"), "left")
        .withColumn("n_exact", coalesce(col("n_exact"), lit(0L)))
        .withColumn("overcount", col("est") - col("n_exact"))
    }),

    // Bottom-k uniform sample (see KmvSample): the 128 smallest md5
    // hashes of doc_id — a deterministic without-replacement draw cut
    // by TakeOrderedAndProject's bounded heap (no global sort at any
    // corpus size), each row carrying its (lang, n_tokens) payload.
    "q195_kmv_sample" -> ((s, dir) =>
      KmvSample.sample(Tables(s, dir).documents
        .repartition(s.sparkContext.defaultParallelism))),

    // Store-served sample: the corpus ingested as three drops of ≤ 128
    // sample rows each; the served re-cut over drops × k stored rows
    // must be bit-identical to sampling the union corpus from scratch
    // (the order-statistic merge: a global bottom-k member is inside
    // its own drop's bottom-k). Shares q195's oracle.
    "q196_sample_store" -> ((s, dir) =>
      SampleStore.serveSample(s, sampleStoreFixture(s, dir))),

    // Sample takedown: a junk drop (salted ids at doc_id + 10M, whose
    // hashes crack the served bottom-k) ingested then REMOVED — the
    // re-cut over surviving rows is exactly the never-ingested sample
    // (the same subset argument as the serve). Shares q195's oracle.
    "q197_sample_takedown" -> ((s, dir) =>
      SampleStore.serveSample(s, sampleUnlearnFixture(s, dir))),

    // The sample's USE, audited: corpus mean tokens/doc estimated from
    // the k stored sample rows (their n_tokens payload — raw text never
    // touched) NEXT TO the exact corpus scan, err in integer per-mille
    // (the q178/q191 audit discipline applied to a sample statistic).
    "q198_sample_audit" -> ((s, dir) =>
      KmvSample.auditMeanTokens(
        SampleStore.serveSample(s, sampleStoreFixture(s, dir)),
        Tables(s, dir).documents
          .repartition(s.sparkContext.defaultParallelism))),

    // STRATIFIED standing sample: the bottom-16 hash cut PER LANGUAGE —
    // "k uniform docs per stratum" (balanced eval/labeling batches) by
    // running the engine's own bounded-heap per-key top-k physical
    // operator (plans/TopKPerKey, q51's exec) over the KMV hash order:
    // partial heaps map-side, ≤ k × strata rows shuffle, no
    // corpus-sized window anywhere.
    "q199_sample_stratified" -> ((s, dir) => {
      val d = Tables(s, dir).documents
        .repartition(s.sparkContext.defaultParallelism)
      graft.operators.Relational.topKPerKey(
        d.select(col("lang"), KmvSample.hashOf(col("doc_id")).as("hv"),
          col("doc_id"),
          size(TextOps.words(col("text"))).cast("long").as("n_tokens")),
        keys = Seq(col("lang")),
        order = Seq(col("hv").asc, col("doc_id").asc),
        k = 16)
    }),

    // The stratified cut PERSISTED: a store built per-language keeps ≤
    // k × strata rows per drop, and the served balanced sample re-cuts
    // drops × k × strata stored rows per stratum — the order-statistic
    // merge argument applied within each language independently, so
    // minority languages keep their k however small their corpus share.
    // Shares q199's oracle (store drops partition the corpus).
    "q200_sample_store_strat" -> ((s, dir) =>
      SampleStore.serveStratified(s, sampleStratFixture(s, dir))),

    // The per-LANGUAGE drift monitor the stratified store exists for:
    // mean tokens/doc per language estimated from k×strata stored rows
    // vs the exact per-language scan, err in integer per-mille — the
    // q198 audit applied per stratum ("German docs suddenly average
    // half the tokens" is invisible in the global mean).
    "q201_sample_audit_strat" -> ((s, dir) =>
      KmvSample.auditMeanTokensByLang(
        SampleStore.serveStratified(s, sampleStratFixture(s, dir)),
        Tables(s, dir).documents
          .repartition(s.sparkContext.defaultParallelism))),

    // Frequency DRIFT across drops: the q191 probe workload estimated
    // WITHIN each stored drop (a drop's counter rows are its own
    // sketch), normalized to ppm of the drop's own gram mass so drops
    // of different sizes read directly against each other — "is this
    // phrase exploding in the new crawl?" from drops × 4096 stored
    // rows, the corpus never re-read.
    "q202_cms_drift" -> ((s, dir) => {
      val probes = FreqSketch.grams(
          Tables(s, dir).documents.filter(col("doc_id") % 97 === 0))
        .select(col("g").as("term")).distinct()
      FreqStore.driftEstimates(s, probes, freqStoreFixture(s, dir))
    }),
  )

  /** q183/q184's shared legs: (lex top-10 with lex_rank, vector top-10
    * with vec_rank, RRF-fused top-10) over q164's 12-probe workload.
    */
  private def hybridLegs(s: SparkSession, dir: String)
      : (DataFrame, DataFrame, DataFrame) = {
    val k = 10
    val lex = Hybrid.addRank(
      Retrieval.bm25TopKFor(
        Tables(s, dir).documents
          .repartition(s.sparkContext.defaultParallelism),
        probe = col("doc_id") % 5 === 0 && col("doc_id") < 60, k = k),
      col("query_id"), Seq(col("score_ppt").desc, col("doc_id").asc),
      "lex_rank", k).drop("score_ppt")
    val e = graft.vector.Queries.prepared(s, dir)
    val qs = e.filter(col("vec_id") % 5 === 0 && col("vec_id") < 60)
    val scored = e
      .repartition(s.sparkContext.defaultParallelism).as("b")
      .crossJoin(broadcast(qs.as("a")))
      .select(col("a.vec_id").as("query_id"),
        col("b.vec_id").as("doc_id"),
        graft.vector.VectorOps.cosineQ(
          graft.functions.VectorDot.of(col("a.q"), col("b.q")),
          col("a.n2"), col("b.n2")).as("sim"))
    val vec = Hybrid.addRank(scored, col("query_id"),
      Seq(col("sim").desc, col("doc_id").asc), "vec_rank", k)
      .drop("sim")
    (lex, vec, Hybrid.rrfFuse(lex, vec, k))
  }

  /** q187's PLANTED embeddings: the quantized vectors re-based so group
    * g = vec_id % 8 dominates coordinate g (value 3·10^4) over a small
    * per-vector residual (abs(q[i]) % 997 — carried so within-group
    * rankings stay distinct and data-derived). Consequences, proven
    * pairwise in HybridSpec: same-group cosine ≥ ~0.93, cross-group
    * ≤ ~0.14, so with one centroid per group every exact top-10 is
    * cell-local — the planted-recall precondition q187's gate rests on.
    * n2 ≈ 9.7·10^8 keeps na·nb < 10^18: inside BIGINT in both engines
    * (cosineQ multiplies in LONG before the double cast, as does the
    * oracle — overflow here would silently corrupt sims Spark-side).
    */
  private[graft] def plantedVectors(s: SparkSession, dir: String): DataFrame =
    graft.vector.Queries.prepared(s, dir)
      .select(col("vec_id"),
        transform(col("q"), (x, i) =>
          abs(x) % 997 +
            when(i === col("vec_id") % 8, lit(30000L)).otherwise(lit(0L)))
          .as("q"))
      .withColumn("n2", graft.functions.VectorDot.of(col("q"), col("q")))

  /** q187: q183's fusion with the vector leg served from an IVF index —
    * q50's deterministic coarse quantizer (centroids = the 8 lowest-id
    * planted vectors, one per group by construction; cells by argmax
    * dot, ties to the smaller cid) and nprobe=1 probing: a query is
    * scored ONLY against its own cell. The corpus never meets an
    * all-pairs join; the cell equi-join is the one shuffle that grows
    * with n — the q50/q134 production contract, now inside a gated
    * fusion.
    */
  private def hybridAnnFused(s: SparkSession, dir: String): DataFrame = {
    val k = 10
    val lex = Hybrid.addRank(
      Retrieval.bm25TopKFor(
        Tables(s, dir).documents
          .repartition(s.sparkContext.defaultParallelism),
        probe = col("doc_id") % 5 === 0 && col("doc_id") < 60, k = k),
      col("query_id"), Seq(col("score_ppt").desc, col("doc_id").asc),
      "lex_rank", k).drop("score_ppt")
    val e = plantedVectors(s, dir)
      .repartition(s.sparkContext.defaultParallelism)
    val cents = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cid"), col("q").as("cq"))
    val wAssign = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vec_id"))
      .orderBy(col("cdot").desc, col("cid").asc)
    // cache(): the assignment feeds both probe and corpus sides of the
    // cell join — in production this frame IS the persisted index (the
    // ClusterStore pattern); caching is its in-query stand-in
    val assigned = e
      .crossJoin(broadcast(cents))
      .withColumn("cdot", graft.functions.VectorDot.of(col("q"), col("cq")))
      .withColumn("rn", row_number().over(wAssign))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("q"), col("n2"), col("cid"))
      .cache()
    val qs = assigned.filter(col("vec_id") % 5 === 0 && col("vec_id") < 60)
    val scored = assigned.as("b")
      .join(broadcast(qs.as("a")), col("a.cid") === col("b.cid"))
      .select(col("a.vec_id").as("query_id"), col("b.vec_id").as("doc_id"),
        graft.vector.VectorOps.cosineQ(
          graft.functions.VectorDot.of(col("a.q"), col("b.q")),
          col("a.n2"), col("b.n2")).as("sim"))
    val vec = Hybrid.addRank(scored, col("query_id"),
      Seq(col("sim").desc, col("doc_id").asc), "vec_rank", k).drop("sim")
    Hybrid.rrfFuse(lex, vec, k)
  }

  /** Substring-level repeated-span detection — the span-granularity dedup
    * from Lee et al., "Deduplicating Training Data Makes Language Models
    * Better" (arXiv:2107.06499), re-expressed relationally instead of via
    * their suffix array: flag every k-gram occurring in ≥ `minDf` distinct
    * documents, then merge each doc's flagged gram starts into maximal
    * spans (overlapping-or-adjacent coverage windows coalesce). Doc-level
    * dedup (q24/q26) misses a verbatim paragraph pasted into an otherwise
    * unique doc; this finds exactly the pasted range.
    *
    * Output: one row per (doc, span): start/end token positions (1-based,
    * inclusive), span width, #flagged grams inside, and the hottest gram's
    * doc-frequency.
    *
    * Scale shape: the positions explode is map-side; gram doc-frequency is
    * a two-phase hash agg keyed on a 64-bit md5-prefix of the gram (the
    * gram STRING shuffles once into the agg, never again — the flag join
    * carries only the 16-hex key); the flag join is key-unique on gram_key
    * (each position row matches ≤1 flagged-gram row — no fan-out, and a
    * hot boilerplate gram is one key among millions, AQE-splittable); span
    * merging is a per-doc window (running max end over preceding rows →
    * island ids), partition = doc_id. No global window, no BNLJ, no
    * suffix-array driver-side state.
    */
  def repeatedSpans(docs: DataFrame, k: Int = 5, minDf: Int = 2,
                    eager: Boolean = true): DataFrame = {
    // the gram-position frame feeds BOTH the df agg and the flag join —
    // materialize it (nearDupPairs' shared-prep discipline) or the scan +
    // shingle + md5 map work runs twice; eager=false for the SQL TVF path
    // (analysis must stay job-free — cache() shares lazily; the entry is
    // retained for the session as documented at the TVF layer,
    // GraftExtensions' cache-retention contract). Gram explosion + island
    // merge are the span family's shared primitives (SpanStore hosts
    // them; the store-served q150 path runs the same code).
    val pos0 = SpanStore.posRows(docs, k)
    val pos = if (eager) Dedup.materialize(pos0) else pos0.cache()
    val flagged = pos
      .groupBy(col("gram_key"))
      .agg(countDistinct(col("doc_id")).as("gram_df"))
      .filter(col("gram_df") >= minDf)
    SpanStore.spanRows(pos.join(flagged, "gram_key"), k)
  }

  /** Remove repeated spans, keeping ONE copy corpus-wide — the action to
    * [[repeatedSpans]]' detection (Lee et al.'s dedup policy: every
    * duplicated substring keeps exactly one occurrence). The keeper of a
    * flagged k-gram is the corpus-minimum doc_id containing it; every
    * occurrence in a LARGER doc_id is deleted token-wise (union of covered
    * positions, so overlapping flagged grams scrub once). Intra-doc
    * repetition inside the keeper is intentionally untouched — that is
    * q75's domain, not corpus dedup.
    *
    * Output: every input doc with (n_toks, n_removed, scrubbed_text) —
    * n_removed = 0 and unchanged text for clean docs; a doc that was pure
    * boilerplate scrubs to "".
    *
    * Scale shape: this op REWRITES the corpus, so its floor cost is a
    * token-volume shuffle (the reassembly agg) — the same class as the
    * gram explode it already pays. All joins are key-unique equi joins
    * (gram_key → one keeper row; (doc_id, t) anti join); reassembly is one
    * hash agg per doc (collect_list of (pos, token) structs sorted in the
    * agg buffer, never a window); keeper election is a partial-agg'd
    * min — no BNLJ, no global window, no driver-side text.
    */
  def scrubRepeatedSpans(docs: DataFrame, k: Int = 5, minDf: Int = 2,
                         eager: Boolean = true): DataFrame = {
    val d = docs.select(col("doc_id"), TextOps.words(col("text")).as("ws"))
    // same shared-prep materialization as repeatedSpans (keeper agg +
    // flag join both consume pos); eager=false on the TVF path. The
    // covered-position/reassembly tail is SpanStore.scrubTail — the
    // store-served q151 path elects keepers differently (store ∪ drop)
    // but scrubs through the identical machinery.
    val pos0 = SpanStore.posRows(docs, k)
    val pos = if (eager) Dedup.materialize(pos0) else pos0.cache()
    val keepers = pos
      .groupBy(col("gram_key"))
      .agg(countDistinct(col("doc_id")).as("gram_df"),
        min(col("doc_id")).as("keeper"))
      .filter(col("gram_df") >= minDf)
      .select(col("gram_key"), col("keeper"))
    SpanStore.scrubTail(d, pos, keepers, k, eager)
  }

  /** Per-doc repetition statistics (the q75 surface, reusable as a library
    * op): word totals/distincts, the top single-word and bigram repeat
    * counts, and the top-bigram fraction. Two hash-agg pyramids (word,
    * bigram) joined on doc_id — no windows, no sorts.
    */
  def repetitionStats(docs: DataFrame): DataFrame = {
    val base = docs.select(col("doc_id"), TextOps.words(col("text")).as("ws"))
    val wc = base.select(col("doc_id"), explode(col("ws")).as("w"))
      .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("c"))
    val wstats = wc.groupBy(col("doc_id")).agg(
      sum(col("c")).as("n_words"),
      count(lit(1)).as("n_distinct"),
      max(col("c")).as("top_word_n"))
    // guard the explode: shingles()'s short-doc fallback (the doc itself
    // as one "shingle") must not count as a bigram for 0/1-word docs —
    // the empty array drops them here and the inner join below drops the
    // doc, exactly matching the oracle's no-bigram-rows behavior
    val bc = base.select(col("doc_id"),
        explode(when(size(col("ws")) >= 2, TextOps.shingles(col("ws"), 2))
          .otherwise(array().cast("array<string>"))).as("b"))
      .groupBy(col("doc_id"), col("b")).agg(count(lit(1)).as("c"))
    val bstats = bc.groupBy(col("doc_id")).agg(
      max(col("c")).as("top_bigram_n"),
      sum(col("c")).as("n_bigrams"))
    wstats.join(bstats, "doc_id")
      .select(col("doc_id"), col("n_words"), col("n_distinct"), col("top_word_n"),
        col("top_bigram_n"),
        (col("top_bigram_n").cast("double") / col("n_bigrams")).as("top_bigram_frac"))
  }

  /** q106's signature store, built ONCE per (session, sf-dir) from drop 1
    * (doc_id % 3 != 0) and reused by every q106 invocation in the JVM —
    * serve runs never re-bill the build (Bench times the build separately
    * as q106_build). The dir is a temp path removed on JVM exit; reuse is
    * safe because q106 serves via the non-committing staged API, so the
    * store's contents are immutable after build.
    */
  private val sigStores =
    new java.util.concurrent.ConcurrentHashMap[(Int, String), String]()

  /** q130's learned merge table, derived ONCE per (session, sf-dir) from
    * the deterministic training split (doc_id % 7 == 0, nMerges = 24) and
    * shared between the Spark query and the oracle generator — learning
    * is exact and order-independent, so both sides see the identical
    * rank-ordered table.
    */
  private val learnedTables =
    new java.util.concurrent.ConcurrentHashMap[(Int, String), Seq[String]]()

  private[graft] def learnedMergesFixture(s: SparkSession, dir: String): Seq[String] =
    learnedTables.computeIfAbsent((System.identityHashCode(s), dir), { _ =>
      Bpe.learnMerges(
        Tables(s, dir).documents.filter(col("doc_id") % 7 === 0),
        nMerges = 24)
    })

  /** The learned table for the q130 oracle string. `oracleSql` takes no
    * (session, dir) — Verify pins the dump's sf-dir as the `graft.sf.dir`
    * system property before evaluating it, and the active session is the
    * one that just ran the queries, so this resolves to exactly the table
    * q130's Spark side encoded under. Outside a Verify dump (contract
    * tests enumerating oracle SQL with no session) it falls back to the
    * DemoMerges fixture: still valid SQL, and never compared against a
    * Spark result.
    */
  private def oracleLearnedMerges: Seq[String] =
    (for {
      s <- SparkSession.getActiveSession
      dir <- Option(System.getProperty("graft.sf.dir"))
    } yield learnedMergesFixture(s, dir)).getOrElse(Bpe.DemoMerges)

  /** q137's LM count store, built ONCE per (session, sf-dir): the q135
    * trusted split (doc_id % 7 == 0) lands as two drops (doc_id % 14 ==
    * 0 / == 7), bootstrap + append — so the gated query proves the
    * merged serve ≡ the whole-split model. Temp dir removed on JVM
    * exit; reuse is safe because serve never mutates.
    */
  private val lmStores =
    new java.util.concurrent.ConcurrentHashMap[(Int, String), String]()

  private[graft] def lmStoreFixture(s: SparkSession, dir: String): String =
    lmStores.computeIfAbsent((System.identityHashCode(s), dir), { _ =>
      val storeDir = java.nio.file.Files
        .createTempDirectory("graft-lmstore").toString
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        import java.nio.file.{Files => F, Paths}
        import scala.jdk.CollectionConverters._
        val p = Paths.get(storeDir)
        if (F.exists(p))
          F.walk(p).iterator().asScala.toSeq.reverseIterator
            .foreach(q => F.deleteIfExists(q))
      }))
      lmStoreBuild(s, dir, storeDir)
      storeDir
    })

  /** The two-drop build q137's fixture (and Bench's q137_build row) runs. */
  private[graft] def lmStoreBuild(s: SparkSession, dir: String,
                                  storeDir: String): Unit = {
    val d = Tables(s, dir).documents
    LmStore.build(d.filter(col("doc_id") % 14 === 0), storeDir, "even")
    LmStore.append(d.filter(col("doc_id") % 14 === 7), storeDir, "odd")
  }

  /** q139's store: the trusted split (doc_id % 7 == 0) as THREE drops
    * keyed by doc_id % 21 ∈ {0, 7, 14}, with the middle drop REMOVED
    * after ingest — so the served model must equal a model that never saw
    * it. Separate dir from [[lmStoreFixture]] (q137 keeps serving the
    * intact two-drop store); reuse is safe because serve never mutates.
    */
  private[graft] def lmTakedownFixture(s: SparkSession, dir: String): String =
    lmStores.computeIfAbsent((System.identityHashCode(s), dir + "#takedown"), { _ =>
      val storeDir = java.nio.file.Files
        .createTempDirectory("graft-lmstore-td").toString
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        import java.nio.file.{Files => F, Paths}
        import scala.jdk.CollectionConverters._
        val p = Paths.get(storeDir)
        if (F.exists(p))
          F.walk(p).iterator().asScala.toSeq.reverseIterator
            .foreach(q => F.deleteIfExists(q))
      }))
      val d = Tables(s, dir).documents
      LmStore.build(d.filter(col("doc_id") % 21 === 0), storeDir, "a")
      LmStore.append(d.filter(col("doc_id") % 21 === 7), storeDir, "b")
      LmStore.append(d.filter(col("doc_id") % 21 === 14), storeDir, "c")
      LmStore.removeDrop(s, storeDir, "b")
      storeDir
    })

  /** q147's gram store: the corpus history (doc_id % 3 != 0) as two
    * drops — "a" (% 3 == 1) bootstraps, "b" (% 3 == 2) appends. Serve
    * never mutates, so session-wide reuse is safe.
    */
  private[graft] def gramStoreFixture(s: SparkSession, dir: String): String =
    sigStores.computeIfAbsent((System.identityHashCode(s), dir + "#grams"), { _ =>
      val storeDir = java.nio.file.Files
        .createTempDirectory("graft-gramstore").toString
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        import java.nio.file.{Files => F, Paths}
        import scala.jdk.CollectionConverters._
        val p = Paths.get(storeDir)
        if (F.exists(p))
          F.walk(p).iterator().asScala.toSeq.reverseIterator
            .foreach(q => F.deleteIfExists(q))
      }))
      val d = Tables(s, dir).documents
      GramStore.build(d.filter(col("doc_id") % 3 === 1), storeDir, "a")
      GramStore.append(d.filter(col("doc_id") % 3 === 2), storeDir, "b")
      storeDir
    })

  /** q148's store: [[gramStoreFixture]]'s build with drop "b" REMOVED —
    * the serve must behave as if % 3 == 2 never existed.
    */
  private[graft] def gramTakedownFixture(s: SparkSession, dir: String): String =
    sigStores.computeIfAbsent((System.identityHashCode(s), dir + "#grams-td"), { _ =>
      val storeDir = java.nio.file.Files
        .createTempDirectory("graft-gramstore-td").toString
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        import java.nio.file.{Files => F, Paths}
        import scala.jdk.CollectionConverters._
        val p = Paths.get(storeDir)
        if (F.exists(p))
          F.walk(p).iterator().asScala.toSeq.reverseIterator
            .foreach(q => F.deleteIfExists(q))
      }))
      val d = Tables(s, dir).documents
      GramStore.build(d.filter(col("doc_id") % 3 === 1), storeDir, "a")
      GramStore.append(d.filter(col("doc_id") % 3 === 2), storeDir, "b")
      GramStore.removeDrop(s, storeDir, "b")
      storeDir
    })

  /** q150/q151's span store: the corpus history (doc_id % 3 != 0) as two
    * drops — "a" (% 3 == 1) bootstraps, "b" (% 3 == 2) appends — so the
    * served df/keeper stats exercise BOTH merge disciplines (df sums,
    * keepers min) across drops. Serve never mutates; session-wide reuse
    * is safe.
    */
  private[graft] def spanStoreFixture(s: SparkSession, dir: String): String =
    sigStores.computeIfAbsent((System.identityHashCode(s), dir + "#spans"), { _ =>
      val storeDir = java.nio.file.Files
        .createTempDirectory("graft-spanstore").toString
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        import java.nio.file.{Files => F, Paths}
        import scala.jdk.CollectionConverters._
        val p = Paths.get(storeDir)
        if (F.exists(p))
          F.walk(p).iterator().asScala.toSeq.reverseIterator
            .foreach(q => F.deleteIfExists(q))
      }))
      val d = Tables(s, dir).documents
      SpanStore.build(d.filter(col("doc_id") % 3 === 1), storeDir, "a")
      SpanStore.append(d.filter(col("doc_id") % 3 === 2), storeDir, "b")
      storeDir
    })

  /** q152's store: [[spanStoreFixture]]'s two drops plus a JUNK drop "x" —
    * the PROBE split's own texts re-keyed to doc_id + 10^7 (disjoint ids,
    * duplicate content: it inflates exactly the probe grams' df while its
    * large ids steal no keepers) — then REMOVED. The serve must flag
    * exactly what a store that never saw "x" flags: removal IS df
    * subtraction under the sum-merge.
    */
  private[graft] def spanTakedownFixture(s: SparkSession, dir: String): String =
    sigStores.computeIfAbsent((System.identityHashCode(s), dir + "#spans-td"), { _ =>
      val storeDir = java.nio.file.Files
        .createTempDirectory("graft-spanstore-td").toString
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        import java.nio.file.{Files => F, Paths}
        import scala.jdk.CollectionConverters._
        val p = Paths.get(storeDir)
        if (F.exists(p))
          F.walk(p).iterator().asScala.toSeq.reverseIterator
            .foreach(q => F.deleteIfExists(q))
      }))
      val d = Tables(s, dir).documents
      SpanStore.build(d.filter(col("doc_id") % 3 === 1), storeDir, "a")
      SpanStore.append(d.filter(col("doc_id") % 3 === 2), storeDir, "b")
      SpanStore.append(
        d.filter(col("doc_id") % 3 === 0)
          .withColumn("doc_id", col("doc_id") + lit(10000000L)),
        storeDir, "x")
      SpanStore.removeDrop(s, storeDir, "x")
      storeDir
    })

  /** q162/q163's chunk store: the corpus history (doc_id % 3 != 0) as two
    * drops under the default CDC config; the takedown variant adds a junk
    * drop "x" (the probe's texts re-keyed to doc_id + 10^7 — inflates
    * exactly the probe chunks' df) and removes it.
    */
  private[graft] def chunkStoreFixture(s: SparkSession, dir: String): String =
    sigStores.computeIfAbsent((System.identityHashCode(s), dir + "#chunks"), { _ =>
      val storeDir = java.nio.file.Files
        .createTempDirectory("graft-chunkstore").toString
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        import java.nio.file.{Files => F, Paths}
        import scala.jdk.CollectionConverters._
        val p = Paths.get(storeDir)
        if (F.exists(p))
          F.walk(p).iterator().asScala.toSeq.reverseIterator
            .foreach(q => F.deleteIfExists(q))
      }))
      val d = Tables(s, dir).documents
      ChunkStore.build(d.filter(col("doc_id") % 3 === 1), storeDir, "a")
      ChunkStore.append(d.filter(col("doc_id") % 3 === 2), storeDir, "b")
      storeDir
    })

  private[graft] def chunkTakedownFixture(s: SparkSession, dir: String): String =
    sigStores.computeIfAbsent((System.identityHashCode(s), dir + "#chunks-td"), { _ =>
      val storeDir = java.nio.file.Files
        .createTempDirectory("graft-chunkstore-td").toString
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        import java.nio.file.{Files => F, Paths}
        import scala.jdk.CollectionConverters._
        val p = Paths.get(storeDir)
        if (F.exists(p))
          F.walk(p).iterator().asScala.toSeq.reverseIterator
            .foreach(q => F.deleteIfExists(q))
      }))
      val d = Tables(s, dir).documents
      ChunkStore.build(d.filter(col("doc_id") % 3 === 1), storeDir, "a")
      ChunkStore.append(d.filter(col("doc_id") % 3 === 2), storeDir, "b")
      ChunkStore.append(
        d.filter(col("doc_id") % 3 === 0)
          .withColumn("doc_id", col("doc_id") + lit(10000000L)),
        storeDir, "x")
      ChunkStore.removeDrop(s, storeDir, "x")
      storeDir
    })

  /** q165/q166's postings store: the corpus history (doc_id % 3 != 0) as
    * two drops; the takedown variant adds a junk drop "x" (the probe's
    * texts re-keyed to doc_id + 10^7 — doubles exactly the probe docs'
    * postings, df, N and Σdl) and removes it.
    */
  private[graft] def postingsStoreFixture(s: SparkSession, dir: String): String =
    sigStores.computeIfAbsent((System.identityHashCode(s), dir + "#postings"), { _ =>
      val storeDir = java.nio.file.Files
        .createTempDirectory("graft-postingsstore").toString
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        import java.nio.file.{Files => F, Paths}
        import scala.jdk.CollectionConverters._
        val p = Paths.get(storeDir)
        if (F.exists(p))
          F.walk(p).iterator().asScala.toSeq.reverseIterator
            .foreach(q => F.deleteIfExists(q))
      }))
      val d = Tables(s, dir).documents
      PostingsStore.build(d.filter(col("doc_id") % 3 === 1), storeDir, "a")
      PostingsStore.append(d.filter(col("doc_id") % 3 === 2), storeDir, "b")
      storeDir
    })

  private[graft] def postingsTakedownFixture(s: SparkSession, dir: String): String =
    sigStores.computeIfAbsent((System.identityHashCode(s), dir + "#postings-td"), { _ =>
      val storeDir = java.nio.file.Files
        .createTempDirectory("graft-postingsstore-td").toString
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        import java.nio.file.{Files => F, Paths}
        import scala.jdk.CollectionConverters._
        val p = Paths.get(storeDir)
        if (F.exists(p))
          F.walk(p).iterator().asScala.toSeq.reverseIterator
            .foreach(q => F.deleteIfExists(q))
      }))
      val d = Tables(s, dir).documents
      PostingsStore.build(d.filter(col("doc_id") % 3 === 1), storeDir, "a")
      PostingsStore.append(d.filter(col("doc_id") % 3 === 2), storeDir, "b")
      PostingsStore.append(
        d.filter(col("doc_id") % 3 === 0)
          .withColumn("doc_id", col("doc_id") + lit(10000000L)),
        storeDir, "x")
      PostingsStore.removeDrop(s, storeDir, "x")
      storeDir
    })

  /** q169/q170's classifier store: the train split (doc_id % 5 != 0) as
    * two drops of summed count partials; the unlearn variant adds a junk
    * drop "x" (the train texts re-keyed +10^7 under phantom class "xx")
    * and removes it — takedown must restore the never-ingested model.
    */
  private[graft] def classifyStoreFixture(s: SparkSession, dir: String): String =
    sigStores.computeIfAbsent((System.identityHashCode(s), dir + "#classify"), { _ =>
      val storeDir = java.nio.file.Files
        .createTempDirectory("graft-classifystore").toString
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        import java.nio.file.{Files => F, Paths}
        import scala.jdk.CollectionConverters._
        val p = Paths.get(storeDir)
        if (F.exists(p))
          F.walk(p).iterator().asScala.toSeq.reverseIterator
            .foreach(q => F.deleteIfExists(q))
      }))
      val d = Tables(s, dir).documents
      ClassifyStore.build(
        d.filter(col("doc_id") % 5 === 1 || col("doc_id") % 5 === 2),
        storeDir, "a")
      ClassifyStore.append(
        d.filter(col("doc_id") % 5 === 3 || col("doc_id") % 5 === 4),
        storeDir, "b")
      storeDir
    })

  private[graft] def classifyUnlearnFixture(s: SparkSession, dir: String): String =
    sigStores.computeIfAbsent((System.identityHashCode(s), dir + "#classify-td"), { _ =>
      val storeDir = java.nio.file.Files
        .createTempDirectory("graft-classifystore-td").toString
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        import java.nio.file.{Files => F, Paths}
        import scala.jdk.CollectionConverters._
        val p = Paths.get(storeDir)
        if (F.exists(p))
          F.walk(p).iterator().asScala.toSeq.reverseIterator
            .foreach(q => F.deleteIfExists(q))
      }))
      val d = Tables(s, dir).documents
      ClassifyStore.build(
        d.filter(col("doc_id") % 5 === 1 || col("doc_id") % 5 === 2),
        storeDir, "a")
      ClassifyStore.append(
        d.filter(col("doc_id") % 5 === 3 || col("doc_id") % 5 === 4),
        storeDir, "b")
      ClassifyStore.append(
        d.filter(col("doc_id") % 5 =!= 0)
          .withColumn("doc_id", col("doc_id") + lit(10000000L))
          .withColumn("lang", lit("xx")),
        storeDir, "x")
      ClassifyStore.removeDrop(s, storeDir, "x")
      storeDir
    })

  /** q176/q177's dsir store: the raw history (doc_id % 19 != 0, minus
    * the % 7 == 1 probe slice) as two drops of summed profile partials;
    * the unlearn variant adds a junk drop "x" (the raw texts duplicated,
    * which would halve every ratio) and removes it — takedown must
    * restore the never-ingested selection model.
    */
  private[graft] def dsirStoreFixture(s: SparkSession, dir: String): String =
    sigStores.computeIfAbsent((System.identityHashCode(s), dir + "#dsir"), { _ =>
      val storeDir = java.nio.file.Files
        .createTempDirectory("graft-dsirstore").toString
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        import java.nio.file.{Files => F, Paths}
        import scala.jdk.CollectionConverters._
        val p = Paths.get(storeDir)
        if (F.exists(p))
          F.walk(p).iterator().asScala.toSeq.reverseIterator
            .foreach(q => F.deleteIfExists(q))
      }))
      val raw = Tables(s, dir).documents
        .filter(col("doc_id") % 19 =!= 0 && col("doc_id") % 7 =!= 1)
      DsirStore.build(raw.filter(col("doc_id") % 7 <= 3), storeDir, "a")
      DsirStore.append(raw.filter(col("doc_id") % 7 > 3), storeDir, "b")
      storeDir
    })

  /** q189's DSIR history ledger: the % 3 != 0 corpus profiled as two
    * drops — the SAME history split the q106 signature store holds, so
    * the daily-drop spine serves both ledgers over one consistent
    * history.
    */
  private[graft] def spineDsirFixture(s: SparkSession, dir: String): String =
    sigStores.computeIfAbsent((System.identityHashCode(s), dir + "#spinedsir"), { _ =>
      val storeDir = java.nio.file.Files
        .createTempDirectory("graft-spinedsir").toString
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        import java.nio.file.{Files => F, Paths}
        import scala.jdk.CollectionConverters._
        val p = Paths.get(storeDir)
        if (F.exists(p))
          F.walk(p).iterator().asScala.toSeq.reverseIterator
            .foreach(q => F.deleteIfExists(q))
      }))
      val hist = Tables(s, dir).documents.filter(col("doc_id") % 3 =!= 0)
      DsirStore.build(hist.filter(col("doc_id") % 3 === 1), storeDir, "a")
      DsirStore.append(hist.filter(col("doc_id") % 3 === 2), storeDir, "b")
      storeDir
    })

  private[graft] def dsirUnlearnFixture(s: SparkSession, dir: String): String =
    sigStores.computeIfAbsent((System.identityHashCode(s), dir + "#dsir-td"), { _ =>
      val storeDir = java.nio.file.Files
        .createTempDirectory("graft-dsirstore-td").toString
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        import java.nio.file.{Files => F, Paths}
        import scala.jdk.CollectionConverters._
        val p = Paths.get(storeDir)
        if (F.exists(p))
          F.walk(p).iterator().asScala.toSeq.reverseIterator
            .foreach(q => F.deleteIfExists(q))
      }))
      val raw = Tables(s, dir).documents
        .filter(col("doc_id") % 19 =!= 0 && col("doc_id") % 7 =!= 1)
      DsirStore.build(raw.filter(col("doc_id") % 7 <= 3), storeDir, "a")
      DsirStore.append(raw.filter(col("doc_id") % 7 > 3), storeDir, "b")
      DsirStore.append(
        Tables(s, dir).documents.filter(col("doc_id") % 19 =!= 0)
          .withColumn("doc_id", col("doc_id") + lit(10000000L)),
        storeDir, "x")
      DsirStore.removeDrop(s, storeDir, "x")
      storeDir
    })

  /** q179/q181's sketch store: the corpus as three drops (a, b, c by
    * doc_id % 3 = 1, 2, 0 — union = the full table) of ≤ 256 register
    * rows each; the unlearn variant adds a junk drop "x" whose salted
    * texts contribute novel grams (perturbing the served registers) and
    * removes it — takedown must restore the never-ingested sketch.
    */
  private[graft] def sketchStoreFixture(s: SparkSession, dir: String): String =
    sigStores.computeIfAbsent((System.identityHashCode(s), dir + "#sketch"), { _ =>
      val storeDir = java.nio.file.Files
        .createTempDirectory("graft-sketchstore").toString
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        import java.nio.file.{Files => F, Paths}
        import scala.jdk.CollectionConverters._
        val p = Paths.get(storeDir)
        if (F.exists(p))
          F.walk(p).iterator().asScala.toSeq.reverseIterator
            .foreach(q => F.deleteIfExists(q))
      }))
      val d = Tables(s, dir).documents
      SketchStore.build(d.filter(col("doc_id") % 3 === 1), storeDir, "a")
      SketchStore.append(d.filter(col("doc_id") % 3 === 2), storeDir, "b")
      SketchStore.append(d.filter(col("doc_id") % 3 === 0), storeDir, "c")
      storeDir
    })

  /** q185's admission store: only the a/b drops — the % 3 = 0 slice is
    * the never-ingested candidate the admission check scores.
    */
  private[graft] def sketchAdmitFixture(s: SparkSession, dir: String): String =
    sigStores.computeIfAbsent((System.identityHashCode(s), dir + "#sketch-adm"), { _ =>
      val storeDir = java.nio.file.Files
        .createTempDirectory("graft-sketchstore-adm").toString
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        import java.nio.file.{Files => F, Paths}
        import scala.jdk.CollectionConverters._
        val p = Paths.get(storeDir)
        if (F.exists(p))
          F.walk(p).iterator().asScala.toSeq.reverseIterator
            .foreach(q => F.deleteIfExists(q))
      }))
      val d = Tables(s, dir).documents
      SketchStore.build(d.filter(col("doc_id") % 3 === 1), storeDir, "a")
      SketchStore.append(d.filter(col("doc_id") % 3 === 2), storeDir, "b")
      storeDir
    })

  private[graft] def sketchUnlearnFixture(s: SparkSession, dir: String): String =
    sigStores.computeIfAbsent((System.identityHashCode(s), dir + "#sketch-td"), { _ =>
      val storeDir = java.nio.file.Files
        .createTempDirectory("graft-sketchstore-td").toString
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        import java.nio.file.{Files => F, Paths}
        import scala.jdk.CollectionConverters._
        val p = Paths.get(storeDir)
        if (F.exists(p))
          F.walk(p).iterator().asScala.toSeq.reverseIterator
            .foreach(q => F.deleteIfExists(q))
      }))
      val d = Tables(s, dir).documents
      SketchStore.build(d.filter(col("doc_id") % 3 === 1), storeDir, "a")
      SketchStore.append(d.filter(col("doc_id") % 3 === 2), storeDir, "b")
      SketchStore.append(d.filter(col("doc_id") % 3 === 0), storeDir, "c")
      SketchStore.append(
        d.withColumn("text",
          concat_ws(" ", concat(lit("zq"), col("doc_id").cast("string")),
            col("text"))),
        storeDir, "x")
      SketchStore.removeDrop(s, storeDir, "x")
      storeDir
    })

  /** q192/q194's frequency-sketch store: the corpus as three drops
    * (a, b, c by doc_id % 3 = 1, 2, 0 — a PARTITION, the sum-merge
    * rule) of ≤ 4096 counter rows each.
    */
  private[graft] def freqStoreFixture(s: SparkSession, dir: String): String =
    sigStores.computeIfAbsent((System.identityHashCode(s), dir + "#freq"), { _ =>
      val storeDir = java.nio.file.Files
        .createTempDirectory("graft-freqstore").toString
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        import java.nio.file.{Files => F, Paths}
        import scala.jdk.CollectionConverters._
        val p = Paths.get(storeDir)
        if (F.exists(p))
          F.walk(p).iterator().asScala.toSeq.reverseIterator
            .foreach(q => F.deleteIfExists(q))
      }))
      val d = Tables(s, dir).documents
      FreqStore.build(d.filter(col("doc_id") % 3 === 1), storeDir, "a")
      FreqStore.append(d.filter(col("doc_id") % 3 === 2), storeDir, "b")
      FreqStore.append(d.filter(col("doc_id") % 3 === 0), storeDir, "c")
      storeDir
    })

  /** q193's unlearn store: drop "c" ingested WITH salted junk docs
    * (novel grams at doc_id + 10M that perturb the served counters),
    * then the junk docs subtracted back out via
    * [[FreqStore.unlearnDocs]] — one scan of the purged docs only.
    * Serve must equal the never-ingested counters bit-for-bit.
    */
  private[graft] def freqUnlearnFixture(s: SparkSession, dir: String): String =
    sigStores.computeIfAbsent((System.identityHashCode(s), dir + "#freq-td"), { _ =>
      val storeDir = java.nio.file.Files
        .createTempDirectory("graft-freqstore-td").toString
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        import java.nio.file.{Files => F, Paths}
        import scala.jdk.CollectionConverters._
        val p = Paths.get(storeDir)
        if (F.exists(p))
          F.walk(p).iterator().asScala.toSeq.reverseIterator
            .foreach(q => F.deleteIfExists(q))
      }))
      val d = Tables(s, dir).documents
      val junk = d.withColumn("doc_id", col("doc_id") + lit(10000000L))
        .withColumn("text",
          concat_ws(" ", concat(lit("zq"), col("doc_id").cast("string")),
            col("text")))
      FreqStore.build(d.filter(col("doc_id") % 3 === 1), storeDir, "a")
      FreqStore.append(d.filter(col("doc_id") % 3 === 2), storeDir, "b")
      FreqStore.append(d.filter(col("doc_id") % 3 === 0).unionByName(junk),
        storeDir, "c")
      FreqStore.unlearnDocs(junk, storeDir, "c")
      storeDir
    })

  /** q196/q198's sample store: the corpus as three drops (a, b, c by
    * doc_id % 3 = 1, 2, 0 — a PARTITION) of ≤ 128 sample rows each.
    */
  private[graft] def sampleStoreFixture(s: SparkSession, dir: String): String =
    sigStores.computeIfAbsent((System.identityHashCode(s), dir + "#kmv"), { _ =>
      val storeDir = java.nio.file.Files
        .createTempDirectory("graft-samplestore").toString
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        import java.nio.file.{Files => F, Paths}
        import scala.jdk.CollectionConverters._
        val p = Paths.get(storeDir)
        if (F.exists(p))
          F.walk(p).iterator().asScala.toSeq.reverseIterator
            .foreach(q => F.deleteIfExists(q))
      }))
      val d = Tables(s, dir).documents
      SampleStore.build(d.filter(col("doc_id") % 3 === 1), storeDir, "a")
      SampleStore.append(d.filter(col("doc_id") % 3 === 2), storeDir, "b")
      SampleStore.append(d.filter(col("doc_id") % 3 === 0), storeDir, "c")
      storeDir
    })

  /** q197's takedown store: a junk drop "x" of salted ids (doc_id +
    * 10M — fresh hashes, some of which crack the served bottom-k)
    * ingested then removed; the re-cut must restore the never-ingested
    * sample exactly.
    */
  private[graft] def sampleUnlearnFixture(s: SparkSession, dir: String): String =
    sigStores.computeIfAbsent((System.identityHashCode(s), dir + "#kmv-td"), { _ =>
      val storeDir = java.nio.file.Files
        .createTempDirectory("graft-samplestore-td").toString
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        import java.nio.file.{Files => F, Paths}
        import scala.jdk.CollectionConverters._
        val p = Paths.get(storeDir)
        if (F.exists(p))
          F.walk(p).iterator().asScala.toSeq.reverseIterator
            .foreach(q => F.deleteIfExists(q))
      }))
      val d = Tables(s, dir).documents
      SampleStore.build(d.filter(col("doc_id") % 3 === 1), storeDir, "a")
      SampleStore.append(d.filter(col("doc_id") % 3 === 2), storeDir, "b")
      SampleStore.append(d.filter(col("doc_id") % 3 === 0), storeDir, "c")
      SampleStore.append(
        d.withColumn("doc_id", col("doc_id") + lit(10000000L)), storeDir, "x")
      SampleStore.removeDrop(s, storeDir, "x")
      storeDir
    })

  /** q200's stratified store: the same three-drop partition, built
    * per-language at k = 16 (q199's cut, persisted).
    */
  private[graft] def sampleStratFixture(s: SparkSession, dir: String): String =
    sigStores.computeIfAbsent((System.identityHashCode(s), dir + "#kmv-st"), { _ =>
      val storeDir = java.nio.file.Files
        .createTempDirectory("graft-samplestore-st").toString
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        import java.nio.file.{Files => F, Paths}
        import scala.jdk.CollectionConverters._
        val p = Paths.get(storeDir)
        if (F.exists(p))
          F.walk(p).iterator().asScala.toSeq.reverseIterator
            .foreach(q => F.deleteIfExists(q))
      }))
      val d = Tables(s, dir).documents
      SampleStore.build(d.filter(col("doc_id") % 3 === 1), storeDir, "a",
        k = 16, stratified = true)
      SampleStore.append(d.filter(col("doc_id") % 3 === 2), storeDir, "b")
      SampleStore.append(d.filter(col("doc_id") % 3 === 0), storeDir, "c")
      storeDir
    })

  /** The sources q141 purges from the signature store — fixed names the
    * oracle mirrors literally (TESTDATA's documents carry src0..src19).
    */
  private[graft] val TakedownSources = Seq("src3", "src7")

  /** q141's store: q106's corpus build (doc_id % 3 != 0) followed by a
    * source-level takedown (`Store.removeDocs` of every stored doc from
    * [[TakedownSources]]). Separate dir from [[storeFixture]] — q106 must
    * keep serving the un-purged store; reuse safe because q141 serves
    * read-only.
    */
  private[graft] def purgedStoreFixture(s: SparkSession, dir: String): String =
    sigStores.computeIfAbsent((System.identityHashCode(s), dir + "#takedown"), { _ =>
      val storeDir = java.nio.file.Files
        .createTempDirectory("graft-sigstore-td").toString
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        import java.nio.file.{Files => F, Paths}
        import scala.jdk.CollectionConverters._
        val p = Paths.get(storeDir)
        if (F.exists(p))
          F.walk(p).iterator().asScala.toSeq.reverseIterator
            .foreach(q => F.deleteIfExists(q))
      }))
      val d = Tables(s, dir).documents
      Store.build(d.filter(col("doc_id") % 3 =!= 0), storeDir)
      Store.removeDocs(s, storeDir,
        d.filter(col("source").isin(TakedownSources: _*))
          .select(col("doc_id")))
      storeDir
    })

  private[graft] def storeFixture(s: SparkSession, dir: String): String =
    sigStores.computeIfAbsent((System.identityHashCode(s), dir), { _ =>
      val storeDir = java.nio.file.Files
        .createTempDirectory("graft-sigstore").toString
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        import java.nio.file.{Files => F, Paths}
        import scala.jdk.CollectionConverters._
        val p = Paths.get(storeDir)
        if (F.exists(p))
          F.walk(p).iterator().asScala.toSeq.reverseIterator
            .foreach(q => F.deleteIfExists(q))
      }))
      Store.build(
        Tables(s, dir).documents.filter(col("doc_id") % 3 =!= 0), storeDir)
      storeDir
    })

  /** q171's signature store: [[storeFixture]]'s corpus FORCE-BUILT at the
    * non-legacy 9×6 shape — the banding the ≥10⁶-doc regime actually runs
    * ([[Store.derivedShape]]), which no gated query exercised before
    * (BandBench measures its cost; this fixture lets the driver hash its
    * correctness). Sharing q106's oracle is sound because the corpus's
    * near-dup mass sits at Jaccard ≥ 0.9, where both S-curves detect with
    * ≥ 0.986 per pair and the exact verify decides the output — the gate
    * pins that the wide-band candidate join, wide-shape signing and
    * marker-driven serve reproduce the brute-force-verified dup set
    * bit-for-bit.
    */
  private[graft] def wideStoreFixture(s: SparkSession, dir: String): String =
    sigStores.computeIfAbsent((System.identityHashCode(s), dir + "#wide"), { _ =>
      val storeDir = java.nio.file.Files
        .createTempDirectory("graft-sigstore-wide").toString
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        import java.nio.file.{Files => F, Paths}
        import scala.jdk.CollectionConverters._
        val p = Paths.get(storeDir)
        if (F.exists(p))
          F.walk(p).iterator().asScala.toSeq.reverseIterator
            .foreach(q => F.deleteIfExists(q))
      }))
      Store.build(
        Tables(s, dir).documents.filter(col("doc_id") % 3 =!= 0), storeDir,
        shape = Some(Store.SigShape(54, 9, 6)))
      storeDir
    })

  /** q206's signature store: [[storeFixture]]'s corpus split, but over
    * the BINARY payload universe — byte 12-shingle signatures of
    * `Binary.withPayload`'s blob column, the `v2 … bytes` marker driving
    * every later serve's prep. The 13th-family leg: incremental
    * container-level near-dup for a media corpus, served without ever
    * re-hashing the stored history.
    */
  private[graft] def binaryStoreFixture(s: SparkSession, dir: String): String =
    sigStores.computeIfAbsent((System.identityHashCode(s), dir + "#bin"), { _ =>
      val storeDir = java.nio.file.Files
        .createTempDirectory("graft-binstore").toString
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        import java.nio.file.{Files => F, Paths}
        import scala.jdk.CollectionConverters._
        val p = Paths.get(storeDir)
        if (F.exists(p))
          F.walk(p).iterator().asScala.toSeq.reverseIterator
            .foreach(q => F.deleteIfExists(q))
      }))
      Store.build(
        graft.multimodal.Binary.withPayload(
          Tables(s, dir).documents.filter(col("doc_id") % 3 =!= 0)),
        storeDir, textCol = "payload",
        universe = Store.Universe.PayloadBytes)
      storeDir
    })

  /** q207's store: [[binaryStoreFixture]]'s corpus with the takedown
    * sources' signatures removed post-build — the q141 replay on the
    * bytes universe, proving `removeDocs` preserves the universe marker
    * (a takedown that silently flipped a bytes store back to text would
    * make every later serve match nothing).
    */
  private[graft] def binaryPurgedStoreFixture(s: SparkSession,
                                              dir: String): String =
    sigStores.computeIfAbsent((System.identityHashCode(s), dir + "#bin-td"), { _ =>
      val storeDir = java.nio.file.Files
        .createTempDirectory("graft-binstore-td").toString
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        import java.nio.file.{Files => F, Paths}
        import scala.jdk.CollectionConverters._
        val p = Paths.get(storeDir)
        if (F.exists(p))
          F.walk(p).iterator().asScala.toSeq.reverseIterator
            .foreach(q => F.deleteIfExists(q))
      }))
      val d = Tables(s, dir).documents
      Store.build(
        graft.multimodal.Binary.withPayload(d.filter(col("doc_id") % 3 =!= 0)),
        storeDir, textCol = "payload",
        universe = Store.Universe.PayloadBytes)
      Store.removeDocs(s, storeDir,
        d.filter(col("source").isin(TakedownSources: _*))
          .select(col("doc_id")))
      storeDir
    })

  /** q210's fingerprint store: byte winnowing fingerprints (k=12, w=8,
    * bytes universe) of the %3≠0 history — the incremental partial-copy
    * detector's persisted state.
    */
  private[graft] def fpStoreFixture(s: SparkSession, dir: String): String =
    sigStores.computeIfAbsent((System.identityHashCode(s), dir + "#fp"), { _ =>
      val storeDir = java.nio.file.Files
        .createTempDirectory("graft-fpstore").toString
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        import java.nio.file.{Files => F, Paths}
        import scala.jdk.CollectionConverters._
        val p = Paths.get(storeDir)
        if (F.exists(p))
          F.walk(p).iterator().asScala.toSeq.reverseIterator
            .foreach(q => F.deleteIfExists(q))
      }))
      FpStore.build(
        graft.multimodal.Binary.withPayload(
          Tables(s, dir).documents.filter(col("doc_id") % 3 =!= 0)),
        storeDir, contentCol = "payload",
        universe = Store.Universe.PayloadBytes)
      storeDir
    })

  /** q212's perceptual-hash store: 56-bit byte simhashes of the %3≠0
    * history (the oracle-checkable `bytes` modality) under the
    * drop-ledgered lifecycle.
    */
  private[graft] def hashStoreFixture(s: SparkSession, dir: String): String =
    sigStores.computeIfAbsent((System.identityHashCode(s), dir + "#hash"), { _ =>
      val storeDir = java.nio.file.Files
        .createTempDirectory("graft-hashstore").toString
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        import java.nio.file.{Files => F, Paths}
        import scala.jdk.CollectionConverters._
        val p = Paths.get(storeDir)
        if (F.exists(p))
          F.walk(p).iterator().asScala.toSeq.reverseIterator
            .foreach(q => F.deleteIfExists(q))
      }))
      graft.multimodal.HashStore.build(
        graft.multimodal.Binary.withPayload(
          Tables(s, dir).documents.filter(col("doc_id") % 3 =!= 0)),
        storeDir, modalities = Seq("bytes"))
      storeDir
    })

  /** q213's store: [[hashStoreFixture]]'s history with the takedown
    * sources' hash rows removed post-build (doc-keyed delete-and-done).
    */
  private[graft] def hashPurgedStoreFixture(s: SparkSession, dir: String): String =
    sigStores.computeIfAbsent((System.identityHashCode(s), dir + "#hash-td"), { _ =>
      val storeDir = java.nio.file.Files
        .createTempDirectory("graft-hashstore-td").toString
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        import java.nio.file.{Files => F, Paths}
        import scala.jdk.CollectionConverters._
        val p = Paths.get(storeDir)
        if (F.exists(p))
          F.walk(p).iterator().asScala.toSeq.reverseIterator
            .foreach(q => F.deleteIfExists(q))
      }))
      val d = Tables(s, dir).documents
      graft.multimodal.HashStore.build(
        graft.multimodal.Binary.withPayload(d.filter(col("doc_id") % 3 =!= 0)),
        storeDir, modalities = Seq("bytes"))
      graft.multimodal.HashStore.removeDocs(s, storeDir,
        d.filter(col("source").isin(TakedownSources: _*))
          .select(col("doc_id")))
      storeDir
    })

  /** q214/q215's probe spans: every %3≠0, %7=1 doc's payload trimmed by
    * exactly one hop (32 bytes) under a shifted probe id — window k of
    * the probe is byte-identical to window k+1 of its source, so a
    * correct retrieval finds the source at Hamming 0 per window.
    */
  private def spanProbes(documents: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    graft.multimodal.Binary.withPayload(
        documents.filter(col("doc_id") % 3 =!= 0 && col("doc_id") % 7 === 1))
      .select((col("doc_id") + lit(1000000L)).as("doc_id"),
        col("payload").substr(lit(33), length(col("payload"))).as("payload"))

  /** q214's perceptual-hash store: the bytes_win RETRIEVAL leg
    * ([[graft.multimodal.Binary.byteWindowHashes]], 64-byte windows at
    * the 50% hop) over the %3≠0 history — the oracle-checkable member
    * of the retrieval family, so the shared retrieveByLeg core gates
    * against a from-scratch SQL replay.
    */
  private[graft] def bwinStoreFixture(s: SparkSession, dir: String): String =
    sigStores.computeIfAbsent((System.identityHashCode(s), dir + "#bwin"), { _ =>
      val storeDir = java.nio.file.Files
        .createTempDirectory("graft-bwinstore").toString
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        import java.nio.file.{Files => F, Paths}
        import scala.jdk.CollectionConverters._
        val p = Paths.get(storeDir)
        if (F.exists(p))
          F.walk(p).iterator().asScala.toSeq.reverseIterator
            .foreach(q => F.deleteIfExists(q))
      }))
      graft.multimodal.HashStore.build(
        graft.multimodal.Binary.withPayload(
          Tables(s, dir).documents.filter(col("doc_id") % 3 =!= 0)),
        storeDir, modalities = Seq("bytes_win"), winBytes = 64)
      storeDir
    })

  /** q215's store: [[bwinStoreFixture]]'s history with the takedown
    * sources' window rows removed post-build (doc-keyed
    * delete-and-done) — a probe span whose source was taken down must
    * stop retrieving it.
    */
  private[graft] def bwinPurgedStoreFixture(s: SparkSession, dir: String): String =
    sigStores.computeIfAbsent((System.identityHashCode(s), dir + "#bwin-td"), { _ =>
      val storeDir = java.nio.file.Files
        .createTempDirectory("graft-bwinstore-td").toString
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        import java.nio.file.{Files => F, Paths}
        import scala.jdk.CollectionConverters._
        val p = Paths.get(storeDir)
        if (F.exists(p))
          F.walk(p).iterator().asScala.toSeq.reverseIterator
            .foreach(q => F.deleteIfExists(q))
      }))
      val d = Tables(s, dir).documents
      graft.multimodal.HashStore.build(
        graft.multimodal.Binary.withPayload(d.filter(col("doc_id") % 3 =!= 0)),
        storeDir, modalities = Seq("bytes_win"), winBytes = 64)
      graft.multimodal.HashStore.removeDocs(s, storeDir,
        d.filter(col("source").isin(TakedownSources: _*))
          .select(col("doc_id")))
      storeDir
    })

  /** q211's store: [[fpStoreFixture]]'s history with the takedown
    * sources' fingerprints removed post-build — delete-and-done (rows
    * are doc-keyed), marker carried through the rewrite.
    */
  private[graft] def fpPurgedStoreFixture(s: SparkSession, dir: String): String =
    sigStores.computeIfAbsent((System.identityHashCode(s), dir + "#fp-td"), { _ =>
      val storeDir = java.nio.file.Files
        .createTempDirectory("graft-fpstore-td").toString
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        import java.nio.file.{Files => F, Paths}
        import scala.jdk.CollectionConverters._
        val p = Paths.get(storeDir)
        if (F.exists(p))
          F.walk(p).iterator().asScala.toSeq.reverseIterator
            .foreach(q => F.deleteIfExists(q))
      }))
      val d = Tables(s, dir).documents
      FpStore.build(
        graft.multimodal.Binary.withPayload(d.filter(col("doc_id") % 3 =!= 0)),
        storeDir, contentCol = "payload",
        universe = Store.Universe.PayloadBytes)
      FpStore.removeDocs(s, storeDir,
        d.filter(col("source").isin(TakedownSources: _*))
          .select(col("doc_id")))
      storeDir
    })

  // ---- DuckDB oracles ------------------------------------------------------

  /** Shared CTE: word-3-gram shingle sets per doc (data contract: ≥3 words,
    * single-space separated — enforced by TESTDATA generator; the Spark side
    * additionally guards short docs).
    */
  // the CASE mirrors TextOps.shingles' <n fallback exactly: a doc with
  // fewer than 3 words contributes ITSELF as its only shingle (so short
  // docs dedup by exact text in BOTH engines — equivalence by
  // construction, not by the generator never emitting short docs)
  /** `docs` CTE (doc_id, source, sh = distinct 3-shingles, whole-text
    * fallback under 3 words) over any source relation — `documents` for
    * the standalone gates, a prior CTE for composed chains (q186).
    */
  private def docsCteFrom(src: String) =
    s"""docs AS (
       |  SELECT doc_id, source,
       |    CASE WHEN len(string_split(text,' ')) >= 3
       |      THEN list_distinct(list_transform(
       |        range(1, len(string_split(text,' '))-1),
       |        i -> array_to_string((string_split(text,' '))[i:i+2], ' ')))
       |      ELSE [text] END AS sh
       |  FROM $src)""".stripMargin

  private val docsCte = docsCteFrom("documents")

  private val sigEntries = (0 until 16)
    .map { i =>
      val g = i / 4
      val off = (i % 4) * 8 + 1
      s"list_min(list_transform(sh, s -> ('0x'||substr(md5('$g:'||s),$off,8))::BIGINT))"
    }
    .mkString(",\n    ")

  private val bandKeys = (0 until 4)
    .map(b => s"md5(sig[${b * 4 + 1}]||'|'||sig[${b * 4 + 2}]||'|'||sig[${b * 4 + 3}]||'|'||sig[${b * 4 + 4}])")
    .mkString(", ")

  /** The q106 incremental-dedup replay over the BINARY universe: the
    * same 4×4-band + exact-Jaccard + smallest-id survivorship chain, but
    * `docs.sh` = hex byte 12-shingles of the payload (q204's prep — the
    * LSH tail is shingle-universe-agnostic in BOTH engines). `obFilter`
    * restricts the stored side (q207 purges the takedown sources);
    * empty-payload docs fall out of `bands` via the same blank guard
    * (their sh is the single empty string) the Spark side applies via
    * the `raw:` sig_key.
    */
  private def binaryIncrDedupOracle(obFilter: String): String =
    s"""WITH bhx AS (SELECT doc_id, source, hex(encode(text)) AS hx
       |  FROM documents),
       |docs AS (SELECT doc_id, source, list_distinct(list_transform(
       |    range(1, greatest(1, len(hx)//2 - 11) + 1),
       |    i -> substr(hx, (i-1)*2+1, 24))) AS sh FROM bhx),
       |sigs AS (SELECT doc_id, sh, [
       |    $sigEntries] AS sig FROM docs),
       |bands AS (SELECT doc_id, unnest([0,1,2,3]) AS band_idx,
       |  unnest([$bandKeys]) AS band_key FROM sigs
       |  WHERE NOT (len(sh) = 1 AND trim(sh[1]) = '')),
       |nb AS (SELECT * FROM bands WHERE doc_id % 3 = 0),
       |ob AS (SELECT b.* FROM bands b JOIN docs sd ON b.doc_id = sd.doc_id
       |  WHERE b.doc_id % 3 <> 0 $obFilter),
       |xc AS (SELECT DISTINCT n.doc_id AS new_id, o.doc_id AS old_id
       |  FROM nb n JOIN ob o
       |  ON n.band_idx = o.band_idx AND n.band_key = o.band_key),
       |xdup AS (SELECT DISTINCT new_id FROM xc
       |  JOIN docs sa ON new_id = sa.doc_id
       |  JOIN docs sb ON old_id = sb.doc_id
       |  WHERE len(list_intersect(sa.sh, sb.sh))*10 >=
       |    (len(sa.sh)+len(sb.sh)-len(list_intersect(sa.sh, sb.sh)))*7),
       |ic AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM nb a JOIN nb b
       |  ON a.band_idx = b.band_idx AND a.band_key = b.band_key
       |  AND a.doc_id < b.doc_id),
       |idup AS (SELECT DISTINCT doc_b AS new_id FROM ic
       |  JOIN docs sa ON doc_a = sa.doc_id
       |  JOIN docs sb ON doc_b = sb.doc_id
       |  WHERE len(list_intersect(sa.sh, sb.sh))*10 >=
       |    (len(sa.sh)+len(sb.sh)-len(list_intersect(sa.sh, sb.sh)))*7)
       |SELECT d.doc_id, d.source FROM docs d
       |WHERE d.doc_id % 3 = 0
       |  AND d.doc_id NOT IN (SELECT new_id FROM xdup)
       |  AND d.doc_id NOT IN (SELECT new_id FROM idup)""".stripMargin

  /** q106's incremental-dedup replay (4×4 banding + exact-Jaccard verify
    * + brute-force survivorship over the % 3 split) — also q171's oracle:
    * the 9×6-shaped serve must land on the same verified dup set.
    */
  private val incrDedupOracle: String =
    s"""WITH $docsCte,
       |sigs AS (SELECT doc_id, sh, [
       |    $sigEntries] AS sig FROM docs),
       |bands AS (SELECT doc_id, unnest([0,1,2,3]) AS band_idx,
       |  unnest([$bandKeys]) AS band_key FROM sigs
       |  WHERE NOT (len(sh) = 1 AND trim(sh[1]) = '')),
       |nb AS (SELECT * FROM bands WHERE doc_id % 3 = 0),
       |ob AS (SELECT * FROM bands WHERE doc_id % 3 <> 0),
       |xc AS (SELECT DISTINCT n.doc_id AS new_id, o.doc_id AS old_id
       |  FROM nb n JOIN ob o
       |  ON n.band_idx = o.band_idx AND n.band_key = o.band_key),
       |xdup AS (SELECT DISTINCT new_id FROM xc
       |  JOIN docs sa ON new_id = sa.doc_id
       |  JOIN docs sb ON old_id = sb.doc_id
       |  WHERE len(list_intersect(sa.sh, sb.sh))*10 >=
       |    (len(sa.sh)+len(sb.sh)-len(list_intersect(sa.sh, sb.sh)))*7),
       |ic AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM nb a JOIN nb b
       |  ON a.band_idx = b.band_idx AND a.band_key = b.band_key
       |  AND a.doc_id < b.doc_id),
       |idup AS (SELECT DISTINCT doc_b AS new_id FROM ic
       |  JOIN docs sa ON doc_a = sa.doc_id
       |  JOIN docs sb ON doc_b = sb.doc_id
       |  WHERE len(list_intersect(sa.sh, sb.sh))*10 >=
       |    (len(sa.sh)+len(sb.sh)-len(list_intersect(sa.sh, sb.sh)))*7)
       |SELECT d.doc_id, d.source FROM docs d
       |WHERE d.doc_id % 3 = 0
       |  AND d.doc_id NOT IN (SELECT new_id FROM xdup)
       |  AND d.doc_id NOT IN (SELECT new_id FROM idup)""".stripMargin

  /** Shared CTE chain computing verified near-dup pairs (mirrors Dedup)
    * over any source relation carrying (doc_id, source, text).
    */
  /** sigs → bands → cand → pairs over a `docs(doc_id, sh)` CTE — the
    * shingle-universe-agnostic LSH+verify tail (mirrors
    * Dedup.verifiedPairsFromPrep): word shingles and q204's hex byte
    * shingles replay through the same SQL.
    */
  private val pairsCteTail =
    s"""sigs AS (SELECT doc_id, sh, [
       |    $sigEntries] AS sig FROM docs),
       |bands AS (SELECT doc_id, unnest([0,1,2,3]) AS band_idx,
       |  unnest([$bandKeys]) AS band_key FROM sigs
       |  WHERE NOT (len(sh) = 1 AND trim(sh[1]) = '')),
       |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM bands a JOIN bands b
       |  ON a.band_idx = b.band_idx AND a.band_key = b.band_key AND a.doc_id < b.doc_id),
       |pairs AS (
       |  SELECT doc_a, doc_b,
       |    CAST(len(list_intersect(sa.sh, sb.sh)) AS INT) AS inter_size,
       |    CAST(len(list_distinct(sa.sh || sb.sh)) AS INT) AS union_size,
       |    CAST(len(sa.sh) AS INT) AS size_a,
       |    CAST(len(sb.sh) AS INT) AS size_b
       |  FROM cand
       |  JOIN docs sa ON doc_a = sa.doc_id
       |  JOIN docs sb ON doc_b = sb.doc_id)""".stripMargin

  /** q189's incremental-spine replay as ONE shared CTE chain — the
    * drop-scoped quartile gate, the signature-store dedup serve replayed
    * from scratch (cross-history + intra-drop), decontamination, DSIR
    * over history ∪ survivors, the k=50 selection and the greedy pack —
    * ending at CTEs `drop0`/`gdrop`/`dd`/`clean`/`sel`/`pg`. q189 takes
    * its manifest face, q205 its per-stage funnel face (the q186/q190
    * sharing pattern applied to the incremental chain).
    */
  private def incrSpineOracleCtes: String =
    s"""drop0 AS (
         |  SELECT * FROM documents WHERE doc_id % 3 = 0),
         |q0 AS (SELECT doc_id, lang,
         |    (CAST(len(list_distinct(string_split(text,' '))) AS BIGINT) * 1000)
         |      // len(string_split(text,' ')) AS score_ppt
         |  FROM drop0),
         |q1 AS (SELECT doc_id,
         |    CAST(row_number() OVER (PARTITION BY lang
         |      ORDER BY score_ppt, doc_id) AS BIGINT) AS rnk,
         |    count(*) OVER (PARTITION BY lang) AS grp_n
         |  FROM q0),
         |gdrop AS (SELECT d.* FROM drop0 d JOIN q1 USING (doc_id)
         |  WHERE q1.rnk * 4 > q1.grp_n),
         |${pairsCtesFrom("documents")},
         |nb AS (SELECT b.* FROM bands b JOIN gdrop USING (doc_id)),
         |ob AS (SELECT * FROM bands WHERE doc_id % 3 <> 0),
         |xc AS (SELECT DISTINCT n.doc_id AS new_id, o.doc_id AS old_id
         |  FROM nb n JOIN ob o
         |  ON n.band_idx = o.band_idx AND n.band_key = o.band_key),
         |xdup AS (SELECT DISTINCT new_id FROM xc
         |  JOIN docs sa ON new_id = sa.doc_id
         |  JOIN docs sb ON old_id = sb.doc_id
         |  WHERE len(list_intersect(sa.sh, sb.sh))*10 >=
         |    (len(sa.sh)+len(sb.sh)-len(list_intersect(sa.sh, sb.sh)))*7),
         |ic AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM nb a JOIN nb b
         |  ON a.band_idx = b.band_idx AND a.band_key = b.band_key
         |  AND a.doc_id < b.doc_id),
         |idup AS (SELECT DISTINCT doc_b AS new_id FROM ic
         |  JOIN docs sa ON doc_a = sa.doc_id
         |  JOIN docs sb ON doc_b = sb.doc_id
         |  WHERE len(list_intersect(sa.sh, sb.sh))*10 >=
         |    (len(sa.sh)+len(sb.sh)-len(list_intersect(sa.sh, sb.sh)))*7),
         |dd AS (SELECT g.* FROM gdrop g
         |  WHERE g.doc_id NOT IN (SELECT new_id FROM xdup)
         |    AND g.doc_id NOT IN (SELECT new_id FROM idup)),
         |bw AS (SELECT DISTINCT g
         |  FROM (VALUES ${EvalSuite.shinglesValuesSql}) AS t(g)),
         |cw AS (SELECT d.doc_id, unnest(d.sh) AS s
         |  FROM docs d JOIN dd USING (doc_id)),
         |bad AS (SELECT DISTINCT cw.doc_id FROM cw JOIN bw ON cw.s = bw.g),
         |clean AS (SELECT dd.* FROM dd LEFT JOIN bad USING (doc_id)
         |  WHERE bad.doc_id IS NULL),
         |tws_t AS (SELECT doc_id, string_split(text,' ') AS ws
         |  FROM documents WHERE doc_id % 19 = 0),
         |fe_t AS (SELECT doc_id, CASE WHEN len(ws) >= 2
         |    THEN list_concat(ws, list_transform(range(1, len(ws)),
         |      i -> array_to_string(ws[i:i+1], ' ')))
         |    ELSE ws END AS feats FROM tws_t),
         |occ_t AS (SELECT doc_id, ('0x'||substr(md5(s),1,8))::BIGINT % 65536 AS f
         |  FROM (SELECT doc_id, unnest(feats) AS s FROM fe_t)),
         |tgt AS (SELECT f, CAST(count(*) AS BIGINT) AS tgt FROM occ_t GROUP BY 1),
         |tws_h AS (SELECT doc_id, string_split(text,' ') AS ws
         |  FROM documents WHERE doc_id % 3 <> 0),
         |fe_h AS (SELECT doc_id, CASE WHEN len(ws) >= 2
         |    THEN list_concat(ws, list_transform(range(1, len(ws)),
         |      i -> array_to_string(ws[i:i+1], ' ')))
         |    ELSE ws END AS feats FROM tws_h),
         |occ_h AS (SELECT doc_id, ('0x'||substr(md5(s),1,8))::BIGINT % 65536 AS f
         |  FROM (SELECT doc_id, unnest(feats) AS s FROM fe_h)),
         |tws_c AS (SELECT doc_id, string_split(text,' ') AS ws FROM clean),
         |fe_c AS (SELECT doc_id, CASE WHEN len(ws) >= 2
         |    THEN list_concat(ws, list_transform(range(1, len(ws)),
         |      i -> array_to_string(ws[i:i+1], ' ')))
         |    ELSE ws END AS feats FROM tws_c),
         |occ_c AS (SELECT doc_id, ('0x'||substr(md5(s),1,8))::BIGINT % 65536 AS f
         |  FROM (SELECT doc_id, unnest(feats) AS s FROM fe_c)),
         |rw AS (SELECT f, CAST(count(*) AS BIGINT) AS raw FROM (
         |  SELECT f FROM occ_h UNION ALL SELECT f FROM occ_c) GROUP BY 1),
         |rt AS (SELECT f, ((coalesce(tgt, 0) + 1) * 1000000) //
         |    (coalesce(raw, 0) + 1) AS r_ppm
         |  FROM tgt FULL JOIN rw USING (f)),
         |sc AS (SELECT occ_c.doc_id, CAST(count(*) AS BIGINT) AS n_feats,
         |    CAST(sum(coalesce(rt.r_ppm, 1000000)) AS BIGINT) AS rsum
         |  FROM occ_c LEFT JOIN rt USING (f) GROUP BY 1),
         |sel AS (SELECT doc_id, score_ppm FROM (
         |  SELECT doc_id, rsum // n_feats AS score_ppm, row_number() OVER (
         |    ORDER BY rsum // n_feats DESC, doc_id ASC) AS rr FROM sc)
         |  WHERE rr <= 50),
         |pt AS (SELECT s.doc_id,
         |    CAST(('0x'||substr(md5('pack:'||CAST(s.doc_id AS VARCHAR)),1,7))::BIGINT
         |      % 8 AS INT) AS shard,
         |    CAST(len(string_split(c.text,' ')) AS BIGINT) AS n
         |  FROM sel s JOIN clean c USING (doc_id)),
         |pr AS (SELECT doc_id, shard, n,
         |  row_number() OVER (PARTITION BY shard ORDER BY doc_id) AS rn FROM pt),
         |pg AS (
         |  SELECT doc_id, shard, n, rn, CAST(0 AS BIGINT) AS seq_id,
         |    CAST(0 AS BIGINT) AS tok_offset
         |  FROM pr WHERE rn = 1
         |  UNION ALL
         |  SELECT pr.doc_id, pr.shard, pr.n, pr.rn,
         |    CASE WHEN pg.tok_offset + pg.n + pr.n > 256
         |      THEN pg.seq_id + 1 ELSE pg.seq_id END,
         |    CASE WHEN pg.tok_offset + pg.n + pr.n > 256 THEN CAST(0 AS BIGINT)
         |         ELSE pg.tok_offset + pg.n END
         |  FROM pg JOIN pr ON pr.shard = pg.shard AND pr.rn = pg.rn + 1)"""
      .stripMargin

  private def pairsCtesFrom(src: String) =
    s"""${docsCteFrom(src)},
       |$pairsCteTail""".stripMargin

  /** q204's docs CTE: hex byte 12-shingles of the payload (= the UTF-8
    * bytes of `text`, Binary.withPayload's synthesis), stride 1 byte,
    * short-payload whole-hex fallback — Binary.byteShingles verbatim.
    */
  private val binaryPairsCtes =
    s"""bhx AS (SELECT doc_id, hex(encode(text)) AS hx FROM documents),
       |docs AS (SELECT doc_id, list_distinct(list_transform(
       |    range(1, greatest(1, len(hx)//2 - 11) + 1),
       |    i -> substr(hx, (i-1)*2+1, 24))) AS sh FROM bhx),
       |$pairsCteTail""".stripMargin

  private val pairsCtes = pairsCtesFrom("documents")

  /** Winnowing CTE chain (mirrors Winnow.fingerprints with k=3, w=4,
    * 1-based positions): `fps` = distinct (doc_id, fp). Shared by the
    * q77 fingerprint dump and the q79 fingerprint-join pairs.
    */
  private val winnowCtes =
    """t AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents
      |  WHERE len(string_split(text, ' ')) >= 6),
      |hs AS (SELECT doc_id, list_transform(
      |    list_transform(range(1, len(ws)-1), i -> array_to_string(ws[i:i+2], ' ')),
      |    s -> ('0x'||substr(md5(s),1,14))::BIGINT) AS hl FROM t),
      |px AS (SELECT doc_id, len(hl) AS n, unnest(hl) AS h,
      |  unnest(range(1, len(hl)+1)) AS pos FROM hs),
      |w AS (SELECT doc_id, pos, n, min(h) OVER (PARTITION BY doc_id ORDER BY pos
      |  ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp FROM px),
      |fps AS (SELECT DISTINCT doc_id, fp FROM w WHERE pos <= n - 3)""".stripMargin

  /** Byte-winnowing CTE chain (mirrors Binary.byteFingerprints with
    * k=12, w=8, 1-based positions; payload = UTF-8 bytes of text per
    * Binary.withPayload): `fps` = distinct (doc_id, fp). Shared by the
    * q208 fingerprint dump and the q209 fingerprint-join pairs — the
    * byte-universe replay of [[winnowCtes]], full windows only
    * (pos ≤ n − (w−1) in 1-based terms ≡ Spark's 0-based pos ≤ n − w).
    */
  private val binaryWinnowCtes =
    """bwx AS (SELECT doc_id, hex(encode(text)) AS hx FROM documents
      |  WHERE len(hex(encode(text))) >= 38),
      |bhs AS (SELECT doc_id, list_transform(
      |    range(1, len(hx)//2 - 11 + 1),
      |    i -> ('0x'||substr(md5(substr(hx, (i-1)*2+1, 24)),1,14))::BIGINT)
      |  AS hl FROM bwx),
      |px AS (SELECT doc_id, len(hl) AS n, unnest(hl) AS h,
      |  unnest(range(1, len(hl)+1)) AS pos FROM bhs),
      |w AS (SELECT doc_id, pos, n, min(h) OVER (PARTITION BY doc_id ORDER BY pos
      |  ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING) AS fp FROM px),
      |fps AS (SELECT DISTINCT doc_id, fp FROM w WHERE pos <= n - 7)""".stripMargin

  /** q210/q211's from-scratch replay of the fingerprint-store serve:
    * byte winnowing fingerprints over the effective universe (drop =
    * %3==0 docs, history = %3≠0 docs minus `histExtra`'s takedown cut),
    * df guard counted over history ∪ drop (the engine's union-side
    * guard), then cross (drop×history) + intra-drop pair legs — the
    * engine's stored side must land exactly where recomputing history
    * from the corpus does.
    */
  private def fpStoreOracle(histExtra: String): String =
    s"""WITH $binaryWinnowCtes,
       |eff AS (SELECT f.doc_id, f.fp FROM fps f JOIN documents d USING (doc_id)
       |  WHERE f.doc_id % 3 = 0 OR (f.doc_id % 3 != 0 $histExtra)),
       |rare AS (SELECT fp FROM eff GROUP BY fp HAVING count(*) <= 8),
       |dp AS (SELECT doc_id, fp FROM eff JOIN rare USING (fp)
       |  WHERE doc_id % 3 = 0),
       |sp AS (SELECT doc_id, fp FROM eff JOIN rare USING (fp)
       |  WHERE doc_id % 3 != 0),
       |xp AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |    CAST(count(*) AS BIGINT) AS n_shared
       |  FROM dp a JOIN sp b ON a.fp = b.fp
       |  GROUP BY 1, 2 HAVING count(*) >= 2),
       |ip AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |    CAST(count(*) AS BIGINT) AS n_shared
       |  FROM dp a JOIN dp b ON a.fp = b.fp AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2 HAVING count(*) >= 2)
       |SELECT * FROM xp UNION ALL SELECT * FROM ip""".stripMargin

  /** The perceptual-hash store's oracle (q212/q213): replays the WHOLE
    * serve from scratch — byte-12-gram 56-bit simhash per doc (the
    * store's oracle-checkable `bytes` modality, mirroring
    * Binary.byteSimHash: hex grams with the short-payload fallback,
    * DISTINCT grams voting once, 14-hex-md5 gram hashes), then pairs by
    * BRUTE-FORCE Hamming ≤ 3 over drop×history and intra-drop — so the
    * gate also proves the store's 4-band pigeonhole recall, not just
    * replays it (q49's oracle mirrors the banding; this one checks it).
    */
  private def hashStoreOracle(histExtra: String): String =
    s"""WITH bx AS (SELECT doc_id, source, hex(encode(text)) AS hx
       |  FROM documents),
       |g AS (SELECT doc_id, source, list_distinct(list_transform(
       |    range(1, greatest(1, len(hx)//2 - 11) + 1),
       |    i -> substr(hx, (i-1)*2+1, 24))) AS gs FROM bx),
       |t AS (SELECT doc_id, source, list_transform(gs,
       |    s -> ('0x'||substr(md5(s),1,14))::BIGINT) AS hs FROM g),
       |sims AS (SELECT doc_id, source,
       |  CAST(${simhashSql(56)} AS BIGINT) AS h FROM t),
       |dp AS (SELECT doc_id, h FROM sims WHERE doc_id % 3 = 0),
       |sp AS (SELECT doc_id, h FROM sims
       |  WHERE doc_id % 3 != 0 $histExtra),
       |xp AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |    'bytes' AS modality, CAST(bit_count(xor(a.h, b.h)) AS INT) AS hamming
       |  FROM dp a JOIN sp b
       |  ON a.doc_id != b.doc_id AND bit_count(xor(a.h, b.h)) <= 3),
       |ip AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |    'bytes' AS modality, CAST(bit_count(xor(a.h, b.h)) AS INT) AS hamming
       |  FROM dp a JOIN dp b
       |  ON a.doc_id < b.doc_id AND bit_count(xor(a.h, b.h)) <= 3)
       |SELECT * FROM xp UNION ALL SELECT * FROM ip""".stripMargin

  /** The span-retrieval oracle (q214/q215): replays the WHOLE bytes_win
    * serve from scratch — 64-byte hex windows at the 32-byte hop
    * (mirroring Binary.byteWindowHashes), per-window DISTINCT byte
    * 12-grams, 14-hex-md5 gram hashes, 56-bit simhash per window, then
    * retrieval by BRUTE-FORCE Hamming ≤ 3 over probe×history windows,
    * counting distinct matched probe win_idx with the minMatched ≥ 2
    * floor — so the gate also proves the banded join's pigeonhole
    * recall AND the distinct-window counting, not just replays them.
    * Probes: %3≠0, %7=1 docs trimmed one hop (substr(hx, 65)) under
    * probe_id = doc_id + 1000000.
    */
  private def spanRetrieveOracle(histExtra: String): String = {
    def winSims(src: String, id: String): String =
      s"""${src}w0 AS (SELECT $id, hx,
         |    unnest(range(0, (len(hx) - 128)//64 + 1)) AS wi
         |  FROM $src WHERE len(hx) >= 128),
         |${src}w AS (SELECT $id, CAST(wi AS INT) AS win_idx,
         |    substr(hx, CAST(wi AS BIGINT)*64 + 1, 128) AS wx FROM ${src}w0),
         |${src}g AS (SELECT $id, win_idx, list_distinct(list_transform(
         |    range(1, len(wx)//2 - 11 + 1),
         |    i -> substr(wx, (i-1)*2+1, 24))) AS gs FROM ${src}w),
         |${src}t AS (SELECT $id, win_idx, list_transform(gs,
         |    s -> ('0x'||substr(md5(s),1,14))::BIGINT) AS hs FROM ${src}g),
         |${src}sim AS (SELECT $id, win_idx,
         |  CAST(${simhashSql(56)} AS BIGINT) AS h FROM ${src}t)""".stripMargin
    s"""WITH bx AS (SELECT doc_id, source, hex(encode(text)) AS hx
       |  FROM documents WHERE doc_id % 3 != 0),
       |hh AS (SELECT doc_id, hx FROM bx WHERE 1=1 $histExtra),
       |${winSims("hh", "doc_id")},
       |pp AS (SELECT doc_id + 1000000 AS probe_id, substr(hx, 65) AS hx
       |  FROM bx WHERE doc_id % 7 = 1),
       |${winSims("pp", "probe_id")},
       |m AS (SELECT p.probe_id, s.doc_id, p.win_idx
       |  FROM ppsim p JOIN hhsim s
       |  ON p.probe_id != s.doc_id AND bit_count(xor(p.h, s.h)) <= 3)
       |SELECT probe_id, doc_id,
       |  CAST(count(DISTINCT win_idx) AS BIGINT) AS n_matched
       |FROM m GROUP BY 1, 2 HAVING count(DISTINCT win_idx) >= 2""".stripMargin
  }

  /** SimHash as a DuckDB expression over a word-hash list column `hs`,
    * one majority-vote CASE term per output bit (mirrors
    * TextOps.simhashFromHashes / the native SimHashBits exactly).
    */
  private def simhashSql(bits: Int): String = (0 until bits).map { j =>
    s"""(CASE WHEN list_sum(list_transform(hs,
       |    h -> CASE WHEN (h >> $j) & 1 = 1 THEN 1 ELSE -1 END)) > 0
       |  THEN ${1L << j} ELSE 0 END)""".stripMargin
  }.mkString(" +\n  ")

  /** q160's CDC replay (k=3, divisor=8): boundary flags from the trailing
    * 3-gram's hash bucket, per-doc running sum for chunk ids, ordered
    * string_agg reassembly — the engine's window/agg pipeline mirrored.
    */
  private def cdcOracle: String =
    s"""WITH d AS (SELECT doc_id, string_split(text,' ') AS ws FROM documents),
       |g0 AS (SELECT doc_id, len(ws) AS n, ws,
       |    unnest(range(1, len(ws)-1)) AS st
       |  FROM d WHERE len(ws) >= 3),
       |fl AS (SELECT doc_id, CAST(st+2 AS INT) AS cut_after
       |  FROM (SELECT doc_id, n, CAST(st AS INT) AS st,
       |      array_to_string(ws[st:st+2],' ') AS g FROM g0)
       |  WHERE st+2 < n
       |    AND ('0x'||substr(md5('cdc:'||g),1,7))::BIGINT % 8 = 0),
       |t0 AS (SELECT doc_id, ws, unnest(range(1, len(ws)+1)) AS pos FROM d),
       |tok AS (SELECT doc_id, CAST(pos AS INT) AS pos, ws[pos] AS w FROM t0),
       |tb AS (SELECT tok.doc_id, tok.pos, tok.w,
       |    CASE WHEN fl.cut_after IS NULL THEN 0 ELSE 1 END AS b
       |  FROM tok LEFT JOIN fl
       |  ON tok.doc_id = fl.doc_id AND tok.pos = fl.cut_after),
       |ci AS (SELECT doc_id, pos, w,
       |    CAST(1 + coalesce(sum(b) OVER (PARTITION BY doc_id ORDER BY pos
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS INT)
       |      AS chunk_idx
       |  FROM tb)
       |SELECT doc_id, chunk_idx, count(*) AS n_words,
       |  md5(string_agg(w, ' ' ORDER BY pos)) AS chunk_key
       |FROM ci GROUP BY doc_id, chunk_idx""".stripMargin

  /** Shared train-side CTEs for q167/q168: Laplace-smoothed unigram class
    * profiles over the % 5 != 0 split, weights in exact integer ppb.
    */
  private val classifierTrainCtes: String =
    """WITH tr AS (SELECT lang AS label, unnest(string_split(text,' ')) AS term
      |  FROM documents WHERE doc_id % 5 != 0),
      |cnt AS (SELECT label, term, CAST(count(*) AS BIGINT) AS cnt
      |  FROM tr GROUP BY 1, 2),
      |tot AS (SELECT label, CAST(sum(cnt) AS BIGINT) AS tot
      |  FROM cnt GROUP BY 1),
      |voc AS (SELECT CAST(count(DISTINCT term) AS BIGINT) AS v FROM cnt),
      |w AS (SELECT label, term, ((cnt + 1) * 1000000000) // (tot + v) AS w_ppb
      |  FROM cnt JOIN tot USING (label) CROSS JOIN voc)""".stripMargin

  /** q168's full held-out inference replay — also q169/q170's oracle:
    * the store-served model must be bit-identical to from-scratch
    * training on the union of drops (count sum-merge), and takedown must
    * restore the never-ingested model exactly, so all three keys gate
    * against this ONE SQL.
    */
  private val classifierPredictOracle: String =
    s"""$classifierTrainCtes,
       |dflt AS (SELECT label, 1000000000 // (tot + v) AS dflt_ppb
       |  FROM tot CROSS JOIN voc),
       |te AS (SELECT doc_id, lang AS true_label,
       |    unnest(string_split(text,' ')) AS term
       |  FROM documents WHERE doc_id % 5 = 0),
       |tf AS (SELECT doc_id, true_label, term,
       |    CAST(count(*) AS BIGINT) AS tf FROM te GROUP BY 1, 2, 3),
       |sc AS (SELECT tf.doc_id, tf.true_label, dflt.label,
       |    CAST(sum(tf.tf * coalesce(w.w_ppb, dflt.dflt_ppb)) AS BIGINT)
       |      AS score_ppb
       |  FROM tf CROSS JOIN dflt
       |  LEFT JOIN w ON w.term = tf.term AND w.label = dflt.label
       |  GROUP BY 1, 2, 3),
       |rk AS (SELECT doc_id, true_label, label AS pred_label, score_ppb,
       |    row_number() OVER (PARTITION BY doc_id
       |      ORDER BY score_ppb DESC, label ASC) AS r FROM sc)
       |SELECT doc_id, true_label, pred_label, score_ppb
       |FROM rk WHERE r = 1""".stripMargin

  /** q164/q165/q166's BM25 replay: rational-idf BM25 (integer-exact, see
    * [[Retrieval]]) with the probe workload selected by `queryWhere` over
    * the postings CTE `p`. The store variants share the builder because
    * store ∪ drop = the full table and takedown ≡ never-ingested; only
    * the probe predicate differs. All division is `//` on non-negative
    * BIGINTs — DuckDB floor ≡ Spark `div` truncation.
    */
  private def bm25Oracle(queryWhere: String): String =
    s"""WITH ${bm25Ctes(queryWhere)}
       |SELECT query_id, doc_id, score_ppt FROM rk WHERE r <= 5""".stripMargin

  /** The BM25 replay chain up to ranked (query_id, doc_id, score_ppt, r)
    * in CTE `rk` — shared by the plain top-5 oracles and q183's hybrid
    * fusion (which reads a deeper cut of the same ranking).
    */
  private def bm25Ctes(queryWhere: String): String =
    s"""w AS (SELECT doc_id, string_split(text,' ') AS ws FROM documents),
       |p0 AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS dl, unnest(ws) AS term
       |  FROM w),
       |p AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf, max(dl) AS dl
       |  FROM p0 GROUP BY 1, 2),
       |f AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM p GROUP BY 1),
       |tot AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n,
       |  CAST(sum(tf) AS BIGINT) AS t FROM p),
       |q0 AS (SELECT p.doc_id AS query_id, p.term, row_number() OVER (
       |    PARTITION BY p.doc_id ORDER BY p.tf DESC, f.df ASC, p.term ASC) AS r
       |  FROM p JOIN f USING (term) WHERE $queryWhere),
       |qt AS (SELECT query_id, term FROM q0 WHERE r <= 8),
       |leg AS (SELECT qt.query_id, p.doc_id,
       |    ((2*(tot.n - f.df) + 1) * 1000) // (2*f.df + 1) AS idf_ppt,
       |    (2200000000 * p.tf) //
       |      (1000000*p.tf + 300000 + 900*((p.dl * tot.n * 1000) // tot.t))
       |      AS tf_ppt
       |  FROM qt JOIN p USING (term) JOIN f USING (term) CROSS JOIN tot),
       |sc AS (SELECT query_id, doc_id,
       |    CAST(sum((idf_ppt * tf_ppt) // 1000) AS BIGINT) AS score_ppt
       |  FROM leg GROUP BY 1, 2),
       |rk AS (SELECT query_id, doc_id, score_ppt, row_number() OVER (
       |    PARTITION BY query_id ORDER BY score_ppt DESC, doc_id ASC) AS r
       |  FROM sc)""".stripMargin

  /** q161's census replay, with `outFilter` restricting which docs'
    * census rows are emitted — chunk df always counts over the FULL
    * table, so the filtered variants replay "union from scratch,
    * restricted to the probe drop" (q162/q163's store-serve contract).
    */
  private def cdcCensusOracle(outFilter: String): String =
    s"""WITH ch AS ($cdcOracle),
       |sh AS (SELECT chunk_key FROM ch GROUP BY chunk_key
       |  HAVING count(DISTINCT doc_id) >= 2)
       |SELECT ch.doc_id, count(*) AS n_chunks,
       |  CAST(sum(ch.n_words) AS BIGINT) AS n_words,
       |  CAST(sum(CASE WHEN sh.chunk_key IS NULL THEN 0 ELSE 1 END)
       |    AS BIGINT) AS n_dup_chunks,
       |  CAST(sum(CASE WHEN sh.chunk_key IS NULL THEN 0 ELSE ch.n_words END)
       |    AS BIGINT) AS dup_words
       |FROM ch LEFT JOIN sh USING (chunk_key)
       |WHERE $outFilter
       |GROUP BY ch.doc_id""".stripMargin

  /** q120's span-detection replay, with `outFilter` restricting which
    * docs' SPANS are emitted — gram df always counts over the FULL table,
    * so the filtered variants replay "from scratch on the union,
    * restricted to the probe drop" (q150/q152's store-serve contract).
    */
  private def spanDetectOracle(outFilter: String): String =
    s"""WITH d AS (SELECT doc_id, string_split(text,' ') AS ws FROM documents
       |  WHERE len(string_split(text,' ')) >= 5),
       |g0 AS (SELECT doc_id, ws, unnest(range(1, len(ws)-3)) AS pos FROM d),
       |g AS (SELECT doc_id, CAST(pos AS INT) AS pos,
       |    substr(md5(array_to_string(ws[pos:pos+4],' ')),1,16) AS gram_key
       |  FROM g0),
       |f AS (SELECT gram_key, count(DISTINCT doc_id) AS gram_df FROM g
       |  GROUP BY 1 HAVING count(DISTINCT doc_id) >= 2),
       |h AS (SELECT g.doc_id, g.pos, f.gram_df FROM g JOIN f USING (gram_key)),
       |m AS (SELECT doc_id, pos, gram_df,
       |    CASE WHEN pos > coalesce(max(pos+4) OVER (PARTITION BY doc_id
       |      ORDER BY pos ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
       |      -1) + 1 THEN 1 ELSE 0 END AS new_span
       |  FROM h),
       |s AS (SELECT doc_id, pos, gram_df,
       |    sum(new_span) OVER (PARTITION BY doc_id ORDER BY pos) AS span_id
       |  FROM m)
       |SELECT doc_id, CAST(min(pos) AS INT) AS span_start,
       |  CAST(max(pos)+4 AS INT) AS span_end,
       |  count(*) AS n_grams, CAST(max(gram_df) AS BIGINT) AS max_df,
       |  CAST(max(pos)+4-min(pos)+1 AS INT) AS span_toks
       |FROM s WHERE $outFilter GROUP BY doc_id, span_id""".stripMargin

  /** q125's span-scrub replay, filtered like [[spanDetectOracle]] —
    * keepers elected over the full table, output docs restricted
    * (q151's store-serve contract).
    */
  private def spanScrubOracle(outFilter: String): String =
    s"""WITH d AS (SELECT doc_id, string_split(text,' ') AS ws FROM documents),
       |de AS (SELECT doc_id, ws FROM d WHERE len(ws) >= 5),
       |g0 AS (SELECT doc_id, ws, unnest(range(1, len(ws)-3)) AS pos FROM de),
       |g AS (SELECT doc_id, CAST(pos AS INT) AS pos,
       |    substr(md5(array_to_string(ws[pos:pos+4],' ')),1,16) AS gram_key
       |  FROM g0),
       |k AS (SELECT gram_key, min(doc_id) AS keeper FROM g
       |  GROUP BY 1 HAVING count(DISTINCT doc_id) >= 2),
       |r AS (SELECT g.doc_id, g.pos FROM g JOIN k USING (gram_key)
       |  WHERE g.doc_id > k.keeper),
       |cov AS (SELECT DISTINCT doc_id, CAST(t AS INT) AS t FROM
       |  (SELECT doc_id, unnest(range(pos, pos+5)) AS t FROM r)),
       |t0 AS (SELECT doc_id, ws, unnest(range(1, len(ws)+1)) AS t FROM d),
       |tok AS (SELECT doc_id, CAST(t AS INT) AS t, ws[t] AS w FROM t0),
       |sc AS (SELECT doc_id,
       |    array_to_string(list(w ORDER BY t), ' ') AS scrubbed_text
       |  FROM tok ANTI JOIN cov USING (doc_id, t) GROUP BY doc_id),
       |nrem AS (SELECT doc_id, count(*) AS n_removed FROM cov GROUP BY 1)
       |SELECT d.doc_id, CAST(len(d.ws) AS INT) AS n_toks,
       |  CAST(coalesce(nrem.n_removed, 0) AS BIGINT) AS n_removed,
       |  coalesce(sc.scrubbed_text, '') AS scrubbed_text
       |FROM d LEFT JOIN nrem USING (doc_id) LEFT JOIN sc USING (doc_id)
       |WHERE $outFilter""".stripMargin

  private val simhashExpr = simhashSql(16)

  private val langScoreSql = TextOps.langProfiles.map { case (lang, vocab) =>
    val set = vocab.map(w => s"'$w'").mkString(", ")
    lang -> s"CAST(len(list_filter(ws, w -> w IN ($set))) AS INT)"
  }

  /** q174/q175's DSIR replay: hashed uni+bigram occurrences (md5 bucket
    * mod 2^16 — the engine-portable `('0x'||hex)::BIGINT` recipe), target
    * (% 19 = 0) and raw profiles, smoothed count-ratio in ppm, per-doc
    * mean score. The store variants (q176/q177) share the builder with a
    * `rawWhere` restricted to the store's drops ∪ probe = the full raw
    * split, and an output filter for the probe drop — the standard
    * serve ≡ from-scratch-on-union contract. All division `//` on
    * non-negative BIGINTs ≡ Spark `div`.
    */
  /** The six-stage spine replay shared by q186 (manifest face) and
    * q190 (funnel face): CTE chain ending at `clean` (the survivors),
    * `sel` (the DSIR pick) and `pg` (the packed layout).
    */
  private def spineOracleCtes: String =
    s"""corpus AS (
         |  SELECT * FROM documents WHERE doc_id % 19 <> 0),
         |q0 AS (SELECT doc_id, lang,
         |    (CAST(len(list_distinct(string_split(text,' '))) AS BIGINT) * 1000)
         |      // len(string_split(text,' ')) AS score_ppt
         |  FROM corpus),
         |q1 AS (SELECT doc_id,
         |    CAST(row_number() OVER (PARTITION BY lang
         |      ORDER BY score_ppt, doc_id) AS BIGINT) AS rnk,
         |    count(*) OVER (PARTITION BY lang) AS grp_n
         |  FROM q0),
         |gated AS (SELECT c.* FROM corpus c JOIN q1 USING (doc_id)
         |  WHERE q1.rnk * 4 > q1.grp_n),
         |${pairsCtesFrom("gated")},
         |losers AS (SELECT DISTINCT doc_b AS doc_id
         |  FROM pairs WHERE inter_size*10 >= union_size*7),
         |dd AS (SELECT g.* FROM gated g LEFT JOIN losers l USING (doc_id)
         |  WHERE l.doc_id IS NULL),
         |bw AS (SELECT DISTINCT g
         |  FROM (VALUES ${EvalSuite.shinglesValuesSql}) AS t(g)),
         |cw AS (SELECT d.doc_id, unnest(d.sh) AS s
         |  FROM docs d JOIN dd USING (doc_id)),
         |bad AS (SELECT DISTINCT cw.doc_id FROM cw JOIN bw ON cw.s = bw.g),
         |clean AS (SELECT dd.* FROM dd LEFT JOIN bad USING (doc_id)
         |  WHERE bad.doc_id IS NULL),
         |tws_t AS (SELECT doc_id, string_split(text,' ') AS ws
         |  FROM documents WHERE doc_id % 19 = 0),
         |fe_t AS (SELECT doc_id, CASE WHEN len(ws) >= 2
         |    THEN list_concat(ws, list_transform(range(1, len(ws)),
         |      i -> array_to_string(ws[i:i+1], ' ')))
         |    ELSE ws END AS feats FROM tws_t),
         |occ_t AS (SELECT doc_id, ('0x'||substr(md5(s),1,8))::BIGINT % 65536 AS f
         |  FROM (SELECT doc_id, unnest(feats) AS s FROM fe_t)),
         |tgt AS (SELECT f, CAST(count(*) AS BIGINT) AS tgt FROM occ_t GROUP BY 1),
         |tws_r AS (SELECT doc_id, string_split(text,' ') AS ws FROM clean),
         |fe_r AS (SELECT doc_id, CASE WHEN len(ws) >= 2
         |    THEN list_concat(ws, list_transform(range(1, len(ws)),
         |      i -> array_to_string(ws[i:i+1], ' ')))
         |    ELSE ws END AS feats FROM tws_r),
         |occ_r AS (SELECT doc_id, ('0x'||substr(md5(s),1,8))::BIGINT % 65536 AS f
         |  FROM (SELECT doc_id, unnest(feats) AS s FROM fe_r)),
         |rw AS (SELECT f, CAST(count(*) AS BIGINT) AS raw FROM occ_r GROUP BY 1),
         |rt AS (SELECT f, ((coalesce(tgt, 0) + 1) * 1000000) //
         |    (coalesce(raw, 0) + 1) AS r_ppm
         |  FROM tgt FULL JOIN rw USING (f)),
         |sc AS (SELECT occ_r.doc_id, CAST(count(*) AS BIGINT) AS n_feats,
         |    CAST(sum(coalesce(rt.r_ppm, 1000000)) AS BIGINT) AS rsum
         |  FROM occ_r LEFT JOIN rt USING (f) GROUP BY 1),
         |sel AS (SELECT doc_id, score_ppm FROM (
         |  SELECT doc_id, rsum // n_feats AS score_ppm, row_number() OVER (
         |    ORDER BY rsum // n_feats DESC, doc_id ASC) AS rr FROM sc)
         |  WHERE rr <= 100),
         |pt AS (SELECT s.doc_id,
         |    CAST(('0x'||substr(md5('pack:'||CAST(s.doc_id AS VARCHAR)),1,7))::BIGINT
         |      % 8 AS INT) AS shard,
         |    CAST(len(string_split(c.text,' ')) AS BIGINT) AS n
         |  FROM sel s JOIN clean c USING (doc_id)),
         |pr AS (SELECT doc_id, shard, n,
         |  row_number() OVER (PARTITION BY shard ORDER BY doc_id) AS rn FROM pt),
         |pg AS (
         |  SELECT doc_id, shard, n, rn, CAST(0 AS BIGINT) AS seq_id,
         |    CAST(0 AS BIGINT) AS tok_offset
         |  FROM pr WHERE rn = 1
         |  UNION ALL
         |  SELECT pr.doc_id, pr.shard, pr.n, pr.rn,
         |    CASE WHEN pg.tok_offset + pg.n + pr.n > 256
         |      THEN pg.seq_id + 1 ELSE pg.seq_id END,
         |    CASE WHEN pg.tok_offset + pg.n + pr.n > 256 THEN CAST(0 AS BIGINT)
         |         ELSE pg.tok_offset + pg.n END
         |  FROM pg JOIN pr ON pr.shard = pg.shard AND pr.rn = pg.rn + 1)""".stripMargin

  private val dsirCtes: String =
    """WITH tws AS (SELECT doc_id, string_split(text,' ') AS ws FROM documents),
      |fe AS (SELECT doc_id, CASE WHEN len(ws) >= 2
      |    THEN list_concat(ws, list_transform(range(1, len(ws)),
      |      i -> array_to_string(ws[i:i+1], ' ')))
      |    ELSE ws END AS feats FROM tws),
      |occ AS (SELECT doc_id, ('0x'||substr(md5(s),1,8))::BIGINT % 65536 AS f
      |  FROM (SELECT doc_id, unnest(feats) AS s FROM fe)),
      |tgt AS (SELECT f, CAST(count(*) AS BIGINT) AS tgt FROM occ
      |  WHERE doc_id % 19 = 0 GROUP BY 1),
      |raw AS (SELECT f, CAST(count(*) AS BIGINT) AS raw FROM occ
      |  WHERE doc_id % 19 != 0 GROUP BY 1),
      |r AS (SELECT f, ((coalesce(tgt, 0) + 1) * 1000000) //
      |    (coalesce(raw, 0) + 1) AS r_ppm
      |  FROM tgt FULL JOIN raw USING (f)),
      |sc AS (SELECT occ.doc_id, CAST(count(*) AS BIGINT) AS n_feats,
      |    CAST(sum(coalesce(r.r_ppm, 1000000)) AS BIGINT) AS rsum
      |  FROM occ LEFT JOIN r USING (f)
      |  WHERE occ.doc_id % 19 != 0 GROUP BY 1),
      |scored AS (SELECT doc_id, n_feats, rsum // n_feats AS score_ppm
      |  FROM sc)""".stripMargin

  /** Shared CTE chain for the distinct-sketch replays, suffix-
    * parameterized so several corpus slices coexist in one statement
    * (q181's prefixes): word-5-gram occurrences → the DistinctSketch
    * register recipe VERBATIM (2-hex-char bucket, bit-granular rho from
    * leading-zero hex count + a first-nonzero-digit CASE, capped at 32;
    * docs under 5 words contribute their whole text — TextOps.shingles'
    * fallback).
    */
  /** q191–q194's Count-Min replay: 3-gram occurrences (TextOps.shingles
    * semantics incl. the short-doc whole-text fallback), the 4×`width`
    * counter table via the depth-tagged md5 slot recipe, the % 97 probe
    * workload's min-over-depths estimates, and the exact audit counts —
    * ending at CTE `audit` (term, est, n_exact, overcount). Width is a
    * parameter exactly as in FreqSketch — q203 replays the same chain
    * at the production width.
    */
  private def cmsCtesW(width: Int): String =
    s"""tws AS (SELECT doc_id, string_split(text,' ') AS ws FROM documents),
      |gl AS (SELECT doc_id, CASE WHEN len(ws) >= 3
      |    THEN list_transform(range(1, len(ws) - 1),
      |      i -> array_to_string(ws[i:i+2], ' '))
      |    ELSE [array_to_string(ws, ' ')] END AS gs FROM tws),
      |g AS (SELECT doc_id, unnest(gs) AS g FROM gl),
      |occ AS (SELECT d.depth,
      |    ('0x'||substr(md5(CAST(d.depth AS VARCHAR)||':'||g),1,8))::BIGINT
      |      % $width AS slot
      |  FROM g CROSS JOIN (VALUES (1),(2),(3),(4)) AS d(depth)),
      |cms AS (SELECT CAST(depth AS BIGINT) AS depth, slot,
      |    CAST(count(*) AS BIGINT) AS cnt
      |  FROM occ GROUP BY 1, 2),
      |probes AS (SELECT DISTINCT g AS term FROM g WHERE doc_id % 97 = 0),
      |pe AS (SELECT term, d.depth,
      |    ('0x'||substr(md5(CAST(d.depth AS VARCHAR)||':'||term),1,8))::BIGINT
      |      % $width AS slot
      |  FROM probes CROSS JOIN (VALUES (1),(2),(3),(4)) AS d(depth)),
      |est AS (SELECT term, CAST(min(coalesce(cnt, 0)) AS BIGINT) AS est
      |  FROM pe LEFT JOIN cms USING (depth, slot) GROUP BY 1),
      |ex AS (SELECT g AS term, CAST(count(*) AS BIGINT) AS n_exact
      |  FROM g GROUP BY 1),
      |audit AS (SELECT e.term, e.est,
      |    CAST(coalesce(x.n_exact, 0) AS BIGINT) AS n_exact,
      |    CAST(e.est - coalesce(x.n_exact, 0) AS BIGINT) AS overcount
      |  FROM est e LEFT JOIN ex x USING (term))""".stripMargin

  private def cmsCtes: String = cmsCtesW(1024)

  /** q195–q198's bottom-k replay: the 60-bit md5-of-id hash order and
    * the ranked cut — ending at CTEs `sm` (hv, doc_id, lang, n_tokens)
    * and `rk` (rank over (hv, doc_id)).
    */
  private def kmvCtes: String =
    """sm AS (SELECT
      |    ('0x'||substr(md5(CAST(doc_id AS VARCHAR)),1,15))::BIGINT AS hv,
      |    doc_id, lang,
      |    CAST(len(string_split(text,' ')) AS BIGINT) AS n_tokens
      |  FROM documents),
      |rk AS (SELECT
      |    CAST(row_number() OVER (ORDER BY hv ASC, doc_id ASC)
      |      AS BIGINT) AS rank,
      |    hv, doc_id, lang, n_tokens FROM sm)""".stripMargin

  /** One drop's Count-Min counter table as suffixed CTEs (ending at
    * `cms$sfx`) — q202's per-drop replay.
    */
  private def cmsDropCte(sfx: String, docFilter: String): String =
    s"""tws$sfx AS (SELECT doc_id, string_split(text,' ') AS ws
       |  FROM documents WHERE $docFilter),
       |gl$sfx AS (SELECT doc_id, CASE WHEN len(ws) >= 3
       |    THEN list_transform(range(1, len(ws) - 1),
       |      i -> array_to_string(ws[i:i+2], ' '))
       |    ELSE [array_to_string(ws, ' ')] END AS gs FROM tws$sfx),
       |g$sfx AS (SELECT unnest(gs) AS g FROM gl$sfx),
       |occ$sfx AS (SELECT d.depth,
       |    ('0x'||substr(md5(CAST(d.depth AS VARCHAR)||':'||g),1,8))::BIGINT
       |      % 1024 AS slot
       |  FROM g$sfx CROSS JOIN (VALUES (1),(2),(3),(4)) AS d(depth)),
       |cms$sfx AS (SELECT CAST(depth AS BIGINT) AS depth, slot,
       |    CAST(count(*) AS BIGINT) AS cnt
       |  FROM occ$sfx GROUP BY 1, 2)""".stripMargin

  /** One drop's estimate + ppm row set for q202 (reads `pe` from
    * [[cmsCtes]] and `cms$sfx` from [[cmsDropCte]]).
    */
  private def cmsDriftRows(sfx: String): String =
    s"""SELECT e.drop_id, e.term, e.est, t.drop_occ,
       |  CAST((e.est * 1000000) // t.drop_occ AS BIGINT) AS est_ppm
       |FROM (SELECT '$sfx' AS drop_id, term,
       |    CAST(min(coalesce(cnt, 0)) AS BIGINT) AS est
       |  FROM pe LEFT JOIN cms$sfx USING (depth, slot) GROUP BY 2) e,
       |  (SELECT CAST(sum(cnt) AS BIGINT) AS drop_occ
       |   FROM cms$sfx WHERE depth = 1) t""".stripMargin

  private def sketchRegsCte(sfx: String, docFilter: String): String =
    s"""gl$sfx AS (SELECT CASE WHEN len(string_split(text,' ')) >= 5
       |    THEN list_transform(range(1, len(string_split(text,' ')) - 3),
       |      i -> array_to_string((string_split(text,' '))[i:i+4], ' '))
       |    ELSE [text] END AS gs
       |  FROM documents WHERE $docFilter),
       |g5$sfx AS (SELECT unnest(gs) AS g FROM gl$sfx),
       |rr$sfx AS (SELECT ('0x'||substr(md5(g),1,2))::BIGINT AS bucket,
       |    least(CASE
       |      WHEN regexp_replace(substr(md5(g),3,13),'^0*','') = '' THEN 32
       |      ELSE 4*(13 - len(regexp_replace(substr(md5(g),3,13),'^0*','')))
       |        + CASE substr(regexp_replace(substr(md5(g),3,13),'^0*',''),1,1)
       |            WHEN '1' THEN 3 WHEN '2' THEN 2 WHEN '3' THEN 2
       |            WHEN '4' THEN 1 WHEN '5' THEN 1 WHEN '6' THEN 1
       |            WHEN '7' THEN 1 ELSE 0 END + 1 END, 32) AS rho
       |  FROM g5$sfx),
       |regs$sfx AS (SELECT bucket, CAST(max(rho) AS BIGINT) AS rho
       |  FROM rr$sfx GROUP BY 1)""".stripMargin

  /** q183/q184's shared replay: BM25 ranking (q164's chain, read at a
    * 10-deep cut) + exact-cosine ranking (q28's recipe, self included) +
    * the RRF fusion, ending at ranked CTE `fr` (query_id, doc_id,
    * lex_rank, vec_rank, rrf_ppb, rank).
    */
  private def hybridCtes: String =
    s"""${bm25Ctes("p.doc_id % 5 = 0 AND p.doc_id < 60")},
       |lexleg AS (SELECT query_id, doc_id, CAST(r AS INT) AS lex_rank
       |  FROM rk WHERE r <= 10),
       |${graft.vector.Queries.quantCte},
       |vp AS (SELECT a.vec_id AS query_id, b.vec_id AS doc_id,
       |    ${graft.vector.Queries.dotExpr} AS dot_q, a.n2 na, b.n2 nb
       |  FROM n a JOIN n b ON a.vec_id % 5 = 0 AND a.vec_id < 60),
       |vr AS (SELECT query_id, doc_id,
       |    CAST(dot_q AS DOUBLE)/sqrt(CAST(na*nb AS DOUBLE)) AS sim
       |  FROM vp),
       |vecleg AS (SELECT query_id, doc_id, CAST(row_number() OVER (
       |    PARTITION BY query_id ORDER BY sim DESC, doc_id ASC) AS INT)
       |    AS vec_rank
       |  FROM vr QUALIFY vec_rank <= 10),
       |$rrfFuseCtes""".stripMargin

  /** The RRF fusion tail shared by q183 and q187: CTEs `lexleg`
    * (query_id, doc_id, lex_rank) and `vecleg` (query_id, doc_id,
    * vec_rank) → ranked CTE `fr`.
    */
  private def rrfFuseCtes: String =
    s"""fused AS (SELECT coalesce(l.query_id, v.query_id) AS query_id,
       |    coalesce(l.doc_id, v.doc_id) AS doc_id,
       |    l.lex_rank, v.vec_rank,
       |    CAST(coalesce(1000000000 // (60 + l.lex_rank), 0) +
       |         coalesce(1000000000 // (60 + v.vec_rank), 0)
       |      AS BIGINT) AS rrf_ppb
       |  FROM lexleg l FULL JOIN vecleg v
       |    ON l.query_id = v.query_id AND l.doc_id = v.doc_id),
       |fr AS (SELECT query_id, doc_id, lex_rank, vec_rank, rrf_ppb,
       |    CAST(row_number() OVER (PARTITION BY query_id
       |      ORDER BY rrf_ppb DESC, doc_id ASC) AS INT) AS rank
       |  FROM fused)""".stripMargin

  /** q187's replay: the SAME BM25 leg and fusion tail as q183, with the
    * vector leg computed EXACT (brute force) over the planted vectors —
    * the Scala side serves that leg from the IVF cells, and the gate
    * holds because the plant makes cell-restricted top-10 ≡ exact
    * top-10 (recall 100% by construction, HybridSpec).
    */
  private def hybridAnnCtes: String =
    s"""${bm25Ctes("p.doc_id % 5 = 0 AND p.doc_id < 60")},
       |lexleg AS (SELECT query_id, doc_id, CAST(r AS INT) AS lex_rank
       |  FROM rk WHERE r <= 10),
       |${graft.vector.Queries.quantCte},
       |pv AS (SELECT vec_id, list_transform(range(1, len(q)+1),
       |    i -> (abs(q[i]) % 997) +
       |      CASE WHEN i - 1 = vec_id % 8 THEN 30000 ELSE 0 END) AS q
       |  FROM n),
       |pn AS (SELECT vec_id, q, CAST(list_sum(list_transform(
       |    range(1, len(q)+1), i -> q[i]*q[i])) AS BIGINT) AS n2 FROM pv),
       |vp AS (SELECT a.vec_id AS query_id, b.vec_id AS doc_id,
       |    ${graft.vector.Queries.dotExpr} AS dot_q, a.n2 na, b.n2 nb
       |  FROM pn a JOIN pn b ON a.vec_id % 5 = 0 AND a.vec_id < 60),
       |vr AS (SELECT query_id, doc_id,
       |    CAST(dot_q AS DOUBLE)/sqrt(CAST(na*nb AS DOUBLE)) AS sim
       |  FROM vp),
       |vecleg AS (SELECT query_id, doc_id, CAST(row_number() OVER (
       |    PARTITION BY query_id ORDER BY sim DESC, doc_id ASC) AS INT)
       |    AS vec_rank
       |  FROM vr QUALIFY vec_rank <= 10),
       |$rrfFuseCtes""".stripMargin

  /** One known-item eval row over self-rank CTE `srcCte` (query_id,
    * srank): found@k count and exact-integer MRR ppb, missing probes
    * contributing 0 through the LEFT JOIN.
    */
  private def retrievalEvalRow(sfx: String, system: String,
                               srcCte: String): String =
    s"""ev$sfx AS (SELECT '$system' AS system,
       |  CAST(count(*) AS BIGINT) AS n_queries,
       |  CAST(count(s.srank) AS BIGINT) AS n_found,
       |  CAST(sum(coalesce(1000000000 // s.srank, 0)) // count(*)
       |    AS BIGINT) AS mrr_ppb
       |  FROM probes p LEFT JOIN $srcCte s USING (query_id))""".stripMargin

  /** The integer-exact HLL estimate over one regs CTE — the
    * DistinctSketch.estimateAgg arithmetic verbatim (α·m²·2^32 with
    * α = 7183/10^4, m = 256: numerator 470745088·2^32 ≈ 2.02·10^18,
    * denominator ≤ 10^4·2^40 — every intermediate in one BIGINT).
    */
  private def sketchEstCte(sfx: String, seen: Int, last: String): String =
    s"""e$sfx AS (SELECT CAST($seen AS BIGINT) AS drops_seen,
       |  '$last' AS last_drop, CAST(count(*) AS BIGINT) AS occupied,
       |  CAST((470745088 * 4294967296) // (10000 *
       |    ((256 - count(*)) * 4294967296 +
       |     sum(1::BIGINT << (32 - rho)))) AS BIGINT) AS est_distinct
       |  FROM regs$sfx)""".stripMargin

  /** One pair-overlap row by inclusion–exclusion over three est CTEs
    * (`v$a`, `v$b`, `v$ab` each holding a single `est` column) — the
    * SketchStore.overlapMatrix arithmetic verbatim.
    */
  private def sketchOverlapRow(a: String, b: String): String =
    s"""SELECT '$a' AS drop_a, '$b' AS drop_b,
       |  v$a.est AS est_a, v$b.est AS est_b, v$a$b.est AS est_union,
       |  CAST(v$a.est + v$b.est - v$a$b.est AS BIGINT) AS overlap_est,
       |  CAST((greatest(v$a.est + v$b.est - v$a$b.est, 0) * 1000000) //
       |    least(v$a.est, v$b.est) AS BIGINT) AS containment_ppm
       |FROM v$a, v$b, v$a$b""".stripMargin

  /** `v$sfx AS (SELECT <integer-exact HLL estimate> AS est FROM regs$sfx)`. */
  private def sketchEstVal(sfx: String): String =
    s"""v$sfx AS (SELECT
       |  CAST((470745088 * 4294967296) // (10000 *
       |    ((256 - count(*)) * 4294967296 +
       |     sum(1::BIGINT << (32 - rho)))) AS BIGINT) AS est
       |  FROM regs$sfx)""".stripMargin

  def oracles: Map[String, String] = Map(
    // q185's candidate is the % 3 = 0 slice against the a/b-only store;
    // the oracle replays drop/store/union registers and the admission
    // arithmetic verbatim.
    "q185_sketch_admission" ->
      s"""WITH ${sketchRegsCte("dr", "doc_id % 3 = 0")},
         |${sketchRegsCte("st", "doc_id % 3 IN (1, 2)")},
         |${sketchRegsCte("un", "TRUE")},
         |${sketchEstVal("dr")},
         |${sketchEstVal("st")},
         |${sketchEstVal("un")}
         |SELECT vdr.est AS est_drop, vst.est AS est_store,
         |  vun.est AS est_union,
         |  CAST(vun.est - vst.est AS BIGINT) AS novelty_est,
         |  CAST((greatest(vdr.est - (vun.est - vst.est), 0) * 1000000) //
         |    vdr.est AS BIGINT) AS containment_ppm
         |FROM vdr, vst, vun""".stripMargin,
    // q182's drops are the q179 store's (a = % 3 = 1, b = % 3 = 2,
    // c = % 3 = 0); each pair union replays the registers over the two
    // slices together.
    "q182_sketch_overlap" ->
      s"""WITH ${sketchRegsCte("a", "doc_id % 3 = 1")},
         |${sketchRegsCte("b", "doc_id % 3 = 2")},
         |${sketchRegsCte("c", "doc_id % 3 = 0")},
         |${sketchRegsCte("ab", "doc_id % 3 IN (1, 2)")},
         |${sketchRegsCte("ac", "doc_id % 3 IN (0, 1)")},
         |${sketchRegsCte("bc", "doc_id % 3 IN (0, 2)")},
         |${sketchEstVal("a")},
         |${sketchEstVal("b")},
         |${sketchEstVal("c")},
         |${sketchEstVal("ab")},
         |${sketchEstVal("ac")},
         |${sketchEstVal("bc")}
         |${sketchOverlapRow("a", "b")}
         |UNION ALL
         |${sketchOverlapRow("a", "c")}
         |UNION ALL
         |${sketchOverlapRow("b", "c")}""".stripMargin,
    // q191 audits the sketch against the full corpus; q194 serves the
    // same estimates from the persisted counters (store drops partition
    // the full table, so serve ≡ from-scratch at the estimate surface)
    // — both replay the one CTE chain.
    "q191_cms_sketch" ->
      s"""WITH $cmsCtes
         |SELECT term, est, n_exact, overcount FROM audit""".stripMargin,
    "q194_cms_serve" ->
      s"""WITH $cmsCtes
         |SELECT term, est, n_exact, overcount FROM audit""".stripMargin,
    // q203 replays the identical chain at the production width — the
    // recipe is width-parametric on both sides
    "q203_cms_wide" ->
      s"""WITH ${cmsCtesW(65536)}
         |SELECT term, est, n_exact, overcount FROM audit""".stripMargin,
    // q192 serves the three-drop store's sum-merged counters — store
    // drops partition the corpus by doc_id % 3, so the oracle replays
    // the counter table from scratch; q193 shares it: doc-granular
    // subtraction unlearn ≡ never-ingested.
    "q192_cms_store" ->
      s"""WITH $cmsCtes
         |SELECT depth, slot, cnt FROM cms""".stripMargin,
    "q193_cms_unlearn" ->
      s"""WITH $cmsCtes
         |SELECT depth, slot, cnt FROM cms""".stripMargin,
    // q195 replays the bottom-128 hash cut; q196 shares it (store drops
    // partition the corpus, the order-statistic merge re-cuts to the
    // from-scratch sample); q197 shares it too (takedown ≡
    // never-ingested by the same subset argument).
    "q195_kmv_sample" ->
      s"""WITH $kmvCtes
         |SELECT rank, hv, doc_id, lang, n_tokens FROM rk
         |WHERE rank <= 128""".stripMargin,
    "q196_sample_store" ->
      s"""WITH $kmvCtes
         |SELECT rank, hv, doc_id, lang, n_tokens FROM rk
         |WHERE rank <= 128""".stripMargin,
    "q197_sample_takedown" ->
      s"""WITH $kmvCtes
         |SELECT rank, hv, doc_id, lang, n_tokens FROM rk
         |WHERE rank <= 128""".stripMargin,
    // q199: the per-language bottom-16 cut (the bounded-heap per-key
    // exec over the KMV hash order); q200 serves the same cut from the
    // stratified store (drops partition the corpus, the merge argument
    // holds within each stratum) — shared oracle.
    "q199_sample_stratified" ->
      s"""WITH $kmvCtes,
         |sr AS (SELECT lang, hv, doc_id, n_tokens,
         |    row_number() OVER (PARTITION BY lang
         |      ORDER BY hv ASC, doc_id ASC) AS rn
         |  FROM sm)
         |SELECT lang, hv, doc_id, n_tokens FROM sr
         |WHERE rn <= 16""".stripMargin,
    "q200_sample_store_strat" ->
      s"""WITH $kmvCtes,
         |sr AS (SELECT lang, hv, doc_id, n_tokens,
         |    row_number() OVER (PARTITION BY lang
         |      ORDER BY hv ASC, doc_id ASC) AS rn
         |  FROM sm)
         |SELECT lang, hv, doc_id, n_tokens FROM sr
         |WHERE rn <= 16""".stripMargin,
    // q202: per-drop estimates for the q191 probe workload (pe comes
    // from the shared cmsCtes; each drop's counters replay suffixed)
    "q202_cms_drift" ->
      s"""WITH $cmsCtes,
         |${cmsDropCte("a", "doc_id % 3 = 1")},
         |${cmsDropCte("b", "doc_id % 3 = 2")},
         |${cmsDropCte("c", "doc_id % 3 = 0")}
         |${cmsDriftRows("a")}
         |UNION ALL
         |${cmsDriftRows("b")}
         |UNION ALL
         |${cmsDriftRows("c")}""".stripMargin,
    // q201: q198's audit per stratum over the same served cut
    "q201_sample_audit_strat" ->
      s"""WITH $kmvCtes,
         |sr AS (SELECT lang, hv, doc_id, n_tokens,
         |    row_number() OVER (PARTITION BY lang
         |      ORDER BY hv ASC, doc_id ASC) AS rn
         |  FROM sm),
         |est AS (SELECT lang, CAST(count(*) AS BIGINT) AS sample_k,
         |    sum(n_tokens) AS st FROM sr WHERE rn <= 16 GROUP BY 1),
         |ex AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
         |    sum(n_tokens) AS ct FROM sm GROUP BY 1)
         |SELECT lang, sample_k, n_docs,
         |  CAST((st * 1000) // sample_k AS BIGINT) AS est_mean_tokens_x1000,
         |  CAST((ct * 1000) // n_docs AS BIGINT) AS exact_mean_tokens_x1000,
         |  CAST((abs((st * 1000) // sample_k - (ct * 1000) // n_docs) * 1000)
         |    // ((ct * 1000) // n_docs) AS BIGINT) AS err_pml
         |FROM est JOIN ex USING (lang)""".stripMargin,
    // q198: the sample-estimated corpus mean vs the exact scan, every
    // column integer-exact (milli-token units, err in per-mille)
    "q198_sample_audit" ->
      s"""WITH $kmvCtes,
         |est AS (SELECT CAST(count(*) AS BIGINT) AS sample_k,
         |    sum(n_tokens) AS st FROM rk WHERE rank <= 128),
         |ex AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
         |    sum(n_tokens) AS ct FROM sm)
         |SELECT sample_k, n_docs,
         |  CAST((st * 1000) // sample_k AS BIGINT) AS est_mean_tokens_x1000,
         |  CAST((ct * 1000) // n_docs AS BIGINT) AS exact_mean_tokens_x1000,
         |  CAST((abs((st * 1000) // sample_k - (ct * 1000) // n_docs) * 1000)
         |    // ((ct * 1000) // n_docs) AS BIGINT) AS err_pml
         |FROM est, ex""".stripMargin,
    "q178_distinct_sketch" ->
      s"""WITH ${sketchRegsCte("", "TRUE")},
         |${sketchEstCte("", 1, "all")},
         |ex AS (SELECT CAST(count(DISTINCT g) AS BIGINT) AS n_exact
         |  FROM g5)
         |SELECT CAST(256 AS BIGINT) AS m, occupied, est_distinct, n_exact,
         |  CAST((abs(est_distinct - n_exact) * 1000) // n_exact
         |    AS BIGINT) AS err_pml
         |FROM e, ex""".stripMargin,
    // q179 serves the three-drop store's max-merged registers — store
    // drops partition the corpus by doc_id % 3, so union = the full
    // table and the oracle replays the registers from scratch; q180
    // shares it: takedown ≡ never-ingested.
    "q179_sketch_store" ->
      s"""WITH ${sketchRegsCte("", "TRUE")}
         |SELECT bucket, rho FROM regs""".stripMargin,
    "q180_sketch_unlearn" ->
      s"""WITH ${sketchRegsCte("", "TRUE")}
         |SELECT bucket, rho FROM regs""".stripMargin,
    // q181's prefixes replay the registers over the cumulative drop
    // slices (a = % 3 = 1, ab = % 3 in (1,2), abc = all).
    "q181_sketch_growth" ->
      s"""WITH ${sketchRegsCte("1", "doc_id % 3 = 1")},
         |${sketchRegsCte("2", "doc_id % 3 IN (1, 2)")},
         |${sketchRegsCte("3", "TRUE")},
         |${sketchEstCte("1", 1, "a")},
         |${sketchEstCte("2", 2, "b")},
         |${sketchEstCte("3", 3, "c")}
         |SELECT drops_seen, last_drop, occupied, est_distinct FROM e1
         |UNION ALL
         |SELECT drops_seen, last_drop, occupied, est_distinct FROM e2
         |UNION ALL
         |SELECT drops_seen, last_drop, occupied, est_distinct FROM e3""".stripMargin,
    "q174_dsir_score" ->
      s"""$dsirCtes
         |SELECT doc_id, n_feats, score_ppm FROM scored""".stripMargin,
    // q188 replays the feature stream keeping the RAW gram alongside its
    // bucket, then counts both universes per corpus side
    "q188_dsir_occupancy" ->
      """WITH tws AS (SELECT doc_id, string_split(text,' ') AS ws FROM documents),
        |fe AS (SELECT doc_id, CASE WHEN len(ws) >= 2
        |    THEN list_concat(ws, list_transform(range(1, len(ws)),
        |      i -> array_to_string(ws[i:i+1], ' ')))
        |    ELSE ws END AS feats FROM tws),
        |oc AS (SELECT doc_id, s, ('0x'||substr(md5(s),1,8))::BIGINT % 65536 AS f
        |  FROM (SELECT doc_id, unnest(feats) AS s FROM fe)),
        |a1 AS (SELECT 'target' AS side, count(*) AS n_occurrences,
        |    count(DISTINCT s) AS n_distinct_grams,
        |    count(DISTINCT f) AS occupied
        |  FROM oc WHERE doc_id % 19 = 0),
        |a2 AS (SELECT 'raw' AS side, count(*) AS n_occurrences,
        |    count(DISTINCT s) AS n_distinct_grams,
        |    count(DISTINCT f) AS occupied
        |  FROM oc WHERE doc_id % 19 <> 0)
        |SELECT side, CAST(n_occurrences AS BIGINT) AS n_occurrences,
        |  CAST(n_distinct_grams AS BIGINT) AS n_distinct_grams,
        |  CAST(occupied AS BIGINT) AS occupied,
        |  CAST(n_distinct_grams - occupied AS BIGINT) AS folded,
        |  CAST(CASE WHEN n_distinct_grams = 0 THEN 0
        |    ELSE ((n_distinct_grams - occupied) * 1000000) // n_distinct_grams
        |    END AS BIGINT) AS fold_ppm
        |FROM (SELECT * FROM a1 UNION ALL SELECT * FROM a2)""".stripMargin,
    "q175_dsir_select" ->
      s"""$dsirCtes,
         |rk AS (SELECT doc_id, n_feats, score_ppm, row_number() OVER (
         |    ORDER BY score_ppm DESC, doc_id ASC) AS r FROM scored)
         |SELECT rk.doc_id, d.lang, rk.n_feats, rk.score_ppm
         |FROM rk JOIN documents d USING (doc_id) WHERE rk.r <= 100""".stripMargin,
    // q176 serves q174's scoring for the % 7 == 1 probe slice from the
    // persisted raw profile (store drops ∪ probe = the full raw split,
    // so the CTE chain is q174's verbatim); q177's post-takedown store
    // (the doubled-raw junk drop removed) must serve exactly the same.
    "q176_dsir_store" ->
      s"""$dsirCtes
         |SELECT doc_id, n_feats, score_ppm FROM scored
         |WHERE doc_id % 7 = 1""".stripMargin,
    "q177_dsir_unlearn" ->
      s"""$dsirCtes
         |SELECT doc_id, n_feats, score_ppm FROM scored
         |WHERE doc_id % 7 = 1""".stripMargin,
    "q120_repeated_spans" -> spanDetectOracle("TRUE"),
    "q160_cdc_chunks" -> cdcOracle,
    "q161_cdc_dedup" -> cdcCensusOracle("TRUE"),
    // q162/q163 serve the probe split (doc_id % 3 = 0) against the
    // persisted chunk-frequency store; the oracle replays the UNION from
    // scratch (chunk df over ALL docs) and restricts the census to the
    // probe. q163 shares q162's oracle: takedown ≡ never-ingested.
    "q162_chunk_store" -> cdcCensusOracle("ch.doc_id % 3 = 0"),
    "q163_chunk_takedown" -> cdcCensusOracle("ch.doc_id % 3 = 0"),
    // q150/q152 serve the probe split (doc_id % 3 = 0) against the
    // persisted gram-df store; the oracle replays the UNION from scratch
    // (df/keepers over ALL docs — store corpus ∪ probe = the full table)
    // and restricts the OUTPUT rows to the probe. q152 shares q150's
    // oracle because takedown must serve exactly as never-ingested.
    "q150_span_store" -> spanDetectOracle("doc_id % 3 = 0"),
    "q152_span_takedown" -> spanDetectOracle("doc_id % 3 = 0"),
    // q167/q168 train the centroid/NB classifier on the % 5 != 0 split
    // and predict the % 5 == 0 split — the oracle replays BOTH halves
    // (same smoothing, same integer ppb, same tie-break).
    "q167_classifier_train" ->
      s"""$classifierTrainCtes
         |SELECT label, term, w_ppb FROM w""".stripMargin,
    // q169/q170 serve q168's held-out inference from the persisted count
    // store: counts SUM across drops, so the store-served model is
    // bit-identical to from-scratch training on the union — and takedown
    // (q170: the phantom-class junk drop removed) must serve exactly as
    // never-ingested. Both share q168's oracle verbatim.
    "q169_classifier_store" -> classifierPredictOracle,
    "q170_classifier_unlearn" -> classifierPredictOracle,
    "q168_classifier_predict" -> classifierPredictOracle,
    // q172 folds q168's confusion feed into per-class precision/recall
    // (exact integer ppm; zero marginals report 0 via CASE)
    "q172_classifier_eval" ->
      s"""WITH pr AS ($classifierPredictOracle),
         |act AS (SELECT true_label AS label, count(*) AS n_true
         |  FROM pr GROUP BY 1),
         |prd AS (SELECT pred_label AS label, count(*) AS n_pred
         |  FROM pr GROUP BY 1),
         |tp AS (SELECT true_label AS label, count(*) AS tp FROM pr
         |  WHERE true_label = pred_label GROUP BY 1)
         |SELECT label,
         |  CAST(coalesce(act.n_true, 0) AS BIGINT) AS n_true,
         |  CAST(coalesce(prd.n_pred, 0) AS BIGINT) AS n_pred,
         |  CAST(coalesce(tp.tp, 0) AS BIGINT) AS tp,
         |  CAST(CASE WHEN coalesce(prd.n_pred, 0) = 0 THEN 0
         |    ELSE (coalesce(tp.tp, 0) * 1000000) // prd.n_pred END
         |    AS BIGINT) AS precision_ppm,
         |  CAST(CASE WHEN coalesce(act.n_true, 0) = 0 THEN 0
         |    ELSE (coalesce(tp.tp, 0) * 1000000) // act.n_true END
         |    AS BIGINT) AS recall_ppm
         |FROM act FULL OUTER JOIN prd USING (label)
         |LEFT JOIN tp USING (label)""".stripMargin,
    // q164 ranks a fixed 12-probe workload over the full corpus; q165/q166
    // serve a 20-probe drop workload (probes all in the % 3 = 0 drop)
    // against the persisted index — store ∪ drop = the full table, and
    // q166 shares q165's oracle: takedown ≡ never-ingested.
    // q183 fuses q164's BM25 ranking (cut at 10) with the exact-cosine
    // vector ranking (q28's recipe, self included) by integer-ppb RRF;
    // the full outer join keeps one-leg docs with the other rank NULL.
    "q183_hybrid_rrf" ->
      s"""WITH $hybridCtes
         |SELECT query_id, doc_id, lex_rank, vec_rank, rrf_ppb, rank
         |FROM fr WHERE rank <= 10""".stripMargin,
    // q187's oracle fuses the SAME BM25 leg with the EXACT vector leg
    // over the planted vectors; the Scala side serves the vector leg
    // from IVF cells — the hash gate IS the leg-agnosticism proof
    // (valid because the plant pins ANN recall@10 to 100%, HybridSpec)
    "q187_hybrid_ann" ->
      s"""WITH $hybridAnnCtes
         |SELECT query_id, doc_id, lex_rank, vec_rank, rrf_ppb, rank
         |FROM fr WHERE rank <= 10""".stripMargin,
    // q189: the daily-drop spine replayed FROM SCRATCH — drop-scoped
    // quality quartiles, then q106's incremental-dedup CTEs (4×4-banded
    // cross vs the % 3 <> 0 history + intra-drop, exact-Jaccard
    // verified) restricted to the gated drop, decontamination, DSIR
    // with raw counts over history ∪ survivors, pack, manifest. The
    // Scala side serves the dedup and DSIR stages from the persisted
    // ledgers, so the hash gate proves serve ≡ from-scratch INSIDE the
    // composition.
    "q189_spine_drop" ->
      s"""WITH RECURSIVE $incrSpineOracleCtes,
         |mrows AS (SELECT pg.doc_id, c.lang, se.score_ppm,
         |    pg.shard AS pack_shard, pg.seq_id, pg.tok_offset,
         |    pg.n AS n_tokens
         |  FROM pg JOIN clean c USING (doc_id) JOIN sel se USING (doc_id)),
         |mf AS (SELECT
         |  CAST(('0x'||substr(md5('manifest:'||CAST(doc_id AS VARCHAR)),1,7))::BIGINT
         |    % 8 AS INT) AS shard,
         |  ('0x'||substr(md5(concat_ws(chr(1),
         |    coalesce(CAST(doc_id AS VARCHAR), chr(2)),
         |    coalesce(lang, chr(2)),
         |    coalesce(CAST(score_ppm AS VARCHAR), chr(2)),
         |    coalesce(CAST(pack_shard AS VARCHAR), chr(2)),
         |    coalesce(CAST(seq_id AS VARCHAR), chr(2)),
         |    coalesce(CAST(tok_offset AS VARCHAR), chr(2)),
         |    coalesce(CAST(n_tokens AS VARCHAR), chr(2)))),1,15))::BIGINT AS fp
         |  FROM mrows)
         |SELECT shard, count(*) AS n_rows, bit_xor(fp) AS xor_fp,
         |  CAST(sum(fp % 1000003) AS BIGINT) AS sum_fp
         |FROM mf GROUP BY shard""".stripMargin,
    // q205: per-stage counts over the SAME incremental chain — the
    // funnel face of q189's certificate (the q186/q190 split applied
    // to the daily drop).
    "q205_drop_funnel" ->
      s"""WITH RECURSIVE $incrSpineOracleCtes,
         |st0 AS (SELECT CAST(0 AS INT) AS stage_idx, 'corpus' AS stage,
         |  count(*) AS n_docs,
         |  CAST(coalesce(sum(len(string_split(text,' '))), 0) AS BIGINT)
         |    AS n_tokens,
         |  CAST(0 AS BIGINT) AS n_seqs FROM drop0),
         |st1 AS (SELECT CAST(1 AS INT), 'gated', count(*),
         |  CAST(coalesce(sum(len(string_split(text,' '))), 0) AS BIGINT),
         |  CAST(0 AS BIGINT) FROM gdrop),
         |st2 AS (SELECT CAST(2 AS INT), 'deduped', count(*),
         |  CAST(coalesce(sum(len(string_split(text,' '))), 0) AS BIGINT),
         |  CAST(0 AS BIGINT) FROM dd),
         |st3 AS (SELECT CAST(3 AS INT), 'clean', count(*),
         |  CAST(coalesce(sum(len(string_split(text,' '))), 0) AS BIGINT),
         |  CAST(0 AS BIGINT) FROM clean),
         |st4 AS (SELECT CAST(4 AS INT), 'selected', count(*),
         |  CAST(coalesce(sum(len(string_split(c.text,' '))), 0) AS BIGINT),
         |  CAST(0 AS BIGINT) FROM clean c JOIN sel USING (doc_id)),
         |st5 AS (SELECT CAST(5 AS INT), 'packed', count(*),
         |  CAST(coalesce(sum(n), 0) AS BIGINT),
         |  (SELECT CAST(count(*) AS BIGINT)
         |   FROM (SELECT DISTINCT shard, seq_id FROM pg)) FROM pg)
         |SELECT * FROM st0 UNION ALL SELECT * FROM st1
         |UNION ALL SELECT * FROM st2 UNION ALL SELECT * FROM st3
         |UNION ALL SELECT * FROM st4 UNION ALL SELECT * FROM st5""".stripMargin,
    // q190: per-stage counts over the SAME shared chain — the funnel
    // face of q186's certificate.
    "q190_spine_funnel" ->
      s"""WITH RECURSIVE $spineOracleCtes,
         |st0 AS (SELECT CAST(0 AS INT) AS stage_idx, 'corpus' AS stage,
         |  count(*) AS n_docs,
         |  CAST(coalesce(sum(len(string_split(text,' '))), 0) AS BIGINT)
         |    AS n_tokens,
         |  CAST(0 AS BIGINT) AS n_seqs FROM corpus),
         |st1 AS (SELECT CAST(1 AS INT), 'gated', count(*),
         |  CAST(coalesce(sum(len(string_split(text,' '))), 0) AS BIGINT),
         |  CAST(0 AS BIGINT) FROM gated),
         |st2 AS (SELECT CAST(2 AS INT), 'deduped', count(*),
         |  CAST(coalesce(sum(len(string_split(text,' '))), 0) AS BIGINT),
         |  CAST(0 AS BIGINT) FROM dd),
         |st3 AS (SELECT CAST(3 AS INT), 'clean', count(*),
         |  CAST(coalesce(sum(len(string_split(text,' '))), 0) AS BIGINT),
         |  CAST(0 AS BIGINT) FROM clean),
         |st4 AS (SELECT CAST(4 AS INT), 'selected', count(*),
         |  CAST(coalesce(sum(len(string_split(c.text,' '))), 0) AS BIGINT),
         |  CAST(0 AS BIGINT) FROM clean c JOIN sel USING (doc_id)),
         |st5 AS (SELECT CAST(5 AS INT), 'packed', count(*),
         |  CAST(coalesce(sum(n), 0) AS BIGINT),
         |  (SELECT CAST(count(*) AS BIGINT)
         |   FROM (SELECT DISTINCT shard, seq_id FROM pg)) FROM pg)
         |SELECT * FROM st0 UNION ALL SELECT * FROM st1
         |UNION ALL SELECT * FROM st2 UNION ALL SELECT * FROM st3
         |UNION ALL SELECT * FROM st4 UNION ALL SELECT * FROM st5""".stripMargin,
    // q186: the six stage oracles (q123 → q26 → q133 → q175 → q66 →
    // q146) composed as ONE CTE chain, each stage reading the previous
    // stage's CTE — the cross-stage contract replayed end to end.
    "q186_curation_spine" ->
      s"""WITH RECURSIVE $spineOracleCtes,
         |mrows AS (SELECT pg.doc_id, c.lang, se.score_ppm,
         |    pg.shard AS pack_shard, pg.seq_id, pg.tok_offset,
         |    pg.n AS n_tokens
         |  FROM pg JOIN clean c USING (doc_id) JOIN sel se USING (doc_id)),
         |mf AS (SELECT
         |  CAST(('0x'||substr(md5('manifest:'||CAST(doc_id AS VARCHAR)),1,7))::BIGINT
         |    % 8 AS INT) AS shard,
         |  ('0x'||substr(md5(concat_ws(chr(1),
         |    coalesce(CAST(doc_id AS VARCHAR), chr(2)),
         |    coalesce(lang, chr(2)),
         |    coalesce(CAST(score_ppm AS VARCHAR), chr(2)),
         |    coalesce(CAST(pack_shard AS VARCHAR), chr(2)),
         |    coalesce(CAST(seq_id AS VARCHAR), chr(2)),
         |    coalesce(CAST(tok_offset AS VARCHAR), chr(2)),
         |    coalesce(CAST(n_tokens AS VARCHAR), chr(2)))),1,15))::BIGINT AS fp
         |  FROM mrows)
         |SELECT shard, count(*) AS n_rows, bit_xor(fp) AS xor_fp,
         |  CAST(sum(fp % 1000003) AS BIGINT) AS sum_fp
         |FROM mf GROUP BY shard""".stripMargin,
    // q184's known-item eval: for each system, the probe's own doc_id
    // looked up in its top-10; MRR in exact integer ppb.
    "q184_retrieval_eval" ->
      s"""WITH $hybridCtes,
         |probes AS (SELECT doc_id AS query_id FROM documents
         |  WHERE doc_id % 5 = 0 AND doc_id < 60),
         |sb AS (SELECT query_id, lex_rank AS srank FROM lexleg
         |  WHERE doc_id = query_id),
         |sv AS (SELECT query_id, vec_rank AS srank FROM vecleg
         |  WHERE doc_id = query_id),
         |sh AS (SELECT query_id, rank AS srank FROM fr
         |  WHERE rank <= 10 AND doc_id = query_id),
         |${retrievalEvalRow("1", "bm25", "sb")},
         |${retrievalEvalRow("2", "vector", "sv")},
         |${retrievalEvalRow("3", "hybrid", "sh")}
         |SELECT * FROM ev1 UNION ALL SELECT * FROM ev2
         |UNION ALL SELECT * FROM ev3""".stripMargin,
    "q164_bm25_topk" -> bm25Oracle("p.doc_id % 5 = 0 AND p.doc_id < 60"),
    // q173 is the MaxScore-pruned traversal of exactly q164's workload —
    // pruning must never change the answer, so the oracle is shared
    "q173_bm25_maxscore" -> bm25Oracle("p.doc_id % 5 = 0 AND p.doc_id < 60"),
    "q165_postings_store" -> bm25Oracle("p.doc_id % 15 = 0 AND p.doc_id < 300"),
    "q166_postings_takedown" -> bm25Oracle("p.doc_id % 15 = 0 AND p.doc_id < 300"),
    "q125_span_scrub" -> spanScrubOracle("TRUE"),
    "q151_span_store_scrub" -> spanScrubOracle("d.doc_id % 3 = 0"),
    "q123_quality_gate" ->
      """WITH d AS (SELECT doc_id, lang,
        |    (CAST(len(list_distinct(string_split(text,' '))) AS BIGINT) * 1000)
        |      // len(string_split(text,' ')) AS score_ppt
        |  FROM documents),
        |r AS (SELECT doc_id, lang, score_ppt,
        |    CAST(row_number() OVER (PARTITION BY lang
        |      ORDER BY score_ppt, doc_id) AS BIGINT) AS rnk,
        |    count(*) OVER (PARTITION BY lang) AS grp_n
        |  FROM d)
        |SELECT doc_id, lang, CAST(score_ppt AS BIGINT) AS score_ppt,
        |  CAST(CASE WHEN rnk*4 > grp_n THEN 1 ELSE 0 END AS INT) AS kept
        |FROM r""".stripMargin,
    "q124_chunk_overlap" ->
      """WITH d AS (SELECT doc_id, string_split(text,' ') AS ws FROM documents
        |  WHERE len(string_split(text,' ')) > 0),
        |c AS (SELECT doc_id, ws,
        |    CASE WHEN len(ws) <= 32 THEN 1
        |         ELSE (len(ws) - 32 + 23) // 24 + 1 END AS nc FROM d),
        |g AS (SELECT doc_id, ws, unnest(range(0, nc)) AS chunk_idx FROM c)
        |SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx,
        |  CAST(chunk_idx*24 + 1 AS INT) AS start_tok,
        |  CAST(least(chunk_idx*24 + 32, len(ws)) AS INT) AS end_tok,
        |  CAST(least(chunk_idx*24 + 32, len(ws)) - chunk_idx*24 AS INT)
        |    AS n_chunk_toks,
        |  array_to_string(ws[chunk_idx*24 + 1 : least(chunk_idx*24 + 32, len(ws))],
        |    ' ') AS chunk_text
        |FROM g""".stripMargin,
    "q20_token_stats" ->
      """SELECT doc_id,
        |  CAST(len(string_split(text,' ')) AS INT) AS n_tokens,
        |  CAST(len(list_distinct(string_split(text,' '))) AS INT) AS n_types,
        |  CAST(len(regexp_extract_all(text, '[a-z]+')) AS INT) AS n_alpha,
        |  CAST(n_chars AS DOUBLE)/len(string_split(text,' ')) AS chars_per_token
        |FROM documents""".stripMargin,
    "q21_lang_id" -> {
      val scores = langScoreSql.map { case (l, e) => s"$e AS score_$l" }.mkString(",\n  ")
      val best = "greatest(" + langScoreSql.map(_._2).mkString(", ") + ")"
      val pred = langScoreSql.map { case (l, e) =>
        s"WHEN $e > 0 AND $e = $best THEN '$l'"
      }.mkString(" ")
      s"""WITH t AS (SELECT doc_id, lang, string_split(text,' ') AS ws FROM documents)
         |SELECT doc_id, lang,
         |  $scores,
         |  CASE $pred ELSE 'und' END AS pred_lang
         |FROM t""".stripMargin
    },
    "q22_quality" ->
      """WITH t AS (SELECT doc_id, n_chars, string_split(text,' ') AS ws FROM documents),
        |m AS (SELECT doc_id,
        |  CAST(len(ws) AS INT) AS n_tokens,
        |  CAST(len(list_distinct(ws)) AS DOUBLE)/len(ws) AS ttr,
        |  CAST(len(list_filter(ws, w -> w IN ('the','a','of','and','to'))) AS DOUBLE)
        |    /len(ws) AS stop_ratio,
        |  CAST(n_chars - (len(ws)-1) AS DOUBLE)/len(ws) AS mean_tok_len
        |  FROM t)
        |SELECT *, CASE WHEN n_tokens BETWEEN 20 AND 90 AND ttr >= 0.25
        |  THEN 1 ELSE 0 END AS quality_ok FROM m""".stripMargin,
    "q23_fingerprint" ->
      s"""WITH $docsCte
         |SELECT d.doc_id, md5(d2.text) AS fp_doc,
         |  list_min(list_transform(d.sh, s -> md5(s))) AS fp_shingle
         |FROM docs d JOIN documents d2 ON d.doc_id = d2.doc_id""".stripMargin,
    "q106_incr_dedup" -> incrDedupOracle,
    // q171 serves the SAME drop against the 9×6-shaped store: candidate
    // recall differs only on sub-verify pairs, so the exact-verified dup
    // set — and therefore the oracle — is q106's (the corpus's dup mass
    // is all at j ≥ 0.9; see wideStoreFixture).
    "q171_incr_dedup_wide" -> incrDedupOracle,
    // q106's replay with the stored side purged of the takedown sources:
    // near-dups that existed only via a purged doc must NOT drop the new
    // doc any more
    "q141_store_takedown" ->
      s"""WITH $docsCte,
         |sigs AS (SELECT doc_id, sh, [
         |    $sigEntries] AS sig FROM docs),
         |bands AS (SELECT doc_id, unnest([0,1,2,3]) AS band_idx,
         |  unnest([$bandKeys]) AS band_key FROM sigs
         |  WHERE NOT (len(sh) = 1 AND trim(sh[1]) = '')),
         |nb AS (SELECT * FROM bands WHERE doc_id % 3 = 0),
         |ob AS (SELECT b.* FROM bands b JOIN docs sd ON b.doc_id = sd.doc_id
         |  WHERE b.doc_id % 3 <> 0
         |  AND sd.source NOT IN (${TakedownSources.map("'" + _ + "'").mkString(",")})),
         |xc AS (SELECT DISTINCT n.doc_id AS new_id, o.doc_id AS old_id
         |  FROM nb n JOIN ob o
         |  ON n.band_idx = o.band_idx AND n.band_key = o.band_key),
         |xdup AS (SELECT DISTINCT new_id FROM xc
         |  JOIN docs sa ON new_id = sa.doc_id
         |  JOIN docs sb ON old_id = sb.doc_id
         |  WHERE len(list_intersect(sa.sh, sb.sh))*10 >=
         |    (len(sa.sh)+len(sb.sh)-len(list_intersect(sa.sh, sb.sh)))*7),
         |ic AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM nb a JOIN nb b
         |  ON a.band_idx = b.band_idx AND a.band_key = b.band_key
         |  AND a.doc_id < b.doc_id),
         |idup AS (SELECT DISTINCT doc_b AS new_id FROM ic
         |  JOIN docs sa ON doc_a = sa.doc_id
         |  JOIN docs sb ON doc_b = sb.doc_id
         |  WHERE len(list_intersect(sa.sh, sb.sh))*10 >=
         |    (len(sa.sh)+len(sb.sh)-len(list_intersect(sa.sh, sb.sh)))*7)
         |SELECT d.doc_id, d.source FROM docs d
         |WHERE d.doc_id % 3 = 0
         |  AND d.doc_id NOT IN (SELECT new_id FROM xdup)
         |  AND d.doc_id NOT IN (SELECT new_id FROM idup)""".stripMargin,
    "q24_minhash_pairs" ->
      s"""WITH $pairsCtes
         |SELECT doc_a, doc_b, inter_size, union_size,
         |  CAST(inter_size AS DOUBLE)/union_size AS jaccard
         |FROM pairs WHERE inter_size*10 >= union_size*7""".stripMargin,
    "q204_binary_neardup" ->
      s"""WITH $binaryPairsCtes
         |SELECT doc_a, doc_b, inter_size, union_size,
         |  CAST(inter_size AS DOUBLE)/union_size AS jaccard
         |FROM pairs WHERE inter_size*10 >= union_size*7""".stripMargin,
    "q206_binary_store" -> binaryIncrDedupOracle(""),
    "q207_binary_takedown" -> binaryIncrDedupOracle(
      s"AND sd.source NOT IN (${TakedownSources.map("'" + _ + "'").mkString(",")})"),
    "q208_binary_winnow" ->
      s"""WITH $binaryWinnowCtes
         |SELECT doc_id, fp FROM fps""".stripMargin,
    "q209_binary_winnow_pairs" ->
      s"""WITH $binaryWinnowCtes,
         |rare AS (SELECT fp FROM fps GROUP BY fp HAVING count(*) <= 8),
         |pruned AS (SELECT f.doc_id, f.fp FROM fps f JOIN rare USING (fp))
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |  CAST(count(*) AS BIGINT) AS n_shared
         |FROM pruned a JOIN pruned b ON a.fp = b.fp AND a.doc_id < b.doc_id
         |GROUP BY 1, 2 HAVING count(*) >= 2""".stripMargin,
    "q210_fp_store" -> fpStoreOracle(""),
    "q211_fp_takedown" -> fpStoreOracle(
      s"AND d.source NOT IN (${TakedownSources.map("'" + _ + "'").mkString(",")})"),
    "q212_hash_store" -> hashStoreOracle(""),
    "q213_hash_takedown" -> hashStoreOracle(
      s"AND source NOT IN (${TakedownSources.map("'" + _ + "'").mkString(",")})"),
    "q214_span_retrieve" -> spanRetrieveOracle(""),
    "q215_span_takedown" -> spanRetrieveOracle(
      s"AND source NOT IN (${TakedownSources.map("'" + _ + "'").mkString(",")})"),
    "q149_source_triage" ->
      s"""WITH $pairsCtes,
         |vp AS (SELECT doc_a, doc_b FROM pairs
         |  WHERE inter_size*10 >= union_size*7),
         |dup AS (SELECT doc_a AS doc_id FROM vp UNION SELECT doc_b FROM vp),
         |w AS (SELECT doc_id, source,
         |  CAST(len(string_split(text, ' ')) AS BIGINT) AS nw FROM documents),
         |agg AS (SELECT source, count(*) AS n_docs,
         |  CAST(sum(CASE WHEN doc_id IN (SELECT doc_id FROM dup)
         |    THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_docs,
         |  sum(nw) AS ws
         |  FROM w GROUP BY source)
         |SELECT source, n_docs, n_dup_docs,
         |  (n_dup_docs * 1000000) // n_docs AS dup_ppm,
         |  CAST(ws // n_docs AS BIGINT) AS mean_words,
         |  ((n_dup_docs * 1000000) // n_docs <= 120000
         |    AND ws // n_docs >= 50) AS passed
         |FROM agg""".stripMargin,
    "q144_split_leakage" ->
      s"""WITH $pairsCtes,
         |sp AS (SELECT doc_id,
         |  CASE WHEN ('0x'||substr(md5('split:'||CAST(doc_id AS VARCHAR)),1,7))::BIGINT
         |         % 1000 < 900 THEN 'train'
         |       WHEN ('0x'||substr(md5('split:'||CAST(doc_id AS VARCHAR)),1,7))::BIGINT
         |         % 1000 < 950 THEN 'val'
         |       ELSE 'test' END AS split
         |  FROM documents)
         |SELECT p.doc_a, p.doc_b, sa.split AS split_a, sb.split AS split_b,
         |  inter_size, union_size
         |FROM pairs p
         |JOIN sp sa ON p.doc_a = sa.doc_id
         |JOIN sp sb ON p.doc_b = sb.doc_id
         |WHERE inter_size*10 >= union_size*7 AND sa.split <> sb.split""".stripMargin,
    "q108_simjoin_exact" ->
      """WITH t0 AS (SELECT doc_id, list_distinct(list_transform(
        |    range(1, len(string_split(text,' '))-1),
        |    i -> array_to_string((string_split(text,' '))[i:i+2], ' '))) AS ts
        |  FROM documents),
        |t AS (SELECT * FROM t0 WHERE len(ts) > 0)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  CAST(len(list_intersect(a.ts, b.ts)) AS INT) AS inter_size,
        |  CAST(len(a.ts)+len(b.ts)-len(list_intersect(a.ts, b.ts)) AS INT)
        |    AS union_size
        |FROM t a JOIN t b ON a.doc_id < b.doc_id
        |WHERE len(list_intersect(a.ts, b.ts))*10 >=
        |  (len(a.ts)+len(b.ts)-len(list_intersect(a.ts, b.ts)))*7""".stripMargin,
    "q114_containment_exact" ->
      """WITH t0 AS (SELECT doc_id, list_distinct(list_transform(
        |    range(1, len(string_split(text,' '))-1),
        |    i -> array_to_string((string_split(text,' '))[i:i+2], ' '))) AS ts
        |  FROM documents),
        |t AS (SELECT * FROM t0 WHERE len(ts) > 0)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  CAST(len(list_intersect(a.ts, b.ts)) AS INT) AS inter_size,
        |  CAST(least(len(a.ts), len(b.ts)) AS INT) AS min_size
        |FROM t a JOIN t b ON a.doc_id < b.doc_id
        |WHERE len(list_intersect(a.ts, b.ts))*10 >=
        |  least(len(a.ts), len(b.ts))*8""".stripMargin,
    "q107_dup_graph" ->
      s"""WITH $pairsCtes,
         |vp AS (SELECT doc_a, doc_b FROM pairs
         |  WHERE inter_size*10 >= union_size*7),
         |e AS (SELECT d1.source AS g, doc_a AS u, doc_b AS v FROM vp
         |  JOIN documents d1 ON doc_a = d1.doc_id
         |  JOIN documents d2 ON doc_b = d2.doc_id
         |  WHERE d1.source = d2.source),
         |nodes AS (SELECT g, count(DISTINCT x) AS n_nodes FROM
         |  (SELECT g, u AS x FROM e UNION ALL SELECT g, v AS x FROM e)
         |  GROUP BY g),
         |ec AS (SELECT g, count(*) AS n_edges FROM e GROUP BY g),
         |tri AS (SELECT e1.g, count(*) AS c FROM e e1
         |  JOIN e e2 ON e1.g = e2.g AND e1.v = e2.u
         |  JOIN e e3 ON e1.g = e3.g AND e1.u = e3.u AND e2.v = e3.v
         |  GROUP BY e1.g)
         |SELECT n.g AS source, n.n_nodes, ec.n_edges,
         |  coalesce(t.c, 0) AS n_triangles
         |FROM nodes n JOIN ec ON n.g = ec.g
         |LEFT JOIN tri t ON n.g = t.g""".stripMargin,
    "q25_simhash" ->
      s"""WITH t AS (SELECT doc_id, list_transform(string_split(text,' '),
         |    w -> ('0x'||substr(md5(w),1,7))::BIGINT) AS hs FROM documents)
         |SELECT doc_id, CAST($simhashExpr AS BIGINT) AS simhash16 FROM t""".stripMargin,
    "q49_simhash_pairs" ->
      s"""WITH t AS (SELECT doc_id, list_transform(string_split(text,' '),
         |    w -> ('0x'||substr(md5(w),1,14))::BIGINT) AS hs FROM documents),
         |sims AS (SELECT doc_id, CAST(${simhashSql(56)} AS BIGINT) AS sh56 FROM t),
         |banded AS (SELECT doc_id, sh56,
         |  unnest([0,1,2,3]) AS band,
         |  unnest([sh56 & 16383, (sh56 >> 14) & 16383, (sh56 >> 28) & 16383,
         |          (sh56 >> 42) & 16383]) AS slice
         |  FROM sims)
         |SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |  CAST(bit_count(xor(a.sh56, b.sh56)) AS INT) AS hamming
         |FROM banded a JOIN banded b
         |  ON a.band = b.band AND a.slice = b.slice AND a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.sh56, b.sh56)) <= 3""".stripMargin,
    "q62_sample_hash" ->
      """SELECT doc_id, lang, source FROM documents
        |WHERE ('0x'||substr(md5(':'||CAST(doc_id AS VARCHAR)),1,7))::BIGINT % 1000
        |  < 100""".stripMargin,
    "q63_mixture" ->
      """SELECT doc_id, lang FROM documents
        |WHERE ('0x'||substr(md5(':'||CAST(doc_id AS VARCHAR)),1,7))::BIGINT % 1000
        |  < CASE lang WHEN 'en' THEN 300 WHEN 'zh' THEN 800 ELSE 500 END""".stripMargin,
    "q90_weighted_sample" ->
      """SELECT doc_id, lang, n_chars FROM documents
        |WHERE ('0x'||substr(md5('w:'||CAST(doc_id AS VARCHAR)),1,7))::BIGINT % 1000
        |  < least(999, n_chars*2)""".stripMargin,
    "q158_temperature_mix" ->
      """WITH c AS (SELECT source, count(*) AS n_docs FROM documents
        |  GROUP BY source),
        |m AS (SELECT min(n_docs) AS n_min FROM c),
        |r AS (SELECT source, n_docs,
        |    least(1000, CAST(floor(1000.0 * sqrt(CAST(n_min AS DOUBLE))
        |      / sqrt(CAST(n_docs AS DOUBLE))) AS BIGINT)) AS rate_pm
        |  FROM c, m),
        |k AS (SELECT d.source, count(*) AS n_kept
        |  FROM documents d JOIN r USING (source)
        |  WHERE ('0x'||substr(md5('temp:'||CAST(doc_id AS VARCHAR)),1,7))::BIGINT
        |    % 1000 < rate_pm
        |  GROUP BY d.source)
        |SELECT r.source, r.n_docs, r.rate_pm,
        |  coalesce(k.n_kept, 0) AS n_kept
        |FROM r LEFT JOIN k USING (source)""".stripMargin,
    "q95_fuzzy_pairs" ->
      """WITH t0 AS (SELECT doc_id,
        |    array_to_string(string_split(text,' ')[1:5], ' ') AS title,
        |    string_split(text,' ')[1] AS blk_w
        |  FROM documents),
        |t1 AS (SELECT doc_id, title, blk_w, length(title)//4 AS blk_len,
        |    row_number() OVER (PARTITION BY blk_w, length(title)//4
        |                       ORDER BY doc_id) AS rn
        |  FROM t0),
        |t AS (SELECT doc_id, title, blk_w, blk_len FROM t1 WHERE rn <= 64)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  CAST(levenshtein(a.title, b.title) AS INT) AS dist
        |FROM t a JOIN t b
        |  ON a.blk_w = b.blk_w AND a.blk_len = b.blk_len
        |  AND a.doc_id < b.doc_id
        |WHERE levenshtein(a.title, b.title) <= 6""".stripMargin,
    "q89_inverted_index" ->
      """WITH w AS (SELECT DISTINCT doc_id,
        |    unnest(string_split(text,' ')) AS term FROM documents),
        |ranked AS (SELECT term, doc_id,
        |  row_number() OVER (PARTITION BY term ORDER BY doc_id) AS rn FROM w)
        |SELECT term, CAST(count(*) AS BIGINT) AS df,
        |  string_agg(CASE WHEN rn <= 10 THEN CAST(doc_id AS VARCHAR) END,
        |             ',' ORDER BY doc_id) AS postings
        |FROM ranked GROUP BY term""".stripMargin,
    "q126_novelty" ->
      s"""WITH $docsCte,
         |g0 AS (SELECT doc_id, unnest(sh) AS s FROM docs),
         |g AS (SELECT doc_id, substr(md5(s),1,16) AS gk FROM g0),
         |f AS (SELECT gk, min(doc_id) AS first_doc FROM g GROUP BY 1)
         |SELECT doc_id, count(*) AS n_grams,
         |  CAST(sum(CASE WHEN doc_id = first_doc THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_novel,
         |  CAST((CAST(sum(CASE WHEN doc_id = first_doc THEN 1 ELSE 0 END)
         |    AS BIGINT) * 1000) // count(*) AS BIGINT) AS novelty_ppt
         |FROM g JOIN f USING (gk) GROUP BY doc_id""".stripMargin,
    // q126's replay over the FULL corpus, restricted to the new drop's
    // rows — exactly what store-served novelty (history ∪ drop) must
    // equal, because min-of-mins ≡ min-over-union
    "q147_novelty_store" ->
      s"""WITH $docsCte,
         |g0 AS (SELECT doc_id, unnest(sh) AS s FROM docs),
         |g AS (SELECT doc_id, substr(md5(s),1,16) AS gk FROM g0),
         |f AS (SELECT gk, min(doc_id) AS first_doc FROM g GROUP BY 1)
         |SELECT doc_id, count(*) AS n_grams,
         |  CAST(sum(CASE WHEN doc_id = first_doc THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_novel,
         |  CAST((CAST(sum(CASE WHEN doc_id = first_doc THEN 1 ELSE 0 END)
         |    AS BIGINT) * 1000) // count(*) AS BIGINT) AS novelty_ppt
         |FROM g JOIN f USING (gk)
         |WHERE doc_id % 3 = 0 GROUP BY doc_id""".stripMargin,
    // q148 removed drop "b" (doc_id % 3 = 2): the oracle replays q126 on
    // the corpus WITHOUT it — grams b solely owned become novel again
    "q148_novelty_takedown" ->
      s"""WITH $docsCte,
         |d2 AS (SELECT * FROM docs WHERE doc_id % 3 <> 2),
         |g0 AS (SELECT doc_id, unnest(sh) AS s FROM d2),
         |g AS (SELECT doc_id, substr(md5(s),1,16) AS gk FROM g0),
         |f AS (SELECT gk, min(doc_id) AS first_doc FROM g GROUP BY 1)
         |SELECT doc_id, count(*) AS n_grams,
         |  CAST(sum(CASE WHEN doc_id = first_doc THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_novel,
         |  CAST((CAST(sum(CASE WHEN doc_id = first_doc THEN 1 ELSE 0 END)
         |    AS BIGINT) * 1000) // count(*) AS BIGINT) AS novelty_ppt
         |FROM g JOIN f USING (gk)
         |WHERE doc_id % 3 = 0 GROUP BY doc_id""".stripMargin,
    "q132_contamination_fixed" ->
      s"""WITH $docsCte,
         |bw AS (SELECT DISTINCT g
         |  FROM (VALUES ${EvalSuite.shinglesValuesSql}) AS t(g)),
         |cw AS (SELECT doc_id, len(sh) AS n_shingles, unnest(sh) AS g FROM docs)
         |SELECT doc_id, CAST(n_shingles AS INT) AS n_shingles,
         |  CAST(sum(CASE WHEN bw.g IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_hits,
         |  CAST(CASE WHEN sum(CASE WHEN bw.g IS NOT NULL THEN 1 ELSE 0 END) > 0
         |    THEN 1 ELSE 0 END AS INT) AS contaminated
         |FROM cw LEFT JOIN bw USING (g) GROUP BY doc_id, n_shingles""".stripMargin,
    "q133_decontaminate_fixed" ->
      s"""WITH $docsCte,
         |bw AS (SELECT DISTINCT g
         |  FROM (VALUES ${EvalSuite.shinglesValuesSql}) AS t(g)),
         |cw AS (SELECT doc_id, unnest(sh) AS s FROM docs),
         |bad AS (SELECT DISTINCT cw.doc_id FROM cw JOIN bw ON cw.s = bw.g)
         |SELECT d.doc_id, d.source FROM docs d
         |LEFT JOIN bad b USING (doc_id) WHERE b.doc_id IS NULL""".stripMargin,
    "q127_contamination" ->
      s"""WITH $docsCte,
         |bw AS (SELECT DISTINCT unnest(sh) AS g FROM docs WHERE doc_id % 19 = 0),
         |cw AS (SELECT doc_id, len(sh) AS n_shingles, unnest(sh) AS g
         |  FROM docs WHERE doc_id % 19 <> 0)
         |SELECT doc_id, CAST(n_shingles AS INT) AS n_shingles,
         |  CAST(sum(CASE WHEN bw.g IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_hits,
         |  CAST(CASE WHEN sum(CASE WHEN bw.g IS NOT NULL THEN 1 ELSE 0 END) > 0
         |    THEN 1 ELSE 0 END AS INT) AS contaminated
         |FROM cw LEFT JOIN bw USING (g) GROUP BY doc_id, n_shingles""".stripMargin,
    "q64_decontaminate" ->
      s"""WITH $docsCte,
         |corpus AS (SELECT * FROM docs WHERE doc_id % 19 <> 0),
         |bench AS (SELECT * FROM docs WHERE doc_id % 19 = 0),
         |cw AS (SELECT doc_id, unnest(sh) AS s FROM corpus),
         |bw AS (SELECT DISTINCT unnest(sh) AS s FROM bench),
         |bad AS (SELECT DISTINCT cw.doc_id FROM cw JOIN bw USING (s))
         |SELECT c.doc_id, c.source FROM corpus c
         |LEFT JOIN bad b USING (doc_id) WHERE b.doc_id IS NULL""".stripMargin,
    "q72_tfidf" ->
      """WITH tok AS (SELECT source, doc_id, unnest(string_split(text, ' ')) AS token
        |  FROM documents),
        |tf AS (SELECT source, token, count(*) AS tf FROM tok GROUP BY 1, 2),
        |dfreq AS (SELECT token, count(DISTINCT doc_id) AS df FROM tok GROUP BY 1),
        |r AS (SELECT tf.source, tf.token, tf.tf, dfreq.df,
        |  CAST(row_number() OVER (PARTITION BY tf.source
        |    ORDER BY CAST(tf.tf AS DOUBLE)/dfreq.df DESC, tf.token ASC) AS INT) AS rk
        |  FROM tf JOIN dfreq USING (token))
        |SELECT source, token, tf, df, rk FROM r WHERE rk <= 3""".stripMargin,
    "q71_stratified_k" ->
      """WITH r AS (SELECT doc_id, lang, row_number() OVER (PARTITION BY lang
        |  ORDER BY md5(':'||CAST(doc_id AS VARCHAR)) ASC, doc_id ASC) AS rk
        |  FROM documents)
        |SELECT doc_id, lang FROM r WHERE rk <= 5""".stripMargin,
    "q65_pack_chunks" ->
      """WITH t AS (SELECT doc_id,
        |  CAST(('0x'||substr(md5('pack:'||CAST(doc_id AS VARCHAR)),1,7))::BIGINT % 8 AS INT)
        |    AS shard,
        |  CAST(len(string_split(text,' ')) AS BIGINT) AS n FROM documents),
        |c AS (SELECT doc_id, shard, n, CAST(sum(n) OVER (PARTITION BY shard
        |  ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS tok_end FROM t)
        |SELECT doc_id, shard, tok_end - n AS tok_start,
        |  (tok_end - n) // 256 AS first_seq,
        |  (tok_end - 1) // 256 AS last_seq FROM c""".stripMargin,
    // Greedy no-split packing replayed as a linear recursion: the working
    // set is one row per shard, each step advances every shard's scan by
    // one doc (rn → rn+1) carrying (seq_id, tok_offset) forward — exactly
    // greedyPack's scan-with-reset. `used > 0` in the Scala reset guard is
    // always true here because n >= 1 forces tok_offset + n >= 1.
    "q66_pack_greedy" ->
      """WITH RECURSIVE t AS (SELECT doc_id,
        |  CAST(('0x'||substr(md5('pack:'||CAST(doc_id AS VARCHAR)),1,7))::BIGINT % 8 AS INT)
        |    AS shard,
        |  CAST(len(string_split(text,' ')) AS BIGINT) AS n FROM documents),
        |r AS (SELECT doc_id, shard, n,
        |  row_number() OVER (PARTITION BY shard ORDER BY doc_id) AS rn FROM t),
        |g AS (
        |  SELECT doc_id, shard, n, rn, CAST(0 AS BIGINT) AS seq_id,
        |    CAST(0 AS BIGINT) AS tok_offset
        |  FROM r WHERE rn = 1
        |  UNION ALL
        |  SELECT r.doc_id, r.shard, r.n, r.rn,
        |    CASE WHEN g.tok_offset + g.n + r.n > 256 THEN g.seq_id + 1 ELSE g.seq_id END,
        |    CASE WHEN g.tok_offset + g.n + r.n > 256 THEN CAST(0 AS BIGINT)
        |         ELSE g.tok_offset + g.n END
        |  FROM g JOIN r ON r.shard = g.shard AND r.rn = g.rn + 1)
        |SELECT doc_id, shard, seq_id, tok_offset FROM g""".stripMargin,
    "q74_dense_id" ->
      """WITH k AS (SELECT 'doc-'||CAST(doc_id AS VARCHAR) AS doc_key FROM documents)
        |SELECT doc_key, CAST(row_number() OVER (
        |  ORDER BY md5('dense:'||doc_key), doc_key) - 1 AS BIGINT) AS dense_id
        |FROM k""".stripMargin,
    "q75_repetition" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |tok AS (SELECT doc_id, unnest(ws) AS w FROM t),
        |wc AS (SELECT doc_id, w, count(*) AS c FROM tok GROUP BY 1, 2),
        |wstats AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_words,
        |  CAST(count(*) AS BIGINT) AS n_distinct, CAST(max(c) AS BIGINT) AS top_word_n
        |  FROM wc GROUP BY 1),
        |bt AS (SELECT doc_id,
        |  unnest(list_transform(range(1, len(ws)), i -> ws[i]||' '||ws[i+1])) AS b FROM t),
        |bc AS (SELECT doc_id, b, count(*) AS c FROM bt GROUP BY 1, 2),
        |bstats AS (SELECT doc_id, CAST(max(c) AS BIGINT) AS top_bigram_n,
        |  CAST(sum(c) AS BIGINT) AS n_bigrams FROM bc GROUP BY 1)
        |SELECT wstats.doc_id, n_words, n_distinct, top_word_n, top_bigram_n,
        |  CAST(top_bigram_n AS DOUBLE)/n_bigrams AS top_bigram_frac
        |FROM wstats JOIN bstats ON wstats.doc_id = bstats.doc_id""".stripMargin,
    "q76_redact" ->
      """WITH p AS (SELECT doc_id,
        |  text||' contact contact-'||CAST(doc_id AS VARCHAR)||'@example.com or'||
        |  ' backup-'||CAST(doc_id AS VARCHAR)||'-admin@mail.example.org now'||
        |  ' call 415-555-'||lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')||
        |  ' from 10.0.'||CAST(doc_id % 256 AS VARCHAR)||'.'||CAST(doc_id % 100 AS VARCHAR)||
        |  ' end' AS text
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(text,
        |    '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS INT) AS n_emails,
        |  CAST(len(regexp_extract_all(text,
        |    '(\+1[ .-]?\(?[0-9]{3}\)?[ .-]?|\([0-9]{3}\)[ .-]?|\b[0-9]{3}[ .-])[0-9]{3}[ .-][0-9]{4}\b')) AS INT) AS n_phones,
        |  CAST(len(regexp_extract_all(text,
        |    '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b')) AS INT) AS n_ips,
        |  md5(regexp_replace(regexp_replace(regexp_replace(text,
        |    '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '<EMAIL>', 'g'),
        |    '(\+1[ .-]?\(?[0-9]{3}\)?[ .-]?|\([0-9]{3}\)[ .-]?|\b[0-9]{3}[ .-])[0-9]{3}[ .-][0-9]{4}\b', '<PHONE>', 'g'),
        |    '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '<IP>', 'g'))
        |    AS redacted_md5
        |FROM p""".stripMargin,
    "q77_winnow" ->
      s"""WITH $winnowCtes
         |SELECT doc_id, fp FROM fps""".stripMargin,
    "q79_winnow_pairs" ->
      s"""WITH $winnowCtes,
         |rare AS (SELECT fp FROM fps GROUP BY fp HAVING count(*) <= 8),
         |pruned AS (SELECT f.doc_id, f.fp FROM fps f JOIN rare USING (fp))
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |  CAST(count(*) AS BIGINT) AS n_shared
         |FROM pruned a JOIN pruned b ON a.fp = b.fp AND a.doc_id < b.doc_id
         |GROUP BY 1, 2 HAVING count(*) >= 2""".stripMargin,
    "q78_containment" ->
      s"""WITH $pairsCtes
         |SELECT doc_a, doc_b, inter_size, size_a, size_b,
         |  CAST(inter_size AS DOUBLE)/least(size_a, size_b) AS containment
         |FROM pairs WHERE inter_size*10 >= least(size_a, size_b)*8""".stripMargin,
    // Segment ids via (position-1) // 3 replay Spark's stride filter; the
    // ORDER BY inside string_agg makes reassembly order explicit.
    "q80_boilerplate" ->
      """WITH words AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS word,
        |         generate_subscripts(string_split(text, ' '), 1) AS gs
        |  FROM documents
        |), segs AS (
        |  SELECT doc_id, (gs-1) // 3 AS seg_id,
        |         string_agg(word, ' ' ORDER BY gs) AS seg
        |  FROM words GROUP BY doc_id, (gs-1) // 3
        |), df AS (
        |  SELECT seg, count(DISTINCT doc_id) AS df FROM segs GROUP BY seg
        |)
        |SELECT s.doc_id,
        |  CAST(count(*) AS INT) AS n_segs,
        |  CAST(coalesce(count(*) FILTER (WHERE d.df < 3), 0) AS INT) AS n_kept,
        |  coalesce(string_agg(s.seg, ' ' ORDER BY s.seg_id)
        |    FILTER (WHERE d.df < 3), '') AS clean_text
        |FROM segs s JOIN df d USING (seg)
        |GROUP BY s.doc_id""".stripMargin
  ) ++ survivorOracle

  /** Connected components to the FIXED POINT, mirroring the engine's
    * converge-until-no-label-changes loop: a recursive reachability CTE
    * (UNION set semantics terminate it), then min over each node's
    * reachable set — the per-component minimum doc id, the same unique
    * fixed point min-label propagation converges to, independent of how
    * many rounds either side happens to run.
    */
  private def clustersOracle: String =
    s"""WITH RECURSIVE $pairsCtes,
       |np AS MATERIALIZED (SELECT doc_a, doc_b FROM pairs
       |  WHERE inter_size*10 >= union_size*7),
       |edges AS MATERIALIZED (SELECT doc_a AS s, doc_b AS d FROM np
       |  UNION ALL SELECT doc_b, doc_a FROM np),
       |reach AS (
       |  SELECT s AS node, s AS label FROM edges
       |  UNION
       |  SELECT e.s, r.label FROM edges e JOIN reach r ON e.d = r.node)
       |SELECT node AS doc_id, min(label) AS cluster_id FROM reach
       |GROUP BY node""".stripMargin

  private def survivorOracle: Map[String, String] = Map(
    "q48_neardup_clusters" -> clustersOracle,
    // q153 computes the identical per-component-min fixed point by a
    // different algorithm; one oracle gates both
    "q153_cc_stars" -> clustersOracle,
    // q159 rolls the same fixed point up to (cluster_size, n_clusters)
    "q159_dup_cluster_sizes" ->
      s"""WITH comp AS ($clustersOracle),
         |sz AS (SELECT cluster_id, count(*) AS cluster_size FROM comp
         |  GROUP BY cluster_id)
         |SELECT cluster_size, count(*) AS n_clusters FROM sz
         |GROUP BY cluster_size""".stripMargin,
    "q26_neardup_keep" ->
      s"""WITH $pairsCtes,
         |losers AS (SELECT DISTINCT doc_b AS doc_id
         |  FROM pairs WHERE inter_size*10 >= union_size*7)
         |SELECT d.source, count(*) AS n_docs,
         |  CAST(sum(CASE WHEN l.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
         |  count(*) - CAST(sum(CASE WHEN l.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
         |FROM documents d LEFT JOIN losers l ON d.doc_id = l.doc_id
         |GROUP BY d.source""".stripMargin,
    "q92_survivor_best" ->
      s"""WITH $pairsCtes,
         |q AS (SELECT doc_id,
         |  CAST(len(list_distinct(string_split(text,' '))) AS BIGINT) AS nv
         |  FROM documents),
         |losers AS (SELECT DISTINCT
         |    CASE WHEN qa.nv < qb.nv THEN doc_a ELSE doc_b END AS doc_id
         |  FROM pairs
         |  JOIN q qa ON doc_a = qa.doc_id
         |  JOIN q qb ON doc_b = qb.doc_id
         |  WHERE inter_size*10 >= union_size*7)
         |SELECT d.doc_id, d.lang, d.source FROM documents d
         |WHERE d.doc_id NOT IN (SELECT doc_id FROM losers)""".stripMargin,
    "q113_bpe_encode" ->
      s"""WITH RECURSIVE ${Bpe.oracleCtes()}
         |SELECT d.doc_id, coalesce(b.n_tokens, 0) AS n_tokens,
         |  coalesce(b.tokens_md5, md5('')) AS tokens_md5
         |FROM documents d LEFT JOIN bpe_doc b ON d.doc_id = b.doc_id""".stripMargin,
    "q157_bpe_fertility" ->
      s"""WITH RECURSIVE ${Bpe.oracleCtes()},
         |dl AS (SELECT doc_id, lang,
         |    CAST(len(string_split(text,' ')) AS BIGINT) AS nw
         |  FROM documents)
         |SELECT dl.lang,
         |  CAST(sum(dl.nw) AS BIGINT) AS n_words,
         |  CAST(sum(coalesce(b.n_tokens, 0)) AS BIGINT) AS n_tokens,
         |  CAST(sum(coalesce(b.n_tokens, 0)) * 1000000 // sum(dl.nw)
         |    AS BIGINT) AS fertility_ppm
         |FROM dl LEFT JOIN bpe_doc b USING (doc_id)
         |GROUP BY dl.lang""".stripMargin,
    // q137 serves the MERGED two-drop count store; counts are additive,
    // so the whole-split replay below is the exact oracle for it too —
    // the gate proves store-served scoring ≡ trained-from-scratch
    "q137_lm_store" ->
      s"""WITH ${Lm.oracleCtes("doc_id % 7 = 0", "doc_id % 7 <> 0")}
         |SELECT h.doc_id, coalesce(sc.n_scored, 0) AS n_scored,
         |  coalesce(sc.score_sum, 0) AS score_sum,
         |  CASE WHEN sc.n_scored IS NULL THEN 0
         |       ELSE sc.score_sum // sc.n_scored END AS score_ppm
         |FROM lm_ho h LEFT JOIN lm_sc sc USING (doc_id)""".stripMargin,
    "q135_lm_score" ->
      s"""WITH ${Lm.oracleCtes("doc_id % 7 = 0", "doc_id % 7 <> 0")}
         |SELECT h.doc_id, coalesce(sc.n_scored, 0) AS n_scored,
         |  coalesce(sc.score_sum, 0) AS score_sum,
         |  CASE WHEN sc.n_scored IS NULL THEN 0
         |       ELSE sc.score_sum // sc.n_scored END AS score_ppm
         |FROM lm_ho h LEFT JOIN lm_sc sc USING (doc_id)""".stripMargin,
    // q139 removed the middle of three drops; partials merge by sum, so
    // the exact oracle is the q135 replay trained on the two SURVIVING
    // drops — post-takedown serve must equal never-ingested
    "q139_lm_takedown" ->
      s"""WITH ${Lm.oracleCtes("doc_id % 7 = 0 AND doc_id % 21 <> 7",
                               "doc_id % 7 <> 0")}
         |SELECT h.doc_id, coalesce(sc.n_scored, 0) AS n_scored,
         |  coalesce(sc.score_sum, 0) AS score_sum,
         |  CASE WHEN sc.n_scored IS NULL THEN 0
         |       ELSE sc.score_sum // sc.n_scored END AS score_ppm
         |FROM lm_ho h LEFT JOIN lm_sc sc USING (doc_id)""".stripMargin,
    "q130_bpe_learned" ->
      s"""WITH RECURSIVE heldout AS (
         |  SELECT * FROM documents WHERE doc_id % 7 <> 0),
         |${Bpe.oracleCtes(oracleLearnedMerges, src = "heldout")}
         |SELECT d.doc_id, coalesce(b.n_tokens, 0) AS n_tokens,
         |  coalesce(b.tokens_md5, md5('')) AS tokens_md5
         |FROM heldout d LEFT JOIN bpe_doc b ON d.doc_id = b.doc_id""".stripMargin,
    "q116_budget_bpe" ->
      s"""WITH RECURSIVE ${Bpe.oracleCtes()},
         |ps AS (SELECT d.source,
         |    CAST(sum(coalesce(b.n_tokens, 0)) AS BIGINT) AS toks
         |  FROM documents d LEFT JOIN bpe_doc b ON d.doc_id = b.doc_id
         |  GROUP BY 1),
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
    // Replays Bpe.idSequences: per-token rows in (word pos, token pos)
    // order via a LATERAL unnest with ordinality, corpus token
    // frequencies, frequency-ranked ids, per-doc ordered id digest.
    // the roundtrip oracle shares NO machinery with the Spark side: it
    // hashes the corpus's space-stripped character stream raw
    "q145_bpe_roundtrip" ->
      """SELECT doc_id, md5(replace(text, ' ', '')) AS decoded_md5
        |FROM documents""".stripMargin,
    "q118_token_ids" ->
      s"""WITH RECURSIVE ${Bpe.oracleCtes()},
         |dt AS (SELECT dw.doc_id, dw.pos AS wpos, t.tok, t.tpos
         |  FROM dw JOIN wtoks ON dw.w = wtoks.w,
         |  LATERAL (SELECT unnest(toks) AS tok,
         |           unnest(range(1, len(toks)+1)) AS tpos) t
         |  WHERE len(toks) > 0),
         |tf AS (SELECT tok, count(*) AS c FROM dt GROUP BY tok),
         |vid AS (SELECT tok,
         |    CAST(row_number() OVER (ORDER BY c DESC, tok ASC) - 1 AS BIGINT) AS id
         |  FROM tf),
         |perdoc AS (SELECT dt.doc_id,
         |    CAST(count(*) AS BIGINT) AS n_tokens,
         |    md5(string_agg(CAST(vid.id AS VARCHAR), ',' ORDER BY dt.wpos, dt.tpos))
         |      AS ids_md5
         |  FROM dt JOIN vid ON dt.tok = vid.tok
         |  GROUP BY dt.doc_id)
         |SELECT d.doc_id, coalesce(p.n_tokens, 0) AS n_tokens,
         |  coalesce(p.ids_md5, md5('')) AS ids_md5
         |FROM documents d LEFT JOIN perdoc p ON d.doc_id = p.doc_id""".stripMargin,
    // q66's linear-recursion greedy-pack replay, with n = BPE token count
    // (bpe_doc) instead of whitespace words; zero-token docs excluded in
    // both engines (see the Spark-side filter).
    "q117_pack_bpe" ->
      s"""WITH RECURSIVE ${Bpe.oracleCtes()},
         |t AS (SELECT d.doc_id,
         |  CAST(('0x'||substr(md5('pack:'||CAST(d.doc_id AS VARCHAR)),1,7))::BIGINT % 8 AS INT)
         |    AS shard,
         |  b.n_tokens AS n
         |  FROM documents d JOIN bpe_doc b ON d.doc_id = b.doc_id
         |  WHERE b.n_tokens >= 1),
         |r2 AS (SELECT doc_id, shard, n,
         |  row_number() OVER (PARTITION BY shard ORDER BY doc_id) AS rn FROM t),
         |g2 AS (
         |  SELECT doc_id, shard, n, rn, CAST(0 AS BIGINT) AS seq_id,
         |    CAST(0 AS BIGINT) AS tok_offset
         |  FROM r2 WHERE rn = 1
         |  UNION ALL
         |  SELECT r2.doc_id, r2.shard, r2.n, r2.rn,
         |    CASE WHEN g2.tok_offset + g2.n + r2.n > 512 THEN g2.seq_id + 1 ELSE g2.seq_id END,
         |    CASE WHEN g2.tok_offset + g2.n + r2.n > 512 THEN CAST(0 AS BIGINT)
         |         ELSE g2.tok_offset + g2.n END
         |  FROM g2 JOIN r2 ON r2.shard = g2.shard AND r2.rn = g2.rn + 1)
         |SELECT doc_id, shard, seq_id, tok_offset FROM g2""".stripMargin
  )
}
