package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.{IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Engine extension point: registers graft's native Catalyst expressions
  * into the session's function registry (usable from both the Column API
  * via `call_function` and plain SQL).
  *
  * Install with `.withExtensions(new GraftExtensions)` (done by
  * `graft.Sessions.local`) or `spark.sql.extensions=graft.functions.GraftExtensions`
  * on spark-submit — the standard SparkSessionExtensions mechanism, so a
  * cluster deployment needs no code changes.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("minhash_signature"),
      new ExpressionInfo(classOf[MinHashSignature].getName, "minhash_signature"),
      (children: Seq[Expression]) => children match {
        case Seq(c, Literal(n: Int, IntegerType)) => MinHashSignature(c, n)
        case _ => throw new IllegalArgumentException(
          "usage: minhash_signature(array<string>, <int literal numHashes>)")
      }))
    ext.injectFunction((
      new FunctionIdentifier("simhash_bits"),
      new ExpressionInfo(classOf[SimHashBits].getName, "simhash_bits"),
      (children: Seq[Expression]) => children match {
        case Seq(c, Literal(n: Int, IntegerType)) => SimHashBits(c, n)
        case _ => throw new IllegalArgumentException(
          "usage: simhash_bits(array<bigint>, <int literal bits>)")
      }))
    ext.injectFunction((
      new FunctionIdentifier("topk_values"),
      new ExpressionInfo(classOf[TopKValues].getName, "topk_values"),
      (children: Seq[Expression]) => children match {
        case Seq(c, Literal(n: Int, IntegerType)) => TopKValues(c, n)
        case _ => throw new IllegalArgumentException(
          "usage: topk_values(<bigint col>, <int literal k>)")
      }))
    ext.injectFunction((
      new FunctionIdentifier("hyperplane_sig"),
      new ExpressionInfo(classOf[HyperplaneSig].getName, "hyperplane_sig"),
      (children: Seq[Expression]) => children match {
        case Seq(c, Literal(b: Int, IntegerType), Literal(d: Int, IntegerType)) =>
          HyperplaneSig(c, b, d)
        case _ => throw new IllegalArgumentException(
          "usage: hyperplane_sig(array<bigint>, <int literal bits>, <int literal dims>)")
      }))
    ext.injectFunction((
      new FunctionIdentifier("bpe_encode"),
      new ExpressionInfo(classOf[BpeEncode].getName, "bpe_encode"),
      (children: Seq[Expression]) => children match {
        case Seq(w, m) => BpeEncode(w, m)
        case _ => throw new IllegalArgumentException(
          "usage: bpe_encode(array<string> words, array<string> literal merges)")
      }))
    ext.injectOptimizerRule(_ => graft.plans.RangeJoinRule)
    ext.injectPlannerStrategy(_ => graft.plans.TopKPerKeyStrategy)

    // ---- SQL table functions: the operator library driveable from pure
    // SQL, the engine-native analog of the reference's properties-file
    // "queries" (MiscUtils.loadConfigFile — a config line names a stage
    // over a named input; here a TVF names an operator over a catalog
    // table). The builder runs at ANALYSIS time on the driver with the
    // active session set, so `SparkSession.active.table(...)` resolves the
    // input through the normal catalog and the operator's DataFrame plan
    // splices into the outer query as one Catalyst plan. Analysis must
    // stay JOB-FREE — an EXPLAIN or LIMIT 0 probe must not run the
    // pipeline — so the dedup operators are invoked with eager=false
    // (lazy cache() branch-sharing instead of an eager checkpoint).
    //
    // Cache retention contract (deliberate): the eager=false cache()
    // entries live in the session CacheManager for the SESSION lifetime —
    // there is no post-execution hook a TVF could unpersist from. This is
    // session-scoped memoization: entries are keyed by the analyzed plan,
    // so repeated SQL queries over the SAME table reuse one entry (the
    // second graft_near_dup_pairs('docs') pays nothing for prep), and the
    // footprint is bounded by the number of DISTINCT (operator, table,
    // args) combinations queried — not by query count. A long-lived SQL
    // session cycling through many distinct tables should call
    // `spark.catalog.clearCache()` (or `uncacheTable`) between corpora,
    // exactly as it would after any .cache()-based workload.
    def strArg(fn: String, e: Expression, what: String): String = e match {
      case Literal(s: UTF8String, StringType) => s.toString
      case other => throw new IllegalArgumentException(
        s"$fn: $what must be a string literal, got $other")
    }
    def intArg(fn: String, e: Expression, what: String): Int = e match {
      case Literal(n: Int, IntegerType) => n
      case other => throw new IllegalArgumentException(
        s"$fn: $what must be an int literal, got $other")
    }
    def tvf(name: String)(builder: Seq[Expression] => LogicalPlan): Unit =
      ext.injectTableFunction((
        new FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name),
        builder))

    tvf("graft_near_dup_pairs") { args =>
      require(args.size == 1, "usage: graft_near_dup_pairs(<table name>)")
      val t = strArg("graft_near_dup_pairs", args.head, "table name")
      graft.text.Dedup.nearDupPairs(SparkSession.active.table(t), eager = false)
        .queryExecution.logical
    }
    tvf("graft_binary_neardup") { args =>
      require(args.size == 1,
        "usage: graft_binary_neardup(<table name (doc_id, payload)>) — " +
          "byte-level near-dup pairs over a BINARY column (q204): hex " +
          "byte shingles through the same LSH band join + exact-Jaccard " +
          "verify as the text path")
      val t = strArg("graft_binary_neardup", args.head, "table name")
      graft.multimodal.Binary
        .nearDupPayloadPairs(SparkSession.active.table(t), eager = false)
        .queryExecution.logical
    }
    tvf("graft_store_dedup") { args =>
      require(args.size == 2 || args.size == 3,
        "usage: graft_store_dedup(<table name>, <store dir>[, <content col>])" +
          " — the signature store's read-only serve as SQL: survivors of " +
          "the drop after cross-history + intra-drop near-dup (q106/q206)." +
          " The store's marker picks the prep (text word shingles or " +
          "binary byte shingles); content col defaults to 'text'")
      val t = strArg("graft_store_dedup", args.head, "table name")
      val storeDir = strArg("graft_store_dedup", args(1), "store dir")
      val contentCol = if (args.size == 3)
        strArg("graft_store_dedup", args(2), "content col") else "text"
      graft.text.Store.dedupNewDropVsCorpusReadOnly(
          SparkSession.active.table(t), storeDir,
          textCol = contentCol, eager = false)
        .queryExecution.logical
    }
    tvf("graft_fp_store") { args =>
      require(args.size == 2 || args.size == 3,
        "usage: graft_fp_store(<drop table>, <store dir>[, <content col>])" +
          " — partial-copy pairs (doc_a, doc_b, n_shared) of the drop vs " +
          "the winnowing-fingerprint store (q210): drop×history plus " +
          "intra-drop, stop-fingerprint guard over history ∪ drop. The " +
          "store's marker picks k/w and the gram universe (text words or " +
          "payload bytes); content col defaults to 'text'")
      val t = strArg("graft_fp_store", args.head, "drop table")
      val storeDir = strArg("graft_fp_store", args(1), "store dir")
      val contentCol = if (args.size == 3)
        strArg("graft_fp_store", args(2), "content col") else "text"
      graft.text.FpStore.pairsVsStoreReadOnly(
          SparkSession.active.table(t), storeDir,
          contentCol = contentCol, eager = false)
        .queryExecution.logical
    }
    tvf("graft_hash_store") { args =>
      require(args.size == 2 || args.size == 3,
        "usage: graft_hash_store(<drop table>, <store dir>[, <modalities " +
          "csv>]) — perceptual re-encode pairs (doc_a, doc_b, modality, " +
          "hamming) of the drop vs the persisted hash store (q212): " +
          "banded 64-bit-Hamming ≤ 3 over drop×history plus intra-drop; " +
          "the drop table needs (doc_id, payload). Modalities default to " +
          "image,audio,bytes")
      val t = strArg("graft_hash_store", args.head, "drop table")
      val storeDir = strArg("graft_hash_store", args(1), "store dir")
      val mods = if (args.size == 3)
        strArg("graft_hash_store", args(2), "modalities csv")
          .split(",").map(_.trim).filter(_.nonEmpty).toSeq
      else graft.multimodal.HashStore.Modalities
      graft.multimodal.HashStore.pairsVsStoreReadOnly(
          SparkSession.active.table(t), storeDir, modalities = mods,
          eager = false)
        .queryExecution.logical
    }
    tvf("graft_retrieve_clips") { args =>
      require(args.size == 2,
        "usage: graft_retrieve_clips(<probe table>, <store dir>) — which " +
          "stored tracks CONTAIN the probe clips (trim/shift-robust)? " +
          "(probe_id, doc_id, n_matched) via the hash store's audio_win " +
          "leg; the probe table needs (doc_id, payload); window size " +
          "comes from the store's stamped _shape recipe and a store " +
          "without the leg is refused")
      val t = strArg("graft_retrieve_clips", args.head, "probe table")
      val storeDir = strArg("graft_retrieve_clips", args(1), "store dir")
      graft.multimodal.HashStore.retrieveClips(
          SparkSession.active.table(t), storeDir, eager = false)
        .queryExecution.logical
    }
    tvf("graft_retrieve_crops") { args =>
      require(args.size == 2,
        "usage: graft_retrieve_crops(<probe table>, <store dir>) — which " +
          "stored images CONTAIN the probe crops? (probe_id, doc_id, " +
          "n_matched) via the hash store's image_tile leg; the probe " +
          "table needs (doc_id, payload); tile size comes from the " +
          "store's stamped _shape recipe and a store without the leg is " +
          "refused")
      val t = strArg("graft_retrieve_crops", args.head, "probe table")
      val storeDir = strArg("graft_retrieve_crops", args(1), "store dir")
      graft.multimodal.HashStore.retrieveCrops(
          SparkSession.active.table(t), storeDir, eager = false)
        .queryExecution.logical
    }
    tvf("graft_retrieve_spans") { args =>
      require(args.size == 2,
        "usage: graft_retrieve_spans(<probe table>, <store dir>) — which " +
          "stored payloads CONTAIN the probe byte spans " +
          "(trim/shift-robust)? (probe_id, doc_id, n_matched) via the " +
          "hash store's bytes_win leg (the oracle-checkable retrieval " +
          "leg, q214); the probe table needs (doc_id, payload); window " +
          "size comes from the store's stamped _shape recipe and a " +
          "store without the leg is refused")
      val t = strArg("graft_retrieve_spans", args.head, "probe table")
      val storeDir = strArg("graft_retrieve_spans", args(1), "store dir")
      graft.multimodal.HashStore.retrieveSpans(
          SparkSession.active.table(t), storeDir, eager = false)
        .queryExecution.logical
    }
    tvf("graft_containment_exact") { args =>
      require(args.size == 1, "usage: graft_containment_exact(<table name>)")
      val t = strArg("graft_containment_exact", args.head, "table name")
      graft.text.Dedup
        .containmentJoinExact(SparkSession.active.table(t), eager = false)
        .queryExecution.logical
    }
    tvf("graft_profile") { args =>
      require(args.size == 2,
        "usage: graft_profile(<table name>, '<comma-separated columns>')")
      val t = strArg("graft_profile", args.head, "table name")
      val cols = strArg("graft_profile", args(1), "column list")
        .split(",").map(_.trim).filter(_.nonEmpty).toSeq
      graft.operators.Profile.table(SparkSession.active.table(t), cols)
        .queryExecution.logical
    }
    tvf("graft_repeated_spans") { args =>
      require(args.size == 1, "usage: graft_repeated_spans(<table name>)")
      val t = strArg("graft_repeated_spans", args.head, "table name")
      graft.text.Queries.repeatedSpans(SparkSession.active.table(t),
          eager = false)
        .queryExecution.logical
    }
    tvf("graft_span_scrub") { args =>
      require(args.size == 1, "usage: graft_span_scrub(<table name>)")
      val t = strArg("graft_span_scrub", args.head, "table name")
      graft.text.Queries.scrubRepeatedSpans(SparkSession.active.table(t),
          eager = false)
        .queryExecution.logical
    }
    tvf("graft_sliding_chunks") { args =>
      require(args.size == 5, "usage: graft_sliding_chunks(<table>, <idCol>, " +
        "<tokensCol>, <size>, <stride>)")
      val t = strArg("graft_sliding_chunks", args.head, "table name")
      graft.operators.Packing.slidingChunks(
          SparkSession.active.table(t),
          strArg("graft_sliding_chunks", args(1), "idCol"),
          strArg("graft_sliding_chunks", args(2), "tokensCol"),
          intArg("graft_sliding_chunks", args(3), "size"),
          intArg("graft_sliding_chunks", args(4), "stride"))
        .queryExecution.logical
    }
    tvf("graft_pack_greedy") { args =>
      require(args.size == 5, "usage: graft_pack_greedy(<table>, <idCol>, " +
        "<nTokensCol>, <maxTokens>, <shards>)")
      val t = strArg("graft_pack_greedy", args.head, "table name")
      graft.operators.Packing.greedyPack(
          SparkSession.active.table(t),
          strArg("graft_pack_greedy", args(1), "idCol"),
          strArg("graft_pack_greedy", args(2), "nTokensCol"),
          intArg("graft_pack_greedy", args(3), "maxTokens"),
          intArg("graft_pack_greedy", args(4), "shards"))
        .queryExecution.logical
    }
    tvf("graft_lm_score") { args =>
      require(args.size == 2,
        "usage: graft_lm_score(<trusted table>, <candidate table>)")
      graft.text.Lm.scoreAgainst(
          SparkSession.active.table(strArg("graft_lm_score", args.head, "trusted table")),
          SparkSession.active.table(strArg("graft_lm_score", args(1), "candidate table")))
        .queryExecution.logical
    }
    tvf("graft_lm_score_store") { args =>
      require(args.size == 2,
        "usage: graft_lm_score_store(<store dir>, <candidate table>)")
      graft.text.LmStore.scoreVsStore(
          SparkSession.active.table(
            strArg("graft_lm_score_store", args(1), "candidate table")),
          strArg("graft_lm_score_store", args.head, "store dir"))
        .queryExecution.logical
    }
    tvf("graft_profile_serve") { args =>
      require(args.size == 1, "usage: graft_profile_serve(<store dir>)")
      graft.operators.ProfileStore.serve(SparkSession.active,
          strArg("graft_profile_serve", args.head, "store dir"))
        .queryExecution.logical
    }
    tvf("graft_profile_drift") { args =>
      require(args.size == 1, "usage: graft_profile_drift(<store dir>)")
      graft.operators.ProfileStore.drift(SparkSession.active,
          strArg("graft_profile_drift", args.head, "store dir"))
        .queryExecution.logical
    }
    tvf("graft_heavy_hitters") { args =>
      require(args.size == 3,
        "usage: graft_heavy_hitters(<table>, <itemCol>, <k>)")
      val t = strArg("graft_heavy_hitters", args.head, "table name")
      graft.operators.Scale.heavyHitters(
          SparkSession.active.table(t),
          strArg("graft_heavy_hitters", args(1), "itemCol"),
          intArg("graft_heavy_hitters", args(2), "k"))
        .queryExecution.logical
    }
    tvf("graft_novelty_store") { args =>
      require(args.size == 2,
        "usage: graft_novelty_store(<store dir>, <candidate table>)")
      graft.text.GramStore.noveltyOfDrop(
          SparkSession.active.table(
            strArg("graft_novelty_store", args(1), "candidate table")),
          strArg("graft_novelty_store", args.head, "store dir"),
          eager = false)
        .queryExecution.logical
    }
    tvf("graft_span_detect_store") { args =>
      require(args.size == 2,
        "usage: graft_span_detect_store(<store dir>, <candidate table>)")
      // eager=false: no checkpoint job at analysis (the k-probe that
      // validates the store's gram width is a tiny column-pruned scan)
      graft.text.SpanStore.detectVsDrop(
          SparkSession.active.table(
            strArg("graft_span_detect_store", args(1), "candidate table")),
          strArg("graft_span_detect_store", args.head, "store dir"),
          eager = false)
        .queryExecution.logical
    }
    tvf("graft_span_scrub_store") { args =>
      require(args.size == 2,
        "usage: graft_span_scrub_store(<store dir>, <candidate table>)")
      graft.text.SpanStore.scrubVsDrop(
          SparkSession.active.table(
            strArg("graft_span_scrub_store", args(1), "candidate table")),
          strArg("graft_span_scrub_store", args.head, "store dir"),
          eager = false)
        .queryExecution.logical
    }
    tvf("graft_cdc_chunks") { args =>
      require(args.size == 1, "usage: graft_cdc_chunks(<table>)")
      graft.text.Dedup.cdcChunks(
          SparkSession.active.table(
            strArg("graft_cdc_chunks", args.head, "table name")))
        .queryExecution.logical
    }
    tvf("graft_chunk_census_store") { args =>
      require(args.size == 2,
        "usage: graft_chunk_census_store(<store dir>, <candidate table>)")
      graft.text.ChunkStore.dupStatsVsDrop(
          SparkSession.active.table(
            strArg("graft_chunk_census_store", args(1), "candidate table")),
          strArg("graft_chunk_census_store", args.head, "store dir"),
          eager = false)
        .queryExecution.logical
    }
    tvf("graft_bm25") { args =>
      require(args.size == 3,
        "usage: graft_bm25(<corpus table>, <queries table (query_id, term)>, <k>)")
      val corpus = SparkSession.active.table(
        strArg("graft_bm25", args.head, "corpus table"))
      // eager=false: no checkpoint job at analysis time (EXPLAIN must stay
      // plan-only); the postings subtree's three consumers fall to
      // Catalyst's exchange reuse instead of an explicit materialize
      graft.text.Retrieval.bm25TopK(
          graft.text.Retrieval.postings(corpus),
          SparkSession.active.table(
            strArg("graft_bm25", args(1), "queries table")),
          intArg("graft_bm25", args(2), "k"),
          eager = false)
        .queryExecution.logical
    }
    tvf("graft_bm25_store") { args =>
      require(args.size == 4,
        "usage: graft_bm25_store(<store dir>, <drop table>, " +
          "<queries table (query_id, term)>, <k>)")
      graft.text.PostingsStore.bm25ForQueriesVsDrop(
          SparkSession.active.table(
            strArg("graft_bm25_store", args(1), "drop table")),
          strArg("graft_bm25_store", args.head, "store dir"),
          SparkSession.active.table(
            strArg("graft_bm25_store", args(2), "queries table")),
          intArg("graft_bm25_store", args(3), "k"),
          eager = false)
        .queryExecution.logical
    }
    tvf("graft_bm25_maxscore") { args =>
      require(args.size == 4,
        "usage: graft_bm25_maxscore(<corpus table>, " +
          "<queries table (query_id, term)>, <k>, <essential df cutoff>)")
      val corpus = SparkSession.active.table(
        strArg("graft_bm25_maxscore", args.head, "corpus table"))
      val post = graft.text.Retrieval.postings(corpus)
      // eager=false: the certificate fallback stays a plan branch (no
      // workload collect at analysis time) — output is still exact
      graft.text.Retrieval.bm25TopKMaxScore(post,
          graft.text.Retrieval.docFreq(post),
          graft.text.Retrieval.corpusTotals(post),
          SparkSession.active.table(
            strArg("graft_bm25_maxscore", args(1), "queries table")),
          intArg("graft_bm25_maxscore", args(2), "k"),
          intArg("graft_bm25_maxscore", args(3), "essential df cutoff").toLong,
          eager = false)
        .queryExecution.logical
    }
    tvf("graft_classify_store") { args =>
      require(args.size == 2 || args.size == 3,
        "usage: graft_classify_store(<store dir>, <docs table>[, <label col>])")
      graft.text.ClassifyStore.predictVsStore(
          SparkSession.active.table(
            strArg("graft_classify_store", args(1), "docs table")),
          strArg("graft_classify_store", args.head, "store dir"),
          labelCol = if (args.size == 3)
            strArg("graft_classify_store", args(2), "label col") else "lang",
          eager = false)
        .queryExecution.logical
    }
    tvf("graft_dsir_score") { args =>
      require(args.size == 2,
        "usage: graft_dsir_score(<target table>, <raw table>)")
      graft.text.Dsir.score(
          SparkSession.active.table(
            strArg("graft_dsir_score", args.head, "target table")),
          SparkSession.active.table(
            strArg("graft_dsir_score", args(1), "raw table")))
        .queryExecution.logical
    }
    tvf("graft_dsir_store") { args =>
      require(args.size == 3,
        "usage: graft_dsir_store(<store dir>, <target table>, <drop table>)")
      graft.text.DsirStore.scoreVsDrop(
          SparkSession.active.table(
            strArg("graft_dsir_store", args(1), "target table")),
          SparkSession.active.table(
            strArg("graft_dsir_store", args(2), "drop table")),
          strArg("graft_dsir_store", args.head, "store dir"),
          eager = false)
        .queryExecution.logical
    }
    tvf("graft_sketch_store") { args =>
      require(args.size == 1,
        "usage: graft_sketch_store(<store dir>)")
      graft.text.SketchStore.serveEstimate(SparkSession.active,
          strArg("graft_sketch_store", args.head, "store dir"))
        .queryExecution.logical
    }
    tvf("graft_sketch_growth") { args =>
      require(args.size == 1,
        "usage: graft_sketch_growth(<store dir>)")
      graft.text.SketchStore.growthCurve(SparkSession.active,
          strArg("graft_sketch_growth", args.head, "store dir"))
        .queryExecution.logical
    }
    tvf("graft_sketch_overlap") { args =>
      require(args.size == 1,
        "usage: graft_sketch_overlap(<store dir>)")
      graft.text.SketchStore.overlapMatrix(SparkSession.active,
          strArg("graft_sketch_overlap", args.head, "store dir"))
        .queryExecution.logical
    }
    tvf("graft_sketch_admit") { args =>
      require(args.size == 2,
        "usage: graft_sketch_admit(<store dir>, <candidate docs table>)")
      graft.text.SketchStore.admission(
          SparkSession.active.table(
            strArg("graft_sketch_admit", args(1), "candidate docs table")),
          strArg("graft_sketch_admit", args.head, "store dir"),
          eager = false)
        .queryExecution.logical
    }
    tvf("graft_cms_store") { args =>
      require(args.size == 1,
        "usage: graft_cms_store(<store dir>)")
      graft.text.FreqStore.serveCounters(SparkSession.active,
          strArg("graft_cms_store", args.head, "store dir"))
        .queryExecution.logical
    }
    tvf("graft_cms_estimate") { args =>
      require(args.size == 2,
        "usage: graft_cms_estimate(<store dir>, <probe table (term)>)")
      graft.text.FreqStore.serveEstimates(SparkSession.active,
          SparkSession.active.table(
            strArg("graft_cms_estimate", args(1), "probe table")),
          strArg("graft_cms_estimate", args.head, "store dir"))
        .queryExecution.logical
    }
    tvf("graft_sample_store") { args =>
      require(args.size == 1,
        "usage: graft_sample_store(<store dir>)")
      graft.text.SampleStore.serveSample(SparkSession.active,
          strArg("graft_sample_store", args.head, "store dir"))
        .queryExecution.logical
    }
    tvf("graft_sample_strata") { args =>
      require(args.size == 1,
        "usage: graft_sample_strata(<store dir built with stratified " +
          "cuts>) — the served balanced per-language sample")
      graft.text.SampleStore.serveStratified(SparkSession.active,
          strArg("graft_sample_strata", args.head, "store dir"))
        .queryExecution.logical
    }
    tvf("graft_sample_strata_audit") { args =>
      require(args.size == 2,
        "usage: graft_sample_strata_audit(<stratified store dir>, " +
          "<corpus table>) — per-language sample-vs-exact mean tokens")
      graft.text.KmvSample.auditMeanTokensByLang(
          graft.text.SampleStore.serveStratified(SparkSession.active,
            strArg("graft_sample_strata_audit", args.head, "store dir")),
          SparkSession.active.table(
            strArg("graft_sample_strata_audit", args(1), "corpus table")))
        .queryExecution.logical
    }
    tvf("graft_sample_audit") { args =>
      require(args.size == 2,
        "usage: graft_sample_audit(<store dir>, <corpus table>)")
      graft.text.KmvSample.auditMeanTokens(
          graft.text.SampleStore.serveSample(SparkSession.active,
            strArg("graft_sample_audit", args.head, "store dir")),
          SparkSession.active.table(
            strArg("graft_sample_audit", args(1), "corpus table")))
        .queryExecution.logical
    }
    tvf("graft_curation_spine") { args =>
      require(args.size == 3 || args.size == 4,
        "usage: graft_curation_spine(<corpus table>, <target table>, " +
          "<bench table (doc_id, text)>[, k]) — the q186 pipeline: " +
          "quality gate -> dedup -> decontaminate -> DSIR top-k -> pack. " +
          "EXPLAIN-safe (analysis runs no job); EXECUTION shares stage " +
          "state via lazy caches, so concurrent plan branches may " +
          "recompute the gate subtree — the CLI --curation-spine face " +
          "uses real barriers and is the cheaper way to RUN it")
      def t(i: Int, what: String) = SparkSession.active.table(
        strArg("graft_curation_spine", args(i), what))
      graft.text.Curation.spineSelection(
          t(0, "corpus table"), t(1, "target table"), t(2, "bench table"),
          k = if (args.size == 4) intArg("graft_curation_spine", args(3), "k")
              else 100,
          eager = false)
        .queryExecution.logical
    }
    tvf("graft_spine_drop") { args =>
      require(args.size == 5 || args.size == 6,
        "usage: graft_spine_drop(<drop table>, <target table>, " +
          "<bench table (doc_id, text)>, <dedup store dir>, " +
          "<dsir store dir>[, k]) — the q189 daily-drop spine: history " +
          "serves from the two ledgers, the plan scans only the drop")
      def t(i: Int, what: String) = SparkSession.active.table(
        strArg("graft_spine_drop", args(i), what))
      graft.text.Curation.incrementalSpineSelection(
          t(0, "drop table"), t(1, "target table"), t(2, "bench table"),
          strArg("graft_spine_drop", args(3), "dedup store dir"),
          strArg("graft_spine_drop", args(4), "dsir store dir"),
          k = if (args.size == 6) intArg("graft_spine_drop", args(5), "k")
              else 100,
          eager = false)
        .queryExecution.logical
    }
    tvf("graft_drop_funnel") { args =>
      require(args.size == 5 || args.size == 6,
        "usage: graft_drop_funnel(<drop table>, <target table>, " +
          "<bench table (doc_id, text)>, <dedup store dir>, " +
          "<dsir store dir>[, k]) — q205's per-stage attrition census " +
          "of the daily-drop spine (q189's chain, q190's face). " +
          "Single-pass: one labeled aggregation emits every stage row. " +
          "EXPLAIN-safe; execution shares only id-scale stage sets " +
          "via lazy caches (the corpus-frame race of the 6-census " +
          "shape is gone by construction)")
      def t(i: Int, what: String) = SparkSession.active.table(
        strArg("graft_drop_funnel", args(i), what))
      graft.text.Curation.incrementalSpineFunnel(
          t(0, "drop table"), t(1, "target table"), t(2, "bench table"),
          strArg("graft_drop_funnel", args(3), "dedup store dir"),
          strArg("graft_drop_funnel", args(4), "dsir store dir"),
          k = if (args.size == 6) intArg("graft_drop_funnel", args(5), "k")
              else 100,
          eager = false)
        .queryExecution.logical
    }
    tvf("graft_rrf") { args =>
      require(args.size == 3,
        "usage: graft_rrf(<lex table (query_id, doc_id, rank)>, " +
          "<vec table (query_id, doc_id, rank)>, <k>)")
      graft.text.Hybrid.rrfFuse(
          SparkSession.active.table(
            strArg("graft_rrf", args.head, "lex table"))
            .withColumnRenamed("rank", "lex_rank"),
          SparkSession.active.table(
            strArg("graft_rrf", args(1), "vec table"))
            .withColumnRenamed("rank", "vec_rank"),
          intArg("graft_rrf", args(2), "k"))
        .queryExecution.logical
    }
    tvf("graft_manifest") { args =>
      require(args.size == 4, "usage: graft_manifest(<table>, <keyCol>, " +
        "'<comma-separated cols>', <shards>)")
      val t = strArg("graft_manifest", args.head, "table name")
      graft.operators.Audit.manifest(
          SparkSession.active.table(t),
          strArg("graft_manifest", args(1), "keyCol"),
          strArg("graft_manifest", args(2), "column list")
            .split(",").map(_.trim).filter(_.nonEmpty).toSeq,
          intArg("graft_manifest", args(3), "shards"))
        .queryExecution.logical
    }
    tvf("graft_split_leakage") { args =>
      require(args.size == 2,
        "usage: graft_split_leakage(<table>, <trainPerMille>) — " +
          "train below the cut, eval at or above")
      val t = strArg("graft_split_leakage", args.head, "table name")
      val cut = intArg("graft_split_leakage", args(1), "trainPerMille")
      require(cut > 0 && cut < 1000,
        s"trainPerMille must be in (0, 1000), got $cut")
      graft.text.Dedup.crossSplitLeakage(SparkSession.active.table(t),
          cuts = Seq("train" -> cut, "eval" -> 1000), eager = false)
        .queryExecution.logical
    }
    ext.injectFunction((
      new FunctionIdentifier("vector_dot"),
      new ExpressionInfo(classOf[VectorDot].getName, "vector_dot"),
      (children: Seq[Expression]) => children match {
        case Seq(a, b) => VectorDot(a, b)
        case _ => throw new IllegalArgumentException(
          "usage: vector_dot(array<bigint>, array<bigint>)")
      }))
  }
}
