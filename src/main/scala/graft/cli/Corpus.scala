package graft.cli

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Sessions
import graft.operators.{Graph, Packing, Sampling}
import graft.sources.Sources
import graft.text.{Dedup, Store, TextOps}

/** Corpus-pipeline CLI: the training-data counterpart of [[Main]] — one
  * spark-submit surface running the LLM-pipeline stages (quality filter →
  * decontaminate → near-dup dedup → eval carve-out → mixture/sample →
  * pack → sharded write) as ONE lazy plan per stage chain, over a parquet
  * corpus with (doc_id, text, ...) columns.
  *
  * Usage:
  *   spark-submit --class graft.cli.Corpus graft.jar \
  *     -I /data/corpus.parquet -O /out \
  *     [--format parquet|orc|json|csv]    input format (default parquet; json
  *                                        reads JSONL, csv expects a header)
  *     [--scrub-pii]                      redact emails/phones/IPv4 in `text`
  *                                        (graft.text.Pii.scrub, map-only)
  *     [--remove-boilerplate df]          drop w-word segments appearing in
  *                                        >= df docs corpus-wide, keep the
  *                                        reassembled text (CCNet-style)
  *     [--boilerplate-w w]                segment width in words (default 20)
  *     [--benchmark /data/eval.parquet]   drop docs sharing a 3-gram with it
  *     [--lm-trusted /data/wiki.parquet]  train a trigram stupid-backoff LM
  *                                        on the trusted corpus and keep only
  *                                        docs scoring >= --lm-min-ppm (the
  *                                        CCNet corpus-likeness gate; exact
  *                                        integer fixed-point, text.Lm)
  *     [--lm-min-ppm n]                   LM gate threshold in ppm (default 0)
  *     [--lm-store dir]                   persist/serve the trusted n-gram
  *                                        counts (text.LmStore): with
  *                                        --lm-trusted the drop's counts are
  *                                        stored once (append-once by md5 of
  *                                        the path) and the model is served
  *                                        MERGED; alone, serves the existing
  *                                        store — the trusted corpus is never
  *                                        recounted across runs
  *     [--profile-store dir]              append one mergeable stats row per
  *                                        eligible column of the WRITTEN
  *                                        corpus to the profile store
  *                                        (operators.ProfileStore) — corpus
  *                                        stats via serve, no corpus rescan;
  *                                        drop id defaults to md5(input path),
  *                                        re-runs of a profiled drop skip
  *     [--drop-id id]                     override the run's drop id in EVERY
  *                                        drop-ledgered store (--profile-store
  *                                        and --novelty-store file under the
  *                                        same id; --profile-drop-id is a
  *                                        legacy alias of this flag)
  *     [--dedup]                          MinHash-LSH near-dup removal (keep smallest id)
  *     [--compact-store n]                maintenance: rewrite the --dedup-store
  *                                        signature table into n parquet files
  *                                        (contents identical) AFTER the run's
  *                                        store commit — the answer to a month
  *                                        of daily drops each appending a few
  *                                        part-files. With --dedup-store alone
  *                                        (no -I/-O) runs compaction standalone
  *     [--dedup-store dir]                INCREMENTAL near-dup removal vs the
  *                                        persisted signature store: first run
  *                                        bootstraps (intra-dedup + Store.build),
  *                                        later runs drop dups vs the store +
  *                                        intra-drop and append survivors'
  *                                        signatures — the stored corpus is
  *                                        never re-tokenized (daily-drop mode)
  *     [--payload-col col]                switch --dedup-store, --fp-store AND
  *                                        --sketch-store to the BYTES universe:
  *                                        `col` names a binary column;
  *                                        signatures/fingerprints/novelty
  *                                        registers are computed over byte
  *                                        grams (container-level near-dup +
  *                                        admission for media drops). Recorded
  *                                        in each store's marker/cfg stamp;
  *                                        later serves follow it automatically
  *     [--fp-store dir]                   INCREMENTAL partial-copy detection vs
  *                                        the persisted winnowing-fingerprint
  *                                        store: first run bootstraps
  *                                        (FpStore.build over the drop), later
  *                                        runs emit the drop's partial-copy
  *                                        pairs (drop×history + intra-drop,
  *                                        shared ≥ k+w−1-gram runs — the
  *                                        embedded-verbatim-block signal
  *                                        MinHash misses) to OUT/_fppairs and
  *                                        append the drop's fingerprints. An
  *                                        AUDIT signal: the corpus is NOT
  *                                        filtered (quarantine is policy, the
  *                                        pairs are evidence). --payload-col
  *                                        switches it to the bytes universe
  *     [--hash-store dir]                 INCREMENTAL perceptual re-encode
  *                                        detection vs the persisted
  *                                        (doc_id, modality, hash64) store
  *                                        (dHash images / aHash audio /
  *                                        byte-simhash payloads): first run
  *                                        bootstraps, later runs emit the
  *                                        drop's banded-Hamming pairs vs
  *                                        history (+ intra-drop) to
  *                                        OUT/_hashpairs and append the
  *                                        drop's hashes — history is a
  *                                        17 B/row scan, never a corpus
  *                                        re-decode. Audit signal like
  *                                        --fp-store; needs --payload-col
  *                                        like --dedup-store; --compact-store
  *                                        compacts it alongside. The
  *                                        bootstrap run emits the first
  *                                        drop's INTRA-drop pairs (a day-1
  *                                        drop can carry re-encodes of
  *                                        itself) before the build commits
  *     [--hash-modalities csv]            the --hash-store legs to enroll
  *                                        (default image,audio,bytes; add
  *                                        audio_win / image_tile to enable
  *                                        clip / crop retrieval — the
  *                                        store stamps the recipe in its
  *                                        _shape marker)
  *     [--hash-win n]                     audio_win window size in samples
  *                                        at enrollment (default 2^15); on
  *                                        --retrieve-clips it must MATCH
  *                                        the stamp (omit to read it)
  *     [--hash-tile n]                    image_tile tile size in pixels
  *                                        at enrollment (default 64); on
  *                                        --retrieve-crops it must MATCH
  *                                        the stamp (omit to read it)
  *     [--retrieve-crops dir]             probe the hash store's
  *                                        image_tile leg: which stored
  *                                        images CONTAIN this run's crops?
  *                                        (probe_id, doc_id, n_matched)
  *                                        rows to OUT/_retrieved_img;
  *                                        read-only, same refusal
  *                                        discipline as --retrieve-clips
  *     [--retrieve-clips dir]             probe the hash store's audio_win
  *                                        leg: which stored tracks CONTAIN
  *                                        this run's clips (trim/shift-
  *                                        robust)? (probe_id, doc_id,
  *                                        n_matched) rows to OUT/_retrieved;
  *                                        read-only — probes never enroll;
  *                                        window size from the stamped
  *                                        recipe, loud refusal on a store
  *                                        without the leg
  *     [--hash-bwin n]                    bytes_win window size in bytes at
  *                                        enrollment (default 64); on
  *                                        --retrieve-spans it must MATCH
  *                                        the stamp (omit to read it)
  *     [--retrieve-spans dir]             probe the hash store's bytes_win
  *                                        leg: which stored payloads
  *                                        CONTAIN this run's byte spans?
  *                                        (probe_id, doc_id, n_matched)
  *                                        rows to OUT/_retrieved_span;
  *                                        read-only, the oracle-checkable
  *                                        retrieval leg (q214) — same
  *                                        refusal discipline
  *     [--dup-graph-stats col]            emit the per-`col` dup-graph triangle
  *                                        census (nodes/edges/triangles of the
  *                                        near-dup pair graph restricted to
  *                                        same-`col` edges) to OUT/_dupgraph —
  *                                        computed BEFORE dedup removes the
  *                                        dups it diagnoses; triangle-dense
  *                                        groups are template families
  *     [--span-stats]                     emit the per-doc substring-duplication
  *                                        census (repeated-5-gram spans:
  *                                        n_spans / covered_toks / max_df) to
  *                                        OUT/_spanstats — also pre-dedup: it
  *                                        measures the pasted-paragraph
  *                                        duplication doc-level dedup can't see
  *     [--min-tokens n] [--max-tokens n]  quality bounds (default 1/2^31)
  *     [--bpe-merges path]                denominate ALL token decisions
  *                                        (--min/--max-tokens, --pack) in BPE
  *                                        tokens under the given merges file
  *                                        (one "left right" pair per line,
  *                                        rank = line order) instead of
  *                                        whitespace words — real tokenizer
  *                                        budgets drift 2-3x from word counts
  *     [--bpe-learn n]                    learn an n-merge BPE table from the
  *                                        WRITTEN training corpus and emit it
  *                                        as OUT/_merges (same line format) —
  *                                        feed it back via --bpe-merges on the
  *                                        next run (train tokenizer → use it)
  *     [--eval-k n] [--eval-by col]       carve out exactly n docs per stratum
  *                                        (default col: source) to OUT/_eval,
  *                                        excluded from the training output
  *     [--mixture s1=pm,s2=pm,...]        per-stratum keep rates in per-mille
  *     [--mixture-default pm]             rate for unlisted strata (default 1000)
  *     [--mixture-by col]                 mixture stratum column (default source)
  *     [--temperature-by col]             α=1/2 temperature flattening: derive
  *                                        per-stratum keep rates from the
  *                                        corpus (sizes → ∝√n, rarest kept
  *                                        whole) and apply them BEFORE any
  *                                        --mixture policy rates
  *     [--sample perMille]                deterministic hash sample (whole corpus)
  *     [--pack maxTokens]                 greedy no-split packing annotation
  *                                        (string doc ids get a dense id first)
  *     [--shards n]                       output shards (default 16)
  *
  *     [--span-store dir]                 persisted gram-df store for the
  *                                        repeated-span family: first run
  *                                        bootstraps (SpanStore.build);
  *                                        later runs write OUT/_spans (this
  *                                        drop's repeated spans vs history ∪
  *                                        drop, q150's operator) then append
  *                                        the drop's gram-df partials under
  *                                        the --drop-id discipline
  *     [--span-remove-drop id]            standalone: remove one drop's
  *                                        gram-df partials (exact takedown
  *                                        by df subtraction + keeper re-min)
  *     [--manifest-store dir]             file the written corpus's manifest
  *                                        partials under the --drop-id
  *                                        discipline: the whole-history
  *                                        certificate serves from the store
  *                                        (no output rescan), and replicas
  *                                        localize divergence to the DROP
  *                                        via ManifestStore.compare
  *     [--chunk-store dir]                persisted CDC chunk-frequency store:
  *                                        first run bootstraps; later runs
  *                                        write OUT/_chunks (this drop's
  *                                        verbatim-share census vs history ∪
  *                                        drop, q162's operator) then append
  *                                        the drop's partials under --drop-id
  *     [--postings-store dir]             persisted inverted index for BM25
  *                                        retrieval: the drop's postings
  *                                        (doc_id, term, tf, dl) join the
  *                                        store under --drop-id; serve with
  *                                        PostingsStore.bm25TopKVsDrop
  *                                        (q165's operator — the retrieval
  *                                        workload is a caller input, so no
  *                                        per-drop artifact is written)
  *     [--classifier-store dir]           persisted classifier count store:
  *                                        the drop's (label, term, cnt)
  *                                        partials join the store under
  *                                        --drop-id; counts sum-merge so the
  *                                        served model ≡ from-scratch on the
  *                                        union and a drop takedown unlearns
  *                                        EXACTLY (q169/q170). Serve with
  *                                        ClassifyStore.predictVsStore;
  *                                        --classifier-label picks the label
  *                                        column (default lang)
  *     [--dsir-store dir]                 persisted DSIR raw-pool profile:
  *                                        with --dsir-target (trusted corpus
  *                                        parquet), later runs write
  *                                        OUT/_dsir (this drop's importance
  *                                        scores vs target + history ∪ drop,
  *                                        q176's operator), then the drop's
  *                                        (f, cnt) profile partials join the
  *                                        store under --drop-id; counts
  *                                        sum-merge so a drop takedown
  *                                        unlearns the selection model
  *                                        EXACTLY (q177)
  *     [--sketch-store dir]               persisted distinct-gram sketch
  *                                        (portable HLL registers, ≤ 256
  *                                        rows per drop): the drop's
  *                                        registers join the store under
  *                                        --drop-id (max-merge ≡ sketching
  *                                        the union from scratch, q179;
  *                                        takedown re-maxes survivors to
  *                                        the never-ingested sketch, q180);
  *                                        later runs write OUT/_admission
  *                                        (this drop's novelty vs the
  *                                        history, BEFORE the append —
  *                                        q185's operator) and
  *                                        OUT/_saturation (the growth
  *                                        curve including it, q181's)
  *     [--sketch-admit-ppm n]             admission-GATE the sketch ingest:
  *                                        a drop whose containment_ppm vs
  *                                        the stored history is >= n is
  *                                        recorded-and-REJECTED (never
  *                                        appended); every verdict lands in
  *                                        STORE/_admissions (the auditable
  *                                        decision trail — q185's check
  *                                        closed into the ingest loop)
  *     [--freq-store dir]                 persisted Count-Min frequency
  *                                        sketch (portable counters, ≤ 4096
  *                                        rows per drop): the drop's
  *                                        counters join the store under
  *                                        --drop-id (sum-merge ≡ sketching
  *                                        the union from scratch, q192;
  *                                        drop takedown re-sums survivors
  *                                        to the never-ingested counters;
  *                                        doc-granular tickets SUBTRACT
  *                                        exactly via --freq-raw, q193)
  *     [--freq-width n|auto[:target]]     the CMS width knob (error band
  *                                        ε = e/w of total occurrences —
  *                                        q203's w parameter, reachable
  *                                        without writing Scala). Bootstrap
  *                                        only: `n` builds at that width;
  *                                        `auto` derives it from a one-pass
  *                                        occurrence count (deriveWidth,
  *                                        default target overcount 1000;
  *                                        auto:<t> overrides). On append an
  *                                        explicit n that contradicts the
  *                                        stamp REFUSES (widths are
  *                                        incommensurable); `auto` warns
  *                                        when the grown total has outsized
  *                                        the stamp — the rebuild signal
  *     [--sample-store dir]               persisted bottom-k uniform sample
  *                                        (k smallest md5-of-id hashes, ≤
  *                                        128 rows per drop with lang +
  *                                        token-count payload): the drop's
  *                                        sample rows join the store under
  *                                        --drop-id (the order-statistic
  *                                        merge re-cuts to the from-scratch
  *                                        sample, q196; drop takedown is
  *                                        exact by the same subset
  *                                        argument, q197; doc tickets
  *                                        rebuild via --sample-raw).
  *                                        With --sample-by-lang at
  *                                        bootstrap, the store cuts
  *                                        bottom-k PER LANGUAGE (q200's
  *                                        balanced sample); appends
  *                                        inherit the discipline
  *     [--curation-spine]                 run the LLM curation spine (q186:
  *                                        quality gate → near-dup dedup →
  *                                        decontaminate → DSIR top-k →
  *                                        greedy pack → manifest) as ONE
  *                                        lazy plan over -I documents;
  *                                        needs --dsir-target (trusted
  *                                        corpus), takes --benchmark for
  *                                        the decontamination blocklist
  *                                        (default: the built-in eval
  *                                        suite); writes OUT/selection +
  *                                        OUT/_manifest. With BOTH
  *                                        --dedup-store and --dsir-store,
  *                                        -I is a daily DROP and the spine
  *                                        runs incrementally (q189): the
  *                                        history serves from the ledgers
  *                                        and is never re-read
  *     [--spine-ingest]                   CLOSE the daily loop: after the
  *                                        selection + manifest land, the
  *                                        drop's dedup survivors join the
  *                                        signature store and its clean
  *                                        frame's profile joins the DSIR
  *                                        store (commit-LAST; replays of
  *                                        an enrolled drop are refused
  *                                        loudly — re-curating would dedup
  *                                        the drop against itself); with
  *                                        --sketch-store, ADMISSION gates
  *                                        the spine: a stale/replayed
  *                                        crawl is rejected from one
  *                                        register-scale scan before any
  *                                        curation cost, verdict in the
  *                                        novelty store's admission log,
  *                                        and an admitted drop enrolls in
  *                                        all three ledgers commit-LAST
  *     [--spine-stream ckptDir]           the daily loop as a STREAM
  *                                        drain: -I is a directory drops
  *                                        land in; each file not yet in
  *                                        the checkpoint runs the
  *                                        admission-gated incremental
  *                                        spine as its own epoch
  *                                        (selection to OUT/epoch-N,
  *                                        ledgers commit-LAST), then the
  *                                        query stops — cron it and the
  *                                        loop needs no human
  *     [--fp-stream ckptDir]              the partial-copy detector as the
  *                                        same cron-able drain: -I is a
  *                                        directory drops land in; each
  *                                        file not yet in the checkpoint
  *                                        serves its pairs vs the
  *                                        --fp-store history (bootstrap
  *                                        epoch: intra-batch pairs, then
  *                                        the store builds) into
  *                                        OUT/_fppairs/epoch-NNNNNN and
  *                                        only then enrolls, atomically —
  *                                        a crash-replayed epoch is
  *                                        skipped, its pairs are already
  *                                        on disk. --payload-col switches
  *                                        the gram universe to bytes
  *     [--hash-stream ckptDir]            the media re-encode detector as
  *                                        the same cron-able drain on the
  *                                        perceptual-hash ledger: each
  *                                        new file's pairs vs the
  *                                        --hash-store history land in
  *                                        OUT/_hashpairs/epoch-NNNNNN
  *                                        before its hashes enroll
  *                                        (bootstrap epoch: intra-batch
  *                                        pairs, then the store builds
  *                                        and stamps the recipe; later
  *                                        epochs hash at the STAMP) —
  *                                        needs --payload-col; a
  *                                        crash-replayed epoch is skipped
  *     [--scrub-spans]                    REWRITE text: delete every
  *                                        repeated-k-gram occurrence outside
  *                                        its keeper doc (q125); with an
  *                                        existing --span-store, keepers/df
  *                                        come from the store ∪ this drop
  *                                        (q151) — the history is never
  *                                        re-tokenized. Runs before token
  *                                        counting; stores/reports see the
  *                                        scrubbed text
  *
  * Standalone compliance surface (no -I/-O):
  *     [--takedown ticket.parquet]        apply ONE removal ticket to EVERY
  *                                        configured store in one invocation:
  *                                        doc_id rows purge --dedup-store
  *                                        signatures and --fp-store
  *                                        fingerprints; doc_id/vec_id rows purge
  *                                        --cluster-store vectors and
  *                                        --ann-index codes; drop_id rows
  *                                        remove drops from every configured
  *                                        drop-ledgered store (--lm-store/
  *                                        --profile-store/--novelty-store/
  *                                        --span-store/--manifest-store/
  *                                        --chunk-store/--postings-store/
  *                                        --classifier-store/--dsir-store/
  *                                        --sketch-store).
  *                                        Retry-convergent: already-absent
  *                                        drops are skipped with a notice, so
  *                                        re-running a partially-applied
  *                                        ticket finishes the job
  *     [--sketch-raw drop=rawDir]         doc-granular purge for the
  *                                        max-merge sketch family (with
  *                                        --takedown + --sketch-store):
  *                                        registers cannot subtract, so the
  *                                        named drop is REBUILT from rawDir
  *                                        minus the ticket's doc_ids and
  *                                        swapped atomically — serve ≡ a
  *                                        store that never held those docs
  *     [--freq-raw drop=rawDir]           doc-granular purge for the
  *                                        sum-merge frequency family (with
  *                                        --takedown + --freq-store):
  *                                        counters are LINEAR, so the
  *                                        ticket's docs (read from rawDir,
  *                                        pushdown on doc_id) are sketched
  *                                        once and SUBTRACTED from the
  *                                        named drop's rows — one scan of
  *                                        the purged docs, never the drop's
  *                                        remainder; serve ≡ a store that
  *                                        never held those docs
  *     [--sample-raw drop=rawDir]         doc-granular purge for the sample
  *                                        family (with --takedown +
  *                                        --sample-store): an order
  *                                        statistic can't subtract (a
  *                                        deleted row loses the drop's
  *                                        (k+1)th candidate), so the named
  *                                        drop's k rows are RE-CUT from
  *                                        rawDir minus the ticket's doc_ids
  *                                        and swapped atomically — serve ≡
  *                                        a store that never held those docs
  *     [--ledger-report]                  print each configured store's drop
  *                                        ledger, flag drops present in some
  *                                        stores but absent from others (the
  *                                        crash-recovery audit), and report
  *                                        doc-granular stores' row counts;
  *                                        combines with --takedown to show the
  *                                        post-removal state
  *     [--ledger-report-out dir]          additionally write the report as
  *                                        parquet (kind, store_flag,
  *                                        store_dir, drop_id, n_rows,
  *                                        disagreement) — the machine-readable
  *                                        face a compliance system diffs
  *                                        tickets against; implies
  *                                        --ledger-report
  *     [--cluster-store dir]              the SemDeDup cluster store the
  *                                        ticket/report should cover
  *     [--ann-index dir]                  the ANN index the ticket/report
  *                                        should cover
  *
  * Every decision is deterministic (md5 hash buckets, integer thresholds,
  * smallest-id survivorship, md5-order eval picks), so re-runs produce
  * identical corpora — the property that makes training data auditable.
  * Stages compose lazily; nothing is collected at the driver. The eval
  * carve-out lands under `OUT/_eval`: the underscore prefix makes parquet
  * readers of OUT skip it, so the training shards stay cleanly readable
  * while the eval set rides along in the same output tree.
  */
object Corpus {

  final case class Args(
      input: String = "", out: String = "", format: String = "parquet",
      scrubPii: Boolean = false,
      boilerplateDf: Option[Int] = None, boilerplateW: Int = 20,
      benchmark: Option[String] = None,
      lmTrusted: Option[String] = None, lmMinPpm: Long = 0L,
      lmStore: Option[String] = None,
      profileStore: Option[String] = None, profileDropId: Option[String] = None,
      dedup: Boolean = false, dedupStore: Option[String] = None,
      payloadCol: Option[String] = None,
      fpStore: Option[String] = None,
      hashStore: Option[String] = None,
      hashModalities: Option[String] = None,
      hashWin: Int = 0,
      hashTile: Int = 0,
      hashBwin: Int = 0,
      retrieveClips: Option[String] = None,
      retrieveCrops: Option[String] = None,
      retrieveSpans: Option[String] = None,
      dupGraphBy: Option[String] = None, spanStats: Boolean = false,
      minTokens: Int = 1, maxTokens: Int = Int.MaxValue,
      bpeMerges: Option[String] = None, bpeLearn: Option[Int] = None,
      samplePerMille: Option[Int] = None,
      mixture: Map[String, Int] = Map.empty, mixtureDefault: Int = 1000,
      mixtureBy: String = "source",
      evalK: Option[Int] = None, evalBy: String = "source",
      packTokens: Option[Int] = None, shards: Int = 16,
      compactStore: Option[Int] = None,
      takedownIds: Option[String] = None,
      lmRemoveDrop: Option[String] = None,
      profileRemoveDrop: Option[String] = None,
      manifest: Boolean = false,
      noveltyStore: Option[String] = None,
      noveltyRemoveDrop: Option[String] = None,
      clusterStore: Option[String] = None,
      annIndex: Option[String] = None,
      takedown: Option[String] = None,
      ledgerReport: Boolean = false,
      ledgerReportOut: Option[String] = None,
      spanStore: Option[String] = None,
      spanRemoveDrop: Option[String] = None,
      scrubSpans: Boolean = false,
      manifestStore: Option[String] = None,
      temperatureBy: Option[String] = None,
      chunkStore: Option[String] = None,
      postingsStore: Option[String] = None,
      classifierStore: Option[String] = None,
      classifierLabel: String = "lang",
      dsirStore: Option[String] = None,
      dsirTarget: Option[String] = None,
      sketchStore: Option[String] = None,
      sketchRaw: Option[String] = None,
      sketchAdmitPpm: Option[Long] = None,
      freqStore: Option[String] = None,
      freqWidth: Option[String] = None,
      freqRaw: Option[String] = None,
      sampleStore: Option[String] = None,
      sampleRaw: Option[String] = None,
      sampleByLang: Boolean = false,
      curationSpine: Boolean = false,
      spineStream: Option[String] = None,
      fpStream: Option[String] = None,
      hashStream: Option[String] = None,
      spineIngest: Boolean = false)

  private def parseMixture(v: String): Map[String, Int] =
    v.split(",").iterator.map { part =>
      part.split("=", 2) match {
        case Array(s, pm) if s.nonEmpty => s -> pm.toInt
        case _ => throw new IllegalArgumentException(
          s"--mixture expects s1=perMille,s2=perMille,... got: $v")
      }
    }.toMap

  private def parse(argv: List[String], acc: Args = Args()): Args = argv match {
    case "-I" :: v :: rest            => parse(rest, acc.copy(input = v))
    case "-O" :: v :: rest            => parse(rest, acc.copy(out = v))
    case "--format" :: v :: rest      => parse(rest, acc.copy(format = v))
    case "--scrub-pii" :: rest        => parse(rest, acc.copy(scrubPii = true))
    case "--remove-boilerplate" :: v :: rest =>
      parse(rest, acc.copy(boilerplateDf = Some(v.toInt)))
    case "--boilerplate-w" :: v :: rest =>
      parse(rest, acc.copy(boilerplateW = v.toInt))
    case "--benchmark" :: v :: rest   => parse(rest, acc.copy(benchmark = Some(v)))
    case "--lm-trusted" :: v :: rest  => parse(rest, acc.copy(lmTrusted = Some(v)))
    case "--lm-min-ppm" :: v :: rest  => parse(rest, acc.copy(lmMinPpm = v.toLong))
    case "--lm-store" :: v :: rest    => parse(rest, acc.copy(lmStore = Some(v)))
    case "--profile-store" :: v :: rest =>
      parse(rest, acc.copy(profileStore = Some(v)))
    // --drop-id is the canonical name: ONE id files this run's drop in
    // EVERY drop-ledgered store (--profile-store AND --novelty-store).
    // --profile-drop-id predates it and is kept as an alias — it always
    // governed both stores, which its name hid.
    case "--drop-id" :: v :: rest =>
      parse(rest, acc.copy(profileDropId = Some(v)))
    case "--profile-drop-id" :: v :: rest =>
      parse(rest, acc.copy(profileDropId = Some(v)))
    case "--dedup" :: rest            => parse(rest, acc.copy(dedup = true))
    case "--dedup-store" :: v :: rest => parse(rest, acc.copy(dedupStore = Some(v)))
    case "--payload-col" :: v :: rest => parse(rest, acc.copy(payloadCol = Some(v)))
    case "--fp-store" :: v :: rest    => parse(rest, acc.copy(fpStore = Some(v)))
    case "--hash-store" :: v :: rest  => parse(rest, acc.copy(hashStore = Some(v)))
    case "--hash-modalities" :: v :: rest =>
      parse(rest, acc.copy(hashModalities = Some(v)))
    case "--hash-win" :: v :: rest    => parse(rest, acc.copy(hashWin = v.toInt))
    case "--hash-tile" :: v :: rest   => parse(rest, acc.copy(hashTile = v.toInt))
    case "--retrieve-clips" :: v :: rest =>
      parse(rest, acc.copy(retrieveClips = Some(v)))
    case "--retrieve-crops" :: v :: rest =>
      parse(rest, acc.copy(retrieveCrops = Some(v)))
    case "--hash-bwin" :: v :: rest   => parse(rest, acc.copy(hashBwin = v.toInt))
    case "--retrieve-spans" :: v :: rest =>
      parse(rest, acc.copy(retrieveSpans = Some(v)))
    case "--manifest" :: rest          => parse(rest, acc.copy(manifest = true))
    case "--novelty-store" :: v :: rest =>
      parse(rest, acc.copy(noveltyStore = Some(v)))
    case "--novelty-remove-drop" :: v :: rest =>
      parse(rest, acc.copy(noveltyRemoveDrop = Some(v)))
    case "--takedown-ids" :: v :: rest =>
      parse(rest, acc.copy(takedownIds = Some(v)))
    case "--takedown" :: v :: rest =>
      parse(rest, acc.copy(takedown = Some(v)))
    case "--ledger-report" :: rest =>
      parse(rest, acc.copy(ledgerReport = true))
    case "--ledger-report-out" :: v :: rest =>
      parse(rest, acc.copy(ledgerReport = true, ledgerReportOut = Some(v)))
    case "--span-store" :: v :: rest =>
      parse(rest, acc.copy(spanStore = Some(v)))
    case "--scrub-spans" :: rest =>
      parse(rest, acc.copy(scrubSpans = true))
    case "--manifest-store" :: v :: rest =>
      parse(rest, acc.copy(manifestStore = Some(v)))
    case "--chunk-store" :: v :: rest =>
      parse(rest, acc.copy(chunkStore = Some(v)))
    case "--postings-store" :: v :: rest =>
      parse(rest, acc.copy(postingsStore = Some(v)))
    case other => parseStoreArgs(other, acc)
  }

  /** Continuation of [[parse]] — the flag list outgrew the JVM's 64 KB
    * method limit as one pattern match; the two halves recurse into
    * each other, so flag order on the command line is unaffected.
    */
  private def parseStoreArgs(argv: List[String], acc: Args): Args = argv match {
    case "--classifier-store" :: v :: rest =>
      parse(rest, acc.copy(classifierStore = Some(v)))
    case "--classifier-label" :: v :: rest =>
      parse(rest, acc.copy(classifierLabel = v))
    case "--dsir-store" :: v :: rest =>
      parse(rest, acc.copy(dsirStore = Some(v)))
    case "--dsir-target" :: v :: rest =>
      parse(rest, acc.copy(dsirTarget = Some(v)))
    case "--sketch-store" :: v :: rest =>
      parse(rest, acc.copy(sketchStore = Some(v)))
    case "--sketch-raw" :: v :: rest =>
      parse(rest, acc.copy(sketchRaw = Some(v)))
    case "--sketch-admit-ppm" :: v :: rest =>
      parse(rest, acc.copy(sketchAdmitPpm = Some(v.toLong)))
    case "--freq-store" :: v :: rest =>
      parse(rest, acc.copy(freqStore = Some(v)))
    case "--freq-width" :: v :: rest =>
      parse(rest, acc.copy(freqWidth = Some(v)))
    case "--freq-raw" :: v :: rest =>
      parse(rest, acc.copy(freqRaw = Some(v)))
    case "--sample-store" :: v :: rest =>
      parse(rest, acc.copy(sampleStore = Some(v)))
    case "--sample-raw" :: v :: rest =>
      parse(rest, acc.copy(sampleRaw = Some(v)))
    case "--sample-by-lang" :: rest =>
      parse(rest, acc.copy(sampleByLang = true))
    case "--curation-spine" :: rest =>
      parse(rest, acc.copy(curationSpine = true))
    case "--spine-ingest" :: rest =>
      parse(rest, acc.copy(spineIngest = true))
    case "--spine-stream" :: v :: rest =>
      parse(rest, acc.copy(spineStream = Some(v)))
    case "--fp-stream" :: v :: rest =>
      parse(rest, acc.copy(fpStream = Some(v)))
    case "--hash-stream" :: v :: rest =>
      parse(rest, acc.copy(hashStream = Some(v)))
    case "--span-remove-drop" :: v :: rest =>
      parse(rest, acc.copy(spanRemoveDrop = Some(v)))
    case "--cluster-store" :: v :: rest =>
      parse(rest, acc.copy(clusterStore = Some(v)))
    case "--ann-index" :: v :: rest =>
      parse(rest, acc.copy(annIndex = Some(v)))
    case "--lm-remove-drop" :: v :: rest =>
      parse(rest, acc.copy(lmRemoveDrop = Some(v)))
    case "--profile-remove-drop" :: v :: rest =>
      parse(rest, acc.copy(profileRemoveDrop = Some(v)))
    case "--compact-store" :: v :: rest =>
      parse(rest, acc.copy(compactStore = Some(v.toInt)))
    case "--dup-graph-stats" :: v :: rest => parse(rest, acc.copy(dupGraphBy = Some(v)))
    case "--span-stats" :: rest       => parse(rest, acc.copy(spanStats = true))
    case "--min-tokens" :: v :: rest  => parse(rest, acc.copy(minTokens = v.toInt))
    case "--max-tokens" :: v :: rest  => parse(rest, acc.copy(maxTokens = v.toInt))
    case "--bpe-merges" :: v :: rest  => parse(rest, acc.copy(bpeMerges = Some(v)))
    case "--bpe-learn" :: v :: rest   => parse(rest, acc.copy(bpeLearn = Some(v.toInt)))
    case "--sample" :: v :: rest      => parse(rest, acc.copy(samplePerMille = Some(v.toInt)))
    case "--mixture" :: v :: rest     => parse(rest, acc.copy(mixture = parseMixture(v)))
    case "--mixture-default" :: v :: rest => parse(rest, acc.copy(mixtureDefault = v.toInt))
    case "--mixture-by" :: v :: rest  => parse(rest, acc.copy(mixtureBy = v))
    case "--temperature-by" :: v :: rest =>
      parse(rest, acc.copy(temperatureBy = Some(v)))
    case "--eval-k" :: v :: rest      => parse(rest, acc.copy(evalK = Some(v.toInt)))
    case "--eval-by" :: v :: rest     => parse(rest, acc.copy(evalBy = v))
    case "--pack" :: v :: rest        => parse(rest, acc.copy(packTokens = Some(v.toInt)))
    case "--shards" :: v :: rest      => parse(rest, acc.copy(shards = v.toInt))
    case Nil                          => acc
    case other => throw new IllegalArgumentException(s"unknown args: $other")
  }

  /** Driver-side read of a merges file (one "left right" pair per line,
    * rank = line order; blank lines skipped) through the Hadoop FS API so
    * HDFS/S3 paths work on a real cluster — the merges table is tokenizer
    * config, read once like the reference's properties files.
    */
  private def readMerges(spark: SparkSession, path: String): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    val lines =
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
      finally in.close()
    val merges = lines.map(_.trim).filter(_.nonEmpty)
    require(merges.nonEmpty, s"--bpe-merges $path: no merge pairs found")
    require(merges.forall(_.split(" ").length == 2),
      s"--bpe-merges $path: every line must be 'left right' (two " +
        "space-separated tokens)")
    merges
  }

  /** Columns the pipeline writes; an input corpus already carrying one
    * would be silently overwritten or collide in the pack join — refuse
    * loudly instead of losing user data.
    */
  private val ReservedCols = Seq("shard", "seq_id", "tok_offset", "__n_tokens", "__dense_id")

  /** The deterministic per-input drop id every drop-ledgered store
    * (--profile-store, --novelty-store) files a run under — ONE
    * derivation, so the same pipeline run can never land in two stores
    * under different ids (CliSpec re-derives it independently).
    */
  /** An already-stored drop id means the append is SKIPPED — correct for
    * a retry of the same content, silently wrong when the file at the
    * same path was replaced (the default id hashes the PATH only). The
    * skip must therefore be loud, and name the way out.
    */
  private def warnSkippedDrop(flag: String, dropId: String, store: String): Unit =
    System.err.println(s"[corpus] $flag: drop '$dropId' is already stored " +
      s"in $store — skipping the append. The default id is md5 of the " +
      "input PATH: changed content under the same path is NOT " +
      "re-ingested. Pass --drop-id for a content-versioned id, or remove " +
      "the stale drop first.")

  /** The drop-ledgered stores as (flag, dir, drops, removeDrop) —
    * the unified `--takedown` and `--ledger-report` iterate this ONE
    * list, so a future ledgered store joins both surfaces in one place.
    */
  private def ledgeredStores(a: Args): Seq[(String, String,
      (SparkSession, String) => Set[String],
      (SparkSession, String, String) => Unit)] =
    Seq(
      a.lmStore.map(sd => ("--lm-store", sd,
        (s: SparkSession, d: String) => graft.text.LmStore.drops(s, d),
        (s: SparkSession, d: String, id: String) =>
          graft.text.LmStore.removeDrop(s, d, id))),
      a.profileStore.map(sd => ("--profile-store", sd,
        (s: SparkSession, d: String) => graft.operators.ProfileStore.drops(s, d),
        (s: SparkSession, d: String, id: String) =>
          graft.operators.ProfileStore.removeDrop(s, d, id))),
      a.noveltyStore.map(sd => ("--novelty-store", sd,
        (s: SparkSession, d: String) => graft.text.GramStore.drops(s, d),
        (s: SparkSession, d: String, id: String) =>
          graft.text.GramStore.removeDrop(s, d, id))),
      a.spanStore.map(sd => ("--span-store", sd,
        (s: SparkSession, d: String) => graft.text.SpanStore.drops(s, d),
        (s: SparkSession, d: String, id: String) =>
          graft.text.SpanStore.removeDrop(s, d, id))),
      a.manifestStore.map(sd => ("--manifest-store", sd,
        (s: SparkSession, d: String) => graft.operators.ManifestStore.drops(s, d),
        (s: SparkSession, d: String, id: String) =>
          graft.operators.ManifestStore.removeDrop(s, d, id))),
      a.chunkStore.map(sd => ("--chunk-store", sd,
        (s: SparkSession, d: String) => graft.text.ChunkStore.drops(s, d),
        (s: SparkSession, d: String, id: String) =>
          graft.text.ChunkStore.removeDrop(s, d, id))),
      a.postingsStore.map(sd => ("--postings-store", sd,
        (s: SparkSession, d: String) => graft.text.PostingsStore.drops(s, d),
        (s: SparkSession, d: String, id: String) =>
          graft.text.PostingsStore.removeDrop(s, d, id))),
      a.classifierStore.map(sd => ("--classifier-store", sd,
        (s: SparkSession, d: String) => graft.text.ClassifyStore.drops(s, d),
        (s: SparkSession, d: String, id: String) =>
          graft.text.ClassifyStore.removeDrop(s, d, id))),
      a.dsirStore.map(sd => ("--dsir-store", sd,
        (s: SparkSession, d: String) => graft.text.DsirStore.drops(s, d),
        (s: SparkSession, d: String, id: String) =>
          graft.text.DsirStore.removeDrop(s, d, id))),
      a.sketchStore.map(sd => ("--sketch-store", sd,
        (s: SparkSession, d: String) => graft.text.SketchStore.drops(s, d),
        (s: SparkSession, d: String, id: String) =>
          graft.text.SketchStore.removeDrop(s, d, id))),
      a.freqStore.map(sd => ("--freq-store", sd,
        (s: SparkSession, d: String) => graft.text.FreqStore.drops(s, d),
        (s: SparkSession, d: String, id: String) =>
          graft.text.FreqStore.removeDrop(s, d, id))),
      a.sampleStore.map(sd => ("--sample-store", sd,
        (s: SparkSession, d: String) => graft.text.SampleStore.drops(s, d),
        (s: SparkSession, d: String, id: String) =>
          graft.text.SampleStore.removeDrop(s, d, id))),
      // doc-granular takedown (doc_id tickets) is wired separately; this
      // registration adds drop_id-ticket removal and --ledger-report
      a.hashStore.map(sd => ("--hash-store", sd,
        (s: SparkSession, d: String) =>
          graft.multimodal.HashStore.drops(s, d),
        (s: SparkSession, d: String, id: String) =>
          graft.multimodal.HashStore.removeDrop(s, d, id)))
    ).flatten

  private def defaultDropId(input: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    "drop-" + md.digest(input.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(12)
  }

  /** The composed pipeline, exposed for tests: returns the final corpus
    * (plus packing columns when --pack is set). Frames persisted along the
    * way are returned by [[pipelineWithHandles]] so [[run]] can unpersist
    * them after the write — callers of this convenience form in a
    * long-lived session should prefer that variant.
    */
  def pipeline(spark: SparkSession, a: Args): DataFrame =
    pipelineWithHandles(spark, a)._1

  /** [[pipeline]] plus the frames it persisted (unpersist after the final
    * action or the cached corpus copies outlive the run).
    *
    * Commits any staged `--dedup-store` mutation immediately — direct API
    * callers have no output write to sequence the commit after; only
    * [[run]] defers it until the training output lands.
    *
    * `--fp-store` is REFUSED on this face: the convenience tuple has no
    * slot for the partial-copy pairs, so committing the enrollment here
    * would discard the drop's evidence unrecoverably (once enrolled, a
    * re-serve reports each surviving pair in both orientations) and
    * would mutate the store before any caller-side output write — the
    * opposite of the commit-LAST discipline the store requires. Use
    * [[pipelineFull]] (surfaces `fpPairs` plus the deferred `commitFp`
    * thunk) or [[run]].
    */
  def pipelineWithHandles(spark: SparkSession, a: Args): (DataFrame, Seq[DataFrame]) = {
    require(a.fpStore.isEmpty,
      "--fp-store is not supported on the pipeline()/pipelineWithHandles() " +
        "faces: they would enroll the drop while discarding its partial-copy " +
        "pairs, and commit the store before the caller's own output write. " +
        "Use pipelineFull (fpPairs + deferred commitFp) or run().")
    val r = pipelineFull(spark, a)
    r.commitStore.foreach(_.apply())
    r.commitLm.foreach(_.apply())
    (r.train, r.cached)
  }

  /** Everything [[pipelineFull]] produces. `commitStore` is the DEFERRED
    * `--dedup-store` mutation (bootstrap build or survivor append): the
    * dedup itself already ran, but the store only changes when this thunk
    * does — run it after the training output write succeeds, so a failed
    * write's retry never dedups the drop against its own signatures
    * (which would silently produce an empty corpus).
    */
  final case class PipelineResult(
      train: DataFrame, eval: Option[DataFrame], dupGraph: Option[DataFrame],
      spanStats: Option[DataFrame], fpPairs: Option[DataFrame],
      cached: Seq[DataFrame], commitStore: Option[() => Unit],
      commitLm: Option[() => Unit], commitFp: Option[() => Unit])

  /** Full pipeline: (training corpus, optional eval carve-out, persisted
    * frames). The eval set is exactly `--eval-k` docs per `--eval-by`
    * stratum, picked in md5 order AFTER filtering/decontamination/dedup
    * (an eval doc must survive the same hygiene as training data) and
    * anti-joined out of the training corpus — train and eval are disjoint
    * by construction.
    */
  def pipelineFull(spark: SparkSession, a: Args): PipelineResult = {
    require(a.shards > 0, "--shards must be positive")
    val cached = Seq.newBuilder[DataFrame]
    var commitStore: Option[() => Unit] = None
    var commitLm: Option[() => Unit] = None
    var commitFp: Option[() => Unit] = None
    val input = a.format match {
      case "parquet" => spark.read.parquet(a.input)
      case "orc"     => spark.read.orc(a.input)
      case "json"    => spark.read.json(a.input) // JSONL, schema inferred
      case "csv"     => spark.read.option("header", "true")
        .option("inferSchema", "true").csv(a.input)
      case other => throw new IllegalArgumentException(
        s"--format must be parquet|orc|json|csv, got: $other")
    }
    val clash = input.columns.toSet.intersect(ReservedCols.toSet)
    require(clash.isEmpty,
      s"input corpus already has reserved pipeline column(s): ${clash.mkString(", ")} — " +
        "rename them upstream (the pipeline writes these)")
    // scrub FIRST: token counts, decontamination shingles, and dedup
    // signatures all see the redacted text — so a PII span can never be
    // the thing that makes two docs "different" or leaks into shingles
    var corpus = if (a.scrubPii)
      input.withColumn("text", graft.text.Pii.scrub(col("text"))) else input
    // boilerplate removal BEFORE token counting: the quality bounds and
    // every later stage must see the cleaned text (a doc that is mostly
    // boilerplate should fail --min-tokens on its REMAINING content)
    a.boilerplateDf.foreach { minDf =>
      // corpus feeds the segment-df mining, the mark join, and the
      // join-back below — persist or the scan+scrub chain recomputes
      corpus = corpus.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      cached += corpus
      val cleaned = Dedup.removeBoilerplate(corpus, w = a.boilerplateW, minDf = minDf)
        .select(col("doc_id"), col("clean_text"))
      corpus = corpus.drop("text")
        .join(cleaned, Seq("doc_id"))
        .withColumnRenamed("clean_text", "text")
    }
    // span-level scrub (q125/q151's operator turned into the pipeline's
    // text REWRITE): every repeated-k-gram occurrence outside its keeper
    // doc is deleted token-wise. With an existing --span-store the
    // keepers/df come from the store ∪ this drop (history never
    // re-tokenized); without one (or on the bootstrap run) it is the
    // intra-drop q125 scrub. Runs BEFORE token counting for the same
    // reason boilerplate removal does: a doc that is mostly pasted spans
    // must fail --min-tokens on its REMAINING content. Downstream
    // consequence, intentional: dedup signatures, the _spans report, and
    // every store append see the SCRUBBED text — the stores record what
    // was kept, exactly like --dedup-store appending survivors only.
    if (a.scrubSpans) {
      corpus = corpus.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      cached += corpus
      val scrubbed = a.spanStore
        .filter(sd => graft.text.SpanStore.exists(spark, sd)) match {
        case Some(sd) => graft.text.SpanStore.scrubVsDrop(corpus, sd)
        case None     => graft.text.Queries.scrubRepeatedSpans(corpus)
      }
      corpus = corpus.drop("text")
        .join(scrubbed.select(col("doc_id"),
          col("scrubbed_text").as("text")), Seq("doc_id"))
    }
    // token denomination: whitespace words by default; with --bpe-merges,
    // the SAME __n_tokens column carries BPE token counts, so the quality
    // bounds here and the --pack stage below are tokenizer-aware without
    // any further branching (one decision point, every consumer inherits)
    val tokenCount = a.bpeMerges match {
      case Some(p) =>
        size(graft.text.Bpe.encode(TextOps.words(col("text")),
          readMerges(spark, p)))
      case None => size(TextOps.words(col("text")))
    }
    // a binary-only drop (--payload-col, no text column) has no token
    // denomination — the length gate is a text-stage and is skipped, not
    // faked; every other text stage below requires `text` and fails
    // loudly on such a drop if its flag is passed
    if (a.payloadCol.isEmpty || corpus.columns.contains("text"))
      corpus = corpus
        .withColumn("__n_tokens", tokenCount)
        .filter(col("__n_tokens") >= a.minTokens && col("__n_tokens") <= a.maxTokens)
    else
      // fail LOUDLY if the caller explicitly passed token bounds on a
      // drop that has no text column to denominate them — silently
      // dropping a requested gate is the one thing a hygiene pipeline
      // must never do (the skip above is only for the DEFAULT bounds)
      require(a.minTokens == 1 && a.maxTokens == Int.MaxValue,
        "--min-tokens/--max-tokens need a text column; this binary-only " +
          "drop (--payload-col, no 'text') cannot apply them")

    // LM quality gate (q135/q137's operator, the CCNet shape): score every
    // doc against trigram stupid-backoff counts and keep those scoring
    // >= --lm-min-ppm. After the token bounds (sub-trigram docs score 0
    // and belong to the length gate, not the LM) and before
    // decontamination/dedup, so junk is gone before shingle costs are paid.
    // Model source: --lm-trusted alone trains fresh per run; with
    // --lm-store the trusted drop's counts persist (bootstrap, then
    // append-once keyed by md5 of the trusted path — idempotent on retry)
    // and the model is SERVED from store ∪ staged-drop, so a growing
    // trusted corpus is never recounted; --lm-store alone serves the
    // existing store. The store mutation is STAGED here and committed
    // only after the output write succeeds (PipelineResult.commitLm) —
    // the same commits-LAST discipline as the dedup store, so a run that
    // fails mid-write leaves the LM ledger exactly as it found it.
    if (a.lmTrusted.isDefined || a.lmStore.isDefined) {
      import graft.text.{Lm, LmStore}
      val model = (a.lmStore, a.lmTrusted) match {
        case (None, Some(tp)) => Lm.train(spark.read.parquet(tp))
        case (Some(sd), tp) =>
          var staged: Option[LmStore.Staged] = None
          tp.foreach { p =>
            val md = java.security.MessageDigest.getInstance("MD5")
            val dropId = "trusted-" + md.digest(p.getBytes("UTF-8"))
              .map("%02x".format(_)).mkString.take(12)
            if (!LmStore.exists(spark, sd))
              staged = Some(LmStore.stageBuild(spark.read.parquet(p), sd, dropId))
            else if (!LmStore.drops(spark, sd).contains(dropId))
              staged = Some(LmStore.stageAppend(spark.read.parquet(p), sd, dropId))
            else
              System.err.println(s"[corpus] --lm-store: trusted drop " +
                s"'$dropId' is already counted in $sd — skipping the " +
                "append. The id is md5 of the trusted PATH: changed " +
                "content under the same path is NOT recounted (remove " +
                "the drop first, or use a new path).")
          }
          commitLm = staged.map(_.commit)
          LmStore.serveModelWith(spark, sd, staged.map(_.counts))
        case _ => throw new IllegalStateException("unreachable")
      }
      val keep = Lm.score(corpus, model)
        .filter(col("score_ppm") >= a.lmMinPpm)
        .select(col("doc_id"))
      corpus = corpus.join(keep, Seq("doc_id"), "left_semi")
    }

    a.benchmark.foreach { b =>
      val bench = spark.read.parquet(b)
      // scrub the benchmark with the SAME redaction as the corpus:
      // otherwise a shared span crossing a PII token no longer matches
      // after the corpus side is redacted, and the contaminated doc
      // evades the carve-out (eval content leaks into training shards)
      corpus = Dedup.decontaminate(corpus,
        if (a.scrubPii) bench.withColumn("text", graft.text.Pii.scrub(col("text")))
        else bench)
    }
    // dup-graph diagnostic BEFORE any dedup stage: it censuses exactly
    // the dups the later stages remove
    val dupGraph = a.dupGraphBy.map { gcol =>
      require(corpus.columns.contains(gcol),
        s"--dup-graph-stats column '$gcol' not in the corpus")
      corpus = corpus.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      cached += corpus
      val pairs = Dedup.nearDupPairs(corpus).select(col("doc_a"), col("doc_b"))
      val g = corpus.select(col("doc_id"), col(gcol))
      val edges = pairs
        .join(g.toDF("doc_a", "ga"), "doc_a")
        .join(g.toDF("doc_b", "gb"), "doc_b")
        .filter(col("ga") === col("gb"))
        .select(col("ga").as(gcol), col("doc_a").as("u"), col("doc_b").as("v"))
      Graph.triangleStatsPerGroup(edges, gcol)
    }
    // span census BEFORE dedup, same rationale: it measures the substring-
    // level duplication the doc-level stages can't see (a pasted paragraph
    // inside an otherwise unique doc survives --dedup entirely)
    val spanStats = if (!a.spanStats) None else {
      corpus = corpus.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      cached += corpus
      Some(graft.text.Queries.repeatedSpans(corpus)
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_spans"),
          sum(col("span_toks")).as("covered_toks"),
          max(col("max_df")).as("max_df")))
    }
    if (a.dedup) {
      // the corpus subtree feeds BOTH the LSH pair mining and the anti
      // join (and later the pack/join pair) — persist it or the scan +
      // filter + decontaminate chain recomputes once per reference
      corpus = corpus.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      cached += corpus
      // no broadcast hint: losers can be corpus-scale on duplicate-heavy
      // crawls; AQE picks broadcast when they happen to be small
      val losers = Dedup.nearDupPairs(corpus)
        .select(col("doc_b").as("doc_id")).distinct()
      corpus = corpus.join(losers, Seq("doc_id"), "left_anti")
    }
    a.dedupStore.foreach { sd =>
      corpus = corpus.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      cached += corpus
      // --payload-col switches the store to the BYTES universe: the named
      // binary column is byte-shingled (container-level near-dup — the
      // media-corpus form of the daily drop), the marker records it, and
      // every later serve preps incoming drops the same way whether or
      // not the flag is repeated. Text runs leave it unset.
      val contentCol = a.payloadCol.getOrElse("text")
      val universe = if (a.payloadCol.isDefined)
        Store.Universe.PayloadBytes else Store.Universe.TextWords
      // both arms STAGE the store mutation and defer the commit (see
      // PipelineResult.commitStore): the dedup decisions are final here,
      // but the store must not change until the caller's output write
      // succeeds
      if (!Store.exists(spark, sd)) {
        // bootstrap drop: intra-dedup (smallest-id), then the survivors'
        // signatures BECOME the store — the next drop dedups against them
        // without this drop ever being re-tokenized
        val losers = (universe match {
          case Store.Universe.PayloadBytes =>
            // select, not withColumnRenamed: a drop that already carries
            // a DIFFERENT column literally named 'payload' alongside the
            // --payload-col one would otherwise yield two 'payload'
            // columns and an ambiguous-reference failure downstream
            graft.multimodal.Binary.nearDupPayloadPairs(
              corpus.select(col("doc_id"), col(contentCol).as("payload")))
          case Store.Universe.TextWords => Dedup.nearDupPairs(corpus)
        }).select(col("doc_b").as("doc_id")).distinct()
        corpus = corpus.join(losers, Seq("doc_id"), "left_anti")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        cached += corpus
        commitStore = Some(Store.buildStaged(corpus, sd,
          textCol = contentCol, universe = universe))
      } else {
        val (survivors, commit) = Store.dedupNewDropVsCorpusStaged(corpus, sd,
          textCol = contentCol)
        corpus = survivors
        commitStore = Some(commit)
      }
    }
    // partial-copy audit AFTER dedup: the fingerprint store records (and
    // pairs against) what the pipeline actually kept — a near-dup loser
    // already removed above must not also show up as a "partial copy".
    // The corpus is NOT filtered here: sharing one ≥ k+w−1-gram run is
    // evidence (quotation, licensing, contamination triage), not a
    // removal decision — the pairs land in OUT/_fppairs for policy.
    val fpPairs: Option[DataFrame] = a.fpStore.flatMap { fd =>
      corpus = corpus.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      cached += corpus
      val contentCol = a.payloadCol.getOrElse("text")
      val universe = if (a.payloadCol.isDefined)
        Store.Universe.PayloadBytes else Store.Universe.TextWords
      if (!graft.text.FpStore.exists(spark, fd)) {
        // bootstrap: this drop's fingerprints BECOME the history; staged
        // like every store mutation (a failed output write's retry must
        // not find a store already containing the drop — it would report
        // every pair twice, once per orientation)
        commitFp = Some(graft.text.FpStore.buildStaged(corpus, fd,
          contentCol = contentCol, universe = universe))
        None
      } else {
        val (pairs, commit) = graft.text.FpStore.pairsVsStoreStaged(
          corpus, fd, contentCol = contentCol)
        commitFp = Some(commit)
        Some(pairs)
      }
    }
    val eval = a.evalK.map { k =>
      require(corpus.columns.contains(a.evalBy),
        s"--eval-by column '${a.evalBy}' not in the corpus")
      // the clean corpus feeds both the carve-out and the anti join below
      corpus = corpus.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      cached += corpus
      Sampling.stratifiedK(corpus, col("doc_id"), col(a.evalBy), k, seed = "eval")
        .drop("__n_tokens")
    }
    eval.foreach { ev =>
      corpus = corpus.join(ev.select(col("doc_id")), Seq("doc_id"), "left_anti")
    }
    // temperature flattening BEFORE any hand-configured mixture: the
    // derived √n rates fix representation, then --mixture applies policy
    // on top (different seeds, so the combined rate is the product)
    a.temperatureBy.foreach { by =>
      require(corpus.columns.contains(by),
        s"--temperature-by column '$by' not in the corpus")
      corpus = Sampling.temperatureRebalance(corpus, col("doc_id"), by)
    }
    if (a.mixture.nonEmpty) {
      require(corpus.columns.contains(a.mixtureBy),
        s"--mixture-by column '${a.mixtureBy}' not in the corpus")
      // own seed: mixture decisions must not correlate with --sample's
      // buckets (a shared seed would make the combined rate min, not product)
      corpus = Sampling.mixtureSample(corpus, col("doc_id"), col(a.mixtureBy),
        a.mixture, a.mixtureDefault, seed = "mix")
    } else if (a.mixtureDefault != 1000) {
      // flat non-default rate with no per-stratum entries: same hash-bucket
      // decision, no stratum column needed (corpora without a source
      // column can still downsample via --mixture-default)
      corpus = Sampling.deterministicSample(corpus, col("doc_id"),
        a.mixtureDefault, seed = "mix")
    }
    a.samplePerMille.foreach { pm =>
      corpus = Sampling.deterministicSample(corpus, col("doc_id"), pm)
    }
    val out = a.packTokens match {
      case Some(max) =>
        // corpus feeds both the packer and the join-back — persist here too
        corpus = corpus.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        cached += corpus
        if (Packing.isIntegralId(corpus, "doc_id")) {
          val packed = Packing.greedyPack(
            corpus.select(col("doc_id"), col("__n_tokens")),
            "doc_id", "__n_tokens", max, a.shards)
          corpus.join(packed, "doc_id")
        } else {
          // string-keyed corpora (UUIDs, URL hashes): assign deterministic
          // dense longs first — greedyPack's id-ordered layout needs an
          // integral total order, and md5-order dense ids double as the
          // doc shuffle that decorrelates packing from crawl order
          val withIds = Packing.withDenseId(
            corpus.select(col("doc_id"), col("__n_tokens")), "doc_id", "__dense_id")
          val packed = Packing.greedyPack(withIds.select(col("__dense_id"), col("__n_tokens")),
              "__dense_id", "__n_tokens", max, a.shards)
            .withColumnRenamed("doc_id", "__dense_id")
          corpus
            .join(withIds.select(col("doc_id"), col("__dense_id")), "doc_id")
            .join(packed, "__dense_id")
            .drop("__dense_id")
        }
      case None =>
        corpus.withColumn("shard",
          Sampling.hashBucket(col("doc_id"), a.shards, seed = "pack"))
    }
    PipelineResult(out.drop("__n_tokens"), eval, dupGraph, spanStats, fpPairs,
      cached.result(), commitStore, commitLm, commitFp)
  }

  def run(spark: SparkSession, argv: Array[String]): Unit = {
    val a = parse(argv.toList)
    // the LLM curation SPINE as one invocation (q186's operator —
    // Curation.spineSelection/spineManifest): quality gate → near-dup
    // dedup → decontaminate → DSIR top-k → greedy pack → manifest, one
    // lazy plan, two artifacts: OUT/selection (the packed, provenance-
    // carrying pick) and OUT/_manifest (the 8-row certificate computed
    // from the WRITTEN artifact, so it certifies what is actually on
    // disk, not the plan that produced it).
    // the STREAMING daily loop as one drain invocation
    // (Curation.spineStream, Trigger.AvailableNow): -I is a DIRECTORY
    // drops land in; every file not yet in the checkpoint runs the
    // admission-gated incremental spine as its own epoch — replay
    // guard, novelty gate, curate vs the ledgers, selection to
    // OUT/epoch-NNNNNN, ledgers commit LAST — then the query stops.
    // Cron this invocation and the daily loop needs no human: each run
    // picks up exactly the drops that arrived since the last one.
    a.spineStream.foreach { ckpt =>
      require(a.input.nonEmpty && a.out.nonEmpty,
        "--spine-stream needs -I <drops dir> and -O <out dir>")
      require(!a.curationSpine,
        "--spine-stream IS the streaming curation spine — drop " +
          "--curation-spine/--spine-ingest (batch-form flags)")
      val target = a.dsirTarget.getOrElse(throw new IllegalArgumentException(
        "--spine-stream needs --dsir-target <trusted corpus parquet>"))
      val (sig, prof, nov) = (a.dedupStore, a.dsirStore, a.sketchStore) match {
        case (Some(s1), Some(s2), Some(s3)) => (s1, s2, s3)
        case _ => throw new IllegalArgumentException(
          "--spine-stream needs --dedup-store, --dsir-store AND " +
            "--sketch-store — the streaming loop is the admission-gated " +
            "incremental spine, and a half-served history would silently " +
            "re-admit known duplicates")
      }
      val bench = a.benchmark.map(spark.read.parquet(_))
        .getOrElse(graft.text.EvalSuite.table(spark))
        .withColumnRenamed("bench_id", "doc_id")
      // schema from the files already present (the first run needs at
      // least one drop — an empty dir has nothing to infer or do)
      val schema = spark.read.parquet(a.input).schema
      val q = graft.text.Curation.spineStream(
        spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1").parquet(a.input),
        spark.read.parquet(target), bench, sig, prof, nov, a.out, ckpt,
        availableNow = true)
      q.awaitTermination()
      println(s"spine-stream: drained available drops from ${a.input}; " +
        s"selections under ${a.out}, checkpoint $ckpt (verdicts: " +
        s"$nov/_admissions)")
      return
    }
    // the partial-copy detector's cron-able drain (FpStore.pairsStream,
    // Trigger.AvailableNow): -I is a DIRECTORY drops land in; every file
    // not yet in the checkpoint serves its pairs vs the --fp-store
    // history into OUT/_fppairs/epoch-NNNNNN (the bootstrap epoch emits
    // its intra-batch pairs, then the store builds), enrollment atomic
    // with the fingerprint commit — a crash-replayed epoch is skipped
    // because its pairs are already on disk.
    a.fpStream.foreach { ckpt =>
      require(a.input.nonEmpty && a.out.nonEmpty,
        "--fp-stream needs -I <drops dir> and -O <out dir>")
      val fd = a.fpStore.getOrElse(throw new IllegalArgumentException(
        "--fp-stream needs --fp-store <dir> — the stream serves and " +
          "appends that ledger"))
      require(a.spineStream.isEmpty && !a.curationSpine,
        "--fp-stream is a standalone drain — run the spine faces separately")
      val contentCol = a.payloadCol.getOrElse("text")
      val universe = if (a.payloadCol.isDefined)
        Store.Universe.PayloadBytes else Store.Universe.TextWords
      // schema from the files already present (the first run needs at
      // least one drop — an empty dir has nothing to infer or do)
      val schema = spark.read.parquet(a.input).schema
      val q = graft.text.FpStore.pairsStream(
        spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1").parquet(a.input),
        fd, s"${a.out}/_fppairs", ckpt, contentCol = contentCol,
        universe = universe, availableNow = true)
      q.awaitTermination()
      println(s"fp-stream: drained available drops from ${a.input}; " +
        s"pairs under ${a.out}/_fppairs, store $fd, checkpoint $ckpt")
      return
    }
    // the media re-encode detector's cron-able drain
    // (HashStore.pairsStream): same epoch discipline as --fp-stream on
    // the perceptual-hash ledger — pairs to OUT/_hashpairs/epoch-NNNNNN
    // BEFORE the epoch's hashes enroll; the bootstrap epoch's
    // --hash-win/--hash-tile/--hash-bwin define the _shape stamp and
    // every later epoch hashes at the stamped geometry.
    a.hashStream.foreach { ckpt =>
      import graft.multimodal.HashStore
      require(a.input.nonEmpty && a.out.nonEmpty,
        "--hash-stream needs -I <drops dir> and -O <out dir>")
      val hd = a.hashStore.getOrElse(throw new IllegalArgumentException(
        "--hash-stream needs --hash-store <dir> — the stream serves and " +
          "appends that ledger"))
      val pc = a.payloadCol.getOrElse(throw new IllegalArgumentException(
        "--hash-stream needs --payload-col <binary column> — perceptual " +
          "hashes are computed from the payload"))
      val mods = a.hashModalities
        .map(_.split(",").toSeq.map(_.trim).filter(_.nonEmpty))
        .getOrElse(HashStore.Modalities)
      val win = if (a.hashWin > 0) a.hashWin else 1 << 15
      val tile = if (a.hashTile > 0) a.hashTile else 64
      val bwin = if (a.hashBwin > 0) a.hashBwin else 64
      val schema = spark.read.parquet(a.input).schema
      val q = HashStore.pairsStream(
        spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1").parquet(a.input)
          .select(col("doc_id"), col(pc).as("payload")),
        hd, s"${a.out}/_hashpairs", ckpt, mods,
        winSamples = win, tilePx = tile, winBytes = bwin,
        availableNow = true)
      q.awaitTermination()
      println(s"hash-stream: drained available drops from ${a.input}; " +
        s"pairs under ${a.out}/_hashpairs, store $hd, checkpoint $ckpt")
      return
    }
    if (a.curationSpine) {
      require(a.input.nonEmpty && a.out.nonEmpty,
        "--curation-spine needs -I <documents parquet> and -O <out dir>")
      val target = a.dsirTarget.getOrElse(throw new IllegalArgumentException(
        "--curation-spine needs --dsir-target <trusted corpus parquet>"))
      val docs = spark.read.parquet(a.input)
      val bench = a.benchmark.map(spark.read.parquet(_))
        .getOrElse(graft.text.EvalSuite.table(spark))
        .withColumnRenamed("bench_id", "doc_id")
      // with BOTH history ledgers configured, -I is a DAILY DROP and the
      // spine runs its incremental form (q189): dedup serves the
      // signature store, DSIR serves the profile store — the history is
      // never re-read. Half-configured ledgers are refused: silently
      // falling back to the batch form would re-curate the drop as if
      // history didn't exist.
      require(!a.spineIngest || (a.dedupStore.nonEmpty && a.dsirStore.nonEmpty),
        "--spine-ingest needs the incremental form (--dedup-store AND " +
          "--dsir-store) — the batch spine has no ledgers to ingest into")
      // scoped release (r13 verdict #8, DELTA-scoped per r14 advice): the
      // spine's plan-sharing caches (gate projection, clean stage frame,
      // the dedup preps) are created lazily inside the composition and
      // their handles are internal to the stages, so the cleanup
      // snapshots the session's cache state BEFORE the spine and
      // releases exactly what appeared — never `clearCache()` +
      // unpersist-all, which on a shared context would clear other
      // callers' cached plans and kill unrelated localCheckpoint blocks
      // (those fail with missing blocks rather than recompute). A
      // long-lived caller running the daily spine in-session keeps its
      // own caches and never accumulates the spine's across days.
      val cacheScope = org.apache.spark.sql.graftx.Bridge
        .cacheScopeSnapshot(spark)
      try {
      val (sel, commitIngest) = (a.dedupStore, a.dsirStore) match {
        case (Some(sig), Some(prof)) if a.spineIngest =>
          // the CLOSED daily loop (Curation.incrementalSpineWithIngest):
          // curate the drop against the ledgers AND enroll it, with the
          // store mutations deferred until the selection write lands. A
          // replay of an already-ingested drop is REFUSED, not re-served:
          // the history now contains this drop's own survivors, so any
          // re-run would dedup it against itself and silently select
          // (near) nothing — the loud error names both ways out.
          val dropId = a.profileDropId.getOrElse(defaultDropId(a.input))
          if (graft.text.DsirStore.drops(spark, prof).contains(dropId))
            throw new IllegalArgumentException(
              s"--spine-ingest: drop '$dropId' is already enrolled in " +
                s"$prof — its survivors are part of the history now, and " +
                "re-curating it would dedup the drop against itself " +
                "(empty selection, no error). Pass --drop-id for a " +
                "content-versioned re-ingest, or remove the drop first.")
          a.sketchStore match {
            // with a novelty store configured, ADMISSION gates the spine
            // (Curation.incrementalSpineGated): a stale/replayed crawl is
            // rejected from one register-scale scan BEFORE the six-stage
            // pipeline runs, with the verdict in the store's admission
            // log; an admitted drop enrolls in all THREE ledgers on the
            // one deferred commit.
            case Some(nov) =>
              graft.text.Curation.incrementalSpineGated(
                  docs, spark.read.parquet(target), bench, sig, prof, nov,
                  dropId) match {
                case Left(reason) =>
                  println(s"curation-spine: ADMISSION REFUSED — $reason")
                  println("curation-spine: no selection written, no " +
                    "ledger touched (see the admission log: " +
                    s"$nov/_admissions)")
                  return
                case Right((s0, c0)) => (s0, Some(c0))
              }
            case None =>
              val (s0, c0) = graft.text.Curation.incrementalSpineWithIngest(
                docs, spark.read.parquet(target), bench, sig, prof, dropId)
              (s0, Some(c0))
          }
        case (Some(sig), Some(prof)) =>
          (graft.text.Curation.incrementalSpineSelection(
            docs, spark.read.parquet(target), bench, sig, prof), None)
        case (None, None) =>
          (graft.text.Curation.spineSelection(
            docs, spark.read.parquet(target), bench), None)
        case _ => throw new IllegalArgumentException(
          "--curation-spine with history needs BOTH --dedup-store and " +
            "--dsir-store (got one) — a half-served history would " +
            "silently re-admit known duplicates or mis-scale the ratios")
      }
      sel.write.mode("overwrite").parquet(s"${a.out}/selection")
      graft.operators.Audit.manifest(
          spark.read.parquet(s"${a.out}/selection"), key = "doc_id",
          cols = Seq("lang", "score_ppm", "pack_shard", "seq_id",
            "tok_offset", "n_tokens"))
        .coalesce(1).write.mode("overwrite").parquet(s"${a.out}/_manifest")
      // ledger mutations LAST (see Curation.incrementalSpineWithIngest):
      // only after the selection and its certificate are on disk does
      // the drop join the history
      commitIngest.foreach { c =>
        c()
        println(s"curation-spine: drop enrolled in ${a.dedupStore.get} " +
          s"and ${a.dsirStore.get}")
      }
      println(s"curation-spine: wrote ${a.out}/selection and ${a.out}/_manifest")
      } finally org.apache.spark.sql.graftx.Bridge
        .releaseCacheScopeDelta(spark, cacheScope)
      return
    }
    // standalone maintenance invocation: compact an existing store and
    // exit — no corpus read, no output write
    val takedownRequested = a.takedownIds.isDefined ||
      a.lmRemoveDrop.isDefined || a.profileRemoveDrop.isDefined ||
      a.noveltyRemoveDrop.isDefined || a.takedown.isDefined ||
      a.ledgerReport || a.spanRemoveDrop.isDefined
    // takedown flags are STANDALONE-ONLY, and must never be silently
    // ignored: a compliance operation (license revocation, RTBF ticket)
    // that exits 0 without removing anything is worse than a crash
    require(!takedownRequested || (a.input.isEmpty && a.out.isEmpty),
      "takedown flags (--takedown/--takedown-ids/--lm-remove-drop/" +
        "--profile-remove-drop/--novelty-remove-drop/--ledger-report) are " +
        "standalone maintenance invocations — run them without -I/-O")
    if (a.input.isEmpty && a.out.isEmpty && a.compactStore.isDefined &&
        !takedownRequested) {
      require(a.dedupStore.isDefined || a.fpStore.isDefined ||
          a.hashStore.isDefined,
        "--compact-store needs --dedup-store, --fp-store or --hash-store <dir>")
      a.dedupStore.foreach(sd => Store.compact(spark, sd, a.compactStore.get))
      a.fpStore.foreach(fd =>
        graft.text.FpStore.compact(spark, fd, a.compactStore.get))
      a.hashStore.foreach(hd =>
        graft.multimodal.HashStore.compact(spark, hd, a.compactStore.get))
      return
    }
    // standalone TAKEDOWN invocations: honor a removal ticket against the
    // persisted stores and exit — no corpus read, no output write. Each
    // store's removal is exact by construction (per-doc signature rows /
    // per-drop mergeable partials), so compliance costs one store
    // rewrite, never a corpus rescan or retrain. Removals run BEFORE any
    // requested compaction, so one invocation can purge and compact.
    if (a.input.isEmpty && a.out.isEmpty && takedownRequested) {
      // ONE-TICKET takedown: a single removal ticket applied to EVERY
      // configured store in one invocation — the answer to "a compliance
      // ticket must not need six separate runs" and to the crash state
      // where a mid-sequence failure leaves stores disagreeing. Ticket
      // schema: a parquet with a `doc_id` (and/or `vec_id`) column for
      // the doc-granular stores (--dedup-store signatures,
      // --cluster-store vectors, --ann-index codes — vec stores use
      // vec_id when present, else doc_id) and/or a `drop_id` column for
      // the drop-ledgered stores (--lm-store/--profile-store/
      // --novelty-store/--span-store/--manifest-store/--chunk-store —
      // everything in ledgeredStores). Convergence semantics make the RETRY of a
      // partial failure safe: doc-granular removal is an anti-join
      // (removing absent ids removes 0 rows), and a ticket drop already
      // absent from a ledger is SKIPPED with a notice instead of the
      // single-store flags' loud refusal — re-running the same ticket
      // always ends with every configured store purged. Run
      // --ledger-report in the same invocation to print the converged
      // per-store ledgers afterwards.
      a.takedown.foreach { ticketPath =>
        // BOTH guards derive from ledgeredStores(a) — the one list every
        // drop-ledgered store registers in — so a new store family joins
        // the refusal/acceptance logic the moment it joins the list (the
        // r10 bug: span/manifest/chunk handled by the loop below but
        // refused by a hand-maintained flag list here).
        val docStoresConfigured =
          Seq(a.dedupStore, a.fpStore, a.hashStore, a.clusterStore,
              a.annIndex)
            .flatten.nonEmpty ||
            a.sketchRaw.nonEmpty || a.freqRaw.nonEmpty ||
            a.sampleRaw.nonEmpty
        val ledgersConfigured = ledgeredStores(a).nonEmpty
        require(docStoresConfigured || ledgersConfigured,
          "--takedown needs at least one store flag (doc-granular: " +
            "--dedup-store/--fp-store/--cluster-store/--ann-index, --sketch-store " +
            "with --sketch-raw drop=rawDir for the rebuild recipe, or " +
            "--freq-store with --freq-raw drop=rawDir for the " +
            "subtraction recipe, or --sample-store with --sample-raw " +
            "drop=rawDir for the re-cut recipe; drop-ledgered: " +
            "--lm-store/--profile-store/--novelty-store/--span-store/" +
            "--manifest-store/--chunk-store/--postings-store/" +
            "--classifier-store/--dsir-store/--sketch-store/--freq-store/" +
            "--sample-store) — a ticket applied to nothing must not exit 0")
        val ticket = spark.read.parquet(ticketPath)
        val cols = ticket.columns.toSet
        require(cols.contains("doc_id") || cols.contains("vec_id") ||
            cols.contains("drop_id"),
          s"--takedown $ticketPath: ticket needs a doc_id, vec_id, or " +
            s"drop_id column, got: ${ticket.columns.mkString(", ")}")
        if (cols.contains("doc_id") || cols.contains("vec_id")) {
          require(docStoresConfigured,
            "--takedown: the ticket carries doc/vec ids but no doc-granular " +
              "store flag (--dedup-store/--fp-store/--cluster-store/" +
              "--ann-index) is set")
          a.dedupStore.foreach { sd =>
            require(cols.contains("doc_id"),
              "--dedup-store takedown needs a doc_id column in the ticket")
            val n = Store.removeDocs(spark, sd,
              ticket.select(col("doc_id")).distinct())
            println(s"takedown: removed $n signature(s) from $sd")
          }
          a.fpStore.foreach { fd =>
            require(cols.contains("doc_id"),
              "--fp-store takedown needs a doc_id column in the ticket")
            val n = graft.text.FpStore.removeDocs(spark, fd,
              ticket.select(col("doc_id")).distinct())
            println(s"takedown: removed $n fingerprint(s) from $fd")
          }
          a.hashStore.foreach { hd =>
            require(cols.contains("doc_id"),
              "--hash-store takedown needs a doc_id column in the ticket")
            val n = graft.multimodal.HashStore.removeDocs(spark, hd,
              ticket.select(col("doc_id")).distinct())
            println(s"takedown: removed $n perceptual hash(es) from $hd")
          }
          lazy val vecIds = (if (cols.contains("vec_id"))
            ticket.select(col("vec_id"))
          else ticket.select(col("doc_id").as("vec_id"))).distinct()
          a.clusterStore.foreach { sd =>
            val n = graft.vector.ClusterStore.removeDocs(spark, sd, vecIds)
            println(s"takedown: removed $n vector(s) from cluster store $sd")
          }
          a.annIndex.foreach { sd =>
            val n = graft.vector.Index.removeDocs(spark, sd, vecIds)
            println(s"takedown: removed $n code row(s) from ANN index $sd")
          }
          // doc-granular purge for the MAX-MERGE family: registers hold
          // no per-doc rows to delete, so the ticket's docs are removed
          // by REBUILDING the named drop's registers from its raw corpus
          // minus the ticket (SketchStore.purgeDocs — one scan of that
          // drop, one atomic swap; the history is never touched).
          // --sketch-raw names the drop and where its raw docs live:
          // the store deliberately holds registers only, so raw access
          // is the caller's to provide.
          a.sketchRaw.foreach { spec =>
            val sd = a.sketchStore.getOrElse(throw new IllegalArgumentException(
              "--sketch-raw needs --sketch-store <dir>"))
            require(cols.contains("doc_id"),
              "--sketch-raw purge needs a doc_id column in the ticket")
            val (dropId, rawDir) = spec.split("=", 2) match {
              case Array(d, p) if d.nonEmpty && p.nonEmpty => (d, p)
              case _ => throw new IllegalArgumentException(
                s"--sketch-raw expects dropId=rawDir, got '$spec'")
            }
            val remaining = spark.read.parquet(rawDir)
              .join(ticket.select(col("doc_id")).distinct(),
                Seq("doc_id"), "left_anti")
            graft.text.SketchStore.purgeDocs(remaining, sd, dropId)
            println(s"takedown: rebuilt sketch drop '$dropId' in $sd " +
              s"from $rawDir minus the ticket's docs")
          }
          // doc-granular purge for the SUM-MERGE frequency family:
          // counters are linear, so the ticket's docs are sketched once
          // and SUBTRACTED from the named drop's rows
          // (FreqStore.unlearnDocs — one scan of the purged docs, read
          // from rawDir with doc_id pushdown; the drop's remainder and
          // the history are never touched). The contrast to --sketch-raw:
          // same flag shape, opposite recipe — subtract what left, not
          // rebuild from what stayed.
          a.freqRaw.foreach { spec =>
            val sd = a.freqStore.getOrElse(throw new IllegalArgumentException(
              "--freq-raw needs --freq-store <dir>"))
            require(cols.contains("doc_id"),
              "--freq-raw purge needs a doc_id column in the ticket")
            val (dropId, rawDir) = spec.split("=", 2) match {
              case Array(d, p) if d.nonEmpty && p.nonEmpty => (d, p)
              case _ => throw new IllegalArgumentException(
                s"--freq-raw expects dropId=rawDir, got '$spec'")
            }
            val purged = spark.read.parquet(rawDir)
              .join(ticket.select(col("doc_id")).distinct(),
                Seq("doc_id"), "left_semi")
            graft.text.FreqStore.unlearnDocs(purged, sd, dropId)
            println(s"takedown: subtracted the ticket's docs from freq " +
              s"drop '$dropId' in $sd (read from $rawDir)")
          }
          // doc-granular purge for the SAMPLE family: an order statistic
          // rebuilds like the max-merge registers (SampleStore.purgeDocs
          // — re-cut the named drop's k rows from its raw corpus minus
          // the ticket, one atomic swap; the history is never touched)
          a.sampleRaw.foreach { spec =>
            val sd = a.sampleStore.getOrElse(throw new IllegalArgumentException(
              "--sample-raw needs --sample-store <dir>"))
            require(cols.contains("doc_id"),
              "--sample-raw purge needs a doc_id column in the ticket")
            val (dropId, rawDir) = spec.split("=", 2) match {
              case Array(d, p) if d.nonEmpty && p.nonEmpty => (d, p)
              case _ => throw new IllegalArgumentException(
                s"--sample-raw expects dropId=rawDir, got '$spec'")
            }
            val remaining = spark.read.parquet(rawDir)
              .join(ticket.select(col("doc_id")).distinct(),
                Seq("doc_id"), "left_anti")
            graft.text.SampleStore.purgeDocs(remaining, sd, dropId)
            println(s"takedown: re-cut sample drop '$dropId' in $sd " +
              s"from $rawDir minus the ticket's docs")
          }
        }
        if (cols.contains("drop_id")) {
          require(ledgersConfigured,
            "--takedown: the ticket carries drop ids but no drop-ledgered " +
              "store flag (--lm-store/--profile-store/--novelty-store/" +
              "--span-store/--manifest-store/--chunk-store/" +
              "--postings-store/--classifier-store/--dsir-store/" +
              "--sketch-store/--freq-store/--sample-store) is set")
          // the ticket's drop-id column is driver-sized by nature (one id
          // per ingested drop, not per corpus row)
          val dropIds = ticket.select(col("drop_id")).distinct()
            .collect().map(_.getString(0)).sorted
          ledgeredStores(a).foreach { case (flag, sd, dropsOf, removeOf) =>
            val have = dropsOf(spark, sd)
            dropIds.foreach { d =>
              if (have.contains(d)) {
                removeOf(spark, sd, d)
                println(s"takedown: removed drop '$d' from $flag $sd")
              } else println(s"takedown: drop '$d' already absent from " +
                s"$flag $sd — skipped (retry convergence)")
            }
          }
        }
      }
      a.takedownIds.foreach { idsPath =>
        val sd = a.dedupStore.getOrElse(throw new IllegalArgumentException(
          "--takedown-ids needs --dedup-store <dir>"))
        val ids = spark.read.parquet(idsPath).select(col("doc_id"))
        val n = Store.removeDocs(spark, sd, ids)
        println(s"takedown: removed $n signature(s) from $sd")
      }
      a.lmRemoveDrop.foreach { dropId =>
        val sd = a.lmStore.getOrElse(throw new IllegalArgumentException(
          "--lm-remove-drop needs --lm-store <dir>"))
        graft.text.LmStore.removeDrop(spark, sd, dropId)
        println(s"takedown: removed LM drop '$dropId' from $sd")
      }
      a.profileRemoveDrop.foreach { dropId =>
        val sd = a.profileStore.getOrElse(throw new IllegalArgumentException(
          "--profile-remove-drop needs --profile-store <dir>"))
        graft.operators.ProfileStore.removeDrop(spark, sd, dropId)
        println(s"takedown: removed profile drop '$dropId' from $sd")
      }
      a.noveltyRemoveDrop.foreach { dropId =>
        val sd = a.noveltyStore.getOrElse(throw new IllegalArgumentException(
          "--novelty-remove-drop needs --novelty-store <dir>"))
        graft.text.GramStore.removeDrop(spark, sd, dropId)
        println(s"takedown: removed gram drop '$dropId' from $sd")
      }
      a.spanRemoveDrop.foreach { dropId =>
        val sd = a.spanStore.getOrElse(throw new IllegalArgumentException(
          "--span-remove-drop needs --span-store <dir>"))
        graft.text.SpanStore.removeDrop(spark, sd, dropId)
        println(s"takedown: removed span-gram drop '$dropId' from $sd")
      }
      a.compactStore.foreach { n =>
        require(a.dedupStore.isDefined || a.fpStore.isDefined ||
            a.hashStore.isDefined,
          "--compact-store needs --dedup-store, --fp-store or --hash-store <dir>")
        a.dedupStore.foreach(sd => Store.compact(spark, sd, n))
        a.fpStore.foreach(fd => graft.text.FpStore.compact(spark, fd, n))
        a.hashStore.foreach(hd => graft.multimodal.HashStore.compact(spark, hd, n))
      }
      // CROSS-STORE LEDGER AUDIT: which drops live in which stores. THE
      // recovery tool for a takedown sequence that crashed mid-way (or
      // for stores that were legitimately bootstrapped at different
      // times): every configured drop-ledgered store prints its ledger,
      // and any drop present in some but absent from others is flagged
      // as a DISAGREEMENT naming both sides — so the operator can see
      // exactly which stores a re-run of the ticket still needs to
      // converge. Runs AFTER any removals in the same invocation, so a
      // combined `--takedown t.parquet --ledger-report` prints the
      // post-takedown truth. Doc-granular stores have no drop ledger
      // (their rows are per-doc); they report row counts as the audit
      // line a removal is checked against.
      if (a.ledgerReport) {
        val ledgers = ledgeredStores(a).map { case (flag, sd, dropsOf, _) =>
          (flag, sd, dropsOf(spark, sd))
        }
        ledgers.foreach { case (flag, sd, drops) =>
          println(s"ledger: $flag $sd: ${drops.size} drop(s)" +
            (if (drops.isEmpty) "" else drops.toSeq.sorted.mkString(" [", ", ", "]")))
        }
        val allDrops = ledgers.flatMap(_._3).toSet
        val disagreements = allDrops.toSeq.sorted.flatMap { d =>
          val in = ledgers.filter(_._3.contains(d)).map(_._1)
          val out = ledgers.filterNot(_._3.contains(d)).map(_._1)
          if (out.isEmpty) None
          else Some(s"ledger: DISAGREEMENT: drop '$d' present in " +
            s"{${in.mkString(", ")}} but absent from {${out.mkString(", ")}}")
        }
        disagreements.foreach(println)
        if (disagreements.isEmpty && ledgers.nonEmpty)
          println(s"ledger: consistent — ${ledgers.size} store(s) agree " +
            s"on ${allDrops.size} drop(s)")
        val rowCounts =
          a.dedupStore.filter(sd => Store.exists(spark, sd)).map(sd =>
            ("--dedup-store", sd, Store.load(spark, sd).count())).toSeq ++
          a.clusterStore.map(sd => ("--cluster-store", sd,
            graft.vector.ClusterStore.loadVectors(spark, sd).count())) ++
          a.annIndex.map(sd => ("--ann-index", sd,
            spark.read.parquet(s"$sd/codes").count()))
        rowCounts.foreach { case (flag, sd, n) =>
          val unit = flag match {
            case "--dedup-store" => "signature"; case "--cluster-store" => "vector"
            case _ => "code"
          }
          println(s"ledger: $flag $sd: $n $unit row(s)")
        }
        // MACHINE-READABLE artifact (r10 VERDICT #7): the same facts the
        // prose above states, as one parquet a compliance system can
        // diff tickets against without scraping stdout. One row per
        // (ledgered store, drop) with its cross-store disagreement bit,
        // plus one `rowcount` row per doc-granular store. CliSpec
        // asserts these rows equal the printed report.
        a.ledgerReportOut.foreach { outPath =>
          import spark.implicits._
          val dropRows = ledgers.flatMap { case (flag, sd, drops) =>
            drops.toSeq.sorted.map { d =>
              val everywhere = ledgers.forall(_._3.contains(d))
              ("drop", flag, sd, Option(d), Option.empty[Long], !everywhere)
            }
          }
          val countRows = rowCounts.map { case (flag, sd, n) =>
            ("rowcount", flag, sd, Option.empty[String], Option(n), false)
          }
          (dropRows ++ countRows)
            .toDF("kind", "store_flag", "store_dir", "drop_id", "n_rows",
              "disagreement")
            .coalesce(1).write.mode("overwrite").parquet(outPath)
          println(s"ledger: report written to $outPath")
        }
      }
      return
    }
    a.compactStore.foreach(_ => require(
      a.dedupStore.isDefined || a.fpStore.isDefined || a.hashStore.isDefined,
      "--compact-store needs --dedup-store, --fp-store or --hash-store <dir>"))
    require(a.input.nonEmpty && a.out.nonEmpty,
      "usage: -I <corpus.parquet> -O <out> [--format parquet|orc|json|csv] " +
        "[--scrub-pii] [--remove-boilerplate df] [--boilerplate-w w] " +
        "[--benchmark p] [--lm-trusted p] [--lm-min-ppm n] [--lm-store dir] " +
        "[--profile-store dir] [--drop-id id] " +
        "[--dedup] [--dedup-store dir] [--fp-store dir] [--hash-store dir] " +
        "[--hash-modalities csv] [--hash-win n] [--hash-tile n] " +
        "[--hash-bwin n] [--retrieve-spans dir] " +
        "[--retrieve-clips dir] [--retrieve-crops dir] " +
        "[--dup-graph-stats col] " +
        "[--span-stats] " +
        "[--min-tokens n] [--max-tokens n] [--bpe-merges path] [--bpe-learn n] " +
        "[--eval-k n] [--eval-by col] " +
        "[--mixture s=pm,...] [--mixture-default pm] [--mixture-by col] " +
        "[--temperature-by col] " +
        "[--sample perMille] [--pack maxTokens] [--shards n] " +
        "[--compact-store n] [--manifest] [--novelty-store dir] " +
        "[--takedown ticket.parquet] [--ledger-report] [--ledger-report-out dir] " +
        "[--cluster-store dir] [--ann-index dir] " +
        "[--span-store dir] [--span-remove-drop id] [--scrub-spans] " +
        "[--manifest-store dir] [--chunk-store dir] [--postings-store dir] " +
        "[--classifier-store dir] [--classifier-label col] " +
        "[--dsir-store dir] [--dsir-target path] [--sketch-store dir] " +
        "[--freq-store dir] [--freq-width n|auto[:target]] [--freq-raw drop=rawDir] " +
        "[--sample-store dir] [--sample-raw drop=rawDir] [--sample-by-lang] " +
        "[--curation-spine] [--spine-ingest] [--spine-stream ckpt] " +
        "[--fp-stream ckpt] [--hash-stream ckpt] " +
        "[--takedown-ids p] [--lm-remove-drop id] [--profile-remove-drop id] " +
        "[--novelty-remove-drop id]")
    val r = pipelineFull(spark, a)
    try {
      Sources.writePartitioned(r.train, a.out, Seq("shard"), Seq("doc_id"))
      // after the main write: _eval is skipped by readers of a.out, and
      // writing second means a failed train write never leaves a dangling
      // eval set behind
      r.eval.foreach(_.write.mode("overwrite").parquet(s"${a.out}/_eval"))
      // _dupgraph: tiny (groups × 1 row) diagnostic, underscore-skipped
      r.dupGraph.foreach(_.repartition(1).write.mode("overwrite")
        .parquet(s"${a.out}/_dupgraph"))
      // _spanstats: per-doc substring-duplication census (docs with spans
      // only), underscore-skipped like _dupgraph
      r.spanStats.foreach(_.write.mode("overwrite")
        .parquet(s"${a.out}/_spanstats"))
      // _fppairs: the drop's partial-copy pairs vs the --fp-store history
      // (doc_a, doc_b, n_shared) — evidence for quarantine policy,
      // underscore-skipped; absent on the bootstrap run (no history yet)
      r.fpPairs.foreach(_.write.mode("overwrite")
        .parquet(s"${a.out}/_fppairs"))
      // _merges: BPE merge table learned from the WRITTEN training corpus
      // (post-filter/dedup — the tokenizer should model the data it will
      // tokenize, not what hygiene removed). Plain 'left right' lines in
      // rank order: the exact format --bpe-merges reads back, so run N+1
      // denominates its budgets in run N's learned tokenizer.
      a.bpeLearn.foreach { n =>
        val merges = graft.text.Bpe.learnMerges(r.train, nMerges = n)
        val p = new org.apache.hadoop.fs.Path(s"${a.out}/_merges")
        val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val os = fs.create(p, true)
        try os.write((merges.mkString("\n") + "\n")
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
        finally os.close()
      }
      // _profile partials: one mergeable stats row per eligible (exact
      // integer / string) column of the WRITTEN training corpus, appended
      // to the profile store under a deterministic drop id (default: md5
      // of the input path) — corpus-level ANALYZE stats then come from
      // ProfileStore.serve without ever rescanning the corpus. Committed
      // only after the train write above succeeded; a re-run of an
      // already-profiled drop skips the append (the store's double-count
      // refusal, read as idempotency at the pipeline level).
      a.profileStore.foreach { pd =>
        import org.apache.spark.sql.types.{ByteType, ShortType, IntegerType, LongType, StringType}
        val dropId = a.profileDropId.getOrElse(defaultDropId(a.input))
        val eligible = r.train.schema.fields.collect {
          case f if Seq(ByteType, ShortType, IntegerType, LongType,
            StringType).contains(f.dataType) => f.name
        }.toSeq.filterNot(ReservedCols.contains)
        require(eligible.nonEmpty,
          "--profile-store: no exact integer/string columns to profile in the output corpus")
        import graft.operators.ProfileStore
        if (!ProfileStore.exists(spark, pd))
          ProfileStore.buildStaged(r.train, eligible, pd, dropId)()
        else if (!ProfileStore.drops(spark, pd).contains(dropId))
          ProfileStore.appendStaged(r.train, eligible, pd, dropId)()
        else warnSkippedDrop("--profile-store", dropId, pd)
      }
      // _manifest: the written corpus's order-independent fingerprint
      // table (count + xor + mod-sum per md5 shard) — the artifact two
      // builds compare to certify byte-identical reproduction without
      // re-reading each other's output. Written AFTER the train write
      // (it certifies what landed), underscore-skipped by readers.
      if (a.manifest) {
        // every output column participates, or the run fails loudly —
        // a silently narrowed certificate would "match" builds that
        // differ in the dropped column (Audit.manifest rejects
        // non-identifier names itself; surface that here, don't filter)
        val cols = r.train.schema.fieldNames.toSeq.filter(_ != "doc_id")
        graft.operators.Audit.manifest(r.train, "doc_id", cols, shards = a.shards)
          .repartition(1).write.mode("overwrite").parquet(s"${a.out}/_manifest")
      }
      // manifest STORE: the written corpus's certificate partials filed
      // under the drop-id discipline — the growing-corpus answer to
      // --manifest (which certifies one run): the whole-history manifest
      // serves from ManifestStore.serve without rescanning any output,
      // and two replicas localize a divergence to the drop via compare().
      // A schema change between runs fails the append loudly (spec
      // mismatch) rather than merging incomparable fingerprints.
      a.manifestStore.foreach { md =>
        import graft.operators.ManifestStore
        val dropId = a.profileDropId.getOrElse(defaultDropId(a.input))
        val cols = r.train.schema.fieldNames.toSeq.filter(_ != "doc_id")
        if (!ManifestStore.exists(spark, md))
          ManifestStore.buildStaged(r.train, md, dropId, "doc_id", cols,
            a.shards)()
        else if (!ManifestStore.drops(spark, md).contains(dropId))
          ManifestStore.appendStaged(r.train, md, dropId, "doc_id", cols,
            a.shards)()
        else warnSkippedDrop("--manifest-store", dropId, md)
      }
      // _chunks: CDC verbatim-share census of THIS drop against the chunk
      // store's history ∪ the drop (q162's operator; read-only scoring
      // written before the append), then the drop's chunk-frequency
      // partials join the store under the drop-id discipline.
      a.chunkStore.foreach { cd =>
        import graft.text.ChunkStore
        val dropId = a.profileDropId.getOrElse(defaultDropId(a.input))
        if (!ChunkStore.exists(spark, cd)) {
          ChunkStore.buildStaged(r.train, cd, dropId)()
        } else {
          ChunkStore.dupStatsVsDrop(r.train, cd)
            .write.mode("overwrite").parquet(s"${a.out}/_chunks")
          if (!ChunkStore.drops(spark, cd).contains(dropId))
            ChunkStore.appendStaged(r.train, cd, dropId)()
          else warnSkippedDrop("--chunk-store", dropId, cd)
        }
      }
      // _hashpairs: perceptual re-encode pairs of THIS drop vs the hash
      // store's history plus intra-drop (HashStore.pairsVsStoreStaged —
      // the read-only pairs land before the append commits, the
      // store-mutation-commits-LAST discipline), then the drop's
      // (doc_id, modality, hash64) rows join the store under the drop-id
      // discipline. History is served from the persisted 17 B/row hash
      // table — never a corpus re-decode. Requires --payload-col: the
      // hashes are computed from the binary payload.
      a.hashStore.foreach { hd =>
        import graft.multimodal.HashStore
        val dropId = a.profileDropId.getOrElse(defaultDropId(a.input))
        val pc = a.payloadCol.getOrElse(throw new IllegalArgumentException(
          "--hash-store needs --payload-col <binary column> — perceptual " +
            "hashes are computed from the payload"))
        val media = r.train.select(col("doc_id"), col(pc).as("payload"))
        val mods = a.hashModalities
          .map(_.split(",").toSeq.map(_.trim).filter(_.nonEmpty))
          .getOrElse(HashStore.Modalities)
        val win = if (a.hashWin > 0) a.hashWin else 1 << 15
        val tile = if (a.hashTile > 0) a.hashTile else 64
        val bwin = if (a.hashBwin > 0) a.hashBwin else 64
        if (!HashStore.exists(spark, hd)) {
          // the bootstrap drop has no history but can carry re-encodes
          // of ITSELF (the FpStore epoch-0 argument): its intra-drop
          // banded pairs land in OUT/_hashpairs BEFORE the build
          // commits — store-mutation-commits-LAST, and a day-1 copy is
          // no longer silently lost
          val commit =
            HashStore.buildStaged(media, hd, dropId, mods, win, tile, bwin)
          HashStore.intraPairs(media, modalities = mods, winSamples = win,
              tilePx = tile, winBytes = bwin)
            .write.mode("overwrite").parquet(s"${a.out}/_hashpairs")
          commit()
        } else if (!HashStore.drops(spark, hd).contains(dropId)) {
          val (pairs, commit) =
            HashStore.pairsVsStoreStaged(media, hd, dropId, modalities = mods)
          pairs.write.mode("overwrite").parquet(s"${a.out}/_hashpairs")
          commit()
        } else warnSkippedDrop("--hash-store", dropId, hd)
      }
      // _retrieved: which stored tracks CONTAIN this run's clips? The
      // probe face of the hash store's audio_win retrieval leg —
      // read-only (probes never enroll), the window size read from the
      // store's stamped _shape recipe; a store without the leg (or a
      // contradicting --hash-win) refuses loudly instead of silently
      // retrieving nothing.
      a.retrieveClips.foreach { hd =>
        import graft.multimodal.HashStore
        val pc = a.payloadCol.getOrElse(throw new IllegalArgumentException(
          "--retrieve-clips needs --payload-col <binary column> — probe " +
            "clips are hashed from the payload"))
        val media = r.train.select(col("doc_id"), col(pc).as("payload"))
        HashStore.retrieveClips(media, hd, winSamples = a.hashWin)
          .write.mode("overwrite").parquet(s"${a.out}/_retrieved")
      }
      // _retrieved_img: the image analog — which stored images CONTAIN
      // this run's crops? Same read-only probe discipline; tile size
      // from the stamped recipe (--hash-tile must match if given).
      a.retrieveCrops.foreach { hd =>
        import graft.multimodal.HashStore
        val pc = a.payloadCol.getOrElse(throw new IllegalArgumentException(
          "--retrieve-crops needs --payload-col <binary column> — probe " +
            "crops are hashed from the payload"))
        val media = r.train.select(col("doc_id"), col(pc).as("payload"))
        HashStore.retrieveCrops(media, hd, tilePx = a.hashTile)
          .write.mode("overwrite").parquet(s"${a.out}/_retrieved_img")
      }
      // _retrieved_span: the byte-universe analog — which stored
      // payloads CONTAIN this run's byte spans? Same read-only probe
      // discipline; window size from the stamped recipe (--hash-bwin
      // must match if given). This is the oracle-checkable retrieval
      // leg (q214) — no decode, pure byte windows.
      a.retrieveSpans.foreach { hd =>
        import graft.multimodal.HashStore
        val pc = a.payloadCol.getOrElse(throw new IllegalArgumentException(
          "--retrieve-spans needs --payload-col <binary column> — probe " +
            "spans are hashed from the payload"))
        val media = r.train.select(col("doc_id"), col(pc).as("payload"))
        HashStore.retrieveSpans(media, hd, winBytes = a.hashBwin)
          .write.mode("overwrite").parquet(s"${a.out}/_retrieved_span")
      }
      // Postings: the drop's inverted-index rows join the store under the
      // drop-id discipline — no read-only scoring artifact, because a
      // retrieval workload is a caller input, not a property of the drop
      // (serve with PostingsStore.bm25TopKVsDrop and a probe of choice).
      a.postingsStore.foreach { pd =>
        import graft.text.PostingsStore
        val dropId = a.profileDropId.getOrElse(defaultDropId(a.input))
        if (!PostingsStore.exists(spark, pd))
          PostingsStore.buildStaged(r.train, pd, dropId)()
        else if (!PostingsStore.drops(spark, pd).contains(dropId))
          PostingsStore.appendStaged(r.train, pd, dropId)()
        else warnSkippedDrop("--postings-store", dropId, pd)
      }
      // Classifier counts: the drop's (label, term, cnt) partials join the
      // store under the drop-id discipline — counts sum-merge, so daily
      // labeled drops accrue into one model and a removal ticket unlearns a
      // drop EXACTLY (q169/q170's operator). Like postings, no read-only
      // artifact: a predict workload is a caller input, served with
      // ClassifyStore.predictVsStore.
      a.classifierStore.foreach { cd =>
        import graft.text.ClassifyStore
        val dropId = a.profileDropId.getOrElse(defaultDropId(a.input))
        require(r.train.columns.contains(a.classifierLabel),
          s"--classifier-store: label column '${a.classifierLabel}' not in " +
            s"the corpus (have: ${r.train.columns.mkString(", ")}) — " +
            "pass --classifier-label")
        if (!ClassifyStore.exists(spark, cd))
          ClassifyStore.buildStaged(r.train, cd, dropId, a.classifierLabel)()
        else if (!ClassifyStore.drops(spark, cd).contains(dropId))
          ClassifyStore.appendStaged(r.train, cd, dropId, a.classifierLabel)()
        else warnSkippedDrop("--classifier-store", dropId, cd)
      }
      // _dsir: importance scores of THIS drop's docs against the stored
      // raw-pool profile ∪ the drop, with --dsir-target as the trusted
      // side (read-only scoring written before the append, like _chunks/
      // _novelty), then the drop's profile partials join the store under
      // the drop-id discipline — the selection model accrues without the
      // raw history ever being re-tokenized.
      a.dsirStore.foreach { dd =>
        import graft.text.DsirStore
        val dropId = a.profileDropId.getOrElse(defaultDropId(a.input))
        if (!DsirStore.exists(spark, dd)) {
          // first drop: the history is empty, so the score's raw side is
          // the drop itself — --dsir-target is honored from day one
          a.dsirTarget.foreach { td =>
            graft.text.Dsir.score(spark.read.parquet(td), r.train)
              .write.mode("overwrite").parquet(s"${a.out}/_dsir")
          }
          DsirStore.buildStaged(r.train, dd, dropId)()
        } else if (!DsirStore.drops(spark, dd).contains(dropId)) {
          // score BEFORE the append (the artifact reflects the drop on
          // arrival) but only for a genuinely NEW drop: on a re-run the
          // history already holds this drop's profile, so scoreVsDrop's
          // raw side would count it twice and silently rewrite a
          // different artifact than the original run produced
          a.dsirTarget.foreach { td =>
            DsirStore.scoreVsDrop(spark.read.parquet(td), r.train, dd)
              .write.mode("overwrite").parquet(s"${a.out}/_dsir")
          }
          DsirStore.appendStaged(r.train, dd, dropId)()
        } else warnSkippedDrop("--dsir-store", dropId, dd)
      }
      // _admission (pre-append): how novel THIS drop is against the
      // stored history — the read-only decision artifact, written
      // BEFORE the registers join the store (the _dsir/_novelty order:
      // score first, ingest second, so the report reflects what the
      // drop looked like on arrival). _saturation (post-append): the
      // distinct-gram growth curve including this drop — the "is new
      // data still novel?" monitor. Both read drops × 256 stored rows;
      // the corpus is hashed once, at its own ingest. Max-merge makes a
      // re-run of an already-stored drop harmless, but the skip keeps
      // the ledger truthful for --takedown.
      a.sketchStore.foreach { kd =>
        import graft.text.SketchStore
        val dropId = a.profileDropId.getOrElse(defaultDropId(a.input))
        // --payload-col routes the novelty registers to the BYTES
        // universe (byte 12-grams of the binary column) — a media drop
        // gets the same front gate; the cfg stamp makes every later
        // append/probe inherit the universe without re-declaring it
        val sketchCol = a.payloadCol.getOrElse("text")
        val sketchUniverse = if (a.payloadCol.isDefined)
          Store.Universe.PayloadBytes else Store.Universe.TextWords
        a.sketchAdmitPpm match {
          // admission-GATED ingest: the verdict (admitted / rejected-
          // stale / skipped-duplicate) is recorded in the store's own
          // _admissions log — auditable state, not stdout — and a stale
          // drop never joins the ledger (q185's decision, closed into
          // the loop)
          case Some(ppm) =>
            val admitted = SketchStore.ingestGated(r.train, kd, dropId, ppm,
              textCol = sketchCol, universe = sketchUniverse)
            println(s"sketch admission: drop '$dropId' " +
              (if (admitted) "admitted" else "skipped") +
              s" — verdict recorded under $kd/_admissions")
          case None =>
            if (!SketchStore.exists(spark, kd)) {
              SketchStore.buildStaged(r.train, kd, dropId,
                textCol = sketchCol, universe = sketchUniverse)()
            } else {
              SketchStore.admission(r.train, kd, textCol = sketchCol)
                .write.mode("overwrite").parquet(s"${a.out}/_admission")
              if (!SketchStore.drops(spark, kd).contains(dropId))
                SketchStore.appendStaged(r.train, kd, dropId,
                  textCol = sketchCol)()
              else warnSkippedDrop("--sketch-store", dropId, kd)
            }
        }
        SketchStore.growthCurve(spark, kd)
          .write.mode("overwrite").parquet(s"${a.out}/_saturation")
      }
      // the frequency-sketch ledger: this drop's ≤ 4096 counter rows
      // join the store under the same deterministic drop-id discipline
      // (sum-merge: a re-run of a stored drop is SKIPPED loudly — a
      // double-append would double-count, unlike the max-merge family)
      a.freqStore.foreach { fd =>
        import graft.text.{FreqSketch, FreqStore}
        val dropId = a.profileDropId.getOrElse(defaultDropId(a.input))
        // --freq-width <n|auto|auto:target>: the CMS width knob, CLI-
        // reachable (the store's error band ε = e/w of total
        // occurrences is a per-deployment decision — see
        // FreqSketch.Width's regime table). Only the BOOTSTRAP sets the
        // width (appends inherit the stamp); `auto` derives it from a
        // one-pass occurrence count of THIS drop via deriveWidth.
        def autoTarget(spec: String): Long =
          if (spec == "auto") 1000L
          else {
            val t = spec.stripPrefix("auto:")
            require(t.nonEmpty && t.forall(_.isDigit),
              s"--freq-width: expected <n>, auto, or auto:<targetOvercount>, got '$spec'")
            t.toLong
          }
        if (!FreqStore.exists(spark, fd)) {
          val width = a.freqWidth match {
            case None => FreqSketch.Width
            case Some(spec) if spec.startsWith("auto") =>
              val n = FreqSketch.grams(r.train).count()
              val w = FreqSketch.deriveWidth(autoTarget(spec), n)
              println(s"freq-store: derived width $w from $n gram " +
                s"occurrences (target overcount ${autoTarget(spec)})")
              w
            case Some(spec) =>
              require(spec.forall(_.isDigit) && spec.toLong > 0,
                s"--freq-width: expected <n>, auto, or auto:<targetOvercount>, got '$spec'")
              spec.toInt
          }
          FreqStore.buildStaged(r.train, fd, dropId, width = width)()
        } else if (!FreqStore.drops(spark, fd).contains(dropId)) {
          val stamped = FreqStore.storedWidth(spark, fd)
          a.freqWidth.foreach {
            case spec if spec.startsWith("auto") =>
              // advisory on append: the width is the store's for life,
              // but auto recomputes the recommendation over the GROWN
              // total (stored exact total + this drop) and says loudly
              // when the stamp is now undersized — the monitoring read
              // that tells an operator to schedule a rebuild
              val n = FreqStore.storedTotal(spark, fd) +
                FreqSketch.grams(r.train).count()
              val rec = FreqSketch.deriveWidth(autoTarget(spec), n)
              if (rec > stamped)
                println(s"freq-store: WARNING width $stamped is undersized " +
                  s"for $n total occurrences (derived recommendation $rec " +
                  s"at target ${autoTarget(spec)}) — appends continue at " +
                  "the stamp; schedule a rebuild to resize")
            case spec =>
              // an explicit width that contradicts the stamp is a
              // mis-wired pipeline, not a request — refuse, never
              // silently inherit
              require(spec.forall(_.isDigit) && spec.toInt == stamped,
                s"--freq-width $spec contradicts the store's stamped " +
                  s"width $stamped — counters of different widths are " +
                  "incommensurable; rebuild the store to resize")
          }
          FreqStore.appendStaged(r.train, fd, dropId)()
        } else warnSkippedDrop("--freq-store", dropId, fd)
      }
      // the standing-sample ledger: this drop's ≤ k sample rows join
      // the store under the same drop-id discipline (re-runs skipped —
      // a double-append would hand the drop two chances at the cut)
      a.sampleStore.foreach { pd =>
        import graft.text.SampleStore
        val dropId = a.profileDropId.getOrElse(defaultDropId(a.input))
        if (!SampleStore.exists(spark, pd))
          // --sample-by-lang picks the cut discipline at BOOTSTRAP only;
          // appends inherit it from the cfg stamp (mixing is impossible)
          SampleStore.buildStaged(r.train, pd, dropId,
            stratified = a.sampleByLang)()
        else if (!SampleStore.drops(spark, pd).contains(dropId))
          SampleStore.appendStaged(r.train, pd, dropId)()
        else warnSkippedDrop("--sample-store", dropId, pd)
      }
      // _novelty: per-doc first-occurrence novelty of THIS drop against
      // the gram store's history ∪ the drop (read-only scoring, written
      // before the append so the report reflects what the drop found),
      // then the drop's gram partials join the store under the same
      // deterministic drop id discipline as --profile-store. A re-run of
      // an already-ingested drop skips the append (min is idempotent,
      // but the drop ledger stays truthful for --novelty-remove-drop).
      a.noveltyStore.foreach { nd =>
        import graft.text.GramStore
        val dropId = a.profileDropId.getOrElse(defaultDropId(a.input))
        if (!GramStore.exists(spark, nd)) {
          GramStore.buildStaged(r.train, nd, dropId)()
        } else {
          GramStore.noveltyOfDrop(r.train, nd)
            .write.mode("overwrite").parquet(s"${a.out}/_novelty")
          if (!GramStore.drops(spark, nd).contains(dropId))
            GramStore.appendStaged(r.train, nd, dropId)()
          else warnSkippedDrop("--novelty-store", dropId, nd)
        }
      }
      // _spans: repeated-span detection of THIS drop against the span
      // store's gram-df history ∪ the drop (q150's operator; read-only
      // scoring written before the append, like _novelty), then the
      // drop's gram-df partials join the store under the same drop-id
      // discipline — corpus-wide span stats accrue without the history
      // ever being re-tokenized.
      a.spanStore.foreach { sd =>
        import graft.text.SpanStore
        val dropId = a.profileDropId.getOrElse(defaultDropId(a.input))
        if (!SpanStore.exists(spark, sd)) {
          SpanStore.buildStaged(r.train, sd, dropId)()
        } else {
          SpanStore.detectVsDrop(r.train, sd)
            .write.mode("overwrite").parquet(s"${a.out}/_spans")
          if (!SpanStore.drops(spark, sd).contains(dropId))
            SpanStore.appendStaged(r.train, sd, dropId)()
          else warnSkippedDrop("--span-store", dropId, sd)
        }
      }
      // the store mutations commit LAST: a failure anywhere above leaves
      // every store exactly as the run found it, so the retry re-dedups
      // the same drop against the same corpus (idempotent, never empty)
      // and the LM ledger never records a drop whose output was lost
      r.commitStore.foreach(_.apply())
      r.commitLm.foreach(_.apply())
      r.commitFp.foreach(_.apply())
      // maintenance AFTER the commit: compaction sees the just-appended
      // survivors, and a compaction failure can't lose the append (the
      // swap is crash-safe and contents-identical by construction)
      a.compactStore.foreach { n =>
        a.dedupStore.foreach(sd => Store.compact(spark, sd, n))
        a.fpStore.foreach(fd => graft.text.FpStore.compact(spark, fd, n))
      }
    } finally r.cached.foreach(_.unpersist())
  }

  def main(argv: Array[String]): Unit = {
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt)
    try run(spark, argv) finally spark.stop()
  }
}
