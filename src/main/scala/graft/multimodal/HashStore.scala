package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted PERCEPTUAL-HASH store — the incremental form of the
  * 64-bit-Hamming near-dup legs ([[Binary.nearDupImagePairs]]' dHash,
  * [[Binary.nearDupAudioPairs]]' aHash, [[Binary.byteSimHash]] for
  * opaque payloads): hash every media doc ONCE at ingest, serve each
  * later drop's "is this a re-encode of anything in history?" question
  * from the stored (doc_id, modality, h) table. Before this store the
  * perceptual legs re-decoded and re-hashed the ENTIRE media corpus per
  * question (r15 "what's missing #2") — decode is the expensive step on
  * real media, and the history side only ever needed 16 bytes per doc.
  *
  * Rows are (drop_id, doc_id, modality, h): one 64-bit hash per decodable
  * modality per doc (non-decodable payloads contribute no row — same
  * convention as a too-short doc in the fingerprint store). The ledger
  * lifecycle is the shared [[graft.operators.DropLedger]]: appends are
  * one atomic `drop-<id>/` rename, replays of an enrolled drop id are
  * refused, takedown is doc-keyed delete-and-done ([[removeDocs]] —
  * rows carry no cross-doc state, so removal is exact by construction)
  * with the drop-granular [[removeDrop]] inherited for ticket parity.
  *
  * Serve = the banded 64-bit-Hamming equi-join that the from-scratch
  * legs use, with the STORED side a columnar 16 B/row scan instead of a
  * corpus re-decode: each hash explodes into 4 band keys (image/audio:
  * 16 bits; bytes: 14 — the simhash is 56 wide, see
  * [[Binary.byteSimHash]]), any pair within Hamming ≤ 3 shares ≥ 1 band
  * (pigeonhole, per modality), candidates verify exactly by
  * bit_count(xor). Shuffle = 4 band rows per hash — never an all-pairs
  * comparison, never a corpus decode.
  *
  * 100 TB shape: drop hashing is O(drop) map work (the decode); history
  * is a (doc_id, modality, h) scan at ~17 B/row; the band join shuffles
  * 4 rows/doc on both sides. A degenerate band (flat-color corpora
  * hashing to 0) concentrates candidates the way hot shingles do — the
  * SimHash stop-key guard applies if a corpus hits it.
  *
  * Reference lineage: persisting derived per-record state so later
  * passes skip the rescan is the record-level re-expression of the
  * reference's index rebuild (SparkCaller.java:205-214), the same
  * argument as [[graft.text.FpStore]].
  */
object HashStore extends graft.operators.DropLedger {

  protected def tableName: String = "hashes"
  protected def kind: String = "perceptual-hash store"

  /** The three whole-doc hash legs; build/serve default to all — a doc
    * contributes a row per modality that DECODES (a PNG payload yields
    * image only; every payload yields its byte simhash).
    */
  val Modalities: Seq[String] = Seq("image", "audio", "bytes")

  /** The RETRIEVAL leg (opt-in, never in the default build): windowed
    * audio subfingerprints ([[Binary.extractAudioSubFingerprints]]) —
    * many rows per doc, one per fixed-length window, served by
    * [[retrieveClips]] for the trim/shift question the whole-clip
    * `audio` hash deliberately does not answer.
    */
  val RetrievalModality: String = "audio_win"

  /** Band width per modality: 4 bands over the hash width, so Hamming
    * ≤ 3 implies ≥ 1 equal band. dHash/aHash are 64-bit (4×16); the
    * byte simhash is 56 (4×14 — a 16-bit top band would have only 8
    * live bits and degenerate into a hot key).
    */
  private val BandBits =
    Map("image" -> 16, "audio" -> 16, "audio_win" -> 16, "bytes" -> 14)

  /** Hamming ≤ 3 is the 4-band detection guarantee (pigeonhole). */
  val MaxGuaranteedHamming = 3

  /** (doc_id, modality, h) for the requested modalities — the decode/
    * hash map-only pass every face routes through.
    */
  def hashesFor(media: DataFrame, modalities: Seq[String] = Modalities,
                winSamples: Int = 1 << 15): DataFrame = {
    implicit val s: SparkSession = media.sparkSession
    val known = Modalities :+ RetrievalModality
    val bad = modalities.filterNot(known.contains)
    require(bad.isEmpty && modalities.nonEmpty,
      s"unknown modalities ${bad.mkString(", ")} — pick from $known")
    val dt = media.schema("payload").dataType
    require(dt == org.apache.spark.sql.types.BinaryType,
      s"perceptual hashes are computed from a BINARY payload column, got $dt" +
        " — a string column would silently hash different bytes")
    val legs = modalities.map {
      case "image" => Binary.extractImageHashes(media).toDF()
        .filter(col("is_image"))
        .select(col("doc_id"), lit("image").as("modality"),
          col("dhash").as("h"))
      case "audio" => Binary.extractAudioHashes(media).toDF()
        .filter(col("is_audio"))
        .select(col("doc_id"), lit("audio").as("modality"),
          col("ahash").as("h"))
      case "bytes" => Binary.byteSimHash(media)
        .select(col("doc_id"), lit("bytes").as("modality"), col("h"))
      case "audio_win" => Binary.extractAudioSubFingerprints(media, winSamples)
        .toDF().filter(col("is_audio"))
        .select(col("doc_id"), lit("audio_win").as("modality"),
          col("subhash").as("h"))
    }
    legs.reduce(_.unionByName(_))
  }

  /** Bootstrap from the first drop (overwrites). */
  def build(media: DataFrame, storeDir: String, dropId: String = "base",
            modalities: Seq[String] = Modalities,
            winSamples: Int = 1 << 15): Unit =
    buildStaged(media, storeDir, dropId, modalities, winSamples)()

  def buildStaged(media: DataFrame, storeDir: String,
                  dropId: String = "base",
                  modalities: Seq[String] = Modalities,
                  winSamples: Int = 1 << 15): () => Unit = {
    requireDropId(dropId)
    stagePartialsBuild(
      hashesFor(media, modalities, winSamples)
        .withColumn("drop_id", lit(dropId)),
      storeDir).commit
  }

  /** Append a new drop's hash rows (staged, single-rename atomic
    * commit); a stored drop id is refused — re-appending would report
    * every later pair in both orientations.
    */
  def appendStaged(media: DataFrame, storeDir: String, dropId: String,
                   modalities: Seq[String] = Modalities,
                   winSamples: Int = 1 << 15): () => Unit = {
    requireDropId(dropId)
    val s = media.sparkSession
    requireStore(s, storeDir)
    requireNewDrop(s, storeDir, dropId)
    stagePartialsAppend(
      hashesFor(media, modalities, winSamples)
        .withColumn("drop_id", lit(dropId)),
      storeDir, dropId).commit
  }

  def append(media: DataFrame, storeDir: String, dropId: String,
             modalities: Seq[String] = Modalities,
             winSamples: Int = 1 << 15): Unit =
    appendStaged(media, storeDir, dropId, modalities, winSamples)()

  /** Explode (doc_id, modality, h) into 4 band rows keyed
    * (modality, band_idx, band_val) — the equi-join key; band width per
    * modality ([[BandBits]]), and modality rides the key, so hashes of
    * different legs can never collide.
    */
  private def banded(hashes: DataFrame): DataFrame = hashes
    .select(col("doc_id"), col("modality"), col("h"),
      explode(array((0 until 4).map { b =>
        struct(lit(b).as("band_idx"),
          when(col("modality") === "bytes",
            shiftright(col("h"), b * BandBits("bytes"))
              .bitwiseAND(lit((1L << BandBits("bytes")) - 1)))
            .otherwise(shiftright(col("h"), b * BandBits("image"))
              .bitwiseAND(lit((1L << BandBits("image")) - 1)))
            .as("band_val"))
      }: _*)).as("band"))
    .select(col("doc_id"), col("modality"), col("h"),
      col("band.band_idx").as("band_idx"),
      col("band.band_val").as("band_val"))

  private def pairsFromBands(a: DataFrame, b: DataFrame, cond: Column,
                             maxHamming: Int): DataFrame =
    a.as("a").join(b.as("b"),
        col("a.modality") === col("b.modality") &&
          col("a.band_idx") === col("b.band_idx") &&
          col("a.band_val") === col("b.band_val") && cond)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.modality").as("modality"),
        bit_count(col("a.h").bitwiseXOR(col("b.h"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)

  /** Re-encode pairs of a NEW drop vs the stored history plus intra-drop
    * pairs, then append the drop's hashes — the daily media serve.
    * Output: (doc_a, doc_b, modality, hamming), doc_a always the drop
    * doc; intra-drop pairs ordered doc_a < doc_b.
    */
  def pairsVsStore(drop: DataFrame, storeDir: String, dropId: String,
                   maxHamming: Int = MaxGuaranteedHamming,
                   modalities: Seq[String] = Modalities): DataFrame = {
    val (pairs, commit) =
      pairsVsStoreStaged(drop, storeDir, dropId, maxHamming, modalities)
    commit()
    pairs
  }

  /** [[pairsVsStore]] with the append SPLIT from the mine (pairs now,
    * store mutates when the thunk runs) — the store-mutation-commits-
    * LAST discipline every ledgered family shares.
    */
  def pairsVsStoreStaged(drop: DataFrame, storeDir: String, dropId: String,
                         maxHamming: Int = MaxGuaranteedHamming,
                         modalities: Seq[String] = Modalities)
      : (DataFrame, () => Unit) = {
    requireDropId(dropId)
    val s = drop.sparkSession
    requireStore(s, storeDir)
    requireNewDrop(s, storeDir, dropId)
    val dropHashes =
      graft.text.Dedup.materialize(hashesFor(drop, modalities))
    val pairs = minePairs(s, storeDir, dropHashes, maxHamming)
    val staged = stagePartialsAppend(
      dropHashes.withColumn("drop_id", lit(dropId)), storeDir, dropId)
    (pairs, staged.commit)
  }

  /** Serve-only: same pairs as [[pairsVsStore]], the store never
    * touched — repeatable gates and dry-run probes over a snapshot.
    * `eager=false` is the TVF face (analysis must never run the drop's
    * decode job).
    */
  def pairsVsStoreReadOnly(drop: DataFrame, storeDir: String,
                           maxHamming: Int = MaxGuaranteedHamming,
                           modalities: Seq[String] = Modalities,
                           eager: Boolean = true): DataFrame = {
    val s = drop.sparkSession
    requireStore(s, storeDir)
    val h0 = hashesFor(drop, modalities)
    val dropHashes =
      if (eager) graft.text.Dedup.materialize(h0) else h0.cache()
    minePairs(s, storeDir, dropHashes, maxHamming)
  }

  /** drop×history (doc_a = drop doc) ∪ intra-drop (doc_a < doc_b): the
    * drop's 4-band rows join the stored table's — history is ONE
    * columnar scan of 17 B/row hashes, never a re-decode. Drop ids are
    * assumed NEW (cross pairs exclude same-id only).
    */
  private def minePairs(s: SparkSession, storeDir: String,
                        dropHashes: DataFrame, maxHamming: Int): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= MaxGuaranteedHamming,
      s"4 bands guarantee detection only to hamming $MaxGuaranteedHamming")
    val dp = banded(dropHashes)
    val sp = banded(load(s, storeDir)
      .select(col("doc_id"), col("modality"), col("h")))
    pairsFromBands(dp, sp, col("a.doc_id") =!= col("b.doc_id"), maxHamming)
      .unionByName(
        pairsFromBands(dp, dp, col("a.doc_id") < col("b.doc_id"), maxHamming))
  }

  /** Trim/shift-robust audio retrieval: which stored tracks CONTAIN
    * this probe clip? The probe's windowed subfingerprints
    * ([[RetrievalModality]] — the store must have been built/appended
    * with it, same `winSamples`) run through the same banded Hamming
    * join as the dedup serve, but instead of collapsing to a pair row
    * the matches are COUNTED: n_matched = distinct (probe-window hash,
    * track-window hash) matches within `maxHamming`, so a clip that is
    * really a sub-run of a track scores once per aligned window while a
    * single-window coincidence stays below `minMatched`. A clip trimmed
    * at a hop multiple aligns exactly (Hamming 0 per window); sub-hop
    * trims degrade gracefully (the [[Binary.extractAudioSubFingerprints]]
    * overlap argument). Output: (probe_id, doc_id, n_matched).
    *
    * 100 TB shape: the probe side is clip-scale; the stored side is one
    * columnar scan of the subfingerprint rows (≈ 2 rows per window
    * second at 48 kHz and the default window — still ~17 B/row), banded
    * 4× — never a decode, never all-pairs.
    */
  def retrieveClips(probe: DataFrame, storeDir: String,
                    maxHamming: Int = MaxGuaranteedHamming,
                    minMatched: Int = 2,
                    winSamples: Int = 1 << 15): DataFrame = {
    require(minMatched >= 1, s"minMatched must be >= 1, got $minMatched")
    require(maxHamming >= 0 && maxHamming <= MaxGuaranteedHamming,
      s"4 bands guarantee detection only to hamming $MaxGuaranteedHamming")
    val s = probe.sparkSession
    requireStore(s, storeDir)
    val probeFps = graft.text.Dedup.materialize(
      hashesFor(probe, Seq(RetrievalModality), winSamples))
    val dp = banded(probeFps)
    val sp = banded(load(s, storeDir)
      .filter(col("modality") === RetrievalModality)
      .select(col("doc_id"), col("modality"), col("h")))
    dp.as("a").join(sp.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_val") === col("b.band_val") &&
          col("a.doc_id") =!= col("b.doc_id"))
      .filter(bit_count(col("a.h").bitwiseXOR(col("b.h"))) <= maxHamming)
      .groupBy(col("a.doc_id").as("probe_id"), col("b.doc_id").as("doc_id"))
      .agg(countDistinct(struct(col("a.h"), col("b.h"))).as("n_matched"))
      .filter(col("n_matched") >= minMatched)
  }

  /** Doc-keyed takedown: remove the given documents' hash rows — one
    * left-anti rewrite, crash-safe swap. Exact by construction (no
    * cross-doc state). Returns removed-row count (the audit line).
    * Drop-granular removal is the inherited [[removeDrop]].
    */
  def removeDocs(s: SparkSession, storeDir: String, docIds: DataFrame): Long = {
    requireStore(s, storeDir)
    require(docIds.columns.sameElements(Array("doc_id")),
      s"docIds must be a single-column (doc_id) frame, got: ${docIds.columns.mkString(", ")}")
    val staging = stagingPath(storeDir)
    val before = load(s, storeDir)
    before.join(docIds, Seq("doc_id"), "left_anti")
      .write.mode("overwrite").parquet(staging)
    val removed = before.count() - s.read.parquet(staging).count()
    graft.operators.StoreSwap.swapIn(s, storeDir, tablePath(storeDir),
      staging, "_takedown-old")
    removed
  }
}
