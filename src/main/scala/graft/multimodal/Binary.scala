package graft.multimodal

import java.security.MessageDigest

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: treat image/audio/video payloads as opaque
  * `binary` columns plus typed metadata, with per-batch feature extraction
  * through the typed mapPartitions path (the JVM analog of `mapInPandas`
  * batch processing: one iterator of rows per partition, decode amortized
  * across the batch, output schema declared up front).
  *
  * IMAGE and AUDIO decode are REAL: [[decodeImage]] uses `javax.imageio`
  * (PNG / BMP / GIF / JPEG readers ship with the JDK) and [[decodeAudio]]
  * uses `javax.sound.sampled` (WAV / AIFF / AU PCM containers) — zero
  * extra dependencies. [[extractImageFeatures]] / [[extractAudioFeatures]]
  * run them partition-parallel with typed output (dims + integer mean
  * luma + pixel digest; rate/channels/frames + PCM digest). Only
  * compressed codecs with no JDK reader (MP3, video) go through the
  * deterministic `decodeStub` identity; everything around it — binary
  * schema, partition-parallel batch shape, stride sampling ("frame
  * sampling"), digesting — is the same scale-true path: map-only, no
  * shuffle, no driver involvement, output size independent of payload
  * size. The PRODUCTION path for those codecs is
  * [[graft.operators.Pipe.pipeBinaryLongs]]: payloads stream base64-framed
  * through an external `ffmpeg`/`sox`-style decoder, one process per
  * partition — MultimodalSpec drives that recipe end-to-end with a
  * stand-in shell decoder, so swapping in the real binary is a one-line
  * `cmd` change with the plumbing already proven.
  */
object Binary {

  final case class MediaRow(doc_id: Long, payload: Array[Byte])
  final case class MediaFeature(doc_id: Long, n_bytes: Int, md5_hex: String, strided_md5: String)

  private def hex(bytes: Array[Byte]): String =
    bytes.map(b => f"$b%02x").mkString

  private def md5hex(md: MessageDigest, bytes: Array[Byte]): String = {
    md.reset()
    hex(md.digest(bytes))
  }

  /** STUB decode: identity over payload bytes (stands in for
    * image-decode / audio-PCM; swap for a real codec off-container).
    */
  def decodeStub(payload: Array[Byte]): Array[Byte] = payload

  /** "Frame sampling": every `stride`-th byte of the decoded stream,
    * starting at byte 0 — the batch-shape of sampling k frames from a
    * video without materializing all frames.
    */
  def strideSample(decoded: Array[Byte], stride: Int): Array[Byte] =
    Iterator.range(0, decoded.length, stride).map(decoded).toArray

  /** Attach a binary payload column (here synthesized from text — the
    * TESTDATA corpus has no true media; schema/shape are what matter).
    */
  def withPayload(docs: DataFrame): DataFrame =
    docs.withColumn("payload", encode(col("text"), "UTF-8"))

  final case class ImageFeature(doc_id: Long, is_image: Boolean, width: Int,
      height: Int, mean_luma: Long, pixel_md5: String)

  final case class AudioFeature(doc_id: Long, is_audio: Boolean,
      sample_rate: Int, channels: Int, n_frames: Long, pcm_md5: String)

  /** Real audio decode for WAV/AIFF/AU via the JDK's own
    * `javax.sound.sampled` readers (PCM containers — compressed codecs
    * like MP3/AAC have no JDK reader and still fall back to the opaque
    * path). Returns None for payloads no installed reader accepts.
    */
  def decodeAudio(payload: Array[Byte]): Option[javax.sound.sampled.AudioInputStream] =
    try Option(javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(payload)))
    catch { case scala.util.control.NonFatal(_) => None }

  /** Audio feature extraction over (doc_id, payload) partitions: decode
    * (real, JDK sampled-audio), container metadata (rate/channels/frames)
    * and the digest of the raw PCM stream. Non-decodable payloads come
    * through flagged with the digest of the raw bytes — rows are never
    * dropped.
    */
  def extractAudioFeatures(media: DataFrame)(implicit s: SparkSession): Dataset[AudioFeature] = {
    import s.implicits._
    media.select(col("doc_id"), col("payload")).as[MediaRow]
      .mapPartitions { batch =>
        val md = MessageDigest.getInstance("MD5")
        batch.map { row =>
          decodeAudio(row.payload) match {
            case Some(ais) =>
              try {
                val fmt = ais.getFormat
                val pcm = ais.readAllBytes()
                AudioFeature(row.doc_id, is_audio = true,
                  fmt.getSampleRate.toInt, fmt.getChannels, ais.getFrameLength,
                  md5hex(md, pcm))
              } finally ais.close()
            case None =>
              AudioFeature(row.doc_id, is_audio = false, -1, -1, -1L,
                md5hex(md, row.payload))
          }
        }
      }
  }

  /** Real image decode via the JDK's own readers (PNG/BMP/GIF/JPEG).
    * Returns None for payloads no installed reader accepts — callers fall
    * back to the opaque-bytes path instead of failing the task on a
    * corrupt or non-image payload (at corpus scale some always are).
    */
  def decodeImage(payload: Array[Byte]): Option[java.awt.image.BufferedImage] =
    try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload)))
    catch {
      // ImageIO readers throw on truncated/corrupt streams (IOException,
      // and some readers unchecked variants) — treat all as "not an image"
      case scala.util.control.NonFatal(_) => None
    }

  /** Row-major 8-bit luma plane of a decoded image: integer BT.601
    * (r·299 + g·587 + b·114) / 1000 per pixel — deterministic, no float
    * rounding ambiguity across platforms.
    */
  def lumaPlane(img: java.awt.image.BufferedImage): Array[Byte] = {
    val (w, h) = (img.getWidth, img.getHeight)
    val out = new Array[Byte](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val luma = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
          (rgb & 0xff) * 114) / 1000
        out(y * w + x) = luma.toByte
        x += 1
      }
      y += 1
    }
    out
  }

  /** Deterministic nearest-neighbor resize: out(x, y) = src(⌊x·sw/w⌋,
    * ⌊y·sh/h⌋). A hand-rolled pixel loop, NOT Graphics2D rendering —
    * AWT's scaling goes through a platform rendering pipeline whose
    * interpolation can differ across JDK builds; integer index math is
    * bit-reproducible everywhere, which the feature digests require.
    */
  def resizeImage(img: java.awt.image.BufferedImage, w: Int,
                  h: Int): java.awt.image.BufferedImage = {
    require(w > 0 && h > 0, "resize dims must be positive")
    val out = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val (sw, sh) = (img.getWidth, img.getHeight)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        out.setRGB(x, y, img.getRGB(x * sw / w, y * sh / h))
        x += 1
      }
      y += 1
    }
    out
  }

  /** Image feature extraction over (doc_id, payload) partitions: decode
    * (real, JDK ImageIO), dimensions, integer mean luma, and the md5 of
    * the luma plane. Non-decodable payloads come through with
    * `is_image = false` and the digest of the RAW bytes — the row is
    * never dropped, so joins against the media table stay total.
    */
  def extractImageFeatures(media: DataFrame, resizeTo: Option[(Int, Int)] = None)(
      implicit s: SparkSession): Dataset[ImageFeature] = {
    import s.implicits._
    media.select(col("doc_id"), col("payload")).as[MediaRow]
      .mapPartitions { batch =>
        // no executor-disk cache files for the stream decode, and one
        // digest per partition — the batch amortizations this path is for
        javax.imageio.ImageIO.setUseCache(false)
        val md = MessageDigest.getInstance("MD5")
        batch.map { row =>
          decodeImage(row.payload) match {
            case Some(decoded) =>
              // resize-at-extract normalizes every image to the model's
              // input grid (the standard vision-pipeline shape); width/
              // height report the POST-resize dims the features describe
              val img = resizeTo.fold(decoded) { case (w, h) => resizeImage(decoded, w, h) }
              val luma = lumaPlane(img)
              val mean = if (luma.isEmpty) 0L
                else luma.foldLeft(0L)((a, b) => a + (b & 0xff)) / luma.length
              ImageFeature(row.doc_id, is_image = true, img.getWidth, img.getHeight,
                mean, md5hex(md, luma))
            case None =>
              ImageFeature(row.doc_id, is_image = false, -1, -1, -1L,
                md5hex(md, row.payload))
          }
        }
      }
  }

  final case class ImageHash(doc_id: Long, is_image: Boolean, dhash: Long)

  /** 64-bit difference hash (dHash — the standard perceptual image
    * fingerprint): resize to a 9×8 luma grid (deterministic
    * nearest-neighbor + integer BT.601, [[resizeImage]]/[[lumaPlane]]),
    * bit (8y+x) = 1 iff luma(x+1, y) > luma(x, y). Row gradients survive
    * uniform brightness/contrast shifts and recompression — the edits
    * that defeat byte-level digests — so near-identical images land
    * within a few Hamming bits. Integer ops end to end: bit-reproducible
    * across JDKs/platforms (the audit property).
    */
  def dHash64(img: java.awt.image.BufferedImage): Long = {
    val luma = lumaPlane(resizeImage(img, 9, 8))
    var h = 0L
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        if ((luma(y * 9 + x + 1) & 0xff) > (luma(y * 9 + x) & 0xff))
          h |= 1L << (y * 8 + x)
        x += 1
      }
      y += 1
    }
    h
  }

  /** Per-image dHash over (doc_id, payload) partitions — map-only, like
    * every extractor here. Non-decodable payloads flagged, never dropped.
    */
  def extractImageHashes(media: DataFrame)(implicit s: SparkSession): Dataset[ImageHash] = {
    import s.implicits._
    media.select(col("doc_id"), col("payload")).as[MediaRow]
      .mapPartitions { batch =>
        javax.imageio.ImageIO.setUseCache(false)
        batch.map { row =>
          decodeImage(row.payload) match {
            case Some(img) => ImageHash(row.doc_id, is_image = true, dHash64(img))
            case None      => ImageHash(row.doc_id, is_image = false, 0L)
          }
        }
      }
  }

  final case class ImageTileHash(doc_id: Long, is_image: Boolean,
      win_idx: Int, subhash: Long)

  /** Tiled image SUBFINGERPRINTS — the image RETRIEVAL leg the
    * whole-image [[dHash64]] deliberately is not: a crop changes the
    * support of EVERY bit of the 9×8-resized hash (the same argument as
    * trimming vs the proportional audio windows), so "which stored
    * image CONTAINS this crop?" needs fixed-frame sub-hashes. The luma
    * plane is cut into FIXED `tilePx`-square tiles at stride `tilePx`
    * from the top-left, each tile dHashed independently (same 9×8
    * integer recipe — [[resizeImage]]/[[lumaPlane]], bit-reproducible).
    * A crop at a tile-size multiple aligns exactly with a block of the
    * original's tiles (identical hashes, Hamming 0); an arbitrary crop
    * still shares most of each interior tile's content, so the row
    * gradients mostly survive and Hamming grows gracefully — the
    * [[extractAudioSubFingerprints]] overlap argument in 2-D. Images
    * smaller than one tile (or non-decodable payloads) come through
    * flagged, never dropped: a probe crop must be at least one tile to
    * be findable, the same contract the audio leg has.
    */
  def extractImageTileHashes(media: DataFrame, tilePx: Int = 64)(
      implicit s: SparkSession): Dataset[ImageTileHash] = {
    require(tilePx >= 9,
      s"a tile must hold the 9-wide dHash grid, got $tilePx")
    import s.implicits._
    val tile = tilePx
    media.select(col("doc_id"), col("payload")).as[MediaRow]
      .mapPartitions { batch =>
        javax.imageio.ImageIO.setUseCache(false)
        batch.flatMap { row =>
          decodeImage(row.payload) match {
            case Some(img) if img.getWidth >= tile && img.getHeight >= tile =>
              val (cols, rows) = (img.getWidth / tile, img.getHeight / tile)
              for {
                ty <- 0 until rows
                tx <- 0 until cols
              } yield ImageTileHash(row.doc_id, is_image = true,
                ty * cols + tx,
                dHash64(img.getSubimage(tx * tile, ty * tile, tile, tile)))
            case _ => Seq(ImageTileHash(row.doc_id, is_image = false, -1, 0L))
          }
        }
      }
  }

  /** Near-duplicate image pairs: dHash banded into 4 × 16-bit keys, so a
    * pair within `maxHamming` ≤ 3 differing bits has ≥ 1 identical band
    * (pigeonhole) and is found by the banded EQUI join — the q49 SimHash
    * shape on the image path, never an all-pairs comparison. Candidates
    * verified exactly by bit_count(xor). Scale: shuffle is |images| × 4
    * band rows; a degenerate band (e.g. flat-color corpora hashing to 0)
    * concentrates candidates the way hot shingles do — the SimHash
    * stop-key guard applies if a corpus hits it.
    */
  def nearDupImagePairs(media: DataFrame, maxHamming: Int = 3)(
      implicit s: SparkSession): DataFrame =
    bandedHammingPairs(
      extractImageHashes(media).toDF().filter(col("is_image"))
        .select(col("doc_id"), col("dhash").as("h")),
      maxHamming)

  /** The banded 64-bit-Hamming pair tail shared by the image (dHash)
    * and audio (aHash) perceptual legs: 4 × 16-bit bands, so any pair
    * within Hamming ≤ 3 has ≥ 1 identical band (pigeonhole) and is
    * found by the banded EQUI join — never an all-pairs comparison.
    * Candidates verified exactly by bit_count(xor). Shuffle = |rows|×4
    * band rows; a degenerate band (flat-color corpora, silence hashing
    * to 0) concentrates candidates the way hot shingles do — the
    * SimHash stop-key guard applies if a corpus hits it.
    */
  private def bandedHammingPairs(hashes: DataFrame,
                                 maxHamming: Int): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      s"4 bands guarantee detection only to hamming 3, got $maxHamming")
    val banded = hashes.select(col("doc_id"), col("h"),
      explode(array((0 until 4).map(b => struct(
        lit(b).as("band_idx"),
        shiftright(col("h"), b * 16).bitwiseAND(lit(0xffffL)).as("band_val"))): _*))
        .as("band"))
      .select(col("doc_id"), col("h"),
        col("band.band_idx").as("band_idx"), col("band.band_val").as("band_val"))
    banded.as("a").join(banded.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_val") === col("b.band_val") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(col("a.h").bitwiseXOR(col("b.h"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  final case class AudioHash(doc_id: Long, is_audio: Boolean, ahash: Long)

  /** Mono amplitude series of a decoded PCM stream in the signed 16-bit
    * domain: 8/16-bit samples, signed or unsigned, either endianness,
    * any channel count (integer-average downmix); 8-bit samples lift
    * ×256. None for encodings outside plain PCM (A-law/float) — the
    * caller falls back to the flagged-row path, never a task failure.
    * Integer ops end to end (the audit property).
    */
  def pcmMonoSamples(ais: javax.sound.sampled.AudioInputStream): Option[Array[Long]] = {
    import javax.sound.sampled.AudioFormat.Encoding
    val fmt = ais.getFormat
    val bits = fmt.getSampleSizeInBits
    val enc = fmt.getEncoding
    if ((bits != 8 && bits != 16) ||
        (enc != Encoding.PCM_SIGNED && enc != Encoding.PCM_UNSIGNED)) None
    else {
      val bytes = ais.readAllBytes()
      val ch = fmt.getChannels
      val frameSize = fmt.getFrameSize
      val n = bytes.length / frameSize
      val out = new Array[Long](n)
      val be = fmt.isBigEndian
      var f = 0
      while (f < n) {
        var acc = 0L
        var c = 0
        while (c < ch) {
          val off = f * frameSize + c * (bits / 8)
          acc +=
            (if (bits == 8) {
              (if (enc == Encoding.PCM_UNSIGNED) (bytes(off) & 0xff) - 128
               else bytes(off).toInt).toLong << 8
            } else {
              val hi = if (be) bytes(off) else bytes(off + 1)
              val lo = if (be) bytes(off + 1) else bytes(off)
              val raw = ((hi & 0xff) << 8) | (lo & 0xff)
              (if (enc == Encoding.PCM_UNSIGNED) raw - 32768
               else raw.toShort.toInt).toLong
            })
          c += 1
        }
        out(f) = acc / ch
        f += 1
      }
      Some(out)
    }
  }

  /** 64-bit audio difference hash — dHash's recipe on the TIME axis
    * (the content-aware audio fingerprint the dedup taxonomy was
    * missing): the mono amplitude series is cut into 65 proportional
    * windows, each window's mean |amplitude| is its energy, and bit i
    * is 1 iff window i+1 is louder than window i. The energy-envelope
    * GRADIENT survives exactly the re-encodes that rewrite every byte:
    * resampling (windows are proportional, not fixed-length),
    * requantization 16↔8 bit (means scale together), and uniform
    * volume change (comparisons are scale-invariant) — while
    * byte-exact digests and byte-shingle MinHash both see a different
    * file. What it deliberately does NOT survive: trimming or
    * time-shifting (windows re-align) — that is a retrieval problem
    * (chromaprint-style subfingerprint search), not a dedup hash.
    * Comparisons are exact integer cross-multiplies
    * (mean_a > mean_b ⟺ e_a·n_b > e_b·n_a); e·n stays inside a long
    * up to ~10^9 samples (~6 h at 48 kHz mono). None under 65 samples —
    * no meaningful envelope exists.
    */
  def aHash64(samples: Array[Long]): Option[Long] = {
    val n = samples.length
    if (n < 65) None
    else {
      val e = new Array[Long](65)
      val cnt = new Array[Long](65)
      var j = 0
      while (j < 65) {
        var i = (j.toLong * n / 65).toInt
        val end = ((j + 1).toLong * n / 65).toInt
        cnt(j) = end - i
        var sum = 0L
        while (i < end) { sum += math.abs(samples(i)); i += 1 }
        e(j) = sum
        j += 1
      }
      var h = 0L
      var b = 0
      while (b < 64) {
        if (e(b + 1) * cnt(b) > e(b) * cnt(b + 1)) h |= 1L << b
        b += 1
      }
      Some(h)
    }
  }

  /** Per-payload aHash over (doc_id, payload) partitions — map-only.
    * Payloads that don't decode to plain PCM (or are shorter than one
    * envelope) come through flagged, never dropped.
    */
  def extractAudioHashes(media: DataFrame)(implicit s: SparkSession): Dataset[AudioHash] = {
    import s.implicits._
    media.select(col("doc_id"), col("payload")).as[MediaRow]
      .mapPartitions { batch =>
        batch.map { row =>
          decodeAudio(row.payload).flatMap { ais =>
            try pcmMonoSamples(ais).flatMap(aHash64)
            finally ais.close()
          } match {
            case Some(h) => AudioHash(row.doc_id, is_audio = true, h)
            case None    => AudioHash(row.doc_id, is_audio = false, 0L)
          }
        }
      }
  }

  final case class AudioSubFp(doc_id: Long, is_audio: Boolean,
      win_idx: Int, subhash: Long)

  /** Windowed audio SUBFINGERPRINTS — the RETRIEVAL leg the whole-clip
    * [[aHash64]] deliberately is not (its doc says trimming/time-shift
    * re-aligns the proportional windows and defeats the hash): the
    * sample series is cut into FIXED-length windows of `winSamples` at
    * hop = winSamples/2 (50% overlap), each hashed with the same
    * integer energy-envelope recipe — the chromaprint shape on this
    * codebase's primitives. A clip trimmed or shifted by a MULTIPLE of
    * the hop aligns exactly with a run of the track's windows
    * (identical hashes, Hamming 0); a sub-hop shift still shares ≥ 3/4
    * of every window's content, so the envelope gradients mostly
    * survive and the Hamming distance grows gracefully instead of
    * re-randomizing. Integer ops end to end (the audit property).
    * Payloads shorter than one window (or non-PCM) come through
    * flagged, never dropped — a probe clip must be at least one window
    * long to be findable, which is the same contract chromaprint has.
    */
  def extractAudioSubFingerprints(media: DataFrame,
                                  winSamples: Int = 1 << 15)(
      implicit s: SparkSession): Dataset[AudioSubFp] = {
    require(winSamples >= 130,
      s"a window must hold an envelope (>= 130 samples), got $winSamples")
    import s.implicits._
    val win = winSamples
    media.select(col("doc_id"), col("payload")).as[MediaRow]
      .mapPartitions { batch =>
        batch.flatMap { row =>
          val samples = decodeAudio(row.payload).flatMap { ais =>
            try pcmMonoSamples(ais) finally ais.close()
          }
          samples match {
            case Some(sm) if sm.length >= win =>
              val hop = win / 2
              Iterator.range(0, sm.length - win + 1, hop).zipWithIndex
                .flatMap { case (o, i) =>
                  aHash64(java.util.Arrays.copyOfRange(sm, o, o + win))
                    .map(h => AudioSubFp(row.doc_id, is_audio = true, i, h))
                }.toSeq
            case _ => Seq(AudioSubFp(row.doc_id, is_audio = false, -1, 0L))
          }
        }
      }
  }

  /** Near-duplicate audio pairs — the content-aware leg for the audio
    * modality, banded exactly like [[nearDupImagePairs]]: a re-encoded
    * clip (resampled, requantized, volume-normalized) passes every
    * byte-level check ([[nearDupPayloadPairs]] included — re-encoding
    * rewrites every byte) but lands within a few Hamming bits here.
    * Complementary to the byte path the way dHash is for images.
    */
  def nearDupAudioPairs(media: DataFrame, maxHamming: Int = 3)(
      implicit s: SparkSession): DataFrame =
    bandedHammingPairs(
      extractAudioHashes(media).toDF().filter(col("is_audio"))
        .select(col("doc_id"), col("ahash").as("h")),
      maxHamming)

  /** Byte k-shingle set of a HEX-encoded payload column: every k-byte
    * window (stride 1 byte = 2 hex chars), distinct, as 2k-char hex
    * strings — the byte-level analog of [[graft.text.TextOps.shingleSet]]
    * with the same short-input fallback (payloads under k bytes
    * contribute their whole hex string, so tiny payloads dedup by exact
    * bytes). `hx` must be a PROJECTED attribute (not an inline
    * expression): Spark's interpreted higher-order functions re-evaluate
    * captured expressions per element.
    */
  def byteShingles(hx: Column, k: Int = 12): Column = {
    val nW = greatest(lit(1),
      (length(hx) / lit(2)).cast("int") - lit(k - 1))
    array_distinct(transform(sequence(lit(1), nW),
      i => hx.substr((i - lit(1)) * lit(2) + lit(1), lit(2 * k))))
  }

  /** 56-bit SimHash over DISTINCT byte k-grams of the payload — the
    * opaque-payload member of the 64-bit-Hamming perceptual family
    * ([[dHash64]] images / [[aHash64]] audio): container-level edits
    * that keep most byte k-grams (truncation, appended watermark,
    * re-wrap) keep most gram votes, so the hashes land within a few
    * Hamming bits. 56 bits because the gram hashes are the repo's
    * oracle-checkable 14-hex-md5 positive-long domain and a SimHash bit
    * can only vote on a bit its gram hashes carry ([[graft.text.TextOps
    * .simhashFromHashes]]'s width contract) — this is also what makes
    * the [[HashStore]] gate DuckDB-replayable where the decode-dependent
    * dHash/aHash legs are spec-pinned instead. Native one-pass
    * [[graft.functions.SimHashBits]], the q25/q49 hot path.
    */
  def byteSimHash(media: DataFrame, k: Int = 12): DataFrame =
    media
      .select(col("doc_id"),
        org.apache.spark.sql.functions.hex(col("payload")).as("hx"))
      .select(col("doc_id"), byteShingles(col("hx"), k).as("sh"))
      .select(col("doc_id"),
        // element-only lambda: per-gram md5 is inherent work, never a
        // re-evaluated capture (the byteShingles contract)
        transform(col("sh"), g =>
          conv(substring(md5(g), 1, 14), 16, 10).cast("long")).as("hs"))
      .select(col("doc_id"),
        graft.functions.SimHashBits.of(col("hs"), 56).as("h"))

  /** Windowed byte SUBFINGERPRINTS — the RETRIEVAL leg of the byte
    * universe, and the ORACLE-CHECKABLE member of the retrieval family
    * (audio_win / image_tile need a decode; this one is pure byte/hex
    * arithmetic, so a SQL engine can replay it end to end): the payload
    * is cut into FIXED-length windows of `winBytes` at hop = winBytes/2
    * (50% overlap, the [[extractAudioSubFingerprints]] geometry), each
    * window hashed with the [[byteSimHash]] recipe restricted to its own
    * bytes — distinct k-grams voting once, 14-hex-md5 gram hashes,
    * 56-bit SimHash. A span trimmed or shifted by a MULTIPLE of the hop
    * aligns exactly with a run of the source's windows (identical
    * bytes → Hamming 0); a sub-hop shift still shares half of every
    * window and degrades gracefully. Payloads shorter than one window
    * contribute no rows — a probe span must be at least one window long
    * to be findable, the same contract as the audio leg.
    *
    * Fully declarative (no UDF, no mapPartitions): window extraction is
    * posexplode over hex substrings, so the per-window gram work stays
    * inside codegen and the plan is one projection chain over the scan.
    * Output: (doc_id, win_idx, h).
    */
  def byteWindowHashes(media: DataFrame, winBytes: Int = 64,
                       k: Int = 12): DataFrame = {
    require(winBytes >= 2 * k && winBytes % 2 == 0,
      s"a window must hold several $k-byte grams and halve evenly for " +
        s"the 50% hop, got winBytes=$winBytes")
    val hop = winBytes / 2
    media
      .select(col("doc_id"),
        org.apache.spark.sql.functions.hex(col("payload")).as("hx"))
      .filter(length(col("hx")) >= lit(2 * winBytes))
      // window count = floor((len - W)/hop) + 1, computed in hex chars
      .select(col("doc_id"),
        posexplode(transform(
          sequence(lit(0),
            floor((length(col("hx")) - lit(2 * winBytes)) / lit(2.0 * hop))
              .cast("int")),
          i => col("hx").substr(i * lit(2 * hop) + lit(1),
            lit(2 * winBytes)))).as(Seq("win_idx", "wx")))
      .select(col("doc_id"), col("win_idx"),
        byteShingles(col("wx"), k).as("sh"))
      .select(col("doc_id"), col("win_idx"),
        transform(col("sh"), g =>
          conv(substring(md5(g), 1, 14), 16, 10).cast("long")).as("hs"))
      .select(col("doc_id"), col("win_idx"),
        graft.functions.SimHashBits.of(col("hs"), 56).as("h"))
  }

  /** Near-duplicate PAYLOAD pairs — the LSH near-dup machinery on the
    * binary column itself: hex byte shingles → 16-hash MinHash → 4×4
    * LSH bands → bucket equi-join → exact byte-shingle Jaccard ≥ 0.7,
    * reusing the text pipeline's band join and verify stage verbatim
    * ([[graft.text.Dedup.verifiedPairsFromPrep]] — the stages were
    * always shingle-universe-agnostic). This is the dedup a crawled
    * binary corpus needs for container-level duplication: re-wrapped/
    * re-uploaded files, truncations, appended watermarks or metadata
    * blocks — edits that leave long byte runs intact. Recompression
    * (new JPEG quality, resample) rewrites every byte and needs the
    * content-aware leg instead ([[nearDupImagePairs]]' dHash banding);
    * the two are complementary exactly like exact-hash vs MinHash on
    * the text side.
    *
    * Scale shape = the text near-dup's: shingle/sign map-only, one
    * fine-grained band-key shuffle, verify only on candidates. Stride-1
    * shingles fan a P-byte payload to P rows map-side before the
    * distinct (~24 B of shuffle per payload byte) — honest-linear, and
    * a scale-killer on multi-MB media. The SIZE GUARD routes around it:
    * payloads over `maxStride1Bytes` take the BOUNDED path — their
    * shingle set is the winnowed FINGERPRINT set ([[byteFingerprints]],
    * ~2/(w+1) of the gram hashes) fed through the identical LSH band +
    * exact-Jaccard tail, so a 100 MB video costs ~2/9 of its grams in
    * 8 B rows instead of 24 B per byte. Within-cohort semantics:
    * small×small pairs verify on exact byte-shingle Jaccard (unchanged
    * — the gate-corpus path, bit-for-bit); large×large pairs verify on
    * winnow-fingerprint-set Jaccard — a locally-consistent sample of
    * the same shingle universe, so container-level edits (truncation,
    * appended watermark) that keep long byte runs keep most
    * fingerprints. CROSS-boundary pairs (a doc truncated across the
    * threshold) are deliberately NOT auto-mined — that is the
    * partial-copy question, and [[nearDupPayloadPairsByFingerprint]] /
    * [[graft.text.FpStore]] is its dedicated leg; raise
    * `maxStride1Bytes` to force one cohort when the corpus straddles.
    */
  def nearDupPayloadPairs(media: DataFrame, k: Int = 12,
                          thresholdTenths: Int = 7,
                          eager: Boolean = true,
                          maxStride1Bytes: Int = 1 << 20): DataFrame = {
    require(maxStride1Bytes >= k, s"threshold under k=$k shingles nothing")
    val hexed = media
      .select(col("doc_id"),
        org.apache.spark.sql.functions.hex(col("payload")).as("hx"))
    // hex doubles the length; the cutoff must be computed in Long — the
    // docstring advises raising maxStride1Bytes to force one cohort, and
    // an Int `* 2` above Int.MaxValue/2 would overflow negative, silently
    // emptying the small cohort and stranding mid-size payloads in neither
    val smallPrep = hexed
      .filter(length(col("hx")) <= lit(maxStride1Bytes.toLong * 2L))
      .select(col("doc_id"), byteShingles(col("hx"), k).as("sh"))
    // large cohort: distinct fingerprints reassembled into a per-doc
    // SET (sorted strings — array_intersect's element domain), then the
    // same sign/band/verify tail as the small cohort
    val largePrep = byteFingerprints(
        media.filter(length(col("payload")) > maxStride1Bytes), k)
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_set(col("fp").cast("string"))).as("sh"))
    def banded(prep: DataFrame): DataFrame = prep
      .select(col("doc_id"), col("sh"),
        graft.functions.MinHashSignature.of(col("sh"), 16).as("sig"))
      .select(col("doc_id"), col("sh"),
        graft.text.TextOps.lshBands(col("sig"), 4, 4).as("bands"))
    graft.text.Dedup.verifiedPairsFromPrep(banded(smallPrep),
        thresholdTenths, eager)
      .unionByName(graft.text.Dedup.verifiedPairsFromPrep(banded(largePrep),
        thresholdTenths, eager))
  }

  /** Winnowing fingerprints over the BINARY column (Schleimer/Wilkerson/
    * Aiken's MOSS selection applied to byte k-grams): hash every k-byte
    * window of the payload, keep the MINIMUM hash of each sliding window
    * of `w` consecutive grams — guaranteed to detect any shared byte run
    * of length ≥ k + w − 1 between two payloads while selecting only
    * ~2/(w+1) of the gram hashes. This is the SCALE PATH of the binary
    * near-dup taxonomy: [[nearDupPayloadPairs]]' stride-1 shingle prep is
    * honestly linear in payload bytes (~24 B of shuffle per payload
    * byte); winnowing keeps the same per-doc window-partitioned shape but
    * shuffles ~2/(w+1) of the rows at 8 B each, with a detection
    * GUARANTEE MinHash cannot give (MinHash measures whole-set
    * similarity; winnowing catches one long verbatim block inside two
    * otherwise-different payloads — the embedded-copy case).
    *
    * Hashes are md5-derived positive longs in [[graft.text.Winnow]]'s
    * exact domain, and the window-select stage IS Winnow's
    * (`fingerprintsFromHashes` — the winnowing tail was always
    * gram-universe-agnostic, like the LSH tail q204 reuses). Payloads
    * shorter than k + w − 1 bytes yield no fingerprints (no full window
    * exists). Per-doc window partition = one payload's grams: bounded by
    * payload size, never corpus size.
    */
  def byteFingerprints(media: DataFrame, k: Int = 12, w: Int = 8): DataFrame = {
    require(k >= 1 && w >= 1, "k and w must be positive")
    val base = media
      .select(col("doc_id"),
        org.apache.spark.sql.functions.hex(col("payload")).as("hx"))
      .filter(length(col("hx")) >= (k + w - 1) * 2)
      .select(col("doc_id"),
        // hx is a PROJECTED attribute (the byteShingles contract); the
        // per-element md5 is inherent per-gram work, not a re-evaluated
        // capture
        transform(
          sequence(lit(1),
            (length(col("hx")) / lit(2)).cast("int") - lit(k - 1)),
          i => conv(substring(md5(
              col("hx").substr((i - lit(1)) * lit(2) + lit(1), lit(2 * k))),
            1, 14), 16, 10).cast("long")).as("hs"))
    graft.text.Winnow.fingerprintsFromHashes(base, "doc_id", w)
  }

  /** Partial-copy payload pairs by shared winnowing fingerprints —
    * [[graft.text.Winnow.nearDupPairsByFingerprint]] on the bytes
    * universe: payloads sharing ≥ `minShared` fingerprints via the equi
    * self-join on fp, with the stop-fingerprint skew guard (`maxDf`)
    * dropping boilerplate byte runs (shared file headers, container
    * magic, padding blocks) BEFORE the join — one hot fp across a
    * crawled media corpus would otherwise be a single quadratic key.
    */
  def nearDupPayloadPairsByFingerprint(media: DataFrame, k: Int = 12,
                                       w: Int = 8, minShared: Int = 2,
                                       maxDf: Int = 8): DataFrame =
    graft.text.Winnow.pairsFromFingerprints(
      byteFingerprints(media, k, w), "doc_id", minShared, maxDf)

  /** Batch feature extraction over (doc_id, payload) partitions. */
  def extractFeatures(media: DataFrame, stride: Int)(implicit s: SparkSession): Dataset[MediaFeature] = {
    import s.implicits._
    media.select(col("doc_id"), col("payload")).as[MediaRow]
      .mapPartitions { batch =>
        // One digest instance per partition batch, not per row — the
        // mapInPandas-style amortization this path exists for.
        val md = MessageDigest.getInstance("MD5")
        batch.map { row =>
          val decoded = decodeStub(row.payload)
          MediaFeature(
            row.doc_id,
            decoded.length,
            md5hex(md, decoded),
            md5hex(md, strideSample(decoded, stride)))
        }
      }
  }
}
