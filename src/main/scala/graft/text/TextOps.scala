package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis / deduplication column builders for large-scale training-data
  * pipelines. Everything here is a pure Catalyst column expression — no UDFs,
  * no driver-side loops — so whole-stage codegen applies and the operators
  * scale linearly with executors (the reference's closest analog is the
  * file-at-a-time MarkDuplicates stage, daas-apps
  * `sparkcaller/.../preprocessing/DuplicateMarker.java:14-54`, re-expressed
  * record-level; see SURVEY.md §2.4).
  *
  * Determinism contract: every function is a pure function of its input
  * strings (hash domain = lowercase-hex md5 strings, compared
  * lexicographically in ASCII, identical across engines), so results are
  * reproducible across partitionings and match the DuckDB oracle bit-for-bit.
  */
object TextOps {

  /** Whitespace tokenization. Input corpus contract: single-space separated,
    * already lowercased (documents.text in TESTDATA.md). For arbitrary text
    * use `splitRegex`.
    */
  def words(text: Column): Column = split(text, " ")

  /** Regex tokenization for un-normalized text. */
  def splitRegex(text: Column): Column = split(trim(text), "\\s+")

  /** Word n-gram shingles as space-joined strings. Guarded: a document with
    * fewer than `n` words contributes itself as its only shingle (so no doc
    * silently drops out of the dedup universe).
    *
    * Implementation note: built as a fold of `zip_with` over shifted slices
    * of the words array. HOF *arguments* are evaluated once per row, so the
    * cost is O(n·words) per row even after CollapseProject re-inlines a
    * single-use `split(...)` alias. The naive alternative — a lambda whose
    * BODY references the words column (`slice`/`get` inside `transform`) —
    * re-evaluates that capture per element (interpreted HOFs don't CSE),
    * which turned rows O(words²) and made LSH dedup ~50× slower.
    */
  def shingles(ws: Column, n: Int): Column = {
    val joined = (1 until n).foldLeft(ws)((acc, k) =>
      zip_with(acc, slice(ws, lit(k + 1), size(ws)), (a, b) => concat_ws(" ", a, b)))
    when(size(ws) >= n, slice(joined, lit(1), size(ws) - lit(n - 1)))
      .otherwise(array(array_join(ws, " ")))
  }

  /** Distinct shingle set (Jaccard universe). `ws` MUST be a materialized
    * words column (a cheap reference), not an inline `split(...)` — the
    * indexed lambda reads it O(n) times per element.
    */
  def shingleSet(ws: Column, n: Int): Column =
    array_distinct(shingles(ws, n))

  /** Non-overlapping `w`-word segments, space-joined, INCLUDING the
    * partial tail (a doc of 11 words at w=3 yields segments of
    * 3+3+3+2 words) — the paragraph unit for corpus-level boilerplate
    * removal. Built from the same zip_with fold as `shingles`: the
    * fold's element p is words p..p+w-1 (clamped at the end, because
    * zip_with null-pads the shorter side and concat_ws skips nulls),
    * and the stride filter keeps starts 0, w, 2w, … — the filter lambda
    * reads only its element index, so there is no per-element capture
    * re-evaluation.
    */
  def segments(ws: Column, w: Int): Column = {
    require(w >= 1, "segment width must be >= 1")
    val joined = (1 until w).foldLeft(ws)((acc, k) =>
      zip_with(acc, slice(ws, lit(k + 1), size(ws)), (a, b) => concat_ws(" ", a, b)))
    filter(joined, (_, i) => i % lit(w) === lit(0))
  }

  /** MinHash signature: element i is the min over shingles of an
    * INDEPENDENT 32-bit hash — the (i mod 4)-th big-endian word of
    * md5((i div 4) ++ ":" ++ shingle). One digest yields four words, so a
    * 16-wide signature costs 4 digests per shingle.
    *
    * Independence across signature elements is load-bearing: a
    * Kirsch-Mitzenmacher scheme (h1 + i·h2) makes the per-element argmins
    * correlated, which degrades the LSH band collision probability for
    * unrelated docs from j^r to ≈j and explodes the candidate-pair set
    * ~10⁴× at sf0.1 (measured; q24 went from minutes to seconds after
    * this fix). Distinct digest words are independent; distinct digests
    * trivially so.
    *
    * Engine-portable (md5 hex → base-16 int, same in DuckDB), exact
    * integers, associative min ⇒ partitioning-independent. The hot path
    * uses the native one-pass `graft.functions.MinHashSignature` with
    * identical semantics; this declarative form is the reference/spec.
    */
  def minhash(shingleSet: Column, numHashes: Int): Column =
    array((0 until numHashes).map { i =>
      val group = i / 4
      val off = (i % 4) * 8 + 1
      array_min(transform(shingleSet, s =>
        conv(substring(md5(concat(lit(s"$group:"), s)), off, 8), 16, 10).cast("long")))
    }: _*)

  /** LSH band keys over a minhash signature: `numBands` bands of
    * `rowsPerBand` signature elements, each band hashed to one md5 key.
    * Docs sharing ANY band key are near-dup candidates; with b bands of r
    * rows the detection probability is 1-(1-j^r)^b for Jaccard j (the
    * standard S-curve).
    */
  def lshBands(sig: Column, numBands: Int, rowsPerBand: Int): Column =
    array((0 until numBands).map { b =>
      md5(concat_ws("|",
        (0 until rowsPerBand)
          .map(r => element_at(sig, b * rowsPerBand + r + 1).cast("string")): _*))
    }: _*)

  /** Per-word `4·hexDigits`-bit hashes (first `hexDigits` hex digits of md5,
    * engine-portable via base-16 string conversion; ≤ 15 digits so the value
    * stays a positive long). Materialize this as its own projection before
    * feeding a simhash — one md5 per word total.
    */
  def wordHashesHex(ws: Column, hexDigits: Int): Column = {
    require(hexDigits >= 1 && hexDigits <= 15, "1-15 hex digits fit a positive long")
    transform(ws, w => conv(substring(md5(w), 1, hexDigits), 16, 10).cast("long"))
  }

  /** Per-word 28-bit hashes (historical default width). */
  def wordHashes(ws: Column): Column = wordHashesHex(ws, 7)

  /** SimHash over precomputed word hashes, `bits` wide (≤ hash width): bit j
    * is set iff the sum of ±1 votes (bit j of each word hash) is positive.
    * Integer votes make the result independent of evaluation order — safe
    * under any partitioning.
    *
    * This declarative form is the reference/spec; the hot path uses the
    * native one-pass `graft.functions.SimHashBits` with identical semantics
    * (parity asserted in TextSpec) — the HOF form costs one interpreted
    * `aggregate` pass per output bit.
    */
  def simhashFromHashes(hashes: Column, bits: Int): Column = {
    require(bits <= 60, "bits must fit a positive long (and the hash width)")
    val bitCols = (0 until bits).map { j =>
      val votes = aggregate(
        hashes,
        lit(0L),
        (acc, h) => acc + when(shiftright(h, j).bitwiseAND(lit(1L)) === lit(1L), lit(1L)).otherwise(lit(-1L)))
      when(votes > 0, lit(1L << j)).otherwise(lit(0L))
    }
    bitCols.reduce(_ + _)
  }

  /** Hamming distance between two simhash values (for near-dup pairing). */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Exact whole-document fingerprint. */
  def docFingerprint(text: Column): Column = md5(text)

  /** Content-defined fingerprint: lexicographic min md5 over the shingle
    * set — stable under small edits at either end of the document, unlike
    * the whole-document digest.
    */
  def minShingleFingerprint(shingleSet: Column): Column =
    array_min(transform(shingleSet, s => md5(s)))

  /** Count of tokens in `vocab` (language-ID / stopword scoring building
    * block). `vocab` must be a small literal set — it is inlined into the
    * generated code, no join.
    */
  def vocabHits(ws: Column, vocab: Seq[String]): Column =
    size(filter(ws, w => w.isin(vocab.map(x => x: Any): _*)))

  /** Tiny per-language stopword profiles for the heuristic language
    * identifier. Deliberately minimal: language ID here is a deterministic
    * scoring function, not a model.
    */
  val langProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to"),
    "de" -> Seq("der", "die", "das", "und", "zu"),
    "es" -> Seq("el", "la", "los", "que", "de"),
    "fr" -> Seq("le", "la", "les", "et", "de"))

  /** Predicted language = argmax of profile hit counts, ties broken by
    * profile order then falling back to "und" (undetermined) when no
    * profile scores > 0.
    */
  def langId(ws: Column): Column = {
    val scored = langProfiles.map { case (lang, vocab) => (lang, vocabHits(ws, vocab)) }
    val best = scored.map(_._2).reduce((a, b) => greatest(a, b))
    scored.foldRight(lit("und")) { case ((lang, score), elseCol) =>
      when(score > 0 && score === best, lit(lang)).otherwise(elseCol)
    }
  }
}
