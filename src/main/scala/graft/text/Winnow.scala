package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03 —
  * the MOSS algorithm): hash every k-gram, then keep the MINIMUM hash of
  * each sliding window of `w` consecutive k-grams. The selected
  * fingerprints are guaranteed to detect any shared substring of length
  * ≥ k + w - 1 words between two documents, while storing only
  * ~2/(w+1) of the k-gram hashes — the local, position-robust middle
  * ground between one whole-doc digest (breaks on any edit) and all
  * shingles (k× blowup).
  *
  * Scale shape: one shuffle on doc_id for the per-doc window (partitioned
  * by doc — no global sort), then a distinct on (doc_id, fp); both shuffle
  * metadata-width rows. Hashes are md5-derived positive longs
  * (engine-exact, same domain as [[TextOps.wordHashesHex]]), so the
  * fingerprint sets are oracle-checkable bit-for-bit.
  */
object Winnow {

  /** Candidate near-dup pairs by shared winnowing fingerprints: docs
    * sharing at least `minShared` fingerprints, via an equi self-join on
    * fp — the substring-overlap dedup path (complements MinHash, which
    * measures whole-doc set similarity and can miss two long documents
    * sharing one big verbatim block).
    *
    * Skew guard: fingerprints appearing in more than `maxDf` documents
    * (boilerplate runs — the "stop shingle" problem) are dropped BEFORE
    * the self-join; a fingerprint shared by f docs contributes f² join
    * rows, so one boilerplate fp across a 100 TB corpus would otherwise
    * become a single quadratic hot key. The guard is also why the join
    * stays balanced under AQE: post-filter every fp key has ≤ maxDf rows.
    * Dropping hot fps can only LOWER n_shared, so the result
    * under-reports extremely common runs — the standard trade; raise
    * maxDf if boilerplate itself is the target.
    */
  def nearDupPairsByFingerprint(docs: DataFrame, idCol: String, textCol: String,
                                k: Int = 3, w: Int = 4,
                                minShared: Int = 2, maxDf: Int = 8): DataFrame =
    pairsFromFingerprints(fingerprints(docs, idCol, textCol, k, w), idCol,
      minShared, maxDf)

  /** The fingerprint-join pair stage over any distinct (idCol, fp) frame —
    * shared by the word path above and the byte path
    * ([[graft.multimodal.Binary.byteFingerprints]]): the winnowing tail
    * was always gram-universe-agnostic, like the LSH tail.
    */
  private[graft] def pairsFromFingerprints(fps0: DataFrame, idCol: String,
                                           minShared: Int,
                                           maxDf: Int): DataFrame = {
    require(minShared >= 1 && maxDf >= 2, "minShared >= 1, maxDf >= 2")
    // fps feeds three branches (df counts + both self-join sides) —
    // materialize once instead of re-running the window pipeline 3×
    val fps = Dedup.materialize(fps0)
    val rare = fps.groupBy(col("fp")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf)
      .select(col("fp"))
    val pruned = fps.join(rare, "fp")
    // fingerprints are DISTINCT per doc, so the per-pair row count IS the
    // shared-fingerprint count — no distinct needed before the agg
    pruned.as("a")
      .join(pruned.as("b"),
        col("a.fp") === col("b.fp") && col(s"a.$idCol") < col(s"b.$idCol"))
      .groupBy(col(s"a.$idCol").as("doc_a"), col(s"b.$idCol").as("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** Distinct winnowing fingerprints per document: (idCol, fp) rows.
    * Documents with fewer than k + w - 1 words yield no fingerprints
    * (no full window exists) — filter such docs upstream if every doc
    * must fingerprint (the near-dup taxonomy's short-doc guard).
    */
  def fingerprints(docs: DataFrame, idCol: String, textCol: String,
                   k: Int = 3, w: Int = 4): DataFrame = {
    require(k >= 1 && w >= 1, "k and w must be positive")
    val base = docs.select(col(idCol), TextOps.words(col(textCol)).as("ws"))
      .withColumn("hs",
        transform(TextOps.shingles(col("ws"), k),
          s => conv(substring(md5(s), 1, 14), 16, 10).cast("long")))
      // guard BEFORE windowing: shingles()'s short-doc fallback (the doc
      // itself as one shingle) must not masquerade as a k-gram here
      .filter(size(col("ws")) >= k + w - 1)
    fingerprintsFromHashes(base, idCol, w)
  }

  /** The window-select stage over any (idCol, hs: array<long>) frame of
    * POSITIONAL gram hashes — min per sliding w-window, full windows
    * only, distinct (idCol, fp). The byte path feeds hex-shingle hashes
    * through the identical stage.
    */
  private[graft] def fingerprintsFromHashes(base: DataFrame, idCol: String,
                                            w: Int): DataFrame = {
    val win = Window.partitionBy(col(idCol)).orderBy(col("pos"))
      .rowsBetween(Window.currentRow, w - 1)
    base
      .select(col(idCol), size(col("hs")).as("n"), posexplode(col("hs")).as(Seq("pos", "h")))
      .withColumn("fp", min(col("h")).over(win))
      .filter(col("pos") <= col("n") - w) // only full windows select
      .select(col(idCol), col("fp"))
      .distinct()
  }
}
