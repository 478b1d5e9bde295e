package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable frequency sketch (Count-Min, Cormode & Muthukrishnan 2005)
  * with the same ENGINE-PORTABLE discipline as [[DistinctSketch]]:
  * every per-item computation is md5 + substring + integer arithmetic
  * that Spark and DuckDB evaluate bit-identically, so the sketch itself
  * — its counter table AND its point estimates — hash-gates against the
  * oracle with no tolerance band.
  *
  * Why a frequency sketch next to the HLL family: [[DistinctSketch]]
  * answers "how many distinct grams" (saturation); this answers "how
  * often does THIS gram occur corpus-wide" (the per-item frequency a
  * contamination probe, a boilerplate-phrase audit, or a stopword-drift
  * monitor asks) without the corpus-wide per-gram shuffle an exact
  * count needs. The counter table is ≤ [[Depth]]×[[Width]] rows however
  * large the corpus — the scan stays (every occurrence hashed once,
  * map-side), the SHUFFLE drops from |distinct grams| rows to ≤
  * Depth×Width×partitions partially-summed rows — and answering a
  * workload of W probe terms afterwards touches W×Depth rows joined
  * against the ≤ 4096-row broadcast table, the corpus out of the loop.
  *
  * The property that makes it a FAMILY of its own: counters are LINEAR
  * (plain sums). Sketches of disjoint corpus slices sum-merge to the
  * union's sketch ([[FreqStore]]'s serve), and — unlike the max-merge
  * HLL registers, whose takedown is drop-granular — a document's own
  * counters SUBTRACT out exactly: purging docs from a drop needs one
  * scan of the PURGED docs only ([[FreqStore.unlearnDocs]]), not the
  * drop's remainder, not the history.
  *
  * Recipe (d = [[Depth]] rows × w = [[Width]] slots): for row i,
  * slot_i(g) = first 8 md5 hex chars of "i:g" as an integer, mod w —
  * exactly `('0x'||substr(md5(i||':'||g),1,8))::BIGINT % 1024` in
  * DuckDB; the depth tag inside the hashed text gives d independent
  * hash rows from one md5 primitive. Estimate for g = MIN over the d
  * row counters (a slot never probed by any corpus item reads 0).
  * Everything is exact integer arithmetic on BIGINTs: counts ≤ total
  * occurrences, far inside 64 bits at any corpus size.
  *
  * Guarantee (one-sided, deterministic): est ≥ exact ALWAYS (a counter
  * sums its own item plus colliders; min can't go below the item's own
  * count), and est ≤ exact + εN with probability 1−δ over the hash
  * draw, ε = e/w ≈ 0.27%, δ = e^−d ≈ 1.8% (w = 1024, d = 4). The
  * `overcount` audit column measures the actual error next to the
  * estimate instead of assuming the bound — the q178 discipline.
  *
  * The reference has no sketch surface (daas-apps
  * `SparkCaller.java:125-344` is file-level scatter/gather); this
  * extends SURVEY.md §2's LLM-pipeline set alongside [[DistinctSketch]]
  * (distinct counts), the Misra-Gries heavy hitters (q143), and the
  * equi-depth histogram (q109).
  */
object FreqSketch {

  /** Hash rows d — each an independent md5-derived hash via the "i:"
    * tag. δ = e^−d ≈ 1.8% at 4.
    */
  val Depth: Int = 4

  /** Slots per row w, the DEFAULT — a config knob, not a pin: ε = e/w
    * of total occurrences per estimate, so the width is chosen per
    * deployment scale. 1024 (ε ≈ 0.27%) suits the gate-SF fixtures and
    * heavy-hitter monitoring; at 100 TB (~10^13-10^14 gram occurrences)
    * the absolute overcount at w=1024 (~10^11) swamps any non-top-1000
    * probe, so a production store builds at w = 2^20-2^24 — counter
    * table still ≤ Depth×w rows ≈ MBs, 8 orders under the corpus. The
    * width is stamped into the store cfg and every serve derives its
    * probe hashing from the STAMP, so differently-sized deployments
    * coexist and never cross-read ([[FreqStore.storedCfg]]).
    */
  val Width: Int = 1024

  /** Config stamp for [[FreqStore]] — counters over different gram
    * universes or shapes (including width) are incommensurable.
    */
  def cfgOf(gram: Int, width: Int = Width): String = s"g$gram-w$width-d$Depth"

  /** Data-derived width — the `Retrieval.deriveEssentialDfMax` pattern
    * applied to the CMS knob: the smallest power-of-two width whose
    * one-sided Count-Min bound ε·N = (e/w)·totalOccurrences stays within
    * `targetOvercount` ABSOLUTE counts, floored at the [[Width]] default
    * and capped at 2^26 (× [[Depth]] = 2.7·10^8 counter rows ≈ low GBs —
    * past that the sketch stops being "metadata-scale" and an exact
    * count table is the honest tool). Regimes this derives, stated so a
    * deployment can sanity-check its knob:
    *
    *   N = 2·10^6  (gate SF),  target 10^3  →  w = 8192
    *   N = 10^10   (~10 GB corpus), target 10^4  →  w = 2^22
    *   N = 10^13   (100 TB), target 10^6   →  w = 2^25
    *   N = 10^14   (100 TB, char-grams), target 10^6 → capped at 2^26:
    *     the bound is then e·10^14/2^26 ≈ 4·10^6 — the cap names the
    *     point where the one-sided guarantee degrades instead of
    *     silently inflating the store.
    *
    * `totalOccurrences` is a COUNT the caller measures (one agg over the
    * gram frame, or the stored `total()` of an existing ledger) — the
    * knob derives from data, never from a guess.
    */
  def deriveWidth(targetOvercount: Long, totalOccurrences: Long): Int = {
    require(targetOvercount > 0,
      s"targetOvercount must be positive, got $targetOvercount")
    require(totalOccurrences >= 0,
      s"totalOccurrences must be non-negative, got $totalOccurrences")
    val need = math.ceil(
      math.E * totalOccurrences.toDouble / targetOvercount.toDouble).toLong
    var w = Width
    while (w < need && w < (1 << 26)) w <<= 1
    w
  }

  /** Slot of one item in hash row `depth`: first 8 md5 hex chars of
    * "depth:item" (≤ 2^32, exact in a long) mod `width`. Pure
    * string/integer ops — DuckDB replays it bit-identically at any
    * width (the recipe was always parameterized; only the cfg default
    * pins 1024).
    */
  def slotOf(item: Column, depth: Int, width: Int = Width): Column =
    conv(substring(md5(concat(lit(s"$depth:"), item)), 1, 8), 16, 10)
      .cast("long") % width

  /** One gram-occurrence row per word n-gram ([[TextOps.shingles]]
    * semantics incl. the short-doc whole-text fallback — the same
    * universe as [[DistinctSketch.grams]]). Map-only.
    */
  def grams(docs: DataFrame, textCol: String = "text", n: Int = 3): DataFrame =
    docs.select(col(textCol)).withColumn("__ws", TextOps.words(col(textCol)))
      .select(explode(TextOps.shingles(col("__ws"), n)).as("g"))

  /** The counter table of an item column: (depth, slot, cnt), occupied
    * slots only (≤ Depth×Width rows). Each occurrence fans out to
    * [[Depth]] (depth, slot) rows map-side, then one partial-SUM
    * aggregation — shuffle ≤ Depth×Width×partitions rows however large
    * the input. Counters of disjoint corpus slices sum-merge to the
    * union's counters (the [[FreqStore]] contract; slices must
    * PARTITION the data — a doc ingested twice counts twice, the
    * sum-merge family rule).
    */
  def counters(items: DataFrame, itemCol: String = "g",
               width: Int = Width): DataFrame = {
    val rows = (1 to Depth).map(i => struct(
      lit(i.toLong).as("depth"), slotOf(col(itemCol), i, width).as("slot")))
    items.select(explode(array(rows: _*)).as("ds"))
      .select(col("ds.depth"), col("ds.slot"))
      .groupBy(col("depth"), col("slot")).agg(count(lit(1)).as("cnt"))
  }

  /** Point estimates for a probe workload: (term, est) with est = MIN
    * over the [[Depth]] row counters, a never-probed slot reading 0.
    * Plan shape: W probes fan out to W×Depth rows, equi-join the
    * BROADCAST counter table (≤ 4096 rows at any corpus size), one
    * W-sized min aggregation — the corpus never appears.
    */
  def estimates(counters: DataFrame, probes: DataFrame,
                termCol: String = "term", width: Int = Width): DataFrame = {
    val rows = (1 to Depth).map(i => struct(
      lit(i.toLong).as("depth"), slotOf(col(termCol), i, width).as("slot")))
    probes.select(col(termCol), explode(array(rows: _*)).as("ds"))
      .select(col(termCol), col("ds.depth"), col("ds.slot"))
      .join(broadcast(counters), Seq("depth", "slot"), "left")
      .groupBy(col(termCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }

  /** The audited one-pass answer: (term, est, n_exact, overcount) for
    * every distinct gram of the probe docs, estimated from the full
    * corpus's sketch NEXT TO the exact corpus-wide occurrence count.
    * overcount = est − n_exact is ≥ 0 by construction (the one-sided
    * guarantee as a visible column). The exact side is the deliberate
    * audit cost (a per-gram corpus shuffle — the q83-vs-q115 split:
    * audit exact, monitor the sketch); grams are materialized once and
    * feed the sketch, the probe set, and the exact counts.
    */
  def audited(docs: DataFrame, probeDocs: DataFrame,
              textCol: String = "text", n: Int = 3,
              eager: Boolean = true, width: Int = Width): DataFrame = {
    val g0 = grams(docs, textCol, n)
    val g = if (eager) Dedup.materialize(g0) else g0
    val probes = grams(probeDocs, textCol, n)
      .select(col("g").as("term")).distinct()
    val exact = g.groupBy(col("g").as("term"))
      .agg(count(lit(1)).as("n_exact"))
    // left + coalesce: a probe gram the corpus never saw reads exact 0
    // (its estimate is pure collision mass) instead of dropping out
    estimates(counters(g, width = width), probes, width = width)
      .join(exact, Seq("term"), "left")
      .withColumn("n_exact", coalesce(col("n_exact"), lit(0L)))
      .withColumn("overcount", col("est") - col("n_exact"))
  }
}
