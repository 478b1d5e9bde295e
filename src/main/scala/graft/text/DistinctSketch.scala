package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable distinct-count sketch (HyperLogLog, Flajolet et al. 2007)
  * with an ENGINE-PORTABLE register recipe: every per-value computation
  * is md5 + string ops + integer CASE arithmetic that Spark and DuckDB
  * evaluate bit-identically, so the sketch itself — not a tolerance
  * band around it — hash-gates against the oracle (the same exactness
  * discipline as [[Dsir]]/[[Classify]]'s rational surrogates, applied
  * to a sketch).
  *
  * Why a sketch at all: "how many distinct 5-grams does the corpus
  * hold" is the saturation question a growing training pool asks daily
  * (plateauing distinct mass = new drops add volume, not novelty), and
  * the exact answer is a corpus-wide shuffle of every gram occurrence —
  * at 100 TB, the single most expensive aggregate there is. Registers
  * compress that to `Buckets` rows: the scan stays (it must — every
  * occurrence is hashed once, map-side), but the SHUFFLE drops from
  * |distinct grams| rows to ≤ Buckets × partitions partially-aggregated
  * rows, and the result is mergeable across corpus slices by plain
  * per-bucket MAX — which is what lets [[SketchStore]] accrue it
  * incrementally per drop and never rescan history.
  *
  * Register recipe (m = 256 buckets, pinned by the hex-prefix split):
  * h = md5(value); bucket = first 2 hex chars as an integer (exactly
  * `('0x'||substr(h,1,2))::BIGINT` in DuckDB); rho = position of the
  * first 1-bit in the NEXT 52 bits (13 hex chars), counted 1-based and
  * capped at [[MaxRho]] = 32 — computed at BIT granularity from hex
  * text: 4 bits per leading '0' char plus a 4-way CASE on the first
  * nonzero hex digit ('1'→3, '2'-'3'→2, '4'-'7'→1, '8'-'f'→0 extra
  * zero bits). Bucket bits and rho bits are disjoint substrings of the
  * hash, as HLL requires.
  *
  * Estimate: the raw HLL harmonic-mean estimator in EXACT 64-bit
  * integer arithmetic. With S = Σ_j 2^(MaxRho − rho_j) (empty buckets
  * contribute 2^MaxRho), E = α·m²/Σ 2^(−rho_j) = α·m²·2^MaxRho / S,
  * computed as `(AlphaNumX10k(m)·m² · 2^32) div (10^4 · S)` — every
  * intermediate bounded: S ≤ m·2^32 = 2^40, numerator ≤ 7183·2^16·2^32
  * ≈ 2.02·10^18 < 2^63. The MaxRho cap and the m ≤ 256 bound are what
  * keep this in one BIGINT; both are documented limits, not silent
  * wraps (a capped register would need ≥ ~2^32 distincts landing in ONE
  * bucket — ~10^12 distinct values corpus-wide — before bias appears).
  * No small-range linear-counting branch: ln() has no exact rational
  * surrogate, and the monitoring regime this serves (n ≫ 5m/2 ≈ 640)
  * never enters it — the `occupied` column makes the regime visible,
  * and [[summary]]'s exact-audit column measures the error instead of
  * assuming it. Relative standard error at m = 256 is 1.04/√m ≈ 6.5%.
  *
  * The reference has no sketch surface (its pipeline is file-level
  * scatter/gather, daas-apps `SparkCaller.java:125-344`); this extends
  * SURVEY.md §2's LLM-pipeline set alongside the Misra-Gries heavy
  * hitters (q143) and the equi-depth histogram (q109).
  */
object DistinctSketch {

  /** Register count m — PINNED at 256 by the 2-hex-char bucket split
    * (the portability recipe trades m-flexibility for an exact oracle
    * replay; 6.5% rse is the monitoring-grade point on that trade).
    */
  val Buckets: Int = 256

  /** Register value cap: keeps 2^(MaxRho − rho) sums in 64 bits. */
  val MaxRho: Int = 32

  /** α_m × 10^4, rounded — the HLL bias constant 0.7213/(1 + 1.079/m)
    * as the fixed-point rational the integer estimator uses (m = 256 →
    * 7183). Driver-side, deterministic, embedded as a literal in both
    * engines' arithmetic.
    */
  def alphaX10k(m: Int): Long = {
    require(m >= 128 && m <= 256, s"alpha constant is the m >= 128 " +
      s"large-m form and the estimator's 64-bit bound needs m <= 256, got $m")
    Math.round(0.7213 / (1 + 1.079 / m) * 10000)
  }

  /** Bucket of one value: first 2 md5 hex chars, 0..255 (long for
    * schema parity with the oracle's `::BIGINT`).
    */
  def bucketOf(v: Column): Column =
    conv(substring(md5(v), 1, 2), 16, 10).cast("long")

  /** rho of one value: 1-based first-1-bit position in the 52 bits
    * after the bucket chars, capped at [[MaxRho]]. Pure string/CASE
    * arithmetic — no bit intrinsics, so DuckDB replays it exactly.
    */
  def rhoOf(v: Column): Column = {
    val stripped = regexp_replace(substring(md5(v), 3, 13), "^0*", "")
    val d = substring(stripped, 1, 1)
    val clz = when(d === "1", 3)
      .when(d.isin("2", "3"), 2)
      .when(d.isin("4", "5", "6", "7"), 1)
      .otherwise(0)
    when(length(stripped) === 0, lit(MaxRho))
      .otherwise(least((lit(13) - length(stripped)) * 4 + clz + 1, lit(MaxRho)))
  }

  /** The sketch of a value column: (bucket, rho) with rho = the max
    * over values, OCCUPIED buckets only (≤ m rows). No pre-distinct —
    * duplicates can never raise a max, so the plan is one map-side
    * partial MAX aggregation over raw occurrences: shuffle ≤
    * m × partitions rows however large the input. Sketches of corpus
    * slices max-merge to the union's sketch (the [[SketchStore]]
    * contract).
    */
  def registers(values: DataFrame, valueCol: String = "g"): DataFrame =
    values.select(bucketOf(col(valueCol)).as("bucket"),
        rhoOf(col(valueCol)).as("rho"))
      .groupBy(col("bucket")).agg(max(col("rho")).cast("long").as("rho"))

  /** One gram-occurrence row per word n-gram ([[TextOps.shingles]]
    * semantics incl. the short-doc whole-text fallback). Map-only.
    */
  def grams(docs: DataFrame, textCol: String = "text", n: Int = 5): DataFrame =
    docs.select(col(textCol)).withColumn("__ws", TextOps.words(col(textCol)))
      .select(explode(TextOps.shingles(col("__ws"), n)).as("g"))

  /** Byte n-gram stream of a BINARY column — the bytes-universe analog
    * of [[grams]] for media drops: hex byte shingles
    * ([[graft.multimodal.Binary.byteShingles]] — stride 1, whole-hex
    * fallback under n bytes). Distinct-per-doc where [[grams]] is
    * positional; register values are unaffected (the sketch distincts
    * globally), and the per-doc distinct only shrinks the explode.
    */
  def byteGrams(docs: DataFrame, payloadCol: String = "payload",
                n: Int = 12): DataFrame =
    docs.select(hex(col(payloadCol)).as("__hx"))
      .select(explode(
        graft.multimodal.Binary.byteShingles(col("__hx"), n)).as("g"))

  /** The integer-exact estimate aggregation over grouped registers —
    * shared by [[estimate]] and [[SketchStore.growthCurve]]'s per-prefix
    * variant. Adds (occupied, est_distinct) after the given grouping.
    */
  private[text] def estimateAgg(registers: DataFrame,
                                groupCols: Seq[Column]): DataFrame = {
    val m = Buckets
    val num = alphaX10k(m) * m * m // 7183 * 65536 — see overflow audit above
    val grouped =
      if (groupCols.isEmpty) registers.agg(
        count(lit(1)).as("occupied"),
        sum(expr(s"shiftleft(1L, $MaxRho - rho)")).as("__socc"))
      else registers.groupBy(groupCols: _*).agg(
        count(lit(1)).as("occupied"),
        sum(expr(s"shiftleft(1L, $MaxRho - rho)")).as("__socc"))
    grouped.withColumn("est_distinct",
        expr(s"($num * 4294967296) div " +
          s"(10000 * (($m - occupied) * 4294967296 + coalesce(__socc, 0)))"))
      .drop("__socc")
  }

  /** One-row estimate from a register table: (m, occupied,
    * est_distinct). Constant-size aggregation — the recurring
    * monitoring read.
    */
  def estimate(registers: DataFrame): DataFrame =
    estimateAgg(registers, Seq.empty)
      .select(lit(Buckets.toLong).as("m"), col("occupied").cast("long"),
        col("est_distinct"))

  /** The audited one-pass answer for a document corpus: (m, occupied,
    * est_distinct, n_exact, err_pml) — the sketch estimate NEXT TO the
    * exact distinct n-gram count and the error in integer per-mille.
    * The exact column is the expensive one (a distinct over every gram —
    * the q83-vs-q115 split: audit exact, monitor the sketch); grams are
    * materialized once and feed both sides.
    */
  def summary(docs: DataFrame, textCol: String = "text", n: Int = 5,
              eager: Boolean = true): DataFrame = {
    val g0 = grams(docs, textCol, n)
    val g = if (eager) Dedup.materialize(g0) else g0
    estimate(registers(g))
      .crossJoin(broadcast(g.agg(countDistinct(col("g")).as("n_exact"))))
      .withColumn("err_pml",
        expr("(abs(est_distinct - n_exact) * 1000) div n_exact"))
  }
}
