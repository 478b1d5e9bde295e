package graft.vector

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding similarity primitives over `array<float>` columns.
  *
  * All similarity DECISIONS (thresholds, rankings) are made on integer
  * arithmetic over quantized vectors: floats are promoted to double
  * (exact), scaled, and rounded to longs, so dot products and norms are
  * exact integers — associative, partitioning-independent, and identical
  * across engines. The only floating-point step is the final
  * `dot/sqrt(na*nb)` display value, a single correctly-rounded IEEE
  * division/sqrt of exact integers, hence also engine-exact.
  *
  * Scale: quantize/dot/sig are map-only codegen'd expressions (no shuffle,
  * no UDF); the brute-force pair join is the O(n²) baseline for small n —
  * the 100 TB path is `hyperplaneSig` LSH bucketing (shuffle on signature,
  * compare within buckets only).
  */
object VectorOps {

  /** Quantize a float vector to longs at `scale` (scale-0 round is
    * engine-exact, unlike fractional-scale round — see q04 lesson).
    * At scale=10⁴ and unit-norm 64-dim vectors: |q_i| ≤ 10⁴,
    * dot ≤ 64·10⁸ ≈ 2³³, na·nb ≤ 2⁶⁶... so CALLERS of products of norms
    * must keep `scale⁴·dims²` < 2⁶³ — scale=10⁴ with unit vectors gives
    * na,nb ≤ ~10⁸·dims which is safe for dims ≤ 64 (na·nb ≤ ~4.1·10¹⁸ < 2⁶³).
    */
  def quantize(v: Column, scale: Int = 10000): Column =
    transform(v, x => round(x.cast("double") * scale).cast("long"))

  /** Exact integer dot product of two quantized vectors. */
  def dotQ(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, x) => acc + x)

  /** Exact integer squared norm. */
  def norm2Q(a: Column): Column = dotQ(a, a)

  /** Cosine similarity from exact integers (single IEEE div+sqrt). */
  def cosineQ(dot: Column, na: Column, nb: Column): Column =
    dot.cast("double") / sqrt((na * nb).cast("double"))

  /** Random-hyperplane LSH signature (`bits` wide) of a quantized vector.
    *
    * Hyperplane i's j-th component is the deterministic ±1 sign drawn from
    * the parity of the first hex digit of md5("i:j") — no RNG, no shipped
    * model, identical in any engine (the DuckDB oracle evaluates the same
    * md5 expression in SQL). Signature bit i = [⟨plane_i, q⟩ > 0], an exact
    * integer decision.
    *
    * Computed by the native one-pass [[graft.functions.HyperplaneSig]]
    * expression (sign matrix materialized once per task, bits×dims fused
    * multiply-adds per row) — bit-identical to
    * [[hyperplaneSigDeclarative]], which is kept as the executable spec:
    * at 48+ bits the declarative sum-of-vector_dots is a multi-hundred-KB
    * codegen unit that falls out of whole-stage codegen and evaluates as
    * an interpreted tree (~18× slower, measured at 48 bits × 200k rows).
    */
  def hyperplaneSig(q: Column, bits: Int, dims: Int): Column =
    graft.functions.HyperplaneSig.of(q, bits, dims)

  /** Declarative formulation of [[hyperplaneSig]] (executable spec for the
    * parity test): the sign matrix is materialized on the driver and
    * shipped as literal arrays; each bit is one `vector_dot` against a
    * constant.
    */
  def hyperplaneSigDeclarative(q: Column, bits: Int, dims: Int): Column = {
    val md = java.security.MessageDigest.getInstance("MD5")
    def sign(i: Int, j: Int): Long = {
      md.reset()
      val d = md.digest(s"$i:$j".getBytes("UTF-8"))
      // parity of the first hex digit = bit 4 of byte 0
      if (((d(0) >> 4) & 1) == 1) 1L else -1L
    }
    val bitCols = (0 until bits).map { i =>
      val plane = typedlit((1 to dims).map(j => sign(i, j)))
      when(graft.functions.VectorDot.of(q, plane) > 0, lit(1L << i))
        .otherwise(lit(0L))
    }
    bitCols.reduce(_ + _)
  }
}
