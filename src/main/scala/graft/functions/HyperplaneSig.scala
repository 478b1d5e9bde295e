package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression computing a `bits`-wide random-hyperplane
  * LSH signature of a quantized (array<long>) vector in ONE pass.
  *
  * Bit i = [⟨plane_i, q⟩ > 0], where plane_i's j-th component is the
  * deterministic ±1 sign drawn from the parity of the first hex digit of
  * md5("i:j") — identical to the declarative
  * `VectorOps.hyperplaneSigDeclarative` (sum of per-bit `vector_dot`
  * CASEs against literal planes) and to the DuckDB oracle, which
  * evaluates the same md5 expression in SQL. Exact-integer decisions ⇒
  * partitioning-independent.
  *
  * Why native (same rationale as [[SimHashBits]]/[[MinHashSignature]]):
  * the declarative form is a `bits`-term sum of separate vector_dot
  * expressions — a multi-hundred-KB codegen unit at 48+ bits that falls
  * out of whole-stage codegen and evaluates as a deep interpreted tree
  * (measured 3.6 s for a 48-bit signature over 200k rows vs ~0.2 s for
  * this flat loop). The sign matrix is materialized once per task
  * instance, not per row, and the whole signature is bits×dims fused
  * multiply-adds in one JVM loop.
  *
  * Parity edges: on an input whose length ≠ `dims` — AND on a NULL
  * input — the declarative form (and the DuckDB oracle) yields 0 (each
  * vector_dot nulls, each CASE falls through), mirrored here explicitly:
  * eval handles null itself instead of inheriting null-intolerant
  * propagation, so a null embedding lands in band 0 in both engines
  * rather than silently vanishing from the Spark-side LSH joins only.
  */
final case class HyperplaneSig(child: Expression, bits: Int, dims: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "hyperplane_sig"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 0L else nullSafeEval(v)
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) if bits >= 1 && bits <= 63 && dims >= 1 =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"hyperplane_sig needs bits in [1,63] and dims >= 1, got ($bits, $dims)")
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"hyperplane_sig needs array<bigint>, got $other")
    }

  // ±1 sign matrix, flat bits×dims. Expression instances are per-task and
  // single-threaded (cf. MinHashSignature digest hoist), so one lazy
  // materialization per task — not per row — is safe.
  @transient private lazy val signs: Array[Byte] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val out = new Array[Byte](bits * dims)
    var i = 0
    while (i < bits) {
      var j = 1
      while (j <= dims) {
        md.reset()
        val d = md.digest(s"$i:$j".getBytes("UTF-8"))
        out(i * dims + j - 1) = if (((d(0) >> 4) & 1) == 1) 1 else -1
        j += 1
      }
      i += 1
    }
    out
  }

  override def nullSafeEval(input: Any): Any = {
    val q = input.asInstanceOf[ArrayData]
    if (q.numElements() != dims) return 0L // declarative-parity on length mismatch
    // declarative parity on null ELEMENTS too: one null slot nulls every
    // per-bit dot, so when(dot > 0) is false for all bits → signature 0.
    // Reading past the check would treat the slot as 0 (UnsafeArrayData)
    // and hash the row into a DIFFERENT band than the oracle.
    var k = 0
    while (k < dims) {
      if (q.isNullAt(k)) return 0L
      k += 1
    }
    val m = signs
    var sig = 0L
    var i = 0
    while (i < bits) {
      var acc = 0L
      val base = i * dims
      var j = 0
      while (j < dims) {
        // subtract/add instead of multiply: signs are ±1
        if (m(base + j) == 1) acc += q.getLong(j) else acc -= q.getLong(j)
        j += 1
      }
      if (acc > 0) sig |= (1L << i)
      i += 1
    }
    sig
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSig =
    copy(child = newChild)
}

object HyperplaneSig {
  /** Column API; session must carry [[GraftExtensions]]. */
  def of(q: Column, bits: Int, dims: Int): Column =
    call_function("hyperplane_sig", q, lit(bits), lit(dims))
}
