package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native Catalyst expression computing a full MinHash signature in ONE
  * pass over the shingle array.
  *
  * Semantics are bit-identical to the declarative formulation in
  * `graft.text.TextOps.minhash` (and therefore to the DuckDB oracle):
  * signature element i = min over shingles of the (i mod 4)-th big-endian
  * 32-bit word of md5((i div 4) ++ ":" ++ shingle) — independent hash
  * functions (see TextOps.minhash scaladoc for why independence matters
  * for LSH banding), four signature elements per digest.
  *
  * Why a native expression (SURVEY.md §4.3 / prompt preference order b):
  * the declarative version needs numHashes array-transform passes and a
  * per-row struct array, which serializes a multi-MB expression tree into
  * every task and re-walks the shingles 16×; this runs one tight JVM loop
  * with zero allocation per hash. CodegenFallback is deliberate: the loop
  * is already branch-free JVM code, so generated Java would only re-inline
  * the same loop — the win over the declarative form comes from
  * single-pass + small tree, not from codegen of the combiner.
  */
final case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_signature"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    // range-checked at ANALYSIS time like the sibling expressions
    // (SimHashBits/HyperplaneSig check bits): numHashes = 0 would silently
    // return empty signatures that match nothing; negative would blow up
    // per-row mid-job with NegativeArraySizeException
    if (numHashes < 1 || numHashes > 1024)
      return org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"minhash_signature numHashes must be in [1, 1024], got $numHashes")
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_signature needs array<string>, got $other")
    }
  }

  private val numGroups = (numHashes + 3) / 4

  // Per-task scratch state, hoisted out of the per-row path (JCA provider
  // lookup + prefix re-encoding per row would dominate the loop). Expression
  // instances are deserialized per task and evaluated single-threaded, so
  // one digest per instance is safe; @transient because MessageDigest is not
  // serializable (rebuilt lazily on the executor).
  @transient private lazy val md = MessageDigest.getInstance("MD5")
  @transient private lazy val groupPrefixes: Array[Array[Byte]] =
    Array.tabulate(numGroups)(g => s"$g:".getBytes("UTF-8"))

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var j = 0
    val n = arr.numElements()
    while (j < n) {
      val sBytes = arr.getUTF8String(j).getBytes
      var g = 0
      while (g < numGroups) {
        md.reset()
        md.update(groupPrefixes(g))
        md.update(sBytes)
        val d = md.digest()
        var b = 0
        while (b < 4 && g * 4 + b < numHashes) {
          val i = g * 4 + b
          val h = ((d(b * 4) & 0xffL) << 24) | ((d(b * 4 + 1) & 0xffL) << 16) |
            ((d(b * 4 + 2) & 0xffL) << 8) | (d(b * 4 + 3) & 0xffL)
          if (h < mins(i)) mins(i) = h
          b += 1
        }
        g += 1
      }
      j += 1
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

object MinHashSignature {
  /** Column API: one-pass minhash signature of an array<string> column.
    * Resolves through the session function registry — the session must be
    * built with [[GraftExtensions]] (graft.Sessions.local does this).
    */
  def of(shingles: Column, numHashes: Int): Column =
    call_function("minhash_signature", shingles, lit(numHashes))
}
