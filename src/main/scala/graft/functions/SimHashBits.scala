package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression computing a SimHash in ONE pass over a
  * precomputed word-hash array.
  *
  * Semantics are bit-identical to the declarative
  * `graft.text.TextOps.simhashFromHashes` (and therefore to the DuckDB
  * oracle): output bit j is set iff the sum over word hashes of
  * (+1 if bit j of the hash is set, else -1) is strictly positive.
  * Integer votes ⇒ order-independent ⇒ safe under any partitioning.
  *
  * Why a native expression (SURVEY.md §4.3 / prompt preference order b):
  * the declarative form runs one interpreted `aggregate` HOF lambda pass
  * per output bit — O(bits × words) lambda evaluations per row, each
  * boxing an accumulator. A 56-bit signature over ~60-word documents is
  * ~3,400 interpreted lambda calls per row; this is one tight JVM loop
  * updating an int[] of vote counters. CodegenFallback is deliberate
  * (same rationale as [[MinHashSignature]]): the loop is already flat
  * branch-light JVM code, so generated Java would only re-inline it.
  */
final case class SimHashBits(child: Expression, bits: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash_bits"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    child.dataType match {
      case ArrayType(LongType, _) if bits >= 1 && bits <= 60 =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash_bits width must be in [1,60], got $bits")
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash_bits needs array<bigint>, got $other")
    }
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    // votes(j) = (#hashes with bit j set) - (#hashes with bit j clear);
    // tracked as 2·setCount - n at the end to halve the inner-loop work.
    val setCounts = new Array[Int](bits)
    var i = 0
    while (i < n) {
      // Parity with the declarative form on null ELEMENTS too: a null hash
      // nulls the aggregate()'d vote sum there, so every `votes > 0` CASE
      // falls through to 0 — i.e. the whole signature is 0.
      if (arr.isNullAt(i)) return 0L
      val h = arr.getLong(i)
      var j = 0
      while (j < bits) {
        setCounts(j) += ((h >>> j) & 1L).toInt
        j += 1
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < bits) {
      if (2 * setCounts(j) - n > 0) out |= (1L << j)
      j += 1
    }
    out
  }

  override protected def withNewChildInternal(newChild: Expression): SimHashBits =
    copy(child = newChild)
}

object SimHashBits {
  /** Column API: one-pass SimHash of an array<bigint> word-hash column.
    * Resolves through the session function registry — the session must be
    * built with [[GraftExtensions]] (graft.Sessions.local does this).
    */
  def of(hashes: Column, bits: Int): Column =
    call_function("simhash_bits", hashes, lit(bits))
}
