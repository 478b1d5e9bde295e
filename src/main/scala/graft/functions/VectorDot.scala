package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native integer dot product of two quantized (array<long>) vectors.
  *
  * Bit-identical to the declarative `VectorOps.dotQ`
  * (aggregate(zip_with(a,b,*),+)) and the DuckDB oracle — exact integer
  * math, so associativity/order don't matter; on UNEQUAL-length inputs
  * both forms return null (zip_with pads the shorter side with nulls,
  * which null out the sum — mirrored here explicitly). Native because
  * Spark evaluates HOF lambdas interpretively (~2 orders of magnitude
  * slower than a flat loop for 64-dim vectors), which dominates
  * brute-force similarity joins (n² pairs × dims element-wise lambda
  * evals).
  *
  * Implements `doGenCode` (not CodegenFallback): the dot product is THE
  * hot expression of the O(n²) embedding joins, and a fallback would both
  * box two ArrayData + the result per pair and split the surrounding
  * whole-stage-codegen span. The generated code is the same tight loop as
  * `nullSafeEval`, inlined into the join's codegen'd consume path.
  */
final case class VectorDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "vector_dot"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"vector_dot needs (array<bigint>, array<bigint>), got $other")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      // a null ELEMENT nulls the whole dot, exactly like the declarative
      // aggregate (null * x = null propagates through the sum) — reading
      // past the check would treat the slot as 0 (UnsafeArrayData) or NPE
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getLong(i) * y.getLong(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = $x.numElements();
         |if ($n != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += $x.getLong($i) * $y.getLong($i);
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorDot =
    copy(left = newLeft, right = newRight)
}

object VectorDot {
  /** Column API; session must carry [[GraftExtensions]]. */
  def of(a: Column, b: Column): Column = call_function("vector_dot", a, b)
}
