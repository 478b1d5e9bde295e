package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

/** Engine extension point: registers graft's native Catalyst expressions
  * into the session's function registry (usable from both the Column API
  * via `call_function` and plain SQL).
  *
  * Install with `.withExtensions(new GraftExtensions)` (done by
  * `graft.Sessions.local`) or `spark.sql.extensions=graft.functions.GraftExtensions`
  * on spark-submit — the standard SparkSessionExtensions mechanism, so a
  * cluster deployment needs no code changes.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("minhash_signature"),
      new ExpressionInfo(classOf[MinHashSignature].getName, "minhash_signature"),
      (children: Seq[Expression]) => children match {
        case Seq(c, Literal(n: Int, IntegerType)) => MinHashSignature(c, n)
        case _ => throw new IllegalArgumentException(
          "usage: minhash_signature(array<string>, <int literal numHashes>)")
      }))
    ext.injectFunction((
      new FunctionIdentifier("simhash_bits"),
      new ExpressionInfo(classOf[SimHashBits].getName, "simhash_bits"),
      (children: Seq[Expression]) => children match {
        case Seq(c, Literal(n: Int, IntegerType)) => SimHashBits(c, n)
        case _ => throw new IllegalArgumentException(
          "usage: simhash_bits(array<bigint>, <int literal bits>)")
      }))
    ext.injectFunction((
      new FunctionIdentifier("topk_values"),
      new ExpressionInfo(classOf[TopKValues].getName, "topk_values"),
      (children: Seq[Expression]) => children match {
        case Seq(c, Literal(n: Int, IntegerType)) => TopKValues(c, n)
        case _ => throw new IllegalArgumentException(
          "usage: topk_values(<bigint col>, <int literal k>)")
      }))
    ext.injectFunction((
      new FunctionIdentifier("hyperplane_sig"),
      new ExpressionInfo(classOf[HyperplaneSig].getName, "hyperplane_sig"),
      (children: Seq[Expression]) => children match {
        case Seq(c, Literal(b: Int, IntegerType), Literal(d: Int, IntegerType)) =>
          HyperplaneSig(c, b, d)
        case _ => throw new IllegalArgumentException(
          "usage: hyperplane_sig(array<bigint>, <int literal bits>, <int literal dims>)")
      }))
    ext.injectFunction((
      new FunctionIdentifier("bpe_encode"),
      new ExpressionInfo(classOf[BpeEncode].getName, "bpe_encode"),
      (children: Seq[Expression]) => children match {
        case Seq(w, m) => BpeEncode(w, m)
        case _ => throw new IllegalArgumentException(
          "usage: bpe_encode(array<string> words, array<string> literal merges)")
      }))
    ext.injectOptimizerRule(_ => graft.plans.RangeJoinRule)
    ext.injectPlannerStrategy(_ => graft.plans.TopKPerKeyStrategy)
    ext.injectFunction((
      new FunctionIdentifier("vector_dot"),
      new ExpressionInfo(classOf[VectorDot].getName, "vector_dot"),
      (children: Seq[Expression]) => children match {
        case Seq(a, b) => VectorDot(a, b)
        case _ => throw new IllegalArgumentException(
          "usage: vector_dot(array<bigint>, array<bigint>)")
      }))
  }
}
