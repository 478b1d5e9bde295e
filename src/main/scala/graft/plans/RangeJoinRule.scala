package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/** Optimizer rule rewriting a bounded range join into a bucketed
  * equi-join — the one custom Catalyst extension SURVEY.md §4.3/§7.2
  * flags as plausibly warranted (the reference's interval-scoped
  * realignment, `preprocessing/RealignIndels.java:19-49`, at 100 TB).
  *
  * Pattern (conjuncts in any order, `l`/`r` = join children, `C` a
  * positive long literal):
  *
  *   l ⨝ r ON [k_l = k_r AND]  r_ts > l_ts AND r_ts <= l_ts + C
  *
  * with `l_ts`, `r_ts` long (µs) attribute references. Since
  * 0 < r_ts − l_ts ≤ C implies bucket(r_ts) ∈ {bucket(l_ts),
  * bucket(l_ts)+1} for bucket(x) = x div C, the left side is exploded to
  * those two bucket keys and `bucket = r_ts div C` is added as an
  * EQUI-join key; the original range predicate is kept, so the result is
  * row-identical while the join becomes a shuffled hash/sort-merge join
  * on fine-grained keys:
  *   - without a key equality the naive plan is a BroadcastNestedLoopJoin
  *     (O(n·m) — unrunnable at scale);
  *   - with a low-cardinality/skewed key (user_id with hot users) the
  *     per-key cross product explodes, and bucketing restores balance.
  *
  * Opt-in: `spark.graft.bucketRangeJoin=true` (session conf). The rule
  * leaves any non-matching join untouched and marks rewritten joins via
  * the bucket attribute name so re-application is a no-op.
  * Non-negative timestamps assumed (div truncation = floor).
  */
object RangeJoinRule extends Rule[LogicalPlan] {

  private val BucketCol = "__graft_bucket"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString("spark.graft.bucketRangeJoin", "false").toBoolean) return plan
    plan.transform {
      case j @ Join(l, r, Inner, Some(cond), hint) if !alreadyRewritten(cond) =>
        matchRangePattern(cond, l, r) match {
          case Some((lTs, rTs, width)) =>
            val bucketAttr = AttributeReference(BucketCol, LongType, nullable = true)()
            val w = Literal(width, LongType)
            val lBucket = IntegralDivide(lTs, w)
            val probes = CreateArray(Seq(lBucket, Add(lBucket, Literal(1L))))
            val gen = Generate(
              Explode(probes),
              unrequiredChildIndex = Nil,
              outer = false,
              qualifier = None,
              generatorOutput = Seq(bucketAttr),
              child = l)
            val newCond = And(cond, EqualTo(bucketAttr, IntegralDivide(rTs, w)))
            Project(j.output, Join(gen, r, Inner, Some(newCond), hint))
          case None => j
        }
    }
  }

  private def alreadyRewritten(cond: Expression): Boolean =
    cond.references.exists(_.name == BucketCol)

  /** Returns (l_ts, r_ts, windowMicros) when the conjuncts contain the
    * bounded-range shape with timestamps split across the two sides.
    */
  private def matchRangePattern(
      cond: Expression, l: LogicalPlan, r: LogicalPlan): Option[(AttributeReference, AttributeReference, Long)] = {
    val conjuncts = splitConjuncts(cond)
    val lower = conjuncts.collectFirst {
      // r_ts > l_ts
      case GreaterThan(a: AttributeReference, b: AttributeReference)
        if from(a, r) && from(b, l) => (b, a)
      case LessThan(b: AttributeReference, a: AttributeReference)
        if from(a, r) && from(b, l) => (b, a)
    }
    lower.flatMap { case (lTs, rTs) =>
      conjuncts.collectFirst {
        // r_ts <= l_ts + C
        case LessThanOrEqual(a: AttributeReference, Add(b: AttributeReference, Literal(c: Long, LongType), _))
          if a.semanticEquals(rTs) && b.semanticEquals(lTs) && c > 0 => (lTs, rTs, c)
        case GreaterThanOrEqual(Add(b: AttributeReference, Literal(c: Long, LongType), _), a: AttributeReference)
          if a.semanticEquals(rTs) && b.semanticEquals(lTs) && c > 0 => (lTs, rTs, c)
      }.filter { case (lt, rt, _) => lt.dataType == LongType && rt.dataType == LongType }
    }
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => splitConjuncts(a) ++ splitConjuncts(b)
    case other => Seq(other)
  }

  private def from(a: Attribute, side: LogicalPlan): Boolean =
    side.outputSet.contains(a)
}
