package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}

/** Whole-operator extension (prompt preference order c): per-key top-k as a
  * first-class logical + physical operator, registered through
  * `SparkSessionExtensions.injectPlannerStrategy`.
  *
  * Semantics: for each distinct value of `keys`, emit the first `k` child
  * rows under the total order `order` — exactly
  * `row_number() OVER (PARTITION BY keys ORDER BY order) <= k`, but with a
  * fundamentally better physical shape. The built-in window plan must
  * shuffle EVERY row, then fully sort every partition, then run the window
  * function and discard almost everything. This operator runs in two
  * stages, mirroring partial/final aggregation:
  *
  *   1. partial (map side, no distribution requirement): each input
  *      partition keeps a bounded heap of ≤ k rows per key it sees —
  *      O(rows · log k) work, O(keys-per-partition · k) memory, and the
  *      SHUFFLE VOLUME DROPS from n rows to ≤ partitions · keys · k;
  *   2. final (requires ClusteredDistribution(keys), so EnsureRequirements
  *      inserts the hash exchange): merge the partial heads per key and
  *      emit the true top-k. No sort anywhere — heap emission order is
  *      unspecified, as per-key top-k output order is a presentation
  *      concern (q51 sorts for its oracle).
  *
  * At 100 TB with k ≪ rows-per-key (select best alignments per contig,
  * best documents per source bucket, nearest centroids per cell…) the
  * shuffle reduction is the difference between a runnable and an
  * unrunnable plan. The reference's closest analog is keep-best-of-group
  * duplicate marking (daas-apps
  * `sparkcaller/.../preprocessing/DuplicateMarker.java:14-54`) — per-key
  * top-1 via an external tool; this generalizes it record-level.
  *
  * Ties: `order` should be a total order within each key (append a unique
  * tiebreaker) — same requirement as a deterministic window row_number.
  */
final case class TopKPerKeyNode(
    keys: Seq[Expression], order: Seq[SortOrder], k: Int, child: LogicalPlan)
    extends UnaryNode {
  require(k >= 1, s"k must be >= 1, got $k")
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyNode =
    copy(child = newChild)
}

/** Physical per-key bounded-heap top-k; `partial` selects map-side (any
  * distribution) vs final (clustered on `keys`) role — the same partial +
  * exchange + final shape Spark plans for hash aggregation.
  *
  * Memory bound: the partial phase tracks at most `maxPartialKeys` keys
  * (`spark.graft.topk.maxPartialKeys`, default 2¹⁶) × k rows; rows of keys
  * beyond the cap stream through unreduced (graceful degradation toward
  * the window plan's shuffle volume instead of an OOM — the same reason
  * hash aggregation spills rather than growing unboundedly). The final
  * phase is never capped: after the hash exchange each task owns complete
  * key groups, so its live set is one heap per key actually present, and
  * capping there would break correctness.
  */
final case class TopKPerKeyExec(
    keys: Seq[Expression], order: Seq[SortOrder], k: Int, partial: Boolean,
    child: SparkPlan)
    extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    child.outputPartitioning
  override def nodeName: String = if (partial) "TopKPerKeyPartial" else "TopKPerKeyFinal"

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) Seq(UnspecifiedDistribution)
    else if (keys.isEmpty) Seq(AllTuples)
    else Seq(ClusteredDistribution(keys))

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "numKeys" -> SQLMetrics.createMetric(sparkContext, "tracked keys"),
    "passThroughRows" -> SQLMetrics.createMetric(sparkContext,
      "rows passed through unreduced (partial key cap)"))

  override protected def doExecute(): RDD[InternalRow] = {
    val inputAttrs = child.output
    val keyExprs = keys
    val orderExprs = order
    val limit = k
    val maxKeys =
      if (partial) conf.getConfString("spark.graft.topk.maxPartialKeys", "65536").toInt
      else Int.MaxValue
    val outRows = longMetric("numOutputRows")
    val keyCount = longMetric("numKeys")
    val passRows = longMetric("passThroughRows")
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(keyExprs, inputAttrs)
      val rowOrd: Ordering[InternalRow] =
        new LazilyGeneratedOrdering(orderExprs, inputAttrs)
      // Max-heap per key: head = worst kept row; a new row displaces it
      // when strictly better. Rows/keys are copied into heaps — Spark
      // reuses the underlying UnsafeRow buffer across iterator steps.
      // Keys past the cap stream through uncopied and unreduced (see
      // class doc); `++`'s by-name argument makes the heap drain run only
      // after the input (and thus every heap update) is exhausted.
      val heaps = mutable.LinkedHashMap.empty[UnsafeRow, mutable.PriorityQueue[InternalRow]]
      val passThrough = iter.flatMap { row =>
        heaps.get(keyProj(row)) match {
          case Some(heap) =>
            if (heap.size < limit) heap.enqueue(row.copy())
            else if (rowOrd.compare(row, heap.head) < 0) {
              heap.dequeue(); heap.enqueue(row.copy())
            }
            Iterator.empty
          case None if heaps.size < maxKeys =>
            val h = mutable.PriorityQueue.empty[InternalRow](rowOrd)
            h.enqueue(row.copy())
            heaps.put(keyProj(row).copy(), h)
            Iterator.empty
          case None =>
            passRows += 1
            Iterator.single(row)
        }
      }
      (passThrough ++ {
        keyCount += heaps.size
        heaps.valuesIterator.flatMap(_.iterator)
      }).map { r => outRows += 1; r }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

/** Plans [[TopKPerKeyNode]] as partial→(exchange via EnsureRequirements)→
  * final [[TopKPerKeyExec]].
  */
object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(keys, order, k, child) =>
      TopKPerKeyExec(keys, order, k, partial = false,
        TopKPerKeyExec(keys, order, k, partial = true, planLater(child))) :: Nil
    case _ => Nil
  }
}
