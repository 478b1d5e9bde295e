package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native aggregate (TypedImperativeAggregate — the third native-extension
  * class after scalar expressions and whole-plan operators): the k largest
  * long values per group, evaluated as a bounded min-heap.
  *
  * Why: `sort_array(collect_list(x))[1..k]` materializes EVERY group value
  * into the aggregation buffer (O(group size) memory and shuffle per
  * group — collect_list is the documented way to OOM an executor at
  * 100 TB); this buffer is O(k) no matter how large the group, and the
  * partial/final merge is heap-merge-and-trim, so map-side combine
  * reduces each partition's contribution to ≤ k values per key. Exact
  * integer inputs keep results engine-portable.
  *
  * Output: the kept values sorted descending (deterministic: a multiset
  * of values has exactly one descending ordering).
  */
final case class TopKValues(
    child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.PriorityQueue[Long]] {
  require(k >= 1, s"k must be >= 1, got $k")

  override def children: Seq[Expression] = child :: Nil
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKValues = copy(child = newChildren.head)

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "topk_values"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"topk_values needs bigint input (exact integers only), got $other")
    }

  // Min-heap: head = smallest kept value, displaced by any larger incomer.
  override def createAggregationBuffer(): mutable.PriorityQueue[Long] =
    mutable.PriorityQueue.empty[Long](Ordering.Long.reverse)

  private def add(heap: mutable.PriorityQueue[Long], v: Long): Unit = {
    if (heap.size < k) heap.enqueue(v)
    else if (v > heap.head) { heap.dequeue(); heap.enqueue(v) }
  }

  override def update(
      heap: mutable.PriorityQueue[Long], input: InternalRow): mutable.PriorityQueue[Long] = {
    val v = child.eval(input)
    if (v != null) add(heap, v.asInstanceOf[Long])
    heap
  }

  override def merge(
      a: mutable.PriorityQueue[Long], b: mutable.PriorityQueue[Long]): mutable.PriorityQueue[Long] = {
    b.foreach(add(a, _))
    a
  }

  override def eval(heap: mutable.PriorityQueue[Long]): Any =
    new GenericArrayData(heap.toArray.sorted(Ordering.Long.reverse))

  override def serialize(heap: mutable.PriorityQueue[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(heap.size)
    heap.foreach(out.writeLong)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val heap = createAggregationBuffer()
    var i = 0
    while (i < n) { heap.enqueue(in.readLong()); i += 1 }
    heap
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKValues =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKValues =
    copy(inputAggBufferOffset = newOffset)
}
