package org.apache.spark.sql.graft

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types._

/** Bounded-heap per-group top-k aggregate — the sort-free replacement
  * for the `row_number() OVER (PARTITION BY key ORDER BY ...) <= k`
  * idiom (SURVEY §2.5 W2 / [[graft.ops.Relational.perKeyTopK]]).
  *
  * Spark 4's own `WindowGroupLimit` rule already bounds the window
  * form's shuffle (a Partial limit runs before the exchange), so the
  * win here is not shuffle volume but the SORTS: the window plan sorts
  * every map partition, shuffles, and sorts again on the reduce side —
  * O(n log n) twice; this aggregate keeps a k-capped heap per group
  * (O(n log k), no sort on either side), merges heaps, and returns the
  * packed per-group array in one operator — which is also the shape
  * the rec pipelines consume (exploded lists), saving the second pass.
  *
  * Ordering: Spark's natural (interpreted) ordering of the child type,
  * ASCENDING — the k SMALLEST values survive, returned as a sorted
  * array. For composite / descending ranks, pass a struct whose fields
  * encode the desired order lexicographically (negate numerics for
  * descending; append payload fields after the rank fields — struct
  * ordering compares field-by-field, so trailing payload only breaks
  * exact rank ties, keeping the result total-ordered and deterministic).
  */
case class TopKAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.PriorityQueue[Any]] {

  require(k > 0, s"topk_agg k must be positive, got $k")

  override def dataType: DataType =
    ArrayType(child.dataType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    TypeUtils.checkForOrderingExpr(child.dataType, prettyName)

  @transient private lazy val ord: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(child.dataType)

  override def createAggregationBuffer(): java.util.PriorityQueue[Any] =
    new java.util.PriorityQueue[Any](k, ord.reverse) // max-heap: head = worst kept

  private def offer(pq: java.util.PriorityQueue[Any], v: Any): Unit =
    if (pq.size < k) pq.add(v)
    else if (ord.lt(v, pq.peek)) { pq.poll(); pq.add(v) }

  override def update(pq: java.util.PriorityQueue[Any],
                      input: InternalRow): java.util.PriorityQueue[Any] = {
    val v = child.eval(input)
    // null rank values sort nowhere meaningful — skip them (same
    // semantics as row_number over a null-filtered frame).
    if (v != null) offer(pq, InternalRow.copyValue(v))
    pq
  }

  override def merge(b1: java.util.PriorityQueue[Any],
                     b2: java.util.PriorityQueue[Any]): java.util.PriorityQueue[Any] = {
    val it = b2.iterator()
    while (it.hasNext) offer(b1, it.next())
    b1
  }

  override def eval(pq: java.util.PriorityQueue[Any]): Any = {
    val arr = pq.toArray
    java.util.Arrays.sort(arr, ord.asInstanceOf[Ordering[AnyRef]]
      .asInstanceOf[java.util.Comparator[AnyRef]])
    new GenericArrayData(arr)
  }

  // Serialize via a single-field UnsafeProjection of the child type —
  // generic over any orderable DataType (primitives, strings, structs).
  // The aggregate INSTANCE is shared by every task thread of the
  // operator, and UnsafeProjection reuses one result-row buffer — so the
  // projection must be per-thread, not per-instance (a shared one races
  // under the sort-based ObjectHashAggregate fallback, silently
  // duplicating/losing heap elements).
  @transient private lazy val projTl = new ThreadLocal[UnsafeProjection] {
    override def initialValue(): UnsafeProjection =
      UnsafeProjection.create(Array(child.dataType))
  }

  override def serialize(pq: java.util.PriorityQueue[Any]): Array[Byte] = {
    val proj = projTl.get()
    val rows = new scala.collection.mutable.ArrayBuffer[Array[Byte]](pq.size)
    var total = 4
    val it = pq.iterator()
    while (it.hasNext) {
      // .copy(): the projection reuses ONE result row whose backing
      // array getBytes returns UNCOPIED (it exactly spans the buffer) —
      // without the copy every serialized element aliases the same
      // bytes and the heap collapses to k duplicates of the last value.
      val bytes = proj(InternalRow(it.next())).copy().getBytes
      rows += bytes
      total += 4 + bytes.length
    }
    val bb = ByteBuffer.allocate(total)
    bb.putInt(rows.size)
    rows.foreach { b => bb.putInt(b.length); bb.put(b) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.PriorityQueue[Any] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val pq = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val buf = new Array[Byte](len)
      bb.get(buf)
      val row = new UnsafeRow(1)
      row.pointTo(buf, len)
      pq.add(InternalRow.copyValue(row.get(0, child.dataType)))
      i += 1
    }
    pq
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKAgg =
    copy(child = newChildren.head)

  override def prettyName: String = "graft_topk_agg"
}
