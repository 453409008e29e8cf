package org.apache.spark.sql.graft

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** KMV (k-minimum-values) sketch aggregate over a 63-bit hash column:
  * keeps the k smallest DISTINCT hash values per group and returns them
  * as a sorted ascending array; the k-th smallest estimates the group's
  * distinct count as (k−1)·2⁶³ / kth (Bar-Yossef et al. 2002's
  * bottom-k estimator, public).
  *
  * Differs from [[TopKAgg]] exactly where cardinality estimation needs
  * it: the buffer is a SET (a duplicate hash — the same key observed
  * twice — must not occupy a second slot, or the sketch would
  * overestimate by counting multiplicity), so KMV composes directly
  * over raw event streams with no distinct-pairs pre-shuffle. The
  * buffer is ≤ k longs, merges are associative set-unions capped at k,
  * and serialize is a flat long array — the state-store footprint in a
  * streaming Complete-mode aggregation is 8k bytes per group,
  * independent of key cardinality (the mergeable-sketch property,
  * incremental form of batch q187).
  */
case class KmvAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  require(k > 0, s"kmv_agg k must be positive, got $k")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kmv_agg requires a BIGINT hash column, got ${child.dataType.sql}")

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def offer(ts: java.util.TreeSet[java.lang.Long], v: Long): Unit = {
    // Skip values that cannot enter a full sketch — avoids add+poll
    // churn on the (overwhelmingly common) large hashes.
    if (ts.size < k || v < ts.last()) {
      ts.add(v)
      if (ts.size > k) ts.pollLast()
    }
  }

  override def update(ts: java.util.TreeSet[java.lang.Long],
                      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) offer(ts, v.asInstanceOf[Long])
    ts
  }

  override def merge(b1: java.util.TreeSet[java.lang.Long],
                     b2: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = b2.iterator()
    while (it.hasNext) offer(b1, it.next())
    b1
  }

  override def eval(ts: java.util.TreeSet[java.lang.Long]): Any = {
    val arr = new Array[Long](ts.size)
    val it = ts.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    new GenericArrayData(arr) // TreeSet iterates ascending — already sorted
  }

  override def serialize(ts: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * ts.size)
    bb.putInt(ts.size)
    val it = ts.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val ts = createAggregationBuffer()
    var i = 0
    while (i < n) { ts.add(bb.getLong); i += 1 }
    ts
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvAgg =
    copy(child = newChildren.head)

  override def prettyName: String = "graft_kmv_agg"
}
