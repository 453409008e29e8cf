package org.apache.spark.sql.graft

import java.nio.ByteBuffer

import graft.functions.HashUtil

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass MinHash signature aggregate (SURVEY §7.3: the
  * "TypedImperativeAggregate for streaming-free MinHash signature
  * building" 100 TB option).
  *
  * The explode-based pipeline ([[graft.text.TextAnalysis.minhashSignatures]])
  * materializes numPerm rows per token and shuffles numPerm groups per
  * entity; this aggregate keeps a single `Array[Long]` buffer per group,
  * updates all perms from ONE md5 per token via affine mixing
  * (h_p = a_p·h + b_p, wrapping), partial-aggregates map-side, and merges
  * by element-wise min — shuffle volume drops from
  * O(entities × numPerm × tokens-exploded) rows to one 8·numPerm-byte
  * buffer per entity per partition.
  *
  * Hash family differs from the md5-per-(perm,token) variant by design
  * (one md5 per token instead of numPerm; same estimator statistics) —
  * but it is still oracle-checkable: Java's wrapping `(a·h + b) & 2⁶³−1`
  * equals `(a·h + b) mod 2⁶³` in exact integer arithmetic, which DuckDB
  * reproduces with HUGEINT products (q29's oracle). Mixing constants are
  * md5-derived odd/arbitrary values, deterministic across runs and
  * cluster layouts.
  */
case class MinHashAgg(
    child: Expression,
    numPerm: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)

  // Affine mixing constants (odd multiplier ⇒ bijection mod 2^64).
  private lazy val as: Array[Long] =
    Array.tabulate(numPerm)(p => HashUtil.md5Lower63(s"a:$p") | 1L)
  private lazy val bs: Array[Long] =
    Array.tabulate(numPerm)(p => HashUtil.md5Lower63(s"b:$p"))

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(numPerm)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = HashUtil.md5Lower63(v.asInstanceOf[UTF8String])
      var p = 0
      while (p < numPerm) {
        val hp = (as(p) * h + bs(p)) & Long.MaxValue
        if (hp < buf(p)) buf(p) = hp
        p += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var p = 0
    while (p < numPerm) { if (b2(p) < b1(p)) b1(p) = b2(p); p += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * numPerm)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(numPerm)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MinHashAgg =
    copy(child = newChildren.head)

  override def prettyName: String = "graft_minhash_agg"
}
