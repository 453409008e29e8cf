package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** HyperLogLog register aggregate over a 63-bit hash column, precision
  * p = 8: buffer = 256 one-byte registers, update = per-bucket max of
  * the ρ rank (leading-zero count of the low 55 bits, +1), merge =
  * element-wise max — the Flajolet et al. 2007 sketch in its raw
  * register form. Returns the FULL 256-entry register array (zeros
  * included) so callers derive V, the fixed-point Σ2^(56−M) and the
  * raw estimate relationally with the exact q234 formulas — keeping
  * the engine↔oracle contract in one place instead of baking a second
  * copy of the estimator into JVM code.
  *
  * The streaming counterpart of batch q234 exactly as [[KmvAgg]] is of
  * q187: state is a CONSTANT 256 bytes per group (vs KMV's 8k), updates
  * are order-free, merges associative and idempotent — so a
  * Complete-mode streaming aggregation over a raw duplicated event
  * stream converges to bit-identical registers whatever the micro-batch
  * slicing, and the stream-final sketch gates against the same DuckDB
  * oracle as the batch build.
  */
case class HllAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  private final val M = 256 // 2^p, p = 8

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hll_agg requires a BIGINT hash column, got ${child.dataType.sql}")

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](M)

  override def update(reg: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long] // 63-bit non-negative
      val bucket = (h >>> 55).toInt // top 8 of the 63 payload bits
      val rest = h & ((1L << 55) - 1)
      // ρ = 56 − bitlength(rest); rest = 0 ⇒ all 55 bits zero ⇒ 56.
      // (Matches the oracle's `56 - length(bin(rest))` string formula.)
      val rho =
        if (rest == 0L) 56
        else java.lang.Long.numberOfLeadingZeros(rest) - 8
      if (rho > reg(bucket)) reg(bucket) = rho.toByte
    }
    reg
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < M) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(reg: Array[Byte]): Any = {
    val out = new Array[Int](M)
    var i = 0
    while (i < M) { out(i) = reg(i).toInt; i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(reg: Array[Byte]): Array[Byte] = reg.clone()
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes.clone()

  override def withNewMutableAggBufferOffset(newOffset: Int): HllAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HllAgg =
    copy(child = newChildren.head)

  override def prettyName: String = "graft_hll_agg"
}
