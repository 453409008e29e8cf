package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Intersection cardinality of two SORTED arrays (int, long, or string
  * elements), as a codegen'd native expression.
  *
  * Replaces `size(array_intersect(a, b))` on the all-pairs Jaccard hot
  * path: the built-in builds a hash set per invocation (boxed, no
  * whole-stage codegen fusion benefit), materializes the intersection
  * array just to take its size, and Catalyst's expression substitution can
  * re-evaluate it several times per row (filter + project + sort keys).
  * This merge-walk is O(|a|+|b|), allocation-free, and reads the
  * `ArrayData` in place — ~10× on the twins benchmark for int items, and
  * ~20× for string tokens (q45), where the built-in's per-element boxing
  * is even heavier.
  *
  * Preconditions: both arrays ascending-sorted with the SAME ordering the
  * comparison uses (produce them with `sort_array`, whose UTF8String
  * binary ordering matches the merge-walk's `compareTo`); nulls inside
  * arrays are not expected (dropped upstream).
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  private def elemType: DataType =
    left.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(lt, _), ArrayType(rt, _)) if lt == rt &&
          (lt == IntegerType || lt == LongType || lt == StringType) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two arrays of a shared element type in " +
          s"{int, bigint, string}; got ${left.dataType.sql} and ${right.dataType.sql}")
    }

  private def method: String = elemType match {
    case IntegerType => "countInt"
    case LongType    => "countLong"
    case StringType  => "countString"
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    elemType match {
      case IntegerType => SortedIntersectCount.countInt(x, y)
      case LongType    => SortedIntersectCount.countLong(x, y)
      case StringType  => SortedIntersectCount.countString(x, y)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"org.apache.spark.sql.graft.SortedIntersectCount.$method($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_sorted_intersect_count"
}

object SortedIntersectCount {
  /** Merge-walk intersection count (int elements); called from generated code. */
  def countInt(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var c = 0L
    while (i < na && j < nb) {
      val x = a.getInt(i)
      val y = b.getInt(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }

  /** Merge-walk intersection count (long elements). */
  def countLong(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var c = 0L
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }

  /** Merge-walk intersection count (string elements, binary ordering —
    * identical to `sort_array`'s UTF8String ordering). */
  def countString(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var c = 0L
    while (i < na && j < nb) {
      val cmp = a.getUTF8String(i).compareTo(b.getUTF8String(j))
      if (cmp == 0) { c += 1; i += 1; j += 1 }
      else if (cmp < 0) i += 1
      else j += 1
    }
    c
  }
}
