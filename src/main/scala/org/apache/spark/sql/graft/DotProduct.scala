package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Dot product of two float/double arrays as a codegen'd native
  * expression — the inner loop of every embedding-similarity path (kNN
  * scoring, cosine near-dup, IVF distances, random projections).
  *
  * Replaces `aggregate(zip_with(a, b, (x, y) => x*y), 0.0, _+_)`:
  * Catalyst's higher-order functions are CodegenFallback (they break the
  * whole-stage span and run interpreted, one closure call per element)
  * and `zip_with` materializes an intermediate products array per row.
  * This is a single allocation-free loop over both `ArrayData` buffers in
  * generated code.
  *
  * VALUE-IDENTICAL to the HOF form it replaces: elements widen
  * float→double, multiply, and accumulate LEFT-TO-RIGHT from 0.0 — the
  * same IEEE operation sequence — so every oracle-gated consumer hashes
  * the same. Null semantics also mirror the HOF: a null array, a null
  * element, or a length mismatch (zip_with null-pads the shorter side)
  * yields NULL.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(lt, _), ArrayType(rt, _))
        if (lt == FloatType || lt == DoubleType) &&
           (rt == FloatType || rt == DoubleType) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two float/double arrays; got " +
          s"${left.dataType.sql} and ${right.dataType.sql}")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DotProduct.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      isFloat(left), isFloat(right))

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    // the loop is emitted inline — no per-row boxing, no method-call
    // boundary on the innermost O(pairs) path this expression exists for
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("dotN")
      val i = ctx.freshName("dotI")
      val s = ctx.freshName("dotS")
      val getA =
        if (isFloat(left)) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      val getB =
        if (isFloat(right)) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
      s"""
         |int $n = $a.numElements();
         |if ($b.numElements() != $n) { ${ev.isNull} = true; }
         |else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) {
         |      ${ev.isNull} = true; break;
         |    }
         |    $s += $getA * $getB;
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $s; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_dot"
}

object DotProduct {
  /** Left-to-right double accumulation; called from generated code.
    * Returns null (boxed) on length mismatch or a null element — the
    * zip_with/aggregate semantics this expression replaces. */
  def dot(a: ArrayData, b: ArrayData, leftFloat: Boolean,
          rightFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (leftFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (rightFloat) b.getFloat(i).toDouble else b.getDouble(i)
      s += x * y
      i += 1
    }
    java.lang.Double.valueOf(s)
  }
}
