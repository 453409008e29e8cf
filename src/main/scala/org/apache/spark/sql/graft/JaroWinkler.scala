package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.types.{AbstractDataType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for [[graft.functions.StringSim.jaroWinkler]]
  * — Jaro–Winkler similarity of two string columns, Spark has no built-in
  * (DuckDB ships `jaro_winkler_similarity`; semantics pinned to it, see
  * [[graft.functions.StringSim]]).
  *
  * Codegen'd `BinaryExpression` (not a Scala UDF): `doGenCode` emits a
  * static call so pair scoring stays inside whole-stage codegen — on the
  * blocked entity-resolution path the score runs once per CANDIDATE pair,
  * fused with the join that produced the pair, no boxing boundary.
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def dataType: DataType = DoubleType
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType, StringType)
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any =
    graft.functions.StringSim.jaroWinkler(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.StringSim.jaroWinkler($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_jaro_winkler"
}
