package org.apache.spark.sql.graft

import graft.functions.HashUtil

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for [[graft.functions.HashUtil.md5Lower63]].
  *
  * A codegen'd `UnaryExpression` (not a Scala UDF): `doGenCode` emits a
  * direct static call, so the hash participates in whole-stage codegen with
  * no boxing or serialization boundary — the property that keeps
  * MinHash/SimHash signature building executor-side and pipeline-fused
  * with the surrounding scan/explode/aggregate on the 100 TB hot path.
  *
  * Lives under `org.apache.spark.sql` because `AbstractDataType` is
  * `private[sql]` in Spark 4.
  */
case class Md5Long63(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  override def dataType: DataType = LongType
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    HashUtil.md5Lower63(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashUtil.md5Lower63($c)")

  override protected def withNewChildInternal(newChild: Expression): Md5Long63 =
    copy(child = newChild)

  override def prettyName: String = "graft_md5_63"
}
