package org.apache.spark.sql.graft

import graft.functions.HashUtil

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}

/** Whole per-row MinHash signature as ONE codegen'd expression:
  * `array<string>` shingles → `array<long>` of numPerm mins, same hash
  * family and values as the exploded/aggregated paths
  * (`min over shingles of md5_63(p ++ ":" ++ shingle)` — DedupSpec pins
  * the three paths equal).
  *
  * Why not compose built-ins: the equivalent
  * `array(min(transform(sh, s -> md5(p:s))) for each p)` evaluates its
  * lambdas on the INTERPRETED expression path (higher-order functions
  * don't participate in whole-stage codegen), re-walks the shingle array
  * numPerm times, and allocates a prefixed string + an intermediate
  * array per (perm, element) — measured 4× slower than the aggregate
  * path it was meant to beat (24.6 s vs 6.5 s at sf0.1). This expression
  * is a single static call inside the fused pipeline: one tight JVM loop,
  * one `MessageDigest.update(prefix); update(shingle)` per (perm,
  * element) — no per-element boxing, no intermediate arrays, no string
  * concatenation.
  *
  * Lives under `org.apache.spark.sql` because `AbstractDataType` is
  * `private[sql]` in Spark 4.
  */
case class MinHashSig(child: Expression, numPerm: Int)
  extends UnaryExpression with ExpectsInputTypes {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    MinHashSig.compute(input.asInstanceOf[ArrayData], numPerm)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graft.MinHashSig.compute($c, $numPerm)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)

  override def prettyName: String = "graft_minhash_sig"
}

object MinHashSig {
  // "p:" prefix bytes per perm, built once per numPerm (not per row).
  private val prefixCache =
    scala.collection.concurrent.TrieMap.empty[Int, Array[Array[Byte]]]
  private def prefixes(numPerm: Int): Array[Array[Byte]] =
    prefixCache.getOrElseUpdate(numPerm,
      Array.tabulate(numPerm)(p => s"$p:".getBytes("UTF-8")))

  /** Static entry point shared by eval and generated code. Null array
    * elements are skipped (none occur in shingle output). Duplicate
    * shingles need no dedup — min is idempotent under repetition. */
  def compute(arr: ArrayData, numPerm: Int): GenericArrayData = {
    val pre = prefixes(numPerm)
    val mins = Array.fill(numPerm)(Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      if (s != null) {
        val sb = s.getBytes
        var p = 0
        while (p < numPerm) {
          val h = HashUtil.md5Lower63(pre(p), sb)
          if (h < mins(p)) mins(p) = h
          p += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
}
