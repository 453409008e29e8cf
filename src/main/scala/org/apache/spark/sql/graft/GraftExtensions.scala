package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SQL-surface registration of the engine's custom Catalyst expressions,
  * so `spark.sql("SELECT graft_md5_63(s) ...")` works alongside the
  * Column API (SURVEY §2.11 / prompt: custom operators "registered via
  * `SparkSessionExtensions`").
  *
  * Two entry points, same builders:
  *  - config-time: `spark.sql.extensions=org.apache.spark.sql.graft.GraftExtensions`
  *    (injected before the session exists);
  *  - runtime: [[GraftExtensions.register]] on a live session (useful in
  *    shells/tests where the session is already built).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftExtensions {

  private def intLitOf(e: Expression): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"expected an integer literal argument, got $other")
  }

  /** (name, info, builder) for every SQL-registered graft function. */
  val functions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("graft_md5_63",
      new ExpressionInfo(classOf[Md5Long63].getName, "graft_md5_63"),
      (args: Seq[Expression]) => Md5Long63(args.head)),
    ("graft_sorted_intersect_count",
      new ExpressionInfo(classOf[SortedIntersectCount].getName,
        "graft_sorted_intersect_count"),
      (args: Seq[Expression]) => SortedIntersectCount(args(0), args(1))),
    ("graft_minhash_agg",
      new ExpressionInfo(classOf[MinHashAgg].getName, "graft_minhash_agg"),
      (args: Seq[Expression]) => MinHashAgg(args(0), intLitOf(args(1)))),
    ("graft_topk_agg",
      new ExpressionInfo(classOf[TopKAgg].getName, "graft_topk_agg"),
      (args: Seq[Expression]) => TopKAgg(args(0), intLitOf(args(1)))),
    ("graft_kmv_agg",
      new ExpressionInfo(classOf[KmvAgg].getName, "graft_kmv_agg"),
      (args: Seq[Expression]) => KmvAgg(args(0), intLitOf(args(1)))),
    ("graft_hll_agg",
      new ExpressionInfo(classOf[HllAgg].getName, "graft_hll_agg"),
      (args: Seq[Expression]) => HllAgg(args(0))),
    ("graft_jaro_winkler",
      new ExpressionInfo(classOf[JaroWinkler].getName, "graft_jaro_winkler"),
      (args: Seq[Expression]) => JaroWinkler(args(0), args(1))),
    ("graft_minhash_sig",
      new ExpressionInfo(classOf[MinHashSig].getName, "graft_minhash_sig"),
      (args: Seq[Expression]) => MinHashSig(args(0), intLitOf(args(1)))),
    ("graft_dot",
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (args: Seq[Expression]) => DotProduct(args(0), args(1))))

  /** Register the graft functions into an already-built session. */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (name, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(
        FunctionIdentifier(name), info, builder)
    }
}
