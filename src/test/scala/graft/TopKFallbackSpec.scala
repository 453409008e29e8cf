package graft

import graft.ops.Relational
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Regression: the sort-based ObjectHashAggregate fallback (>128 groups)
  * exercises TypedImperativeAggregate serialize/deserialize — the path
  * where an uncopied UnsafeRow.getBytes once collapsed heaps to k
  * duplicates of one element. */
class TopKFallbackSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark

  test("topk_agg with > fallback-threshold keys (sort-based ObjectHashAggregate)") {
    import spark.implicits._
    val df = (1 to 200000)
      .map(i => ((i * 48271) % 1000, (i * 2654435761L) % 5000))
      .toDF("key", "item").repartition(8)
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy("key").orderBy("item")
    val expect = df.distinct()
      .withColumn("rn", row_number().over(win)).filter(col("rn") <= 20)
      .select("key", "item", "rn")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getInt(2))).toSet
    val got = Relational.perKeyTopKAggAsc(df.distinct(), Seq("key"), "item", 20)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getInt(2))).toSet
    val dups = got.groupBy(t => (t._1, t._2)).filter(_._2.size > 1)
    assert(dups.isEmpty, s"dup items: ${dups.take(3)}")
    assert(got == expect,
      s"win-only=${(expect -- got).take(5)} agg-only=${(got -- expect).take(5)}")
  }
}
