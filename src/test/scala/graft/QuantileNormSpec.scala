package graft

import graft.ops.QuantileNorm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class QuantileNormSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._

  test("identical distributions map (near-)identically onto the pool") {
    // two groups with the same values → pooled == per-group deciles,
    // so the two interpolations invert each other up to rounding
    val df = (1 to 100).flatMap(i =>
      Seq((i.toLong, "a", i), (1000L + i, "b", i))).toDF("id", "g", "v")
    val out = QuantileNorm.normalize(df, col("id"), col("g"), col("v"))
      .as[(Long, String, Double, Double, Double)].collect()
    out.foreach { case (_, _, v, p, vn) =>
      assert(p >= 0.0 && p <= 1.0)
      // p_src is rounded to 6 dp before the pooled lookup, so the
      // round-trip error is bounded by segment_width · 5e-7
      assert(math.abs(vn - v) < 1e-4)
    }
  }

  test("normalization is monotone and bounded by the pooled range") {
    // group b is group a shifted +1000: after normalization both cover
    // the pooled range in rank order
    val df = (1 to 50).flatMap(i =>
      Seq((i.toLong, "a", i * 3), (1000L + i, "b", i * 3 + 1000)))
      .toDF("id", "g", "v")
    val out = QuantileNorm.normalize(df, col("id"), col("g"), col("v"))
      .as[(Long, String, Double, Double, Double)].collect()
    val (mn, mx) = (out.map(_._3).min, out.map(_._3).max)
    out.foreach(r => assert(r._5 >= mn - 1e-9 && r._5 <= mx + 1e-9))
    for (g <- Seq("a", "b")) {
      val sorted = out.filter(_._2 == g).sortBy(_._3)
      assert(sorted.sliding(2).forall {
        case Array(x, y) => x._4 <= y._4 && x._5 <= y._5
        case _ => true
      })
      // a group's smallest value maps to the pooled floor region,
      // its largest to the pooled ceiling
      assert(sorted.head._4 == 0.0 && sorted.last._4 == 1.0)
    }
  }
}
