package graft

import graft.metrics.Contingency
import graft.ops.Features

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ContingencySpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._

  test("chiSquare matches the hand-computed 2x2 table") {
    val rows =
      Seq.fill(10)(("A", "X")) ++ Seq.fill(20)(("A", "Y")) ++
      Seq.fill(30)(("B", "X")) ++ Seq.fill(40)(("B", "Y"))
    val out = Contingency.chiSquare(rows.toDF("lang", "src"),
      col("lang"), col("src"))
      .as[(String, String, Long, Double, Double, Double, Long)]
      .collect().map(r => (r._1, r._2) -> r).toMap
    // marginals 30/70 × 40/60 over n=100
    assert(out(("A", "X"))._4 == 12.0 && out(("B", "Y"))._4 == 42.0)
    assert(out(("A", "X"))._5 == 0.333333) // (10-12)^2/12
    assert(out(("B", "X"))._5 == 0.142857) // (30-28)^2/28
    // decimal-exact total of the rounded contributions (a plain double
    // sum here would carry FP error the engine's decimal path doesn't)
    val chi2 = (BigDecimal("0.333333") + BigDecimal("0.222222") +
      BigDecimal("0.142857") + BigDecimal("0.095238")).toDouble
    out.values.foreach { r =>
      assert(r._6 == chi2) // broadcast total on every row
      assert(r._7 == 1L)   // (2-1)(2-1)
    }
  }

  test("hashedTokenFeatures: bounded buckets, exact counts, layout-stable") {
    val docs = Seq((1L, "a b c a"), (2L, "a a a"), (3L, "")).toDF("doc_id", "text")
    val f = Features.hashedTokenFeatures(docs, "doc_id", "text",
      buckets = 8, seed = 1L)
      .as[(Long, Int, Long, Long)].collect()
    assert(f.forall(r => r._2 >= 0 && r._2 < 8))
    assert(f.forall(r => math.abs(r._3) <= r._4)) // |Σ sign| ≤ n
    assert(f.map(_._4).sum == 7L) // 4 + 3 + 0 tokens
    // same token stream → same sparse vector, any partitioning
    val again = Features.hashedTokenFeatures(docs.repartition(5),
      "doc_id", "text", buckets = 8, seed = 1L)
      .as[(Long, Int, Long, Long)].collect()
    assert(f.sortBy(r => (r._1, r._2)).toSeq ==
      again.sortBy(r => (r._1, r._2)).toSeq)
    // doc 2's three identical tokens land in ONE bucket with |val| = 3
    val d2 = f.filter(_._1 == 2L)
    assert(d2.length == 1 && math.abs(d2.head._3) == 3L)
  }
}
