package graft

import graft.rec.Conformal

import org.scalatest.funsuite.AnyFunSuite

class ConformalSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._

  private def f(rows: (Int, Double)*) = rows.toDF("item_id", "rating")

  test("order-statistic threshold and coverage, hand-checked") {
    // train: item 1 all 3.0 → g = 3.0, pred(1) = (30 + 20·3)/30 = 3.0
    val train = f(Seq.fill(10)((1, 3.0)): _*)
    // calib residuals {0, 0, 1, 1, 2}: k = min(⌈6·0.9⌉, 5) = 5 → q̂ = 2
    val calib = f((1, 3.0), (1, 3.0), (1, 4.0), (1, 2.0), (1, 5.0))
    // test: res 0 (in), res 3 (out), unseen item → pred = g, res 7 (out)
    val test = f((1, 3.0), (1, 6.0), (2, 10.0))
    val out = Conformal.itemMeanIntervals(train, calib, test,
      bias = 20, alpha = 0.1)
      .as[(Double, Long, Double, Long, Double)].head()
    assert(out == ((0.1, 5L, 2.0, 3L, 0.333333)))
  }

  test("zero residuals everywhere give qhat 0 and full coverage") {
    val const = f(Seq.fill(8)((1, 4.0)): _*)
    val out = Conformal.itemMeanIntervals(const, const, const,
      bias = 20, alpha = 0.1)
      .as[(Double, Long, Double, Long, Double)].head()
    assert(out._3 == 0.0 && out._5 == 1.0)
  }
}
