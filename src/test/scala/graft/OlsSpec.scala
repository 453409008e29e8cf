package graft

import graft.metrics.Ols

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class OlsSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._

  private def fit(rows: (String, Int, Int)*) =
    Ols.fitPerGroup(rows.toDF("g", "x", "y"), col("g"), col("x"), col("y"))
      .as[(String, Long, Option[Double], Option[Double], Option[Double])]
      .collect().map(r => r._1 -> r).toMap

  test("theil-sen: exact line recovery, and one wild outlier moves nothing") {
    val clean = (0 to 8).map(x => ("k", x.toLong, 2.0 * x + 1.0))
    val ts = graft.metrics.TheilSen
      .fitPerGroup(clean.toDF("g", "x", "y"), "g", "x", "y")
      .as[(String, Long, Double, Double)].collect().head
    assert(ts == (("k", 36L, 2.0, 1.0)))
    // Corrupt one point to 10^6: 28 of 36 pairwise slopes are still
    // exactly 2.0 → the median slope AND the median residual don't move.
    val dirty = clean.map { case (g, x, y) =>
      (g, x, if (x == 4L) 1e6 else y)
    }
    val tsDirty = graft.metrics.TheilSen
      .fitPerGroup(dirty.toDF("g", "x", "y"), "g", "x", "y")
      .as[(String, Long, Double, Double)].collect().head
    assert(tsDirty == (("k", 36L, 2.0, 1.0)))
  }

  test("exact line recovers slope/intercept with r2 = 1") {
    val out = fit(("a", 1, 3), ("a", 2, 5), ("a", 3, 7))
    assert(out("a") == (("a", 3L, Some(2.0), Some(1.0), Some(1.0))))
  }

  test("hand-computed noisy fit") {
    // n=3 sx=3 sy=2 sxy=3 sxx=5 syy=2 → num=3 dx=6 dy=2
    val out = fit(("b", 0, 0), ("b", 1, 1), ("b", 2, 1))
    assert(out("b") == (("b", 3L, Some(0.5), Some(0.166667), Some(0.75))))
  }

  test("degenerate groups yield nulls, not infinities") {
    val out = fit(("single", 5, 9), ("flat", 4, 1), ("flat", 4, 7))
    assert(out("single") == (("single", 1L, None, None, None)))
    assert(out("flat") == (("flat", 2L, None, None, None))) // zero x-var
  }
}
