package graft

import graft.ops.Bootstrap

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BootstrapSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._

  test("poissonWeight maps uniforms through the inverse CDF") {
    val out = Seq(0.0, 0.3, 0.5, 0.8, 0.99, 0.9999999).toDF("u")
      .select(col("u"), Bootstrap.poissonWeight(col("u")).as("w"))
      .as[(Double, Int)].collect().toMap
    assert(out(0.0) == 0 && out(0.3) == 0)
    assert(out(0.5) == 1)
    assert(out(0.8) == 2)
    assert(out(0.99) == 4)
    assert(out(0.9999999) == 8) // capped tail
  }

  test("poissonWeightSql is generated from the same thresholds") {
    val sql = Bootstrap.poissonWeightSql("u")
    Bootstrap.PoissonCdf1.foreach(t => assert(sql.contains(t.toString)))
    assert(sql.endsWith("ELSE 8 END"))
  }

  test("meanCI: exact full-sample stats, CI brackets the mean, deterministic") {
    val df = (1 to 200).map(i => (i.toLong, i.toDouble)).toDF("id", "v")
    def run() = Bootstrap.meanCI(df, col("id"), col("v"),
      replicas = 100, seed = 7L)
      .as[(Long, Double, Long, Double, Double, Double)].head()
    val (nRows, mean, nRep, lo, hi, se) = run()
    assert(nRows == 200L && nRep == 100L)
    assert(mean == 100.5)
    // percentile CI must bracket the point estimate and be ordered
    assert(lo < mean && mean < hi && lo < hi)
    // se of the mean of 1..200 ≈ sd/sqrt(n) ≈ 57.9/14.1 ≈ 4.1
    assert(se > 2.0 && se < 7.0)
    assert(run() == ((nRows, mean, nRep, lo, hi, se))) // layout-stable
  }
}
