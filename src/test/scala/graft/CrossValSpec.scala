package graft

import graft.rec.CrossVal

import org.scalatest.funsuite.AnyFunSuite

class CrossValSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._

  private def ratings(rows: (Int, Double, Long)*) =
    rows.toDF("item_id", "rating", "event_id")

  test("constant ratings give zero RMSE at every (bias, fold)") {
    val df = ratings((1 to 300).map(i => (i % 7, 3.0, i.toLong)): _*)
    val out = CrossVal.biasCvRmse(df, folds = 3, biases = Seq(1, 100),
      seed = 9L)
      .as[(Int, Int, Long, Double, Double)].collect()
    assert(out.length == 6) // 2 biases × 3 folds
    assert(out.forall(r => r._4 == 0.0 && r._5 == 0.0))
    assert(out.map(_._3).sum == 600L) // each bias sees every rating once
  }

  test("cv_rmse is the mean of its bias's fold RMSEs; layout-stable") {
    val df = ratings((1 to 400).map(i =>
      (i % 13, (i % 5).toDouble + 0.5, i.toLong)): _*)
    val run1 = CrossVal.biasCvRmse(df, folds = 5, biases = Seq(1, 20),
      seed = 4L).as[(Int, Int, Long, Double, Double)].collect()
    val run2 = CrossVal.biasCvRmse(df.repartition(11), folds = 5,
      biases = Seq(1, 20), seed = 4L)
      .as[(Int, Int, Long, Double, Double)].collect()
    assert(run1.sortBy(r => (r._1, r._2)).toSeq ==
      run2.sortBy(r => (r._1, r._2)).toSeq)
    run1.groupBy(_._1).foreach { case (_, rows) =>
      val mean = (rows.map(r => BigDecimal(r._4)).sum / rows.length)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      rows.foreach(r => assert(r._5 == mean))
    }
  }
}
