package graft

import graft.metrics.Auc

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AucSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._

  private def auc(rows: (Double, Int)*): (Long, Long, Double) =
    Auc.binaryAuc(rows.toDF("s", "y"), col("s"), col("y"))
      .as[(Long, Long, Double)].head()

  test("mann-whitney: hand-computed U, tie-corrected z, AUC consistency") {
    // negatives (clicks) {1, 2}, positives (purchases) {2, 3}:
    // pairs (2>1)=1, (2~2)=0.5, (3>1)=1, (3>2)=1 → U = 3.5, 2U = 7;
    // tie term Σ(t³−t) = (8−2) = 6 at value 2.
    val rows = Seq((1.0, 0), (2.0, 0), (2.0, 1), (3.0, 1))
    val r = Auc.mannWhitneyU(rows.toDF("s", "y"), col("s"), col("y"))
      .as[(Long, Long, Long, Double, Double)].head()
    assert(r._1 == 2L && r._2 == 2L && r._3 == 7L)
    assert(r._5 == 0.875)
    // z = 1.5 / sqrt(4/12 · (5 − 6/12)) = sqrt(1.5), rounded
    assert(math.abs(r._4 - math.sqrt(1.5)) < 1e-6)
    // AUC from mannWhitneyU equals binaryAuc on the same data.
    val a = Auc.binaryAuc(rows.toDF("s", "y"), col("s"), col("y"))
      .as[(Long, Long, Double)].head()
    assert(a._3 == r._5)
  }

  test("mann-whitney: clean separation gives max U and a positive z") {
    val rows = Seq((1.0, 0), (2.0, 0), (5.0, 1), (6.0, 1))
    val r = Auc.mannWhitneyU(rows.toDF("s", "y"), col("s"), col("y"))
      .as[(Long, Long, Long, Double, Double)].head()
    assert(r._3 == 8L && r._5 == 1.0 && r._4 > 0.0)
  }

  test("tie group gets the average rank (pairwise expectation)") {
    // ranks asc: 0.1→1, {0.2, 0.2}→2.5 each, 0.3→4; R⁺ = 2.5 + 4
    // pairwise: (1 + 0.5 + 1 + 1) / 4 = 0.875
    assert(auc((0.1, 0), (0.2, 0), (0.2, 1), (0.3, 1)) == ((2L, 2L, 0.875)))
  }

  test("perfect separation is 1.0, reversed is 0.0, all-ties is 0.5") {
    assert(auc((0.1, 0), (0.2, 0), (0.3, 1), (0.4, 1))._3 == 1.0)
    assert(auc((0.1, 1), (0.2, 1), (0.3, 0), (0.4, 0))._3 == 0.0)
    assert(auc((0.7, 0), (0.7, 1), (0.7, 0), (0.7, 1))._3 == 0.5)
  }

  test("rank sum is partitioning-independent") {
    val rows = (1 to 500).map(i => ((i % 97).toDouble / 10.0, i % 3 min 1))
    val one = Auc.binaryAuc(rows.toDF("s", "y").repartition(1),
      col("s"), col("y")).as[(Long, Long, Double)].head()
    val many = Auc.binaryAuc(rows.toDF("s", "y").repartition(13),
      col("s"), col("y")).as[(Long, Long, Double)].head()
    assert(one == many)
  }
}
