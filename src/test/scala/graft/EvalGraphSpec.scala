package graft

import graft.queries.Registry

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-8 wave 3 (q244 kNN LOO, q245 silhouette, q246 assortativity,
  * q247 drawdown, q248 CUPED): the semantic laws behind the hash gate.
  */
class EvalGraphSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  val sf = GraftSpark.sf

  test("q244 accuracies are proper ppm rates and labels partition the corpus") {
    val rows = Registry.all("q244_knn_loo_accuracy")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n")
      val k = r.getAs[Long]("n_correct")
      val acc = r.getAs[Long]("accuracy_ppm")
      assert(k >= 0 && k <= n)
      assert(acc >= 0 && acc <= 1000000L)
      // ppm is the half-up quotient of its own counts
      assert(acc == (2L * k * 1000000L + n) / (2L * n), r.toString)
    }
    val total = rows.map(_.getAs[Long]("n")).sum
    val corpus = graft.io.Tables.embeddings(spark, sf).count()
    assert(total == corpus,
      s"every vector must be classified exactly once: $total vs $corpus")
  }

  test("q245 silhouettes live in [-1,1]; the fixture sits in the " +
      "near-zero overlap regime") {
    val rows = Registry.all("q245_label_silhouette")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val lo = r.getAs[Double]("min_silhouette")
      val hi = r.getAs[Double]("max_silhouette")
      val mean = r.getAs[Double]("mean_silhouette")
      assert(lo >= -1.0 - 1e-9 && hi <= 1.0 + 1e-9)
      assert(mean >= lo - 1e-9 && mean <= hi + 1e-9, r.toString)
    }
    // the fixture's labels are LOCALLY separable (q244's kNN vote gets
    // them right) while the MEAN-distance silhouette sits just below 0 —
    // the classic high-dimensional regime where within-cluster spread
    // matches between-cluster spread. Pin that regime: near zero, not
    // collapsed to the -1 "wrong partition" pole.
    val overall = rows.map(r =>
      r.getAs[Double]("mean_silhouette") * r.getAs[Long]("n")).sum /
      rows.map(_.getAs[Long]("n")).sum
    assert(overall > -0.2 && overall < 0.5,
      s"overall mean silhouette $overall outside the fixture regime")
  }

  test("q246 assortativity is a correlation and matches a BigInt recompute") {
    val r = Registry.all("q246_assortativity")(spark, sf).collect().head
    val a = r.getAs[Double]("assortativity")
    assert(a >= -1.0 - 1e-9 && a <= 1.0 + 1e-9)
    // exact recompute from the same memoized edge frame
    val edges = graft.queries.SharedFrames.coPurchaseEdges(spark, sf)
      .collect().map(x => (x.getString(0), x.getString(1)))
    val deg = edges.groupBy(_._1).map { case (k, v) => k -> BigInt(v.length) }
    val xy = edges.map { case (s, d) => (deg(s), deg(d)) }
    val m = BigInt(xy.length)
    val sx = xy.map(_._1).sum
    val sy = xy.map(_._2).sum
    val sxy = xy.map(p => p._1 * p._2).sum
    val sxx = xy.map(p => p._1 * p._1).sum
    val syy = xy.map(p => p._2 * p._2).sum
    val expected = math.floor(
      (m * sxy - sx * sy).toDouble /
        (math.sqrt((m * sxx - sx * sx).toDouble) *
         math.sqrt((m * syy - sy * sy).toDouble)) * 1e6 + 0.5) / 1e6
    assert(a == expected, s"$a != $expected")
    // the symmetrized edge list makes the statistic exchange-symmetric
    assert(sx == sy && sxx == syy)
  }

  test("q247 drawdown laws: ppm in range, trough below peak, zero only for " +
      "monotone-peak series") {
    val rows = Registry.all("q247_max_drawdown")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val dd = r.getAs[Long]("max_drawdown_ppm")
      val peak = BigDecimal(r.getLong(3))
      val trough = BigDecimal(r.getLong(2))
      assert(dd >= 0 && dd <= 1000000L)
      assert(trough <= peak, r.toString)
      // definition closes: dd == half-up ppm of (peak - trough)/peak
      val expect = ((BigInt(2) * (peak - trough).toBigInt * 1000000 +
        peak.toBigInt) / (BigInt(2) * peak.toBigInt)).toLong
      assert(dd == expect, r.toString)
    }
    // daily revenue is volatile: at least one nation must draw down > 50%
    assert(rows.exists(_.getAs[Long]("max_drawdown_ppm") > 500000L))
  }

  test("q248 CUPED reduces variance without moving the point estimate far") {
    val r = Registry.all("q248_cuped")(spark, sf).collect().head
    val vr = r.getAs[Double]("var_reduction")
    assert(vr > 0.0 && vr <= 1.0 + 1e-9,
      s"CUPED must not inflate variance: $vr")
    // pre-period covariate is mean-centered out: both estimates answer
    // the same question, so they agree to the scale of the arm noise
    val raw = r.getAs[Long]("diff_raw_micro")
    val cuped = r.getAs[Long]("diff_cuped_micro")
    assert(math.abs(raw - cuped) < 10000000L,
      s"adjusted estimate implausibly far from raw: $raw vs $cuped")
  }
}
