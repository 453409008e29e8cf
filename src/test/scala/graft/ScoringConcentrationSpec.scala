package graft

import graft.queries.Registry

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-8 scoring/concentration wave (q238–q241): the semantic
  * invariants behind the hash gate — HHI/effective-N reciprocity and
  * bounds, an in-memory BigInt recompute of the ACF order statistic,
  * the Murphy-decomposition identity, and the gains-curve endpoint
  * laws.
  */
class ScoringConcentrationSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  val sf = GraftSpark.sf

  test("q238 HHI bounds, share ordering, and effective-N reciprocity") {
    val rows = Registry.all("q238_concentration")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_suppliers")
      val hhi = r.getAs[Long]("hhi_ppm")
      val effn = r.getAs[Long]("effn_micro")
      val t1 = r.getAs[Long]("top1_ppm")
      val t3 = r.getAs[Long]("top3_ppm")
      // 1/n ≤ HHI ≤ 1 (ppm, ±1 for the half-up quantization)
      assert(hhi >= 1000000L / n - 1 && hhi <= 1000000L, r.toString)
      // top-1 share can't beat top-3; both are proper shares
      assert(t1 <= t3 && t3 <= 1000000L && t1 >= 1, r.toString)
      // the single largest share is at least 1/n
      assert(t1 >= 1000000L / n - 1, r.toString)
      // effective-N is between 1 and n, and is HHI's reciprocal
      assert(effn >= 1000000L - 1 && effn <= n * 1000000L + 1, r.toString)
      val prod = hhi.toDouble * effn.toDouble
      assert(math.abs(prod - 1e12) < 0.005e12,
        s"hhi*effn far from 1: $prod (${r.toString})")
    }
  }

  test("q239 ACF is a correlation, and r1 matches a BigInt recompute") {
    val rows = Registry.all("q239_acf_ljungbox")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      (1 to 7).foreach { k =>
        val rk = r.getAs[Double](s"r$k")
        assert(rk >= -1.0 - 1e-9 && rk <= 1.0 + 1e-9, r.toString)
      }
      assert(r.getAs[Double]("lb_q") >= 0.0, r.toString)
    }
    // driver-side exact recompute of r1 for one nation from the same
    // daily frame the query consumes
    val nation = rows.head.getAs[String]("nation")
    val daily = graft.queries.SharedFrames
      .dailyNationRevenue(spark, sf)
      .filter(col("nation") === nation)
      .select(col("day"),
        (col("rev").cast("decimal(18,2)") * 100).cast("decimal(38,0)")
          .as("x"))
      .orderBy("day")
      .collect()
      .map(_.getDecimal(1).toBigInteger)
      .map(BigInt(_))
    val n = BigInt(daily.length)
    val s = daily.sum
    val sxx = daily.map(x => x * x).sum
    val pairs = daily.sliding(2).map(a => (a(0), a(1))).toSeq
    val sxy = pairs.map { case (a, b) => a * b }.sum
    val sh = pairs.map(_._1).sum
    val st = pairs.map(_._2).sum
    val num = n * n * sxy - n * s * (sh + st) + (n - 1) * s * s
    val den = n * n * sxx - n * s * s
    val expected =
      math.floor(num.toDouble / den.toDouble * 1e6 + 0.5) / 1e6
    val got = rows.find(_.getString(0) == nation).get.getAs[Double]("r1")
    assert(got == expected, s"r1 $got != recompute $expected")
  }

  test("q240 Brier is a proper probability score and the Murphy " +
      "identity holds to quantization noise") {
    val r = Registry.all("q240_brier_decomposition")(spark, sf)
      .collect().head
    val brier = r.getAs[Double]("brier")
    val rel = r.getAs[Double]("reliability")
    val res = r.getAs[Double]("resolution")
    val unc = r.getAs[Double]("uncertainty")
    assert(brier >= 0.0 && brier <= 1.0)
    assert(rel >= 0.0 && res >= 0.0 && unc >= 0.0 && unc <= 0.25 + 1e-9)
    // REL − RES + UNC = Brier exactly with unquantized bin means; the
    // 6dp-quantized means leave only rounding noise
    assert(math.abs(r.getAs[Double]("decomp_gap")) < 1e-3, r.toString)
  }

  test("q241 gains curve is monotone and closes at exactly 100%") {
    val rows = Registry.all("q241_gains_lift")(spark, sf)
      .orderBy("decile").collect()
    assert(rows.length == 10)
    val captures = rows.map(_.getAs[Long]("capture_ppm"))
    assert(captures.zip(captures.tail).forall { case (a, b) => a <= b })
    assert(captures.last == 1000000L)
    // the full-population prefix has lift exactly 1 by construction
    assert(rows.last.getAs[Long]("lift_ppm") == 1000000L)
    // users partition across deciles
    val total = rows.map(_.getAs[Long]("n_users")).sum
    assert(rows.last.getAs[Long]("cum_users") == total)
    // every user with a train event lands in exactly one decile
    assert(rows.map(_.getAs[Long]("n_buyers")).sum ==
      rows.last.getAs[Long]("cum_buyers"))
  }
}
