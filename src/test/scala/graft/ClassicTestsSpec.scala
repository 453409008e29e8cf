package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants of the r10 classical-statistics wave: q335 Welch
  * t-test, q336 Brown–Forsythe, q337 Jarque–Bera, q338 Durbin–Watson,
  * q339 Cochran–Armitage. Exact values are oracle-gated by the driver;
  * these pin internal consistency (each statistic must recompute from
  * its own reported sufficient statistics) and the flag conventions.
  */
class ClassicTestsSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  val sf = GraftSpark.sf

  test("q335 t statistic recomputes from its reported moments") {
    val r = graft.queries.AnalyticsQueries.queries(
      "q335_welch_ttest")(spark, sf).collect()
    assert(r.length == 1)
    val row = r.head
    val (na, nb) = (row.getAs[Long]("n_a"), row.getAs[Long]("n_b"))
    assert(na > 0 && nb > 0)
    val t = (row.getAs[Double]("mean_a_cents") -
      row.getAs[Double]("mean_b_cents")) /
      math.sqrt(row.getAs[Double]("var_a") / na +
        row.getAs[Double]("var_b") / nb)
    assert(math.abs(t - row.getAs[Double]("t_stat")) < 1e-3)
    val df = row.getAs[Double]("df_welch")
    assert(df >= math.min(na, nb) - 1 && df <= na + nb - 2,
      s"Satterthwaite df $df outside [min(n)-1, n_a+n_b-2]")
    assert((math.abs(row.getAs[Double]("t_stat")) > 1.96) ==
      (row.getAs[Long]("significant") == 1L))
  }

  test("q336 Brown-Forsythe reproduces a driver recompute") {
    val r = graft.queries.AnalyticsQueries.queries(
      "q336_brown_forsythe")(spark, sf).collect()
    assert(r.length == 1)
    val row = r.head
    val cust = graft.io.Tables.customer(spark, sf)
      .selectExpr("c_nationkey", "cast(floor(c_acctbal * 100.0 + 0.5) as long) as cents")
      .collect().map(x => (x.getAs[Number]("c_nationkey").longValue(),
        x.getAs[Long]("cents")))
    val groups = cust.groupBy(_._1).values.map(_.map(_._2).sorted).toSeq
    def q(x: Double, s: Int): Double = {
      val f = math.pow(10, s); math.floor(x * f + 0.5) / f
    }
    val k = groups.size
    val zs = groups.map { g =>
      val med = g((g.length + 1) / 2 - 1) // lower median, 1-indexed walk
      g.map(v => math.abs(v - med))
    }
    val nn = zs.map(_.length).sum
    val szz = zs.map(_.sum).sum
    val b = zs.map { z =>
      val d = z.sum.toDouble / z.length - szz.toDouble / nn
      q(z.length * d * d, 9)
    }.sum
    val w = zs.map { z =>
      val s = z.sum; val s2 = z.map(v => BigInt(v) * v).sum
      q((BigDecimal(s2) - BigDecimal(BigInt(s) * s) / z.length).toDouble, 9)
    }.sum
    val f = (nn - k).toDouble / (k - 1) * b / w
    assert(row.getAs[Long]("k") == k.toLong)
    assert(row.getAs[Long]("n_total") == nn.toLong)
    assert(math.abs(row.getAs[Double]("f_stat") - f) < 1e-4,
      s"engine ${row.getAs[Double]("f_stat")} vs recompute $f")
    assert(row.getAs[Long]("dof1") == k - 1L)
    assert(row.getAs[Long]("dof2") == nn - k.toLong)
  }

  test("q337 JB recomputes from reported skew/kurt and flags at 5.991") {
    val rows = graft.queries.AnalyticsQueries.queries(
      "q337_jarque_bera")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n")
      val jb = n / 6.0 * (math.pow(r.getAs[Double]("skewness"), 2) +
        math.pow(r.getAs[Double]("kurtosis") - 3.0, 2) / 4.0)
      // skew/kurt are 6dp-rounded, so the recompute drifts ~n*eps
      assert(math.abs(jb - r.getAs[Double]("jb_stat")) < 1e-4 * n + 1e-3,
        s"${r.getAs[String]("event_type")}: $jb vs ${r.getAs[Double]("jb_stat")}")
      assert((r.getAs[Double]("jb_stat") > 5.991) ==
        (r.getAs[Long]("reject_normal") == 1L))
      assert(r.getAs[Double]("kurtosis") >=
        math.pow(r.getAs[Double]("skewness"), 2) + 1 - 1e-4)
    }
  }

  test("q338 DW lands in (0,4) with consistent verdict bands") {
    val rows = graft.queries.AnalyticsQueries.queries(
      "q338_durbin_watson")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val dw = r.getAs[Double]("dw")
      assert(dw > 0 && dw < 4, s"${r.getAs[String]("nation")}: dw=$dw")
      val v = r.getAs[String]("verdict")
      if (dw < 1.5) assert(v == "positive_autocorr")
      else if (dw > 2.5) assert(v == "negative_autocorr")
      else assert(v == "none")
      assert(r.getAs[Long]("n_days") > 2)
    }
  }

  test("q339 trend z recomputes from the band counts") {
    val rows = graft.queries.AnalyticsQueries.queries(
      "q339_cochran_armitage")(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 5)
    val n = rows.map(_.getAs[Long]("n_orders")).sum
    val rr = rows.map(_.getAs[Long]("n_failed")).sum
    val t = rows.map(r => r.getAs[Long]("band") * r.getAs[Long]("n_failed")).sum
    val a = rows.map(r => r.getAs[Long]("band") * r.getAs[Long]("n_orders")).sum
    val b2 = rows.map(r => r.getAs[Long]("band") * r.getAs[Long]("band") *
      r.getAs[Long]("n_orders")).sum
    val p = rr.toDouble / n
    val z = (t.toDouble - rr.toDouble * a / n) /
      math.sqrt(p * (1.0 - p) * (b2.toDouble - a.toDouble * a / n))
    rows.foreach { r =>
      assert(math.abs(r.getAs[Double]("z_trend") - z) < 1e-5)
      assert((z * z > 3.841) == (r.getAs[Long]("significant") == 1L))
      assert(r.getAs[Long]("n_failed") <= r.getAs[Long]("n_orders"))
    }
  }
}
