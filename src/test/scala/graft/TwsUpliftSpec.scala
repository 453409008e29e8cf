package graft

import graft.queries.Registry

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-8 wave 6 (q255 transformWithState sessions, q256 bivariate
  * OLS, q257 Qini uplift, q258 partial correlation).
  */
class TwsUpliftSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  val sf = GraftSpark.sf

  test("q255 transformWithState emissions equal the fMGWS twin (q62)") {
    val tws = Registry.all("q255_stream_sessions_tws")(spark, sf).collect()
    val fmgws = Registry.all("q62_stream_sessions")(spark, sf).collect()
    assert(tws.nonEmpty)
    assert(tws.map(_.toSeq).toSeq == fmgws.map(_.toSeq).toSeq,
      "the two arbitrary-state APIs diverged on identical input")
  }

  test("q266 timer-emitted sessions tile per user and match q62's counts " +
      "for watermark-closed users") {
    val rows = Registry.all("q266_stream_session_rows")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    // sessions are disjoint, ordered, and internally consistent
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("start_s"))
      sorted.foreach { r =>
        assert(r.getAs[Long]("start_s") <= r.getAs[Long]("end_s"))
        assert(r.getAs[Long]("n_events") >= 1)
      }
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Long]("end_s") < b.getAs[Long]("start_s"),
            "sessions overlap")
        case _ =>
      }
    }
    // a user whose LAST session also emitted (timer fired) must show
    // exactly q62's session count
    val counts = Registry.all("q62_stream_sessions")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("n_sessions")).toMap
    val full = rows.groupBy(_.getLong(0))
      .filter { case (u, rs) => rs.length.toLong == counts(u) }
    assert(full.nonEmpty, "no user had every session emitted")
  }

  test("q256 Cramer solve matches a BigInt-exact driver recompute") {
    val rows = Registry.all("q256_bivariate_ols")(spark, sf).collect()
    assert(rows.nonEmpty)
    val nation = rows.head.getString(0)
    val li = graft.io.Tables.lineitem(spark, sf)
      .join(graft.io.Tables.supplier(spark, sf),
        col("l_suppkey") === col("s_suppkey"))
      .join(graft.io.Tables.nation(spark, sf),
        col("s_nationkey") === col("n_nationkey"))
      .filter(col("n_name") === nation)
      .select(col("l_quantity").cast("long"),
        (graft.functions.GraftFunctions.qdec(col("l_discount"), 4, 2) * 100)
          .cast("long"),
        floor(col("l_extendedprice") * 100.0 + 0.5))
      .collect().map(r => (BigInt(r.getLong(0)), BigInt(r.getLong(1)),
        BigInt(r.getLong(2))))
    val n = BigInt(li.length)
    def s(f: ((BigInt, BigInt, BigInt)) => BigInt) = li.map(f).sum
    val (s1, s2, sy) = (s(_._1), s(_._2), s(_._3))
    val c11 = (n * s(t => t._1 * t._1) - s1 * s1).toDouble
    val c22 = (n * s(t => t._2 * t._2) - s2 * s2).toDouble
    val c12 = (n * s(t => t._1 * t._2) - s1 * s2).toDouble
    val c1y = (n * s(t => t._1 * t._3) - s1 * sy).toDouble
    val c2y = (n * s(t => t._2 * t._3) - s2 * sy).toDouble
    val det = c11 * c22 - c12 * c12
    def q6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val r = rows.head
    assert(r.getAs[Double]("beta_qty_cents") ==
      q6((c22 * c1y - c12 * c2y) / det), r.toString)
    assert(r.getAs[Double]("beta_discpct_cents") ==
      q6((c11 * c2y - c12 * c1y) / det), r.toString)
    // no sign assertion: at sf0.001's ~60 rows/nation the synthetic
    // price is dominated by per-part variance, so β̂_qty is legitimately
    // noisy — the exact recompute above is the correctness gate
    assert(rows.forall(r => !r.getAs[Double]("beta_qty_cents").isNaN))
  }

  test("q257 Qini closes: the full-population prefix reproduces the " +
      "overall uplift sign and users partition") {
    val rows = Registry.all("q257_qini_uplift")(spark, sf)
      .orderBy("decile").collect()
    assert(rows.length == 10)
    val nT = rows.map(_.getAs[Long]("n_t")).sum
    val nC = rows.map(_.getAs[Long]("n_c")).sum
    val cT = rows.map(_.getAs[Long]("conv_t")).sum
    val cC = rows.map(_.getAs[Long]("conv_c")).sum
    val lastQini = BigInt(rows.last.getLong(6))
    assert(lastQini == BigInt(cT) * nC - BigInt(cC) * nT,
      "decile-10 Qini must equal the overall scaled uplift")
    // per-decile counts are consistent
    rows.foreach { r =>
      assert(r.getAs[Long]("conv_t") <= r.getAs[Long]("n_t"))
      assert(r.getAs[Long]("conv_c") <= r.getAs[Long]("n_c"))
    }
  }

  test("q258 partial correlation is a correlation and matches its own " +
      "pairwise r's") {
    val r = Registry.all("q258_partial_corr")(spark, sf).collect().head
    val (rxy, rxz, rzy) = (r.getAs[Double]("r_xy"),
      r.getAs[Double]("r_xz"), r.getAs[Double]("r_zy"))
    Seq(rxy, rxz, rzy).foreach(v => assert(v >= -1.0 && v <= 1.0))
    val expect = math.floor((rxy - rxz * rzy) /
      math.sqrt((1.0 - rxz * rxz) * (1.0 - rzy * rzy)) * 1e6 + 0.5) / 1e6
    assert(r.getAs[Double]("partial_xy_given_z") == expect)
  }

  test("q290 DiD closes over its own cell means and arms partition users") {
    val r = Registry.all("q290_did_estimator")(spark, sf).collect().head
    val users = graft.io.Tables.events(spark, sf)
      .select("user_id").distinct().count()
    assert(r.getAs[Long]("n_t") + r.getAs[Long]("n_c") == users)
    // did recomputes (to quantization) from the four quantized means
    val did = r.getAs[Double]("did_cents")
    val approx = (r.getAs[Double]("mean_t_post") -
      r.getAs[Double]("mean_t_pre")) -
      (r.getAs[Double]("mean_c_post") - r.getAs[Double]("mean_c_pre"))
    assert(math.abs(did - approx) < 3e-6, s"$did vs $approx")
  }

  test("q291 ratio CI brackets the point estimate and moments close") {
    val r = Registry.all("q291_ratio_metric_ci")(spark, sf).collect().head
    val ratio = r.getAs[Double]("ratio_cents_per_event")
    val (lo, hi) = (r.getAs[Double]("ci_lo"), r.getAs[Double]("ci_hi"))
    assert(r.getAs[Double]("se_cents") > 0 && lo <= ratio && ratio <= hi)
    // point estimate is the plain cents-per-event ratio
    val expect = math.floor(r.getAs[Long]("sum_y_cents").toDouble /
      r.getAs[Long]("sum_n_events").toDouble * 1e6 + 0.5) / 1e6
    assert(ratio == expect)
    // CI symmetry: r - lo == hi - r up to the 6dp quantization
    assert(math.abs((ratio - lo) - (hi - ratio)) < 3e-6)
  }
}
