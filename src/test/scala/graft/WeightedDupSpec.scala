package graft

import graft.queries.Registry

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-8 wave 9 (q267 weighted Jaccard, q268 duplicate charges). */
class WeightedDupSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  val sf = GraftSpark.sf

  test("q267 weighted Jaccard dominates set Jaccard on repeated text " +
      "and matches a driver recompute") {
    val rows = Registry.all("q267_weighted_jaccard")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val smin = r.getAs[Long]("smin")
      val (ta, tb) = (r.getAs[Long]("ta"), r.getAs[Long]("tb"))
      assert(smin <= math.min(ta, tb), r.toString)
      val wj = r.getAs[Long]("wjaccard_ppm")
      assert(wj == (2L * smin * 1000000L + (ta + tb - smin)) /
        (2L * (ta + tb - smin)), r.toString)
    }
    // driver recompute of one pair with multiplicities
    val r0 = rows.head
    val docs = graft.io.Tables.documents(spark, sf)
      .filter(col("doc_id").isin(r0.getLong(0), r0.getLong(1)))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("text")).toMap
    def bag(t: String): Map[String, Long] =
      t.split(" ").sliding(3).filter(_.length == 3).map(_.mkString(" "))
        .toSeq.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val (ba, bb) = (bag(docs(r0.getLong(0))), bag(docs(r0.getLong(1))))
    val smin = ba.keySet.intersect(bb.keySet)
      .toSeq.map(k => math.min(ba(k), bb(k))).sum
    assert(r0.getAs[Long]("smin") == smin)
    assert(r0.getAs[Long]("ta") == ba.values.sum &&
      r0.getAs[Long]("tb") == bb.values.sum)
  }

  test("q269 FD audit: the true dependency holds, the obvious non-FD " +
      "violates heavily") {
    val rows = Registry.all("q269_fd_profile")(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    // custkey → nationkey is a genuine FD in TPC-H: zero violations
    assert(rows("customer.custkey->nationkey")
      .getAs[Long]("n_violating") == 0L)
    // a user emits many event types: violation rate near 100%
    assert(rows("events.user->event_type")
      .getAs[Long]("violation_ppm") > 900000L)
    rows.values.foreach { r =>
      assert(r.getAs[Long]("n_violating") <= r.getAs[Long]("n_keys"))
    }
  }

  test("q270 ABC-XYZ cells partition the catalog and A outweighs C") {
    val rows = Registry.all("q270_abc_xyz_matrix")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(Set("A", "B", "C")(r.getString(0)))
      assert(Set("X", "Y", "Z")(r.getString(1)))
    }
    val nParts = rows.map(_.getAs[Long]("n_parts")).sum
    val catalog = graft.io.Tables.lineitem(spark, sf)
      .select("l_partkey").distinct().count()
    assert(nParts == catalog, s"$nParts parts classified vs $catalog")
    def classValue(c: String) = rows.filter(_.getString(0) == c)
      .map(_.getAs[Long]("value_cents")).sum
    // the 80% band's total value dominates the tail band by construction
    assert(classValue("A") > classValue("C"))
  }

  test("q271 the bridge closes exactly and the residual is pure " +
      "quantization noise") {
    val r = Registry.all("q271_price_volume_bridge")(spark, sf)
      .collect().head
    def d(i: Int) = BigInt(r.getLong(i))
    val (dr, pe, ve, ne, de, res) = (d(3), d(4), d(5), d(6), d(7), d(8))
    // closure is an identity by construction
    assert(dr == pe + ve + ne + de + res)
    // the residual comes only from half-up micro-cent price rounding:
    // |resid| per common part < q1 + q0 micro-cents
    val bound = graft.io.Tables.lineitem(spark, sf)
      .agg(sum(col("l_quantity").cast("long"))).collect().head.getLong(0)
    assert(res.abs < BigInt(bound), s"residual $res vs bound $bound")
    assert(r.getAs[Long]("n_common") > 0)
  }

  test("q272 comparable revenue is a subset of headline revenue") {
    val r = Registry.all("q272_same_store_growth")(spark, sf)
      .collect().head
    assert(r.getDouble(1) >= r.getDouble(4),
      "rev0_all must cover rev0_same")
    assert(r.getDouble(2) >= r.getDouble(5),
      "rev1_all must cover rev1_same")
    assert(r.getAs[Long]("n_comparable") > 0)
    // growth columns are finite quantized ratios
    assert(!r.getAs[Double]("growth_all").isNaN &&
      !r.getAs[Double]("growth_same").isNaN)
  }

  test("q274 lift ranking is support-floored and BigInt-recomputable") {
    val rows = Registry.all("q274_emerging_terms")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("df2") >= 3L, r.toString)
      assert(r.getAs[Long]("lift_ppm") > 0L)
    }
    // ranking is non-increasing in lift
    val lifts = rows.map(_.getAs[Long]("lift_ppm"))
    assert(lifts.zip(lifts.tail).forall { case (a, b) => a >= b })
  }

  test("q276 Lorenz curve is convex-ordered and Gini sits inside it") {
    val rows = Registry.all("q276_lorenz_gini")(spark, sf)
      .orderBy("decile").collect()
    assert(rows.length == 10)
    // ascending-revenue deciles: per-decile share is non-decreasing
    val shares = rows.map(_.getAs[Long]("share_ppm"))
    assert(shares.zip(shares.tail).forall { case (a, b) => a <= b })
    // cumulative closes at 100%
    assert(rows.last.getAs[Long]("cum_share_ppm") == 1000000L)
    val gini = rows.head.getAs[Long]("gini_ppm")
    assert(gini >= 0 && gini < 1000000L)
  }

  test("q275 backlog buckets partition the open orders") {
    val rows = Registry.all("q275_backlog_aging")(spark, sf).collect()
    assert(rows.nonEmpty)
    val n = rows.map(_.getAs[Long]("n_orders")).sum
    val open = graft.io.Tables.orders(spark, sf)
      .filter(col("o_orderstatus") === "O").count()
    assert(n == open)
  }

  test("q277 RBO is a proper [0,1] agreement and its terms recompute") {
    val rows = Registry.all("q277_rank_biased_overlap")(spark, sf)
      .orderBy("depth").collect()
    assert(rows.length == 20)
    val rbo = rows.head.getAs[Double]("rbo")
    assert(rbo >= 0.0 && rbo <= 1.0 + 1e-9, s"rbo $rbo")
    rows.foreach { r =>
      val d = r.getAs[Long]("depth")
      val ov = r.getAs[Long]("overlap_d")
      assert(ov >= 0 && ov <= d, r.toString)
    }
    // overlap-at-depth is non-decreasing
    val ovs = rows.map(_.getAs[Long]("overlap_d"))
    assert(ovs.zip(ovs.tail).forall { case (a, b) => a <= b })
  }

  test("q278 contributions close: deltas sum to the total and shares " +
      "to ~1") {
    val rows = Registry.all("q278_waterfall_contribution")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    val deltas = rows.map(r => BigDecimal(r.getDouble(3))
      .setScale(2, BigDecimal.RoundingMode.HALF_UP))
    val shares = rows.map(_.getAs[Double]("contribution_share"))
    assert(math.abs(shares.sum - 1.0) < 1e-4, s"share sum ${shares.sum}")
    // the waterfall reads top-down by magnitude
    val mags = deltas.map(_.abs)
    assert(mags.zip(mags.tail).forall { case (a, b) => a >= b })
  }

  test("q279 MASE is the ratio of its own MAE columns and the naive " +
      "denominator is positive") {
    val rows = Registry.all("q279_mase_scoring")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("mae_naive") > 0.0, r.toString)
      assert(r.getAs[Long]("n_scored") > 0)
      // consistency: mase ≈ mae_model / mae_naive up to the separate
      // roundings of the three published values
      val approx = r.getAs[Double]("mae_model") /
        r.getAs[Double]("mae_naive")
      assert(math.abs(r.getAs[Double]("mase") - approx) < 1e-4,
        r.toString)
    }
  }

  test("q280 Cramer's V is in [0,1] and classifies consistently") {
    val r = Registry.all("q280_cramers_v")(spark, sf).collect().head
    val v = r.getAs[Double]("cramers_v")
    assert(v >= 0.0 && v <= 1.0 + 1e-9)
    val expect = if (v < 0.1) "negligible" else if (v < 0.3) "small"
      else if (v < 0.5) "medium" else "large"
    assert(r.getAs[String]("effect") == expect)
    assert(r.getAs[Double]("chi2") >= 0.0)
  }

  test("q281 window rates are monotone in the window and bounded by 1") {
    val r = Registry.all("q281_attribution_window_sweep")(spark, sf)
      .collect().head
    val rates = Seq("rate_1h_ppm", "rate_6h_ppm", "rate_24h_ppm",
      "rate_72h_ppm").map(r.getAs[Long])
    assert(rates.zip(rates.tail).forall { case (a, b) => a <= b },
      rates.mkString(","))
    assert(rates.last <= 1000000L)
    assert(r.getAs[Long]("w_72h") <= r.getAs[Long]("n_purchases"))
  }

  test("q282 histogram intersection is a bounded symmetric overlap") {
    val rows = Registry.all("q282_histogram_intersection")(spark, sf)
      .collect()
    assert(rows.length == 10, "5 types -> 10 unordered pairs")
    rows.foreach { r =>
      val hi = r.getAs[Long]("intersection_ppm")
      assert(hi >= 0 && hi <= 1000000L, r.toString)
    }
    // the fixture's value distributions are near-identical uniforms:
    // every pair should overlap heavily
    assert(rows.forall(_.getAs[Long]("intersection_ppm") > 500000L))
  }

  test("q283 Fano factor recomputes from its own moments") {
    val rows = Registry.all("q283_burstiness_fano")(spark, sf).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      assert(r.getAs[Double]("fano") > 0.0)
      assert(r.getAs[Double]("mean_daily") > 0.0)
      val v = r.getAs[Double]("fano")
      val expect = if (v > 1.5) "bursty" else if (v < 0.67) "regular"
        else "poisson_like"
      assert(r.getAs[String]("verdict") == expect)
    }
  }

  test("q284 ECE is bounded by MCE and both live in [0,1]") {
    val r = Registry.all("q284_calibration_ece")(spark, sf).collect().head
    val (ece, mce) = (r.getAs[Double]("ece"), r.getAs[Double]("mce"))
    assert(ece >= 0.0 && ece <= 1.0)
    assert(mce >= ece - 1e-9, s"MCE $mce < ECE $ece")
    assert(r.getAs[Long]("n_bins") >= 1)
  }

  test("q285 streak laws: longest <= active days, islands recompute for " +
      "one user") {
    val rows = Registry.all("q285_activity_streaks")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("longest_streak") <=
        r.getAs[Long]("n_active_days"))
      assert(r.getAs[Long]("n_streaks") >= 1)
    }
    val u = rows.head.getLong(0)
    val days = graft.io.Tables.events(spark, sf)
      .filter(col("user_id") === u)
      .select(expr("ts div 86400000000000")).distinct()
      .collect().map(_.getLong(0)).sorted
    var best = 1L; var cur = 1L
    days.sliding(2).foreach {
      case Array(a, b) =>
        cur = if (b == a + 1) cur + 1 else 1
        best = math.max(best, cur)
      case _ =>
    }
    assert(rows.head.getAs[Long]("longest_streak") == best)
    assert(rows.head.getAs[Long]("n_active_days") == days.length)
  }

  test("q268 pairs are canonical, within-window, and amount-consistent") {
    val rows = Registry.all("q268_duplicate_charges")(spark, sf).collect()
    assert(rows.nonEmpty, "the fixture contains at least one dup charge")
    rows.foreach { r =>
      val gap = r.getAs[Long]("gap_s")
      assert(gap >= 0 && gap <= 86400, r.toString)
      assert(r.getAs[Long]("id_a") != r.getAs[Long]("id_b"))
    }
    // every reported pair really is same-user same-dollar in the raw data
    val ev = graft.io.Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "value").collect()
      .map(r => r.getLong(0) -> (r.getLong(1),
        math.floor(r.getDouble(2) * 100.0 + 0.5).toLong / 100L)).toMap
    rows.foreach { r =>
      val (ua, da) = ev(r.getAs[Long]("id_a"))
      val (ub, db) = ev(r.getAs[Long]("id_b"))
      assert(ua == ub && ua == r.getAs[Long]("user_id"))
      assert(da == db && da == r.getAs[Long]("dollars"))
    }
  }
}
