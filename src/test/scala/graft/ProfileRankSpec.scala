package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants of the r10 profile/rank wave: q355 LSH band
  * sweep, q356 golden-record profile, q357 Wilcoxon signed-rank.
  */
class ProfileRankSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  val sf = GraftSpark.sf

  private def q6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6

  test("q355 candidates are refinement-monotone and thresholds analytic") {
    val rows = graft.queries.TextQueries.queries(
      "q355_lsh_band_sweep")(spark, sf).collect()
      .sortBy(_.getAs[Long]("rows_per_band"))
    assert(rows.map(_.getAs[Long]("rows_per_band")).toSeq == Seq(2L, 4L, 8L))
    val cand = rows.map(_.getAs[Long]("n_candidates"))
    // an r-band is a refinement of the 2r-band over the same perms, so
    // full agreement at 2r implies agreement at r: candidates shrink
    assert(cand(0) >= cand(1) && cand(1) >= cand(2),
      s"candidates not monotone: ${cand.toSeq}")
    rows.foreach { r =>
      val (b, rr) = (r.getAs[Long]("bands"), r.getAs[Long]("rows_per_band"))
      assert(b * rr == 16)
      assert(r.getAs[Double]("s_curve_threshold") ==
        q6(math.pow(1.0 / b, 1.0 / rr)))
      assert(r.getAs[Long]("n_above_05") <= r.getAs[Long]("n_candidates"))
    }
    // thresholds rise with rows-per-band (fewer, stricter bands)
    val th = rows.map(_.getAs[Double]("s_curve_threshold"))
    assert(th(0) < th(1) && th(1) < th(2))
  }

  test("q356 golden profiles reproduce a driver recompute") {
    val rows = graft.queries.OlapQueries.queries(
      "q356_user_golden_profile")(spark, sf).collect()
    val ev = graft.io.Tables.events(spark, sf)
      .selectExpr("user_id", "ts", "event_id", "event_type",
        "cast(floor(value * 100.0d + 0.5d) as long) as cents",
        "get_json_object(props, '$.k') as k")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getLong(4), Option(r.getString(5))))
    val byUser = ev.groupBy(_._1)
    assert(rows.length == byUser.size)
    rows.foreach { r =>
      val u = r.getAs[Long]("user_id")
      val es = byUser(u)
      assert(r.getAs[Long]("n_events") == es.length.toLong)
      assert(r.getAs[Long]("first_seen_s") == es.map(_._2).min / 1000000000L)
      assert(r.getAs[Long]("last_seen_s") == es.map(_._2).max / 1000000000L)
      assert(r.getAs[Long]("purchase_cents") ==
        es.filter(_._4 == "purchase").map(_._5).sum)
      val latestK = es.sortBy(e => (e._6.isDefined, e._2, e._3))
        .last._6.orNull
      assert(Option(r.getAs[String]("latest_k")) == Option(latestK))
      val dom = es.groupBy(_._4).toSeq
        .maxBy { case (t, xs) => (xs.length, t) }._1
      assert(r.getAs[String]("dominant_type") == dom)
    }
  }

  test("q357 Wilcoxon reproduces a driver recompute") {
    val rows = graft.queries.AnalyticsQueries.queries(
      "q357_wilcoxon_signed_rank")(spark, sf).collect()
    assert(rows.length == 1)
    val r = rows.head
    val cut = 1705363200000000000L
    val diffs = graft.io.Tables.events(spark, sf)
      .selectExpr("user_id", "ts", "event_type",
        "cast(floor(value * 100.0d + 0.5d) as long) as cents")
      .collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getString(2), x.getLong(3)))
      .groupBy(_._1).values.map { es =>
        val pre = es.filter(e => e._3 == "purchase" && e._2 < cut)
          .map(_._4).sum
        val post = es.filter(e => e._3 == "purchase" && e._2 >= cut)
          .map(_._4).sum
        post - pre
      }.filter(_ != 0L).toSeq
    val n = diffs.length.toLong
    assert(r.getAs[Long]("n_nonzero_pairs") == n)
    // 2*W+ via average ranks over sorted |diff|
    val sorted = diffs.map(d => (math.abs(d), d > 0)).sortBy(_._1)
    val byVal = sorted.groupBy(_._1)
    var w2 = 0L
    byVal.foreach { case (v, xs) =>
      val f = sorted.count(_._1 < v).toLong
      val c = xs.length.toLong
      w2 += xs.count(_._2).toLong * (2 * f + c + 1)
    }
    assert(r.getAs[Long]("w_plus_x2") == w2)
    val tie3 = byVal.values.map { xs =>
      val c = BigInt(xs.length); (c * c * c - c) }.sum
    val z = (w2.toDouble - n.toDouble * (n + 1) / 2.0) /
      math.sqrt((n.toDouble * (n + 1) * (2 * n + 1) -
        tie3.toDouble / 2.0) / 6.0)
    assert(math.abs(r.getAs[Double]("z_stat") - z) < 1e-5)
    assert((math.abs(z) > 1.96) == (r.getAs[Long]("significant") == 1L))
  }
}
