package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants of the r10 forecasting/funnel wave: q352 Croston
  * intermittent demand, q353 time-boxed window funnel, q354 event study
  * with placebo inference.
  */
class DemandFunnelSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  val sf = GraftSpark.sf

  private def q6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6

  test("q352 Croston folds reproduce a driver recompute") {
    val rows = graft.queries.OlapQueries.queries(
      "q352_croston_forecast")(spark, sf).collect()
    assert(rows.nonEmpty)
    val li = graft.io.Tables.lineitem(spark, sf)
      .selectExpr("l_partkey",
        "cast(cast(l_shipdate as timestamp) as long) div 86400 as day",
        "cast(floor(l_quantity + 0.5d) as long) as qty")
      .collect().map(r => (r.getAs[Number](0).longValue(),
        r.getLong(1), r.getLong(2)))
    val demand = li.groupBy(x => (x._1, x._2))
      .map { case ((k, d), xs) => (k, d, xs.map(_._3).sum) }
      .filter(_._3 > 0)
    val byPart = demand.groupBy(_._1)
    val expect = byPart.flatMap { case (k, xs) =>
      val s = xs.toSeq.sortBy(_._2)
      if (s.length < 5) None
      else {
        var z = s.head._3.toDouble
        var p = 0.0
        var prev = s.head._2
        var first = true
        s.tail.foreach { case (_, d, x) =>
          val iv = (d - prev).toDouble
          p = if (first) iv else 0.2 * iv + 0.8 * p
          z = 0.2 * x + 0.8 * z
          first = false
          prev = d
        }
        Some(k -> (s.length.toLong, prev, q6(z), q6(p), q6(z / p)))
      }
    }
    rows.foreach { r =>
      val k = r.getAs[Long]("part_key")
      val (n, last, z, p, f) = expect(k)
      assert(r.getAs[Long]("n_demand_days") == n)
      assert(r.getAs[Long]("last_day") == last)
      assert(r.getAs[Double]("demand_ewma") == z, s"part $k z")
      assert(r.getAs[Double]("interval_ewma") == p, s"part $k p")
      assert(r.getAs[Double]("forecast_per_day") == f, s"part $k f")
    }
    // ranked prefix: every emitted forecast >= every non-emitted one
    if (rows.length == 50) {
      val minOut = rows.map(_.getAs[Double]("forecast_per_day")).min
      val allF = expect.values.map(_._5)
      assert(allF.count(_ > minOut) < 50)
    }
  }

  test("q353 windowed funnel narrows monotonically and bounds q90") {
    val rows = graft.queries.OlapQueries.queries(
      "q353_window_funnel")(spark, sf).collect()
      .sortBy(_.getAs[String]("stage"))
    assert(rows.map(_.getAs[String]("stage")).toSeq ==
      Seq("1_view", "2_click", "3_purchase"))
    val n = rows.map(_.getAs[Long]("n_reached"))
    assert(n(0) >= n(1) && n(1) >= n(2), s"not monotone: ${n.toSeq}")
    val all = rows.head.getAs[Long]("n_all_users")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_all_users") == all)
      assert(r.getAs[Long]("reach_ppm") ==
        (2 * r.getAs[Long]("n_reached") * 1000000L + all) / (2 * all))
    }
    // the unbounded q90 funnel reaches at least as many users per stage
    val q90 = graft.queries.RelationalQueries.queries(
      "q90_funnel")(spark, sf).collect()
    assert(q90.length >= n(0))
    assert(q90.count(!_.isNullAt(2)) >= n(1)) // click_s reached
    assert(q90.count(!_.isNullAt(3)) >= n(2)) // purchase_s reached
  }

  test("q375 sliding anchor dominates q353 and catches a stalled first view") {
    // Shared-data invariants: same 3-stage shape, monotone, and the
    // sliding anchor can only RAISE each stage's count vs the fixed
    // first-view anchor (every q353 conversion is also a q375 chain).
    val sl = graft.queries.OlapQueries.queries(
      "q375_sliding_funnel")(spark, sf).collect()
      .sortBy(_.getAs[String]("stage"))
    val fx = graft.queries.OlapQueries.queries(
      "q353_window_funnel")(spark, sf).collect()
      .sortBy(_.getAs[String]("stage"))
    assert(sl.map(_.getAs[String]("stage")).toSeq ==
      Seq("1_view", "2_click", "3_purchase"))
    val ns = sl.map(_.getAs[Long]("n_reached"))
    val nf = fx.map(_.getAs[Long]("n_reached"))
    assert(ns(0) >= ns(1) && ns(1) >= ns(2), s"not monotone: ${ns.toSeq}")
    assert(ns(0) == nf(0), "stage 1 (any view) must agree")
    assert(ns(1) >= nf(1) && ns(2) >= nf(2),
      s"sliding ${ns.toSeq} must dominate fixed ${nf.toSeq}")

    // Discriminating fixture (VERDICT r11 #5): user 1's FIRST view
    // stalls (no click within its hour) but a LATER view converts fully
    // — windowFunnel counts it, the fixed anchor doesn't. User 2's
    // click shares the view's instant: ts-strict chaining must refuse.
    import spark.implicits._
    val h = 3600L * 1000000000L
    val d = java.nio.file.Files.createTempDirectory("graft-slide")
    try {
      Seq(
        (1L, "view", 0L, 1L), (1L, "view", 2 * h, 2L),
        (1L, "click", 2 * h + 10L, 3L), (1L, "purchase", 2 * h + 20L, 4L),
        (2L, "view", 5 * h, 5L), (2L, "click", 5 * h, 6L),
        (2L, "purchase", 5 * h + 1L, 7L))
        .toDF("user_id", "event_type", "ts", "event_id")
        .write.mode("overwrite").parquet(s"$d/events.parquet")
      def counts(q: String) = graft.queries.OlapQueries.queries(q)(
        spark, d.toString).collect()
        .map(r => r.getAs[String]("stage") -> r.getAs[Long]("n_reached"))
        .toMap
      val slide = counts("q375_sliding_funnel")
      assert(slide == Map("1_view" -> 2L, "2_click" -> 1L,
        "3_purchase" -> 1L), s"sliding: $slide")
      val fixed = counts("q353_window_funnel")
      assert(fixed == Map("1_view" -> 2L, "2_click" -> 0L,
        "3_purchase" -> 0L), s"fixed: $fixed")
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(d).iterator().asScala.toSeq
        .sortBy(-_.getNameCount)
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("q354 event study reproduces a driver recompute") {
    val rows = graft.queries.OlapQueries.queries(
      "q354_event_study")(spark, sf).collect()
    assert(rows.length == 1)
    val r = rows.head
    val daily = graft.io.Tables.orders(spark, sf)
      .selectExpr(
        "cast(cast(o_orderdate as timestamp) as long) div 86400 as day",
        "cast(floor(o_totalprice * 100.0d + 0.5d) as long) as cents")
      .collect().map(x => (x.getLong(0), x.getLong(1)))
      .groupBy(_._1).map { case (d, xs) => (d, xs.map(_._2).sum) }
      .toSeq.sortBy(_._1)
    val eff = daily.indices.flatMap { i =>
      if (i >= 7 && i + 6 < daily.length) {
        val post = (i to i + 6).map(daily(_)._2).sum
        val pre = (i - 7 until i).map(daily(_)._2).sum
        Some((daily(i)._1, daily(i)._2, post - pre))
      } else None
    }
    val (evDay, _, realD) = eff.maxBy(x => (x._2, -x._1))
    assert(r.getAs[Long]("event_day") == evDay)
    assert(r.getAs[Double]("effect_dollars_per_day") == q6(realD / 700.0))
    val placebos = eff.filter(_._1 != evDay)
    assert(r.getAs[Long]("n_placebos") == placebos.length.toLong)
    val extreme = placebos.count(x => math.abs(x._3) >= math.abs(realD))
    assert(r.getAs[Long]("n_as_extreme") == extreme.toLong)
    assert(r.getAs[Long]("p_ppm") ==
      (2L * extreme * 1000000L + placebos.length) / (2L * placebos.length))
  }
}
