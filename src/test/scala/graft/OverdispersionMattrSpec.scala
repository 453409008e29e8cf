package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants of the r10 fit/diversity wave: q361 NB
  * overdispersion, q362 MATTR lexical diversity, q363 Bloom sizing,
  * q364 churn-recency AUC.
  */
class OverdispersionMattrSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  val sf = GraftSpark.sf

  private def q6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6

  test("q361 NB parameters recompute from reported moments") {
    val rows = graft.queries.AnalyticsQueries.queries(
      "q361_nb_overdispersion")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val m = r.getAs[Double]("mean_daily")
      val v = r.getAs[Double]("var_daily")
      val overd = v > m
      assert((r.getAs[String]("verdict") == "overdispersed") == overd ||
        math.abs(v - m) < 2e-6) // 6dp-rounding boundary slop
      if (overd && !r.isNullAt(r.fieldIndex("nb_r"))) {
        val rr = r.getAs[Double]("nb_r")
        val pp = r.getAs[Double]("nb_p")
        assert(math.abs(rr - m * m / (v - m)) < 1e-2 * math.abs(rr) + 1e-3)
        assert(pp > 0 && pp < 1)
        // NB mean identity: m = r(1-p)/p
        assert(math.abs(rr * (1 - pp) / pp - m) < 1e-2 * m + 1e-2)
      }
    }
  }

  test("q362 MATTR reproduces a driver recompute and is length-bounded") {
    val rows = graft.queries.TextQueries.queries(
      "q362_mattr_diversity")(spark, sf).collect()
    val docs = graft.io.Tables.documents(spark, sf)
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1).split(" ")))
    def q9(x: Double) = math.floor(x * 1e9 + 0.5) / 1e9
    val perDoc = docs.map { case (src, t) =>
      val m =
        if (t.length < 25) t.distinct.length.toDouble / t.length
        else {
          val s = (0 to t.length - 25)
            .map(i => t.slice(i, i + 25).distinct.length.toLong).sum
          s.toDouble / ((t.length - 24).toLong * 25)
        }
      (src, q6(m))
    }
    val bySrc = perDoc.groupBy(_._1)
    rows.foreach { r =>
      val xs = bySrc(r.getAs[String]("source")).map(_._2)
      assert(r.getAs[Long]("n_docs") == xs.length.toLong)
      assert(math.abs(r.getAs[Double]("mean_mattr") -
        q6(xs.map(q9).sum / xs.length)) < 1e-5)
      assert(r.getAs[Double]("min_mattr") == xs.min)
      assert(r.getAs[Double]("max_mattr") == xs.max)
      assert(xs.forall(x => x > 0 && x <= 1))
    }
  }

  test("q363 Bloom curves recompute from n_keys and tighten with bits") {
    val rows = graft.queries.TextQueries.queries(
      "q363_bloom_sizing")(spark, sf).collect()
      .sortBy(_.getAs[Long]("bits_per_key"))
    assert(rows.map(_.getAs[Long]("bits_per_key")).toSeq ==
      Seq(8L, 12L, 16L))
    val n = rows.head.getAs[Long]("n_keys")
    assert(n > 0)
    rows.foreach { r =>
      val bpk = r.getAs[Long]("bits_per_key")
      assert(r.getAs[Long]("n_keys") == n)
      assert(r.getAs[Long]("filter_bytes") == (bpk * n + 7) / 8)
      val k = math.floor(bpk * math.log(2.0) + 0.5).toLong
      assert(r.getAs[Long]("k_hashes") == k)
      val fpr = math.floor(math.pow(1.0 - math.exp(-k.toDouble / bpk),
        k.toDouble) * 1e9 + 0.5) / 1e9
      assert(r.getAs[Double]("predicted_fpr") == fpr)
    }
    val f = rows.map(_.getAs[Double]("predicted_fpr"))
    assert(f(0) > f(1) && f(1) > f(2), s"fpr not tightening: ${f.toSeq}")
  }

  test("q364 churn AUC reproduces a driver recompute") {
    val rows = graft.queries.AnalyticsQueries.queries(
      "q364_churn_recency_auc")(spark, sf).collect()
    assert(rows.length == 1)
    val r = rows.head
    val all = graft.io.Tables.events(spark, sf)
      .select("user_id", "ts").collect()
      .map(x => (x.getLong(0), x.getLong(1)))
    val t0 = all.map(_._2).min
    val t1 = all.map(_._2).max
    val cut = t0 + (t1 - t0) * 99 / 100
    val us = all.groupBy(_._1).values.flatMap { es =>
        val pre = es.map(_._2).filter(_ < cut)
        if (pre.isEmpty) None
        else Some(((cut - pre.max) / 1000000000L,
          es.map(_._2).count(_ >= cut) == 0))
      }.toSeq
    val churned = us.count(_._2).toLong
    assert(churned > 0 && churned < us.length,
      s"degenerate classes: $churned of ${us.length}")
    assert(r.getAs[Long]("n_churned") == churned)
    assert(r.getAs[Long]("n_retained") == us.length - churned)
    // exact 2U via pairwise comparison (small n at sf0.001)
    var u2 = 0L
    for ((sp, yp) <- us if yp; (sn, yn) <- us if !yn) {
      if (sp > sn) u2 += 2 else if (sp == sn) u2 += 1
    }
    assert(r.getAs[Long]("u2") == u2)
    val auc = q6(u2.toDouble / (2.0 * churned * (us.length - churned)))
    assert(r.getAs[Double]("auc") == auc)
  }
}
