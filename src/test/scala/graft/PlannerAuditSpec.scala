package graft

import graft.queries.Registry

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-8 wave 4 (q249 LSH recall audit, q250 forecast reconciliation,
  * q251 winsorized means, q252 sample-size planner): the cross-query
  * consistency laws behind the hash gate.
  */
class PlannerAuditSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  val sf = GraftSpark.sf

  test("q249 recall rises with similarity and the counts cross-check q26/q27") {
    val rows = Registry.all("q249_lsh_recall_audit")(spark, sf)
      .orderBy("bucket").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_hit") <= r.getAs[Long]("n_true"))
      assert(r.getAs[Long]("recall_ppm") <= 1000000L)
      assert(r.getAs[Long]("n_cand_true") <= r.getAs[Long]("n_cand"))
    }
    // total ground-truth pairs equal q26's exact pair count
    val q26n = Registry.all("q26_ngram_jaccard_dups")(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_true")).sum == q26n)
    // banding theory: recall at the top bucket dominates the bottom one
    if (rows.length >= 2)
      assert(rows.last.getAs[Long]("recall_ppm") >=
        rows.head.getAs[Long]("recall_ppm"))
  }

  test("q250 bottom-up equals Σ of nation forecasts and the region set is " +
      "complete") {
    val rows = Registry.all("q250_forecast_reconciliation")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    // five TPC-H regions, every row carries at least one nation
    assert(rows.map(_.getString(0)).distinct.length == 5)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_nations") >= 1)
      // gap is exactly the quantized difference of its own columns
      val gap = r.getAs[Double]("recon_gap")
      val expect = math.floor((r.getAs[Double]("f_bottom_up") -
        r.getAs[Double]("f_direct")) * 1e6 + 0.5) / 1e6
      assert(gap == expect, r.toString)
    }
    // aggregation and smoothing do not commute: some gap must be nonzero
    assert(rows.exists(r => math.abs(r.getAs[Double]("recon_gap")) > 1e-6))
  }

  test("q251 winsorized means are ordered and capping touches <= 5%/row") {
    val rows = Registry.all("q251_winsorized_means")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val raw = r.getAs[Double]("mean_raw")
      val w95 = r.getAs[Double]("mean_wins95")
      val w99 = r.getAs[Double]("mean_wins99")
      // capping can only pull the mean down, and a lower cap pulls harder
      assert(w95 <= w99 + 1e-9 && w99 <= raw + 1e-9, r.toString)
      // the p95 order statistic leaves at most 5% strictly above it
      assert(r.getAs[Long]("capped95_ppm") <= 50000L + 1, r.toString)
      assert(r.getDouble(2) <= r.getDouble(3),
        "cap95 must not exceed cap99")
    }
  }

  test("q252 planner scales as inverse-square of the MDE") {
    val r = Registry.all("q252_sample_size")(spark, sf).collect().head
    val n = r.getAs[Long]("n_per_arm")
    val v = r.getAs[Double]("var_micro2")
    val mde = r.getAs[Long]("mde_micro")
    assert(n >= 1)
    // closed form recomputes exactly
    val expect = math.ceil(2.0 * ((1.96 + 0.8416) * (1.96 + 0.8416)) *
      (v / (mde.toDouble * mde.toDouble))).toLong
    assert(n == expect, s"$n != $expect")
    // sanity: detecting a 1% lift on a noisy metric needs far more users
    // than the fixture has
    assert(n > r.getAs[Long]("n_users"))
  }
}
