package graft

import graft.queries.Registry

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-8 wave 8 (q263 MapState counts, q264 Kendall τ-b, q265
  * delta-method ratio CI).
  */
class RatioKendallSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  val sf = GraftSpark.sf

  test("q263 MapState counters equal the batch pivot and types partition") {
    val rows = Registry.all("q263_stream_type_counts")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val typed = Seq("n_click", "n_view", "n_purchase", "n_signup",
        "n_error").map(r.getAs[Long]).sum
      assert(typed == r.getAs[Long]("n_total"),
        s"type counts must partition the total: $r")
    }
    val totalStream = rows.map(_.getAs[Long]("n_total")).sum
    val totalBatch = graft.io.Tables.events(spark, sf).count()
    assert(totalStream == totalBatch)
  }

  test("q264 pair classes partition the pair set; tau recomputes; " +
      "tau and Spearman agree in sign") {
    val r = Registry.all("q264_kendall_tau")(spark, sf).collect().head
    val n = r.getAs[Long]("n_obs")
    val (c, d, tx, ty) = (r.getAs[Long]("concordant"),
      r.getAs[Long]("discordant"), r.getAs[Long]("ties_x"),
      r.getAs[Long]("ties_y"))
    // C + D + tx + ty + both-tied == n(n−1)/2
    assert(c + d + tx + ty <= n * (n - 1) / 2)
    val expect = math.floor((c - d).toDouble /
      math.sqrt((c + d + tx).toDouble * (c + d + ty).toDouble) * 1e6 +
      0.5) / 1e6
    assert(r.getAs[Double]("tau_b") == expect)
    val rho = Registry.all("q260_spearman")(spark, sf)
      .collect().head.getAs[Double]("spearman_rho")
    assert(rho.sign == r.getAs[Double]("tau_b").sign ||
      math.abs(rho) < 0.05 || math.abs(r.getAs[Double]("tau_b")) < 0.05,
      s"rank statistics disagree in sign: rho=$rho tau=${r.getAs[Double]("tau_b")}")
  }

  test("q265 CI is coherent and the ratio matches the exact quotient") {
    val r = Registry.all("q265_ratio_metric_ci")(spark, sf).collect().head
    val diff = r.getAs[Double]("diff")
    val se = r.getAs[Double]("se")
    assert(se > 0.0)
    assert(r.getAs[Double]("ci_lo") <= diff && diff <= r.getAs[Double]("ci_hi"))
    assert(r.getAs[Boolean]("significant") == (math.abs(diff) > 1.96 * se))
    // the published diff is exactly the difference of the published arms
    val expect = math.floor((r.getAs[Double]("ratio_t") -
      r.getAs[Double]("ratio_c")) * 1e6 + 0.5) / 1e6
    assert(diff == expect)
    // ratio is CENTS per event; events value ~ [0,100] dollars
    assert(r.getAs[Double]("ratio_t") > 0.0 &&
      r.getAs[Double]("ratio_t") < 10000.0)
  }
}
