package graft

import org.scalatest.funsuite.AnyFunSuite

/** The end-to-end reference-pipeline invariants (VERDICT r10 #4), pinned
  * on the SAME computation [[PipelineReport]] publishes in
  * ARCHITECTURE.md — one compute() at sf0.01, all table-level claims
  * asserted on it:
  *
  *  - Table-2 shape: the bias argmax is the MEASURED synthetic winner
  *    b=1 — NOT the reference's MovieLens b=1000 (report p.4). The
  *    divergence is the same documented class as the ALS-grid argmax
  *    (AlsGoldenPinSpec): the synthetic events-derived ratings carry no
  *    long-tail popularity noise for a large damping bias to suppress,
  *    so small b (≈ raw mean rating) wins; on MovieLens, b in the
  *    500–1000 region is structurally best. Pinning the measured value
  *    catches drift; asserting the MovieLens winner on non-MovieLens
  *    data would just be wrong.
  *  - Table-3 shape: the grid argmax is the measured (50, 0.01) at
  *    sf0.01 (RecSpec documents the per-sf argmaxes; the reference's
  *    Table-3 winner is (50, 0.05) — rank agrees, reg diverges on
  *    synthetic data).
  *  - Part-2 protocol: twins avg corr exceeds EVERY one of the 49
  *    random runs (the report's headline separation; sf0.01 is the
  *    smallest fixture where sample noise doesn't drown the synthetic
  *    twins signal — see TwinsProtocolSpec).
  *  - Final eval: the held-out test row is non-degenerate (users > 0,
  *    ranking metrics in (0,1)).
  */
class PipelineReportSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  private val sf = "/root/testdata/sf0.01"
  private lazy val report = PipelineReport.compute(spark, sf)

  test("Table-2 bias sweep has 6 arms; argmax is the measured winner b=1") {
    assert(report.biasSweep.map(_._1) ==
      Seq(1.0, 10.0, 100.0, 500.0, 1000.0, 10000.0))
    val best = report.biasSweep.maxBy(_._2)
    assert(best._1 == 1.0,
      s"bias argmax moved to b=${best._1} (MAP ${best._2}) — review, then " +
        "update this pin deliberately (reference MovieLens winner: b=1000)")
  }

  test("Table-3 grid argmax is the measured (50, 0.01) at sf0.01") {
    assert(report.grid.size == 16)
    val best = report.grid.maxBy(_._3)
    assert((best._1, best._2) == ((50, 0.01)),
      s"grid argmax moved: $best — reference MovieLens winner is (50, 0.05)")
  }

  test("twins cohort separates from all 49 random runs") {
    val twins = report.twinRuns.find(_._1 == -1L).map(_._2)
      .getOrElse(fail("no twins cohort row"))
    val rand = report.twinRuns.filter(_._1 >= 0L).map(_._2)
    assert(rand.size == 49)
    assert(twins > rand.max,
      s"twins $twins does not beat max random ${rand.max}")
  }

  test("final held-out eval row is non-degenerate") {
    val fe = report.finalEval
    assert(fe.getAs[Long]("n_users") > 0)
    for (m <- Seq("p_at_k", "map_at_k", "ndcg_at_k")) {
      val v = fe.getAs[Double](m)
      assert(v > 0.0 && v < 1.0, s"$m = $v out of (0,1)")
    }
  }
}
