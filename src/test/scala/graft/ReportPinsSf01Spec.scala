package graft

import org.scalatest.funsuite.AnyFunSuite

/** Reference-parity statistical pins at sf0.1 (VERDICT r13 item 5): the
  * verdict asked for both report-headline inequalities re-pinned at
  * sf0.1, the scale the bench and sf0.1 correctness gate run at. The
  * measured truth (2026-08-16, deterministic seed-42 corpus):
  *
  *  - Popularity-beats-ALS (report p.6) HOLDS at sf0.1 and is pinned
  *    below, same form as the sf0.01 pin in RecSpec (q51 vs q53 P@20).
  *  - Twins ≫ random (report pp.9-10) does NOT hold at sf0.1 — and the
  *    measurement shows why it cannot: the synthetic ratings carry no
  *    co-preference structure (per-item mean dispersion equals pure
  *    sampling noise, σ/√n, at both SFs: sd 4.35 at n≈101/item,
  *    sd 1.59 at n≈1001/item — no planted item or taste effect), so
  *    the top-100-overlap "twins" correlate like any random pair.
  *    Measured via the oracle-gated q183 protocol: sf0.01 twins
  *    0.043771 vs max-random 0.042349 (a 3.5% margin INSIDE the
  *    49-run noise band — the r3 "separation" was a borderline
  *    accident of the fixed seed, stable only because the corpus is
  *    deterministic); sf0.1 twins −0.009742 vs randoms mean −0.002363,
  *    max 0.036270 — the larger sample regresses the twins cohort to
  *    zero exactly as i.i.d. ratings predict. The separation is a
  *    property of MovieLens's real taste structure, like the
  *    reference-scale byte-parity residual: unreachable on this
  *    fixture and correctly not claimed. What IS pinned at sf0.1:
  *    the protocol's shape (49 runs × 100 pairs + the twins row) and
  *    the measured NON-separation — if a future change suddenly
  *    manufactures separation on i.i.d. data, that is a bug in the
  *    correlation machinery, not a recovered signal.
  */
class ReportPinsSf01Spec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  private val sf = "/root/testdata/sf0.1"

  test("q183 protocol at sf0.1: 49 full random runs; twins cohort is " +
    "INSIDE the random band (no separation on i.i.d. ratings)") {
    val runs = graft.queries.TwinsQueries.q183(spark, sf)
      .select("run", "n_pairs", "avg_corr").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val twins = runs.find(_._1 == -1L).getOrElse(fail("no twins row"))
    val rand = runs.filter(_._1 >= 0L)
    assert(rand.size == 49)
    assert(runs.forall(_._2 == 100L),
      s"every cohort draws 100 pairs: ${runs.filter(_._2 != 100L)}")
    val corrs = rand.map(_._3)
    // all correlations are noise-sized on the i.i.d. corpus
    assert((twins._3 +: corrs).forall(c => math.abs(c) < 0.1),
      s"correlation outside the noise band: twins ${twins._3}")
    // the honest sf0.1 pin: NO separation (see scaladoc — a change that
    // manufactures separation on i.i.d. ratings is a correlation bug)
    assert(twins._3 <= corrs.max,
      s"twins ${twins._3} suddenly separates from max random " +
        s"${corrs.max} on i.i.d. ratings — investigate the correlation " +
        "machinery before re-pinning")
  }

  test("headline invariant: popularity P@20 >= default-ALS P@20 at sf0.1") {
    val pop = graft.queries.RecQueries.q51(spark, sf)
      .head().getAs[Double]("p_at_k")
    val als = graft.queries.RecQueries.q53(spark, sf)
      .head().getAs[Double]("p_at_k")
    assert(pop >= als,
      s"popularity P@20 $pop < ALS P@20 $als at sf0.1 — headline inverted")
  }
}
