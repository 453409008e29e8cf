package graft

import org.scalatest.funsuite.AnyFunSuite

/** Differential fuzz gate, events arm (VERDICT r12 item 3): seeded
  * adversarial fixtures ([[FuzzFixtures]] — ties, same-instant events,
  * dead funnel stages, empty/singleton inputs, identical values,
  * single-user skew, NULL measures), engine-vs-DuckDB on EVERY fixture
  * via [[FuzzHarness]] / tools/fuzz_check.py.
  *
  * 13 classes × 8 seeds = 104 fixtures. Every fixture runs the three
  * highest-risk families (fixed-anchor funnel q353, sliding funnel q375,
  * markov stationary q367 — the families whose r11/r12 bugs motivated
  * this gate) plus a 3-wide rotation over the other 13 events-only
  * families; strides (0, 4, 8) over 8 consecutive seeds sweep 16
  * consecutive rotation slots, so each family sees every class.
  */
class FuzzDiffSpec extends AnyFunSuite {

  /** Events-only query families under fuzz (names = Registry keys). */
  private val core = Vector(
    "q353_window_funnel", "q375_sliding_funnel", "q367_markov_stationary")
  private val rotation = Vector(
    "q11_sessionize",      // session windows (gap rule, ts+event_id order)
    "q12_hour_buckets",    // time-bucketed agg
    "q88_value_histogram", // histogram binning (NULL-bin ordering)
    "q90_funnel",          // unbounded funnel
    "q122_markov_transitions", // first-order transition matrix
    "q126_mad_outliers",   // robust z (MAD = 0 on identical values)
    "q174_rolling_actives",// DAU/WAU rolling distinct
    "q177_funnel_latency", // funnel latency percentiles
    "q214_mann_whitney",   // rank-sum test (ties in ranks)
    "q260_spearman",       // rank correlation (tie correction)
    "q285_activity_streaks", // islands-and-gaps window
    "q335_welch_ttest",    // two-sample t (degenerate arms)
    "q373_bounce_rate")    // sessionized bounce shares

  test("engine matches DuckDB on 104 seeded adversarial fixtures " +
    "across 16 query families") {
    FuzzHarness.sweep(GraftSpark.spark, "events", FuzzFixtures.Classes,
      seeds = 8,
      write = (s, cls, seed, dir) => { FuzzFixtures.write(s, cls, seed, dir); () },
      core = core, rotation = rotation, strides = Seq(0, 4, 8))
  }
}
