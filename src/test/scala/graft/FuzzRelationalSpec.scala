package graft

import org.scalatest.funsuite.AnyFunSuite

/** Differential fuzz gate, relational/stats arm: seeded adversarial
  * `lineitem`/`orders`/`customer` fixtures
  * ([[FuzzRelationalFixtures]] — empty tables, constant prices,
  * duplicate (orderkey, linenumber) pairs, orphan join keys,
  * one-customer skew, all-same-day calendars, sub-top-k tails) run
  * engine-vs-DuckDB through [[FuzzHarness]].
  *
  * 12 classes × 8 seeds = 96 fixtures × 6 families = 576 comparisons.
  * Core (every fixture): q17 running revenue — this round's sf0.1 tie
  * bug reproduced exactly the dup_line_keys shape — plus the two
  * quantile/degenerate-calendar families (equi-depth histogram,
  * Croston intermittent demand). Rotation: 21 stats/relational
  * families chosen for division-guard and degenerate-group risk;
  * strides (0, 7, 14) over 8 consecutive seeds sweep 22 consecutive
  * rotation slots, so every family meets every class at least once.
  */
class FuzzRelationalSpec extends AnyFunSuite {

  private val core = Vector(
    "q17_running_revenue",      // running window (total-order tie rule)
    "q125_equidepth_histogram", // quantile bins (identical values)
    "q352_croston_forecast")    // intermittent demand (zero-gap calendar)
  private val rotation = Vector(
    "q01_pricing_summary",   // grouped agg (empty groups, constant cols)
    "q10_top_orders",        // sort+limit top-k (ties, short tables)
    "q15_rollup",            // ROLLUP null-label rows
    "q34_rfm_features",      // recency/frequency/monetary (one-order users)
    "q79_cube_totals",       // CUBE grouping sets
    "q101_column_profile",   // per-column profile (empty/constant input)
    "q114_corr_matrix",      // Pearson grid (zero variance → NULL)
    "q118_pareto_customers", // cumulative share (single customer = 100%)
    "q158_ks_drift",         // KS statistic (empty/degenerate arms)
    "q168_decision_stump",   // split search (constant target)
    "q173_period_growth",    // period-over-period (zero prev divisor)
    "q218_fifo_matching",    // FIFO inventory walk (demand > supply)
    "q220_benford_audit",    // leading-digit law (tiny samples)
    "q228_wilson_ranking",   // Wilson bound (zero trials)
    "q246_assortativity",    // degree correlation (constant degrees)
    "q270_abc_xyz_matrix",   // CV classes (zero mean → CV divide)
    "q276_lorenz_gini",      // Gini (all-equal values → 0, not NaN)
    "q293_arc_elasticity",   // arc elasticity (zero midpoint divisor)
    "q302_woe_encoding",     // weight of evidence (zero cells → log 0)
    "q313_xmr_chart",        // XmR control chart (one-row moving range)
    "q366_hill_tail_index")  // Hill estimator (fewer than 101 spenders)

  test("engine matches DuckDB on 96 seeded adversarial TPC-H fixtures " +
    "across 24 query families") {
    FuzzHarness.sweep(GraftSpark.spark, "relational",
      FuzzRelationalFixtures.Classes, seeds = 8,
      write = FuzzRelationalFixtures.write,
      core = core, rotation = rotation, strides = Seq(0, 7, 14))
  }
}
