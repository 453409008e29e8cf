package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape pins for the round-12 additions — the assertions that
  * keep a refactor from trading q375's linear sliding-funnel plan for
  * the per-anchor join quadratic it was designed to avoid.
  */
class R12PlanSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  val sf = GraftSpark.sf

  private def plan(q: String): String =
    graft.queries.Registry.all(q)(spark, sf)
      .queryExecution.executedPlan.toString

  test("q375 as-of lookups ride per-user RANGE windows, never a range join") {
    val p = plan("q375_sliding_funnel")
    // the next-click / next-purchase lookups are strictly-after RANGE
    // frames partitioned on user_id — one linear pass each, pruned to
    // the column its consumer needs
    assert(p.contains("specifiedwindowframe(RangeFrame, 1, unboundedfollowing"),
      "strictly-after RANGE frame missing")
    assert(p.split("windowspecdefinition\\(user_id").length - 1 >= 2,
      "windows not keyed on user_id")
    // the second hop is an exact-key equi-join on (user, click instant),
    // never a per-anchor range/cross join over the event stream
    assert(!p.contains("CartesianProduct"), "per-anchor cross join leaked in")
    assert(p.contains("[user_id#") && p.contains("nxc#"),
      "click-instant equi-join keys missing")
  }

  test("q375 stage report unpivots via stack — one aggregate evaluation") {
    val p = plan("q375_sliding_funnel")
    assert(p.contains("Generate stack(3"),
      "stage report must stack-unpivot the single aggregated row")
    // a 3-way union would re-run the window+join subtree per stage row
    assert(!p.contains("Union"), "union re-evaluation crept back in")
  }
}
