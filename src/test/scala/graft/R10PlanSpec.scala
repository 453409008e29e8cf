package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape pins for the round-10 waves' scale-critical claims —
  * the assertions that keep a future refactor from silently trading
  * the 100 TB plan for a working-but-wrong one (see PlanShapeSpec for
  * the earlier families).
  */
class R10PlanSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  val sf = GraftSpark.sf

  private def plan(q: String): String =
    graft.queries.Registry.all(q)(spark, sf)
      .queryExecution.executedPlan.toString

  test("q332 reads documents once and windows on the hashed gram key") {
    val p = plan("q332_duplicate_ngram_mass")
    // one corpus scan: the gram frame is built once and reduced, never
    // re-scanned for the corpus-total side
    assert(p.split("FileScan parquet").length - 1 == 1, p.take(400))
    // the corpus-occurrence window partitions on the 63-bit gram hash —
    // groups are |sources|-bounded, never an unpartitioned window
    assert(p.contains("windowspecdefinition(g#"), "window not keyed on g")
  }

  test("q366 takes its order statistics via TakeOrderedAndProject") {
    val p = plan("q366_hill_tail_index")
    assert(p.contains("TakeOrderedAndProject"),
      "top-101 must be a bounded heap, not a global sort")
  }

  test("q352 demand aggregate partial-aggregates before the typed fold") {
    val p = plan("q352_croston_forecast")
    assert(p.contains("partial_sum") || p.contains("partial_count"),
      "demand reduction must be map-side partial")
    assert(p.contains("TakeOrderedAndProject"),
      "top-50 output must be a bounded heap")
  }

  private def analyzed(q: String): String =
    graft.queries.Registry.all(q)(spark, sf)
      .queryExecution.analyzed.toString

  // VERDICT r10 #2: every order/customer-keyed pair generator must ride
  // a HARD cap, not a "baskets are small" argument. The analyzed plan is
  // pinned (the memoized co-edge frame executes as InMemoryTableScan, so
  // the executed plan may hide the filter behind the cache).
  test("q208 wedge excludes hub customers above the degree cap") {
    val p = analyzed("q208_adamic_adar")
    assert(p.contains("size(ss"), "supplier-set size filter missing")
    assert(p.contains("256"), "HubDegreeCap literal missing from plan")
  }

  test("q341/q104 basket explode is size-capped before the in-row pair build") {
    val p = analyzed("q341_local_clustering")
    assert(p.contains("size(ps"), "basket size filter missing")
    assert(p.contains("256"), "BasketCap literal missing from plan")
    // q104 consumes the SAME memoized partCoEdges frame, but its whole
    // plan rides Triangles' LogicalRDD bridge (lineage cut), so the cap
    // can't be read off its analyzed plan — the shared-frame identity is
    // the pin: one SessionMemo key serves both queries.
  }

  test("q137 pair self-join semi-excludes over-cap baskets") {
    val p = plan("q137_basket_lift")
    assert(p.contains("LeftSemi"), "hub-order semi-join missing")
    assert(analyzed("q137_basket_lift").contains("256"),
      "BasketCap literal missing from plan")
  }

  test("q355 candidate arms reuse one signature build") {
    // three banded arms over the memoized signature frame: the executed
    // plan may show InMemoryTableScan (warm) or the single build
    // lineage (cold), but never three independent token explosions of
    // the documents table per arm.
    val p = plan("q355_lsh_band_sweep")
    val scans = p.split("FileScan parquet \\[text").length - 1
    val cached = p.split("InMemoryTableScan").length - 1
    assert(cached >= 3 || scans <= 3,
      s"signature build not shared: $scans raw scans, $cached cached reads")
  }
}
