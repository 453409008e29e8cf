package graft

import org.scalatest.funsuite.AnyFunSuite

/** Batching-invariance fuzz for the streaming runtime (VERDICT r13
  * item 3): the SAME seeded fixtures ([[StreamFuzzFixtures]]) replay
  * through the REGISTERED streaming queries under three different
  * micro-batch partitionings, and every replay must equal the DuckDB
  * batch oracle — so the stream-final result is proven identical under
  * every split AND equal to the batch semantics, in one pass.
  *
  * Layouts (see `StreamingQueries.BatchingLayoutProp`):
  *  - `chrono:1` — whole input, one micro-batch (the anchor; the shape
  *    the sf gate runs).
  *  - `chrono:4` — four chronological micro-batches: session merges and
  *    tie bursts split across batch boundaries, watermark advancing and
  *    evicting state mid-run.
  *  - `late:4:120` — four batches where a seeded ~1/7 of rows arrive
  *    120 minutes (exactly the watermark horizon) after their event
  *    time: bounded lateness landing at the acceptance boundary every
  *    watermarked operator must honor without dropping.
  *
  * The late sweep runs only the ORDER-ROBUST queries: the fMGWS folds
  * (q62/q65 sessionize, q182 ledger) document cross-batch arrival
  * order as a precondition ("cross-batch disorder is the upstream
  * watermark's job" — EventStreams.sessionize), so feeding them
  * disorder would test a contract the operators explicitly don't make.
  * q112's compaction stays in: its winner is chosen by (ts, event_id),
  * not arrival order, by design.
  *
  * 5 classes × 2 seeds = 10 fixtures; 12 + 12 + 9 = 33 comparisons per
  * fixture = 330 engine-vs-DuckDB checks across the three sweeps.
  */
class StreamBatchingFuzzSpec extends AnyFunSuite {

  private val all = Vector(
    "q61_stream_hourly", "q62_stream_sessions", "q63_stream_hourly_append",
    "q64_stream_dedup", "q65_stream_sessions_expiring", "q66_stream_enrich",
    "q92_session_windows", "q93_stream_session_windows",
    "q102_stream_heavy_hitters", "q112_stream_compact",
    "q182_stream_ledger", "q188_stream_kmv")

  /** Queries whose stream-vs-batch equality holds under bounded
    * cross-batch lateness (native watermarked ops, Complete-mode
    * order-free aggregates, and the (ts, event_id)-keyed compaction). */
  private val lateSafe = Vector(
    "q61_stream_hourly", "q63_stream_hourly_append", "q64_stream_dedup",
    "q66_stream_enrich", "q92_session_windows",
    "q93_stream_session_windows", "q102_stream_heavy_hitters",
    "q112_stream_compact", "q188_stream_kmv")

  private def sweepWithLayout(layout: String, name: String,
                              queries: Vector[String]): Unit = {
    val prop = graft.queries.StreamingQueries.BatchingLayoutProp
    sys.props(prop) = layout
    try {
      FuzzHarness.sweep(GraftSpark.spark, name, StreamFuzzFixtures.Classes,
        seeds = 2, write = StreamFuzzFixtures.write,
        core = queries, rotation = Vector(), strides = Seq())
    } finally sys.props.remove(prop)
  }

  test("single-batch replay matches DuckDB on 10 seeded fixtures " +
    "(anchor: 120 comparisons)") {
    sweepWithLayout("chrono:1", "streambatch_chrono1", all)
  }

  test("4-batch chronological replay matches DuckDB on the same " +
    "fixtures (120 comparisons)") {
    sweepWithLayout("chrono:4", "streambatch_chrono4", all)
  }

  test("4-batch replay with horizon-exact late arrivals matches DuckDB " +
    "for the order-robust queries (90 comparisons)") {
    sweepWithLayout("late:4:120", "streambatch_late", lateSafe)
  }
}
