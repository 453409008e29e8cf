package graft

import graft.streaming.EventStreams

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

/** Watermark semantics: in append mode, events arriving later than the
  * watermark allows must be dropped from already-finalized windows — the
  * property that bounds aggregation state on an unbounded stream. */
class WatermarkSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark

  private def ns(hours: Double): Long = (hours * 3600 * 1e9).toLong

  test("append-mode hourly buckets drop events older than the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long, Long, String, Double, String)]
    val df = input.toDF()
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")

    val q = EventStreams.hourlyBuckets(df).writeStream
      .outputMode(OutputMode.Append)
      .format("memory").queryName("wm_test")
      .start()
    try {
      // Batch 1: events in hours 0 and 1, then an event at hour 10 that
      // advances the watermark to hour 8 and closes the early windows.
      input.addData(
        (1L, ns(0.5), 1L, "click", 10.0, "{}"),
        (2L, ns(1.5), 1L, "click", 20.0, "{}"),
        (3L, ns(10.5), 1L, "click", 30.0, "{}"))
      q.processAllAvailable()
      // Batch 2: a straggler for hour 0 — far behind the watermark.
      input.addData((4L, ns(0.7), 1L, "click", 99.0, "{}"))
      q.processAllAvailable()
      // Batch 3: advance event time so remaining windows can close.
      input.addData((5L, ns(20.5), 1L, "click", 1.0, "{}"))
      q.processAllAvailable()
    } finally q.stop()

    val out = spark.table("wm_test")
      .select("bucket_s", "n", "total")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // Hour-0 window: only the on-time event; the straggler was dropped.
    assert(out(0L) == (1L, 10.0), s"hour-0 window: ${out.get(0L)}")
    assert(out(3600L) == (1L, 20.0))
  }

  test("event-time timeout expires idle session state; a late return restarts counts") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long, Long, String, Double, String)]
    val events = input.toDF()
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("event_time",
        org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
      .withWatermark("event_time", "2 hours")
      .select("event_id", "ts", "user_id", "event_type", "value", "event_time")
      .as[EventStreams.EventT]

    val q = EventStreams.sessionizeExpiring(events,
        expireAfterNs = ns(2.0)).toDF()
      .writeStream.outputMode(org.apache.spark.sql.streaming.OutputMode.Update)
      .format("memory").queryName("et_timeout_test")
      .start()
    try {
      // Batch 1: user 1 has two events in one session at hour 0.
      input.addData(
        (1L, ns(0.1), 1L, "click", 1.0, "{}"),
        (2L, ns(0.2), 1L, "click", 1.0, "{}"))
      q.processAllAvailable()
      // Batch 2: another user far ahead — watermark → hour 8, which is
      // past user 1's expiry (0.2 h + 2 h), so user 1's state dies.
      input.addData((3L, ns(10.0), 2L, "click", 1.0, "{}"))
      q.processAllAvailable()
      // Batch 3: user 1 returns — state restarted, counts begin again.
      input.addData((4L, ns(11.0), 1L, "click", 1.0, "{}"))
      q.processAllAvailable()
    } finally q.stop()

    val rows = spark.table("et_timeout_test")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // user 1's emissions: (2 events, 1 session) from batch 1, then a
    // RESTARTED (1 event, 1 session) after expiry — not (3, 2), which is
    // what un-expired state would have produced.
    assert(rows.contains((1L, 2L, 1L)), s"missing pre-expiry emission: $rows")
    assert(rows.contains((1L, 1L, 1L)), s"state did not restart after expiry: $rows")
    assert(!rows.contains((1L, 3L, 2L)), s"state survived past its event-time expiry: $rows")
    spark.catalog.dropTempView("et_timeout_test")
  }

  test("stream-stream interval join: on-time pair emits, post-watermark match does not") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long, Long, String, Double, String)]
    val df = input.toDF()
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")

    val q = EventStreams.clickAttribution(df).writeStream
      .outputMode(OutputMode.Append)
      .format("memory").queryName("ssj_test")
      .start()
    try {
      // Batch 1: click then purchase 6 min later for user 1 → one pair.
      // The t=10h click/purchase (disjoint users) advance BOTH sides'
      // watermarks to hour 8 — the click side's watermark only moves on
      // click events (each side is filtered before its watermark).
      input.addData(
        (1L, ns(0.2), 1L, "click", 1.0, "{}"),
        (2L, ns(0.3), 1L, "purchase", 2.0, "{}"),
        (3L, ns(10.0), 98L, "click", 3.0, "{}"),
        (4L, ns(10.0), 99L, "purchase", 4.0, "{}"))
      q.processAllAvailable()
      // Batch 2: a purchase at t=0.4h whose matching click exists but is
      // hours behind the watermark — the click's join state is evicted
      // (it can no longer match any on-time purchase) and the late
      // purchase itself is watermark-dropped. No new pair may emit;
      // unbounded-buffer semantics would have produced (5,1).
      input.addData((5L, ns(0.4), 1L, "purchase", 5.0, "{}"))
      q.processAllAvailable()
    } finally q.stop()

    val pairs = spark.table("ssj_test")
      .select("purchase_id", "click_id").as[(Long, Long)].collect().toSet
    assert(pairs == Set((2L, 1L)), s"got $pairs")
    spark.catalog.dropTempView("ssj_test")
  }
}
