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
}
