package graft

import java.nio.file.Files

import graft.queries.RelationalQueries
import graft.streaming.EventStreams

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class StreamingSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._
  val sf = GraftSpark.sf

  private val eventsSchema = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", LongType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  // Stage the NORMALIZED events frame (ts → canonical ns-epoch long, any
  // physical unit; see Tables.normalizeEpochNs) so the pinned LongType
  // read schema below holds — mirrors StreamingQueries.stagedDir.
  private def streamDir(): String = {
    val dir = Files.createTempDirectory("graft-stream")
    graft.io.Tables.events(spark, sf)
      .write.mode("overwrite").parquet(dir.resolve("ev").toString)
    dir.resolve("ev").toString
  }

  test("streaming hourly buckets == batch q12 on the same events") {
    val stream = spark.readStream.schema(eventsSchema).parquet(streamDir())
    // Complete mode: append would hold back the trailing (< watermark)
    // windows, which never close in a finite test input.
    val got = EventStreams.runToMemory(spark,
      EventStreams.hourlyBuckets(stream), "hourly", OutputMode.Complete)
      .select("event_type", "bucket_s", "n", "total")
      .orderBy("event_type", "bucket_s")
      .collect().toSeq
    val want = RelationalQueries.q12(spark, sf)
      .select("event_type", "bucket_s", "n", "total")
      .collect().toSeq
    assert(got == want)
  }

  test("streaming sessionize == batch q11 on the same events") {
    val stream = spark.readStream.schema(eventsSchema).parquet(streamDir())
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[EventStreams.Event]
    val got = EventStreams.runToMemory(spark,
      EventStreams.sessionize(stream).toDF(), "sessions", OutputMode.Update)
    // Update mode may emit several rows per user across micro-batches;
    // the final state per user is the last emission.
    val finalPerUser = got.groupBy("user_id")
      .agg(max("n_events").as("n_events"), max("n_sessions").as("n_sessions"))
      .orderBy("user_id").collect().toSeq
    val want = RelationalQueries.q11(spark, sf)
      .select("user_id", "n_events", "n_sessions")
      .orderBy("user_id").collect().toSeq
    assert(finalPerUser.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))) ==
      want.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))))
  }

  test("q63 (closed windows) + trailing open windows == q61 (all windows)") {
    import graft.queries.StreamingQueries
    val all = StreamingQueries.q61(spark, sf).collect().toSet
    val closed = StreamingQueries.q63(spark, sf).collect().toSet
    assert(closed.subsetOf(all), "append emitted a window Complete mode lacks")
    val open = all -- closed
    // Every non-emitted window must genuinely be open at the final
    // watermark: end > max event time - 2h.
    val maxTsSec = graft.io.Tables.events(spark, sf)
      .agg(max(col("ts"))).head().getLong(0) / 1000000000L
    val wmSec = maxTsSec - 7200
    open.foreach { r =>
      val end = r.getAs[Long]("bucket_s") + 3600
      assert(end > wmSec, s"window ending $end was closed by wm $wmSec but not emitted")
    }
    assert(open.nonEmpty, "fixture has no trailing open windows — test vacuous")
  }

  test("repeated streaming runs retain no memory-sink tables (leak guard)") {
    import graft.queries.StreamingQueries
    val before = spark.catalog.listTables().count()
    StreamingQueries.q61(spark, sf).count()
    StreamingQueries.q64(spark, sf).count()
    StreamingQueries.q61(spark, sf).count()
    val after = spark.catalog.listTables().count()
    assert(after == before,
      s"memory-sink temp views leaked: $before tables before, $after after")
  }

  test("CDC compaction converges on change order despite out-of-order batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[EventStreams.Event]
    val q = EventStreams.compactLatest(input.toDS()).toDF().writeStream
      .outputMode(OutputMode.Update)
      .format("memory").queryName("cdc_test")
      .start()
    try {
      // Batch 1 delivers the LATEST change (ts 30) first.
      input.addData(EventStreams.Event(3L, 30L, 1L, "purchase", Some(9.0)))
      q.processAllAvailable()
      // Batch 2 arrives later but carries EARLIER changes — they must
      // bump the change count without stealing the win.
      input.addData(EventStreams.Event(1L, 10L, 1L, "view", Some(1.0)),
        EventStreams.Event(2L, 20L, 1L, "click", Some(2.0)))
      q.processAllAvailable()
    } finally q.stop()
    val fin = spark.table("cdc_test")
      .groupBy("user_id")
      .agg(max(struct(col("n_changes"), col("last_event_id"),
        col("last_event_type"), col("last_value"))).as("f"))
      .select("user_id", "f.*")
      .as[(Long, Long, Long, String, Double)].collect().toSeq
    spark.catalog.dropTempView("cdc_test")
    assert(fin == Seq((1L, 3L, 3L, "purchase", 9.0)))
  }

  test("incremental MV maintenance is micro-batch-slicing invariant") {
    import graft.ops.Incremental
    val ev = graft.io.Tables.events(spark, GraftSpark.sf)
      .withColumn("day", expr("ts div 86400000000000"))
    val keys = Seq("event_type", "day")
    // fold three arbitrary slices through the same partial-merge step
    // the foreachBatch sink runs, then compare to the one-shot partials
    val slices = Seq(
      ev.filter(col("event_id") % 3 === 0),
      ev.filter(col("event_id") % 3 === 1),
      ev.filter(col("event_id") % 3 === 2))
    val maintained = slices.tail.foldLeft(
      Incremental.partials(slices.head, keys, col("value"))) { (mv, b) =>
      Incremental.merge(Seq(mv, Incremental.partials(b, keys, col("value"))),
        keys).localCheckpoint()
    }
    val oneShot = Incremental.partials(ev, keys, col("value"))
    assert(maintained.unionByName(oneShot).distinct().count() ==
      oneShot.count()) // exact-set equality: decimal merge is slice-proof
  }

  test("q132 streamed MV == batch aggregation over the same events") {
    val got = graft.queries.Registry
      .all("q132_stream_incremental_mv")(spark, GraftSpark.sf)
    val want = graft.io.Tables.events(spark, GraftSpark.sf)
      .withColumn("day", expr("ts div 86400000000000"))
      .groupBy("event_type", "day")
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .cast("double").as("sum_value"),
        min(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .cast("double").as("min_value"),
        max(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .cast("double").as("max_value"))
    assert(got.unionByName(want).distinct().count() == want.count())
  }

  test("q225 left-outer join: matched rows equal q81; null rows are closed, unmatched purchases") {
    val lo = graft.queries.Registry.all("q225_stream_left_outer")(spark, sf)
      .collect()
    val inner = graft.queries.Registry.all("q81_stream_attribution")(spark, sf)
      .collect()
      .map(r => (r.getAs[Long]("purchase_id"), r.getAs[Long]("click_id")))
      .toSet
    val matched = lo.filter(!_.isNullAt(1))
      .map(r => (r.getAs[Long]("purchase_id"), r.getAs[Long]("click_id")))
      .toSet
    assert(matched == inner) // outer join adds rows, never changes pairs
    val nullP = lo.filter(_.isNullAt(1)).map(_.getAs[Long]("purchase_id")).toSet
    val matchedP = matched.map(_._1)
    assert(nullP.intersect(matchedP).isEmpty) // null-extends only zero-match rows
    assert(nullP.nonEmpty) // the synthetic stream leaves some unexplained
  }
}
