package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Dataset, Row}
import org.scalatest.funsuite.AnyFunSuite

/** Restart semantics of the checkpointed `foreachBatch` parquet-sink
  * drive path ([[graft.streaming.EventStreams.runToParquet]]'s shape):
  * a stream stopped after a prefix of its input and RESTARTED from the
  * same checkpoint must process only the unseen files — the final sink
  * holds every input row exactly once, no loss on the processed prefix,
  * no replay of committed batches. This is the recovery property the
  * production landing pattern (checkpoint + idempotent batch commit)
  * depends on; q112/q182 gate the steady-state values, this pins the
  * crash/restart edge.
  */
class StreamRestartSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark

  test("checkpointed foreachBatch parquet sink is exactly-once across restart") {
    val ev = graft.io.Tables.events(spark, GraftSpark.sf)
      .select("event_id", "ts", "user_id", "event_type", "value")
    val stage = Files.createTempDirectory("graft-restart-stage").toString
    ev.repartition(4, col("event_id"))
      .write.mode("overwrite").parquet(s"$stage/all")
    val files = new java.io.File(s"$stage/all").listFiles
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
    assert(files.length == 4, "fixture must split into 4 source files")

    val live = Files.createTempDirectory("graft-restart-live").toString
    val out = Files.createTempDirectory("graft-restart-out").toString + "/out"
    val chk = Files.createTempDirectory("graft-restart-chk").toString
    def copyIn(n: Int): Unit = files.take(n).foreach { f =>
      Files.copy(f.toPath, Paths.get(live, f.getName),
        StandardCopyOption.REPLACE_EXISTING)
    }
    val schema = ev.schema
    def runOnce(): Unit = {
      val q = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(live)
        .writeStream.outputMode("append")
        .option("checkpointLocation", chk)
        .foreachBatch { (b: Dataset[Row], _: Long) =>
          b.write.mode("append").parquet(out)
        }
        .start()
      try q.processAllAvailable() finally q.stop()
    }

    copyIn(2); runOnce()
    val afterPrefix = spark.read.parquet(out).count()
    assert(afterPrefix > 0 && afterPrefix < ev.count(),
      "prefix run should commit some but not all rows")

    copyIn(4); runOnce() // same checkpoint: only files 3-4 may process
    val got = spark.read.parquet(out)
    assert(got.count() == ev.count(),
      s"restart lost or replayed rows: ${got.count()} vs ${ev.count()}")
    assert(got.exceptAll(ev).isEmpty && ev.exceptAll(got).isEmpty,
      "sink multiset differs from input after restart")
  }

  test("per-batchId overwrite sink absorbs a mid-batch retry without " +
    "duplicating rows (runToParquet contract)") {
    // foreachBatch is at-least-once: a crash AFTER the parquet write but
    // BEFORE the checkpoint commit replays the whole micro-batch. The
    // runToParquet pattern keys each write on batchId with OVERWRITE, so
    // the replay rewrites its own directory instead of appending a
    // second copy. Injected failure: batch 1's first attempt throws
    // after its write has landed.
    val ev = graft.io.Tables.events(spark, GraftSpark.sf)
      .select("event_id", "ts", "user_id", "event_type", "value")
    val stage = Files.createTempDirectory("graft-retry-stage").toString
    ev.repartition(3, col("event_id"))
      .write.mode("overwrite").parquet(s"$stage/all")
    val files = new java.io.File(s"$stage/all").listFiles
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
    val live = Files.createTempDirectory("graft-retry-live").toString
    files.foreach { f =>
      Files.copy(f.toPath, Paths.get(live, f.getName),
        StandardCopyOption.REPLACE_EXISTING)
    }
    val out = Files.createTempDirectory("graft-retry-out").toString
    val chk = Files.createTempDirectory("graft-retry-chk").toString
    val schema = ev.schema
    val crashed = new java.util.concurrent.atomic.AtomicBoolean(false)
    def runOnce(): Unit = {
      val q = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(live)
        .writeStream.outputMode("append")
        .option("checkpointLocation", chk)
        .foreachBatch { (b: Dataset[Row], id: Long) =>
          b.write.mode("overwrite").parquet(s"$out/batch=$id")
          if (id == 1L && !crashed.getAndSet(true))
            throw new RuntimeException("injected mid-batch crash after write")
        }
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    intercept[Exception](runOnce()) // first attempt of batch 1 dies
    assert(crashed.get(), "failure injection never fired")
    runOnce() // same checkpoint: batch 1 replays into batch=1 (overwrite)
    val got = spark.read.schema(schema).parquet(
      new java.io.File(out).listFiles
        .filter(_.getName.startsWith("batch=")).map(_.toString): _*)
    assert(got.count() == ev.count(),
      s"mid-batch retry duplicated or lost rows: ${got.count()} vs ${ev.count()}")
    assert(got.exceptAll(ev).isEmpty && ev.exceptAll(got).isEmpty,
      "sink multiset differs from input after mid-batch retry")
  }

  /** Shared harness for the Complete-mode SKETCH aggregates (q102 CMS,
    * q188 KMV): the aggregation buffer lives in the state store, so a
    * restart from checkpoint must resume the sketch mid-stream — stop
    * after a 2-file prefix, assert the sketch equals the batch sketch
    * of the prefix, feed the remaining files into the SAME checkpoint,
    * assert the final sketch equals the batch sketch of everything.
    * Prefix equality is what proves state RECOVERY (a sketch silently
    * rebuilt from only the post-restart files would usually still have
    * the right row count). Complete mode drives a whole-result
    * overwrite each trigger — idempotent by construction. */
  private def assertSketchRestart(
      staged: org.apache.spark.sql.DataFrame,
      pipeline: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame,
      key: Row => String, fingerprint: Row => String): Unit = {
    val stage = Files.createTempDirectory("graft-sketch-stage").toString
    staged.repartition(4, col("event_id"))
      .write.mode("overwrite").parquet(s"$stage/all")
    val files = new java.io.File(s"$stage/all").listFiles
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
    assert(files.length == 4, "fixture must split into 4 source files")
    val live = Files.createTempDirectory("graft-sketch-live").toString
    val out = Files.createTempDirectory("graft-sketch-out").toString + "/out"
    val chk = Files.createTempDirectory("graft-sketch-chk").toString
    def copyIn(n: Int): Unit = files.take(n).foreach { f =>
      Files.copy(f.toPath, Paths.get(live, f.getName),
        StandardCopyOption.REPLACE_EXISTING)
    }
    val schema = staged.schema
    def runOnce(): Unit = {
      val confKey = "spark.sql.shuffle.partitions"
      val prev = spark.conf.get(confKey)
      val q =
        try {
          spark.conf.set(confKey, "4")
          pipeline(spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1").parquet(live))
            .writeStream.outputMode("complete")
            .option("checkpointLocation", chk)
            .foreachBatch { (b: Dataset[Row], _: Long) =>
              b.write.mode("overwrite").parquet(out)
            }
            .start()
        } finally spark.conf.set(confKey, prev)
      try q.processAllAvailable() finally q.stop()
    }
    def sketchOf(df: org.apache.spark.sql.DataFrame): Map[String, String] =
      df.collect().map(r => key(r) -> fingerprint(r)).toMap

    copyIn(2); runOnce()
    val prefixBatch = sketchOf(pipeline(
      spark.read.schema(schema).parquet(
        files.take(2).map(_.toString): _*)))
    assert(sketchOf(spark.read.parquet(out)) == prefixBatch,
      "mid-stream sketch diverges from the batch sketch of the prefix")

    copyIn(4); runOnce() // same checkpoint: state must resume, not reset
    val fullBatch = sketchOf(pipeline(staged))
    assert(sketchOf(spark.read.parquet(out)) == fullBatch,
      "post-restart sketch diverges from the batch sketch of all input " +
        "(state lost or replayed across the checkpoint restart)")
  }

  test("streaming KMV sketch (q188 shape) resumes its state across restart") {
    val ev = graft.io.Tables.events(spark, GraftSpark.sf)
      .select("event_id", "user_id", "event_type")
    assertSketchRestart(
      ev,
      df => df.select(col("event_type"),
          graft.functions.GraftFunctions.md5_63(
            concat(lit("kmv:"), col("user_id").cast("string"))).as("h"))
        .groupBy("event_type")
        .agg(graft.functions.GraftFunctions.kmv_agg(col("h"), 64).as("mins")),
      key = _.getAs[String]("event_type"),
      fingerprint = _.getAs[Seq[Long]]("mins").mkString(","))
  }

  test("streaming HLL registers (q237 shape) resume across restart") {
    val ev = graft.io.Tables.events(spark, GraftSpark.sf)
      .select("event_id", "user_id", "event_type")
    assertSketchRestart(
      ev,
      df => df.select(col("event_type"),
          graft.functions.GraftFunctions.md5_63(
            concat(lit("hll:"), col("user_id").cast("string"))).as("h"))
        .groupBy("event_type")
        .agg(graft.functions.GraftFunctions.hll_agg(col("h")).as("regs")),
      key = _.getAs[String]("event_type"),
      fingerprint = _.getAs[Seq[Int]]("regs").mkString(","))
  }

  test("streaming bottom-k quantile sample (q203 shape) resumes across restart") {
    val ev = graft.io.Tables.events(spark, GraftSpark.sf)
      .select("event_id", "event_type", "value")
    assertSketchRestart(
      ev,
      df => df.select(col("event_type"), struct(
          graft.functions.GraftFunctions.md5_63(
            concat(lit("qsk:"), col("event_id").cast("string"))).as("h"),
          col("event_id"),
          graft.functions.GraftFunctions.qdec(col("value"), 18, 2).as("v"))
          .as("s"))
        .groupBy("event_type")
        .agg(graft.functions.GraftFunctions.topk_agg(col("s"), 256)
          .as("samp")),
      key = _.getAs[String]("event_type"),
      fingerprint = _.getAs[Seq[Row]]("samp")
        .map(x => s"${x.getLong(0)}:${x.getLong(1)}:${x.get(2)}")
        .mkString(","))
  }

  test("streaming count-min sketch (q102 shape) resumes its cells across restart") {
    val ev = graft.io.Tables.events(spark, GraftSpark.sf)
      .select("event_id", "props")
    assertSketchRestart(
      ev,
      df => df.select(get_json_object(col("props"), "$.k").as("k"))
        .filter(col("k").isNotNull)
        .select(col("k"), explode(array((0 until 4).map(lit): _*)).as("r"))
        .withColumn("b", pmod(
          graft.functions.GraftFunctions.md5_63(
            concat(col("r").cast("string"), lit(":"), col("k"))),
          lit(64L)))
        .groupBy("r", "b").agg(count(lit(1)).as("cell")),
      key = r => s"${r.getAs[Int]("r")}:${r.getAs[Long]("b")}",
      fingerprint = _.getAs[Long]("cell").toString)
  }
}
