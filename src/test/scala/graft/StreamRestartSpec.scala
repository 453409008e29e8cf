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
}
