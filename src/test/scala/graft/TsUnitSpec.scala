package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The timestamp-unit contract of the events source: `Tables.events`
  * must yield the SAME canonical ns-epoch `LongType` `ts` whatever
  * physical type the parquet writer chose — INT64 ns-epoch,
  * TIMESTAMP(MICROS) with `isAdjustedToUTC=false` (read as
  * TIMESTAMP_NTZ), or instant-semantics TIMESTAMP. Round 6 shipped a
  * hard-coded nanos assumption that crashed 18 event-time queries and
  * mis-bucketed the streaming family by 1000× when the testdata arrived
  * as micros; this spec pins the adaptive fix so it cannot regress
  * silently on ANY unit.
  */
class TsUnitSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  val sf = GraftSpark.sf

  /** Stage the (already-normalized) events frame back out as
    * events.parquet under a fresh dir with `ts` re-encoded in the given
    * physical type, so `Tables.events` sees exactly what a foreign
    * writer would produce. */
  private def variantDir(encode: String): String = {
    val d = Files.createTempDirectory(s"graft-tsunit").toString
    graft.io.Tables.events(spark, sf)
      .withColumn("ts", expr(encode))
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    d
  }

  test("ns-long, TIMESTAMP_NTZ(micros) and instant TIMESTAMP all normalize identically") {
    // Canonical expectation: the long-encoded variant (pass-through path).
    val longDir = variantDir("ts") // LongType as-is
    // Micros-precision instants; source ts values are micros*1000 so the
    // ÷1000 re-encode is exact and all three variants carry equal instants.
    val ntzDir = variantDir("cast(timestamp_micros(ts div 1000) as timestamp_ntz)")
    val tzDir = variantDir("timestamp_micros(ts div 1000)")

    val want = graft.io.Tables.events(spark, longDir)
    assert(want.schema("ts").dataType ==
      org.apache.spark.sql.types.LongType)

    for (dir <- Seq(ntzDir, tzDir)) {
      val got = graft.io.Tables.events(spark, dir)
      assert(got.schema("ts").dataType ==
        org.apache.spark.sql.types.LongType,
        s"$dir: ts not normalized to LongType")
      // Same column order (withColumn must preserve position).
      assert(got.columns.toSeq == want.columns.toSeq)
      val a = got.select("event_id", "ts")
      val b = want.select("event_id", "ts")
      assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
        s"$dir: normalized ts values differ from canonical ns-epoch")
    }

    // The downstream idiom every event-time query relies on must analyze
    // and bucket identically on a foreign-unit source.
    val sess = graft.io.Tables.events(spark, ntzDir)
      .select(expr("ts div 1000000000").as("s"))
      .agg(min("s"), max("s")).head()
    val ref = want.select(expr("ts div 1000000000").as("s"))
      .agg(min("s"), max("s")).head()
    assert(sess == ref)
  }

  test("unsupported ts type fails loudly, not with silent mis-bucketing") {
    val df = spark.range(1).selectExpr("cast(id as string) as ts")
    val e = intercept[IllegalArgumentException] {
      graft.io.Tables.normalizeEpochNs(df, "ts")
    }
    assert(e.getMessage.contains("ts"))
  }
}
