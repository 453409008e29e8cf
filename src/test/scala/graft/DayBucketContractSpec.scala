package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the day-bucketing contract documented at
  * `Tables.normalizeEpochNs` / `ops/Sweep.scala` (ADVICE r9): all graft
  * day math uses truncating integer division (`div`), which mirrors
  * DuckDB's integer `//` exactly (both truncate toward zero — measured
  * on DuckDB 1.0: `-1 // 86400 = 0`, `-86401 // 86400 = -1`), so the
  * gate never diverges at any sign; but CALENDAR correctness of day
  * labels additionally needs ts ≥ 0, which this spec asserts on the
  * canonical test tables.
  */
class DayBucketContractSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  val sf = GraftSpark.sf

  test("Spark `div` truncates toward zero (the semantics the oracles mirror)") {
    import spark.implicits._
    val got = Seq(-1L, -86400L, -86401L, 1L, 86401L).toDF("t")
      .select(expr("t div 86400").as("d")).collect().map(_.getLong(0))
    // DuckDB 1.0 integer `//` on the same inputs: 0, -1, -1, 0, 1.
    assert(got.toSeq == Seq(0L, -1L, -1L, 0L, 1L))
  }

  test("canonical events ts is non-negative ns-epoch (day labels calendar-valid)") {
    val mn = graft.io.Tables.events(spark, sf)
      .agg(min(col("ts"))).collect()(0).getLong(0)
    assert(mn >= 0L, s"events.ts min=$mn — pre-epoch feeds must floor-adjust upstream")
  }

  test("orders/lineitem date columns are post-epoch") {
    val o = graft.io.Tables.orders(spark, sf)
      .agg(min(expr("cast(cast(o_orderdate as timestamp) as long)")))
      .collect()(0).getLong(0)
    val l = graft.io.Tables.lineitem(spark, sf)
      .agg(min(expr("cast(cast(l_shipdate as timestamp) as long)")))
      .collect()(0).getLong(0)
    assert(o >= 0L && l >= 0L)
  }
}
