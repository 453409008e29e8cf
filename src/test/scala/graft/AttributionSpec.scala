package graft

import graft.ops.Attribution

import org.scalatest.funsuite.AnyFunSuite

class AttributionSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._

  private val G = 1000000000L // ns per second

  test("exp decay weights and per-purchase renormalization, hand-checked") {
    val events = Seq(
      (10L, 1L, "purchase", 30000L * G),
      (1L, 1L, "click", 30000L * G),          // Δt = 0 → w = 1
      (2L, 1L, "click", (30000L - 21600L) * G), // Δt = τ → w = e⁻¹
      (3L, 1L, "click", (30000L - 90000L) * G), // outside 24 h lookback
      (4L, 1L, "click", 31000L * G),          // after the purchase
      (5L, 2L, "click", 30000L * G),          // other user
      (6L, 1L, "view", 30000L * G)            // not a click
    ).toDF("event_id", "user_id", "event_type", "ts")
    val out = Attribution.timeDecay(events, lookbackHours = 24,
      tauSeconds = 21600.0)
      .as[(Long, Long, Long, Double, Double)].collect()
      .map(r => r._2 -> r).toMap
    assert(out.keySet == Set(1L, 2L))
    assert(out(1L)._4 == 1.0 && out(2L)._4 == 0.367879)
    // credits renormalize over the ROUNDED weights: 1/1.367879, e⁻¹/1.367879
    assert(out(1L)._5 == BigDecimal(1.0 / 1.367879)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(out(2L)._5 == BigDecimal(0.367879 / 1.367879)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("single-click purchases get full credit") {
    val events = Seq(
      (10L, 1L, "purchase", 30000L * G),
      (1L, 1L, "click", 29999L * G)
    ).toDF("event_id", "user_id", "event_type", "ts")
    val out = Attribution.timeDecay(events, 24, 21600.0)
      .as[(Long, Long, Long, Double, Double)].collect()
    assert(out.length == 1 && out.head._5 == 1.0)
  }
}
