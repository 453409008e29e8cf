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

  test("position-based: U-shaped credits, degenerate journeys, lookback edges") {
    val events = Seq(
      // purchase A: 4 clicks in window → 0.4 / 0.1 / 0.1 / 0.4
      (100L, 1L, "purchase", 30000L * G),
      (1L, 1L, "click", 20000L * G),
      (2L, 1L, "click", 21000L * G),
      (3L, 1L, "click", 22000L * G),
      (4L, 1L, "click", 23000L * G),
      (5L, 1L, "click", (30000L - 90000L) * G), // outside 24 h
      // purchase B: single click → 1.0
      (200L, 2L, "purchase", 30000L * G),
      (6L, 2L, "click", 29000L * G),
      // purchase C: two clicks → 0.5 / 0.5
      (300L, 3L, "purchase", 30000L * G),
      (7L, 3L, "click", 28000L * G),
      (8L, 3L, "click", 29000L * G)
    ).toDF("event_id", "user_id", "event_type", "ts")
    val out = Attribution.positionBased(events, lookbackHours = 24)
      .as[(Long, Long, Long, Long, String, Double)].collect()
      .map(r => r._2 -> ((r._4, r._5, r._6))).toMap
    assert(out.keySet == Set(1L, 2L, 3L, 4L, 6L, 7L, 8L))
    assert(out(1L) == ((4L, "first", 0.4)))
    assert(out(2L) == ((4L, "middle", 0.1)))
    assert(out(3L) == ((4L, "middle", 0.1)))
    assert(out(4L) == ((4L, "last", 0.4)))
    assert(out(6L) == ((1L, "only", 1.0)))
    assert(out(7L) == ((2L, "first", 0.5)))
    assert(out(8L) == ((2L, "last", 0.5)))
  }

  test("position-based: same-instant clicks break position ties by click_id") {
    val events = Seq(
      (100L, 1L, "purchase", 30000L * G),
      (9L, 1L, "click", 29000L * G),
      (2L, 1L, "click", 29000L * G),
      (5L, 1L, "click", 29000L * G)
    ).toDF("event_id", "user_id", "event_type", "ts")
    val out = Attribution.positionBased(events, 24)
      .as[(Long, Long, Long, Long, String, Double)].collect()
      .map(r => r._2 -> r._5).toMap
    assert(out == Map(2L -> "first", 5L -> "middle", 9L -> "last"))
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
