package graft

import graft.metrics.Survival

import org.scalatest.funsuite.AnyFunSuite

class SurvivalSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._

  private val H = 3600000000000L // ns per hour

  test("product-limit estimator, hand-checked with censoring") {
    // lifetimes (h): A=2 death, B=4 death, C=2 censored (active at 8h),
    // D=9 censored, E=10 censored (defines obs end); censor window 2h
    val events = Seq(
      (1L, 0L), (1L, 2L * H),
      (2L, 0L), (2L, 4L * H),
      (3L, 6L * H), (3L, 8L * H),
      (4L, 0L), (4L, 9L * H),
      (5L, 0L), (5L, 10L * H)
    ).toDF("user_id", "ts")
    val out = Survival.kaplanMeier(events, "user_id", "ts",
      unitNs = H, censorUnits = 2)
      .as[(Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(out(2L) == ((2L, 5L, 1L, 1L, 0.8)))       // 1 - 1/5
    assert(out(4L) == ((4L, 3L, 1L, 0L, 0.533333)))  // 0.8 · (1 - 1/3)
    assert(out(9L) == ((9L, 2L, 0L, 1L, 0.533333)))  // censor: no drop
    assert(out(10L) == ((10L, 1L, 0L, 1L, 0.533333)))
  }

  test("everyone-dies step pins the survival tail to exactly zero") {
    // both users quiet long before obs end... except obs end comes FROM
    // a user, so add a long-lived censored observer
    val events = Seq(
      (1L, 0L), (1L, 1L * H),   // t=1, death
      (2L, 0L), (2L, 1L * H),   // t=1, death
      (3L, 99L * H), (3L, 100L * H) // t=1 but censored (defines end)
    ).toDF("user_id", "ts")
    val out = Survival.kaplanMeier(events, "user_id", "ts",
      unitNs = H, censorUnits = 2)
      .as[(Long, Long, Long, Long, Double)].collect()
    // single t=1 row: 3 at risk, 2 die, 1 censored → Ŝ = 1/3, not 0
    assert(out.toSeq == Seq((1L, 3L, 2L, 1L, 0.333333)))
    // now without the observer's protection: all at risk die → Ŝ = 0
    val out2 = Survival.kaplanMeier(events.filter($"user_id" =!= 3L),
      "user_id", "ts", unitNs = H, censorUnits = 0)
      .as[(Long, Long, Long, Long, Double)].collect()
    // censorUnits=0 still censors the obs-end user itself (l == end)
    assert(out2.forall(r => r._5 == 0.0 || r._4 > 0))
  }
}
