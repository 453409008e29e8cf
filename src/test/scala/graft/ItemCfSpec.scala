package graft

import graft.rec.ItemCf

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ItemCfSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._

  // (user, item, rating, ts, event_id)
  private def ratings(rows: (Int, Int, Double, Long, Long)*) =
    rows.toDF("user_id", "item_id", "rating", "ts", "event_id")

  test("latestRatings keeps the most recent (ts, event_id) row per (user, item)") {
    val r = ItemCf.latestRatings(ratings(
      (1, 10, 2.0, 100L, 1L), (1, 10, 5.0, 200L, 2L),
      (1, 10, 3.0, 200L, 1L), // same ts: event_id 2 wins
      (2, 10, 4.0, 50L, 9L)))
      .select("user_id", "item_id", "rating")
      .as[(Int, Int, Double)].collect().toSet
    assert(r == Set((1, 10, 5.0), (2, 10, 4.0)))
  }

  test("itemNeighbors computes the exact cosine on a hand-checked example") {
    // Vectors over users 1..3: item 10 = (4,2,0), item 20 = (2,1,0)
    // (parallel, cos = 1), item 30 = (0,2,1) — cos(10,30) computed below.
    val df = ratings(
      (1, 10, 4.0, 1L, 1L), (2, 10, 2.0, 1L, 2L),
      (1, 20, 2.0, 1L, 3L), (2, 20, 1.0, 1L, 4L),
      (2, 30, 2.0, 1L, 5L), (3, 30, 1.0, 1L, 6L))
    val out = ItemCf.itemNeighbors(df, k = 10, minSupport = 1,
      maxPerUser = 100)
      .select("item_id", "neighbor_id", "sim", "support")
      .as[(Int, Int, Double, Long)].collect()
      .map(r => ((r._1, r._2), (r._3, r._4))).toMap
    assert(out((10, 20)) == (1.0, 2L))
    assert(out((20, 10)) == (1.0, 2L))
    val expected3010 =
      BigDecimal(2.0 * 2.0 / (math.sqrt(20.0) * math.sqrt(5.0)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out((30, 10))._1 == expected3010)
    assert(out.keySet == Set((10, 20), (20, 10), (10, 30), (30, 10),
      (20, 30), (30, 20)))
  }

  test("minSupport prunes sparse pairs and ranks are dense per item") {
    val df = ratings(
      (1, 10, 1.0, 1L, 1L), (1, 20, 1.0, 1L, 2L), (1, 30, 1.0, 1L, 3L),
      (2, 10, 1.0, 1L, 4L), (2, 20, 1.0, 1L, 5L))
    val out = ItemCf.itemNeighbors(df, k = 10, minSupport = 2,
      maxPerUser = 100)
      .select("item_id", "neighbor_id", "rank")
      .as[(Int, Int, Int)].collect().toSet
    // only (10,20) has 2 co-raters; 30 drops out entirely
    assert(out == Set((10, 20, 1), (20, 10, 1)))
  }

  test("maxPerUser cap truncates the pair explode by recency") {
    // User 1 rates 3 items at increasing ts; cap 2 keeps items 20, 30 —
    // so the only surviving pair is (20, 30).
    val df = ratings(
      (1, 10, 1.0, 1L, 1L), (1, 20, 1.0, 2L, 2L), (1, 30, 1.0, 3L, 3L))
    val out = ItemCf.itemNeighbors(df, k = 10, minSupport = 1,
      maxPerUser = 2)
      .select("item_id", "neighbor_id")
      .as[(Int, Int)].collect().toSet
    assert(out == Set((20, 30), (30, 20)))
  }

  test("rmseReport: weighted-average prediction, coverage, hand-checked errors") {
    // Train cosines (from the itemNeighbors test geometry):
    // sim(10,20)=1.0, sim(10,30)=0.4, sim(20,30)=0.4
    val train = ratings(
      (1, 10, 4.0, 1L, 1L), (2, 10, 2.0, 1L, 2L),
      (1, 20, 2.0, 1L, 3L), (2, 20, 1.0, 1L, 4L),
      (2, 30, 2.0, 1L, 5L), (3, 30, 1.0, 1L, 6L))
    // u1→30: pred = (0.4·4 + 0.4·2)/0.8 = 3.0 (err 0)
    // u3→10: pred = (0.4·1)/0.4 = 1.0 (err 1)
    // u4→10: no train history → uncovered
    val valSet = ratings(
      (1, 30, 3.0, 9L, 7L), (3, 10, 2.0, 9L, 8L), (4, 10, 5.0, 9L, 9L))
    val row = ItemCf.rmseReport(train, valSet, k = 10, minSupport = 1,
      maxPerUser = 100)
      .select("n_val", "n_pred", "coverage", "rmse", "mae")
      .as[(Long, Long, Double, Double, Double)].head()
    assert(row._1 == 3L && row._2 == 2L)
    assert(row._3 == 0.666667)
    assert(row._4 == BigDecimal(math.sqrt(0.5))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(row._5 == 0.5)
  }
}
