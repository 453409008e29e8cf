package graft

import graft.ops.RangeJoin

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RangeJoinSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._

  test("bucketed range join: band boundaries inclusive/exclusive, cross-bucket matches") {
    val l = Seq((1L, 100L, "p1"), (1L, 1795L, "p2"), (2L, 100L, "p3"))
      .toDF("k", "lt", "ltag")
    val r = Seq(
      (1L, 100L, "same-instant"),  // == lt → excluded (lower = 1)
      (1L, 101L, "first-in"),      // lt + 1 → included
      (1L, 1900L, "last-in"),      // lt + 1800 → included (upper 1801 excl)
      (1L, 1901L, "first-out"),    // lt + 1801 → excluded
      (1L, 1800L, "p2-cross"),     // for p2: 1795+5 — straddles a bucket edge
      (3L, 101L, "wrong-key")
    ).toDF("k", "rt", "rtag")
    val got = RangeJoin.bucketed(l, r, "k", "lt", "rt", lower = 1L, upper = 1801L)
      .select("ltag", "rtag").as[(String, String)].collect().toSet
    assert(got == Set(
      ("p1", "first-in"), ("p1", "last-in"), ("p1", "p2-cross"),
      ("p2", "p2-cross"), ("p2", "last-in"), ("p2", "first-out")))
  }

  test("bucketed range join matches the theta-join definition on the events fixture") {
    val ev = graft.io.Tables.events(spark, GraftSpark.sf)
      .select(col("event_id"), col("user_id"),
        expr("ts div 1000000000").as("t_s"), col("event_type"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("pid"), col("user_id"), col("t_s"))
    val f = ev.select(col("user_id"), col("t_s").as("f_s"),
      col("event_id").as("fid"))
    val fast = RangeJoin.bucketed(p, f, "user_id", "t_s", "f_s", 1L, 1801L)
      .select("pid", "fid")
    val slow = p.join(f, "user_id")
      .filter(col("f_s") >= col("t_s") + 1 && col("f_s") < col("t_s") + 1801)
      .select("pid", "fid")
    assert(fast.exceptAll(slow).isEmpty && slow.exceptAll(fast).isEmpty)
    // No duplicate matches from the 2-bucket left explosion.
    assert(fast.count() == fast.distinct().count())
  }

  test("point-in-interval join == BETWEEN theta join, incl. overlap fan-out") {
    val iv = Seq((10L, 5L, 20L), (11L, 15L, 30L), (12L, 40L, 40L))
      .toDF("ivl_id", "d0", "d1")
    val pts = Seq(1L -> 4L, 2L -> 5L, 3L -> 17L, 4L -> 20L, 5L -> 30L,
      6L -> 40L, 7L -> 41L).toDF("pid", "day")
    val got = graft.ops.Intervals
      .pointInIntervalJoin(pts, "day", iv, "d0", "d1", bucketDays = 7)
      .select("pid", "ivl_id").as[(Long, Long)].collect().toSeq
    // A point under two overlapping intervals matches BOTH; bounds are
    // inclusive on each side; each true pair appears exactly once.
    assert(got.sorted == Seq(2L -> 10L, 3L -> 10L, 3L -> 11L, 4L -> 10L,
      4L -> 11L, 5L -> 11L, 6L -> 12L).sorted)
  }

  test("point-in-interval join matches the theta join on the orders fixture") {
    val o = graft.io.Tables.orders(spark, GraftSpark.sf)
      .select(col("o_orderkey"),
        expr("cast(cast(o_orderdate as timestamp) as long) div 86400")
          .as("day"))
    val iv = o.groupBy(expr("day div 7").as("wk")).count()
      .orderBy(desc("count"), col("wk")).limit(10)
      .select(col("wk").as("ivl_id"),
        (col("wk") * 7 - 3).as("d0"), (col("wk") * 7 + 10).as("d1"))
    val fast = graft.ops.Intervals
      .pointInIntervalJoin(o, "day", iv, "d0", "d1", bucketDays = 8)
      .select("o_orderkey", "ivl_id")
    val slow = o.crossJoin(iv)
      .filter(col("day") >= col("d0") && col("day") <= col("d1"))
      .select("o_orderkey", "ivl_id")
    assert(fast.exceptAll(slow).isEmpty && slow.exceptAll(fast).isEmpty)
    assert(fast.count() == fast.distinct().count())
  }
}
