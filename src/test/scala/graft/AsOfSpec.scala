package graft

import graft.ops.AsOf

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AsOfSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._

  // key 1: states at t=10 (v=a), t=20 (v=b); key 2: state at t=100 only.
  private def state = Seq((1L, 10L, "a"), (1L, 20L, "b"), (2L, 100L, "c"))
    .toDF("k", "t", "v")

  test("asofJoin: most recent state at or before probe time, inclusive ties") {
    val probe = Seq(
      (1L, 5L),   // before any state → null
      (1L, 10L),  // exactly at first state → inclusive match "a"
      (1L, 15L),  // between → "a"
      (1L, 20L),  // exactly at second → "b"
      (1L, 99L),  // after all → "b"
      (2L, 99L),  // before key-2's state → null
      (2L, 100L), // inclusive → "c"
      (3L, 50L)   // key with no state at all → null
    ).toDF("k", "t")
    val got = AsOf.asofJoin(probe, state, "k", "t", Seq("v"))
      .as[(Long, Long, Option[String])].collect().toSet
    assert(got == Set(
      (1L, 5L, None), (1L, 10L, Some("a")), (1L, 15L, Some("a")),
      (1L, 20L, Some("b")), (1L, 99L, Some("b")),
      (2L, 99L, None), (2L, 100L, Some("c")), (3L, 50L, None)))
  }

  test("asofJoin preserves probe multiplicity and extra probe columns") {
    val probe = Seq((1L, 15L, "x"), (1L, 15L, "y"))
      .toDF("k", "t", "tag")
    val got = AsOf.asofJoin(probe, state, "k", "t", Seq("v"))
      .select("tag", "v").as[(String, String)].collect().sorted
    assert(got.toSeq == Seq(("x", "a"), ("y", "a")))
  }

  test("asofJoin matches a per-row subquery on the events/orders fixture") {
    // Independent witness for q76's shape: the O(P·S) nested-loop
    // definition computed directly, on a sampled slice.
    val dir = GraftSpark.sf
    val e = graft.io.Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"),
        expr("ts div 1000000000").as("t_s")).limit(200)
    val o = graft.io.Tables.orders(spark, dir)
      .select(col("o_custkey").as("user_id"),
        col("o_orderdate").cast("timestamp").cast("long").as("t_s"),
        col("o_orderkey"))
      .groupBy("user_id", "t_s").agg(max("o_orderkey").as("o_orderkey"))
    val fast = AsOf.asofJoin(e, o, "user_id", "t_s", Seq("o_orderkey"))
      .select("event_id", "o_orderkey")
    val slow = e.join(o.withColumnRenamed("t_s", "s_t"), Seq("user_id"), "left")
      .filter(col("s_t") <= col("t_s"))
      .groupBy("event_id").agg(max_by(col("o_orderkey"), col("s_t")).as("o_orderkey"))
      .unionByName( // events whose user has no earlier state row
        e.join(
          e.join(o.withColumnRenamed("t_s", "s_t"), Seq("user_id"), "left")
            .filter(col("s_t") <= col("t_s")).select("event_id").distinct(),
          Seq("event_id"), "left_anti")
          .select(col("event_id"), lit(null).cast("long").as("o_orderkey")))
    assert(fast.exceptAll(slow).isEmpty && slow.exceptAll(fast).isEmpty)
  }
}
