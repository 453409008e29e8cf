package graft

import graft.io.Tables
import graft.ops.Scd
import graft.queries.Registry

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-8 wave 5 (q253 Shapley attribution, q254 incremental SCD2):
  * the game-theoretic axioms and the incremental-equals-rebuild
  * identity, asserted engine-side (the DuckDB gate asserts them
  * cross-engine).
  */
class ShapleyScdSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  val sf = GraftSpark.sf

  test("q253 satisfies the Shapley axioms on a driver-side recompute") {
    val rows = Registry.all("q253_shapley_attribution")(spark, sf)
      .collect()
    assert(rows.length == 4)
    rows.foreach(r => assert(r.getAs[Long]("phi24") >= 0, r.toString))
    // shares are a partition of 10^6 up to the 4 half-up roundings
    val shareSum = rows.map(_.getAs[Long]("share_ppm")).sum
    assert(math.abs(shareSum - 1000000L) <= 4, s"shares sum $shareSum")

    // exact recompute from the raw events
    val chans = Seq("click", "view", "signup", "error")
    val ev = Tables.events(spark, sf)
      .select("user_id", "event_type", "ts").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val firstP = ev.filter(_._2 == "purchase").groupBy(_._1)
      .map { case (u, rs) => u -> rs.map(_._3).min }
    val masks = ev.filter(e => firstP.contains(e._1) &&
        e._3 < firstP(e._1) && chans.contains(e._2))
      .groupBy(_._1)
      .map { case (_, rs) =>
        rs.map(e => 1 << chans.indexOf(e._2)).reduce(_ | _) }
      .groupBy(identity).map { case (m, v) => m -> v.size.toLong }
    def vOf(s: Int): Long =
      masks.filter { case (m, _) => (m & s) == m }.values.sum
    def w(k: Int): Long = Seq(6L, 2L, 2L, 6L)(k)
    val phi = chans.zipWithIndex.map { case (c, i) =>
      val bit = 1 << i
      c -> (0 until 16).filter(s => (s & bit) == 0)
        .map(s => w(Integer.bitCount(s)) * (vOf(s | bit) - vOf(s))).sum
    }.toMap
    rows.foreach { r =>
      assert(r.getAs[Long]("phi24") == phi(r.getString(0)), r.toString)
    }
    // efficiency: Σφ·24 = 24·v(N) (v(∅) = 0 — direct conversions excluded)
    assert(rows.map(_.getAs[Long]("phi24")).sum == 24L * vOf(15))
  }

  test("q254 incremental apply is row-identical to the full rebuild, " +
      "and intervals tile") {
    val cutNs = 1705363200000000000L
    val e = Tables.events(spark, sf)
      .select("user_id", "event_type", "ts", "event_id")
    val full = Scd.type2(e, "user_id", "event_type", "ts", "event_id")
    val inc = Scd.applyIncrement(
      Scd.type2(e.filter(col("ts") < cutNs),
        "user_id", "event_type", "ts", "event_id"),
      e.filter(col("ts") >= cutNs),
      "user_id", "event_type", "ts", "event_id")
    assert(inc.exceptAll(full).count() == 0 &&
      full.exceptAll(inc).count() == 0,
      "incremental result diverges from full rebuild")
    // tiling: within an entity, valid_to == next interval's valid_from
    val gaps = inc
      .withColumn("nxt", lead(col("valid_from"), 1).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy("valid_from")))
      .filter(col("nxt").isNotNull && col("valid_to") =!= col("nxt"))
      .count()
    assert(gaps == 0L, s"$gaps non-tiling intervals")
  }

  test("applyIncrement validate flag passes a clean batch and rejects a " +
      "late-arriving one") {
    val cutNs = 1705363200000000000L
    val e = Tables.events(spark, sf)
      .select("user_id", "event_type", "ts", "event_id")
    val hist = Scd.type2(e.filter(col("ts") < cutNs),
      "user_id", "event_type", "ts", "event_id")
    // clean increment: strictly-later facts pass the guard
    Scd.applyIncrement(hist, e.filter(col("ts") >= cutNs),
      "user_id", "event_type", "ts", "event_id", validate = true).count()
    // a batch containing pre-cut facts violates the rebuild-identity
    // precondition and must fail loudly instead of silently diverging
    val ex = intercept[IllegalArgumentException] {
      Scd.applyIncrement(hist, e,
        "user_id", "event_type", "ts", "event_id", validate = true)
        .count()
    }
    assert(ex.getMessage.contains("full rebuild"))
  }
}
