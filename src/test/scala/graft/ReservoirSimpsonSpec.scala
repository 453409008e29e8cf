package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants of the r10 wave L: q371 weighted reservoir,
  * q372 Simpson audit, q373 bounce rate.
  */
class ReservoirSimpsonSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  val sf = GraftSpark.sf

  test("q371 selects exactly the top-100 ES keys of the full frame") {
    val rows = graft.queries.TextQueries.queries(
      "q371_weighted_reservoir")(spark, sf).collect()
    assert(rows.length == 100)
    // rebuild the FULL keyed frame with the same expression, no limit
    val u = (pmod(graft.functions.GraftFunctions.md5_63(
      concat(lit("wr:"), col("doc_id"))), lit(4503599627370496L))
      .cast("double") + 0.5) / lit(4503599627370496.0)
    val full = graft.io.Tables.documents(spark, sf)
      .select(col("doc_id"),
        graft.functions.GraftFunctions.qround(
          log(u) / col("n_chars").cast("double"), 9).as("es_key"))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
      .sortBy { case (id, k) => (-k, id) }.take(100)
    rows.zip(full).foreach { case (r, (id, k)) =>
      assert(r.getAs[Long]("doc_id") == id)
      assert(r.getAs[Double]("es_key") == k)
      assert(k < 0, "ES key must be negative (ln u < 0)")
      assert(r.getAs[Long]("weight") > 0)
    }
    // keys descend
    val ks = rows.map(_.getAs[Double]("es_key"))
    assert(ks.zip(ks.tail).forall { case (a, b) => a >= b })
  }

  test("q372 slopes recompute from exact integer sums") {
    val rows = graft.queries.AnalyticsQueries.queries(
      "q372_simpson_audit")(spark, sf).collect()
    assert(rows.length == 1)
    val r = rows.head
    val spend = graft.io.Tables.orders(spark, sf)
      .selectExpr("o_custkey",
        "cast(floor(o_totalprice * 100.0d + 0.5d) as long) as c")
      .collect().map(x => (x.getAs[Number](0).longValue(), x.getLong(1)))
      .groupBy(_._1).map { case (k, xs) => (k, xs.map(_._2).sum) }
    val pts = graft.io.Tables.customer(spark, sf)
      .selectExpr("c_custkey", "c_nationkey",
        "cast(floor(c_acctbal * 100.0d + 0.5d) as long) as x")
      .collect().map(x => (x.getAs[Number](1).longValue(),
        x.getLong(2), spend.getOrElse(x.getAs[Number](0).longValue(), 0L)))
    def slope(ps: Seq[(Long, Long)]): Double = {
      val n = BigInt(ps.length)
      val sx = ps.map(p => BigInt(p._1)).sum
      val sy = ps.map(p => BigInt(p._2)).sum
      val sxy = ps.map(p => BigInt(p._1) * p._2).sum
      val sxx = ps.map(p => BigInt(p._1) * p._1).sum
      (n * sxy - sx * sy).toDouble / (n * sxx - sx * sx).toDouble
    }
    val gs = slope(pts.map(p => (p._2, p._3)).toSeq)
    assert(math.abs(r.getAs[Double]("global_slope") -
      math.floor(gs * 1e9 + 0.5) / 1e9) < 1e-9)
    val perN = pts.groupBy(_._1).values.filter(_.length >= 2)
      .map(g => slope(g.map(p => (p._2, p._3)).toSeq)).toSeq
    assert(r.getAs[Long]("n_nations") == perN.length.toLong)
    val rev = perN.count(_ * gs < 0).toLong
    assert(r.getAs[Long]("n_sign_reversed") == rev)
    assert((r.getAs[Long]("paradox_present") == 1L) == (rev > 0))
  }

  test("q373 bounce rates reproduce a driver sessionization") {
    val rows = graft.queries.OlapQueries.queries(
      "q373_bounce_rate")(spark, sf).collect()
    val ev = graft.io.Tables.events(spark, sf)
      .select("user_id", "ts", "event_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val gap = 1800L * 1000000000L
    val sessions = ev.groupBy(_._1).values.flatMap { es =>
      val sorted = es.sortBy(e => (e._2, e._3))
      val sess = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      var start = sorted.head._2; var n = 0L; var prev = Long.MinValue
      sorted.foreach { case (_, t, _) =>
        if (prev == Long.MinValue || t - prev > gap) {
          if (n > 0) sess += ((start, n))
          start = t; n = 1L
        } else n += 1
        prev = t
      }
      sess += ((start, n))
      sess
    }.toSeq
    val byHour = sessions.groupBy(s => (s._1 / 3600000000000L) % 24)
    assert(rows.length == byHour.size)
    rows.foreach { r =>
      val h = r.getAs[Long]("start_hour")
      val ss = byHour(h)
      assert(r.getAs[Long]("n_sessions") == ss.length.toLong)
      val b = ss.count(_._2 == 1L).toLong
      assert(r.getAs[Long]("n_bounces") == b)
      assert(r.getAs[Long]("bounce_ppm") ==
        (2 * b * 1000000L + ss.length) / (2L * ss.length))
    }
  }
}
