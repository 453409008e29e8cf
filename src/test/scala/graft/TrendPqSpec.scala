package graft

import graft.queries.Registry

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-8 wave 7 (q259 Mann–Kendall, q260 Spearman, q261 PQ audit,
  * q262 ListState recent feed).
  */
class TrendPqSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  val sf = GraftSpark.sf

  test("q259 S is bounded by the pair count and z recomputes") {
    val rows = Registry.all("q259_mann_kendall")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_days")
      val s = r.getAs[Long]("s_stat")
      val v18 = r.getAs[Long]("var18")
      assert(math.abs(s) <= n * (n - 1) / 2, r.toString)
      assert(v18 >= 0 && v18 <= n * (n - 1) * (2 * n + 5), r.toString)
      val expect =
        if (s > 0) math.floor((s - 1).toDouble /
          math.sqrt(v18.toDouble / 18.0) * 1e6 + 0.5) / 1e6
        else if (s < 0) math.floor((s + 1).toDouble /
          math.sqrt(v18.toDouble / 18.0) * 1e6 + 0.5) / 1e6
        else 0.0
      assert(r.getAs[Double]("z") == expect, r.toString)
    }
  }

  test("q260 Spearman is rank-invariant: monotone transforms of the " +
      "series leave rho where Pearson moves") {
    val r = Registry.all("q260_spearman")(spark, sf).collect().head
    val rho = r.getAs[Double]("spearman_rho")
    assert(rho >= -1.0 && rho <= 1.0)
    // driver recompute with average ranks
    val e = graft.io.Tables.events(spark, sf)
      .select(col("ts"), col("event_type"), col("value")).collect()
      .map(r2 => (r2.getLong(0) / 86400000000000L, r2.getString(1),
        r2.getDouble(2)))
    val byDay = e.groupBy(_._1).map { case (d, rs) =>
      // the engine's qdec quantizer is floor(v·100 + 0.5) — replicate
      // it exactly (BigDecimal.setScale would re-round the binary value)
      val cents = rs.filter(_._2 == "purchase")
        .map(x => BigInt(math.floor(x._3 * 100.0 + 0.5).toLong)).sum
      (cents, rs.count(_._2 == "click").toLong)
    }.toArray
    def r2s(vs: Array[BigInt]): Map[BigInt, Long] = {
      val sorted = vs.sorted
      vs.distinct.map { v =>
        val below = sorted.count(_ < v).toLong
        val t = sorted.count(_ == v).toLong
        v -> (2 * below + t + 1)
      }.toMap
    }
    val xs = byDay.map(_._1)
    val ys = byDay.map(x => BigInt(x._2))
    val (rx, ry) = (r2s(xs), r2s(ys))
    val pairs = byDay.map { case (x, y) => (rx(x), ry(BigInt(y))) }
    val n = BigInt(pairs.length)
    val sx = pairs.map(p => BigInt(p._1)).sum
    val sy = pairs.map(p => BigInt(p._2)).sum
    val sxy = pairs.map(p => BigInt(p._1) * p._2).sum
    val sxx = pairs.map(p => BigInt(p._1) * p._1).sum
    val syy = pairs.map(p => BigInt(p._2) * p._2).sum
    val expect = math.floor((n * sxy - sx * sy).toDouble /
      (math.sqrt((n * sxx - sx * sx).toDouble) *
       math.sqrt((n * syy - sy * sy).toDouble)) * 1e6 + 0.5) / 1e6
    assert(rho == expect, s"$rho != $expect")
  }

  test("q261 PQ codes use the codebook and errors are sane") {
    val rows = Registry.all("q261_pq_audit")(spark, sf).collect()
    assert(rows.length == 8)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_codes_used") >= 1 &&
        r.getAs[Long]("n_codes_used") <= 16)
      assert(r.getAs[Double]("avg_err") >= 0.0)
      assert(r.getAs[Double]("max_err") >= r.getAs[Double]("avg_err") - 1e-9)
    }
    // all subspaces quantize the same vector count
    assert(rows.map(_.getAs[Long]("n_vectors")).distinct.length == 1)
  }

  test("q262 recent feed equals the batch top-5 per user") {
    val rows = Registry.all("q262_stream_recent_feed")(spark, sf).collect()
    assert(rows.nonEmpty)
    val e = graft.io.Tables.events(spark, sf)
      .select("user_id", "ts", "event_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val batch = e.groupBy(_._1).map { case (u, rs) =>
      u -> (rs.length.toLong,
        rs.sortBy(x => (-x._2, -x._3)).take(5).map(_._3).mkString(","))
    }
    rows.foreach { r =>
      val (n, csv) = batch(r.getLong(0))
      assert(r.getAs[Long]("n_seen") == n, r.toString)
      assert(r.getAs[String]("recent_csv") == csv, r.toString)
    }
  }
}
