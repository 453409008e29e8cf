package graft

import graft.metrics.RankingRelational
import graft.queries.{RecQueries, TwinsQueries}
import graft.segment.Twins

import org.apache.spark.mllib.evaluation.RankingMetrics
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RecSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._
  val sf = GraftSpark.sf

  test("bias baseline: hand-computed biases; cold-start falls back to partial sums") {
    // mu = 3 exact; λ_i = λ_u = 2.
    // b(i1) = ((4-3)+(6-3))/(2+2) = 1;  b(i2) = ((2-3)+(0-3))/4 = -1
    // b(u1) = ((4-3-1)+(2-3+1))/4 = 0;  b(u2) = ((6-3-1)+(0-3+1))/4 = 0
    val train = Seq((1, 1, 4.0), (1, 2, 2.0), (2, 1, 6.0), (2, 2, 0.0))
      .toDF("user_id", "item_id", "rating")
    val (items, users, mu) = graft.rec.BiasBaseline.fit(train, 2.0, 2.0)
    assert(mu == 3.0)
    assert(items.as[(Int, Double)].collect().toMap ==
      Map(1 -> 1.0, 2 -> -1.0))
    assert(users.as[(Int, Double)].collect().toMap ==
      Map(1 -> 0.0, 2 -> 0.0))
    // Holdout: known (u1,i1) predicts 3+1+0=4 vs 5 → e=1; unknown
    // (u3,i3) falls back to mu=3 vs 3 → e=0.
    val hold = Seq((1, 1, 5.0), (3, 3, 3.0))
      .toDF("user_id", "item_id", "rating")
    val rep = graft.rec.BiasBaseline
      .rmseReport(train, hold, 2.0, 2.0, lo = 0.0, hi = 10.0)
      .as[(Long, Long, Long, Double, Double, Double)].collect().head
    assert(rep._1 == 2L && rep._2 == 1L && rep._3 == 1L)
    assert(rep._4 == 3.0)
    assert(rep._5 == 0.707107) // qround(sqrt(1/2), 6)
    assert(rep._6 == 0.5)
  }

  test("bias baseline: clamp bounds predictions at the rating range") {
    // One extreme item pushes mu+b_i beyond hi=5 without the clamp.
    val train = Seq((1, 1, 5.0), (2, 1, 5.0), (3, 1, 5.0), (1, 2, 0.0))
      .toDF("user_id", "item_id", "rating")
    val hold = Seq((9, 1, 5.0)).toDF("user_id", "item_id", "rating")
    val lowHi = graft.rec.BiasBaseline
      .rmseReport(train, hold, 0.1, 0.1, lo = 0.0, hi = 4.0)
      .select("rmse").as[Double].collect().head
    // pred clamps to 4.0 → rmse = 1.0 exactly.
    assert(lowHi == 1.0)
  }

  test("ranking metrics: hand-computed AP/P/NDCG (pred [1,2,3], truth [2])") {
    val recs = Seq((1, 1, 1), (1, 2, 2), (1, 3, 3)).toDF("user_id", "item_id", "rank")
    val truth = Seq((1, 2)).toDF("user_id", "item_id")
    val m = RankingRelational.metrics(spark, recs, truth, k = 3).head()
    assert(m.getAs[Double]("p_at_k") == math.rint(1.0 / 3 * 1e6) / 1e6)
    // AP@3 = (1/2) / min(1,3) = 0.5
    assert(m.getAs[Double]("map_at_k") == 0.5)
    // NDCG: dcg = 1/log2(3) ; idcg(m=1) = 1/log2(2) = 1
    val expNdcg = math.rint(1.0 / (math.log(3) / math.log(2)) * 1e6) / 1e6
    assert(m.getAs[Double]("ndcg_at_k") == expNdcg)
  }

  test("ranking metrics agree with mllib RankingMetrics on popularity recs") {
    val t = graft.rec.Popularity.withSplits(graft.io.Tables.ratings(spark, sf))
    val recs = graft.rec.Popularity.recommend(
      graft.rec.Popularity.train(t), graft.rec.Popularity.validation(t),
      bias = 100.0, poolK = 50, k = 20)
    val truth = graft.rec.Popularity.validation(t)
      .select("user_id", "item_id").distinct()

    val ours = RankingRelational.metrics(spark, recs, truth, k = 20).head()

    val predByUser = recs.orderBy("user_id", "rank")
      .groupBy("user_id").agg(collect_list(struct(col("rank"), col("item_id"))).as("l"))
      .select(col("user_id"), expr("transform(array_sort(l), x -> x.item_id)").as("pred"))
    val labByUser = truth.groupBy("user_id").agg(collect_set("item_id").as("lab"))
    val joined = predByUser.join(labByUser, "user_id")
      .select("pred", "lab").as[(Array[Int], Array[Int])]
      .rdd.map { case (p, l) => (p.map(_.asInstanceOf[Any]), l.map(_.asInstanceOf[Any])) }
    val mllib = new RankingMetrics(joined)

    assert(math.abs(ours.getAs[Double]("p_at_k") - mllib.precisionAt(20)) < 1e-5)
    assert(math.abs(ours.getAs[Double]("ndcg_at_k") - mllib.ndcgAt(20)) < 1e-5)
    assert(math.abs(ours.getAs[Double]("map_at_k") - mllib.meanAveragePrecisionAt(20)) < 1e-5)
  }

  test("pairCorrelation: perfectly linear ratings → corr 1.0; <2 co-rated dropped") {
    val ratings = Seq(
      (1, 10, 1.0), (1, 11, 2.0), (1, 12, 3.0),
      (2, 10, 2.0), (2, 11, 4.0), (2, 12, 6.0),
      (3, 99, 1.0)) // user 3 co-rates nothing
      .map { case (u, i, v) => (u, i, v, 0L, 0L) }
      .toDF("user_id", "item_id", "rating", "ts", "event_id")
    val pairs = Seq((1, 2), (1, 3)).toDF("id_a", "id_b")
    val got = Twins.pairCorrelation(pairs, ratings).collect()
    assert(got.length == 1)
    assert(got.head.getAs[Long]("n_corated") == 3L)
    assert(got.head.getAs[Double]("corr6") == 1.0)
  }

  test("statistical validation invariant: twins correlate more than baseline") {
    // sf0.001 has only 15 users (105 pairs), so "top-100" has no
    // selectivity there; the invariant is meaningful from sf0.01 up
    // (150 users → top-100 of 11k pairs).
    val rows = TwinsQueries.q44(spark, "/root/testdata/sf0.01").collect()
      .map(r => r.getAs[String]("cohort") -> r.getAs[Double]("avg_corr")).toMap
    assert(rows("twins") > rows("baseline"))
  }

  test("ALS recs are deterministic under fixed seed") {
    // Two INDEPENDENT fits (empty cacheKey bypasses the session memo —
    // comparing the memoized q52 frame to itself would prove nothing).
    val t = graft.rec.Popularity.withSplits(graft.io.Tables.ratings(spark, sf))
    val users = graft.rec.Popularity.validation(t).select("user_id").distinct()
    def run() = graft.rec.AlsRec
      .recommendFor(graft.rec.AlsRec.fit(graft.rec.Popularity.train(t)), users, 10)
      .orderBy("user_id", "rank").collect().toSeq
    val a = run()
    assert(a == run())
    assert(a.nonEmpty)
  }

  test("q54 bias sweep: 4 rows; bias=100 row equals q51's single metrics row") {
    val sweep = RecQueries.q54(spark, sf).collect()
    assert(sweep.map(_.getAs[Double]("bias")).toSeq == Seq(1.0, 10.0, 100.0, 1000.0))
    val b100 = sweep.find(_.getAs[Double]("bias") == 100.0).get
    val single = RecQueries.q51(spark, sf).head()
    for (c <- Seq("n_users", "p_at_k", "map_at_k", "ndcg_at_k"))
      assert(b100.getAs[Any](c) == single.getAs[Any](c),
        s"sweep bias=100 column $c diverges from q51")
  }

  test("q55 ALS grid: the reference's full 4x4 shape, deterministic cells") {
    // Table 3 shape (als_latent_factors.py:31-44): ranks {5,10,20,50} ×
    // regs {0.01,0.05,0.1,1} — 16 combos, every cell a valid MAP.
    val grid = RecQueries.q55(spark, sf).collect()
    assert(grid.map(r => (r.getAs[Int]("rank"), r.getAs[Double]("reg_param"))).toSeq ==
      (for (r <- Seq(5, 10, 20, 50); g <- Seq(0.01, 0.05, 0.1, 1.0)) yield (r, g)))
    assert(grid.forall { r =>
      val m = r.getAs[Double]("map_at_k"); m >= 0.0 && m <= 1.0
    })
    // Seeded determinism, memo-independent: an INDEPENDENT fit of the
    // reference's Table 3 winning combo (rank 50, reg 0.05) — empty
    // cacheKey bypasses every session memo — must reproduce that grid
    // cell bit-for-bit.
    val t = graft.rec.Popularity.withSplits(graft.io.Tables.ratings(spark, sf))
    val valid = graft.rec.Popularity.validation(t)
    val fresh = graft.rec.AlsRec.gridSearch(
      graft.rec.Popularity.train(t), valid,
      ranks = Seq(50), regs = Seq(0.05), topN = 20, maxIter = 10,
      evalFn = (recs, v) => RankingRelational
        .metrics(spark, recs.select("user_id", "item_id", "rank"), v, k = 20)
        .select("map_at_k").head().getDouble(0)).head._3
    val cell = grid.find(r => r.getAs[Int]("rank") == 50 &&
      r.getAs[Double]("reg_param") == 0.05).get.getAs[Double]("map_at_k")
    assert(cell == fresh, s"grid (50,0.05) MAP $cell != fresh fit $fresh")
    // NOT asserted: that (50, 0.05) is the arg-max. On MovieLens it is
    // (the reference's Table 3 winner); on the synthetic events data the
    // MAP spread across combos is narrow (~0.05–0.08) and the arg-max is
    // data-dependent — measured (10, 0.1) at sf0.001 (pinned in
    // AlsGoldenPinSpec) and (50, 0.01) at sf0.01. Same class of
    // divergence as the popularity-vs-ALS headline
    // below: a property of MovieLens sparsity, not of the pipeline.
  }

  test("recommendSweep == per-bias recommend loop (all biases)") {
    // The single bias-keyed pipeline must be row-identical to running the
    // plain recommender once per bias — the sweep is an execution
    // strategy, not a semantics change.
    val t = graft.rec.Popularity.withSplits(graft.io.Tables.ratings(spark, sf))
    val train = graft.rec.Popularity.train(t)
    val valid = graft.rec.Popularity.validation(t)
    val biases = Seq(1.0, 100.0)
    val sweep = graft.rec.Popularity
      .recommendSweep(train, valid, biases, poolK = 50, k = 20)
      .orderBy("bias", "user_id", "rank")
      .collect().toSeq
    val looped = biases.flatMap { b =>
      graft.rec.Popularity.recommend(train, valid, b, poolK = 50, k = 20)
        .withColumn("bias", org.apache.spark.sql.functions.lit(b))
        .select("bias", "user_id", "item_id", "rank")
        .orderBy("user_id", "rank").collect().toSeq
    }
    assert(sweep == looped)
  }

  test("headline invariant: popularity P@20 >= default-ALS P@20 (sf0.01)") {
    // The reference's central published finding (report p.6): the biased
    // popularity baseline beats ALS on P@20 at this sparsity. Asserted in
    // the form BASELINE.md reproduces (q51 vs q53's default rank-8 config,
    // P@20 0.127 >= 0.122). NOT asserted on grid-best MAP: on the
    // synthetic events data the q55 grid finds ALS combos whose MAP edges
    // out popularity (~0.061 vs ~0.054) — the headline is a property of
    // MovieLens sparsity, not a law of the pipeline.
    val dir = "/root/testdata/sf0.01"
    val pop = RecQueries.q51(spark, dir).head().getAs[Double]("p_at_k")
    val als = RecQueries.q53(spark, dir).head().getAs[Double]("p_at_k")
    assert(pop >= als,
      s"popularity P@20 $pop < ALS P@20 $als — headline inverted")
  }

  test("q56 final test eval: one deterministic row, sane metric ranges") {
    val a = RecQueries.q56(spark, sf).collect().toSeq
    assert(a.size == 1)
    assert(a == RecQueries.q56(spark, sf).collect().toSeq)
    val r = a.head
    for (c <- Seq("p_at_k", "map_at_k", "ndcg_at_k")) {
      val v = r.getAs[Double](c)
      assert(v >= 0.0 && v <= 1.0, s"$c = $v out of range")
    }
    assert(r.getAs[Double]("rmse") > 0.0)
  }

  test("popularity recs never contain train-seen items") {
    val t = graft.rec.Popularity.withSplits(graft.io.Tables.ratings(spark, sf))
    val recs = graft.rec.Popularity.recommend(
      graft.rec.Popularity.train(t), graft.rec.Popularity.validation(t),
      100.0, 50, 20)
    val seen = graft.rec.Popularity.train(t).select("user_id", "item_id").distinct()
    assert(recs.join(seen, Seq("user_id", "item_id"), "left_semi").count() == 0)
  }

  test("negative samples: k per user, never seen, hash-rank deterministic") {
    val ratings = graft.io.Tables.ratings(spark, sf)
    val negs = graft.rec.Negatives.sample(ratings, k = 5)
    val seen = ratings.select("user_id", "item_id")
      .filter(org.apache.spark.sql.functions.col("item_id").isNotNull)
      .distinct()
    assert(negs.join(seen, Seq("user_id", "item_id"), "left_semi").count() == 0)
    val perUser = negs.groupBy("user_id").count().select("count")
      .distinct().as[Long].collect().toSet
    assert(perUser == Set(5L), s"per-user counts: $perUser")
    // keyed PRNG: a re-run is bit-identical
    val again = graft.rec.Negatives.sample(ratings, k = 5)
    assert(negs.exceptAll(again).count() == 0 &&
      again.exceptAll(negs).count() == 0)
  }
}
