package graft

import graft.metrics.RankingRelational
import graft.rec.Popularity
import graft.segment.Twins
import graft.text.TextAnalysis

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** End-to-end run on MovieLens-SHAPED synthetic data (FIXTURES.md §1):
  * sparse item universe (2000 items, ~30-item user sets — the shape the
  * real reference dataset has, unlike the dense 100-item events mapping),
  * power-law user activity, planted "movie twins" with overlapping sets
  * and correlated ratings. Verifies the reference's headline behaviors on
  * the data shape it was built for, through the engine's sparse-strategy
  * paths.
  */
class EndToEndSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._

  private val nItems = 2000
  private val twinBase = Seq(10, 20, 30, 40, 50) // twins are (u, u+1)

  private lazy val ratings: DataFrame = {
    val rnd = new Random(99)
    val rows = scala.collection.mutable.ArrayBuffer.empty[(Long, Int, Double, Long, Long)]
    var eid = 0L
    def add(u: Long, i: Int, r: Double): Unit = {
      rows += ((u, i, r, 1000000L + eid * 1000L + rnd.nextInt(999), eid)); eid += 1
    }
    // 300 users, power-law-ish activity 8..120 items. Twin users get ONLY
    // their planted sets below — extra random activity would dilute their
    // Jaccard under the LSH threshold ((1/bands)^(1/rows) ≈ 0.6), which is
    // correct LSH behavior but not what this fixture is probing.
    val twinUsers = twinBase.flatMap(b => Seq(b.toLong, b + 1L)).toSet
    for (u <- 1L to 300L if !twinUsers.contains(u)) {
      val n = 8 + (110 * math.pow(rnd.nextDouble(), 3)).toInt
      val items = rnd.shuffle((0 until nItems).toList).take(n)
      items.foreach(i => add(u, i, 0.5 + (rnd.nextInt(9) + 1) * 0.5))
    }
    // planted twins: u' = u+1 copies ~95% of u's set with IDENTICAL
    // ratings — the (item, rating-bucket) token space only matches
    // same-bucket ratings (a +0.5 offset straddles width-1.0 bucket
    // boundaries for half the values and would halve twin token overlap;
    // "twin" under bucketed tokens means same items AND same bucket).
    for (b <- twinBase) {
      val u = b.toLong; val t = u + 1
      val base = rnd.shuffle((0 until nItems).toList).take(60)
      base.foreach { i =>
        val r = 0.5 + (rnd.nextInt(9) + 1) * 0.5
        add(u, i, r)
        if (rnd.nextDouble() < 0.95) add(t, i, r)
      }
    }
    rows.toSeq.toDF("user_id", "item_id", "rating", "ts", "event_id")
  }

  test("sparse exact Jaccard surfaces exactly the planted twins on top") {
    val sets = Twins.userItemRatings(ratings).select("user_id", "item_id")
    val top = TextAnalysis.setJaccardPairs(sets, "user_id", "item_id", 0.0)
      .orderBy(col("jaccard").desc, col("id_a"), col("id_b"))
      .limit(5).select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(top == twinBase.map(b => (b.toLong, b + 1L)).toSet)
  }

  test("LSH pipeline finds all planted twins (32 perms, reference params)") {
    // bucketWidth = 1.0: ratings here span 0.5–5.0, so the default width
    // of 100.0 (tuned to the events value scale) would put every rating
    // in bucket 0 and silently degrade tokens to raw item ids — this
    // fixture must exercise the real multi-bucket token space. Planted
    // twins copy ratings exactly, so their tokens collide by construction.
    val found = Twins.topTwinsLsh(ratings, numPerm = 32, rowsPerBand = 4,
      k = 10, bucketWidth = 1.0)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    twinBase.foreach { b =>
      assert(found.contains((b.toLong, b + 1L)), s"twin ($b,${b + 1}) missed")
    }
    // Sanity: the fixture really does span multiple buckets at width 1.0.
    val nBuckets = Twins.ratingBucketTokens(ratings, bucketWidth = 1.0)
      .select(split(col("token"), ":").getItem(1)).distinct().count()
    assert(nBuckets >= 4, s"fixture only produced $nBuckets rating buckets")
  }

  test("quantile-token LSH pipeline also finds all planted twins") {
    // The equal-frequency space needs no width tuning at all — the
    // planted twins copy ratings exactly, so per-item quantile buckets
    // collide for them by construction, on ANY rating scale.
    val found = Twins.topTwinsLshQuantile(ratings, numPerm = 32,
      rowsPerBand = 4, k = 10, nBuckets = 4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    twinBase.foreach { b =>
      assert(found.contains((b.toLong, b + 1L)), s"twin ($b,${b + 1}) missed")
    }
    // And the exact-quantile ranking agrees on who the twins are.
    val exact = Twins.topTwinsExactQuantile(ratings, k = 5, nBuckets = 4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(exact == twinBase.map(b => (b.toLong, b + 1L)).toSet)
  }

  test("twin correlation statistically beats stride baseline (part2 invariant)") {
    val twins = Twins.topTwinsExact(ratings, 5)
    val twinCorr = Twins.pairCorrelation(twins, ratings)
      .agg(avg("corr6")).as[Double].head()
    val users = ratings.select("user_id").distinct()
    val base = users.select(col("user_id").as("id_a"))
      .join(users.select(col("user_id").as("id_b")), col("id_b") === col("id_a") + 13)
    val baseCorr = Twins.pairCorrelation(base, ratings)
      .agg(avg("corr6")).as[Double].head()
    assert(twinCorr > baseCorr + 0.2,
      s"twin corr $twinCorr not >> baseline $baseCorr")
  }

  test("recommendation pipeline end-to-end: splits, pool, recs, metrics, bias sweep") {
    val t = Popularity.withSplits(ratings)
    val train = Popularity.train(t)
    val valid = Popularity.validation(t)
    assert(train.count() > valid.count()) // ~60 vs ~20

    val sweep = Popularity.biasSweep(train, valid,
      biases = Seq(1.0, 100.0), poolK = 200, k = 50,
      evalFn = recs => RankingRelational.metrics(spark, recs, valid, 50)
        .head().getAs[Double]("map_at_k"))
    assert(sweep.size == 2)
    assert(sweep.forall { case (_, m) => m >= 0.0 && m <= 1.0 })

    // recs never contain train-seen items
    val recs = Popularity.recommend(train, valid, 100.0, 200, 50)
    val seen = train.select("user_id", "item_id").distinct()
    assert(recs.join(seen, Seq("user_id", "item_id"), "left_semi").count() == 0)
  }
}
