package graft

import graft.io.Tables

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Property specs for the seeded-random sampling primitives (true M5 —
  * reference `correlation_optimised.py:56-68`): uniformity of the keyed
  * PRNG, seed stability/sensitivity, partition-layout independence, and
  * the random-pair protocol's structural invariants.
  */
class SampleSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._

  private lazy val keys = spark.range(0, 10000).toDF("k")

  test("seededUniform draws are uniform on [0,1) (decile counts)") {
    val deciles = keys
      .select(floor(Tables.seededUniform(col("k"), seed = 7L) * 10).as("d"))
      .groupBy("d").count().as[(Long, Long)].collect().toMap
    assert(deciles.keySet == (0L to 9L).toSet)
    // 1000 expected per decile; 3-sigma ≈ 90. Loose bound: ±150.
    deciles.foreach { case (d, n) =>
      assert(math.abs(n - 1000L) <= 150, s"decile $d count $n not ~1000")
    }
  }

  test("randomSample: expected fraction, seed-stable, layout-independent") {
    val a = Tables.randomSample(keys, "k", 0.3, seed = 42L).as[Long].collect().toSet
    // E|a| = 3000, sd ≈ 46; loose ±200.
    assert(math.abs(a.size - 3000) <= 200, s"|sample| ${a.size} not ~3000")
    val b = Tables.randomSample(keys, "k", 0.3, seed = 42L).as[Long].collect().toSet
    assert(a == b)
    val c = Tables.randomSample(keys.repartition(13), "k", 0.3, seed = 42L)
      .as[Long].collect().toSet
    assert(a == c, "sample changed with partition layout")
    val d = Tables.randomSample(keys, "k", 0.3, seed = 43L).as[Long].collect().toSet
    assert(a != d, "different seed produced identical sample")
  }

  test("randomPairs: n disjoint ordered pairs, seed-stable, layout-independent") {
    val p = Tables.randomPairs(keys, "k", n = 100, seed = 77L)
      .as[(Long, Long)].collect().toSeq
    assert(p.size == 100)
    assert(p.forall { case (a, b) => a < b })
    val members = p.flatMap { case (a, b) => Seq(a, b) }
    assert(members.distinct.size == 200, "pairs share a member")
    val q = Tables.randomPairs(keys.repartition(9), "k", n = 100, seed = 77L)
      .as[(Long, Long)].collect().toSeq
    assert(p == q)
    val r = Tables.randomPairs(keys, "k", n = 100, seed = 78L)
      .as[(Long, Long)].collect().toSeq
    assert(p != r)
  }

  test("randomPairs degrades gracefully when the population is short") {
    val small = spark.range(0, 5).toDF("k") // 5 keys → at most 2 pairs
    val p = Tables.randomPairs(small, "k", n = 100, seed = 1L)
      .as[(Long, Long)].collect().toSeq
    assert(p.size == 2)
  }

  test("stratifiedCap: per-group quota, seed-stable, layout-independent, seed-sensitive") {
    val df = spark.range(0, 1000).toDF("k")
      .withColumn("g", org.apache.spark.sql.functions.col("k") % 7)
    val a = Tables.stratifiedCap(df, Seq("g"), "k", n = 20, seed = 5L)
    val aSet = a.as[(Long, Long)].collect().toSet
    // Quota exactly met (every group here has > 20 members).
    val perGroup = a.groupBy("g").count().as[(Long, Long)].collect().toMap
    assert(perGroup.size == 7 && perGroup.values.forall(_ == 20L))
    // Undersized groups pass through whole.
    val tiny = Tables.stratifiedCap(df.filter($"k" < 10), Seq("g"), "k",
      n = 20, seed = 5L).count()
    assert(tiny == 10L)
    // Same rows regardless of physical layout; different rows per seed.
    val b = Tables.stratifiedCap(df.repartition(13), Seq("g"), "k",
      n = 20, seed = 5L).as[(Long, Long)].collect().toSet
    assert(aSet == b, "sample changed with partition layout")
    val c = Tables.stratifiedCap(df, Seq("g"), "k", n = 20, seed = 6L)
      .as[(Long, Long)].collect().toSet
    assert(aSet != c, "different seed produced identical sample")
  }

  test("weightedSample keeps ~sum(p) rows and tracks per-row probability") {
    import org.apache.spark.sql.functions._
    // Two weight tiers: p=0.1 for k<5000, p=0.8 for k>=5000.
    val df = spark.range(0, 10000).toDF("k")
      .withColumn("p", when($"k" < 5000, 0.1).otherwise(0.8))
    val kept = Tables.weightedSample(df, "k", col("p"), seed = 11L)
      .groupBy("p").count().as[(Double, Long)].collect().toMap
    // Binomial 4σ bands: n=5000 at p → mean 500/4000, σ≈21.2/28.3.
    assert(math.abs(kept(0.1) - 500.0) < 4 * 21.3, s"low tier: ${kept(0.1)}")
    assert(math.abs(kept(0.8) - 4000.0) < 4 * 28.3, s"high tier: ${kept(0.8)}")
    // Layout-independence: same kept set after a repartition.
    val a = Tables.weightedSample(df, "k", col("p"), seed = 11L)
      .select("k").as[Long].collect().toSet
    val b = Tables.weightedSample(df.repartition(13), "k", col("p"), seed = 11L)
      .select("k").as[Long].collect().toSet
    assert(a == b)
  }

  test("weighted top-k: exact budget, ES key formula, weight bias") {
    import graft.functions.HashUtil
    val docs = (1L to 400L).map(i => (i, if (i <= 200) 10L else 1000L))
      .toDF("doc_id", "w")
    val got = Tables.weightedTopK(docs, "doc_id", col("w"), k = 50, seed = 7L)
      .select("rank", "doc_id", "w", "es")
      .as[(Int, Long, Long, Double)].collect()
    assert(got.length == 50)
    assert(got.map(_._1).toSeq == (1 to 50))
    // es matches the closed-form A-ES key for the top row
    val (_, id1, w1, es1) = got.head
    val u = (HashUtil.md5Lower63(s"7:$id1") + 1).toDouble / math.pow(2, 63)
    assert(es1 == math.rint(math.log(u) / w1 * 1e6) / 1e6)
    // 100x weight must dominate the sample (P[inclusion] tracks weight)
    val heavy = got.count(_._3 == 1000L)
    assert(heavy >= 45, s"only $heavy/50 heavy-weight rows sampled")
  }

  test("q210 consistent sample: the sub-database is referentially closed") {
    val sf = GraftSpark.sf
    val out = graft.queries.RelationalQueries
      .queries("q210_consistent_sample")(spark, sf)
      .as[(Long, Long, Long, Double)].collect().head
    // Reconstruct the sampled keep-set and follow the keys manually.
    val keep = graft.io.Tables.customer(spark, sf)
      .filter(Tables.seededUniform(col("c_custkey"), 210L) < 0.1)
      .select("c_custkey").as[Long].collect().toSet
    val orders = graft.io.Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey").as[(Long, Long)].collect()
      .filter(o => keep.contains(o._2))
    val orderKeys = orders.map(_._1).toSet
    val li = graft.io.Tables.lineitem(spark, sf)
      .select("l_orderkey").as[Long].collect()
      .count(orderKeys.contains)
    assert(out._1 == keep.size.toLong)
    assert(out._2 == orders.length.toLong)
    assert(out._3 == li.toLong)
    // Sampling rate lands near 10 % (binomial 3σ).
    val total = graft.io.Tables.customer(spark, sf).count()
    val sd = math.sqrt(total * 0.1 * 0.9)
    assert(math.abs(keep.size - 0.1 * total) < 3 * sd + 1)
  }

  test("weightedTopKPerGroup: exact k per group, layout-independent, weight bias") {
    val docs = (1L to 600L)
      .map(i => (i, if (i % 3 == 0) "a" else "b",
        if (i <= 300) 10L else 1000L))
      .toDF("doc_id", "g", "w")
    val got = Tables.weightedTopKPerGroup(docs, Seq("g"), "doc_id",
      col("w"), k = 40, seed = 11L)
    // Exact quota per stratum, ranks 1..k within each.
    val perGroup = got.groupBy("g").count()
      .as[(String, Long)].collect().toMap
    assert(perGroup == Map("a" -> 40L, "b" -> 40L))
    assert(got.filter(col("g") === "a").select("rank")
      .as[Int].collect().sorted.toSeq == (1 to 40))
    // Same rows on a different physical layout (keyed PRNG, no rand()).
    val relaid = Tables.weightedTopKPerGroup(docs.repartition(7), Seq("g"),
      "doc_id", col("w"), k = 40, seed = 11L)
    assert(got.select("g", "doc_id").as[(String, Long)].collect().toSet ==
      relaid.select("g", "doc_id").as[(String, Long)].collect().toSet)
    // Inclusion tracks weight within each stratum.
    val heavy = got.filter(col("w") === 1000L).count()
    assert(heavy >= 72, s"only $heavy/80 heavy-weight rows sampled")
  }
}
