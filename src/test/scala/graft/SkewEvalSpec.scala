package graft

import graft.ops.Skew

import org.apache.spark.ml.evaluation.RankingEvaluator
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

class SkewEvalSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._
  val sf = GraftSpark.sf

  test("saltedAgg == plain groupBy on a skewed key distribution") {
    val rnd = new Random(31)
    // 90% of rows hit key 0 (hot key), rest uniform.
    val rows = (1 to 20000).map { _ =>
      val k = if (rnd.nextDouble() < 0.9) 0 else rnd.nextInt(50)
      (k, rnd.nextInt(100).toLong)
    }
    val df = rows.toDF("k", "v")
    val plain = df.groupBy("k")
      .agg(count(lit(1)).as("n"), sum("v").as("s"))
      .orderBy("k").as[(Int, Long, Long)].collect().toSeq
    val salted = Skew.saltedAgg(df, Seq("k"), salts = 16,
      partial = Seq(count(lit(1)).as("n"), sum("v").as("s")),
      merge = Seq(sum("n").as("n"), sum("s").as("s")))
      .orderBy("k").as[(Int, Long, Long)].collect().toSeq
    assert(salted == plain)
  }

  test("saltedJoin == plain join on a skewed join key") {
    val rnd = new Random(32)
    // Hot fact key: 90% of fact rows join to dim key 0.
    val fact = (1 to 20000).map { i =>
      val k = if (rnd.nextDouble() < 0.9) 0 else rnd.nextInt(50)
      (k, i.toLong)
    }.toDF("k", "v")
    val dim = (0 until 50).map(k => (k, s"d$k")).toDF("k", "name")
    val plain = fact.join(dim, Seq("k"))
      .orderBy("k", "v").as[(Int, Long, String)].collect().toSeq
    val salted = Skew.saltedJoin(fact, dim, Seq("k"), salts = 8)
      .orderBy("k", "v").as[(Int, Long, String)].collect().toSeq
    assert(salted == plain)
    // Fact rows of the hot key really spread across sub-partitions —
    // the whole point of the salt.
    val saltSpread = fact.filter(col("k") === 0)
      .withColumn("__salt", pmod(xxhash64(col("k"), col("v"),
        lit("graft-salt")), lit(8L)))
      .select("__salt").distinct().count()
    assert(saltSpread > 1, "hot key collapsed onto one salt")
  }

  test("relational MAP matches ml RankingEvaluator (M10)") {
    val t = graft.rec.Popularity.withSplits(graft.io.Tables.ratings(spark, sf))
    val recs = graft.rec.Popularity.recommend(
      graft.rec.Popularity.train(t), graft.rec.Popularity.validation(t),
      bias = 100.0, poolK = 50, k = 20)
    val truth = graft.rec.Popularity.validation(t)
      .select("user_id", "item_id").distinct()

    val ours = graft.metrics.RankingRelational.metrics(spark, recs, truth, 20)
      .head().getAs[Double]("map_at_k")

    val pred = recs.orderBy("user_id", "rank").groupBy("user_id")
      .agg(collect_list(struct(col("rank"), col("item_id"))).as("l"))
      .select(col("user_id"),
        expr("transform(array_sort(l), x -> cast(x.item_id as double))").as("prediction"))
    val lab = truth.groupBy("user_id")
      .agg(expr("transform(collect_set(item_id), x -> cast(x as double))").as("label"))
    val joined = pred.join(lab, "user_id")
    val mapAtK = new RankingEvaluator()
      .setPredictionCol("prediction").setLabelCol("label")
      .setMetricName("meanAveragePrecisionAtK").setK(20)
      .evaluate(joined)
    assert(math.abs(ours - mapAtK) < 1e-5, s"ours $ours vs evaluator $mapAtK")
  }
}
