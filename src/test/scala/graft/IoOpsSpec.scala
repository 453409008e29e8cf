package graft

import graft.io.Tables
import graft.rec.{AlsRec, Popularity}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class IoOpsSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._
  val sf = GraftSpark.sf

  test("loadAndClean drops null keys and casts (S2)") {
    val df = Seq((Some(1), Some("2.5")), (None, Some("1.0")), (Some(3), None))
      .toDF("user_id", "rating")
    val got = Tables.loadAndClean(df, Seq("user_id" -> "int", "rating" -> "float"))
    assert(got.count() == 1)
    assert(got.schema("rating").dataType.typeName == "float")
  }

  test("hashSample is deterministic and layout-independent (M5)") {
    val users = Tables.ratings(spark, sf).select("user_id").distinct()
    val a = Tables.hashSample(users, "user_id", 5).as[Long].collect().toSeq
    val b = Tables.hashSample(users.repartition(7), "user_id", 5)
      .as[Long].collect().toSeq
    assert(a == b)
    assert(a.size == 5)
    // different salt → different sample (overwhelmingly)
    val c = Tables.hashSample(users, "user_id", 5, salt = "other")
      .as[Long].collect().toSeq
    assert(a != c)
  }

  test("ALS grid search returns one metric per config (M12)") {
    val t = Popularity.withSplits(Tables.ratings(spark, sf))
    val results = AlsRec.gridSearch(
      Popularity.train(t), Popularity.validation(t),
      ranks = Seq(4), regs = Seq(0.1, 1.0), topN = 5,
      evalFn = (recs, valid) =>
        graft.metrics.RankingRelational.metrics(spark,
          recs.select("user_id", "item_id", "rank"), valid, 5)
          .head().getAs[Double]("map_at_k"))
    assert(results.size == 2)
    assert(results.forall { case (_, _, m) => !m.isNaN && m >= 0.0 })
    assert(results.map(r => (r._1, r._2)).toSet == Set((4, 0.1), (4, 1.0)))
  }
}
