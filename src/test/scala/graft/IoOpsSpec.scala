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

  test("mergeSchema read widens the legacy batch with NULLs (q300 layout)") {
    import org.apache.spark.sql.functions._
    val merged = graft.io.Tables.documentsTwoBatch(spark, sf)
    // the merged schema carries the newer column
    assert(merged.columns.contains("n_chars"))
    // exactly the pre-evolution (even doc_id) batch surfaces NULL; the
    // newer batch keeps its values — no row of either batch is dropped
    val audit = merged.agg(
      count(lit(1)).as("n"),
      sum(when(col("n_chars").isNull && col("doc_id") % 2 === 0, 1L)
        .otherwise(0L)).as("legacy_null"),
      sum(when(col("n_chars").isNull && col("doc_id") % 2 =!= 0, 1L)
        .otherwise(0L)).as("new_null")).head()
    val docs = graft.io.Tables.documents(spark, sf)
    val total = docs.count()
    val evens = docs.filter(col("doc_id") % 2 === 0).count()
    assert(audit.getLong(0) == total)
    assert(audit.getLong(1) == evens && evens > 0)
    assert(audit.getLong(2) == 0L)
  }
}
