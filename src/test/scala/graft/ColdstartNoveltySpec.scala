package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants of the r10 rec/lang-audit wave: q358 cold-start
  * audit, q359 language confusion matrix, q360 recommendation novelty.
  */
class ColdstartNoveltySpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  val sf = GraftSpark.sf

  private def q6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
  private def q9(x: Double): Double = math.floor(x * 1e9 + 0.5) / 1e9

  private lazy val taggedRows = {
    graft.rec.Popularity.withSplits(
        graft.io.Tables.ratings(spark, sf))
      .select("user_id", "item_id", "split").collect()
      .map(r => (r.getLong(0), r.getAs[Number](1).intValue(),
        r.getAs[Number](2).intValue()))
  }

  test("q358 cold-start shares reproduce a driver recompute") {
    val rows = graft.queries.RecQueries.queries(
      "q358_coldstart_audit")(spark, sf).collect()
      .sortBy(_.getAs[String]("entity"))
    assert(rows.map(_.getAs[String]("entity")).toSeq == Seq("item", "user"))
    val train = taggedRows.filter(_._3 <= 2)
    val valid = taggedRows.filter(_._3 == 3)
    def check(r: org.apache.spark.sql.Row, keyOf: ((Long, Int, Int)) => Long)
        : Unit = {
      val vks = valid.map(keyOf).distinct
      val tks = train.map(keyOf).toSet
      val unseen = vks.filterNot(tks.contains)
      assert(r.getAs[Long]("n_val_entities") == vks.length.toLong)
      assert(r.getAs[Long]("n_unseen") == unseen.length.toLong)
      assert(r.getAs[Long]("n_val_rows") == valid.length.toLong)
      val aff = valid.count(e => !tks.contains(keyOf(e)))
      assert(r.getAs[Long]("n_affected_rows") == aff.toLong)
      assert(r.getAs[Long]("unseen_ppm") ==
        (2 * unseen.length.toLong * 1000000L + vks.length) /
          (2L * vks.length))
    }
    check(rows(0), e => e._2.toLong)
    check(rows(1), e => e._1)
  }

  test("q359 confusion matrix agrees with q22 and row rates close") {
    val rows = graft.queries.TextQueries.queries(
      "q359_lang_confusion")(spark, sf).collect()
    val preds = graft.queries.TextQueries.queries(
      "q22_lang_id")(spark, sf).collect()
      .map(r => (r.getAs[String]("actual"), r.getAs[String]("predicted")))
    val cells = preds.groupBy(identity).map { case (k, v) => k -> v.length }
    assert(rows.length == cells.size)
    val byActual = preds.groupBy(_._1).map { case (a, v) => a -> v.length }
    rows.foreach { r =>
      val k = (r.getAs[String]("actual"), r.getAs[String]("predicted"))
      assert(r.getAs[Long]("n") == cells(k).toLong)
      val rt = byActual(k._1).toLong
      assert(r.getAs[Long]("rate_ppm") ==
        (2 * r.getAs[Long]("n") * 1000000L + rt) / (2 * rt))
      assert((r.getAs[Int]("is_correct") == 1) == (k._1 == k._2))
    }
    // row rates sum to ~1e6 per actual (half-up rounding slop per cell)
    rows.groupBy(_.getAs[String]("actual")).foreach { case (a, rs) =>
      val s = rs.map(_.getAs[Long]("rate_ppm")).sum
      assert(math.abs(s - 1000000L) <= rs.length.toLong,
        s"actual=$a rates sum to $s")
    }
  }

  test("q360 novelty reproduces a driver recompute") {
    val rows = graft.queries.RecQueries.queries(
      "q360_rec_novelty")(spark, sf).collect()
    assert(rows.nonEmpty)
    val train = taggedRows.filter(_._3 <= 2)
    val nTrain = train.length.toDouble
    val si = train.groupBy(_._2).map { case (i, xs) =>
      i -> q9(-math.log(xs.length / nTrain))
    }
    val recs = graft.queries.RecQueries.queries(
      "q50_popularity_recs")(spark, sf).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Number]("item_id").intValue()))
      .groupBy(_._1)
    assert(rows.length == recs.size)
    rows.foreach { r =>
      val u = r.getAs[Long]("user_id")
      val items = recs(u).map(_._2)
      assert(r.getAs[Long]("n_recs") == items.length.toLong)
      assert(r.getAs[Long]("n_unscored") == 0L)
      val nov = q6(items.map(si).sum / items.length)
      assert(math.abs(r.getAs[Double]("novelty_nats") - nov) < 1e-5,
        s"user $u: ${r.getAs[Double]("novelty_nats")} vs $nov")
      assert(r.getAs[Double]("novelty_nats") > 0)
    }
  }
}
