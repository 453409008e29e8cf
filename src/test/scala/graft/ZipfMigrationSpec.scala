package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants of the r10 closing wave: q368 Zipf fit, q369
  * activity-segment migration, q370 dedup quality shift.
  */
class ZipfMigrationSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  val sf = GraftSpark.sf

  private def q6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
  private def q9(x: Double): Double = math.floor(x * 1e9 + 0.5) / 1e9

  test("q368 Zipf regression reproduces a driver recompute") {
    val rows = graft.queries.TextQueries.queries(
      "q368_zipf_slope")(spark, sf).collect()
    assert(rows.length == 1)
    val r = rows.head
    val occ = graft.io.Tables.documents(spark, sf)
      .select("text").collect().flatMap(_.getString(0).split(" "))
      .groupBy(identity).map { case (t, xs) => (t, xs.length.toLong) }
      .toSeq.sortBy { case (t, c) => (-c, t) }
    assert(r.getAs[Long]("n_terms") == occ.length.toLong)
    val pts = occ.zipWithIndex.map { case ((_, c), i) =>
      (q9(math.log(i + 1.0)), q9(math.log(c.toDouble)),
        q9(math.log(i + 1.0) * math.log(c.toDouble)),
        q9(math.log(i + 1.0) * math.log(i + 1.0)),
        q9(math.log(c.toDouble) * math.log(c.toDouble)))
    }
    val n = pts.length.toDouble
    val (sx, sy, sxy, sxx, syy) = (pts.map(_._1).sum, pts.map(_._2).sum,
      pts.map(_._3).sum, pts.map(_._4).sum, pts.map(_._5).sum)
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert(math.abs(r.getAs[Double]("zipf_slope") - slope) < 1e-4)
    assert(slope < 0, s"Zipf slope $slope not negative")
    val r2 = math.pow(n * sxy - sx * sy, 2) /
      ((n * sxx - sx * sx) * (n * syy - sy * sy))
    assert(math.abs(r.getAs[Double]("r2") - r2) < 1e-4)
    assert(r2 >= 0 && r2 <= 1 + 1e-9)
  }

  test("q369 migration matrix partitions the customer base") {
    val rows = graft.queries.OlapQueries.queries(
      "q369_rfm_migration")(spark, sf).collect()
    val nCust = graft.io.Tables.customer(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_customers")).sum == nCust)
    val classes = Set("0_absent", "1_low", "2_mid", "3_high")
    rows.foreach { r =>
      assert(classes.contains(r.getAs[String]("class_h1")))
      assert(classes.contains(r.getAs[String]("class_h2")))
      assert(r.getAs[Long]("share_ppm") ==
        (2 * r.getAs[Long]("n_customers") * 1000000L + nCust) /
          (2 * nCust))
    }
    assert(rows.length <= 16)
  }

  test("q370 quality shift reconciles with q21 and q74 survivorship") {
    val rows = graft.queries.TextQueries.queries(
      "q370_dedup_quality_shift")(spark, sf).collect()
    val q21 = graft.queries.TextQueries.queries(
      "q21_quality_score")(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), q6(r.getAs[Double]("quality"))))
      .toMap
    val survivors = graft.queries.TextQueries.queries(
      "q74_neardup_survivors")(spark, sf).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    val docs = graft.io.Tables.documents(spark, sf)
      .select("doc_id", "source").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val bySrc = docs.groupBy(_._2)
    rows.foreach { r =>
      val src = r.getAs[String]("source")
      val ids = bySrc(src).map(_._1)
      assert(r.getAs[Long]("n_docs") == ids.length.toLong)
      val surv = ids.filter(survivors.contains)
      assert(r.getAs[Long]("n_survivors") == surv.length.toLong)
      val mAll = q6(ids.map(i => q9(q21(i))).sum / ids.length)
      val mSurv = q6(surv.map(i => q9(q21(i))).sum / surv.length)
      assert(math.abs(r.getAs[Double]("mean_quality_all") - mAll) < 1e-5)
      assert(math.abs(r.getAs[Double]("mean_quality_survivors") - mSurv)
        < 1e-5)
      assert(math.abs(r.getAs[Double]("quality_delta") -
        q6(surv.map(i => q9(q21(i))).sum / surv.length -
          ids.map(i => q9(q21(i))).sum / ids.length)) < 2e-5)
    }
  }
}
