package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants of the r10 sweep/audit wave: q348 FK integrity,
  * q349 decontamination width sweep, q350 quality PSI, q351 IVF
  * nprobe/recall sweep.
  */
class SweepAuditSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  val sf = GraftSpark.sf

  test("q348 audits all five relations clean on the synthetic star") {
    val rows = graft.queries.AnalyticsQueries.queries(
      "q348_fk_integrity")(spark, sf).collect()
    assert(rows.length == 5)
    val counts = Map(
      "customer.nationkey->nation" -> graft.io.Tables.customer(spark, sf).count(),
      "orders.custkey->customer" -> graft.io.Tables.orders(spark, sf).count(),
      "lineitem.orderkey->orders" -> graft.io.Tables.lineitem(spark, sf).count(),
      "lineitem.partkey->part" -> graft.io.Tables.lineitem(spark, sf).count(),
      "lineitem.suppkey->supplier" -> graft.io.Tables.lineitem(spark, sf).count())
    rows.foreach { r =>
      assert(r.getAs[Long]("n_child") ==
        counts(r.getAs[String]("relation")))
      assert(r.getAs[Long]("n_orphans") == 0L)
      assert(r.getAs[Long]("orphan_ppm") == 0L)
    }
  }

  test("q349 contamination is monotone in n and the n=8 arm matches q82") {
    val rows = graft.queries.TextQueries.queries(
      "q349_decontamination_sweep")(spark, sf).collect()
      .sortBy(_.getAs[Long]("ngram_n"))
    assert(rows.map(_.getAs[Long]("ngram_n")).toSeq == Seq(4L, 8L, 12L))
    val docs = rows.map(_.getAs[Long]("contaminated_docs"))
    assert(docs(0) >= docs(1) && docs(1) >= docs(2),
      s"doc contamination not monotone in n: ${docs.toSeq}")
    val q82 = graft.queries.TextQueries.queries(
      "q82_decontaminate")(spark, sf).collect()
    assert(rows(1).getAs[Long]("contaminated_docs") == q82.length.toLong)
    assert(rows(1).getAs[Long]("shared_gram_hits") ==
      q82.map(_.getAs[Long]("n_shared")).sum)
    rows.foreach { r =>
      assert(r.getAs[Long]("contamination_ppm") >= 0 &&
        r.getAs[Long]("contamination_ppm") <= 1000000L)
    }
  }

  test("q350 PSI is nonnegative with consistent verdicts") {
    val rows = graft.queries.TextQueries.queries(
      "q350_quality_psi")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val psi = r.getAs[Double]("psi")
      assert(psi >= -1e-9, s"${r.getAs[String]("source")}: PSI $psi < 0")
      val v = r.getAs[String]("verdict")
      if (psi > 0.25) assert(v == "shifted")
      else if (psi > 0.1) assert(v == "moderate")
      else assert(v == "stable")
    }
  }

  test("q351 recall grows with nprobe and brackets sensibly") {
    val rows = graft.queries.SimilarityQueries.queries(
      "q351_ivf_nprobe_sweep")(spark, sf).collect()
      .sortBy(_.getAs[Long]("nprobe"))
    assert(rows.map(_.getAs[Long]("nprobe")).toSeq == Seq(1L, 2L, 4L))
    val rec = rows.map(_.getAs[Double]("recall_at_5"))
    assert(rec(0) <= rec(1) + 1e-9 && rec(1) <= rec(2) + 1e-9,
      s"recall not monotone in nprobe: ${rec.toSeq}")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_truth") > 0)
      assert(r.getAs[Long]("n_overlap") <= r.getAs[Long]("n_truth"))
      val expect = math.floor(r.getAs[Long]("n_overlap").toDouble /
        r.getAs[Long]("n_truth") * 1e6 + 0.5) / 1e6
      assert(r.getAs[Double]("recall_at_5") == expect)
    }
    assert(rec(2) > 0.0)
  }
}
