package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants of the r10 depth wave: q343 bigram cross-entropy,
  * q344 stopword discovery, q345 sliding-chunk overlap, q346 retention
  * half-life, q347 label-centroid cosines.
  */
class CurationDepthSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  val sf = GraftSpark.sf

  private def q(x: Double, s: Int): Double = {
    val f = math.pow(10, s); math.floor(x * f + 0.5) / f
  }

  test("q343 bigram cross-entropy reproduces a driver recompute") {
    val rows = graft.queries.TextQueries.queries(
      "q343_bigram_perplexity")(spark, sf).collect()
    val docs = graft.io.Tables.documents(spark, sf)
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getString(1), r.getString(2).split(" ")))
    val vsize = docs.flatMap(_._2).distinct.length
    val bg = scala.collection.mutable.Map.empty[(String, String), Long]
    val pre = scala.collection.mutable.Map.empty[String, Long]
    docs.foreach { case (_, t) =>
      t.sliding(2).filter(_.length == 2).foreach { p =>
        bg((p(0), p(1))) = bg.getOrElse((p(0), p(1)), 0L) + 1
        pre(p(0)) = pre.getOrElse(p(0), 0L) + 1
      }
    }
    val perDoc = docs.filter(_._2.length >= 2).map { case (src, t) =>
      val terms = t.sliding(2).filter(_.length == 2).map { p =>
        q(-math.log((bg((p(0), p(1))) + 0.5) / (pre(p(0)) + 0.5 * vsize)), 9)
      }.toSeq
      (src, q(terms.sum / terms.length, 6))
    }
    val bySrc = perDoc.groupBy(_._1)
    assert(rows.length == bySrc.size)
    rows.foreach { r =>
      val xs = bySrc(r.getAs[String]("source")).map(_._2)
      assert(r.getAs[Long]("n_docs") == xs.length.toLong)
      assert(math.abs(r.getAs[Double]("mean_xent2") - xs.sum / xs.length) < 1e-5)
      assert(math.abs(r.getAs[Double]("min_xent2") - xs.min) < 1e-9)
      assert(math.abs(r.getAs[Double]("max_xent2") - xs.max) < 1e-9)
    }
  }

  test("q344 stopword ranking reproduces a driver recompute") {
    val rows = graft.queries.TextQueries.queries(
      "q344_stopword_discovery")(spark, sf).collect()
    val docs = graft.io.Tables.documents(spark, sf)
      .select("text").collect().map(_.getString(0).split(" "))
    val df = scala.collection.mutable.Map.empty[String, Long]
    val occ = scala.collection.mutable.Map.empty[String, Long]
    docs.foreach { t =>
      t.foreach(w => occ(w) = occ.getOrElse(w, 0L) + 1)
      t.distinct.foreach(w => df(w) = df.getOrElse(w, 0L) + 1)
    }
    val n = docs.length.toLong
    val expect = df.toSeq.map { case (tok, d) =>
      (tok, d, occ(tok), (2 * d * 1000000L + n) / (2 * n))
    }.sortBy { case (tok, d, o, _) => (-d, -o, tok) }.take(50)
    assert(rows.length == math.min(50, df.size))
    rows.zip(expect).foreach { case (r, (tok, d, o, ppm)) =>
      assert(r.getAs[String]("token") == tok)
      assert(r.getAs[Long]("df") == d)
      assert(r.getAs[Long]("occurrences") == o)
      assert(r.getAs[Long]("df_ppm") == ppm)
      assert((r.getAs[Long]("stopword_candidate") == 1L) == (ppm > 500000L))
    }
  }

  test("q345 chunk audit reproduces a driver recompute") {
    val rows = graft.queries.TextQueries.queries(
      "q345_sliding_chunks")(spark, sf).collect()
    val docs = graft.io.Tables.documents(spark, sf)
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1).split(" ").length.toLong))
    val bySrc = docs.groupBy(_._1)
    rows.foreach { r =>
      val lens = bySrc(r.getAs[String]("source")).map(_._2)
      val chunks = lens.flatMap { nTok =>
        (0L to (nTok - 1) / 48).map(i => math.min(64L, nTok - i * 48))
      }
      assert(r.getAs[Long]("n_docs") == lens.length.toLong)
      assert(r.getAs[Long]("raw_tokens") == lens.sum)
      assert(r.getAs[Long]("n_chunks") == chunks.length.toLong)
      assert(r.getAs[Long]("chunk_tokens") == chunks.sum)
      assert(r.getAs[Long]("full_chunks") == chunks.count(_ == 64L).toLong)
      val ct = chunks.sum; val rt = lens.sum
      assert(r.getAs[Long]("overlap_ppm") ==
        (2 * (ct - rt) * 1000000L + ct) / (2 * ct))
      assert(ct >= rt)
    }
  }

  test("q346 half-life is present exactly when retention decays") {
    val rows = graft.queries.AnalyticsQueries.queries(
      "q346_retention_halflife")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val slope = r.getAs[Double]("decay_slope")
      val hl = Option(r.get(r.fieldIndex("half_life_weeks")))
      if (slope < 0) {
        assert(hl.isDefined)
        assert(math.abs(hl.get.asInstanceOf[Double] -
          q(-math.log(2.0) / slope, 6)) < 2e-5)
      } else assert(hl.isEmpty)
      assert(r.getAs[Long]("n_points") >= 2)
      assert(r.getAs[Long]("base_users") >= 1)
    }
  }

  test("q347 centroid cosines reproduce a driver recompute") {
    val rows = graft.queries.SimilarityQueries.queries(
      "q347_label_centroids")(spark, sf).collect()
    val embs = graft.io.Tables.embeddings(spark, sf)
      .select("label", "embedding").collect()
      .map(r => (r.getAs[Number]("label").longValue(),
        r.getSeq[Float](1).map(_.toDouble).toArray))
    val byLabel = embs.groupBy(_._1)
    val cents = byLabel.map { case (l, vs) =>
      val dim = vs.head._2.length
      l -> Array.tabulate(dim) { d =>
        q(vs.map(v => q(v._2(d), 9)).sum / vs.length, 9)
      }
    }
    val k = byLabel.size
    assert(rows.length == k * (k - 1) / 2)
    rows.foreach { r =>
      val la = r.getAs[Number]("label_a").longValue()
      val lb = r.getAs[Number]("label_b").longValue()
      val (ca, cb) = (cents(la), cents(lb))
      val dot = ca.zip(cb).map { case (x, y) => q(x * y, 9) }.sum
      val na = math.sqrt(ca.map(x => q(x * x, 9)).sum)
      val nb = math.sqrt(cb.map(x => q(x * x, 9)).sum)
      val cos = r.getAs[Double]("centroid_cosine")
      assert(math.abs(cos - q(dot / (na * nb), 6)) < 1e-5,
        s"($la,$lb): engine $cos vs recompute ${dot / (na * nb)}")
      assert(cos >= -1.0 - 1e-9 && cos <= 1.0 + 1e-9)
      assert(r.getAs[Long]("n_a") == byLabel(la).length.toLong)
      assert(r.getAs[Long]("n_b") == byLabel(lb).length.toLong)
    }
  }
}
