package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants of the r10 LLM-curation wave: q330 source-mixture
  * temperature weights, q331 unigram cross-entropy, q332 duplicate
  * 8-gram mass, q333 length log-normal fit, q334 cluster-size spectrum.
  * Exact values are oracle-gated by the driver; these pin the
  * mathematical laws the hash compare can't express.
  */
class LlmCurationSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  val sf = GraftSpark.sf

  private def docs: Array[(Long, String, Array[String])] =
    graft.io.Tables.documents(spark, sf)
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2).split(" ")))

  test("q330 weights normalize and alpha<1 flattens toward uniform") {
    val rows = graft.queries.TextQueries.queries(
      "q330_source_mixture_weights")(spark, sf).collect()
    assert(rows.nonEmpty)
    val k = rows.length
    def col(n: String) = rows.map(_.getAs[Double](n))
    // each weight family sums to 1 up to per-row quantization slop
    Seq("p", "w_alpha03", "w_alpha07").foreach { c =>
      assert(math.abs(col(c).sum - 1.0) < 1e-4 * k, s"$c sums to ${col(c).sum}")
    }
    rows.foreach { r =>
      val (p, w3, w7) = (r.getAs[Double]("p"), r.getAs[Double]("w_alpha03"),
        r.getAs[Double]("w_alpha07"))
      val u = 1.0 / k
      // temperature flattening: the weight moves monotonically from p
      // (alpha=1) toward uniform as alpha decreases, so w_alpha03 sits
      // on the far side of w_alpha07 from p, and both stay between p
      // and 1/k (up to 6dp quantization).
      val eps = 5e-6
      if (p < u) assert(p - eps <= w7 && w7 <= w3 + eps && w3 <= u + eps,
        s"below-uniform source not flattened up: p=$p w7=$w7 w3=$w3")
      else assert(u - eps <= w3 && w3 <= w7 + eps && w7 <= p + eps,
        s"above-uniform source not flattened down: p=$p w7=$w7 w3=$w3")
      // epochs = oversampling factor: w/p, so epochs*p == w
      assert(math.abs(r.getAs[Double]("epochs_alpha03") * p - w3) < 1e-4)
      assert(math.abs(r.getAs[Double]("epochs_alpha07") * p - w7) < 1e-4)
    }
  }

  test("q331 per-source mean cross-entropy reproduces a driver recompute") {
    val rows = graft.queries.TextQueries.queries(
      "q331_unigram_xent")(spark, sf).collect()
    val d = docs
    val counts = scala.collection.mutable.Map.empty[String, Long]
    var total = 0L
    d.foreach(_._3.foreach { t =>
      counts(t) = counts.getOrElse(t, 0L) + 1; total += 1
    })
    def q(x: Double, s: Int): Double = {
      val f = math.pow(10, s); math.floor(x * f + 0.5) / f
    }
    val perDoc = d.map { case (_, src, toks) =>
      val h = toks.map(t =>
        q(-math.log(counts(t).toDouble / total), 9)).sum / toks.length
      (src, q(h, 6))
    }
    val bySrc = perDoc.groupBy(_._1)
    assert(rows.length == bySrc.size)
    rows.foreach { r =>
      val xs = bySrc(r.getAs[String]("source")).map(_._2)
      assert(r.getAs[Long]("n_docs") == xs.length.toLong)
      assert(math.abs(r.getAs[Double]("mean_xent") - xs.sum / xs.length) < 1e-5)
      assert(math.abs(r.getAs[Double]("min_xent") - xs.min) < 1e-9)
      assert(math.abs(r.getAs[Double]("max_xent") - xs.max) < 1e-9)
      assert(r.getAs[Double]("min_xent") > 0)
    }
  }

  test("q332 duplicate-mass counts reproduce a driver recompute") {
    val rows = graft.queries.TextQueries.queries(
      "q332_duplicate_ngram_mass")(spark, sf).collect()
    val d = docs
    val grams = d.flatMap { case (_, src, toks) =>
      if (toks.length < 8) Array.empty[(String, String)]
      else (0 to toks.length - 8).map(i =>
        (src, toks.slice(i, i + 8).mkString(" "))).toArray
    }
    val corpus = grams.groupBy(_._2).map { case (g, occ) => (g, occ.length) }
    val bySrc = grams.groupBy(_._1)
    rows.foreach { r =>
      val src = r.getAs[String]("source")
      val mine = bySrc(src)
      assert(r.getAs[Long]("total_occ") == mine.length.toLong)
      assert(r.getAs[Long]("distinct_grams") ==
        mine.map(_._2).distinct.length.toLong)
      val dup = mine.count(g => corpus(g._2) > 1).toLong
      assert(r.getAs[Long]("dup_occ") == dup)
      val ppm = r.getAs[Long]("dup_mass_ppm")
      assert(ppm == (2 * dup * 1000000L + mine.length) / (2 * mine.length))
    }
  }

  test("q333 fit obeys AM>=GM and sigma2>=0") {
    val rows = graft.queries.TextQueries.queries(
      "q333_length_lognormal")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val s2 = r.getAs[Double]("sigma2")
      assert(s2 >= -1e-9, s"negative variance $s2")
      val med = r.getAs[Double]("fit_median_tokens")
      val fitMean = r.getAs[Double]("fit_mean_tokens")
      val actual = r.getAs[Double]("actual_mean_tokens")
      // e^mu <= e^(mu + s2/2), and geometric mean <= arithmetic mean
      assert(med <= fitMean + 1e-6)
      assert(med <= actual + 1e-4, s"GM $med > AM $actual")
    }
  }

  test("q334 size classes partition the corpus exactly") {
    val rows = graft.queries.TextQueries.queries(
      "q334_dedup_cluster_sizes")(spark, sf).collect()
    val corpus = graft.io.Tables.documents(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == corpus)
    rows.foreach { r =>
      val (sz, nc, nd) = (r.getAs[Long]("cluster_size"),
        r.getAs[Long]("n_clusters"), r.getAs[Long]("n_docs"))
      assert(sz >= 1 && nd == sz * nc, s"size $sz: $nd != $sz*$nc")
      val ppm = r.getAs[Long]("docs_ppm")
      assert(ppm == (2 * nd * 1000000L + corpus) / (2 * corpus))
    }
    // clusters from a pair graph are never singletons, so exactly one
    // size-1 row (the unclustered remainder) and it leads the sort
    assert(rows.head.getAs[Long]("cluster_size") == 1L)
    assert(rows.count(_.getAs[Long]("cluster_size") == 1L) == 1)
  }
}
