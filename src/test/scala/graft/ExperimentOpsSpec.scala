package graft

import graft.queries.Registry

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants of the q301–q305 experimentation/feature-eng wave that the
  * value-level oracle gate cannot express — structural properties that
  * must hold at ANY scale factor, not just match DuckDB at one.
  */
class ExperimentOpsSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  val sf = GraftSpark.sf

  test("q301 folds PARTITION every event: train + valid + purged = total, " +
      "folds tile the day range") {
    val total = graft.io.Tables.events(spark, sf).count()
    val rows = Registry.all("q301_purged_cv")(spark, sf).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val (nv, nt, np) = (r.getAs[Long]("n_valid"), r.getAs[Long]("n_train"),
        r.getAs[Long]("n_purged"))
      assert(nv + nt + np == total, s"fold ${r.getAs[Long]("fold")} leaks")
      assert(nv > 0, "empty validation fold")
    }
    // contiguous tiling: fold f's f1 + 1 == fold f+1's f0
    val bounds = rows.sortBy(_.getAs[Long]("fold"))
      .map(r => (r.getAs[Long]("f0"), r.getAs[Long]("f1")))
    bounds.sliding(2).foreach { case Array((_, f1a), (f0b, _)) =>
      assert(f1a + 1 == f0b, "folds do not tile")
    }
  }

  test("q302 WOE signs follow the bad-rate direction and IV is nonnegative") {
    val rows = Registry.all("q302_woe_encoding")(spark, sf).collect()
    assert(rows.nonEmpty)
    val badTot = rows.map(_.getAs[Long]("n_bad")).sum.toDouble
    val goodTot = rows.map(r => r.getAs[Long]("n") - r.getAs[Long]("n_bad"))
      .sum.toDouble
    rows.foreach { r =>
      val woe = r.getAs[Double]("woe")
      val iv = r.getAs[Double]("iv")
      // IV term = (pb − pg)·ln(pb/pg): both factors share sign ⇒ iv ≥ 0
      assert(iv >= -1e-9, s"negative IV for ${r.getAs[String]("category")}")
      // unsmoothed sign check where the category isn't borderline
      val pb = r.getAs[Long]("n_bad") / badTot
      val pg = (r.getAs[Long]("n") - r.getAs[Long]("n_bad")) / goodTot
      if (math.abs(pb - pg) > 0.005)
        assert(woe.sign == (pb - pg).sign,
          s"WOE sign contradicts bad-rate direction for ${r.get(0)}")
    }
  }

  test("q303 ATT books every treated customer as matched or dropped") {
    val r = Registry.all("q303_strat_match_att")(spark, sf).head()
    val treatedTotal = graft.io.Tables.customer(spark, sf)
      .filter(col("c_mktsegment") === "BUILDING").count()
    assert(r.getAs[Long]("n_treated_matched") +
      r.getAs[Long]("n_treated_dropped") == treatedTotal)
    assert(r.getAs[Long]("n_strata_matched") <=
      r.getAs[Long]("n_treated_matched"))
    assert(!r.getAs[Double]("att_dollars").isNaN)
  }

  test("q304 BH rejections are exactly the p-ascending prefix and p is a " +
      "valid two-sided tail") {
    val rows = Registry.all("q304_bh_fdr")(spark, sf)
      .orderBy("rank").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val p = r.getAs[Double]("p")
      assert(p >= 0.0 && p <= 1.0, s"p out of range: $p")
    }
    // monotone prefix: once a test is not rejected, none after it is
    val flags = rows.map(_.getAs[Long]("rejected"))
    assert(flags.sliding(2).forall {
      case Array(a, b) => a >= b
      case _ => true
    }, "BH rejections are not a rank prefix")
    // p non-decreasing in rank (the ordering the BH threshold assumes)
    val ps = rows.map(_.getAs[Double]("p"))
    assert(ps.sliding(2).forall { case Array(a, b) => a <= b; case _ => true })
    // A null A/B split (keyed-md5 halves of the same population) should
    // reject ~nothing at α=0.1 — a planted-effect companion would invert
    // this; here it guards against a p-computation that saturates to 0.
    assert(flags.sum <= rows.length / 4, "null split rejected too much")
  }

  test("q304 Abramowitz–Stegun p matches the normal two-sided tail on " +
      "known z values") {
    // reference values: 2·(1−Φ(z)) to 4 dp
    val known = Seq(0.0 -> 1.0, 1.0 -> 0.3173, 1.96 -> 0.05, 2.576 -> 0.01)
    import spark.implicits._
    val df = known.map(_._1).toDF("z")
    val x = abs(col("z")) / lit(math.sqrt(2.0))
    val t = lit(1.0) / (lit(1.0) + lit(0.3275911) * x)
    val poly = ((((lit(1.061405429) * t - lit(1.453152027)) * t +
      lit(1.421413741)) * t - lit(0.284496736)) * t + lit(0.254829592)) * t
    val got = df.withColumn("p", poly * exp(-x * x))
      .orderBy(col("z")).collect().map(_.getAs[Double]("p"))
    known.sortBy(_._1).map(_._2).zip(got).foreach { case (want, g) =>
      assert(math.abs(want - g) < 5e-4, s"p($want) ≈ $g")
    }
  }

  test("q313 XmR limits bracket the center line and violations are bounded") {
    val r = Registry.all("q313_xmr_chart")(spark, sf).head()
    val (xbar, ucl, lcl) = (r.getAs[Double]("xbar_dollars"),
      r.getAs[Double]("ucl"), r.getAs[Double]("lcl"))
    assert(lcl < xbar && xbar < ucl)
    assert(r.getAs[Long]("n_violations") >= 0 &&
      r.getAs[Long]("n_violations") <= r.getAs[Long]("n_days"))
    // 2.66·MR̄ on each side: UCL−LCL = 2·2.66·MR̄ (up to output rounding)
    assert(math.abs((ucl - lcl) - 2 * 2.66 * r.getAs[Double]("mrbar_dollars"))
      < 1e-4)
  }

  test("q316 Bayesian average shrinks every item TOWARD the global mean") {
    val rows = Registry.all("q316_bayesian_average")(spark, sf).collect()
    assert(rows.nonEmpty)
    // recover the global mean from any row: score is a convex combination
    // of mean_rating and C, so C is between the extremes of (score-mean)
    rows.foreach { r =>
      val (mean, score) = (r.getAs[Double]("mean_rating"),
        r.getAs[Double]("bayes_score"))
      val v = r.getAs[Long]("v")
      // |score − mean| ≤ (m/(v+m))·|C − mean| ≤ |C − mean|: shrinkage
      // never overshoots past the prior side; with m=50, low-vote items
      // move more than high-vote items toward the same C
      assert(!score.isNaN && !mean.isNaN && v > 0)
    }
    // convexity ⇒ the score spread is no wider than the mean spread
    val means = rows.map(_.getAs[Double]("mean_rating"))
    val scores = rows.map(_.getAs[Double]("bayes_score"))
    assert(scores.max - scores.min <= means.max - means.min + 1e-9)
  }

  test("q319 Kruskal-Wallis: H nonnegative, tie correction only inflates, " +
      "dof = groups - 1") {
    val r = Registry.all("q319_kruskal_wallis")(spark, sf).head()
    val (h, hc) = (r.getAs[Double]("h"), r.getAs[Double]("h_tie_corrected"))
    assert(h >= -1e-9)
    assert(hc >= h - 1e-9, "tie correction must not shrink H")
    assert(r.getAs[Long]("dof") == r.getAs[Long]("k") - 1)
  }

  test("q320 seasonal indices average ~1 (ratios to their own trend) " +
      "across the week") {
    val rows = Registry.all("q320_seasonal_decomposition")(spark, sf)
      .collect()
    assert(rows.length == 7)
    val idx = rows.map(_.getAs[Double]("seasonal_index"))
    val wMean = rows.map(r => r.getAs[Double]("seasonal_index") *
      r.getAs[Long]("n_days")).sum / rows.map(_.getAs[Long]("n_days")).sum
    assert(math.abs(wMean - 1.0) < 0.02,
      s"day-weighted mean detrended ratio $wMean drifted from 1")
    assert(idx.forall(i => i > 0.5 && i < 2.0))
  }

  test("q321 Theil decomposition: parts are nonnegative and sum exactly " +
      "to the total") {
    val r = Registry.all("q321_theil_decomposition")(spark, sf).head()
    val (t, b, w) = (r.getAs[Double]("theil_total"),
      r.getAs[Double]("theil_between"), r.getAs[Double]("theil_within"))
    assert(t >= 0 && b >= -1e-9)
    assert(math.abs(t - (b + w)) < 1e-9, "decomposition must be exact")
    assert(b <= t + 1e-9)
  }

  test("q322 stratifying ON acctbal drives the acctbal SMD toward zero") {
    val rows = Registry.all("q322_covariate_balance")(spark, sf).collect()
    assert(rows.length == 3)
    val byCov = rows.map(r => r.getAs[String]("cov") ->
      (r.getAs[Double]("smd_raw"), r.getAs[Double]("smd_adjusted"))).toMap
    // the stratification variable itself must end (near-)balanced —
    // within-stratum acctbal spread is at most one 200-unit band
    val (raw, adj) = byCov("x_acctbal")
    assert(math.abs(adj) <= math.abs(raw) + 1e-9)
    assert(math.abs(adj) < 0.1, s"acctbal not balanced after stratification: $adj")
  }

  test("q323 fuzzy decontamination flags only cross-side near-dups from " +
      "q27's pair graph") {
    val fz = Registry.all("q323_fuzzy_decontaminate")(spark, sf).collect()
    val pairs = Registry.all("q27_minhash_lsh_dups")(spark, sf)
      .filter(col("est_jaccard") >= 0.5)
      .filter((col("id_a") % 17 === 0) =!= (col("id_b") % 17 === 0))
      .collect()
    // every flagged training doc is the train side of some qualifying pair
    val trainSides = pairs.map { r =>
      val (a, b) = (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))
      if (a % 17 != 0) a else b
    }.toSet
    assert(fz.map(_.getAs[Long]("doc_id")).toSet == trainSides)
    fz.foreach { r =>
      assert(r.getAs[Long]("doc_id") % 17 != 0, "flagged a benchmark doc")
      val mx = r.getAs[Double]("max_est_jaccard")
      assert(mx >= 0.5 && mx <= 1.0)
    }
  }

  test("q305 data card internal consistency: shares in (0,1], dup_pct in " +
      "[0,1), median within observed range") {
    val rows = Registry.all("q305_source_datacard")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val share = r.getAs[Double]("top_lang_share")
      assert(share > 0.0 && share <= 1.0)
      assert(r.getAs[Long]("n_langs") >= 1)
      val dup = r.getAs[Double]("dup_pct")
      assert(dup >= 0.0 && dup < 1.0)
      assert(r.getAs[Long]("n_tokens") >= r.getAs[Long]("n_docs"),
        "every doc has at least one whitespace token")
    }
  }
}
