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
