package graft

import graft.rec.Diversify

import org.scalatest.funsuite.AnyFunSuite

class DiversifySpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._

  test("MMR demotes the near-duplicate a plain top-k would keep") {
    // item 2 is a clone of item 1 (sim 1.0); rel order is 1 > 2 > 3,
    // so plain top-2 = {1, 2} — MMR must pick 3 second
    val cands = Seq((7L, 1, 1.0), (7L, 2, 0.8), (7L, 3, 0.5))
      .toDF("user_id", "item_id", "rel")
    val sims = Seq((1, 2, 1.0), (2, 1, 1.0)).toDF("ia", "ib", "sim")
    val out = Diversify.mmrRerank(cands, sims, relWeight = 0.7,
      divWeight = 0.3, k = 3)
      .as[(Long, Int, Int, Double)].collect().sortBy(_._3)
    assert(out.map(_._2).toSeq == Seq(1, 3, 2))
    assert(out(0)._4 == 0.7 * 1.0 - 0.3 * 0.0)
    assert(out(1)._4 == 0.7 * 0.5 - 0.3 * 0.0)
    assert(out(2)._4 == 0.7 * 0.8 - 0.3 * 1.0) // penalized clone
  }

  test("the sim-pair guard fires loudly ONE row past the cap") {
    // VERDICT r11 #7: the broadcast-lookup ceiling must fail fast with
    // an actionable message, never a silent driver OOM. The mechanism is
    // cap-parameterized, so the boundary is pinned with a small cap
    // (exactly-at passes, cap+1 throws); the production constant itself
    // is pinned below and its real 4M-pair collect cost is measured by
    // the ScaleProbe `mmrceiling` run.
    val cands = Seq((7L, 1, 1.0), (7L, 2, 0.8)).toDF("user_id", "item_id", "rel")
    val sims = (0 until 11).map(i => (i, i + 100, 0.5))
      .toDF("ia", "ib", "sim")
    val e = intercept[IllegalArgumentException] {
      Diversify.mmrRerank(cands, sims, 0.7, 0.3, k = 2, maxSimPairs = 10)
    }
    assert(e.getMessage.contains("maxSimPairs"),
      s"guard message must name the knob: ${e.getMessage}")
    // exactly AT the cap still runs
    val ok = Diversify.mmrRerank(cands, sims.limit(10), 0.7, 0.3, k = 2,
      maxSimPairs = 10)
    assert(ok.count() == 2)
    // the production ceiling is the documented ~2000-item-pool constant
    assert(Diversify.MaxSimPairsDefault == 4000000)
    assert(2000 * 1999 <= Diversify.MaxSimPairsDefault)
  }

  test("score ties break on the smaller item id; k caps at list size") {
    val cands = Seq((1L, 30, 0.9), (1L, 10, 0.9), (1L, 20, 0.9))
      .toDF("user_id", "item_id", "rel")
    val sims = Seq.empty[(Int, Int, Double)].toDF("ia", "ib", "sim")
    val out = Diversify.mmrRerank(cands, sims, 0.7, 0.3, k = 10)
      .as[(Long, Int, Int, Double)].collect().sortBy(_._3)
    assert(out.map(_._2).toSeq == Seq(10, 20, 30))
    assert(out.length == 3) // k=10 requested, 3 candidates exist
  }
}
