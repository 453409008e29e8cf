package graft

import graft.queries.Registry

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The round-6 OLAP wave 2 (q121–q126): semantic properties the DuckDB
  * hash gate can't express (probability normalization, equi-depth
  * balance, MAD breakdown resistance) plus the scale-critical plan
  * shapes. */
class OlapSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  val sf = GraftSpark.sf

  private def plan(q: String): String =
    Registry.all(q)(spark, sf).queryExecution.executedPlan.toString

  test("q122 transition probabilities normalize per prev_type") {
    val rows = Registry.all("q122_markov_transitions")(spark, sf)
      .groupBy("prev_type").agg(sum("p").as("ptot")).collect()
    assert(rows.nonEmpty)
    // each row of the matrix sums to 1 up to the 6-decimal rounding of
    // its ≤|types| entries
    rows.foreach(r =>
      assert(math.abs(r.getDouble(1) - 1.0) < 1e-4, r.toString))
  }

  test("q124 shares normalize and the cumulative share ends at 1") {
    val rows = Registry.all("q124_abc_contribution")(spark, sf).collect()
    val shares = rows.map(_.getAs[Double]("share"))
    assert(math.abs(shares.sum - 1.0) < 1e-4)
    assert(math.abs(rows.last.getAs[Double]("cum_share") - 1.0) < 1e-6)
    // classes are monotone along the descending-revenue sweep
    val classes = rows.map(_.getAs[String]("abc_class")).mkString
    assert("^A*B*C*$".r.findFirstIn(classes).isDefined, classes)
  }

  test("q125 buckets are equi-depth within interpolation slack") {
    val rows = Registry.all("q125_equidepth_histogram")(spark, sf).collect()
    assert(rows.length == 10)
    val ns = rows.map(_.getAs[Long]("n"))
    val total = ns.sum.toDouble
    // each decile holds 10% ± 2% of the rows (boundary ties/interpolation)
    ns.foreach(n => assert(math.abs(n / total - 0.1) < 0.02, ns.mkString(",")))
    // bucket value ranges are disjoint and ordered
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Double]("mx") <= b.getAs[Double]("mn"))
    }
  }

  test("q126 MAD flags a planted extreme and resists contamination") {
    import spark.implicits._
    // 100 inliers in [0, 99] plus one extreme: the median/MAD of the
    // contaminated frame barely move (breakdown resistance), so the
    // plant scores far over threshold while inliers stay under it.
    val base = (0 until 100).map(i => (i.toLong, "t", i.toDouble))
    val ev = (base :+ ((999L, "t", 1e6))).toDF("event_id", "event_type", "value")
    val med = ev.groupBy("event_type")
      .agg(round(expr("percentile(value, 0.5D)"), 6).as("med"))
    val dev = ev.join(broadcast(med), "event_type")
      .withColumn("adev", abs(col("value") - col("med")))
    val mad = dev.groupBy("event_type")
      .agg(round(expr("percentile(adev, 0.5D)"), 6).as("mad"))
    val rz = dev.join(broadcast(mad), "event_type")
      .withColumn("rz",
        round(lit(0.6745) * (col("value") - col("med")) / col("mad"), 6))
    val flagged = rz.filter(abs(col("rz")) >= 3.5)
      .select("event_id").as[Long].collect()
    assert(flagged.toSet == Set(999L), flagged.mkString(","))
  }

  test("q121 windows over the aggregated frame, not fact rows") {
    val p = plan("q121_moving_revenue")
    assert(!p.contains("SortMergeJoin"))
    if (p.contains("InMemoryTableScan")) {
      // the memoized SharedFrames daily frame was already materialized
      // by another suite in this JVM — the cached dump carries its own
      // exchanges, so pin only q121's OWN shape above the cache: one
      // window exchange, fact rows never sorted here
      val above = p.split("InMemoryRelation")(0)
      assert("Exchange hashpartitioning".r.findAllIn(above).size == 1, above)
    } else {
      // cold path: map-side partial agg, then the window's exchange
      // keys only the (nation)-partitioned DAILY frame
      assert(p.contains("partial_sum"))
      assert("Exchange hashpartitioning".r.findAllIn(p).size == 2, p)
    }
  }

  test("q123 slice filter sits below the Expand, at the scan") {
    val p = plan("q123_unpivot_measures")
    assert(p.contains("Expand"))
    val scan = p.indexOf("FileScan parquet")
    val expand = p.indexOf("Expand")
    val filt = p.indexOf("% 997")
    // executedPlan prints top-down: Expand above Filter above FileScan
    assert(expand < filt && filt < scan, p)
  }

  test("q125 plans sort-free: percentile reduce + broadcast, no ntile") {
    val p = plan("q125_equidepth_histogram")
    assert("\\bntile\\(".r.findFirstIn(p).isEmpty) // \b: "percentile(" ends in "ntile("
    assert(p.contains("partial_percentile")) // mergeable map-side partials
    assert(p.contains("BroadcastNestedLoopJoin")) // 1-row bounds frame
    // the only Sorts are the final 10-row output ordering
    assert(!p.contains("SortMergeJoin"))
  }

  test("q126 stats frames broadcast back; facts never shuffle-join") {
    val p = plan("q126_mad_outliers")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2)
    assert(!p.contains("SortMergeJoin"))
  }

  test("TimeSeries.ewma matches the closed recursion on exact inputs") {
    import spark.implicits._
    // α = 0.5 on powers of two: every intermediate is FP-exact, so the
    // assertion is equality, not tolerance
    val pts = Seq(("k", 1L, 10.0), ("k", 2L, 20.0), ("k", 3L, 30.0),
      ("j", 5L, 4.0), ("j", 7L, 8.0))
      .toDF("key", "day", "x")
    val out = graft.ops.TimeSeries.ewma(pts, "key", "day", "x", 0.5)
      .orderBy("key", "day")
      .select("key", "day", "ewma").as[(String, Long, Double)].collect()
    assert(out.toSeq == Seq(("j", 5L, 4.0), ("j", 7L, 6.0),
      ("k", 1L, 10.0), ("k", 2L, 15.0), ("k", 3L, 22.5)))
  }

  test("TimeSeries.cusum: in-control pins at 0, a step shift accumulates linearly") {
    import spark.implicits._
    // mu = 10, allowance k = 1; x = 10 for days 1-5 (in control, both
    // sides absorb within the allowance), then a +5 step for days 6-8
    // and a -5 step for days 9-10. All values FP-exact.
    val xs = Seq.tabulate(10) { i =>
      val d = i + 1L
      val x = if (d <= 5) 10.0 else if (d <= 8) 15.0 else 5.0
      ("k", d, x, 10.0, 1.0)
    }
    val out = graft.ops.TimeSeries
      .cusum(xs.toDF("key", "day", "x", "mu", "kk"),
        "key", "day", "x", "mu", "kk")
      .orderBy("day")
      .select("s_pos", "s_neg").as[(Double, Double)].collect().toSeq
    assert(out.take(5) == Seq.fill(5)((0.0, 0.0)))
    // +5 shift: s_pos grows by (15-10-1)=4 per day, s_neg stays 0.
    assert(out.slice(5, 8) == Seq((4.0, 0.0), (8.0, 0.0), (12.0, 0.0)))
    // -5 shift: s_pos drains by (5-10-1)=-6 per day and clamps at 0;
    // s_neg grows by -(5-10)-1 = 4 per day.
    assert(out.slice(8, 10) == Seq((6.0, 4.0), (0.0, 8.0)))
  }

  test("q202 backtest composition: hand-computed Holt one-step errors") {
    import spark.implicits._
    import graft.functions.GraftFunctions.qround
    import org.apache.spark.sql.expressions.Window
    // α = β = 0.5 on powers of two: l/b/forecast all FP-exact.
    // forecasts: f1 = 8, f2 = 14 → errors 16−8 = 8, 32−14 = 18.
    val pts = Seq(("k", 1L, 8.0), ("k", 2L, 16.0), ("k", 3L, 32.0))
      .toDF("nation", "day", "revenue")
    val h = graft.ops.TimeSeries.holtLinear(pts, "nation", "day",
      "revenue", 0.5, 0.5)
    val w = Window.partitionBy("nation").orderBy("day")
    val e = h.withColumn("pfc", lag(col("forecast"), 1).over(w))
      .filter(col("pfc").isNotNull)
      .withColumn("err",
        qround(col("revenue") - col("pfc"), 6).cast("decimal(18,6)"))
      .withColumn("ape",
        qround(abs(col("revenue") - col("pfc")) / col("revenue"), 6)
          .cast("decimal(18,6)"))
    val r = e.groupBy("nation").agg(
        count(lit(1)).as("n"),
        qround(sum(col("err")).cast("double") / count(lit(1)), 6)
          .as("bias"),
        qround(sum(abs(col("err"))).cast("double") / count(lit(1)), 6)
          .as("mae"),
        qround(lit(100.0) * sum(col("ape")).cast("double") /
          count(lit(1)), 6).as("mape_pct"))
      .as[(String, Long, Double, Double, Double)].collect().head
    assert(r == (("k", 2L, 13.0, 13.0, 53.125)))
  }

  test("q206 MRR bridge closes: class deltas sum to the period-over-period revenue move") {
    import spark.implicits._
    val out = graft.queries.OlapQueries
      .queries("q206_mrr_bridge")(spark, sf)
    // Independent per-period revenue from orders.
    val rev = graft.io.Tables.orders(spark, sf)
      .select(expr(
        "cast(cast(o_orderdate as timestamp) as long) div 86400 div 30")
        .as("p"),
        graft.functions.GraftFunctions.qdec(col("o_totalprice"), 18, 2)
          .as("v"))
      .groupBy("p").agg(sum("v").cast("decimal(18,2)").as("total"))
      .as[(Long, BigDecimal)].collect().toMap
    val deltas = out.groupBy("p")
      .agg(sum("mrr_delta").cast("decimal(18,2)").as("d"))
      .as[(Long, BigDecimal)].collect().toMap
    val periods = rev.keys.toSeq.sorted
    periods.foreach { p =>
      val expect = rev.getOrElse(p, BigDecimal(0)) -
        rev.getOrElse(p - 1, BigDecimal(0))
      assert(deltas.getOrElse(p, BigDecimal(0)) == expect,
        s"bridge leak at period $p")
    }
    // Churn rows carry zero current revenue by definition.
    assert(out.filter(col("mrr_class") === "churned" &&
      col("mrr") =!= 0).count() == 0)
  }

  test("q207 moments agree with Spark's built-in skewness/kurtosis") {
    import spark.implicits._
    val got = graft.queries.OlapQueries
      .queries("q207_moment_profile")(spark, sf)
      .select("event_type", "skewness", "excess_kurtosis")
      .as[(String, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    val ref = graft.io.Tables.events(spark, sf)
      .groupBy("event_type")
      .agg(skewness(col("value")).as("sk"), kurtosis(col("value")).as("ku"))
      .as[(String, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got.keySet == ref.keySet && got.nonEmpty)
    got.foreach { case (t, (sk, ku)) =>
      // Built-ins use sample-corrected streaming moments; ours are
      // population moments from rounded sufficient stats — agree to
      // well under 1e-2 at n ≈ 10⁴.
      assert(math.abs(sk - ref(t)._1) < 0.01, s"skew($t): $sk vs ${ref(t)._1}")
      assert(math.abs(ku - ref(t)._2) < 0.05, s"kurt($t): $ku vs ${ref(t)._2}")
    }
  }

  test("q211 semantics: RANGE frame respects calendar gaps where ROWS does not") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val pts = Seq(("k", 1L, 10L), ("k", 2L, 10L), ("k", 20L, 10L))
      .toDF("g", "day", "v")
    val range = Window.partitionBy("g").orderBy("day").rangeBetween(-6, 0)
    val rows = Window.partitionBy("g").orderBy("day").rowsBetween(-2, 0)
    val out = pts
      .withColumn("r_sum", sum("v").over(range))
      .withColumn("w_sum", sum("v").over(rows))
      .orderBy("day")
      .select("day", "r_sum", "w_sum")
      .as[(Long, Long, Long)].collect().toSeq
    // Day 20 sits 18 days after its neighbors: the RANGE frame sees only
    // itself; the ROWS frame blindly reaches back across the gap.
    assert(out == Seq((1L, 10L, 10L), (2L, 20L, 20L), (20L, 10L, 30L)))
  }

  test("q212 fingerprint: layout-invariant, any single-row change flips it") {
    import spark.implicits._
    def fp(df: org.apache.spark.sql.DataFrame): java.math.BigDecimal =
      df.select(graft.functions.GraftFunctions.md5_63(
          concat_ws("|", col("k"), col("s"))).cast("decimal(38,0)").as("h"))
        .agg(sum("h")).head().getDecimal(0)
    val base = (1 to 500).map(i => (i.toLong, s"name_$i")).toDF("k", "s")
    assert(fp(base) == fp(base.repartition(7).sortWithinPartitions("s")))
    val oneChanged = (1 to 500)
      .map(i => (i.toLong, if (i == 250) "name_X" else s"name_$i"))
      .toDF("k", "s")
    assert(fp(base) != fp(oneChanged))
  }

  test("q128 report is internally consistent and the fixture is clean") {
    val rows = Registry.all("q128_dq_report")(spark, sf).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("pass") == (r.getAs[Long]("n_violations") == 0L))
      assert(r.getAs[Long]("n_checked") > 0L)
    }
    assert(rows.forall(_.getAs[Boolean]("pass"))) // driver fixture is clean
  }

  test("q129 emits only verified near-pairs, canonically ordered") {
    val rows = Registry.all("q129_sorted_neighborhood")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (a, b) = (r.getAs[String]("name_a"), r.getAs[String]("name_b"))
      assert(a < b) // least/greatest canonicalization held
      val d = r.getAs[Long]("dist")
      assert(d >= 1 && d <= 2)
    }
  }

  test("q130 fusion scores are monotone and ranks in-list") {
    val rows = Registry.all("q130_rank_fusion")(spark, sf).collect()
    assert(rows.length == 25)
    val rrfs = rows.map(_.getAs[Double]("rrf"))
    assert(rrfs.sliding(2).forall { case Array(a, b) => a >= b })
    rows.foreach { r =>
      Seq("r_rev", "r_n").foreach { c =>
        if (!r.isNullAt(r.fieldIndex(c))) {
          val v = r.getAs[Int](c)
          assert(v >= 1 && v <= 100)
        }
      }
    }
  }

  test("q133 PIT join never fans out: one row per purchase, no leakage") {
    val out = Registry.all("q133_pit_join")(spark, sf)
    val purchases = graft.io.Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
    // intervals partition each user's timeline ⇒ exactly one output row
    // per purchase, even through the left join
    assert(out.count() == purchases.count())
    assert(out.select("event_id").distinct().count() == out.count())
  }

  test("q134 top paths plan as TakeOrderedAndProject over one exchange") {
    val p = plan("q134_event_paths")
    assert(p.contains("TakeOrderedAndProject"))
    assert(!p.contains("SortMergeJoin") && !p.contains("Join"))
  }

  test("q135 grouping sets plan as one Expand + one aggregate pass") {
    val p = plan("q135_grouping_sets")
    assert(p.contains("Expand"))
    // one partial/final hash-aggregate pair over the expanded rows — a
    // rescan-per-set plan would show multiple scans or a union
    assert("FileScan parquet".r.findAllIn(p).size == 3) // orders+cust+nation
    assert(!p.contains("Union"))
  }

  test("q131 z-stat is finite and the hash split is two-sided") {
    val r = Registry.all("q131_ab_ztest")(spark, sf).collect().head
    assert(r.getAs[Long]("n_a") > 0 && r.getAs[Long]("n_b") > 0)
    assert(!r.getAs[Double]("z").isNaN && !r.getAs[Double]("z").isInfinite)
  }

  test("q155 shares sum to ~1 within each region and across regions") {
    val rows = Registry.all("q155_ratio_to_parent")(spark, sf).collect()
    rows.groupBy(_.getAs[String]("region")).foreach { case (_, rs) =>
      assert(math.abs(rs.map(_.getAs[Double]("share_of_region")).sum - 1.0)
        < 1e-4)
    }
    val regionShares = rows.groupBy(_.getAs[String]("region"))
      .map(_._2.head.getAs[Double]("region_share")).sum
    assert(math.abs(regionShares - 1.0) < 1e-4)
  }

  test("q156 emits 7 weekday rows whose day-weighted index averages 1") {
    val rows = Registry.all("q156_dow_seasonality")(spark, sf).collect()
    assert(rows.map(_.getAs[Int]("dow")).toSet == (0 to 6).toSet)
    val tot = rows.map(_.getAs[Long]("n_days")).sum.toDouble
    val w = rows.map(r => r.getAs[Double]("seasonal_index") *
      r.getAs[Long]("n_days")).sum / tot
    assert(math.abs(w - 1.0) < 1e-3)
  }

  test("q194 bottom-k quantile sample is MERGEABLE: bottom-k(A∪B) == bottom-k(bk(A)∪bk(B))") {
    // The sketch's scale claim: shard-local bottom-k samples union into
    // the global bottom-k without rescanning — same algebra as KMV.
    import spark.implicits._
    val k = 64
    val rows = (1 to 5000).map { i =>
      (i.toLong, graft.functions.HashUtil.md5Lower63(s"qsk:$i"),
        (i * 37 % 1000).toLong)
    }.toDF("id", "h", "v")
    def bottomK(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy("h", "id")))
        .filter(col("rn") <= k).drop("rn")
    val (shardA, shardB) = (rows.filter(col("id") % 2 === 0),
      rows.filter(col("id") % 2 === 1))
    val direct = bottomK(rows).orderBy("h")
      .as[(Long, Long, Long)].collect().toSeq
    val merged = bottomK(bottomK(shardA).unionByName(bottomK(shardB)))
      .orderBy("h").as[(Long, Long, Long)].collect().toSeq
    assert(merged == direct)
  }

  test("q194 sample quantiles track the exact ones on the gate data") {
    val rows = Registry.all("q194_quantile_sketch")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, ns) = (r.getAs[Long]("n_rows"), r.getAs[Long]("n_sample"))
      assert(ns == math.min(n, 256L))
      // A 256-point uniform sample's p50 lands within a loose relative
      // band of the exact p50 (±30% — a sanity envelope, not a bound;
      // the oracle already pins exact values).
      val est = r.getAs[Double]("est_p50")
      val ex = r.getAs[Double]("p50")
      assert(ex == 0.0 || math.abs(est - ex) / math.max(ex.abs, 1e-9) < 0.3,
        s"est_p50 $est far from exact $ex for ${r.getAs[String]("event_type")}")
    }
  }

  test("q218 FIFO matching exhausts min(supply, demand) per part") {
    // The defining conservation law of FIFO lot matching: cumulative
    // inflow [0,S) and outflow [0,D) intervals tile, so total matched
    // units per part are exactly min(S, D) — any bucket-join dedupe bug
    // (double-counted or dropped overlap slices) breaks this identity.
    // Value-level correctness vs the quadratic nested-loop formulation
    // is the DuckDB oracle's job.
    val rows = Registry.all("q218_fifo_matching")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (s, d, m) = (r.getAs[Long]("supply_units"),
        r.getAs[Long]("demand_units"), r.getAs[Long]("matched_units"))
      assert(m == math.min(s, d), s"part ${r.get(0)}: matched $m != min($s, $d)")
      assert(r.getAs[Long]("n_matches") >= (if (m > 0) 1L else 0L))
    }
  }

  test("q219 apportionment sums exactly to the budget, one unit max bonus") {
    val rows = Registry.all("q219_apportionment")(spark, sf).collect()
    assert(rows.length == 25)
    val units = rows.map(_.getAs[Long]("units"))
    val quotas = rows.map(_.getAs[Long]("quota"))
    assert(units.sum == 1000L, s"units sum ${units.sum}")
    quotas.zip(units).foreach { case (q, u) =>
      assert(u == q || u == q + 1, s"unit $u not in {quota, quota+1} of $q")
    }
    // quotas recomputed independently in BigInt floor division
    val revs = rows.map(r => BigInt(r.getAs[Long]("rev_cents")))
    val total = revs.sum
    revs.zip(quotas).foreach { case (rev, q) =>
      assert(BigInt(q) == rev * 1000 / total)
    }
  }

  test("q220 Benford expected counts sum exactly to n (probabilities sum to 1)") {
    val rows = Registry.all("q220_benford_audit")(spark, sf).collect()
    assert(rows.length == 9)
    assert(rows.map(_.getAs[Int]("digit")).toSeq == (1 to 9))
    val n = rows.map(_.getAs[Long]("n_obs")).sum
    // Outputs are 6dp-quantized DOUBLEs (r9 decimal-out ban); each is
    // within an ulp of its exact 6dp decimal, so setScale(6) recovers
    // the exact value and the decimal-exact invariants still hold.
    def d6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val expSum = rows.map(r => d6(r.getAs[Double]("expected_n"))).sum
    assert(expSum == BigDecimal(n), s"expected_n sums to $expSum, n=$n")
    val terms = rows.map(r => d6(r.getAs[Double]("chi2_term")))
    val totals = rows.map(r => d6(r.getAs[Double]("chi2_total"))).distinct
    assert(totals.size == 1 && totals.head == terms.sum)
  }

  test("q235 diff classes partition the key union and respect the simulation rules") {
    val rows = Registry.all("q235_table_diff")(spark, sf).collect()
      .map(r => r.getAs[String]("diff_class") -> r).toMap
    assert(rows.keySet == Set("added", "removed", "changed", "unchanged"))
    // every removed key is ≡ 0 mod 13 by construction; changed ≡ 0 mod 7
    assert(rows("removed").getAs[Long]("min_key") % 13 == 0)
    assert(rows("removed").getAs[Long]("max_key") % 13 == 0)
    assert(rows("changed").getAs[Long]("min_key") % 7 == 0)
    assert(rows("changed").getAs[Long]("max_key") % 7 == 0)
  }

  test("q236 remaining inventory complements q218's matched units exactly") {
    val matched = Registry.all("q218_fifo_matching")(spark, sf).collect()
      .map(r => r.getAs[Long]("l_partkey") ->
        (r.getAs[Long]("supply_units"), r.getAs[Long]("matched_units"))).toMap
    val rows = Registry.all("q236_fifo_valuation")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (supply, m) = matched(r.getAs[Long]("l_partkey"))
      assert(r.getAs[Long]("remaining_units") == supply - m,
        s"part ${r.get(0)}: ${r.getAs[Long]("remaining_units")} != $supply - $m")
      if (r.getAs[Long]("remaining_units") == 0)
        assert(r.getAs[Long]("n_open_lots") == 0 && r.isNullAt(
          r.fieldIndex("oldest_open_s")))
    }
  }

  test("q234 HLL raw estimate lands within the sketch's error envelope") {
    val rows = Registry.all("q234_hll_oracle")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val np = r.getAs[Long]("n_present")
      assert(np >= 1 && np <= 256)
      assert(r.getAs[Long]("v_zero") == 256 - np)
      val est = r.getAs[Double]("est_raw")
      val exact = r.getAs[Long]("n_exact").toDouble
      // 1.04/√256 ≈ 6.5 % standard error; 4σ envelope. (At sf0.001 the
      // cardinality is small enough that the uncorrected raw estimate
      // biases low — that regime is the documented V-based correction's
      // job — so the envelope only gates when n ≫ 2.5 m.)
      if (exact > 640 * 4)
        assert(math.abs(est - exact) / exact < 0.26, s"$est vs $exact")
    }
  }

  test("HLL registers merge by per-bucket max (sketch algebra)") {
    import spark.implicits._
    // register build replicated on a tiny universe, split into halves
    def regs(ids: Seq[Long]) = ids
      .map(u => graft.functions.HashUtil.md5Lower63(
        s"hll:$u".getBytes("UTF-8")))
      .map(h => (h / 36028797018963968L, {
        val rest = h % 36028797018963968L
        if (rest == 0) 56 else 56 - java.lang.Long.toBinaryString(rest).length
      }))
      .groupBy(_._1).map { case (b, rs) => b -> rs.map(_._2).max }
    val all = (1L to 400L).toSeq
    val (a, b) = all.splitAt(200)
    val merged = (regs(a).toSeq ++ regs(b).toSeq)
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).max }
    assert(merged == regs(all))
  }

  test("q228 Wilson lower bound never exceeds the raw rate") {
    val rows = Registry.all("q228_wilson_ranking")(spark, sf).collect()
    assert(rows.length == 50)
    rows.foreach { r =>
      assert(r.getAs[Long]("k") <= r.getAs[Long]("n"))
      val (raw, lo) = (r.getAs[Double]("raw_rate"),
        r.getAs[Double]("wilson_lo"))
      assert(lo <= raw && lo >= 0.0 && raw <= 1.0, s"$lo vs $raw")
    }
    val los = rows.map(_.getAs[Double]("wilson_lo")).toSeq
    assert(los == los.sortBy(-_))
  }

  test("q229 weighted percentiles are monotone and p50 equals q167's weighted median") {
    val rows = Registry.all("q229_weighted_percentiles")(spark, sf).collect()
    rows.foreach { r =>
      val ps = Seq("wp25", "wp50", "wp75", "wp90")
        .map(c => r.getAs[Double](c))
      assert(ps == ps.sorted, r.toString)
    }
    // Exact double equality is sound: both sides come off the same
    // decOut projection of identical internal decimals.
    val med = Registry.all("q167_weighted_median")(spark, sf).collect()
      .map(r => r.getAs[String]("nation") ->
        r.getAs[Double]("weighted_median")).toMap
    rows.foreach { r =>
      assert(r.getAs[Double]("wp50") == med(r.getAs[String]("nation")))
    }
  }

  test("q227 pinball losses are non-negative and score exactly the post-warmup days") {
    val rows = Registry.all("q227_pinball_eval")(spark, sf).collect()
    val seriesLen = graft.queries.SharedFrames.dailyNationRevenue(spark, sf)
      .groupBy("nation").count().collect()
      .map(r => r.getAs[String]("nation") -> r.getAs[Long]("count")).toMap
    // exactly the nations with a post-warmup day appear
    assert(rows.map(_.getAs[String]("nation")).toSet ==
      seriesLen.filter(_._2 > 28).keySet)
    rows.foreach { r =>
      assert(r.getAs[Double]("pinball_p50") >= 0.0)
      assert(r.getAs[Double]("pinball_p90") >= 0.0)
      assert(r.getAs[Long]("n_scored") ==
        seriesLen(r.getAs[String]("nation")) - 28)
    }
  }

  test("q221 runs tile the stream and adjacent runs change type") {
    val rows = Registry.all("q221_rle_runs")(spark, sf)
      .orderBy("user_id", "run_id").collect()
    val nEvents = graft.io.Tables.events(spark, sf).count()
    assert(rows.map(_.getAs[Long]("run_len")).sum == nEvents)
    rows.groupBy(_.getAs[Long]("user_id")).foreach { case (u, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("run_id"))
      // run ids are 1..k dense, types change between consecutive runs,
      // and time spans are ordered and non-overlapping
      assert(sorted.map(_.getAs[Long]("run_id")).toSeq ==
        (1L to sorted.length))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[String]("event_type") != b.getAs[String]("event_type"),
            s"user $u: consecutive runs share a type")
          assert(a.getAs[Long]("ts_end") <= b.getAs[Long]("ts_start"))
        case _ =>
      }
    }
  }
}
