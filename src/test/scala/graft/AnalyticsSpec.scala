package graft

import graft.graph.PageRank
import graft.ops.{Cohort, Merge, Profile}
import graft.sketch.CountMin
import graft.text.Fuzzy

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unit semantics for the round-6 analytics operators (cohort retention,
  * fuzzy matching, count-min, PageRank, merge/upsert). Cross-engine
  * correctness is the q46–q49/q100 oracle gate; these pin the hand-
  * checkable algebra on tiny frames. */
class AnalyticsSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._

  private val DAY = 86400000000000L // ns

  test("cohort retention: two cohorts, hand-computed triangle") {
    // u1 first at day 0, active days 0 and 8 (offsets 0, 1);
    // u2 first at day 1 (same week), active day 1 only;
    // u3 first at day 7 (week 1), active days 7 and 21 (offsets 0, 2).
    val ev = Seq((1L, 0L), (1L, 8L), (2L, 1L), (3L, 7L), (3L, 21L))
      .map { case (u, d) => (u, d * DAY) }.toDF("user_id", "ts")
    val got = Cohort.retention(ev, "user_id", "ts")
      .orderBy("cohort_week", "week_offset")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((0L, 0L, 2L), (0L, 1L, 1L), (1L, 0L, 1L), (1L, 2L, 1L)))
  }

  test("fuzzy pairs: same-block near names match, cross-block never joins") {
    val df = Seq("red bolt", "red bolt", "rod bolt", "red ring", "rad ring")
      .toDF("nm")
    val got = Fuzzy.nearNamePairs(df, "nm", maxDist = 2)
      .select("name_a", "name_b", "dist", "n_rows_a", "n_rows_b")
      .as[(String, String, Long, Long, Long)].collect().toSet
    // "red bolt"–"rod bolt" dist 1 (block bolt, dup count carried);
    // "rad ring"–"red ring" dist 1 (block ring);
    // bolt×ring pairs are blocked apart even though lev("red bolt","red ring")=4.
    assert(got == Set(("red bolt", "rod bolt", 1L, 2L, 1L),
      ("rad ring", "red ring", 1L, 1L, 1L)))
  }

  test("count-min: estimates dominate true counts; no-collision keys exact") {
    val df = (Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq("c")).toDF("k0")
    val got = CountMin.estimates(df, col("k0"), depth = 4, width = 64)
      .as[(String, Long, Long)].collect()
      .map { case (k, c, e) => k -> ((c, e)) }.toMap
    assert(got.keySet == Set("a", "b", "c"))
    got.values.foreach { case (c, e) => assert(e >= c) }
    // 3 keys in 64 buckets × 4 rows: some row separates every pair, so
    // the min-cell estimate is exact here.
    assert(got("a") == ((5L, 5L)) && got("b") == ((3L, 3L))
      && got("c") == ((1L, 1L)))
  }

  test("pagerank: symmetric star — hub outranks leaves, mass sums to 1") {
    // Star: hub h <-> leaves l1..l4 (symmetrized by the caller).
    val one = Seq.tabulate(4)(i => ("h", s"l$i")).toDF("src", "dst")
    val edges = one.union(one.select(col("dst"), col("src")))
    val r = PageRank.pageRank(edges, iters = 3, damping = 0.85)
      .as[(String, Double)].collect().toMap
    assert(r.size == 5)
    assert(math.abs(r.values.sum - 1.0) < 1e-9) // no dangling leakage
    assert(r("h") > r("l0"))
    // Leaves are symmetric: identical ranks.
    assert((0 to 3).map(i => r(s"l$i")).distinct.size == 1)
    // Hand value: leaves alternate 0.15/5 + 0.85·(r_h/4) with
    // r_h = 0.15/5 + 0.85·Σ r_l; after 3 iters hub = 0.03 + 0.85·(4·l2).
    val h1 = 0.15 / 5 + 0.85 * (4 * (1.0 / 5))
    val l2 = 0.15 / 5 + 0.85 * (h1 / 4)
    val h3 = 0.15 / 5 + 0.85 * (4 * l2)
    assert(math.abs(r("h") - h3) < 1e-12)
  }

  test("pagerank: determinism across runs") {
    val one = Seq(("a", "b"), ("b", "c"), ("c", "a")).toDF("src", "dst")
    val edges = one.union(one.select(col("dst"), col("src")))
    val a = PageRank.pageRank(edges, 4, 0.85).as[(String, Double)].collect().toMap
    val b = PageRank.pageRank(edges, 4, 0.85).as[(String, Double)].collect().toMap
    assert(a == b)
  }

  test("personalized pagerank: mass stays in the seed component; all-seeds == uniform") {
    // Two disconnected symmetric components: {a,b} and {c,d}; seed = a.
    val one = Seq(("a", "b"), ("c", "d")).toDF("src", "dst")
    val edges = one.union(one.select(col("dst"), col("src")))
    val seeds = Seq("a").toDF("node")
    // Even iteration count: on the bipartite 2-cycle the mass oscillates
    // between the endpoints, returning toward the seed on even rounds.
    val r = PageRank.personalizedPageRank(edges, seeds, iters = 4,
        damping = 0.85)
      .select("node", "r").as[(String, Double)].collect().toMap
    // The walk can't reach the other component — exact zeros there.
    assert(r("c") == 0.0 && r("d") == 0.0)
    assert(r("a") > r("b") && r("b") > 0.0)
    assert(math.abs(r("a") + r("b") - 1.0) < 1e-9) // mass conserved
    // Seeding EVERY node degenerates to the uniform teleport — bit-equal
    // to plain PageRank on the same graph.
    val all = Seq("a", "b", "c", "d").toDF("node")
    val ppr = PageRank.personalizedPageRank(edges, all, 3, 0.85)
      .select("node", "r").as[(String, Double)].collect().toMap
    val pr = PageRank.pageRank(edges, 3, 0.85)
      .as[(String, Double)].collect().toMap
    assert(ppr == pr)
  }

  test("personalized pagerank ignores seeds absent from the graph") {
    val one = Seq(("a", "b")).toDF("src", "dst")
    val edges = one.union(one.select(col("dst"), col("src")))
    val r = PageRank.personalizedPageRank(edges,
        Seq("a", "zz").toDF("node"), iters = 2, damping = 0.85)
      .select("node", "is_seed").as[(String, Boolean)].collect().toMap
    assert(r == Map("a" -> true, "b" -> false)) // no 'zz' node appears
  }

  test("weighted pagerank: unit weights degenerate bit-exactly to plain pagerank") {
    val one = Seq.tabulate(4)(i => ("h", s"l$i")).toDF("src", "dst")
    val edges = one.union(one.select(col("dst"), col("src")))
    val weighted = edges.withColumn("w", lit(1L))
    val a = PageRank.pageRank(edges, 3, 0.85)
      .as[(String, Double)].collect().toMap
    val b = PageRank.weightedPageRank(weighted, 3, 0.85)
      .as[(String, Double)].collect().toMap
    assert(a == b)
  }

  test("weighted pagerank: heavier edges pull proportionally more mass") {
    val one = Seq(("h", "a", 9L), ("h", "b", 1L)).toDF("src", "dst", "w")
    val edges = one.union(one.select(col("dst"), col("src"), col("w")))
    val r = PageRank.weightedPageRank(edges, 2, 0.85)
      .as[(String, Double)].collect().toMap
    // The hub splits its out-mass 9:1 every iteration.
    assert(r("a") > r("b"))
    assert(math.abs(r.values.sum - 1.0) < 1e-9) // mass conserved
  }

  test("lpa: two bridged 4-cliques resolve to two stable communities") {
    def clique(p: String) = for {
      i <- 0 until 4; j <- 0 until 4 if i != j
    } yield (s"$p$i", s"$p$j")
    val edges = (clique("a") ++ clique("b") ++
      Seq(("a0", "b0"), ("b0", "a0"))).toDF("src", "dst")
    val comm = graft.graph.LabelProp.communities(edges, rounds = 3)
      .as[(String, String)].collect().toMap
    assert((0 until 4).forall(i => comm(s"a$i") == "a0"))
    assert((0 until 4).forall(i => comm(s"b$i") == "b0"))
  }

  test("lpa: the self-vote kills bipartite star oscillation") {
    val one = Seq.tabulate(4)(i => ("h", s"l$i")).toDF("src", "dst")
    val edges = one.union(one.select(col("dst"), col("src")))
    // Without the self-vote a star flips hub<->leaf labels every round;
    // with it every node settles on 'h' by round 2 and stays there.
    val c3 = graft.graph.LabelProp.communities(edges, 3)
      .as[(String, String)].collect().toMap
    val c4 = graft.graph.LabelProp.communities(edges, 4)
      .as[(String, String)].collect().toMap
    assert(c3.values.toSet == Set("h") && c3 == c4)
  }

  test("q208 adamic-adar matches an exact in-memory recomputation") {
    val out = graft.queries.AnalyticsQueries
      .queries("q208_adamic_adar")(spark, GraftSpark.sf)
      .as[(String, String, Long, Double)].collect().toSeq
    assert(out.nonEmpty && out.forall { case (s1, s2, n, sc) =>
      s1 < s2 && n >= 1 && sc > 0 })
    // Exact recomputation from the collected bipartite graph with the
    // same per-customer quantized weights.
    val cs = graft.queries.SharedFrames
      .coPurchaseEdges(spark, GraftSpark.sf)
      .filter(col("src").startsWith("c"))
      .select("src", "dst").as[(String, String)].collect()
    val bySupplier = cs.groupBy(_._1).view
      .mapValues(_.map(_._2).sorted).toMap
    val expect = scala.collection.mutable.Map
      .empty[(String, String), (Long, BigDecimal)]
    bySupplier.values.filter(_.length >= 2).foreach { ss =>
      val w = BigDecimal(
        math.floor(1.0 / math.log(ss.length.toDouble) * 1e6 + 0.5) / 1e6)
      for (i <- ss.indices; j <- i + 1 until ss.length) {
        val k = (ss(i), ss(j))
        val (n0, s0) = expect.getOrElse(k, (0L, BigDecimal(0)))
        expect(k) = (n0 + 1, s0 + w)
      }
    }
    val top = expect.toSeq
      .sortBy { case ((a, b), (_, s)) => (-s, a, b) }.take(25)
      // engine output is the decOut double of the exact 6dp sum
      .map { case ((a, b), (n, s)) =>
        (a, b, n, math.floor(s.toDouble * 1e6 + 0.5) / 1e6) }
    assert(out == top)
  }

  test("profile: null/distinct/min-max per column from one pass") {
    val df = Seq((1L, Some("a")), (2L, Some("b")), (3L, None: Option[String]),
      (3L, Some("b"))).toDF("id", "s")
    val got = Profile.profile(df, Seq("id", "s"))
      .as[(String, Long, Long, Long, Option[String], Option[String])]
      .collect().map(r => r._1 -> r).toMap
    assert(got("id") == (("id", 4L, 0L, 3L, Some("1"), Some("3"))))
    // n_distinct excludes the NULL; min/max skip it too.
    assert(got("s") == (("s", 4L, 1L, 2L, Some("a"), Some("b"))))
  }

  test("merge upsert: insert/update/unchanged/retain classified null-safely") {
    val base = Seq((1L, Some("x"), 10.0), (2L, Some("y"), 20.0),
      (3L, Some("z"), 30.0), (4L, None: Option[String], 40.0))
      .toDF("id", "nm", "bal")
    val upd = Seq((2L, Some("y"), 20.0), (3L, Some("z"), 31.0),
      (4L, Some("w"), 40.0), (5L, Some("n"), 50.0))
      .toDF("id", "nm", "bal")
    val got = Merge.mergeUpsert(base, upd, "id", Seq("nm", "bal"))
      .select("id", "nm", "bal", "action")
      .as[(Long, Option[String], Double, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, Some("x"), 10.0, "retain")))
    assert(got(2L) == ((2L, Some("y"), 20.0, "unchanged")))
    assert(got(3L) == ((3L, Some("z"), 31.0, "update")))
    // NULL -> value must classify as update, not unchanged (null-safe <=>).
    assert(got(4L) == ((4L, Some("w"), 40.0, "update")))
    assert(got(5L) == ((5L, Some("n"), 50.0, "insert")))
    assert(got.size == 5)
  }

  test("incremental MV: merged partials equal the from-scratch aggregate") {
    val rows = Seq(("a", 1L, 10.0), ("a", 2L, 20.0), ("a", 3L, 5.0),
      ("b", 4L, 7.0), ("b", 5L, 9.0), ("c", 6L, 1.0))
      .toDF("k", "id", "x")
    val full = graft.ops.Incremental.partials(rows, Seq("k"), col("x"))
    val merged = graft.ops.Incremental.merge(Seq(
      graft.ops.Incremental.partials(rows.filter(col("id") % 2 === 0),
        Seq("k"), col("x")),
      graft.ops.Incremental.partials(rows.filter(col("id") % 2 =!= 0),
        Seq("k"), col("x"))), Seq("k"))
    def shape(df: org.apache.spark.sql.DataFrame) = df
      .select(col("k"), col("n"), col("s").cast("double"),
        col("mn").cast("double"), col("mx").cast("double"))
      .as[(String, Long, Double, Double, Double)].collect().toSet
    assert(shape(merged) == shape(full))
    assert(shape(full) == Set(("a", 3L, 35.0, 5.0, 20.0),
      ("b", 2L, 16.0, 7.0, 9.0), ("c", 1L, 1.0, 1.0, 1.0)))
  }

  test("triangles: diamond graph (K4 minus ad), each triangle counted once") {
    // Edges ab, ac, bc, bd, cd -> triangles abc and bcd; a,d in 1 each,
    // b,c in 2 each. Duplicate + reversed + self edges must not matter.
    val edges = Seq(("a", "b"), ("a", "c"), ("b", "c"), ("b", "d"),
      ("c", "d"), ("c", "b"), ("a", "b"), ("a", "a"))
      .toDF("src", "dst")
    val got = graft.graph.Triangles.triangleCounts(edges)
      .as[(String, Long)].collect().toMap
    assert(got == Map("a" -> 1L, "b" -> 2L, "c" -> 2L, "d" -> 1L))
  }

  test("scd type 2: runs collapse, intervals chain, last is current") {
    val log = Seq((1L, "A", 10L, 1L), (1L, "A", 20L, 2L), (1L, "B", 30L, 3L),
      (1L, "A", 50L, 4L), (2L, "X", 5L, 5L))
      .toDF("user", "v", "t", "id")
    val got = graft.ops.Scd.type2(log, "user", "v", "t", "id")
      .select("user", "v", "valid_from", "valid_to", "is_current")
      .as[(Long, String, Long, Option[Long], Boolean)].collect().toSet
    assert(got == Set(
      (1L, "A", 10L, Some(30L), false),
      (1L, "B", 30L, Some(50L), false),
      (1L, "A", 50L, None, true),
      (2L, "X", 5L, None, true)))
  }

  test("gap fill: grid densifies, zeros fill, last observation carries") {
    val pts = Seq(("k", 10L, 7.0), ("k", 13L, 3.0), ("j", 5L, 1.0))
      .toDF("key", "day", "v")
    val got = graft.ops.TimeSeries.gapFillDaily(pts, "key", "day", "v")
      .select("key", "day", "v", "v_ffill", "is_gap")
      .as[(String, Long, Double, Double, Boolean)].collect().toSet
    assert(got == Set(
      ("k", 10L, 7.0, 7.0, false), ("k", 11L, 0.0, 7.0, true),
      ("k", 12L, 0.0, 7.0, true), ("k", 13L, 3.0, 3.0, false),
      ("j", 5L, 1.0, 1.0, false)))
  }

  test("sweep concurrency: carries across days, ends before starts on ties") {
    val D = 86400000000000L
    // Day 0: [1,2] and [2,5] — end-before-start at t=2, so peak 1, until
    // [4,D+3] overlaps [2,5] -> peak 2. Day 1 opens at concurrency 1
    // (the spanning interval) and only ENDS it: peak must be the carried
    // opening level 1, not 0.
    val iv = Seq((1L, 2L), (2L, 5L), (4L, D + 3L))
      .toDF("st", "en")
    val got = graft.ops.Sweep.dailyConcurrency(iv, "st", "en")
      .orderBy("day")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((0L, 2L, 5L), (1L, 1L, 1L)))
  }

  test("z-order buckets are aligned 2-D tiles: tight in BOTH dimensions") {
    // Dense 256x256 grid, 8-bit interleave, 64 buckets -> every bucket
    // must be an exact 32x32 tile (span 31 in x AND y, 1024 rows). A
    // single-key sort into 64 buckets would leave the other dimension
    // spanning the full 0..255.
    val grid = spark.range(256).select(col("id").as("x"))
      .crossJoin(spark.range(256).select(col("id").as("y")))
    val stats = graft.ops.ZOrder.bucketStats(grid, "x", "y",
        bits = 8, buckets = 64)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(stats.length == 64)
    stats.foreach { case (b, n, mnx, mxx, mny, mxy) =>
      assert(n == 1024L, s"bucket $b: $n rows")
      assert(mxx - mnx == 31L && mxy - mny == 31L,
        s"bucket $b spans: x ${mxx - mnx}, y ${mxy - mny}")
    }
  }

  test("corr matrix: perfect/anti/zero correlations on a hand frame") {
    val df = Seq((1.0, 2.0, -1.0, 5.0), (2.0, 4.0, -2.0, 5.0),
      (3.0, 6.0, -3.0, 5.0)).toDF("a", "b", "c", "d")
    val got = graft.ops.Profile.corrMatrix(df, Seq("a", "b", "c"))
      .as[(String, String, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got(("a", "b")) == 1.0)   // b = 2a
    assert(got(("a", "c")) == -1.0)  // c = -a
    assert(got.size == 3)
  }

  test("psi drift: identical slices score ~0, a shifted bin scores > 0") {
    // Same counts in both periods -> smoothed p == q -> every term 0.
    val same = Seq(("a", 0L), ("a", 1L), ("b", 0L), ("b", 1L))
      .toDF("period", "bin")
    val z = graft.ops.Drift.psiByBin(same, col("period"), col("bin"))
      .as[(Long, Long, Long, Double)].collect()
    assert(z.forall(_._4 == 0.0), z.mkString(","))
    // All of period b mass moved to bin 1 -> both bins contribute > 0.
    val moved = Seq(("a", 0L), ("a", 0L), ("b", 1L), ("b", 1L))
      .toDF("period", "bin")
    val m = graft.ops.Drift.psiByBin(moved, col("period"), col("bin"))
      .as[(Long, Long, Long, Double)].collect()
    assert(m.forall(_._4 > 0.0), m.mkString(","))
  }

  test("skyline: hand frontier, in-group dominance, exact ties both kept") {
    val pts = Seq((1L, 1.0, 5L), (2L, 2.0, 4L), (3L, 3.0, 3L),
      (4L, 2.0, 2L),  // dominated within a-group by (2.0, 4)
      (5L, 3.0, 1L),  // dominated by (3.0, 3)
      (6L, 1.0, 5L),  // exact tie of id 1 — mutually non-dominating
      (7L, 0.5, 4L))  // dominated by (2.0, 4)
      .toDF("id", "a", "b")
    val got = graft.ops.Skyline.frontier2D(pts, "a", "b", buckets = 4)
      .select("id").as[Long].collect().toSet
    assert(got == Set(1L, 2L, 3L, 6L))
  }

  test("next-event rows: prev-type features, integer dwell, first row dropped") {
    val S = 1000000000L
    val ev = Seq((1L, 10 * S, 7L, "view"), (2L, 25 * S, 7L, "click"),
      (3L, 40 * S, 7L, "purchase"), (9L, 5 * S, 8L, "view"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val got = graft.ops.Features.nextEventRows(ev, "user_id", "ts",
        "event_id", "event_type")
      .select("user_id", "event_id", "seq_n", "prev_type", "dwell_s", "label")
      .as[(Long, Long, Int, String, Long, String)].collect().toSet
    assert(got == Set(
      (7L, 2L, 2, "view", 15L, "click"),
      (7L, 3L, 3, "click", 15L, "purchase")))
  }

  test("z-score outliers: hand-computed grouped score, rounded threshold") {
    val df = Seq(("g", 1L, 10.0), ("g", 2L, 10.0), ("g", 3L, 10.0),
      ("g", 4L, 10.0), ("g", 5L, 110.0), ("h", 6L, 1.0), ("h", 7L, 2.0))
      .toDF("grp", "id", "x")
    val got = graft.ops.Outliers.zscoreOutliers(df, Seq(col("grp")),
        col("x"), 1.5)
      .select("id", "z").as[(Long, Double)].collect().toSeq
    // mean 30, sd_samp sqrt(2000) -> z = 80/44.72136 = 1.7888544
    assert(got == Seq((5L, 1.788854)))
  }

  test("q222 DiD is the double difference of its own cell means") {
    val r = graft.queries.Registry.all("q222_diff_in_diffs")(spark, GraftSpark.sf)
      .collect().head
    val (tp, tq) = (r.getAs[Double]("treated_pre"),
      r.getAs[Double]("treated_post"))
    val (cp, cq) = (r.getAs[Double]("control_pre"),
      r.getAs[Double]("control_post"))
    val did = r.getAs[Double]("did")
    assert(did == math.floor(((tq - tp) - (cq - cp)) * 1e6 + 0.5) / 1e6)
    // the four cells partition the stream
    assert(r.getAs[Long]("n_treated") + r.getAs[Long]("n_control") ==
      graft.io.Tables.events(spark, GraftSpark.sf).count())
  }

  test("q226 replay: policy is the train argmax and the match subset is sane") {
    val rows = graft.queries.Registry.all("q226_bandit_replay")(
      spark, GraftSpark.sf).collect()
    assert(rows.length == 4) // one policy row per segment
    rows.foreach { r =>
      assert(r.getAs[Long]("n_matched") <= r.getAs[Long]("n_eval"))
      assert(r.getAs[Long]("n_matched") > 0)
      val rate = r.getAs[Double]("match_rate")
      assert(rate > 0.0 && rate < 1.0)
    }
    // recompute each segment's argmax on the train half independently
    val cutNs = 1705363200000000000L
    val train = graft.io.Tables.events(spark, GraftSpark.sf)
      .filter(col("ts") < cutNs)
      .select((col("user_id") % 4).as("segment"), col("event_type"),
        col("value").cast(org.apache.spark.sql.types.DecimalType(7, 2))
          .as("r"))
      .groupBy("segment", "event_type")
      .agg((sum("r").cast("double") / count(lit(1))).as("m"))
      .collect()
      .groupBy(_.getAs[Long]("segment"))
      .map { case (s, rs) =>
        s -> rs.maxBy(r => (r.getAs[Double]("m"),
          // maxBy wants ascending preference; invert the name for ties
          r.getAs[String]("event_type")))(
          Ordering.Tuple2(Ordering.Double.TotalOrdering,
            Ordering.String.reverse))
      }
    rows.foreach { r =>
      val seg = r.getAs[Long]("segment")
      assert(r.getAs[String]("chosen_action") ==
        train(seg).getAs[String]("event_type"),
        s"segment $seg argmax mismatch")
    }
  }

  test("q233 QTE deciles are complete and the effect is the quantized difference") {
    val rows = graft.queries.Registry.all("q233_quantile_effect")(
      spark, GraftSpark.sf).collect()
    assert(rows.map(_.getAs[Int]("pctl")).toSeq == (1 to 9).map(_ * 10))
    rows.foreach { r =>
      val want = math.floor((r.getAs[Double]("treated_q") -
        r.getAs[Double]("control_q")) * 1e6 + 0.5) / 1e6
      assert(r.getAs[Double]("qte") == want)
    }
    // each cohort's quantile curve is monotone in the decile
    Seq("treated_q", "control_q").foreach { c =>
      val v = rows.sortBy(_.getAs[Int]("pctl")).map(_.getAs[Double](c)).toSeq
      assert(v == v.sorted, s"$c not monotone")
    }
  }

  test("q231 LTV: cumulative revenue telescopes and divides by the fixed cohort size") {
    val rows = graft.queries.Registry.all("q231_cohort_ltv")(
      spark, GraftSpark.sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("cohort_week")).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("week_offset"))
      // one denominator per cohort; cum_rev is the prefix sum of wk_rev
      assert(sorted.map(_.getAs[Long]("n_users")).distinct.length == 1)
      var cum = BigDecimal(0)
      def d2(x: Double) =
        BigDecimal(x).setScale(2, BigDecimal.RoundingMode.HALF_UP)
      sorted.foreach { r =>
        cum += d2(r.getAs[Double]("wk_rev"))
        assert(d2(r.getAs[Double]("cum_rev")) == cum)
        val want = math.floor(cum.toDouble / r.getAs[Long]("n_users")
          * 1e6 + 0.5) / 1e6
        assert(r.getAs[Double]("ltv_per_user") == want)
      }
    }
  }
}
