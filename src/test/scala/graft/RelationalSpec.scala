package graft

import graft.functions.HashUtil
import graft.ops.Relational._
import graft.queries.RelationalQueries

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RelationalSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._
  val sf = GraftSpark.sf

  test("md5_63 matches DuckDB md5_number_lower & Long.MaxValue") {
    // Constants cross-checked against DuckDB 1.0:
    //   select md5_number_lower(s) & 9223372036854775807
    assert(HashUtil.md5Lower63("abc") == 8250560606382298838L)
    assert(HashUtil.md5Lower63("""{"k": 87}""") == 2552075499855540706L)
    assert(HashUtil.md5Lower63("0:42") == 7669701293610444416L)
    // duckdb md5_number_lower('hello world') = 14109032780988074899 (unsigned);
    // & Long.MaxValue = 14109032780988074899 - 2^63 = 4885660744133299091
    assert(HashUtil.md5Lower63("hello world") == 4885660744133299091L)
  }

  test("chronoSplit: 5 rows → splits 0,1,2,3,4 (partition.py:32-35 edges)") {
    val df = Seq((1, 10L, 1L), (1, 20L, 2L), (1, 30L, 3L), (1, 40L, 4L), (1, 50L, 5L))
      .toDF("user_id", "ts", "event_id")
    val got = chronoSplit(df, "user_id", "ts", "event_id")
      .orderBy("ts").select("split").as[Int].collect().toSeq
    assert(got == Seq(0, 1, 2, 3, 4))
  }

  test("chronoSplit: ties broken deterministically by tiebreak column") {
    val df = Seq((1, 10L, 2L), (1, 10L, 1L), (1, 10L, 3L), (1, 10L, 4L), (1, 10L, 5L))
      .toDF("user_id", "ts", "event_id")
    val got = chronoSplit(df, "user_id", "ts", "event_id")
      .orderBy("event_id").select("split").as[Int].collect().toSeq
    assert(got == Seq(0, 1, 2, 3, 4))
  }

  test("biasedTopK: score = sum/(count+bias), tiebreak on key") {
    val df = Seq((1, 100.0), (1, 100.0), (2, 150.0), (3, 150.0))
      .toDF("item", "v")
    val got = biasedTopK(df, "item", "v", bias = 1000.0, k = 2)
      .select("item", "score").as[(Int, Double)].collect().toSeq
    // item1: 200/1002; item2: 150/1001; item3: 150/1001 → tie → item2 first
    assert(got.head == (1, 200.0 / 1002))
    assert(got(1) == (2, 150.0 / 1001))
  }

  test("removeSeen: anti-join removes exactly the seen pairs") {
    val cand = Seq((1, 1), (1, 2), (2, 1)).toDF("u", "i")
    val seen = Seq((1, 1)).toDF("u", "i")
    val got = removeSeen(cand, seen, Seq("u", "i"))
      .orderBy("u", "i").as[(Int, Int)].collect().toSeq
    assert(got == Seq((1, 2), (2, 1)))
  }

  test("perKeyTopK: ascending-item quirk (SURVEY §2.5 W2)") {
    val df = Seq((1, 5), (1, 2), (1, 9)).toDF("u", "i")
    val got = perKeyTopK(df, "u", Seq(col("i")), k = 2)
      .orderBy("rank").select("i").as[Int].collect().toSeq
    assert(got == Seq(2, 5))
  }

  test("withRowIndex: stable 1..n index independent of partition layout (O5)") {
    val df = Seq(30, 10, 20).toDF("v")
    val a = withRowIndex(df, Seq(col("v"))).orderBy("v")
      .select("v", "row_idx").as[(Int, Long)].collect().toSeq
    val b = withRowIndex(df.repartition(5), Seq(col("v"))).orderBy("v")
      .select("v", "row_idx").as[(Int, Long)].collect().toSeq
    assert(a == Seq((10, 1L), (20, 2L), (30, 3L)))
    assert(a == b)
  }

  test("filterActive keeps only rows of keys with >= minCount") {
    val df = Seq((1, "a"), (1, "b"), (2, "c")).toDF("k", "v")
    assert(filterActive(df, "k", 2).count() == 2)
  }

  test("all relational queries return rows on sf0.001") {
    RelationalQueries.queries.foreach { case (name, q) =>
      assert(q(spark, sf).count() > 0, s"$name returned 0 rows")
    }
  }

  test("pivot fill path: missing (user, type) combos become 0, not null") {
    // The driver fixtures are dense (every user has every event type), so
    // this exercises the branch the oracle data never reaches.
    val df = Seq((1L, "click"), (1L, "view"), (2L, "click"))
      .toDF("user_id", "event_type")
    val got = df.groupBy("user_id")
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .count()
      .na.fill(0L, Seq("click", "error", "purchase", "signup", "view"))
      .orderBy("user_id")
      .collect()
    assert(got(0).getAs[Long]("error") == 0L)
    assert(got(1).getAs[Long]("view") == 0L)
    assert(got(0).getAs[Long]("click") == 1L)
  }

  test("q16 approx distinct within 2% of exact") {
    val approx = RelationalQueries.q16(spark, sf).collect()
      .map(r => r.getAs[String]("l_returnflag") -> r.getAs[Long]("approx_parts")).toMap
    val exact = graft.io.Tables.lineitem(spark, sf)
      .groupBy("l_returnflag").agg(countDistinct("l_partkey").as("n"))
      .collect().map(r => r.getAs[String]("l_returnflag") -> r.getAs[Long]("n")).toMap
    exact.foreach { case (k, n) =>
      assert(math.abs(approx(k) - n).toDouble / n < 0.05, s"$k: ${approx(k)} vs $n")
    }
  }

  test("q01 pricing summary: groups and exact count") {
    val rows = RelationalQueries.q01(spark, sf).collect()
    assert(rows.length == 6)
    assert(rows.map(_.getAs[Long]("count_order")).sum == 6000L)
  }

  test("q05 output disjoint from seen pairs") {
    val topk = RelationalQueries.q05(spark, sf).select("user_id", "item_id")
    val seen = graft.io.Tables.ratings(spark, sf)
      .select("user_id", "item_id").distinct()
    assert(topk.join(seen, Seq("user_id", "item_id"), "left_semi").count() == 0)
  }

  test("percentile interpolates at p·(n−1): values 1..5 → p50=3, p90=4.6") {
    val got = Seq(1.0, 2.0, 3.0, 4.0, 5.0).toDF("v")
      .agg(expr("percentile(v, 0.5D)").as("p50"),
        expr("percentile(v, 0.9D)").as("p90"))
      .collect().head
    assert(got.getAs[Double]("p50") == 3.0)
    assert(math.abs(got.getAs[Double]("p90") - 4.6) < 1e-9)
  }

  test("q78 exact percentiles bound approx_percentile (the 100 TB variant)") {
    // approx_percentile (KLL-class sketch, accuracy 10000) must land
    // inside the exact p±0.01 quantile band — the fixed-space mergeable
    // sketch is what replaces the per-group sort at scale, and this is
    // its accuracy contract against q78's exact definition.
    val both = graft.io.Tables.events(spark, sf)
      .groupBy("event_type")
      .agg(
        expr("approx_percentile(value, 0.5D, 10000)").as("a50"),
        expr("percentile(value, 0.49D)").as("lo"),
        expr("percentile(value, 0.51D)").as("hi"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      val (a, lo, hi) = (r.getAs[Double]("a50"), r.getAs[Double]("lo"),
        r.getAs[Double]("hi"))
      assert(a >= lo && a <= hi, s"${r.getAs[String]("event_type")}: $a ∉ [$lo,$hi]")
    }
  }

  test("q79 cube lattice: 4 granularities, marginals re-sum to the total") {
    val rows = RelationalQueries.q79(spark, sf).collect()
    val byGid = rows.groupBy(_.getAs[Long]("gid"))
    assert(byGid.keySet == Set(0L, 1L, 2L, 3L))
    val total = byGid(3L).head.getAs[Long]("n") // grand total row
    // every marginal level re-aggregates to the same grand total
    for (g <- Seq(0L, 1L, 2L))
      assert(byGid(g).map(_.getAs[Long]("n")).sum == total, s"gid=$g")
    // gid bit layout: gid=1 aggregates OUT linestatus (last key = LSB)
    assert(byGid(1L).forall(r => r.isNullAt(r.fieldIndex("l_linestatus")) &&
      !r.isNullAt(r.fieldIndex("l_returnflag"))))
  }

  test("funnel: strictly-after chaining, dropouts null, non-entrants absent") {
    val ev = Seq(
      (1L, "view", 10L), (1L, "click", 5L), (1L, "click", 20L),
      (1L, "purchase", 15L), (1L, "purchase", 30L),
      (2L, "view", 10L),                    // entered, never clicked
      (3L, "click", 5L))                    // never viewed → not in funnel
      .toDF("user_id", "event_type", "ts")
    val got = funnel(ev, "user_id", "event_type", "ts",
      Seq("view", "click", "purchase"))
      .collect().map(r => r.getAs[Long]("user_id") ->
        ((Option(r.get(r.fieldIndex("t0"))), Option(r.get(r.fieldIndex("t1"))),
          Option(r.get(r.fieldIndex("t2")))))).toMap
    // user 1: click@5 precedes the first view, purchase@15 precedes the
    // first qualifying click — both must be skipped by the strict chain
    assert(got(1L) == ((Some(10L), Some(20L), Some(30L))))
    assert(got(2L) == ((Some(10L), None, None)))
    assert(!got.contains(3L))
  }

  test("q87 winsorize: outputs stay in-band and ~2% of each group clips") {
    val rows = RelationalQueries.q87(spark, sf).collect()
    val byType = rows.groupBy(_.getAs[String]("event_type"))
    byType.foreach { case (t, rs) =>
      val clipped = rs.count(_.getAs[Long]("clipped") == 1L)
      // 2% of the mass lies outside [p1, p99] by definition (continuous
      // values, no ties at the band edges in this synthetic data)
      assert(math.abs(clipped.toDouble / rs.length - 0.02) < 0.015,
        s"$t: $clipped/${rs.length} clipped")
      // every clipped value moved; every unclipped value is unchanged
      rs.foreach { r =>
        val moved = r.getAs[Double]("v") != r.getAs[Double]("v_clipped")
        assert(moved == (r.getAs[Long]("clipped") == 1L))
      }
    }
  }

  test("q88 histogram partitions every event into exactly one bin") {
    val rows = RelationalQueries.q88(spark, sf).collect()
    val events = graft.io.Tables.events(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n")).sum == events)
    // bin arithmetic: all values in [0.01, 500) → bins within [0, 50)
    assert(rows.forall(r => r.getAs[Long]("bin") >= 0 && r.getAs[Long]("bin") < 50))
  }

  test("q83 hop windows: every event lands in exactly w/h = 2 windows") {
    val rows = RelationalQueries.q83(spark, sf).collect()
    val events = graft.io.Tables.events(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n")).sum == 2 * events)
    // starts are hop-aligned epoch seconds
    assert(rows.forall(_.getAs[Long]("win_s") % 1800 == 0))
  }
}
