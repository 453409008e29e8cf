package graft.queries

import graft.graph.{Bfs, KCore, PageRank, Triangles}
import graft.io.Tables
import graft.ops.{Cohort, Drift, Features, Incremental, Merge, Outliers, Profile, Scd, Skyline, Sweep, TimeSeries, ZOrder}
import graft.sketch.CountMin
import graft.text.Fuzzy
import graft.functions.GraftFunctions.{decOut, qdec, qdecWide, qdecWideSql, qround}

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Warehouse-analytics surface added in round 6: cohort retention, blocked
  * fuzzy (edit-distance) matching, count-min-sketch frequency estimation,
  * fixed-iteration PageRank, and CDC merge/upsert. Every query is
  * oracle-gated; determinism follows the repo rules (integer time
  * arithmetic, engine-shared md5 hashing, 6-decimal rounding only where a
  * distributed double sum is inherent — q49's rank).
  */
object AnalyticsQueries {
  type Q = (SparkSession, String) => DataFrame

  private val H = "9223372036854775807"

  /** q208's hub-customer degree cap (VERDICT r10 #2): customers with
    * more distinct suppliers than this are excluded from the wedge —
    * bounding the per-row pair array at C(cap,2) structs regardless of
    * data scale. Mirrored verbatim in the DuckDB oracle. */
  val HubDegreeCap = 256

  /** Basket-size cap for order-level pair generation (VERDICT r10 #2
    * sweep): orders with more distinct parts than this are excluded
    * from co-occurrence pair building ([[partCoEdges]] → q104/q341,
    * and q137's self-join), bounding the per-order pair fan-out at
    * C(cap,2) regardless of data scale. Mirrored verbatim in each
    * DuckDB oracle. TPC-H baskets are ≤7 lines by construction, so at
    * the gated scale factors the cap never binds — it exists for the
    * 100 TB corpus whose hub order would otherwise build a
    * |basket|²/2 array in one row (q104/q341) or 10⁹ join rows in one
    * task (q137). */
  val BasketCap = 256

  /** q46 — weekly cohort retention triangle over events (see
    * [[graft.ops.Cohort.retention]] for the shuffle budget). */
  val q46: Q = (spark, dir) =>
    Cohort.retention(Tables.events(spark, dir), "user_id", "ts")
      .orderBy("cohort_week", "week_offset")

  /** q47 — blocked fuzzy name matching over the part vocabulary (see
    * [[graft.text.Fuzzy.nearNamePairs]]): the quadratic lives on the
    * 64-name vocabulary, never on rows. */
  val q47: Q = (spark, dir) =>
    Fuzzy.nearNamePairs(Tables.part(spark, dir), "p_name", maxDist = 2)
      .withColumn("dist", col("dist").cast("long"))
      .orderBy("name_a", "name_b")

  /** q160 — Jaro–Winkler scored name pairs over the 64-name part
    * vocabulary ([[graft.functions.GraftFunctions.jaro_winkler]], the
    * codegen'd custom expression — Spark has no built-in; semantics
    * pinned to DuckDB's `jaro_winkler_similarity`). The q47 discipline:
    * the quadratic runs on the VOCABULARY (64×63/2 pairs, broadcast),
    * never on rows; scores rounded to 6dp before the threshold. */
  val q160: Q = (spark, dir) => {
    val names = Tables.part(spark, dir)
      .select(col("p_name").as("name")).distinct()
    names.select(col("name").as("name_a"))
      .join(broadcast(names.select(col("name").as("name_b"))),
        col("name_a") < col("name_b"))
      .withColumn("jw", qround(graft.functions.GraftFunctions
        .jaro_winkler(col("name_a"), col("name_b")), 6))
      .filter(col("jw") >= 0.75)
      .orderBy("name_a", "name_b")
  }

  /** q48 —count-min sketch (depth 4 × width 256) frequency estimates for
    * part keys in lineitem, top-25 by estimate. The md5-keyed hashing
    * makes the sketch bit-identical cross-engine, so the gate checks the
    * OVER-count guarantee exactly (est ≥ true, equal without collisions).
    */
  val q48: Q = (spark, dir) =>
    CountMin.estimates(Tables.lineitem(spark, dir), col("l_partkey"),
        depth = 4, width = 256)
      .select(col("k").cast("long").as("part_key"),
        col("c").as("true_count"), col("est").as("est_count"))
      .orderBy(desc("est_count"), col("part_key"))
      .limit(25)

  /** q49 — 3-iteration PageRank (d = 0.85) on the symmetrized
    * customer–supplier co-purchase graph from orders ⋈ lineitem (see
    * [[graft.graph.PageRank.pageRank]]: one shuffle round per iteration,
    * checkpointed edges). Ranks rounded to 6 decimals — the distributed
    * double sum's last ulp is summation-order-dependent (determinism
    * rule #3). */
  val q49: Q = (spark, dir) => {
    val edges = SharedFrames.coPurchaseEdges(spark, dir)
    PageRank.pageRank(edges, iters = 3, damping = 0.85)
      .select(col("node"), qround(col("r"), 6).as("rank"))
      .orderBy("node")
  }

  /** q200 — 3-iteration personalized PageRank (d = 0.85) on the q49
    * co-purchase graph, teleport mass pinned to NATION_3's customer
    * nodes ([[graft.graph.PageRank.personalizedPageRank]]): "proximity
    * to this cohort" — the seed-expansion / related-entity walk, sharing
    * q49's one-shuffle-per-iteration execution with the teleport term
    * swapped from uniform to the broadcast seed flag. Ranks rounded to
    * 6 decimals (determinism rule #3 for the distributed double sum). */
  val q200: Q = (spark, dir) => {
    val edges = SharedFrames.coPurchaseEdges(spark, dir)
    val seeds = Tables.customer(spark, dir)
      .filter(col("c_nationkey") === 3)
      .select(concat(lit("c"), col("c_custkey")).as("node"))
    PageRank.personalizedPageRank(edges, seeds, iters = 3, damping = 0.85)
      .select(col("node"), col("is_seed"), qround(col("r"), 6).as("rank"))
      .orderBy("node")
  }

  /** q100 — CDC merge/upsert of a deterministic update batch into the
    * customer table (see [[graft.ops.Merge.mergeUpsert]]): one full-outer
    * join on the unique key, output = next table version + change audit.
    * The batch bumps acctbal for custkey%10 rows, carries custkey%3 rows
    * unchanged, and inserts custkey%97 clones shifted by 1,000,000 (no
    * key collision at fixture scales). */
  val q100: Q = (spark, dir) => {
    val cols = Seq("c_custkey", "c_name", "c_acctbal", "c_mktsegment")
    val cust = Tables.customer(spark, dir).select(cols.map(col): _*)
    val mod = cust
      .filter(col("c_custkey") % 3 === 0 || col("c_custkey") % 10 === 0)
      .withColumn("c_acctbal",
        when(col("c_custkey") % 10 === 0, col("c_acctbal") + 100.0)
          .otherwise(col("c_acctbal")))
    val ins = cust.filter(col("c_custkey") % 97 === 0)
      .select((col("c_custkey") + 1000000L).as("c_custkey"),
        concat(lit("new:"), col("c_name")).as("c_name"),
        col("c_acctbal"), col("c_mktsegment"))
    Merge.mergeUpsert(cust, mod.unionByName(ins), "c_custkey",
        Seq("c_name", "c_acctbal", "c_mktsegment"))
      .orderBy("c_custkey")
  }

  /** q101 — one-pass column profiling of the customer table (see
    * [[graft.ops.Profile.profile]]): all five columns' stats from one
    * scan + one Expand-planned aggregate. `c_acctbal` is pre-cast to
    * DECIMAL(18,2) in BOTH engines so its min/max stringify identically
    * (raw double→string formatting differs cross-engine). */
  val q101: Q = (spark, dir) =>
    Profile.profile(
      Tables.customer(spark, dir).withColumn("c_acctbal",
        qdec(col("c_acctbal"), 18, 2)),
      Seq("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"))
      .orderBy("col_name")

  /** q103 — incremental materialized-view refresh (see
    * [[graft.ops.Incremental]]): the stored 30-day-period × status order
    * summary (simulated from the ⅞ "historical" keys) merged with the
    * delta partition's partials (the remaining ⅛) — algebraic merge, no
    * history re-scan. The oracle recomputes from scratch over ALL orders;
    * equality IS the MV-maintenance correctness property. */
  val q103: Q = (spark, dir) => {
    val o = Tables.orders(spark, dir).select(
      col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
      expr("cast(cast(o_orderdate as timestamp) as long) div 2592000")
        .as("period"))
    val keys = Seq("period", "o_orderstatus")
    val mv = Incremental.partials(
      o.filter(col("o_orderkey") % 8 =!= 0), keys, col("o_totalprice"))
    val delta = Incremental.partials(
      o.filter(col("o_orderkey") % 8 === 0), keys, col("o_totalprice"))
    Incremental.merge(Seq(mv, delta), keys)
      .select(col("period"), col("o_orderstatus"),
        col("n").as("n_orders"),
        col("s").cast("double").as("sum_total"),
        col("mn").cast("double").as("min_total"),
        col("mx").cast("double").as("max_total"))
      .orderBy("period", "o_orderstatus")
  }

  /** The part co-purchase edge list (parts co-ordered in ≥2 DISTINCT
    * orders; the support threshold prunes singleton co-occurrence noise
    * AND is what keeps a 100 TB co-purchase graph sparse), shared by
    * q104 (triangles) and q341 (clustering coefficient) — one build +
    * persist per session. Pair generation is collect_set + in-row pair
    * explode: ONE shuffle on the order key instead of a self-join (two
    * shuffled sides + a third for the count). Per-order fan-out is
    * k·(k−1)/2 on the basket size, HARD-bounded by [[BasketCap]]:
    * over-cap baskets are dropped before the explode (and in the q104/
    * q341 oracles' pair CTE), so the largest in-row pair array is
    * C(cap,2) structs whatever the corpus (~7 lines/order at the gated
    * SFs — the cap never binds there). The pair SET per order is
    * order-insensitive (least/greatest), so collect_set's
    * nondeterministic ordering is harmless. */
  private def partCoEdges(spark: SparkSession, dir: String): DataFrame =
    graft.util.SessionMemo.cached(spark, s"part-co-edges:$dir") {
      // r17: user-keyed repartition ahead of the basket groupBy (guide
      // §2.5 — the groupBy shuffles by l_orderkey either way; keying
      // the exchange ourselves keeps AQE's input-sized coalescing from
      // running the C(k,2) in-row pair explode on 1–2 partitions).
      // Integer counts downstream and per-order pair sets normalized by
      // least/greatest — order-safe. Probe (OptProbe q104y, 2 rounds):
      // q104 full 1.6–3.0 → 1.2–1.6 s.
      val p = spark.sparkContext.defaultParallelism
      val pairs = Tables.lineitem(spark, dir)
        .select("l_orderkey", "l_partkey")
        .repartition(p, col("l_orderkey"))
        .groupBy("l_orderkey").agg(collect_set("l_partkey").as("ps"))
        .filter(size(col("ps")).between(2, BasketCap))
        .select(explode(expr(
          """flatten(transform(ps, (x, i) ->
            |  transform(slice(ps, i + 2, size(ps)),
            |            y -> struct(least(x, y) AS src, greatest(x, y) AS dst))))"""
            .stripMargin)).as("e"))
        .select(col("e.src").as("src"), col("e.dst").as("dst"))
      pairs.groupBy("src", "dst").agg(count(lit(1)).as("w"))
        .filter(col("w") >= 2)
        .select("src", "dst")
    }

  /** q104 — per-part triangle participation in the co-purchase graph
    * ([[partCoEdges]]). Degree-oriented wedge counting — see
    * [[graft.graph.Triangles]] for why orientation bounds the fan-out. */
  val q104: Q = (spark, dir) => {
    Triangles.triangleCounts(partCoEdges(spark, dir))
      .select(col("node").cast("long").as("part_key"), col("n_triangles"))
      .orderBy(desc("n_triangles"), col("part_key"))
      .limit(25)
  }

  /** q105 — SCD Type 2 history of each user's event_type (see
    * [[graft.ops.Scd.type2]]): run-length intervals with ns-precision
    * boundaries, REPORTED at second granularity (exact in the
    * comparator's float64 path). Sort-key ties can only occur between
    * all-columns-identical rows (adjacent runs differ in value by
    * construction), so the positional compare is deterministic. */
  val q105: Q = (spark, dir) =>
    Scd.type2(Tables.events(spark, dir), "user_id", "event_type", "ts",
        "event_id")
      .select(col("user_id"), col("event_type"),
        expr("cast(valid_from as long) div 1000000000").as("valid_from_s"),
        expr("cast(valid_to as long) div 1000000000").as("valid_to_s"),
        col("is_current"))
      .orderBy(col("user_id"), col("valid_from_s"), col("event_type"),
        col("valid_to_s").asc_nulls_first)

  /** q106 — daily per-nation revenue on the dense calendar grid with
    * zero-fill and forward-fill (see [[graft.ops.TimeSeries
    * .gapFillDaily]]). Grid rows are calendar-bounded (nations × span
    * days ≈ 60k at EVERY scale factor — the op's output is invariant to
    * fact-table volume, only the observed aggregate changes). */
  val q106: Q = (spark, dir) => {
    // the memoized cross-query daily frame — q106/q121/q127 share one
    // fact scan + join ([[SharedFrames.dailyNationRevenue]])
    val pts = SharedFrames.dailyNationRevenue(spark, dir)
      .select(col("nation"), col("day"),
        col("rev").cast("double").as("revenue"))
    TimeSeries.gapFillDaily(pts, "nation", "day", "revenue")
      .select("nation", "day", "revenue", "revenue_ffill", "is_gap")
      .orderBy("nation", "day")
  }

  /** q176 — floor-clamped credit balance per user
    * ([[graft.ops.Ledger.clampedBalance]]): purchases credit, errors
    * debit, balance clamps at zero — the non-linear fold no window
    * expresses, run as the typed iterator in exact BigDecimal (zero
    * floating point; the recursive-CTE oracle matches bit-for-bit). */
  val q176: Q = (spark, dir) => {
    val ev = Tables.events(spark, dir)
      .filter(col("event_type").isin("purchase", "error"))
      .select(col("user_id"), col("ts"), col("event_id"),
        // value is a raw DOUBLE in the parquet: quantize to cents via the
        // IEEE floor-quantizer (GraftFunctions.qdec), never a raw
        // double→decimal CAST — the cast's half-boundary direction is
        // oracle-engine-release-dependent; from here the fold is exact.
        when(col("event_type") === "purchase",
          graft.functions.GraftFunctions.qdec(col("value"), 18, 2))
          .otherwise(
            negate(graft.functions.GraftFunctions.qdec(col("value"), 18, 2)))
          .as("delta"))
    graft.ops.Ledger.clampedBalance(ev, "user_id", "ts", "event_id",
        "delta")
      .orderBy("user_id")
  }

  /** q175 — bounded 3-core peeling ([[graft.graph.KCore.peelCounts]])
    * on the q49 co-purchase graph: four simultaneous-removal rounds of
    * degree-<3 nodes, per-round removal counts plus the surviving core
    * size — one grouped count + two anti-joins per round, oracle as
    * unrolled NOT-IN CTE rounds. */
  val q175: Q = (spark, dir) => {
    val edges = SharedFrames.coPurchaseEdges(spark, dir)
    KCore.peelCounts(spark, edges, k = 3, rounds = 4)
      .orderBy("peel_round")
  }

  /** q174 — rolling active users (DAU + 7-day WAU) per day: each
    * distinct (user, active-day) pair EXPLODES into the ≤7 window
    * anchors it keeps the user active for — the window-coverage trick
    * that makes rolling COUNT DISTINCT linear (7× the deduped activity
    * frame) instead of a per-day re-scan or 7-way self-join; at larger
    * windows swap the explode for HLL-sketch merges. All-integer. */
  val q174: Q = (spark, dir) => {
    val du = Tables.events(spark, dir)
      .select(col("user_id"), expr("ts div 86400000000000").as("day"))
      .distinct()
    val maxDay = du.agg(max("day").as("dmax"))
    val dau = du.groupBy("day").agg(countDistinct("user_id").as("dau"))
    val wau = du
      .select(col("user_id"),
        explode(sequence(col("day"), col("day") + 6)).as("day"))
      .distinct()
      .crossJoin(broadcast(maxDay))
      .filter(col("day") <= col("dmax"))
      .groupBy("day").agg(countDistinct("user_id").as("wau"))
    dau.join(wau, "day")
      .select("day", "dau", "wau")
      .orderBy("day")
  }

  /** q171 — linear interpolation across the q106 grid's gaps
    * ([[graft.ops.TimeSeries.linearInterpDaily]]): the trend-true fill
    * ffill misstates — each gap day sits on the straight line between
    * its surrounding observations. Same calendar-bounded grid, two
    * window passes, no extra shuffle. */
  val q171: Q = (spark, dir) => {
    val pts = SharedFrames.dailyNationRevenue(spark, dir)
      .select(col("nation"), col("day"),
        col("rev").cast("double").as("revenue"))
    TimeSeries.linearInterpDaily(pts, "nation", "day", "revenue")
      .orderBy("nation", "day")
  }

  /** q109 — per-nation customer-spend outliers at |z| ≥ 2.5 (see
    * [[graft.ops.Outliers.zscoreOutliers]]): aggregate once on the
    * customer key, score with window stats on the nation partition —
    * two exchanges total, threshold applied to the ROUNDED score on both
    * engines. */
  val q109: Q = (spark, dir) => {
    val spend = Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir),
        col("o_custkey") === col("c_custkey"))
      .join(Tables.nation(spark, dir),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("n_name").as("nation"))
      .agg(count(lit(1)).as("n_orders"),
        sum(qdec(col("o_totalprice"), 18, 2))
          .cast("double").as("spend"))
    Outliers.zscoreOutliers(spend, Seq(col("nation")), col("spend"), 2.5)
      .select("c_custkey", "nation", "n_orders", "spend", "z")
      .orderBy("c_custkey")
  }

  /** q111 — peak concurrent sessions per day via the distributed
    * sweep-line (see [[graft.ops.Sweep.dailyConcurrency]] for the
    * two-phase prefix-sum decomposition that kills the global-sort
    * bottleneck). Intervals = the q11-convention 30-minute-gap sessions;
    * the session build shares its user_id exchange across both windows
    * and the interval aggregate. */
  val q111: Q = (spark, dir) => {
    import org.apache.spark.sql.expressions.Window
    val gapNs = 30L * 60 * 1000000000L
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val intervals = Tables.events(spark, dir)
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("ns",
        when(col("prev_ts").isNull || col("ts") - col("prev_ts") > gapNs, 1L)
          .otherwise(0L))
      .withColumn("sid", sum(col("ns")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "sid")
      .agg(min(col("ts")).as("st"), max(col("ts")).as("en"))
    Sweep.dailyConcurrency(intervals, "st", "en")
      .orderBy("day")
  }

  /** q297 — daily busy-time (interval-union coverage) of the session
    * intervals ([[graft.ops.Sweep.dailyBusyTime]]): total seconds per
    * day during which AT LEAST ONE session is active, overlaps merged —
    * the utilization/SLA-uptime readout beside q111's peak concurrency
    * (same sweep events, the other classic output). Sessions are the
    * q11-convention 30-minute-gap islands; intervals clip to day
    * boundaries so every sweep is day-local (no cross-day carry), and
    * the coverage ratio is exact half-up ppm of the 86,400-second day.
    * All-integer ns arithmetic end-to-end. */
  val q297: Q = (spark, dir) => {
    import org.apache.spark.sql.expressions.Window
    val gapNs = 30L * 60 * 1000000000L
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val intervals = Tables.events(spark, dir)
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("ns",
        when(col("prev_ts").isNull || col("ts") - col("prev_ts") > gapNs, 1L)
          .otherwise(0L))
      .withColumn("sid", sum(col("ns")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "sid")
      .agg(min(col("ts")).as("st"), max(col("ts")).as("en"))
    Sweep.dailyBusyTime(intervals, "st", "en")
      .select(col("day"), col("n_segments"),
        expr("busy_ns div 1000000000").as("busy_s"),
        // ns·ppm outgrows BIGINT (8.6e13 ns/day × 2e6) — widen first
        expr("cast((2 * cast(busy_ns as decimal(38,0)) * 1000000 + 86400000000000) div (2 * 86400000000000) as bigint)")
          .as("busy_ppm_of_day"))
      .orderBy("day")
  }

  /** q113 — z-order skipping index over (l_partkey, l_suppkey) (see
    * [[graft.ops.ZOrder]]): both keys range-normalized to 8 bits (the
    * integer-exact `x·256 div (max+1)` — z-order always interleaves
    * RANGE-scaled coordinates, else the curve degenerates to whichever
    * key has more raw bits), then 64 z-range buckets with per-bucket
    * min/max of BOTH original keys — the stats frame a lakehouse writer
    * persists as file-skipping metadata after `OPTIMIZE ZORDER`.
    * Locality (both spans tight per bucket, vs a single-key sort leaving
    * the other dimension unbounded) is spec-asserted on a dense grid. */
  val q113: Q = (spark, dir) => {
    val li = Tables.lineitem(spark, dir).select("l_partkey", "l_suppkey")
    val mx = li.agg(max(col("l_partkey")).as("mxp"),
      max(col("l_suppkey")).as("mxs"))
    li.crossJoin(broadcast(mx))
      .withColumn("xb", expr("l_partkey * 256 div (mxp + 1)"))
      .withColumn("yb", expr("l_suppkey * 256 div (mxs + 1)"))
      .withColumn("bucket",
        shiftright(ZOrder.zValue(col("xb"), col("yb"), 8), 10))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"),
        min(col("l_partkey")).as("min_l_partkey"),
        max(col("l_partkey")).as("max_l_partkey"),
        min(col("l_suppkey")).as("min_l_suppkey"),
        max(col("l_suppkey")).as("max_l_suppkey"))
      .orderBy("bucket")
  }

  /** q114 — one-pass pairwise correlation matrix over lineitem's four
    * numeric measures (see [[graft.ops.Profile.corrMatrix]]): 6 co-moment
    * aggregates on one scan, melted. */
  val q114: Q = (spark, dir) =>
    Profile.corrMatrix(Tables.lineitem(spark, dir),
      Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
      .orderBy("col_a", "col_b")

  /** q115 — PSI distribution drift of order totals between the first and
    * second halves of the date range (see [[graft.ops.Drift.psiByBin]]).
    * The period split (integer midpoint day) and the fixed-width bin
    * (`floor(total/50000)` — one IEEE divide on identical doubles) are
    * both engine-exact; only the log term needs rounding. */
  val q115: Q = (spark, dir) => {
    val o = Tables.orders(spark, dir).select(
      expr("cast(cast(o_orderdate as timestamp) as long) div 86400")
        .as("day"),
      col("o_totalprice"))
    val m = o.agg(expr("(min(day) + max(day) + 1) div 2").as("mid"))
    val binned = o.crossJoin(broadcast(m)).select(
      when(col("day") < col("mid"), "a").otherwise("b").as("period"),
      floor(col("o_totalprice") / 50000).cast("long").as("bin"))
    Drift.psiByBin(binned, col("period"), col("bin")).orderBy("bin")
  }

  /** q158 — exact two-sample KS test on order totals between the same
    * first/second-half periods as q115 ([[graft.ops.Drift.ksTwoSample]]):
    * the binning-free drift check — D is the max ECDF gap over observed
    * values, argmax'd on integer cross-products so no double division
    * participates in the comparison. */
  val q158: Q = (spark, dir) => {
    val o = Tables.orders(spark, dir).select(
      expr("cast(cast(o_orderdate as timestamp) as long) div 86400")
        .as("day"),
      col("o_totalprice"))
    val m = o.agg(expr("(min(day) + max(day) + 1) div 2").as("mid"))
    val tagged = o.crossJoin(broadcast(m)).select(
      when(col("day") < col("mid"), "a").otherwise("b").as("period"),
      col("o_totalprice"))
    Drift.ksTwoSample(tagged, col("o_totalprice"), col("period"))
  }

  /** q159 — multi-source BFS reach ([[graft.graph.Bfs.hops]]) on the
    * q49 co-purchase graph: how many nodes sit 0/1/2/3 purchase-hops
    * from the nation-0 supplier cohort (hop −1 = in-graph but
    * unreached). All-integer frontier expansion — one join + one
    * anti-join per hop, no path enumeration. */
  val q159: Q = (spark, dir) => {
    val edges = SharedFrames.coPurchaseEdges(spark, dir)
    val seeds = Tables.supplier(spark, dir)
      .filter(col("s_nationkey") === 0)
      .select(concat(lit("s"), col("s_suppkey")).as("node"))
    val reached = Bfs.hops(edges, seeds, maxHops = 3)
    val unreached = edges.select(col("src").as("node")).distinct()
      .join(reached, Seq("node"), "left_anti")
      .select(lit(-1).as("hop"))
    reached.select(col("hop")).union(unreached)
      .groupBy("hop").agg(count(lit(1)).as("n_nodes"))
      .orderBy("hop")
  }

  /** q117 — next-event-prediction training rows (see
    * [[graft.ops.Features.nextEventRows]]): features from the previous
    * event (type, dwell), label = the current one; one user_id exchange
    * serves all three windows. */
  val q117: Q = (spark, dir) =>
    Features.nextEventRows(Tables.events(spark, dir), "user_id", "ts",
        "event_id", "event_type")
      .orderBy("user_id", "seq_n")

  /** q118 — customer Pareto frontier on (avg order value, n_orders),
    * both maximized — the "many orders AND big orders" trade-off, whose
    * anti-correlation gives a real frontier (see
    * [[graft.ops.Skyline.frontier2D]] for the bucket-carry sweep that
    * replaces the O(n²) dominance self-join; the oracle IS that
    * dominance NOT EXISTS, so the gate proves the decomposition equals
    * the definition). */
  val q118: Q = (spark, dir) => {
    val spend = Tables.orders(spark, dir)
      .groupBy(col("o_custkey").as("c_custkey"))
      .agg(count(lit(1)).as("n_orders"),
        (sum(col("o_totalprice")
          .cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .cast("double") / count(lit(1))).as("avg_value"))
    Skyline.frontier2D(spend, "avg_value", "n_orders")
      .select("c_custkey", "n_orders", "avg_value")
      .orderBy("c_custkey")
  }

  /** q143 — χ² independence test of document language vs crawl source
    * ([[graft.metrics.Contingency.chiSquare]]): the corpus-balance
    * check a curation pipeline runs per ingest — a χ² spike means one
    * source's language mix drifted. Cell-level report + the broadcast
    * statistic, decimal-exact through the total. */
  val q143: Q = (spark, dir) =>
    graft.metrics.Contingency.chiSquare(
      Tables.documents(spark, dir), col("lang"), col("source"))
      .orderBy("r", "c")

  /** q144 — signed feature hashing of document tokens into 64 buckets
    * ([[graft.ops.Features.hashedTokenFeatures]]): the fit-free
    * vectorizer for unbounded vocabularies — no dictionary job, no
    * broadcast state, layout-independent, integer-exact. */
  val q144: Q = (spark, dir) =>
    graft.ops.Features.hashedTokenFeatures(
      Tables.documents(spark, dir), "doc_id", "text",
      buckets = 64, seed = 144L)
      .orderBy("doc_id", "bucket")

  /** q148 — time-decay multi-touch attribution
    * ([[graft.ops.Attribution.timeDecay]]): every click in the 24 h
    * lookback of its user's purchase earns exp(−Δt/6h) weight, credits
    * renormalized per purchase — the priced form of q81's
    * click→purchase pairs. */
  val q148: Q = (spark, dir) =>
    graft.ops.Attribution.timeDecay(Tables.events(spark, dir),
      lookbackHours = 24, tauSeconds = 21600.0)
      .orderBy("purchase_id", "click_id")

  /** q204 — position-based (U-shaped) multi-touch attribution
    * ([[graft.ops.Attribution.positionBased]]): 40 % to the first and
    * last touch of each purchase's 24 h click journey, 20 % split
    * across the middles — the journey-shape counterpart of q148's
    * recency decay, same pair build, one window pass. */
  val q204: Q = (spark, dir) =>
    graft.ops.Attribution.positionBased(Tables.events(spark, dir),
      lookbackHours = 24)
      .orderBy("purchase_id", "click_id")

  /** q208 — Adamic–Adar supplier similarity on the co-purchase graph:
    * for supplier pairs sharing customers, Σ_c 1/ln(deg(c)) — common-
    * neighbor similarity that discounts promiscuous intermediaries
    * (a customer who buys from everyone says little; log-degree
    * weighting is the link-prediction classic). Top-25 pairs.
    *
    * Execution: one degree aggregate, then the wedge self-join on the
    * customer key (the q104 shape — volume Σ deg_c², bounded by the
    * supplier catalog). Weights quantize to 6dp decimals at
    * the customer level, so the per-pair sum is exact regardless of
    * wedge merge order. Degree-1 customers form no wedge and drop
    * naturally (also keeping ln > 0).
    *
    * Hub cap (VERDICT r10 #2): customers with more than [[HubDegreeCap]]
    * distinct suppliers are EXCLUDED from the wedge, and the DuckDB
    * oracle mirrors the same bound (the q45/q267 df-cap convention).
    * Without it the in-row pair array below is |suppliers|²/2-sized in a
    * single row — a 10⁵-degree hub at web scale would build 5·10⁹
    * structs in one task (OOM, not slowdown). With the cap the largest
    * row materializes C(256,2) ≈ 33k structs (~1 MB) regardless of data
    * scale, and Adamic–Adar semantics barely notice: a degree->256
    * customer contributes ≤ 1/ln(256) ≈ 0.18 per pair — the weight the
    * measure exists to discount. Max observed degree: 67 at sf0.01,
    * 102 at sf0.1 — the cap binds only on pathological hubs. */
  val q208: Q = (spark, dir) => {
    // q137's in-row pair-explode shape instead of a wedge SELF-JOIN:
    // one c-key shuffle packs each customer's (distinct, sorted)
    // supplier list, pairs explode map-side and partial-aggregate into
    // the |suppliers|²-bounded (s1,s2) groups in the SAME stage — the
    // Σdeg² wedge stream never crosses an exchange (was: an 18M-row
    // 3-way join at sf0.1, measured 17.4 s → ~3 s). sort_array gives
    // s1 < s2 by the same binary string order the join form used.
    val cs = SharedFrames.coPurchaseEdges(spark, dir)
      .filter(col("src").startsWith("c"))
      .select(col("src").as("c"), col("dst").as("s"))
    cs.groupBy("c").agg(sort_array(collect_set(col("s"))).as("ss"))
      .filter(size(col("ss")).between(2, HubDegreeCap))
      .withColumn("w",
        qround(lit(1.0) / log(size(col("ss")).cast("double")), 6)
          .cast("decimal(10,6)"))
      .select(col("w"), explode(expr(
        """flatten(transform(ss,
          |  (x, i) -> transform(slice(ss, i + 2, size(ss)),
          |    y -> struct(x AS s1, y AS s2))))""".stripMargin)).as("p"))
      .select(col("p.s1").as("s1"), col("p.s2").as("s2"), col("w"))
      .groupBy("s1", "s2")
      .agg(count(lit(1)).as("n_common"),
        decOut(sum("w"), 6).as("aa_score"))
      .orderBy(col("aa_score").desc, col("s1"), col("s2"))
      .limit(25)
  }

  /** q214 — two-sample Mann–Whitney U location test (click vs purchase
    * `value` distributions): the nonparametric "did the distribution
    * SHIFT" significance companion to q158's KS "did it change shape" —
    * rank-sum with EXACT tie handling via the q142 machinery (one row
    * per distinct value, tie groups contribute m⁺·(2·below + m) to 2U,
    * all integer until the final z/AUC divides; the tie-corrected
    * variance term Σ(t³−t) is an integer aggregate). The only
    * unpartitioned window walks distinct VALUES, never rows. */
  val q214: Q = (spark, dir) =>
    graft.metrics.Auc.mannWhitneyU(
        Tables.events(spark, dir)
          .filter(col("event_type").isin("click", "purchase")),
        qdec(col("value"), 18, 2),
        (col("event_type") === "purchase").cast("int"))
      .withColumnRenamed("n_pos", "n_purchase")
      .withColumnRenamed("n_neg", "n_click")

  /** q215 — edge-WEIGHTED PageRank on the co-purchase multigraph
    * ([[graft.graph.PageRank.weightedPageRank]]): edge weight = lineitem
    * multiplicity between a customer and supplier, rank mass split
    * w/wdeg instead of uniformly — q49's recurrence with volume-aware
    * semantics. Same one-shuffle-per-iteration plan. */
  val q215: Q = (spark, dir) => {
    // r17 execution shape (values unchanged, oracle re-verified at 3
    // SFs): (1) the li⋈o join inputs are user-repartitioned on the join
    // key (guide §2.5/§8 — the join shuffles by orderkey EITHER WAY;
    // keying the exchange ourselves exempts it from AQE's input-sized
    // coalescing, which serialized the join + the groupBy's map-side
    // partial agg onto 1–2 partitions at small inputs; probe: wpair
    // build 1.6 → 1.2 s warm). (2) The reversed-edge side comes from an
    // in-row explode AFTER the aggregate instead of a self-union: union
    // branches do not share work, so the union form ran the whole
    // li⋈o⋈groupBy once PER BRANCH (same fix as the r16
    // coPurchaseEdges build; probe: wpr chain −0.5–1 s). The c/s
    // prefixes keep the two directions disjoint, so the edge MULTISET
    // is identical.
    val p = spark.sparkContext.defaultParallelism
    val li = Tables.lineitem(spark, dir).select("l_orderkey", "l_suppkey")
      .repartition(p, col("l_orderkey"))
    val o = Tables.orders(spark, dir).select("o_orderkey", "o_custkey")
      .repartition(p, col("o_orderkey"))
    val wpair = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(concat(lit("c"), col("o_custkey")).as("src"),
        concat(lit("s"), col("l_suppkey")).as("dst"))
      .agg(count(lit(1)).as("w"))
    val edges = wpair
      .select(explode(array(
        struct(col("src"), col("dst"), col("w")),
        struct(col("dst").as("src"), col("src").as("dst"), col("w"))))
        .as("e"))
      .select("e.src", "e.dst", "e.w")
      // Materialize once (guide §2.4): weightedPageRank reads its edge
      // frame four times before iterating (wdeg agg, the ed join's
      // probe side, both node-set projections) — unlike q49/q200 this
      // frame is a raw lineage, not the shared persisted cache, so each
      // read re-ran the li⋈o groupBy.
      .localCheckpoint()
    PageRank.weightedPageRank(edges, iters = 3, damping = 0.85)
      .select(col("node"), qround(col("r"), 6).as("rank"))
      .orderBy("node")
  }

  /** q217 — label-propagation communities on the co-purchase graph
    * ([[graft.graph.LabelProp.communities]]): 3 synchronous frequency-
    * vote rounds, ties to the smaller label — COMMUNITY structure where
    * q73's min-label propagation finds only connectivity. Deterministic
    * by construction, so the oracle replays every round; output carries
    * each node's community and its size. */
  val q217: Q = (spark, dir) => {
    val comm = graft.graph.LabelProp.communities(
      SharedFrames.coPurchaseEdges(spark, dir), rounds = 3)
    val sizes = comm.groupBy("community")
      .agg(count(lit(1)).as("community_size"))
    comm.join(sizes, "community")
      .select("node", "community", "community_size")
      .orderBy("node")
  }

  /** q151 — Kaplan–Meier user-retention curve
    * ([[graft.metrics.Survival.kaplanMeier]]): hour-granularity
    * lifetimes with right-censoring (still active within 12 h of the
    * observation end), the product-limit estimator over one row per
    * distinct lifetime — q46's cohort triangle tells you WHO returned,
    * this gives the censoring-unbiased P(survive past t). */
  val q151: Q = (spark, dir) =>
    graft.metrics.Survival.kaplanMeier(Tables.events(spark, dir),
      "user_id", "ts", unitNs = 3600000000000L, censorUnits = 12)
      .orderBy("t")

  /** q222 — difference-in-differences (the 2×2 natural-experiment
    * readout): treated cohort = even user_ids, post period = from
    * 2024-01-16T00Z, outcome = mean event value per cell; DiD =
    * (T_post − T_pre) − (C_post − C_pre) — the causal-effect estimate
    * that differences away both the cohort baseline and the common time
    * trend, where q131's z-test sees only one contrast. ONE conditional
    * aggregate computes all four cells (no per-cell scans); sums stay
    * exact decimal, each mean is one audited double divide, and the DiD
    * is IEEE arithmetic on already-quantized means. */
  val q222: Q = (spark, dir) => {
    val cutNs = 1705363200000000000L // 2024-01-16T00:00:00Z
    val e = Tables.events(spark, dir)
      .select((col("user_id") % 2 === 0).as("treated"),
        (col("ts") >= cutNs).as("post"),
        qdec(col("value"), 7, 2).as("v"))
    val cells = e.groupBy("treated", "post")
      .agg(sum(col("v")).as("sv"), count(lit(1)).as("n"))
      .withColumn("mean",
        qround(col("sv").cast("double") / col("n").cast("double"), 6))
    def cell(t: Boolean, p: Boolean, c: String) =
      min(when(col("treated") === t && col("post") === p, col(c)))
    cells.agg(
        cell(t = true, p = false, "mean").as("treated_pre"),
        cell(t = true, p = true, "mean").as("treated_post"),
        cell(t = false, p = false, "mean").as("control_pre"),
        cell(t = false, p = true, "mean").as("control_post"),
        sum(when(col("treated"), col("n")).otherwise(0L)).as("n_treated"),
        sum(when(!col("treated"), col("n")).otherwise(0L)).as("n_control"))
      .withColumn("did", qround(
        (col("treated_post") - col("treated_pre")) -
          (col("control_post") - col("control_pre")), 6))
  }

  /** q226 — offline policy evaluation by REPLAY (Li et al.'s unbiased
    * bandit-evaluation method): train a per-segment policy on the first
    * half of the log (argmax mean reward, ties to the smaller action),
    * then score it on the second half using ONLY the logged rounds
    * where the logged action equals the policy's choice — the
    * counterfactual estimate that needs no simulator, and the
    * consistency companion to q150's IPS reweighting (replay
    * subsamples; IPS reweights). Exact decimal reward sums, audited
    * divides, deterministic argmax; policy is 4 rows, broadcast. */
  val q226: Q = (spark, dir) => {
    val cutNs = 1705363200000000000L // 2024-01-16T00:00:00Z
    val e = Tables.events(spark, dir)
      .select((col("user_id") % 4).as("segment"),
        col("event_type").as("action"), qdec(col("value"), 7, 2).as("r"),
        col("ts"))
    val pol = e.filter(col("ts") < cutNs)
      .groupBy("segment", "action")
      .agg(sum(col("r")).as("sr"), count(lit(1)).as("n"))
      .withColumn("train_mean",
        qround(col("sr").cast("double") / col("n").cast("double"), 6))
      .withColumn("rk", row_number().over(Window.partitionBy("segment")
        .orderBy(col("train_mean").desc, col("action"))))
      .filter(col("rk") === 1)
      .select(col("segment"), col("action").as("chosen_action"),
        col("train_mean"))
    e.filter(col("ts") >= cutNs)
      .join(broadcast(pol), Seq("segment"))
      .groupBy("segment", "chosen_action", "train_mean")
      .agg(count(lit(1)).as("n_eval"),
        sum(when(col("action") === col("chosen_action"), 1L)
          .otherwise(0L)).as("n_matched"),
        sum(when(col("action") === col("chosen_action"), col("r")))
          .as("sr_matched"))
      .withColumn("match_rate", qround(
        col("n_matched").cast("double") / col("n_eval").cast("double"), 6))
      .withColumn("replay_value", qround(
        col("sr_matched").cast("double") / col("n_matched").cast("double"),
        6))
      .select(col("segment"), col("chosen_action"), col("train_mean"),
        col("n_eval"), col("n_matched"), col("match_rate"),
        col("replay_value"))
      .orderBy("segment")
  }

  /** q231 — cohort LTV curve: cumulative purchase revenue PER COHORT
    * MEMBER by weeks-since-first-activity — q46's retention triangle
    * tells you who came back, this tells you what a cohort member is
    * WORTH by age w (the payback-period readout). Same integer week
    * arithmetic and one-scan shape as [[graft.ops.Cohort]] (first day
    * via an unordered per-user window min, never aggregate-and-join-
    * back); revenue stays exact decimal through the (weeks²-bounded)
    * cumulative window, divided once by the FIXED cohort size — users
    * who never purchase still denominate their cohort. */
  val q231: Q = (spark, dir) => {
    val d = Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_type"),
        qdec(col("value"), 7, 2).as("v"))
      .withColumn("day", expr("ts div 86400000000000"))
      .withColumn("first_day",
        min(col("day")).over(Window.partitionBy("user_id")))
      .withColumn("cohort_week", expr("first_day div 7"))
      .withColumn("week_offset", expr("(day - first_day) div 7"))
    val sizes = d.groupBy("cohort_week")
      .agg(countDistinct(col("user_id")).as("n_users"))
    val rev = d.filter(col("event_type") === "purchase")
      .groupBy("cohort_week", "week_offset")
      .agg(sum(col("v")).as("wk_rev"))
    val wCum = Window.partitionBy("cohort_week").orderBy("week_offset")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rev
      .withColumn("cum_rev",
        sum(col("wk_rev")).over(wCum).cast("decimal(18,2)"))
      .join(broadcast(sizes), Seq("cohort_week"))
      .select(col("cohort_week"), col("week_offset"), col("n_users"),
        decOut(col("wk_rev"), 2).as("wk_rev"),
        decOut(col("cum_rev"), 2).as("cum_rev"),
        qround(col("cum_rev").cast("double") /
          col("n_users").cast("double"), 6).as("ltv_per_user"))
      .orderBy("cohort_week", "week_offset")
  }

  /** q233 — quantile treatment effect (QTE): the treated−control gap at
    * each decile of the outcome distribution — WHERE the shift lives,
    * which q222's mean DiD and q131's z-test flatten away (a treatment
    * that moves only the tail has zero mean effect on a winsorized
    * readout). Exact grouped percentiles (the q78 interpolation, proven
    * == quantile_cont), each quantized BEFORE the difference so the QTE
    * is IEEE arithmetic on engine-exact operands. Two group rows →
    * 9-decile frame; the scan aggregates once per cohort. */
  val q233: Q = (spark, dir) => {
    val ps = (1 to 9).map(_ / 10.0)
    val e = Tables.events(spark, dir)
      .select((col("user_id") % 2 === 0).as("treated"),
        qdec(col("value"), 7, 2).cast("double").as("v"))
    val qs = e.groupBy("treated")
      .agg(expr(s"percentile(v, array(${ps.mkString(", ")}))").as("qa"))
      .select(col("treated"), posexplode(col("qa")))
      .select(col("treated"), ((col("pos") + 1) * 10).as("pctl"),
        qround(col("col"), 6).as("q"))
    qs.filter(col("treated")).select(col("pctl"), col("q").as("treated_q"))
      .join(qs.filter(!col("treated"))
        .select(col("pctl"), col("q").as("control_q")), Seq("pctl"))
      .withColumn("qte", qround(col("treated_q") - col("control_q"), 6))
      .orderBy("pctl")
  }

  /** q246 — degree assortativity of the co-purchase graph: Pearson r
    * between the endpoint degrees over the (symmetrized) edge list —
    * THE one-scalar mixing diagnostic (hub-to-hub r>0 vs hub-to-leaf
    * r<0) that says whether q49/q175's iterative walks face a core-
    * periphery or a decentralized topology. Degrees are exact integer
    * counts on the memoized [[SharedFrames.coPurchaseEdges]]; all five
    * sufficient statistics are exact DECIMAL(38,0)/HUGEINT integer
    * sums (q239's pattern), so r is one textually-mirrored IEEE
    * formula — two sqrt, one divide — over engine-identical integers.
    * Two broadcast-sized degree joins; no new exchange beyond them. */
  val q246: Q = (spark, dir) => {
    val edges = SharedFrames.coPurchaseEdges(spark, dir)
    val deg = edges.groupBy("src").agg(count(lit(1)).as("d"))
    val st = edges
      .join(deg.select(col("src"), col("d").as("dx")), Seq("src"))
      .join(deg.select(col("src").as("dst"), col("d").as("dy")), Seq("dst"))
      .agg(count(lit(1)).as("m"),
        sum(col("dx").cast("decimal(38,0)")).as("sx"),
        sum(col("dy").cast("decimal(38,0)")).as("sy"),
        sum((col("dx").cast("decimal(38,0)") * col("dy"))
          .cast("decimal(38,0)")).as("sxy"),
        sum((col("dx").cast("decimal(38,0)") * col("dx"))
          .cast("decimal(38,0)")).as("sxx"),
        sum((col("dy").cast("decimal(38,0)") * col("dy"))
          .cast("decimal(38,0)")).as("syy"))
    // constant degrees (every node degree-equal, e.g. a single edge) zero
    // the variance terms: DuckDB's x/0 is NULL where Spark ANSI throws —
    // guard to the oracle's NULL (fuzz gate, one_row class)
    val den = sqrt(expr("cast(m * sxx - sx * sx as double)")) *
      sqrt(expr("cast(m * syy - sy * sy as double)"))
    st.select(col("m").as("n_edges"),
      when(den.isNull || den === 0.0, lit(null))
        .otherwise(qround(expr("cast(m * sxy - sx * sy as double)") / den,
          6)).as("assortativity"))
  }

  /** q248 — CUPED variance-reduced A/B readout: adjust each user's
    * post-period metric by their PRE-period covariate (Yadj = Y −
    * θ·(X − X̄), θ = cov(X,Y)/var(X)) before differencing the arms —
    * the industry-standard sensitivity fix (Deng et al. 2013) that
    * completes the experimentation stack (q131 z-test, q222 DiD, q233
    * QTE): same point estimate in expectation, at a fraction of the
    * variance, because pre-period behavior soaks up user-level noise.
    * Everything rides exact integer MICRO-units: per-user means
    * quantize to 6 dp once (the only per-user divides), every
    * sufficient statistic is a DECIMAL(38,0)/HUGEINT integer sum, θ is
    * one mirrored IEEE divide, each Yadj re-quantizes to a whole micro
    * before the arm sums, and the arm means use the (2·Σ+n) div (2n)
    * half-up idiom — no distributed double sum anywhere. The
    * `var_reduction` column is the measured payoff: var(Yadj)/var(Y)
    * over the experiment population. */
  /** q290 — USER-grain difference-in-differences: q222 already reports
    * the 2×2 DiD at EVENT grain (mean event value per cell — a
    * per-interaction estimand where heavy users dominate their arm's
    * mean). This is the experimentation-correct sibling: the unit of
    * analysis is the USER (the randomization unit — the same
    * within-user-correlation argument as q291's ratio CI), outcome =
    * per-user purchase revenue in exact cents, ZERO-IMPUTED for
    * inactive periods so the denominator is the full arm rather than
    * the self-selected active subset (activity itself responds to
    * treatment — conditioning on it biases the contrast). Arms/cutoff
    * follow the q226/q248/q257 convention. One user-grain aggregate →
    * a 2-row arm frame → one cross join: shuffle cost is the user
    * group-by, output O(1); cell means and the DiD are single mirrored
    * IEEE divides of exact integer sums, 6 dp out. */
  val q290: Q = (spark, dir) => {
    val cutNs = 1705363200000000000L // 2024-01-16T00:00:00Z
    val rev = Tables.events(spark, dir)
      .select(col("user_id"), (col("user_id") % 2 === 0).as("treated"),
        col("ts"), col("event_type"), col("value"))
      .groupBy("user_id", "treated")
      .agg(
        sum(when(col("event_type") === "purchase" && col("ts") < cutNs,
          floor(col("value") * 100.0 + lit(0.5))).otherwise(0L))
          .as("pre_c"),
        sum(when(col("event_type") === "purchase" && col("ts") >= cutNs,
          floor(col("value") * 100.0 + lit(0.5))).otherwise(0L))
          .as("post_c"))
    val arms = rev.groupBy("treated")
      .agg(count(lit(1)).as("n_users"),
        sum(col("pre_c")).as("s_pre"), sum(col("post_c")).as("s_post"))
    val t = arms.filter(col("treated"))
      .select(col("n_users").as("n_t"), col("s_pre").as("sp_t"),
        col("s_post").as("ss_t"))
    val c = arms.filter(!col("treated"))
      .select(col("n_users").as("n_c"), col("s_pre").as("sp_c"),
        col("s_post").as("ss_c"))
    t.crossJoin(c)
      .select(col("n_t"), col("n_c"),
        qround(col("sp_t").cast("double") / col("n_t"), 6)
          .as("mean_t_pre"),
        qround(col("ss_t").cast("double") / col("n_t"), 6)
          .as("mean_t_post"),
        qround(col("sp_c").cast("double") / col("n_c"), 6)
          .as("mean_c_pre"),
        qround(col("ss_c").cast("double") / col("n_c"), 6)
          .as("mean_c_post"),
        qround((col("ss_t").cast("double") / col("n_t")
          - col("sp_t").cast("double") / col("n_t"))
          - (col("ss_c").cast("double") / col("n_c")
            - col("sp_c").cast("double") / col("n_c")), 6)
          .as("did_cents"))
  }

  /** q291 — ratio-metric confidence interval by the delta method: the
    * experimentation-platform primitive for metrics like revenue per
    * event, R = ΣY/ΣN over user clusters, whose naive per-row variance
    * is WRONG because rows within a user correlate — Var(R) ≈
    * (Var(Y) − 2R·Cov(Y,N) + R²·Var(N)) / (U·n̄²) with user-level
    * moments. All sufficient statistics are exact integers
    * (cents/counts, DECIMAL(38,0)/HUGEINT widened products); the delta
    * formula is one textually-mirrored IEEE expression, so both engines
    * land the identical double before the 6 dp quantize. One user-grain
    * aggregate, O(1) output — the 100 TB shape. */
  val q291: Q = (spark, dir) => {
    def d38(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    val u = Tables.events(spark, dir)
      .groupBy("user_id")
      .agg(sum(when(col("event_type") === "purchase",
        floor(col("value") * 100.0 + lit(0.5))).otherwise(0L)).as("y"),
        count(lit(1)).as("n"))
    u.agg(count(lit(1)).as("uu"),
        sum(d38(col("y"))).as("sy"), sum(d38(col("n"))).as("sn"),
        sum((d38(col("y")) * col("y")).cast("decimal(38,0)")).as("syy"),
        sum((d38(col("n")) * col("n")).cast("decimal(38,0)")).as("snn"),
        sum((d38(col("y")) * col("n")).cast("decimal(38,0)")).as("syn"))
      .withColumn("r", expr("cast(sy as double) / cast(sn as double)"))
      .withColumn("nbar", expr("cast(sn as double) / cast(uu as double)"))
      .withColumn("vy", expr(
        "cast(uu * syy - sy * sy as double) / cast(cast(uu as decimal(38,0)) * (uu - 1) as double)"))
      .withColumn("vn", expr(
        "cast(uu * snn - sn * sn as double) / cast(cast(uu as decimal(38,0)) * (uu - 1) as double)"))
      .withColumn("cyn", expr(
        "cast(uu * syn - sy * sn as double) / cast(cast(uu as decimal(38,0)) * (uu - 1) as double)"))
      .withColumn("var_r",
        (col("vy") - lit(2.0) * col("r") * col("cyn")
          + col("r") * col("r") * col("vn")) /
          (col("nbar") * col("nbar") * col("uu")))
      .withColumn("se", sqrt(col("var_r")))
      .select(col("uu").as("n_users"),
        col("sy").cast("long").as("sum_y_cents"),
        col("sn").cast("long").as("sum_n_events"),
        qround(col("r"), 6).as("ratio_cents_per_event"),
        qround(col("se"), 6).as("se_cents"),
        qround(col("r") - lit(1.96) * col("se"), 6).as("ci_lo"),
        qround(col("r") + lit(1.96) * col("se"), 6).as("ci_hi"))
  }

  val q248: Q = (spark, dir) => {
    val cutNs = 1705363200000000000L // 2024-01-16T00:00:00Z
    val e = Tables.events(spark, dir)
      .select(col("user_id"), (col("user_id") % 2 === 0).as("treated"),
        col("ts"), qdec(col("value"), 7, 2).as("v"))
    def userMeanMicro(df: DataFrame, out: String): DataFrame =
      df.groupBy("user_id", "treated")
        .agg(sum(col("v")).as("sv"), count(lit(1)).as("nv"))
        // micro-units straight from the floor — qround's /10⁶ then ×10⁶
        // would round-trip through an inexact double and can lose an ulp
        .select(col("user_id"), col("treated"),
          floor(col("sv").cast("double") / col("nv").cast("double")
            * lit(1000000.0) + lit(0.5)).as(out))
    val u = userMeanMicro(e.filter(col("ts") < cutNs), "x")
      .join(userMeanMicro(e.filter(col("ts") >= cutNs), "y")
        .drop("treated"), Seq("user_id"))
    val glob = u.agg(count(lit(1)).as("n"),
        sum(col("x").cast("decimal(38,0)")).as("sx"),
        sum(col("y").cast("decimal(38,0)")).as("sy"),
        sum((col("x").cast("decimal(38,0)") * col("y"))
          .cast("decimal(38,0)")).as("sxy"),
        sum((col("x").cast("decimal(38,0)") * col("x"))
          .cast("decimal(38,0)")).as("sxx"))
      .withColumn("theta", qround(
        expr("cast(n * sxy - sx * sy as double)") /
        expr("cast(n * sxx - sx * sx as double)"), 6))
      .withColumn("xbar_micro",
        expr("cast((2 * sx + n) div (2 * cast(n as decimal(38,0))) as bigint)"))
    val adj = u.crossJoin(broadcast(glob.select("theta", "xbar_micro")))
      .withColumn("yadj", qround(col("y").cast("double") - col("theta") *
        (col("x").cast("double") - col("xbar_micro").cast("double")), 0)
        .cast("long"))
    val arms = adj.groupBy("treated")
      .agg(count(lit(1)).as("na"),
        sum(col("y").cast("decimal(38,0)")).as("sya"),
        sum(col("yadj").cast("decimal(38,0)")).as("saa"),
        sum((col("y").cast("decimal(38,0)") * col("y"))
          .cast("decimal(38,0)")).as("syya"),
        sum((col("yadj").cast("decimal(38,0)") * col("yadj"))
          .cast("decimal(38,0)")).as("saaa"))
    val t = arms.filter(col("treated"))
      .select(col("na").as("nt"), col("sya").as("syt"),
        col("saa").as("sat"), col("syya").as("syyt"),
        col("saaa").as("saat"))
    val c0 = arms.filter(!col("treated"))
      .select(col("na").as("nc"), col("sya").as("syc"),
        col("saa").as("sac"), col("syya").as("syyc"),
        col("saaa").as("saac"))
    t.crossJoin(c0).crossJoin(broadcast(glob.select("n", "theta")))
      .select(col("n").as("n_users"), col("theta"),
        expr("cast((2 * syt + nt) div (2 * cast(nt as decimal(38,0))) - (2 * syc + nc) div (2 * cast(nc as decimal(38,0))) as bigint)")
          .as("diff_raw_micro"),
        expr("cast((2 * sat + nt) div (2 * cast(nt as decimal(38,0))) - (2 * sac + nc) div (2 * cast(nc as decimal(38,0))) as bigint)")
          .as("diff_cuped_micro"),
        qround(
          expr("cast(n * (saat + saac) - (sat + sac) * (sat + sac) as double)") /
          expr("cast(n * (syyt + syyc) - (syt + syc) * (syt + syc) as double)"),
          6).as("var_reduction"))
  }

  /** q252 — A/B sample-size planner: the power calculation that turns
    * q248's measured metric variance into "how many users per arm do we
    * need to detect a 1 % lift at α = 0.05, power = 0.80" — the
    * question every experiment review asks FIRST, answered from the
    * data the platform already has. Per-user post-period means ride
    * q248's exact integer micro-units; the variance numerator
    * n·Σy² − (Σy)² is an exact DECIMAL(38,0)/HUGEINT integer; the MDE
    * (1 % of the overall mean) is an exact half-up integer; the final
    * n = ⌈2·(z_α/2+z_β)²·σ²/δ²⌉ is one textually-mirrored IEEE formula
    * over those exact operands with the z constants as shared literals
    * (1.96·0.8416 kept unfolded, the q228 discipline). */
  val q252: Q = (spark, dir) => {
    val cutNs = 1705363200000000000L // 2024-01-16T00:00:00Z
    val y = Tables.events(spark, dir)
      .filter(col("ts") >= cutNs)
      .select(col("user_id"), qdec(col("value"), 7, 2).as("v"))
      .groupBy("user_id")
      .agg(sum(col("v")).as("sv"), count(lit(1)).as("nv"))
      .select(floor(col("sv").cast("double") / col("nv").cast("double")
        * lit(1000000.0) + lit(0.5)).as("y"))
    val st = y.agg(count(lit(1)).as("n"),
      sum(col("y").cast("decimal(38,0)")).as("sy"),
      sum((col("y").cast("decimal(38,0)") * col("y"))
        .cast("decimal(38,0)")).as("syy"))
    st.select(col("n").as("n_users"),
        expr("cast((2 * sy + n) div (2 * cast(n as decimal(38,0))) as bigint)")
          .as("mean_micro"),
        expr("cast((2 * sy + 100 * n) div (200 * cast(n as decimal(38,0))) as bigint)")
          .as("mde_micro"),
        // micro² variances run ~10¹³ — a 6dp quantization would push
        // x·10⁶ past Long.Max where Spark's floor SATURATES (silent
        // +inf-like clamp); integer resolution keeps the quantizer in
        // range with 10⁻¹³ relative precision
        qround(expr("cast(n * syy - sy * sy as double)") /
          expr("cast(cast(n as decimal(38,0)) * (n - 1) as double)"), 0)
          .as("var_micro2"))
      .withColumn("n_per_arm",
        ceil(lit(2.0) * ((lit(1.96) + lit(0.8416)) * (lit(1.96) + lit(0.8416))) *
          (col("var_micro2") /
            (col("mde_micro").cast("double") * col("mde_micro").cast("double")))))
  }

  /** q253 — exact Shapley-value multi-touch attribution over the 4
    * non-purchase channels: each converting user's pre-first-purchase
    * touched-channel SET becomes a 4-bit mask; the coalition value
    * v(S) = converting users whose mask ⊆ S comes from a 16×16
    * subset-sum over the mask histogram; and φ_channel is the EXACT
    * Shapley formula with the 4! denominator kept as the integer scale
    * (φ·24 — weights {6,2,2,6} by |S|) — the game-theoretically fair
    * split that position rules (q148 decay, q204 U-shape) approximate.
    * Everything after ONE user-level aggregate runs on ≤ 16-row frames,
    * so the op costs the same at any corpus size; the efficiency axiom
    * Σφ·24 = 24·v(N) is spec-pinned and shares ride the ppm idiom.
    * Direct conversions (no prior touch) carry no mask row and are
    * excluded — the standard baseline treatment. */
  val q253: Q = (spark, dir) => {
    val chans = Seq("click", "view", "signup", "error")
    val e = Tables.events(spark, dir)
      .select("user_id", "event_type", "ts")
    val firstP = e.filter(col("event_type") === "purchase")
      .groupBy("user_id").agg(min(col("ts")).as("pts"))
    val bitOf = chans.zipWithIndex
      .foldLeft(lit(0)) { case (acc, (c, i)) =>
        when(col("event_type") === c, lit(1 << i)).otherwise(acc) }
    val masks = e.join(firstP, "user_id")
      .filter(col("ts") < col("pts") && col("event_type").isin(chans: _*))
      .select(col("user_id"), bitOf.as("b"))
      .groupBy("user_id").agg(expr("bit_or(b)").as("mask"))
      .groupBy("mask").agg(count(lit(1)).as("cnt"))
    val subsets = spark.range(16).select(col("id").cast("int").as("s"))
    val v = subsets.join(masks, expr("(mask & s) = mask"), "left")
      .groupBy("s").agg(coalesce(sum(col("cnt")), lit(0L)).as("v"))
    val channels = spark.createDataFrame(
        chans.zipWithIndex.map { case (c, i) => (c, 1 << i) })
      .toDF("channel", "bit")
    val phi = channels.crossJoin(v.select(col("s"), col("v").as("v_s")))
      .filter(expr("(s & bit) = 0"))
      .join(v.select(col("s").as("si"), col("v").as("v_si")),
        expr("si = s + bit"))
      .withColumn("w", expr(
        "CASE bit_count(s) WHEN 0 THEN 6 WHEN 1 THEN 2 WHEN 2 THEN 2 ELSE 6 END"))
      .groupBy("channel")
      .agg(sum(expr("cast(w as bigint) * (v_si - v_s)")).as("phi24"))
    val tot = phi.agg(sum(col("phi24")).as("tot"))
    phi.crossJoin(broadcast(tot))
      .select(col("channel"), col("phi24"),
        expr("cast((2 * phi24 * 1000000 + tot) div (2 * tot) as bigint)")
          .as("share_ppm"))
      .orderBy("channel")
  }

  /** q254 — incremental SCD2 maintenance ([[graft.ops.Scd
    * .applyIncrement]]): the pre-cut history plus the post-cut change
    * batch, merged by re-opening each entity's current interval as a
    * seed row — the nightly-batch path whose window pass touches
    * |increment| + |open intervals| rows, never the whole log. The
    * ORACLE is the full rebuild over the entire events table: the gate
    * asserts the maintenance path is indistinguishable from rebuilding
    * — the invariant that makes incremental SCD2 trustworthy at 100 TB
    * (where rebuilding nightly is not an option). */
  val q254: Q = (spark, dir) => {
    val cutNs = 1705363200000000000L // 2024-01-16T00:00:00Z
    val e = Tables.events(spark, dir)
      .select("user_id", "event_type", "ts", "event_id")
    val old = Scd.type2(e.filter(col("ts") < cutNs),
      "user_id", "event_type", "ts", "event_id")
    val merged = Scd.applyIncrement(old, e.filter(col("ts") >= cutNs),
      "user_id", "event_type", "ts", "event_id")
    merged.select(col("user_id"), col("event_type"),
        expr("cast(valid_from as long) div 1000000000").as("valid_from_s"),
        expr("cast(valid_to as long) div 1000000000").as("valid_to_s"),
        col("is_current"))
      .orderBy(col("user_id"), col("valid_from_s"), col("event_type"),
        col("valid_to_s").asc_nulls_first)
  }

  /** q265 — delta-method confidence interval for a RATIO metric
    * (revenue per event, treated vs control): the analysis every
    * experimentation platform needs because ratio metrics violate the
    * per-user-mean t-test's independence assumption — the unit of
    * randomization (user) is not the unit of analysis (event), so the
    * naive SE is wrong; the delta method linearizes R = Σx/Σy around
    * the user-level means with Var(R̂) ≈ (Sₓ² − 2R·Sₓᵧ + R²·Sᵧ²)/(n·ȳ²)
    * (Deng et al.'s standard form). Every sufficient statistic is an
    * exact DECIMAL(38,0)/HUGEINT integer over user-level cents/counts;
    * R, the variances, the pooled SE, and the CI are one chain of
    * mirrored IEEE steps over those exact operands, quantized at each
    * published value. Completes the experimentation stack:
    * q131 z / q222 DiD / q233 QTE / q248 CUPED / q252 power / here
    * ratio metrics. */
  val q265: Q = (spark, dir) => {
    val u = Tables.events(spark, dir)
      .select(col("user_id"), (col("user_id") % 2 === 0).as("treated"),
        qdec(col("value"), 7, 2).as("v"))
      .groupBy("user_id", "treated")
      .agg((sum(col("v")).cast("decimal(18,2)") * 100)
          .cast("decimal(38,0)").as("x"),
        count(lit(1)).cast("decimal(38,0)").as("y"))
    val arms = u.groupBy("treated").agg(
      count(lit(1)).as("n"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(expr("cast(x * x as decimal(38,0))")).as("sxx"),
      sum(expr("cast(y * y as decimal(38,0))")).as("syy"),
      sum(expr("cast(x * y as decimal(38,0))")).as("sxy"))
    val withVar = arms
      .withColumn("ratio", qround(
        expr("cast(sx as double)") / expr("cast(sy as double)"), 6))
      .withColumn("ybar", expr("cast(sy as double)") / col("n"))
      .withColumn("var_r", qround(
        (expr("cast(n * sxx - sx * sx as double)") /
          expr("cast(cast(n as decimal(38,0)) * (n - 1) as double)") -
         lit(2.0) * col("ratio") *
          expr("cast(n * sxy - sx * sy as double)") /
          expr("cast(cast(n as decimal(38,0)) * (n - 1) as double)") +
         col("ratio") * col("ratio") *
          expr("cast(n * syy - sy * sy as double)") /
          expr("cast(cast(n as decimal(38,0)) * (n - 1) as double)")) /
        (col("n") * col("ybar") * col("ybar")), 6))
    val t = withVar.filter(col("treated"))
      .select(col("n").as("n_t"), col("ratio").as("ratio_t"),
        col("var_r").as("var_t"))
    val c = withVar.filter(!col("treated"))
      .select(col("n").as("n_c"), col("ratio").as("ratio_c"),
        col("var_r").as("var_c"))
    t.crossJoin(c)
      .withColumn("diff", qround(col("ratio_t") - col("ratio_c"), 6))
      .withColumn("se", qround(sqrt(col("var_t") + col("var_c")), 6))
      .withColumn("ci_lo", qround(col("diff") - lit(1.96) * col("se"), 6))
      .withColumn("ci_hi", qround(col("diff") + lit(1.96) * col("se"), 6))
      .withColumn("significant", abs(col("diff")) > lit(1.96) * col("se"))
      .select("n_t", "n_c", "ratio_t", "ratio_c", "diff", "se",
        "ci_lo", "ci_hi", "significant")
  }

  /** q268 — duplicate-charge detector: pairs of purchases by the SAME
    * user for the SAME whole-dollar amount within 24 h — the first rule
    * every billing-ops review queue runs (retry storms, double-clicks,
    * reconciliation ghosts). The time window rides q196's bucketization
    * as an EQUI-join: the earlier event explodes onto its own and the
    * next 24 h bucket, the later event maps to one, so every
    * within-window pair matches exactly once and the canonical
    * earlier-first order (ts, then id) needs no dedup — a raw
    * |Δt| ≤ 24 h theta-join would plan a per-user nested loop. Amounts
    * are exact floor-dollars from the cents quantizer; gap in whole
    * seconds. */
  val q268: Q = (spark, dir) => {
    val wNs = 86400000000000L // 24 h
    val p = Tables.events(spark, dir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts"),
        expr("cast((cast(floor(value * 100.0 + 0.5) as bigint)) div 100 as bigint)")
          .as("dollars"))
    val a = p.select(col("user_id"), col("dollars"),
        col("event_id").as("id_a"), col("ts").as("ts_a"))
      .withColumn("bkt", explode(array(
        expr(s"ts_a div $wNs"), expr(s"ts_a div $wNs + 1"))))
    val b = p.select(col("user_id"), col("dollars"),
        col("event_id").as("id_b"), col("ts").as("ts_b"))
      .withColumn("bkt", expr(s"ts_b div $wNs"))
    a.join(b, Seq("user_id", "dollars", "bkt"))
      .filter(col("ts_b") >= col("ts_a") &&
        col("ts_b") - col("ts_a") <= wNs &&
        (col("ts_a") < col("ts_b") ||
         (col("ts_a") === col("ts_b") && col("id_a") < col("id_b"))))
      .select(col("user_id"), col("dollars"), col("id_a"), col("id_b"),
        expr("(ts_b - ts_a) div 1000000000").as("gap_s"))
      .orderBy("user_id", "id_a", "id_b")
  }

  /** q269 — functional-dependency profiling: for each candidate FD
    * X→Y, how many X-keys map to MORE than one Y (the violation count
    * schema-discovery and dbt-style contract tools report) — q128's DQ
    * report checks DECLARED rules, this DISCOVERS which dependency
    * candidates actually hold (custkey→nationkey does; user→event_type
    * obviously doesn't — the degree of violation is the signal). One
    * distinct-pair aggregate per candidate (map-side partials make it
    * one exchange each); violation rates exact integer ppm. */
  val q269: Q = (spark, dir) => {
    def fd(df: DataFrame, name: String, lhs: String,
           rhs: String): DataFrame =
      df.select(col(lhs).as("l"), col(rhs).as("r")).distinct()
        .groupBy("l").agg(count(lit(1)).as("nr"))
        .agg(count(lit(1)).as("n_keys"),
          sum(when(col("nr") > 1, 1L).otherwise(0L)).as("n_violating"))
        .select(lit(name).as("fd"), col("n_keys"), col("n_violating"),
          expr("cast((2 * n_violating * 1000000 + n_keys) div (2 * n_keys) as bigint)")
            .as("violation_ppm"))
    fd(Tables.customer(spark, dir), "customer.custkey->nationkey",
        "c_custkey", "c_nationkey")
      .unionByName(fd(Tables.orders(spark, dir),
        "orders.custkey->orderpriority", "o_custkey", "o_orderpriority"))
      .unionByName(fd(Tables.lineitem(spark, dir),
        "lineitem.partkey->suppkey", "l_partkey", "l_suppkey"))
      .unionByName(fd(Tables.events(spark, dir),
        "events.user->event_type", "user_id", "event_type"))
      .orderBy("fd")
  }

  /** q280 — Cramér's V effect size for the lang × source association:
    * the "is the dependence MATERIAL" companion to q143's χ²
    * significance — at corpus scale everything is significant, and V =
    * √(χ²/(n·(min(r,c)−1))) ∈ [0,1] is the number analysts actually
    * act on, with the conventional effect bands attached. χ² arrives
    * through q143's exact-decimal contribution sum; V adds one
    * mirrored IEEE sqrt over it. */
  val q280: Q = (spark, dir) => {
    val chi2 = graft.metrics.Contingency.chiSquare(
        Tables.documents(spark, dir), col("lang"), col("source"))
      .agg(max(col("chi2")).as("chi2"))
    val dims = Tables.documents(spark, dir)
      .agg(countDistinct(col("lang")).as("nr"),
        countDistinct(col("source")).as("nc"),
        count(lit(1)).as("n"))
    dims.crossJoin(broadcast(chi2))
      .withColumn("cramers_v", qround(sqrt(col("chi2") /
        (col("n").cast("double") *
          (least(col("nr"), col("nc")) - 1).cast("double"))), 6))
      .withColumn("effect",
        when(col("cramers_v") < 0.1, "negligible")
          .when(col("cramers_v") < 0.3, "small")
          .when(col("cramers_v") < 0.5, "medium").otherwise("large"))
      .select("n", "nr", "nc", "chi2", "cramers_v", "effect")
  }

  /** q281 — attribution-window sensitivity sweep: the share of
    * purchases that have a same-user click within W for
    * W ∈ {1 h, 6 h, 24 h, 72 h} — the q230 threshold-sweep discipline
    * applied to attribution policy (if the rate cliffs between 6 h and
    * 24 h, the window choice IS the marketing number). ONE interleaved
    * pass: a running last-click timestamp per user (ordered window
    * max over click rows only), each purchase's gap read off it, four
    * conditional counts — no per-window rescan, no pair join at all
    * (q148/q268 build pairs because they need per-pair rows; a sweep
    * only needs the minimum gap). Exact integer ns gaps and ppm
    * rates. */
  val q281: Q = (spark, dir) => {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val e = Tables.events(spark, dir)
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type"))
      .withColumn("last_click",
        max(when(col("event_type") === "click", col("ts"))).over(w))
    val hourNs = 3600000000000L
    val p = e.filter(col("event_type") === "purchase")
      .withColumn("gap", col("ts") - col("last_click"))
    p.agg(count(lit(1)).as("n_purchases"),
        sum(when(col("gap") <= lit(1L * hourNs), 1L).otherwise(0L))
          .as("w_1h"),
        sum(when(col("gap") <= lit(6L * hourNs), 1L).otherwise(0L))
          .as("w_6h"),
        sum(when(col("gap") <= lit(24L * hourNs), 1L).otherwise(0L))
          .as("w_24h"),
        sum(when(col("gap") <= lit(72L * hourNs), 1L).otherwise(0L))
          .as("w_72h"))
      .select(col("n_purchases"),
        col("w_1h"), col("w_6h"), col("w_24h"), col("w_72h"),
        expr("cast((2 * w_1h * 1000000 + n_purchases) div (2 * n_purchases) as bigint)").as("rate_1h_ppm"),
        expr("cast((2 * w_6h * 1000000 + n_purchases) div (2 * n_purchases) as bigint)").as("rate_6h_ppm"),
        expr("cast((2 * w_24h * 1000000 + n_purchases) div (2 * n_purchases) as bigint)").as("rate_24h_ppm"),
        expr("cast((2 * w_72h * 1000000 + n_purchases) div (2 * n_purchases) as bigint)").as("rate_72h_ppm"))
  }

  /** q282 — histogram intersection similarity between event types'
    * value distributions: HI(a,b) = Σ_bins min(pₐ, p_b) ∈ [0,1] — the
    * classic distribution-overlap measure that reads directly as
    * "fraction of probability mass shared" where q115's PSI and q158's
    * KS read as divergences. EXACT rational arithmetic throughout: with
    * integer bin counts c and totals n, min(cₐ/nₐ, c_b/n_b) over the
    * common denominator nₐ·n_b is min(cₐ·n_b, c_b·nₐ), summed as exact
    * integers, emitted through the half-up ppm idiom — no float ever
    * touches the surface. 10-unit value bins; all 10 type pairs. */
  val q282: Q = (spark, dir) => {
    val e = Tables.events(spark, dir)
      .select(col("event_type"),
        expr("cast(floor(value * 100.0 + 0.5) as bigint) div 1000")
          .as("bin"))
    val h = e.groupBy("event_type", "bin").agg(count(lit(1)).as("c"))
      .withColumn("n", sum(col("c")).over(
        Window.partitionBy("event_type")))
    val a = h.select(col("event_type").as("type_a"), col("bin"),
      col("c").as("ca"), col("n").as("na"))
    val b = h.select(col("event_type").as("type_b"), col("bin"),
      col("c").as("cb"), col("n").as("nb"))
    a.join(b, Seq("bin"))
      .filter(col("type_a") < col("type_b"))
      .groupBy("type_a", "type_b")
      .agg(sum(expr(
          "least(cast(ca as decimal(38,0)) * nb, cast(cb as decimal(38,0)) * na)"))
          .cast("decimal(38,0)").as("min_sum"),
        max(expr("cast(na as decimal(38,0)) * nb")).cast("decimal(38,0)")
          .as("den"))
      .select(col("type_a"), col("type_b"),
        expr("cast((2 * min_sum * 1000000 + den) div (2 * den) as bigint)")
          .as("intersection_ppm"))
      .orderBy("type_a", "type_b")
  }

  /** q283 — burstiness audit (index of dispersion / Fano factor) of
    * daily event counts per type: Var/Mean = 1 for a Poisson arrival
    * process, > 1 means bursty traffic, < 1 means suspiciously regular
    * (bot-like) — the one-scalar arrival-process diagnostic behind
    * capacity planning and bot detection. Daily counts are exact
    * integers; the sample-variance-to-mean ratio reduces to
    * n·(n·Σx² − (Σx)²) / ((n−1)·(Σx)²·... ) — computed as one mirrored
    * IEEE expression over the exact integer moments, quantized once. */
  val q283: Q = (spark, dir) => {
    val daily = Tables.events(spark, dir)
      .groupBy(col("event_type"), expr("ts div 86400000000000").as("day"))
      .agg(count(lit(1)).as("x"))
    daily.groupBy("event_type")
      .agg(count(lit(1)).as("n_days"),
        sum(col("x").cast("decimal(38,0)")).as("sx"),
        sum((col("x").cast("decimal(38,0)") * col("x"))
          .cast("decimal(38,0)")).as("sxx"))
      .withColumn("mean_daily", qround(
        expr("cast(sx as double)") / col("n_days").cast("double"), 6))
      .withColumn("fano", qround(
        (expr("cast(n_days * sxx - sx * sx as double)") /
          expr("cast(cast(n_days as decimal(38,0)) * (n_days - 1) as double)")) /
        (expr("cast(sx as double)") / col("n_days").cast("double")), 6))
      .withColumn("verdict",
        when(col("fano") > 1.5, "bursty")
          .when(col("fano") < 0.67, "regular").otherwise("poisson_like"))
      .select("event_type", "n_days", "mean_daily", "fano", "verdict")
      .orderBy("event_type")
  }

  /** q285 — longest-activity-streak report per user: consecutive-day
    * islands over distinct active days (day − row_number is constant
    * within a run — the classic gaps-and-islands key, all integer),
    * with streak count, total active days, and the longest streak's
    * start (ties to the LATEST start, pinned identically by the
    * struct-max and the oracle's rank order) — the engagement metric
    * every habit-loop dashboard leads with. One user_id exchange end
    * to end. */
  val q285: Q = (spark, dir) => {
    val d = Tables.events(spark, dir)
      .select(col("user_id"), expr("ts div 86400000000000").as("day"))
      .distinct()
    val w = Window.partitionBy("user_id").orderBy("day")
    d.withColumn("grp", col("day") - row_number().over(w))
      .groupBy("user_id", "grp")
      .agg(count(lit(1)).as("len"), min(col("day")).as("start_day"))
      .groupBy("user_id")
      .agg(max(col("len")).as("longest_streak"),
        count(lit(1)).as("n_streaks"),
        sum(col("len")).as("n_active_days"),
        max(struct(col("len"), col("start_day"))).as("b"))
      .select(col("user_id"), col("longest_streak"), col("n_streaks"),
        col("n_active_days"), col("b.start_day").as("longest_start_day"))
      .orderBy("user_id")
  }

  /** q335 — Welch two-sample t-test on per-user purchase spend between
    * the canonical A/B arms ([[graft.functions.GraftFunctions.abVariant]]
    * — the same split q308 certifies and q131 reads): the
    * unequal-variance test that replaces q131's pooled z when arm
    * variances differ, with the Satterthwaite degrees of freedom. The
    * user grain (all event users, zero-imputed spend — the q290
    * convention: the denominator is the full arm, not the self-selected
    * purchasers) makes rows independent. Sufficient statistics are
    * exact: Σcents BIGINT, Σcents² through DECIMAL(19,0)²→(38,0); t and
    * df are one textually-mirrored IEEE formula each from those exact
    * operands. One user-grain aggregate → 2-row arm frame → 1-row
    * output — the 100 TB shape. */
  val q335: Q = (spark, dir) => {
    import graft.functions.GraftFunctions.abVariant
    def d19(c: org.apache.spark.sql.Column) = c.cast("decimal(19,0)")
    val u = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), col("value"))
      .groupBy("user_id")
      .agg(sum(when(col("event_type") === "purchase",
        floor(col("value") * 100.0 + lit(0.5))).otherwise(0L))
        .as("cents"))
      .select(abVariant(col("user_id")).as("arm"), col("cents"))
    val arms = u.groupBy("arm")
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("s"),
        sum((d19(col("cents")) * d19(col("cents")))
          .cast("decimal(38,0)")).as("q"))
    // ONE-ROW conditional pivot, not filter+crossJoin (fuzz gate, r13):
    // with an arm entirely absent the crossJoin emitted ZERO rows while
    // the oracle's scalar subqueries emit one NULL-armed row — the
    // global aggregate below always returns exactly one row, NULLs
    // where an arm is missing, the oracle's exact shape.
    def armCol(arm: String, c: String) =
      max(when(col("arm") === arm, col(c)))
    val ab = arms.agg(
      armCol("A", "n").as("n_a"), armCol("A", "s").as("s_a"),
      armCol("A", "q").as("q_a"),
      armCol("B", "n").as("n_b"), armCol("B", "s").as("s_b"),
      armCol("B", "q").as("q_b"))
    // Degenerate-arm guards (fuzz gate, r13): variance needs n ≥ 2,
    // t and df need positive variance — DuckDB's double x/0 is NULL
    // natively, so the guards mirror the oracle's NULLs instead of
    // throwing ANSI DIVIDE_BY_ZERO on a one-user or zero-variance arm.
    val dfDenom = (col("va") / col("n_a")) * (col("va") / col("n_a")) /
      (col("n_a") - 1) +
      (col("vb") / col("n_b")) * (col("vb") / col("n_b")) /
      (col("n_b") - 1)
    ab
      .withColumn("va", when(col("n_a") > 1,
        (expr("cast(q_a as double)") -
          expr("cast(cast(s_a as decimal(38,0)) * s_a as double)") /
            col("n_a")) / (col("n_a") - 1)))
      .withColumn("vb", when(col("n_b") > 1,
        (expr("cast(q_b as double)") -
          expr("cast(cast(s_b as decimal(38,0)) * s_b as double)") /
            col("n_b")) / (col("n_b") - 1)))
      .withColumn("se2", col("va") / col("n_a") + col("vb") / col("n_b"))
      .withColumn("tstat", when(col("se2") > 0.0,
        (col("s_a").cast("double") / col("n_a") -
          col("s_b").cast("double") / col("n_b")) / sqrt(col("se2"))))
      .select(col("n_a"), col("n_b"),
        qround(col("s_a").cast("double") / col("n_a"), 6)
          .as("mean_a_cents"),
        qround(col("s_b").cast("double") / col("n_b"), 6)
          .as("mean_b_cents"),
        qround(col("va"), 6).as("var_a"),
        qround(col("vb"), 6).as("var_b"),
        qround(col("tstat"), 6).as("t_stat"),
        qround(when(dfDenom > 0.0, col("se2") * col("se2") / dfDenom), 6)
          .as("df_welch"),
        when(abs(col("tstat")) > 1.96, 1L).otherwise(0L)
          .as("significant"))
  }

  /** q336 — Brown–Forsythe variance-homogeneity test across nations on
    * customer account balances: Levene's W with MEDIAN centering (the
    * robust variant), the gatekeeper before a pooled-variance ANOVA.
    * Per-nation medians use the repo's lower-median distinct-value walk
    * (cum count ≥ ⌈n/2⌉, all integer — the q167 shape, no global row
    * sort), so every |x − med| deviation is an EXACT integer in cents;
    * group terms enter double once each from exact longs, quantized via
    * the saturation-free qdecWide to DECIMAL(38,2) before the order-free
    * cross-group sums (VERDICT r11 #3). The F bar is
    * pinned at 1.5173 = χ²₀.₀₅,₂₄/24 — the dof₁ = 24 fixture value,
    * asserted in the flag's CASE like q319's 9.488. */
  val q336: Q = (spark, dir) => {
    def d19(c: org.apache.spark.sql.Column) = c.cast("decimal(19,0)")
    val x = Tables.customer(spark, dir)
      .select(col("c_nationkey").as("g"),
        floor(col("c_acctbal") * 100.0 + lit(0.5)).as("cents"))
    val byVal = x.groupBy("g", "cents").agg(count(lit(1)).as("cnt"))
    val cum = byVal
      .withColumn("cum", sum(col("cnt")).over(
        Window.partitionBy("g").orderBy("cents")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("n_g", sum(col("cnt")).over(Window.partitionBy("g")))
    val med = cum.filter(col("cum") >= expr("(n_g + 1) div 2"))
      .groupBy("g").agg(min(col("cents")).as("med"))
    val z = x.join(med, "g")
      .select(col("g"), abs(col("cents") - col("med")).as("z"))
    val grp = z.groupBy("g")
      .agg(count(lit(1)).as("n"), sum(col("z")).as("sz"),
        sum((d19(col("z")) * d19(col("z"))).cast("decimal(38,0)"))
          .as("sz2"))
    val tot = grp.agg(sum(col("n")).as("nn"), sum(col("sz")).as("szz"),
      count(lit(1)).as("k"))
    // Group terms reach ~10¹²–10¹⁶ cents² and grow ~n_g·var with SF, so
    // they go through the SATURATION-FREE quantizer (qdecWide, VERDICT
    // r11 #3): qround's floor(x·100) long intermediate would saturate at
    // Long.Max/10² ≈ 9.2e16 — reachable near sf100, where DuckDB's
    // all-double floor keeps going and the engines diverge. qdecWide
    // floors via the IEEE-exact y − fmod(y,1) identity (both terms are
    // ≥ 0: a square and a Cauchy–Schwarz-nonneg variance numerator), so
    // there is no long, no ceiling, and no cross-engine divergence at
    // ANY scale factor; below 2⁵³ it is bit-identical to the old path,
    // and the ±0.005 slop stays ~10⁻¹¹ relative — invisible at the
    // 6 dp F output.
    val terms = grp.crossJoin(broadcast(tot))
      .withColumn("bterm", qdecWide(col("n") *
        (col("sz").cast("double") / col("n") -
          col("szz").cast("double") / col("nn")) *
        (col("sz").cast("double") / col("n") -
          col("szz").cast("double") / col("nn")), 38, 2))
      .withColumn("wterm", qdecWide(
        expr("cast(sz2 as double)") -
          expr("cast(cast(sz as decimal(38,0)) * sz as double)") /
            col("n"), 38, 2))
    terms.groupBy("nn", "k")
      .agg(sum(col("bterm")).as("bsum"), sum(col("wterm")).as("wsum"))
      .select(col("k"), col("nn").as("n_total"),
        (col("k") - 1).cast("long").as("dof1"),
        (col("nn") - col("k")).cast("long").as("dof2"),
        qround((col("nn") - col("k")).cast("double") /
          (col("k") - 1).cast("double") *
          col("bsum").cast("double") / col("wsum").cast("double"), 6)
          .as("f_stat"),
        when(col("k") - 1 === 24 &&
          (col("nn") - col("k")).cast("double") /
            (col("k") - 1).cast("double") *
            col("bsum").cast("double") / col("wsum").cast("double")
            > 1.5173, 1L).otherwise(0L).as("significant"))
  }

  /** q337 — Jarque–Bera normality test per event type on purchase-scale
    * values: JB = n/6·(S² + (K−3)²/4) from skewness S and kurtosis K —
    * the one-line normality screen q207's moment profile feeds. Raw
    * moments Σx..Σx⁴ ride exact cents integers widened through
    * DECIMAL(19,0) powers into DECIMAL(38,0) sums (x⁴ overflows BIGINT
    * per ROW at purchase scale); the central-moment assembly is one
    * mirrored IEEE expression from those exact operands; m2^1.5 is
    * written m2·√m2 so both engines issue the identical libm call. χ²
    * 2-dof bar 5.991. One scan, |types|-row output. */
  val q337: Q = (spark, dir) => {
    def d19(c: org.apache.spark.sql.Column) = c.cast("decimal(19,0)")
    val e = Tables.events(spark, dir)
      .select(col("event_type"),
        floor(col("value") * 100.0 + lit(0.5)).as("c"))
      .withColumn("c1", d19(col("c")))
    val m = e.groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("c")).as("s1"),
        sum((col("c1") * col("c1")).cast("decimal(38,0)")).as("s2"),
        sum((col("c1") * col("c1") * col("c1")).cast("decimal(38,0)"))
          .as("s3"),
        sum((col("c1") * col("c1") * col("c1") * col("c1"))
          .cast("decimal(38,0)")).as("s4"))
      .withColumn("mu", col("s1").cast("double") / col("n"))
      .withColumn("m2", expr("cast(s2 as double)") / col("n") -
        col("mu") * col("mu"))
      .withColumn("m3", expr("cast(s3 as double)") / col("n") -
        lit(3.0) * col("mu") * (expr("cast(s2 as double)") / col("n")) +
        lit(2.0) * col("mu") * col("mu") * col("mu"))
      .withColumn("m4", expr("cast(s4 as double)") / col("n") -
        lit(4.0) * col("mu") * (expr("cast(s3 as double)") / col("n")) +
        lit(6.0) * col("mu") * col("mu") *
          (expr("cast(s2 as double)") / col("n")) -
        lit(3.0) * col("mu") * col("mu") * col("mu") * col("mu"))
      .withColumn("skew", col("m3") / (col("m2") * sqrt(col("m2"))))
      .withColumn("kurt", col("m4") / (col("m2") * col("m2")))
      .withColumn("jb", col("n").cast("double") / 6.0 *
        (col("skew") * col("skew") +
          (col("kurt") - 3.0) * (col("kurt") - 3.0) / 4.0))
    m.select(col("event_type"), col("n"),
        qround(col("mu"), 6).as("mean_cents"),
        qround(col("skew"), 6).as("skewness"),
        qround(col("kurt"), 6).as("kurtosis"),
        qround(col("jb"), 6).as("jb_stat"),
        when(col("jb") > 5.991, 1L).otherwise(0L).as("reject_normal"))
      .orderBy("event_type")
  }

  /** q338 — Durbin–Watson serial-correlation test on the residuals of a
    * per-nation linear trend fit of daily revenue: DW = Σ(eₜ−eₜ₋₁)²/Σeₜ²
    * — the autocorrelation diagnostic that says whether q146-style OLS
    * standard errors can be trusted on a time series. The fit reuses the
    * memoized (nation, day) daily frame (calendar-bounded at any SF);
    * slope/intercept come from exact integer sums (day/cents products
    * widened to DECIMAL(38,0)); residuals are computed in DOLLARS and
    * quantized to 6 dp so every downstream difference and square starts
    * from bit-identical doubles, then quantized via the saturation-free
    * qdecWide to DECIMAL(38,2) before the order-free sums (VERDICT r11
    * #3). Verdict bands at the conventional 1.5/2.5. */
  val q338: Q = (spark, dir) => {
    val daily = SharedFrames.dailyNationRevenue(spark, dir)
      .select(col("nation"), col("day"),
        (col("rev") * 100).cast("long").as("cents"))
    val s = daily.groupBy("nation")
      .agg(count(lit(1)).as("n"), sum(col("day")).as("st"),
        sum(col("cents")).as("sy"),
        sum((col("day").cast("decimal(19,0)") *
          col("cents").cast("decimal(19,0)")).cast("decimal(38,0)"))
          .as("sty"),
        sum((col("day").cast("decimal(19,0)") *
          col("day").cast("decimal(19,0)")).cast("decimal(38,0)"))
          .as("stt"))
      .withColumn("slope",
        expr("cast(cast(n as decimal(38,0)) * sty - cast(st as decimal(38,0)) * sy as double)") /
        expr("cast(cast(n as decimal(38,0)) * stt - cast(st as decimal(38,0)) * st as double)"))
      .withColumn("icept",
        (col("sy").cast("double") - col("slope") * col("st")) / col("n"))
      .select("nation", "n", "slope", "icept")
    val e = daily.join(s, "nation")
      .withColumn("res", qround(col("cents").cast("double") / 100.0 -
        (col("icept") + col("slope") * col("day")) / 100.0, 6))
      .withColumn("prev", lag(col("res"), 1).over(
        Window.partitionBy("nation").orderBy("day")))
      // Squared residuals reach ~10¹²⁺ dollars² and grow with SF, so
      // they go through the saturation-free quantizer (qdecWide,
      // VERDICT r11 #3 — see q336's note): no long intermediate, no
      // ~9.2e16 ceiling, identical engine/oracle doubles at any scale
      // factor; the slop stays ~1e-11 relative, invisible at the 6 dp
      // DW output. Both terms are squares, satisfying qdecWide's ≥ 0
      // input contract.
      .withColumn("d2", when(col("prev").isNotNull, qdecWide(
        (col("res") - col("prev")) * (col("res") - col("prev")), 38, 2)))
      .withColumn("e2", qdecWide(col("res") * col("res"), 38, 2))
    e.groupBy("nation")
      .agg(count(lit(1)).as("n_days"), max(col("slope")).as("b"),
        sum(col("d2")).as("sd"), sum(col("e2")).as("se"))
      .select(col("nation"), col("n_days"),
        qround(col("b") / 100.0, 6).as("slope_dollars_per_day"),
        qround(col("sd").cast("double") / col("se").cast("double"), 6)
          .as("dw"),
        when(col("sd").cast("double") / col("se").cast("double") < 1.5,
          "positive_autocorr")
          .when(col("sd").cast("double") / col("se").cast("double") > 2.5,
            "negative_autocorr").otherwise("none").as("verdict"))
      .orderBy("nation")
  }

  /** q339 — Cochran–Armitage trend test: does order-failure rate TREND
    * across ordered account-balance bands (scores 0..4)? The ordered
    * sibling of q143's unordered χ² — more powerful when the alternative
    * is monotone. Every sufficient statistic (T = Σsᵢrᵢ, A = Σsᵢnᵢ,
    * B = Σsᵢ²nᵢ, R, N) is an exact BIGINT; z² rides one mirrored IEEE
    * formula and flags at the 1-dof 3.841 bar. Per-band rows carry the
    * rates, the statistic repeats via a broadcast of the 1-row stat
    * frame — one fact scan, |bands|-row output. */
  val q339: Q = (spark, dir) => {
    val rows = Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir),
        col("o_custkey") === col("c_custkey"))
      .select(
        when(col("c_acctbal") < 0, 0L)
          .when(col("c_acctbal") < 2500, 1L)
          .when(col("c_acctbal") < 5000, 2L)
          .when(col("c_acctbal") < 7500, 3L)
          .otherwise(4L).as("band"),
        when(col("o_orderstatus") === "F", 1L).otherwise(0L).as("y"))
    val bands = rows.groupBy("band")
      .agg(count(lit(1)).as("n_orders"), sum(col("y")).as("n_failed"))
    val stat = bands.agg(
        sum(col("n_orders")).as("nn"), sum(col("n_failed")).as("rr"),
        sum(col("band") * col("n_failed")).as("t"),
        sum(col("band") * col("n_orders")).as("a"),
        sum(col("band") * col("band") * col("n_orders")).as("b2"))
      .withColumn("num", col("t").cast("double") -
        col("rr").cast("double") * col("a") / col("nn"))
      .withColumn("den", sqrt(
        (col("rr").cast("double") / col("nn")) *
        (lit(1.0) - col("rr").cast("double") / col("nn")) *
        (col("b2").cast("double") -
          col("a").cast("double") * col("a") / col("nn"))))
      .select(
        qround(col("num") / col("den"), 6).as("z_trend"),
        qround(col("num") / col("den") * (col("num") / col("den")), 6)
          .as("chi2_trend"),
        when(col("num") / col("den") * (col("num") / col("den")) > 3.841,
          1L).otherwise(0L).as("significant"))
    bands
      .withColumn("fail_rate", qround(
        col("n_failed").cast("double") / col("n_orders"), 6))
      .crossJoin(broadcast(stat))
      .orderBy("band")
  }

  /** q341 — local clustering coefficient per part in the co-purchase
    * graph: C(v) = 2·T(v) / (deg(v)·(deg(v)−1)) — how close each node's
    * neighbourhood is to a clique, the standard "is this a community
    * hub or a broadcast hub" readout next to q104's raw triangle
    * counts and q246's global assortativity. Reuses the memoized
    * [[partCoEdges]] and the degree-oriented triangle counter (wedge
    * volume O(m^{3/2}), never per-node neighbourhood materialization);
    * degrees come from one explode+groupBy over the edge list. Exact
    * integer T and deg; the coefficient is one mirrored IEEE divide,
    * 6 dp. Top-50 by coefficient with degree/id tiebreaks pinned. */
  val q341: Q = (spark, dir) => {
    val edges = partCoEdges(spark, dir)
    val deg = edges
      .select(explode(array(col("src"), col("dst"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("degree"))
    val tri = Triangles.triangleCounts(edges)
      .select(col("node").cast("long").as("node"), col("n_triangles"))
    deg.join(tri, Seq("node"), "left")
      .select(col("node").cast("long").as("part_key"), col("degree"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"),
        when(col("degree") >= 2,
          qround(lit(2.0) * coalesce(col("n_triangles"), lit(0L)) /
            (col("degree") * (col("degree") - 1)), 6))
          .otherwise(lit(0.0)).as("clustering"))
      .orderBy(desc("clustering"), desc("degree"), col("part_key"))
      .limit(50)
  }

  /** q346 — retention half-life per cohort: fit ln(retention) ~ offset
    * by closed-form OLS over q46's triangle (offsets ≥ 1, base = the
    * offset-0 cohort size) and report t½ = −ln2/slope — the one-number
    * decay summary a growth dashboard quotes beside the raw triangle.
    * Log terms quantize to DECIMAL(28,9) once per cell (cells are
    * weeks²-bounded, so everything after the q46 aggregate is
    * dimension-sized); Σx/Σx² are exact BIGINT, Σl/Σxl exact decimals;
    * slope and t½ are one mirrored IEEE expression each. Cohorts whose
    * retention doesn't decay (slope ≥ 0) report NULL half-life rather
    * than a negative time. */
  val q346: Q = (spark, dir) => {
    val ret = Cohort.retention(Tables.events(spark, dir), "user_id", "ts")
    val base = ret.filter(col("week_offset") === 0)
      .select(col("cohort_week"), col("active_users").as("base_users"))
    val pts = ret.filter(col("week_offset") >= 1)
      .join(base, "cohort_week")
      .filter(col("active_users") > 0)
      // Narrow decimals so EVERY product below stays within precision
      // 38 with scale 9 PRESERVED: Spark silently truncates the scale
      // when p1+p2+1 > 38 (observed: sxl -0.026756 vs the exact
      // -0.026755952 with a (28,9) l). l(15,9)*offset(6,0) -> (22,9),
      // summed (32,9); n(4,0)*sxl(32,9) -> (37,9); sx(6,0)*sl(25,9) ->
      // (32,9); the numerator difference lands exactly in (38,9).
      .withColumn("l", qdec(log(col("active_users").cast("double") /
        col("base_users").cast("double")), 15, 9))
    val s = pts.groupBy("cohort_week", "base_users")
      .agg(count(lit(1)).as("n"), sum(col("week_offset")).as("sx"),
        sum(col("l")).as("sl"),
        sum(col("l") * col("week_offset").cast("decimal(6,0)")).as("sxl"),
        sum(col("week_offset") * col("week_offset")).as("sxx"))
      .filter(col("n") >= 2)
      // The OLS numerator n·Σxl − Σx·Σl cancels catastrophically in
      // double (two close products), and 1/slope amplifies the engines'
      // ulp-level disagreement into the 6th decimal of the half-life
      // (observed at sf0.01). So: numerator and denominator EXACT in
      // decimal/long, ONE cast each, and the slope 9 dp-quantized
      // before anything downstream (sign test and reciprocal included)
      // reads it — both engines then derive from the identical double.
      .withColumn("slope", qround(
        (col("n").cast("decimal(4,0)") * col("sxl") -
          col("sx").cast("decimal(6,0)") * col("sl")).cast("double") /
        (col("n") * col("sxx") - col("sx") * col("sx")).cast("double"), 9))
    s.select(col("cohort_week"), col("base_users"),
        col("n").as("n_points"),
        qround(col("slope"), 6).as("decay_slope"),
        when(col("slope") < 0,
          qround(-log(lit(2.0)) / col("slope"), 6)).as("half_life_weeks"))
      .orderBy("cohort_week")
  }

  /** q348 — referential-integrity audit across the star schema's five
    * FK relations: per relation the child row count, orphan count
    * (child keys with no parent — a broadcast-able LEFT ANTI, the
    * parent side is key-distinct), and the orphan rate in exact ppm.
    * The DQ readout q128's single-table constraints don't cover; on
    * this synthetic fixture every relation must audit CLEAN, which
    * gates the zero side exactly like q286's planted-PII convention.
    * Five independent anti-joins, each one fact scan with the parent
    * key set broadcast; |relations|-row output. */
  val q348: Q = (spark, dir) => {
    def audit(name: String, child: DataFrame, key: String,
              parent: DataFrame, pkey: String): DataFrame = {
      val c = child.select(col(key).as("k"))
      val orphans = c.join(
        broadcast(parent.select(col(pkey).as("k")).distinct()),
        Seq("k"), "left_anti")
      c.agg(count(lit(1)).as("n_child"))
        .crossJoin(orphans.agg(count(lit(1)).as("n_orphans")))
        .select(lit(name).as("relation"), col("n_child"), col("n_orphans"),
          expr("cast((2 * n_orphans * 1000000 + n_child) div (2 * n_child) as bigint)")
            .as("orphan_ppm"))
    }
    Seq(
      audit("customer.nationkey->nation", Tables.customer(spark, dir),
        "c_nationkey", Tables.nation(spark, dir), "n_nationkey"),
      audit("orders.custkey->customer", Tables.orders(spark, dir),
        "o_custkey", Tables.customer(spark, dir), "c_custkey"),
      audit("lineitem.orderkey->orders", Tables.lineitem(spark, dir),
        "l_orderkey", Tables.orders(spark, dir), "o_orderkey"),
      audit("lineitem.partkey->part", Tables.lineitem(spark, dir),
        "l_partkey", Tables.part(spark, dir), "p_partkey"),
      audit("lineitem.suppkey->supplier", Tables.lineitem(spark, dir),
        "l_suppkey", Tables.supplier(spark, dir), "s_suppkey"))
      .reduce(_ unionByName _)
      .orderBy("relation")
  }

  /** q357 — Wilcoxon signed-rank test on paired per-user spend (post-cut
    * vs pre-cut purchase cents, the q290 period split): the
    * nonparametric paired sibling of q335's Welch t — ranks |Δ| instead
    * of trusting the spend distribution's tails. Rank assignment uses
    * the q319 distinct-value ECDF identity (2·avgrank(v) = 2·F(v) +
    * c(v) + 1, exact INTEGER), so 2·W⁺ = Σ_{Δ>0} (2F+c+1) is exact
    * BIGINT whatever the partition order; zero differences drop (the
    * standard convention); the tie-corrected z rides ONE mirrored IEEE
    * formula from exact integer moments, flagged at 1.96. The only
    * unpartitioned window walks distinct |Δ| VALUES, never rows. */
  val q357: Q = (spark, dir) => {
    val cutNs = 1705363200000000000L // the q290 period boundary
    val d = Tables.events(spark, dir)
      .groupBy("user_id")
      .agg(
        sum(when(col("event_type") === "purchase" && col("ts") < cutNs,
          floor(col("value") * 100.0 + lit(0.5))).otherwise(0L)).as("pre"),
        sum(when(col("event_type") === "purchase" && col("ts") >= cutNs,
          floor(col("value") * 100.0 + lit(0.5))).otherwise(0L))
          .as("post"))
      .select((col("post") - col("pre")).as("diff"))
      .filter(col("diff") =!= 0)
      .select(abs(col("diff")).as("a"),
        when(col("diff") > 0, 1L).otherwise(0L).as("pos"))
    val byVal = d.groupBy("a")
      .agg(count(lit(1)).as("c"), sum(col("pos")).as("n_pos"))
    val wv = Window.orderBy("a")
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = byVal
      .withColumn("f", coalesce(sum(col("c")).over(wv), lit(0L)))
      .withColumn("w2term", col("n_pos") * (col("f") * 2 + col("c") + 1))
      .withColumn("t3term",
        col("c").cast("decimal(19,0)") * col("c") * col("c") - col("c"))
    val s = ranked.agg(
        sum(col("c")).as("n"), sum(col("w2term")).as("w2"),
        sum(col("t3term")).as("tie3"))
      .withColumn("mean2", col("n").cast("double") * (col("n") + 1) / 2.0)
      .withColumn("var4",
        (col("n").cast("double") * (col("n") + 1) * (col("n") * 2 + 1)
          - expr("cast(tie3 as double)") / 2.0) / 6.0)
      .withColumn("z",
        (col("w2").cast("double") - col("mean2")) / sqrt(col("var4")))
    s.select(col("n").as("n_nonzero_pairs"),
        col("w2").as("w_plus_x2"),
        qround(col("z"), 6).as("z_stat"),
        when(abs(col("z")) > 1.96, 1L).otherwise(0L).as("significant"))
  }

  /** q361 — negative-binomial overdispersion fit per event type: where
    * q283's Fano factor only FLAGS burstiness, this fits the NB moment
    * estimators r = m²/(v−m), p = r/(r+m) on the daily counts — the
    * parameters a capacity planner or synthetic-load generator consumes.
    * Types whose sample variance does not exceed the mean get NULL
    * parameters and a `poisson_consistent` verdict (the moment fit is
    * undefined there). Exact DECIMAL moments, one mirrored IEEE formula
    * per parameter, |types|-row output. */
  val q361: Q = (spark, dir) => {
    val daily = Tables.events(spark, dir)
      .groupBy(col("event_type"), expr("ts div 86400000000000").as("day"))
      .agg(count(lit(1)).as("x"))
    val m = daily.groupBy("event_type")
      .agg(count(lit(1)).as("n_days"),
        sum(col("x").cast("decimal(38,0)")).as("sx"),
        sum((col("x").cast("decimal(38,0)") * col("x"))
          .cast("decimal(38,0)")).as("sxx"))
      .withColumn("mean", expr("cast(sx as double)") / col("n_days"))
      .withColumn("variance",
        expr("cast(n_days * sxx - sx * sx as double)") /
          expr("cast(cast(n_days as decimal(38,0)) * (n_days - 1) as double)"))
    m.select(col("event_type"), col("n_days"),
        qround(col("mean"), 6).as("mean_daily"),
        qround(col("variance"), 6).as("var_daily"),
        when(col("variance") > col("mean"), qround(
          col("mean") * col("mean") / (col("variance") - col("mean")), 6))
          .as("nb_r"),
        when(col("variance") > col("mean"), qround(
          (col("mean") * col("mean") / (col("variance") - col("mean"))) /
            (col("mean") * col("mean") / (col("variance") - col("mean"))
              + col("mean")), 6)).as("nb_p"),
        when(col("variance") > col("mean"), "overdispersed")
          .otherwise("poisson_consistent").as("verdict"))
      .orderBy("event_type")
  }

  /** q364 — churn-baseline AUC: how well does pre-cut RECENCY alone
    * (seconds since a user's last pre-period event) rank post-period
    * churn (zero post-cut events)? The no-model baseline every churn
    * system must beat, and a true temporal eval: feature from the
    * pre-window, label from the post-window, so no leakage by
    * construction. The cut sits at 99 % of the calendar span (exact
    * integer ns arithmetic from the global min/max — the q290 fixed cut
    * leaves ZERO churners on this always-active fixture, an empty-class
    * divide), which churns ~half the users here. AUC/z via the shared
    * rank-sum machinery ([[graft.metrics.Auc.mannWhitneyU]] — exact
    * ties, integer until the final divides). One user-grain aggregate
    * plus a broadcast 1-row bounds frame. */
  val q364: Q = (spark, dir) => {
    val bounds = Tables.events(spark, dir)
      .agg(min(col("ts")).as("t0"), max(col("ts")).as("t1"))
      .select(expr("t0 + (t1 - t0) * 99 div 100").as("cut"))
    val u = Tables.events(spark, dir)
      .crossJoin(broadcast(bounds))
      .groupBy("user_id")
      .agg(max(when(col("ts") < col("cut"), col("ts"))).as("last_pre"),
        sum(when(col("ts") >= col("cut"), 1L).otherwise(0L)).as("n_post"),
        max(col("cut")).as("cut"))
      .filter(col("last_pre").isNotNull)
      .select(
        expr("(cut - last_pre) div 1000000000").as("recency_s"),
        (col("n_post") === 0).as("churned"))
    graft.metrics.Auc.mannWhitneyU(u, col("recency_s"),
        col("churned").cast("int"))
      .withColumnRenamed("n_pos", "n_churned")
      .withColumnRenamed("n_neg", "n_retained")
  }

  /** q372 — Simpson's-paradox audit: the global OLS slope of customer
    * spend on account balance vs every per-nation slope — how many
    * nations REVERSE the global sign (aggregation hiding a
    * within-group trend, the classic reporting trap q146's per-group
    * OLS can't see without the global reference). Sufficient
    * statistics are exact (cents longs, DECIMAL(38,0)-widened
    * products); each slope is one mirrored IEEE divide of exact
    * operands, so the sign comparison is gate-stable. One customer⋈
    * orders aggregate; |nations|-bounded everything after. */
  val q372: Q = (spark, dir) => {
    def d38(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    val spend = Tables.orders(spark, dir)
      .groupBy(col("o_custkey").as("c_custkey"))
      .agg(sum(floor(col("o_totalprice") * 100.0 + lit(0.5))).as("y"))
    val pts = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_nationkey").as("g"),
        floor(col("c_acctbal") * 100.0 + lit(0.5)).as("x"))
      .join(spend, Seq("c_custkey"), "left")
      .withColumn("y", coalesce(col("y"), lit(0L)))
    def sums(df: DataFrame, keys: Seq[String]): DataFrame =
      (if (keys.isEmpty) df.groupBy() else df.groupBy(keys.map(col): _*))
        .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
          sum(col("y")).as("sy"),
          sum((d38(col("x")) * col("y")).cast("decimal(38,0)")).as("sxy"),
          sum((d38(col("x")) * col("x")).cast("decimal(38,0)")).as("sxx"))
    def slope(c: DataFrame): DataFrame = c.withColumn("slope",
      expr("cast(cast(n as decimal(38,0)) * sxy - cast(sx as decimal(38,0)) * sy as double)") /
      expr("cast(cast(n as decimal(38,0)) * sxx - cast(sx as decimal(38,0)) * sx as double)"))
    val g = slope(sums(pts, Nil)).select(col("slope").as("global_slope"))
    val per = slope(sums(pts, Seq("g"))).filter(col("n") >= 2)
    per.crossJoin(broadcast(g))
      .agg(count(lit(1)).as("n_nations"),
        sum(when(col("slope") * col("global_slope") < 0, 1L)
          .otherwise(0L)).as("n_sign_reversed"),
        max(col("global_slope")).as("gs"))
      .select(col("n_nations"), col("n_sign_reversed"),
        qround(col("gs"), 9).as("global_slope"),
        expr("cast((2 * n_sign_reversed * 1000000 + n_nations) div (2 * n_nations) as bigint)")
          .as("reversed_ppm"),
        when(col("n_sign_reversed") > 0, 1L).otherwise(0L)
          .as("paradox_present"))
  }

  val queries: Map[String, Q] = Map(
    "q372_simpson_audit" -> q372,
    "q361_nb_overdispersion" -> q361,
    "q364_churn_recency_auc" -> q364,
    "q357_wilcoxon_signed_rank" -> q357,
    "q348_fk_integrity" -> q348,
    "q346_retention_halflife" -> q346,
    "q341_local_clustering" -> q341,
    "q335_welch_ttest" -> q335,
    "q336_brown_forsythe" -> q336,
    "q337_jarque_bera" -> q337,
    "q338_durbin_watson" -> q338,
    "q339_cochran_armitage" -> q339,
    "q285_activity_streaks" -> q285,
    "q282_histogram_intersection" -> q282,
    "q283_burstiness_fano" -> q283,
    "q280_cramers_v" -> q280,
    "q281_attribution_window_sweep" -> q281,
    "q269_fd_profile" -> q269,
    "q268_duplicate_charges" -> q268,
    "q265_ratio_metric_ci" -> q265,
    "q253_shapley_attribution" -> q253,
    "q254_scd2_increment" -> q254,
    "q252_sample_size" -> q252,
    "q246_assortativity" -> q246,
    "q248_cuped" -> q248,
    "q290_did_estimator" -> q290,
    "q291_ratio_metric_ci" -> q291,
    "q233_quantile_effect" -> q233,
    "q231_cohort_ltv" -> q231,
    "q226_bandit_replay" -> q226,
    "q222_diff_in_diffs" -> q222,
    "q143_chi_square" -> q143,
    "q144_feature_hashing" -> q144,
    "q148_decay_attribution" -> q148,
    "q204_position_attribution" -> q204,
    "q208_adamic_adar" -> q208,
    "q214_mann_whitney" -> q214,
    "q215_weighted_pagerank" -> q215,
    "q217_lpa_communities" -> q217,
    "q151_kaplan_meier" -> q151,
    "q46_cohort_retention" -> q46,
    "q47_fuzzy_names" -> q47,
    "q48_heavy_hitters" -> q48,
    "q49_pagerank" -> q49,
    "q200_personalized_pagerank" -> q200,
    "q100_merge_upsert" -> q100,
    "q101_column_profile" -> q101,
    "q103_incremental_mv" -> q103,
    "q104_triangle_counts" -> q104,
    "q105_scd2_history" -> q105,
    "q106_gap_fill" -> q106,
    "q171_linear_interp" -> q171,
    "q174_rolling_actives" -> q174,
    "q175_kcore_peel" -> q175,
    "q176_clamped_balance" -> q176,
    "q109_spend_outliers" -> q109,
    "q111_session_concurrency" -> q111,
    "q297_busy_time_union" -> q297,
    "q113_zorder_stats" -> q113,
    "q114_corr_matrix" -> q114,
    "q115_psi_drift" -> q115,
    "q158_ks_drift" -> q158,
    "q159_bfs_reach" -> q159,
    "q160_jaro_winkler" -> q160,
    "q117_next_event_rows" -> q117,
    "q118_pareto_customers" -> q118)

  /** One PageRank oracle iteration: rank_{cur}(v) = (1-d)/N + d·Σ r/deg
    * over in-edges — the same join-agg the engine runs. */
  /** One personalized-PageRank iteration as a CTE ([[prIter]]'s shape
    * with the teleport term gated on the seed flag). */
  private def pprIter(prev: String, cur: String): String =
    s"""$cur AS (
       |  SELECT n.node, n.is_seed,
       |    (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE))
       |      * (CASE WHEN n.is_seed THEN CAST(1.0 AS DOUBLE) / ns.k
       |              ELSE CAST(0.0 AS DOUBLE) END)
       |      + CAST(0.85 AS DOUBLE) * coalesce(c.s, CAST(0 AS DOUBLE)) AS r
       |  FROM sn n CROSS JOIN ns
       |  LEFT JOIN (
       |    SELECT e.dst AS node, sum(p.r / e.deg) AS s
       |    FROM ed e JOIN $prev p ON p.node = e.src
       |    GROUP BY e.dst) c ON c.node = n.node)""".stripMargin

  /** One edge-weighted PageRank iteration ([[prIter]] with w/wdeg
    * contribution splitting). */
  private def wprIter(prev: String, cur: String): String =
    s"""$cur AS (
       |  SELECT n.node,
       |    (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / nn.n
       |      + CAST(0.85 AS DOUBLE) * coalesce(c.s, CAST(0 AS DOUBLE)) AS r
       |  FROM nodes n CROSS JOIN ncount nn
       |  LEFT JOIN (
       |    SELECT e.dst AS node, sum(p.r * e.w / e.wdeg) AS s
       |    FROM ed e JOIN $prev p ON p.node = e.src
       |    GROUP BY e.dst) c ON c.node = n.node)""".stripMargin

  /** One synchronous label-propagation round: every node adopts the
    * most frequent neighbor label, ties to the smaller label. */
  private def lpaIter(prev: String, cur: String): String =
    s"""$cur AS (
       |  SELECT node, community FROM (
       |    SELECT node, community,
       |      row_number() OVER (PARTITION BY node
       |        ORDER BY votes DESC, community) AS rn
       |    FROM (SELECT node, community,
       |            CAST(count(*) AS BIGINT) AS votes
       |          FROM (SELECT e.src AS node, p.community
       |                FROM edges e JOIN $prev p ON p.node = e.dst
       |                UNION ALL
       |                SELECT node, community FROM $prev)
       |          GROUP BY 1, 2))
       |  WHERE rn = 1)""".stripMargin

  private def prIter(prev: String, cur: String): String =
    s"""$cur AS (
       |  SELECT n.node,
       |    (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / nn.n
       |      + CAST(0.85 AS DOUBLE) * coalesce(c.s, CAST(0 AS DOUBLE)) AS r
       |  FROM nodes n CROSS JOIN ncount nn
       |  LEFT JOIN (
       |    SELECT e.dst AS node, sum(p.r / e.deg) AS s
       |    FROM ed e JOIN $prev p ON p.node = e.src
       |    GROUP BY e.dst) c ON c.node = n.node)""".stripMargin

  /** q101 oracle: the same single-aggregate + melt, written as one stats
    * CTE and a UNION ALL stanza per column (generated — 5 identical
    * shapes). */
  private val profCols =
    Seq("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
  private def profOracle: String = {
    val measures = profCols.zipWithIndex.map { case (c, i) =>
      s"CAST(count($c) AS BIGINT) AS nn$i, " +
        s"CAST(count(DISTINCT $c) AS BIGINT) AS nd$i,\n  " +
        s"CAST(min($c) AS VARCHAR) AS mn$i, CAST(max($c) AS VARCHAR) AS mx$i"
    }.mkString(",\n  ")
    val rows = profCols.zipWithIndex.map { case (c, i) =>
      s"SELECT '$c' AS col_name, n_rows, n_rows - nn$i AS n_nulls, " +
        s"nd$i AS n_distinct, mn$i AS min_s, mx$i AS max_s FROM s"
    }.mkString("\nUNION ALL\n")
    s"""WITH c2 AS (SELECT c_custkey, c_name, c_nationkey,
       |  CAST(floor(c_acctbal * 100.0 + 0.5) / 100.0 AS DECIMAL(18,2)) AS c_acctbal, c_mktsegment
       |  FROM customer),
       |s AS (SELECT CAST(count(*) AS BIGINT) AS n_rows,
       |  $measures
       |FROM c2)
       |$rows
       |ORDER BY col_name""".stripMargin
  }

  /** The q113 oracle's Morton interleave, generated term-by-term —
    * shift/and/or on BIGINT is engine-neutral. */
  private def zSql(x: String, y: String, bits: Int): String =
    (0 until bits).map { i =>
      s"((($x >> $i) & 1) << ${2 * i}) | ((($y >> $i) & 1) << ${2 * i + 1})"
    }.mkString(" | ")

  /** q114 oracle: one UNION ALL stanza per pair (generated). */
  private val corrCols =
    Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
  private def corrOracle: String = {
    val stanzas = for {
      i <- corrCols.indices
      j <- (i + 1) until corrCols.size
    } yield {
      val (a, b) = (corrCols(i), corrCols(j))
      s"SELECT '$a' AS col_a, '$b' AS col_b, " +
        s"floor((corr($a, $b)) * 1000000.0 + 0.5) / 1000000.0 AS r FROM lineitem"
    }
    stanzas.mkString("\nUNION ALL\n") + "\nORDER BY col_a, col_b"
  }

  /** q233 oracle: one stanza per decile per cohort — quantile_cont
    * params must be constants in DuckDB. */
  private def qteOracle: String = {
    val stanzas = (1 to 9).map { d =>
      s"""SELECT ${d * 10} AS pctl,
         |  floor(quantile_cont(CASE WHEN treated THEN v END, ${d / 10.0})
         |    * 1000000.0 + 0.5) / 1000000.0 AS treated_q,
         |  floor(quantile_cont(CASE WHEN NOT treated THEN v END,
         |    ${d / 10.0}) * 1000000.0 + 0.5) / 1000000.0 AS control_q
         |FROM e""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH e AS (
       |  SELECT (user_id % 2 = 0) AS treated,
       |    CAST(CAST(floor(value * 100.0 + 0.5) / 100.0 AS DECIMAL(18,2))
       |      AS DOUBLE) AS v
       |  FROM events),
       |qs AS (
       |$stanzas)
       |SELECT pctl, treated_q, control_q,
       |  floor((treated_q - control_q) * 1000000.0 + 0.5) / 1000000.0
       |    AS qte
       |FROM qs ORDER BY pctl""".stripMargin
  }

  private lazy val scd2RebuildOracle =
    """WITH e AS (SELECT user_id, event_type, epoch_ns(ts) AS t, event_id
        |           FROM events),
        |r AS (SELECT user_id, event_type, t, event_id,
        |        CASE WHEN lag(event_type) OVER w IS NULL
        |               OR lag(event_type) OVER w <> event_type
        |             THEN 1 ELSE 0 END AS chg
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)),
        |s AS (SELECT user_id, event_type, t,
        |        sum(chg) OVER (PARTITION BY user_id ORDER BY t, event_id
        |                       ROWS UNBOUNDED PRECEDING) AS run_id
        |      FROM r),
        |g AS (SELECT user_id, run_id, min(event_type) AS event_type,
        |             min(t) AS vf
        |      FROM s GROUP BY 1, 2),
        |iv AS (SELECT user_id, event_type, vf, lead(vf) OVER w2 AS vt
        |       FROM g WINDOW w2 AS (PARTITION BY user_id ORDER BY run_id))
        |SELECT user_id, event_type,
        |       CAST(vf // 1000000000 AS BIGINT) AS valid_from_s,
        |       CAST(vt // 1000000000 AS BIGINT) AS valid_to_s,
        |       vt IS NULL AS is_current
        |FROM iv
        |ORDER BY user_id, valid_from_s, event_type,
        |         valid_to_s NULLS FIRST""".stripMargin

  val oracles: Map[String, String] = Map(
    "q372_simpson_audit" ->
      """WITH spend AS (
        |  SELECT o_custkey AS c_custkey,
        |    CAST(SUM(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
        |      AS BIGINT) AS y
        |  FROM orders GROUP BY 1),
        |pts AS (
        |  SELECT c_nationkey AS g,
        |    CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT) AS x,
        |    COALESCE(y, 0) AS y
        |  FROM customer LEFT JOIN spend USING (c_custkey)),
        |gs AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
        |    SUM(CAST(x AS DECIMAL(38,0)) * y) AS sxy,
        |    SUM(CAST(x AS DECIMAL(38,0)) * x) AS sxx
        |  FROM pts),
        |gslope AS (
        |  SELECT CAST(CAST(n AS DECIMAL(38,0)) * sxy
        |      - CAST(sx AS DECIMAL(38,0)) * sy AS DOUBLE)
        |    / CAST(CAST(n AS DECIMAL(38,0)) * sxx
        |      - CAST(sx AS DECIMAL(38,0)) * sx AS DOUBLE) AS global_slope
        |  FROM gs),
        |ps AS (
        |  SELECT g, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
        |    SUM(CAST(x AS DECIMAL(38,0)) * y) AS sxy,
        |    SUM(CAST(x AS DECIMAL(38,0)) * x) AS sxx
        |  FROM pts GROUP BY 1),
        |pslope AS (
        |  SELECT g,
        |    CAST(CAST(n AS DECIMAL(38,0)) * sxy
        |      - CAST(sx AS DECIMAL(38,0)) * sy AS DOUBLE)
        |    / CAST(CAST(n AS DECIMAL(38,0)) * sxx
        |      - CAST(sx AS DECIMAL(38,0)) * sx AS DOUBLE) AS slope
        |  FROM ps WHERE n >= 2),
        |a AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_nations,
        |    CAST(SUM(CASE WHEN slope * global_slope < 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_sign_reversed,
        |    MAX(global_slope) AS gsl
        |  FROM pslope, gslope)
        |SELECT n_nations, n_sign_reversed,
        |  floor(gsl * 1000000000.0 + 0.5) / 1000000000.0 AS global_slope,
        |  CAST((2 * n_sign_reversed * 1000000 + n_nations)
        |    // (2 * n_nations) AS BIGINT) AS reversed_ppm,
        |  CAST(CASE WHEN n_sign_reversed > 0 THEN 1 ELSE 0 END AS BIGINT)
        |    AS paradox_present
        |FROM a""".stripMargin,
    "q361_nb_overdispersion" ->
      """WITH daily AS (
        |  SELECT event_type, epoch_ns(ts) // 86400000000000 AS day,
        |    CAST(COUNT(*) AS BIGINT) AS x
        |  FROM events GROUP BY 1, 2),
        |m AS (
        |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
        |    SUM(CAST(x AS DECIMAL(38,0))) AS sx,
        |    SUM(CAST(x AS DECIMAL(38,0)) * x) AS sxx
        |  FROM daily GROUP BY 1),
        |d AS (
        |  SELECT event_type, n_days,
        |    CAST(sx AS DOUBLE) / n_days AS mean,
        |    CAST(n_days * sxx - sx * sx AS DOUBLE)
        |      / CAST(CAST(n_days AS DECIMAL(38,0)) * (n_days - 1) AS DOUBLE)
        |      AS variance
        |  FROM m)
        |SELECT event_type, n_days,
        |  floor(mean * 1000000.0 + 0.5) / 1000000.0 AS mean_daily,
        |  floor(variance * 1000000.0 + 0.5) / 1000000.0 AS var_daily,
        |  CASE WHEN variance > mean THEN
        |    floor(mean * mean / (variance - mean) * 1000000.0 + 0.5)
        |      / 1000000.0 END AS nb_r,
        |  CASE WHEN variance > mean THEN
        |    floor((mean * mean / (variance - mean))
        |      / (mean * mean / (variance - mean) + mean)
        |      * 1000000.0 + 0.5) / 1000000.0 END AS nb_p,
        |  CASE WHEN variance > mean THEN 'overdispersed'
        |    ELSE 'poisson_consistent' END AS verdict
        |FROM d ORDER BY event_type""".stripMargin,
    "q364_churn_recency_auc" ->
      """WITH b AS (
        |  SELECT MIN(epoch_ns(ts)) + (MAX(epoch_ns(ts)) - MIN(epoch_ns(ts)))
        |    * 99 // 100 AS cut
        |  FROM events),
        |u AS (
        |  SELECT user_id,
        |    MAX(CASE WHEN epoch_ns(ts) < cut
        |      THEN epoch_ns(ts) END) AS last_pre,
        |    SUM(CASE WHEN epoch_ns(ts) >= cut
        |      THEN 1 ELSE 0 END) AS n_post,
        |    MAX(cut) AS cut
        |  FROM events, b GROUP BY 1),
        |s AS (
        |  SELECT (cut - last_pre) // 1000000000 AS recency_s,
        |    CASE WHEN n_post = 0 THEN 1 ELSE 0 END AS y
        |  FROM u WHERE last_pre IS NOT NULL),
        |g AS (
        |  SELECT recency_s AS v, SUM(y) AS np, SUM(1 - y) AS nc
        |  FROM s GROUP BY 1),
        |t AS (
        |  SELECT np, nc,
        |    coalesce(SUM(nc) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS below_c
        |  FROM g),
        |a AS (
        |  SELECT CAST(SUM(np) AS BIGINT) AS n1,
        |    CAST(SUM(nc) AS BIGINT) AS n0,
        |    CAST(SUM(np * (2 * below_c + nc)) AS BIGINT) AS u2,
        |    CAST(SUM((np + nc) * (np + nc) * (np + nc) - (np + nc))
        |      AS BIGINT) AS tcorr
        |  FROM t)
        |SELECT n1 AS n_churned, n0 AS n_retained, u2,
        |  floor(((CAST(u2 AS DOUBLE) / 2.0
        |      - CAST(n1 AS DOUBLE) * CAST(n0 AS DOUBLE) / 2.0)
        |    / sqrt(CAST(n1 AS DOUBLE) * CAST(n0 AS DOUBLE) / 12.0
        |      * ((CAST(n1 + n0 AS DOUBLE) + 1.0)
        |        - CAST(tcorr AS DOUBLE) / (CAST(n1 + n0 AS DOUBLE)
        |          * (CAST(n1 + n0 AS DOUBLE) - 1.0)))))
        |    * 1000000.0 + 0.5) / 1000000.0 AS z,
        |  floor((CAST(u2 AS DOUBLE)
        |      / (2.0 * CAST(n1 AS DOUBLE) * CAST(n0 AS DOUBLE)))
        |    * 1000000.0 + 0.5) / 1000000.0 AS auc
        |FROM a""".stripMargin,
    "q357_wilcoxon_signed_rank" ->
      """WITH u AS (
        |  SELECT user_id,
        |    CAST(SUM(CASE WHEN event_type = 'purchase'
        |      AND epoch_ns(ts) < 1705363200000000000
        |      THEN CAST(floor("value" * 100.0 + 0.5) AS BIGINT)
        |      ELSE 0 END) AS BIGINT) AS pre,
        |    CAST(SUM(CASE WHEN event_type = 'purchase'
        |      AND epoch_ns(ts) >= 1705363200000000000
        |      THEN CAST(floor("value" * 100.0 + 0.5) AS BIGINT)
        |      ELSE 0 END) AS BIGINT) AS post
        |  FROM events GROUP BY 1),
        |d AS (SELECT post - pre AS diff FROM u WHERE post - pre != 0),
        |v AS (
        |  SELECT abs(diff) AS a, CAST(COUNT(*) AS BIGINT) AS c,
        |    CAST(SUM(CASE WHEN diff > 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_pos
        |  FROM d GROUP BY 1),
        |r AS (
        |  SELECT *, COALESCE(SUM(c) OVER (ORDER BY a
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS f
        |  FROM v),
        |s AS (
        |  SELECT CAST(SUM(c) AS BIGINT) AS n,
        |    CAST(SUM(n_pos * (2 * f + c + 1)) AS BIGINT) AS w2,
        |    SUM(CAST(c AS DECIMAL(19,0)) * c * c - c) AS tie3
        |  FROM r),
        |z AS (
        |  SELECT n, w2,
        |    (CAST(w2 AS DOUBLE) - CAST(n AS DOUBLE) * (n + 1) / 2.0)
        |    / sqrt((CAST(n AS DOUBLE) * (n + 1) * (2 * n + 1)
        |        - CAST(tie3 AS DOUBLE) / 2.0) / 6.0) AS z
        |  FROM s)
        |SELECT n AS n_nonzero_pairs, w2 AS w_plus_x2,
        |  floor(z * 1000000.0 + 0.5) / 1000000.0 AS z_stat,
        |  CAST(CASE WHEN abs(z) > 1.96 THEN 1 ELSE 0 END AS BIGINT)
        |    AS significant
        |FROM z""".stripMargin,
    "q348_fk_integrity" ->
      """WITH a AS (
        |  SELECT 'customer.nationkey->nation' AS relation,
        |    CAST(COUNT(*) AS BIGINT) AS n_child,
        |    CAST(SUM(CASE WHEN n_nationkey IS NULL THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_orphans
        |  FROM customer LEFT JOIN nation ON c_nationkey = n_nationkey
        |  UNION ALL
        |  SELECT 'orders.custkey->customer',
        |    CAST(COUNT(*) AS BIGINT),
        |    CAST(SUM(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END)
        |      AS BIGINT)
        |  FROM orders LEFT JOIN customer ON o_custkey = c_custkey
        |  UNION ALL
        |  SELECT 'lineitem.orderkey->orders',
        |    CAST(COUNT(*) AS BIGINT),
        |    CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END)
        |      AS BIGINT)
        |  FROM lineitem LEFT JOIN orders ON l_orderkey = o_orderkey
        |  UNION ALL
        |  SELECT 'lineitem.partkey->part',
        |    CAST(COUNT(*) AS BIGINT),
        |    CAST(SUM(CASE WHEN p_partkey IS NULL THEN 1 ELSE 0 END)
        |      AS BIGINT)
        |  FROM lineitem LEFT JOIN part ON l_partkey = p_partkey
        |  UNION ALL
        |  SELECT 'lineitem.suppkey->supplier',
        |    CAST(COUNT(*) AS BIGINT),
        |    CAST(SUM(CASE WHEN s_suppkey IS NULL THEN 1 ELSE 0 END)
        |      AS BIGINT)
        |  FROM lineitem LEFT JOIN supplier ON l_suppkey = s_suppkey)
        |SELECT relation, n_child, n_orphans,
        |  CAST((2 * n_orphans * 1000000 + n_child) // (2 * n_child)
        |    AS BIGINT) AS orphan_ppm
        |FROM a ORDER BY relation""".stripMargin,
    "q346_retention_halflife" ->
      """WITH d AS (
        |  SELECT user_id, epoch_ns(ts) // 86400000000000 AS day
        |  FROM events),
        |f AS (
        |  SELECT user_id, day,
        |    MIN(day) OVER (PARTITION BY user_id) AS first_day
        |  FROM d),
        |ret AS (
        |  SELECT first_day // 7 AS cohort_week,
        |    (day - first_day) // 7 AS week_offset,
        |    CAST(COUNT(DISTINCT user_id) AS BIGINT) AS active_users
        |  FROM f GROUP BY 1, 2),
        |base AS (
        |  SELECT cohort_week, active_users AS base_users FROM ret
        |  WHERE week_offset = 0),
        |pts AS (
        |  SELECT r.cohort_week, b.base_users, r.week_offset,
        |    CAST(floor(ln(CAST(r.active_users AS DOUBLE) / b.base_users)
        |      * 1000000000.0 + 0.5) / 1000000000.0 AS DECIMAL(15,9)) AS l
        |  FROM ret r JOIN base b ON r.cohort_week = b.cohort_week
        |  WHERE r.week_offset >= 1 AND r.active_users > 0),
        |s AS (
        |  SELECT cohort_week, base_users, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(week_offset) AS BIGINT) AS sx, SUM(l) AS sl,
        |    SUM(l * week_offset) AS sxl,
        |    CAST(SUM(week_offset * week_offset) AS BIGINT) AS sxx
        |  FROM pts GROUP BY 1, 2),
        |fit AS (
        |  SELECT cohort_week, base_users, n,
        |    floor(CAST(n * sxl - sx * sl AS DOUBLE)
        |        / CAST(n * sxx - sx * sx AS DOUBLE)
        |      * 1000000000.0 + 0.5) / 1000000000.0 AS slope
        |  FROM s WHERE n >= 2)
        |SELECT cohort_week, base_users, n AS n_points,
        |  floor(slope * 1000000.0 + 0.5) / 1000000.0 AS decay_slope,
        |  CASE WHEN slope < 0 THEN
        |    floor(-ln(2.0) / slope * 1000000.0 + 0.5) / 1000000.0 END
        |    AS half_life_weeks
        |FROM fit ORDER BY cohort_week""".stripMargin,
    "q341_local_clustering" ->
      // Cap interpolated from the ONE engine constant (ADVICE r11).
      s"""WITH pr AS (SELECT DISTINCT l_orderkey AS k,
        |                   l_partkey::VARCHAR AS p, l_partkey AS pn
        |            FROM lineitem),
        |okb AS (SELECT k FROM pr GROUP BY k
        |        HAVING count(*) BETWEEN 2 AND $BasketCap),
        |pairs AS (SELECT least(a.p, b.p) AS u, greatest(a.p, b.p) AS v
        |          FROM pr a JOIN okb ON okb.k = a.k
        |          JOIN pr b ON a.k = b.k AND a.pn < b.pn
        |          GROUP BY 1, 2 HAVING count(*) >= 2),
        |deg AS (SELECT n, CAST(count(*) AS BIGINT) AS d
        |        FROM (SELECT u AS n FROM pairs UNION ALL SELECT v AS n FROM pairs)
        |        GROUP BY 1),
        |ori AS (SELECT CASE WHEN d1.d < d2.d OR (d1.d = d2.d AND pairs.u < pairs.v)
        |                    THEN pairs.u ELSE pairs.v END AS s,
        |               CASE WHEN d1.d < d2.d OR (d1.d = d2.d AND pairs.u < pairs.v)
        |                    THEN pairs.v ELSE pairs.u END AS t
        |        FROM pairs JOIN deg d1 ON d1.n = pairs.u
        |        JOIN deg d2 ON d2.n = pairs.v),
        |tri AS (SELECT w1.s AS a, w1.t AS b, w2.t AS c
        |        FROM ori w1 JOIN ori w2 ON w1.s = w2.s AND w1.t < w2.t
        |        JOIN (SELECT least(s, t) AS b, greatest(s, t) AS c FROM ori) cl
        |          ON cl.b = w1.t AND cl.c = w2.t),
        |roles AS (SELECT a AS node FROM tri UNION ALL SELECT b FROM tri
        |          UNION ALL SELECT c FROM tri),
        |tc AS (SELECT node, CAST(count(*) AS BIGINT) AS n_triangles
        |       FROM roles GROUP BY 1)
        |SELECT CAST(deg.n AS BIGINT) AS part_key, deg.d AS degree,
        |  COALESCE(tc.n_triangles, 0) AS n_triangles,
        |  CASE WHEN deg.d >= 2 THEN
        |    floor(2.0 * COALESCE(tc.n_triangles, 0) / (deg.d * (deg.d - 1))
        |      * 1000000.0 + 0.5) / 1000000.0
        |  ELSE 0.0 END AS clustering
        |FROM deg LEFT JOIN tc ON tc.node = deg.n
        |ORDER BY clustering DESC, degree DESC, part_key LIMIT 50""".stripMargin,
    "q335_welch_ttest" ->
      s"""WITH u AS (
         |  SELECT user_id,
         |    CAST(SUM(CASE WHEN event_type = 'purchase'
         |      THEN CAST(floor("value" * 100.0 + 0.5) AS BIGINT)
         |      ELSE 0 END) AS BIGINT) AS cents
         |  FROM events GROUP BY 1),
         |arms AS (
         |  SELECT CASE WHEN (md5_number_lower('ab:' || user_id::VARCHAR)
         |      & $H) % 2 = 0 THEN 'A' ELSE 'B' END AS arm, cents
         |  FROM u),
         |g AS (
         |  SELECT arm, CAST(COUNT(*) AS BIGINT) AS n,
         |    CAST(SUM(cents) AS BIGINT) AS s,
         |    SUM(CAST(cents AS DECIMAL(19,0)) * cents) AS q
         |  FROM arms GROUP BY 1),
         |ab AS (
         |  SELECT
         |    (SELECT n FROM g WHERE arm = 'A') AS n_a,
         |    (SELECT s FROM g WHERE arm = 'A') AS s_a,
         |    (SELECT q FROM g WHERE arm = 'A') AS q_a,
         |    (SELECT n FROM g WHERE arm = 'B') AS n_b,
         |    (SELECT s FROM g WHERE arm = 'B') AS s_b,
         |    (SELECT q FROM g WHERE arm = 'B') AS q_b),
         |v AS (
         |  SELECT *,
         |    (CAST(q_a AS DOUBLE)
         |      - CAST(CAST(s_a AS DECIMAL(38,0)) * s_a AS DOUBLE) / n_a)
         |      / (n_a - 1) AS va,
         |    (CAST(q_b AS DOUBLE)
         |      - CAST(CAST(s_b AS DECIMAL(38,0)) * s_b AS DOUBLE) / n_b)
         |      / (n_b - 1) AS vb
         |  FROM ab),
         |w AS (
         |  SELECT *, va / n_a + vb / n_b AS se2,
         |    (CAST(s_a AS DOUBLE) / n_a - CAST(s_b AS DOUBLE) / n_b)
         |      / sqrt(va / n_a + vb / n_b) AS tstat
         |  FROM v)
         |SELECT n_a, n_b,
         |  floor(CAST(s_a AS DOUBLE) / n_a * 1000000.0 + 0.5) / 1000000.0
         |    AS mean_a_cents,
         |  floor(CAST(s_b AS DOUBLE) / n_b * 1000000.0 + 0.5) / 1000000.0
         |    AS mean_b_cents,
         |  floor(va * 1000000.0 + 0.5) / 1000000.0 AS var_a,
         |  floor(vb * 1000000.0 + 0.5) / 1000000.0 AS var_b,
         |  floor(tstat * 1000000.0 + 0.5) / 1000000.0 AS t_stat,
         |  floor(se2 * se2 / ((va / n_a) * (va / n_a) / (n_a - 1)
         |      + (vb / n_b) * (vb / n_b) / (n_b - 1))
         |    * 1000000.0 + 0.5) / 1000000.0 AS df_welch,
         |  CAST(CASE WHEN abs(tstat) > 1.96 THEN 1 ELSE 0 END AS BIGINT)
         |    AS significant
         |FROM w""".stripMargin,
    "q336_brown_forsythe" ->
      // group-term quantizer interpolated from qdecWideSql — ONE
      // definition drives engine and oracle (the cap-literal rule)
      s"""WITH x AS (
        |  SELECT c_nationkey AS g,
        |    CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT) AS cents
        |  FROM customer),
        |bv AS (SELECT g, cents, CAST(COUNT(*) AS BIGINT) AS cnt
        |       FROM x GROUP BY 1, 2),
        |cu AS (
        |  SELECT g, cents,
        |    SUM(cnt) OVER (PARTITION BY g ORDER BY cents
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    SUM(cnt) OVER (PARTITION BY g) AS n_g
        |  FROM bv),
        |med AS (SELECT g, MIN(cents) AS med FROM cu
        |        WHERE cum >= (n_g + 1) // 2 GROUP BY g),
        |z AS (SELECT x.g, abs(cents - med) AS z
        |      FROM x JOIN med ON x.g = med.g),
        |grp AS (
        |  SELECT g, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(z) AS BIGINT) AS sz,
        |    SUM(CAST(z AS DECIMAL(19,0)) * z) AS sz2
        |  FROM z GROUP BY g),
        |tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nn,
        |          CAST(SUM(sz) AS BIGINT) AS szz,
        |          CAST(COUNT(*) AS BIGINT) AS k FROM grp),
        |raw AS (
        |  SELECT nn, k,
        |    n * (CAST(sz AS DOUBLE) / n - CAST(szz AS DOUBLE) / nn)
        |      * (CAST(sz AS DOUBLE) / n - CAST(szz AS DOUBLE) / nn) AS bt,
        |    CAST(sz2 AS DOUBLE)
        |      - CAST(CAST(sz AS DECIMAL(38,0)) * sz AS DOUBLE) / n AS wt
        |  FROM grp, tot),
        |terms AS (
        |  SELECT nn, k,
        |    ${qdecWideSql("bt", 38, 2)} AS bterm,
        |    ${qdecWideSql("wt", 38, 2)} AS wterm
        |  FROM raw),
        |s AS (SELECT nn, k, SUM(bterm) AS bsum, SUM(wterm) AS wsum
        |      FROM terms GROUP BY 1, 2)
        |SELECT k, nn AS n_total,
        |  CAST(k - 1 AS BIGINT) AS dof1, CAST(nn - k AS BIGINT) AS dof2,
        |  floor(CAST(nn - k AS DOUBLE) / (k - 1)
        |      * CAST(bsum AS DOUBLE) / CAST(wsum AS DOUBLE)
        |    * 1000000.0 + 0.5) / 1000000.0 AS f_stat,
        |  CAST(CASE WHEN k - 1 = 24 AND CAST(nn - k AS DOUBLE) / (k - 1)
        |      * CAST(bsum AS DOUBLE) / CAST(wsum AS DOUBLE) > 1.5173
        |    THEN 1 ELSE 0 END AS BIGINT) AS significant
        |FROM s""".stripMargin,
    "q337_jarque_bera" ->
      """WITH e AS (
        |  SELECT event_type,
        |    CAST(floor("value" * 100.0 + 0.5) AS BIGINT) AS c
        |  FROM events),
        |m AS (
        |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(c) AS BIGINT) AS s1,
        |    SUM(CAST(c AS DECIMAL(19,0)) * c) AS s2,
        |    SUM(CAST(c AS DECIMAL(19,0)) * c * c) AS s3,
        |    SUM(CAST(c AS DECIMAL(19,0)) * c * c * c) AS s4
        |  FROM e GROUP BY 1),
        |d AS (
        |  SELECT event_type, n, CAST(s1 AS DOUBLE) / n AS mu,
        |    CAST(s2 AS DOUBLE) / n AS r2, CAST(s3 AS DOUBLE) / n AS r3,
        |    CAST(s4 AS DOUBLE) / n AS r4
        |  FROM m),
        |c AS (
        |  SELECT event_type, n, mu,
        |    r2 - mu * mu AS m2,
        |    r3 - 3.0 * mu * r2 + 2.0 * mu * mu * mu AS m3,
        |    r4 - 4.0 * mu * r3 + 6.0 * mu * mu * r2
        |      - 3.0 * mu * mu * mu * mu AS m4
        |  FROM d),
        |k AS (
        |  SELECT event_type, n, mu,
        |    m3 / (m2 * sqrt(m2)) AS skew, m4 / (m2 * m2) AS kurt
        |  FROM c),
        |j AS (
        |  SELECT *, CAST(n AS DOUBLE) / 6.0 * (skew * skew
        |      + (kurt - 3.0) * (kurt - 3.0) / 4.0) AS jb
        |  FROM k)
        |SELECT event_type, n,
        |  floor(mu * 1000000.0 + 0.5) / 1000000.0 AS mean_cents,
        |  floor(skew * 1000000.0 + 0.5) / 1000000.0 AS skewness,
        |  floor(kurt * 1000000.0 + 0.5) / 1000000.0 AS kurtosis,
        |  floor(jb * 1000000.0 + 0.5) / 1000000.0 AS jb_stat,
        |  CAST(CASE WHEN jb > 5.991 THEN 1 ELSE 0 END AS BIGINT)
        |    AS reject_normal
        |FROM j ORDER BY event_type""".stripMargin,
    "q338_durbin_watson" ->
      // squared-residual quantizer interpolated from qdecWideSql — ONE
      // definition drives engine and oracle (the cap-literal rule)
      s"""WITH daily AS (
        |  SELECT n_name AS nation,
        |    (epoch_ns(o_orderdate) // 1000000000) // 86400 AS day,
        |    CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
        |      AS BIGINT) AS cents
        |  FROM orders
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  GROUP BY 1, 2),
        |s AS (
        |  SELECT nation, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(day) AS BIGINT) AS st,
        |    CAST(SUM(cents) AS BIGINT) AS sy,
        |    SUM(CAST(day AS DECIMAL(19,0)) * cents) AS sty,
        |    SUM(CAST(day AS DECIMAL(19,0)) * day) AS stt
        |  FROM daily GROUP BY 1),
        |fit AS (
        |  SELECT nation, n,
        |    CAST(CAST(n AS DECIMAL(38,0)) * sty
        |        - CAST(st AS DECIMAL(38,0)) * sy AS DOUBLE)
        |      / CAST(CAST(n AS DECIMAL(38,0)) * stt
        |        - CAST(st AS DECIMAL(38,0)) * st AS DOUBLE) AS slope,
        |    st, sy
        |  FROM s),
        |f2 AS (
        |  SELECT nation, n, slope,
        |    (CAST(sy AS DOUBLE) - slope * st) / n AS icept
        |  FROM fit),
        |r AS (
        |  SELECT d.nation, d.day, f2.n, f2.slope,
        |    floor((CAST(d.cents AS DOUBLE) / 100.0
        |        - (f2.icept + f2.slope * d.day) / 100.0)
        |      * 1000000.0 + 0.5) / 1000000.0 AS res
        |  FROM daily d JOIN f2 ON d.nation = f2.nation),
        |l AS (
        |  SELECT nation, n, slope, res,
        |    LAG(res) OVER (PARTITION BY nation ORDER BY day) AS prev
        |  FROM r),
        |ly AS (
        |  SELECT nation, n, slope,
        |    (res - prev) * (res - prev) AS dd,
        |    res * res AS ee
        |  FROM l),
        |t AS (
        |  SELECT nation, n, slope,
        |    ${qdecWideSql("dd", 38, 2)} AS d2,
        |    ${qdecWideSql("ee", 38, 2)} AS e2
        |  FROM ly),
        |g AS (
        |  SELECT nation, CAST(COUNT(*) AS BIGINT) AS n_days,
        |    MAX(slope) AS b, SUM(d2) AS sd, SUM(e2) AS se
        |  FROM t GROUP BY 1)
        |SELECT nation, n_days,
        |  floor(b / 100.0 * 1000000.0 + 0.5) / 1000000.0
        |    AS slope_dollars_per_day,
        |  floor(CAST(sd AS DOUBLE) / CAST(se AS DOUBLE) * 1000000.0 + 0.5)
        |    / 1000000.0 AS dw,
        |  CASE WHEN CAST(sd AS DOUBLE) / CAST(se AS DOUBLE) < 1.5
        |      THEN 'positive_autocorr'
        |    WHEN CAST(sd AS DOUBLE) / CAST(se AS DOUBLE) > 2.5
        |      THEN 'negative_autocorr'
        |    ELSE 'none' END AS verdict
        |FROM g ORDER BY nation""".stripMargin,
    "q339_cochran_armitage" ->
      """WITH r AS (
        |  SELECT CASE WHEN c_acctbal < 0 THEN 0
        |      WHEN c_acctbal < 2500 THEN 1
        |      WHEN c_acctbal < 5000 THEN 2
        |      WHEN c_acctbal < 7500 THEN 3
        |      ELSE 4 END AS band,
        |    CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
        |  FROM orders JOIN customer ON o_custkey = c_custkey),
        |bands AS (
        |  SELECT CAST(band AS BIGINT) AS band,
        |    CAST(COUNT(*) AS BIGINT) AS n_orders,
        |    CAST(SUM(y) AS BIGINT) AS n_failed
        |  FROM r GROUP BY 1),
        |st AS (
        |  SELECT CAST(SUM(n_orders) AS BIGINT) AS nn,
        |    CAST(SUM(n_failed) AS BIGINT) AS rr,
        |    CAST(SUM(band * n_failed) AS BIGINT) AS t,
        |    CAST(SUM(band * n_orders) AS BIGINT) AS a,
        |    CAST(SUM(band * band * n_orders) AS BIGINT) AS b2
        |  FROM bands),
        |zz AS (
        |  SELECT
        |    (CAST(t AS DOUBLE) - CAST(rr AS DOUBLE) * a / nn) /
        |    sqrt((CAST(rr AS DOUBLE) / nn) * (1.0 - CAST(rr AS DOUBLE) / nn)
        |      * (CAST(b2 AS DOUBLE) - CAST(a AS DOUBLE) * a / nn)) AS z
        |  FROM st)
        |SELECT band, n_orders, n_failed,
        |  floor(CAST(n_failed AS DOUBLE) / n_orders * 1000000.0 + 0.5)
        |    / 1000000.0 AS fail_rate,
        |  floor(z * 1000000.0 + 0.5) / 1000000.0 AS z_trend,
        |  floor(z * z * 1000000.0 + 0.5) / 1000000.0 AS chi2_trend,
        |  CAST(CASE WHEN z * z > 3.841 THEN 1 ELSE 0 END AS BIGINT)
        |    AS significant
        |FROM bands, zz ORDER BY band""".stripMargin,
    "q285_activity_streaks" ->
      """WITH d AS (
        |  SELECT DISTINCT user_id, epoch_ns(ts) // 86400000000000 AS day
        |  FROM events),
        |i AS (
        |  SELECT user_id, day,
        |    day - row_number() OVER (PARTITION BY user_id ORDER BY day)
        |      AS grp
        |  FROM d),
        |runs AS (
        |  SELECT user_id, grp, CAST(count(*) AS BIGINT) AS len,
        |    MIN(day) AS start_day
        |  FROM i GROUP BY 1, 2),
        |pick AS (
        |  SELECT user_id, len, start_day,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY len DESC, start_day DESC) AS rk
        |  FROM runs),
        |agg AS (
        |  SELECT user_id, CAST(MAX(len) AS BIGINT) AS longest_streak,
        |    CAST(count(*) AS BIGINT) AS n_streaks,
        |    CAST(SUM(len) AS BIGINT) AS n_active_days
        |  FROM runs GROUP BY 1)
        |SELECT a.user_id, a.longest_streak, a.n_streaks, a.n_active_days,
        |  p.start_day AS longest_start_day
        |FROM agg a JOIN pick p ON a.user_id = p.user_id AND p.rk = 1
        |ORDER BY a.user_id""".stripMargin,
    "q282_histogram_intersection" ->
      """WITH e AS (
        |  SELECT event_type,
        |    CAST(floor("value" * 100.0 + 0.5) AS BIGINT) // 1000 AS bin
        |  FROM events),
        |h AS (
        |  SELECT event_type, bin, count(*) AS c,
        |    SUM(count(*)) OVER (PARTITION BY event_type) AS n
        |  FROM e GROUP BY 1, 2),
        |j AS (
        |  SELECT a.event_type AS type_a, b.event_type AS type_b,
        |    CAST(SUM(least(CAST(a.c AS HUGEINT) * b.n,
        |      CAST(b.c AS HUGEINT) * a.n)) AS HUGEINT) AS min_sum,
        |    CAST(MAX(CAST(a.n AS HUGEINT) * b.n) AS HUGEINT) AS den
        |  FROM h a JOIN h b ON a.bin = b.bin
        |    AND a.event_type < b.event_type
        |  GROUP BY 1, 2)
        |SELECT type_a, type_b,
        |  CAST((2 * min_sum * 1000000 + den) // (2 * den) AS BIGINT)
        |    AS intersection_ppm
        |FROM j ORDER BY type_a, type_b""".stripMargin,
    "q283_burstiness_fano" ->
      """WITH daily AS (
        |  SELECT event_type, epoch_ns(ts) // 86400000000000 AS day,
        |    CAST(count(*) AS BIGINT) AS x
        |  FROM events GROUP BY 1, 2),
        |st AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
        |    SUM(CAST(x AS HUGEINT)) AS sx,
        |    SUM(CAST(x AS HUGEINT) * x) AS sxx
        |  FROM daily GROUP BY 1),
        |f AS (
        |  SELECT event_type, n_days,
        |    floor((CAST(sx AS DOUBLE) / CAST(n_days AS DOUBLE))
        |      * 1000000.0 + 0.5) / 1000000.0 AS mean_daily,
        |    floor(((CAST(n_days * sxx - sx * sx AS DOUBLE)
        |        / CAST(CAST(n_days AS HUGEINT) * (n_days - 1) AS DOUBLE))
        |      / (CAST(sx AS DOUBLE) / CAST(n_days AS DOUBLE)))
        |      * 1000000.0 + 0.5) / 1000000.0 AS fano
        |  FROM st)
        |SELECT event_type, n_days, mean_daily, fano,
        |  CASE WHEN fano > 1.5 THEN 'bursty'
        |    WHEN fano < 0.67 THEN 'regular'
        |    ELSE 'poisson_like' END AS verdict
        |FROM f ORDER BY event_type""".stripMargin,
    "q280_cramers_v" ->
      """WITH cells AS (
        |  SELECT lang AS r, source AS c, COUNT(*) AS o
        |  FROM documents GROUP BY 1, 2),
        |m AS (
        |  SELECT r, c, o,
        |    SUM(o) OVER (PARTITION BY r) AS rt,
        |    SUM(o) OVER (PARTITION BY c) AS ct,
        |    SUM(o) OVER () AS n
        |  FROM cells),
        |x AS (
        |  SELECT r, c, o,
        |    floor((CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE)
        |      / CAST(n AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0
        |      AS expected
        |  FROM m),
        |y AS (
        |  SELECT
        |    floor((CAST((o - CAST(expected AS DECIMAL(18,6))) *
        |          (o - CAST(expected AS DECIMAL(18,6))) AS DOUBLE)
        |      / CAST(CAST(expected AS DECIMAL(18,6)) AS DOUBLE))
        |      * 1000000.0 + 0.5) / 1000000.0 AS contrib
        |  FROM x),
        |chi AS (
        |  SELECT CAST(SUM(CAST(contrib AS DECIMAL(18,6))) AS DOUBLE)
        |    AS chi2
        |  FROM y),
        |d AS (
        |  SELECT CAST(COUNT(DISTINCT lang) AS BIGINT) AS nr,
        |    CAST(COUNT(DISTINCT source) AS BIGINT) AS nc,
        |    CAST(COUNT(*) AS BIGINT) AS n
        |  FROM documents),
        |f AS (
        |  SELECT n, nr, nc, chi2,
        |    floor(sqrt(chi2 / (CAST(n AS DOUBLE)
        |      * CAST(least(nr, nc) - 1 AS DOUBLE))) * 1000000.0 + 0.5)
        |      / 1000000.0 AS cramers_v
        |  FROM d CROSS JOIN chi)
        |SELECT n, nr, nc, chi2, cramers_v,
        |  CASE WHEN cramers_v < 0.1 THEN 'negligible'
        |    WHEN cramers_v < 0.3 THEN 'small'
        |    WHEN cramers_v < 0.5 THEN 'medium' ELSE 'large' END AS effect
        |FROM f""".stripMargin,
    "q281_attribution_window_sweep" ->
      """WITH e AS (
        |  SELECT user_id, epoch_ns(ts) AS t, event_id, event_type
        |  FROM events WHERE event_type IN ('click', 'purchase')),
        |m AS (
        |  SELECT user_id, t, event_id, event_type,
        |    MAX(CASE WHEN event_type = 'click' THEN t END) OVER
        |      (PARTITION BY user_id ORDER BY t, event_id
        |       ROWS UNBOUNDED PRECEDING) AS last_click
        |  FROM e),
        |p AS (SELECT t - last_click AS gap FROM m
        |      WHERE event_type = 'purchase'),
        |a AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_purchases,
        |    CAST(SUM(CASE WHEN gap <= 3600000000000 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS w_1h,
        |    CAST(SUM(CASE WHEN gap <= 21600000000000 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS w_6h,
        |    CAST(SUM(CASE WHEN gap <= 86400000000000 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS w_24h,
        |    CAST(SUM(CASE WHEN gap <= 259200000000000 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS w_72h
        |  FROM p)
        |SELECT n_purchases, w_1h, w_6h, w_24h, w_72h,
        |  CAST((2 * w_1h * 1000000 + n_purchases) // (2 * n_purchases)
        |    AS BIGINT) AS rate_1h_ppm,
        |  CAST((2 * w_6h * 1000000 + n_purchases) // (2 * n_purchases)
        |    AS BIGINT) AS rate_6h_ppm,
        |  CAST((2 * w_24h * 1000000 + n_purchases) // (2 * n_purchases)
        |    AS BIGINT) AS rate_24h_ppm,
        |  CAST((2 * w_72h * 1000000 + n_purchases) // (2 * n_purchases)
        |    AS BIGINT) AS rate_72h_ppm
        |FROM a""".stripMargin,
    "q269_fd_profile" ->
      """WITH
        |c AS (
        |  SELECT 'customer.custkey->nationkey' AS fd,
        |    CAST(count(*) AS BIGINT) AS n_keys,
        |    CAST(SUM(CASE WHEN nr > 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_violating
        |  FROM (SELECT c_custkey, count(*) AS nr FROM
        |    (SELECT DISTINCT c_custkey, c_nationkey FROM customer)
        |    GROUP BY 1)),
        |o AS (
        |  SELECT 'orders.custkey->orderpriority' AS fd,
        |    CAST(count(*) AS BIGINT) AS n_keys,
        |    CAST(SUM(CASE WHEN nr > 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_violating
        |  FROM (SELECT o_custkey, count(*) AS nr FROM
        |    (SELECT DISTINCT o_custkey, o_orderpriority FROM orders)
        |    GROUP BY 1)),
        |l AS (
        |  SELECT 'lineitem.partkey->suppkey' AS fd,
        |    CAST(count(*) AS BIGINT) AS n_keys,
        |    CAST(SUM(CASE WHEN nr > 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_violating
        |  FROM (SELECT l_partkey, count(*) AS nr FROM
        |    (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
        |    GROUP BY 1)),
        |e AS (
        |  SELECT 'events.user->event_type' AS fd,
        |    CAST(count(*) AS BIGINT) AS n_keys,
        |    CAST(SUM(CASE WHEN nr > 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_violating
        |  FROM (SELECT user_id, count(*) AS nr FROM
        |    (SELECT DISTINCT user_id, event_type FROM events)
        |    GROUP BY 1)),
        |u AS (SELECT * FROM c UNION ALL SELECT * FROM o
        |      UNION ALL SELECT * FROM l UNION ALL SELECT * FROM e)
        |SELECT fd, n_keys, n_violating,
        |  CAST((2 * n_violating * 1000000 + n_keys) // (2 * n_keys)
        |    AS BIGINT) AS violation_ppm
        |FROM u ORDER BY fd""".stripMargin,
    "q268_duplicate_charges" ->
      """WITH p AS (
        |  SELECT user_id, event_id, epoch_ns(ts) AS t,
        |    CAST(floor("value" * 100.0 + 0.5) AS BIGINT) // 100
        |      AS dollars
        |  FROM events WHERE event_type = 'purchase')
        |SELECT a.user_id, a.dollars, a.event_id AS id_a,
        |  b.event_id AS id_b,
        |  CAST((b.t - a.t) // 1000000000 AS BIGINT) AS gap_s
        |FROM p a JOIN p b
        |  ON a.user_id = b.user_id AND a.dollars = b.dollars
        |  AND b.t >= a.t AND b.t - a.t <= 86400000000000
        |  AND (a.t < b.t OR (a.t = b.t AND a.event_id < b.event_id))
        |ORDER BY a.user_id, id_a, id_b""".stripMargin,
    "q265_ratio_metric_ci" ->
      """WITH u AS (
        |  SELECT user_id, user_id % 2 = 0 AS treated,
        |    CAST(CAST(SUM(CAST(floor("value" * 100.0 + 0.5) / 100.0
        |      AS DECIMAL(7,2))) AS DECIMAL(18,2)) * 100 AS HUGEINT) AS x,
        |    CAST(count(*) AS HUGEINT) AS y
        |  FROM events GROUP BY 1, 2),
        |arms AS (
        |  SELECT treated, CAST(count(*) AS BIGINT) AS n,
        |    SUM(x) AS sx, SUM(y) AS sy, SUM(x * x) AS sxx,
        |    SUM(y * y) AS syy, SUM(x * y) AS sxy
        |  FROM u GROUP BY 1),
        |wv AS (
        |  SELECT treated, n,
        |    floor((CAST(sx AS DOUBLE) / CAST(sy AS DOUBLE)) * 1000000.0
        |      + 0.5) / 1000000.0 AS ratio,
        |    CAST(sy AS DOUBLE) / n AS ybar,
        |    sx, sy, sxx, syy, sxy
        |  FROM arms),
        |wv2 AS (
        |  SELECT treated, n, ratio,
        |    floor(((CAST(n * sxx - sx * sx AS DOUBLE)
        |        / CAST(CAST(n AS HUGEINT) * (n - 1) AS DOUBLE)
        |      - 2.0 * ratio * CAST(n * sxy - sx * sy AS DOUBLE)
        |        / CAST(CAST(n AS HUGEINT) * (n - 1) AS DOUBLE)
        |      + ratio * ratio * CAST(n * syy - sy * sy AS DOUBLE)
        |        / CAST(CAST(n AS HUGEINT) * (n - 1) AS DOUBLE))
        |      / (n * ybar * ybar)) * 1000000.0 + 0.5) / 1000000.0
        |      AS var_r
        |  FROM wv),
        |t AS (SELECT n AS n_t, ratio AS ratio_t, var_r AS var_t
        |      FROM wv2 WHERE treated),
        |c AS (SELECT n AS n_c, ratio AS ratio_c, var_r AS var_c
        |      FROM wv2 WHERE NOT treated),
        |f AS (
        |  SELECT n_t, n_c, ratio_t, ratio_c,
        |    floor((ratio_t - ratio_c) * 1000000.0 + 0.5) / 1000000.0
        |      AS diff,
        |    floor(sqrt(var_t + var_c) * 1000000.0 + 0.5) / 1000000.0
        |      AS se
        |  FROM t CROSS JOIN c)
        |SELECT n_t, n_c, ratio_t, ratio_c, diff, se,
        |  floor((diff - 1.96 * se) * 1000000.0 + 0.5) / 1000000.0
        |    AS ci_lo,
        |  floor((diff + 1.96 * se) * 1000000.0 + 0.5) / 1000000.0
        |    AS ci_hi,
        |  (abs(diff) > 1.96 * se) AS significant
        |FROM f""".stripMargin,
    "q253_shapley_attribution" ->
      """WITH fp AS (
        |  SELECT user_id, MIN(epoch_ns(ts)) AS pts FROM events
        |  WHERE event_type = 'purchase' GROUP BY 1),
        |tb AS (
        |  SELECT e.user_id,
        |    CASE e.event_type WHEN 'click' THEN 1 WHEN 'view' THEN 2
        |      WHEN 'signup' THEN 4 WHEN 'error' THEN 8 ELSE 0 END AS b
        |  FROM events e JOIN fp ON e.user_id = fp.user_id
        |  WHERE epoch_ns(e.ts) < fp.pts
        |    AND e.event_type IN ('click', 'view', 'signup', 'error')),
        |mk AS (SELECT user_id, bit_or(b) AS mask FROM tb GROUP BY 1),
        |mh AS (SELECT mask, CAST(count(*) AS BIGINT) AS cnt
        |       FROM mk GROUP BY 1),
        |ss AS (SELECT unnest(generate_series(0, 15)) AS s),
        |v AS (
        |  SELECT s, CAST(COALESCE(SUM(cnt), 0) AS BIGINT) AS v
        |  FROM ss LEFT JOIN mh ON (mask & s) = mask GROUP BY 1),
        |ch(channel, bit) AS (VALUES ('click', 1), ('view', 2),
        |  ('signup', 4), ('error', 8)),
        |ph AS (
        |  SELECT ch.channel,
        |    CAST(SUM((CASE bit_count(vs.s) WHEN 0 THEN 6 WHEN 1 THEN 2
        |        WHEN 2 THEN 2 ELSE 6 END) * (vi.v - vs.v)) AS BIGINT)
        |      AS phi24
        |  FROM ch
        |  JOIN v vs ON (vs.s & ch.bit) = 0
        |  JOIN v vi ON vi.s = vs.s + ch.bit
        |  GROUP BY 1),
        |tt AS (SELECT SUM(phi24) AS tot FROM ph)
        |SELECT channel, phi24,
        |  CAST((2 * CAST(phi24 AS HUGEINT) * 1000000 + tot)
        |    // (2 * CAST(tot AS HUGEINT)) AS BIGINT) AS share_ppm
        |FROM ph CROSS JOIN tt ORDER BY channel""".stripMargin,
    "q252_sample_size" ->
      """WITH y AS (
        |  SELECT CAST(floor(CAST(SUM(v) AS DOUBLE) / CAST(count(*) AS DOUBLE)
        |    * 1000000.0 + 0.5) AS BIGINT) AS y
        |  FROM (SELECT user_id,
        |          CAST(floor("value" * 100.0 + 0.5) / 100.0
        |            AS DECIMAL(7,2)) AS v
        |        FROM events
        |        WHERE epoch_ns(ts) >= 1705363200000000000)
        |  GROUP BY user_id),
        |st AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |    SUM(CAST(y AS HUGEINT)) AS sy,
        |    SUM(CAST(y AS HUGEINT) * y) AS syy
        |  FROM y),
        |f AS (
        |  SELECT n AS n_users,
        |    CAST((2 * sy + n) // (2 * CAST(n AS HUGEINT)) AS BIGINT)
        |      AS mean_micro,
        |    CAST((2 * sy + 100 * n) // (200 * CAST(n AS HUGEINT))
        |      AS BIGINT) AS mde_micro,
        |    floor((CAST(n * syy - sy * sy AS DOUBLE)
        |      / CAST(CAST(n AS HUGEINT) * (n - 1) AS DOUBLE))
        |      * 1.0 + 0.5) / 1.0 AS var_micro2
        |  FROM st)
        |SELECT n_users, mean_micro, mde_micro, var_micro2,
        |  CAST(ceil(2.0 * ((1.96 + 0.8416) * (1.96 + 0.8416)) *
        |    (var_micro2 / (CAST(mde_micro AS DOUBLE)
        |      * CAST(mde_micro AS DOUBLE)))) AS BIGINT) AS n_per_arm
        |FROM f""".stripMargin,
    "q246_assortativity" ->
      """WITH pair AS (
        |  SELECT DISTINCT 'c' || o_custkey AS src, 's' || l_suppkey AS dst
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |edges AS (SELECT src, dst FROM pair
        |          UNION ALL SELECT dst, src FROM pair),
        |deg AS (SELECT src, CAST(count(*) AS HUGEINT) AS d
        |        FROM edges GROUP BY 1),
        |st AS (
        |  SELECT CAST(count(*) AS BIGINT) AS m,
        |    SUM(dx.d) AS sx, SUM(dy.d) AS sy,
        |    SUM(dx.d * dy.d) AS sxy,
        |    SUM(dx.d * dx.d) AS sxx,
        |    SUM(dy.d * dy.d) AS syy
        |  FROM edges e
        |  JOIN deg dx ON dx.src = e.src
        |  JOIN deg dy ON dy.src = e.dst)
        |SELECT m AS n_edges,
        |  floor((CAST(m * sxy - sx * sy AS DOUBLE) /
        |    (sqrt(CAST(m * sxx - sx * sx AS DOUBLE)) *
        |     sqrt(CAST(m * syy - sy * sy AS DOUBLE)))) * 1000000.0 + 0.5)
        |    / 1000000.0 AS assortativity
        |FROM st""".stripMargin,
    "q290_did_estimator" ->
      """WITH e AS (
        |  SELECT user_id, user_id % 2 = 0 AS treated, epoch_ns(ts) AS tns,
        |    event_type,
        |    CAST(floor("value" * 100.0 + 0.5) AS BIGINT) AS cents
        |  FROM events),
        |u AS (
        |  SELECT user_id, treated,
        |    CAST(SUM(CASE WHEN event_type = 'purchase'
        |        AND tns < 1705363200000000000 THEN cents ELSE 0 END)
        |      AS BIGINT) AS pre_c,
        |    CAST(SUM(CASE WHEN event_type = 'purchase'
        |        AND tns >= 1705363200000000000 THEN cents ELSE 0 END)
        |      AS BIGINT) AS post_c
        |  FROM e GROUP BY 1, 2),
        |a AS (
        |  SELECT treated, CAST(count(*) AS BIGINT) AS n_users,
        |    CAST(SUM(pre_c) AS BIGINT) AS s_pre,
        |    CAST(SUM(post_c) AS BIGINT) AS s_post
        |  FROM u GROUP BY 1),
        |t AS (SELECT n_users AS n_t, s_pre AS sp_t, s_post AS ss_t
        |      FROM a WHERE treated),
        |c AS (SELECT n_users AS n_c, s_pre AS sp_c, s_post AS ss_c
        |      FROM a WHERE NOT treated)
        |SELECT n_t, n_c,
        |  floor((CAST(sp_t AS DOUBLE) / n_t) * 1000000.0 + 0.5)
        |    / 1000000.0 AS mean_t_pre,
        |  floor((CAST(ss_t AS DOUBLE) / n_t) * 1000000.0 + 0.5)
        |    / 1000000.0 AS mean_t_post,
        |  floor((CAST(sp_c AS DOUBLE) / n_c) * 1000000.0 + 0.5)
        |    / 1000000.0 AS mean_c_pre,
        |  floor((CAST(ss_c AS DOUBLE) / n_c) * 1000000.0 + 0.5)
        |    / 1000000.0 AS mean_c_post,
        |  floor(((CAST(ss_t AS DOUBLE) / n_t - CAST(sp_t AS DOUBLE) / n_t)
        |      - (CAST(ss_c AS DOUBLE) / n_c - CAST(sp_c AS DOUBLE) / n_c))
        |    * 1000000.0 + 0.5) / 1000000.0 AS did_cents
        |FROM t CROSS JOIN c""".stripMargin,
    "q291_ratio_metric_ci" ->
      """WITH u AS (
        |  SELECT user_id,
        |    CAST(SUM(CASE WHEN event_type = 'purchase'
        |        THEN CAST(floor("value" * 100.0 + 0.5) AS BIGINT)
        |        ELSE 0 END) AS BIGINT) AS y,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1),
        |m AS (
        |  SELECT CAST(count(*) AS BIGINT) AS uu,
        |    CAST(SUM(CAST(y AS HUGEINT)) AS HUGEINT) AS sy,
        |    CAST(SUM(CAST(n AS HUGEINT)) AS HUGEINT) AS sn,
        |    CAST(SUM(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy,
        |    CAST(SUM(CAST(n AS HUGEINT) * n) AS HUGEINT) AS snn,
        |    CAST(SUM(CAST(y AS HUGEINT) * n) AS HUGEINT) AS syn
        |  FROM u),
        |f AS (
        |  SELECT uu, sy, sn,
        |    CAST(sy AS DOUBLE) / CAST(sn AS DOUBLE) AS r,
        |    CAST(sn AS DOUBLE) / CAST(uu AS DOUBLE) AS nbar,
        |    CAST(uu * syy - sy * sy AS DOUBLE)
        |      / CAST(CAST(uu AS HUGEINT) * (uu - 1) AS DOUBLE) AS vy,
        |    CAST(uu * snn - sn * sn AS DOUBLE)
        |      / CAST(CAST(uu AS HUGEINT) * (uu - 1) AS DOUBLE) AS vn,
        |    CAST(uu * syn - sy * sn AS DOUBLE)
        |      / CAST(CAST(uu AS HUGEINT) * (uu - 1) AS DOUBLE) AS cyn
        |  FROM m),
        |g AS (
        |  SELECT uu, sy, sn, r,
        |    sqrt((vy - 2.0 * r * cyn + r * r * vn)
        |      / (nbar * nbar * uu)) AS se
        |  FROM f)
        |SELECT uu AS n_users, CAST(sy AS BIGINT) AS sum_y_cents,
        |  CAST(sn AS BIGINT) AS sum_n_events,
        |  floor(r * 1000000.0 + 0.5) / 1000000.0
        |    AS ratio_cents_per_event,
        |  floor(se * 1000000.0 + 0.5) / 1000000.0 AS se_cents,
        |  floor((r - 1.96 * se) * 1000000.0 + 0.5) / 1000000.0 AS ci_lo,
        |  floor((r + 1.96 * se) * 1000000.0 + 0.5) / 1000000.0 AS ci_hi
        |FROM g""".stripMargin,
    "q248_cuped" ->
      """WITH e AS (
        |  SELECT user_id, user_id % 2 = 0 AS treated, epoch_ns(ts) AS tns,
        |    CAST(floor("value" * 100.0 + 0.5) / 100.0 AS DECIMAL(7,2)) AS v
        |  FROM events),
        |pre AS (
        |  SELECT user_id, treated,
        |    CAST(floor(CAST(SUM(v) AS DOUBLE) / CAST(count(*) AS DOUBLE)
        |      * 1000000.0 + 0.5) AS BIGINT) AS x
        |  FROM e WHERE tns < 1705363200000000000 GROUP BY 1, 2),
        |post AS (
        |  SELECT user_id,
        |    CAST(floor(CAST(SUM(v) AS DOUBLE) / CAST(count(*) AS DOUBLE)
        |      * 1000000.0 + 0.5) AS BIGINT) AS y
        |  FROM e WHERE tns >= 1705363200000000000 GROUP BY 1),
        |u AS (
        |  SELECT pre.user_id, pre.treated, pre.x, post.y
        |  FROM pre JOIN post ON pre.user_id = post.user_id),
        |gx AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |    SUM(CAST(x AS HUGEINT)) AS sx, SUM(CAST(y AS HUGEINT)) AS sy,
        |    SUM(CAST(x AS HUGEINT) * y) AS sxy,
        |    SUM(CAST(x AS HUGEINT) * x) AS sxx
        |  FROM u),
        |gx2 AS (
        |  SELECT n, sx, sy, sxy, sxx,
        |    floor((CAST(n * sxy - sx * sy AS DOUBLE) /
        |      CAST(n * sxx - sx * sx AS DOUBLE)) * 1000000.0 + 0.5)
        |      / 1000000.0 AS theta,
        |    CAST((2 * sx + n) // (2 * CAST(n AS HUGEINT)) AS BIGINT)
        |      AS xbar_micro
        |  FROM gx),
        |adj AS (
        |  SELECT u.treated, u.y,
        |    CAST(floor((CAST(u.y AS DOUBLE) - g.theta *
        |      (CAST(u.x AS DOUBLE) - CAST(g.xbar_micro AS DOUBLE)))
        |      * 1.0 + 0.5) / 1.0 AS BIGINT) AS yadj
        |  FROM u CROSS JOIN gx2 g),
        |arms AS (
        |  SELECT treated, CAST(count(*) AS BIGINT) AS na,
        |    SUM(CAST(y AS HUGEINT)) AS sya,
        |    SUM(CAST(yadj AS HUGEINT)) AS saa,
        |    SUM(CAST(y AS HUGEINT) * y) AS syya,
        |    SUM(CAST(yadj AS HUGEINT) * yadj) AS saaa
        |  FROM adj GROUP BY 1),
        |t AS (SELECT na AS nt, sya AS syt, saa AS sat, syya AS syyt,
        |        saaa AS saat FROM arms WHERE treated),
        |c AS (SELECT na AS nc, sya AS syc, saa AS sac, syya AS syyc,
        |        saaa AS saac FROM arms WHERE NOT treated)
        |SELECT g.n AS n_users, g.theta,
        |  CAST((2 * syt + nt) // (2 * CAST(nt AS HUGEINT))
        |    - (2 * syc + nc) // (2 * CAST(nc AS HUGEINT)) AS BIGINT)
        |    AS diff_raw_micro,
        |  CAST((2 * sat + nt) // (2 * CAST(nt AS HUGEINT))
        |    - (2 * sac + nc) // (2 * CAST(nc AS HUGEINT)) AS BIGINT)
        |    AS diff_cuped_micro,
        |  floor((CAST(g.n * (saat + saac) - (sat + sac) * (sat + sac)
        |      AS DOUBLE) /
        |    CAST(g.n * (syyt + syyc) - (syt + syc) * (syt + syc)
        |      AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0 AS var_reduction
        |FROM t CROSS JOIN c CROSS JOIN gx2 g""".stripMargin,
    "q233_quantile_effect" -> qteOracle,
    "q231_cohort_ltv" ->
      """WITH d AS (
        |  SELECT user_id, event_type,
        |    CAST(floor(value * 100.0 + 0.5) / 100.0 AS DECIMAL(18,2)) AS v,
        |    epoch_ns(ts) // 86400000000000 AS day
        |  FROM events),
        |f AS (
        |  SELECT *, MIN(day) OVER (PARTITION BY user_id) AS first_day
        |  FROM d),
        |g AS (
        |  SELECT *, first_day // 7 AS cohort_week,
        |    (day - first_day) // 7 AS week_offset
        |  FROM f),
        |sizes AS (
        |  SELECT cohort_week, CAST(COUNT(DISTINCT user_id) AS BIGINT)
        |    AS n_users
        |  FROM g GROUP BY 1),
        |rev AS (
        |  SELECT cohort_week, week_offset, SUM(v) AS wk_rev
        |  FROM g WHERE event_type = 'purchase' GROUP BY 1, 2),
        |c AS (
        |  SELECT cohort_week, week_offset,
        |    CAST(wk_rev AS DECIMAL(18,2)) AS wk_rev,
        |    CAST(SUM(wk_rev) OVER (PARTITION BY cohort_week
        |      ORDER BY week_offset ROWS BETWEEN UNBOUNDED PRECEDING
        |      AND CURRENT ROW) AS DECIMAL(18,2)) AS cum_rev
        |  FROM rev)
        |SELECT c.cohort_week, c.week_offset, s.n_users,
        |  floor(CAST(c.wk_rev AS DOUBLE) * 100.0 + 0.5) / 100.0
        |    AS wk_rev,
        |  floor(CAST(c.cum_rev AS DOUBLE) * 100.0 + 0.5) / 100.0
        |    AS cum_rev,
        |  floor((CAST(c.cum_rev AS DOUBLE) / CAST(s.n_users AS DOUBLE))
        |    * 1000000.0 + 0.5) / 1000000.0 AS ltv_per_user
        |FROM c JOIN sizes s ON c.cohort_week = s.cohort_week
        |ORDER BY c.cohort_week, c.week_offset""".stripMargin,
    "q226_bandit_replay" ->
      """WITH e AS (
        |  SELECT user_id % 4 AS segment, event_type AS action,
        |    CAST(floor(value * 100.0 + 0.5) / 100.0 AS DECIMAL(18,2)) AS r,
        |    epoch_ns(ts) AS t
        |  FROM events),
        |tr AS (
        |  SELECT segment, action, SUM(r) AS sr,
        |    CAST(COUNT(*) AS BIGINT) AS n
        |  FROM e WHERE t < 1705363200000000000 GROUP BY 1, 2),
        |tm AS (
        |  SELECT segment, action,
        |    floor((CAST(sr AS DOUBLE) / CAST(n AS DOUBLE)) * 1000000.0
        |      + 0.5) / 1000000.0 AS train_mean
        |  FROM tr),
        |pol AS (
        |  SELECT segment, action AS chosen_action, train_mean
        |  FROM (SELECT *, row_number() OVER (PARTITION BY segment
        |      ORDER BY train_mean DESC, action) AS rk FROM tm)
        |  WHERE rk = 1),
        |ev AS (
        |  SELECT e.segment, pol.chosen_action, pol.train_mean,
        |    CAST(COUNT(*) AS BIGINT) AS n_eval,
        |    CAST(SUM(CASE WHEN e.action = pol.chosen_action THEN 1
        |      ELSE 0 END) AS BIGINT) AS n_matched,
        |    SUM(CASE WHEN e.action = pol.chosen_action THEN r END)
        |      AS sr_matched
        |  FROM e JOIN pol ON e.segment = pol.segment
        |  WHERE e.t >= 1705363200000000000
        |  GROUP BY 1, 2, 3)
        |SELECT segment, chosen_action, train_mean, n_eval, n_matched,
        |  floor((CAST(n_matched AS DOUBLE) / CAST(n_eval AS DOUBLE))
        |    * 1000000.0 + 0.5) / 1000000.0 AS match_rate,
        |  floor((CAST(sr_matched AS DOUBLE) / CAST(n_matched AS DOUBLE))
        |    * 1000000.0 + 0.5) / 1000000.0 AS replay_value
        |FROM ev ORDER BY segment""".stripMargin,
    "q222_diff_in_diffs" ->
      """WITH e AS (
        |  SELECT (user_id % 2 = 0) AS treated,
        |    (epoch_ns(ts) >= 1705363200000000000) AS post,
        |    CAST(floor(value * 100.0 + 0.5) / 100.0 AS DECIMAL(18,2)) AS v
        |  FROM events),
        |c AS (
        |  SELECT treated, post, SUM(v) AS sv,
        |    CAST(COUNT(*) AS BIGINT) AS n
        |  FROM e GROUP BY 1, 2),
        |m AS (
        |  SELECT treated, post, n,
        |    floor((CAST(sv AS DOUBLE) / CAST(n AS DOUBLE)) * 1000000.0
        |      + 0.5) / 1000000.0 AS mean
        |  FROM c),
        |w AS (
        |  SELECT
        |    MIN(CASE WHEN treated AND NOT post THEN mean END)
        |      AS treated_pre,
        |    MIN(CASE WHEN treated AND post THEN mean END) AS treated_post,
        |    MIN(CASE WHEN NOT treated AND NOT post THEN mean END)
        |      AS control_pre,
        |    MIN(CASE WHEN NOT treated AND post THEN mean END)
        |      AS control_post,
        |    CAST(SUM(CASE WHEN treated THEN n ELSE 0 END) AS BIGINT)
        |      AS n_treated,
        |    CAST(SUM(CASE WHEN NOT treated THEN n ELSE 0 END) AS BIGINT)
        |      AS n_control
        |  FROM m)
        |SELECT *,
        |  floor(((treated_post - treated_pre) -
        |    (control_post - control_pre)) * 1000000.0 + 0.5) / 1000000.0
        |    AS did
        |FROM w""".stripMargin,
    "q151_kaplan_meier" ->
      """WITH pu AS (
        |  SELECT user_id, min(epoch_ns(ts)) AS f, max(epoch_ns(ts)) AS l
        |  FROM events GROUP BY 1),
        |oe AS (SELECT max(l) AS obs_end FROM pu),
        |lives AS (
        |  SELECT (l - f) // 3600000000000 AS t,
        |    CASE WHEN l >= oe.obs_end - 43200000000000
        |      THEN 1 ELSE 0 END AS censored
        |  FROM pu CROSS JOIN oe),
        |byt AS (
        |  SELECT t, COUNT(*) AS m, SUM(1 - censored) AS d,
        |    SUM(censored) AS c
        |  FROM lives GROUP BY 1),
        |w AS (
        |  SELECT t, d, c,
        |    SUM(m) OVER (ORDER BY t DESC ROWS UNBOUNDED PRECEDING)
        |      AS n_risk
        |  FROM byt),
        |x AS (
        |  SELECT t, n_risk, d, c,
        |    CAST(CASE WHEN d > 0 AND d < n_risk
        |      THEN floor((ln(1.0 - CAST(d AS DOUBLE) / n_risk)) * 1000000000.0 + 0.5) / 1000000000.0
        |      ELSE 0.0 END AS DECIMAL(18,9)) AS lnf,
        |    CASE WHEN d = n_risk THEN 1 ELSE 0 END AS dead0
        |  FROM w),
        |y AS (
        |  SELECT t, n_risk, d, c,
        |    SUM(lnf) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS cum,
        |    MAX(dead0) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING)
        |      AS dead
        |  FROM x)
        |SELECT t, CAST(n_risk AS BIGINT) AS n_risk,
        |  CAST(d AS BIGINT) AS n_death, CAST(c AS BIGINT) AS n_censor,
        |  CASE WHEN dead = 1 THEN 0.0
        |    ELSE floor((exp(CAST(cum AS DOUBLE))) * 1000000.0 + 0.5) / 1000000.0 END AS s_hat
        |FROM y ORDER BY t""".stripMargin,
    "q215_weighted_pagerank" ->
      s"""WITH wpair AS (
         |  SELECT 'c' || o_custkey AS src, 's' || l_suppkey AS dst,
         |    CAST(count(*) AS BIGINT) AS w
         |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |  GROUP BY 1, 2),
         |edges AS (SELECT src, dst, w FROM wpair
         |          UNION ALL SELECT dst, src, w FROM wpair),
         |wdeg AS (SELECT src, CAST(sum(w) AS BIGINT) AS wdeg
         |         FROM edges GROUP BY 1),
         |ed AS (SELECT e.src, e.dst, e.w, d.wdeg FROM edges e
         |       JOIN wdeg d ON d.src = e.src),
         |nodes AS (SELECT DISTINCT src AS node FROM edges),
         |ncount AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
         |r0 AS (SELECT node, CAST(1.0 AS DOUBLE) / nn.n AS r
         |       FROM nodes CROSS JOIN ncount nn),
         |${wprIter("r0", "r1")},
         |${wprIter("r1", "r2")},
         |${wprIter("r2", "r3")}
         |SELECT node, floor((r) * 1000000.0 + 0.5) / 1000000.0 AS rank
         |FROM r3 ORDER BY node""".stripMargin,
    "q217_lpa_communities" ->
      s"""WITH pair AS (
         |  SELECT DISTINCT 'c' || o_custkey AS src, 's' || l_suppkey AS dst
         |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
         |edges AS (SELECT src, dst FROM pair
         |          UNION ALL SELECT dst, src FROM pair),
         |l0 AS (SELECT DISTINCT src AS node, src AS community FROM edges),
         |${lpaIter("l0", "l1")},
         |${lpaIter("l1", "l2")},
         |${lpaIter("l2", "l3")},
         |csz AS (SELECT community, CAST(count(*) AS BIGINT)
         |          AS community_size
         |        FROM l3 GROUP BY 1)
         |SELECT l3.node, l3.community, csz.community_size
         |FROM l3 JOIN csz USING (community)
         |ORDER BY node""".stripMargin,
    "q214_mann_whitney" ->
      """WITH ev AS (
        |  SELECT event_type,
        |    CAST(floor(value * 100.0 + 0.5) / 100.0 AS DECIMAL(18,2)) AS v
        |  FROM events WHERE event_type IN ('click', 'purchase')
        |    AND value IS NOT NULL),
        |g AS (
        |  SELECT v,
        |    SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS np,
        |    SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS nc
        |  FROM ev GROUP BY 1),
        |t AS (
        |  SELECT np, nc,
        |    coalesce(SUM(nc) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS below_c
        |  FROM g),
        |a AS (
        |  SELECT CAST(SUM(np) AS BIGINT) AS n1,
        |    CAST(SUM(nc) AS BIGINT) AS n0,
        |    CAST(SUM(np * (2 * below_c + nc)) AS BIGINT) AS u2,
        |    CAST(SUM((np + nc) * (np + nc) * (np + nc) - (np + nc))
        |      AS BIGINT) AS tcorr
        |  FROM t)
        |SELECT n1 AS n_purchase, n0 AS n_click, u2,
        |  floor(((CAST(u2 AS DOUBLE) / 2.0
        |      - CAST(n1 AS DOUBLE) * CAST(n0 AS DOUBLE) / 2.0)
        |    / sqrt(CAST(n1 AS DOUBLE) * CAST(n0 AS DOUBLE) / 12.0
        |      * ((CAST(n1 + n0 AS DOUBLE) + 1.0)
        |        - CAST(tcorr AS DOUBLE) / (CAST(n1 + n0 AS DOUBLE)
        |          * (CAST(n1 + n0 AS DOUBLE) - 1.0)))))
        |    * 1000000.0 + 0.5) / 1000000.0 AS z,
        |  floor((CAST(u2 AS DOUBLE)
        |      / (2.0 * CAST(n1 AS DOUBLE) * CAST(n0 AS DOUBLE)))
        |    * 1000000.0 + 0.5) / 1000000.0 AS auc
        |FROM a""".stripMargin,
    "q208_adamic_adar" ->
      // Cap interpolated from the ONE engine constant (ADVICE r11):
      // a literal here could silently desync from the engine's filter.
      s"""WITH cs AS (
        |  SELECT DISTINCT 'c' || o_custkey AS c, 's' || l_suppkey AS s
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |w AS (
        |  SELECT c, CAST(floor((1.0 / ln(degc)) * 1000000.0 + 0.5)
        |    / 1000000.0 AS DECIMAL(10,6)) AS w
        |  FROM (SELECT c, count(*) AS degc FROM cs GROUP BY 1)
        |  WHERE degc BETWEEN 2 AND $HubDegreeCap),
        |p AS (
        |  SELECT a.s AS s1, b.s AS s2, w.w
        |  FROM cs a JOIN cs b ON b.c = a.c AND a.s < b.s
        |  JOIN w ON w.c = a.c)
        |SELECT s1, s2, CAST(count(*) AS BIGINT) AS n_common,
        |  floor(CAST(SUM(w) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0
        |    AS aa_score
        |FROM p GROUP BY 1, 2
        |ORDER BY aa_score DESC, s1, s2 LIMIT 25""".stripMargin,
    "q204_position_attribution" ->
      """WITH p AS (
        |  SELECT event_id AS purchase_id, user_id, epoch_ns(ts) AS pt
        |  FROM events WHERE event_type = 'purchase'),
        |c AS (
        |  SELECT event_id AS click_id, user_id, epoch_ns(ts) AS ct
        |  FROM events WHERE event_type = 'click'),
        |pr AS (
        |  SELECT p.purchase_id, c.click_id, p.user_id, c.ct
        |  FROM p JOIN c ON c.user_id = p.user_id
        |    AND ct <= pt AND ct > pt - 86400000000000),
        |rk AS (
        |  SELECT purchase_id, click_id, user_id,
        |    row_number() OVER (PARTITION BY purchase_id
        |      ORDER BY ct, click_id) AS pos,
        |    COUNT(*) OVER (PARTITION BY purchase_id) AS n_touches
        |  FROM pr)
        |SELECT purchase_id, click_id, user_id,
        |  CAST(n_touches AS BIGINT) AS n_touches,
        |  CASE WHEN n_touches = 1 THEN 'only'
        |       WHEN pos = 1 THEN 'first'
        |       WHEN pos = n_touches THEN 'last'
        |       ELSE 'middle' END AS position,
        |  CASE WHEN n_touches = 1 THEN CAST(1.0 AS DOUBLE)
        |       WHEN n_touches = 2 THEN CAST(0.5 AS DOUBLE)
        |       WHEN pos = 1 OR pos = n_touches THEN CAST(0.4 AS DOUBLE)
        |       ELSE floor((CAST(0.2 AS DOUBLE) / (n_touches - 2))
        |         * 1000000.0 + 0.5) / 1000000.0 END AS credit
        |FROM rk ORDER BY purchase_id, click_id""".stripMargin,
    "q148_decay_attribution" ->
      """WITH p AS (
        |  SELECT event_id AS purchase_id, user_id, epoch_ns(ts) AS pt
        |  FROM events WHERE event_type = 'purchase'),
        |c AS (
        |  SELECT event_id AS click_id, user_id, epoch_ns(ts) AS ct
        |  FROM events WHERE event_type = 'click'),
        |pr AS (
        |  SELECT p.purchase_id, c.click_id, p.user_id,
        |    CAST(floor((exp(CAST(ct - pt AS DOUBLE) / 1e9 / 21600.0)) * 1000000.0 + 0.5) / 1000000.0
        |      AS DECIMAL(10,6)) AS w
        |  FROM p JOIN c ON c.user_id = p.user_id
        |    AND ct <= pt AND ct > pt - 86400000000000)
        |SELECT purchase_id, click_id, user_id, CAST(w AS DOUBLE) AS w,
        |  floor((CAST(w AS DOUBLE) /
        |    CAST(SUM(w) OVER (PARTITION BY purchase_id) AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0
        |    AS credit
        |FROM pr ORDER BY purchase_id, click_id""".stripMargin,
    "q143_chi_square" ->
      """WITH cells AS (
        |  SELECT lang AS r, source AS c, COUNT(*) AS o
        |  FROM documents GROUP BY 1, 2),
        |m AS (
        |  SELECT r, c, o,
        |    SUM(o) OVER (PARTITION BY r) AS rt,
        |    SUM(o) OVER (PARTITION BY c) AS ct,
        |    SUM(o) OVER () AS n
        |  FROM cells),
        |x AS (
        |  SELECT r, c, o,
        |    floor((CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE)
        |      / CAST(n AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0 AS expected
        |  FROM m),
        |y AS (
        |  SELECT r, c, o, expected,
        |    floor((CAST((o - CAST(expected AS DECIMAL(18,6))) *
        |          (o - CAST(expected AS DECIMAL(18,6))) AS DOUBLE)
        |      / CAST(CAST(expected AS DECIMAL(18,6)) AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0 AS contrib
        |  FROM x),
        |d AS (SELECT COUNT(DISTINCT r) AS nr, COUNT(DISTINCT c) AS nc
        |      FROM cells)
        |SELECT y.r, y.c, CAST(y.o AS BIGINT) AS observed, y.expected,
        |  y.contrib,
        |  CAST(SUM(CAST(y.contrib AS DECIMAL(18,6))) OVER () AS DOUBLE)
        |    AS chi2,
        |  CAST((d.nr - 1) * (d.nc - 1) AS BIGINT) AS dof
        |FROM y CROSS JOIN d ORDER BY y.r, y.c""".stripMargin,
    "q144_feature_hashing" ->
      s"""WITH t AS (
         |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok
         |  FROM documents),
         |h AS (
         |  SELECT doc_id,
         |    CAST((md5_number_lower('144:b:' || tok) & $H) % 64 AS INT)
         |      AS bucket,
         |    CASE WHEN (md5_number_lower('144:s:' || tok) & $H) % 2 = 0
         |      THEN 1 ELSE -1 END AS sign
         |  FROM t WHERE len(tok) > 0)
         |SELECT doc_id, bucket, CAST(SUM(sign) AS BIGINT) AS val,
         |  CAST(COUNT(*) AS BIGINT) AS n_tokens
         |FROM h GROUP BY 1, 2 ORDER BY doc_id, bucket""".stripMargin,
    "q101_column_profile" -> profOracle,
    "q114_corr_matrix" -> corrOracle,
    "q117_next_event_rows" ->
      """WITH e AS (SELECT user_id, event_id, event_type,
        |                  epoch_ns(ts) AS t FROM events),
        |r AS (SELECT user_id, event_id, event_type,
        |        row_number() OVER w AS seq_n,
        |        lag(event_type) OVER w AS prev_type,
        |        (t - lag(t) OVER w) AS gap_ns
        |      FROM e WINDOW w AS (PARTITION BY user_id
        |                          ORDER BY t, event_id))
        |SELECT user_id, event_id, CAST(seq_n AS BIGINT) AS seq_n,
        |       prev_type, CAST(gap_ns // 1000000000 AS BIGINT) AS dwell_s,
        |       event_type AS label
        |FROM r WHERE seq_n >= 2
        |ORDER BY user_id, seq_n""".stripMargin,
    "q118_pareto_customers" ->
      """WITH s AS (
        |  SELECT o_custkey AS c_custkey,
        |         CAST(count(*) AS BIGINT) AS n_orders,
        |         CAST(SUM(CAST(floor(o_totalprice * 100.0 + 0.5) / 100.0 AS DECIMAL(18,2))) AS DOUBLE)
        |           / count(*) AS avg_value
        |  FROM orders GROUP BY 1)
        |SELECT c_custkey, n_orders, avg_value FROM s x
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM s y
        |  WHERE y.avg_value >= x.avg_value AND y.n_orders >= x.n_orders
        |    AND (y.avg_value > x.avg_value OR y.n_orders > x.n_orders))
        |ORDER BY c_custkey""".stripMargin,
    "q160_jaro_winkler" ->
      """WITH n AS (SELECT DISTINCT p_name AS name FROM part)
        |SELECT a.name AS name_a, b.name AS name_b,
        |  floor((jaro_winkler_similarity(a.name, b.name)) * 1000000.0 + 0.5) / 1000000.0 AS jw
        |FROM n a JOIN n b ON a.name < b.name
        |WHERE floor((jaro_winkler_similarity(a.name, b.name)) * 1000000.0 + 0.5) / 1000000.0 >= 0.75
        |ORDER BY 1, 2""".stripMargin,
    "q159_bfs_reach" ->
      """WITH pair AS (
        |  SELECT DISTINCT 'c' || o_custkey AS src, 's' || l_suppkey AS dst
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |edges AS (SELECT src, dst FROM pair
        |          UNION ALL SELECT dst, src FROM pair),
        |f0 AS (SELECT DISTINCT 's' || s_suppkey AS node
        |       FROM supplier WHERE s_nationkey = 0),
        |v0 AS (SELECT node FROM f0),
        |f1 AS (SELECT DISTINCT e.dst AS node
        |       FROM edges e JOIN f0 ON f0.node = e.src
        |       EXCEPT SELECT node FROM v0),
        |v1 AS (SELECT node FROM v0 UNION SELECT node FROM f1),
        |f2 AS (SELECT DISTINCT e.dst AS node
        |       FROM edges e JOIN f1 ON f1.node = e.src
        |       EXCEPT SELECT node FROM v1),
        |v2 AS (SELECT node FROM v1 UNION SELECT node FROM f2),
        |f3 AS (SELECT DISTINCT e.dst AS node
        |       FROM edges e JOIN f2 ON f2.node = e.src
        |       EXCEPT SELECT node FROM v2),
        |v3 AS (SELECT node FROM v2 UNION SELECT node FROM f3),
        |reached AS (
        |  SELECT 0 AS hop, node FROM f0
        |  UNION ALL SELECT 1, node FROM f1
        |  UNION ALL SELECT 2, node FROM f2
        |  UNION ALL SELECT 3, node FROM f3),
        |unre AS (SELECT -1 AS hop, node FROM
        |  (SELECT DISTINCT src AS node FROM edges
        |   EXCEPT SELECT node FROM v3)),
        |allh AS (SELECT hop FROM reached UNION ALL SELECT hop FROM unre)
        |SELECT hop, CAST(count(*) AS BIGINT) AS n_nodes
        |FROM allh GROUP BY 1 ORDER BY 1""".stripMargin,
    "q158_ks_drift" ->
      """WITH o AS (SELECT (epoch_ns(o_orderdate) // 1000000000) // 86400
        |                    AS day,
        |                  o_totalprice FROM orders),
        |m AS (SELECT (min(day) + max(day) + 1) // 2 AS mid FROM o),
        |b AS (SELECT CASE WHEN day < mid THEN 'a' ELSE 'b' END AS period,
        |             o_totalprice AS v FROM o CROSS JOIN m),
        |c AS (SELECT v,
        |        sum(CASE WHEN period = 'a' THEN 1 ELSE 0 END) AS c_a,
        |        sum(CASE WHEN period = 'b' THEN 1 ELSE 0 END) AS c_b
        |      FROM b GROUP BY 1),
        |g AS (SELECT
        |        CAST(sum(c_a) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
        |          AS DECIMAL(38,0)) AS cum_a,
        |        CAST(sum(c_b) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
        |          AS DECIMAL(38,0)) AS cum_b,
        |        CAST(sum(c_a) OVER () AS DECIMAL(38,0)) AS tot_a,
        |        CAST(sum(c_b) OVER () AS DECIMAL(38,0)) AS tot_b
        |      FROM c),
        |s AS (SELECT max(tot_a) AS n_a, max(tot_b) AS n_b,
        |             max(abs(cum_a * tot_b - cum_b * tot_a)) AS dnum
        |      FROM g)
        |SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
        |  floor((CAST(dnum AS DOUBLE) / CAST(n_a * n_b AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0 AS d,
        |  floor((1.358 * sqrt(CAST(n_a + n_b AS DOUBLE)
        |                     / CAST(n_a * n_b AS DOUBLE))) * 1000000.0 + 0.5) / 1000000.0 AS crit_05
        |FROM s""".stripMargin,
    "q115_psi_drift" ->
      """WITH o AS (SELECT (epoch_ns(o_orderdate) // 1000000000) // 86400
        |                    AS day,
        |                  o_totalprice FROM orders),
        |m AS (SELECT (min(day) + max(day) + 1) // 2 AS mid FROM o),
        |b AS (SELECT CASE WHEN day < mid THEN 'a' ELSE 'b' END AS period,
        |             CAST(floor(o_totalprice / 50000) AS BIGINT) AS bin
        |      FROM o CROSS JOIN m),
        |c AS (SELECT bin,
        |        CAST(sum(CASE WHEN period = 'a' THEN 1 ELSE 0 END) AS BIGINT)
        |          AS n_a,
        |        CAST(sum(CASE WHEN period = 'b' THEN 1 ELSE 0 END) AS BIGINT)
        |          AS n_b
        |      FROM b GROUP BY 1),
        |t AS (SELECT CAST(count(*) AS BIGINT) AS nbins,
        |             CAST(sum(n_a) AS BIGINT) AS tot_a,
        |             CAST(sum(n_b) AS BIGINT) AS tot_b FROM c)
        |SELECT bin, n_a, n_b,
        |       floor((((n_a + 1.0) / (tot_a + nbins)
        |               - (n_b + 1.0) / (tot_b + nbins))
        |             * ln(((n_a + 1.0) / (tot_a + nbins))
        |                  / ((n_b + 1.0) / (tot_b + nbins)))) * 1000000.0 + 0.5) / 1000000.0
        |         AS psi_contrib
        |FROM c CROSS JOIN t ORDER BY bin""".stripMargin,
    "q113_zorder_stats" ->
      s"""WITH m AS (SELECT max(l_partkey) AS mxp, max(l_suppkey) AS mxs
         |           FROM lineitem),
         |s AS (SELECT l_partkey, l_suppkey,
         |        (l_partkey * 256) // (mxp + 1) AS xb,
         |        (l_suppkey * 256) // (mxs + 1) AS yb
         |      FROM lineitem CROSS JOIN m),
         |z AS (SELECT l_partkey, l_suppkey,
         |        (${zSql("xb", "yb", 8)}) AS zv
         |      FROM s)
         |SELECT (zv >> 10) AS bucket, CAST(count(*) AS BIGINT) AS n,
         |       min(l_partkey) AS min_l_partkey,
         |       max(l_partkey) AS max_l_partkey,
         |       min(l_suppkey) AS min_l_suppkey,
         |       max(l_suppkey) AS max_l_suppkey
         |FROM z GROUP BY 1 ORDER BY 1""".stripMargin,
    "q103_incremental_mv" ->
      """SELECT (epoch_ns(o_orderdate) // 1000000000) // 2592000 AS period,
        |       o_orderstatus,
        |       CAST(count(*) AS BIGINT) AS n_orders,
        |       CAST(SUM(CAST(floor(o_totalprice * 100.0 + 0.5) / 100.0 AS DECIMAL(18,2))) AS DOUBLE) AS sum_total,
        |       CAST(MIN(CAST(floor(o_totalprice * 100.0 + 0.5) / 100.0 AS DECIMAL(18,2))) AS DOUBLE) AS min_total,
        |       CAST(MAX(CAST(floor(o_totalprice * 100.0 + 0.5) / 100.0 AS DECIMAL(18,2))) AS DOUBLE) AS max_total
        |FROM orders GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q104_triangle_counts" ->
      // Cap interpolated from the ONE engine constant (ADVICE r11).
      s"""WITH pr AS (SELECT DISTINCT l_orderkey AS k,
        |                   l_partkey::VARCHAR AS p, l_partkey AS pn
        |            FROM lineitem),
        |okb AS (SELECT k FROM pr GROUP BY k
        |        HAVING count(*) BETWEEN 2 AND $BasketCap),
        |pairs AS (SELECT least(a.p, b.p) AS u, greatest(a.p, b.p) AS v
        |          FROM pr a JOIN okb ON okb.k = a.k
        |          JOIN pr b ON a.k = b.k AND a.pn < b.pn
        |          GROUP BY 1, 2 HAVING count(*) >= 2),
        |deg AS (SELECT n, CAST(count(*) AS BIGINT) AS d
        |        FROM (SELECT u AS n FROM pairs UNION ALL SELECT v AS n FROM pairs)
        |        GROUP BY 1),
        |ori AS (SELECT CASE WHEN d1.d < d2.d OR (d1.d = d2.d AND pairs.u < pairs.v)
        |                    THEN pairs.u ELSE pairs.v END AS s,
        |               CASE WHEN d1.d < d2.d OR (d1.d = d2.d AND pairs.u < pairs.v)
        |                    THEN pairs.v ELSE pairs.u END AS t
        |        FROM pairs JOIN deg d1 ON d1.n = pairs.u
        |        JOIN deg d2 ON d2.n = pairs.v),
        |tri AS (SELECT w1.s AS a, w1.t AS b, w2.t AS c
        |        FROM ori w1 JOIN ori w2 ON w1.s = w2.s AND w1.t < w2.t
        |        JOIN (SELECT least(s, t) AS b, greatest(s, t) AS c FROM ori) cl
        |          ON cl.b = w1.t AND cl.c = w2.t),
        |roles AS (SELECT a AS node FROM tri UNION ALL SELECT b FROM tri
        |          UNION ALL SELECT c FROM tri)
        |SELECT CAST(node AS BIGINT) AS part_key,
        |       CAST(count(*) AS BIGINT) AS n_triangles
        |FROM roles GROUP BY 1 ORDER BY 2 DESC, 1 LIMIT 25""".stripMargin,
    "q105_scd2_history" -> scd2RebuildOracle,
    // q254's gate is the INCREMENTAL == FULL-REBUILD identity: the
    // engine merges a change batch into the pre-cut history, the oracle
    // rebuilds from the whole log — they must agree row for row.
    "q254_scd2_increment" -> scd2RebuildOracle,
    "q176_clamped_balance" ->
      """WITH RECURSIVE e AS (
        |  SELECT user_id,
        |    CAST(CASE WHEN event_type = 'purchase' THEN 1 ELSE -1 END
        |      * (floor(value * 100.0 + 0.5) / 100.0)
        |      AS DECIMAL(18,2)) AS d,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY epoch_ns(ts), event_id) AS i,
        |    count(*) OVER (PARTITION BY user_id) AS n
        |  FROM events WHERE event_type IN ('purchase', 'error')),
        |rec AS (
        |  SELECT user_id, i, n,
        |    CAST(CASE WHEN d < 0 THEN 0 ELSE d END AS DECIMAL(18,2))
        |      AS bal,
        |    CASE WHEN d < 0 THEN 1 ELSE 0 END AS nclamp
        |  FROM e WHERE i = 1
        |  UNION ALL
        |  SELECT e.user_id, e.i, e.n,
        |    CAST(CASE WHEN rec.bal + e.d < 0 THEN 0
        |              ELSE rec.bal + e.d END AS DECIMAL(18,2)),
        |    rec.nclamp + CASE WHEN rec.bal + e.d < 0 THEN 1 ELSE 0 END
        |  FROM e JOIN rec ON e.user_id = rec.user_id
        |                 AND e.i = rec.i + 1)
        |SELECT user_id, CAST(n AS BIGINT) AS n_events,
        |  CAST(nclamp AS BIGINT) AS n_clamped,
        |  floor(CAST(bal AS DOUBLE) * 100.0 + 0.5) / 100.0
        |    AS final_balance
        |FROM rec WHERE i = n ORDER BY user_id""".stripMargin,
    "q175_kcore_peel" ->
      """WITH pair AS (
        |  SELECT DISTINCT 'c' || o_custkey AS src, 's' || l_suppkey AS dst
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |edges AS (SELECT src, dst FROM pair
        |          UNION ALL SELECT dst, src FROM pair),
        |r1 AS (SELECT src AS node FROM edges GROUP BY 1
        |       HAVING count(*) < 3),
        |e2 AS (SELECT src, dst FROM edges
        |       WHERE src NOT IN (SELECT node FROM r1)
        |         AND dst NOT IN (SELECT node FROM r1)),
        |r2 AS (SELECT src AS node FROM e2 GROUP BY 1
        |       HAVING count(*) < 3),
        |e3 AS (SELECT src, dst FROM e2
        |       WHERE src NOT IN (SELECT node FROM r2)
        |         AND dst NOT IN (SELECT node FROM r2)),
        |r3 AS (SELECT src AS node FROM e3 GROUP BY 1
        |       HAVING count(*) < 3),
        |e4 AS (SELECT src, dst FROM e3
        |       WHERE src NOT IN (SELECT node FROM r3)
        |         AND dst NOT IN (SELECT node FROM r3)),
        |r4 AS (SELECT src AS node FROM e4 GROUP BY 1
        |       HAVING count(*) < 3),
        |e5 AS (SELECT src, dst FROM e4
        |       WHERE src NOT IN (SELECT node FROM r4)
        |         AND dst NOT IN (SELECT node FROM r4))
        |SELECT 1 AS peel_round, CAST(count(*) AS BIGINT) AS n_nodes FROM r1
        |UNION ALL SELECT 2, CAST(count(*) AS BIGINT) FROM r2
        |UNION ALL SELECT 3, CAST(count(*) AS BIGINT) FROM r3
        |UNION ALL SELECT 4, CAST(count(*) AS BIGINT) FROM r4
        |UNION ALL SELECT 0, CAST(count(DISTINCT src) AS BIGINT) FROM e5
        |ORDER BY peel_round""".stripMargin,
    "q174_rolling_actives" ->
      """WITH du AS (
        |  SELECT DISTINCT user_id, epoch_ns(ts) // 86400000000000 AS day
        |  FROM events),
        |mx AS (SELECT max(day) AS dmax FROM du),
        |dau AS (SELECT day, CAST(count(DISTINCT user_id) AS BIGINT)
        |          AS dau FROM du GROUP BY 1),
        |cov AS (SELECT DISTINCT user_id,
        |          unnest(generate_series(day, day + 6)) AS day FROM du),
        |wau AS (SELECT day, CAST(count(DISTINCT user_id) AS BIGINT)
        |          AS wau
        |        FROM cov CROSS JOIN mx WHERE day <= dmax GROUP BY 1)
        |SELECT dau.day, dau, wau
        |FROM dau JOIN wau ON dau.day = wau.day
        |ORDER BY dau.day""".stripMargin,
    "q171_linear_interp" ->
      """WITH pts AS (
        |  SELECT n_name AS nation,
        |         (epoch_ns(o_orderdate) // 1000000000) // 86400 AS day,
        |         CAST(SUM(CAST(floor(o_totalprice * 100.0 + 0.5) / 100.0 AS DECIMAL(18,2))) AS DOUBLE)
        |           AS revenue
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  GROUP BY 1, 2),
        |b AS (SELECT nation, min(day) AS d0, max(day) AS d1
        |      FROM pts GROUP BY 1),
        |grid AS (SELECT nation, unnest(generate_series(d0, d1)) AS day
        |         FROM b),
        |j AS (SELECT grid.nation, grid.day, pts.revenue
        |      FROM grid LEFT JOIN pts
        |        ON grid.nation = pts.nation AND grid.day = pts.day),
        |w AS (SELECT nation, day, revenue,
        |        last_value(revenue IGNORE NULLS) OVER
        |          (PARTITION BY nation ORDER BY day
        |           ROWS UNBOUNDED PRECEDING) AS vp,
        |        last_value(CASE WHEN revenue IS NOT NULL THEN day END
        |          IGNORE NULLS) OVER
        |          (PARTITION BY nation ORDER BY day
        |           ROWS UNBOUNDED PRECEDING) AS dp,
        |        first_value(revenue IGNORE NULLS) OVER
        |          (PARTITION BY nation ORDER BY day
        |           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS vn,
        |        first_value(CASE WHEN revenue IS NOT NULL THEN day END
        |          IGNORE NULLS) OVER
        |          (PARTITION BY nation ORDER BY day
        |           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS dn
        |      FROM j),
        |w2 AS (SELECT *, CAST(floor((vp * 100) + 0.5) AS BIGINT) AS vpc,
        |         CAST(floor((vn * 100) + 0.5) AS BIGINT) AS vnc FROM w),
        |w3 AS (SELECT *,
        |         CAST(vpc AS HUGEINT) * (dn - dp)
        |           + CAST(vnc - vpc AS HUGEINT) * (day - dp) AS num,
        |         CAST((dn - dp) * 100 AS HUGEINT) AS den
        |       FROM w2)
        |SELECT nation, day, coalesce(revenue, 0.0) AS revenue,
        |  CASE WHEN revenue IS NOT NULL THEN revenue
        |       WHEN dp IS NULL THEN vn
        |       WHEN dn IS NULL THEN vp
        |       ELSE CAST(CAST((num * 2000000 + den) // (den * 2)
        |              AS BIGINT) AS DOUBLE) / 1000000.0 END
        |    AS revenue_interp,
        |  revenue IS NULL AS is_gap
        |FROM w3 ORDER BY 1, 2""".stripMargin,
    "q106_gap_fill" ->
      """WITH pts AS (
        |  SELECT n_name AS nation,
        |         (epoch_ns(o_orderdate) // 1000000000) // 86400 AS day,
        |         CAST(SUM(CAST(floor(o_totalprice * 100.0 + 0.5) / 100.0 AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  GROUP BY 1, 2),
        |b AS (SELECT nation, min(day) AS d0, max(day) AS d1 FROM pts GROUP BY 1),
        |grid AS (SELECT nation, unnest(generate_series(d0, d1)) AS day FROM b),
        |j AS (SELECT grid.nation, grid.day, pts.revenue
        |      FROM grid LEFT JOIN pts
        |        ON grid.nation = pts.nation AND grid.day = pts.day)
        |SELECT nation, day, coalesce(revenue, 0.0) AS revenue,
        |       last_value(revenue IGNORE NULLS) OVER
        |         (PARTITION BY nation ORDER BY day
        |          ROWS UNBOUNDED PRECEDING) AS revenue_ffill,
        |       revenue IS NULL AS is_gap
        |FROM j ORDER BY 1, 2""".stripMargin,
    "q297_busy_time_union" ->
      """WITH e AS (SELECT user_id, epoch_ns(ts) AS t, event_id FROM events),
        |r AS (SELECT user_id, t, event_id,
        |        CASE WHEN lag(t) OVER w IS NULL
        |               OR t - lag(t) OVER w > 1800000000000
        |             THEN 1 ELSE 0 END AS ns
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)),
        |s AS (SELECT user_id, t,
        |        sum(ns) OVER (PARTITION BY user_id ORDER BY t, event_id
        |                      ROWS UNBOUNDED PRECEDING) AS sid
        |      FROM r),
        |iv AS (SELECT user_id, sid, min(t) AS st, max(t) AS en
        |       FROM s GROUP BY 1, 2),
        |iv2 AS (SELECT st, en FROM iv WHERE en > st),
        |segs AS (
        |  SELECT day,
        |    greatest(st, day * 86400000000000) AS s,
        |    least(en, (day + 1) * 86400000000000) AS e
        |  FROM (SELECT st, en,
        |          unnest(generate_series(st // 86400000000000,
        |                                 en // 86400000000000)) AS day
        |        FROM iv2) x
        |  WHERE least(en, (day + 1) * 86400000000000)
        |      > greatest(st, day * 86400000000000)),
        |d AS (
        |  SELECT day, s AS t, CAST(1 AS BIGINT) AS dd FROM segs
        |  UNION ALL SELECT day, e, CAST(-1 AS BIGINT) FROM segs),
        |w1 AS (
        |  SELECT day, t, dd,
        |    sum(dd) OVER (PARTITION BY day ORDER BY t, dd
        |                  ROWS UNBOUNDED PRECEDING) AS run,
        |    lead(t) OVER (PARTITION BY day ORDER BY t, dd) AS nxt
        |  FROM d),
        |b AS (
        |  SELECT day,
        |    SUM(CASE WHEN run > 0 AND nxt IS NOT NULL THEN nxt - t
        |        ELSE 0 END) AS busy_ns,
        |    CAST(count(*) // 2 AS BIGINT) AS n_segments
        |  FROM w1 GROUP BY 1)
        |SELECT day, n_segments,
        |  CAST(busy_ns // 1000000000 AS BIGINT) AS busy_s,
        |  CAST((2 * CAST(busy_ns AS HUGEINT) * 1000000 + 86400000000000)
        |    // (2 * 86400000000000) AS BIGINT) AS busy_ppm_of_day
        |FROM b ORDER BY day""".stripMargin,
    "q111_session_concurrency" ->
      """WITH e AS (SELECT user_id, epoch_ns(ts) AS t, event_id FROM events),
        |r AS (SELECT user_id, t, event_id,
        |        CASE WHEN lag(t) OVER w IS NULL
        |               OR t - lag(t) OVER w > 1800000000000
        |             THEN 1 ELSE 0 END AS ns
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)),
        |s AS (SELECT user_id, t,
        |        sum(ns) OVER (PARTITION BY user_id ORDER BY t, event_id
        |                      ROWS UNBOUNDED PRECEDING) AS sid
        |      FROM r),
        |iv AS (SELECT user_id, sid, min(t) AS st, max(t) AS en
        |       FROM s GROUP BY 1, 2),
        |d AS (SELECT st AS t, CAST(1 AS BIGINT) AS dd FROM iv
        |      UNION ALL SELECT en, CAST(-1 AS BIGINT) FROM iv),
        |dd AS (SELECT t, dd, t // 86400000000000 AS day FROM d),
        |w1 AS (SELECT day, t, dd,
        |         sum(dd) OVER (PARTITION BY day ORDER BY t, dd
        |                       ROWS UNBOUNDED PRECEDING) AS run
        |       FROM dd),
        |pd AS (SELECT day, max(run) AS max_run, sum(dd) AS day_delta,
        |              CAST(count(*) AS BIGINT) AS n_boundaries
        |       FROM w1 GROUP BY 1),
        |c AS (SELECT day, max_run, n_boundaries,
        |        coalesce(sum(day_delta) OVER (ORDER BY day
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS carry
        |      FROM pd)
        |SELECT day,
        |       CAST(carry + greatest(max_run, 0) AS BIGINT) AS max_concurrency,
        |       n_boundaries
        |FROM c ORDER BY day""".stripMargin,
    "q109_spend_outliers" ->
      """WITH spend AS (
        |  SELECT c_custkey, n_name AS nation,
        |         CAST(count(*) AS BIGINT) AS n_orders,
        |         CAST(SUM(CAST(floor(o_totalprice * 100.0 + 0.5) / 100.0 AS DECIMAL(18,2))) AS DOUBLE) AS spend
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  GROUP BY 1, 2),
        |z AS (SELECT c_custkey, nation, n_orders, spend,
        |        floor(((spend - avg(spend) OVER (PARTITION BY nation))
        |              / stddev_samp(spend) OVER (PARTITION BY nation)) * 1000000.0 + 0.5) / 1000000.0 AS z
        |      FROM spend)
        |SELECT * FROM z WHERE abs(z) >= 2.5 ORDER BY c_custkey""".stripMargin,
    "q46_cohort_retention" ->
      """WITH d AS (
        |  SELECT user_id, epoch_ns(ts) // 86400000000000 AS day FROM events),
        |f AS (SELECT user_id, MIN(day) AS first_day FROM d GROUP BY 1)
        |SELECT f.first_day // 7 AS cohort_week,
        |       (d.day - f.first_day) // 7 AS week_offset,
        |       count(DISTINCT d.user_id) AS active_users
        |FROM d JOIN f ON d.user_id = f.user_id
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q47_fuzzy_names" ->
      s"""WITH names AS (
         |  SELECT p_name AS name, CAST(count(*) AS BIGINT) AS n_rows,
         |         regexp_extract(p_name, '(\\S+)$$', 1) AS blk
         |  FROM part GROUP BY 1)
         |SELECT a.name AS name_a, b.name AS name_b,
         |       CAST(levenshtein(a.name, b.name) AS BIGINT) AS dist,
         |       a.n_rows AS n_rows_a, b.n_rows AS n_rows_b
         |FROM names a JOIN names b
         |  ON a.blk = b.blk AND a.name < b.name
         |WHERE levenshtein(a.name, b.name) BETWEEN 1 AND 2
         |ORDER BY 1, 2""".stripMargin,
    "q48_heavy_hitters" ->
      s"""WITH counts AS (
         |  SELECT l_partkey::VARCHAR AS k, CAST(count(*) AS BIGINT) AS c
         |  FROM lineitem GROUP BY 1),
         |keyed AS (
         |  SELECT k, c, r,
         |    ((md5_number_lower(r::VARCHAR || ':' || k) & $H)::BIGINT % 256) AS b
         |  FROM counts CROSS JOIN generate_series(0, 3) g(r)),
         |cells AS (SELECT r, b, CAST(sum(c) AS BIGINT) AS cell
         |          FROM keyed GROUP BY 1, 2)
         |SELECT k::BIGINT AS part_key, c AS true_count,
         |       CAST(min(cell) AS BIGINT) AS est_count
         |FROM keyed JOIN cells USING (r, b)
         |GROUP BY 1, 2
         |ORDER BY est_count DESC, part_key LIMIT 25""".stripMargin,
    "q200_personalized_pagerank" ->
      s"""WITH pair AS (
         |  SELECT DISTINCT 'c' || o_custkey AS src, 's' || l_suppkey AS dst
         |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
         |edges AS (SELECT src, dst FROM pair
         |          UNION ALL SELECT dst, src FROM pair),
         |deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg
         |        FROM edges GROUP BY 1),
         |ed AS (SELECT e.src, e.dst, d.deg FROM edges e
         |       JOIN deg d ON d.src = e.src),
         |nodes AS (SELECT DISTINCT src AS node FROM edges),
         |seeds AS (SELECT DISTINCT 'c' || c_custkey AS node
         |          FROM customer WHERE c_nationkey = 3),
         |sn AS (SELECT n.node, s.node IS NOT NULL AS is_seed
         |       FROM nodes n LEFT JOIN seeds s ON s.node = n.node),
         |ns AS (SELECT CAST(count(*) AS DOUBLE) AS k FROM sn
         |       WHERE is_seed),
         |r0 AS (SELECT node, is_seed,
         |         CASE WHEN is_seed THEN CAST(1.0 AS DOUBLE) / ns.k
         |              ELSE CAST(0.0 AS DOUBLE) END AS r
         |       FROM sn CROSS JOIN ns),
         |${pprIter("r0", "r1")},
         |${pprIter("r1", "r2")},
         |${pprIter("r2", "r3")}
         |SELECT node, is_seed,
         |  floor((r) * 1000000.0 + 0.5) / 1000000.0 AS rank
         |FROM r3 ORDER BY node""".stripMargin,
    "q49_pagerank" ->
      s"""WITH pair AS (
         |  SELECT DISTINCT 'c' || o_custkey AS src, 's' || l_suppkey AS dst
         |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
         |edges AS (SELECT src, dst FROM pair
         |          UNION ALL SELECT dst, src FROM pair),
         |deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg
         |        FROM edges GROUP BY 1),
         |ed AS (SELECT e.src, e.dst, d.deg FROM edges e
         |       JOIN deg d ON d.src = e.src),
         |nodes AS (SELECT DISTINCT src AS node FROM edges),
         |ncount AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
         |r0 AS (SELECT node, CAST(1.0 AS DOUBLE) / nn.n AS r
         |       FROM nodes CROSS JOIN ncount nn),
         |${prIter("r0", "r1")},
         |${prIter("r1", "r2")},
         |${prIter("r2", "r3")}
         |SELECT node, floor((r) * 1000000.0 + 0.5) / 1000000.0 AS rank FROM r3 ORDER BY node""".stripMargin,
    "q100_merge_upsert" ->
      """WITH upd AS (
        |  SELECT c_custkey, c_name,
        |         CASE WHEN c_custkey % 10 = 0 THEN c_acctbal + 100.0
        |              ELSE c_acctbal END AS c_acctbal,
        |         c_mktsegment
        |  FROM customer WHERE c_custkey % 3 = 0 OR c_custkey % 10 = 0
        |  UNION ALL
        |  SELECT c_custkey + 1000000, 'new:' || c_name, c_acctbal,
        |         c_mktsegment
        |  FROM customer WHERE c_custkey % 97 = 0)
        |SELECT coalesce(u.c_custkey, b.c_custkey) AS c_custkey,
        |       CASE WHEN u.c_custkey IS NOT NULL THEN u.c_name
        |            ELSE b.c_name END AS c_name,
        |       CASE WHEN u.c_custkey IS NOT NULL THEN u.c_acctbal
        |            ELSE b.c_acctbal END AS c_acctbal,
        |       CASE WHEN u.c_custkey IS NOT NULL THEN u.c_mktsegment
        |            ELSE b.c_mktsegment END AS c_mktsegment,
        |       CASE WHEN b.c_custkey IS NULL THEN 'insert'
        |            WHEN u.c_custkey IS NULL THEN 'retain'
        |            WHEN b.c_name IS DISTINCT FROM u.c_name
        |              OR b.c_acctbal IS DISTINCT FROM u.c_acctbal
        |              OR b.c_mktsegment IS DISTINCT FROM u.c_mktsegment
        |              THEN 'update'
        |            ELSE 'unchanged' END AS action
        |FROM customer b FULL OUTER JOIN upd u ON b.c_custkey = u.c_custkey
        |ORDER BY 1""".stripMargin)
}
