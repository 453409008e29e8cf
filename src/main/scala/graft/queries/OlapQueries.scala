package graft.queries

import graft.io.Tables
import graft.ops.Relational.decSum
import graft.ops.TimeSeries
import graft.text.Fuzzy
import graft.functions.GraftFunctions.{decFold, decOut, qdec, qdecSql, qdecWideSql, qround}

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.{DataFrame, SparkSession}

/** OLAP / warehouse-analytics wave 2 (round 6): the window-frame and
  * distribution operators still missing from the surface after the q103+
  * wave — bounded-frame moving statistics, Markov transition matrices,
  * native unpivot (wide→long), percent-of-total contribution with ABC
  * classes, sort-free equi-depth histograms, and MAD-based robust
  * outliers.
  *
  * Determinism rules as everywhere in the repo: decimal-exact sums
  * ([[graft.ops.Relational.decSum]]), integer time arithmetic, percentile
  * values rounded to 6 decimals BEFORE any downstream arithmetic so both
  * engines compute over bit-identical inputs, explicit total-order
  * `orderBy` with null conventions pinned on both sides.
  */
object OlapQueries {
  type Q = (SparkSession, String) => DataFrame

  /** Orders joined to their customer's nation — the shared revenue frame.
    * nation (25 rows) and customer broadcast under AQE at every SF. */
  private def nationOrders(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .join(Tables.nation(spark, dir), col("c_nationkey") === col("n_nationkey"))

  /** q121 — bounded-frame moving statistics (7-observed-day moving
    * revenue per nation): the rolling-average sibling of q17's unbounded
    * prefix sum and q83's hop windows. The fact table reduces to the
    * (nation × day) daily frame FIRST (map-side partial + one grouped
    * aggregate), so the window exchange and sort touch only a
    * calendar-bounded frame (nations × span-days ≈ 60k rows at EVERY
    * scale factor), never order rows. Moving sum stays decimal-exact in
    * the frame; the average is one double divide of exact operands. */
  val q121: Q = (spark, dir) => {
    val daily = SharedFrames.dailyNationRevenue(spark, dir)
    val w = Window.partitionBy("nation").orderBy("day").rowsBetween(-6, 0)
    daily.select(col("nation"), col("day"),
        col("rev").cast("double").as("revenue"),
        sum(col("rev")).over(w).cast("double").as("rev_7d"),
        count(lit(1)).over(w).as("n_7d"),
        (sum(col("rev")).over(w).cast("double") / count(lit(1)).over(w))
          .as("avg_7d"))
      .orderBy("nation", "day")
  }

  /** q122 — first-order Markov transition matrix over user event
    * journeys: P(next_type | prev_type) from per-user lag pairs. One
    * user_id exchange manufactures the transitions; the conditional
    * probability normalizes on the |types|² matrix (25 rows here — the
    * matrix is vocabulary-bounded, not data-bounded, so the normalizing
    * window is O(1) at any corpus size). The probability is one double
    * divide of exact integer counts. */
  val q122: Q = (spark, dir) => {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("event_type").as("next_type"))
      .agg(count(lit(1)).as("n_transitions"))
      .withColumn("p", qround(col("n_transitions").cast("double") /
        sum(col("n_transitions")).over(Window.partitionBy("prev_type")), 6))
      .orderBy("prev_type", "next_type")
  }

  /** q123 — native unpivot (wide→long melt) of lineitem's four numeric
    * measures, row-level. Spark plans `unpivot` as a single Expand (4
    * output rows per input row, zero shuffle); the id-column slice
    * predicate is pushed BELOW the Expand to the scan (a modulo can't
    * enter parquet's PushedFilters, but it filters AT the scan, before
    * the 4× row expansion) — the shape that matters when melting a
    * 100 TB fact table for a long-format export. */
  val q123: Q = (spark, dir) =>
    Tables.lineitem(spark, dir)
      .filter(col("l_orderkey") % 997 === 0)
      .unpivot(
        Array(col("l_orderkey"), col("l_linenumber")),
        Array(col("l_quantity"), col("l_extendedprice"), col("l_discount"),
          col("l_tax")),
        "measure", "v")
      .orderBy("l_orderkey", "l_linenumber", "measure")

  /** q124 — revenue contribution / ABC analysis per nation:
    * percent-of-total, descending cumulative share, and the classic
    * A(≤50%) / B(≤80%) / C tail classes. Facts reduce to the bounded
    * nation frame first; both analytic windows (grand total, running
    * share) run over 25 rows — the "unpartitioned window" is safe
    * because its input is dimension-bounded, the same argument as q118's
    * bucket frame. Shares divide exact decimal sums once, in double;
    * classes compare the ROUNDED share on both engines. */
  val q124: Q = (spark, dir) => {
    val rev = nationOrders(spark, dir)
      .groupBy(col("n_name").as("nation"))
      .agg(count(lit(1)).as("n_orders"), decSum(col("o_totalprice")).as("rev"))
    val tot = Window.partitionBy()
    val cum = Window.orderBy(col("rev").desc, col("nation"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rev.select(col("nation"), col("n_orders"),
        col("rev").cast("double").as("revenue"),
        qround(col("rev").cast("double") /
          sum(col("rev")).over(tot).cast("double"), 6).as("share"),
        qround(sum(col("rev")).over(cum).cast("double") /
          sum(col("rev")).over(tot).cast("double"), 6).as("cum_share"))
      .withColumn("abc_class",
        when(col("cum_share") <= 0.5, "A")
          .when(col("cum_share") <= 0.8, "B")
          .otherwise("C"))
      .orderBy("cum_share", "nation")
  }

  /** q125 — equi-depth (decile) histogram of order totals WITHOUT a
    * global sort: boundaries from one exact-percentile aggregate (a
    * single reduce — the naive `ntile(10)` plan is a single-partition
    * global sort, the canonical scale anti-pattern), broadcast back onto
    * the scan, bucket = count of boundaries strictly below the value,
    * then per-bucket stats in one grouped aggregate. Boundaries are
    * rounded to 6 decimals BEFORE bucketing so both engines cut at
    * bit-identical edges. At 100 TB the boundary pass swaps to
    * `approx_percentile` (mergeable sketch, same broadcast shape — the
    * q87 argument). */
  val q125: Q = (spark, dir) => {
    val vals = Tables.orders(spark, dir).select(col("o_totalprice").as("v"))
    val ps = (1 to 9).map(i => s"0.${i}D").mkString(", ")
    val bs = vals.agg(expr(s"percentile(v, array($ps))").as("raw"))
      .select(expr("transform(raw, b -> floor((b) * 1000000.0 + 0.5) / 1000000.0)").as("bs"))
    vals.crossJoin(broadcast(bs))
      .withColumn("bucket",
        (size(expr("filter(bs, b -> v > b)")) + 1).cast("long"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"), min(col("v")).as("mn"),
        max(col("v")).as("mx"))
      .orderBy("bucket")
  }

  /** q126 — robust outlier detection via median absolute deviation
    * (Iglewicz–Hoaglin modified z = 0.6745·(v−med)/MAD, |z| ≥ 3.5): the
    * robust sibling of q109's moment-based z-score — a contaminated
    * tail can't drag the median the way it drags the mean. Two tiny
    * per-type percentile frames (median, then MAD) broadcast back onto
    * the fact scan; the facts never shuffle. Median and MAD are rounded
    * to 6 decimals before the score arithmetic, so the score — and the
    * threshold decision — computes over bit-identical doubles on both
    * engines. Three consumers read the projected fact frame (median
    * pass, MAD pass, scoring) — materialize it once (the [[Skyline]]
    * argument) or the scan replays per consumer; at 100 TB the persisted
    * frame is the 3-column projection, never the full table. */
  val q126: Q = (spark, dir) => {
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), col("event_type"), col("value"))
      .localCheckpoint()
    val med = ev.groupBy("event_type")
      .agg(qround(expr("percentile(value, 0.5D)"), 6).as("med"))
    val dev = ev.join(broadcast(med), "event_type")
      .withColumn("adev", abs(col("value") - col("med")))
    val mad = dev.groupBy("event_type")
      .agg(qround(expr("percentile(adev, 0.5D)"), 6).as("mad"))
    dev.join(broadcast(mad), "event_type")
      // MAD = 0 (identical values / singleton type) → robust z
      // undefined → NULL → the filter drops the row, matching the
      // oracle where x/0 is NULL and abs(NULL) >= 3.5 excludes — not an
      // ANSI DIVIDE_BY_ZERO throw (fuzz gate, r13).
      .withColumn("rz",
        qround(when(col("mad") > 0.0,
          lit(0.6745) * (col("value") - col("med")) / col("mad")), 6))
      .filter(abs(col("rz")) >= 3.5)
      .select("event_id", "event_type", "value", "med", "mad", "rz")
      .orderBy("event_id")
  }

  /** q127 — EWMA-smoothed daily nation revenue (α = 0.2): the
    * exponential-smoothing pass an anomaly/forecast pipeline layers over
    * the q106/q121 daily frames. The recursion `s_i = α·x_i +
    * (1−α)·s_{i−1}` is sequential within a key — no window frame
    * expresses it — so this is the surface's typed-iterator operator:
    * [[graft.ops.TimeSeries.ewma]] (`groupByKey.flatMapGroups`,
    * per-key parallelism, calendar-bounded group size). Both engines run
    * the identical multiply-add chain, so the doubles agree bit-for-bit
    * BEFORE the output rounding; the oracle is a recursive CTE. */
  val q127: Q = (spark, dir) => {
    val daily = SharedFrames.dailyNationRevenue(spark, dir)
      .select(col("nation"), col("day"), col("rev").cast("double").as("revenue"))
    graft.ops.TimeSeries.ewma(daily, "nation", "day", "revenue", 0.2)
      .select(col("nation"), col("day"), col("revenue"),
        qround(col("ewma"), 6).as("ewma"))
      .orderBy("nation", "day")
  }

  /** q179 — new-vs-returning revenue split per 30-day period: each
    * customer's first-order period from one min-aggregate, every order
    * tagged new/returning by comparison — the acquisition-vs-retention
    * decomposition. Two shuffles (per-customer min, per-period agg),
    * both map-side combined. */
  val q179: Q = (spark, dir) => {
    def period = expr(
      "cast(cast(o_orderdate as timestamp) as long) div 86400 div 30")
    val o = Tables.orders(spark, dir).select(col("o_custkey"),
      period.as("period"), qdec(col("o_totalprice"), 18, 2).as("v"))
    val firstP = o.groupBy("o_custkey")
      .agg(min("period").as("first_period"))
    o.join(firstP, "o_custkey")
      .withColumn("cohort",
        when(col("period") === col("first_period"), "new")
          .otherwise("returning"))
      .groupBy("period", "cohort")
      .agg(count(lit(1)).as("n_orders"),
        countDistinct("o_custkey").as("n_customers"),
        sum("v").cast("double").as("revenue"))
      .orderBy("period", "cohort")
  }

  /** q180 — fulfillment lead-time SLA report: ship-minus-order days per
    * order priority, exact p50/p90/p99 + share beyond a 60-day SLA —
    * the q78 percentile pattern sliced by the dimension operations
    * actually watches. Integer day latencies. */
  val q180: Q = (spark, dir) => {
    def day(c: String) =
      expr(s"cast(cast($c as timestamp) as long) div 86400")
    val lt = Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_orderpriority").as("priority"),
        (day("l_shipdate") - day("o_orderdate")).as("lead_days"))
    lt.groupBy("priority")
      .agg(count(lit(1)).as("n"),
        qround(expr("percentile(lead_days, 0.5D)"), 6).as("p50"),
        qround(expr("percentile(lead_days, 0.9D)"), 6).as("p90"),
        qround(expr("percentile(lead_days, 0.99D)"), 6).as("p99"),
        sum(when(col("lead_days") > 60, 1L).otherwise(0L)).as("n_breach"))
      .orderBy("priority")
  }

  /** q178 — seasonality-adjusted robust anomaly detection on daily
    * revenue: residual vs the day-of-week mean, centered and scaled by
    * MAD (lower-median on exact decimals — no interpolation, no
    * doubles anywhere past the 6dp expected value), flagged at robust
    * |z| > 3 via the integer-exact comparison 6745·|dev| > 30000·MAD.
    * Top-10 deviations reported, anomalous or not. The q156 + q126
    * composite an ops dashboard actually runs. */
  val q178: Q = (spark, dir) => {
    val daily = Tables.orders(spark, dir)
      .groupBy(expr("cast(cast(o_orderdate as timestamp) as long) div 86400")
        .as("day"))
      .agg(sum(qdec(col("o_totalprice"), 18, 2)).as("rev"))
      .withColumn("dow", pmod(col("day"), lit(7)))
    val expected = daily.groupBy("dow")
      .agg(qround(sum("rev").cast("double") / count(lit(1)), 6)
        .cast("decimal(18,6)").as("expected"))
    val resid = daily.join(broadcast(expected), "dow")
      .withColumn("residual", col("rev") - col("expected"))
    def lowMedian(df: DataFrame, v: String, out: String): DataFrame = {
      val wOrd = Window.orderBy(v)
      val wAll = Window.orderBy(v).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
      df.select(col(v))
        .withColumn("__rn", row_number().over(wOrd))
        .withColumn("__n", count(lit(1)).over(wAll))
        .filter(col("__rn") * 2 >= col("__n"))
        .agg(min(col(v)).as(out))
    }
    val med = lowMedian(resid, "residual", "med")
    val dev = resid.crossJoin(broadcast(med))
      .withColumn("abs_dev", abs(col("residual") - col("med")))
    val mad = lowMedian(dev, "abs_dev", "mad")
    dev.crossJoin(broadcast(mad))
      .select(col("day"), col("rev").cast("double").as("revenue"),
        col("expected").cast("double").as("expected"),
        col("residual").cast("double").as("residual"),
        col("abs_dev").cast("double").as("abs_dev"),
        (col("abs_dev") * 6745 > col("mad") * 30000).as("is_anomaly"))
      .orderBy(desc("abs_dev"), col("day"))
      .limit(10)
  }

  /** q173 — period-over-period revenue growth: order revenue per 30-day
    * period (integer epoch-day arithmetic — no calendar functions, per
    * the determinism rules), growth rate vs the previous period via one
    * lag window over the period-bounded frame. The MoM/WoW BI staple;
    * decimal revenue, one grouped aggregate + one tiny window. */
  val q173: Q = (spark, dir) => {
    val per = Tables.orders(spark, dir)
      .select(expr(
        "cast(cast(o_orderdate as timestamp) as long) div 86400 div 30")
        .as("period"),
        qdec(col("o_totalprice"), 18, 2).as("v"))
      .groupBy("period")
      .agg(sum("v").as("revenue"), count(lit(1)).as("n_orders"))
    val w = Window.orderBy("period")
    per
      .withColumn("prev", lag(col("revenue"), 1).over(w))
      .select(col("period"), col("n_orders"),
        col("revenue").cast("double").as("revenue"),
        qround((col("revenue") - col("prev")).cast("double") /
          col("prev").cast("double"), 6).as("growth"))
      .orderBy("period")
  }

  /** q167 — per-nation weighted median of line price, quantity-weighted:
    * the robust "typical price actually shipped" statistic. No global or
    * per-group row sort: rows reduce to one row per DISTINCT price per
    * nation first (exact decimal weights), a cumulative window walks the
    * distinct values, and the median is the smallest price whose
    * doubled cumulative weight reaches the total — all-integer/decimal,
    * tie-free by construction. */
  val q167: Q = (spark, dir) => {
    // spreadScan (r17): both dim joins broadcast, so the whole
    // quantize + partial-agg map side ran on the single-file scan's one
    // task; the guarded spread parallelizes it (no-op on multi-split
    // corpora). Decimal sums — order-free.
    val li = Tables.spreadScan(Tables.lineitem(spark, dir))
      .join(Tables.supplier(spark, dir),
        col("l_suppkey") === col("s_suppkey"))
      .join(Tables.nation(spark, dir),
        col("s_nationkey") === col("n_nationkey"))
      // v rides as DECIMAL(18,2) INTERNALLY: prices are exact 2-dp
      // values, so grouping and the cumulative-weight walk are exact and
      // order-free. The OUTPUT surface re-projects to DOUBLE through
      // decOut (determinism rule r9, ARCHITECTURE.md — decimal/integer
      // inside, double/bigint out).
      .select(col("n_name").as("nation"),
        graft.functions.GraftFunctions.qdec(col("l_extendedprice"), 18, 2)
          .as("v"),
        graft.functions.GraftFunctions.qdec(col("l_quantity"), 18, 2)
          .as("wq"))
    val byV = li.groupBy("nation", "v").agg(sum(col("wq")).as("wv"))
    val wCum = Window.partitionBy("nation").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy("nation")
    byV.withColumn("cumw", sum(col("wv")).over(wCum))
      .withColumn("totw", sum(col("wv")).over(wAll))
      .filter(col("cumw") * 2 >= col("totw"))
      .groupBy("nation")
      .agg(decOut(min(col("v")), 2).as("weighted_median"),
        decOut(max(col("totw")), 2).as("total_qty"))
      .orderBy("nation")
  }

  /** q185 — shuffle-key skew profile of the events `user_id` key: the
    * pre-flight diagnostic that decides whether a join/agg on this key
    * needs salting or AQE skew splits BEFORE a 100 TB shuffle runs.
    * One row: key cardinality, row total, max per-key count, exact
    * disc-percentiles (p50/p90/p99) of the per-key count distribution,
    * the top key, and the top-10 keys' share of all rows.
    *
    * Scale shape: per-key counts reduce map-side; the percentile walk
    * runs on the count-of-counts HISTOGRAM (|distinct count values|
    * rows — hundreds, regardless of key cardinality), so the only
    * global window is histogram-sized, never |keys|-sized; the top-10
    * is a distributed `TakeOrderedAndProject`. All arithmetic is
    * integer (ceil via `(a + b - 1) div b`) except the final share,
    * an int-quotient rounded to 6dp and pinned DECIMAL. */
  val q185: Q = (spark, dir) => {
    val counts = Tables.events(spark, dir)
      .groupBy("user_id").agg(count(lit(1)).as("n"))
    val tot = counts.agg(count(lit(1)).as("n_keys"),
      sum(col("n")).as("total_rows"), max(col("n")).as("max_n"))
    val hist = counts.groupBy("n").agg(count(lit(1)).as("freq"))
    val wc = Window.orderBy("n")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist.withColumn("ckeys", sum(col("freq")).over(wc))
      .crossJoin(broadcast(tot))
    val pcts = cum.agg(
      min(when(col("ckeys") >= expr("(n_keys + 1) div 2"), col("n")))
        .as("p50_n"),
      min(when(col("ckeys") >= expr("(n_keys * 9 + 9) div 10"), col("n")))
        .as("p90_n"),
      min(when(col("ckeys") >= expr("(n_keys * 99 + 99) div 100"), col("n")))
        .as("p99_n"))
    val top10 = counts.orderBy(col("n").desc, col("user_id")).limit(10)
    val t10 = top10.agg(sum(col("n")).as("top10_n"))
    val t1 = top10.orderBy(col("n").desc, col("user_id")).limit(1)
      .select(col("user_id").as("top1_key"), col("n").as("top1_n"))
    tot.crossJoin(pcts).crossJoin(t1).crossJoin(t10)
      .select(col("n_keys"), col("total_rows"), col("max_n"),
        col("p50_n"), col("p90_n"), col("p99_n"),
        col("top1_key"), col("top1_n"),
        qround(col("top10_n") * lit(100.0) / col("total_rows"), 6)
          .as("top10_share_pct"))
  }

  /** q187 — KMV (k-minimum-values) distinct-count sketch, k = 64, per
    * event_type: keep the k smallest 63-bit keyed hashes of the key;
    * the k-th smallest estimates the distinct count as
    * (k−1)·2⁶³ / kth_hash. The MERGEABLE alternative to exact
    * count-distinct at 100 TB: per-partition partial top-k minima merge
    * associatively (WindowGroupLimit pushes the rank filter below the
    * shuffle), state is k longs per group vs a hash set over the key
    * universe. Unlike HLL (q16, rows-only), the KMV sketch is built
    * from the engine's deterministic keyed hash, so sketch CONTENTS and
    * estimate are exactly reproducible by the oracle — an
    * approximate-cardinality operator under the exact gate; the exact
    * distinct count rides along for the error audit. */
  val q187: Q = (spark, dir) => {
    val k = 64
    // SET semantics on the hash itself (`.distinct()` AFTER hashing), so
    // the window formulation is formally the same operator as KmvAgg's
    // dedup-in-place buffer (q188 streams against this oracle): a 63-bit
    // collision between same-type users yields ONE sketch slot in both.
    val h = Tables.events(spark, dir)
      .select("event_type", "user_id").distinct()
      .select(col("event_type"),
        graft.functions.GraftFunctions.md5_63(
          concat(lit("kmv:"), col("user_id").cast("string"))).as("h"))
      .distinct()
    val w = Window.partitionBy("event_type").orderBy("h")
    val kth = h.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_kept"), max(col("h")).as("kth_hash"))
    val exact = Tables.events(spark, dir)
      .groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("n_exact"))
    kth.join(exact, "event_type")
      .select(col("event_type"), col("n_exact"), col("n_kept"),
        col("kth_hash"),
        when(col("n_kept") < k, col("n_exact"))
          .otherwise(kmvEstimate).as("est_distinct"))
      .orderBy("event_type")
  }

  /** (k−1)·2⁶³ / kth_hash, ROUND-half-up, in EXACT integer arithmetic:
    * `(2·63·H + kth) div (2·kth)` over DECIMAL(38,0) (the numerator
    * 126·(2⁶³−1) ≈ 1.16e21 exceeds BIGINT) — bit-reproducible in any
    * oracle engine (HUGEINT on the DuckDB side), unlike the former
    * `round()` of a big double quotient whose half direction was
    * engine-release-dependent. */
  private[queries] def kmvEstimate: org.apache.spark.sql.Column = expr(
    "(cast(126 as decimal(38,0)) * 9223372036854775807 + kth_hash) div " +
      "(cast(2 as decimal(38,0)) * kth_hash)")

  /** q189 — KMV sketch ALGEBRA: distinct-user estimates for every PAIR
    * of event types computed by MERGING the per-type q187 sketches —
    * never rescanning the fact table. This is the property that makes
    * sketches matter at warehouse scale: a cube of per-cell KMV sketches
    * answers any union roll-up (distinct users across segments, days,
    * cohorts) from k longs per cell, where exact count-distinct would
    * re-shuffle the raw keys per question. Union = bottom-k of the two
    * sketches' union (re-aggregating the exploded sketch arrays through
    * the same set-semantics [[org.apache.spark.sql.graft.KmvAgg]]);
    * the exact |A ∪ B| = |A| + |B| − |A ∩ B| rides along from a
    * distinct-pairs self-join for the error audit. Deterministic keyed
    * hashing makes the merged sketch and estimate exactly
    * oracle-reproducible, like q187. */
  private val KmvK = 64

  /** Distinct (event_type, user_id) pairs — the key universe both KMV
    * queries sketch and audit. */
  private def kmvUniverse(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir).select("event_type", "user_id").distinct()

  /** Per-type KMV sketch frame: (event_type, mins sorted array ≤ k). */
  private def kmvTypeSketches(spark: SparkSession, dir: String): DataFrame =
    kmvUniverse(spark, dir)
      .select(col("event_type"),
        graft.functions.GraftFunctions.md5_63(
          concat(lit("kmv:"), col("user_id").cast("string"))).as("h"))
      .groupBy("event_type")
      .agg(graft.functions.GraftFunctions.kmv_agg(col("h"), KmvK)
        .as("mins"))

  /** Pairwise merged sketches: (ta, tb, mins_a, mins_b, mins) with
    * `mins` = bottom-k of the two sketches' union. */
  private def kmvPairMerged(spark: SparkSession, dir: String): DataFrame = {
    val sketches = kmvTypeSketches(spark, dir)
    val pairs = sketches
      .select(col("event_type").as("ta"), col("mins").as("mins_a"))
      .join(sketches.select(col("event_type").as("tb"),
        col("mins").as("mins_b")), col("ta") < col("tb"))
    pairs
      .select(col("ta"), col("tb"),
        explode(concat(col("mins_a"), col("mins_b"))).as("h"))
      .groupBy("ta", "tb")
      .agg(graft.functions.GraftFunctions.kmv_agg(col("h"), KmvK)
        .as("mins"))
      .join(pairs, Seq("ta", "tb"))
  }

  /** Exact pairwise intersection sizes (ta < tb) for the error audit. */
  private def kmvExactIntersections(spark: SparkSession,
                                    dir: String): DataFrame = {
    val d = kmvUniverse(spark, dir)
    d.select(col("event_type").as("ta"), col("user_id"))
      .join(d.select(col("event_type").as("tb"), col("user_id")),
        Seq("user_id"))
      .filter(col("ta") < col("tb"))
      .groupBy("ta", "tb").agg(count(lit(1)).as("n_ab"))
  }

  val q189: Q = (spark, dir) => {
    val k = KmvK
    val d = kmvUniverse(spark, dir)
    val merged = kmvPairMerged(spark, dir)
      .select(col("ta"), col("tb"),
        size(col("mins")).cast("long").as("n_kept"),
        element_at(col("mins"), size(col("mins"))).as("kth_hash"))
    val sizes = d.groupBy("event_type").agg(count(lit(1)).as("n"))
    val inter = kmvExactIntersections(spark, dir)
    merged
      .join(broadcast(sizes.select(col("event_type").as("ta"),
        col("n").as("n_a"))), Seq("ta"))
      .join(broadcast(sizes.select(col("event_type").as("tb"),
        col("n").as("n_b"))), Seq("tb"))
      .join(broadcast(inter), Seq("ta", "tb"))
      .select(col("ta"), col("tb"),
        (col("n_a") + col("n_b") - col("n_ab")).as("exact_union"),
        col("n_kept"), col("kth_hash"),
        // An under-filled merged sketch IS the complete distinct union
        // (both inputs were complete below k), so the estimate stays
        // purely sketch-derived.
        when(col("n_kept") < k, col("n_kept"))
          .otherwise(kmvEstimate).as("est_union"))
      .orderBy("ta", "tb")
  }

  /** q191 — KMV INTERSECTION estimation: per event-type pair, estimate
    * |A ∩ B| from the sketches alone — the join-CARDINALITY estimator
    * a cost-based planner reads before choosing broadcast vs shuffle vs
    * skew handling, here answerable from k longs per side with no fact
    * access. Standard bottom-k estimator: of the union's bottom-k
    * hashes, those present in BOTH input sketches estimate Jaccard as
    * n_common/k, and |A ∩ B| ≈ Ĵ · |A ∪ B|̂ — computed in exact integer
    * arithmetic (half-up `(2ab + n) div 2n`) so both engines agree to
    * the bit. Exact intersections ride along as the audit. Completes
    * the q187/q188/q189 sketch algebra: cardinality, streaming
    * maintenance, union, intersection. */
  val q191: Q = (spark, dir) => {
    val k = KmvK
    val est = kmvPairMerged(spark, dir)
      .select(col("ta"), col("tb"),
        size(col("mins")).cast("long").as("n_kept"),
        element_at(col("mins"), size(col("mins"))).as("kth_hash"),
        size(array_intersect(array_intersect(col("mins"), col("mins_a")),
          col("mins_b"))).cast("long").as("n_common"))
      .withColumn("est_union",
        when(col("n_kept") < k, col("n_kept")).otherwise(kmvEstimate))
      .withColumn("est_intersection",
        expr("(2 * n_common * est_union + n_kept) div (2 * n_kept)"))
      .withColumn("est_jaccard",
        qround(col("n_common").cast("double") / col("n_kept").cast("double"),
          6))
    est.join(broadcast(kmvExactIntersections(spark, dir)), Seq("ta", "tb"))
      .select(col("ta"), col("tb"), col("n_common"), col("est_jaccard"),
        col("est_intersection"), col("n_ab").as("exact_intersection"))
      .orderBy("ta", "tb")
  }

  /** q194 — bottom-k-sample QUANTILE sketch (k = 256) per event_type:
    * keep the k rows with the smallest keyed hash — a uniform k-sample
    * in the same mergeable bottom-k state shape as KMV, carrying the
    * VALUE alongside the hash — and estimate p50/p90/p99 from the
    * sample's order statistics; the exact full-data percentiles ride
    * along as the error audit (the q187 pattern). Completes the
    * mergeable sketch family: KMV = cardinality (q187), CMS =
    * frequency (q48/q102), bottom-k sample = quantiles. Mergeable for
    * the KMV reason: bottom-k(A ∪ B) = bottom-k(bottom-k(A) ∪
    * bottom-k(B)), so shard-local samples union without rescanning and
    * state is k (hash, value) pairs per group.
    *
    * Scale shape: the sample side is a WindowGroupLimit bottom-k (rank
    * filter pushed below the shuffle); the exact side walks the
    * CENTS-HISTOGRAM cumulative (q185's trick — |distinct cents
    * values| rows per group, never |rows|). All rank arithmetic is the
    * exact integer ceil `(n·p + p) div 100`; values are cents
    * decimals; sample membership ties break on event_id —
    * bit-reproducible in the oracle. */
  val q194: Q = (spark, dir) => {
    val k = 256
    val rows = Tables.events(spark, dir)
      .select(col("event_type"), col("event_id"),
        graft.functions.GraftFunctions.qdec(col("value"), 18, 2).as("v"),
        graft.functions.GraftFunctions.md5_63(
          concat(lit("qsk:"), col("event_id").cast("string"))).as("h"))
    val wAll = Window.partitionBy("event_type")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val samp = rows
      .withColumn("rn", row_number().over(
        Window.partitionBy("event_type").orderBy("h", "event_id")))
      .filter(col("rn") <= k)
      .withColumn("rk", row_number().over(
        Window.partitionBy("event_type").orderBy("v", "event_id"))
        .cast("long"))
      .withColumn("n_s", count(lit(1)).over(wAll))
    val est = samp.groupBy("event_type").agg(
      max(col("n_s")).as("n_sample"),
      min(when(col("rk") >= expr("(n_s + 1) div 2"), col("v")))
        .as("est_p50"),
      min(when(col("rk") >= expr("(n_s * 9 + 9) div 10"), col("v")))
        .as("est_p90"),
      min(when(col("rk") >= expr("(n_s * 99 + 99) div 100"), col("v")))
        .as("est_p99"))
    val cum = rows.groupBy("event_type", "v")
      .agg(count(lit(1)).as("freq"))
      .withColumn("c", sum(col("freq")).over(
        Window.partitionBy("event_type").orderBy("v")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("n_rows", sum(col("freq")).over(wAll))
    val exact = cum.groupBy("event_type").agg(
      max(col("n_rows")).as("n_rows"),
      min(when(col("c") >= expr("(n_rows + 1) div 2"), col("v"))).as("p50"),
      min(when(col("c") >= expr("(n_rows * 9 + 9) div 10"), col("v")))
        .as("p90"),
      min(when(col("c") >= expr("(n_rows * 99 + 99) div 100"), col("v")))
        .as("p99"))
    est.join(exact, "event_type")
      .select(col("event_type") +: col("n_rows") +: col("n_sample") +:
        Seq("est_p50", "est_p90", "est_p99", "p50", "p90", "p99")
          .map(c => decOut(col(c), 2).as(c)): _*)
      .orderBy("event_type")
  }

  /** q168 — single-feature decision stump: the best order-total
    * threshold separating urgent/high-priority orders, scanned over
    * 10k-wide bucket boundaries. ONE aggregate to per-bucket
    * (n, positives), a cumulative window turns every boundary into a
    * (left, right) contingency in O(buckets), weighted Gini per
    * boundary (identical IEEE formula both engines, 6dp), best row
    * flagged — the split-search inner loop of tree training, shuffle
    * volume = bucket count regardless of fact volume. */
  val q168: Q = (spark, dir) => {
    val o = Tables.orders(spark, dir).select(
      (floor(col("o_totalprice") / 10000) * 10000).cast("long").as("bkt"),
      when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
        .otherwise(0L).as("y"))
    val b = o.groupBy("bkt").agg(count(lit(1)).as("n"), sum("y").as("p"))
    val wCum = Window.orderBy("bkt")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.orderBy("bkt")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val c = b
      .withColumn("nl", sum(col("n")).over(wCum))
      .withColumn("pl", sum(col("p")).over(wCum))
      .withColumn("nt", sum(col("n")).over(wAll))
      .withColumn("pt", sum(col("p")).over(wAll))
      .filter(col("nl") < col("nt")) // a boundary must leave a right side
    val fl = col("pl").cast("double") / col("nl").cast("double")
    val fr = (col("pt") - col("pl")).cast("double") /
      (col("nt") - col("nl")).cast("double")
    val gl = lit(1.0) - fl * fl - (lit(1.0) - fl) * (lit(1.0) - fl)
    val gr = lit(1.0) - fr * fr - (lit(1.0) - fr) * (lit(1.0) - fr)
    val wg = (col("nl").cast("double") / col("nt").cast("double")) * gl +
      ((col("nt") - col("nl")).cast("double") /
        col("nt").cast("double")) * gr
    val scored = c.select(col("bkt").as("threshold"),
      col("nl").as("n_left"), col("pl").as("pos_left"),
      (col("nt") - col("nl")).as("n_right"),
      (col("pt") - col("pl")).as("pos_right"),
      qround(wg, 6).as("weighted_gini"))
    scored.withColumn("is_best",
        col("weighted_gini") === min(col("weighted_gini")).over(
          Window.orderBy("threshold").rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing)))
      .orderBy("threshold")
  }

  /** q166 — session co-visitation "also viewed" lists: distinct items
    * per 30-minute-gap view session (the q11 sessionizer restricted to
    * views), directed within-session pairs counted across sessions,
    * top-5 per item. The per-item ranking runs through the bounded-heap
    * aggregate ([[graft.functions.GraftFunctions.topk_agg]]) with a
    * struct rank — (negated count, item) encodes (count DESC, item ASC)
    * — heap upkeep instead of the window form's two per-partition
    * sorts, and the ranked list explodes straight out of the array. Pair volume is Σ items-per-session²;
    * cap items per session upstream when sessions are unbounded. */
  val q166: Q = (spark, dir) => {
    val gapNs = 30L * 60 * 1000000000L
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val views = Tables.events(spark, dir)
      .filter(col("event_type") === "view")
      .select(col("user_id"), col("ts"), col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("item_id"))
      .filter(col("item_id").isNotNull)
    val si = views
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("new_session",
        when(col("prev_ts").isNull || col("ts") - col("prev_ts") > gapNs, 1)
          .otherwise(0))
      .withColumn("session_id",
        sum(col("new_session")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select("user_id", "session_id", "item_id").distinct()
    val pairs = si.as("a").join(si.as("b"),
        col("a.user_id") === col("b.user_id") &&
        col("a.session_id") === col("b.session_id") &&
        col("a.item_id") =!= col("b.item_id"))
      .groupBy(col("a.item_id").as("item_id"),
        col("b.item_id").as("also_item"))
      .agg(count(lit(1)).as("n_sessions"))
    pairs.groupBy("item_id")
      .agg(graft.functions.GraftFunctions.topk_agg(
        struct(negate(col("n_sessions")).as("nn"),
          col("also_item").as("ai")), 5).as("t"))
      .select(col("item_id"), posexplode(col("t")).as(Seq("pos", "s")))
      .select(col("item_id"), (col("pos") + 1).cast("long").as("rank"),
        col("s.ai").as("also_item"), negate(col("s.nn")).as("n_sessions"))
      .orderBy("item_id", "rank")
  }

  /** q164 — Holt linear-trend forecast of daily nation revenue
    * (α = 0.3, β = 0.1; [[graft.ops.TimeSeries.holtLinear]]): q127's
    * smoother plus a trend state and the one-step-ahead forecast —
    * same typed-iterator execution, same bit-identical multiply-add
    * chain, oracle as a two-state recursive CTE. */
  val q164: Q = (spark, dir) => {
    val daily = SharedFrames.dailyNationRevenue(spark, dir)
      .select(col("nation"), col("day"),
        col("rev").cast("double").as("revenue"))
    TimeSeries.holtLinear(daily, "nation", "day", "revenue",
        alpha = 0.3, beta = 0.1)
      .select(col("nation"), col("day"), col("revenue"),
        qround(col("level"), 6).as("level"),
        qround(col("trend"), 6).as("trend"),
        qround(col("forecast"), 6).as("forecast"))
      .orderBy("nation", "day")
  }

  /** q128 — data-quality constraint report (the Deequ/dbt-test shape):
    * declarative rules — range, null-rate, uniqueness, referential
    * integrity — evaluated to one (rule, n_checked, n_violations, pass)
    * row each. Same-table rules share ONE conditional aggregate scan;
    * the referential check is a left-anti join on the key (never a
    * driver-side set). A 100 TB run emits this exact frame as the
    * pipeline's quality gate artifact. */
  val q128: Q = (spark, dir) => {
    val li = Tables.lineitem(spark, dir)
    val o = Tables.orders(spark, dir)
    // lineitem rules share one scan/aggregate; the 1-row result is
    // checkpointed because two report rows consume it
    val liAgg = li.agg(count(lit(1)).as("n"),
      sum(when(col("l_quantity") < 1 || col("l_quantity") > 50, 1L)
        .otherwise(0L)).as("qty_bad"))
      .localCheckpoint()
    val liQty = liAgg.select(lit("lineitem_quantity_in_1_50").as("rule"),
      col("n").as("n_checked"), col("qty_bad").as("n_violations"))
    val orders2 = o.agg(count(lit(1)).as("n"),
      sum(when(col("o_totalprice") <= 0, 1L).otherwise(0L)).as("neg"))
      .select(lit("orders_totalprice_positive").as("rule"),
        col("n").as("n_checked"), col("neg").as("n_violations"))
    val custUnique = Tables.customer(spark, dir)
      .agg(count(lit(1)).as("n"), countDistinct(col("c_custkey")).as("nd"))
      .select(lit("customer_custkey_unique").as("rule"),
        col("n").as("n_checked"), (col("n") - col("nd")).as("n_violations"))
    val evNull = Tables.events(spark, dir)
      .agg(count(lit(1)).as("n"),
        sum(when(col("value").isNull, 1L).otherwise(0L)).as("nulls"))
      .select(lit("events_value_nonnull").as("rule"),
        col("n").as("n_checked"), col("nulls").as("n_violations"))
    val orphans = li.select("l_orderkey")
      .join(o.select("o_orderkey"),
        col("l_orderkey") === col("o_orderkey"), "left_anti")
      .agg(count(lit(1)).as("viol"))
      .crossJoin(broadcast(liAgg.select(col("n"))))
      .select(lit("lineitem_orderkey_in_orders").as("rule"),
        col("n").as("n_checked"), col("viol").as("n_violations"))
    liQty.unionByName(orders2).unionByName(custUnique)
      .unionByName(evNull).unionByName(orphans)
      .withColumn("pass", col("n_violations") === 0L)
      .orderBy("rule")
  }

  /** q129 — multi-pass sorted-neighborhood dedup blocking (the classic
    * entity-resolution alternative to q47's token blocking and q27's
    * LSH): sort the DISTINCT name vocabulary, compare each name to its
    * next `w = 3` neighbors via a lead-chain, two passes (prefix order +
    * reversed-name order) to recover pairs a single sort key would
    * split, union → distinct → verify with edit distance ≤ 2. Windows
    * partition on the pass's first character, so there is no global
    * sort; the quadratic never materializes — each name generates
    * exactly `w` candidates per pass regardless of vocabulary size. */
  val q129: Q = (spark, dir) =>
    Fuzzy.sortedNeighborhoodPairs(
        Tables.part(spark, dir).select(col("p_name").as("name")).distinct(),
        w = 3)
      .withColumn("dist",
        levenshtein(col("name_a"), col("name_b")).cast("long"))
      .filter(col("dist").between(1, 2))
      .orderBy("name_a", "name_b")

  /** q130 — reciprocal rank fusion of two part rankings (by revenue, by
    * order count): `rrf = Σ 1/(60 + rank)` over the lists the item
    * appears in — the standard hybrid-search list-fusion (k = 60 from
    * the original RRF paper). Fusion operates on the top-100 LISTS, not
    * the full corpora — each ranking is a TakeOrderedAndProject (no
    * global sort), the fused frame is 2×100 rows, and absent-from-list
    * items contribute nothing, exactly as in serving. Integer ranks ⇒
    * the fused score is engine-exact before its output rounding. */
  val q130: Q = (spark, dir) => {
    val stats = Tables.lineitem(spark, dir)
      .groupBy("l_partkey")
      .agg(decSum(col("l_extendedprice")).as("rev"),
        count(lit(1)).as("n"))
      .localCheckpoint() // two top-k consumers, one aggregate build
    val byRev = stats.orderBy(col("rev").desc, col("l_partkey")).limit(100)
      .withColumn("r_rev",
        row_number().over(Window.orderBy(col("rev").desc, col("l_partkey"))))
      .select(col("l_partkey"), col("r_rev"))
    val byN = stats.orderBy(col("n").desc, col("l_partkey")).limit(100)
      .withColumn("r_n",
        row_number().over(Window.orderBy(col("n").desc, col("l_partkey"))))
      .select(col("l_partkey").as("pk2"), col("r_n"))
    byRev.join(byN, col("l_partkey") === col("pk2"), "full_outer")
      .select(coalesce(col("l_partkey"), col("pk2")).as("part_key"),
        col("r_rev"), col("r_n"),
        qround(
          coalesce(lit(1.0) / (lit(60) + col("r_rev")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(60) + col("r_n")), lit(0.0)), 6)
          .as("rrf"))
      .orderBy(col("rrf").desc, col("part_key"))
      .limit(25)
  }

  /** q131 — A/B experiment readout (two-proportion z-test): users hashed
    * into variants with the repo's keyed md5 (deterministic,
    * layout-independent — the SAME split both engines compute),
    * conversion = any purchase event, z = (p_A−p_B)/√(p̂(1−p̂)(1/n_A+1/n_B))
    * with the pooled p̂. Counts reduce per variant map-side; the final
    * stat is scalar arithmetic on exact integers, written identically in
    * both engines and rounded once. */
  val q131: Q = (spark, dir) => {
    val users = Tables.events(spark, dir).select("user_id").distinct()
      .withColumn("variant",
        graft.functions.GraftFunctions.abVariant(col("user_id")))
    // conversion = a HIGH-VALUE purchase (>150): the raw any-purchase
    // event saturates (p̂ = 1 ⇒ zero-variance z) on the fixture
    val conv = Tables.events(spark, dir)
      .filter(col("event_type") === "purchase" && col("value") > 150)
      .select("user_id").distinct().withColumn("c", lit(1L))
    val byVar = users.join(conv, Seq("user_id"), "left")
      .groupBy("variant")
      .agg(count(lit(1)).as("n"), sum(coalesce(col("c"), lit(0L))).as("k"))
    val wide = byVar.agg(
      sum(when(col("variant") === "A", col("n"))).as("n_a"),
      sum(when(col("variant") === "A", col("k"))).as("conv_a"),
      sum(when(col("variant") === "B", col("n"))).as("n_b"),
      sum(when(col("variant") === "B", col("k"))).as("conv_b"))
    wide.select(col("n_a"), col("conv_a"), col("n_b"), col("conv_b"),
      qround(col("conv_a").cast("double") / col("n_a"), 6).as("rate_a"),
      qround(col("conv_b").cast("double") / col("n_b"), 6).as("rate_b"),
      qround(
        (col("conv_a").cast("double") / col("n_a") -
          col("conv_b").cast("double") / col("n_b")) /
        sqrt(((col("conv_a") + col("conv_b")).cast("double") /
              (col("n_a") + col("n_b"))) *
             (lit(1.0) - (col("conv_a") + col("conv_b")).cast("double") /
              (col("n_a") + col("n_b"))) *
             (lit(1.0) / col("n_a") + lit(1.0) / col("n_b"))), 6).as("z"))
  }

  /** q133 — point-in-time (PIT) join against SCD2 history: each purchase
    * looks up the user's state AS OF `ts − 1ns` — strictly before the
    * purchase itself, the label-leakage-safe lookup a feature store must
    * produce (joining "as of now" silently leaks the label event into
    * its own features). Both sides hash-partition on the entity key, so
    * the interval predicate evaluates co-located — per-user interval
    * counts are bounded, and time intervals PARTITION each user's
    * timeline, so at most one dimension row matches (no fan-out). First
    * events have no prior state: left join, NULL feature. */
  val q133: Q = (spark, dir) => {
    val ev = Tables.events(spark, dir)
    val dim = graft.ops.Scd
      .type2(ev, "user_id", "event_type", "ts", "event_id")
      .select(col("user_id").as("d_user"), col("event_type").as("prior_state"),
        col("valid_from"), col("valid_to"))
    ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      .join(dim, col("user_id") === col("d_user") &&
        col("valid_from") <= col("ts") - 1 &&
        (col("valid_to").isNull || col("ts") - 1 < col("valid_to")), "left")
      .select(col("user_id"), col("event_id"),
        expr("ts div 1000000000").as("ts_s"), col("prior_state"),
        col("value"))
      .orderBy("event_id")
  }

  /** q134 — order-3 event-path mining (top user journeys): the lead-chain
    * manufactures each 3-step path in-row on ONE user_id exchange — no
    * self-join of the log against shifted copies — then a |types|³-bounded
    * aggregate and a TakeOrderedAndProject top-20. The order-3 sibling of
    * q122's transition matrix; at 100 TB the exchange carries only the
    * 4 projected columns. */
  val q134: Q = (spark, dir) => {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("s2", lead(col("event_type"), 1).over(w))
      .withColumn("s3", lead(col("event_type"), 2).over(w))
      .filter(col("s2").isNotNull && col("s3").isNotNull)
      .groupBy(col("event_type").as("s1"), col("s2"), col("s3"))
      .agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), col("s1"), col("s2"), col("s3"))
      .limit(20)
  }

  /** q135 — explicit GROUPING SETS ((nation), (status), ()): the third
    * lattice form next to q15's ROLLUP and q79's CUBE, through Spark 4's
    * native `Dataset.groupingSets` API — arbitrary set lists the other
    * two can't express (here: both one-dimension marginals + grand
    * total, WITHOUT the (nation, status) cross cells a CUBE would also
    * compute). Plans as one Expand + a single hash aggregate — cost is
    * |sets| × input partials in one pass, never a rescan per set. `gid`
    * uses the SQL-standard first-key-MSB layout, matched by DuckDB's
    * GROUPING(). */
  val q135: Q = (spark, dir) =>
    nationOrders(spark, dir)
      .select(col("n_name").as("nation"), col("o_orderstatus").as("status"),
        qdec(col("o_totalprice"), 18, 2).as("p"))
      .groupingSets(
        Seq(Seq(col("nation")), Seq(col("status")), Seq.empty),
        col("nation"), col("status"))
      .agg(count(lit(1)).as("n"),
        sum(col("p")).cast("double").as("revenue"),
        (grouping(col("nation")) * 2 + grouping(col("status")))
          .cast("long").as("gid"))
      .orderBy(col("gid"), col("nation").asc_nulls_first,
        col("status").asc_nulls_first)

  /** q137 — market-basket lift over order co-occurrence: for every pair
    * of parts appearing in the same order at least twice,
    * `lift = P(a,b) / (P(a)·P(b)) = n_ab·N / (n_a·n_b)` — the
    * association-rule strength behind "customers who bought X also
    * bought Y". The pair self-join shuffles on the order key and fans
    * out C(parts-per-order, 2) rows per order — bounded both naturally
    * (≤ C(17,2) here; baskets, unlike users, don't grow with the
    * dataset) and HARD by [[graft.queries.AnalyticsQueries.BasketCap]]:
    * orders with more distinct parts are semi-join-excluded from pair
    * generation (oracle mirrors the bound), so a pathological hub order
    * can never put 10⁹ join rows into one task. Marginals and N stay
    * global — the cap excludes hub orders from CO-OCCURRENCE evidence
    * only, not from the per-part popularity prior. Counts stay in
    * exact integer arithmetic; one double division at the end. The part
    * marginals join is a plain equi-join on the part key: at real scale
    * the marginals frame is |catalog|-sized and AQE picks broadcast vs
    * shuffle from its measured size. Top-100 by lift is a
    * TakeOrderedAndProject, not a global sort. */
  val q137: Q = (spark, dir) => {
    // r17: materialize the deduped basket frame once — it fed FIVE
    // subtrees (marginals, the cap aggregate, the semi-join probe, and
    // both pair-join sides), each re-running the scan + distinct.
    val baskets = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .localCheckpoint()
    val nOrders = Tables.lineitem(spark, dir)
      .agg(countDistinct("l_orderkey").as("n_orders"))
    val marginals = baskets.groupBy("l_partkey")
      .agg(count(lit(1)).as("n_p"))
    // Hub-order exclusion (BasketCap): the size aggregate shares the
    // l_orderkey hash partitioning with the self-join below, so AQE
    // plans the semi-join without an extra exchange on the capped side.
    val capped = baskets.join(
      baskets.groupBy("l_orderkey").agg(count(lit(1)).as("bk"))
        .filter(col("bk") <= graft.queries.AnalyticsQueries.BasketCap)
        .select("l_orderkey"),
      Seq("l_orderkey"), "left_semi")
    // spreadByKey (r17): the basket self-join's inputs are a few MB but
    // its output is Σ basket² pair partials — AQE's input-sized
    // coalescing serialized the fan-out (the q26/q267 fix; integer
    // counts downstream, order-free).
    val a = graft.text.TextAnalysis.spreadByKey(
      capped.select(col("l_orderkey"), col("l_partkey").as("part_a")),
      "l_orderkey")
    val b = graft.text.TextAnalysis.spreadByKey(
      capped.select(col("l_orderkey"), col("l_partkey").as("part_b")),
      "l_orderkey")
    val pairs = a.join(b, Seq("l_orderkey"))
      .filter(col("part_a") < col("part_b"))
      .groupBy("part_a", "part_b").agg(count(lit(1)).as("support"))
      .filter(col("support") >= 2)
    pairs
      .join(marginals.select(col("l_partkey").as("part_a"),
        col("n_p").as("na")), "part_a")
      .join(marginals.select(col("l_partkey").as("part_b"),
        col("n_p").as("nb")), "part_b")
      .crossJoin(broadcast(nOrders))
      .select(col("part_a"), col("part_b"), col("support"),
        qround((col("support") * col("n_orders")).cast("double") /
          (col("na") * col("nb")).cast("double"), 6).as("lift"))
      .orderBy(col("lift").desc, col("part_a"), col("part_b"))
      .limit(100)
  }

  /** q140 — Poisson-bootstrap 95% CI for the mean order value
    * ([[graft.ops.Bootstrap.meanCI]]): 200 replicas in ONE scan via
    * per-(row, replica) Poisson(1) weights from the keyed PRNG — the
    * scale-native replacement for materializing 200 resamples. The
    * interval the reference's point-estimate stats never ship. */
  val q140: Q = (spark, dir) =>
    graft.ops.Bootstrap.meanCI(Tables.orders(spark, dir),
      col("o_orderkey"), col("o_totalprice"), replicas = 200, seed = 140L)

  /** q141 — out-of-fold target encoding of customer nation by order
    * value ([[graft.ops.Features.targetEncodeOof]]): the leakage-safe
    * mean-encoding table (5 PRNG folds, smoothing pseudo-count 20) a
    * tabular feature pipeline broadcasts onto its training rows. */
  val q141: Q = (spark, dir) =>
    graft.ops.Features.targetEncodeOof(nationOrders(spark, dir),
      col("n_name"), col("o_orderkey"), col("o_totalprice"),
      folds = 5, smoothing = 20, seed = 141L)
      .orderBy("cat", "fold")

  /** q155 — hierarchical ratio-to-parent: nation share within region,
    * region share of total, one pass. The drill-path complement of
    * q124's flat percent-of-total — every share window runs on the
    * dimension-bounded (region × nation) frame, facts reduce first. */
  val q155: Q = (spark, dir) => {
    val rev = nationOrders(spark, dir)
      .join(Tables.region(spark, dir),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name").as("region"), col("n_name").as("nation"))
      .agg(count(lit(1)).as("n_orders"),
        sum(qdec(col("o_totalprice"), 18, 2)).as("rev"))
    val byRegion = Window.partitionBy("region")
    val all = Window.partitionBy()
    rev.select(col("region"), col("nation"), col("n_orders"),
        col("rev").cast("double").as("revenue"),
        qround(col("rev").cast("double") /
          sum(col("rev")).over(byRegion).cast("double"), 6)
          .as("share_of_region"),
        sum(col("rev")).over(byRegion).cast("double").as("region_revenue"),
        qround(sum(col("rev")).over(byRegion).cast("double") /
          sum(col("rev")).over(all).cast("double"), 6).as("region_share"))
      .orderBy("region", "nation")
  }

  /** q156 — day-of-week seasonality index over the memoized daily
    * frame: avg daily revenue per weekday vs overall, the classical
    * seasonal-naive decomposition input. dow from integer epoch-day
    * arithmetic ((day + 4) mod 7; 1970-01-01 was a Thursday) — no
    * calendar functions, engine-neutral. */
  val q156: Q = (spark, dir) => {
    val daily = SharedFrames.dailyNationRevenue(spark, dir)
      .groupBy("day").agg(sum("rev").as("drev"))
    val perDow = daily
      .withColumn("dow", pmod(col("day") + 4, lit(7)).cast("int"))
      .groupBy("dow")
      .agg(count(lit(1)).as("n_days"), sum("drev").as("s"))
    val tot = perDow.agg(sum("n_days").as("tn"), sum(col("s")).as("ts"))
    perDow.crossJoin(broadcast(tot))
      .select(col("dow"), col("n_days"),
        qround(col("s").cast("double") / col("n_days").cast("double"), 6)
          .as("avg_daily_rev"),
        qround((col("s").cast("double") / col("n_days").cast("double")) /
          (col("ts").cast("double") / col("tn").cast("double")), 6)
          .as("seasonal_index"))
      .orderBy("dow")
  }

  /** q157 — lead–lag scan: Pearson r between daily click counts and
    * daily purchase revenue at lags −7..+7
    * ([[graft.ops.TimeSeries.laggedCrossCorr]]) — "do clicks lead
    * revenue?" answered from decimal-exact per-lag sufficient stats. */
  val q157: Q = (spark, dir) => {
    val ev = Tables.events(spark, dir)
    def day = expr("ts div 86400000000000")
    val clicks = ev.filter(col("event_type") === "click")
      .groupBy(day.as("day"))
      .agg(count(lit(1)).cast("decimal(18,0)").as("x"))
    val rev = ev.filter(col("event_type") === "purchase")
      .groupBy(day.as("day"))
      .agg(sum(qdec(col("value"), 18, 2)).as("y"))
    TimeSeries.laggedCrossCorr(clicks, rev, maxLag = 7).orderBy("lag")
  }

  /** q196 — campaign-window interval join ([[graft.ops.Intervals
    * .pointInIntervalJoin]]): the top-12 revenue weeks define overlapping
    * 14-day "campaign" windows [wk·7−3, wk·7+10], and every order landing
    * inside a window attributes to it (orders under overlapping windows
    * count toward EACH — the fan-out that makes this a genuine range
    * join, not a bucketing groupBy). Executed as a bucketed EQUI-join
    * (W = 8 days: each interval explodes to ≤ 3 bucket rows, each point
    * maps to one) — the scale shape that replaces the
    * BroadcastNestedLoopJoin a raw BETWEEN predicate plans. Revenue sums
    * decimal-exact, cast to double once at output. */
  val q196: Q = (spark, dir) => {
    val day = expr("cast(cast(o_orderdate as timestamp) as long) div 86400")
    val o = Tables.orders(spark, dir)
      .select(col("o_orderkey"), day.as("day"),
        qdec(col("o_totalprice"), 18, 2).as("p"))
    val camp = o.groupBy(expr("day div 7").as("wk"))
      .agg(sum("p").as("wrev"))
      .orderBy(col("wrev").desc, col("wk"))
      .limit(12)
      .select(col("wk").as("campaign_wk"),
        (col("wk") * 7 - 3).as("d0"), (col("wk") * 7 + 10).as("d1"))
    graft.ops.Intervals.pointInIntervalJoin(o, "day", camp,
        "d0", "d1", bucketDays = 8)
      .groupBy("campaign_wk", "d0", "d1")
      .agg(count(lit(1)).as("n_orders"),
        sum("p").cast("double").as("revenue"))
      .orderBy("campaign_wk")
  }

  /** q197 — CUSUM change-point detection on daily nation revenue
    * ([[graft.ops.TimeSeries.cusum]]): the sequential drift detector
    * completing the q127/q164 smoothing family — per-nation reference
    * mean μ and allowance k = 0.5σ from decimal-exact sufficient
    * statistics (each rounded once), then the two-sided reset-at-zero
    * fold, flagging days where either statistic exceeds 4σ. The fold is
    * the repo's typed-iterator shape; the oracle replays it as a
    * recursive CTE over bit-identical doubles. */
  val q197: Q = (spark, dir) => {
    val daily = SharedFrames.dailyNationRevenue(spark, dir)
      // re-pin the summed revenue at DECIMAL(18,2) (exact — daily
      // revenue is far below 10^16) so its square stays inside
      // DECIMAL(38,4) on BOTH engines instead of hitting Spark's
      // precision-capped (and silently rounding) wide-decimal multiply.
      .select(col("nation"), col("day"),
        col("rev").cast("decimal(18,2)").as("rev"))
    val stats = daily.groupBy("nation")
      .agg(sum("rev").as("s"), sum(col("rev") * col("rev")).as("s2"),
        count(lit(1)).as("n"))
      .filter(col("n") >= 2)
      .select(col("nation"),
        qround(col("s").cast("double") / col("n"), 6).as("mu"),
        qround(sqrt((col("s2").cast("double") -
          col("s").cast("double") * col("s").cast("double") / col("n")) /
          (col("n") - 1)), 6).as("sigma"))
      .withColumn("kk", qround(lit(0.5) * col("sigma"), 6))
    val pts = daily.select(col("nation"), col("day"),
        col("rev").cast("double").as("x"))
      .join(broadcast(stats), "nation")
    TimeSeries.cusum(pts, "nation", "day", "x", "mu", "kk")
      .join(broadcast(stats), "nation")
      .select(col("nation"), col("day"), col("x").as("revenue"),
        qround(col("s_pos"), 6).as("cusum_pos"),
        qround(col("s_neg"), 6).as("cusum_neg"),
        (col("s_pos") > lit(4.0) * col("sigma") ||
          col("s_neg") > lit(4.0) * col("sigma")).cast("int").as("shift_flag"))
      .orderBy("nation", "day")
  }

  /** q202 — one-step-ahead forecast BACKTEST of the q164 Holt smoother:
    * each day's actual revenue scored against the previous day's
    * forecast (lag over the same nation partitioning — no second
    * exchange), per-nation bias / MAE / MAPE. The evaluation loop that
    * turns a smoother into a forecasting model you'd trust: q164 emits
    * predictions, this measures them out-of-sample. Errors quantize to
    * 6dp decimals BEFORE the sums (the distributed-Σ-of-doubles trap);
    * each reported metric is one double divide, rounded once. */
  val q202: Q = (spark, dir) => {
    val daily = SharedFrames.dailyNationRevenue(spark, dir)
      .select(col("nation"), col("day"),
        col("rev").cast("double").as("revenue"))
    val h = TimeSeries.holtLinear(daily, "nation", "day", "revenue",
      alpha = 0.3, beta = 0.1)
    val w = Window.partitionBy("nation").orderBy("day")
    val e = h.withColumn("pfc", lag(col("forecast"), 1).over(w))
      .filter(col("pfc").isNotNull)
      .withColumn("err",
        qround(col("revenue") - col("pfc"), 6).cast("decimal(18,6)"))
      .withColumn("ape",
        qround(abs(col("revenue") - col("pfc")) / col("revenue"), 6)
          .cast("decimal(18,6)"))
    e.groupBy("nation").agg(
        count(lit(1)).as("n_forecasts"),
        qround(sum(col("err")).cast("double") / count(lit(1)), 6)
          .as("bias"),
        qround(sum(abs(col("err"))).cast("double") / count(lit(1)), 6)
          .as("mae"),
        qround(lit(100.0) * sum(col("ape")).cast("double") /
          count(lit(1)), 6).as("mape_pct"))
      .orderBy("nation")
  }

  /** q205 — Theil–Sen robust trend per nation: slope = median of all
    * pairwise day-slopes of the daily revenue series, intercept =
    * median residual at that slope — the estimator that shrugs off the
    * outlier days that drag q146's least-squares line (up to 29 %
    * contamination tolerated). The pair explosion is calendar-bounded
    * (days²/2 per nation — ~140k pairs per key at ANY fact volume,
    * because the series is an aggregate), and both medians run as the
    * q167 distinct-value cumulative walk, never a per-group row sort.
    * Slopes quantize to 6dp (bit-identical IEEE divides) before the
    * median walk so the crossing value is engine-exact. */
  val q205: Q = (spark, dir) =>
    graft.metrics.TheilSen.fitPerGroup(
        SharedFrames.dailyNationRevenue(spark, dir)
          .select(col("nation"), col("day"),
            col("rev").cast("double").as("y")),
        "nation", "day", "y")
      .orderBy("nation")

  /** q207 — higher-moment distribution profile per event type:
    * mean / σ / skewness / excess kurtosis of `value` from ONE grouped
    * aggregate of exact-decimal power sums (Σv..Σv⁴ — each power cast
    * to a decimal that provably fits the 2dp input range, so the sums
    * carry zero float-order dependence), then one scalar moment
    * formula per group. Completes the profiling family: q101 basics,
    * q125 histograms, q114 correlations — this is the shape tier
    * (asymmetry + tail weight) that tells you WHICH drift test to
    * reach for. μ and σ round once before the higher formulas; both
    * engines run the identical expression tree. */
  val q207: Q = (spark, dir) => {
    val x = Tables.events(spark, dir)
      .select(col("event_type"), qdec(col("value"), 7, 2).as("v"))
      .withColumn("v2", (col("v") * col("v")).cast("decimal(12,4)"))
    val s = x
      .withColumn("v3", (col("v2") * col("v")).cast("decimal(20,6)"))
      .withColumn("v4", (col("v2") * col("v2")).cast("decimal(25,8)"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("v").as("s1"), sum("v2").as("s2"),
        sum("v3").as("s3"), sum("v4").as("s4"))
    val n = col("n").cast("double")
    val m1 = col("mu")
    val withMu = s.withColumn("mu",
      qround(col("s1").cast("double") / n, 6))
    val withSd = withMu.withColumn("sd",
      qround(sqrt(col("s2").cast("double") / n - m1 * m1), 6))
    withSd.select(col("event_type"), col("n"), m1.as("mean"),
        col("sd").as("stddev"),
        qround((col("s3").cast("double") / n -
          lit(3.0) * m1 * (col("s2").cast("double") / n) +
          lit(2.0) * m1 * m1 * m1) /
          (col("sd") * col("sd") * col("sd")), 6).as("skewness"),
        qround((col("s4").cast("double") / n -
          lit(4.0) * m1 * (col("s3").cast("double") / n) +
          lit(6.0) * m1 * m1 * (col("s2").cast("double") / n) -
          lit(3.0) * m1 * m1 * m1 * m1) /
          (col("sd") * col("sd") * col("sd") * col("sd")) - lit(3.0), 6)
          .as("excess_kurtosis"))
      .orderBy("event_type")
  }

  /** q206 — MRR movement decomposition (the SaaS revenue bridge): each
    * customer's 30-day-period revenue classified against their previous
    * period — `new` (first period), `resurrected` (returned after a
    * gap), `expansion`/`contraction` (grew/shrank), `retained` (flat),
    * `churned` (active last period, absent this one) — then one
    * (period, class) aggregate of customer counts and revenue deltas.
    * The previous period arrives by a PERIOD-SHIFTED full-outer
    * self-join of the per-customer aggregate (|customers × active
    * periods| rows, never a calendar-dense grid), churn rows
    * manufactured by the join's left-null side and capped at the last
    * observed period. All revenue stays DECIMAL end-to-end. */
  val q206: Q = (spark, dir) => {
    val r = Tables.orders(spark, dir)
      .select(col("o_custkey").as("cust"),
        expr("cast(cast(o_orderdate as timestamp) as long) div 86400 div 30")
          .as("p"),
        qdec(col("o_totalprice"), 18, 2).as("v0"))
      .groupBy("cust", "p")
      .agg(sum("v0").cast("decimal(18,2)").as("v"))
    val first = r.groupBy("cust").agg(min("p").as("p0"))
    val maxP = r.agg(max("p").as("pmax"))
    val prev = r.select(col("cust"), (col("p") + 1).as("p"),
      col("v").as("pv"))
    val z = lit(0).cast("decimal(18,2)")
    r.join(prev, Seq("cust", "p"), "full")
      .join(first, "cust")
      .crossJoin(broadcast(maxP))
      .filter(col("p") <= col("pmax"))
      .select(col("p"),
        when(col("v").isNull, "churned")
          .when(col("pv").isNull && col("p") === col("p0"), "new")
          .when(col("pv").isNull, "resurrected")
          .when(col("v") > col("pv"), "expansion")
          .when(col("v") < col("pv"), "contraction")
          .otherwise("retained").as("mrr_class"),
        coalesce(col("v"), z).as("cv"),
        coalesce(col("pv"), z).as("pv"))
      .groupBy("p", "mrr_class")
      .agg(count(lit(1)).as("n_customers"),
        decOut(sum(col("cv") - col("pv")), 2).as("mrr_delta"),
        decOut(sum(col("cv")), 2).as("mrr"))
      .orderBy("p", "mrr_class")
  }

  /** q211 — CALENDAR-window moving revenue (RANGE frame): the 7-day
    * moving sum/average where the frame is `day` VALUES in [d−6, d],
    * not the last 7 observed rows — q121's ROWS frame silently widens
    * its window across gaps (7 observed days can span weeks); the RANGE
    * frame is the gap-correct fiscal-calendar semantics. Same single
    * exchange on the calendar-bounded daily frame; the average divides
    * by the FIXED 7-day window, so sparse weeks read low — the honest
    * calendar rate. Sums stay decimal; one rounded divide. */
  val q211: Q = (spark, dir) => {
    val daily = SharedFrames.dailyNationRevenue(spark, dir)
      .select(col("nation"), col("day"),
        col("rev").cast("decimal(18,2)").as("rev"))
    val w = Window.partitionBy("nation").orderBy("day")
      .rangeBetween(-6, 0)
    daily
      .withColumn("mv7_sum", sum("rev").over(w).cast("decimal(18,2)"))
      .withColumn("n_days_obs", count(lit(1)).over(w))
      .withColumn("mv7_cal_avg",
        qround(col("mv7_sum").cast("double") / lit(7.0), 6))
      .withColumn("rev", decOut(col("rev"), 2))
      .withColumn("mv7_sum", decOut(col("mv7_sum"), 2))
      .orderBy("nation", "day")
  }

  /** q212 — order-independent table fingerprint: per table, the sum of
    * keyed-md5 row hashes over a canonical projection (integer/string
    * columns only — a raw double would fingerprint its formatting, not
    * its value), exact DECIMAL(38,0) internally and folded mod 2⁶³ to
    * BIGINT on the output surface (equally collision-safe for a change
    * detector, and hash-stable at the gate). Commutative, so the
    * fingerprint is partitioning/layout/engine-independent — the
    * replication/CDC audit primitive: two sides compare one row per
    * table instead of shipping data. Mergeable across shards by
    * addition (partial sums combine), so at 100 TB it is one map-side-
    * combined aggregate per table. */
  val q212: Q = (spark, dir) => {
    def fp(df: DataFrame, name: String,
           key: org.apache.spark.sql.Column): DataFrame =
      df.select(graft.functions.GraftFunctions.md5_63(key)
          .cast("decimal(38,0)").as("h"))
        .agg(count(lit(1)).as("n_rows"),
          decFold(sum("h")).as("fingerprint"))
        .select(lit(name).as("table_name"), col("n_rows"),
          col("fingerprint"))
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir)
    val n = Tables.nation(spark, dir)
    fp(c, "customer", concat_ws("|", col("c_custkey"), col("c_name"),
        col("c_nationkey"), col("c_mktsegment")))
      .unionByName(fp(o, "orders", concat_ws("|", col("o_orderkey"),
        col("o_custkey"), col("o_orderpriority"))))
      .unionByName(fp(n, "nation", concat_ws("|", col("n_nationkey"),
        col("n_name"), col("n_regionkey"))))
      .orderBy("table_name")
  }

  /** q218 — FIFO lot matching (cost-basis / realized-margin): per part,
    * inflow lots (returnflag 'R', FIFO-ordered by ship date) are
    * consumed by outflows (the other flags, same order), and each
    * matched slice realizes margin = units × (outflow unit price −
    * inflow unit cost). The classic sequential-cursor computation is
    * re-expressed relationally: both sides get cumulative-quantity
    * intervals [lo, lo+qty) from ONE per-part window pass, and FIFO
    * matching is exactly interval OVERLAP on the cumulative-units axis
    * — m = min(hi_i,hi_o) − max(lo_i,lo_o) where positive. The overlap
    * join is bucketized (the q196/q77 trick, here on the units axis):
    * each interval explodes to its ≤ ⌈50/B⌉+1 buckets, pairs meet on a
    * (part, bucket) hash equi-join, and the pair is counted only in the
    * bucket holding the overlap start, so per-part work is near-linear
    * in the match count, never |in|×|out|. All arithmetic is exact
    * integer: whole-cent prices via the IEEE quantizer, floor-divided
    * unit costs, BIGINT unit intervals. */
  val q218: Q = (spark, dir) => {
    val B = 64L
    val li = Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_orderkey"), col("l_linenumber"),
        col("l_returnflag"), col("l_shipdate"),
        col("l_quantity").cast("long").as("qty"),
        floor(col("l_extendedprice") * 100.0 + 0.5).as("cents"))
      .withColumn("unit_cents", expr("cents div qty"))
    val w = Window.partitionBy("l_partkey")
      .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
      .rowsBetween(Window.unboundedPreceding, -1)
    def side(pred: org.apache.spark.sql.Column, tag: String) = li
      .filter(pred)
      .withColumn("lo", coalesce(sum("qty").over(w), lit(0L)))
      .select(col("l_partkey").as("pk"), col("lo").as(s"${tag}_lo"),
        (col("lo") + col("qty")).as(s"${tag}_hi"),
        col("unit_cents").as(s"${tag}_unit"))
    val fin = side(col("l_returnflag") === "R", "in")
      .withColumn("bucket", explode(expr(
        s"sequence(in_lo div $B, (in_hi - 1) div $B)")))
    val fout = side(col("l_returnflag") =!= "R", "out")
      .withColumn("bucket", explode(expr(
        s"sequence(out_lo div $B, (out_hi - 1) div $B)")))
    val matched = fin.join(fout, Seq("pk", "bucket"))
      .withColumn("m_lo", greatest(col("in_lo"), col("out_lo")))
      .withColumn("m_hi", least(col("in_hi"), col("out_hi")))
      .filter(col("m_hi") > col("m_lo") &&
        col("bucket") === expr(s"m_lo div $B"))
      .groupBy("pk")
      .agg(sum(col("m_hi") - col("m_lo")).as("matched_units"),
        sum((col("m_hi") - col("m_lo")) *
          (col("out_unit") - col("in_unit"))).as("realized_margin_cents"),
        count(lit(1)).as("n_matches"))
    li.groupBy(col("l_partkey"))
      .agg(sum(when(col("l_returnflag") === "R", col("qty"))
          .otherwise(0L)).as("supply_units"),
        sum(when(col("l_returnflag") =!= "R", col("qty"))
          .otherwise(0L)).as("demand_units"))
      .join(matched.withColumnRenamed("pk", "l_partkey"), Seq("l_partkey"),
        "left")
      .select(col("l_partkey"), col("supply_units"), col("demand_units"),
        coalesce(col("matched_units"), lit(0L)).as("matched_units"),
        coalesce(col("n_matches"), lit(0L)).as("n_matches"),
        coalesce(col("realized_margin_cents"), lit(0L))
          .as("realized_margin_cents"))
      .orderBy("l_partkey")
  }

  /** q219 — largest-remainder (Hamilton) apportionment: allocate a fixed
    * integer budget (1000 units) across nations proportional to revenue,
    * the exact-sum proration every finance/quota system needs (naive
    * per-row rounding doesn't sum to the budget). Quotient and remainder
    * are computed in exact integer arithmetic over whole-cent revenue —
    * the product budget·rev_cents routes through DECIMAL(38,0)/HUGEINT
    * so it cannot overflow BIGINT at warehouse scale (the q184 lesson) —
    * and the leftover units go to the largest remainders, ties broken by
    * nation name. One 25-row frame after the revenue aggregate: the
    * whole-frame windows are dimension-bounded, not data-bounded. */
  val q219: Q = (spark, dir) => {
    val seats = 1000L
    val rev = nationOrders(spark, dir)
      .groupBy(col("n_name").as("nation"))
      .agg(sum(floor(col("o_totalprice") * 100.0 + 0.5)).as("rev_cents"))
    val all = Window.partitionBy(lit(1))
    rev
      .withColumn("total_cents",
        sum(col("rev_cents")).over(all).cast("decimal(38,0)"))
      .withColumn("prod",
        col("rev_cents").cast("decimal(38,0)") * lit(seats))
      .withColumn("quota", expr("prod div total_cents"))
      .withColumn("rem",
        col("prod") - col("quota").cast("decimal(38,0)") * col("total_cents"))
      .withColumn("leftover", lit(seats) - sum(col("quota")).over(all))
      .withColumn("rk", row_number().over(Window.partitionBy(lit(1))
        .orderBy(col("rem").desc, col("nation"))))
      .select(col("nation"), col("rev_cents").cast("long").as("rev_cents"),
        col("quota"),
        (col("quota") + when(col("rk") <= col("leftover"), 1L)
          .otherwise(0L)).as("units"))
      .orderBy("nation")
  }

  /** Benford expected first-digit probabilities log10(1+1/d), as exact
    * 6-dp literals shared by engine and oracle (they sum to exactly
    * 1.000000) — constants, so neither engine's log10 ulp can matter. */
  private val benfordP: Seq[(Int, String)] = Seq(
    1 -> "0.301030", 2 -> "0.176091", 3 -> "0.124939", 4 -> "0.096910",
    5 -> "0.079181", 6 -> "0.066947", 7 -> "0.057992", 8 -> "0.051153",
    9 -> "0.045757")

  /** q220 — Benford first-digit audit (fraud/data-quality screen): the
    * distribution of o_totalprice's first significant digit against
    * Benford's law, with the χ² statistic. The digit comes from the
    * DECIMAL STRING of exact whole cents (never from float formatting,
    * which is engine-dependent); expected counts are exact decimals from
    * literal probabilities; each χ² term is one audited double divide of
    * exact operands, quantized then summed as decimals so the total is
    * order-independent. One digit-keyed aggregate; the 9-row frame
    * carries the windows. */
  val q220: Q = (spark, dir) => {
    val probs = benfordP.map { case (d, p) => struct(lit(d).as("digit"),
      lit(new java.math.BigDecimal(p)).cast("decimal(8,6)").as("p"),
      lit((BigDecimal(p) * 1000000).toLongExact).as("p_micros")) }
    val obs = Tables.orders(spark, dir)
      .select(substring(floor(col("o_totalprice") * 100.0 + 0.5)
        .cast("string"), 1, 1).cast("int").as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n_obs"))
    val pdf = spark.range(1)
      .select(explode(array(probs: _*)).as("bp"))
      .select(col("bp.digit").as("digit"), col("bp.p").as("p"),
        col("bp.p_micros").as("p_micros"))
    val all = Window.partitionBy(lit(1))
    // χ² term in micro-units: diff_micros and expected_micros are exact
    // BIGINTs well under 2^53, so the double square and divide are pure
    // IEEE ops both engines compute bit-identically (no decimal
    // squaring, whose result precision/scale is engine-specific).
    obs
      .join(broadcast(pdf), Seq("digit"))
      .withColumn("n_total", sum(col("n_obs")).over(all))
      .withColumn("expected_micros", col("n_total") * col("p_micros"))
      .withColumn("expected_n",
        (col("n_total").cast("decimal(20,0)") * col("p"))
          .cast("decimal(18,6)"))
      .withColumn("dm",
        (col("n_obs") * lit(1000000L) - col("expected_micros"))
          .cast("double"))
      .withColumn("chi2_term", qdec(
        col("dm") * col("dm") /
          (col("expected_micros").cast("double") * lit(1000000.0)),
        18, 6))
      // chi2 pieces stay DECIMAL internally (the windowed total must be
      // an order-free exact sum); the output surface re-projects to
      // DOUBLE (decOut — no DecimalType may leave a gated query).
      .withColumn("chi2_total", decOut(sum(col("chi2_term")).over(all), 6))
      .select(col("digit"), col("n_obs"),
        decOut(col("expected_n"), 6).as("expected_n"),
        decOut(col("chi2_term"), 6).as("chi2_term"), col("chi2_total"))
      .orderBy("digit")
  }

  /** q221 — run-length encoding of event streams (islands by CHANGE
    * detection): per user, consecutive same-type events collapse into
    * runs with span and length — the gaps-and-islands sibling of q11's
    * time-gap sessionization, where the island boundary is a VALUE
    * change, not a time gap (the classic state-machine compression:
    * status history, sensor readings, page dwell). lag → conditional
    * flag → running sum → group: every step keys on user_id, so the
    * whole query is ONE exchange; run ids restart per user and the
    * (ts, event_id) tiebreak makes the encoding total-order
    * deterministic. */
  val q221: Q = (spark, dir) => {
    val ord = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val run = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("chg", when(lag(col("event_type"), 1).over(ord).isNull ||
        lag(col("event_type"), 1).over(ord) =!= col("event_type"), 1L)
        .otherwise(0L))
      .withColumn("run_id", sum(col("chg")).over(run))
      .groupBy(col("user_id"), col("run_id"))
      .agg(min(col("event_type")).as("event_type"),
        count(lit(1)).as("run_len"),
        min(col("ts")).as("ts_start"), max(col("ts")).as("ts_end"))
      .orderBy("user_id", "run_id")
  }

  /** q227 — pinball (quantile) loss evaluation of a rolling quantile
    * forecast: per nation, forecast tomorrow's revenue p50/p90 as the
    * EXACT percentile of the trailing 28 observed days (frame excludes
    * the scored day), and score with ρ_p(y−ŷ) = max(p·e, (p−1)·e) —
    * the proper scoring rule for quantile forecasts that q202's
    * MAE/MAPE point-forecast backtest cannot express (a p90 forecast
    * judged by MAE looks biased; pinball rewards exactly the asymmetry
    * it promised). Forecasts quantize before the loss, each loss term
    * is decimal-pinned IEEE arithmetic, and only full 28-day windows
    * score. One exchange: the sequence window, history percentiles,
    * and final aggregate all key on nation; the frame is the
    * calendar-bounded daily series. */
  val q227: Q = (spark, dir) => {
    val daily = SharedFrames.dailyNationRevenue(spark, dir)
      .select(col("nation"), col("day"), col("rev").cast("double").as("y"))
    val wSeq = Window.partitionBy("nation").orderBy("day")
    val wHist = Window.partitionBy("nation").orderBy("day")
      .rowsBetween(-28, -1)
    def pinball(f: String, p: Double) = qdec(
      greatest((col("y") - col(f)) * p, (col("y") - col(f)) * (p - 1)),
      18, 6)
    daily
      .withColumn("rn", row_number().over(wSeq))
      .withColumn("f50", qround(expr("percentile(y, 0.5)").over(wHist), 6))
      .withColumn("f90", qround(expr("percentile(y, 0.9)").over(wHist), 6))
      .filter(col("rn") > 28)
      .groupBy("nation")
      .agg(count(lit(1)).as("n_scored"),
        sum(pinball("f50", 0.5)).as("s50"),
        sum(pinball("f90", 0.9)).as("s90"))
      .select(col("nation"), col("n_scored"),
        qround(col("s50").cast("double") /
          col("n_scored").cast("double"), 6).as("pinball_p50"),
        qround(col("s90").cast("double") /
          col("n_scored").cast("double"), 6).as("pinball_p90"))
      .orderBy("nation")
  }

  /** q228 — Wilson-lower-bound ranking (ranking under uncertainty): rank
    * parts by the 95 % Wilson LOWER confidence bound of their return
    * rate, not the raw proportion — the fix for "3 returns out of 3
    * sorts above 40 out of 100" that every rate leaderboard needs
    * (Miller's classic). Deterministic cross-engine because the bound is
    * pure IEEE arithmetic — +, ·, /, and a correctly-rounded sqrt — over
    * exact integer counts, with the expression tree written identically
    * in engine and oracle (z² stays the literal product 1.96·1.96; never
    * pre-fold constants on one side only), then one quantization. */
  val q228: Q = (spark, dir) => {
    val counts = Tables.lineitem(spark, dir)
      .groupBy(col("l_partkey"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("l_returnflag") === "R", 1L).otherwise(0L)).as("k"))
    val nD = col("n").cast("double")
    val p = col("k").cast("double") / nD
    val zz = lit(1.96) * lit(1.96)
    val lo = (p + zz / (lit(2.0) * nD) -
      lit(1.96) * sqrt((p * (lit(1.0) - p) + zz / (lit(4.0) * nD)) / nD)) /
      (lit(1.0) + zz / nD)
    counts
      .withColumn("raw_rate", qround(p, 6))
      .withColumn("wilson_lo", qround(lo, 6))
      .orderBy(col("wilson_lo").desc, col("l_partkey"))
      .limit(50)
      .select("l_partkey", "n", "k", "raw_rate", "wilson_lo")
  }

  /** q229 — grouped exact WEIGHTED percentiles (p25/p50/p75/p90 of line
    * price, quantity-weighted) — q167's weighted median generalized to a
    * profile, still via ONE distinct-value cumulative walk: each
    * percentile is the smallest price whose cumulative weight clears the
    * integer-scaled threshold (4·cum ≥ tot, 2·cum ≥ tot, 4·cum ≥ 3·tot,
    * 10·cum ≥ 9·tot — no fractional arithmetic anywhere), read off with
    * conditional mins from the SAME pass. Exact decimal weights and
    * decimal prices end-to-end. */
  val q229: Q = (spark, dir) => {
    val li = Tables.lineitem(spark, dir)
      .join(Tables.supplier(spark, dir), col("l_suppkey") === col("s_suppkey"))
      .join(Tables.nation(spark, dir), col("s_nationkey") === col("n_nationkey"))
      .select(col("n_name").as("nation"),
        qdec(col("l_extendedprice"), 18, 2).as("v"),
        qdec(col("l_quantity"), 18, 2).as("wq"))
    val byV = li.groupBy("nation", "v").agg(sum(col("wq")).as("wv"))
    val wCum = Window.partitionBy("nation").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy("nation")
    byV.withColumn("cumw", sum(col("wv")).over(wCum))
      .withColumn("totw", sum(col("wv")).over(wAll))
      .groupBy("nation")
      .agg(
        decOut(min(when(col("cumw") * 4 >= col("totw"), col("v"))), 2)
          .as("wp25"),
        decOut(min(when(col("cumw") * 2 >= col("totw"), col("v"))), 2)
          .as("wp50"),
        decOut(min(when(col("cumw") * 4 >= col("totw") * 3, col("v"))), 2)
          .as("wp75"),
        decOut(min(when(col("cumw") * 10 >= col("totw") * 9, col("v"))), 2)
          .as("wp90"),
        decOut(max(col("totw")), 2).as("total_qty"))
      .orderBy("nation")
  }

  /** q234 — HyperLogLog under the EXACT oracle gate (p = 8, m = 256
    * registers): the q187 KMV trick applied to the other classic
    * cardinality sketch — built on the deterministic keyed hash, the
    * register table and raw estimate reproduce bit-for-bit in any SQL
    * engine, upgrading the HLL family from q16's rows-only
    * `approx_count_distinct` to a hash-gated operator. Register build
    * is ONE grouped max (bucket = top-8 hash bits, ρ = leading-zero
    * rank of the remaining 55 via STRING length of the binary — never
    * a float log); ΣΣ2^−M runs in fixed-point DECIMAL(38,0)
    * (Σ2^(56−M_j), exact — a double Σ of 2^−M terms spans > 2⁵³ and
    * rounds), and only the final α·m²·2⁵⁶/S divide is (identical IEEE)
    * floating point. The small/large-range corrections need ln — a
    * libm call engines disagree on by ulps — so the hashed surface
    * carries the RAW estimate plus V (empty registers); the corrected
    * value is a client-side formula over those two numbers. Perfectly
    * mergeable at 100 TB: partial max per (group, bucket), 256 longs a
    * group. Exact distinct rides along as the audit (q187 pattern). */
  val q234: Q = (spark, dir) => {
    val two56 = 72057594037927936L // 2^56
    val d = Tables.events(spark, dir)
      .select("event_type", "user_id").distinct()
      .select(col("event_type"),
        graft.functions.GraftFunctions.md5_63(
          concat(lit("hll:"), col("user_id").cast("string"))).as("h"))
    val reg = d
      .withColumn("bucket", expr(s"h div ${two56 / 2}")) // h div 2^55
      .withColumn("rest", expr(s"h % ${two56 / 2}"))
      .withColumn("rho", when(col("rest") === 0L, lit(56))
        .otherwise(lit(56) - length(bin(col("rest")))))
      .groupBy("event_type", "bucket")
      .agg(max(col("rho")).as("m"))
    val exact = Tables.events(spark, dir)
      .groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("n_exact"))
    reg.groupBy("event_type")
      .agg(count(lit(1)).as("n_present"),
        (sum(expr("cast(shiftleft(cast(1 as bigint), 56 - m) as decimal(38,0))"))
          + (lit(256L) - count(lit(1))).cast("decimal(38,0)") *
            lit(two56)).cast("decimal(38,0)").as("s_fixed"))
      .withColumn("v_zero", (lit(256L) - col("n_present")).cast("long"))
      .withColumn("est_raw", qround(
        lit(0.7213 / (1.0 + 1.079 / 256.0)) * lit(65536.0) *
          lit(72057594037927936.0) / col("s_fixed").cast("double"), 6))
      .join(broadcast(exact), Seq("event_type"))
      .select(col("event_type"), col("n_present"), col("v_zero"),
        decFold(col("s_fixed")).as("s_fixed"), col("est_raw"),
        col("n_exact"))
      .orderBy("event_type")
  }

  /** q287 — ROLLING 7-day distinct users per event type via daily HLL
    * register merge: q234's sketch with a day dimension, where each
    * (type, day) register table merges into its 7 window anchors by the
    * coverage-explode trick (q174's — a register built on day d serves
    * windows d..d+6), so rolling COUNT DISTINCT becomes max-merge over
    * 7×256-entry register frames. THE reason sketches exist at 100 TB:
    * q174's exact rolling distinct explodes every (user, day) row 7× —
    * linear in users — while this explodes only the register table
    * (≤ types × days × 256 rows, data-size-independent) and still
    * answers every window. Exact WAU rides along as the error audit
    * (cheap at test scale; the sketch is the posture when it isn't).
    * Same determinism as q234: keyed hash, integer ρ, fixed-point Σ
    * internally, raw estimate quantized to 6 dp DOUBLE out. */
  val q287: Q = (spark, dir) => {
    val two55 = 36028797018963968L // 2^55
    val two56 = 72057594037927936L // 2^56
    val d = Tables.events(spark, dir)
      .select(col("event_type"), expr("ts div 86400000000000").as("day"),
        col("user_id"))
      .distinct()
    val maxDay = broadcast(d.agg(max("day").as("dmax")))
    val reg = d
      .select(col("event_type"), col("day"),
        graft.functions.GraftFunctions.md5_63(
          concat(lit("hll:"), col("user_id").cast("string"))).as("h"))
      .withColumn("bucket", expr(s"h div $two55"))
      .withColumn("rest", expr(s"h % $two55"))
      .withColumn("rho", when(col("rest") === 0L, lit(56))
        .otherwise(lit(56) - length(bin(col("rest")))))
      .groupBy("event_type", "day", "bucket")
      .agg(max(col("rho")).as("m"))
    val windows = reg
      .select(col("event_type"), col("bucket"), col("m"),
        explode(sequence(col("day"), col("day") + 6)).as("day"))
      .crossJoin(maxDay).filter(col("day") <= col("dmax"))
      .groupBy("event_type", "day", "bucket")
      .agg(max(col("m")).as("m"))
    val est = windows.groupBy("event_type", "day")
      .agg(count(lit(1)).as("n_present"),
        (sum(expr("cast(shiftleft(cast(1 as bigint), 56 - m) as decimal(38,0))"))
          + (lit(256L) - count(lit(1))).cast("decimal(38,0)") *
            lit(two56)).cast("decimal(38,0)").as("s_fixed"))
      .withColumn("v_zero", (lit(256L) - col("n_present")).cast("long"))
      .withColumn("est_wau", qround(
        lit(0.7213 / (1.0 + 1.079 / 256.0)) * lit(65536.0) *
          lit(72057594037927936.0) / col("s_fixed").cast("double"), 6))
    val exact = d
      .select(col("event_type"), col("user_id"),
        explode(sequence(col("day"), col("day") + 6)).as("day"))
      .crossJoin(maxDay).filter(col("day") <= col("dmax"))
      .groupBy("event_type", "day")
      .agg(countDistinct(col("user_id")).as("exact_wau"))
    est.join(exact, Seq("event_type", "day"))
      .select(col("event_type"), col("day"), col("n_present"),
        col("v_zero"), col("est_wau"), col("exact_wau"))
      .orderBy("event_type", "day")
  }

  /** q288 — quantile-sketch UNION: the per-type bottom-k samples (q194)
    * merge into ONE global sample by re-taking the k smallest keyed
    * hashes of their union — bottom-k(∪ groups) = bottom-k(∪ per-group
    * bottom-k), the same merge law q189 exercises for KMV — and the
    * global p50/p90/p99 are estimated from sketch state alone, never a
    * second data pass. Completes the sketch-algebra family: build
    * (q194), stream (q203), union (here). The union window runs over
    * ≤ types·k sketch rows (sketch-sized, data-size-independent); the
    * exact global percentiles ride along from the cents histogram as
    * the audit. */
  val q288: Q = (spark, dir) => {
    val k = 256
    val rows = Tables.events(spark, dir)
      .select(col("event_type"), col("event_id"),
        qdec(col("value"), 18, 2).as("v"),
        graft.functions.GraftFunctions.md5_63(
          concat(lit("qsk:"), col("event_id").cast("string"))).as("h"))
    val perType = rows
      .withColumn("rn", row_number().over(
        Window.partitionBy("event_type").orderBy("h", "event_id")))
      .filter(col("rn") <= k)
    val nTypes = perType.agg(
      countDistinct(col("event_type")).as("n_types_merged"))
    val merged = perType
      .withColumn("grn", row_number().over(
        Window.partitionBy(lit(1)).orderBy("h", "event_id")))
      .filter(col("grn") <= k)
    val est = merged
      .withColumn("rk", row_number().over(
        Window.partitionBy(lit(1)).orderBy("v", "event_id")).cast("long"))
      .withColumn("n_s", count(lit(1)).over(
        Window.partitionBy(lit(1))))
      .groupBy(lit(1).as("g"))
      .agg(max(col("n_s")).as("n_sample"),
        decOut(min(when(col("rk") >= expr("(n_s + 1) div 2"), col("v"))),
          2).as("est_p50"),
        decOut(min(when(col("rk") >= expr("(n_s * 9 + 9) div 10"),
          col("v"))), 2).as("est_p90"),
        decOut(min(when(col("rk") >= expr("(n_s * 99 + 99) div 100"),
          col("v"))), 2).as("est_p99"))
    val cum = rows.groupBy("v").agg(count(lit(1)).as("freq"))
      .withColumn("c", sum(col("freq")).over(
        Window.partitionBy(lit(1)).orderBy("v")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("n_rows", sum(col("freq")).over(
        Window.partitionBy(lit(1))))
    val exact = cum.groupBy(lit(1).as("g")).agg(
      max(col("n_rows")).as("n_rows"),
      decOut(min(when(col("c") >= expr("(n_rows + 1) div 2"), col("v"))),
        2).as("p50"),
      decOut(min(when(col("c") >= expr("(n_rows * 9 + 9) div 10"),
        col("v"))), 2).as("p90"),
      decOut(min(when(col("c") >= expr("(n_rows * 99 + 99) div 100"),
        col("v"))), 2).as("p99"))
    est.join(exact, "g").crossJoin(broadcast(nTypes))
      .select(col("n_rows"), col("n_types_merged"), col("n_sample"),
        col("est_p50"), col("est_p90"), col("est_p99"),
        col("p50"), col("p90"), col("p99"))
  }

  /** q235 — snapshot table diff (the data-diff / CDC-reconciliation
    * primitive): two keyed snapshots full-outer-joined on the natural
    * key with q212's canonical row hash deciding changed-vs-unchanged —
    * added / removed / changed / unchanged classes with counts and key
    * ranges, the one-screen answer to "what moved between these two
    * loads". Snapshots are simulated from orders (B adds a year, drops
    * keys ≡ 0 mod 13, rewrites priority on keys ≡ 0 mod 7); the diff
    * itself is schema-agnostic. Scale: one co-keyed full-outer join of
    * |keys|-sized hash projections — never raw wide rows — and a
    * 4-row output. */
  val q235: Q = (spark, dir) => {
    import graft.functions.GraftFunctions.md5_63
    val o = Tables.orders(spark, dir)
      .withColumn("od", expr("cast(cast(o_orderdate as timestamp) as long)"))
    def rowHash(prio: org.apache.spark.sql.Column) = md5_63(concat_ws("|",
      col("o_orderkey"), col("o_custkey"), col("o_orderstatus"), prio))
    val a = o.filter(col("od") < 915148800L) // < 1999-01-01
      .select(col("o_orderkey").as("k"),
        rowHash(col("o_orderpriority")).as("ha"))
    val b = o.filter(col("od") < 946684800L && // < 2000-01-01
        col("o_orderkey") % 13 =!= 0)
      .select(col("o_orderkey").as("k"),
        rowHash(when(col("o_orderkey") % 7 === 0, lit("9-SIMULATED"))
          .otherwise(col("o_orderpriority"))).as("hb"))
    a.join(b, Seq("k"), "full_outer")
      .withColumn("diff_class",
        when(col("ha").isNull, "added")
          .when(col("hb").isNull, "removed")
          .when(col("ha") =!= col("hb"), "changed")
          .otherwise("unchanged"))
      .groupBy("diff_class")
      .agg(count(lit(1)).as("n_rows"), min(col("k")).as("min_key"),
        max(col("k")).as("max_key"))
      .orderBy("diff_class")
  }

  /** q236 — FIFO remaining-inventory valuation: q218's complement —
    * after demand D consumes the lot sequence from the front, what's
    * LEFT is each lot's tail beyond max(lo, D), giving open units,
    * their cost-basis value, and the oldest open lot's date (the aging
    * readout). No pair join at all: one cumulative window over the
    * inflows plus a broadcast of per-part demand — remaining = hi −
    * max(lo, D) clamped at 0, exact integers end-to-end. The q218
    * conservation law crosses over: remaining = supply −
    * min(supply, demand), spec'd against q218's matched units. */
  val q236: Q = (spark, dir) => {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_orderkey"), col("l_linenumber"),
        col("l_returnflag"), col("l_shipdate"),
        col("l_quantity").cast("long").as("qty"),
        floor(col("l_extendedprice") * 100.0 + 0.5).as("cents"))
      .withColumn("unit_cents", expr("cents div qty"))
    val demand = li.filter(col("l_returnflag") =!= "R")
      .groupBy(col("l_partkey")).agg(sum(col("qty")).as("d"))
    val w = Window.partitionBy("l_partkey")
      .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
      .rowsBetween(Window.unboundedPreceding, -1)
    li.filter(col("l_returnflag") === "R")
      .withColumn("lo", coalesce(sum(col("qty")).over(w), lit(0L)))
      .join(demand, Seq("l_partkey"), "left")
      .withColumn("rem", greatest(lit(0L),
        col("lo") + col("qty") - greatest(col("lo"), coalesce(col("d"), lit(0L)))))
      .groupBy(col("l_partkey"))
      .agg(sum(col("rem")).as("remaining_units"),
        sum(col("rem") * col("unit_cents")).as("remaining_value_cents"),
        sum(when(col("rem") > 0, 1L).otherwise(0L)).as("n_open_lots"),
        min(when(col("rem") > 0, expr("cast(cast(l_shipdate as timestamp) as long)")))
          .as("oldest_open_s"))
      .orderBy("l_partkey")
  }

  /** q238 — market-concentration profile per nation (Herfindahl–
    * Hirschman index, effective supplier count, top-1/top-3 revenue
    * share): the antitrust-grade "how concentrated is this market"
    * readout — q124's ABC classes tell you WHO dominates, this
    * quantifies BY HOW MUCH in one scalar per market. All ratios are
    * exact integer ppm via the (2·num·10⁶ + den) div (2·den) half-up
    * idiom (q223's): HHI = Σsᵢ²/T², effective-N = its reciprocal T²/Σsᵢ²
    * (the "equivalent number of equal suppliers"), shares from a single
    * rank window. Supplier totals reduce to whole-DOLLAR units (an exact
    * floor both engines compute identically) before squaring so
    * Σsᵢ²·10⁶ and T²·10⁶ stay inside DECIMAL(38,0)/HUGEINT up to
    * ~3·10¹⁵ dollars per market — comfortably past the 100 TB corpus;
    * at that scale supplier totals are ≥ 10⁶ dollars, so dollar
    * resolution cannot move a ppm output. One fact scan, one grouped
    * sum, one |suppliers|-sized rank window — the heavy work is the
    * first aggregate, everything after is market-bounded. */
  val q238: Q = (spark, dir) => {
    val sup = Tables.lineitem(spark, dir)
      .join(Tables.supplier(spark, dir), col("l_suppkey") === col("s_suppkey"))
      .join(Tables.nation(spark, dir), col("s_nationkey") === col("n_nationkey"))
      .select(col("n_name").as("nation"), col("l_suppkey"),
        (qdec(col("l_extendedprice"), 18, 2) * 100).cast("decimal(20,0)")
          .as("cents"))
      .groupBy("nation", "l_suppkey")
      .agg(sum(col("cents")).cast("decimal(38,0)").as("sc"))
      // whole-dollar units: exact floor, keeps squares inside 38 digits
      .withColumn("su", expr("cast(sc div 100 as decimal(38,0))"))
    val rk = row_number().over(
      Window.partitionBy("nation").orderBy(col("su").desc, col("l_suppkey")))
    sup.withColumn("rk", rk)
      .groupBy("nation")
      .agg(count(lit(1)).as("n_suppliers"),
        sum(col("su")).cast("decimal(38,0)").as("tot"),
        sum((col("su") * col("su")).cast("decimal(38,0)"))
          .cast("decimal(38,0)").as("ssq"),
        sum(when(col("rk") <= 1, col("su")).otherwise(lit(0)))
          .cast("decimal(38,0)").as("t1"),
        sum(when(col("rk") <= 3, col("su")).otherwise(lit(0)))
          .cast("decimal(38,0)").as("t3"))
      .select(col("nation"), col("n_suppliers"),
        col("tot").cast("long").as("total_units"),
        expr("cast((2 * ssq * 1000000 + tot * tot) div (2 * tot * tot) as bigint)")
          .as("hhi_ppm"),
        expr("cast((2 * tot * tot * 1000000 + ssq) div (2 * ssq) as bigint)")
          .as("effn_micro"),
        expr("cast((2 * t1 * 1000000 + tot) div (2 * tot) as bigint)")
          .as("top1_ppm"),
        expr("cast((2 * t3 * 1000000 + tot) div (2 * tot) as bigint)")
          .as("top3_ppm"))
      .orderBy("nation")
  }

  /** q239 — autocorrelation function + Ljung–Box whiteness audit of
    * daily nation revenue: r₁…r₇ (classic ACF — global mean, global
    * denominator, the statistic q157's matched-pair cross-correlation
    * is NOT) and the portmanteau Q = n(n+2)·Σ rₖ²/(n−k) with its χ²₇
    * 95 % verdict — "does this series carry structure, or is the
    * smoothing family (q127/q164/q197) modeling noise?". Exact integer
    * CENTS sufficient statistics: each rₖ is a ratio of two integers —
    * n²Σxy − nS(Σhead+Σtail) + (n−k)S² over n²Σx² − nS² (the centered
    * form expanded so no order-dependent double sum and no early
    * divide exists; widths fit DECIMAL(38,0)/HUGEINT to ~10¹⁴ cents a
    * day per nation, past 100 TB) — quantized to 6 dp only at the
    * ratio. The seven lags come from ONE window pass over the
    * calendar-bounded daily frame; Q is a textually-identical
    * left-to-right IEEE expression over the quantized rₖ, so both
    * engines add in the same order. */
  val q239: Q = (spark, dir) => {
    val lags = 1 to 7
    val wSeq = Window.partitionBy("nation").orderBy("day")
    val base = SharedFrames.dailyNationRevenue(spark, dir)
      .select(col("nation"), col("day"),
        (col("rev").cast("decimal(18,2)") * 100).cast("decimal(38,0)")
          .as("x"))
    val withLags = lags.foldLeft(base) { (df, k) =>
      df.withColumn(s"x$k", lag(col("x"), k).over(wSeq))
    }
    val aggs =
      Seq(count(lit(1)).as("n"),
        sum(col("x")).cast("decimal(38,0)").as("s"),
        sum((col("x") * col("x")).cast("decimal(38,0)"))
          .cast("decimal(38,0)").as("sxx")) ++
      lags.flatMap { k => Seq(
        sum((col("x") * col(s"x$k")).cast("decimal(38,0)"))
          .cast("decimal(38,0)").as(s"sxy$k"),
        sum(when(col(s"x$k").isNotNull, col(s"x$k")).otherwise(lit(0)))
          .cast("decimal(38,0)").as(s"sh$k"),
        sum(when(col(s"x$k").isNotNull, col("x")).otherwise(lit(0)))
          .cast("decimal(38,0)").as(s"st$k")) }
    val st = withLags.groupBy("nation").agg(aggs.head, aggs.tail: _*)
    val withR = lags.foldLeft(st) { (df, k) =>
      df.withColumn(s"r$k", qround(
        expr(s"cast(cast(n as decimal(38,0)) * n * sxy$k - cast(n as decimal(38,0)) * s * (sh$k + st$k) + (cast(n as decimal(38,0)) - $k) * s * s as double)") /
        expr("cast(cast(n as decimal(38,0)) * n * sxx - cast(n as decimal(38,0)) * s * s as double)"), 6))
    }
    val nd = col("n").cast("double")
    val lb = lags.map(k => col(s"r$k") * col(s"r$k") / (nd - lit(k.toDouble)))
      .reduce(_ + _)
    withR
      .withColumn("lb_q", qround(nd * (nd + lit(2.0)) * lb, 6))
      .withColumn("not_white", col("lb_q") > lit(14.067))
      .select(Seq(col("nation"), col("n").as("n_days")) ++
        lags.map(k => col(s"r$k")) ++
        Seq(col("lb_q"), col("not_white")): _*)
      .orderBy("nation")
  }

  /** q243 — Holt–Winters additive seasonal forecast on daily nation
    * revenue ([[graft.ops.TimeSeries.holtWintersAdditive]]): completes
    * the smoothing ladder q127 (EWMA, level) → q164 (Holt, +trend) →
    * here (+weekly seasonality) — the first member that can FORECAST a
    * day-of-week-periodic series instead of lagging it (q156 showed the
    * dow signal exists; q239's Ljung–Box shows it is non-noise). The
    * seasonal state is indexed by CALENDAR day-mod-7, so observation
    * gaps can't rotate the season; the oracle replays the recursion as
    * a recursive CTE carrying all seven seasonal slots, bit-identical
    * doubles per the q164/q197 contract. */
  val q243: Q = (spark, dir) => {
    val daily = SharedFrames.dailyNationRevenue(spark, dir)
      .select(col("nation"), col("day"),
        col("rev").cast("double").as("revenue"))
    TimeSeries.holtWintersAdditive(daily, "nation", "day", "revenue",
        alpha = 0.3, beta = 0.1, gamma = 0.2, period = 7)
      .select(col("nation"), col("day"), col("revenue"),
        qround(col("level"), 6).as("level"),
        qround(col("trend"), 6).as("trend"),
        qround(col("seasonal"), 6).as("seasonal"),
        qround(col("forecast"), 6).as("forecast"))
      .orderBy("nation", "day")
  }

  /** q247 — maximum drawdown of daily nation revenue: the largest
    * peak-to-trough collapse of the series (running max, then the
    * worst percentage drop from it) — the risk statistic that answers
    * "how bad did it get, at its worst" where q197's CUSUM answers
    * "when did it shift"; the pair is the monitoring duo every revenue
    * dashboard wants. Entirely exact integers: cents ride
    * DECIMAL(38,0), the running peak is one bounded window max over
    * the calendar-sized daily frame, each day's drawdown is integer
    * ppm via the half-up div idiom, and the argmax trough pins its tie
    * to the EARLIEST day (row_number over (dd desc, day)) in both
    * engines. */
  val q247: Q = (spark, dir) => {
    val daily = SharedFrames.dailyNationRevenue(spark, dir)
      .select(col("nation"), col("day"),
        (col("rev").cast("decimal(18,2)") * 100).cast("decimal(38,0)")
          .as("xc"))
    val wPeak = Window.partitionBy("nation").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily.withColumn("peak", max(col("xc")).over(wPeak))
      .withColumn("dd_ppm",
        expr("cast((2 * (peak - xc) * 1000000 + peak) div (2 * peak) as bigint)"))
      .withColumn("rk", row_number().over(Window.partitionBy("nation")
        .orderBy(col("dd_ppm").desc, col("day"))))
      .filter(col("rk") === 1)
      .select(col("nation"), col("day").as("trough_day"),
        col("xc").cast("long").as("trough_cents"),
        col("peak").cast("long").as("peak_cents"),
        col("dd_ppm").as("max_drawdown_ppm"))
      .orderBy("nation")
  }

  /** q250 — hierarchical forecast reconciliation (bottom-up vs direct):
    * region-level daily forecasts computed BOTH ways — Σ of the member
    * nations' Holt forecasts, and Holt run directly on the
    * region-aggregated series — with the reconciliation gap between
    * them. Aggregation and nonlinear smoothing do not commute, so the
    * two legitimately disagree; the gap IS the business readout (a
    * planner publishing region totals that don't equal the sum of its
    * nation plans gets called out in the first review). Bottom-up sums
    * ride exact DECIMAL(18,6) over the once-quantized nation forecasts;
    * the direct series reuses the same decimal daily frame re-summed
    * (decimal addition is associative, so region revenue is exactly the
    * Σ of nation revenue); both recursions carry the q164 bit-identical
    * double contract into a twin recursive-CTE oracle. */
  val q250: Q = (spark, dir) => {
    val natRegion = Tables.nation(spark, dir)
      .join(Tables.region(spark, dir),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_name").as("nation"), col("r_name").as("region"))
    val daily = SharedFrames.dailyNationRevenue(spark, dir)
    val natF = TimeSeries.holtLinear(
        daily.select(col("nation"), col("day"),
          col("rev").cast("double").as("revenue")),
        "nation", "day", "revenue", alpha = 0.3, beta = 0.1)
      .select(col("nation"), col("day"),
        graft.functions.GraftFunctions.qdec(col("forecast"), 18, 6)
          .as("f6"))
      .join(broadcast(natRegion), Seq("nation"))
    val bu = natF.groupBy("region", "day")
      .agg(count(lit(1)).as("n_nations"), sum(col("f6")).as("f_bu"))
    val regDaily = daily.join(broadcast(natRegion), Seq("nation"))
      .groupBy("region", "day").agg(sum(col("rev")).as("rrev"))
    val direct = TimeSeries.holtLinear(
        regDaily.select(col("region"), col("day"),
          col("rrev").cast("double").as("revenue")),
        "region", "day", "revenue", alpha = 0.3, beta = 0.1)
      .select(col("region"), col("day"),
        qround(col("forecast"), 6).as("f_direct"))
    bu.join(direct, Seq("region", "day"))
      .select(col("region"), col("day"), col("n_nations"),
        col("f_bu").cast("double").as("f_bottom_up"), col("f_direct"),
        qround(col("f_bu").cast("double") - col("f_direct"), 6)
          .as("recon_gap"))
      .orderBy("region", "day")
  }

  /** q251 — winsorized metric readout: per event type, the mean of the
    * value capped at its own p95/p99 order statistic — the robust
    * metric form every experimentation platform reports, because one
    * whale purchase otherwise owns the average (q109 flags the whales;
    * this is how the metric survives them). Caps come from the q167
    * distinct-value cumulative walk (`min v : 20·cum ≥ 19·tot` — pure
    * integer thresholds, no interpolation ambiguity), values are 2dp
    * decimals, the capped sums are exact decimal conditional sums, and
    * the means are one audited divide each. The capped fraction rides
    * along in exact ppm. */
  val q251: Q = (spark, dir) => {
    val e = Tables.events(spark, dir)
      .select(col("event_type"), qdec(col("value"), 7, 2).as("v"))
    val wCum = Window.partitionBy("event_type").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy("event_type")
    val caps = e.groupBy("event_type", "v").agg(count(lit(1)).as("c"))
      .withColumn("cum", sum(col("c")).over(wCum))
      .withColumn("tot", sum(col("c")).over(wAll))
      .groupBy("event_type")
      .agg(min(when(col("cum") * 20 >= col("tot") * 19, col("v")))
          .as("cap95"),
        min(when(col("cum") * 100 >= col("tot") * 99, col("v")))
          .as("cap99"))
    e.join(broadcast(caps), Seq("event_type"))
      .groupBy("event_type", "cap95", "cap99")
      .agg(count(lit(1)).as("n"),
        sum(col("v")).as("sv"),
        sum(least(col("v"), col("cap95"))).as("sw95"),
        sum(least(col("v"), col("cap99"))).as("sw99"),
        sum(when(col("v") > col("cap95"), 1L).otherwise(0L)).as("nc95"))
      .select(col("event_type"), col("n"),
        decOut(col("cap95"), 2).as("cap95"),
        decOut(col("cap99"), 2).as("cap99"),
        qround(col("sv").cast("double") / col("n").cast("double"), 6)
          .as("mean_raw"),
        qround(col("sw95").cast("double") / col("n").cast("double"), 6)
          .as("mean_wins95"),
        qround(col("sw99").cast("double") / col("n").cast("double"), 6)
          .as("mean_wins99"),
        expr("cast((2 * nc95 * 1000000 + n) div (2 * n) as bigint)")
          .as("capped95_ppm"))
      .orderBy("event_type")
  }

  /** q256 — two-feature OLS per nation (price ~ quantity + discount)
    * by Cramer's rule over centered moments: the multiple-regression
    * step up from q146's single-regressor fit, answering "what does a
    * unit of quantity buy HOLDING DISCOUNT FIXED" — the partial effect
    * simple per-feature fits confound. The five centered moments
    * S₁₁,S₂₂,S₁₂,S₁y,S₂y are EXACT integers (n·Σab − Σa·Σb over cents /
    * integer units), cast once to double for the textually-mirrored
    * Cramer solve (products of the S-terms would outgrow DECIMAL(38) at
    * extreme n — the IEEE combination of exact operands is the q157
    * discipline, deterministic in both engines); β̂s quantize to 6 dp. */
  val q256: Q = (spark, dir) => {
    val li = Tables.lineitem(spark, dir)
      .join(Tables.supplier(spark, dir), col("l_suppkey") === col("s_suppkey"))
      .join(Tables.nation(spark, dir), col("s_nationkey") === col("n_nationkey"))
      .select(col("n_name").as("nation"),
        col("l_quantity").cast("long").as("x1"),
        (qdec(col("l_discount"), 4, 2) * 100).cast("long").as("x2"),
        (qdec(col("l_extendedprice"), 18, 2) * 100).cast("decimal(20,0)")
          .cast("long").as("y"))
    def d38(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    val st = li.groupBy("nation").agg(
      count(lit(1)).as("n"),
      sum(d38(col("x1"))).as("s1"), sum(d38(col("x2"))).as("s2"),
      sum(d38(col("y"))).as("sy"),
      sum(d38(col("x1") * col("x1"))).as("s11"),
      sum(d38(col("x2") * col("x2"))).as("s22"),
      sum(d38(col("x1") * col("x2"))).as("s12"),
      sum(d38(col("x1") * col("y"))).as("s1y"),
      sum(d38(col("x2") * col("y"))).as("s2y"))
    val c = st
      .withColumn("c11", expr("cast(n * s11 - s1 * s1 as double)"))
      .withColumn("c22", expr("cast(n * s22 - s2 * s2 as double)"))
      .withColumn("c12", expr("cast(n * s12 - s1 * s2 as double)"))
      .withColumn("c1y", expr("cast(n * s1y - s1 * sy as double)"))
      .withColumn("c2y", expr("cast(n * s2y - s2 * sy as double)"))
      .withColumn("det", col("c11") * col("c22") - col("c12") * col("c12"))
    c.select(col("nation"), col("n").as("n_rows"),
        qround((col("c22") * col("c1y") - col("c12") * col("c2y")) /
          col("det"), 6).as("beta_qty_cents"),
        qround((col("c11") * col("c2y") - col("c12") * col("c1y")) /
          col("det"), 6).as("beta_discpct_cents"))
      .orderBy("nation")
  }

  /** q258 — partial correlation on the daily event series (purchase
    * revenue ↔ click count, CONTROLLING for view volume):
    * r_xy·z = (r_xy − r_xz·r_zy)/√((1−r_xz²)(1−r_zy²)) — the
    * confound-removal statistic that tells a marketing dashboard
    * whether clicks carry signal beyond "everything rises with site
    * traffic", which q157's raw cross-correlation can't distinguish.
    * ONE events scan builds the (day, x, y, z) frame; each pairwise r
    * comes from exact integer sufficient statistics (q239's
    * cents/counts discipline), quantized to 6 dp; the partial formula
    * is a single mirrored IEEE expression over the three quantized
    * r's. */
  val q258: Q = (spark, dir) => {
    val j = Tables.events(spark, dir)
      .groupBy(expr("ts div 86400000000000").as("day"))
      .agg((sum(when(col("event_type") === "purchase",
            qdec(col("value"), 7, 2)).otherwise(lit(0)))
          .cast("decimal(18,2)") * 100).cast("decimal(38,0)").as("x"),
        sum(when(col("event_type") === "click", 1L).otherwise(0L))
          .cast("decimal(38,0)").as("y"),
        sum(when(col("event_type") === "view", 1L).otherwise(0L))
          .cast("decimal(38,0)").as("z"))
    val st = j.agg(count(lit(1)).as("n"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"), sum(col("z")).as("sz"),
      sum(expr("cast(x * y as decimal(38,0))")).as("sxy"),
      sum(expr("cast(x * z as decimal(38,0))")).as("sxz"),
      sum(expr("cast(y * z as decimal(38,0))")).as("syz"),
      sum(expr("cast(x * x as decimal(38,0))")).as("sxx"),
      sum(expr("cast(y * y as decimal(38,0))")).as("syy"),
      sum(expr("cast(z * z as decimal(38,0))")).as("szz"))
    def r(ab: String, aa: String, bb: String, a: String, b: String) =
      qround(expr(s"cast(n * $ab - $a * $b as double)") /
        (sqrt(expr(s"cast(n * $aa - $a * $a as double)")) *
         sqrt(expr(s"cast(n * $bb - $b * $b as double)"))), 6)
    st.withColumn("r_xy", r("sxy", "sxx", "syy", "sx", "sy"))
      .withColumn("r_xz", r("sxz", "sxx", "szz", "sx", "sz"))
      .withColumn("r_zy", r("syz", "szz", "syy", "sz", "sy"))
      .select(col("n").as("n_days"), col("r_xy"), col("r_xz"), col("r_zy"),
        qround((col("r_xy") - col("r_xz") * col("r_zy")) /
          sqrt((lit(1.0) - col("r_xz") * col("r_xz")) *
               (lit(1.0) - col("r_zy") * col("r_zy"))), 6)
          .as("partial_xy_given_z"))
  }

  /** q259 — Mann–Kendall monotone-trend test on daily nation revenue
    * ([[graft.ops.TimeSeries.mannKendall]]): the distribution-free
    * significance TEST whose point estimate is q205's Theil–Sen slope —
    * together they are the standard robust trend report (slope + "is it
    * real"). S and the tie-corrected 18·Var(S) are exact integers from
    * a per-nation LOCAL fold (q205's calendar-bounded-pairs pattern —
    * no distributed pair stream); z = (S∓1)/√(var18/18) is the one
    * mirrored IEEE step, and the oracle replays the pair sum as a
    * quadratic self-join over the same bounded series. */
  val q259: Q = (spark, dir) => {
    val daily = SharedFrames.dailyNationRevenue(spark, dir)
      .select(col("nation"), col("day"),
        (col("rev").cast("decimal(18,2)") * 100).cast("decimal(38,0)")
          .as("xc"))
    val zExpr = when(col("s_stat") > 0,
        (col("s_stat") - 1).cast("double") /
          sqrt(col("var18").cast("double") / lit(18.0)))
      .when(col("s_stat") < 0,
        (col("s_stat") + 1).cast("double") /
          sqrt(col("var18").cast("double") / lit(18.0)))
      .otherwise(lit(0.0))
    TimeSeries.mannKendall(daily, "nation", "day", "xc")
      .withColumn("z", qround(zExpr, 6))
      .withColumn("trending", abs(col("z")) > lit(1.96))
      .select("nation", "n_days", "s_stat", "var18", "z", "trending")
      .orderBy("nation")
  }

  /** q260 — Spearman rank correlation between the daily purchase-revenue
    * and click-count series: the monotone-association companion to
    * q258's linear machinery — a saturating relationship scores |ρ|≈1
    * here while Pearson under-reads it. Ranks are EXACT integers: the
    * tie-averaged rank ×2 is 2·below + t + 1 (no halves), read off a
    * distinct-VALUE cumulative walk (the q167 shape — the only
    * unpartitioned window is distinct-value-bounded), and Pearson on
    * the doubled ranks equals Pearson on ranks by affine invariance, so
    * ρ is a ratio of exact integers with one mirrored IEEE formula. */
  val q260: Q = (spark, dir) => {
    val j = Tables.events(spark, dir)
      .groupBy(expr("ts div 86400000000000").as("day"))
      .agg((sum(when(col("event_type") === "purchase",
            qdec(col("value"), 7, 2)).otherwise(lit(0)))
          .cast("decimal(18,2)") * 100).cast("decimal(38,0)").as("x"),
        sum(when(col("event_type") === "click", 1L).otherwise(0L))
          .cast("decimal(38,0)").as("y"))
    def ranked(vcol: String, out: String): DataFrame = {
      val w = Window.orderBy(vcol)
        .rowsBetween(Window.unboundedPreceding, -1)
      j.groupBy(vcol).agg(count(lit(1)).as("c"))
        .withColumn("below", coalesce(sum(col("c")).over(w), lit(0L)))
        .select(col(vcol),
          (lit(2) * col("below") + col("c") + 1).cast("decimal(38,0)")
            .as(out))
    }
    val st = j.join(ranked("x", "r2x"), Seq("x"))
      .join(ranked("y", "r2y"), Seq("y"))
      .agg(count(lit(1)).as("n"),
        sum(col("r2x")).as("sx"), sum(col("r2y")).as("sy"),
        sum(expr("cast(r2x * r2y as decimal(38,0))")).as("sxy"),
        sum(expr("cast(r2x * r2x as decimal(38,0))")).as("sxx"),
        sum(expr("cast(r2y * r2y as decimal(38,0))")).as("syy"))
    // Zero rank variance (constant series / single day) → ρ undefined →
    // NULL, not an ANSI DIVIDE_BY_ZERO throw (fuzz gate, r13). DuckDB's
    // double x/0 is NULL natively, so the unguarded oracle already
    // emits NULL there; this guard mirrors it.
    val denom = sqrt(expr("cast(n * sxx - sx * sx as double)")) *
      sqrt(expr("cast(n * syy - sy * sy as double)"))
    st.select(col("n").as("n_days"),
      qround(when(denom > 0.0,
        expr("cast(n * sxy - sx * sy as double)") / denom), 6)
        .as("spearman_rho"))
  }

  /** q264 — Kendall τ-b between the daily purchase-revenue and
    * click-count series ([[graft.ops.TimeSeries.kendallTauB]]):
    * completes the rank-association family — q260's Spearman weights
    * by rank distance, τ-b is the pure pair-concordance probability
    * with both tie denominators, the version practitioners quote when
    * ties are heavy (integer click counts tie constantly). C, D, tx,
    * ty are exact integers from the q259 local-fold pattern; τ-b is
    * one mirrored IEEE formula; the oracle replays the pair
    * classification as a quadratic self-join over the calendar-bounded
    * series. */
  val q264: Q = (spark, dir) => {
    val j = Tables.events(spark, dir)
      .groupBy(expr("ts div 86400000000000").as("day"))
      .agg((sum(when(col("event_type") === "purchase",
            qdec(col("value"), 7, 2)).otherwise(lit(0)))
          .cast("decimal(18,2)") * 100).cast("decimal(38,0)").as("x"),
        sum(when(col("event_type") === "click", 1L).otherwise(0L))
          .cast("decimal(38,0)").as("y"))
      .withColumn("g", lit("all"))
    TimeSeries.kendallTauB(j, "g", "x", "y")
      .withColumn("tau_b", qround(
        (col("concordant") - col("discordant")).cast("double") /
        sqrt((col("concordant") + col("discordant") + col("ties_x"))
            .cast("double") *
          (col("concordant") + col("discordant") + col("ties_y"))
            .cast("double")), 6))
      .select("n_obs", "concordant", "discordant", "ties_x", "ties_y",
        "tau_b")
  }

  /** q270 — ABC–XYZ inventory matrix: every part classified on TWO
    * axes — revenue contribution (A ≤ 80 % cumulative share, B ≤ 95 %,
    * C else — q124's sweep with the thresholds as EXACT integer
    * comparisons 5·cum ≤ 4·tot / 20·cum ≤ 19·tot) × demand
    * variability (coefficient of variation of weekly shipped quantity:
    * X < 0.5, Y < 1.0, Z else, single-week parts are Z by convention) —
    * the 9-cell planning matrix behind every inventory policy choice
    * (AX = automate, CZ = make-to-order). CV is one mirrored IEEE
    * formula over exact integer weekly sums, quantized before the
    * class comparison so the boundary can't drift cross-engine. */
  val q270: Q = (spark, dir) => {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_partkey"),
        expr("cast(cast(l_shipdate as timestamp) as long) div 604800")
          .as("wk"),
        col("l_quantity").cast("long").as("qty"),
        (qdec(col("l_extendedprice"), 18, 2) * 100).cast("decimal(38,0)")
          .as("cents"))
    val value = li.groupBy("l_partkey")
      .agg(sum(col("cents")).cast("decimal(38,0)").as("v"))
    val wCum = Window.orderBy(col("v").desc, col("l_partkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val abc = value
      .withColumn("cum", sum(col("v")).over(wCum).cast("decimal(38,0)"))
      .withColumn("tot", sum(col("v")).over(
        Window.partitionBy(lit(1))).cast("decimal(38,0)"))
      .withColumn("abc_class",
        when(expr("5 * cum <= 4 * tot"), "A")
          .when(expr("20 * cum <= 19 * tot"), "B").otherwise("C"))
      .select("l_partkey", "v", "abc_class")
    val weekly = li.groupBy("l_partkey", "wk")
      .agg(sum(col("qty")).as("q"))
    val xyz = weekly.groupBy("l_partkey")
      .agg(count(lit(1)).as("n"),
        sum(col("q").cast("decimal(38,0)")).as("sq"),
        sum((col("q").cast("decimal(38,0)") * col("q"))
          .cast("decimal(38,0)")).as("sqq"))
      .withColumn("cv", when(col("n") >= 2, qround(
        sqrt(expr("cast(n * sqq - sq * sq as double)") /
          expr("cast(cast(n as decimal(38,0)) * (n - 1) as double)")) /
        (expr("cast(sq as double)") / col("n")), 6)))
      .withColumn("xyz_class",
        when(col("cv").isNull, "Z")
          .when(col("cv") < 0.5, "X")
          .when(col("cv") < 1.0, "Y").otherwise("Z"))
      .select("l_partkey", "xyz_class")
    abc.join(xyz, "l_partkey")
      .groupBy("abc_class", "xyz_class")
      .agg(count(lit(1)).as("n_parts"),
        sum(col("v")).cast("long").as("value_cents"))
      .orderBy("abc_class", "xyz_class")
  }

  /** q271 — price–volume revenue bridge (the FP&A "why did revenue
    * move" decomposition, 1996 → 1997 shipments): per part,
    * ΔR = P₀·ΔQ + ΔP·Q₁ splits the move into a volume effect (sold
    * more/less at old prices) and a price effect (repriced the new
    * volume); parts present in only one period contribute whole-revenue
    * new/discontinued effects, and the bridge CLOSES by construction —
    * Σ effects = ΔR total (the q206 MRR-bridge discipline applied to
    * price×volume). Unit prices quantize ONCE to half-up integer
    * micro-cents ((2·R·10⁴+Q) div 2Q), every effect is then a pure
    * INTEGER product/difference (negatives safe — no integer division
    * touches a signed value), and the per-part quantization remainder
    * is carried honestly as `residual_microcents` instead of being
    * smeared into the effects. */
  val q271: Q = (spark, dir) => {
    val base = Tables.lineitem(spark, dir)
      .select(col("l_partkey"),
        expr("year(cast(l_shipdate as date))").as("yr"),
        col("l_quantity").cast("long").as("qty"),
        (qdec(col("l_extendedprice"), 18, 2) * 100).cast("decimal(38,0)")
          .as("cents"))
      .filter(col("yr").isin(1996, 1997))
      .groupBy("l_partkey", "yr")
      .agg(sum(col("qty")).as("q"),
        sum(col("cents")).cast("decimal(38,0)").as("r"))
      .withColumn("p",
        expr("cast((2 * r * 10000 + q) div (2 * cast(q as decimal(38,0))) as bigint)"))
    val y0 = base.filter(col("yr") === 1996)
      .select(col("l_partkey"), col("q").as("q0"), col("r").as("r0"),
        col("p").as("p0"))
    val y1 = base.filter(col("yr") === 1997)
      .select(col("l_partkey"), col("q").as("q1"), col("r").as("r1"),
        col("p").as("p1"))
    val j = y0.join(y1, Seq("l_partkey"), "full_outer")
    def d38(sql: String) = expr(s"cast($sql as decimal(38,0))")
    j.agg(
        sum(when(col("p0").isNotNull && col("p1").isNotNull, 1L)
          .otherwise(0L)).as("n_common"),
        sum(when(col("p0").isNull, 1L).otherwise(0L)).as("n_new"),
        sum(when(col("p1").isNull, 1L).otherwise(0L)).as("n_discontinued"),
        sum(d38("(coalesce(r1, 0) - coalesce(r0, 0)) * 10000"))
          .cast("long").as("delta_rev_microcents"),
        sum(when(col("p0").isNotNull && col("p1").isNotNull,
          d38("(p1 - p0) * q1")).otherwise(lit(0))).cast("long")
          .as("price_effect"),
        sum(when(col("p0").isNotNull && col("p1").isNotNull,
          d38("p0 * (q1 - q0)")).otherwise(lit(0))).cast("long")
          .as("volume_effect"),
        sum(when(col("p0").isNull, d38("r1 * 10000")).otherwise(lit(0)))
          .cast("long").as("new_effect"),
        sum(when(col("p1").isNull, d38("-r0 * 10000")).otherwise(lit(0)))
          .cast("long").as("discontinued_effect"))
      .withColumn("residual_microcents",
        expr("cast(delta_rev_microcents - price_effect - volume_effect - new_effect - discontinued_effect as bigint)"))
  }

  /** q293 — arc price elasticity of demand per part (1996→1997): the
    * midpoint-formula elasticity ε = (Δq/q̄)/(Δp/p̄) =
    * (q₁−q₀)(p₁+p₀) / ((p₁−p₀)(q₁+q₀)) — the FP&A companion to q271's
    * bridge: the bridge says WHERE revenue moved, elasticity says how
    * demand RESPONDED to the price moves. The midpoint form needs no
    * logarithm (the log-log OLS alternative is banned by the libm
    * rule), and the cross-ratio is exact integers end-to-end: unit
    * prices are q271's half-up micro-cents, the ratio is one mirrored
    * IEEE divide, 6 dp. Report: per elasticity class (|ε| > 1 elastic),
    * part count and the median ε via the q167 distinct-value walk —
    * the only window runs over distinct quantized ε values. */
  val q293: Q = (spark, dir) => {
    val base = Tables.lineitem(spark, dir)
      .select(col("l_partkey"),
        expr("year(cast(l_shipdate as date))").as("yr"),
        col("l_quantity").cast("long").as("qty"),
        (qdec(col("l_extendedprice"), 18, 2) * 100).cast("decimal(38,0)")
          .as("cents"))
      .filter(col("yr").isin(1996, 1997))
      .groupBy("l_partkey", "yr")
      .agg(sum(col("qty")).as("q"),
        sum(col("cents")).cast("decimal(38,0)").as("r"))
      .withColumn("p",
        expr("cast((2 * r * 10000 + q) div (2 * cast(q as decimal(38,0))) as bigint)"))
    val e = base.filter(col("yr") === 1996)
      .select(col("l_partkey"), col("q").as("q0"), col("p").as("p0"))
      .join(base.filter(col("yr") === 1997)
        .select(col("l_partkey"), col("q").as("q1"), col("p").as("p1")),
        "l_partkey")
      .filter(col("p1") =!= col("p0"))
      .withColumn("elasticity", qround(
        expr("cast(cast(q1 - q0 as decimal(38,0)) * (p1 + p0) as double)") /
        expr("cast(cast(p1 - p0 as decimal(38,0)) * (q1 + q0) as double)"),
        6))
      .withColumn("cls",
        when(abs(col("elasticity")) > 1.0, "elastic")
          .otherwise("inelastic"))
    val byV = e.groupBy("cls", "elasticity").agg(count(lit(1)).as("c"))
    val wCum = Window.partitionBy("cls").orderBy("elasticity")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy("cls")
    byV.withColumn("cum", sum(col("c")).over(wCum))
      .withColumn("tot", sum(col("c")).over(wAll))
      .groupBy("cls")
      .agg(max(col("tot")).as("n_parts"),
        min(when(col("cum") * 2 >= col("tot"), col("elasticity")))
          .as("median_elasticity"))
      .orderBy("cls")
  }

  /** q272 — same-store (comparable) growth: 1996→1997 revenue growth
    * computed over ONLY the customers active in BOTH years, next to the
    * headline number — the retail-analytics control that separates
    * organic growth from customer-base churn (a headline that beats
    * comparable growth is growing by acquisition, not engagement).
    * One scan, one both-years semi-join; growth ratios are sign-safe
    * `qround` quotients of exact decimal sums (never the div idiom,
    * whose floor/trunc semantics diverge on negatives). */
  val q272: Q = (spark, dir) => {
    val o = Tables.orders(spark, dir)
      .select(col("o_custkey"),
        expr("year(cast(o_orderdate as date))").as("yr"),
        qdec(col("o_totalprice"), 18, 2).as("p"))
      .filter(col("yr").isin(1996, 1997))
    val both = o.groupBy("o_custkey")
      .agg(countDistinct(col("yr")).as("ny"))
      .filter(col("ny") === 2).select("o_custkey")
    def pivot(df: DataFrame, pfx: String) = df.groupBy(lit(1).as("k"))
      .agg(sum(when(col("yr") === 1996, col("p")))
          .cast("decimal(18,2)").as(s"rev0_$pfx"),
        sum(when(col("yr") === 1997, col("p")))
          .cast("decimal(18,2)").as(s"rev1_$pfx"))
    val all = pivot(o, "all")
    val same = pivot(o.join(both, Seq("o_custkey"), "left_semi"), "same")
    all.join(same, "k").drop("k")
      .crossJoin(broadcast(both.agg(count(lit(1)).as("n_comparable"))))
      .withColumn("growth_all", qround(
        (col("rev1_all") - col("rev0_all")).cast("double") /
          col("rev0_all").cast("double"), 6))
      .withColumn("growth_same", qround(
        (col("rev1_same") - col("rev0_same")).cast("double") /
          col("rev0_same").cast("double"), 6))
      .select(col("n_comparable") +:
        Seq("rev0_all", "rev1_all").map(c => decOut(col(c), 2).as(c)) :+
        col("growth_all") :+
        decOut(col("rev0_same"), 2).as("rev0_same") :+
        decOut(col("rev1_same"), 2).as("rev1_same") :+
        col("growth_same"): _*)
  }

  /** q275 — open-order backlog aging waterfall: orders still open
    * ('O') bucketed by age at the corpus's as-of date (its max order
    * date — derived in-plan from exact integer day min/max, never a
    * wall clock, so the artifact is replay-stable), with order counts
    * and exact decimal value per bucket — the ops report behind every
    * "what's stuck and how much is it worth" standup. Bucket keys are
    * prefixed to sort chronologically. */
  val q275: Q = (spark, dir) => {
    val o = Tables.orders(spark, dir)
      .select(col("o_orderstatus"),
        expr("cast(cast(o_orderdate as timestamp) as long) div 86400")
          .as("day"),
        qdec(col("o_totalprice"), 18, 2).as("p"))
    val asof = broadcast(o.agg(max(col("day")).as("asof")))
    o.filter(col("o_orderstatus") === "O")
      .crossJoin(asof)
      .withColumn("age", col("asof") - col("day"))
      .withColumn("bucket",
        when(col("age") <= 30, "a_0_30d")
          .when(col("age") <= 90, "b_31_90d")
          .when(col("age") <= 365, "c_91_365d")
          .otherwise("d_over_1y"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_orders"),
        decOut(sum(col("p")), 2).as("open_value"))
      .orderBy("bucket")
  }

  /** q276 — customer-revenue Lorenz curve + Gini: revenue share of
    * each ascending-revenue customer decile and the Gini coefficient —
    * the concentration readout on the CUSTOMER axis (q238's HHI is the
    * supplier-market axis, q138's Gini the exposure axis). Deciles use
    * q241's explicit ((rank−1)·10) div N + 1 closed form over the
    * per-customer aggregate; cumulative shares and the Gini
    * G = (2·Σrᵢvᵢ − (N+1)·T)/(N·T) are EXACT integer ppm — the
    * rank-weighted sum rides DECIMAL(38,0)/HUGEINT. The only global
    * window runs over per-customer rows (q241's posture). */
  val q276: Q = (spark, dir) => {
    val c = Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg((sum(qdec(col("o_totalprice"), 18, 2)).cast("decimal(18,2)")
        * 100).cast("decimal(38,0)").as("v"))
      .withColumn("rn", row_number().over(
        Window.orderBy(col("v"), col("o_custkey"))))
      .withColumn("n_total", count(lit(1)).over(Window.partitionBy(lit(1))))
      .withColumn("decile", expr("((rn - 1) * 10) div n_total + 1"))
    val gini = c.agg(
        sum(expr("cast(rn as decimal(38,0)) * v")).cast("decimal(38,0)")
          .as("rv"),
        sum(col("v")).cast("decimal(38,0)").as("t"),
        max(col("n_total")).as("n"))
      .select(expr("cast((2 * (2 * rv - (cast(n as decimal(38,0)) + 1) * t) * 1000000 + cast(n as decimal(38,0)) * t) div (2 * cast(n as decimal(38,0)) * t) as bigint)")
        .as("gini_ppm"))
    val byDec = c.groupBy("decile")
      .agg(count(lit(1)).as("n_customers"),
        sum(col("v")).cast("decimal(38,0)").as("vd"))
    val wCum = Window.orderBy("decile")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byDec
      .withColumn("cum_v", sum(col("vd")).over(wCum).cast("decimal(38,0)"))
      .withColumn("tot_v", sum(col("vd")).over(Window.partitionBy(lit(1)))
        .cast("decimal(38,0)"))
      .crossJoin(broadcast(gini))
      .select(col("decile"), col("n_customers"),
        expr("cast((2 * vd * 1000000 + tot_v) div (2 * tot_v) as bigint)")
          .as("share_ppm"),
        expr("cast((2 * cum_v * 1000000 + tot_v) div (2 * tot_v) as bigint)")
          .as("cum_share_ppm"),
        col("gini_ppm"))
      .orderBy("decile")
  }

  /** q277 — rank-biased overlap (RBO, p = 0.9, depth 20) between the
    * revenue-ranked and quantity-ranked part top-20s: Webber et al.'s
    * top-weighted ranking-agreement measure — the principled answer to
    * "do our two leaderboards agree where it matters" that plain
    * set-overlap (depth-insensitive) and Kendall (whole-list, q264)
    * both miss. The geometric weights p^(d−1) are computed ONCE in
    * Scala and embedded as identical double literals in engine and
    * oracle (a libm `pow` call could differ by an ulp between
    * engines); each depth's term quantizes to a 12 dp decimal before
    * the exact sum (q209), and overlap-at-depth comes from one join of
    * the two 20-row lists (overlap_d = #{max(rank_r, rank_q) ≤ d}). */
  val q277: Q = (spark, dir) => {
    val weights = (1 to 20).map(d => (d.toLong, math.pow(0.9, d - 1)))
    val base = Tables.lineitem(spark, dir)
      .groupBy("l_partkey")
      .agg(sum((qdec(col("l_extendedprice"), 18, 2) * 100)
          .cast("decimal(38,0)")).cast("decimal(38,0)").as("rev"),
        sum(col("l_quantity").cast("long")).as("qty"))
    val topR = base
      .withColumn("rn_r", row_number().over(
        Window.orderBy(col("rev").desc, col("l_partkey"))))
      .filter(col("rn_r") <= 20).select("l_partkey", "rn_r")
    val topQ = base
      .withColumn("rn_q", row_number().over(
        Window.orderBy(col("qty").desc, col("l_partkey"))))
      .filter(col("rn_q") <= 20).select("l_partkey", "rn_q")
    val common = topR.join(topQ, "l_partkey")
      .select(greatest(col("rn_r"), col("rn_q")).as("dmin"))
    val depths = broadcast(spark.createDataFrame(weights)
      .toDF("depth", "w"))
    val byDepth = depths.join(common,
        col("dmin") <= col("depth"), "left")
      .groupBy("depth", "w")
      .agg(sum(when(col("dmin").isNotNull, 1L).otherwise(0L))
        .as("overlap_d"))
      .withColumn("agreement_ppm",
        expr("cast((2 * overlap_d * 1000000 + depth) div (2 * depth) as bigint)"))
      .withColumn("term", qdec(col("w") * col("overlap_d").cast("double") /
        col("depth").cast("double"), 28, 12))
    val rbo = byDepth.agg(
      qround((lit(1.0) - lit(0.9)) *
        sum(col("term")).cast("decimal(38,12)").cast("double"), 6)
        .as("rbo"))
    byDepth.crossJoin(broadcast(rbo))
      .select("depth", "overlap_d", "agreement_ppm", "rbo")
      .orderBy("depth")
  }

  /** q278 — revenue-change contribution waterfall: which nations drove
    * the 1996→1997 move — each market's Δ and its signed share of the
    * total Δ, the WHO decomposition beside q271's price-vs-volume WHY
    * (together they are the complete FP&A revenue bridge). Deltas are
    * exact decimal differences; shares are sign-safe qround quotients
    * (never the div idiom on signed values); ordered by |Δ| so the
    * narrative reads top-down. */
  val q278: Q = (spark, dir) => {
    val per = nationOrders(spark, dir)
      .select(col("n_name").as("nation"),
        expr("year(cast(o_orderdate as date))").as("yr"),
        qdec(col("o_totalprice"), 18, 2).as("p"))
      .filter(col("yr").isin(1996, 1997))
      .groupBy("nation")
      .agg(sum(when(col("yr") === 1996, col("p"))).cast("decimal(18,2)")
          .as("rev_1996"),
        sum(when(col("yr") === 1997, col("p"))).cast("decimal(18,2)")
          .as("rev_1997"))
      .withColumn("delta",
        (col("rev_1997") - col("rev_1996")).cast("decimal(18,2)"))
    val tot = per.agg(sum(col("delta")).cast("decimal(18,2)")
      .as("total_delta"))
    per.crossJoin(broadcast(tot))
      .withColumn("contribution_share", qround(
        col("delta").cast("double") / col("total_delta").cast("double"),
        6))
      .select(col("nation"), decOut(col("rev_1996"), 2).as("rev_1996"),
        decOut(col("rev_1997"), 2).as("rev_1997"),
        decOut(col("delta"), 2).as("delta"), col("contribution_share"))
      .orderBy(abs(col("delta")).desc, col("nation"))
  }

  /** q279 — MASE (mean absolute SCALED error) forecast scoring: the
    * Holt one-step backtest error (q202's convention) scaled by the
    * seasonal-naive baseline |x_t − x_{t−7 obs}| — Hyndman's scale-free
    * forecast metric that makes accuracy comparable ACROSS nations of
    * different revenue magnitude, where q202's MAE can't be compared
    * and its MAPE breaks near zero. MASE < 1 ⇔ the model beats "same
    * as last week". Both error streams quantize to 6 dp decimals
    * before exact sums over the SAME scored rows (t > 7 observations,
    * so numerator and denominator cover identical days); the final
    * ratio is one audited divide. */
  val q279: Q = (spark, dir) => {
    val daily = SharedFrames.dailyNationRevenue(spark, dir)
      .select(col("nation"), col("day"),
        col("rev").cast("double").as("revenue"))
    val h = TimeSeries.holtLinear(daily, "nation", "day", "revenue",
      alpha = 0.3, beta = 0.1)
    val w = Window.partitionBy("nation").orderBy("day")
    val e = h
      .withColumn("pfc", lag(col("forecast"), 1).over(w))
      .withColumn("nv", lag(col("revenue"), 7).over(w))
      .filter(col("pfc").isNotNull && col("nv").isNotNull)
      .withColumn("em",
        qround(abs(col("revenue") - col("pfc")), 6).cast("decimal(18,6)"))
      .withColumn("en",
        qround(abs(col("revenue") - col("nv")), 6).cast("decimal(18,6)"))
    e.groupBy("nation").agg(
        count(lit(1)).as("n_scored"),
        qround(sum(col("em")).cast("double") / count(lit(1)), 6)
          .as("mae_model"),
        qround(sum(col("en")).cast("double") / count(lit(1)), 6)
          .as("mae_naive"),
        qround(sum(col("em")).cast("double") /
          sum(col("en")).cast("double"), 6).as("mase"))
      .orderBy("nation")
  }

  /** q298 — CO-LOCATED bucketed fact⋈fact join: lineitem and orders are
    * persisted bucketed-by-orderkey ([[Tables.bucketedOrderTables]]), so
    * the join plans with ZERO shuffle exchange on either side — the only
    * exchange in the whole query is the final 5-row priority roll-up
    * (PlanShapeSpec pins both facts). This is the layout-amortized
    * answer to the dominant orders⋈lineitem shuffle: at 100 TB the
    * bucket files are the shuffle, written once, reused by every
    * downstream join on the key. Money lands as exact summed cents
    * (BIGINT — hash-stable per the engine's no-decimal-output rule);
    * quantities are integral doubles in the source, summed as longs. */
  val q298: Q = (spark, dir) => {
    val (li, ord) = Tables.bucketedOrderTables(spark, dir)
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_items"),
        sum(floor(col("l_extendedprice") * 100 + lit(0.5))).as("revenue_cents"),
        sum(col("l_quantity").cast("long")).as("total_qty"))
      .orderBy("o_orderpriority")
  }

  /** q299 — DYNAMIC partition pruning over the date-partitioned events
    * fact ([[Tables.eventsDatePartitioned]]): the kept-days dim is only
    * known at RUN time (a filtered distinct-days frame), so no literal
    * IN-list can prune the scan at plan time the way q57's does.
    * Instead Catalyst plants a `dynamicpruning` subquery into the
    * fact scan's PartitionFilters — the broadcast of the dim doubles as
    * the pruning filter (exchange reuse, zero extra jobs), and excluded
    * day directories are never read. At 100 TB, "scan 2/7 of the days"
    * at listing time IS the query budget. Day keys are exact epoch-day
    * integers; the value total rides the scaled-cents exact sum. */
  val q299: Q = (spark, dir) => {
    val fact = Tables.eventsDatePartitioned(spark, dir)
    val dim = Tables.events(spark, dir)
      .select(to_date(timestamp_seconds(expr("ts div 1000000000"))).as("d"))
      .distinct()
      .filter(expr("unix_date(d) % 7 IN (0, 3)"))
    fact.join(broadcast(dim), Seq("d"))
      .withColumn("day", expr("unix_date(d)"))
      .groupBy("day")
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        graft.ops.Relational.centsSumDouble(col("value")).as("total_value"))
      .orderBy("day")
  }

  /** q300 — SCHEMA EVOLUTION read: the corpus lands in two ingest
    * batches whose parquet schemas differ — the older batch predates the
    * `n_chars` column ([[Tables.documentsTwoBatch]]). `mergeSchema`
    * widens at the footer level (driver-side listing pass, no data
    * I/O); old rows surface the missing column as NULL, and the
    * aggregate proves the null semantics survive the merge: per source,
    * legacy-row counts and the non-null character sum must match an
    * oracle that emulates the batch split arithmetically. The
    * evolution-tolerant read is what lets a years-long 100 TB corpus
    * add columns without rewriting history. */
  val q300: Q = (spark, dir) => {
    Tables.documentsTwoBatch(spark, dir)
      .select("doc_id", "source", "n_chars")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        count(col("n_chars")).as("n_with_chars"),
        sum(col("n_chars")).as("chars_sum"),
        sum(when(col("n_chars").isNull, 1L).otherwise(0L)).as("n_legacy"))
      .orderBy("source")
  }

  /** q301 — purged time-series K-fold (de Prado-style): five contiguous
    * equal-width day folds over event time, with a 2-day EMBARGO on each
    * side of the validation block — training samples inside the embargo
    * are purged, killing the look-ahead leakage plain K-fold injects
    * into any autocorrelated stream (q190 AUDITS split leakage after the
    * fact; this prevents it at split time). Fold bounds are exact
    * integer arithmetic on epoch days; the fact side never shuffles —
    * one scan, a 5-row broadcast of bounds, one aggregate. */
  val q301: Q = (spark, dir) => {
    val ev = Tables.events(spark, dir)
      .select(expr("ts div 86400000000000").as("day"))
    val folds = ev
      .agg(min("day").as("d0"), (max("day") - min("day") + 1).as("span"))
      .select(explode(sequence(lit(0L), lit(4L))).as("fold"),
        col("d0"), col("span"))
      .select(col("fold"),
        (col("d0") + expr("(span * fold) div 5")).as("f0"),
        (col("d0") + expr("(span * (fold + 1)) div 5") - 1).as("f1"))
    ev.crossJoin(broadcast(folds))
      .groupBy("fold", "f0", "f1")
      .agg(
        sum(when(col("day").between(col("f0"), col("f1")), 1L)
          .otherwise(0L)).as("n_valid"),
        sum(when(col("day") < col("f0") - 2 || col("day") > col("f1") + 2,
          1L).otherwise(0L)).as("n_train"),
        sum(when(!col("day").between(col("f0"), col("f1")) &&
          col("day") >= col("f0") - 2 && col("day") <= col("f1") + 2,
          1L).otherwise(0L)).as("n_purged"))
      .orderBy("fold")
  }

  /** q302 — weight-of-evidence / information-value encoding of a
    * categorical against a binary outcome (the credit-scoring stalwart
    * next to q141's out-of-fold target encoding): per category,
    * WOE = ln(smoothed bad-share / smoothed good-share) and its IV term.
    * Laplace 0.5 smoothing per cell with m·0.5 added to each total (m =
    * category count, computed not hardcoded) keeps empty cells finite.
    * One grouped aggregate plus a 1-row broadcast of the totals — the
    * encoder table is dictionary-sized whatever the fact volume. */
  val q302: Q = (spark, dir) => {
    val per = Tables.orders(spark, dir)
      .groupBy(col("o_orderpriority").as("category"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L)).as("n_bad"))
    val tot = per.agg(sum("n_bad").as("bad_tot"),
      sum(col("n") - col("n_bad")).as("good_tot"), count(lit(1)).as("m"))
    val pb = (col("n_bad") + 0.5) / (col("bad_tot") + lit(0.5) * col("m"))
    val pg = (col("n") - col("n_bad") + 0.5) /
      (col("good_tot") + lit(0.5) * col("m"))
    per.crossJoin(broadcast(tot))
      .select(col("category"), col("n"), col("n_bad"),
        qround(log(pb / pg), 6).as("woe"),
        qround((pb - pg) * log(pb / pg), 6).as("iv"))
      .orderBy("category")
  }

  /** q303 — stratification-matching ATT estimator (exact subclassification
    * on (nation, 200-unit acctbal bucket)): the causal-inference
    * workhorse when a propensity model is overkill — compare treated
    * (BUILDING-segment) vs control customers WITHIN each stratum, weight
    * the per-stratum outcome gap by treated count, and report how many
    * treated lack any control match (dropped, not silently imputed).
    * Outcome = lifetime spend in exact cents; the per-stratum mean gap is
    * quantized to DECIMAL(28,6) before the cross-stratum sum so the
    * estimator is order-free exact, then projected to DOUBLE dollars via
    * the decOut rule. Strata table is dimension-sized; the only fact
    * shuffle is the per-customer spend roll-up. */
  val q303: Q = (spark, dir) => {
    import graft.functions.GraftFunctions.{decOut, qdec}
    val spend = Tables.orders(spark, dir).groupBy("o_custkey")
      .agg(sum(floor(col("o_totalprice") * 100 + lit(0.5))).as("spend_cents"))
    val y = Tables.customer(spark, dir)
      .join(spend, col("c_custkey") === col("o_custkey"), "left")
      .select(col("c_nationkey"),
        floor(col("c_acctbal") / 200).cast("long").as("bal_bucket"),
        when(col("c_mktsegment") === "BUILDING", 1L).otherwise(0L)
          .as("treated"),
        coalesce(col("spend_cents"), lit(0L)).as("y"))
    val strata = y.groupBy("c_nationkey", "bal_bucket").agg(
      sum(col("treated")).as("n_t"),
      sum(lit(1L) - col("treated")).as("n_c"),
      sum(when(col("treated") === 1L, col("y")).otherwise(0L)).as("sum_t"),
      sum(when(col("treated") === 0L, col("y")).otherwise(0L)).as("sum_c"))
    val tot = y.agg(sum(col("treated")).as("n_treated_total"))
    strata.filter(col("n_t") > 0 && col("n_c") > 0)
      .agg(count(lit(1)).as("n_strata_matched"),
        sum("n_t").as("n_treated_matched"),
        sum(qdec((col("sum_t").cast("double") / col("n_t") -
          col("sum_c").cast("double") / col("n_c")) * col("n_t"), 28, 6))
          .as("wdiff"))
      .crossJoin(broadcast(tot))
      .select(col("n_strata_matched"), col("n_treated_matched"),
        (col("n_treated_total") - col("n_treated_matched"))
          .as("n_treated_dropped"),
        decOut(col("wdiff").cast("double") / col("n_treated_matched")
          / 100.0, 4).as("att_dollars"))
  }

  /** q304 — Benjamini–Hochberg FDR control over a battery of A/B tests
    * (every event type × four value thresholds, the q131 two-proportion
    * z machinery per cell): the multiple-comparisons discipline an
    * experimentation platform needs once it runs METRIC GRIDS rather
    * than one test — Bonferroni kills power, raw α=0.05 floods false
    * positives; BH rejects the largest prefix of p-ascending tests with
    * p₍ᵢ₎ ≤ i·α/m. Two-sided p comes from the Abramowitz–Stegun 7.1.26
    * erf polynomial (|ε| < 1.5e-7, pure exp/arithmetic — expressible
    * IDENTICALLY in both engines, then qround'd). Degenerate cells
    * (zero or saturated pooled conversions) are excluded from m, not
    * fed NaN z-scores. */
  val q304: Q = (spark, dir) => {
    val events = Tables.events(spark, dir)
    val users = events.select("user_id").distinct()
      .withColumn("variant",
        graft.functions.GraftFunctions.abVariant(col("user_id")))
    val umax = events.groupBy("user_id", "event_type")
      .agg(max("value").as("mx"))
    val tests = events.select("event_type").distinct()
      .select(col("event_type"),
        explode(array(Seq(50, 100, 150, 200).map(t => lit(t.toLong)): _*))
          .as("thr"))
    val nTot = users.groupBy("variant").agg(count(lit(1)).as("n"))
      .agg(sum(when(col("variant") === "A", col("n"))).as("n_a"),
        sum(when(col("variant") === "B", col("n"))).as("n_b"))
    val conv = umax.join(broadcast(tests), Seq("event_type"))
      .filter(col("mx") > col("thr"))
      .join(users, Seq("user_id"))
      .groupBy("event_type", "thr")
      .agg(sum(when(col("variant") === "A", 1L).otherwise(0L)).as("conv_a"),
        sum(when(col("variant") === "B", 1L).otherwise(0L)).as("conv_b"))
      .crossJoin(broadcast(nTot))
      .filter(col("conv_a") + col("conv_b") > 0 &&
        col("conv_a") + col("conv_b") < col("n_a") + col("n_b"))
    val pHat = (col("conv_a") + col("conv_b")).cast("double") /
      (col("n_a") + col("n_b"))
    val z = (col("conv_a").cast("double") / col("n_a") -
      col("conv_b").cast("double") / col("n_b")) /
      sqrt(pHat * (lit(1.0) - pHat) *
        (lit(1.0) / col("n_a") + lit(1.0) / col("n_b")))
    // Abramowitz–Stegun 7.1.26: erf(x) ≈ 1 − poly(t)·e^(−x²),
    // t = 1/(1 + 0.3275911x); two-sided p = 1 − erf(|z|/√2).
    val x = abs(col("z")) / lit(math.sqrt(2.0))
    val t = lit(1.0) / (lit(1.0) + lit(0.3275911) * x)
    val poly = ((((lit(1.061405429) * t - lit(1.453152027)) * t +
      lit(1.421413741)) * t - lit(0.284496736)) * t + lit(0.254829592)) * t
    val scored = conv
      .withColumn("z", qround(z, 6))
      .withColumn("p", qround(poly * exp(-x * x), 6))
    val wAll = Window.partitionBy()
    val ranked = scored
      .withColumn("rank", row_number().over(
        wAll.orderBy(col("p"), col("event_type"), col("thr"))))
      .withColumn("m", count(lit(1)).over(wAll))
    ranked
      .withColumn("i_star", max(when(
        col("p") <= col("rank") * lit(0.1) / col("m"), col("rank")))
        .over(wAll))
      .select(col("event_type"), col("thr"), col("z"), col("p"),
        col("rank").cast("long").as("rank"),
        when(col("rank") <= coalesce(col("i_star"), lit(0)), 1L)
          .otherwise(0L).as("rejected"))
      .orderBy("rank")
  }

  /** q305 — per-source data card: the one-pass datasheet a corpus ships
    * with (counts, token volume, language spread + dominant language,
    * exact-duplicate rate, median length) — the governance artifact
    * that decides whether a source enters the training mix at all.
    * Composes the gated conventions: q20's whitespace token count,
    * q78's exact interpolated percentile, argmax-with-min-tiebreak for
    * the top language. Dup rate here is exact DISTINCT text (at 100 TB:
    * the same aggregate over md5 fingerprints — q23's exact-dedup key —
    * with identical semantics on a collision-free digest). */
  val q305: Q = (spark, dir) => {
    val docs = Tables.documents(spark, dir)
    val base = docs.groupBy("source").agg(
      count(lit(1)).as("n_docs"),
      sum(size(split(col("text"), " ")).cast("long")).as("n_tokens"),
      countDistinct(col("lang")).as("n_langs"),
      countDistinct(col("text")).as("n_distinct_texts"),
      qround(expr("percentile(n_chars, 0.5D)"), 6).as("p50_chars"))
    val topLang = docs.groupBy("source", "lang")
      .agg(count(lit(1)).as("cnt"))
      .withColumn("rn", row_number().over(Window.partitionBy("source")
        .orderBy(col("cnt").desc, col("lang"))))
      .filter(col("rn") === 1)
      .select(col("source"), col("lang").as("top_lang"),
        col("cnt").as("top_lang_n"))
    base.join(topLang, Seq("source"))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        col("n_langs"), col("top_lang"),
        qround(col("top_lang_n").cast("double") / col("n_docs"), 6)
          .as("top_lang_share"),
        qround(lit(1.0) - col("n_distinct_texts").cast("double") /
          col("n_docs"), 6).as("dup_pct"),
        col("p50_chars"))
      .orderBy("source")
  }

  /** q306 — k-anonymity / l-diversity audit of a quasi-identifier
    * release: group customers by the QI tuple (nation, segment, 1000-unit
    * acctbal band), measure the k distribution (groups and customers
    * below k=5 are re-identifiable), and l-diversity of a sensitive
    * derived attribute (has a fulfilled order) — a QI group where every
    * member shares the sensitive value leaks it even at large k. The
    * audit is two grouped aggregates over dimension-sized frames; at
    * 100 TB the QI grouping is the only fact shuffle. Shares ride the
    * qround-DOUBLE rule. */
  val q306: Q = (spark, dir) => {
    val sens = Tables.orders(spark, dir)
      .filter(col("o_orderstatus") === "F")
      .select(col("o_custkey").as("c_custkey")).distinct()
      .withColumn("s", lit(1L))
    val qi = Tables.customer(spark, dir)
      .join(sens, Seq("c_custkey"), "left")
      .select(col("c_nationkey"), col("c_mktsegment"),
        floor(col("c_acctbal") / 1000).cast("long").as("bal_band"),
        coalesce(col("s"), lit(0L)).as("sensitive"))
    val groups = qi.groupBy("c_nationkey", "c_mktsegment", "bal_band")
      .agg(count(lit(1)).as("k"),
        countDistinct(col("sensitive")).as("l"))
    groups.agg(
      count(lit(1)).as("n_groups"),
      sum("k").as("n_customers"),
      min("k").as("min_k"),
      sum(when(col("k") < 5, 1L).otherwise(0L)).as("n_groups_lt5"),
      sum(when(col("k") < 5, col("k")).otherwise(0L)).as("n_cust_lt5"),
      sum(when(col("l") === 1, 1L).otherwise(0L)).as("n_groups_l1"),
      sum(when(col("l") === 1, col("k")).otherwise(0L)).as("n_cust_l1"))
      .select(col("n_groups"), col("n_customers"), col("min_k"),
        col("n_groups_lt5"),
        qround(col("n_cust_lt5").cast("double") / col("n_customers"), 6)
          .as("pct_cust_lt5"),
        col("n_groups_l1"),
        qround(col("n_cust_l1").cast("double") / col("n_customers"), 6)
          .as("pct_cust_l1"))
  }

  /** q307 — REPRODUCIBLE SIMULATION of a Laplace-mechanism count
    * release (ε=0.5, sensitivity 1) over per-nation customer counts.
    * NOT a privacy-preserving release: the noise is a deterministic
    * public function of the group key (keyed-md5 → Laplace inverse
    * CDF), so anyone can recompute and subtract it exactly — it
    * provides zero actual differential privacy. Real DP needs secret,
    * non-reproducible randomness; the deterministic draw is kept here
    * deliberately so the mechanism's arithmetic (inverse-CDF transform,
    * per-cell map cost) is oracle-gate-able and layout-independent —
    * swap the PRNG seed source for a secret one to deploy. Same
    * seeded-uniform discipline as every sampling op here (M5). u = (h%2⁵² + 0.5)/2⁵² ∈ (0,1) strictly and
    * EXACT in double (a 63-bit cast rounds; its top values land on 2⁶³
    * → u = 1.0 → ln(0)); x = −b·sgn(u−½)·ln(1−2|u−½|). The
    * branchy sign is written as the SAME two-arm CASE in engine and
    * oracle — no dependence on either engine's sign() conventions. Per
    * released cell the cost is one hash + one log: releasing a trillion
    * cells is a map. */
  val q307: Q = (spark, dir) => {
    val b = 2.0 // 1/ε, ε = 0.5
    val per = Tables.customer(spark, dir)
      .groupBy("c_nationkey").agg(count(lit(1)).as("n"))
    // low 52 bits of the hash: every value is EXACT in double (a full
    // 63-bit cast rounds, and the ~512 top values round UP to 2⁶³,
    // putting u at exactly 1.0 → ln(0) — NULL in Spark, -inf in DuckDB:
    // a latent gate divergence). (h%2⁵² + 0.5) ≤ 2⁵²−0.5 keeps u
    // strictly inside (0,1) with all arithmetic exact.
    val u = (pmod(graft.functions.GraftFunctions.md5_63(
      concat(lit("dp:"), col("c_nationkey"))), lit(4503599627370496L))
      .cast("double") + 0.5) / lit(4503599627370496.0)
    val v = u - 0.5
    val noise = when(v >= 0, lit(-b) * log(lit(1.0) - lit(2.0) * v))
      .otherwise(lit(b) * log(lit(1.0) + lit(2.0) * v))
    per.select(col("c_nationkey"),
      qround(col("n") + noise, 6).as("noisy_n"))
      .orderBy("c_nationkey")
  }

  /** q308 — sample-ratio-mismatch (SRM) detector: the first thing a
    * trustworthy experimentation platform checks before reading ANY
    * metric — per event-type cohort, are the keyed-md5 variant counts
    * consistent with the designed 50/50 split? One-dof chi-square
    * (n_a−n_b)²/(n_a+n_b) against the 3.841 (α=0.05) bar; a flagged
    * cohort means the assignment or logging pipeline is dropping one
    * arm and every downstream test on it is invalid (q131/q304 consume
    * splits this query certifies). Integer until the single division. */
  val q308: Q = (spark, dir) => {
    val events = Tables.events(spark, dir)
    val cohort = events.select("event_type", "user_id").distinct()
      .withColumn("variant",
        graft.functions.GraftFunctions.abVariant(col("user_id")))
    val (chi2, flag) = graft.functions.GraftFunctions.srmColumns(
      col("n_a"), col("n_b"))
    cohort.groupBy("event_type")
      .agg(sum(when(col("variant") === "A", 1L).otherwise(0L)).as("n_a"),
        sum(when(col("variant") === "B", 1L).otherwise(0L)).as("n_b"))
      .select(col("event_type"), col("n_a"), col("n_b"),
        chi2.as("chi2"), flag.as("srm_flag"))
      .orderBy("event_type")
  }

  /** q309 — safety-stock / reorder-point table (the inventory-planning
    * readout next to q270's ABC-XYZ and q236's FIFO valuation): per
    * part, daily-demand mean and std over the table's FULL day range —
    * zero-demand days included via the Σx/Σx² identity against the
    * global day count, no day-scaffold join — then reorder point =
    * 7-day lead-time demand + 1.645·σ·√7 (95 % cycle service). Demand
    * sums stay exact integer cents-of-quantity until the final scalar
    * math; top 100 by demand with a key tiebreak. One fact shuffle on
    * part. */
  val q309: Q = (spark, dir) => {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_partkey"),
        expr("cast(cast(l_shipdate as timestamp) as long) div 86400")
          .as("day"),
        col("l_quantity").cast("long").as("qty"))
    val daily = li.groupBy("l_partkey", "day")
      .agg(sum("qty").as("d"))
    val days = li.agg((max("day") - min("day") + 1).as("n_days"))
    val perPart = daily.groupBy("l_partkey")
      .agg(sum("d").as("sx"), sum(col("d") * col("d")).as("sxx"),
        count(lit(1)).as("n_active_days"))
      .crossJoin(broadcast(days))
    val mean = col("sx").cast("double") / col("n_days")
    val variance = col("sxx").cast("double") / col("n_days") - mean * mean
    perPart.select(col("l_partkey"), col("sx").as("total_qty"),
        col("n_active_days"),
        qround(mean, 6).as("mean_daily"),
        qround(sqrt(variance), 6).as("std_daily"),
        qround(mean * 7.0 + lit(1.645) * sqrt(variance) *
          lit(math.sqrt(7.0)), 6).as("reorder_point"))
      .orderBy(col("total_qty").desc, col("l_partkey")).limit(100)
  }

  /** q310 — inter-arrival exponential fit + one-sample KS distance: per
    * event type, the gaps between consecutive events (event-id
    * tiebreak), the MLE rate 1/mean-gap, and the Kolmogorov–Smirnov
    * distance of the empirical gap distribution from Exp(λ̂) — the
    * burstiness verdict q283's Fano factor summarizes, here as the
    * full distributional test. The rowwise max of both one-sided ECDF
    * terms is tie-permutation-invariant, so the window tiebreak can't
    * leak into the result. Two windows, both partitioned by type —
    * state is one type's events. */
  val q310: Q = (spark, dir) => {
    val w = Window.partitionBy("event_type")
      .orderBy(col("ts"), col("event_id"))
    // gaps stay EXACT integer nanoseconds end-to-end: the per-type total
    // is an order-free long sum, and every double enters per-row only —
    // no cross-row float accumulation to drift between engines.
    val gaps = Tables.events(spark, dir)
      .select(col("event_type"), col("ts"), col("event_id"))
      .withColumn("gap_ns", col("ts") - lag("ts", 1).over(w))
      .filter(col("gap_ns").isNotNull)
    val stats = gaps.groupBy("event_type")
      .agg(count(lit(1)).as("n_gaps"), sum("gap_ns").as("sum_ns"))
    val wg = Window.partitionBy("event_type")
      .orderBy(col("gap_ns"), col("event_id"))
    gaps.join(stats, Seq("event_type"))
      .withColumn("i", row_number().over(wg).cast("double"))
      .withColumn("fexp", lit(1.0) -
        exp(-(col("gap_ns").cast("double") * col("n_gaps") /
          col("sum_ns").cast("double"))))
      .groupBy("event_type", "n_gaps", "sum_ns")
      .agg(max(greatest(
        col("i") / col("n_gaps") - col("fexp"),
        col("fexp") - (col("i") - 1.0) / col("n_gaps"))).as("d"))
      .select(col("event_type"), col("n_gaps"),
        qround(col("sum_ns").cast("double") / col("n_gaps")
          / 1000000000.0, 6).as("mean_gap_s"),
        qround(col("d"), 6).as("ks_d"))
      .orderBy("event_type")
  }

  /** q311 — capture–recapture (Chapman) population estimate: treat the
    * first and second halves of the event-day range as two independent
    * capture occasions and estimate the TOTAL user universe from the
    * overlap — the data-quality trick for sizing an entity space a
    * single source undercounts (Chapman's (n1+1)(n2+1)/(m+1) − 1 is
    * the bias-corrected Lincoln–Petersen). The audit column carries
    * the true distinct count the fixture can compute exactly; at
    * 100 TB that column is the expensive one and the estimate is the
    * cheap early answer. Three distinct-aggregates, no fact self-join. */
  val q311: Q = (spark, dir) => {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), expr("ts div 86400000000000").as("day"))
    val mid = ev.agg(min("day").as("a"), max("day").as("b"))
      .select(expr("(a + b + 1) div 2").as("mid"))
    val marked = ev.crossJoin(broadcast(mid))
      .select(col("user_id"), (col("day") < col("mid")).as("first_half"))
    val agg = marked.groupBy("user_id")
      .agg(max(when(col("first_half"), 1L).otherwise(0L)).as("in1"),
        max(when(!col("first_half"), 1L).otherwise(0L)).as("in2"))
      .agg(sum("in1").as("n1"), sum("in2").as("n2"),
        sum(col("in1") * col("in2")).as("m"),
        count(lit(1)).as("true_n"))
    agg.select(col("n1"), col("n2"), col("m"), col("true_n"),
      qround((col("n1") + 1.0) * (col("n2") + 1.0) / (col("m") + 1.0)
        - 1.0, 6).as("chapman_n"))
  }

  /** q312 — Good–Turing unseen-token mass per source: the hapax share
    * N1/N estimates the probability the NEXT token drawn from the
    * source is one never seen — the vocabulary-coverage number that
    * tells a tokenizer/mixture planner how open-ended each source still
    * is (q224's Heaps curve gives the growth law; this gives the
    * instantaneous mass). Exact integer token counts throughout; one
    * explode + two grouped aggregates, shuffled on (source, token). */
  val q312: Q = (spark, dir) => {
    val toks = Tables.documents(spark, dir)
      .select(col("source"), explode(split(col("text"), " ")).as("tok"))
    val counts = toks.groupBy("source", "tok").agg(count(lit(1)).as("c"))
    counts.groupBy("source")
      .agg(sum("c").as("n_tokens"), count(lit(1)).as("vocab"),
        sum(when(col("c") === 1, 1L).otherwise(0L)).as("hapax"))
      .select(col("source"), col("n_tokens"), col("vocab"), col("hapax"),
        qround(col("hapax").cast("double") / col("n_tokens"), 6)
          .as("unseen_mass"))
      .orderBy("source")
  }

  /** q313 — XmR (individuals + moving range) control chart over daily
    * revenue: the Shewhart chart q197's CUSUM complements — CUSUM finds
    * small sustained shifts, XmR flags single out-of-control days
    * against limits estimated from SHORT-RUN noise (σ̂ = MR̄/1.128, the
    * 3σ limits x̄ ± 2.66·MR̄). Daily totals and the moving-range sum are
    * exact cents longs (order-free); the limits enter double once, per
    * the output rule. Emits the chart summary + violation count —
    * per-day flags are a filter away from the same frame. */
  val q313: Q = (spark, dir) => {
    // localCheckpoint: the violations pass and the limit frame both read
    // the days-sized daily aggregate — ONE fact scan total
    val daily = Tables.lineitem(spark, dir)
      .groupBy(expr("cast(cast(l_shipdate as timestamp) as long) div 86400")
        .as("day"))
      .agg(sum(floor(col("l_extendedprice") * 100 + lit(0.5)))
        .as("cents"))
      .localCheckpoint()
    val wd = Window.orderBy("day")
    val mr = daily
      .withColumn("mr", abs(col("cents") - lag("cents", 1).over(wd)))
    val s = mr.agg(count(lit(1)).as("n_days"),
      sum("cents").as("sum_cents"),
      sum("mr").as("sum_mr"),
      (count(lit(1)) - 1).as("n_mr"))
    val xbar = col("sum_cents").cast("double") / col("n_days") / 100.0
    val mrbar = col("sum_mr").cast("double") / col("n_mr") / 100.0
    val lim = s.select(col("n_days"), xbar.as("xbar"), mrbar.as("mrbar"),
      (xbar + lit(2.66) * mrbar).as("ucl"),
      (xbar - lit(2.66) * mrbar).as("lcl"))
    // violations aggregate WITHOUT a group key, then rejoin the one-row
    // limit frame: grouping by the limit columns returned ZERO rows on an
    // empty lineitem where DuckDB's scalar aggregate emits the (0, NULL…)
    // summary row (fuzz gate, empty_all class) — an ungrouped agg is
    // 1-row on empty input in both engines
    val viol = daily.crossJoin(broadcast(lim))
      .agg(sum(when(col("cents").cast("double") / 100.0 > col("ucl") ||
        col("cents").cast("double") / 100.0 < col("lcl"), 1L)
        .otherwise(0L)).as("n_violations"))
    lim.crossJoin(broadcast(viol))
      .select(col("n_days"),
        qround(col("xbar"), 6).as("xbar_dollars"),
        qround(col("mrbar"), 6).as("mrbar_dollars"),
        qround(col("ucl"), 6).as("ucl"),
        qround(col("lcl"), 6).as("lcl"),
        col("n_violations"))
  }

  /** q314 — sequence-packing fragmentation sweep: for token budgets
    * {64, 128, 256}, how many documents does q85's contiguous-stream
    * packer SPLIT across bin boundaries, and how much tail capacity is
    * wasted, per (source, lang) stream rolled up to the budget level —
    * the curve a training-data owner reads to pick a context budget
    * (bigger bins fragment fewer docs but waste more tail). The cumsum
    * runs ONCE per stream (q85's window, partitioned by the group key =
    * the parallelism unit); the 3-budget sweep is a broadcast explode
    * over the same cum frame, integer arithmetic end-to-end except the
    * two output rates. */
  val q314: Q = (spark, dir) => {
    val w = Window.partitionBy("source", "lang").orderBy("doc_id")
    val cum = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("lang"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .withColumn("cum", sum("n_tokens").over(w))
      .withColumn("off", col("cum") - col("n_tokens"))
    val sweep = cum.crossJoin(broadcast(spark.range(1).select(
      explode(array(lit(64L), lit(128L), lit(256L))).as("budget"))))
    val perStream = sweep.groupBy("budget", "source", "lang")
      .agg(count(lit(1)).as("docs"),
        sum("n_tokens").as("toks"),
        sum(when(expr("off div budget") =!= expr("(cum - 1) div budget"),
          1L).otherwise(0L)).as("frag"),
        (expr("(max(cum) - 1) div budget") + 1).as("bins"))
    perStream.groupBy("budget")
      .agg(sum("docs").as("n_docs"), sum("toks").as("n_tokens"),
        sum("frag").as("n_fragmented"), sum("bins").as("n_bins"))
      .select(col("budget"), col("n_docs"), col("n_tokens"),
        col("n_fragmented"), col("n_bins"),
        qround(col("n_fragmented").cast("double") / col("n_docs"), 6)
          .as("frag_rate"),
        qround(lit(1.0) - col("n_tokens").cast("double") /
          (col("n_bins") * col("budget")), 6).as("waste_rate"))
      .orderBy("budget")
  }

  /** q316 — Bayesian-average item ranking (the IMDb top-250 formula):
    * shrink each item's mean rating toward the global mean with prior
    * weight m=50 pseudo-votes — score = (Σr + m·C)/(v + m) — so a
    * 5.0-mean item with three votes can't outrank a well-attested 4.6
    * (q228's Wilson bound is the binomial sibling; this is the
    * continuous-rating one). Rating sums are exact cents; the global
    * mean enters once per row as the same IEEE expression in both
    * engines. Top-50 with id tiebreak. */
  val q316: Q = (spark, dir) => {
    val per = Tables.ratings(spark, dir)
      .filter(col("item_id").isNotNull)
      .select(col("item_id"),
        floor(col("rating") * 100 + lit(0.5)).as("cents"))
      .groupBy("item_id")
      .agg(count(lit(1)).as("v"), sum("cents").as("s"))
    val g = per.agg(sum("s").as("ts"), sum("v").as("tv"))
    per.crossJoin(broadcast(g))
      .select(col("item_id"), col("v"),
        qround(col("s").cast("double") / col("v") / 100.0, 6)
          .as("mean_rating"),
        qround((col("s") + lit(50.0) *
          (col("ts").cast("double") / col("tv"))) /
          (col("v") + lit(50.0)) / 100.0, 6).as("bayes_score"))
      .orderBy(col("bayes_score").desc, col("item_id")).limit(50)
  }

  /** q317 — ordered string aggregation (LISTAGG): per nation, its
    * market segments concatenated in descending-revenue order — the
    * classic report-formatting aggregate the surface lacked. Spark has
    * no ordered string_agg; the deterministic form is
    * sort_array(collect_list(struct(sortKey, val))) → transform →
    * array_join, which distributes as a regular aggregate (each
    * nation's segment list is dictionary-sized). Revenue is exact
    * summed cents; the order key is (revenue DESC, segment ASC) in
    * both engines. */
  val q317: Q = (spark, dir) => {
    val per = Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir),
        col("c_custkey") === col("o_custkey"))
      .groupBy("c_nationkey", "c_mktsegment")
      .agg(sum(floor(col("o_totalprice") * 100 + lit(0.5)))
        .as("rev_cents"))
    per.groupBy("c_nationkey")
      .agg(count(lit(1)).as("n_segments"),
        sum("rev_cents").as("nation_cents"),
        array_join(transform(
          sort_array(collect_list(struct(
            (-col("rev_cents")).as("neg"), col("c_mktsegment").as("seg")))),
          s => s.getField("seg")), ",").as("segments_by_revenue"))
      .orderBy("c_nationkey")
  }

  /** q318 — information-gain feature ranking: IG(X) = H(Y) − H(Y|X) in
    * nats for each candidate categorical (order priority, customer
    * segment, customer nation) against the Y = order-failed label — the
    * split-quality number behind every tree/feature-selection pass
    * (q168's stump picks ONE split by error; this ranks FEATURES by
    * expected entropy drop; q302's WOE is the per-category view). The
    * melt is three conditional projections of one joined frame; all
    * entropy terms are per-row doubles from exact integer counts,
    * quantized to DECIMAL(28,9) before the order-free cross-value sum. */
  val q318: Q = (spark, dir) => {
    import graft.functions.GraftFunctions.decOut
    val base = Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir),
        col("o_custkey") === col("c_custkey"))
      .select(when(col("o_orderstatus") === "F", 1L).otherwise(0L).as("y"),
        col("o_orderpriority"), col("c_mktsegment"),
        col("c_nationkey").cast("string").as("nation"))
    val melted = Seq(
      ("priority", col("o_orderpriority")),
      ("segment", col("c_mktsegment")),
      ("nation", col("nation"))).map { case (f, c) =>
        base.select(lit(f).as("feature"), c.as("v"), col("y"))
      }.reduce(_ unionByName _)
    val cells = melted.groupBy("feature", "v")
      .agg(count(lit(1)).as("n_x"), sum("y").as("n_x1"))
    val tot = cells.filter(col("feature") === "priority")
      .agg(sum("n_x").as("n"), sum("n_x1").as("n1"))
    def hOf(p: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      when(p > 0 && p < 1,
        -(p * log(p) + (lit(1.0) - p) * log(lit(1.0) - p)))
        .otherwise(lit(0.0))
    val withH = cells.crossJoin(broadcast(tot))
      .withColumn("term", graft.functions.GraftFunctions.qdec(
        (col("n_x").cast("double") / col("n")) *
          hOf(col("n_x1").cast("double") / col("n_x")), 28, 9))
    withH.groupBy("feature")
      .agg(count(lit(1)).as("n_values"),
        sum("term").as("hcond"),
        max(hOf(col("n1").cast("double") / col("n"))).as("hy"))
      .select(col("feature"), col("n_values"),
        decOut(col("hy"), 6).as("h_y_nats"),
        decOut(col("hy") - col("hcond").cast("double"), 6).as("info_gain"))
      .orderBy("feature")
  }

  /** q319 — Kruskal–Wallis k-sample rank test (does `value` differ in
    * LOCATION across event types?): the k-group extension of q214's
    * Mann–Whitney. Distributed rank assignment without a global row
    * sort: distinct values get average ranks from the value-level ECDF
    * — 2·avgrank(v) = 2·F(v) + c(v) + 1 is exact INTEGER — so group
    * rank sums are exact BIGINT halves of that, whatever the partition
    * order; per-group H terms and the tie correction enter double once
    * per group/value from exact ints. H' = H / (1 − Σ(t³−t)/(N³−N)),
    * flagged at the χ²₀.₀₅ bar for dof = k−1 (pinned 9.488 for this
    * fixture's 5 types, asserted against dof). */
  val q319: Q = (spark, dir) => {
    import graft.functions.GraftFunctions.{decOut, qdecWide}
    val vals = Tables.events(spark, dir)
      .groupBy("event_type", "value").agg(count(lit(1)).as("c_gv"))
    val perVal = vals.groupBy("value").agg(sum("c_gv").as("c_v"))
      .withColumn("f_below",
        coalesce(sum("c_v").over(Window.orderBy("value")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val joined = vals.join(perVal, Seq("value"))
      .withColumn("rank2", lit(2L) * col("f_below") + col("c_v") + 1L)
    val groups = joined.groupBy("event_type")
      .agg(sum("c_gv").as("n_g"),
        sum(col("c_gv") * col("rank2")).as("r2_g"))
    val ties = perVal.agg(
      sum("c_v").as("n"),
      sum(col("c_v") * col("c_v") * col("c_v") - col("c_v")).as("tie3"))
    // qdecWide, NOT qdec (sf0.1 gate, r13 — the q336/q338 saturation
    // class): a group's (r2_g/2)²/n_g ≈ n_g·meanRank² ≈ 2×10¹⁷ at
    // sf0.1's ~10⁶ events, far past qdec's floor(double)→LONG ceiling
    // (~9.2×10¹²) — the saturated sum drove H to −244663 while the
    // oracle's double floor stayed exact. The fmod-based wide quantizer
    // is magnitude-safe and IEEE-identical cross-engine; the oracle
    // interpolates the SAME qdecWideSql below.
    val terms = groups.crossJoin(broadcast(ties))
      .withColumn("term", qdecWide(
        (col("r2_g").cast("double") / 2.0) *
          (col("r2_g").cast("double") / 2.0) / col("n_g"), 28, 6))
    terms.groupBy("n", "tie3")
      .agg(count(lit(1)).as("k"), sum("term").as("sum_terms"))
      .select(col("k"), col("n"),
        decOut((lit(12.0) / (col("n").cast("double") * (col("n") + 1))) *
          col("sum_terms").cast("double") -
          lit(3.0) * (col("n") + 1), 6).as("h"),
        decOut(((lit(12.0) / (col("n").cast("double") * (col("n") + 1))) *
          col("sum_terms").cast("double") -
          lit(3.0) * (col("n") + 1)) /
          (lit(1.0) - col("tie3").cast("double") /
            (col("n").cast("double") * col("n") * col("n") - col("n"))),
          6).as("h_tie_corrected"),
        (col("k") - 1).as("dof"),
        when(col("k") - 1 === 4 &&
          ((lit(12.0) / (col("n").cast("double") * (col("n") + 1))) *
            col("sum_terms").cast("double") -
            lit(3.0) * (col("n") + 1)) /
            (lit(1.0) - col("tie3").cast("double") /
              (col("n").cast("double") * col("n") * col("n") - col("n")))
            > 9.488, 1L).otherwise(0L).as("significant"))
  }

  /** q320 — classical seasonal decomposition of daily revenue (the EDA
    * readout BEFORE any model: trend = centered 7-day moving average,
    * seasonal index per day-of-week = mean detrended ratio, residual
    * spread per dow): q156 reads raw dow means and q243's Holt–Winters
    * FITS a model — this is the model-free decomposition between them.
    * Daily totals exact cents; the MA is a ratio of exact window sums;
    * detrended ratios are per-row doubles quantized to DECIMAL(28,9)
    * before the per-dow mean. One day-ordered window over the
    * days-sized frame (q313's shape). */
  val q320: Q = (spark, dir) => {
    import graft.functions.GraftFunctions.{decOut, qdec}
    val daily = Tables.lineitem(spark, dir)
      .groupBy(expr("cast(cast(l_shipdate as timestamp) as long) div 86400")
        .as("day"))
      .agg(sum(floor(col("l_extendedprice") * 100 + lit(0.5))).as("cents"))
    val w = Window.orderBy("day").rowsBetween(-3, 3)
    val det = daily
      .withColumn("ma_sum", sum("cents").over(w))
      .withColumn("ma_n", count(lit(1)).over(w))
      // only full 7-day windows define the trend (edges drop, the
      // classical convention)
      .filter(col("ma_n") === 7)
      .withColumn("ratio", qdec(col("cents").cast("double") /
        (col("ma_sum").cast("double") / 7.0), 28, 9))
      .withColumn("dow", pmod(col("day") + 4, lit(7L))) // epoch day 0 = Thu
    det.groupBy("dow")
      .agg(count(lit(1)).as("n_days"),
        sum("ratio").as("rsum"),
        min("ratio").as("rmin"), max("ratio").as("rmax"))
      .select(col("dow"), col("n_days"),
        decOut(col("rsum").cast("double") / col("n_days"), 6)
          .as("seasonal_index"),
        decOut(col("rmax").cast("double") - col("rmin").cast("double"), 6)
          .as("ratio_range"))
      .orderBy("dow")
  }

  /** q321 — Theil-T inequality with between/within decomposition:
    * customer spend concentration as T = Σ sᵢ·ln(sᵢ·N) (sᵢ = spend
    * share), split EXACTLY into between-nation + within-nation parts —
    * the additive decomposability Gini (q276) famously lacks, and the
    * number that says WHERE the concentration lives. Zero-spend
    * customers contribute 0 (lim x·ln x = 0). Shares are per-row
    * doubles from exact cents totals, DECIMAL(28,9)-quantized before
    * every cross-row sum; between-term from the nations-sized frame. */
  val q321: Q = (spark, dir) => {
    import graft.functions.GraftFunctions.{decOut, qdec}
    val y = Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir)
        .groupBy("o_custkey")
        .agg(sum(floor(col("o_totalprice") * 100 + lit(0.5)))
          .as("spend_cents")),
        col("c_custkey") === col("o_custkey"), "left")
      .select(col("c_nationkey"),
        coalesce(col("spend_cents"), lit(0L)).as("cents"))
    val tot = y.agg(sum("cents").as("tc"), count(lit(1)).as("nc"))
    val withTot = y.crossJoin(broadcast(tot))
    val share = col("cents").cast("double") / col("tc")
    val total = withTot
      .select(qdec(when(col("cents") > 0,
        share * log(share * col("nc"))).otherwise(lit(0.0)), 28, 9)
        .as("t"))
      .agg(sum("t").as("t_total"))
    val nation = y.groupBy("c_nationkey")
      .agg(sum("cents").as("gc"), count(lit(1)).as("gn"))
      .crossJoin(broadcast(tot))
    val gshare = col("gc").cast("double") / col("tc")
    val between = nation
      .select(qdec(when(col("gc") > 0,
        gshare * log(gshare * (col("nc").cast("double") / col("gn"))))
        .otherwise(lit(0.0)), 28, 9).as("b"))
      .agg(sum("b").as("t_between"))
    total.crossJoin(between)
      .select(decOut(col("t_total"), 6).as("theil_total"),
        decOut(col("t_between"), 6).as("theil_between"),
        decOut(col("t_total").cast("double") -
          col("t_between").cast("double"), 6).as("theil_within"))
  }

  /** q322 — covariate-balance audit for the q303 matching estimator:
    * standardized mean difference (SMD) of each pre-treatment covariate
    * (account balance, order count, lifetime spend) between treated and
    * control, RAW and AFTER the q303 stratification (weights = matched
    * treated stratum shares) — the diagnostic that says whether
    * "matched" means comparable (|SMD| < 0.1 is the conventional bar).
    * Both rows divide by the same unadjusted pooled SD, the standard
    * convention. Moment sums are exact: Σx in cents longs, Σx² through
    * DECIMAL(19,0)² → DECIMAL(38,0) (spend² row products outgrow BIGINT
    * at scale); per-stratum terms quantize before the cross-stratum
    * weighted sum. */
  val q322: Q = (spark, dir) => {
    import graft.functions.GraftFunctions.qdec
    val spend = Tables.orders(spark, dir).groupBy("o_custkey")
      .agg(sum(floor(col("o_totalprice") * 100 + lit(0.5)))
        .as("spend_cents"),
        count(lit(1)).as("n_orders"))
    val base = Tables.customer(spark, dir)
      .join(spend, col("c_custkey") === col("o_custkey"), "left")
      .select(col("c_nationkey"),
        floor(col("c_acctbal") / 200).cast("long").as("bal_bucket"),
        when(col("c_mktsegment") === "BUILDING", 1L).otherwise(0L)
          .as("treated"),
        floor(col("c_acctbal") * 100 + lit(0.5)).as("x_acctbal"),
        coalesce(col("n_orders"), lit(0L)).as("x_orders"),
        coalesce(col("spend_cents"), lit(0L)).as("x_spend"))
    val melted = Seq("x_acctbal", "x_orders", "x_spend").map { c =>
      base.select(lit(c).as("cov"), col("c_nationkey"), col("bal_bucket"),
        col("treated"), col(c).as("x"))
    }.reduce(_ unionByName _)
    val x2 = col("x").cast("decimal(19,0)") * col("x").cast("decimal(19,0)")
    val glob = melted.groupBy("cov").agg(
      sum(col("treated")).as("n_t"),
      sum(lit(1L) - col("treated")).as("n_c"),
      sum(when(col("treated") === 1, col("x")).otherwise(0L)).as("s_t"),
      sum(when(col("treated") === 0, col("x")).otherwise(0L)).as("s_c"),
      sum(when(col("treated") === 1, x2)
        .otherwise(lit(0).cast("decimal(38,0)"))).as("ss_t"),
      sum(when(col("treated") === 0, x2)
        .otherwise(lit(0).cast("decimal(38,0)"))).as("ss_c"))
    val strat = melted.groupBy("cov", "c_nationkey", "bal_bucket").agg(
      sum(col("treated")).as("st_nt"),
      sum(lit(1L) - col("treated")).as("st_nc"),
      sum(when(col("treated") === 1, col("x")).otherwise(0L)).as("st_st"),
      sum(when(col("treated") === 0, col("x")).otherwise(0L)).as("st_sc"))
      .filter(col("st_nt") > 0 && col("st_nc") > 0)
    val adj = strat.withColumn("term", qdec(
      (col("st_st").cast("double") / col("st_nt") -
        col("st_sc").cast("double") / col("st_nc")) * col("st_nt"), 28, 6))
      .groupBy("cov")
      .agg(sum("term").as("wdiff"), sum("st_nt").as("ntm"))
    val meanT = col("s_t").cast("double") / col("n_t")
    val meanC = col("s_c").cast("double") / col("n_c")
    val sdPool = sqrt(
      ((col("ss_t").cast("double") / col("n_t") - meanT * meanT) +
        (col("ss_c").cast("double") / col("n_c") - meanC * meanC)) / 2.0)
    val smdRaw = (meanT - meanC) / sdPool
    val smdAdj = (col("wdiff").cast("double") / col("ntm")) / sdPool
    glob.join(adj, Seq("cov"))
      .select(col("cov"), col("n_t"), col("n_c"),
        qround(smdRaw, 6).as("smd_raw"),
        qround(smdAdj, 6).as("smd_adjusted"),
        when(abs(smdAdj) < 0.1, 1L).otherwise(0L).as("balanced_adj"))
      .orderBy("cov")
  }

  /** q342 — Markov row entropy over q122's transition matrix: per
    * prev_type, the Shannon entropy (nats) and perplexity of the
    * next-type distribution — which states are predictable funnels
    * (entropy ≈ 0) vs branch points (perplexity ≈ |types|) — plus the
    * global conditional entropy H(next|prev), the one-number
    * predictability of the whole journey graph. Per-cell and per-row
    * terms quantize to DECIMAL(28,9) before every order-free sum (the
    * q318 entropy convention); the matrix is |types|²-bounded, so all
    * windows and the final rollup run on a dimension-sized frame after
    * ONE user_id exchange manufactures the lag pairs. */
  val q342: Q = (spark, dir) => {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val cells = Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("event_type").as("next_type"))
      .agg(count(lit(1)).as("c"))
    val rows = cells
      .withColumn("rt", sum(col("c")).over(Window.partitionBy("prev_type")))
      .withColumn("term", qdec(
        -(col("c").cast("double") / col("rt")) *
          log(col("c").cast("double") / col("rt")), 28, 9))
      .groupBy(col("prev_type"), col("rt"))
      .agg(count(lit(1)).as("n_next_types"), sum(col("term")).as("h"))
    val tot = rows.agg(sum(col("rt")).as("nn"))
    val withCond = rows.crossJoin(broadcast(tot))
      .withColumn("cterm", qdec(
        (col("rt").cast("double") / col("nn")) * col("h").cast("double"),
        28, 9))
    val cond = withCond.agg(sum(col("cterm")).as("hc"))
    withCond.crossJoin(broadcast(cond))
      .select(col("prev_type"), col("rt").as("n_transitions"),
        col("n_next_types"),
        decOut(col("h"), 6).as("entropy_nats"),
        qround(exp(col("h").cast("double")), 6).as("perplexity"),
        decOut(col("hc"), 6).as("cond_entropy_nats"))
      .orderBy("prev_type")
  }

  /** q352 — Croston intermittent-demand forecast per part
    * ([[graft.ops.TimeSeries.croston]], α = 0.2 — q127's constant):
    * daily shipped quantity is mostly ZERO per part, exactly the regime
    * where dense-series smoothers average themselves useless; Croston
    * tracks demand size and inter-demand interval separately and
    * forecasts z/p units per day. Demand days reduce from one lineitem
    * scan (map-side partials, day = integer epoch-day of ship date);
    * the sequential fold is per-key (the q127 typed-iterator shape,
    * group size ≤ calendar span). Parts with ≥ 5 demand days, top-50 by
    * forecast with id tiebreak. */
  val q352: Q = (spark, dir) => {
    val demand = Tables.lineitem(spark, dir)
      .select(col("l_partkey"),
        expr("cast(cast(l_shipdate as timestamp) as long) div 86400")
          .as("day"),
        floor(col("l_quantity") + lit(0.5)).as("qty"))
      .groupBy("l_partkey", "day")
      .agg(sum(col("qty")).as("demand"))
    TimeSeries.croston(demand, "l_partkey", "day", "demand", alpha = 0.2)
      .filter(col("n_demand_days") >= 5)
      .select(col("l_partkey").cast("long").as("part_key"),
        col("n_demand_days"), col("last_day"),
        qround(col("z"), 6).as("demand_ewma"),
        qround(col("p"), 6).as("interval_ewma"),
        qround(col("z") / col("p"), 6).as("forecast_per_day"))
      .orderBy(desc("forecast_per_day"), col("part_key"))
      .limit(50)
  }

  /** q353 — FIRST-VIEW-ANCHORED time-boxed strict-order funnel (beside
    * q90's unbounded one): view → click → purchase must complete within
    * ONE HOUR of each user's FIRST view, each stage strictly after the
    * previous. NOT ClickHouse `windowFunnel` (ADVICE r10): windowFunnel
    * slides the anchor over ALL candidate first-stage events, so a user
    * whose first view stalls but whose later view converts within the
    * hour counts there and not here — the fixed anchor is the cheaper
    * single-aggregate semantics and is what both engine and oracle
    * compute; [[q375]] is the sliding-anchor sibling with the
    * windowFunnel semantics (VERDICT r11 #5). Report per stage: users
    * reaching it, reach share of all
    * users, and step conversion from the previous stage — all exact
    * integer ppm. Each stage is one aggregate-join-aggregate on user_id
    * (the q90 plan with a deadline predicate); the report is a 3-row
    * union of scalars. */
  val q353: Q = (spark, dir) => {
    val win = 3600L * 1000000000L
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), col("ts"))
    val entry = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min(col("ts")).as("t0"))
    val s1 = ev.filter(col("event_type") === "click")
      .join(entry, "user_id")
      .filter(col("ts") > col("t0") && col("ts") <= col("t0") + win)
      .groupBy("user_id", "t0").agg(min(col("ts")).as("t1"))
    val s2 = ev.filter(col("event_type") === "purchase")
      .join(s1, "user_id")
      .filter(col("ts") > col("t1") && col("ts") <= col("t0") + win)
      .groupBy("user_id").agg(min(col("ts")).as("t2"))
    val tot = ev.select("user_id").distinct()
      .agg(count(lit(1)).as("n_all_users"))
    val counts = Seq(
      ("1_view", entry), ("2_click", s1), ("3_purchase", s2))
      .map { case (name, df) =>
        df.agg(count(lit(1)).as("n_reached"))
          .select(lit(name).as("stage"), col("n_reached"))
      }.reduce(_ unionByName _)
    val w = Window.orderBy("stage")
      .rowsBetween(Window.unboundedPreceding, -1)
    counts.crossJoin(broadcast(tot))
      .withColumn("prev",
        coalesce(last(col("n_reached")).over(w), col("n_all_users")))
      .select(col("stage"), col("n_reached"), col("n_all_users"),
        // ADVICE r12 #2: the n_all_users divisor gets the same zero guard
        // as prev — an empty events fixture must yield NULL ppm on both
        // engine and oracle, not an engine-NULL-vs-oracle-error asymmetry.
        expr("cast(if(n_all_users = 0, null, " +
          "(2 * n_reached * 1000000 + n_all_users) div (2 * n_all_users)) " +
          "as bigint)")
          .as("reach_ppm"),
        // A dead stage (prev = 0) makes step conversion undefined — NULL,
        // not a divide-by-zero crash (surfaced by q375's fixture spec).
        expr("cast(if(prev = 0, null, " +
          "(2 * n_reached * 1000000 + prev) div (2 * prev)) as bigint)")
          .as("step_ppm"))
      .orderBy("stage")
  }

  /** q375 — SLIDING-ANCHOR time-boxed strict-order funnel (VERDICT r11
    * #5): the public ClickHouse `windowFunnel` semantics (strict-increase
    * mode) that q353's fixed first-view anchor deliberately is not — the
    * anchor slides over ALL candidate view events, so a user whose first
    * view stalls but whose LATER view converts within the hour counts
    * here. Per user the reported level is the maximum over anchors of
    * the stages completed strictly-after-in-time within one hour of that
    * anchor.
    *
    * Greedy is optimal (taking the EARLIEST eligible next-stage event
    * maximizes remaining slack), so each anchor needs only two as-of
    * lookups — never a per-anchor scan: ONE per-user RANGE window pass
    * marks every event with the next click / next purchase strictly
    * after it (linear, one shuffle on user_id — no view×click self-join,
    * so a 10⁶-event bot user costs 10⁶ window rows, not 10¹² join
    * pairs), and one exact-key join fetches the purchase lookup at the
    * chosen click instant. Strictly-after is ts-strict (same-instant
    * events never chain), matching q353's `ts > t0` convention, which
    * also makes the next-purchase lookup a pure function of the instant
    * — identical for every click row sharing a timestamp, so the
    * distinct() on (user, ct, nxp) is sound. Report shape = q353's
    * 3-row stage table (reach/step exact integer ppm), directly
    * comparable side-by-side: the sliding anchor can only raise each
    * stage's count. */
  val q375: Q = (spark, dir) => {
    val win = 3600L * 1000000000L
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), col("ts"))
    val after = Window.partitionBy("user_id").orderBy(col("ts"))
      .rangeBetween(1L, Window.unboundedFollowing)
    val marked = ev
      .withColumn("nxc",
        min(when(col("event_type") === "click", col("ts"))).over(after))
      .withColumn("nxp",
        min(when(col("event_type") === "purchase", col("ts"))).over(after))
    val anchors = marked.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts").as("vt"), col("nxc"))
    val clickNp = marked.filter(col("event_type") === "click")
      .select(col("user_id").as("u2"), col("ts").as("ct"), col("nxp"))
      .distinct()
    val byUser = anchors
      .join(clickNp, col("user_id") === col("u2") && col("nxc") === col("ct"),
        "left")
      .withColumn("lvl",
        when(col("nxc").isNotNull && col("nxc") <= col("vt") + win &&
          col("nxp").isNotNull && col("nxp") <= col("vt") + win, 3L)
          .when(col("nxc").isNotNull && col("nxc") <= col("vt") + win, 2L)
          .otherwise(1L))
      .groupBy("user_id").agg(max(col("lvl")).as("lvl"))
    val agg = byUser.agg(count(lit(1)).as("n1"),
      sum(when(col("lvl") >= 2, 1L).otherwise(0L)).as("n2"),
      sum(when(col("lvl") === 3, 1L).otherwise(0L)).as("n3"))
    val tot = ev.select("user_id").distinct()
      .agg(count(lit(1)).as("n_all_users"))
    // stack, not a 3-way union: union branches don't share work, so the
    // whole window+join subtree would run once per stage row — stack
    // unpivots the ONE aggregated row into the 3-row report.
    agg.crossJoin(broadcast(tot))
      .select(col("n_all_users"), expr(
        "stack(3, '1_view', n1, n_all_users, '2_click', n2, n1, " +
          "'3_purchase', n3, n2)").as(Seq("stage", "n_reached", "prev")))
      .select(col("stage"), col("n_reached"), col("n_all_users"),
        // ADVICE r12 #2: the n_all_users divisor gets the same zero guard
        // as prev — an empty events fixture must yield NULL ppm on both
        // engine and oracle, not an engine-NULL-vs-oracle-error asymmetry.
        expr("cast(if(n_all_users = 0, null, " +
          "(2 * n_reached * 1000000 + n_all_users) div (2 * n_all_users)) " +
          "as bigint)")
          .as("reach_ppm"),
        // dead previous stage → step conversion undefined, NULL (q353's
        // guard, same rationale)
        expr("cast(if(prev = 0, null, " +
          "(2 * n_reached * 1000000 + prev) div (2 * prev)) as bigint)")
          .as("step_ppm"))
      .orderBy("stage")
  }

  /** q354 — event study with placebo inference: the 7-day mean daily
    * revenue AFTER the event day minus the 7 days BEFORE, compared
    * against the SAME statistic at every other day of the calendar —
    * the permutation-style placebo
    * distribution that turns a before/after delta into a p-value
    * without any normality assumption (the q222 DiD's single-series
    * sibling). Daily revenue is one fact aggregate (calendar-bounded);
    * both rolling sums ride ONE ordered frame over that bounded series;
    * effects stay exact cents (integer sums × small multipliers) so the
    * placebo comparison |14·Δ| is pure BIGINT — no float until the
    * final readout divides. */
  val q354: Q = (spark, dir) => {
    val daily = Tables.orders(spark, dir)
      .select(expr("cast(cast(o_orderdate as timestamp) as long) div 86400")
        .as("day"),
        floor(col("o_totalprice") * 100.0 + lit(0.5)).as("cents"))
      .groupBy("day").agg(sum(col("cents")).as("rev"))
    // The daily frame is calendar-bounded (~2500 rows at ANY SF), so the
    // unpartitioned ordered window is safe — the q124 argument.
    val wPost = Window.orderBy("day").rowsBetween(0, 6)
    val wPre = Window.orderBy("day").rowsBetween(-7, -1)
    val eff = daily
      .withColumn("post", sum(col("rev")).over(wPost))
      .withColumn("n_post", count(lit(1)).over(wPost))
      .withColumn("pre", sum(col("rev")).over(wPre))
      .withColumn("n_pre", count(lit(1)).over(wPre))
      .filter(col("n_post") === 7 && col("n_pre") === 7)
      // Δ = post/7 − pre/7; compare 7·Δ = post − pre, exact cents.
      .select(col("day"), col("rev"), (col("post") - col("pre")).as("delta7"))
    // "Event" = the max-revenue eligible day (exact-cents argmax, min-day
    // tiebreak) — data-derived so the study is non-degenerate at every
    // SF; the question it answers: "was the spike day's week genuinely
    // abnormal, or within this calendar's ordinary variation?"
    val real = eff.orderBy(desc("rev"), col("day")).limit(1)
      .select(col("day").as("event_day"), col("delta7").as("real_delta7"))
    val placebo = eff.crossJoin(broadcast(real))
      .filter(col("day") =!= col("event_day"))
      .agg(count(lit(1)).as("n_placebos"),
        sum(when(abs(col("delta7")) >= abs(col("real_delta7")), 1L)
          .otherwise(0L)).as("n_as_extreme"),
        max(col("event_day")).as("event_day"),
        max(col("real_delta7")).as("real_delta7"))
    placebo.select(
        col("event_day"),
        qround(col("real_delta7").cast("double") / 700.0, 6)
          .as("effect_dollars_per_day"),
        col("n_placebos"), col("n_as_extreme"),
        expr("cast((2 * n_as_extreme * 1000000 + n_placebos) div (2 * n_placebos) as bigint)")
          .as("p_ppm"))
  }

  /** q356 — golden-record profile build (the CDP "customer 360" merge):
    * one row per user surviving the freshest non-null value of each
    * attribute — last JSON `$.k` property by (ts, event_id), first/last
    * seen, event count, total purchase cents, and the dominant event
    * type (mode, count ties pinned to the lexicographically larger
    * type). Survivorship = `max_by` over a
    * (presence, ts, event_id) struct so NULL attributes lose to any
    * non-null regardless of recency — the standard most-recent-non-null
    * rule. One user-grain aggregate + one (user, type) sub-aggregate;
    * output is |users|-bounded. */
  val q356: Q = (spark, dir) => {
    val ev = Tables.events(spark, dir)
      .withColumn("k", get_json_object(col("props"), "$.k"))
    val prof = ev.groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("first_ts"),
        max(col("ts")).as("last_ts"),
        sum(when(col("event_type") === "purchase",
          floor(col("value") * 100.0 + lit(0.5))).otherwise(0L))
          .as("purchase_cents"),
        max_by(col("k"),
          struct(col("k").isNotNull.cast("int").as("has"),
            col("ts").as("ts"), col("event_id").as("eid")))
          .as("latest_k"))
    val mode = ev.groupBy("user_id", "event_type")
      .agg(count(lit(1)).as("c"))
      .groupBy("user_id")
      // struct-max picks the larger (count, type) pair, so count ties go
      // to the lexicographically LARGER type — mirrored by the oracle's
      // ORDER BY c DESC, event_type DESC.
      .agg(max_by(col("event_type"),
        struct(col("c").as("c"), col("event_type").as("t")))
        .as("dominant_type"))
    prof.join(mode, "user_id")
      .select(col("user_id"), col("n_events"),
        expr("first_ts div 1000000000").as("first_seen_s"),
        expr("last_ts div 1000000000").as("last_seen_s"),
        col("purchase_cents"), col("latest_k"), col("dominant_type"))
      .orderBy("user_id")
  }

  /** q366 — Hill tail-index estimator on customer lifetime spend: over
    * the top-100 spenders, γ̂ = mean ln(x₍ᵢ₎/x₍₁₀₁₎) and the implied
    * Pareto α = 1/γ̂ — the heavy-tail EXPONENT where q276's Gini and
    * q118's Pareto share only report concentration (α ≤ 2 means
    * infinite variance: plan for whales). The order statistics come
    * from ONE TakeOrderedAndProject (top-101 by exact cents, custkey
    * tiebreak — never a global sort); each log-ratio of exact integers
    * quantizes to DECIMAL(28,9) before the order-free sum; two mirrored
    * IEEE steps out. */
  val q366: Q = (spark, dir) => {
    val spend = Tables.orders(spark, dir)
      .groupBy("o_custkey")
      .agg(sum(floor(col("o_totalprice") * 100.0 + lit(0.5)))
        .as("cents"))
      .filter(col("cents") > 0)
    val top = spend.orderBy(desc("cents"), col("o_custkey")).limit(101)
    val thr = top.orderBy(col("cents"), desc("o_custkey")).limit(1)
      .select(col("cents").as("x_k1"))
    // Sum over all 101 rows: the threshold row's own term is ln(1) = 0,
    // so dividing by n_top − 1 = 100 is exactly the k = 100 Hill mean.
    top.crossJoin(broadcast(thr))
      .withColumn("term", qdec(
        log(col("cents").cast("double") / col("x_k1").cast("double")),
        28, 9))
      .agg(count(lit(1)).as("n_top"), max(col("x_k1")).as("x_k1"),
        sum(col("term")).as("st"))
      // a single spender (n_top = 1 ⇒ k = 0) or an all-tied top (st = 0)
      // zeroes a divisor: DuckDB's x/0 is NULL where Spark ANSI throws —
      // mirror the NULL (fuzz gate, one_row/single_customer classes)
      .select((col("n_top") - 1).as("k"), col("x_k1").as("x_k1_cents"),
        when(col("n_top") === 1, lit(null))
          .otherwise(qround(col("st").cast("double") /
            (col("n_top") - 1).cast("double"), 6)).as("gamma_hill"),
        when(col("n_top") === 1 || col("st") === 0, lit(null))
          .otherwise(qround((col("n_top") - 1).cast("double") /
            col("st").cast("double"), 6)).as("alpha_pareto"))
  }

  /** q367 — stationary distribution of the journey Markov chain: five
    * synchronous power-iteration steps of q122's transition matrix from
    * the uniform start — where does attention CONCENTRATE if users walk
    * the observed chain forever (the PageRank-without-teleport of the
    * event graph). The matrix and every iterate are |types|-bounded, so
    * each step is a dimension-sized join; per-step products quantize to
    * DECIMAL(28,9) before the grouped sums (a float sum over even 5
    * rows is order-dependent across engines) and each iterate
    * re-quantizes at 9 dp so both engines walk identical doubles.
    *
    * Each iterate is RENORMALIZED to unit mass (VERDICT r11 #4): a type
    * appearing ONLY as a next_type (absorbing state, no outgoing
    * transitions) sheds its mass on the following step — without the
    * renormalization the reported stationary_p would sum < 1 on any
    * feed with absorbing structure (the r10 documented caveat, now
    * engineered away). Dividing each iterate by its exact decimal sum
    * (engine and oracle walk the identical expression) makes
    * stationary_p a TRUE distribution at every step: Σp = 1 up to
    * output quantization, asserted with an absorbing-type fixture in
    * TailChainSpec. The division adds one window aggregate over a
    * |types|-sized frame per step — free at any scale. */
  val q367: Q = (spark, dir) => {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val cells = Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("event_type").as("next_type"))
      .agg(count(lit(1)).as("c"))
      .withColumn("p", col("c").cast("double") /
        sum(col("c")).over(Window.partitionBy("prev_type")))
      .select("prev_type", "next_type", "p")
      .localCheckpoint()
    val kF = cells.select(col("prev_type").as("event_type")).distinct()
      .localCheckpoint()
    val k = Window.partitionBy()
    var r = kF.withColumn("r", qround(
      lit(1.0) / count(lit(1)).over(k).cast("double"), 9))
    for (_ <- 1 to 5) {
      r = cells.join(r.withColumnRenamed("event_type", "prev_type"),
          "prev_type")
        .withColumn("term", qdec(col("r") * col("p"), 28, 9))
        .groupBy(col("next_type").as("event_type"))
        .agg(sum(col("term")).as("s"))
        // Renormalize (VERDICT r11 #4): the decimal sums are exact and
        // order-free, so Σs is the same decimal in both engines; one
        // double division + 9 dp re-quantization keeps the iterates
        // bit-identical across engines while restoring unit mass shed
        // through absorbing states.
        .withColumn("r", qround(col("s").cast("double") /
          sum(col("s")).over(Window.partitionBy()).cast("double"), 9))
        .select("event_type", "r")
        .localCheckpoint()
    }
    r.select(col("event_type"),
        graft.functions.GraftFunctions.decOut(col("r"), 6)
          .as("stationary_p"))
      .orderBy("event_type")
  }

  /** q369 — customer activity-segment migration matrix: each customer
    * classed by order count in the FIRST vs SECOND half of the calendar
    * (absent / low 1–2 / mid 3–5 / high 6+ — fixed integer bands, no
    * data-dependent quantiles to drift) and rolled up to the 4×4
    * transition matrix with exact ppm shares — the
    * acquisition/retention/churn flow readout a lifecycle team watches,
    * the CUSTOMER-level sibling of q122's event-level transitions. The
    * midpoint is exact integer day arithmetic from the global min/max;
    * one orders aggregate + one customer-dimension left join; the
    * matrix is 16-bounded. */
  val q369: Q = (spark, dir) => {
    val days = Tables.orders(spark, dir)
      .select(col("o_custkey"),
        expr("cast(cast(o_orderdate as timestamp) as long) div 86400")
          .as("day"))
    val mid = days.agg(expr("min(day) + (max(day) - min(day)) div 2")
      .as("mid"))
    val per = days.crossJoin(broadcast(mid))
      .groupBy("o_custkey")
      .agg(sum(when(col("day") < col("mid"), 1L).otherwise(0L)).as("n1"),
        sum(when(col("day") >= col("mid"), 1L).otherwise(0L)).as("n2"))
    def cls(c: org.apache.spark.sql.Column) =
      when(c === 0, "0_absent").when(c <= 2, "1_low")
        .when(c <= 5, "2_mid").otherwise("3_high")
    val cells = Tables.customer(spark, dir)
      .select(col("c_custkey").as("o_custkey"))
      .join(per, Seq("o_custkey"), "left")
      .select(cls(coalesce(col("n1"), lit(0L))).as("class_h1"),
        cls(coalesce(col("n2"), lit(0L))).as("class_h2"))
      .groupBy("class_h1", "class_h2")
      .agg(count(lit(1)).as("n_customers"))
    val tot = cells.agg(sum(col("n_customers")).as("nn"))
    cells.crossJoin(broadcast(tot))
      .select(col("class_h1"), col("class_h2"), col("n_customers"),
        expr("cast((2 * n_customers * 1000000 + nn) div (2 * nn) as bigint)")
          .as("share_ppm"))
      .orderBy("class_h1", "class_h2")
  }

  /** q373 — bounce rate by session start hour: sessions from the
    * canonical 30-minute-gap rule (q11's convention — gap key =
    * cumulative count of gap-opens over the per-user event order),
    * a bounce = a single-event session, rolled up by hour-of-day of
    * the session start — the engagement-quality readout beside q11's
    * raw session counts. One user_id exchange manufactures sessions;
    * the rollup is 24-row-bounded; all integer with exact half-up
    * ppm. */
  val q373: Q = (spark, dir) => {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val gapNs = 1800L * 1000000000L
    val sess = Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"))
      .withColumn("prev", lag(col("ts"), 1).over(w))
      .withColumn("opens",
        when(col("prev").isNull || col("ts") - col("prev") > gapNs, 1L)
          .otherwise(0L))
      .withColumn("sid", sum(col("opens")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "sid")
      .agg(count(lit(1)).as("n_events"), min(col("ts")).as("start_ts"))
    sess
      .withColumn("start_hour",
        expr("(start_ts div 3600000000000) % 24"))
      .groupBy("start_hour")
      .agg(count(lit(1)).as("n_sessions"),
        sum(when(col("n_events") === 1, 1L).otherwise(0L))
          .as("n_bounces"))
      .withColumn("bounce_ppm",
        expr("cast((2 * n_bounces * 1000000 + n_sessions) div (2 * n_sessions) as bigint)"))
      .orderBy("start_hour")
  }

  val queries: Map[String, Q] = Map(
    "q373_bounce_rate" -> q373,
    "q369_rfm_migration" -> q369,
    "q366_hill_tail_index" -> q366,
    "q367_markov_stationary" -> q367,
    "q356_user_golden_profile" -> q356,
    "q352_croston_forecast" -> q352,
    "q353_window_funnel" -> q353,
    "q375_sliding_funnel" -> q375,
    "q354_event_study" -> q354,
    "q342_path_entropy" -> q342,
    "q322_covariate_balance" -> q322,
    "q320_seasonal_decomposition" -> q320,
    "q321_theil_decomposition" -> q321,
    "q318_info_gain" -> q318,
    "q319_kruskal_wallis" -> q319,
    "q316_bayesian_average" -> q316,
    "q317_listagg_segments" -> q317,
    "q313_xmr_chart" -> q313,
    "q314_packing_sweep" -> q314,
    "q309_safety_stock" -> q309,
    "q310_interarrival_ks" -> q310,
    "q311_capture_recapture" -> q311,
    "q312_good_turing" -> q312,
    "q306_k_anonymity" -> q306,
    "q307_dp_counts" -> q307,
    "q308_srm_check" -> q308,
    "q301_purged_cv" -> q301,
    "q302_woe_encoding" -> q302,
    "q303_strat_match_att" -> q303,
    "q304_bh_fdr" -> q304,
    "q305_source_datacard" -> q305,
    "q298_bucketed_join" -> q298,
    "q299_dpp_prune" -> q299,
    "q300_schema_evolution" -> q300,
    "q278_waterfall_contribution" -> q278,
    "q279_mase_scoring" -> q279,
    "q277_rank_biased_overlap" -> q277,
    "q275_backlog_aging" -> q275,
    "q276_lorenz_gini" -> q276,
    "q272_same_store_growth" -> q272,
    "q271_price_volume_bridge" -> q271,
    "q270_abc_xyz_matrix" -> q270,
    "q264_kendall_tau" -> q264,
    "q259_mann_kendall" -> q259,
    "q260_spearman" -> q260,
    "q256_bivariate_ols" -> q256,
    "q258_partial_corr" -> q258,
    "q250_forecast_reconciliation" -> q250,
    "q251_winsorized_means" -> q251,
    "q247_max_drawdown" -> q247,
    "q243_holt_winters" -> q243,
    "q238_concentration" -> q238,
    "q239_acf_ljungbox" -> q239,
    "q235_table_diff" -> q235,
    "q236_fifo_valuation" -> q236,
    "q234_hll_oracle" -> q234,
    "q287_hll_rolling_distinct" -> q287,
    "q288_quantile_sketch_union" -> q288,
    "q293_arc_elasticity" -> q293,
    "q228_wilson_ranking" -> q228,
    "q229_weighted_percentiles" -> q229,
    "q227_pinball_eval" -> q227,
    "q218_fifo_matching" -> q218,
    "q219_apportionment" -> q219,
    "q220_benford_audit" -> q220,
    "q221_rle_runs" -> q221,
    "q211_calendar_window" -> q211,
    "q212_table_fingerprint" -> q212,
    "q205_theil_sen" -> q205,
    "q206_mrr_bridge" -> q206,
    "q207_moment_profile" -> q207,
    "q202_forecast_backtest" -> q202,
    "q196_interval_join" -> q196,
    "q197_cusum_shift" -> q197,
    "q140_bootstrap_ci" -> q140,
    "q141_target_encode" -> q141,
    "q155_ratio_to_parent" -> q155,
    "q156_dow_seasonality" -> q156,
    "q157_lead_lag_corr" -> q157,
    "q121_moving_revenue" -> q121,
    "q137_basket_lift" -> q137,
    "q122_markov_transitions" -> q122,
    "q123_unpivot_measures" -> q123,
    "q124_abc_contribution" -> q124,
    "q125_equidepth_histogram" -> q125,
    "q126_mad_outliers" -> q126,
    "q185_skew_profile" -> q185,
    "q187_kmv_distinct" -> q187,
    "q194_quantile_sketch" -> q194,
    "q189_kmv_union" -> q189,
    "q191_kmv_intersect" -> q191,
    "q127_ewma_revenue" -> q127,
    "q164_holt_forecast" -> q164,
    "q166_covisitation" -> q166,
    "q167_weighted_median" -> q167,
    "q173_period_growth" -> q173,
    "q178_seasonal_anomaly" -> q178,
    "q179_new_vs_returning" -> q179,
    "q180_leadtime_sla" -> q180,
    "q168_decision_stump" -> q168,
    "q128_dq_report" -> q128,
    "q129_sorted_neighborhood" -> q129,
    "q130_rank_fusion" -> q130,
    "q131_ab_ztest" -> q131,
    "q133_pit_join" -> q133,
    "q134_event_paths" -> q134,
    "q135_grouping_sets" -> q135)

  private val H = "9223372036854775807"

  private val nationOrdersSql =
    """FROM orders
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey""".stripMargin

  /** q123 oracle: the melt written as one UNION ALL stanza per measure
    * (generated — 4 identical shapes). */
  private val meltCols =
    Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
  private def meltOracle: String = {
    val stanzas = meltCols.map { c =>
      s"""SELECT l_orderkey, l_linenumber, '$c' AS measure, $c AS v
         |FROM lineitem WHERE l_orderkey % 997 = 0""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"$stanzas\nORDER BY l_orderkey, l_linenumber, measure"
  }

  /** q125 oracle: same rounded decile boundaries, bucket by counting
    * boundaries strictly below the value (generated CASE terms — no list
    * lambdas, engine-version-neutral). */
  private def equidepthOracle: String = {
    val bounds = (1 to 9)
      .map(i => s"floor((quantile_cont(o_totalprice, 0.$i)) * 1000000.0 + 0.5) / 1000000.0 AS b$i")
      .mkString(",\n    ")
    val terms = (1 to 9)
      .map(i => s"(CASE WHEN v > b.b$i THEN 1 ELSE 0 END)")
      .mkString(" + ")
    s"""WITH b AS (SELECT
       |    $bounds
       |  FROM orders),
       |x AS (SELECT o_totalprice AS v,
       |        CAST(1 + $terms AS BIGINT) AS bucket
       |      FROM orders CROSS JOIN b)
       |SELECT bucket, CAST(count(*) AS BIGINT) AS n,
       |       min(v) AS mn, max(v) AS mx
       |FROM x GROUP BY 1 ORDER BY 1""".stripMargin
  }

  /** q140 oracle: the inverse-CDF CASE is generated from the SAME
    * literals as the engine ([[graft.ops.Bootstrap.poissonWeightSql]])
    * so the branch constants cannot drift. */
  private def bootstrapOracle: String = {
    val u = s"least(CAST((md5_number_lower('140:' || o_orderkey::VARCHAR" +
      s" || ':' || b::VARCHAR) & $H) AS BIGINT)::DOUBLE / " +
      "9.223372036854775808e18, 0.9999999999999999)"
    val w = graft.ops.Bootstrap.poissonWeightSql("u")
    s"""WITH base AS (
       |  SELECT o_orderkey, CAST(floor(o_totalprice * 100.0 + 0.5) / 100.0 AS DECIMAL(18,2)) AS v
       |  FROM orders),
       |rep AS (
       |  SELECT o_orderkey, v, b, $u AS u
       |  FROM base, generate_series(0, 199) t(b)),
       |wtd AS (SELECT b, v, ($w) AS w FROM rep),
       |means AS (
       |  SELECT b, CAST(floor((CAST(SUM(w * v) AS DOUBLE) /
       |      CAST(SUM(w) AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0 AS DECIMAL(18,6)) AS m
       |  FROM wtd GROUP BY b),
       |ranked AS (
       |  SELECT m, b, row_number() OVER (ORDER BY m, b) AS r FROM means),
       |ci AS (
       |  SELECT COUNT(*) AS n_replicas,
       |    MIN(CASE WHEN r = 5 THEN m END) AS ci_lo,
       |    MIN(CASE WHEN r = 195 THEN m END) AS ci_hi,
       |    SUM(m) AS s1, SUM(CAST(m AS DECIMAL(24,6)) * m) AS s2
       |  FROM ranked),
       |fullagg AS (SELECT COUNT(*) AS n_rows, SUM(v) AS sv FROM base)
       |SELECT n_rows,
       |  floor((CAST(sv AS DOUBLE) / n_rows) * 1000000.0 + 0.5) / 1000000.0 AS mean,
       |  n_replicas,
       |  CAST(ci_lo AS DOUBLE) AS ci_lo, CAST(ci_hi AS DOUBLE) AS ci_hi,
       |  floor((sqrt((CAST(s2 AS DOUBLE) -
       |      CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n_replicas) /
       |    (n_replicas - 1.0))) * 1000000.0 + 0.5) / 1000000.0 AS se_boot
       |FROM fullagg CROSS JOIN ci""".stripMargin
  }

  /** q220 oracle: expected-probability literals generated from the SAME
    * [[benfordP]] sequence as the engine, so the constants cannot
    * drift. */
  private def benfordOracle: String = {
    val values = benfordP
      .map { case (d, p) =>
        val micros = (BigDecimal(p) * 1000000).toLongExact
        s"($d, CAST($p AS DECIMAL(8,6)), CAST($micros AS BIGINT))"
      }
      .mkString(", ")
    val chi2 = qdecSql(
      "dm * dm / (CAST(expected_micros AS DOUBLE) * 1000000.0)", 18, 6)
    s"""WITH obs AS (
       |  SELECT CAST(substr(CAST(CAST(floor(o_totalprice * 100.0 + 0.5)
       |      AS BIGINT) AS VARCHAR), 1, 1) AS INTEGER) AS digit,
       |    CAST(count(*) AS BIGINT) AS n_obs
       |  FROM orders GROUP BY 1),
       |p(digit, p, p_micros) AS (VALUES $values),
       |j AS (
       |  SELECT o.digit, o.n_obs,
       |    CAST(SUM(o.n_obs) OVER () AS BIGINT) AS n_total, p.p,
       |    p.p_micros
       |  FROM obs o JOIN p ON o.digit = p.digit),
       |t AS (
       |  SELECT digit, n_obs,
       |    n_total * p_micros AS expected_micros,
       |    CAST(CAST(n_total AS DECIMAL(20,0)) * p AS DECIMAL(18,6))
       |      AS expected_n,
       |    CAST(n_obs * 1000000 - n_total * p_micros AS DOUBLE) AS dm
       |  FROM j),
       |c AS (
       |  SELECT digit, n_obs, expected_n, $chi2 AS chi2_term
       |  FROM t)
       |SELECT digit, n_obs,
       |  floor(CAST(expected_n AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0
       |    AS expected_n,
       |  floor(CAST(chi2_term AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0
       |    AS chi2_term,
       |  floor(CAST(SUM(chi2_term) OVER () AS DOUBLE) * 1000000.0 + 0.5)
       |    / 1000000.0 AS chi2_total
       |FROM c ORDER BY digit""".stripMargin
  }

  /** q239 oracle: the identical integer sufficient statistics via
    * HUGEINT window lags, generated per lag like the engine side. */
  private def acfOracle: String = {
    val lagCols = (1 to 7).map(k => s"lag(x, $k) OVER w AS x$k").mkString(",\n|       ")
    val aggCols = (1 to 7).map { k =>
      s"""SUM(x * x$k) AS sxy$k,
         |        SUM(CASE WHEN x$k IS NOT NULL THEN x$k ELSE 0 END) AS sh$k,
         |        SUM(CASE WHEN x$k IS NOT NULL THEN x ELSE 0 END) AS st$k""".stripMargin
    }.mkString(",\n|        ")
    val rCols = (1 to 7).map { k =>
      val num = s"CAST(CAST(n AS HUGEINT) * n * sxy$k - CAST(n AS HUGEINT) * s * (sh$k + st$k) + (CAST(n AS HUGEINT) - $k) * s * s AS DOUBLE)"
      val den = s"CAST(CAST(n AS HUGEINT) * n * sxx - CAST(n AS HUGEINT) * s * s AS DOUBLE)"
      s"${graft.functions.GraftFunctions.qroundSql(s"$num / $den", 6)} AS r$k"
    }.mkString(",\n|       ")
    val lbSum = (1 to 7)
      .map(k => s"r$k * r$k / (CAST(n AS DOUBLE) - $k.0)").mkString(" + ")
    val lbQ = graft.functions.GraftFunctions.qroundSql(
      s"CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 2.0) * ($lbSum)", 6)
    s"""WITH daily AS (
       |  SELECT nation, day,
       |    CAST(CAST(SUM(p) AS DECIMAL(18,2)) * 100 AS HUGEINT) AS x
       |  FROM (SELECT n_name AS nation,
       |          (epoch_ns(o_orderdate) // 1000000000) // 86400 AS day,
       |          CAST(floor(o_totalprice * 100.0 + 0.5) / 100.0
       |            AS DECIMAL(18,2)) AS p
       |        $nationOrdersSql)
       |  GROUP BY 1, 2),
       |l AS (SELECT nation, day, x,
       |       $lagCols
       |      FROM daily WINDOW w AS (PARTITION BY nation ORDER BY day)),
       |st AS (SELECT nation, CAST(count(*) AS BIGINT) AS n,
       |        SUM(x) AS s, SUM(x * x) AS sxx,
       |        $aggCols
       |       FROM l GROUP BY 1),
       |r AS (SELECT nation, n,
       |       $rCols
       |      FROM st),
       |f AS (SELECT nation, n, ${(1 to 7).map(k => s"r$k").mkString(", ")},
       |       $lbQ AS lb_q
       |      FROM r)
       |SELECT nation, n AS n_days, ${(1 to 7).map(k => s"r$k").mkString(", ")},
       |  lb_q, (lb_q > 14.067) AS not_white
       |FROM f ORDER BY nation""".stripMargin
  }

  /** q243 oracle: the Holt–Winters recursion replayed as a recursive
    * CTE carrying all seven seasonal slots (generated — one CASE per
    * slot), multiply-add chains textually mirroring the engine fold. */
  private def holtWintersOracle: String = {
    val a = "CAST(0.3 AS DOUBLE)"
    val b = "CAST(0.1 AS DOUBLE)"
    val g = "CAST(0.2 AS DOUBLE)"
    val one = "CAST(1.0 AS DOUBLE)"
    val zeros = (0 to 6)
      .map(j => s"CAST(0.0 AS DOUBLE) AS s$j").mkString(", ")
    val prevS = (0 to 6).map(j => s"rec.s$j AS s${j}_prev").mkString(",\n|             ")
    val selCase = "CASE idx.dow " +
      (0 to 6).map(j => s"WHEN $j THEN rec.s$j").mkString(" ") + " END"
    val sUpd = (0 to 6).map { j =>
      s"""CASE WHEN dow = $j THEN $g * (revenue - l_new) + ($one - $g) * sel
         |           ELSE s${j}_prev END""".stripMargin
    }.mkString(",\n|         ")
    val outSeason = "CASE dow " +
      (0 to 6).map(j => s"WHEN $j THEN s$j").mkString(" ") + " END"
    s"""WITH RECURSIVE idx AS (
       |  SELECT nation, day, revenue, day % 7 AS dow,
       |         row_number() OVER (PARTITION BY nation ORDER BY day) AS i
       |  FROM (SELECT n_name AS nation,
       |          (epoch_ns(o_orderdate) // 1000000000) // 86400 AS day,
       |          CAST(SUM(CAST(floor(o_totalprice * 100.0 + 0.5) / 100.0 AS DECIMAL(18,2))) AS DOUBLE)
       |            AS revenue
       |        $nationOrdersSql
       |        GROUP BY 1, 2)),
       |rec AS (
       |  SELECT nation, day, revenue, dow, i, revenue AS l,
       |         CAST(0.0 AS DOUBLE) AS b, $zeros, revenue AS f
       |  FROM idx WHERE i = 1
       |  UNION ALL
       |  SELECT nation, day, revenue, dow, i, l_new,
       |         $b * (l_new - l_prev) + ($one - $b) * b_prev,
       |         $sUpd,
       |         f
       |  FROM (SELECT q.*,
       |          $a * (q.revenue - q.sel)
       |            + ($one - $a) * (q.l_prev + q.b_prev) AS l_new,
       |          q.l_prev + q.b_prev + q.sel AS f
       |        FROM (SELECT idx.nation, idx.day, idx.revenue, idx.dow,
       |             idx.i, rec.l AS l_prev, rec.b AS b_prev,
       |             $prevS,
       |             $selCase AS sel
       |           FROM idx JOIN rec ON idx.nation = rec.nation
       |                            AND idx.i = rec.i + 1) q))
       |SELECT nation, day, revenue,
       |  ${graft.functions.GraftFunctions.qroundSql("l", 6)} AS level,
       |  ${graft.functions.GraftFunctions.qroundSql("b", 6)} AS trend,
       |  ${graft.functions.GraftFunctions.qroundSql(outSeason, 6)} AS seasonal,
       |  ${graft.functions.GraftFunctions.qroundSql("f", 6)} AS forecast
       |FROM rec ORDER BY nation, day""".stripMargin
  }

  /** One Holt recursion chain for [[q250]]'s twin-level oracle (the
    * q164 recursion parameterized by key column and base CTE name). */
  private def holtChainCte(idx: String, rec: String, key: String): String =
    s"""$rec AS (
       |  SELECT $key, day, revenue, i, revenue AS l,
       |         CAST(0.0 AS DOUBLE) AS b
       |  FROM $idx WHERE i = 1
       |  UNION ALL
       |  SELECT $key, day, revenue, i, l_new,
       |         CAST(0.1 AS DOUBLE) * (l_new - l_prev)
       |           + (CAST(1.0 AS DOUBLE) - CAST(0.1 AS DOUBLE)) * b_prev
       |  FROM (SELECT i2.$key, i2.day, i2.revenue, i2.i,
       |          r2.l AS l_prev, r2.b AS b_prev,
       |          CAST(0.3 AS DOUBLE) * i2.revenue
       |            + (CAST(1.0 AS DOUBLE) - CAST(0.3 AS DOUBLE))
       |              * (r2.l + r2.b) AS l_new
       |        FROM $idx i2 JOIN $rec r2 ON i2.$key = r2.$key
       |                         AND i2.i = r2.i + 1))""".stripMargin

  /** q277 oracle: the same geometric weights, generated from the SAME
    * Scala doubles (shortest round-trip literals — both engines parse
    * back the identical bits). */
  private def rboOracle: String = {
    val vals = (1 to 20)
      .map(d => s"($d, ${math.pow(0.9, d - 1)})").mkString(", ")
    s"""WITH wt(depth, w) AS (VALUES $vals),
       |base AS (
       |  SELECT l_partkey,
       |    SUM(CAST(floor(l_extendedprice * 100.0 + 0.5) AS HUGEINT))
       |      AS rev,
       |    SUM(CAST(l_quantity AS BIGINT)) AS qty
       |  FROM lineitem GROUP BY 1),
       |tr AS (SELECT l_partkey, rn_r FROM (
       |    SELECT l_partkey, row_number() OVER (ORDER BY rev DESC,
       |      l_partkey) AS rn_r FROM base) WHERE rn_r <= 20),
       |tq AS (SELECT l_partkey, rn_q FROM (
       |    SELECT l_partkey, row_number() OVER (ORDER BY qty DESC,
       |      l_partkey) AS rn_q FROM base) WHERE rn_q <= 20),
       |common AS (
       |  SELECT greatest(rn_r, rn_q) AS dmin
       |  FROM tr JOIN tq USING (l_partkey)),
       |byd AS (
       |  SELECT depth, wt.w,
       |    CAST(SUM(CASE WHEN dmin IS NOT NULL THEN 1 ELSE 0 END)
       |      AS BIGINT) AS overlap_d
       |  FROM wt LEFT JOIN common ON dmin <= depth
       |  GROUP BY 1, 2),
       |b2 AS (
       |  SELECT depth, overlap_d,
       |    CAST((2 * overlap_d * 1000000 + depth) // (2 * depth)
       |      AS BIGINT) AS agreement_ppm,
       |    CAST(floor((w * CAST(overlap_d AS DOUBLE)
       |      / CAST(depth AS DOUBLE)) * 1000000000000.0 + 0.5)
       |      / 1000000000000.0 AS DECIMAL(28,12)) AS term
       |  FROM byd),
       |r AS (
       |  SELECT floor(((1.0 - 0.9) * CAST(CAST(SUM(term)
       |      AS DECIMAL(38,12)) AS DOUBLE)) * 1000000.0 + 0.5)
       |    / 1000000.0 AS rbo
       |  FROM b2)
       |SELECT depth, overlap_d, agreement_ppm, rbo
       |FROM b2 CROSS JOIN r ORDER BY depth""".stripMargin
  }

  // One unrolled power-iteration step of the q367 oracle: r_{n} from
  // r_{n-1}, products quantized to DECIMAL(28,9) before the grouped sum,
  // the iterate RENORMALIZED by its exact decimal total (VERDICT r11 #4
  // — absorbing states shed mass; the division restores Σ=1) and
  // re-quantized at 9 dp — textually the engine's step.
  private def markovStepSql(n: Int): String =
    s"""it${n}s AS (
       |  SELECT pm.next_type AS event_type,
       |    SUM(CAST(floor((it${n - 1}.r * pm.p)
       |      * 1000000000.0 + 0.5) / 1000000000.0 AS DECIMAL(28,9))) AS s
       |  FROM pm JOIN it${n - 1} ON it${n - 1}.event_type = pm.prev_type
       |  GROUP BY 1),
       |it$n AS (
       |  SELECT event_type,
       |    floor(CAST(s AS DOUBLE) / CAST(SUM(s) OVER () AS DOUBLE)
       |      * 1000000000.0 + 0.5) / 1000000000.0 AS r
       |  FROM it${n}s)""".stripMargin

  val oracles: Map[String, String] = Map(
    "q373_bounce_rate" ->
      """WITH e AS (
        |  SELECT user_id, epoch_ns(ts) AS t, event_id FROM events),
        |g AS (
        |  SELECT user_id, t, event_id,
        |    CASE WHEN lag(t) OVER (PARTITION BY user_id
        |        ORDER BY t, event_id) IS NULL
        |      OR t - lag(t) OVER (PARTITION BY user_id
        |        ORDER BY t, event_id) > 1800000000000
        |      THEN 1 ELSE 0 END AS opens
        |  FROM e),
        |sids AS (
        |  SELECT user_id, t,
        |    SUM(opens) OVER (PARTITION BY user_id ORDER BY t, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM g),
        |sess AS (
        |  SELECT user_id, sid, CAST(COUNT(*) AS BIGINT) AS n_events,
        |    MIN(t) AS start_ts
        |  FROM sids GROUP BY 1, 2),
        |h AS (
        |  SELECT (start_ts // 3600000000000) % 24 AS start_hour,
        |    CAST(COUNT(*) AS BIGINT) AS n_sessions,
        |    CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_bounces
        |  FROM sess GROUP BY 1)
        |SELECT CAST(start_hour AS BIGINT) AS start_hour, n_sessions,
        |  n_bounces,
        |  CAST((2 * n_bounces * 1000000 + n_sessions) // (2 * n_sessions)
        |    AS BIGINT) AS bounce_ppm
        |FROM h ORDER BY start_hour""".stripMargin,
    "q369_rfm_migration" ->
      """WITH d AS (
        |  SELECT o_custkey,
        |    (epoch_ns(o_orderdate) // 1000000000) // 86400 AS day
        |  FROM orders),
        |m AS (SELECT MIN(day) + (MAX(day) - MIN(day)) // 2 AS mid FROM d),
        |per AS (
        |  SELECT o_custkey,
        |    SUM(CASE WHEN day < mid THEN 1 ELSE 0 END) AS n1,
        |    SUM(CASE WHEN day >= mid THEN 1 ELSE 0 END) AS n2
        |  FROM d, m GROUP BY 1),
        |cells AS (
        |  SELECT
        |    CASE WHEN COALESCE(n1, 0) = 0 THEN '0_absent'
        |      WHEN COALESCE(n1, 0) <= 2 THEN '1_low'
        |      WHEN COALESCE(n1, 0) <= 5 THEN '2_mid'
        |      ELSE '3_high' END AS class_h1,
        |    CASE WHEN COALESCE(n2, 0) = 0 THEN '0_absent'
        |      WHEN COALESCE(n2, 0) <= 2 THEN '1_low'
        |      WHEN COALESCE(n2, 0) <= 5 THEN '2_mid'
        |      ELSE '3_high' END AS class_h2,
        |    CAST(COUNT(*) AS BIGINT) AS n_customers
        |  FROM customer LEFT JOIN per ON c_custkey = o_custkey
        |  GROUP BY 1, 2),
        |tot AS (SELECT CAST(SUM(n_customers) AS BIGINT) AS nn FROM cells)
        |SELECT class_h1, class_h2, n_customers,
        |  CAST((2 * n_customers * 1000000 + nn) // (2 * nn) AS BIGINT)
        |    AS share_ppm
        |FROM cells, tot ORDER BY class_h1, class_h2""".stripMargin,
    "q366_hill_tail_index" ->
      """WITH spend AS (
        |  SELECT o_custkey,
        |    CAST(SUM(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
        |      AS BIGINT) AS cents
        |  FROM orders GROUP BY 1
        |  HAVING SUM(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)) > 0),
        |top AS (SELECT * FROM spend ORDER BY cents DESC, o_custkey
        |        LIMIT 101),
        |thr AS (SELECT cents AS x_k1 FROM top
        |        ORDER BY cents, o_custkey DESC LIMIT 1),
        |t AS (
        |  SELECT x_k1,
        |    CAST(floor(ln(CAST(cents AS DOUBLE) / CAST(x_k1 AS DOUBLE))
        |      * 1000000000.0 + 0.5) / 1000000000.0 AS DECIMAL(28,9)) AS term
        |  FROM top, thr),
        |a AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_top,
        |    CAST(MAX(x_k1) AS BIGINT) AS x_k1, SUM(term) AS st
        |  FROM t)
        |SELECT n_top - 1 AS k, x_k1 AS x_k1_cents,
        |  floor(CAST(st AS DOUBLE) / (n_top - 1) * 1000000.0 + 0.5)
        |    / 1000000.0 AS gamma_hill,
        |  floor(CAST(n_top - 1 AS DOUBLE) / CAST(st AS DOUBLE)
        |    * 1000000.0 + 0.5) / 1000000.0 AS alpha_pareto
        |FROM a""".stripMargin,
    "q367_markov_stationary" ->
      s"""WITH e AS (SELECT user_id, epoch_ns(ts) AS t, event_id, event_type
         |           FROM events),
         |lg AS (SELECT event_type AS next_type,
         |         lag(event_type) OVER (PARTITION BY user_id
         |                               ORDER BY t, event_id) AS prev_type
         |       FROM e),
         |cells AS (
         |  SELECT prev_type, next_type, CAST(COUNT(*) AS BIGINT) AS c
         |  FROM lg WHERE prev_type IS NOT NULL GROUP BY 1, 2),
         |pm AS (
         |  SELECT prev_type, next_type,
         |    CAST(c AS DOUBLE) / SUM(c) OVER (PARTITION BY prev_type) AS p
         |  FROM cells),
         |types AS (SELECT DISTINCT prev_type AS event_type FROM cells),
         |k AS (SELECT CAST(COUNT(*) AS BIGINT) AS nt FROM types),
         |it0 AS (
         |  SELECT event_type,
         |    floor(1.0 / CAST(nt AS DOUBLE) * 1000000000.0 + 0.5)
         |      / 1000000000.0 AS r
         |  FROM types, k),
         |${markovStepSql(1)},
         |${markovStepSql(2)},
         |${markovStepSql(3)},
         |${markovStepSql(4)},
         |${markovStepSql(5)}
         |SELECT event_type,
         |  floor(r * 1000000.0 + 0.5) / 1000000.0 AS stationary_p
         |FROM it5 ORDER BY event_type""".stripMargin,
    "q356_user_golden_profile" ->
      """WITH e AS (
        |  SELECT user_id, epoch_ns(ts) AS t, event_id, event_type,
        |    CAST(floor("value" * 100.0 + 0.5) AS BIGINT) AS cents,
        |    json_extract_string(props, '$.k') AS k
        |  FROM events),
        |prof AS (
        |  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
        |    MIN(t) // 1000000000 AS first_seen_s,
        |    MAX(t) // 1000000000 AS last_seen_s,
        |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN cents
        |      ELSE 0 END) AS BIGINT) AS purchase_cents
        |  FROM e GROUP BY 1),
        |lk AS (
        |  SELECT user_id, k AS latest_k FROM (
        |    SELECT user_id, k,
        |      row_number() OVER (PARTITION BY user_id
        |        ORDER BY (k IS NOT NULL) DESC, t DESC, event_id DESC) AS r
        |    FROM e) WHERE r = 1),
        |md AS (
        |  SELECT user_id, event_type AS dominant_type FROM (
        |    SELECT user_id, event_type,
        |      row_number() OVER (PARTITION BY user_id
        |        ORDER BY COUNT(*) DESC, event_type DESC) AS r
        |    FROM e GROUP BY user_id, event_type) WHERE r = 1)
        |SELECT prof.user_id, n_events, first_seen_s, last_seen_s,
        |  purchase_cents, latest_k, dominant_type
        |FROM prof JOIN lk USING (user_id) JOIN md USING (user_id)
        |ORDER BY user_id""".stripMargin,
    "q352_croston_forecast" ->
      """WITH RECURSIVE demand AS (
        |  SELECT l_partkey AS k,
        |    (epoch_ns(l_shipdate) // 1000000000) // 86400 AS day,
        |    CAST(SUM(CAST(floor(l_quantity + 0.5) AS BIGINT)) AS BIGINT)
        |      AS demand
        |  FROM lineitem GROUP BY 1, 2),
        |idx AS (
        |  SELECT k, day, CAST(demand AS DOUBLE) AS x,
        |    row_number() OVER (PARTITION BY k ORDER BY day) AS i
        |  FROM demand WHERE demand > 0),
        |cnt AS (
        |  SELECT k, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(MAX(day) AS BIGINT) AS last_day
        |  FROM idx GROUP BY 1),
        |rec AS (
        |  SELECT k, i, day, x AS z, CAST(0.0 AS DOUBLE) AS p
        |  FROM idx WHERE i = 1
        |  UNION ALL
        |  SELECT idx.k, idx.i, idx.day,
        |    CAST(0.2 AS DOUBLE) * idx.x + CAST(0.8 AS DOUBLE) * rec.z,
        |    CASE WHEN rec.i = 1 THEN CAST(idx.day - rec.day AS DOUBLE)
        |      ELSE CAST(0.2 AS DOUBLE) * (idx.day - rec.day)
        |        + CAST(0.8 AS DOUBLE) * rec.p END
        |  FROM idx JOIN rec ON idx.k = rec.k AND idx.i = rec.i + 1),
        |fin AS (
        |  SELECT rec.k, cnt.n, cnt.last_day, rec.z, rec.p
        |  FROM rec JOIN cnt ON rec.k = cnt.k AND rec.i = cnt.n
        |  WHERE cnt.n >= 5)
        |SELECT CAST(k AS BIGINT) AS part_key, n AS n_demand_days, last_day,
        |  floor(z * 1000000.0 + 0.5) / 1000000.0 AS demand_ewma,
        |  floor(p * 1000000.0 + 0.5) / 1000000.0 AS interval_ewma,
        |  floor(z / p * 1000000.0 + 0.5) / 1000000.0 AS forecast_per_day
        |FROM fin
        |ORDER BY forecast_per_day DESC, part_key LIMIT 50""".stripMargin,
    "q353_window_funnel" ->
      """WITH ev AS (
        |  SELECT user_id, event_type, epoch_ns(ts) AS t FROM events),
        |entry AS (
        |  SELECT user_id, MIN(t) AS t0 FROM ev
        |  WHERE event_type = 'view' GROUP BY 1),
        |s1 AS (
        |  SELECT ev.user_id, t0, MIN(t) AS t1
        |  FROM ev JOIN entry USING (user_id)
        |  WHERE event_type = 'click' AND t > t0
        |    AND t <= t0 + 3600000000000 GROUP BY 1, 2),
        |s2 AS (
        |  SELECT ev.user_id, MIN(t) AS t2
        |  FROM ev JOIN s1 USING (user_id)
        |  WHERE event_type = 'purchase' AND t > t1
        |    AND t <= t0 + 3600000000000 GROUP BY 1),
        |tot AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT)
        |          AS n_all_users FROM ev),
        |counts AS (
        |  SELECT '1_view' AS stage, CAST(COUNT(*) AS BIGINT) AS n_reached
        |  FROM entry
        |  UNION ALL
        |  SELECT '2_click', CAST(COUNT(*) AS BIGINT) FROM s1
        |  UNION ALL
        |  SELECT '3_purchase', CAST(COUNT(*) AS BIGINT) FROM s2),
        |wp AS (
        |  SELECT stage, n_reached, n_all_users,
        |    COALESCE(lag(n_reached) OVER (ORDER BY stage), n_all_users)
        |      AS prev
        |  FROM counts, tot)
        |SELECT stage, n_reached, n_all_users,
        |  CAST(CASE WHEN n_all_users = 0 THEN NULL ELSE
        |    (2 * n_reached * 1000000 + n_all_users)
        |    // (2 * n_all_users) END AS BIGINT) AS reach_ppm,
        |  CAST(CASE WHEN prev = 0 THEN NULL ELSE
        |    (2 * n_reached * 1000000 + prev) // (2 * prev) END AS BIGINT)
        |    AS step_ppm
        |FROM wp ORDER BY stage""".stripMargin,
    "q375_sliding_funnel" ->
      """WITH e AS (SELECT user_id, event_type, epoch_ns(ts) AS t
        |           FROM events),
        |m AS (
        |  SELECT user_id, event_type, t,
        |    MIN(CASE WHEN event_type = 'click' THEN t END) OVER
        |      (PARTITION BY user_id ORDER BY t
        |       RANGE BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nxc,
        |    MIN(CASE WHEN event_type = 'purchase' THEN t END) OVER
        |      (PARTITION BY user_id ORDER BY t
        |       RANGE BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nxp
        |  FROM e),
        |a AS (SELECT user_id, t AS vt, nxc FROM m
        |      WHERE event_type = 'view'),
        |cn AS (SELECT DISTINCT user_id AS u2, t AS ct, nxp FROM m
        |       WHERE event_type = 'click'),
        |lv AS (
        |  SELECT a.user_id, MAX(CASE
        |      WHEN a.nxc IS NOT NULL AND a.nxc <= a.vt + 3600000000000
        |       AND cn.nxp IS NOT NULL AND cn.nxp <= a.vt + 3600000000000
        |        THEN 3
        |      WHEN a.nxc IS NOT NULL AND a.nxc <= a.vt + 3600000000000
        |        THEN 2
        |      ELSE 1 END) AS lvl
        |  FROM a LEFT JOIN cn ON cn.u2 = a.user_id AND cn.ct = a.nxc
        |  GROUP BY 1),
        |agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS n1,
        |  CAST(SUM(CASE WHEN lvl >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
        |  CAST(SUM(CASE WHEN lvl = 3 THEN 1 ELSE 0 END) AS BIGINT) AS n3
        |  FROM lv),
        |tot AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT)
        |          AS n_all_users FROM e)
        |SELECT '1_view' AS stage, n1 AS n_reached, n_all_users,
        |  CAST(CASE WHEN n_all_users = 0 THEN NULL ELSE
        |    (2 * n1 * 1000000 + n_all_users)
        |    // (2 * n_all_users) END AS BIGINT) AS reach_ppm,
        |  CAST(CASE WHEN n_all_users = 0 THEN NULL ELSE
        |    (2 * n1 * 1000000 + n_all_users)
        |    // (2 * n_all_users) END AS BIGINT) AS step_ppm
        |FROM agg, tot
        |UNION ALL
        |SELECT '2_click', n2, n_all_users,
        |  CAST(CASE WHEN n_all_users = 0 THEN NULL ELSE
        |    (2 * n2 * 1000000 + n_all_users)
        |    // (2 * n_all_users) END AS BIGINT),
        |  CAST(CASE WHEN n1 = 0 THEN NULL ELSE
        |    (2 * n2 * 1000000 + n1) // (2 * n1) END AS BIGINT)
        |FROM agg, tot
        |UNION ALL
        |SELECT '3_purchase', n3, n_all_users,
        |  CAST(CASE WHEN n_all_users = 0 THEN NULL ELSE
        |    (2 * n3 * 1000000 + n_all_users)
        |    // (2 * n_all_users) END AS BIGINT),
        |  CAST(CASE WHEN n2 = 0 THEN NULL ELSE
        |    (2 * n3 * 1000000 + n2) // (2 * n2) END AS BIGINT)
        |FROM agg, tot
        |ORDER BY stage""".stripMargin,
    "q354_event_study" ->
      """WITH daily AS (
        |  SELECT (epoch_ns(o_orderdate) // 1000000000) // 86400 AS day,
        |    CAST(SUM(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
        |      AS BIGINT) AS rev
        |  FROM orders GROUP BY 1),
        |e AS (
        |  SELECT day, rev,
        |    SUM(rev) OVER (ORDER BY day
        |      ROWS BETWEEN CURRENT ROW AND 6 FOLLOWING) AS post,
        |    COUNT(*) OVER (ORDER BY day
        |      ROWS BETWEEN CURRENT ROW AND 6 FOLLOWING) AS n_post,
        |    SUM(rev) OVER (ORDER BY day
        |      ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS pre,
        |    COUNT(*) OVER (ORDER BY day
        |      ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS n_pre
        |  FROM daily),
        |eff AS (
        |  SELECT day, rev, post - pre AS delta7 FROM e
        |  WHERE n_post = 7 AND n_pre = 7),
        |real AS (
        |  SELECT day AS event_day, delta7 AS real_delta7 FROM (
        |    SELECT day, delta7,
        |      row_number() OVER (ORDER BY rev DESC, day) AS r
        |    FROM eff) WHERE r = 1),
        |pl AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_placebos,
        |    CAST(SUM(CASE WHEN abs(delta7) >= abs(real_delta7)
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_as_extreme,
        |    CAST(MAX(event_day) AS BIGINT) AS event_day,
        |    CAST(MAX(real_delta7) AS BIGINT) AS real_delta7
        |  FROM eff, real WHERE day != event_day)
        |SELECT event_day,
        |  floor(CAST(real_delta7 AS DOUBLE) / 700.0 * 1000000.0 + 0.5)
        |    / 1000000.0 AS effect_dollars_per_day,
        |  n_placebos, n_as_extreme,
        |  CAST((2 * n_as_extreme * 1000000 + n_placebos)
        |    // (2 * n_placebos) AS BIGINT) AS p_ppm
        |FROM pl""".stripMargin,
    "q342_path_entropy" ->
      """WITH e AS (SELECT user_id, epoch_ns(ts) AS t, event_id, event_type
        |           FROM events),
        |r AS (SELECT event_type AS next_type,
        |        lag(event_type) OVER (PARTITION BY user_id
        |                              ORDER BY t, event_id) AS prev_type
        |      FROM e),
        |cells AS (
        |  SELECT prev_type, next_type, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM r WHERE prev_type IS NOT NULL GROUP BY 1, 2),
        |wt AS (
        |  SELECT *, SUM(c) OVER (PARTITION BY prev_type) AS rt FROM cells),
        |terms AS (
        |  SELECT prev_type, rt,
        |    CAST(floor(-(CAST(c AS DOUBLE) / rt)
        |        * ln(CAST(c AS DOUBLE) / rt) * 1000000000.0 + 0.5)
        |      / 1000000000.0 AS DECIMAL(28,9)) AS term
        |  FROM wt),
        |rows_ AS (
        |  SELECT prev_type, rt, CAST(COUNT(*) AS BIGINT) AS n_next_types,
        |    SUM(term) AS h
        |  FROM terms GROUP BY 1, 2),
        |tot AS (SELECT CAST(SUM(rt) AS BIGINT) AS nn FROM rows_),
        |wc AS (
        |  SELECT *,
        |    CAST(floor((CAST(rt AS DOUBLE) / nn) * CAST(h AS DOUBLE)
        |        * 1000000000.0 + 0.5) / 1000000000.0 AS DECIMAL(28,9))
        |      AS cterm
        |  FROM rows_, tot),
        |cond AS (SELECT SUM(cterm) AS hc FROM wc)
        |SELECT prev_type, CAST(rt AS BIGINT) AS n_transitions, n_next_types,
        |  floor(CAST(h AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0
        |    AS entropy_nats,
        |  floor(exp(CAST(h AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0
        |    AS perplexity,
        |  floor(CAST(hc AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0
        |    AS cond_entropy_nats
        |FROM wc, cond ORDER BY prev_type""".stripMargin,
    "q322_covariate_balance" ->
      """WITH spend AS (
        |  SELECT o_custkey,
        |    CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
        |      AS BIGINT) AS spend_cents,
        |    CAST(COUNT(*) AS BIGINT) AS n_orders
        |  FROM orders GROUP BY 1),
        |base AS (
        |  SELECT c_nationkey,
        |    CAST(floor(c_acctbal / 200) AS BIGINT) AS bal_bucket,
        |    CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END
        |      AS treated,
        |    CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS x_acctbal,
        |    COALESCE(n_orders, 0) AS x_orders,
        |    COALESCE(spend_cents, 0) AS x_spend
        |  FROM customer LEFT JOIN spend ON c_custkey = o_custkey),
        |melted AS (
        |  SELECT 'x_acctbal' AS cov, c_nationkey, bal_bucket, treated,
        |    x_acctbal AS x FROM base
        |  UNION ALL
        |  SELECT 'x_orders', c_nationkey, bal_bucket, treated, x_orders
        |  FROM base
        |  UNION ALL
        |  SELECT 'x_spend', c_nationkey, bal_bucket, treated, x_spend
        |  FROM base),
        |gm AS (
        |  SELECT cov,
        |    CAST(SUM(treated) AS BIGINT) AS n_t,
        |    CAST(SUM(1 - treated) AS BIGINT) AS n_c,
        |    CAST(SUM(CASE WHEN treated = 1 THEN x ELSE 0 END) AS BIGINT)
        |      AS s_t,
        |    CAST(SUM(CASE WHEN treated = 0 THEN x ELSE 0 END) AS BIGINT)
        |      AS s_c,
        |    SUM(CASE WHEN treated = 1
        |      THEN CAST(x AS DECIMAL(19,0)) * CAST(x AS DECIMAL(19,0))
        |      ELSE CAST(0 AS DECIMAL(38,0)) END) AS ss_t,
        |    SUM(CASE WHEN treated = 0
        |      THEN CAST(x AS DECIMAL(19,0)) * CAST(x AS DECIMAL(19,0))
        |      ELSE CAST(0 AS DECIMAL(38,0)) END) AS ss_c
        |  FROM melted GROUP BY 1),
        |strat AS (
        |  SELECT cov, c_nationkey, bal_bucket,
        |    CAST(SUM(treated) AS BIGINT) AS st_nt,
        |    CAST(SUM(1 - treated) AS BIGINT) AS st_nc,
        |    CAST(SUM(CASE WHEN treated = 1 THEN x ELSE 0 END) AS BIGINT)
        |      AS st_st,
        |    CAST(SUM(CASE WHEN treated = 0 THEN x ELSE 0 END) AS BIGINT)
        |      AS st_sc
        |  FROM melted GROUP BY 1, 2, 3),
        |adj AS (
        |  SELECT cov,
        |    SUM(CAST(floor(((CAST(st_st AS DOUBLE) / st_nt
        |          - CAST(st_sc AS DOUBLE) / st_nc) * st_nt)
        |        * 1000000.0 + 0.5) / 1000000.0 AS DECIMAL(28,6)))
        |      AS wdiff,
        |    CAST(SUM(st_nt) AS BIGINT) AS ntm
        |  FROM strat WHERE st_nt > 0 AND st_nc > 0 GROUP BY 1),
        |j AS (SELECT * FROM gm JOIN adj USING (cov))
        |SELECT cov, n_t, n_c,
        |  floor(((CAST(s_t AS DOUBLE) / n_t - CAST(s_c AS DOUBLE) / n_c)
        |    / sqrt(((CAST(ss_t AS DOUBLE) / n_t
        |        - (CAST(s_t AS DOUBLE) / n_t) * (CAST(s_t AS DOUBLE) / n_t))
        |      + (CAST(ss_c AS DOUBLE) / n_c
        |        - (CAST(s_c AS DOUBLE) / n_c) * (CAST(s_c AS DOUBLE) / n_c)))
        |      / 2.0)) * 1000000.0 + 0.5) / 1000000.0 AS smd_raw,
        |  floor(((CAST(wdiff AS DOUBLE) / ntm)
        |    / sqrt(((CAST(ss_t AS DOUBLE) / n_t
        |        - (CAST(s_t AS DOUBLE) / n_t) * (CAST(s_t AS DOUBLE) / n_t))
        |      + (CAST(ss_c AS DOUBLE) / n_c
        |        - (CAST(s_c AS DOUBLE) / n_c) * (CAST(s_c AS DOUBLE) / n_c)))
        |      / 2.0)) * 1000000.0 + 0.5) / 1000000.0 AS smd_adjusted,
        |  CAST(CASE WHEN abs((CAST(wdiff AS DOUBLE) / ntm)
        |    / sqrt(((CAST(ss_t AS DOUBLE) / n_t
        |        - (CAST(s_t AS DOUBLE) / n_t) * (CAST(s_t AS DOUBLE) / n_t))
        |      + (CAST(ss_c AS DOUBLE) / n_c
        |        - (CAST(s_c AS DOUBLE) / n_c) * (CAST(s_c AS DOUBLE) / n_c)))
        |      / 2.0)) < 0.1 THEN 1 ELSE 0 END AS BIGINT) AS balanced_adj
        |FROM j ORDER BY cov""".stripMargin,
    "q320_seasonal_decomposition" ->
      """WITH daily AS (
        |  SELECT (epoch_ns(l_shipdate) // 1000000000) // 86400 AS day,
        |    CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
        |      AS BIGINT) AS cents
        |  FROM lineitem GROUP BY 1),
        |ma AS (
        |  SELECT day, cents,
        |    CAST(SUM(cents) OVER (ORDER BY day
        |      ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS BIGINT) AS ma_sum,
        |    CAST(COUNT(*) OVER (ORDER BY day
        |      ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS BIGINT) AS ma_n
        |  FROM daily),
        |det AS (
        |  SELECT ((day + 4) % 7) AS dow,
        |    CAST(floor((CAST(cents AS DOUBLE)
        |        / (CAST(ma_sum AS DOUBLE) / 7.0))
        |      * 1000000000.0 + 0.5) / 1000000000.0 AS DECIMAL(28,9))
        |      AS ratio
        |  FROM ma WHERE ma_n = 7)
        |SELECT dow, CAST(COUNT(*) AS BIGINT) AS n_days,
        |  floor((CAST(SUM(ratio) AS DOUBLE) / COUNT(*))
        |    * 1000000.0 + 0.5) / 1000000.0 AS seasonal_index,
        |  floor((CAST(MAX(ratio) AS DOUBLE) - CAST(MIN(ratio) AS DOUBLE))
        |    * 1000000.0 + 0.5) / 1000000.0 AS ratio_range
        |FROM det GROUP BY 1 ORDER BY dow""".stripMargin,
    "q321_theil_decomposition" ->
      """WITH spend AS (
        |  SELECT o_custkey,
        |    CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
        |      AS BIGINT) AS spend_cents
        |  FROM orders GROUP BY 1),
        |y AS (
        |  SELECT c_nationkey, COALESCE(spend_cents, 0) AS cents
        |  FROM customer LEFT JOIN spend ON c_custkey = o_custkey),
        |tot AS (SELECT CAST(SUM(cents) AS BIGINT) AS tc,
        |               CAST(COUNT(*) AS BIGINT) AS nc FROM y),
        |t AS (
        |  SELECT CAST(SUM(CAST(floor((CASE WHEN cents > 0
        |      THEN (CAST(cents AS DOUBLE) / tc)
        |        * ln((CAST(cents AS DOUBLE) / tc) * nc)
        |      ELSE 0.0 END) * 1000000000.0 + 0.5) / 1000000000.0
        |    AS DECIMAL(28,9))) AS DECIMAL(38,9)) AS t_total
        |  FROM y, tot),
        |nat AS (
        |  SELECT c_nationkey, CAST(SUM(cents) AS BIGINT) AS gc,
        |    CAST(COUNT(*) AS BIGINT) AS gn
        |  FROM y GROUP BY 1),
        |b AS (
        |  SELECT CAST(SUM(CAST(floor((CASE WHEN gc > 0
        |      THEN (CAST(gc AS DOUBLE) / tc)
        |        * ln((CAST(gc AS DOUBLE) / tc)
        |          * (CAST(nc AS DOUBLE) / gn))
        |      ELSE 0.0 END) * 1000000000.0 + 0.5) / 1000000000.0
        |    AS DECIMAL(28,9))) AS DECIMAL(38,9)) AS t_between
        |  FROM nat, tot)
        |SELECT
        |  floor(CAST(t_total AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0
        |    AS theil_total,
        |  floor(CAST(t_between AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0
        |    AS theil_between,
        |  floor((CAST(t_total AS DOUBLE) - CAST(t_between AS DOUBLE))
        |    * 1000000.0 + 0.5) / 1000000.0 AS theil_within
        |FROM t, b""".stripMargin,
    "q318_info_gain" ->
      """WITH base AS (
        |  SELECT CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y,
        |    o_orderpriority, c_mktsegment,
        |    CAST(c_nationkey AS VARCHAR) AS nation
        |  FROM orders JOIN customer ON o_custkey = c_custkey),
        |melted AS (
        |  SELECT 'priority' AS feature, o_orderpriority AS v, y FROM base
        |  UNION ALL
        |  SELECT 'segment', c_mktsegment, y FROM base
        |  UNION ALL
        |  SELECT 'nation', nation, y FROM base),
        |cells AS (
        |  SELECT feature, v, CAST(COUNT(*) AS BIGINT) AS n_x,
        |    CAST(SUM(y) AS BIGINT) AS n_x1
        |  FROM melted GROUP BY 1, 2),
        |tot AS (
        |  SELECT CAST(SUM(n_x) AS BIGINT) AS n,
        |    CAST(SUM(n_x1) AS BIGINT) AS n1
        |  FROM cells WHERE feature = 'priority'),
        |wh AS (
        |  SELECT feature,
        |    CAST(floor(((CAST(n_x AS DOUBLE) / n) *
        |      (CASE WHEN CAST(n_x1 AS DOUBLE) / n_x > 0
        |              AND CAST(n_x1 AS DOUBLE) / n_x < 1
        |        THEN -((CAST(n_x1 AS DOUBLE) / n_x)
        |            * ln(CAST(n_x1 AS DOUBLE) / n_x)
        |          + (1.0 - CAST(n_x1 AS DOUBLE) / n_x)
        |            * ln(1.0 - CAST(n_x1 AS DOUBLE) / n_x))
        |        ELSE 0.0 END))
        |      * 1000000000.0 + 0.5) / 1000000000.0 AS DECIMAL(28,9))
        |      AS term,
        |    CASE WHEN CAST(n1 AS DOUBLE) / n > 0
        |           AND CAST(n1 AS DOUBLE) / n < 1
        |      THEN -((CAST(n1 AS DOUBLE) / n) * ln(CAST(n1 AS DOUBLE) / n)
        |        + (1.0 - CAST(n1 AS DOUBLE) / n)
        |          * ln(1.0 - CAST(n1 AS DOUBLE) / n))
        |      ELSE 0.0 END AS hy
        |  FROM cells, tot)
        |SELECT feature, CAST(COUNT(*) AS BIGINT) AS n_values,
        |  floor(CAST(MAX(hy) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0
        |    AS h_y_nats,
        |  floor(CAST(MAX(hy) - CAST(SUM(term) AS DOUBLE) AS DOUBLE)
        |    * 1000000.0 + 0.5) / 1000000.0 AS info_gain
        |FROM wh GROUP BY 1 ORDER BY feature""".stripMargin,
    "q319_kruskal_wallis" ->
      // group-term quantizer interpolated from qdecWideSql — ONE
      // definition drives engine and oracle (sf0.1 gate, r13: the
      // previous plain-floor term saturated engine-side at sf0.1's
      // magnitudes; see the engine comment at `terms`)
      s"""WITH vals AS (
        |  SELECT event_type, value, CAST(COUNT(*) AS BIGINT) AS c_gv
        |  FROM events GROUP BY 1, 2),
        |perval AS (
        |  SELECT value, CAST(SUM(c_gv) AS BIGINT) AS c_v
        |  FROM vals GROUP BY 1),
        |ecdf AS (
        |  SELECT value, c_v,
        |    CAST(COALESCE(SUM(c_v) OVER (ORDER BY value
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS f_below
        |  FROM perval),
        |j AS (
        |  SELECT v.event_type, v.c_gv,
        |    2 * e.f_below + e.c_v + 1 AS rank2
        |  FROM vals v JOIN ecdf e ON v.value = e.value),
        |grp AS (
        |  SELECT event_type, CAST(SUM(c_gv) AS BIGINT) AS n_g,
        |    CAST(SUM(c_gv * rank2) AS BIGINT) AS r2_g
        |  FROM j GROUP BY 1),
        |ties AS (
        |  SELECT CAST(SUM(c_v) AS BIGINT) AS n,
        |    CAST(SUM(c_v * c_v * c_v - c_v) AS BIGINT) AS tie3
        |  FROM perval),
        |terms AS (
        |  SELECT n, tie3,
        |    ${qdecWideSql("(CAST(r2_g AS DOUBLE) / 2.0) " +
             "* (CAST(r2_g AS DOUBLE) / 2.0) / n_g", 28, 6)} AS term
        |  FROM grp, ties),
        |s AS (
        |  SELECT n, tie3, CAST(COUNT(*) AS BIGINT) AS k,
        |    SUM(term) AS sum_terms
        |  FROM terms GROUP BY 1, 2)
        |SELECT k, n,
        |  floor(((12.0 / (CAST(n AS DOUBLE) * (n + 1)))
        |      * CAST(sum_terms AS DOUBLE) - 3.0 * (n + 1))
        |    * 1000000.0 + 0.5) / 1000000.0 AS h,
        |  floor((((12.0 / (CAST(n AS DOUBLE) * (n + 1)))
        |      * CAST(sum_terms AS DOUBLE) - 3.0 * (n + 1))
        |    / (1.0 - CAST(tie3 AS DOUBLE)
        |      / (CAST(n AS DOUBLE) * n * n - n)))
        |    * 1000000.0 + 0.5) / 1000000.0 AS h_tie_corrected,
        |  CAST(k - 1 AS BIGINT) AS dof,
        |  CAST(CASE WHEN k - 1 = 4 AND
        |    (((12.0 / (CAST(n AS DOUBLE) * (n + 1)))
        |      * CAST(sum_terms AS DOUBLE) - 3.0 * (n + 1))
        |    / (1.0 - CAST(tie3 AS DOUBLE)
        |      / (CAST(n AS DOUBLE) * n * n - n))) > 9.488
        |    THEN 1 ELSE 0 END AS BIGINT) AS significant
        |FROM s""".stripMargin,
    "q316_bayesian_average" ->
      """WITH r AS (
        |  SELECT CAST(json_extract_string(props, '$.k') AS INT) AS item_id,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
        |  FROM events
        |  WHERE json_extract_string(props, '$.k') IS NOT NULL),
        |per AS (
        |  SELECT item_id, CAST(COUNT(*) AS BIGINT) AS v,
        |    CAST(SUM(cents) AS BIGINT) AS s
        |  FROM r GROUP BY 1),
        |g AS (SELECT CAST(SUM(s) AS BIGINT) AS ts,
        |             CAST(SUM(v) AS BIGINT) AS tv FROM per)
        |SELECT item_id, v,
        |  floor((CAST(s AS DOUBLE) / v / 100.0) * 1000000.0 + 0.5)
        |    / 1000000.0 AS mean_rating,
        |  floor(((s + 50.0 * (CAST(ts AS DOUBLE) / tv)) / (v + 50.0)
        |    / 100.0) * 1000000.0 + 0.5) / 1000000.0 AS bayes_score
        |FROM per, g
        |ORDER BY bayes_score DESC, item_id LIMIT 50""".stripMargin,
    "q317_listagg_segments" ->
      """WITH per AS (
        |  SELECT c_nationkey, c_mktsegment,
        |    CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
        |      AS BIGINT) AS rev_cents
        |  FROM customer JOIN orders ON c_custkey = o_custkey
        |  GROUP BY 1, 2)
        |SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS n_segments,
        |  CAST(SUM(rev_cents) AS BIGINT) AS nation_cents,
        |  string_agg(c_mktsegment, ','
        |    ORDER BY rev_cents DESC, c_mktsegment) AS segments_by_revenue
        |FROM per GROUP BY 1 ORDER BY 1""".stripMargin,
    "q313_xmr_chart" ->
      """WITH daily AS (
        |  SELECT (epoch_ns(l_shipdate) // 1000000000) // 86400 AS day,
        |    CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
        |      AS BIGINT) AS cents
        |  FROM lineitem GROUP BY 1),
        |mr AS (
        |  SELECT day, cents,
        |    abs(cents - LAG(cents) OVER (ORDER BY day)) AS mr
        |  FROM daily),
        |s AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
        |    CAST(SUM(cents) AS BIGINT) AS sum_cents,
        |    CAST(SUM(mr) AS BIGINT) AS sum_mr,
        |    CAST(COUNT(*) - 1 AS BIGINT) AS n_mr
        |  FROM mr),
        |lim AS (
        |  SELECT n_days,
        |    CAST(sum_cents AS DOUBLE) / n_days / 100.0 AS xbar,
        |    CAST(sum_mr AS DOUBLE) / n_mr / 100.0 AS mrbar
        |  FROM s),
        |v AS (
        |  SELECT CAST(SUM(CASE
        |      WHEN CAST(cents AS DOUBLE) / 100.0 > xbar + 2.66 * mrbar
        |        OR CAST(cents AS DOUBLE) / 100.0 < xbar - 2.66 * mrbar
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_violations
        |  FROM daily, lim)
        |SELECT n_days,
        |  floor(xbar * 1000000.0 + 0.5) / 1000000.0 AS xbar_dollars,
        |  floor(mrbar * 1000000.0 + 0.5) / 1000000.0 AS mrbar_dollars,
        |  floor((xbar + 2.66 * mrbar) * 1000000.0 + 0.5) / 1000000.0 AS ucl,
        |  floor((xbar - 2.66 * mrbar) * 1000000.0 + 0.5) / 1000000.0 AS lcl,
        |  n_violations
        |FROM lim, v""".stripMargin,
    "q314_packing_sweep" ->
      """WITH d AS (
        |  SELECT doc_id, source, lang,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, source, lang, n_tokens,
        |    SUM(n_tokens) OVER (PARTITION BY source, lang ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM d),
        |b AS (SELECT CAST(unnest([64, 128, 256]) AS BIGINT) AS budget),
        |ps AS (
        |  SELECT budget, source, lang,
        |    CAST(COUNT(*) AS BIGINT) AS docs,
        |    CAST(SUM(n_tokens) AS BIGINT) AS toks,
        |    CAST(SUM(CASE WHEN (cum - n_tokens) // budget
        |        <> (cum - 1) // budget THEN 1 ELSE 0 END) AS BIGINT)
        |      AS frag,
        |    CAST((MAX(cum) - 1) // budget + 1 AS BIGINT) AS bins
        |  FROM c, b GROUP BY 1, 2, 3)
        |SELECT budget, CAST(SUM(docs) AS BIGINT) AS n_docs,
        |  CAST(SUM(toks) AS BIGINT) AS n_tokens,
        |  CAST(SUM(frag) AS BIGINT) AS n_fragmented,
        |  CAST(SUM(bins) AS BIGINT) AS n_bins,
        |  floor((CAST(SUM(frag) AS DOUBLE) / SUM(docs))
        |    * 1000000.0 + 0.5) / 1000000.0 AS frag_rate,
        |  floor((1.0 - CAST(SUM(toks) AS DOUBLE) / (SUM(bins) * budget))
        |    * 1000000.0 + 0.5) / 1000000.0 AS waste_rate
        |FROM ps GROUP BY 1 ORDER BY 1""".stripMargin,
    "q309_safety_stock" ->
      """WITH li AS (
        |  SELECT l_partkey,
        |    (epoch_ns(l_shipdate) // 1000000000) // 86400 AS day,
        |    CAST(l_quantity AS BIGINT) AS qty
        |  FROM lineitem),
        |daily AS (
        |  SELECT l_partkey, day, CAST(SUM(qty) AS BIGINT) AS d
        |  FROM li GROUP BY 1, 2),
        |dd AS (SELECT MAX(day) - MIN(day) + 1 AS n_days FROM li),
        |per AS (
        |  SELECT l_partkey, CAST(SUM(d) AS BIGINT) AS sx,
        |    CAST(SUM(d * d) AS BIGINT) AS sxx,
        |    CAST(COUNT(*) AS BIGINT) AS n_active_days
        |  FROM daily GROUP BY 1)
        |SELECT l_partkey, sx AS total_qty, n_active_days,
        |  floor((CAST(sx AS DOUBLE) / n_days) * 1000000.0 + 0.5)
        |    / 1000000.0 AS mean_daily,
        |  floor(sqrt(CAST(sxx AS DOUBLE) / n_days
        |      - (CAST(sx AS DOUBLE) / n_days) * (CAST(sx AS DOUBLE) / n_days))
        |    * 1000000.0 + 0.5) / 1000000.0 AS std_daily,
        |  floor(((CAST(sx AS DOUBLE) / n_days) * 7.0
        |      + 1.645 * sqrt(CAST(sxx AS DOUBLE) / n_days
        |          - (CAST(sx AS DOUBLE) / n_days)
        |            * (CAST(sx AS DOUBLE) / n_days))
        |        * sqrt(7.0)) * 1000000.0 + 0.5) / 1000000.0 AS reorder_point
        |FROM per, dd ORDER BY total_qty DESC, l_partkey LIMIT 100""".stripMargin,
    "q310_interarrival_ks" ->
      """WITH e AS (
        |  SELECT event_type, epoch_ns(ts) AS tns, event_id FROM events),
        |g AS (
        |  SELECT event_type, event_id,
        |    tns - LAG(tns) OVER (PARTITION BY event_type
        |      ORDER BY tns, event_id) AS gap_ns
        |  FROM e),
        |gg AS (SELECT * FROM g WHERE gap_ns IS NOT NULL),
        |s AS (
        |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_gaps,
        |    CAST(SUM(gap_ns) AS BIGINT) AS sum_ns
        |  FROM gg GROUP BY 1),
        |r AS (
        |  SELECT gg.event_type, n_gaps, sum_ns,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY gg.event_type
        |      ORDER BY gap_ns, event_id) AS DOUBLE) AS i,
        |    1.0 - exp(-(CAST(gap_ns AS DOUBLE) * n_gaps
        |      / CAST(sum_ns AS DOUBLE))) AS fexp
        |  FROM gg JOIN s ON gg.event_type = s.event_type)
        |SELECT event_type, n_gaps,
        |  floor((CAST(sum_ns AS DOUBLE) / n_gaps / 1000000000.0)
        |    * 1000000.0 + 0.5) / 1000000.0 AS mean_gap_s,
        |  floor(MAX(GREATEST(i / n_gaps - fexp, fexp - (i - 1.0) / n_gaps))
        |    * 1000000.0 + 0.5) / 1000000.0 AS ks_d
        |FROM r GROUP BY 1, 2, sum_ns ORDER BY event_type""".stripMargin,
    "q311_capture_recapture" ->
      """WITH e AS (
        |  SELECT user_id, (epoch_ns(ts) // 1000000000) // 86400 AS day
        |  FROM events),
        |mid AS (SELECT (MIN(day) + MAX(day) + 1) // 2 AS mid FROM e),
        |u AS (
        |  SELECT user_id,
        |    MAX(CASE WHEN day < mid THEN 1 ELSE 0 END) AS in1,
        |    MAX(CASE WHEN day >= mid THEN 1 ELSE 0 END) AS in2
        |  FROM e, mid GROUP BY 1),
        |a AS (
        |  SELECT CAST(SUM(in1) AS BIGINT) AS n1,
        |    CAST(SUM(in2) AS BIGINT) AS n2,
        |    CAST(SUM(in1 * in2) AS BIGINT) AS m,
        |    CAST(COUNT(*) AS BIGINT) AS true_n
        |  FROM u)
        |SELECT n1, n2, m, true_n,
        |  floor(((n1 + 1.0) * (n2 + 1.0) / (m + 1.0) - 1.0)
        |    * 1000000.0 + 0.5) / 1000000.0 AS chapman_n
        |FROM a""".stripMargin,
    "q312_good_turing" ->
      """WITH t AS (
        |  SELECT source, unnest(string_split(text, ' ')) AS tok
        |  FROM documents),
        |c AS (
        |  SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM t GROUP BY 1, 2)
        |SELECT source, CAST(SUM(c) AS BIGINT) AS n_tokens,
        |  CAST(COUNT(*) AS BIGINT) AS vocab,
        |  CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax,
        |  floor((CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS DOUBLE)
        |    / SUM(c)) * 1000000.0 + 0.5) / 1000000.0 AS unseen_mass
        |FROM c GROUP BY 1 ORDER BY source""".stripMargin,
    "q306_k_anonymity" ->
      """WITH sens AS (
        |  SELECT DISTINCT o_custkey AS c_custkey, 1 AS s
        |  FROM orders WHERE o_orderstatus = 'F'),
        |qi AS (
        |  SELECT c_nationkey, c_mktsegment,
        |    CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_band,
        |    COALESCE(s, 0) AS sensitive
        |  FROM customer LEFT JOIN sens USING (c_custkey)),
        |g AS (
        |  SELECT c_nationkey, c_mktsegment, bal_band,
        |    CAST(COUNT(*) AS BIGINT) AS k,
        |    CAST(COUNT(DISTINCT sensitive) AS BIGINT) AS l
        |  FROM qi GROUP BY 1, 2, 3)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
        |  CAST(SUM(k) AS BIGINT) AS n_customers,
        |  CAST(MIN(k) AS BIGINT) AS min_k,
        |  CAST(SUM(CASE WHEN k < 5 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_groups_lt5,
        |  floor((CAST(SUM(CASE WHEN k < 5 THEN k ELSE 0 END) AS DOUBLE)
        |    / SUM(k)) * 1000000.0 + 0.5) / 1000000.0 AS pct_cust_lt5,
        |  CAST(SUM(CASE WHEN l = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_groups_l1,
        |  floor((CAST(SUM(CASE WHEN l = 1 THEN k ELSE 0 END) AS DOUBLE)
        |    / SUM(k)) * 1000000.0 + 0.5) / 1000000.0 AS pct_cust_l1
        |FROM g""".stripMargin,
    "q307_dp_counts" ->
      s"""WITH per AS (
         |  SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS n
         |  FROM customer GROUP BY 1),
         |r AS (
         |  SELECT c_nationkey, n,
         |    (CAST(((md5_number_lower('dp:' || c_nationkey::VARCHAR)
         |           & $H)::BIGINT % 4503599627370496) AS DOUBLE) + 0.5)
         |      / 4503599627370496.0 - 0.5 AS v
         |  FROM per)
         |SELECT c_nationkey,
         |  floor((n + CASE WHEN v >= 0 THEN -2.0 * ln(1.0 - 2.0 * v)
         |                  ELSE 2.0 * ln(1.0 + 2.0 * v) END)
         |    * 1000000.0 + 0.5) / 1000000.0 AS noisy_n
         |FROM r ORDER BY c_nationkey""".stripMargin,
    "q308_srm_check" ->
      s"""WITH c AS (
         |  SELECT DISTINCT event_type, user_id FROM events),
         |v AS (
         |  SELECT event_type,
         |    CASE WHEN ((md5_number_lower('ab:' || user_id::VARCHAR)
         |                & $H)::BIGINT % 2) = 0
         |         THEN 'A' ELSE 'B' END AS variant
         |  FROM c),
         |w AS (
         |  SELECT event_type,
         |    CAST(SUM(CASE WHEN variant = 'A' THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_a,
         |    CAST(SUM(CASE WHEN variant = 'B' THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_b
         |  FROM v GROUP BY 1)
         |SELECT event_type, n_a, n_b,
         |  floor((CAST(n_a - n_b AS DOUBLE) * (n_a - n_b) / (n_a + n_b))
         |    * 1000000.0 + 0.5) / 1000000.0 AS chi2,
         |  CAST(CASE WHEN (CAST(n_a - n_b AS DOUBLE) * (n_a - n_b)
         |    / (n_a + n_b)) > 3.841 THEN 1 ELSE 0 END AS BIGINT) AS srm_flag
         |FROM w ORDER BY event_type""".stripMargin,
    "q301_purged_cv" ->
      """WITH e AS (SELECT (epoch_ns(ts) // 1000000000) // 86400 AS day
        |           FROM events),
        |b AS (SELECT MIN(day) AS d0, MAX(day) - MIN(day) + 1 AS span FROM e),
        |f AS (SELECT CAST(unnest(generate_series(0, 4)) AS BIGINT) AS fold),
        |fb AS (SELECT fold,
        |         CAST(d0 + (span * fold) // 5 AS BIGINT) AS f0,
        |         CAST(d0 + (span * (fold + 1)) // 5 - 1 AS BIGINT) AS f1
        |       FROM f, b)
        |SELECT fold, f0, f1,
        |  CAST(SUM(CASE WHEN e.day BETWEEN f0 AND f1 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_valid,
        |  CAST(SUM(CASE WHEN e.day < f0 - 2 OR e.day > f1 + 2
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_train,
        |  CAST(SUM(CASE WHEN e.day NOT BETWEEN f0 AND f1
        |    AND e.day >= f0 - 2 AND e.day <= f1 + 2
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_purged
        |FROM e, fb GROUP BY 1, 2, 3 ORDER BY 1""".stripMargin,
    "q302_woe_encoding" ->
      """WITH per AS (
        |  SELECT o_orderpriority AS category, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_bad
        |  FROM orders GROUP BY 1),
        |tot AS (SELECT CAST(SUM(n_bad) AS BIGINT) AS bad_tot,
        |               CAST(SUM(n - n_bad) AS BIGINT) AS good_tot,
        |               CAST(COUNT(*) AS BIGINT) AS m FROM per)
        |SELECT category, n, n_bad,
        |  floor(ln(((n_bad + 0.5) / (bad_tot + 0.5 * m)) /
        |           ((n - n_bad + 0.5) / (good_tot + 0.5 * m)))
        |    * 1000000.0 + 0.5) / 1000000.0 AS woe,
        |  floor((((n_bad + 0.5) / (bad_tot + 0.5 * m)) -
        |         ((n - n_bad + 0.5) / (good_tot + 0.5 * m))) *
        |        ln(((n_bad + 0.5) / (bad_tot + 0.5 * m)) /
        |           ((n - n_bad + 0.5) / (good_tot + 0.5 * m)))
        |    * 1000000.0 + 0.5) / 1000000.0 AS iv
        |FROM per, tot ORDER BY category""".stripMargin,
    "q303_strat_match_att" ->
      """WITH spend AS (
        |  SELECT o_custkey,
        |    CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
        |      AS BIGINT) AS spend_cents
        |  FROM orders GROUP BY 1),
        |y AS (
        |  SELECT c_nationkey, CAST(floor(c_acctbal / 200) AS BIGINT)
        |      AS bal_bucket,
        |    CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS treated,
        |    COALESCE(spend_cents, 0) AS y
        |  FROM customer LEFT JOIN spend ON c_custkey = o_custkey),
        |s AS (
        |  SELECT c_nationkey, bal_bucket,
        |    CAST(SUM(treated) AS BIGINT) AS n_t,
        |    CAST(SUM(1 - treated) AS BIGINT) AS n_c,
        |    CAST(SUM(CASE WHEN treated = 1 THEN y ELSE 0 END) AS BIGINT)
        |      AS sum_t,
        |    CAST(SUM(CASE WHEN treated = 0 THEN y ELSE 0 END) AS BIGINT)
        |      AS sum_c
        |  FROM y GROUP BY 1, 2),
        |tot AS (SELECT CAST(SUM(treated) AS BIGINT) AS n_treated_total
        |        FROM y),
        |m AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_strata_matched,
        |    CAST(SUM(n_t) AS BIGINT) AS n_treated_matched,
        |    SUM(CAST(floor((CAST(sum_t AS DOUBLE) / n_t -
        |          CAST(sum_c AS DOUBLE) / n_c) * n_t
        |        * 1000000.0 + 0.5) / 1000000.0 AS DECIMAL(28,6))) AS wdiff
        |  FROM s WHERE n_t > 0 AND n_c > 0)
        |SELECT n_strata_matched, n_treated_matched,
        |  CAST(n_treated_total - n_treated_matched AS BIGINT)
        |    AS n_treated_dropped,
        |  floor((CAST(wdiff AS DOUBLE) / n_treated_matched / 100.0)
        |    * 10000.0 + 0.5) / 10000.0 AS att_dollars
        |FROM m, tot""".stripMargin,
    "q304_bh_fdr" ->
      s"""WITH u AS (SELECT DISTINCT user_id FROM events),
         |a AS (SELECT user_id,
         |        CASE WHEN ((md5_number_lower('ab:' || user_id::VARCHAR)
         |                    & $H)::BIGINT % 2) = 0
         |             THEN 'A' ELSE 'B' END AS variant FROM u),
         |nt AS (SELECT
         |  CAST(SUM(CASE WHEN variant = 'A' THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_a,
         |  CAST(SUM(CASE WHEN variant = 'B' THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_b FROM a),
         |um AS (SELECT user_id, event_type, MAX(value) AS mx
         |       FROM events GROUP BY 1, 2),
         |tests AS (SELECT event_type,
         |            CAST(unnest([50, 100, 150, 200]) AS BIGINT) AS thr
         |          FROM (SELECT DISTINCT event_type FROM events)),
         |conv AS (
         |  SELECT t.event_type, t.thr,
         |    CAST(SUM(CASE WHEN a.variant = 'A' THEN 1 ELSE 0 END)
         |      AS BIGINT) AS conv_a,
         |    CAST(SUM(CASE WHEN a.variant = 'B' THEN 1 ELSE 0 END)
         |      AS BIGINT) AS conv_b
         |  FROM um JOIN tests t
         |    ON um.event_type = t.event_type AND um.mx > t.thr
         |  JOIN a ON um.user_id = a.user_id
         |  GROUP BY 1, 2),
         |zr AS (
         |  SELECT c.event_type, c.thr,
         |    floor(((CAST(conv_a AS DOUBLE) / n_a
         |            - CAST(conv_b AS DOUBLE) / n_b) /
         |      sqrt((CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
         |           * (1.0 - CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
         |           * (1.0 / n_a + 1.0 / n_b)))
         |      * 1000000.0 + 0.5) / 1000000.0 AS z
         |  FROM conv c, nt
         |  WHERE conv_a + conv_b > 0 AND conv_a + conv_b < n_a + n_b),
         |px AS (SELECT event_type, thr, z, abs(z) / sqrt(2.0) AS x FROM zr),
         |pt AS (SELECT event_type, thr, z, x,
         |         1.0 / (1.0 + 0.3275911 * x) AS t FROM px),
         |ps AS (SELECT event_type, thr, z,
         |         floor(((((1.061405429 * t - 1.453152027) * t
         |           + 1.421413741) * t - 0.284496736) * t + 0.254829592) * t
         |           * exp(-x * x) * 1000000.0 + 0.5) / 1000000.0 AS p
         |       FROM pt),
         |ranked AS (SELECT event_type, thr, z, p,
         |    CAST(ROW_NUMBER() OVER (ORDER BY p, event_type, thr) AS BIGINT)
         |      AS rank,
         |    CAST(COUNT(*) OVER () AS BIGINT) AS m FROM ps),
         |istar AS (SELECT MAX(CASE WHEN p <= (rank * 0.1) / m
         |                     THEN rank END) AS i_star FROM ranked)
         |SELECT event_type, thr, z, p, rank,
         |  CAST(CASE WHEN rank <= COALESCE(i_star, 0) THEN 1 ELSE 0 END
         |    AS BIGINT) AS rejected
         |FROM ranked, istar ORDER BY rank""".stripMargin,
    "q305_source_datacard" ->
      """WITH base AS (
        |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |    CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
        |    CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
        |    CAST(COUNT(DISTINCT text) AS BIGINT) AS n_distinct_texts,
        |    floor(quantile_cont(n_chars, 0.5) * 1000000.0 + 0.5)
        |      / 1000000.0 AS p50_chars
        |  FROM documents GROUP BY 1),
        |tl AS (
        |  SELECT source, lang AS top_lang, cnt AS top_lang_n FROM (
        |    SELECT source, lang, COUNT(*) AS cnt,
        |      ROW_NUMBER() OVER (PARTITION BY source
        |        ORDER BY COUNT(*) DESC, lang) AS rn
        |    FROM documents GROUP BY source, lang) WHERE rn = 1)
        |SELECT b.source, n_docs, n_tokens, n_langs, top_lang,
        |  floor((CAST(top_lang_n AS DOUBLE) / n_docs) * 1000000.0 + 0.5)
        |    / 1000000.0 AS top_lang_share,
        |  floor((1.0 - CAST(n_distinct_texts AS DOUBLE) / n_docs)
        |    * 1000000.0 + 0.5) / 1000000.0 AS dup_pct,
        |  p50_chars
        |FROM base b JOIN tl ON b.source = tl.source
        |ORDER BY b.source""".stripMargin,
    // The oracle joins the UNBUCKETED parquet tables — matching results
    // prove the bucketed layout is lossless and the zero-exchange join
    // computes the same relation.
    "q298_bucketed_join" ->
      """SELECT o_orderpriority, COUNT(*) AS n_items,
        |  CAST(SUM(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT))
        |    AS BIGINT) AS revenue_cents,
        |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // The oracle filters the UNPARTITIONED events by the same day
    // predicate — matching results prove the runtime-pruned read is
    // lossless (the dim is exactly the day set the WHERE expresses).
    "q299_dpp_prune" ->
      """SELECT (epoch_ns(ts) // 1000000000) // 86400 AS day,
        |  COUNT(*) AS n_events,
        |  COUNT(DISTINCT user_id) AS n_users,
        |  CAST(SUM(CAST(floor(value * 100.0 + 0.5) / 100.0
        |    AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events
        |WHERE ((epoch_ns(ts) // 1000000000) // 86400) % 7 IN (0, 3)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // The oracle emulates the two-batch schema split arithmetically:
    // even doc_ids were written before n_chars existed, so the merged
    // read must surface exactly those rows with NULL.
    "q300_schema_evolution" ->
      """SELECT source, COUNT(*) AS n_docs,
        |  CAST(COUNT(CASE WHEN doc_id % 2 <> 0 THEN 1 END) AS BIGINT)
        |    AS n_with_chars,
        |  CAST(SUM(CASE WHEN doc_id % 2 <> 0 THEN n_chars END) AS BIGINT)
        |    AS chars_sum,
        |  CAST(COUNT(CASE WHEN doc_id % 2 = 0 THEN 1 END) AS BIGINT)
        |    AS n_legacy
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    "q278_waterfall_contribution" ->
      s"""WITH per AS (
         |  SELECT n_name AS nation,
         |    CAST(SUM(CASE WHEN year(CAST(o_orderdate AS DATE)) = 1996
         |      THEN CAST(floor(o_totalprice * 100.0 + 0.5) / 100.0
         |        AS DECIMAL(18,2)) END) AS DECIMAL(18,2)) AS rev_1996,
         |    CAST(SUM(CASE WHEN year(CAST(o_orderdate AS DATE)) = 1997
         |      THEN CAST(floor(o_totalprice * 100.0 + 0.5) / 100.0
         |        AS DECIMAL(18,2)) END) AS DECIMAL(18,2)) AS rev_1997
         |  $nationOrdersSql
         |  WHERE year(CAST(o_orderdate AS DATE)) IN (1996, 1997)
         |  GROUP BY 1),
         |d AS (SELECT *, CAST(rev_1997 - rev_1996 AS DECIMAL(18,2))
         |        AS delta FROM per),
         |t AS (SELECT CAST(SUM(delta) AS DECIMAL(18,2)) AS total_delta
         |      FROM d)
         |SELECT nation,
         |  floor(CAST(rev_1996 AS DOUBLE) * 100.0 + 0.5) / 100.0
         |    AS rev_1996,
         |  floor(CAST(rev_1997 AS DOUBLE) * 100.0 + 0.5) / 100.0
         |    AS rev_1997,
         |  floor(CAST(delta AS DOUBLE) * 100.0 + 0.5) / 100.0 AS delta,
         |  floor((CAST(delta AS DOUBLE) / CAST(total_delta AS DOUBLE))
         |    * 1000000.0 + 0.5) / 1000000.0 AS contribution_share
         |FROM d CROSS JOIN t
         |ORDER BY abs(delta) DESC, nation""".stripMargin,
    "q279_mase_scoring" ->
      s"""WITH RECURSIVE idx AS (
         |  SELECT nation, day, revenue,
         |         row_number() OVER (PARTITION BY nation ORDER BY day) AS i
         |  FROM (SELECT n_name AS nation,
         |          (epoch_ns(o_orderdate) // 1000000000) // 86400 AS day,
         |          CAST(SUM(CAST(floor(o_totalprice * 100.0 + 0.5) / 100.0 AS DECIMAL(18,2))) AS DOUBLE)
         |            AS revenue
         |        $nationOrdersSql
         |        GROUP BY 1, 2)),
         |${holtChainCte("idx", "rec", "nation")},
         |f AS (SELECT nation, day, revenue, l + b AS fc FROM rec),
         |p AS (SELECT nation, day, revenue,
         |        lag(fc) OVER w AS pfc,
         |        lag(revenue, 7) OVER w AS nv
         |      FROM f WINDOW w AS (PARTITION BY nation ORDER BY day)),
         |e AS (
         |  SELECT nation,
         |    CAST(floor(abs(revenue - pfc) * 1000000.0 + 0.5)
         |      / 1000000.0 AS DECIMAL(18,6)) AS em,
         |    CAST(floor(abs(revenue - nv) * 1000000.0 + 0.5)
         |      / 1000000.0 AS DECIMAL(18,6)) AS en
         |  FROM p WHERE pfc IS NOT NULL AND nv IS NOT NULL)
         |SELECT nation, CAST(count(*) AS BIGINT) AS n_scored,
         |  floor((CAST(SUM(em) AS DOUBLE) / count(*)) * 1000000.0 + 0.5)
         |    / 1000000.0 AS mae_model,
         |  floor((CAST(SUM(en) AS DOUBLE) / count(*)) * 1000000.0 + 0.5)
         |    / 1000000.0 AS mae_naive,
         |  floor((CAST(SUM(em) AS DOUBLE) / CAST(SUM(en) AS DOUBLE))
         |    * 1000000.0 + 0.5) / 1000000.0 AS mase
         |FROM e GROUP BY 1 ORDER BY 1""".stripMargin,
    "q277_rank_biased_overlap" -> rboOracle,
    "q275_backlog_aging" ->
      """WITH o AS (
        |  SELECT o_orderstatus,
        |    (epoch_ns(o_orderdate) // 1000000000) // 86400 AS day,
        |    CAST(floor(o_totalprice * 100.0 + 0.5) / 100.0
        |      AS DECIMAL(18,2)) AS p
        |  FROM orders),
        |aod AS (SELECT MAX(day) AS aod FROM o),
        |b AS (
        |  SELECT CASE WHEN aod - day <= 30 THEN 'a_0_30d'
        |      WHEN aod - day <= 90 THEN 'b_31_90d'
        |      WHEN aod - day <= 365 THEN 'c_91_365d'
        |      ELSE 'd_over_1y' END AS bucket, p
        |  FROM o CROSS JOIN aod WHERE o_orderstatus = 'O')
        |SELECT bucket, CAST(count(*) AS BIGINT) AS n_orders,
        |  floor(CAST(SUM(p) AS DOUBLE) * 100.0 + 0.5) / 100.0
        |    AS open_value
        |FROM b GROUP BY 1 ORDER BY bucket""".stripMargin,
    "q276_lorenz_gini" ->
      """WITH c AS (
        |  SELECT o_custkey,
        |    CAST(CAST(SUM(CAST(floor(o_totalprice * 100.0 + 0.5) / 100.0
        |      AS DECIMAL(18,2))) AS DECIMAL(18,2)) * 100 AS HUGEINT)
        |      AS v
        |  FROM orders GROUP BY 1),
        |r AS (
        |  SELECT o_custkey, v,
        |    row_number() OVER (ORDER BY v, o_custkey) AS rn,
        |    COUNT(*) OVER () AS n_total
        |  FROM c),
        |gi AS (
        |  SELECT CAST((2 * (2 * SUM(CAST(rn AS HUGEINT) * v)
        |      - (CAST(MAX(n_total) AS HUGEINT) + 1) * SUM(v)) * 1000000
        |      + CAST(MAX(n_total) AS HUGEINT) * SUM(v))
        |    // (2 * CAST(MAX(n_total) AS HUGEINT) * SUM(v)) AS BIGINT)
        |    AS gini_ppm
        |  FROM r),
        |d AS (
        |  SELECT ((rn - 1) * 10) // n_total + 1 AS decile, v FROM r),
        |g AS (
        |  SELECT decile, CAST(count(*) AS BIGINT) AS n_customers,
        |    SUM(v) AS vd
        |  FROM d GROUP BY 1),
        |w AS (
        |  SELECT decile, n_customers, vd,
        |    SUM(vd) OVER (ORDER BY decile ROWS UNBOUNDED PRECEDING)
        |      AS cum_v,
        |    SUM(vd) OVER () AS tot_v
        |  FROM g)
        |SELECT decile, n_customers,
        |  CAST((2 * vd * 1000000 + tot_v) // (2 * tot_v) AS BIGINT)
        |    AS share_ppm,
        |  CAST((2 * cum_v * 1000000 + tot_v) // (2 * tot_v) AS BIGINT)
        |    AS cum_share_ppm,
        |  gini_ppm
        |FROM w CROSS JOIN gi ORDER BY decile""".stripMargin,
    "q272_same_store_growth" ->
      """WITH o AS (
        |  SELECT o_custkey, year(CAST(o_orderdate AS DATE)) AS yr,
        |    CAST(floor(o_totalprice * 100.0 + 0.5) / 100.0
        |      AS DECIMAL(18,2)) AS p
        |  FROM orders
        |  WHERE year(CAST(o_orderdate AS DATE)) IN (1996, 1997)),
        |bo AS (
        |  SELECT o_custkey FROM o GROUP BY 1
        |  HAVING count(DISTINCT yr) = 2),
        |alla AS (
        |  SELECT CAST(SUM(CASE WHEN yr = 1996 THEN p END)
        |      AS DECIMAL(18,2)) AS rev0_all,
        |    CAST(SUM(CASE WHEN yr = 1997 THEN p END) AS DECIMAL(18,2))
        |      AS rev1_all
        |  FROM o),
        |sm AS (
        |  SELECT CAST(SUM(CASE WHEN yr = 1996 THEN p END)
        |      AS DECIMAL(18,2)) AS rev0_same,
        |    CAST(SUM(CASE WHEN yr = 1997 THEN p END) AS DECIMAL(18,2))
        |      AS rev1_same
        |  FROM o WHERE o_custkey IN (SELECT o_custkey FROM bo)),
        |nb AS (SELECT CAST(count(*) AS BIGINT) AS n_comparable FROM bo)
        |SELECT n_comparable,
        |  floor(CAST(rev0_all AS DOUBLE) * 100.0 + 0.5) / 100.0
        |    AS rev0_all,
        |  floor(CAST(rev1_all AS DOUBLE) * 100.0 + 0.5) / 100.0
        |    AS rev1_all,
        |  floor((CAST(rev1_all - rev0_all AS DOUBLE)
        |    / CAST(rev0_all AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0
        |    AS growth_all,
        |  floor(CAST(rev0_same AS DOUBLE) * 100.0 + 0.5) / 100.0
        |    AS rev0_same,
        |  floor(CAST(rev1_same AS DOUBLE) * 100.0 + 0.5) / 100.0
        |    AS rev1_same,
        |  floor((CAST(rev1_same - rev0_same AS DOUBLE)
        |    / CAST(rev0_same AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0
        |    AS growth_same
        |FROM alla CROSS JOIN sm CROSS JOIN nb""".stripMargin,
    "q271_price_volume_bridge" ->
      """WITH base AS (
        |  SELECT l_partkey, year(CAST(l_shipdate AS DATE)) AS yr,
        |    CAST(SUM(CAST(l_quantity AS BIGINT)) AS HUGEINT) AS q,
        |    SUM(CAST(floor(l_extendedprice * 100.0 + 0.5) AS HUGEINT))
        |      AS r
        |  FROM lineitem
        |  WHERE year(CAST(l_shipdate AS DATE)) IN (1996, 1997)
        |  GROUP BY 1, 2),
        |b2 AS (
        |  SELECT *, CAST((2 * r * 10000 + q) // (2 * q) AS BIGINT) AS p
        |  FROM base),
        |y0 AS (SELECT l_partkey, q AS q0, r AS r0, p AS p0 FROM b2
        |       WHERE yr = 1996),
        |y1 AS (SELECT l_partkey, q AS q1, r AS r1, p AS p1 FROM b2
        |       WHERE yr = 1997),
        |j AS (SELECT * FROM y0 FULL OUTER JOIN y1 USING (l_partkey)),
        |agg AS (
        |  SELECT
        |    CAST(SUM(CASE WHEN p0 IS NOT NULL AND p1 IS NOT NULL THEN 1
        |      ELSE 0 END) AS BIGINT) AS n_common,
        |    CAST(SUM(CASE WHEN p0 IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_new,
        |    CAST(SUM(CASE WHEN p1 IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_discontinued,
        |    CAST(SUM((COALESCE(r1, 0) - COALESCE(r0, 0)) * 10000)
        |      AS BIGINT) AS delta_rev_microcents,
        |    CAST(SUM(CASE WHEN p0 IS NOT NULL AND p1 IS NOT NULL
        |      THEN CAST(p1 - p0 AS HUGEINT) * q1 ELSE 0 END)
        |      AS BIGINT) AS price_effect,
        |    CAST(SUM(CASE WHEN p0 IS NOT NULL AND p1 IS NOT NULL
        |      THEN CAST(p0 AS HUGEINT) * (q1 - q0) ELSE 0 END)
        |      AS BIGINT) AS volume_effect,
        |    CAST(SUM(CASE WHEN p0 IS NULL THEN r1 * 10000 ELSE 0 END)
        |      AS BIGINT) AS new_effect,
        |    CAST(SUM(CASE WHEN p1 IS NULL THEN -r0 * 10000 ELSE 0 END)
        |      AS BIGINT) AS discontinued_effect
        |  FROM j)
        |SELECT *, CAST(delta_rev_microcents - price_effect
        |    - volume_effect - new_effect - discontinued_effect
        |    AS BIGINT) AS residual_microcents
        |FROM agg""".stripMargin,
    "q270_abc_xyz_matrix" ->
      """WITH li AS (
        |  SELECT l_partkey,
        |    (epoch_ns(l_shipdate) // 1000000000) // 604800 AS wk,
        |    CAST(l_quantity AS BIGINT) AS qty,
        |    CAST(floor(l_extendedprice * 100.0 + 0.5) AS HUGEINT)
        |      AS cents
        |  FROM lineitem),
        |v AS (SELECT l_partkey, SUM(cents) AS v FROM li GROUP BY 1),
        |a AS (
        |  SELECT l_partkey, v,
        |    SUM(v) OVER (ORDER BY v DESC, l_partkey
        |      ROWS UNBOUNDED PRECEDING) AS cum,
        |    SUM(v) OVER () AS tot
        |  FROM v),
        |abc AS (
        |  SELECT l_partkey, v,
        |    CASE WHEN 5 * cum <= 4 * tot THEN 'A'
        |      WHEN 20 * cum <= 19 * tot THEN 'B' ELSE 'C' END
        |      AS abc_class
        |  FROM a),
        |weekly AS (
        |  SELECT l_partkey, wk, CAST(SUM(qty) AS HUGEINT) AS q
        |  FROM li GROUP BY 1, 2),
        |st AS (
        |  SELECT l_partkey, CAST(count(*) AS BIGINT) AS n,
        |    SUM(q) AS sq, SUM(q * q) AS sqq
        |  FROM weekly GROUP BY 1),
        |xyz AS (
        |  SELECT l_partkey,
        |    CASE WHEN n < 2 THEN NULL
        |      ELSE floor((sqrt(CAST(n * sqq - sq * sq AS DOUBLE)
        |          / CAST(CAST(n AS HUGEINT) * (n - 1) AS DOUBLE))
        |        / (CAST(sq AS DOUBLE) / n)) * 1000000.0 + 0.5)
        |        / 1000000.0 END AS cv
        |  FROM st),
        |xc AS (
        |  SELECT l_partkey,
        |    CASE WHEN cv IS NULL THEN 'Z'
        |      WHEN cv < 0.5 THEN 'X'
        |      WHEN cv < 1.0 THEN 'Y' ELSE 'Z' END AS xyz_class
        |  FROM xyz)
        |SELECT abc_class, xyz_class, CAST(count(*) AS BIGINT) AS n_parts,
        |  CAST(SUM(v) AS BIGINT) AS value_cents
        |FROM abc JOIN xc USING (l_partkey)
        |GROUP BY 1, 2 ORDER BY abc_class, xyz_class""".stripMargin,
    "q264_kendall_tau" ->
      """WITH j AS (
        |  SELECT epoch_ns(ts) // 86400000000000 AS day,
        |    CAST(CAST(SUM(CASE WHEN event_type = 'purchase'
        |        THEN CAST(floor("value" * 100.0 + 0.5) / 100.0
        |          AS DECIMAL(7,2)) ELSE 0 END) AS DECIMAL(18,2)) * 100
        |      AS HUGEINT) AS x,
        |    CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
        |      AS HUGEINT) AS y
        |  FROM events GROUP BY 1),
        |p AS (
        |  SELECT
        |    CAST(SUM(CASE WHEN (b.x > a.x AND b.y > a.y)
        |        OR (b.x < a.x AND b.y < a.y) THEN 1 ELSE 0 END)
        |      AS BIGINT) AS concordant,
        |    CAST(SUM(CASE WHEN (b.x > a.x AND b.y < a.y)
        |        OR (b.x < a.x AND b.y > a.y) THEN 1 ELSE 0 END)
        |      AS BIGINT) AS discordant,
        |    CAST(SUM(CASE WHEN b.x = a.x AND b.y <> a.y THEN 1 ELSE 0
        |      END) AS BIGINT) AS ties_x,
        |    CAST(SUM(CASE WHEN b.x <> a.x AND b.y = a.y THEN 1 ELSE 0
        |      END) AS BIGINT) AS ties_y
        |  FROM j a JOIN j b ON a.day < b.day),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n_obs FROM j)
        |SELECT n_obs, concordant, discordant, ties_x, ties_y,
        |  floor((CAST(concordant - discordant AS DOUBLE) /
        |    sqrt(CAST(concordant + discordant + ties_x AS DOUBLE) *
        |         CAST(concordant + discordant + ties_y AS DOUBLE)))
        |    * 1000000.0 + 0.5) / 1000000.0 AS tau_b
        |FROM p CROSS JOIN n""".stripMargin,
    "q259_mann_kendall" ->
      s"""WITH daily AS (
         |  SELECT nation, day,
         |    CAST(CAST(SUM(p) AS DECIMAL(18,2)) * 100 AS HUGEINT) AS xc
         |  FROM (SELECT n_name AS nation,
         |          (epoch_ns(o_orderdate) // 1000000000) // 86400 AS day,
         |          CAST(floor(o_totalprice * 100.0 + 0.5) / 100.0
         |            AS DECIMAL(18,2)) AS p
         |        $nationOrdersSql)
         |  GROUP BY 1, 2),
         |p AS (
         |  SELECT a.nation,
         |    CAST(SUM(CASE WHEN b.xc > a.xc THEN 1
         |      WHEN b.xc < a.xc THEN -1 ELSE 0 END) AS BIGINT) AS s_stat
         |  FROM daily a JOIN daily b
         |    ON b.nation = a.nation AND a.day < b.day
         |  GROUP BY 1),
         |t AS (
         |  SELECT nation,
         |    CAST(COALESCE(SUM(CASE WHEN c > 1
         |      THEN c * (c - 1) * (2 * c + 5) ELSE 0 END), 0) AS BIGINT)
         |      AS tie_term
         |  FROM (SELECT nation, xc, CAST(count(*) AS BIGINT) AS c
         |        FROM daily GROUP BY 1, 2)
         |  GROUP BY 1),
         |nn AS (SELECT nation, CAST(count(*) AS BIGINT) AS n
         |       FROM daily GROUP BY 1),
         |f AS (
         |  SELECT nn.nation, nn.n AS n_days, p.s_stat,
         |    nn.n * (nn.n - 1) * (2 * nn.n + 5) - t.tie_term AS var18
         |  FROM nn JOIN p ON nn.nation = p.nation
         |          JOIN t ON nn.nation = t.nation),
         |z AS (
         |  SELECT nation, n_days, s_stat, var18,
         |    floor((CASE WHEN s_stat > 0
         |        THEN CAST(s_stat - 1 AS DOUBLE)
         |          / sqrt(CAST(var18 AS DOUBLE) / 18.0)
         |      WHEN s_stat < 0
         |        THEN CAST(s_stat + 1 AS DOUBLE)
         |          / sqrt(CAST(var18 AS DOUBLE) / 18.0)
         |      ELSE 0.0 END) * 1000000.0 + 0.5) / 1000000.0 AS z
         |  FROM f)
         |SELECT nation, n_days, s_stat, var18, z,
         |  (abs(z) > 1.96) AS trending
         |FROM z ORDER BY nation""".stripMargin,
    "q260_spearman" ->
      """WITH j AS (
        |  SELECT epoch_ns(ts) // 86400000000000 AS day,
        |    CAST(CAST(SUM(CASE WHEN event_type = 'purchase'
        |        THEN CAST(floor("value" * 100.0 + 0.5) / 100.0
        |          AS DECIMAL(7,2)) ELSE 0 END) AS DECIMAL(18,2)) * 100
        |      AS HUGEINT) AS x,
        |    CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
        |      AS HUGEINT) AS y
        |  FROM events GROUP BY 1),
        |rx AS (
        |  SELECT x, 2 * COALESCE(SUM(c) OVER (ORDER BY x
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |    + c + 1 AS r2x
        |  FROM (SELECT x, CAST(count(*) AS HUGEINT) AS c
        |        FROM j GROUP BY 1)),
        |ry AS (
        |  SELECT y, 2 * COALESCE(SUM(c) OVER (ORDER BY y
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |    + c + 1 AS r2y
        |  FROM (SELECT y, CAST(count(*) AS HUGEINT) AS c
        |        FROM j GROUP BY 1)),
        |st AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |    SUM(r2x) AS sx, SUM(r2y) AS sy,
        |    SUM(r2x * r2y) AS sxy, SUM(r2x * r2x) AS sxx,
        |    SUM(r2y * r2y) AS syy
        |  FROM j JOIN rx USING (x) JOIN ry USING (y))
        |SELECT n AS n_days,
        |  floor((CAST(n * sxy - sx * sy AS DOUBLE) /
        |    (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) *
        |     sqrt(CAST(n * syy - sy * sy AS DOUBLE)))) * 1000000.0
        |    + 0.5) / 1000000.0 AS spearman_rho
        |FROM st""".stripMargin,
    "q256_bivariate_ols" ->
      """WITH li AS (
        |  SELECT n_name AS nation,
        |    CAST(l_quantity AS BIGINT) AS x1,
        |    CAST(CAST(floor(l_discount * 100.0 + 0.5) / 100.0
        |      AS DECIMAL(4,2)) * 100 AS BIGINT) AS x2,
        |    CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS y
        |  FROM lineitem
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey),
        |st AS (
        |  SELECT nation, CAST(count(*) AS BIGINT) AS n,
        |    SUM(CAST(x1 AS HUGEINT)) AS s1, SUM(CAST(x2 AS HUGEINT)) AS s2,
        |    SUM(CAST(y AS HUGEINT)) AS sy,
        |    SUM(CAST(x1 AS HUGEINT) * x1) AS s11,
        |    SUM(CAST(x2 AS HUGEINT) * x2) AS s22,
        |    SUM(CAST(x1 AS HUGEINT) * x2) AS s12,
        |    SUM(CAST(x1 AS HUGEINT) * y) AS s1y,
        |    SUM(CAST(x2 AS HUGEINT) * y) AS s2y
        |  FROM li GROUP BY 1),
        |c AS (
        |  SELECT nation, n,
        |    CAST(n * s11 - s1 * s1 AS DOUBLE) AS c11,
        |    CAST(n * s22 - s2 * s2 AS DOUBLE) AS c22,
        |    CAST(n * s12 - s1 * s2 AS DOUBLE) AS c12,
        |    CAST(n * s1y - s1 * sy AS DOUBLE) AS c1y,
        |    CAST(n * s2y - s2 * sy AS DOUBLE) AS c2y
        |  FROM st),
        |d AS (SELECT *, c11 * c22 - c12 * c12 AS det FROM c)
        |SELECT nation, n AS n_rows,
        |  floor(((c22 * c1y - c12 * c2y) / det) * 1000000.0 + 0.5)
        |    / 1000000.0 AS beta_qty_cents,
        |  floor(((c11 * c2y - c12 * c1y) / det) * 1000000.0 + 0.5)
        |    / 1000000.0 AS beta_discpct_cents
        |FROM d ORDER BY nation""".stripMargin,
    "q258_partial_corr" ->
      """WITH j AS (
        |  SELECT epoch_ns(ts) // 86400000000000 AS day,
        |    CAST(CAST(SUM(CASE WHEN event_type = 'purchase'
        |        THEN CAST(floor("value" * 100.0 + 0.5) / 100.0
        |          AS DECIMAL(7,2)) ELSE 0 END) AS DECIMAL(18,2)) * 100
        |      AS HUGEINT) AS x,
        |    CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
        |      AS HUGEINT) AS y,
        |    CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
        |      AS HUGEINT) AS z
        |  FROM events GROUP BY 1),
        |st AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |    SUM(x) AS sx, SUM(y) AS sy, SUM(z) AS sz,
        |    SUM(x * y) AS sxy, SUM(x * z) AS sxz, SUM(y * z) AS syz,
        |    SUM(x * x) AS sxx, SUM(y * y) AS syy, SUM(z * z) AS szz
        |  FROM j),
        |r AS (
        |  SELECT n,
        |    floor((CAST(n * sxy - sx * sy AS DOUBLE) /
        |      (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) *
        |       sqrt(CAST(n * syy - sy * sy AS DOUBLE)))) * 1000000.0
        |      + 0.5) / 1000000.0 AS r_xy,
        |    floor((CAST(n * sxz - sx * sz AS DOUBLE) /
        |      (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) *
        |       sqrt(CAST(n * szz - sz * sz AS DOUBLE)))) * 1000000.0
        |      + 0.5) / 1000000.0 AS r_xz,
        |    floor((CAST(n * syz - sz * sy AS DOUBLE) /
        |      (sqrt(CAST(n * szz - sz * sz AS DOUBLE)) *
        |       sqrt(CAST(n * syy - sy * sy AS DOUBLE)))) * 1000000.0
        |      + 0.5) / 1000000.0 AS r_zy
        |  FROM st)
        |SELECT n AS n_days, r_xy, r_xz, r_zy,
        |  floor(((r_xy - r_xz * r_zy) /
        |    sqrt((1.0 - r_xz * r_xz) * (1.0 - r_zy * r_zy)))
        |    * 1000000.0 + 0.5) / 1000000.0 AS partial_xy_given_z
        |FROM r""".stripMargin,
    "q250_forecast_reconciliation" ->
      s"""WITH RECURSIVE idxn AS (
         |  SELECT nation, day, revenue,
         |         row_number() OVER (PARTITION BY nation ORDER BY day) AS i
         |  FROM (SELECT n_name AS nation,
         |          (epoch_ns(o_orderdate) // 1000000000) // 86400 AS day,
         |          CAST(SUM(CAST(floor(o_totalprice * 100.0 + 0.5) / 100.0 AS DECIMAL(18,2))) AS DOUBLE)
         |            AS revenue
         |        $nationOrdersSql
         |        GROUP BY 1, 2)),
         |${holtChainCte("idxn", "recn", "nation")},
         |idxr AS (
         |  SELECT region, day, revenue,
         |         row_number() OVER (PARTITION BY region ORDER BY day) AS i
         |  FROM (SELECT r_name AS region,
         |          (epoch_ns(o_orderdate) // 1000000000) // 86400 AS day,
         |          CAST(SUM(CAST(floor(o_totalprice * 100.0 + 0.5) / 100.0 AS DECIMAL(18,2))) AS DOUBLE)
         |            AS revenue
         |        $nationOrdersSql
         |        JOIN region ON n_regionkey = r_regionkey
         |        GROUP BY 1, 2)),
         |${holtChainCte("idxr", "recr", "region")},
         |nf AS (
         |  SELECT nation, day,
         |    CAST(floor((l + b) * 1000000.0 + 0.5) / 1000000.0
         |      AS DECIMAL(18,6)) AS f6
         |  FROM recn),
         |nr AS (SELECT n_name AS nation, r_name AS region
         |       FROM nation JOIN region ON n_regionkey = r_regionkey),
         |bu AS (
         |  SELECT region, day, CAST(count(*) AS BIGINT) AS n_nations,
         |    SUM(f6) AS f_bu
         |  FROM nf JOIN nr USING (nation) GROUP BY 1, 2),
         |dir AS (
         |  SELECT region, day,
         |    floor((l + b) * 1000000.0 + 0.5) / 1000000.0 AS f_direct
         |  FROM recr)
         |SELECT bu.region, bu.day, n_nations,
         |  CAST(f_bu AS DOUBLE) AS f_bottom_up, f_direct,
         |  floor((CAST(f_bu AS DOUBLE) - f_direct) * 1000000.0 + 0.5)
         |    / 1000000.0 AS recon_gap
         |FROM bu JOIN dir ON bu.region = dir.region AND bu.day = dir.day
         |ORDER BY bu.region, bu.day""".stripMargin,
    "q251_winsorized_means" ->
      """WITH e AS (
        |  SELECT event_type,
        |    CAST(floor("value" * 100.0 + 0.5) / 100.0 AS DECIMAL(7,2)) AS v
        |  FROM events),
        |byv AS (SELECT event_type, v, count(*) AS c FROM e GROUP BY 1, 2),
        |w AS (
        |  SELECT event_type, v, c,
        |    SUM(c) OVER (PARTITION BY event_type ORDER BY v
        |      ROWS UNBOUNDED PRECEDING) AS cum,
        |    SUM(c) OVER (PARTITION BY event_type) AS tot
        |  FROM byv),
        |caps AS (
        |  SELECT event_type,
        |    MIN(CASE WHEN cum * 20 >= tot * 19 THEN v END) AS cap95,
        |    MIN(CASE WHEN cum * 100 >= tot * 99 THEN v END) AS cap99
        |  FROM w GROUP BY 1),
        |j AS (
        |  SELECT e.event_type, c.cap95, c.cap99,
        |    CAST(count(*) AS BIGINT) AS n, SUM(e.v) AS sv,
        |    SUM(least(e.v, c.cap95)) AS sw95,
        |    SUM(least(e.v, c.cap99)) AS sw99,
        |    CAST(SUM(CASE WHEN e.v > c.cap95 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS nc95
        |  FROM e JOIN caps c USING (event_type)
        |  GROUP BY 1, 2, 3)
        |SELECT event_type, n,
        |  floor(CAST(cap95 AS DOUBLE) * 100.0 + 0.5) / 100.0 AS cap95,
        |  floor(CAST(cap99 AS DOUBLE) * 100.0 + 0.5) / 100.0 AS cap99,
        |  floor((CAST(sv AS DOUBLE) / CAST(n AS DOUBLE)) * 1000000.0
        |    + 0.5) / 1000000.0 AS mean_raw,
        |  floor((CAST(sw95 AS DOUBLE) / CAST(n AS DOUBLE)) * 1000000.0
        |    + 0.5) / 1000000.0 AS mean_wins95,
        |  floor((CAST(sw99 AS DOUBLE) / CAST(n AS DOUBLE)) * 1000000.0
        |    + 0.5) / 1000000.0 AS mean_wins99,
        |  CAST((2 * nc95 * 1000000 + n) // (2 * n) AS BIGINT)
        |    AS capped95_ppm
        |FROM j ORDER BY event_type""".stripMargin,
    "q247_max_drawdown" ->
      s"""WITH daily AS (
         |  SELECT nation, day,
         |    CAST(CAST(SUM(p) AS DECIMAL(18,2)) * 100 AS HUGEINT) AS xc
         |  FROM (SELECT n_name AS nation,
         |          (epoch_ns(o_orderdate) // 1000000000) // 86400 AS day,
         |          CAST(floor(o_totalprice * 100.0 + 0.5) / 100.0
         |            AS DECIMAL(18,2)) AS p
         |        $nationOrdersSql)
         |  GROUP BY 1, 2),
         |dd AS (
         |  SELECT nation, day, xc,
         |    MAX(xc) OVER (PARTITION BY nation ORDER BY day
         |      ROWS UNBOUNDED PRECEDING) AS peak
         |  FROM daily),
         |r AS (
         |  SELECT nation, day, xc, peak,
         |    CAST((2 * (peak - xc) * 1000000 + peak) // (2 * peak)
         |      AS BIGINT) AS dd_ppm
         |  FROM dd),
         |rk AS (
         |  SELECT *, row_number() OVER (PARTITION BY nation
         |    ORDER BY dd_ppm DESC, day) AS rk
         |  FROM r)
         |SELECT nation, day AS trough_day,
         |  CAST(xc AS BIGINT) AS trough_cents,
         |  CAST(peak AS BIGINT) AS peak_cents,
         |  dd_ppm AS max_drawdown_ppm
         |FROM rk WHERE rk = 1 ORDER BY nation""".stripMargin,
    "q243_holt_winters" -> holtWintersOracle,
    "q238_concentration" ->
      """WITH s AS (
        |  SELECT n_name AS nation, l_suppkey,
        |    SUM(CAST(floor(l_extendedprice * 100.0 + 0.5) AS HUGEINT))
        |      // 100 AS su
        |  FROM lineitem
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  GROUP BY 1, 2),
        |r AS (
        |  SELECT nation, l_suppkey, su,
        |    row_number() OVER (PARTITION BY nation
        |      ORDER BY su DESC, l_suppkey) AS rk
        |  FROM s),
        |a AS (
        |  SELECT nation, CAST(count(*) AS BIGINT) AS n_suppliers,
        |    SUM(su) AS tot, SUM(su * su) AS ssq,
        |    SUM(CASE WHEN rk <= 1 THEN su ELSE 0 END) AS t1,
        |    SUM(CASE WHEN rk <= 3 THEN su ELSE 0 END) AS t3
        |  FROM r GROUP BY 1)
        |SELECT nation, n_suppliers,
        |  CAST(tot AS BIGINT) AS total_units,
        |  CAST((2 * ssq * 1000000 + tot * tot) // (2 * tot * tot)
        |    AS BIGINT) AS hhi_ppm,
        |  CAST((2 * tot * tot * 1000000 + ssq) // (2 * ssq)
        |    AS BIGINT) AS effn_micro,
        |  CAST((2 * t1 * 1000000 + tot) // (2 * tot) AS BIGINT) AS top1_ppm,
        |  CAST((2 * t3 * 1000000 + tot) // (2 * tot) AS BIGINT) AS top3_ppm
        |FROM a ORDER BY nation""".stripMargin,
    "q239_acf_ljungbox" -> acfOracle,
    "q235_table_diff" ->
      s"""WITH o AS (
         |  SELECT *, epoch_ns(o_orderdate) // 1000000000 AS od
         |  FROM orders),
         |a AS (
         |  SELECT o_orderkey AS k,
         |    CAST(md5_number_lower(concat_ws('|', o_orderkey, o_custkey,
         |      o_orderstatus, o_orderpriority)) & $H AS BIGINT) AS ha
         |  FROM o WHERE od < 915148800),
         |b AS (
         |  SELECT o_orderkey AS k,
         |    CAST(md5_number_lower(concat_ws('|', o_orderkey, o_custkey,
         |      o_orderstatus,
         |      CASE WHEN o_orderkey % 7 = 0 THEN '9-SIMULATED'
         |           ELSE o_orderpriority END)) & $H AS BIGINT) AS hb
         |  FROM o WHERE od < 946684800 AND o_orderkey % 13 <> 0),
         |j AS (
         |  SELECT COALESCE(a.k, b.k) AS k,
         |    CASE WHEN a.ha IS NULL THEN 'added'
         |         WHEN b.hb IS NULL THEN 'removed'
         |         WHEN a.ha <> b.hb THEN 'changed'
         |         ELSE 'unchanged' END AS diff_class
         |  FROM a FULL OUTER JOIN b ON a.k = b.k)
         |SELECT diff_class, CAST(count(*) AS BIGINT) AS n_rows,
         |  MIN(k) AS min_key, MAX(k) AS max_key
         |FROM j GROUP BY 1 ORDER BY 1""".stripMargin,
    "q236_fifo_valuation" ->
      """WITH li AS (
        |  SELECT l_partkey, l_returnflag,
        |    CAST(l_quantity AS BIGINT) AS qty,
        |    CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)
        |      // CAST(l_quantity AS BIGINT) AS unit_cents,
        |    l_shipdate, l_orderkey, l_linenumber
        |  FROM lineitem),
        |d AS (
        |  SELECT l_partkey, CAST(SUM(qty) AS BIGINT) AS dd
        |  FROM li WHERE l_returnflag <> 'R' GROUP BY 1),
        |fin AS (
        |  SELECT li.l_partkey, qty, unit_cents, l_shipdate,
        |    COALESCE(SUM(qty) OVER (PARTITION BY li.l_partkey
        |      ORDER BY l_shipdate, l_orderkey, l_linenumber
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS lo,
        |    COALESCE(d.dd, 0) AS dd
        |  FROM li LEFT JOIN d ON li.l_partkey = d.l_partkey
        |  WHERE l_returnflag = 'R'),
        |r AS (
        |  SELECT l_partkey, unit_cents, l_shipdate,
        |    greatest(0, lo + qty - greatest(lo, dd)) AS rem
        |  FROM fin)
        |SELECT l_partkey,
        |  CAST(SUM(rem) AS BIGINT) AS remaining_units,
        |  CAST(SUM(rem * unit_cents) AS BIGINT) AS remaining_value_cents,
        |  CAST(SUM(CASE WHEN rem > 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_open_lots,
        |  MIN(CASE WHEN rem > 0
        |      THEN epoch_ns(l_shipdate) // 1000000000 END) AS oldest_open_s
        |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,
    "q293_arc_elasticity" ->
      """WITH base AS (
        |  SELECT l_partkey, year(CAST(l_shipdate AS DATE)) AS yr,
        |    CAST(SUM(CAST(l_quantity AS BIGINT)) AS HUGEINT) AS q,
        |    SUM(CAST(floor(l_extendedprice * 100.0 + 0.5) AS HUGEINT))
        |      AS r
        |  FROM lineitem
        |  WHERE year(CAST(l_shipdate AS DATE)) IN (1996, 1997)
        |  GROUP BY 1, 2),
        |b2 AS (
        |  SELECT *, CAST((2 * r * 10000 + q) // (2 * q) AS BIGINT) AS p
        |  FROM base),
        |j AS (
        |  SELECT y0.l_partkey, y0.q AS q0, y0.p AS p0,
        |         y1.q AS q1, y1.p AS p1
        |  FROM (SELECT l_partkey, q, p FROM b2 WHERE yr = 1996) y0
        |  JOIN (SELECT l_partkey, q, p FROM b2 WHERE yr = 1997) y1
        |    USING (l_partkey)
        |  WHERE y1.p <> y0.p),
        |e AS (
        |  SELECT *,
        |    floor((CAST(CAST(q1 - q0 AS HUGEINT) * (p1 + p0) AS DOUBLE)
        |        / CAST(CAST(p1 - p0 AS HUGEINT) * (q1 + q0) AS DOUBLE))
        |      * 1000000.0 + 0.5) / 1000000.0 AS elasticity
        |  FROM j),
        |cl AS (
        |  SELECT CASE WHEN abs(elasticity) > 1.0 THEN 'elastic'
        |              ELSE 'inelastic' END AS cls, elasticity
        |  FROM e),
        |byv AS (SELECT cls, elasticity, count(*) AS c
        |        FROM cl GROUP BY 1, 2),
        |w AS (
        |  SELECT cls, elasticity,
        |    SUM(c) OVER (PARTITION BY cls ORDER BY elasticity
        |      ROWS UNBOUNDED PRECEDING) AS cum,
        |    SUM(c) OVER (PARTITION BY cls) AS tot
        |  FROM byv)
        |SELECT cls, CAST(MAX(tot) AS BIGINT) AS n_parts,
        |  MIN(CASE WHEN cum * 2 >= tot THEN elasticity END)
        |    AS median_elasticity
        |FROM w GROUP BY 1 ORDER BY cls""".stripMargin,
    "q287_hll_rolling_distinct" ->
      s"""WITH d AS (
         |  SELECT DISTINCT event_type,
         |    epoch_ns(ts) // 86400000000000 AS day, user_id
         |  FROM events),
         |mx AS (SELECT MAX(day) AS dmax FROM d),
         |h AS (
         |  SELECT event_type, day,
         |    CAST(md5_number_lower('hll:' || user_id::VARCHAR) & $H
         |      AS BIGINT) AS h
         |  FROM d),
         |r AS (
         |  SELECT event_type, day, h // 36028797018963968 AS bucket,
         |    h % 36028797018963968 AS rest
         |  FROM h),
         |reg AS (
         |  SELECT event_type, day, bucket,
         |    MAX(CASE WHEN rest = 0 THEN 56
         |        ELSE 56 - length(bin(rest)) END) AS m
         |  FROM r GROUP BY 1, 2, 3),
         |win AS (
         |  SELECT event_type, bucket, m,
         |    unnest(generate_series(day, day + 6)) AS day2
         |  FROM reg),
         |w2 AS (
         |  SELECT event_type, day2 AS day, bucket, MAX(m) AS m
         |  FROM win CROSS JOIN mx WHERE day2 <= mx.dmax
         |  GROUP BY 1, 2, 3),
         |agg AS (
         |  SELECT event_type, day, CAST(count(*) AS BIGINT) AS n_present,
         |    CAST(SUM(CAST((CAST(1 AS BIGINT) << (56 - m))
         |        AS DECIMAL(38,0))) +
         |      (256 - count(*)) * CAST(72057594037927936 AS DECIMAL(38,0))
         |      AS DECIMAL(38,0)) AS s_fixed
         |  FROM w2 GROUP BY 1, 2),
         |ex AS (
         |  SELECT event_type, day2 AS day,
         |    CAST(count(DISTINCT user_id) AS BIGINT) AS exact_wau
         |  FROM (SELECT event_type, user_id,
         |          unnest(generate_series(day, day + 6)) AS day2
         |        FROM d) x
         |  CROSS JOIN mx WHERE day2 <= mx.dmax GROUP BY 1, 2)
         |SELECT agg.event_type, agg.day, agg.n_present,
         |  CAST(256 - agg.n_present AS BIGINT) AS v_zero,
         |  floor(((0.7213 / (1.0 + 1.079 / 256.0)) * 65536.0 *
         |      72057594037927936.0 / CAST(agg.s_fixed AS DOUBLE))
         |    * 1000000.0 + 0.5) / 1000000.0 AS est_wau,
         |  ex.exact_wau
         |FROM agg JOIN ex
         |  ON ex.event_type = agg.event_type AND ex.day = agg.day
         |ORDER BY agg.event_type, agg.day""".stripMargin,
    "q288_quantile_sketch_union" ->
      s"""WITH r AS (
         |  SELECT event_type, event_id,
         |    CAST(floor(value * 100.0 + 0.5) / 100.0 AS DECIMAL(18,2))
         |      AS v,
         |    CAST(md5_number_lower('qsk:' || event_id::VARCHAR) & $H
         |      AS BIGINT) AS h
         |  FROM events),
         |s1 AS (
         |  SELECT event_type, v, event_id, h,
         |    row_number() OVER (PARTITION BY event_type
         |      ORDER BY h, event_id) AS rn
         |  FROM r),
         |pt AS (SELECT * FROM s1 WHERE rn <= 256),
         |nt AS (SELECT CAST(count(DISTINCT event_type) AS BIGINT)
         |         AS n_types_merged FROM pt),
         |mg AS (
         |  SELECT v, event_id,
         |    row_number() OVER (ORDER BY h, event_id) AS grn
         |  FROM pt),
         |m2 AS (SELECT v, event_id FROM mg WHERE grn <= 256),
         |s2 AS (
         |  SELECT v, row_number() OVER (ORDER BY v, event_id) AS rk,
         |    COUNT(*) OVER () AS n_s
         |  FROM m2),
         |est AS (
         |  SELECT CAST(MAX(n_s) AS BIGINT) AS n_sample,
         |    floor(CAST(MIN(CASE WHEN rk >= (n_s + 1) // 2 THEN v END)
         |      AS DOUBLE) * 100.0 + 0.5) / 100.0 AS est_p50,
         |    floor(CAST(MIN(CASE WHEN rk >= (n_s * 9 + 9) // 10 THEN v
         |      END) AS DOUBLE) * 100.0 + 0.5) / 100.0 AS est_p90,
         |    floor(CAST(MIN(CASE WHEN rk >= (n_s * 99 + 99) // 100
         |      THEN v END) AS DOUBLE) * 100.0 + 0.5) / 100.0 AS est_p99
         |  FROM s2),
         |hist AS (SELECT v, COUNT(*) AS freq FROM r GROUP BY 1),
         |cum AS (
         |  SELECT v,
         |    SUM(freq) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS c,
         |    SUM(freq) OVER () AS n_rows
         |  FROM hist),
         |ex AS (
         |  SELECT CAST(MAX(n_rows) AS BIGINT) AS n_rows,
         |    floor(CAST(MIN(CASE WHEN c >= (n_rows + 1) // 2 THEN v END)
         |      AS DOUBLE) * 100.0 + 0.5) / 100.0 AS p50,
         |    floor(CAST(MIN(CASE WHEN c >= (n_rows * 9 + 9) // 10 THEN v
         |      END) AS DOUBLE) * 100.0 + 0.5) / 100.0 AS p90,
         |    floor(CAST(MIN(CASE WHEN c >= (n_rows * 99 + 99) // 100
         |      THEN v END) AS DOUBLE) * 100.0 + 0.5) / 100.0 AS p99
         |  FROM cum)
         |SELECT n_rows, n_types_merged, n_sample,
         |  est_p50, est_p90, est_p99, p50, p90, p99
         |FROM est CROSS JOIN ex CROSS JOIN nt""".stripMargin,
    "q234_hll_oracle" ->
      s"""WITH d AS (
         |  SELECT DISTINCT event_type, user_id FROM events),
         |h AS (
         |  SELECT event_type,
         |    CAST(md5_number_lower('hll:' || user_id::VARCHAR) & $H
         |      AS BIGINT) AS h
         |  FROM d),
         |r AS (
         |  SELECT event_type, h // 36028797018963968 AS bucket,
         |    h % 36028797018963968 AS rest
         |  FROM h),
         |reg AS (
         |  SELECT event_type, bucket,
         |    MAX(CASE WHEN rest = 0 THEN 56
         |        ELSE 56 - length(bin(rest)) END) AS m
         |  FROM r GROUP BY 1, 2),
         |agg AS (
         |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_present,
         |    CAST(SUM(CAST((CAST(1 AS BIGINT) << (56 - m))
         |        AS DECIMAL(38,0))) +
         |      (256 - count(*)) * CAST(72057594037927936 AS DECIMAL(38,0))
         |      AS DECIMAL(38,0)) AS s_fixed
         |  FROM reg GROUP BY 1),
         |ex AS (
         |  SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT)
         |    AS n_exact
         |  FROM events GROUP BY 1)
         |SELECT agg.event_type, agg.n_present,
         |  CAST(256 - agg.n_present AS BIGINT) AS v_zero,
         |  CAST(CAST(agg.s_fixed AS HUGEINT) % 9223372036854775808
         |    AS BIGINT) AS s_fixed,
         |  floor(((0.7213 / (1.0 + 1.079 / 256.0)) * 65536.0 *
         |      72057594037927936.0 / CAST(agg.s_fixed AS DOUBLE))
         |    * 1000000.0 + 0.5) / 1000000.0 AS est_raw,
         |  ex.n_exact
         |FROM agg JOIN ex ON agg.event_type = ex.event_type
         |ORDER BY agg.event_type""".stripMargin,
    "q228_wilson_ranking" ->
      """WITH c AS (
        |  SELECT l_partkey, CAST(count(*) AS BIGINT) AS n,
        |    CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS k
        |  FROM lineitem GROUP BY 1),
        |w AS (
        |  SELECT l_partkey, n, k,
        |    CAST(k AS DOUBLE) / CAST(n AS DOUBLE) AS p,
        |    CAST(n AS DOUBLE) AS nd
        |  FROM c)
        |SELECT l_partkey, n, k,
        |  floor(p * 1000000.0 + 0.5) / 1000000.0 AS raw_rate,
        |  floor(((p + (1.96 * 1.96) / (2.0 * nd) -
        |      1.96 * sqrt((p * (1.0 - p) + (1.96 * 1.96) / (4.0 * nd))
        |        / nd)) / (1.0 + (1.96 * 1.96) / nd)) * 1000000.0 + 0.5)
        |    / 1000000.0 AS wilson_lo
        |FROM w
        |ORDER BY wilson_lo DESC, l_partkey LIMIT 50""".stripMargin,
    "q229_weighted_percentiles" ->
      """WITH li AS (
        |  SELECT n_name AS nation,
        |    CAST(floor(l_extendedprice * 100.0 + 0.5) / 100.0
        |      AS DECIMAL(18,2)) AS v,
        |    CAST(floor(l_quantity * 100.0 + 0.5) / 100.0
        |      AS DECIMAL(18,2)) AS wq
        |  FROM lineitem
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey),
        |byv AS (
        |  SELECT nation, v, SUM(wq) AS wv FROM li GROUP BY 1, 2),
        |cum AS (
        |  SELECT nation, v,
        |    SUM(wv) OVER (PARTITION BY nation ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumw,
        |    SUM(wv) OVER (PARTITION BY nation) AS totw
        |  FROM byv)
        |SELECT nation,
        |  floor(CAST(MIN(CASE WHEN cumw * 4 >= totw THEN v END) AS DOUBLE)
        |    * 100.0 + 0.5) / 100.0 AS wp25,
        |  floor(CAST(MIN(CASE WHEN cumw * 2 >= totw THEN v END) AS DOUBLE)
        |    * 100.0 + 0.5) / 100.0 AS wp50,
        |  floor(CAST(MIN(CASE WHEN cumw * 4 >= totw * 3 THEN v END)
        |    AS DOUBLE) * 100.0 + 0.5) / 100.0 AS wp75,
        |  floor(CAST(MIN(CASE WHEN cumw * 10 >= totw * 9 THEN v END)
        |    AS DOUBLE) * 100.0 + 0.5) / 100.0 AS wp90,
        |  floor(CAST(MAX(totw) AS DOUBLE) * 100.0 + 0.5) / 100.0
        |    AS total_qty
        |FROM cum GROUP BY nation ORDER BY nation""".stripMargin,
    "q227_pinball_eval" ->
      s"""WITH daily AS (
         |  SELECT nation, day, CAST(SUM(p) AS DECIMAL(18,2)) AS rev
         |  FROM (SELECT n_name AS nation,
         |          (epoch_ns(o_orderdate) // 1000000000) // 86400 AS day,
         |          CAST(floor(o_totalprice * 100.0 + 0.5) / 100.0
         |            AS DECIMAL(18,2)) AS p
         |        $nationOrdersSql)
         |  GROUP BY 1, 2),
         |s AS (
         |  SELECT nation, CAST(rev AS DOUBLE) AS y,
         |    row_number() OVER w AS rn,
         |    floor(quantile_cont(CAST(rev AS DOUBLE), 0.5) OVER wh
         |      * 1000000.0 + 0.5) / 1000000.0 AS f50,
         |    floor(quantile_cont(CAST(rev AS DOUBLE), 0.9) OVER wh
         |      * 1000000.0 + 0.5) / 1000000.0 AS f90
         |  FROM daily
         |  WINDOW w AS (PARTITION BY nation ORDER BY day),
         |    wh AS (PARTITION BY nation ORDER BY day
         |      ROWS BETWEEN 28 PRECEDING AND 1 PRECEDING)),
         |l AS (
         |  SELECT nation,
         |    CAST(floor(greatest((y - f50) * 0.5, (y - f50) * (0.5 - 1.0))
         |      * 1000000.0 + 0.5) / 1000000.0 AS DECIMAL(18,6)) AS l50,
         |    CAST(floor(greatest((y - f90) * 0.9, (y - f90) * (0.9 - 1.0))
         |      * 1000000.0 + 0.5) / 1000000.0 AS DECIMAL(18,6)) AS l90
         |  FROM s WHERE rn > 28),
         |a AS (
         |  SELECT nation, CAST(COUNT(*) AS BIGINT) AS n_scored,
         |    SUM(l50) AS s50, SUM(l90) AS s90
         |  FROM l GROUP BY 1)
         |SELECT nation, n_scored,
         |  floor((CAST(s50 AS DOUBLE) / CAST(n_scored AS DOUBLE))
         |    * 1000000.0 + 0.5) / 1000000.0 AS pinball_p50,
         |  floor((CAST(s90 AS DOUBLE) / CAST(n_scored AS DOUBLE))
         |    * 1000000.0 + 0.5) / 1000000.0 AS pinball_p90
         |FROM a ORDER BY nation""".stripMargin,
    "q218_fifo_matching" ->
      """WITH li AS (
        |  SELECT l_partkey, l_returnflag,
        |    CAST(l_quantity AS BIGINT) AS qty,
        |    CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS cents,
        |    l_shipdate, l_orderkey, l_linenumber
        |  FROM lineitem),
        |u AS (SELECT *, cents // qty AS unit_cents FROM li),
        |fin AS (
        |  SELECT l_partkey AS pk, qty, unit_cents,
        |    COALESCE(SUM(qty) OVER (PARTITION BY l_partkey
        |      ORDER BY l_shipdate, l_orderkey, l_linenumber
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS lo
        |  FROM u WHERE l_returnflag = 'R'),
        |fout AS (
        |  SELECT l_partkey AS pk, qty, unit_cents,
        |    COALESCE(SUM(qty) OVER (PARTITION BY l_partkey
        |      ORDER BY l_shipdate, l_orderkey, l_linenumber
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS lo
        |  FROM u WHERE l_returnflag <> 'R'),
        |m AS (
        |  SELECT i.pk,
        |    least(i.lo + i.qty, o.lo + o.qty) - greatest(i.lo, o.lo) AS mu,
        |    o.unit_cents - i.unit_cents AS du
        |  FROM fin i JOIN fout o ON i.pk = o.pk
        |    AND least(i.lo + i.qty, o.lo + o.qty) > greatest(i.lo, o.lo)),
        |mm AS (
        |  SELECT pk, CAST(SUM(mu) AS BIGINT) AS matched_units,
        |    CAST(COUNT(*) AS BIGINT) AS n_matches,
        |    CAST(SUM(mu * du) AS BIGINT) AS realized_margin_cents
        |  FROM m GROUP BY 1),
        |tot AS (
        |  SELECT l_partkey,
        |    CAST(SUM(CASE WHEN l_returnflag = 'R' THEN qty ELSE 0 END)
        |      AS BIGINT) AS supply_units,
        |    CAST(SUM(CASE WHEN l_returnflag <> 'R' THEN qty ELSE 0 END)
        |      AS BIGINT) AS demand_units
        |  FROM li GROUP BY 1)
        |SELECT t.l_partkey, t.supply_units, t.demand_units,
        |  CAST(COALESCE(mm.matched_units, 0) AS BIGINT) AS matched_units,
        |  CAST(COALESCE(mm.n_matches, 0) AS BIGINT) AS n_matches,
        |  CAST(COALESCE(mm.realized_margin_cents, 0) AS BIGINT)
        |    AS realized_margin_cents
        |FROM tot t LEFT JOIN mm ON t.l_partkey = mm.pk
        |ORDER BY t.l_partkey""".stripMargin,
    "q219_apportionment" ->
      s"""WITH rev AS (
         |  SELECT n_name AS nation,
         |    CAST(SUM(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
         |      AS BIGINT) AS rev_cents
         |  $nationOrdersSql
         |  GROUP BY 1),
         |x AS (
         |  SELECT nation, rev_cents,
         |    CAST(rev_cents AS HUGEINT) * 1000 AS prod,
         |    SUM(CAST(rev_cents AS HUGEINT)) OVER () AS total
         |  FROM rev),
         |q AS (
         |  SELECT nation, rev_cents, prod, total,
         |    prod // total AS quota,
         |    prod - (prod // total) * total AS rem
         |  FROM x),
         |r AS (
         |  SELECT *, 1000 - SUM(quota) OVER () AS leftover,
         |    row_number() OVER (ORDER BY rem DESC, nation) AS rk
         |  FROM q)
         |SELECT nation, rev_cents, CAST(quota AS BIGINT) AS quota,
         |  CAST(quota + CASE WHEN rk <= leftover THEN 1 ELSE 0 END
         |    AS BIGINT) AS units
         |FROM r ORDER BY nation""".stripMargin,
    "q220_benford_audit" -> benfordOracle,
    "q221_rle_runs" ->
      """WITH e AS (
        |  SELECT user_id, epoch_ns(ts) AS ts, event_id, event_type
        |  FROM events),
        |f AS (
        |  SELECT *, CASE WHEN lag(event_type) OVER w IS NULL
        |      OR lag(event_type) OVER w <> event_type THEN 1 ELSE 0 END
        |      AS chg
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |r AS (
        |  SELECT *, SUM(chg) OVER (PARTITION BY user_id ORDER BY ts,
        |    event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS run_id
        |  FROM f)
        |SELECT user_id, CAST(run_id AS BIGINT) AS run_id,
        |  MIN(event_type) AS event_type, CAST(COUNT(*) AS BIGINT)
        |    AS run_len,
        |  MIN(ts) AS ts_start, MAX(ts) AS ts_end
        |FROM r GROUP BY user_id, run_id
        |ORDER BY user_id, run_id""".stripMargin,
    "q211_calendar_window" ->
      s"""WITH daily AS (
         |  SELECT nation, day, CAST(SUM(p) AS DECIMAL(18,2)) AS rev
         |  FROM (SELECT n_name AS nation,
         |          (epoch_ns(o_orderdate) // 1000000000) // 86400 AS day,
         |          CAST(floor(o_totalprice * 100.0 + 0.5) / 100.0
         |            AS DECIMAL(18,2)) AS p
         |        $nationOrdersSql)
         |  GROUP BY 1, 2)
         |SELECT nation, day,
         |  floor(CAST(rev AS DOUBLE) * 100.0 + 0.5) / 100.0 AS rev,
         |  floor(CAST(SUM(rev) OVER w AS DOUBLE) * 100.0 + 0.5) / 100.0
         |    AS mv7_sum,
         |  CAST(COUNT(*) OVER w AS BIGINT) AS n_days_obs,
         |  floor((CAST(SUM(rev) OVER w AS DOUBLE) / 7.0) * 1000000.0
         |    + 0.5) / 1000000.0 AS mv7_cal_avg
         |FROM daily
         |WINDOW w AS (PARTITION BY nation ORDER BY day
         |  RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
         |ORDER BY nation, day""".stripMargin,
    "q212_table_fingerprint" ->
      s"""WITH c AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_rows,
         |    CAST(SUM(CAST((md5_number_lower(concat_ws('|', c_custkey,
         |      c_name, c_nationkey, c_mktsegment)) & $H) AS HUGEINT))
         |      % 9223372036854775808 AS BIGINT) AS fingerprint
         |  FROM customer),
         |o AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_rows,
         |    CAST(SUM(CAST((md5_number_lower(concat_ws('|', o_orderkey,
         |      o_custkey, o_orderpriority)) & $H) AS HUGEINT))
         |      % 9223372036854775808 AS BIGINT) AS fingerprint
         |  FROM orders),
         |n AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_rows,
         |    CAST(SUM(CAST((md5_number_lower(concat_ws('|', n_nationkey,
         |      n_name, n_regionkey)) & $H) AS HUGEINT))
         |      % 9223372036854775808 AS BIGINT) AS fingerprint
         |  FROM nation)
         |SELECT 'customer' AS table_name, n_rows, fingerprint FROM c
         |UNION ALL
         |SELECT 'nation', n_rows, fingerprint FROM n
         |UNION ALL
         |SELECT 'orders', n_rows, fingerprint FROM o
         |ORDER BY table_name""".stripMargin,
    "q205_theil_sen" ->
      s"""WITH daily AS (
         |  SELECT nation, day, CAST(SUM(p) AS DOUBLE) AS y
         |  FROM (SELECT n_name AS nation,
         |          (epoch_ns(o_orderdate) // 1000000000) // 86400 AS day,
         |          CAST(floor(o_totalprice * 100.0 + 0.5) / 100.0
         |            AS DECIMAL(18,2)) AS p
         |        $nationOrdersSql)
         |  GROUP BY 1, 2),
         |s AS (
         |  SELECT a.nation,
         |    floor(((b.y - a.y) / (b.day - a.day)) * 1000000.0 + 0.5)
         |      / 1000000.0 AS m
         |  FROM daily a JOIN daily b
         |    ON b.nation = a.nation AND a.day < b.day),
         |g1 AS (SELECT nation, m, count(*) AS c FROM s GROUP BY 1, 2),
         |w1 AS (SELECT nation, m,
         |         SUM(c) OVER (PARTITION BY nation ORDER BY m
         |           ROWS UNBOUNDED PRECEDING) AS cum,
         |         SUM(c) OVER (PARTITION BY nation) AS tot
         |       FROM g1),
         |med AS (SELECT nation, MIN(m) AS slope,
         |          CAST(MAX(tot) AS BIGINT) AS n_pairs
         |        FROM w1 WHERE cum * 2 >= tot GROUP BY 1),
         |r AS (SELECT d.nation,
         |        floor((d.y - med.slope * d.day) * 1000000.0 + 0.5)
         |          / 1000000.0 AS r0
         |      FROM daily d JOIN med ON med.nation = d.nation),
         |g2 AS (SELECT nation, r0, count(*) AS c FROM r GROUP BY 1, 2),
         |w2 AS (SELECT nation, r0,
         |         SUM(c) OVER (PARTITION BY nation ORDER BY r0
         |           ROWS UNBOUNDED PRECEDING) AS cum,
         |         SUM(c) OVER (PARTITION BY nation) AS tot
         |       FROM g2),
         |med2 AS (SELECT nation, MIN(r0) AS intercept
         |         FROM w2 WHERE cum * 2 >= tot GROUP BY 1)
         |SELECT med.nation, n_pairs, slope, intercept
         |FROM med JOIN med2 ON med2.nation = med.nation
         |ORDER BY 1""".stripMargin,
    "q206_mrr_bridge" ->
      """WITH r AS (
        |  SELECT o_custkey AS cust,
        |    (epoch_ns(o_orderdate) // 1000000000) // 86400 // 30 AS p,
        |    CAST(SUM(CAST(floor(o_totalprice * 100.0 + 0.5) / 100.0
        |      AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS v
        |  FROM orders GROUP BY 1, 2),
        |first AS (SELECT cust, MIN(p) AS p0 FROM r GROUP BY 1),
        |mx AS (SELECT MAX(p) AS pmax FROM r),
        |prev AS (SELECT cust, p + 1 AS p, v AS pv FROM r),
        |j AS (
        |  SELECT coalesce(r.cust, prev.cust) AS cust,
        |         coalesce(r.p, prev.p) AS p, r.v, prev.pv
        |  FROM r FULL OUTER JOIN prev
        |    ON prev.cust = r.cust AND prev.p = r.p),
        |cl AS (
        |  SELECT j.p,
        |    CASE WHEN j.v IS NULL THEN 'churned'
        |         WHEN j.pv IS NULL AND j.p = f.p0 THEN 'new'
        |         WHEN j.pv IS NULL THEN 'resurrected'
        |         WHEN j.v > j.pv THEN 'expansion'
        |         WHEN j.v < j.pv THEN 'contraction'
        |         ELSE 'retained' END AS mrr_class,
        |    coalesce(j.v, CAST(0 AS DECIMAL(18,2))) AS cv,
        |    coalesce(j.pv, CAST(0 AS DECIMAL(18,2))) AS pv
        |  FROM j JOIN first f ON f.cust = j.cust
        |  CROSS JOIN mx WHERE j.p <= mx.pmax)
        |SELECT p, mrr_class, CAST(count(*) AS BIGINT) AS n_customers,
        |  floor(CAST(SUM(cv - pv) AS DOUBLE) * 100.0 + 0.5) / 100.0
        |    AS mrr_delta,
        |  floor(CAST(SUM(cv) AS DOUBLE) * 100.0 + 0.5) / 100.0 AS mrr
        |FROM cl GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q207_moment_profile" ->
      """WITH x AS (
        |  SELECT event_type,
        |    CAST(floor(value * 100.0 + 0.5) / 100.0 AS DECIMAL(7,2)) AS v
        |  FROM events),
        |p2 AS (SELECT event_type, v,
        |         CAST(v * v AS DECIMAL(12,4)) AS v2 FROM x),
        |p4 AS (SELECT event_type, v, v2,
        |         CAST(v2 * v AS DECIMAL(20,6)) AS v3,
        |         -- widen one operand: DuckDB's 12+12-digit product
        |         -- overflows its INT64 decimal kernel; 24 digits forces
        |         -- the HUGEINT path (value unchanged, still exact)
        |         CAST(CAST(v2 AS DECIMAL(24,4)) * v2 AS DECIMAL(25,8))
        |           AS v4 FROM p2),
        |s AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |        SUM(v) AS s1, SUM(v2) AS s2, SUM(v3) AS s3, SUM(v4) AS s4
        |      FROM p4 GROUP BY 1),
        |t AS (SELECT *, floor((CAST(s1 AS DOUBLE) / n) * 1000000.0 + 0.5)
        |        / 1000000.0 AS mu FROM s),
        |u AS (SELECT *, floor(sqrt(CAST(s2 AS DOUBLE) / n - mu * mu)
        |        * 1000000.0 + 0.5) / 1000000.0 AS sd FROM t)
        |SELECT event_type, n, mu AS mean, sd AS stddev,
        |  floor(((CAST(s3 AS DOUBLE) / n
        |      - 3.0 * mu * (CAST(s2 AS DOUBLE) / n)
        |      + 2.0 * mu * mu * mu) / (sd * sd * sd))
        |    * 1000000.0 + 0.5) / 1000000.0 AS skewness,
        |  floor(((CAST(s4 AS DOUBLE) / n
        |      - 4.0 * mu * (CAST(s3 AS DOUBLE) / n)
        |      + 6.0 * mu * mu * (CAST(s2 AS DOUBLE) / n)
        |      - 3.0 * mu * mu * mu * mu) / (sd * sd * sd * sd) - 3.0)
        |    * 1000000.0 + 0.5) / 1000000.0 AS excess_kurtosis
        |FROM u ORDER BY 1""".stripMargin,
    "q202_forecast_backtest" ->
      s"""WITH RECURSIVE idx AS (
         |  SELECT nation, day, revenue,
         |         row_number() OVER (PARTITION BY nation ORDER BY day) AS i
         |  FROM (SELECT n_name AS nation,
         |          (epoch_ns(o_orderdate) // 1000000000) // 86400 AS day,
         |          CAST(SUM(CAST(floor(o_totalprice * 100.0 + 0.5) / 100.0 AS DECIMAL(18,2))) AS DOUBLE)
         |            AS revenue
         |        $nationOrdersSql
         |        GROUP BY 1, 2)),
         |rec AS (
         |  SELECT nation, day, revenue, i, revenue AS l,
         |         CAST(0.0 AS DOUBLE) AS b
         |  FROM idx WHERE i = 1
         |  UNION ALL
         |  SELECT nation, day, revenue, i, l_new,
         |         CAST(0.1 AS DOUBLE) * (l_new - l_prev)
         |           + (CAST(1.0 AS DOUBLE) - CAST(0.1 AS DOUBLE)) * b_prev
         |  FROM (SELECT idx.nation, idx.day, idx.revenue, idx.i,
         |          rec.l AS l_prev, rec.b AS b_prev,
         |          CAST(0.3 AS DOUBLE) * idx.revenue
         |            + (CAST(1.0 AS DOUBLE) - CAST(0.3 AS DOUBLE))
         |              * (rec.l + rec.b) AS l_new
         |        FROM idx JOIN rec ON idx.nation = rec.nation
         |                         AND idx.i = rec.i + 1)),
         |f AS (SELECT nation, day, revenue, l + b AS fc FROM rec),
         |p AS (SELECT nation, day, revenue,
         |        lag(fc) OVER (PARTITION BY nation ORDER BY day) AS pfc
         |      FROM f),
         |e AS (
         |  SELECT nation,
         |    CAST(floor((revenue - pfc) * 1000000.0 + 0.5) / 1000000.0
         |      AS DECIMAL(18,6)) AS err,
         |    CAST(floor((abs(revenue - pfc) / revenue) * 1000000.0 + 0.5)
         |      / 1000000.0 AS DECIMAL(18,6)) AS ape
         |  FROM p WHERE pfc IS NOT NULL)
         |SELECT nation, CAST(count(*) AS BIGINT) AS n_forecasts,
         |  floor((CAST(SUM(err) AS DOUBLE) / count(*)) * 1000000.0 + 0.5)
         |    / 1000000.0 AS bias,
         |  floor((CAST(SUM(abs(err)) AS DOUBLE) / count(*)) * 1000000.0
         |    + 0.5) / 1000000.0 AS mae,
         |  floor((100.0 * CAST(SUM(ape) AS DOUBLE) / count(*))
         |    * 1000000.0 + 0.5) / 1000000.0 AS mape_pct
         |FROM e GROUP BY 1 ORDER BY 1""".stripMargin,
    "q196_interval_join" ->
      """WITH o AS (
        |  SELECT o_orderkey,
        |         (epoch_ns(o_orderdate) // 1000000000) // 86400 AS day,
        |         CAST(floor(o_totalprice * 100.0 + 0.5) / 100.0
        |           AS DECIMAL(18,2)) AS p
        |  FROM orders),
        |camp AS (
        |  SELECT wk FROM (
        |    SELECT day // 7 AS wk, SUM(p) AS wrev FROM o GROUP BY 1)
        |  ORDER BY wrev DESC, wk LIMIT 12),
        |ivl AS (SELECT wk AS campaign_wk, wk * 7 - 3 AS d0,
        |               wk * 7 + 10 AS d1 FROM camp)
        |SELECT campaign_wk, d0, d1, CAST(count(*) AS BIGINT) AS n_orders,
        |       CAST(SUM(p) AS DOUBLE) AS revenue
        |FROM ivl JOIN o ON o.day >= ivl.d0 AND o.day <= ivl.d1
        |GROUP BY 1, 2, 3 ORDER BY 1""".stripMargin,
    "q197_cusum_shift" ->
      s"""WITH RECURSIVE daily AS (
         |  SELECT nation, day, CAST(SUM(p) AS DECIMAL(18,2)) AS rev
         |  FROM (SELECT n_name AS nation,
         |          (epoch_ns(o_orderdate) // 1000000000) // 86400 AS day,
         |          CAST(floor(o_totalprice * 100.0 + 0.5) / 100.0
         |            AS DECIMAL(18,2)) AS p
         |        $nationOrdersSql)
         |  GROUP BY 1, 2),
         |stats AS (
         |  SELECT nation,
         |    floor((CAST(SUM(rev) AS DOUBLE) / count(*)) * 1000000.0 + 0.5)
         |      / 1000000.0 AS mu,
         |    floor(sqrt((CAST(SUM(rev * rev) AS DOUBLE)
         |        - CAST(SUM(rev) AS DOUBLE) * CAST(SUM(rev) AS DOUBLE)
         |          / count(*)) / (count(*) - 1)) * 1000000.0 + 0.5)
         |      / 1000000.0 AS sigma
         |  FROM daily GROUP BY 1 HAVING count(*) >= 2),
         |st2 AS (
         |  SELECT nation, mu, sigma,
         |    floor((CAST(0.5 AS DOUBLE) * sigma) * 1000000.0 + 0.5)
         |      / 1000000.0 AS kk
         |  FROM stats),
         |idx AS (
         |  SELECT d.nation, d.day, CAST(d.rev AS DOUBLE) AS x, s.mu,
         |         s.sigma, s.kk,
         |         row_number() OVER (PARTITION BY d.nation ORDER BY d.day)
         |           AS i
         |  FROM daily d JOIN st2 s ON s.nation = d.nation),
         |rec AS (
         |  SELECT nation, day, x, mu, sigma, kk, i,
         |    greatest(CAST(0.0 AS DOUBLE),
         |             CAST(0.0 AS DOUBLE) + (x - mu - kk)) AS s_pos,
         |    greatest(CAST(0.0 AS DOUBLE),
         |             CAST(0.0 AS DOUBLE) - (x - mu) - kk) AS s_neg
         |  FROM idx WHERE i = 1
         |  UNION ALL
         |  SELECT idx.nation, idx.day, idx.x, idx.mu, idx.sigma, idx.kk,
         |         idx.i,
         |    greatest(CAST(0.0 AS DOUBLE),
         |             rec.s_pos + (idx.x - idx.mu - idx.kk)),
         |    greatest(CAST(0.0 AS DOUBLE),
         |             rec.s_neg - (idx.x - idx.mu) - idx.kk)
         |  FROM idx JOIN rec ON idx.nation = rec.nation
         |                   AND idx.i = rec.i + 1)
         |SELECT nation, day, x AS revenue,
         |  floor((s_pos) * 1000000.0 + 0.5) / 1000000.0 AS cusum_pos,
         |  floor((s_neg) * 1000000.0 + 0.5) / 1000000.0 AS cusum_neg,
         |  CAST(s_pos > CAST(4.0 AS DOUBLE) * sigma
         |    OR s_neg > CAST(4.0 AS DOUBLE) * sigma AS INT) AS shift_flag
         |FROM rec ORDER BY nation, day""".stripMargin,
    "q157_lead_lag_corr" ->
      """WITH c AS (
        |  SELECT epoch_ns(ts) // 86400000000000 AS day,
        |    CAST(COUNT(*) AS DECIMAL(18,0)) AS x
        |  FROM events WHERE event_type = 'click' GROUP BY 1),
        |p AS (
        |  SELECT epoch_ns(ts) // 86400000000000 AS day,
        |    SUM(CAST(floor(value * 100.0 + 0.5) / 100.0 AS DECIMAL(18,2))) AS y
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
        |l AS (SELECT unnest(generate_series(-7, 7)) AS lag),
        |j AS (SELECT l.lag, c.x, p.y
        |      FROM c CROSS JOIN l JOIN p ON p.day = c.day + l.lag),
        |s AS (SELECT lag, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
        |        SUM(x * y) AS sxy, SUM(x * x) AS sxx, SUM(y * y) AS syy
        |      FROM j GROUP BY 1)
        |SELECT CAST(lag AS INT) AS lag, CAST(n AS BIGINT) AS n_days,
        |  CASE WHEN n >= 2 AND CAST(n * sxx - sx * sx AS DOUBLE) > 0
        |        AND CAST(n * syy - sy * sy AS DOUBLE) > 0
        |    THEN floor((CAST(n * sxy - sx * sy AS DOUBLE) /
        |      sqrt(CAST(n * sxx - sx * sx AS DOUBLE) *
        |           CAST(n * syy - sy * sy AS DOUBLE))) * 1000000.0 + 0.5) / 1000000.0
        |  END AS r
        |FROM s ORDER BY lag""".stripMargin,
    "q155_ratio_to_parent" ->
      """WITH rev AS (
        |  SELECT r_name AS region, n_name AS nation, COUNT(*) AS n_orders,
        |    SUM(CAST(floor(o_totalprice * 100.0 + 0.5) / 100.0 AS DECIMAL(18,2))) AS rev
        |  FROM orders
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  GROUP BY 1, 2)
        |SELECT region, nation, CAST(n_orders AS BIGINT) AS n_orders,
        |  CAST(rev AS DOUBLE) AS revenue,
        |  floor((CAST(rev AS DOUBLE) /
        |    CAST(SUM(rev) OVER (PARTITION BY region) AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0
        |    AS share_of_region,
        |  CAST(SUM(rev) OVER (PARTITION BY region) AS DOUBLE)
        |    AS region_revenue,
        |  floor((CAST(SUM(rev) OVER (PARTITION BY region) AS DOUBLE) /
        |    CAST(SUM(rev) OVER () AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0 AS region_share
        |FROM rev ORDER BY region, nation""".stripMargin,
    "q156_dow_seasonality" ->
      """WITH nd AS (
        |  SELECT (epoch_ns(o_orderdate) // 1000000000) // 86400 AS day,
        |    CAST(floor(o_totalprice * 100.0 + 0.5) / 100.0 AS DECIMAL(18,2)) AS p
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey),
        |daily AS (SELECT day, SUM(p) AS drev FROM nd GROUP BY 1),
        |perdow AS (
        |  SELECT CAST((day + 4) % 7 AS INT) AS dow, COUNT(*) AS n_days,
        |    SUM(drev) AS s
        |  FROM daily GROUP BY 1),
        |tot AS (SELECT SUM(n_days) AS tn, SUM(s) AS ts FROM perdow)
        |SELECT dow, CAST(n_days AS BIGINT) AS n_days,
        |  floor((CAST(s AS DOUBLE) / n_days) * 1000000.0 + 0.5) / 1000000.0 AS avg_daily_rev,
        |  floor(((CAST(s AS DOUBLE) / n_days) /
        |    (CAST(ts AS DOUBLE) / tn)) * 1000000.0 + 0.5) / 1000000.0 AS seasonal_index
        |FROM perdow CROSS JOIN tot ORDER BY dow""".stripMargin,
    "q140_bootstrap_ci" -> bootstrapOracle,
    "q141_target_encode" ->
      s"""WITH rows0 AS (
         |  SELECT n_name AS cat,
         |    CAST((md5_number_lower('141:' || o_orderkey::VARCHAR) & $H)
         |      % 5 AS INT) AS fold,
         |    CAST(floor(o_totalprice * 100.0 + 0.5) / 100.0 AS DECIMAL(18,2)) AS v
         |  FROM orders JOIN customer ON o_custkey = c_custkey
         |  JOIN nation ON c_nationkey = n_nationkey),
         |pf AS (SELECT cat, fold, COUNT(*) AS cnt, SUM(v) AS s
         |       FROM rows0 GROUP BY 1, 2),
         |e AS (
         |  SELECT cat, fold, cnt, s,
         |    SUM(cnt) OVER (PARTITION BY cat) AS tot_cnt,
         |    SUM(s) OVER (PARTITION BY cat) AS tot_s,
         |    SUM(cnt) OVER (PARTITION BY fold) AS f_cnt,
         |    SUM(s) OVER (PARTITION BY fold) AS f_s,
         |    SUM(cnt) OVER () AS g_cnt,
         |    SUM(s) OVER () AS g_s
         |  FROM pf)
         |SELECT cat, fold, CAST(cnt AS BIGINT) AS n_fold,
         |  CAST(tot_cnt - cnt AS BIGINT) AS n_oof,
         |  CASE WHEN tot_cnt - cnt > 0 THEN
         |    floor((CAST(tot_s - s AS DOUBLE) / (tot_cnt - cnt)) * 1000000.0 + 0.5) / 1000000.0
         |  END AS enc_raw,
         |  floor(((CAST(tot_s - s AS DOUBLE) + 20.0 *
         |      floor((CAST(g_s - f_s AS DOUBLE) / (g_cnt - f_cnt)) * 1000000.0 + 0.5) / 1000000.0) /
         |    (tot_cnt - cnt + 20)) * 1000000.0 + 0.5) / 1000000.0 AS enc_smooth
         |FROM e ORDER BY cat, fold""".stripMargin,
    "q137_basket_lift" ->
      // Cap interpolated from the ONE engine constant (ADVICE r11):
      // a literal here could silently desync from the engine's filter.
      s"""WITH b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |n AS (SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM lineitem),
        |pc AS (SELECT l_partkey, COUNT(*) AS n_p FROM b GROUP BY 1),
        |okb AS (SELECT l_orderkey FROM b GROUP BY 1
        |        HAVING COUNT(*) <= ${graft.queries.AnalyticsQueries.BasketCap}),
        |pairs AS (
        |  SELECT a.l_partkey AS part_a, b2.l_partkey AS part_b, COUNT(*) AS support
        |  FROM b a JOIN okb ON okb.l_orderkey = a.l_orderkey
        |  JOIN b b2
        |    ON a.l_orderkey = b2.l_orderkey AND a.l_partkey < b2.l_partkey
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
        |scored AS (
        |  SELECT p.part_a, p.part_b, p.support,
        |    floor((CAST(p.support * n.n_orders AS DOUBLE) /
        |          CAST(x.n_p * y.n_p AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0 AS lift
        |  FROM pairs p CROSS JOIN n
        |  JOIN pc x ON x.l_partkey = p.part_a
        |  JOIN pc y ON y.l_partkey = p.part_b)
        |SELECT part_a, part_b, support, lift FROM scored
        |ORDER BY lift DESC, part_a, part_b LIMIT 100""".stripMargin,
    "q121_moving_revenue" ->
      s"""WITH daily AS (
         |  SELECT n_name AS nation,
         |         (epoch_ns(o_orderdate) // 1000000000) // 86400 AS day,
         |         SUM(CAST(floor(o_totalprice * 100.0 + 0.5) / 100.0 AS DECIMAL(18,2))) AS rev
         |  $nationOrdersSql
         |  GROUP BY 1, 2)
         |SELECT nation, day, CAST(rev AS DOUBLE) AS revenue,
         |       CAST(sum(rev) OVER w AS DOUBLE) AS rev_7d,
         |       CAST(count(*) OVER w AS BIGINT) AS n_7d,
         |       CAST(sum(rev) OVER w AS DOUBLE) / (count(*) OVER w)
         |         AS avg_7d
         |FROM daily
         |WINDOW w AS (PARTITION BY nation ORDER BY day
         |             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
         |ORDER BY nation, day""".stripMargin,
    "q122_markov_transitions" ->
      """WITH e AS (SELECT user_id, epoch_ns(ts) AS t, event_id, event_type
        |           FROM events),
        |r AS (SELECT event_type,
        |        lag(event_type) OVER (PARTITION BY user_id
        |                              ORDER BY t, event_id) AS prev_type
        |      FROM e),
        |c AS (SELECT prev_type, event_type AS next_type,
        |             CAST(count(*) AS BIGINT) AS n_transitions
        |      FROM r WHERE prev_type IS NOT NULL GROUP BY 1, 2)
        |SELECT prev_type, next_type, n_transitions,
        |       floor((CAST(n_transitions AS DOUBLE)
        |             / CAST(sum(n_transitions) OVER
        |                 (PARTITION BY prev_type) AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0 AS p
        |FROM c ORDER BY 1, 2""".stripMargin,
    "q123_unpivot_measures" -> meltOracle,
    "q124_abc_contribution" ->
      s"""WITH r AS (
         |  SELECT n_name AS nation, CAST(count(*) AS BIGINT) AS n_orders,
         |         SUM(CAST(floor(o_totalprice * 100.0 + 0.5) / 100.0 AS DECIMAL(18,2))) AS rev
         |  $nationOrdersSql
         |  GROUP BY 1),
         |c AS (SELECT nation, n_orders, CAST(rev AS DOUBLE) AS revenue,
         |        floor((CAST(rev AS DOUBLE)
         |              / CAST(sum(rev) OVER () AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0 AS share,
         |        floor((CAST(sum(rev) OVER (ORDER BY rev DESC, nation
         |                ROWS UNBOUNDED PRECEDING) AS DOUBLE)
         |              / CAST(sum(rev) OVER () AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0 AS cum_share
         |      FROM r)
         |SELECT nation, n_orders, revenue, share, cum_share,
         |       CASE WHEN cum_share <= 0.5 THEN 'A'
         |            WHEN cum_share <= 0.8 THEN 'B'
         |            ELSE 'C' END AS abc_class
         |FROM c ORDER BY cum_share, nation""".stripMargin,
    "q125_equidepth_histogram" -> equidepthOracle,
    "q179_new_vs_returning" ->
      """WITH o AS (
        |  SELECT o_custkey,
        |    ((epoch_ns(o_orderdate) // 1000000000) // 86400) // 30
        |      AS period,
        |    CAST(floor(o_totalprice * 100.0 + 0.5) / 100.0 AS DECIMAL(18,2)) AS v
        |  FROM orders),
        |f AS (SELECT o_custkey, min(period) AS first_period
        |      FROM o GROUP BY 1)
        |SELECT period,
        |  CASE WHEN period = first_period THEN 'new'
        |       ELSE 'returning' END AS cohort,
        |  CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(count(DISTINCT o.o_custkey) AS BIGINT) AS n_customers,
        |  CAST(sum(v) AS DOUBLE) AS revenue
        |FROM o JOIN f ON o.o_custkey = f.o_custkey
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q180_leadtime_sla" ->
      """WITH lt AS (
        |  SELECT o_orderpriority AS priority,
        |    (epoch_ns(l_shipdate) // 1000000000) // 86400
        |      - (epoch_ns(o_orderdate) // 1000000000) // 86400 AS lead_days
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
        |SELECT priority, CAST(count(*) AS BIGINT) AS n,
        |  floor((quantile_cont(lead_days, 0.5)) * 1000000.0 + 0.5) / 1000000.0 AS p50,
        |  floor((quantile_cont(lead_days, 0.9)) * 1000000.0 + 0.5) / 1000000.0 AS p90,
        |  floor((quantile_cont(lead_days, 0.99)) * 1000000.0 + 0.5) / 1000000.0 AS p99,
        |  CAST(sum(CASE WHEN lead_days > 60 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_breach
        |FROM lt GROUP BY 1 ORDER BY 1""".stripMargin,
    "q178_seasonal_anomaly" ->
      """WITH daily AS (
        |  SELECT (epoch_ns(o_orderdate) // 1000000000) // 86400 AS day,
        |    sum(CAST(floor(o_totalprice * 100.0 + 0.5) / 100.0 AS DECIMAL(18,2))) AS rev
        |  FROM orders GROUP BY 1),
        |d2 AS (SELECT day, rev, day % 7 AS dow FROM daily),
        |ex AS (SELECT dow,
        |         CAST(floor((CAST(sum(rev) AS DOUBLE) / count(*)) * 1000000.0 + 0.5) / 1000000.0
        |           AS DECIMAL(18,6)) AS expected
        |       FROM d2 GROUP BY 1),
        |r AS (SELECT day, rev, d2.dow, expected,
        |        rev - expected AS residual
        |      FROM d2 JOIN ex ON d2.dow = ex.dow),
        |m1 AS (SELECT min(residual) AS med FROM (
        |        SELECT residual,
        |          row_number() OVER (ORDER BY residual) AS rn,
        |          count(*) OVER () AS n FROM r)
        |       WHERE rn * 2 >= n),
        |dv AS (SELECT r.*, abs(residual - med) AS abs_dev
        |       FROM r CROSS JOIN m1),
        |m2 AS (SELECT min(abs_dev) AS mad FROM (
        |        SELECT abs_dev,
        |          row_number() OVER (ORDER BY abs_dev) AS rn,
        |          count(*) OVER () AS n FROM dv)
        |       WHERE rn * 2 >= n)
        |SELECT day, CAST(rev AS DOUBLE) AS revenue,
        |  CAST(expected AS DOUBLE) AS expected,
        |  CAST(residual AS DOUBLE) AS residual,
        |  CAST(abs_dev AS DOUBLE) AS abs_dev,
        |  abs_dev * 6745 > mad * 30000 AS is_anomaly
        |FROM dv CROSS JOIN m2
        |ORDER BY abs_dev DESC, day LIMIT 10""".stripMargin,
    "q173_period_growth" ->
      """WITH per AS (
        |  SELECT ((epoch_ns(o_orderdate) // 1000000000) // 86400) // 30
        |           AS period,
        |    sum(CAST(floor(o_totalprice * 100.0 + 0.5) / 100.0 AS DECIMAL(18,2))) AS revenue,
        |    CAST(count(*) AS BIGINT) AS n_orders
        |  FROM orders GROUP BY 1)
        |SELECT period, n_orders, CAST(revenue AS DOUBLE) AS revenue,
        |  floor((CAST(revenue - lag(revenue) OVER (ORDER BY period)
        |      AS DOUBLE)
        |    / CAST(lag(revenue) OVER (ORDER BY period) AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0
        |    AS growth
        |FROM per ORDER BY period""".stripMargin,
    "q189_kmv_union" ->
      s"""WITH d AS (SELECT DISTINCT event_type, user_id FROM events),
         |h AS (SELECT DISTINCT event_type,
         |        CAST(md5_number_lower('kmv:' || user_id::VARCHAR) & $H
         |          AS BIGINT) AS h
         |      FROM d),
         |r AS (SELECT event_type, h,
         |        row_number() OVER (PARTITION BY event_type ORDER BY h)
         |          AS rn
         |      FROM h),
         |sk AS (SELECT event_type, h FROM r WHERE rn <= 64),
         |t AS (SELECT DISTINCT event_type FROM events),
         |p AS (SELECT a.event_type AS ta, b.event_type AS tb
         |      FROM t a JOIN t b ON a.event_type < b.event_type),
         |u AS (
         |  SELECT ta, tb, h FROM p JOIN sk ON sk.event_type = ta
         |  UNION
         |  SELECT ta, tb, h FROM p JOIN sk ON sk.event_type = tb),
         |m AS (SELECT ta, tb, h,
         |        row_number() OVER (PARTITION BY ta, tb ORDER BY h) AS rn
         |      FROM u),
         |mk AS (SELECT ta, tb, CAST(count(*) AS BIGINT) AS n_kept,
         |         max(h) AS kth_hash
         |       FROM m WHERE rn <= 64 GROUP BY 1, 2),
         |sz AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n
         |       FROM d GROUP BY 1),
         |ix AS (SELECT a.event_type AS ta, b.event_type AS tb,
         |         CAST(count(*) AS BIGINT) AS n_ab
         |       FROM d a JOIN d b ON a.user_id = b.user_id
         |         AND a.event_type < b.event_type
         |       GROUP BY 1, 2)
         |SELECT mk.ta, mk.tb, sa.n + sb.n - ix.n_ab AS exact_union,
         |  n_kept, kth_hash,
         |  CASE WHEN n_kept < 64 THEN n_kept
         |    ELSE CAST((126::HUGEINT * 9223372036854775807::HUGEINT
         |        + kth_hash) // (2::HUGEINT * kth_hash) AS BIGINT)
         |  END AS est_union
         |FROM mk
         |JOIN sz sa ON sa.event_type = mk.ta
         |JOIN sz sb ON sb.event_type = mk.tb
         |JOIN ix ON ix.ta = mk.ta AND ix.tb = mk.tb
         |ORDER BY 1, 2""".stripMargin,
    "q191_kmv_intersect" ->
      s"""WITH d AS (SELECT DISTINCT event_type, user_id FROM events),
         |h AS (SELECT DISTINCT event_type,
         |        CAST(md5_number_lower('kmv:' || user_id::VARCHAR) & $H
         |          AS BIGINT) AS h
         |      FROM d),
         |r AS (SELECT event_type, h,
         |        row_number() OVER (PARTITION BY event_type ORDER BY h)
         |          AS rn
         |      FROM h),
         |sk AS (SELECT event_type, h FROM r WHERE rn <= 64),
         |t AS (SELECT DISTINCT event_type FROM events),
         |p AS (SELECT a.event_type AS ta, b.event_type AS tb
         |      FROM t a JOIN t b ON a.event_type < b.event_type),
         |u AS (
         |  SELECT ta, tb, h FROM p JOIN sk ON sk.event_type = ta
         |  UNION
         |  SELECT ta, tb, h FROM p JOIN sk ON sk.event_type = tb),
         |m AS (SELECT ta, tb, h,
         |        row_number() OVER (PARTITION BY ta, tb ORDER BY h) AS rn
         |      FROM u),
         |mm AS (SELECT ta, tb, h FROM m WHERE rn <= 64),
         |mk AS (SELECT ta, tb, CAST(count(*) AS BIGINT) AS n_kept,
         |         max(h) AS kth_hash
         |       FROM mm GROUP BY 1, 2),
         |cm AS (SELECT mm.ta, mm.tb, CAST(count(*) AS BIGINT) AS n_common
         |       FROM mm
         |       JOIN sk a ON a.event_type = mm.ta AND a.h = mm.h
         |       JOIN sk b ON b.event_type = mm.tb AND b.h = mm.h
         |       GROUP BY 1, 2),
         |ix AS (SELECT a.event_type AS ta, b.event_type AS tb,
         |         CAST(count(*) AS BIGINT) AS n_ab
         |       FROM d a JOIN d b ON a.user_id = b.user_id
         |         AND a.event_type < b.event_type
         |       GROUP BY 1, 2),
         |e AS (SELECT mk.ta, mk.tb, n_kept, kth_hash,
         |        coalesce(cm.n_common, 0) AS n_common,
         |        CASE WHEN n_kept < 64 THEN n_kept
         |          ELSE CAST((126::HUGEINT * 9223372036854775807::HUGEINT
         |              + kth_hash) // (2::HUGEINT * kth_hash) AS BIGINT)
         |        END AS est_union
         |      FROM mk LEFT JOIN cm
         |        ON cm.ta = mk.ta AND cm.tb = mk.tb)
         |SELECT e.ta, e.tb, n_common,
         |  floor((CAST(n_common AS DOUBLE) / CAST(n_kept AS DOUBLE))
         |      * 1000000.0 + 0.5) / 1000000.0 AS est_jaccard,
         |  CAST((2 * n_common * est_union + n_kept) // (2 * n_kept)
         |    AS BIGINT) AS est_intersection,
         |  ix.n_ab AS exact_intersection
         |FROM e JOIN ix ON ix.ta = e.ta AND ix.tb = e.tb
         |ORDER BY 1, 2""".stripMargin,
    "q194_quantile_sketch" ->
      s"""WITH r AS (
         |  SELECT event_type, event_id,
         |    CAST(floor(value * 100.0 + 0.5) / 100.0 AS DECIMAL(18,2)) AS v,
         |    CAST(md5_number_lower('qsk:' || event_id::VARCHAR) & $H
         |      AS BIGINT) AS h
         |  FROM events),
         |s1 AS (
         |  SELECT event_type, v, event_id,
         |    row_number() OVER (PARTITION BY event_type
         |      ORDER BY h, event_id) AS rn
         |  FROM r),
         |s2 AS (
         |  SELECT event_type, v,
         |    row_number() OVER (PARTITION BY event_type
         |      ORDER BY v, event_id) AS rk,
         |    COUNT(*) OVER (PARTITION BY event_type) AS n_s
         |  FROM s1 WHERE rn <= 256),
         |est AS (
         |  SELECT event_type, CAST(MAX(n_s) AS BIGINT) AS n_sample,
         |    MIN(CASE WHEN rk >= (n_s + 1) // 2 THEN v END) AS est_p50,
         |    MIN(CASE WHEN rk >= (n_s * 9 + 9) // 10 THEN v END) AS est_p90,
         |    MIN(CASE WHEN rk >= (n_s * 99 + 99) // 100 THEN v END)
         |      AS est_p99
         |  FROM s2 GROUP BY 1),
         |hist AS (SELECT event_type, v, COUNT(*) AS freq
         |         FROM r GROUP BY 1, 2),
         |cum AS (
         |  SELECT event_type, v,
         |    SUM(freq) OVER (PARTITION BY event_type ORDER BY v
         |      ROWS UNBOUNDED PRECEDING) AS c,
         |    SUM(freq) OVER (PARTITION BY event_type) AS n_rows
         |  FROM hist),
         |ex AS (
         |  SELECT event_type, CAST(MAX(n_rows) AS BIGINT) AS n_rows,
         |    MIN(CASE WHEN c >= (n_rows + 1) // 2 THEN v END) AS p50,
         |    MIN(CASE WHEN c >= (n_rows * 9 + 9) // 10 THEN v END) AS p90,
         |    MIN(CASE WHEN c >= (n_rows * 99 + 99) // 100 THEN v END) AS p99
         |  FROM cum GROUP BY 1)
         |SELECT est.event_type, n_rows, n_sample,
         |  floor(CAST(est_p50 AS DOUBLE) * 100.0 + 0.5) / 100.0 AS est_p50,
         |  floor(CAST(est_p90 AS DOUBLE) * 100.0 + 0.5) / 100.0 AS est_p90,
         |  floor(CAST(est_p99 AS DOUBLE) * 100.0 + 0.5) / 100.0 AS est_p99,
         |  floor(CAST(p50 AS DOUBLE) * 100.0 + 0.5) / 100.0 AS p50,
         |  floor(CAST(p90 AS DOUBLE) * 100.0 + 0.5) / 100.0 AS p90,
         |  floor(CAST(p99 AS DOUBLE) * 100.0 + 0.5) / 100.0 AS p99
         |FROM est JOIN ex USING (event_type)
         |ORDER BY 1""".stripMargin,
    "q187_kmv_distinct" ->
      s"""WITH d AS (SELECT DISTINCT event_type, user_id FROM events),
         |h AS (SELECT DISTINCT event_type,
         |        CAST(md5_number_lower('kmv:' || user_id::VARCHAR) & $H
         |          AS BIGINT) AS h
         |      FROM d),
         |r AS (SELECT event_type, h,
         |        row_number() OVER (PARTITION BY event_type ORDER BY h)
         |          AS rn
         |      FROM h),
         |kth AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_kept,
         |          max(h) AS kth_hash
         |        FROM r WHERE rn <= 64 GROUP BY 1),
         |ex AS (SELECT event_type,
         |         CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact
         |       FROM events GROUP BY 1)
         |SELECT kth.event_type, n_exact, n_kept, kth_hash,
         |  CASE WHEN n_kept < 64 THEN n_exact
         |    ELSE CAST((126::HUGEINT * 9223372036854775807::HUGEINT
         |        + kth_hash) // (2::HUGEINT * kth_hash) AS BIGINT)
         |  END AS est_distinct
         |FROM kth JOIN ex ON kth.event_type = ex.event_type
         |ORDER BY 1""".stripMargin,
    "q185_skew_profile" ->
      """WITH c AS (SELECT user_id, count(*) AS n FROM events GROUP BY 1),
        |t AS (SELECT CAST(count(*) AS BIGINT) AS n_keys,
        |        CAST(sum(n) AS BIGINT) AS total_rows,
        |        CAST(max(n) AS BIGINT) AS max_n FROM c),
        |h AS (SELECT n, count(*) AS freq FROM c GROUP BY 1),
        |cum AS (SELECT n, sum(freq) OVER (ORDER BY n
        |          ROWS UNBOUNDED PRECEDING) AS ckeys FROM h),
        |p AS (SELECT
        |    min(CASE WHEN ckeys >= (n_keys + 1) // 2 THEN n END) AS p50_n,
        |    min(CASE WHEN ckeys >= (n_keys * 9 + 9) // 10 THEN n END)
        |      AS p90_n,
        |    min(CASE WHEN ckeys >= (n_keys * 99 + 99) // 100 THEN n END)
        |      AS p99_n
        |  FROM cum CROSS JOIN t),
        |top10 AS (SELECT user_id, n FROM c
        |          ORDER BY n DESC, user_id LIMIT 10),
        |t10 AS (SELECT CAST(sum(n) AS BIGINT) AS top10_n FROM top10),
        |t1 AS (SELECT user_id AS top1_key, CAST(n AS BIGINT) AS top1_n
        |       FROM top10 ORDER BY n DESC, user_id LIMIT 1)
        |SELECT n_keys, total_rows, max_n,
        |  CAST(p50_n AS BIGINT) AS p50_n, CAST(p90_n AS BIGINT) AS p90_n,
        |  CAST(p99_n AS BIGINT) AS p99_n, top1_key, top1_n,
        |  floor((CAST(top10_n AS DOUBLE) * 100.0 / total_rows)
        |      * 1000000.0 + 0.5) / 1000000.0
        |    AS top10_share_pct
        |FROM t CROSS JOIN p CROSS JOIN t1 CROSS JOIN t10""".stripMargin,
    "q167_weighted_median" ->
      """WITH li AS (
        |  SELECT n_name AS nation,
        |    CAST(floor(l_extendedprice * 100.0 + 0.5) / 100.0
        |      AS DECIMAL(18,2)) AS v,
        |    CAST(floor(l_quantity * 100.0 + 0.5) / 100.0
        |      AS DECIMAL(18,2)) AS wq
        |  FROM lineitem
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey),
        |byv AS (SELECT nation, v, sum(wq) AS wv FROM li GROUP BY 1, 2),
        |c AS (SELECT nation, v,
        |        sum(wv) OVER (PARTITION BY nation ORDER BY v
        |          ROWS UNBOUNDED PRECEDING) AS cumw,
        |        sum(wv) OVER (PARTITION BY nation) AS totw
        |      FROM byv)
        |SELECT nation,
        |  floor(CAST(min(v) AS DOUBLE) * 100.0 + 0.5) / 100.0
        |    AS weighted_median,
        |  floor(CAST(max(totw) AS DOUBLE) * 100.0 + 0.5) / 100.0
        |    AS total_qty
        |FROM c WHERE cumw * 2 >= totw
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q168_decision_stump" ->
      """WITH o AS (
        |  SELECT CAST(floor(o_totalprice / 10000) * 10000 AS BIGINT)
        |           AS bkt,
        |    CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |      THEN 1 ELSE 0 END AS y
        |  FROM orders),
        |b AS (SELECT bkt, CAST(count(*) AS BIGINT) AS n,
        |        CAST(sum(y) AS BIGINT) AS p FROM o GROUP BY 1),
        |c AS (SELECT bkt,
        |        sum(n) OVER (ORDER BY bkt ROWS UNBOUNDED PRECEDING) AS nl,
        |        sum(p) OVER (ORDER BY bkt ROWS UNBOUNDED PRECEDING) AS pl,
        |        sum(n) OVER () AS nt, sum(p) OVER () AS pt
        |      FROM b),
        |s AS (SELECT bkt, nl, pl, nt, pt,
        |        CAST(pl AS DOUBLE) / CAST(nl AS DOUBLE) AS fl,
        |        CAST(pt - pl AS DOUBLE) / CAST(nt - nl AS DOUBLE) AS fr
        |      FROM c WHERE nl < nt)
        |SELECT bkt AS threshold, CAST(nl AS BIGINT) AS n_left,
        |  CAST(pl AS BIGINT) AS pos_left,
        |  CAST(nt - nl AS BIGINT) AS n_right,
        |  CAST(pt - pl AS BIGINT) AS pos_right,
        |  floor(((CAST(nl AS DOUBLE) / CAST(nt AS DOUBLE))
        |      * (1.0 - fl * fl - (1.0 - fl) * (1.0 - fl))
        |    + (CAST(nt - nl AS DOUBLE) / CAST(nt AS DOUBLE))
        |      * (1.0 - fr * fr - (1.0 - fr) * (1.0 - fr))) * 1000000.0 + 0.5) / 1000000.0
        |    AS weighted_gini,
        |  floor(((CAST(nl AS DOUBLE) / CAST(nt AS DOUBLE))
        |      * (1.0 - fl * fl - (1.0 - fl) * (1.0 - fl))
        |    + (CAST(nt - nl AS DOUBLE) / CAST(nt AS DOUBLE))
        |      * (1.0 - fr * fr - (1.0 - fr) * (1.0 - fr))) * 1000000.0 + 0.5) / 1000000.0
        |    = min(floor(((CAST(nl AS DOUBLE) / CAST(nt AS DOUBLE))
        |      * (1.0 - fl * fl - (1.0 - fl) * (1.0 - fl))
        |    + (CAST(nt - nl AS DOUBLE) / CAST(nt AS DOUBLE))
        |      * (1.0 - fr * fr - (1.0 - fr) * (1.0 - fr))) * 1000000.0 + 0.5) / 1000000.0) OVER ()
        |    AS is_best
        |FROM s ORDER BY threshold""".stripMargin,
    "q166_covisitation" ->
      """WITH v AS (
        |  SELECT user_id, epoch_ns(ts) AS ts, event_id,
        |    CAST(json_extract_string(props, '$.k') AS INT) AS item_id
        |  FROM events WHERE event_type = 'view'
        |    AND json_extract_string(props, '$.k') IS NOT NULL),
        |s AS (SELECT user_id, item_id,
        |    sum(CASE WHEN prev_ts IS NULL OR ts - prev_ts > 1800000000000
        |          THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS UNBOUNDED PRECEDING) AS session_id
        |  FROM (SELECT *, lag(ts) OVER (PARTITION BY user_id
        |          ORDER BY ts, event_id) AS prev_ts FROM v)),
        |si AS (SELECT DISTINCT user_id, session_id, item_id FROM s),
        |p AS (SELECT a.item_id, b.item_id AS also_item,
        |        count(*) AS n_sessions
        |      FROM si a JOIN si b ON a.user_id = b.user_id
        |        AND a.session_id = b.session_id
        |        AND a.item_id <> b.item_id
        |      GROUP BY 1, 2),
        |r AS (SELECT item_id, also_item, n_sessions,
        |        row_number() OVER (PARTITION BY item_id
        |          ORDER BY n_sessions DESC, also_item) AS rank
        |      FROM p)
        |SELECT item_id, rank, also_item, n_sessions
        |FROM r WHERE rank <= 5 ORDER BY item_id, rank""".stripMargin,
    "q164_holt_forecast" ->
      s"""WITH RECURSIVE idx AS (
         |  SELECT nation, day, revenue,
         |         row_number() OVER (PARTITION BY nation ORDER BY day) AS i
         |  FROM (SELECT n_name AS nation,
         |          (epoch_ns(o_orderdate) // 1000000000) // 86400 AS day,
         |          CAST(SUM(CAST(floor(o_totalprice * 100.0 + 0.5) / 100.0 AS DECIMAL(18,2))) AS DOUBLE)
         |            AS revenue
         |        $nationOrdersSql
         |        GROUP BY 1, 2)),
         |rec AS (
         |  SELECT nation, day, revenue, i, revenue AS l,
         |         CAST(0.0 AS DOUBLE) AS b
         |  FROM idx WHERE i = 1
         |  UNION ALL
         |  SELECT nation, day, revenue, i, l_new,
         |         CAST(0.1 AS DOUBLE) * (l_new - l_prev)
         |           + (CAST(1.0 AS DOUBLE) - CAST(0.1 AS DOUBLE)) * b_prev
         |  FROM (SELECT idx.nation, idx.day, idx.revenue, idx.i,
         |          rec.l AS l_prev, rec.b AS b_prev,
         |          CAST(0.3 AS DOUBLE) * idx.revenue
         |            + (CAST(1.0 AS DOUBLE) - CAST(0.3 AS DOUBLE))
         |              * (rec.l + rec.b) AS l_new
         |        FROM idx JOIN rec ON idx.nation = rec.nation
         |                         AND idx.i = rec.i + 1))
         |SELECT nation, day, revenue, floor((l) * 1000000.0 + 0.5) / 1000000.0 AS level,
         |  floor((b) * 1000000.0 + 0.5) / 1000000.0 AS trend, floor((l + b) * 1000000.0 + 0.5) / 1000000.0 AS forecast
         |FROM rec ORDER BY nation, day""".stripMargin,
    "q127_ewma_revenue" ->
      s"""WITH RECURSIVE idx AS (
         |  SELECT nation, day, revenue,
         |         row_number() OVER (PARTITION BY nation ORDER BY day) AS i
         |  FROM (SELECT n_name AS nation,
         |          (epoch_ns(o_orderdate) // 1000000000) // 86400 AS day,
         |          CAST(SUM(CAST(floor(o_totalprice * 100.0 + 0.5) / 100.0 AS DECIMAL(18,2))) AS DOUBLE)
         |            AS revenue
         |        $nationOrdersSql
         |        GROUP BY 1, 2)),
         |rec AS (
         |  SELECT nation, day, revenue, i, revenue AS s
         |  FROM idx WHERE i = 1
         |  UNION ALL
         |  SELECT idx.nation, idx.day, idx.revenue, idx.i,
         |         CAST(0.2 AS DOUBLE) * idx.revenue
         |           + CAST(0.8 AS DOUBLE) * rec.s
         |  FROM idx JOIN rec ON idx.nation = rec.nation
         |                   AND idx.i = rec.i + 1)
         |SELECT nation, day, revenue, floor((s) * 1000000.0 + 0.5) / 1000000.0 AS ewma
         |FROM rec ORDER BY nation, day""".stripMargin,
    "q128_dq_report" ->
      """WITH rules AS (
        |  SELECT 'lineitem_quantity_in_1_50' AS rule,
        |         CAST(count(*) AS BIGINT) AS n_checked,
        |         CAST(sum(CASE WHEN l_quantity < 1 OR l_quantity > 50
        |                       THEN 1 ELSE 0 END) AS BIGINT) AS n_violations
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'orders_totalprice_positive',
        |         CAST(count(*) AS BIGINT),
        |         CAST(sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END)
        |              AS BIGINT)
        |  FROM orders
        |  UNION ALL
        |  SELECT 'customer_custkey_unique',
        |         CAST(count(*) AS BIGINT),
        |         CAST(count(*) - count(DISTINCT c_custkey) AS BIGINT)
        |  FROM customer
        |  UNION ALL
        |  SELECT 'events_value_nonnull',
        |         CAST(count(*) AS BIGINT),
        |         CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END)
        |              AS BIGINT)
        |  FROM events
        |  UNION ALL
        |  SELECT 'lineitem_orderkey_in_orders',
        |         CAST(count(*) AS BIGINT),
        |         CAST(sum(CASE WHEN NOT EXISTS
        |                (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey)
        |                       THEN 1 ELSE 0 END) AS BIGINT)
        |  FROM lineitem)
        |SELECT rule, n_checked, n_violations, n_violations = 0 AS pass
        |FROM rules ORDER BY rule""".stripMargin,
    "q129_sorted_neighborhood" ->
      """WITH names AS (SELECT DISTINCT p_name AS name FROM part),
        |p1 AS (SELECT name, lead(name, 1) OVER w AS n1,
        |              lead(name, 2) OVER w AS n2, lead(name, 3) OVER w AS n3
        |       FROM names
        |       WINDOW w AS (PARTITION BY substring(name, 1, 1)
        |                    ORDER BY name)),
        |p2 AS (SELECT name, lead(name, 1) OVER w AS n1,
        |              lead(name, 2) OVER w AS n2, lead(name, 3) OVER w AS n3
        |       FROM names
        |       WINDOW w AS (PARTITION BY substring(reverse(name), 1, 1)
        |                    ORDER BY reverse(name))),
        |cand AS (
        |  SELECT least(name, nb) AS name_a, greatest(name, nb) AS name_b
        |  FROM (SELECT name, unnest([n1, n2, n3]) AS nb FROM p1
        |        UNION ALL
        |        SELECT name, unnest([n1, n2, n3]) AS nb FROM p2)
        |  WHERE nb IS NOT NULL)
        |SELECT DISTINCT name_a, name_b,
        |       CAST(levenshtein(name_a, name_b) AS BIGINT) AS dist
        |FROM cand
        |WHERE levenshtein(name_a, name_b) BETWEEN 1 AND 2
        |ORDER BY 1, 2""".stripMargin,
    "q130_rank_fusion" ->
      """WITH stats AS (
        |  SELECT l_partkey, SUM(CAST(floor(l_extendedprice * 100.0 + 0.5) / 100.0 AS DECIMAL(18,2)))
        |           AS rev,
        |         CAST(count(*) AS BIGINT) AS n
        |  FROM lineitem GROUP BY 1),
        |br AS (SELECT l_partkey,
        |         row_number() OVER (ORDER BY rev DESC, l_partkey) AS r_rev
        |       FROM stats ORDER BY rev DESC, l_partkey LIMIT 100),
        |bn AS (SELECT l_partkey AS pk2,
        |         row_number() OVER (ORDER BY n DESC, l_partkey) AS r_n
        |       FROM stats ORDER BY n DESC, l_partkey LIMIT 100)
        |SELECT coalesce(br.l_partkey, bn.pk2) AS part_key, r_rev, r_n,
        |       floor((coalesce(CAST(1 AS DOUBLE) / (60 + r_rev), 0)
        |             + coalesce(CAST(1 AS DOUBLE) / (60 + r_n), 0)) * 1000000.0 + 0.5) / 1000000.0
        |         AS rrf
        |FROM br FULL OUTER JOIN bn ON br.l_partkey = bn.pk2
        |ORDER BY rrf DESC, part_key LIMIT 25""".stripMargin,
    "q131_ab_ztest" ->
      s"""WITH u AS (SELECT DISTINCT user_id FROM events),
         |a AS (SELECT user_id,
         |        CASE WHEN ((md5_number_lower('ab:' || user_id::VARCHAR)
         |                    & $H)::BIGINT % 2) = 0
         |             THEN 'A' ELSE 'B' END AS variant
         |      FROM u),
         |c AS (SELECT DISTINCT user_id FROM events
         |      WHERE event_type = 'purchase' AND value > 150),
         |v AS (SELECT variant, CAST(count(*) AS BIGINT) AS n,
         |        CAST(sum(CASE WHEN c.user_id IS NOT NULL THEN 1 ELSE 0 END)
         |             AS BIGINT) AS k
         |      FROM a LEFT JOIN c ON a.user_id = c.user_id GROUP BY 1),
         |w AS (SELECT
         |  CAST(sum(CASE WHEN variant = 'A' THEN n END) AS BIGINT) AS n_a,
         |  CAST(sum(CASE WHEN variant = 'A' THEN k END) AS BIGINT) AS conv_a,
         |  CAST(sum(CASE WHEN variant = 'B' THEN n END) AS BIGINT) AS n_b,
         |  CAST(sum(CASE WHEN variant = 'B' THEN k END) AS BIGINT) AS conv_b
         |  FROM v)
         |SELECT n_a, conv_a, n_b, conv_b,
         |  floor((CAST(conv_a AS DOUBLE) / n_a) * 1000000.0 + 0.5) / 1000000.0 AS rate_a,
         |  floor((CAST(conv_b AS DOUBLE) / n_b) * 1000000.0 + 0.5) / 1000000.0 AS rate_b,
         |  floor(((CAST(conv_a AS DOUBLE) / n_a - CAST(conv_b AS DOUBLE) / n_b)
         |        / sqrt((CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
         |               * (1.0 - CAST(conv_a + conv_b AS DOUBLE)
         |                        / (n_a + n_b))
         |               * (CAST(1 AS DOUBLE) / n_a
         |                  + CAST(1 AS DOUBLE) / n_b))) * 1000000.0 + 0.5) / 1000000.0 AS z
         |FROM w""".stripMargin,
    "q133_pit_join" ->
      """WITH e AS (SELECT user_id, event_type, epoch_ns(ts) AS t, event_id,
        |                  value FROM events),
        |r AS (SELECT user_id, event_type, t, event_id,
        |        CASE WHEN lag(event_type) OVER w IS NULL
        |               OR lag(event_type) OVER w <> event_type
        |             THEN 1 ELSE 0 END AS chg
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)),
        |s AS (SELECT user_id, event_type, t,
        |        sum(chg) OVER (PARTITION BY user_id ORDER BY t, event_id
        |                       ROWS UNBOUNDED PRECEDING) AS run_id
        |      FROM r),
        |g AS (SELECT user_id, run_id, min(event_type) AS prior_state,
        |             min(t) AS vf
        |      FROM s GROUP BY 1, 2),
        |dim AS (SELECT user_id, prior_state, vf, lead(vf) OVER w2 AS vt
        |        FROM g WINDOW w2 AS (PARTITION BY user_id ORDER BY run_id)),
        |f AS (SELECT user_id, event_id, t, value FROM e
        |      WHERE event_type = 'purchase')
        |SELECT f.user_id, f.event_id,
        |       CAST(f.t // 1000000000 AS BIGINT) AS ts_s,
        |       d.prior_state, f.value
        |FROM f LEFT JOIN dim d
        |  ON d.user_id = f.user_id AND d.vf <= f.t - 1
        | AND (d.vt IS NULL OR f.t - 1 < d.vt)
        |ORDER BY f.event_id""".stripMargin,
    "q134_event_paths" ->
      """WITH e AS (SELECT user_id, epoch_ns(ts) AS t, event_id, event_type
        |           FROM events),
        |p AS (SELECT event_type AS s1,
        |        lead(event_type, 1) OVER w AS s2,
        |        lead(event_type, 2) OVER w AS s3
        |      FROM e WINDOW w AS (PARTITION BY user_id
        |                          ORDER BY t, event_id))
        |SELECT s1, s2, s3, CAST(count(*) AS BIGINT) AS n
        |FROM p WHERE s2 IS NOT NULL AND s3 IS NOT NULL
        |GROUP BY 1, 2, 3
        |ORDER BY n DESC, s1, s2, s3 LIMIT 20""".stripMargin,
    "q135_grouping_sets" ->
      s"""SELECT n_name AS nation, o_orderstatus AS status,
         |       CAST(count(*) AS BIGINT) AS n,
         |       CAST(SUM(CAST(floor(o_totalprice * 100.0 + 0.5) / 100.0 AS DECIMAL(18,2))) AS DOUBLE)
         |         AS revenue,
         |       CAST(2 * GROUPING(n_name) + GROUPING(o_orderstatus)
         |            AS BIGINT) AS gid
         |$nationOrdersSql
         |GROUP BY GROUPING SETS ((n_name), (o_orderstatus), ())
         |ORDER BY gid, nation NULLS FIRST, status NULLS FIRST""".stripMargin,
    "q126_mad_outliers" ->
      """WITH ev AS (SELECT event_id, event_type, value FROM events),
        |med AS (SELECT event_type, floor((quantile_cont(value, 0.5)) * 1000000.0 + 0.5) / 1000000.0
        |          AS med
        |        FROM ev GROUP BY 1),
        |dev AS (SELECT e.event_id, e.event_type, e.value, m.med,
        |               abs(e.value - m.med) AS adev
        |        FROM ev e JOIN med m USING (event_type)),
        |mad AS (SELECT event_type, floor((quantile_cont(adev, 0.5)) * 1000000.0 + 0.5) / 1000000.0
        |          AS mad
        |        FROM dev GROUP BY 1)
        |SELECT d.event_id, d.event_type, d.value, d.med, m.mad,
        |       floor((0.6745 * (d.value - d.med) / m.mad) * 1000000.0 + 0.5) / 1000000.0 AS rz
        |FROM dev d JOIN mad m USING (event_type)
        |WHERE abs(floor((0.6745 * (d.value - d.med) / m.mad) * 1000000.0 + 0.5) / 1000000.0) >= 3.5
        |ORDER BY d.event_id""".stripMargin)
}
