package graft.queries

import graft.io.Tables
import graft.ops.Relational.decSum

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
    val daily = nationOrders(spark, dir)
      .select(col("n_name").as("nation"),
        expr("cast(cast(o_orderdate as timestamp) as long) div 86400")
          .as("day"),
        col("o_totalprice").cast(DecimalType(18, 2)).as("p"))
      .groupBy("nation", "day")
      .agg(sum(col("p")).as("rev"))
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
      .withColumn("p", round(col("n_transitions").cast("double") /
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
        round(col("rev").cast("double") /
          sum(col("rev")).over(tot).cast("double"), 6).as("share"),
        round(sum(col("rev")).over(cum).cast("double") /
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
      .select(expr("transform(raw, b -> round(b, 6))").as("bs"))
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
      .agg(round(expr("percentile(value, 0.5D)"), 6).as("med"))
    val dev = ev.join(broadcast(med), "event_type")
      .withColumn("adev", abs(col("value") - col("med")))
    val mad = dev.groupBy("event_type")
      .agg(round(expr("percentile(adev, 0.5D)"), 6).as("mad"))
    dev.join(broadcast(mad), "event_type")
      .withColumn("rz",
        round(lit(0.6745) * (col("value") - col("med")) / col("mad"), 6))
      .filter(abs(col("rz")) >= 3.5)
      .select("event_id", "event_type", "value", "med", "mad", "rz")
      .orderBy("event_id")
  }

  val queries: Map[String, Q] = Map(
    "q121_moving_revenue" -> q121,
    "q122_markov_transitions" -> q122,
    "q123_unpivot_measures" -> q123,
    "q124_abc_contribution" -> q124,
    "q125_equidepth_histogram" -> q125,
    "q126_mad_outliers" -> q126)

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
      .map(i => s"round(quantile_cont(o_totalprice, 0.$i), 6) AS b$i")
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

  val oracles: Map[String, String] = Map(
    "q121_moving_revenue" ->
      s"""WITH daily AS (
         |  SELECT n_name AS nation,
         |         (epoch_ns(o_orderdate) // 1000000000) // 86400 AS day,
         |         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
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
        |       round(CAST(n_transitions AS DOUBLE)
        |             / CAST(sum(n_transitions) OVER
        |                 (PARTITION BY prev_type) AS DOUBLE), 6) AS p
        |FROM c ORDER BY 1, 2""".stripMargin,
    "q123_unpivot_measures" -> meltOracle,
    "q124_abc_contribution" ->
      s"""WITH r AS (
         |  SELECT n_name AS nation, CAST(count(*) AS BIGINT) AS n_orders,
         |         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
         |  $nationOrdersSql
         |  GROUP BY 1),
         |c AS (SELECT nation, n_orders, CAST(rev AS DOUBLE) AS revenue,
         |        round(CAST(rev AS DOUBLE)
         |              / CAST(sum(rev) OVER () AS DOUBLE), 6) AS share,
         |        round(CAST(sum(rev) OVER (ORDER BY rev DESC, nation
         |                ROWS UNBOUNDED PRECEDING) AS DOUBLE)
         |              / CAST(sum(rev) OVER () AS DOUBLE), 6) AS cum_share
         |      FROM r)
         |SELECT nation, n_orders, revenue, share, cum_share,
         |       CASE WHEN cum_share <= 0.5 THEN 'A'
         |            WHEN cum_share <= 0.8 THEN 'B'
         |            ELSE 'C' END AS abc_class
         |FROM c ORDER BY cum_share, nation""".stripMargin,
    "q125_equidepth_histogram" -> equidepthOracle,
    "q126_mad_outliers" ->
      """WITH ev AS (SELECT event_id, event_type, value FROM events),
        |med AS (SELECT event_type, round(quantile_cont(value, 0.5), 6)
        |          AS med
        |        FROM ev GROUP BY 1),
        |dev AS (SELECT e.event_id, e.event_type, e.value, m.med,
        |               abs(e.value - m.med) AS adev
        |        FROM ev e JOIN med m USING (event_type)),
        |mad AS (SELECT event_type, round(quantile_cont(adev, 0.5), 6)
        |          AS mad
        |        FROM dev GROUP BY 1)
        |SELECT d.event_id, d.event_type, d.value, d.med, m.mad,
        |       round(0.6745 * (d.value - d.med) / m.mad, 6) AS rz
        |FROM dev d JOIN mad m USING (event_type)
        |WHERE abs(round(0.6745 * (d.value - d.med) / m.mad, 6)) >= 3.5
        |ORDER BY d.event_id""".stripMargin)
}
