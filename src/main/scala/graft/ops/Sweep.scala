package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed sweep-line over intervals: how many are active at once,
  * per day — the concurrency/occupancy profile (peak simultaneous
  * sessions, connections, jobs).
  *
  * The naive sweep is a GLOBAL running sum over time-ordered ±1
  * boundary events — a single sort partition, the classic
  * does-not-scale shape. This op splits it into the standard two-phase
  * prefix sum:
  *   1. within-day running sums (hash-partitioned by day — parallel,
  *      partition-local sort);
  *   2. a per-day carry = prefix sum of per-day delta TOTALS over the
  *      tiny (calendar-bounded) day frame — the only global window, over
  *      |days| rows, never over boundaries;
  *   3. day concurrency = carry + within-day run.
  * The same decomposition cascades (day → hour → minute) if single days
  * are still too hot.
  *
  * Boundary tie rule: at equal timestamps, ends (−1) apply before starts
  * (+1) — back-to-back intervals don't overlap, and a zero-length
  * interval never registers. Both the engine sort and the oracle sort
  * order by (t, delta), making the rule engine-neutral.
  */
object Sweep {

  // Day bucketing uses Spark's `div` — integer division TRUNCATING
  // toward zero, which is exactly what DuckDB's integer `//` does too
  // (measured on DuckDB 1.0: -1 // 86400 = 0, -86401 // 86400 = -1),
  // so engine and oracle agree bit-for-bit at ANY sign. The CALENDAR
  // contract is narrower: a pre-epoch (negative-ns) timestamp buckets
  // into truncated — not floored — days on both sides, i.e. ts ∈
  // (-1 day, 0) lands in day 0. All graft day math therefore assumes
  // ts ≥ 0 (asserted against the test tables in DayBucketContractSpec);
  // feeds with pre-1970 instants must floor-adjust upstream.
  private val DayNs = 86400000000000L

  /** (day, max_concurrency, n_boundaries) for each day containing at
    * least one interval boundary. `startCol`/`endCol` are ns-epoch longs;
    * a day's max includes its carried-in start-of-day level (a day of
    * pure endings peaks at its opening concurrency, not below it). */
  def dailyConcurrency(intervals: DataFrame, startCol: String,
                       endCol: String): DataFrame = {
    val deltas = intervals
      .select(col(startCol).cast("long").as("t"), lit(1L).as("d"))
      .unionAll(intervals
        .select(col(endCol).cast("long").as("t"), lit(-1L).as("d")))
      .withColumn("day", expr(s"t div $DayNs"))
    val withinDay = Window.partitionBy("day").orderBy(col("t"), col("d"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val perDay = deltas
      .withColumn("run", sum(col("d")).over(withinDay))
      .groupBy("day")
      .agg(max(col("run")).as("max_run"),
        sum(col("d")).as("day_delta"),
        count(lit(1)).as("n_boundaries"))
    // The only unpartitioned window: |days| rows, calendar-bounded.
    val carried = perDay.withColumn("carry",
      coalesce(sum(col("day_delta")).over(Window.orderBy("day")
        .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    carried.select(col("day"),
      (col("carry") + greatest(col("max_run"), lit(0L)))
        .as("max_concurrency"),
      col("n_boundaries"))
  }

  /** Interval-UNION coverage per day — total ns during which at least
    * one interval is active (overlaps merged): the utilization / SLA-
    * uptime twin of [[dailyConcurrency]]'s peak readout. Intervals are
    * CLIPPED to day boundaries first (each explodes to its ≤ span-days
    * segments — session-length intervals yield 1–2), so every sweep is
    * day-local with NO cross-day carry: fully parallel by day, and a
    * multi-day interval still credits every covered day exactly.
    * Within a day, busy time = Σ gaps between consecutive boundary
    * events whose running level > 0; at tied timestamps only the tie
    * group's last row carries a positive gap and its running sum is
    * permutation-invariant, so the result is deterministic. All-integer
    * ns arithmetic. */
  def dailyBusyTime(intervals: DataFrame, startCol: String,
                    endCol: String): DataFrame = {
    val segs = intervals
      .select(col(startCol).cast("long").as("st"),
        col(endCol).cast("long").as("en"))
      .filter(col("en") > col("st"))
      .withColumn("day", explode(sequence(
        expr(s"st div $DayNs"), expr(s"en div $DayNs"))))
      .select(col("day"),
        greatest(col("st"), col("day") * DayNs).as("s"),
        least(col("en"), (col("day") + 1) * DayNs).as("e"))
      .filter(col("e") > col("s"))
    val deltas = segs.select(col("day"), col("s").as("t"), lit(1L).as("d"))
      .unionAll(segs.select(col("day"), col("e").as("t"),
        lit(-1L).as("d")))
    val wRun = Window.partitionBy("day").orderBy(col("t"), col("d"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wSeq = Window.partitionBy("day").orderBy(col("t"), col("d"))
    deltas
      .withColumn("run", sum(col("d")).over(wRun))
      .withColumn("nxt", lead(col("t"), 1).over(wSeq))
      .withColumn("busy", when(col("run") > 0 && col("nxt").isNotNull,
        col("nxt") - col("t")).otherwise(lit(0L)))
      .groupBy("day")
      .agg(sum(col("busy")).as("busy_ns"),
        (count(lit(1)) / 2).cast("long").as("n_segments"))
  }
}
