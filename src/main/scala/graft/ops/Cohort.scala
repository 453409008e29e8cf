package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cohort retention — the classic product-analytics triangle: users
  * bucketed by first-activity week, activity counted per (cohort week,
  * weeks-since-first) cell.
  *
  * All time arithmetic is integer division on the ns-epoch long (the
  * repo-wide cross-engine convention — no calendar functions, so Spark
  * and the DuckDB oracle agree bit-for-bit and the result is
  * timezone-free).
  *
  * Scale shape: ONE scan of the event table. The per-user first day is
  * an unordered `min over (partition by user)` window — one user_id
  * exchange, no aggregate-and-join-back (the join form scans the fact
  * table twice and shuffles both sides). The final (cohort, offset)
  * aggregate is tiny (weeks², not users); the count_distinct is the only
  * cardinality-bearing state and it is bounded per cell by cohort size —
  * at extreme scale swap in approx_count_distinct for fixed-space cells.
  */
object Cohort {

  /** (cohort_week, week_offset, active_users) from an event frame with a
    * user key and an ns-epoch long timestamp. Weeks are epoch-day / 7
    * buckets (origin 1970-01-01, a Thursday — an arbitrary but
    * engine-stable week boundary). */
  def retention(events: DataFrame, userCol: String,
                tsNsCol: String): DataFrame = {
    val d = events.select(col(userCol).as("__user"),
      (col(tsNsCol) cast "long").as("__ns"))
      .withColumn("day", expr("__ns div 86400000000000"))
    d.withColumn("first_day",
        min("day").over(Window.partitionBy("__user")))
      .select(expr("first_day div 7").as("cohort_week"),
        expr("(day - first_day) div 7").as("week_offset"),
        col("__user"))
      .groupBy("cohort_week", "week_offset")
      .agg(countDistinct("__user").as("active_users"))
  }
}
