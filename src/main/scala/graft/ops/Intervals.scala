package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval (range) joins, executed as bucketed EQUI-joins.
  *
  * The naive plan for `points ⋈ intervals ON day BETWEEN d0 AND d1` is a
  * nested-loop join — broadcast-nested-loop when one side is small,
  * cartesian otherwise — because a pure inequality predicate gives the
  * planner no equi-key. That is O(|points|·|intervals|) comparisons: fine
  * for a dozen campaign windows, fatal for millions of intervals.
  *
  * The scale shape used here is the standard bucketization rewrite: pick
  * a bucket width W, explode each interval onto the ⌈len/W⌉+1 buckets it
  * touches, map each point to its single bucket `day div W`, hash-join on
  * the bucket id, and re-check the exact range predicate after the join.
  * Every true (point, interval) match shares exactly one bucket — the
  * point's — so no dedup pass is needed; false candidates are confined to
  * the two edge buckets of each interval. Cost becomes
  * O(|points| + Σ⌈len/W⌉) join rows: linear, shuffled on a key both
  * sides agree on, AQE-skew-splittable, and broadcast-able when the
  * exploded interval side is small.
  *
  * Reference scope note: the reference has no range joins (SURVEY §2.3
  * "Absent"); this is part of the engine's warehouse-analytics extension
  * surface, the batch counterpart of the q81 stream-stream interval
  * join.
  */
object Intervals {

  /** Equi-join `points` to every interval containing its `pointDay`.
    *
    * @param points    fact side; must carry integer column `pointDay`.
    * @param intervals interval side; must carry integer columns `d0`/`d1`
    *                  (inclusive bounds, `d0 <= d1`); all its columns are
    *                  kept on the output.
    * @param bucketDays bucket width W — choose ≳ the typical interval
    *                   length so most intervals explode to ≤ 2 buckets.
    *                   Non-negative day domains only (`div` truncation
    *                   and floor division agree there; epoch-days are
    *                   non-negative for all post-1970 data).
    */
  def pointInIntervalJoin(points: DataFrame, pointDay: String,
                          intervals: DataFrame, d0: String, d1: String,
                          bucketDays: Int): DataFrame = {
    require(bucketDays >= 1, s"bucketDays must be >= 1, got $bucketDays")
    val iv = intervals.withColumn("__bucket",
      explode(sequence(expr(s"$d0 div $bucketDays"),
        expr(s"$d1 div $bucketDays"))))
    val pt = points.withColumn("__bucket",
      expr(s"$pointDay div $bucketDays"))
    pt.join(iv, Seq("__bucket"))
      .filter(col(pointDay) >= col(d0) && col(pointDay) <= col(d1))
      .drop("__bucket")
  }
}
