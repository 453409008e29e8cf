package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D skyline (Pareto frontier, both dimensions maximized): the points
  * no other point dominates — y dominates x when y.a ≥ x.a, y.b ≥ x.b
  * and it is strictly better somewhere. The multi-criteria "best
  * customers / best configs" query whose naive relational form is an
  * O(n²) dominance self-join.
  *
  * The scalable construction uses the sorted-sweep property — in
  * a-descending order a point survives iff its b strictly exceeds every
  * b seen so far — decomposed exactly like [[Sweep]]'s prefix sum so no
  * global sort appears:
  *   1. collapse equal-a groups to their max b (dominated within group);
  *   2. bucket by a-range; per-bucket max b → prefix max over the TINY
  *      bucket frame (the only unpartitioned window) = the "carry"
  *      threshold each bucket must beat;
  *   3. within-bucket running max (hash-partitioned window) + the carry
  *      give every point its max-b-over-strictly-greater-a; survivors
  *      have b strictly above it.
  * A final join on (a, b) recovers the surviving entity rows (and keeps
  * exact ties — mutually non-dominating by definition).
  */
object Skyline {

  /** Rows of `df` on the (a, b)-max Pareto frontier. `buckets` controls
    * the phase-2 decomposition granularity (the unpartitioned window
    * runs over ≤ buckets rows). `a` must be non-null numeric; rows with
    * null in either measure are excluded. */
  def frontier2D(df: DataFrame, a: String, b: String,
                 buckets: Int = 256): DataFrame = {
    // Three consumers read the input (bounds agg, the a-group collapse,
    // the survivor semi-join) — materialize it once or the upstream
    // lineage (often a fact-table aggregate) re-scans per consumer.
    val pts = df.filter(col(a).isNotNull && col(b).isNotNull)
      .localCheckpoint()
    // Bucket by a-rank-range via fixed-width division on the a range.
    val bounds = pts.agg(min(col(a)).as("a0"), max(col(a)).as("a1"))
    val g = pts.groupBy(col(a)).agg(max(col(b)).as("__b"))
      .crossJoin(broadcast(bounds))
      .withColumn("__bk",
        least(lit(buckets - 1), floor(
          (col(a) - col("a0")) / ((col("a1") - col("a0")) / buckets + 1e-300))
          .cast("int")))
    val perBucket = g.groupBy("__bk").agg(max(col("__b")).as("__bmax"))
      .withColumn("__carry",
        max(col("__bmax")).over(Window.orderBy(col("__bk").desc)
          .rowsBetween(Window.unboundedPreceding, -1)))
    val withinBucket = Window.partitionBy("__bk").orderBy(col(a).desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val survivors = g
      .join(broadcast(perBucket.select("__bk", "__carry")), Seq("__bk"))
      .withColumn("__run", max(col("__b")).over(withinBucket))
      .withColumn("__thresh", greatest(
        coalesce(col("__carry"), lit(Double.MinValue)),
        coalesce(col("__run"), lit(Double.MinValue))))
      .filter(col("__b") > col("__thresh"))
      .select(col(a), col("__b").as(b))
    // Join from the checkpointed frame: null-measure rows can never
    // match a survivor, so this equals joining from `df` — without
    // re-running df's lineage a fourth time.
    pts.join(survivors, Seq(a, b), "left_semi")
  }
}
