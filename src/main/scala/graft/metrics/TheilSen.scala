package graft.metrics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Theil–Sen robust line fit per group — slope = median of all pairwise
  * slopes, intercept = median residual at that slope: the estimator
  * with a 29 % breakdown point where [[Ols]]'s least squares has 0 %
  * (one wild day drags an OLS line; the pairwise-slope median doesn't
  * move until a third of the data is corrupt).
  *
  * Scale shape: the pair explosion is quadratic in the SERIES length,
  * which is CALENDAR-bounded (days × keys, independent of fact volume)
  * — so the per-key pair set is small-task-local work, and the right
  * distributed plan is ONE shuffle of the aggregated series points
  * followed by per-key local selection (`flatMapGroupsWithState`-free
  * `flatMapGroups`). The first cut instead re-expressed the median as
  * a distributed group-by-value walk over the pair STREAM — relational,
  * but it shuffled and sorted L²/2 ≈ 61 M rows at sf0.1 (measured 41 s;
  * this version: ~4 s, bit-identical output). The lesson is recorded
  * here deliberately: "distribute everything" is the wrong plan when a
  * per-key bound makes the work local.
  *
  * Determinism: slopes and residuals quantize to exact integer MICROS
  * (`floor(v·10⁶ + 0.5)` — the repo-standard IEEE quantizer, identical
  * in Scala, Spark SQL, and the DuckDB oracle) and the lower median is
  * rank ⌈n/2⌉ of the sorted integer array — no float-order dependence
  * anywhere.
  *
  * Memory: a group with L points builds an L·(L−1)/2 long array
  * (~19 MB at L = 2200). The guard fails loudly at L > 20 000 (~1.6 GB)
  * rather than silently OOMing an executor; callers feed
  * calendar-bounded series, where L is the day span.
  */
object TheilSen {

  private final val MaxSeriesLen = 20000

  /** @param points one row per (key, x, y); key string, x
    *               integer-valued, y double.
    * @return (key, n_pairs, slope, intercept); keys whose series has no
    *         x-distinct pair (L < 2 distinct x) are dropped, matching
    *         the SQL formulation's empty-pair-set semantics. */
  def fitPerGroup(points: DataFrame, key: String, x: String,
                  y: String): DataFrame = {
    val spark = points.sparkSession
    import spark.implicits._
    // Explicit hash repartition + in-partition group walk instead of
    // groupByKey/flatMapGroups (r16, guide §2.5 idle-capacity): the
    // series frame is calendar-bounded (~60k rows ≈ 2 MB at sf0.1), so
    // AQE coalesced groupByKey's exchange to ONE partition and the
    // whole Σ_key L²/2 slope scan ran on a single core — measured 9.3 s
    // single-threaded vs the ~0.4 s/key inner loop. A user-specified
    // repartition(n, key) is exempt from AQE coalescing; sorting within
    // partitions by (key, x) makes groups contiguous, and the walk
    // emits one row per key exactly like flatMapGroups did. Equal-x
    // row order within a group is immaterial: dx = 0 pairs are skipped
    // and both medians sort their arrays. Same one-shuffle plan shape
    // at any scale — partition count tracks the cluster's parallelism.
    val ds = points
      .select(col(key).cast("string"), col(x).cast("long"),
        col(y).cast("double"))
      .as[(String, Long, Double)]
      .repartition(spark.sparkContext.defaultParallelism, col(key))
      .sortWithinPartitions(col(key), col(x))
    ds.mapPartitions { it =>
        val rows = it.buffered
        val groups = new Iterator[(String, Array[(Long, Double)])] {
          def hasNext: Boolean = rows.hasNext
          def next(): (String, Array[(Long, Double)]) = {
            val k = rows.head._1
            val buf = scala.collection.mutable.ArrayBuffer[(Long, Double)]()
            while (rows.hasNext && rows.head._1 == k) {
              val t = rows.next(); buf += ((t._2, t._3))
            }
            (k, buf.toArray)
          }
        }
        groups.flatMap { case (k, arr) => fitOne(k, arr) }
      }
      .toDF(key, "n_pairs", "slope", "intercept")
  }

  /** One key's fit — the exact inner loop the flatMapGroups form ran;
    * `arr` must be sorted by x (the partition walk guarantees it). */
  private def fitOne(k: String, arr: Array[(Long, Double)])
      : Option[(String, Long, Double, Double)] = {
        val n = arr.length
        require(n <= MaxSeriesLen,
          s"TheilSen: series for key '$k' has $n points (> $MaxSeriesLen); " +
            "aggregate to a calendar-bounded series first")
        // pairwise slopes in integer micros; pairs with equal x are
        // excluded (the x1 < x2 strict form)
        val slopes = Array.newBuilder[Long]
        slopes.sizeHint(n * (n - 1) / 2)
        var i = 0
        while (i < n) {
          var j = i + 1
          while (j < n) {
            val dx = arr(j)._1 - arr(i)._1
            if (dx != 0) {
              val m = (arr(j)._2 - arr(i)._2) / dx.toDouble
              slopes += math.floor(m * 1e6 + 0.5).toLong
            }
            j += 1
          }
          i += 1
        }
        val s = slopes.result()
        if (s.isEmpty) None
        else {
          java.util.Arrays.sort(s)
          val nPairs = s.length.toLong
          // lower median = rank ⌈n/2⌉ (1-indexed) = (n+1)/2
          val slope = s(((s.length + 1) / 2) - 1).toDouble / 1e6
          val resid = arr.map(p =>
            math.floor((p._2 - slope * p._1.toDouble) * 1e6 + 0.5).toLong)
          java.util.Arrays.sort(resid)
          val intercept = resid(((resid.length + 1) / 2) - 1).toDouble / 1e6
          Some((k, nPairs, slope, intercept))
        }
  }
}
