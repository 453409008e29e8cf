package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions.{qdec, qround}

/** Distribution-drift measurement between two data slices — the
  * population stability index (PSI), the standard ML-monitoring check
  * that a feature's (or target's) distribution hasn't shifted between a
  * training snapshot and live traffic, or between two time periods.
  *
  * PSI = Σ_bins (p_i − q_i)·ln(p_i / q_i) with p the reference and q the
  * comparison bin shares. Bins are Laplace-smoothed ((n+1)/(N+B)) so a
  * bin present in only one slice contributes a finite, engine-stable
  * term instead of ln(0).
  *
  * Scale: ONE map-side-combined aggregate over the fact scan (counts per
  * (bin, period) via conditional sums — no join of two period scans),
  * then arithmetic on the bins-sized frame with its totals broadcast.
  * Bin count is fixed by the binning expression, so the post-scan work
  * is O(bins) at any data volume — the same mergeable-histogram shape as
  * the q88 profiler.
  */
object Drift {

  /** Per-bin PSI decomposition: (bin, n_a, n_b, psi_contrib·6dp).
    * `period` must evaluate to "a" (reference) or "b" (comparison);
    * Σ psi_contrib is the headline PSI (>0.2 conventionally = action). */
  def psiByBin(df: DataFrame, period: Column, bin: Column): DataFrame = {
    val counts = df.groupBy(bin.as("bin")).agg(
      sum(when(period === "a", 1L).otherwise(0L)).as("n_a"),
      sum(when(period === "b", 1L).otherwise(0L)).as("n_b"))
    val totals = counts.agg(count(lit(1)).as("nbins"),
      sum(col("n_a")).as("tot_a"), sum(col("n_b")).as("tot_b"))
    val p = (col("n_a") + lit(1.0)) / (col("tot_a") + col("nbins"))
    val q = (col("n_b") + lit(1.0)) / (col("tot_b") + col("nbins"))
    counts.crossJoin(broadcast(totals))
      .select(col("bin"), col("n_a"), col("n_b"),
        qround((p - q) * log(p / q), 6).as("psi_contrib"))
  }

  /** Exact two-sample Kolmogorov–Smirnov test — the binning-free sibling
    * of [[psiByBin]]: D = max over observed values of the ECDF gap
    * |F_a(v) − F_b(v)|, plus the α=0.05 asymptotic critical value
    * c·√((n_a+n_b)/(n_a·n_b)), c = 1.358.
    *
    * Determinism: the max is taken over the INTEGER cross-products
    * |cum_a·n_b − cum_b·n_a| (decimal(38,0), overflow-safe into the
    * trillions of rows) — no per-value double division whose last ulp
    * could pick a different argmax cross-engine; the single end division
    * and the one sqrt are rounded to 6dp.
    *
    * Scale: one map-side-combined aggregate to per-distinct-value
    * conditional counts (|values| ≪ |rows| for measures), then one
    * single-partition cumulative window over the distinct values — the
    * same distinct-value-walk shape as q149's conformal quantile. For
    * truly high-cardinality measures, pre-round the measure (ECDF on a
    * grid) to bound the distinct count. */
  def ksTwoSample(df: DataFrame, value: Column, period: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dec = "decimal(38,0)"
    val counts = df.groupBy(value.as("v")).agg(
      sum(when(period === "a", 1L).otherwise(0L)).as("c_a"),
      sum(when(period === "b", 1L).otherwise(0L)).as("c_b"))
    val wCum = Window.orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val gaps = counts
      .select(sum(col("c_a")).over(wCum).cast(dec).as("cum_a"),
        sum(col("c_b")).over(wCum).cast(dec).as("cum_b"),
        sum(col("c_a")).over(wAll).cast(dec).as("tot_a"),
        sum(col("c_b")).over(wAll).cast(dec).as("tot_b"))
    gaps.agg(max(col("tot_a")).as("n_a"), max(col("tot_b")).as("n_b"),
        max(abs(col("cum_a") * col("tot_b") -
          col("cum_b") * col("tot_a"))).as("dnum"))
      .select(col("n_a").cast("long").as("n_a"),
        col("n_b").cast("long").as("n_b"),
        // one empty arm ⇒ n_a·n_b = 0: DuckDB's x/0 is NULL where Spark
        // ANSI throws — mirror the NULL (fuzz gate, one_row/same_day)
        when(col("n_a") * col("n_b") === 0, lit(null))
          .otherwise(qround(col("dnum").cast("double") /
            (col("n_a") * col("n_b")).cast("double"), 6)).as("d"),
        when(col("n_a") * col("n_b") === 0, lit(null))
          .otherwise(qround(lit(1.358) *
            sqrt((col("n_a") + col("n_b")).cast("double") /
              (col("n_a") * col("n_b")).cast("double")), 6)).as("crit_05"))
  }
}
