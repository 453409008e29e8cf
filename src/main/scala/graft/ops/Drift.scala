package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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
        round((p - q) * log(p / q), 6).as("psi_contrib"))
  }
}
