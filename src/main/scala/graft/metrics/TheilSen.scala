package graft.metrics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions.qround

/** Theil–Sen robust line fit per group — slope = median of all pairwise
  * slopes, intercept = median residual at that slope: the estimator
  * with a 29 % breakdown point where [[Ols]]'s least squares has 0 %
  * (one wild day drags an OLS line; the pairwise-slope median doesn't
  * move until a third of the data is corrupt).
  *
  * Scale shape: the pair explosion is quadratic in the SERIES length,
  * not the fact volume — fit it to aggregated (calendar-bounded)
  * series, where days²/2 per key is ~10⁵ at any scale factor. Both
  * medians run as the q167 distinct-value cumulative walk (group by
  * value, one windowed prefix sum, pick the crossing) — no per-group
  * row sort. Slopes and residuals quantize to 6dp (the divides are
  * bit-identical IEEE) before the walk, so the median value — an
  * order statistic on an engine-exact column — carries no float-order
  * dependence.
  */
object TheilSen {

  /** Lower median of `v` per `key` via the distinct-value walk:
    * (key, med_<v>, n_<v> = total count). */
  private def lowerMedian(df: DataFrame, key: String,
                          v: String): DataFrame = {
    val wCum = Window.partitionBy(key).orderBy(v)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(key)
    df.groupBy(key, v).agg(count(lit(1)).as("c"))
      .withColumn("cum", sum(col("c")).over(wCum))
      .withColumn("tot", sum(col("c")).over(wAll))
      .filter(col("cum") * 2 >= col("tot"))
      .groupBy(key)
      .agg(min(col(v)).as(s"med_$v"), max(col("tot")).as(s"n_$v"))
  }

  /** @param points one row per (key, x, y); x integer-valued, y double.
    * @return (key, n_pairs, slope, intercept). */
  def fitPerGroup(points: DataFrame, key: String, x: String,
                  y: String): DataFrame = {
    val a = points.select(col(key), col(x).as("__x1"), col(y).as("__y1"))
    val b = points.select(col(key), col(x).as("__x2"), col(y).as("__y2"))
    val slopes = a.join(b, Seq(key)).filter(col("__x1") < col("__x2"))
      .select(col(key), qround((col("__y2") - col("__y1")) /
        (col("__x2") - col("__x1")).cast("double"), 6).as("m"))
    val med = lowerMedian(slopes, key, "m")
      .select(col(key), col("med_m").as("slope"),
        col("n_m").as("n_pairs"))
    val resid = points.join(broadcast(med), key)
      .select(col(key), qround(col(y) -
        col("slope") * col(x).cast("double"), 6).as("r0"))
    val med2 = lowerMedian(resid, key, "r0")
      .select(col(key), col("med_r0").as("intercept"))
    med.join(med2, key)
      .select(col(key), col("n_pairs"), col("slope"), col("intercept"))
  }
}
