package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: densify a sparse per-key daily series onto
  * its full [min_day, max_day] grid (gap fill) and carry the last
  * observation forward across the introduced gaps (forward fill).
  *
  * Construction: per-key day bounds from one aggregate, `sequence()` +
  * `explode` to manufacture the grid (rows are generated AFTER
  * aggregation, so the exploded frame is |keys|·days — never a shuffle
  * of the fact table), left join the observed points back on (key, day),
  * then one window pass for the fill: `last(value, ignoreNulls)` over
  * rows unbounded-preceding..current.
  *
  * Scale: the observed side aggregates to (key, day) first — the grid
  * join is agg-to-agg, and the fill window rides the same (key)
  * partitioning as the join output. Grids are bounded by calendar span,
  * not data volume: 100 TB of events over 3 years is ≤ ~1100 grid rows
  * per key regardless of event count. Skewed keys don't exist by
  * construction (every key has |span| rows, uniform).
  */
object TimeSeries {

  /** Densified daily series: (key, day, observed value-or-0 `measure`,
    * forward-filled `<measure>_ffill`, `is_gap`). `day` is an integer
    * epoch-day — calendar-function-free per the repo's determinism
    * rules. */
  def gapFillDaily(points: DataFrame, key: String, day: String,
                   measure: String): DataFrame = {
    val bounds = points.groupBy(col(key))
      .agg(min(col(day)).as("d0"), max(col(day)).as("d1"))
    val grid = bounds
      .select(col(key), explode(sequence(col("d0"), col("d1"))).as(day))
    val filled = grid.join(points, Seq(key, day), "left")
    val w = Window.partitionBy(key).orderBy(day)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    filled
      .withColumn("is_gap", col(measure).isNull)
      .withColumn(s"${measure}_ffill",
        last(col(measure), ignoreNulls = true).over(w))
      .withColumn(measure, coalesce(col(measure), lit(0).cast("double")))
  }
}
