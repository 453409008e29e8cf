package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions.{qdec, qround}

/** Grouped z-score anomaly flagging: score = (x − mean_g) / stddev_g with
  * the group statistics computed as unpartitioned-frame window aggregates,
  * so scoring needs ONE shuffle on the group key and no join-back of a
  * separate stats frame (the aggregate-then-rejoin shape would shuffle
  * the fact table twice).
  *
  * Determinism: mean and sample-stddev are distributed double
  * reductions, so the score is rounded to 6 decimals (repo determinism
  * rule #3) and any threshold compares the ROUNDED value — both engines
  * then filter on bit-identical inputs, keeping the boundary
  * cross-engine-stable.
  *
  * Scale: one hash exchange on the group key; groups far larger than a
  * partition are fine (window aggregates with an unpartitioned frame
  * compute per-partition partials — no full sort, frame = entire
  * partition). Heavily-skewed single-group data would instead use the
  * two-pass agg + broadcast-join-back, which [[graft.ops.Skew]] covers.
  */
object Outliers {

  /** Rows with |z| ≥ `threshold`, annotated with the rounded z-score. */
  def zscoreOutliers(df: DataFrame, group: Seq[Column], x: Column,
                     threshold: Double): DataFrame = {
    val w = Window.partitionBy(group: _*)
    val z = (x - avg(x).over(w)) / stddev_samp(x).over(w)
    df.withColumn("z", qround(z, 6))
      .filter(abs(col("z")) >= threshold)
  }
}
