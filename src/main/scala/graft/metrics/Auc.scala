package graft.metrics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions.{qdec, qround}

/** ROC AUC via the Mann–Whitney rank-sum identity:
  * AUC = (R⁺ − n⁺(n⁺+1)/2) / (n⁺·n⁻), with R⁺ the positives' rank sum
  * under ascending score and AVERAGE ranks inside tie groups (the
  * textbook tie correction — without it, AUC depends on an arbitrary
  * within-tie order and stops being an expectation over pairs).
  *
  * Everything before the final division is INTEGER arithmetic: a tie
  * group at score s with m rows (m⁺ positive) and `below` rows
  * strictly beneath it contributes m⁺·(2·below + m + 1) to 2·R⁺ — so
  * the rank sum is exact, partitioning-independent, and cross-engine
  * bit-identical; no per-row global sort and no floating ranks.
  *
  * Scale: rows reduce map-side to one row PER DISTINCT SCORE; the one
  * unpartitioned window runs over that score-distribution frame, not
  * the data. Scores should be quantized (rounded) by the caller — a
  * score column with billions of distinct values turns the frame back
  * into the data; after a 6-dp round it is at most 2M·range values and
  * in practice (calibrated scores, popularity scores) a few thousand.
  */
object Auc {

  /** One row: `n_pos`, `n_neg`, `auc` (6 dp). `label` must be 0/1. */
  def binaryAuc(df: DataFrame, score: Column, label: Column): DataFrame = {
    val byScore = df.select(score.as("s"), label.cast("long").as("y"))
      .groupBy("s")
      .agg(count(lit(1)).as("m"), sum("y").as("mp"))
    val below = Window.orderBy("s")
      .rowsBetween(Window.unboundedPreceding, -1)
    byScore
      .withColumn("below", coalesce(sum("m").over(below), lit(0L)))
      .agg(
        sum(col("mp") * (col("below") * 2 + col("m") + 1)).as("r2"),
        sum("mp").as("np"),
        sum(col("m") - col("mp")).as("nn"))
      .select(col("np").as("n_pos"), col("nn").as("n_neg"),
        qround(
          (col("r2").cast("double") / 2.0 -
            col("np").cast("double") * (col("np") + 1).cast("double") / 2.0) /
          (col("np").cast("double") * col("nn").cast("double")), 6)
          .as("auc"))
  }
}
