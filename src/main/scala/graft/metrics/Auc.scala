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

  /** Two-sample Mann–Whitney U location test with exact tie handling:
    * one row — `n_pos`, `n_neg`, `u2` (= 2U, integer-exact: each tie
    * group of m⁺ positives over `below` negatives and m⁻ tied
    * negatives contributes m⁺·(2·below + m⁻)), `z` (normal
    * approximation with the tie-corrected variance, Σ(t³−t) an integer
    * aggregate), `auc` (= U/(n⁺n⁻), the probability a positive
    * outranks a negative). The [[binaryAuc]] rank-sum walked from the
    * negative side; all arithmetic integer until the two final
    * divides. The only unpartitioned window runs over DISTINCT scores. */
  def mannWhitneyU(df: DataFrame, score: Column,
                   isPositive: Column): DataFrame = {
    // NULL scores are EXCLUDED (fuzz gate, r13): a missing measurement
    // carries no rank. Without the filter the NULL group's window
    // placement diverges cross-engine (Spark orders NULLS FIRST, DuckDB
    // NULLS LAST) and every downstream rank shifts.
    val g = df.select(score.as("s"), isPositive.cast("long").as("y"))
      .filter(col("s").isNotNull)
      .groupBy("s")
      .agg(sum("y").as("np"), sum(lit(1L) - col("y")).as("nc"))
    val wBelow = Window.orderBy("s")
      .rowsBetween(Window.unboundedPreceding, -1)
    val t = g.withColumn("below_c",
      coalesce(sum(col("nc")).over(wBelow), lit(0L)))
    val tt = col("np") + col("nc")
    val a = t.agg(
      sum("np").as("n1"), sum("nc").as("n0"),
      sum(col("np") * (lit(2L) * col("below_c") + col("nc"))).as("u2"),
      sum(tt * tt * tt - tt).as("tcorr"))
    val n1d = col("n1").cast("double")
    val n0d = col("n0").cast("double")
    val nd = (col("n1") + col("n0")).cast("double")
    // Degenerate inputs → NULL, never a DIVIDE_BY_ZERO throw (fuzz
    // gate, r13): z is undefined at n < 2 or zero tie-corrected
    // variance (every value identical), auc at an empty class. DuckDB
    // yields NULL on double x/0 natively, so the unguarded oracle
    // already emits NULL there — these guards mirror that.
    val tieTerm = when(nd > lit(1.0),
      col("tcorr").cast("double") / (nd * (nd - lit(1.0))))
    val varU = n1d * n0d / lit(12.0) * ((nd + lit(1.0)) - tieTerm)
    a.select(col("n1").as("n_pos"), col("n0").as("n_neg"), col("u2"),
      qround(when(varU > lit(0.0),
        (col("u2").cast("double") / lit(2.0) -
          n1d * n0d / lit(2.0)) / sqrt(varU)), 6)
        .as("z"),
      qround(when(col("n1") > 0 && col("n0") > 0,
        col("u2").cast("double") / (lit(2.0) * n1d * n0d)), 6).as("auc"))
  }
}
