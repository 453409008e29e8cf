package graft.rec

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions.{qdec, qround}

/** Split-conformal prediction intervals (Vovk et al.; Lei et al. 2018,
  * public) — distribution-free uncertainty for ANY point predictor:
  * score a held-out calibration set, take the ⌈(n+1)(1−α)⌉-th smallest
  * absolute residual as the half-width q̂, and pred ± q̂ covers a fresh
  * point with probability ≥ 1−α, no model assumptions. The missing
  * companion of every RMSE eval in the repo: RMSE says how wrong on
  * average, conformal says how wide an interval you must quote.
  *
  * Scale: the order statistic is NOT a global sort of residuals —
  * residuals round to 6 dp, reduce to one row per DISTINCT value
  * (map-side), and the cumulative window walks that score-distribution
  * frame (the q142/AUC argument). Calibration and test scoring are
  * broadcast joins against the aggregate-sized item table.
  *
  * Determinism: residuals are decimal-exact (rating decimal − rounded
  * decimal prediction), the rank threshold is integer arithmetic, and
  * coverage is one double division — hash-identical cross-engine.
  */
object Conformal {

  /** One row: (alpha, n_calib, qhat, n_test, coverage) for the
    * bias-smoothed item-mean predictor fit on `train`, calibrated on
    * `calib`, evaluated on `test`. Frames carry (item_id, rating). */
  def itemMeanIntervals(train: DataFrame, calib: DataFrame,
                        test: DataFrame, bias: Int,
                        alpha: Double): DataFrame = {
    def clean(df: DataFrame) = df
      .filter(col("item_id").isNotNull && col("rating").isNotNull)
      .select(col("item_id"), qdec(col("rating"), 18, 2).as("r"))

    val tr = clean(train)
    // r17 plan truncation (guide §3.3 "materialising an intermediate
    // truncates the plan"): g, pred and qhat are scalar- or item-sized,
    // but each is EMBEDDED several times downstream (g under four
    // crossJoins, pred under two broadcast joins, qhat's whole
    // calibration subtree under the test-side crossJoin), so the final
    // plan re-planned + re-codegen'd the tagged-split lineage ~6x —
    // 2267 formatted-plan lines for ~30k rows of data. Three tiny
    // localCheckpoint jobs collapse it (values bit-identical: the
    // checkpoints only materialize already-quantized frames).
    // Probe (OptProbe q149x, 2 rounds): 10.5-11.9 -> 6.4-7.2 s.
    val g = tr.agg(qround(sum("r").cast("double") /
      count(lit(1)).cast("double"), 6).as("g")).localCheckpoint()
    val pred = tr.groupBy("item_id")
      .agg(count(lit(1)).as("cnt"), sum("r").as("s"))
      .crossJoin(broadcast(g))
      .select(col("item_id"),
        qround((col("s").cast("double") + lit(bias.toDouble) * col("g")) /
          (col("cnt") + lit(bias)).cast("double"), 6)
          .cast("decimal(18,6)").as("pred"))
      .localCheckpoint()

    def scored(df: DataFrame) = clean(df)
      .join(broadcast(pred), Seq("item_id"), "left")
      .crossJoin(broadcast(g))
      .withColumn("p",
        coalesce(col("pred"), qround(col("g"), 6).cast("decimal(18,6)")))
      .withColumn("res", abs(col("r") - col("p")))

    val byRes = scored(calib).groupBy("res").agg(count(lit(1)).as("m"))
    val cum = byRes.withColumn("cum",
      sum("m").over(Window.orderBy("res")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val nC = cum.agg(sum("m").as("n_calib"))
    val qhat = cum.crossJoin(broadcast(nC))
      .withColumn("k",
        least(ceil((col("n_calib") + 1) * lit(1.0 - alpha)).cast("long"),
          col("n_calib")))
      .filter(col("cum") >= col("k"))
      .agg(min("res").as("qhat"), min("n_calib").as("n_calib"))
      .localCheckpoint()

    scored(test).crossJoin(broadcast(qhat))
      .agg(count(lit(1)).as("n_test"),
        sum(when(col("res") <= col("qhat"), 1L).otherwise(0L)).as("cov"),
        min("qhat").as("q"), min("n_calib").as("nc"))
      .select(lit(alpha).as("alpha"), col("nc").as("n_calib"),
        col("q").cast("double").as("qhat"), col("n_test"),
        qround(col("cov").cast("double") / col("n_test").cast("double"), 6)
          .as("coverage"))
  }
}
