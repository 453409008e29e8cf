package graft.rec

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions.{qdec, qround}

/** K-fold cross-validation as ONE pipeline — no per-fold jobs, no
  * driver loop: fold membership is a keyed-PRNG column, every fold's
  * out-of-fold statistics come from the same (item, fold) aggregate by
  * subtraction (fold f's training view = totals minus fold f), and the
  * hyperparameter axis is a broadcast cross join — K folds × B
  * hyperparameters cost one scan plus aggregate-sized arithmetic,
  * against K·B pipeline re-runs in the naive form (the reference's
  * sweep, `popularity_tuned.py:26-41`, re-evaluates per value; its CV
  * would re-train per fold too).
  *
  * The model under validation is the bias-smoothed item mean
  * μ_b(i) = (Σ_oof r_i + b·μ_oof) / (n_oof(i) + b) — the shrinkage
  * estimator whose bias parameter the reference's Table 2 tunes, here
  * tuned properly: each rating is predicted from data excluding its
  * own fold, so the selected b generalizes instead of memorizing.
  *
  * Determinism: the identical discipline as [[graft.ops.Features
  * .targetEncodeOof]] — decimal-exact sums, the out-of-fold global
  * mean rounded to 6 dp before use, predictions rounded then recast to
  * decimal so squared errors and their sums are exact; per-(bias,
  * fold) RMSE is one double sqrt; the CV mean sums the ROUNDED fold
  * RMSEs decimal-exactly before its single division.
  */
object CrossVal {

  /** Per-(bias, fold) RMSE rows with the per-bias CV mean broadcast on
    * each: (bias, fold, n_eval, rmse, cv_rmse). */
  def biasCvRmse(ratings: DataFrame, folds: Int, biases: Seq[Int],
                 seed: Long): DataFrame = {
    val rows = ratings
      .filter(col("item_id").isNotNull && col("rating").isNotNull)
      .select(col("item_id"),
        pmod(graft.functions.GraftFunctions.md5_63(
          concat(lit(s"$seed:"), col("event_id").cast("string"))),
          lit(folds)).cast("int").as("fold"),
        qdec(col("rating"), 18, 2).as("v"))

    val pf = rows.groupBy("item_id", "fold")
      .agg(count(lit(1)).as("cnt"), sum("v").as("s"))
    val byItem = Window.partitionBy("item_id")
    val byFold = Window.partitionBy("fold")
    val all = Window.partitionBy()
    val enc = pf
      .withColumn("oof_cnt", sum("cnt").over(byItem) - col("cnt"))
      .withColumn("oof_s", sum("s").over(byItem) - col("s"))
      .withColumn("g_oof", qround(
        (sum("s").over(all) - sum("s").over(byFold)).cast("double") /
          (sum("cnt").over(all) - sum("cnt").over(byFold)).cast("double"),
        6))

    val biasDf = broadcast(
      ratings.sparkSession.createDataFrame(
        biases.map(Tuple1(_))).toDF("bias"))
    val pred = enc.crossJoin(biasDf)
      .select(col("item_id"), col("fold"), col("bias"),
        qround((col("oof_s").cast("double") +
            col("bias").cast("double") * col("g_oof")) /
          (col("oof_cnt") + col("bias")).cast("double"), 6)
          .cast("decimal(18,6)").as("pred"))

    val perFold = rows.join(pred, Seq("item_id", "fold"))
      .withColumn("e", col("v") - col("pred"))
      .groupBy("bias", "fold")
      .agg(count(lit(1)).as("n_eval"), sum(col("e") * col("e")).as("sse"))
      .withColumn("rmse",
        qround(sqrt(col("sse").cast("double") / col("n_eval").cast("double")),
          6).cast("decimal(18,6)"))

    perFold
      .withColumn("cv_rmse", qround(
        sum("rmse").over(Window.partitionBy("bias")).cast("double") /
          lit(folds.toDouble), 6))
      .select(col("bias"), col("fold"), col("n_eval"),
        col("rmse").cast("double").as("rmse"), col("cv_rmse"))
  }
}
