package graft.rec

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions.{qdec, qround}

/** Koren-style additive bias baseline — `r̂(u,i) = μ + b_i + b_u` with
  * shrinkage toward zero (Koren & Bell, "Advances in Collaborative
  * Filtering", the b_ui baseline every latent-factor model is anchored
  * on):
  *
  *   μ   = mean(train rating)
  *   b_i = Σ_{(u,i)∈train} (r − μ)            / (λ_i + |R(i)|)
  *   b_u = Σ_{(u,i)∈train} (r − μ − b_i)      / (λ_u + |R(u)|)
  *
  * This is the strongest CLOSED-FORM rating predictor in the family
  * q165 (item-mean) / q139 (item-CF) bracket — two grouped aggregates,
  * no iteration — which makes it the engine's oracle-EXACT stand-in for
  * the RMSE ladder the ALS family (q53/q56) can only report rows-only.
  *
  * Determinism discipline (ARCHITECTURE.md rules): every distributed sum
  * runs over DECIMAL (ratings quantized to 2dp, μ and b_i re-quantized
  * to 6dp decimals before re-entering a sum), each divide is one double
  * op whose result is immediately [[qround]]ed — so engine and oracle
  * agree bit-for-bit at every stage.
  *
  * Scale: two shuffles to fit (item agg, then user agg), two broadcast
  * joins to score (bias frames are |items| / |users| sized aggregates —
  * broadcast at dimension scale, shuffled hash joins beyond); RMSE is
  * one final aggregate. No collect, no iteration.
  */
object BiasBaseline {

  /** Item/user bias frames + global mean, packed as
    * (items: (item_id, b_i), users: (user_id, b_u), mu). Train rows with
    * null item/rating are dropped. */
  def fit(train: DataFrame, lambdaI: Double, lambdaU: Double)
      : (DataFrame, DataFrame, Double) = {
    val t = train
      .filter(col("item_id").isNotNull && col("rating").isNotNull)
      .select(col("user_id"), col("item_id"),
        qdec(col("rating"), 18, 2).as("r"))
    val Array(muRow) = t
      .agg(sum("r").as("s"), count(lit(1)).as("n"))
      .select((col("s").cast("double") / col("n")).as("mu"))
      .collect()
    val mu = quant6(muRow.getDouble(0))
    // μ re-enters decimal sums as an EXACT scale-6 literal built on the
    // driver (not a double→decimal CAST, which the rounding audit
    // rightly flags): μ is already floor-quantized, so its shortest
    // decimal representation setScale(6)'d is the unique 6dp value
    // within an ulp — the same one the oracle's CAST resolves to.
    val muDec = lit(java.math.BigDecimal.valueOf(mu)
      .setScale(6, java.math.RoundingMode.HALF_UP))
    val items = t.groupBy("item_id")
      .agg(sum(col("r") - muDec).as("dev"), count(lit(1)).as("n"))
      .select(col("item_id"),
        qround(col("dev").cast("double") / (lit(lambdaI) + col("n")), 6)
          .as("b_i"))
    val users = t
      .join(items.select(col("item_id"),
        col("b_i").cast("decimal(18,6)").as("bi")), "item_id")
      .groupBy("user_id")
      .agg(sum(col("r") - muDec - col("bi")).as("dev"),
        count(lit(1)).as("n"))
      .select(col("user_id"),
        qround(col("dev").cast("double") / (lit(lambdaU) + col("n")), 6)
          .as("b_u"))
    (items, users, mu)
  }

  /** One-row holdout report: n_rows, coverage of each bias table, RMSE
    * and MAE of `clamp(μ + b_i + b_u)` on `holdout` (unknown items/users
    * contribute a 0 bias — the cold-start fallback IS the global/partial
    * baseline). Residuals are exact decimals of the 6dp-quantized
    * prediction, so the error sums carry no float-order dependence. */
  def rmseReport(train: DataFrame, holdout: DataFrame, lambdaI: Double,
                 lambdaU: Double, lo: Double, hi: Double): DataFrame = {
    val (items, users, mu) = fit(train, lambdaI, lambdaU)
    val h = holdout
      .filter(col("item_id").isNotNull && col("rating").isNotNull)
      .select(col("user_id"), col("item_id"),
        qdec(col("rating"), 18, 2).as("r"))
    val pred = h
      .join(broadcast(items), Seq("item_id"), "left")
      .join(broadcast(users), Seq("user_id"), "left")
      .withColumn("known_i", col("b_i").isNotNull)
      .withColumn("known_u", col("b_u").isNotNull)
      .withColumn("p", qround(
        least(greatest(lit(mu) + coalesce(col("b_i"), lit(0.0)) +
          coalesce(col("b_u"), lit(0.0)), lit(lo)), lit(hi)), 6)
        .cast("decimal(18,6)"))
      .withColumn("e", col("r").cast("decimal(18,6)") - col("p"))
    pred.agg(
        count(lit(1)).as("n_rows"),
        sum(when(col("known_i"), 1L).otherwise(0L)).as("n_known_item"),
        sum(when(col("known_u"), 1L).otherwise(0L)).as("n_known_user"),
        sum(col("e") * col("e")).as("sse"),
        sum(abs(col("e"))).as("sae"))
      .select(col("n_rows"), col("n_known_item"), col("n_known_user"),
        qround(lit(mu), 6).as("mu"),
        qround(sqrt(col("sse").cast("double") / col("n_rows")), 6)
          .as("rmse"),
        qround(col("sae").cast("double") / col("n_rows"), 6).as("mae"))
  }

  /** Driver-side twin of [[graft.functions.GraftFunctions.qround]] for
    * the collected scalar μ. */
  private def quant6(x: Double): Double =
    math.floor(x * 1000000.0 + 0.5) / 1000000.0
}
