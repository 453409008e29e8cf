package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions.{qdec, qround}

/** Time-decay multi-touch attribution — split each conversion's credit
  * across the clicks that preceded it, weighted exp(−Δt/τ): the
  * marketing-analytics refinement of last-touch attribution (q81's
  * stream-stream pair join emits the PAIRS; this operator prices
  * them). A click τ before the purchase earns 1/e the credit of a
  * click at the purchase instant; per-purchase credits renormalize to
  * sum to 1.
  *
  * Scale: one user-keyed shuffle builds the lookback pairs (per-user
  * fan-out bounded by activity within the window — the q81 argument),
  * one purchase-keyed window renormalizes groups of at most
  * clicks-per-day size. Determinism: Δt is integer ns arithmetic; the
  * decay weight is one `exp` of that exact ratio ROUNDED to 6 dp and
  * recast to decimal, so the per-purchase total is an exact sum and
  * the credit division is a single double op — the same ln/sqrt
  * precedent as the rest of the repo (both engines' libm agree far
  * beyond the rounded precision).
  */
object Attribution {

  /** (purchase_id, click_id, user_id, w, credit) for every click in
    * the `lookbackHours` window before its user's purchase. */
  def timeDecay(events: DataFrame, lookbackHours: Int,
                tauSeconds: Double): DataFrame = {
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("p_ts"))
    val clicks = events.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"),
        col("user_id").as("c_user"), col("ts").as("c_ts"))
    val lookbackNs = lookbackHours.toLong * 3600L * 1000000000L

    val pairs = purchases.join(clicks,
      col("user_id") === col("c_user") &&
        col("c_ts") <= col("p_ts") &&
        col("c_ts") > col("p_ts") - lit(lookbackNs))
      .withColumn("w", qround(
        exp((col("c_ts") - col("p_ts")).cast("double") / 1e9 /
          lit(tauSeconds)), 6).cast("decimal(10,6)"))

    pairs
      .withColumn("tot",
        sum("w").over(Window.partitionBy("purchase_id")))
      .select(col("purchase_id"), col("click_id"), col("user_id"),
        col("w").cast("double").as("w"),
        qround(col("w").cast("double") / col("tot").cast("double"), 6)
          .as("credit"))
  }
}
