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

  /** Position-based (U-shaped) multi-touch attribution — the journey-
    * shape alternative to [[timeDecay]]'s recency weighting: the FIRST
    * touch (discovery) and the LAST touch (closer) each take 40 % of a
    * conversion's credit, the middle touches split the remaining 20 %
    * evenly. Degenerate journeys: a single touch takes 100 %, exactly
    * two touches split 50/50.
    *
    * Same lookback-pair build as [[timeDecay]] (one user-keyed
    * shuffle), then one purchase-keyed window pass supplies both the
    * chronological position (ties broken by click_id — engine and
    * oracle alike) and the touch count. Credits are exact double
    * literals except the middle share, which is one double divide
    * rounded once — merge-order-independent by construction (middle
    * credits of a journey are all equal, so no renormalizing sum is
    * needed or taken). */
  def positionBased(events: DataFrame, lookbackHours: Int): DataFrame = {
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
    val w = Window.partitionBy("purchase_id")
    val wAsc = Window.partitionBy("purchase_id")
      .orderBy(col("c_ts"), col("click_id"))
    pairs
      .withColumn("pos", row_number().over(wAsc))
      .withColumn("n_touches", count(lit(1)).over(w))
      .withColumn("position",
        when(col("n_touches") === 1, "only")
          .when(col("pos") === 1, "first")
          .when(col("pos") === col("n_touches"), "last")
          .otherwise("middle"))
      .withColumn("credit",
        when(col("n_touches") === 1, lit(1.0))
          .when(col("n_touches") === 2, lit(0.5))
          .when(col("pos") === 1 || col("pos") === col("n_touches"),
            lit(0.4))
          .otherwise(qround(lit(0.2) / (col("n_touches") - 2), 6)))
      .select(col("purchase_id"), col("click_id"), col("user_id"),
        col("n_touches"), col("position"), col("credit"))
  }
}
