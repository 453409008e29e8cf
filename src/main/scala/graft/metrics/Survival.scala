package graft.metrics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions.{qdec, qround}

/** Kaplan–Meier survival estimation over an event log — retention as a
  * proper survival curve with right-censoring, instead of the naive
  * "average lifetime" that treats still-active users as churned (the
  * bias every cohort dashboard quietly carries): a user whose last
  * activity is within `censorDays` of the observation end is CENSORED
  * (they may still be alive), contributing risk-time but no death.
  *
  * Ŝ(t) = Π_{tᵢ ≤ t} (1 − dᵢ/nᵢ) over distinct event days — the
  * standard product-limit estimator (Kaplan & Meier 1958, public).
  *
  * Scale: lifetimes reduce per-user on one entity exchange, then to
  * ONE ROW PER DISTINCT DURATION (map-side); the cumulative windows
  * walk that duration-bounded frame, never users. Determinism: risk
  * sets and death counts are exact integers; the product-limit runs as
  * exp(Σ ln(factor)) with each ln-term ROUNDED to 9 dp and summed
  * decimal-exactly — the only cross-engine-fragile op (Σ of doubles)
  * is replaced by an exact sum of identically-rounded terms.
  */
object Survival {

  /** Per distinct lifetime row: (t, n_risk, n_death, n_censor, s_hat),
    * lifetime measured in `unitNs` ticks (hours, days — caller picks a
    * granularity that matches the log's span). `events` carries
    * (user, ts) with ts in ns; observation end = the global max ts;
    * users active within `censorUnits` ticks of it are censored. */
  def kaplanMeier(events: DataFrame, user: String, ts: String,
                  unitNs: Long, censorUnits: Int): DataFrame = {
    val dayNs = unitNs
    val perUser = events.groupBy(user)
      .agg(min(ts).as("first_ts"), max(ts).as("last_ts"))
    val obsEnd = perUser.agg(max("last_ts").as("obs_end"))
    val lives = perUser.crossJoin(broadcast(obsEnd))
      .select(
        // integer `div`: the ns span exceeds 2^53, so a double divide
        // would lose exactness right where both engines must agree
        expr(s"(last_ts - first_ts) div $dayNs").cast("long").as("t"),
        (col("last_ts") >= col("obs_end") -
          lit(censorUnits.toLong * dayNs)).cast("int").as("censored"))

    val byT = lives.groupBy("t")
      .agg(count(lit(1)).as("m"),
        sum(lit(1) - col("censored")).as("d"),
        sum("censored").as("c"))
    // n_risk at t = everyone with lifetime ≥ t (deaths AND censored
    // leave the risk set after their own time)
    val wDesc = Window.orderBy(col("t").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAsc = Window.orderBy("t")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byT
      .withColumn("n_risk", sum("m").over(wDesc))
      // a step where EVERYONE at risk dies drives Ŝ to exactly 0 — keep
      // it out of the log-domain sum and pin the tail with a flag
      .withColumn("lnf",
        when(col("d") > 0 && col("d") < col("n_risk"), qround(
          log(lit(1.0) - col("d").cast("double") /
            col("n_risk").cast("double")), 9))
          .otherwise(lit(0.0)).cast("decimal(18,9)"))
      .withColumn("dead",
        max(when(col("d") === col("n_risk"), 1).otherwise(0)).over(wAsc))
      .withColumn("s_hat",
        when(col("dead") === 1, lit(0.0)).otherwise(
          qround(exp(sum("lnf").over(wAsc).cast("double")), 6)))
      .select(col("t"), col("n_risk"), col("d").as("n_death"),
        col("c").as("n_censor"), col("s_hat"))
  }
}
