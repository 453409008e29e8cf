package graft.ops

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._

/** Floor-clamped running balance — the ledger fold behind prepaid
  * credits, inventory with backorder cutoff, and rate-limiter budgets:
  * `bal_i = max(0, bal_{i−1} + delta_i)`.
  *
  * The clamp makes the recursion NON-LINEAR, so no window frame or
  * prefix-sum trick expresses it (unlike a plain running sum): this is
  * the repo's second legitimate typed-iterator operator (with
  * [[TimeSeries.ewma]]/holtLinear) — `groupByKey(key).mapGroups`, one
  * output row per key, per-key parallelism, in-group sort on the
  * caller-supplied total order.
  *
  * Determinism: deltas arrive as DECIMAL(18,2) (cast from the raw
  * double upstream, rule-2 safe) and the fold runs in exact
  * `java.math.BigDecimal` — zero floating point anywhere, so the DuckDB
  * recursive-CTE oracle matches bit-for-bit at any depth.
  *
  * NULL deltas poison the balance exactly as SQL arithmetic does
  * (stream fuzz gate, ledger_clamp class): `bal + NULL` is NULL, a NULL
  * sum is never `< 0` so it never clamps, and once NULL the balance
  * stays NULL — mirroring the oracle's recursive CASE, where the old
  * fold threw NullPointerException on the first NULL-valued event. */
object Ledger {

  /** One row per key: (key, n_events, n_clamped, final_balance).
    * `delta` must be a DECIMAL(18,2) column; rows fold in
    * (ord, tiebreak) order; balance starts at 0 and clamps at 0. */
  def clampedBalance(df: DataFrame, key: String, ord: String,
                     tiebreak: String, delta: String): DataFrame = {
    val zero = java.math.BigDecimal.ZERO
    df.select(col(key).cast("long").as("k"),
        col(ord).cast("long").as("o"), col(tiebreak).cast("long").as("t"),
        col(delta).as("d"))
      .groupByKey((r: Row) => r.getLong(0))(Encoders.scalaLong)
      .mapGroups { (k: Long, rows: Iterator[Row]) =>
        val sorted = rows.map(r => (r.getLong(1), r.getLong(2),
          r.getDecimal(3))).toArray.sortBy(x => (x._1, x._2))
        var bal = zero
        var clamped = 0L
        sorted.foreach { case (_, _, d) =>
          bal = if (bal == null || d == null) null else bal.add(d)
          if (bal != null && bal.signum() < 0) { bal = zero; clamped += 1 }
        }
        LedgerRow(k, sorted.length.toLong, clamped, bal)
      }(Encoders.product[LedgerRow])
      .toDF()
      .select(col("k").as(key), col("n_events"), col("n_clamped"),
        // Fold is exact BigDecimal; the OUTPUT re-projects to DOUBLE
        // (decOut, r9 determinism rule: decimal inside, double/bigint
        // out — DecimalType on a gated surface is a hasher lottery).
        graft.functions.GraftFunctions.decOut(col("final_balance"), 2)
          .as("final_balance"))
  }
}

/** Output row of [[Ledger.clampedBalance]]. */
case class LedgerRow(k: Long, n_events: Long, n_clamped: Long,
                     final_balance: java.math.BigDecimal)
