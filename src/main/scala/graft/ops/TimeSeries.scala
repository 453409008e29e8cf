package graft.ops

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions.{qdec, qround}

/** Time-series regularization: densify a sparse per-key daily series onto
  * its full [min_day, max_day] grid (gap fill) and carry the last
  * observation forward across the introduced gaps (forward fill).
  *
  * Construction: per-key day bounds from one aggregate, `sequence()` +
  * `explode` to manufacture the grid (rows are generated AFTER
  * aggregation, so the exploded frame is |keys|·days — never a shuffle
  * of the fact table), left join the observed points back on (key, day),
  * then one window pass for the fill: `last(value, ignoreNulls)` over
  * rows unbounded-preceding..current.
  *
  * Scale: the observed side aggregates to (key, day) first — the grid
  * join is agg-to-agg, and the fill window rides the same (key)
  * partitioning as the join output. Grids are bounded by calendar span,
  * not data volume: 100 TB of events over 3 years is ≤ ~1100 grid rows
  * per key regardless of event count. Skewed keys don't exist by
  * construction (every key has |span| rows, uniform).
  */
object TimeSeries {

  /** Densified daily series: (key, day, observed value-or-0 `measure`,
    * forward-filled `<measure>_ffill`, `is_gap`). `day` is an integer
    * epoch-day — calendar-function-free per the repo's determinism
    * rules. */
  def gapFillDaily(points: DataFrame, key: String, day: String,
                   measure: String): DataFrame = {
    val bounds = points.groupBy(col(key))
      .agg(min(col(day)).as("d0"), max(col(day)).as("d1"))
    val grid = bounds
      .select(col(key), explode(sequence(col("d0"), col("d1"))).as(day))
    val filled = grid.join(points, Seq(key, day), "left")
    val w = Window.partitionBy(key).orderBy(day)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    filled
      .withColumn("is_gap", col(measure).isNull)
      .withColumn(s"${measure}_ffill",
        last(col(measure), ignoreNulls = true).over(w))
      .withColumn(measure, coalesce(col(measure), lit(0).cast("double")))
  }

  /** Exponentially-weighted moving average per key:
    * `s_1 = x_1; s_i = α·x_i + (1−α)·s_{i−1}`.
    *
    * The recursion is inherently sequential WITHIN a key — no window
    * frame expresses it (the closed-form weight `(1−α)^(i−j)` underflows
    * or explodes re-normalized), so this is the repo's one legitimate
    * typed-iterator operator: `groupByKey(key).mapGroups` with an
    * in-group sort. Parallelism is per-key (the Spark execution model's
    * natural unit for sequential-state ops — the same shape
    * flatMapGroupsWithState uses in streaming); group size is
    * calendar-bounded (≤ span days), so the in-group array sort is O(1)
    * at any fact volume.
    *
    * Determinism: the fold multiplies/adds the SAME literals in the SAME
    * order as the oracle's recursive CTE, so the doubles are
    * bit-identical cross-engine; callers round on output only.
    *
    * Input must be one row per (key, day) — aggregate first. */
  def ewma(points: DataFrame, key: String, day: String, measure: String,
           alpha: Double): DataFrame = {
    val enc = Encoders.product[EwmaRow]
    points
      .select(col(key).cast("string").as("k"), col(day).cast("long").as("d"),
        col(measure).cast("double").as("x"))
      .groupByKey((r: Row) => r.getString(0))(Encoders.STRING)
      .flatMapGroups { (k: String, rows: Iterator[Row]) =>
        val sorted = rows.map(r => (r.getLong(1), r.getDouble(2)))
          .toArray.sortBy(_._1)
        var s = 0.0
        var first = true
        sorted.iterator.map { case (d, x) =>
          s = if (first) x else alpha * x + (1.0 - alpha) * s
          first = false
          EwmaRow(k, d, x, s)
        }
      }(enc)
      .toDF()
      .select(col("k").as(key), col("d").as(day), col("x").as(measure),
        col("ewma"))
  }
  /** Croston's method for intermittent demand: over a key's NON-ZERO
    * demand events in day order, two coupled EWMAs — demand size
    * z_j = α·x_j + (1−α)·z_{j−1} (z_1 = x_1) and inter-demand interval
    * p_j = α·(t_j−t_{j−1}) + (1−α)·p_{j−1} (p_2 = t_2−t_1; p undefined
    * until the second event, so keys with < 2 demands are dropped) —
    * forecast per period = z/p. The standard forecaster where most
    * periods are ZERO (spare parts, long-tail SKUs) and plain EWMA
    * (q127) or Holt (q164) over the dense series chase zeros to a
    * useless average.
    *
    * Same execution shape as [[ewma]]: the recursion is sequential
    * within a key, so `groupByKey.flatMapGroups` with per-key in-memory
    * sort (group size ≤ calendar span); the fold multiplies the SAME
    * literals in the SAME order as the oracle's recursive CTE, so the
    * doubles are bit-identical cross-engine. One row out per key. */
  def croston(points: DataFrame, key: String, day: String,
              measure: String, alpha: Double): DataFrame = {
    val enc = Encoders.product[CrostonRow]
    points
      .select(col(key).cast("string").as("k"), col(day).cast("long").as("d"),
        col(measure).cast("double").as("x"))
      .filter(col("x") > 0)
      .groupByKey((r: Row) => r.getString(0))(Encoders.STRING)
      .flatMapGroups { (k: String, rows: Iterator[Row]) =>
        val sorted = rows.map(r => (r.getLong(1), r.getDouble(2)))
          .toArray.sortBy(_._1)
        if (sorted.length < 2) Iterator.empty
        else {
          var z = sorted(0)._2
          var p = 0.0
          var prevDay = sorted(0)._1
          var first = true
          sorted.iterator.drop(1).foreach { case (d, x) =>
            val interval = (d - prevDay).toDouble
            p = if (first) interval else alpha * interval + (1.0 - alpha) * p
            z = alpha * x + (1.0 - alpha) * z
            first = false
            prevDay = d
          }
          Iterator.single(CrostonRow(k, sorted.length.toLong, prevDay, z, p))
        }
      }(enc)
      .toDF()
      .select(col("k").as(key), col("nDemands").as("n_demand_days"),
        col("lastDay").as("last_day"), col("z"), col("p"))
  }

  /** Linear interpolation across the gaps of [[gapFillDaily]]'s grid —
    * the fill for measures where carrying the last value forward
    * (ffill) misstates a trend: each gap day gets
    * `v_prev + (v_next − v_prev)·(d − d_prev)/(d_next − d_prev)`, the
    * straight line between its surrounding observations. Leading gaps
    * backfill from the first observation, trailing gaps carry the last
    * (a bounded-grid series has both endpoints observed by
    * construction, so these arms are vestigial there).
    *
    * Two window passes over the calendar-bounded grid (prev obs via
    * last-ignore-nulls preceding, next obs via first-ignore-nulls
    * following) — same partitioning as the grid join, no extra
    * shuffle.
    *
    * Determinism: rounding the double expression `vp + (vn−vp)·frac`
    * to 6dp is a cross-engine trap (Spark rounds the shortest decimal
    * repr, DuckDB the binary value — they disagree exactly at rounding
    * boundaries, observed live on this frame). Instead the line is
    * evaluated as an EXACT rational in scaled integer units
    * (`measure·scale` must be integral — scale 100 for 2dp money) and
    * half-up-rounded to 6dp with integer arithmetic; the one final
    * divide by 10⁶ is IEEE-identical everywhere. */
  def linearInterpDaily(points: DataFrame, key: String, day: String,
                        measure: String, scale: Int = 100): DataFrame = {
    val filled = gapFillDaily(points, key, day, measure)
      .withColumn(measure,
        when(col("is_gap"), lit(null)).otherwise(col(measure)))
    val wPrev = Window.partitionBy(key).orderBy(day)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = Window.partitionBy(key).orderBy(day)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val obsDay = when(col(measure).isNotNull, col(day))
    filled
      .withColumn("__vp", last(col(measure), ignoreNulls = true).over(wPrev))
      .withColumn("__dp", last(obsDay, ignoreNulls = true).over(wPrev))
      .withColumn("__vn", first(col(measure), ignoreNulls = true).over(wNext))
      .withColumn("__dn", first(obsDay, ignoreNulls = true).over(wNext))
      .withColumn("__vpc", qround(col("__vp") * scale, 0).cast("long"))
      .withColumn("__vnc", qround(col("__vn") * scale, 0).cast("long"))
      .withColumn("__num",
        (col("__vpc") * (col("__dn") - col("__dp")) +
          (col("__vnc") - col("__vpc")) * (col(day) - col("__dp")))
          .cast("decimal(38,0)"))
      .withColumn("__den",
        ((col("__dn") - col("__dp")) * scale).cast("decimal(38,0)"))
      .withColumn("__r", expr("(__num * 2000000 + __den) div (__den * 2)"))
      .withColumn(s"${measure}_interp",
        when(!col("is_gap"), col(measure))
          .when(col("__dp").isNull, col("__vn"))
          .when(col("__dn").isNull, col("__vp"))
          .otherwise(col("__r").cast("double") / lit(1000000.0)))
      .select(col(key), col(day),
        coalesce(col(measure), lit(0.0)).as(measure),
        col(s"${measure}_interp"), col("is_gap"))
  }

  /** Holt's linear (double-exponential) smoothing per key — [[ewma]]
    * plus a trend state, the one-step-ahead forecaster for trending
    * series EWMA systematically lags:
    * `l_i = α·x_i + (1−α)·(l_{i−1} + b_{i−1})`,
    * `b_i = β·(l_i − l_{i−1}) + (1−β)·b_{i−1}`, init `l_1 = x_1,
    * b_1 = 0`; `forecast_i = l_i + b_i` (the i+1 prediction).
    *
    * Same execution shape and determinism contract as [[ewma]]: the
    * recursion is sequential within a key (typed iterator, per-key
    * parallelism, calendar-bounded groups), and BOTH engines evaluate
    * the identical multiply-add chain — 1−α and 1−β are computed (not
    * pre-folded literals: 1−0.7 ≠ 0.3 in binary), so doubles agree
    * bit-for-bit before output rounding. */
  def holtLinear(points: DataFrame, key: String, day: String,
                 measure: String, alpha: Double, beta: Double): DataFrame = {
    val enc = Encoders.product[HoltRow]
    val oma = 1.0 - alpha
    val omb = 1.0 - beta
    points
      .select(col(key).cast("string").as("k"), col(day).cast("long").as("d"),
        col(measure).cast("double").as("x"))
      .groupByKey((r: Row) => r.getString(0))(Encoders.STRING)
      .flatMapGroups { (k: String, rows: Iterator[Row]) =>
        val sorted = rows.map(r => (r.getLong(1), r.getDouble(2)))
          .toArray.sortBy(_._1)
        var l = 0.0
        var b = 0.0
        var first = true
        sorted.iterator.map { case (d, x) =>
          if (first) { l = x; b = 0.0; first = false }
          else {
            val lNew = alpha * x + oma * (l + b)
            b = beta * (lNew - l) + omb * b
            l = lNew
          }
          HoltRow(k, d, x, l, b, l + b)
        }
      }(enc)
      .toDF()
      .select(col("k").as(key), col("d").as(day), col("x").as(measure),
        col("level"), col("trend"), col("forecast"))
  }

  /** Holt–Winters ADDITIVE seasonal smoothing per key — [[holtLinear]]
    * plus a `period`-slot seasonal state indexed by CALENDAR position
    * (`day mod period`, so observation gaps cannot rotate the season
    * the way a sequence-position index would):
    * `f_i = l + b + s[dow_i]` (one-step-ahead, from PRIOR state), then
    * `l' = α·(x_i − s[dow_i]) + (1−α)·(l + b)`,
    * `b' = β·(l' − l) + (1−β)·b`,
    * `s[dow_i]' = γ·(x_i − l') + (1−γ)·s[dow_i]`.
    * Init: `l = x_1, b = 0, s[·] = 0`, and the anchor row emits
    * `f = x_1`, `seasonal = 0` with NO state update — the convention
    * the recursive-CTE oracle mirrors row for row. Emitted `seasonal`
    * is the POST-update slot of that row's calendar position.
    *
    * Same execution shape and determinism contract as [[holtLinear]]:
    * sequential within a key, per-key parallelism, calendar-bounded
    * groups, 1−α/1−β/1−γ computed not pre-folded, multiply-add chains
    * textually mirrored so doubles agree bit-for-bit pre-rounding. */
  def holtWintersAdditive(points: DataFrame, key: String, day: String,
                          measure: String, alpha: Double, beta: Double,
                          gamma: Double, period: Int = 7): DataFrame = {
    val enc = Encoders.product[HwRow]
    val oma = 1.0 - alpha
    val omb = 1.0 - beta
    val omg = 1.0 - gamma
    points
      .select(col(key).cast("string").as("k"), col(day).cast("long").as("d"),
        col(measure).cast("double").as("x"))
      .groupByKey((r: Row) => r.getString(0))(Encoders.STRING)
      .flatMapGroups { (k: String, rows: Iterator[Row]) =>
        val sorted = rows.map(r => (r.getLong(1), r.getDouble(2)))
          .toArray.sortBy(_._1)
        val s = Array.fill(period)(0.0)
        var l = 0.0
        var b = 0.0
        var first = true
        sorted.iterator.map { case (d, x) =>
          // floorMod, not %: Scala % preserves the dividend's sign, so a
          // pre-epoch day (negative d) would index the seasonal array at
          // -1 and throw; floor-mod keeps the weekday cycle continuous
          // across the epoch (mirror floor-mod in any oracle twin).
          val dow = java.lang.Math.floorMod(d, period.toLong).toInt
          if (first) {
            l = x; b = 0.0; first = false
            HwRow(k, d, x, l, b, 0.0, x)
          } else {
            val sel = s(dow)
            val f = l + b + sel
            val lNew = alpha * (x - sel) + oma * (l + b)
            b = beta * (lNew - l) + omb * b
            l = lNew
            s(dow) = gamma * (x - lNew) + omg * sel
            HwRow(k, d, x, l, b, s(dow), f)
          }
        }
      }(enc)
      .toDF()
      .select(col("k").as(key), col("d").as(day), col("x").as(measure),
        col("level"), col("trend"), col("seasonal"), col("forecast"))
  }

  /** Mann–Kendall trend test per key: S = Σ_{i<j} sign(x_j − x_i) over
    * the time-ordered series, with the tie-corrected variance
    * 18·Var(S) = n(n−1)(2n+5) − Σ_t t(t−1)(2t+5) — the distribution-free
    * "is there a monotone trend at all" TEST whose point estimate is
    * [[graft.queries.OlapQueries q205]]'s Theil–Sen slope. Everything
    * up to z is EXACT integer arithmetic computed by a per-key LOCAL
    * fold (the q205 pattern: the pair set is calendar-bounded, so the
    * O(n²) loop runs inside one task per key, no distributed pair
    * stream); z = (S∓1)/√(var18/18) is the one mirrored IEEE step.
    * Input must be one row per (key, day).
    *
    * CONTRACT: `measure` must be INTEGER-VALUED (counts, cents — the
    * call sites pass pre-scaled integers). The decimal(38,0) cast below
    * half-up-rounds a fractional input silently, which would alter sign
    * comparisons and manufacture ties; scale fractional measures to an
    * exact integer grid (e.g. ×100 cents) BEFORE calling. */
  def mannKendall(points: DataFrame, key: String, day: String,
                  measure: String): DataFrame = {
    val enc = Encoders.product[MkRow]
    points
      .select(col(key).cast("string").as("k"), col(day).cast("long").as("d"),
        col(measure).cast("decimal(38,0)").as("x"))
      .groupByKey((r: Row) => r.getString(0))(Encoders.STRING)
      .mapGroups { (k: String, rows: Iterator[Row]) =>
        val xs = rows.map(r => (r.getLong(1), BigInt(r.getDecimal(2).toBigInteger)))
          .toArray.sortBy(_._1).map(_._2)
        val n = xs.length
        var s = 0L
        var i = 0
        while (i < n) {
          var j = i + 1
          while (j < n) {
            val c = xs(j).compare(xs(i))
            s += (if (c > 0) 1 else if (c < 0) -1 else 0)
            j += 1
          }
          i += 1
        }
        val ties = xs.groupBy(identity).values.map(_.length.toLong)
          .filter(_ > 1)
        val nL = n.toLong
        val var18 = nL * (nL - 1) * (2 * nL + 5) -
          ties.map(t => t * (t - 1) * (2 * t + 5)).sum
        MkRow(k, nL, s, var18)
      }(enc)
      .toDF()
      .select(col("k").as(key), col("n_days"), col("s_stat"), col("var18"))
  }

  /** Kendall τ-b concordance statistics per key: over all pairs of
    * (x, y) observations, C (concordant), D (discordant), and the
    * tie-correction pair counts tx/ty (ties in one variable only; both-
    * tied pairs count toward neither denominator term) — all EXACT
    * integers from the same per-key local fold as [[mannKendall]]
    * (pair sets bounded per key ⇒ one task each, no distributed pair
    * stream). τ-b = (C−D)/√((C+D+tx)·(C+D+ty)) is left to the caller
    * as the one mirrored IEEE step. */
  /** CONTRACT (same as [[mannKendall]]): `x`/`y` must be INTEGER-VALUED
    * — the decimal(38,0) casts half-up-round fractional inputs
    * silently, altering concordance comparisons and manufacturing ties.
    * Scale fractional measures to an exact integer grid first. */
  def kendallTauB(points: DataFrame, key: String, x: String,
                  y: String): DataFrame = {
    val enc = Encoders.product[KtRow]
    points
      .select(col(key).cast("string").as("k"),
        col(x).cast("decimal(38,0)").as("x"),
        col(y).cast("decimal(38,0)").as("y"))
      .groupByKey((r: Row) => r.getString(0))(Encoders.STRING)
      .mapGroups { (k: String, rows: Iterator[Row]) =>
        val ps = rows.map(r => (BigInt(r.getDecimal(1).toBigInteger),
          BigInt(r.getDecimal(2).toBigInteger))).toArray
        var c = 0L; var d = 0L; var tx = 0L; var ty = 0L
        var i = 0
        while (i < ps.length) {
          var j = i + 1
          while (j < ps.length) {
            val sx = ps(j)._1.compare(ps(i)._1)
            val sy = ps(j)._2.compare(ps(i)._2)
            if (sx != 0 && sy != 0) {
              if (sx == sy) c += 1 else d += 1
            } else if (sx == 0 && sy != 0) tx += 1
            else if (sx != 0 && sy == 0) ty += 1
            j += 1
          }
          i += 1
        }
        KtRow(k, ps.length.toLong, c, d, tx, ty)
      }(enc)
      .toDF()
      .select(col("k").as(key), col("n_obs"), col("concordant"),
        col("discordant"), col("ties_x"), col("ties_y"))
  }

  /** Two-sided CUSUM change-point statistic per key — the sequential
    * drift detector EWMA-style smoothing can't express: accumulate
    * deviations beyond an allowance `k` around a reference mean `mu`,
    * resetting at zero, so a sustained shift grows the statistic
    * linearly while in-control noise keeps it pinned near 0:
    *
    *   s⁺_i = max(0, s⁺_{i−1} + (x_i − mu − k))
    *   s⁻_i = max(0, s⁻_{i−1} − (x_i − mu) − k)
    *
    * `mu`/`k` arrive as COLUMNS (per-key constants the caller computes
    * and rounds — typically mean and 0.5σ of an in-control window), so
    * the fold needs no side join. Same execution shape and determinism
    * contract as [[ewma]]: the recursion is sequential within a key
    * (typed iterator, per-key parallelism, calendar-bounded groups);
    * max/add/sub over doubles the two engines computed identically are
    * bit-identical IEEE, so the recursive-CTE oracle agrees before any
    * output rounding. Input: one row per (key, day). */
  def cusum(points: DataFrame, key: String, day: String, measure: String,
            mu: String, slack: String): DataFrame = {
    val enc = Encoders.product[CusumRow]
    points
      .select(col(key).cast("string").as("k"), col(day).cast("long").as("d"),
        col(measure).cast("double").as("x"), col(mu).cast("double").as("m"),
        col(slack).cast("double").as("a"))
      .groupByKey((r: Row) => r.getString(0))(Encoders.STRING)
      .flatMapGroups { (k: String, rows: Iterator[Row]) =>
        val sorted = rows.map(r =>
          (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
          .toArray.sortBy(_._1)
        var sp = 0.0
        var sn = 0.0
        sorted.iterator.map { case (d, x, m, a) =>
          sp = math.max(0.0, sp + (x - m - a))
          sn = math.max(0.0, sn - (x - m) - a)
          CusumRow(k, d, x, sp, sn)
        }
      }(enc)
      .toDF()
      .select(col("k").as(key), col("d").as(day), col("x").as(measure),
        col("s_pos"), col("s_neg"))
  }

  /** Lagged cross-correlation of two daily series — "do clicks lead
    * revenue, and by how many days?": Pearson r between x[d] and
    * y[d+lag] for every lag in [−maxLag, maxLag]. The lead–lag scan
    * behind attribution windows and demand forecasting.
    *
    * `a` carries (day, x), `b` (day, y), both integer/decimal-valued.
    * Scale: series are calendar-bounded aggregates, so the lag cross
    * join is 2·maxLag+1 × |days| rows reducing map-side to one row per
    * lag; correlations come from decimal-exact sufficient statistics
    * (the [[graft.metrics.Ols]] discipline) with one double sqrt per
    * lag. Degenerate lags (n < 2 or zero variance) yield null r. */
  def laggedCrossCorr(a: DataFrame, b: DataFrame,
                      maxLag: Int): DataFrame = {
    val spark = a.sparkSession
    val lags = broadcast(spark.createDataFrame(
      (-maxLag to maxLag).map(Tuple1(_))).toDF("lag"))
    val s = a.crossJoin(lags)
      .join(b.withColumnRenamed("day", "bday"),
        col("bday") === col("day") + col("lag"))
      .groupBy("lag")
      .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
    val num = (col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
    val dx = (col("n") * col("sxx") - col("sx") * col("sx")).cast("double")
    val dy = (col("n") * col("syy") - col("sy") * col("sy")).cast("double")
    s.select(col("lag"), col("n").as("n_days"),
      when(col("n") >= 2 && dx > 0.0 && dy > 0.0,
        qround(num / sqrt(dx * dy), 6)).as("r"))
  }
}

/** Output row of [[TimeSeries.ewma]] (top-level for the product
  * Encoder). */
case class EwmaRow(k: String, d: Long, x: Double, ewma: Double)
case class CrostonRow(k: String, nDemands: Long, lastDay: Long,
                      z: Double, p: Double)

/** Output row of [[TimeSeries.holtLinear]]. */
case class HoltRow(k: String, d: Long, x: Double, level: Double,
                   trend: Double, forecast: Double)

/** Output row of [[TimeSeries.cusum]]. */
case class CusumRow(k: String, d: Long, x: Double, s_pos: Double,
                    s_neg: Double)

/** Output row of [[TimeSeries.holtWintersAdditive]]. */
case class HwRow(k: String, d: Long, x: Double, level: Double,
                 trend: Double, seasonal: Double, forecast: Double)

/** Output row of [[TimeSeries.mannKendall]]. */
case class MkRow(k: String, n_days: Long, s_stat: Long, var18: Long)

/** Output row of [[TimeSeries.kendallTauB]]. */
case class KtRow(k: String, n_obs: Long, concordant: Long,
                 discordant: Long, ties_x: Long, ties_y: Long)
