package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions.{qdec, qround}

/** Poisson bootstrap — resampling statistics at data-parallel scale.
  *
  * The classic bootstrap draws B resamples WITH replacement, which is
  * driver-hostile: each resample is a full shuffled copy of the data
  * (the reference's stats all stop at point estimates for exactly this
  * reason). The Poisson bootstrap replaces per-resample multinomial
  * draws with an independent Poisson(1) weight per (row, replica) —
  * for n → ∞ the resample composition converges to the same
  * distribution, and the weight is a pure function of the row key, so
  * the whole procedure becomes one scan: explode each row into B
  * lightweight (replica, weight) contributions and reduce map-side.
  * No resample is ever materialized; wall-clock is O(B·n / cores) with
  * partial aggregation, and the result is independent of partitioning.
  *
  * Determinism: the per-(row, replica) uniform comes from the repo's
  * keyed md5 PRNG ([[graft.io.Tables.seededUniform]] semantics,
  * mirrored verbatim in DuckDB), the inverse-CDF thresholds are shared
  * double literals, weighted sums run in the decimal domain, and each
  * replica mean is one double division rounded to 6 dp — so the CI
  * endpoints are bit-identical cross-engine and layout-independent.
  */
object Bootstrap {

  /** Cumulative Poisson(1) CDF at 0..7 — weights are capped at 8
    * (P(X > 8) ≈ 1.1e-7; at B = 200 replicas the cap is statistically
    * invisible). Literal doubles: both engines parse the same decimal
    * strings to the same IEEE values. */
  val PoissonCdf1: Seq[Double] = Seq(
    0.36787944117144233, 0.7357588823428847, 0.9196986029286058,
    0.9810118431238463, 0.9963401531726563, 0.9994058151824183,
    0.999916758850712, 0.9999897508033253)

  /** Inverse-CDF Poisson(1) weight of a uniform draw `u` ∈ [0,1). */
  def poissonWeight(u: Column): Column =
    PoissonCdf1.zipWithIndex.foldRight(lit(8): Column) {
      case ((t, k), rest) => when(u < lit(t), lit(k)).otherwise(rest)
    }

  /** The same inverse CDF as DuckDB SQL over a uniform expression —
    * the oracle mirror of [[poissonWeight]], built from the SAME
    * literals so the branch constants cannot drift. */
  def poissonWeightSql(uExpr: String): String =
    "CASE " + PoissonCdf1.zipWithIndex.map { case (t, k) =>
      s"WHEN $uExpr < $t THEN $k"
    }.mkString(" ") + " ELSE 8 END"

  /** Bootstrap percentile CI for the mean of `value`.
    *
    * Output (one row): `n_rows`, `mean` (full-sample), `n_replicas`,
    * `ci_lo` / `ci_hi` (percentile-method alpha/2 and 1−alpha/2 order
    * statistics of the replica means, rank = ⌈q·B⌉), `se_boot` (the
    * replica-mean standard deviation, computed from decimal-exact
    * Σm / Σm² so it is merge-order-independent).
    *
    * Scale: the explode is B rows per input row feeding a groupBy(b)
    * with map-side partial aggregation — each task emits ≤ B partial
    * rows regardless of input size. The order-statistic window runs
    * over the B-row replica-mean frame (aggregate-sized, documented
    * single partition), never over the data.
    *
    * @param key  unique row key (drives the per-(row, replica) PRNG)
    */
  def meanCI(df: DataFrame, key: Column, value: Column, replicas: Int,
             seed: Long, alpha: Double = 0.05): DataFrame = {
    require(replicas >= 40, s"need >= 40 replicas for a stable CI, got $replicas")
    val base = df.select(key.cast("string").as("k"),
      graft.functions.GraftFunctions.qdec(value, 18, 2).as("v"))

    val u = least(
      graft.functions.GraftFunctions.md5_63(
        concat(lit(seed.toString), lit(":"), col("k"), lit(":"),
          col("b").cast("string")))
        .cast("double") / lit(9.223372036854775808e18),
      lit(0.9999999999999999))
    val means = base
      .select(col("k"), col("v"),
        explode(sequence(lit(0), lit(replicas - 1))).as("b"))
      .withColumn("w", poissonWeight(u))
      .groupBy("b")
      .agg(sum(col("w") * col("v")).as("swv"), sum(col("w")).as("sw"))
      .select(col("b"),
        graft.functions.GraftFunctions.qdec(
          col("swv").cast("double") / col("sw").cast("double"), 18, 6)
          .as("m"))

    val loRank = math.ceil(alpha / 2.0 * replicas).toLong
    val hiRank = math.ceil((1.0 - alpha / 2.0) * replicas).toLong
    val ranked = means.withColumn("r",
      row_number().over(Window.orderBy(col("m"), col("b"))))
    val ci = ranked.agg(
      count(lit(1)).as("n_replicas"),
      min(when(col("r") === loRank, col("m"))).as("ci_lo"),
      min(when(col("r") === hiRank, col("m"))).as("ci_hi"),
      sum(col("m")).as("s1"), sum(col("m") * col("m")).as("s2"))

    val full = base.agg(count(lit(1)).as("n_rows"), sum("v").as("sv"))
    full.crossJoin(ci).select(
      col("n_rows"),
      qround(col("sv").cast("double") / col("n_rows").cast("double"), 6)
        .as("mean"),
      col("n_replicas"),
      col("ci_lo").cast("double").as("ci_lo"),
      col("ci_hi").cast("double").as("ci_hi"),
      qround(sqrt((col("s2").cast("double") -
          col("s1").cast("double") * col("s1").cast("double") /
            col("n_replicas").cast("double")) /
        (col("n_replicas").cast("double") - 1.0)), 6).as("se_boot"))
  }
}
