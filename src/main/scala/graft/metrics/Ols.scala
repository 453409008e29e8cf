package graft.metrics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions.{qdec, qround}

/** Grouped simple linear regression from sufficient statistics — the
  * "fit a line per segment" primitive (trend per source, elasticity
  * per market) that needs no ML runtime: OLS over (x, y) is a pure
  * function of the five sums (n, Σx, Σy, Σxy, Σx², Σy²), which reduce
  * map-side in one pass. This is the textbook closed form
  * β = (nΣxy − ΣxΣy) / (nΣx² − (Σx)²), NOT an iterative solver.
  *
  * Determinism: inputs are integer-valued columns, so every sufficient
  * statistic is a decimal-exact sum (partitioning- and merge-order-
  * independent); slope/intercept/R² are single double expressions of
  * those exact operands, rounded once — bit-identical cross-engine.
  * The slope is rounded BEFORE the intercept uses it, so both engines
  * derive the intercept from the same constant.
  *
  * Scale: one grouped aggregate; output is |groups| rows. Degenerate
  * groups (n < 2 or zero x-variance) return null slope/intercept/r2
  * rather than ±Inf — the caller decides the fallback.
  */
object Ols {

  /** (group, n, slope, intercept, r2) per group of `df`. */
  def fitPerGroup(df: DataFrame, group: Column, x: Column,
                  y: Column): DataFrame = {
    val stats = df.select(group.as("g"),
        x.cast("decimal(18,0)").as("x"), y.cast("decimal(18,0)").as("y"))
      .groupBy("g")
      .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
    val dn = stats.columns.map(col)
    val num = (col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
    val dx = (col("n") * col("sxx") - col("sx") * col("sx")).cast("double")
    val dy = (col("n") * col("syy") - col("sy") * col("sy")).cast("double")
    stats.select(dn: _*)
      .withColumn("slope",
        when(col("n") >= 2 && dx > 0.0, qround(num / dx, 6)))
      .withColumn("intercept",
        when(col("slope").isNotNull, qround(
          (col("sy").cast("double") -
            col("slope") * col("sx").cast("double")) /
            col("n").cast("double"), 6)))
      .withColumn("r2",
        when(col("slope").isNotNull && dy > 0.0,
          qround(num * num / (dx * dy), 6)))
      .select(col("g").as("grp"), col("n"), col("slope"),
        col("intercept"), col("r2"))
  }
}
