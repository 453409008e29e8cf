package graft.metrics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions.{qdec, qround}

/** Pearson χ² test of independence over a contingency table — "is the
  * language mix independent of the crawl source?" is the canonical
  * data-quality question on a training corpus (a dependence spike
  * usually means one source pipeline broke or drifted).
  *
  * Scale: the fact table reduces map-side to one row per (row, col)
  * CELL; every window below runs on that vocabulary-bounded frame.
  * Determinism: observed counts and marginals are integer-exact;
  * expected counts are one double expression of exact integers rounded
  * to 6 dp BEFORE the residual arithmetic, per-cell contributions are
  * rounded before the decimal-exact total — so χ² is bit-identical
  * cross-engine and under any partitioning (a naive Σ of double
  * contributions is merge-order-dependent and would flap the gate).
  */
object Contingency {

  /** Cell-level χ² report: (r, c, observed, expected, contrib) plus the
    * broadcast total `chi2` and degrees of freedom `dof` on every row
    * (the single-statistic columns a notebook reads off row 1). */
  def chiSquare(df: DataFrame, rowCol: Column, colCol: Column): DataFrame = {
    val cells = df.select(rowCol.as("r"), colCol.as("c"))
      .groupBy("r", "c").agg(count(lit(1)).as("o"))
    val byR = Window.partitionBy("r")
    val byC = Window.partitionBy("c")
    val all = Window.partitionBy()
    val contrib = cells
      .withColumn("rt", sum("o").over(byR))
      .withColumn("ct", sum("o").over(byC))
      .withColumn("n", sum("o").over(all))
      .withColumn("expected", qround(
        col("rt").cast("double") * col("ct").cast("double") /
          col("n").cast("double"), 6))
      .withColumn("e_dec", col("expected").cast("decimal(18,6)"))
      .withColumn("contrib", qround(
        ((col("o") - col("e_dec")) * (col("o") - col("e_dec")))
          .cast("double") / col("e_dec").cast("double"), 6))
    val dims = cells.agg(
      countDistinct("r").as("nr"), countDistinct("c").as("nc"))
    contrib
      .withColumn("chi2",
        sum(col("contrib").cast("decimal(18,6)")).over(all).cast("double"))
      .crossJoin(broadcast(dims))
      .select(col("r"), col("c"), col("o").as("observed"),
        col("expected"), col("contrib"), col("chi2"),
        ((col("nr") - 1) * (col("nc") - 1)).as("dof"))
  }
}
