package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions.{qdec, qround}

/** One-pass column profiling — the data-quality summary (row count,
  * null count, distinct count, min/max) every ingestion pipeline runs
  * before trusting a new batch.
  *
  * ALL columns profile in a single aggregate over a single scan: the
  * per-column measures are flat aggregate expressions of one global
  * `agg(...)`, then the one result row is melted to a row per column
  * (explode of a struct array — no second pass, no per-column query).
  * min/max are cast to string AFTER aggregating, so the comparison runs
  * on the native type and the output schema is column-type-agnostic.
  *
  * Scale shape: the scan partial-aggregates map-side; only the exact
  * `countDistinct`s add weight (Spark plans k distinct aggregates as one
  * Expand pass — (k+1)× row multiplication through ONE shuffle). At
  * 100 TB swap `countDistinct` for `approx_count_distinct` (HLL++,
  * mergeable, no Expand) — the one-line change is the standard
  * exact→sketch trade documented across this engine (q16, q78).
  */
object Profile {

  /** (col_name, n_rows, n_nulls, n_distinct, min_s, max_s) per requested
    * column. `n_distinct` excludes NULLs (SQL count-distinct semantics);
    * min_s/max_s are NULL for all-null columns. */
  def profile(df: DataFrame, columns: Seq[String]): DataFrame = {
    require(columns.nonEmpty, "profile needs at least one column")
    val aggs = columns.flatMap { c =>
      Seq(count(col(c)).as(s"__nn_$c"),
        countDistinct(col(c)).as(s"__nd_$c"),
        min(col(c)).cast("string").as(s"__mn_$c"),
        max(col(c)).cast("string").as(s"__mx_$c"))
    }
    val row = df.agg(count(lit(1)).as("n_rows"), aggs: _*)
    val perCol = columns.map { c =>
      struct(lit(c).as("col_name"), col("n_rows"),
        (col("n_rows") - col(s"__nn_$c")).as("n_nulls"),
        col(s"__nd_$c").as("n_distinct"),
        col(s"__mn_$c").as("min_s"), col(s"__mx_$c").as("max_s"))
    }
    row.select(explode(array(perCol: _*)).as("p")).select("p.*")
  }

  /** Pairwise Pearson correlation of `columns` in ONE pass: all
    * k·(k−1)/2 `corr` co-moment aggregates ride a single scan and a
    * single reduce (contrast k² separate jobs, or collecting vectors to
    * the driver), melted to (col_a, col_b, r·6dp) rows. The co-moments
    * are distributed double reductions — rounded per rule #3. At
    * 100 TB this is the feature-correlation screen before training:
    * cost is one scan regardless of k, state is k² doubles. */
  def corrMatrix(df: DataFrame, columns: Seq[String]): DataFrame = {
    require(columns.size >= 2, "corrMatrix needs at least two columns")
    val pairs = for {
      i <- columns.indices
      j <- (i + 1) until columns.size
    } yield (columns(i), columns(j))
    // r = covar_samp / (stddev_samp · stddev_samp), NOT the built-in
    // `corr`: Spark 4's Corr divides by sqrt(m2x·m2y) inside its
    // evaluateExpression, which THROWS DIVIDE_BY_ZERO under ANSI on any
    // zero-variance column (fuzz gate, identical_prices class) where
    // DuckDB's corr returns NULL. The factored form lets the zero/NULL
    // denominator be guarded to the oracle's NULL; the co-moments are
    // the same single-pass Welford reductions Corr uses, so the values
    // agree with the prior built-in at the 6 dp output quantum.
    val sds = columns.map(c => stddev_samp(col(c)).as(s"sd|$c"))
    val cvs = pairs.map { case (a, b) =>
      covar_samp(col(a), col(b)).as(s"cv|$a|$b")
    }
    val aggs = sds ++ cvs
    val row = df.agg(aggs.head, aggs.tail: _*)
    val perPair = pairs.map { case (a, b) =>
      val den = col(s"sd|$a") * col(s"sd|$b")
      val r = when(den.isNull || den === 0.0 || isnan(den), lit(null))
        .otherwise(col(s"cv|$a|$b") / den)
      struct(lit(a).as("col_a"), lit(b).as("col_b"),
        qround(r, 6).as("r"))
    }
    row.select(explode(array(perPair: _*)).as("p")).select("p.*")
  }
}
