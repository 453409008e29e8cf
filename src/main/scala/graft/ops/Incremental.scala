package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Incremental aggregate (materialized-view) maintenance: keep a grouped
  * summary current by merging the stored summary with a partial aggregate
  * of ONLY the newly-arrived rows, instead of re-scanning history.
  *
  * The point at 100 TB: a refresh touches |delta| + |MV| rows. The MV is
  * |groups|-sized (independent of history) and the delta is one
  * partition's worth, so the nightly refresh of a year-long 100 TB fact
  * table costs a single partition scan plus a groups-sized merge — the
  * full-recompute equivalent re-shuffles the entire table. This works for
  * exactly the ALGEBRAIC aggregates whose partial states merge by an
  * associative op (count→sum, sum→sum, min→min, max→max; avg = merged
  * sum/count); MEDIAN-class holistic aggregates don't decompose this way
  * and need a sketch (see [[graft.sketch.CountMin]] for the frequency
  * analogue).
  *
  * Correctness is definitional — merge(partials(A), partials(B)) must
  * equal partials(A ∪ B) — which is exactly what the q103 oracle gate
  * checks: the engine merges base-MV + delta partials, DuckDB recomputes
  * from scratch over the union.
  */
object Incremental {

  private val Dec = DecimalType(18, 2)

  /** Partial (mergeable) aggregate state of `measure` by `keys`:
    * (keys..., n, s, mn, mx). Sum runs in DECIMAL(18,2) per the repo's
    * determinism rule — decimal addition is exact, so partial-vs-full
    * grouping cannot change the value. One map-side-combined shuffle. */
  def partials(df: DataFrame, keys: Seq[String], measure: Column): DataFrame =
    df.groupBy(keys.map(col): _*).agg(
      count(lit(1)).as("n"),
      sum(graft.functions.GraftFunctions.qdec(measure, 18, 2)).as("s"),
      min(graft.functions.GraftFunctions.qdec(measure, 18, 2)).as("mn"),
      max(graft.functions.GraftFunctions.qdec(measure, 18, 2)).as("mx"))

  /** Merge partial states (the stored MV plus any number of delta
    * partials) into the refreshed view. Inputs are groups-sized, so on a
    * cluster this is a shuffle over |groups|·(parts) rows — never over
    * the fact table. */
  def merge(parts: Seq[DataFrame], keys: Seq[String]): DataFrame = {
    require(parts.nonEmpty, "nothing to merge")
    parts.reduce(_.unionByName(_))
      .groupBy(keys.map(col): _*).agg(
        sum(col("n")).as("n"),
        sum(col("s")).cast(Dec).as("s"),
        min(col("mn")).as("mn"),
        max(col("mx")).as("mx"))
  }
}
