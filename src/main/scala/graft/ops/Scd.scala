package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (Type 2) history construction: collapse a
  * per-entity change stream into attribute-validity intervals
  * (entity, value, valid_from, valid_to, is_current), where consecutive
  * observations of the SAME value merge into one interval and `valid_to`
  * is the next interval's start (NULL = still current).
  *
  * This is the run-length encoding of a change log — the standard
  * islands-and-gaps construction done with two window passes over ONE
  * shuffle on the entity key:
  *   1. change flag = value ≠ lag(value)  (row-ordered by time + tiebreak)
  *   2. run id     = running sum of flags (same window frame)
  * then one groupBy (entity, run) for interval bounds and a lead() over
  * the runs for the closing timestamp.
  *
  * Scale: everything partitions by entity — the three window functions
  * and the groupBy all reuse the single hash exchange on `entity` (the
  * run-id window sorts within partitions only). No self-join against the
  * history, no per-entity collect; a 100 TB change log with billions of
  * entities streams through partition-local sorts.
  */
object Scd {

  /** `tiebreak` must make (entity, ts, tiebreak) unique — same contract
    * as the chronological split (reference `partition.py:22-35`). */
  def type2(log: DataFrame, entity: String, value: String, ts: String,
            tiebreak: String): DataFrame = {
    val byRow = Window.partitionBy(entity).orderBy(col(ts), col(tiebreak))
    val runs = log
      .withColumn("chg",
        when(lag(col(value), 1).over(byRow).isNull ||
          lag(col(value), 1).over(byRow) =!= col(value), 1L).otherwise(0L))
      .withColumn("run_id", sum(col("chg")).over(
        byRow.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(entity), col("run_id"))
      .agg(first(col(value)).as(value), min(col(ts)).as("valid_from"))
    val byRun = Window.partitionBy(entity).orderBy(col("run_id"))
    runs
      .withColumn("valid_to", lead(col("valid_from"), 1).over(byRun))
      .withColumn("is_current", col("valid_to").isNull)
      .drop("run_id")
  }
}
