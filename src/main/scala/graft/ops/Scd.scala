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
  /** Incrementally apply a change batch to an existing Type-2 history —
    * the production maintenance path (a nightly batch must not rebuild
    * the full history): closed intervals pass through untouched (new
    * facts are strictly later, so no rebuild can change them), and each
    * entity's CURRENT interval is re-opened as a synthetic seed row
    * (its value at its `valid_from`, tiebreak −1 < any real id) unioned
    * with the increment, so [[type2]]'s run-length logic decides
    * extend-vs-close exactly as a full rebuild would: an increment
    * starting with the same value merges into the seed's run and keeps
    * the original `valid_from`; a different value closes the old
    * interval at the first new timestamp. Entities absent from the
    * increment reproduce their open interval; entities without history
    * build fresh. RESULT == full rebuild, row for row — that identity
    * IS the oracle gate — while the window pass touches only
    * |increment| + |open intervals| rows instead of the whole log. */
  def applyIncrement(history: DataFrame, increment: DataFrame,
                     entity: String, value: String, ts: String,
                     tiebreak: String, validate: Boolean = false): DataFrame = {
    val cols = Seq(col(entity), col(value), col("valid_from"),
      col("valid_to"), col("is_current"))
    if (validate) {
      // Rebuild-identity preconditions (cheap two-value probe, opt-in
      // for the production maintenance path): every increment fact must
      // be strictly later than every open interval's valid_from (a
      // late-arriving fact older than an open interval silently yields
      // a history ≠ full rebuild), and real tiebreak ids must be ≥ 0
      // (the synthetic seed uses −1 and must sort first).
      val minInc = increment.agg(
        org.apache.spark.sql.functions.min(col(ts)),
        org.apache.spark.sql.functions.min(col(tiebreak))).head()
      val maxOpen = history.filter(col("is_current"))
        .agg(org.apache.spark.sql.functions.max(col("valid_from"))).head()
      if (!minInc.isNullAt(0) && !maxOpen.isNullAt(0))
        require(minInc.getLong(0) > maxOpen.getLong(0),
          s"applyIncrement: increment min $ts ${minInc.getLong(0)} is not " +
            s"strictly after the latest open valid_from " +
            s"${maxOpen.getLong(0)} — run a full rebuild for " +
            "late-arriving history")
      if (!minInc.isNullAt(1))
        require(minInc.getLong(1) >= 0L,
          "applyIncrement: negative tiebreak ids collide with the " +
            "synthetic seed (-1)")
    }
    val closed = history.filter(!col("is_current")).select(cols: _*)
    val seed = history.filter(col("is_current"))
      .select(col(entity), col(value), col("valid_from").as(ts),
        lit(-1L).as(tiebreak))
    val tail = type2(
      increment.select(col(entity), col(value), col(ts), col(tiebreak))
        .unionByName(seed),
      entity, value, ts, tiebreak)
    closed.unionByName(tail.select(cols: _*))
  }

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
