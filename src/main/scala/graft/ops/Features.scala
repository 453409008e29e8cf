package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Supervised-training row generation from an event log — the
  * feature/label framing step of a next-event-prediction pipeline
  * (churn, next-action, dwell modelling): for every event, features come
  * from the PREVIOUS event (its type, the dwell gap) and the label is
  * the current event's type. The model answers "given what the user just
  * did, what happens next?".
  *
  * One hash exchange on the entity key serves all three window
  * expressions (lag type, lag ts, row_number); the label join is free
  * because label and features live on the same row after the lags — no
  * self-join of the log against itself shifted by one (the join form
  * shuffles twice and breaks on duplicate timestamps).
  */
object Features {

  /** (user, event_id, seq_n, prev_type, dwell_s, label) rows; the first
    * event per user has no features and is dropped. `ts` is an ns-epoch
    * long; `tiebreak` makes (user, ts, tiebreak) unique. */
  def nextEventRows(events: DataFrame, user: String, ts: String,
                    tiebreak: String, typeCol: String): DataFrame = {
    val w = Window.partitionBy(user).orderBy(col(ts), col(tiebreak))
    events
      .withColumn("seq_n", row_number().over(w))
      .withColumn("prev_type", lag(col(typeCol), 1).over(w))
      .withColumn("gap_ns", col(ts) - lag(col(ts), 1).over(w))
      .withColumn("dwell_s", expr("gap_ns div 1000000000"))
      .filter(col("seq_n") >= 2)
      .select(col(user), col(tiebreak), col("seq_n"), col("prev_type"),
        col("dwell_s"), col(typeCol).as("label"))
  }
}
