package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Keyed band/range join — match left rows to right rows of the same key
  * whose time falls in `[l.time + lower, l.time + upper)` — as a pure
  * EQUI-join. Spark plans a range predicate join as BroadcastNestedLoop
  * (or worse, a cartesian product) because a `t BETWEEN a AND b`
  * condition has no equality to hash on: per key it degenerates to
  * O(|L|·|R|) comparisons — the classic 100 TB range-join killer.
  *
  * The standard fix, implemented here: quantize time into buckets of
  * width = the band width. Every right row lands in exactly one bucket;
  * every left row's band spans AT MOST TWO consecutive buckets, so the
  * left side explodes to ≤ 2 rows and the join becomes a plain
  * (key, bucket) hash equi-join — shuffle + hash, Catalyst picks the
  * strategy — followed by the exact residual band filter. Fan-out is
  * bounded by 2 regardless of data volume; cost is that of an ordinary
  * equi-join on a ≤ 2× left side.
  *
  * Times must be non-negative integral (epoch seconds/millis — integer
  * `div` keeps bucket ids exact; negative times would floor toward
  * zero). `lower`/`upper` bound the band: `lower` inclusive, `upper`
  * exclusive, `upper > lower`.
  */
object RangeJoin {

  def bucketed(left: DataFrame, right: DataFrame, key: String,
               lTime: String, rTime: String,
               lower: Long, upper: Long): DataFrame = {
    require(upper > lower, s"empty band [$lower, $upper)")
    val w = upper - lower
    val l = left.withColumn("__bucket",
      explode(sequence(
        expr(s"($lTime + $lower) div $w"),
        expr(s"($lTime + ${upper - 1}) div $w"))))
    val r = right.withColumn("__bucket", expr(s"$rTime div $w"))
    l.join(r, Seq(key, "__bucket"))
      .filter(col(rTime) >= col(lTime) + lower &&
        col(rTime) < col(lTime) + upper)
      .drop("__bucket")
  }
}
