package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for power-law keys (SURVEY §7.4.4: user-activity skew
  * in windows/self-joins at 100 TB).
  *
  * AQE's skew-join splitting handles the join case automatically in Spark
  * 4; these helpers cover the aggregation case AQE doesn't touch: a
  * hot-key `groupBy` where one key's partition dwarfs the rest.
  */
object Skew {

  /** Two-phase salted aggregation: distribute each key over `salts`
    * sub-partitions, partially aggregate, then merge. Correct for any
    * commutative+associative aggregate expressed as (partial, merge)
    * column pairs over the same column names.
    *
    * Example: salted count+sum:
    * {{{
    * saltedAgg(df, Seq("k"), salts = 16,
    *   partial = Seq(count(lit(1)).as("n"), sum($"v").as("s")),
    *   merge   = Seq(sum($"n").as("n"), sum($"s").as("s")))
    * }}}
    */
  def saltedAgg(df: DataFrame, keys: Seq[String], salts: Int,
                partial: Seq[org.apache.spark.sql.Column],
                merge: Seq[org.apache.spark.sql.Column]): DataFrame =
    df.withColumn("__salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)))
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(partial.head, partial.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(merge.head, merge.tail: _*)
}
