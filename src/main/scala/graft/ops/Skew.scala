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
    * The salt is a DETERMINISTIC function of the full row content
    * (`xxhash64` over every column + seed): under task retries a
    * recomputed row lands in the same sub-partition it did originally —
    * a nondeterministic salt (partition id, random, monotonic id) is the
    * SPARK-23207 row-loss/duplication class of bug, in exactly the
    * retry-heavy environment this helper targets.
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
                merge: Seq[org.apache.spark.sql.Column]): DataFrame = {
    val saltInputs = df.columns.map(col).toSeq :+ lit("graft-salt")
    df.withColumn("__salt", pmod(xxhash64(saltInputs: _*), lit(salts.toLong)))
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(partial.head, partial.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(merge.head, merge.tail: _*)
  }
}
