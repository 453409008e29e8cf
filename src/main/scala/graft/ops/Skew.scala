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

  /** Salted equi-join for a hot-key fact ⋈ dim: the fact side salts each
    * row into one of `salts` sub-partitions (same retry-deterministic
    * full-row hash as [[saltedAgg]] — a nondeterministic salt is the
    * SPARK-23207 row-loss class under retries), the dim side REPLICATES
    * ×`salts`, and the join runs on (keys..., salt) — so a hot join
    * key's rows land on `salts` shuffle partitions instead of one.
    * Result is row-identical to the plain join (each fact row meets its
    * dim row exactly once, at its own salt).
    *
    * When to reach for it: Spark 4's AQE splits skewed SHUFFLE join
    * partitions automatically, but AQE is off in Structured Streaming,
    * can't help when the skewed side feeds a window/aggregate pipeline
    * that pins the partitioning, and re-plans only AFTER a stage
    * materializes the skew. Explicit salting shapes the shuffle up
    * front, deterministically — the form that also survives on engines
    * /modes without runtime re-planning. Cost: the dim side ships
    * `salts`× (keep `salts` small, or broadcast the dim and skip
    * salting entirely — this operator is for dims too big to
    * broadcast). */
  def saltedJoin(fact: DataFrame, dim: DataFrame, keys: Seq[String],
                 salts: Int): DataFrame = {
    val saltInputs = fact.columns.map(col).toSeq :+ lit("graft-salt")
    val f = fact.withColumn("__salt",
      pmod(xxhash64(saltInputs: _*), lit(salts.toLong)))
    val d = dim.withColumn("__salt",
      explode(array((0 until salts).map(i => lit(i.toLong)): _*)))
    f.join(d, keys :+ "__salt").drop("__salt")
  }
}
