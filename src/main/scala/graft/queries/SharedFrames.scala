package graft.queries

import graft.io.Tables
import graft.functions.GraftFunctions.{qdec, qround}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Aggregate frames shared by several registered queries, memoized per
  * (session, sfDir) and persisted at MEMORY_AND_DISK like the other hot
  * intermediates ([[graft.util.SessionMemo.cached]]). The point is scan
  * economy: three time-series queries (q106 gap fill, q121 moving stats,
  * q127 EWMA) consume the SAME (nation, day) daily-revenue aggregate —
  * built once, the orders⋈customer⋈nation join and its fact scan run
  * once per session instead of once per query. */
object SharedFrames {

  /** Daily revenue per nation: (nation, day, rev DECIMAL(18,2)-summed).
    * `day` is the integer epoch-day; `rev` stays decimal so consumers
    * choose where to cast (window sums stay exact). The frame is
    * calendar-bounded (nations × span days), so persisting it costs ~60k
    * rows at ANY scale factor. */
  def dailyNationRevenue(spark: SparkSession, dir: String): DataFrame =
    graft.util.SessionMemo.cached(spark, s"daily-nation-rev:$dir") {
      Tables.orders(spark, dir)
        .join(Tables.customer(spark, dir),
          col("o_custkey") === col("c_custkey"))
        .join(Tables.nation(spark, dir),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("n_name").as("nation"),
          expr("cast(cast(o_orderdate as timestamp) as long) div 86400")
            .as("day"),
          qdec(col("o_totalprice"), 18, 2).as("p"))
        .groupBy("nation", "day")
        .agg(sum(col("p")).as("rev"))
    }
}
