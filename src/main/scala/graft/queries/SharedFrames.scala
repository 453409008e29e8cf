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
  /** Symmetrized customer–supplier co-purchase edge list
    * (`'c'<custkey> ↔ 's'<suppkey>` for every distinct order pairing):
    * the shared graph under q49 (PageRank), q200 (personalized PR),
    * q159 (BFS reach), q175 (k-core) — four iterative queries that
    * each used to rebuild the same lineitem⋈orders distinct. One
    * build + persist per session; iterative consumers still
    * `localCheckpoint` their own degree-annotated variants. */
  def coPurchaseEdges(spark: SparkSession, dir: String): DataFrame =
    graft.util.SessionMemo.cached(spark, s"co-purchase-edges:$dir") {
      val li = Tables.lineitem(spark, dir).select("l_orderkey", "l_suppkey")
      val o = Tables.orders(spark, dir).select("o_orderkey", "o_custkey")
      val pair = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .select(concat(lit("c"), col("o_custkey")).as("src"),
          concat(lit("s"), col("l_suppkey")).as("dst"))
        .distinct()
      pair.union(pair.select(col("dst").as("src"), col("src").as("dst")))
    }

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
