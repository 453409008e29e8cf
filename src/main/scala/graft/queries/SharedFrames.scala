package graft.queries

import graft.io.Tables
import graft.functions.GraftFunctions.qdec

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Aggregate frames shared by several registered queries, memoized per
  * (session, sfDir) and persisted at MEMORY_AND_DISK like the other hot
  * intermediates ([[graft.util.SessionMemo.cached]]). The point is scan
  * economy: three time-series queries (q106 gap fill, q121 moving stats,
  * q127 EWMA) consume the SAME (nation, day) daily-revenue aggregate —
  * built once, the orders⋈customer⋈nation join and its fact scan run
  * once per session instead of once per query. */
object SharedFrames {

  /** Symmetrized customer–supplier co-purchase edge list
    * (`'c'<custkey> ↔ 's'<suppkey>` for every distinct order pairing):
    * the shared graph under q49 (PageRank), q200 (personalized PR),
    * q159 (BFS reach), q175 (k-core) — four iterative queries that
    * each used to rebuild the same lineitem⋈orders distinct. One
    * build + persist per session; iterative consumers still
    * `localCheckpoint` their own degree-annotated variants.
    * Symmetrization is an in-row explode AFTER the distinct, not a
    * self-union: union branches do not share work, so the union form
    * ran the distinct's reduce-side aggregation twice during the one
    * persisted build (ReuseExchange dedupes only the exchange). The
    * 'c'/'s' prefixes make the reversed edges disjoint from the forward
    * ones, so the exploded set is already distinct. */
  def coPurchaseEdges(spark: SparkSession, dir: String): DataFrame =
    graft.util.SessionMemo.cached(spark, s"co-purchase-edges:$dir") {
      // Spread the build past AQE's input-sized coalescing (r16): both
      // inputs are single-file scans and the distinct's exchange
      // coalesces to 1–2 partitions, so the dedup, the explode AND the
      // persist write of the edge set ran near-single-task (measured:
      // the build is the single biggest charge on q159, its first
      // consumer). An explicit repartition on the distinct key feeds a
      // no-extra-exchange in-place aggregate and leaves the CACHED
      // frame at the session's parallelism, so every consumer's first
      // stage over it is parallel too. The edge SET is identical under
      // any partitioning.
      val p = spark.sparkContext.defaultParallelism
      val li = Tables.lineitem(spark, dir).select("l_orderkey", "l_suppkey")
      val o = Tables.orders(spark, dir).select("o_orderkey", "o_custkey")
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .select(concat(lit("c"), col("o_custkey")).as("c"),
          concat(lit("s"), col("l_suppkey")).as("s"))
        .repartition(p, col("c"), col("s"))
        .distinct()
        .select(explode(array(
          struct(col("c").as("src"), col("s").as("dst")),
          struct(col("s").as("src"), col("c").as("dst")))).as("e"))
        .select("e.src", "e.dst")
    }

  /** Daily revenue per nation: (nation, day, rev DECIMAL(18,2)-summed).
    * `day` is the integer epoch-day via the timezone-independent
    * `unix_date` (the earlier date→timestamp→long cast interpreted
    * midnight in the SESSION timezone — identical under the engine's
    * pinned UTC, but a consumer session that forgot the pin would
    * silently shift day boundaries for all 15+ consumers); `rev` stays
    * decimal so consumers choose where to cast (window sums stay
    * exact). The frame is calendar-bounded (nations × span days), so
    * persisting it costs ~60k rows at ANY scale factor. */
  def dailyNationRevenue(spark: SparkSession, dir: String): DataFrame =
    graft.util.SessionMemo.cached(spark, s"daily-nation-rev:$dir") {
      Tables.orders(spark, dir)
        .join(Tables.customer(spark, dir),
          col("o_custkey") === col("c_custkey"))
        .join(Tables.nation(spark, dir),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("n_name").as("nation"),
          expr("cast(unix_date(cast(o_orderdate as date)) as long)")
            .as("day"),
          qdec(col("o_totalprice"), 18, 2).as("p"))
        .groupBy("nation", "day")
        .agg(sum(col("p")).as("rev"))
    }
}
