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
      // no-extra-exchange in-place aggregate. The edge SET is identical
      // under any partitioning.
      //
      // r17 (VERDICT r16 #1): the explode destroys the (c,s) hash
      // partitioning (src/dst are new attributes), so the r16 cached
      // frame had 32 OPAQUE partitions — every consumer re-shuffled it,
      // and the driver measured q208 2× slower. One extra src-keyed
      // exchange before the persist (guide §2.4 "two operations keyed
      // the same way can share one exchange") gives the cached frame a
      // partitioning every consumer's first hot exchange already wants:
      // q208's groupBy(c=src), q49/q200/q215-family degree aggs and
      // rank⋈edges joins, q246's degree agg, KCore/Bfs's own
      // repartition(p, src). Probe-paired (OptProbe `copq`, 2 rounds ×
      // 3 layouts): q208 body 2.1 s keyed vs 4.1–5.9 s opaque-32 vs
      // 3.4–3.5 s r15-coalesced; pageRank/LPA at-or-better. Keyed by
      // COLUMN (not numPartitions): REPARTITION_BY_COL stays
      // AQE-coalescible on a cluster, and HashPartitioning(src, n)
      // satisfies the consumers' ClusteredDistribution for any n.
      // The li⋈o join inputs are user-repartitioned on the join key
      // (r17, same fix as q215's wpair build): the join shuffles by
      // orderkey either way, and keying the exchange ourselves stops
      // AQE's input-sized coalescing from running the join + the
      // distinct's map-side partial on 1–2 partitions.
      val p = spark.sparkContext.defaultParallelism
      val li = Tables.lineitem(spark, dir).select("l_orderkey", "l_suppkey")
        .repartition(p, col("l_orderkey"))
      val o = Tables.orders(spark, dir).select("o_orderkey", "o_custkey")
        .repartition(p, col("o_orderkey"))
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .select(concat(lit("c"), col("o_custkey")).as("c"),
          concat(lit("s"), col("l_suppkey")).as("s"))
        .repartition(p, col("c"), col("s"))
        .distinct()
        .select(explode(array(
          struct(col("c").as("src"), col("s").as("dst")),
          struct(col("s").as("src"), col("c").as("dst")))).as("e"))
        .select("e.src", "e.dst")
        .repartition(col("src"))
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
