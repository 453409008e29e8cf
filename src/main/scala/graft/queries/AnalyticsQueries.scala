package graft.queries

import graft.graph.PageRank
import graft.io.Tables
import graft.ops.{Cohort, Merge, Profile}
import graft.sketch.CountMin
import graft.text.Fuzzy

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Warehouse-analytics surface added in round 6: cohort retention, blocked
  * fuzzy (edit-distance) matching, count-min-sketch frequency estimation,
  * fixed-iteration PageRank, and CDC merge/upsert. Every query is
  * oracle-gated; determinism follows the repo rules (integer time
  * arithmetic, engine-shared md5 hashing, 6-decimal rounding only where a
  * distributed double sum is inherent — q49's rank).
  */
object AnalyticsQueries {
  type Q = (SparkSession, String) => DataFrame

  private val H = "9223372036854775807"

  /** q46 — weekly cohort retention triangle over events (see
    * [[graft.ops.Cohort.retention]] for the shuffle budget). */
  val q46: Q = (spark, dir) =>
    Cohort.retention(Tables.events(spark, dir), "user_id", "ts")
      .orderBy("cohort_week", "week_offset")

  /** q47 — blocked fuzzy name matching over the part vocabulary (see
    * [[graft.text.Fuzzy.nearNamePairs]]): the quadratic lives on the
    * 64-name vocabulary, never on rows. */
  val q47: Q = (spark, dir) =>
    Fuzzy.nearNamePairs(Tables.part(spark, dir), "p_name", maxDist = 2)
      .withColumn("dist", col("dist").cast("long"))
      .orderBy("name_a", "name_b")

  /** q48 — count-min sketch (depth 4 × width 256) frequency estimates for
    * part keys in lineitem, top-25 by estimate. The md5-keyed hashing
    * makes the sketch bit-identical cross-engine, so the gate checks the
    * OVER-count guarantee exactly (est ≥ true, equal without collisions).
    */
  val q48: Q = (spark, dir) =>
    CountMin.estimates(Tables.lineitem(spark, dir), col("l_partkey"),
        depth = 4, width = 256)
      .select(col("k").cast("long").as("part_key"),
        col("c").as("true_count"), col("est").as("est_count"))
      .orderBy(desc("est_count"), col("part_key"))
      .limit(25)

  /** q49 — 3-iteration PageRank (d = 0.85) on the symmetrized
    * customer–supplier co-purchase graph from orders ⋈ lineitem (see
    * [[graft.graph.PageRank.pageRank]]: one shuffle round per iteration,
    * checkpointed edges). Ranks rounded to 6 decimals — the distributed
    * double sum's last ulp is summation-order-dependent (determinism
    * rule #3). */
  val q49: Q = (spark, dir) => {
    val li = Tables.lineitem(spark, dir).select("l_orderkey", "l_suppkey")
    val o = Tables.orders(spark, dir).select("o_orderkey", "o_custkey")
    val pair = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .select(concat(lit("c"), col("o_custkey")).as("src"),
        concat(lit("s"), col("l_suppkey")).as("dst"))
      .distinct()
    val edges = pair.union(pair.select(col("dst").as("src"),
      col("src").as("dst")))
    PageRank.pageRank(edges, iters = 3, damping = 0.85)
      .select(col("node"), round(col("r"), 6).as("rank"))
      .orderBy("node")
  }

  /** q100 — CDC merge/upsert of a deterministic update batch into the
    * customer table (see [[graft.ops.Merge.mergeUpsert]]): one full-outer
    * join on the unique key, output = next table version + change audit.
    * The batch bumps acctbal for custkey%10 rows, carries custkey%3 rows
    * unchanged, and inserts custkey%97 clones shifted by 1,000,000 (no
    * key collision at fixture scales). */
  val q100: Q = (spark, dir) => {
    val cols = Seq("c_custkey", "c_name", "c_acctbal", "c_mktsegment")
    val cust = Tables.customer(spark, dir).select(cols.map(col): _*)
    val mod = cust
      .filter(col("c_custkey") % 3 === 0 || col("c_custkey") % 10 === 0)
      .withColumn("c_acctbal",
        when(col("c_custkey") % 10 === 0, col("c_acctbal") + 100.0)
          .otherwise(col("c_acctbal")))
    val ins = cust.filter(col("c_custkey") % 97 === 0)
      .select((col("c_custkey") + 1000000L).as("c_custkey"),
        concat(lit("new:"), col("c_name")).as("c_name"),
        col("c_acctbal"), col("c_mktsegment"))
    Merge.mergeUpsert(cust, mod.unionByName(ins), "c_custkey",
        Seq("c_name", "c_acctbal", "c_mktsegment"))
      .orderBy("c_custkey")
  }

  /** q101 — one-pass column profiling of the customer table (see
    * [[graft.ops.Profile.profile]]): all five columns' stats from one
    * scan + one Expand-planned aggregate. `c_acctbal` is pre-cast to
    * DECIMAL(18,2) in BOTH engines so its min/max stringify identically
    * (raw double→string formatting differs cross-engine). */
  val q101: Q = (spark, dir) =>
    Profile.profile(
      Tables.customer(spark, dir).withColumn("c_acctbal",
        col("c_acctbal").cast(org.apache.spark.sql.types.DecimalType(18, 2))),
      Seq("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"))
      .orderBy("col_name")

  val queries: Map[String, Q] = Map(
    "q46_cohort_retention" -> q46,
    "q47_fuzzy_names" -> q47,
    "q48_heavy_hitters" -> q48,
    "q49_pagerank" -> q49,
    "q100_merge_upsert" -> q100,
    "q101_column_profile" -> q101)

  /** One PageRank oracle iteration: rank_{cur}(v) = (1-d)/N + d·Σ r/deg
    * over in-edges — the same join-agg the engine runs. */
  private def prIter(prev: String, cur: String): String =
    s"""$cur AS (
       |  SELECT n.node,
       |    (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / nn.n
       |      + CAST(0.85 AS DOUBLE) * coalesce(c.s, CAST(0 AS DOUBLE)) AS r
       |  FROM nodes n CROSS JOIN ncount nn
       |  LEFT JOIN (
       |    SELECT e.dst AS node, sum(p.r / e.deg) AS s
       |    FROM ed e JOIN $prev p ON p.node = e.src
       |    GROUP BY e.dst) c ON c.node = n.node)""".stripMargin

  /** q101 oracle: the same single-aggregate + melt, written as one stats
    * CTE and a UNION ALL stanza per column (generated — 5 identical
    * shapes). */
  private val profCols =
    Seq("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
  private def profOracle: String = {
    val measures = profCols.zipWithIndex.map { case (c, i) =>
      s"CAST(count($c) AS BIGINT) AS nn$i, " +
        s"CAST(count(DISTINCT $c) AS BIGINT) AS nd$i,\n  " +
        s"CAST(min($c) AS VARCHAR) AS mn$i, CAST(max($c) AS VARCHAR) AS mx$i"
    }.mkString(",\n  ")
    val rows = profCols.zipWithIndex.map { case (c, i) =>
      s"SELECT '$c' AS col_name, n_rows, n_rows - nn$i AS n_nulls, " +
        s"nd$i AS n_distinct, mn$i AS min_s, mx$i AS max_s FROM s"
    }.mkString("\nUNION ALL\n")
    s"""WITH c2 AS (SELECT c_custkey, c_name, c_nationkey,
       |  CAST(c_acctbal AS DECIMAL(18,2)) AS c_acctbal, c_mktsegment
       |  FROM customer),
       |s AS (SELECT CAST(count(*) AS BIGINT) AS n_rows,
       |  $measures
       |FROM c2)
       |$rows
       |ORDER BY col_name""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "q101_column_profile" -> profOracle,
    "q46_cohort_retention" ->
      """WITH d AS (
        |  SELECT user_id, epoch_ns(ts) // 86400000000000 AS day FROM events),
        |f AS (SELECT user_id, MIN(day) AS first_day FROM d GROUP BY 1)
        |SELECT f.first_day // 7 AS cohort_week,
        |       (d.day - f.first_day) // 7 AS week_offset,
        |       count(DISTINCT d.user_id) AS active_users
        |FROM d JOIN f ON d.user_id = f.user_id
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q47_fuzzy_names" ->
      s"""WITH names AS (
         |  SELECT p_name AS name, CAST(count(*) AS BIGINT) AS n_rows,
         |         regexp_extract(p_name, '(\\S+)$$', 1) AS blk
         |  FROM part GROUP BY 1)
         |SELECT a.name AS name_a, b.name AS name_b,
         |       CAST(levenshtein(a.name, b.name) AS BIGINT) AS dist,
         |       a.n_rows AS n_rows_a, b.n_rows AS n_rows_b
         |FROM names a JOIN names b
         |  ON a.blk = b.blk AND a.name < b.name
         |WHERE levenshtein(a.name, b.name) BETWEEN 1 AND 2
         |ORDER BY 1, 2""".stripMargin,
    "q48_heavy_hitters" ->
      s"""WITH counts AS (
         |  SELECT l_partkey::VARCHAR AS k, CAST(count(*) AS BIGINT) AS c
         |  FROM lineitem GROUP BY 1),
         |keyed AS (
         |  SELECT k, c, r,
         |    ((md5_number_lower(r::VARCHAR || ':' || k) & $H)::BIGINT % 256) AS b
         |  FROM counts CROSS JOIN generate_series(0, 3) g(r)),
         |cells AS (SELECT r, b, CAST(sum(c) AS BIGINT) AS cell
         |          FROM keyed GROUP BY 1, 2)
         |SELECT k::BIGINT AS part_key, c AS true_count,
         |       CAST(min(cell) AS BIGINT) AS est_count
         |FROM keyed JOIN cells USING (r, b)
         |GROUP BY 1, 2
         |ORDER BY est_count DESC, part_key LIMIT 25""".stripMargin,
    "q49_pagerank" ->
      s"""WITH pair AS (
         |  SELECT DISTINCT 'c' || o_custkey AS src, 's' || l_suppkey AS dst
         |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
         |edges AS (SELECT src, dst FROM pair
         |          UNION ALL SELECT dst, src FROM pair),
         |deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg
         |        FROM edges GROUP BY 1),
         |ed AS (SELECT e.src, e.dst, d.deg FROM edges e
         |       JOIN deg d ON d.src = e.src),
         |nodes AS (SELECT DISTINCT src AS node FROM edges),
         |ncount AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
         |r0 AS (SELECT node, CAST(1.0 AS DOUBLE) / nn.n AS r
         |       FROM nodes CROSS JOIN ncount nn),
         |${prIter("r0", "r1")},
         |${prIter("r1", "r2")},
         |${prIter("r2", "r3")}
         |SELECT node, ROUND(r, 6) AS rank FROM r3 ORDER BY node""".stripMargin,
    "q100_merge_upsert" ->
      """WITH upd AS (
        |  SELECT c_custkey, c_name,
        |         CASE WHEN c_custkey % 10 = 0 THEN c_acctbal + 100.0
        |              ELSE c_acctbal END AS c_acctbal,
        |         c_mktsegment
        |  FROM customer WHERE c_custkey % 3 = 0 OR c_custkey % 10 = 0
        |  UNION ALL
        |  SELECT c_custkey + 1000000, 'new:' || c_name, c_acctbal,
        |         c_mktsegment
        |  FROM customer WHERE c_custkey % 97 = 0)
        |SELECT coalesce(u.c_custkey, b.c_custkey) AS c_custkey,
        |       CASE WHEN u.c_custkey IS NOT NULL THEN u.c_name
        |            ELSE b.c_name END AS c_name,
        |       CASE WHEN u.c_custkey IS NOT NULL THEN u.c_acctbal
        |            ELSE b.c_acctbal END AS c_acctbal,
        |       CASE WHEN u.c_custkey IS NOT NULL THEN u.c_mktsegment
        |            ELSE b.c_mktsegment END AS c_mktsegment,
        |       CASE WHEN b.c_custkey IS NULL THEN 'insert'
        |            WHEN u.c_custkey IS NULL THEN 'retain'
        |            WHEN b.c_name IS DISTINCT FROM u.c_name
        |              OR b.c_acctbal IS DISTINCT FROM u.c_acctbal
        |              OR b.c_mktsegment IS DISTINCT FROM u.c_mktsegment
        |              THEN 'update'
        |            ELSE 'unchanged' END AS action
        |FROM customer b FULL OUTER JOIN upd u ON b.c_custkey = u.c_custkey
        |ORDER BY 1""".stripMargin)
}
