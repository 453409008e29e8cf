package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-iteration PageRank on a directed edge list — the canonical
  * iterative join-aggregate: each iteration is ONE shuffle round
  * (contributions grouped by destination) plus a left join back onto the
  * node set for teleport mass.
  *
  *   r₀(v)    = 1/N
  *   rₜ₊₁(v) = (1−d)/N + d · Σ_{(u,v)∈E} rₜ(u)/outdeg(u)
  *
  * No dangling-node redistribution: callers supply a graph where every
  * node has outdegree ≥ 1 (a symmetrized/undirected graph always does),
  * which keeps the recurrence a pure join-agg that a SQL oracle can
  * mirror iteration by iteration.
  *
  * Scale shape: the degree-annotated edge list is built once and
  * `localCheckpoint`ed (truncating lineage exactly like
  * [[graft.text.Dedup.connectedComponents]]), so each iteration reads a
  * materialized edge partition instead of re-scanning the source join;
  * the per-iteration rank frame is checkpointed too, bounding the plan at
  * O(1) depth regardless of iteration count. Contributions partial-
  * aggregate map-side before the dst shuffle. On a cluster, edges
  * pre-partitioned by `src` make the rank⋈edges join shuffle-free on the
  * edge side — only the (|V|-sized) rank frame moves per iteration.
  */
object PageRank {

  /** @param edges directed edges; first column = src, second = dst.
    * @param checkpointEvery truncate the rank lineage (eager
    *        localCheckpoint) every this many iterations — frequent enough
    *        to bound plan depth for long runs, rare enough that short runs
    *        (the common 3–5-iteration convergence check) pay zero extra
    *        materializations and execute as one fused DAG.
    * @return (node: String, r: Double) — unnormalized when the graph has
    *         dangling nodes (none when symmetrized). */
  def pageRank(edges: DataFrame, iters: Int, damping: Double,
               checkpointEvery: Int = 5): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val e = edges.toDF("src", "dst")
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    // One materialized (src, dst, deg) frame feeds every iteration.
    val ed = e.join(deg, "src").localCheckpoint()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct()
      .localCheckpoint()
    val n = nodes.count()
    // Empty graph: n = 0 feeds the teleport constant — Spark ANSI throws
    // DIVIDE_BY_ZERO at constant folding (before the zero-row frame could
    // make it moot) where the SQL oracle's per-row division simply never
    // evaluates; the Scala-side division is the same IEEE op on non-empty
    // graphs and inert (rank frame has no rows) on empty ones (fuzz gate,
    // empty_graph class).
    val teleport = lit(if (n == 0) 0.0 else (1.0 - damping) / n.toDouble)
    var rank = nodes.select(col("node"),
      lit(if (n == 0) 0.0 else 1.0 / n.toDouble).as("r"))
    for (i <- 1 to iters) {
      val contrib = ed.join(rank.withColumnRenamed("node", "src"), "src")
        .groupBy(col("dst").as("node"))
        .agg(sum(col("r") / col("deg")).as("s"))
      rank = nodes.join(contrib, Seq("node"), "left")
        .select(col("node"),
          (teleport + lit(damping) * coalesce(col("s"), lit(0.0))).as("r"))
      if (i % checkpointEvery == 0 && i < iters) rank = rank.localCheckpoint()
    }
    rank
  }

  /** Personalized PageRank: [[pageRank]] with the teleport mass
    * concentrated on a SEED set instead of spread uniformly — the
    * "similarity to this cohort" random walk behind who-to-follow,
    * related-item, and seed-expansion queries:
    *
    *   r₀(v)    = 1/|S| · [v ∈ S]
    *   rₜ₊₁(v) = (1−d)/|S| · [v ∈ S] + d · Σ_{(u,v)∈E} rₜ(u)/outdeg(u)
    *
    * Execution is iteration-for-iteration the [[pageRank]] shape (one
    * contribution shuffle + one left join per round over the
    * checkpointed degree-annotated edges); the only difference is the
    * teleport term joining against the broadcast seed flag instead of a
    * constant. Seeds outside the graph's node set are ignored (they can
    * neither receive nor emit mass).
    *
    * @param seeds one-column frame of seed node ids (deduplicated
    *              internally; typically ≪ |V|, broadcast). */
  def personalizedPageRank(edges: DataFrame, seeds: DataFrame, iters: Int,
                           damping: Double,
                           checkpointEvery: Int = 5): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val e = edges.toDF("src", "dst")
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    val ed = e.join(deg, "src").localCheckpoint()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct()
      .join(broadcast(seeds.toDF("node").distinct()
        .withColumn("__seed", lit(true))), Seq("node"), "left")
      .select(col("node"), coalesce(col("__seed"), lit(false)).as("is_seed"))
      .localCheckpoint()
    // Zero in-graph seeds (cohort exists but owns no edges, or the graph
    // itself is empty): the SQL oracle's CASE never evaluates its seed
    // branch, so every rank is plain 0.0 — the walk has no teleport mass
    // to inject. The old `require` threw here instead (fuzz gate,
    // empty_graph class); mirroring DuckDB means teleport 0 for all.
    val nSeeds = nodes.filter(col("is_seed")).count()
    val tele =
      if (nSeeds == 0) lit(0.0)
      else when(col("is_seed"), lit(1.0 / nSeeds.toDouble)).otherwise(lit(0.0))
    var rank = nodes.select(col("node"), col("is_seed"), tele.as("r"))
    for (i <- 1 to iters) {
      val contrib = ed.join(rank.select(col("node").as("src"), col("r")), "src")
        .groupBy(col("dst").as("node"))
        .agg(sum(col("r") / col("deg")).as("s"))
      rank = nodes.join(contrib, Seq("node"), "left")
        .select(col("node"), col("is_seed"),
          ((lit(1.0) - lit(damping)) * tele +
            lit(damping) * coalesce(col("s"), lit(0.0))).as("r"))
      if (i % checkpointEvery == 0 && i < iters) rank = rank.localCheckpoint()
    }
    rank.select(col("node"), col("is_seed"), col("r"))
  }

  /** Edge-WEIGHTED PageRank: [[pageRank]] with each node's rank mass
    * split across out-edges in proportion to edge weight instead of
    * uniformly — the multigraph semantics ("a supplier filling 100 of a
    * customer's orders matters 100× one filling 1"):
    *
    *   rₜ₊₁(v) = (1−d)/N + d · Σ_{(u,v,w)∈E} rₜ(u) · w / wdeg(u)
    *
    * Identical execution shape (degree-annotated checkpointed edges,
    * one contribution shuffle + one left join per iteration); weights
    * are INTEGERS (order counts) so `w / wdeg` is one double divide
    * both engines compute identically.
    *
    * @param edges (src, dst, w) with integer w ≥ 1; supply both
    *              directions for an undirected graph. */
  def weightedPageRank(edges: DataFrame, iters: Int, damping: Double,
                       checkpointEvery: Int = 5): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val e = edges.toDF("src", "dst", "w")
    val wdeg = e.groupBy("src").agg(sum("w").as("wdeg"))
    val ed = e.join(wdeg, "src").localCheckpoint()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct()
      .localCheckpoint()
    val n = nodes.count()
    // Same empty-graph guard as [[pageRank]]: ANSI constant folding must
    // not see a /0 the oracle never evaluates (fuzz gate, empty_graph).
    val teleport = lit(if (n == 0) 0.0 else (1.0 - damping) / n.toDouble)
    var rank = nodes.select(col("node"),
      lit(if (n == 0) 0.0 else 1.0 / n.toDouble).as("r"))
    for (i <- 1 to iters) {
      val contrib = ed.join(rank.withColumnRenamed("node", "src"), "src")
        .groupBy(col("dst").as("node"))
        .agg(sum(col("r") * col("w") / col("wdeg")).as("s"))
      rank = nodes.join(contrib, Seq("node"), "left")
        .select(col("node"),
          (teleport + lit(damping) * coalesce(col("s"), lit(0.0))).as("r"))
      if (i % checkpointEvery == 0 && i < iters) rank = rank.localCheckpoint()
    }
    rank
  }
}
