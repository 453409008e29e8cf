package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded multi-source breadth-first search — min-hop distance from a
  * seed set over a directed edge list, the frontier-expansion primitive
  * behind "blast radius" / influence-reach questions ("every customer
  * within k purchase-hops of this supplier cohort").
  *
  * Pregel-style data-parallel BFS: per hop, ONE equi-join of the
  * current frontier against the edge list plus ONE left-anti join
  * against the visited set — no per-path enumeration (a recursive
  * path-walk explodes combinatorially on dense bipartite graphs; the
  * frontier formulation is |reachable-nodes|-bounded regardless of path
  * multiplicity). Each frontier is `localCheckpoint`ed so the plan stays
  * flat across iterations (the [[PageRank]] discipline). On a cluster,
  * edges pre-partitioned by `src` make every hop's expansion join
  * shuffle-free on the edge side; the visited set stays a compact
  * node-id frame (broadcastable for seed-local neighborhoods, shuffled
  * hash anti-join once it outgrows the driver).
  */
object Bfs {

  /** Min-hop label per reachable node: (node, hop), hop ∈ [0, maxHops],
    * seeds at hop 0. Nodes not reached within `maxHops` are absent —
    * anti-join the node universe against this output to count them.
    *
    * @param edges directed edges; first column = src, second = dst
    *        (symmetrize before calling for undirected semantics).
    * @param seeds one column of seed node ids (deduped here). */
  def hops(edges: DataFrame, seeds: DataFrame, maxHops: Int): DataFrame = {
    // Materialize the edge list once — every hop joins against it, and
    // without the checkpoint each hop would re-run the upstream
    // edge-building lineage (scan + join + distinct) from scratch.
    // Pre-partitioned by the per-hop join key (r16, guide §2.4):
    // localCheckpoint preserves the partitioning, so each hop's
    // expansion join reuses it instead of re-shuffling the edge list
    // from the shared cache's (AQE-coalesced, 1–2-partition) layout.
    // Frontier/visited math is set-membership — order-free.
    val p = edges.sparkSession.sparkContext.defaultParallelism
    val e = edges.toDF("src", "dst").repartition(p, col("src"))
      .localCheckpoint()
    var frontier = seeds.toDF("node").distinct().localCheckpoint()
    // `visited` stays a LAZY union of the (already-checkpointed,
    // node-sized) frontiers (r16, guide §2.4): checkpointing it per hop
    // paid one extra materialization job per round for a frame whose
    // every constituent is materialized anyway; the union's plan depth
    // is maxHops-bounded by construction.
    var visited = frontier
    var out = frontier.withColumn("hop", lit(0))
    var h = 1
    while (h <= maxHops && !frontier.isEmpty) {
      frontier = e.join(frontier, e("src") === frontier("node"))
        .select(col("dst").as("node")).distinct()
        .join(visited, Seq("node"), "left_anti")
        .localCheckpoint()
      out = out.union(frontier.withColumn("hop", lit(h)))
      visited = visited.union(frontier)
      h += 1
    }
    out
  }
}
