package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bounded k-core peeling — "who remains after iteratively dropping
  * weakly-connected nodes": each round removes every node whose CURRENT
  * degree is below k, degrees recompute, repeat. The density-core
  * extractor behind community mining and spam/bot filtering.
  *
  * Execution: per round, ONE grouped count over the live edge list and
  * TWO anti-joins (src side, dst side) against the removed-node frame —
  * the [[Bfs]] shape, `localCheckpoint`ed per round so the plan stays
  * flat. Rounds are explicitly bounded (the caller states R); a full
  * decomposition iterates to fixpoint the same way — bounded rounds keep
  * the audit oracle expressible as unrolled SQL. Edges must be
  * SYMMETRIZED distinct pairs, so degree = distinct-neighbor count.
  */
object KCore {

  /** Peel `rounds` times at threshold `k`: rows
    * (peel_round ∈ [1..rounds] → nodes removed that round) plus
    * (peel_round 0 → surviving core size). */
  def peelCounts(spark: SparkSession, edges: DataFrame, k: Int,
                 rounds: Int): DataFrame = {
    // The live graph stays LAZY (r16, guide §2.4): removal is cumulative
    // — an edge is live in round r iff neither endpoint was removed in
    // ANY earlier round — so each round re-derives the live view as two
    // anti-joins of the ONE materialized edge list against the
    // accumulated removed-node frame, instead of checkpointing the full
    // |E|-sized graph every round (the old shape paid an extra edge-set
    // materialization job per round; the removed frames are node-sized
    // and already materialized by the count the peel decision needs).
    // Plan depth stays bounded: `rounds` is caller-bounded and each
    // round adds one broadcast-sized anti-join pair over the
    // checkpointed base.
    // Pre-partitioned by src (r16, guide §2.4): the per-round degree
    // aggregate groups by src, so the checkpointed layout serves every
    // round's grouping without a fresh exchange (localCheckpoint
    // preserves partitioning); counts are integers — order-free.
    val p = edges.sparkSession.sparkContext.defaultParallelism
    val e = edges.toDF("src", "dst").repartition(p, col("src"))
      .localCheckpoint()
    val counts = scala.collection.mutable.ArrayBuffer.empty[(Int, Long)]
    var removed: Option[DataFrame] = None
    def live: DataFrame = removed match {
      case None => e
      case Some(rm) =>
        e.join(rm, e("src") === rm("node"), "left_anti")
          .join(rm, e("dst") === rm("node"), "left_anti")
    }
    var r = 1
    while (r <= rounds) {
      val low = live.groupBy("src").agg(count(lit(1)).as("d"))
        .filter(col("d") < k).select(col("src").as("node"))
        .localCheckpoint()
      counts += ((r, low.count()))
      removed = Some(removed.map(_.union(low)).getOrElse(low))
      r += 1
    }
    counts += ((0, live.select("src").distinct().count()))
    import spark.implicits._
    counts.toSeq.toDF("peel_round", "n_nodes")
  }
}
