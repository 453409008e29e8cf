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
    var g = edges.toDF("src", "dst").localCheckpoint()
    val counts = scala.collection.mutable.ArrayBuffer.empty[(Int, Long)]
    var r = 1
    while (r <= rounds) {
      val low = g.groupBy("src").agg(count(lit(1)).as("d"))
        .filter(col("d") < k).select(col("src").as("node"))
        .localCheckpoint()
      counts += ((r, low.count()))
      g = g.join(low, g("src") === low("node"), "left_anti")
        .join(low, g("dst") === low("node"), "left_anti")
        .localCheckpoint()
      r += 1
    }
    counts += ((0, g.select("src").distinct().count()))
    import spark.implicits._
    counts.toSeq.toDF("peel_round", "n_nodes")
  }
}
