package graft

import org.scalatest.funsuite.AnyFunSuite

/** Differential fuzz gate, iterative-graph arm (VERDICT r13 item 1):
  * seeded adversarial graph fixtures ([[FuzzGraphFixtures]] — empty
  * edge sets, single edges, disconnected bicliques, star hubs at/past
  * the q208 hub cap and part baskets at/past the basket cap, a pure
  * cycle, isolated seed cohorts, duplicate multigraph edges, absorbing
  * chain states) run engine-vs-DuckDB through [[FuzzHarness]].
  *
  * 10 classes × 8 seeds = 80 fixtures × 6 families = 480 comparisons.
  * Core (every fixture): PageRank (the family's root recurrence — the
  * other iterative walks share its join-agg skeleton), assortativity
  * (zero-variance divide on constant-degree graphs), and LPA (the
  * deterministic tie-vote the oracle replays round-for-round — the
  * highest oracle-mirroring risk). Rotation: the remaining 8 graph
  * families; strides (0, 3, 6) over 8 consecutive seeds sweep 14
  * consecutive rotation slots, so every family meets every class at
  * least once (8 seeds alone already cover the 8-slot rotation).
  */
class FuzzGraphSpec extends AnyFunSuite {

  private val core = Vector(
    "q49_pagerank",       // the root join-agg recurrence (empty/leaf mass)
    "q246_assortativity", // m·sxx − sx² = 0 on constant degrees
    "q217_lpa_communities") // synchronous tie-vote replay
  private val rotation = Vector(
    "q104_triangle_counts",      // degree orientation (cap-sized cliques)
    "q341_local_clustering",     // deg<2 guard, triangle-free graphs
    "q208_adamic_adar",          // hub cap boundary, ln(deg) weights
    "q200_personalized_pagerank",// out-of-graph seed cohorts
    "q159_bfs_reach",            // empty frontier, unreached counting
    "q175_kcore_peel",           // full-graph peel, empty survivor core
    "q215_weighted_pagerank",    // multigraph weights vs distinct edges
    "q367_markov_stationary")    // periodic/reducible/absorbing chains

  test("engine matches DuckDB on 80 seeded adversarial graph fixtures " +
    "across 11 query families") {
    FuzzHarness.sweep(GraftSpark.spark, "graph",
      FuzzGraphFixtures.Classes, seeds = 8,
      write = FuzzGraphFixtures.write,
      core = core, rotation = rotation, strides = Seq(0, 3, 6))
  }
}
