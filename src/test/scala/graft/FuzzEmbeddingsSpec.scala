package graft

import org.scalatest.funsuite.AnyFunSuite

/** Differential fuzz gate, vector-search arm: seeded adversarial
  * `embeddings` fixtures ([[FuzzEmbeddingsFixtures]] — all-zero
  * vectors, byte-identical vectors, a constant dimension, single-member
  * and single-class labels, orthogonal axis vectors, empty/one/two-row
  * corpora) run engine-vs-DuckDB through [[FuzzHarness]].
  *
  * 10 classes × 8 seeds = 80 fixtures × 6 families = 480 comparisons.
  * Core (every fixture): brute-force cosine top-k (the ANN baseline —
  * zero norms put an x/0 in every similarity), unit normalization, and
  * label silhouette (singleton clusters make the within-cluster mean
  * undefined). Rotation: 13 vector families chosen for norm-0,
  * zero-variance, and tie-ordering risk; strides (0, 4, 9) over 8
  * consecutive seeds sweep 17 consecutive rotation slots, so every
  * family meets every class at least once.
  */
class FuzzEmbeddingsSpec extends AnyFunSuite {

  private val core = Vector(
    "q30_knn_bruteforce",     // cosine top-k (norm 0 ⇒ x/0; all-ties rank)
    "q38_embedding_normalize",// v/‖v‖ (zero vector)
    "q245_label_silhouette")  // (b−a)/max(a,b) (singleton/single cluster)
  private val rotation = Vector(
    "q31_vector_norms",       // L1/L2/L∞ profile (zero/axis vectors)
    "q32_ann_lsh",            // hyperplane LSH (all-equal signs bucket)
    "q36_embedding_neardup",  // cosine near-dup pairs (identical corpus)
    "q110_random_projection", // JL projection (zero input)
    "q172_dim_standardize",   // per-dim z-score (constant dim ⇒ σ = 0)
    "q192_ann_ivf_fixed",     // fixed-quantizer IVF (empty cells)
    "q201_triplet_mining",    // anchor/pos/neg (single-label corpus)
    "q209_centroid_monitor",  // per-label centroid drift (one member)
    "q216_semantic_dedup",    // cosine dedup survivors (all duplicates)
    "q244_knn_loo_accuracy",  // leave-one-out kNN vote (ties, n=1)
    "q261_pq_audit",          // product-quantization error (zero vecs)
    "q347_label_centroids",   // centroid table (singleton labels)
    "q351_ivf_nprobe_sweep",  // nprobe recall curve (degenerate cells)
    "q377_ivf_incremental")   // append-path audit (r16: empty base/delta,
                              // single-vector snapshots)

  test("engine matches DuckDB on 80 seeded adversarial embedding " +
    "fixtures across 17 query families") {
    FuzzHarness.sweep(GraftSpark.spark, "embeddings",
      FuzzEmbeddingsFixtures.Classes, seeds = 8,
      write = FuzzEmbeddingsFixtures.write,
      core = core, rotation = rotation, strides = Seq(0, 4, 9))
  }
}
