package graft

import org.scalatest.funsuite.AnyFunSuite

/** Differential fuzz gate, media/multimodal arm — arm 10 (VERDICT r15
  * item 2): the whole media family is oracle-gated, so unlike the
  * seeded-ML arm this one is a pure engine-vs-DuckDB sweep, no
  * invariant tier. 12 classes × 2 seeds = 24 fixtures × (3 core + 3
  * rotation picks) = 144 comparisons. Two seeds, not three: this arm's
  * coverage dimension is the CLASS list (payload shapes, NULL linkage,
  * modality mixes — all deterministic corner geometry), not sampling
  * breadth, and the suite-time budget (VERDICT r15 #7) is already paying
  * for nine arms.
  *
  * Core = the three `mapPartitions`-typed paths (q60 featurize, q67
  * frame sampling, q325 linkage join) — the seam a real decoder rides
  * on, and where the arm's first sweep found the NULL-payload NPE class
  * (every Media function crashed on a NULL content cell; fixed with
  * DuckDB-probed mirror semantics, see [[graft.multimodal.Media]]).
  * Rotation = the derived pipelines (resample, both perceptual-hash
  * dedups, data card, cross-modal near-dup, mix audit, agreement).
  */
class FuzzMediaSpec extends AnyFunSuite {

  private val core = Vector(
    "q60_media_features",         // typed featurize (NULL payloads, dup ids)
    "q67_media_frames",           // frame windows at boundary lengths
    "q325_caption_embedding_link") // linkage under one-sided NULL/missing

  private val rotation = Vector(
    "q68_media_resample",     // 128-boundary stride arithmetic
    "q195_media_phash_dedup", // whole-payload dHash banding (phash-0 pileups)
    "q324_media_datacard",    // NULL-fp distinct counting, all-NULL sums
    "q326_crossmodal_neardup", // NULL vectors, single-modality corpora
    "q327_frame_phash_dedup", // per-frame banding, shared-prefix re-edits
    "q328_modality_source_mix", // NULL source/byte groups, share-of-NULL
    "q329_crossmodal_agreement") // LSH text pairs × NULL embedding joins

  test("engine matches DuckDB on 24 seeded degenerate media fixtures " +
    "across the multimodal family (144 comparisons)") {
    FuzzHarness.sweep(GraftSpark.spark, "media",
      FuzzMediaFixtures.Classes, seeds = 2,
      write = FuzzMediaFixtures.write,
      core = core, rotation = rotation, strides = Seq(0, 2, 4))
  }
}
