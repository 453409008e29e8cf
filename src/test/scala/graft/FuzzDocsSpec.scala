package graft

import org.scalatest.funsuite.AnyFunSuite

/** Differential fuzz gate, text-analysis arm: seeded adversarial
  * `documents` fixtures ([[FuzzDocsFixtures]] — empty corpora, empty
  * strings, one-token docs, identical docs, disjoint vocabularies,
  * repeated tokens, consecutive-space empty tokens, single-source
  * skew, one 4000-token doc) run engine-vs-DuckDB through
  * [[FuzzHarness]].
  *
  * 11 classes × 8 seeds = 88 fixtures × 6 families = 528 comparisons.
  * Core (every fixture): exact dedup, n-gram Jaccard near-dup (the
  * shingle pipeline end-to-end), MATTR (window longer than most docs).
  * Rotation: 16 corpus-statistics families chosen for empty-input,
  * log-0, and degenerate-vocabulary risk; strides (0, 5, 11) over 8
  * consecutive seeds sweep 19 consecutive rotation slots, so every
  * family meets every class at least once.
  */
class FuzzDocsSpec extends AnyFunSuite {

  private val core = Vector(
    "q23_exact_dedup",        // hash-group dedup (everything collapses)
    "q26_ngram_jaccard_dups", // shingle Jaccard (empty shingle sets)
    "q362_mattr_diversity")   // moving-average TTR (window 25 > doc len)
  private val rotation = Vector(
    "q20_token_stats",       // token counts (empty tokens counted?)
    "q21_quality_score",     // length/punct/stopword ratios (len 0)
    "q22_lang_id",           // n-gram heuristic on degenerate text
    "q24_simhash",           // 64-bit fingerprint (empty token set)
    "q27_minhash_lsh_dups",  // banded LSH (singleton buckets)
    "q69_repetition",        // repeated n-gram share (all-same tokens)
    "q84_token_chunks",      // fixed-size chunking (chunk > doc)
    "q89_normalize_text",    // normalization (spaces, case)
    "q95_vocab_spectrum",    // frequency-of-frequency (vocab size 1)
    "q224_heaps_vocab_growth", // Heaps law (single-doc corpus)
    "q312_good_turing",      // GT smoothing (all counts equal)
    "q331_unigram_xent",     // cross-entropy (log of 1/|V|=1)
    "q332_duplicate_ngram_mass", // dup 8-gram share (doc < 8 tokens)
    "q333_length_lognormal", // ln(n_chars) moments (n_chars = 0)
    "q344_stopword_discovery", // df ratios (every token in every doc)
    "q368_zipf_slope",       // ln-ln OLS (vocabulary of one type)
    "q376_dedup_ledger_compact") // cross-snapshot ledger (r16: empty
                             // snapshots, all-identical fps, NULL-free)

  test("engine matches DuckDB on 88 seeded adversarial document " +
    "fixtures across 20 query families") {
    FuzzHarness.sweep(GraftSpark.spark, "docs", FuzzDocsFixtures.Classes,
      seeds = 8, write = FuzzDocsFixtures.write,
      core = core, rotation = rotation, strides = Seq(0, 5, 11))
  }
}
