package graft

import org.scalatest.funsuite.AnyFunSuite

/** Differential fuzz for the DOCUMENT-stream queries — the two
  * registered streaming queries every other arm skips: the events-based
  * batching sweeps carry no documents table, and the batch docs arm
  * (FuzzDocsSpec) never drives the streaming path. q99 (incremental
  * LSH near-dup flagging of newly-ingested docs against the static
  * index) and q169 (stream-static Naive Bayes serving) replay the same
  * seeded adversarial corpora ([[FuzzDocsFixtures]]) through their real
  * file-stream staging, engine-vs-DuckDB.
  *
  * What the classes concentrate for THESE two: an empty corpus (zero
  * micro-batch rows on the stream side, an empty LSH index / NB train
  * split on the static side), single-doc and identical-doc corpora
  * (every band collides / one-class NB), disjoint vocabularies (no
  * token of a streamed doc exists in the NB likelihood table — the
  * unseen-token smoothing path), and empty-string/multi-space docs
  * (empty shingle and token sets inside a micro-batch).
  *
  * 11 classes × 2 seeds = 22 fixtures × 2 families = 44 comparisons
  * (streaming runs cost ~5-10 s each; the data-variety depth lives in
  * the 8-seed batch docs arm — this arm pins the STREAM drive of the
  * same operators).
  */
class FuzzDocsStreamSpec extends AnyFunSuite {

  test("document-stream queries match DuckDB on 22 seeded adversarial " +
    "corpora (44 comparisons)") {
    FuzzHarness.sweep(GraftSpark.spark, "docstream",
      FuzzDocsFixtures.Classes, seeds = 2,
      write = FuzzDocsFixtures.write,
      core = Vector("q99_stream_neardup", "q169_stream_classify"),
      rotation = Vector(), strides = Seq())
  }
}
