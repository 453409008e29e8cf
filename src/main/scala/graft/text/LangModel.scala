package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions.{qdec, qround}

/** Corpus-statistics language modelling for training-data curation: a
  * bigram maximum-likelihood model fitted on the corpus itself, used to
  * score each document's average token log-likelihood — the
  * perplexity-proxy quality filter (documents whose token transitions are
  * improbable under the corpus distribution score low: boilerplate,
  * shredded text, wrong-language residue). Companion of the heuristic
  * quality scores (q21) and repetition ratio (q69); this one is
  * DISTRIBUTION-based, so it adapts to the corpus instead of fixed rules.
  *
  * Shapes that matter at 100 TB:
  *  - bigrams are manufactured per-row from the token array (slice+zip —
  *    no window, no shuffle) and only then exploded;
  *  - the model (bigram → conditional log-prob) is vocabulary-sized, built
  *    with two map-side-combined aggregates; the fact-side scoring join
  *    shuffles doc-bigrams ONCE against it (broadcast when the vocab
  *    fits);
  *  - per-doc aggregation re-groups by doc_id — the only other exchange.
  *
  * MLE (no smoothing) is exact here because the model is fitted on the
  * corpus being scored: every document bigram has corpus count ≥ 1.
  * Scoring FOREIGN text against the model needs a smoothed variant
  * (add-k on the join's null-match path) — same plumbing.
  */
object LangModel {

  /** (doc_id, w1, w2) bigram rows of a whitespace-tokenized text column;
    * documents with < 2 tokens contribute nothing. */
  def docBigrams(docs: DataFrame, id: String, text: String): DataFrame = {
    val toks = split(col(text), " ")
    docs
      .select(col(id), toks.as("toks"), size(toks).as("n"))
      .filter(col("n") >= 2)
      .select(col(id), explode(arrays_zip(
        slice(col("toks"), lit(1), col("n") - 1).as("w1"),
        slice(col("toks"), lit(2), col("n") - 1).as("w2"))).as("bg"))
      .select(col(id), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
  }

  /** Per-document average bigram log-likelihood under the corpus MLE
    * model: (doc_id, n_bigrams, avg_logp·6dp), avg over
    * ln(c(w1,w2) / c(w1,·)). Rounded — a distributed double mean over
    * libm logs (determinism rule #3). */
  def bigramLogLikelihood(docs: DataFrame, id: String,
                          text: String): DataFrame = {
    val bg = docBigrams(docs, id, text)
    val pairCounts = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
    // c(w1,·) derived FROM the pair counts (vocab-sized input), not by
    // re-aggregating the corpus.
    val prefixCounts = pairCounts.groupBy("w1").agg(sum("c2").as("c1"))
    val model = pairCounts.join(prefixCounts, "w1")
      .select(col("w1"), col("w2"),
        log(col("c2").cast("double") / col("c1").cast("double")).as("logp"))
    bg.join(model, Seq("w1", "w2"))
      .groupBy(col(id))
      .agg(count(lit(1)).as("n_bigrams"),
        qround(avg(col("logp")), 6).as("avg_logp"))
  }

  /** One BPE-training merge round at the character level: frequency of
    * every adjacent symbol pair across the corpus, weighted by word
    * frequency — the argmax pair is the round's merge. The corpus is
    * reduced to its word VOCABULARY first (explode + count, map-side
    * combined), so the quadratic-ish pair fan-out runs over |vocab|·|word
    * length| rows, never over corpus tokens: the shape that lets BPE
    * training iterate on a 100 TB corpus (vocab is millions, corpus is
    * trillions). Output: (pair, n) for every 2-char adjacent pair. */
  def bpePairCounts(docs: DataFrame, text: String): DataFrame = {
    val vocab = docs
      .select(explode(split(col(text), " ")).as("w"))
      .filter(length(col("w")) >= 2)
      .groupBy("w").agg(count(lit(1)).as("cnt"))
    vocab
      .select(col("w"), col("cnt"),
        explode(sequence(lit(1), length(col("w")) - 1)).as("i"))
      .select(col("w").substr(col("i"), lit(2)).as("pair"), col("cnt"))
      .groupBy("pair").agg(sum("cnt").as("n"))
  }
}
