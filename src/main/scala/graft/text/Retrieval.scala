package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions.{qdec, qround}

/** BM25 ranked retrieval over the document corpus — the lexical search
  * primitive (and the hard-negative miner of retrieval-model training
  * pipelines: "which corpus docs score highest against this query").
  *
  * score(d, q) = Σ_{w ∈ q∩d} idf(w) · tf·(k1+1) / (tf + k1·(1−b+b·len/avglen)),
  * idf(w) = ln((N − df + 0.5)/(df + 0.5) + 1)  (the Lucene-style
  * always-positive variant).
  *
  * Scale: term statistics (tf, df, doc lengths) come from ONE grouped
  * count over corpus tokens; the query is a broadcast token set, so
  * scoring touches only postings of query terms (a semi-join of the
  * term frame — never a corpus scan per query). Determinism: idf and
  * each per-term contribution round to 9dp and ride DECIMAL sums — the
  * distributed Σ-of-doubles trap designed out, same discipline as the
  * Naive Bayes posteriors.
  */
object Retrieval {

  private val dec = "decimal(28,9)"

  /** (id, w, tf) term frequencies of non-empty whitespace tokens. */
  def termFreqs(docs: DataFrame, id: String, text: String): DataFrame =
    docs.select(col(id),
        explode(filter(split(col(text), " "),
          t => length(t) > 0)).as("w"))
      .groupBy(col(id), col("w")).agg(count(lit(1)).as("tf"))

  /** Top-k corpus documents for a broadcast query-token frame
    * (one column `w`): (id, score·6dp, n_terms), ranked
    * (score desc, id asc). k1 = 1.2, b = 0.75. */
  def bm25TopK(docs: DataFrame, id: String, text: String,
               query: DataFrame, k: Int): DataFrame = {
    val tfs = termFreqs(docs, id, text)
    val lens = tfs.groupBy(col(id)).agg(sum("tf").as("len"))
    val stats = lens.agg(count(lit(1)).as("n_docs"),
      sum("len").as("tot_len"))
    val avg = stats.select(col("n_docs"),
      qround(col("tot_len").cast("double") / col("n_docs"), 6).as("avglen"))
    val dfs = tfs.groupBy("w").agg(count(lit(1)).as("df"))
    val qterms = query.select(col("w")).distinct()
    val idf = dfs.join(broadcast(qterms), "w")
      .crossJoin(broadcast(avg))
      .select(col("w"), col("avglen"),
        qround(log((col("n_docs") - col("df") + lit(0.5)) /
          (col("df") + lit(0.5)) + lit(1.0)), 9).cast(dec).as("idf"))
    val contrib = tfs.join(idf, "w").join(lens, Seq(id))
      .select(col(id),
        qround(col("idf").cast("double") *
          (col("tf").cast("double") * lit(2.2)) /
          (col("tf").cast("double") + lit(1.2) *
            (lit(0.25) + lit(0.75) *
              (col("len").cast("double") / col("avglen")))), 9)
          .cast(dec).as("term_score"))
    contrib.groupBy(col(id))
      .agg(qround(sum("term_score").cast("double"), 6).as("score"),
        count(lit(1)).as("n_terms"))
      .orderBy(desc("score"), col(id))
      .limit(k)
  }
}
