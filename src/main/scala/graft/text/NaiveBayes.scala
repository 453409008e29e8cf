package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions.{qdec, qround}

/** Multinomial Naive Bayes text classification — train and score in two
  * aggregates and two joins, no iteration. The supervised counterpart of
  * the heuristic language-id scorer (q22): learn P(token|class) from a
  * labeled split, then argmax class posteriors on held-out documents.
  *
  * Determinism (the cross-engine discipline of the Kaplan–Meier and
  * conformal queries): every log factor — priors, per-(token, class)
  * likelihoods, and the unknown-token default — is rounded to 9dp and
  * cast DECIMAL(28,9) BEFORE the per-document sum, so the posterior is
  * an EXACT decimal total (no summation-order ulps) and the argmax is
  * engine-independent; ties break to the lexicographically smallest
  * class.
  *
  * Scale: the model is vocabulary×classes-sized (built by ONE grouped
  * count over train tokens, never re-scanning the corpus); the class
  * table (priors, Laplace defaults) is a broadcast of |classes| rows;
  * scoring is one join of test tokens against the model keyed on
  * (token, class) — broadcastable while the model fits, shuffle-hash on
  * token beyond that — plus one (doc, class)-grouped sum. Laplace α=1
  * smoothing; test tokens outside the train vocabulary fall back to the
  * class's ln(1/(tokens_c + V)) default via the left join's coalesce.
  */
object NaiveBayes {

  private val dec = "decimal(28,9)"

  private def tokens(df: DataFrame, id: String, text: String,
                     label: String): DataFrame =
    df.select(col(id), col(label).as("truth"),
      explode(filter(split(col(text), " "),
        t => length(t) > 0)).as("w"))

  /** Fitted model: `classes` = (c, prior, logp0) — |classes| rows,
    * always broadcast; `tokenLikelihoods` = (c, w, logp) —
    * vocabulary×classes rows. Both are plain DataFrames, so the model
    * joins against batch OR streaming inputs (the q169 serving path). */
  case class Model(classes: DataFrame, tokenLikelihoods: DataFrame)

  /** Learn priors + Laplace-smoothed token likelihoods from `train`. */
  def fit(train: DataFrame, id: String, text: String,
          label: String): Model = {
    val trainToks = tokens(train, id, text, label)
      .withColumnRenamed("truth", "c")
    val cnt = trainToks.groupBy("c", "w").agg(count(lit(1)).as("n"))
    val tc = cnt.groupBy("c").agg(sum("n").as("tokens_c"))
    val v = cnt.agg(countDistinct("w").as("v"))
    val dc = train.groupBy(col(label).as("c"))
      .agg(count(lit(1)).as("docs_c"))
    val dtot = train.agg(count(lit(1)).as("docs_tot"))
    val classes = tc.join(dc, "c")
      .crossJoin(broadcast(v)).crossJoin(broadcast(dtot))
      .select(col("c"),
        qround(log(col("docs_c").cast("double") /
          col("docs_tot").cast("double")), 9).cast(dec).as("prior"),
        qround(log(lit(1.0) /
          (col("tokens_c") + col("v")).cast("double")), 9).cast(dec)
          .as("logp0"))
    val model = cnt.join(tc, "c").crossJoin(broadcast(v))
      .select(col("c"), col("w"),
        qround(log((col("n") + 1).cast("double") /
          (col("tokens_c") + col("v")).cast("double")), 9).cast(dec)
          .as("logp"))
    Model(classes, model)
  }

  /** Per-(doc, class) decimal posteriors: (id, truth, c, score). Pure
    * stateless-then-aggregate — runs unchanged on a streaming `docs`
    * (Complete-mode aggregation). */
  def posteriors(m: Model, docs: DataFrame, id: String, text: String,
                 label: String): DataFrame =
    tokens(docs, id, text, label)
      .crossJoin(broadcast(m.classes))
      .join(m.tokenLikelihoods, Seq("c", "w"), "left")
      .groupBy(col(id), col("truth"), col("c"), col("prior"))
      .agg(sum(coalesce(col("logp"), col("logp0"))).as("sumlogp"))
      .select(col(id), col("truth"), col("c"),
        (col("prior") + col("sumlogp")).as("score"))

  /** Argmax class per document over [[posteriors]] output; exact
    * decimal comparison, ties to the smallest class. */
  def argmax(scored: DataFrame, id: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(id)).orderBy(desc("score"), col("c"))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col(id), col("truth"), col("c").as("predicted"),
        col("score"))
  }

  /** Train on `train`, score `test`: (id, truth, predicted, score) one
    * row per test document with ≥1 token. */
  def classify(train: DataFrame, test: DataFrame, id: String,
               text: String, label: String): DataFrame =
    argmax(posteriors(fit(train, id, text, label), test, id, text, label),
      id)

  /** Confusion matrix of [[classify]]: (truth, predicted, n_docs). */
  def confusion(train: DataFrame, test: DataFrame, id: String,
                text: String, label: String): DataFrame =
    classify(train, test, id, text, label)
      .groupBy("truth", "predicted")
      .agg(count(lit(1)).as("n_docs"))
}
