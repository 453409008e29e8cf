package graft.rec

import graft.ops.Relational._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Popularity-baseline recommender (reference part4 scripts): biased
  * popularity pool from the training split, cross-join candidates to the
  * target users, remove seen, rank per user by ascending item id (the
  * reference's quirk — SURVEY §2.5 W2) and keep top-k.
  */
object Popularity {

  /** Chronological 60/20/20 split labels on the ratings fact table
    * (reference `partition.py`): split 0–2 train, 3 validation, 4 test. */
  def withSplits(ratings: DataFrame): DataFrame =
    chronoSplit(ratings, "user_id", "ts", "event_id")

  def train(tagged: DataFrame): DataFrame = tagged.filter(col("split") <= 2)
  def validation(tagged: DataFrame): DataFrame = tagged.filter(col("split") === 3)
  def test(tagged: DataFrame): DataFrame = tagged.filter(col("split") === 4)

  /** Bias hyperparameter sweep (reference `popularity_tuned.py:26-41`,
    * Table 2): evaluate the recommender at each bias value with the
    * caller's metric. Explicit loop, like the reference — the validation
    * set is fixed and chronological, not cross-validated. */
  def biasSweep(trainDf: DataFrame, target: DataFrame, biases: Seq[Double],
                poolK: Int, k: Int,
                evalFn: DataFrame => Double): Seq[(Double, Double)] =
    biases.map { b =>
      b -> evalFn(recommend(trainDf, target, b, poolK, k))
    }

  /** Multi-bias recommendations in ONE pipeline (the distributed form of
    * the reference's Table 2 sweep loop, `popularity_tuned.py:26-41`):
    * the per-item aggregate runs once and is cross-joined to the bias
    * list, per-bias pools rank in a single window, and candidate
    * generation / seen-removal / per-user ranking all carry `bias` as an
    * extra key — B bias values cost one scan of train plus a B×-wider
    * (still tiny, broadcast) pool, instead of B full pipelines.
    * Output: (bias, user_id, item_id, rank ≤ k). */
  def recommendSweep(trainDf: DataFrame, target: DataFrame,
                     biases: Seq[Double], poolK: Int, k: Int): DataFrame = {
    val spark = trainDf.sparkSession
    import spark.implicits._
    val itemAgg = trainDf.groupBy("item_id")
      .agg(graft.ops.Relational.centsSumDouble(col("rating"))
        .as("__total"), count(lit(1)).as("cnt"))
    val pools = itemAgg.crossJoin(broadcast(biases.toDF("bias")))
      .withColumn("score",
        col("__total").cast("double") / (col("cnt") + col("bias")))
    val poolW = org.apache.spark.sql.expressions.Window
      .partitionBy("bias").orderBy(col("score").desc, col("item_id"))
    val pool = pools
      .withColumn("__prank", row_number().over(poolW))
      .filter(col("__prank") <= poolK)
      .select("bias", "item_id")
    val users = target.select("user_id").distinct()
    val unseen = removeSeen(candidates(users, pool), trainDf,
      Seq("user_id", "item_id"))
    perKeyTopKAggAsc(unseen, Seq("bias", "user_id"), "item_id", k)
      .select("bias", "user_id", "item_id", "rank")
  }

  /** Top-k recommendations for every user of `target`, from a biased
    * popularity pool over `trainDf`. The pool (≤ poolK rows) is broadcast;
    * the anti-join on (user, item) is the only large shuffle. */
  def recommend(trainDf: DataFrame, target: DataFrame, bias: Double,
                poolK: Int, k: Int): DataFrame = {
    val pool = biasedTopK(trainDf, "item_id", "rating", bias, poolK)
      .select("item_id")
    val users = target.select("user_id").distinct()
    val unseen = removeSeen(candidates(users, pool), trainDf,
      Seq("user_id", "item_id"))
    perKeyTopKAggAsc(unseen, Seq("user_id"), "item_id", k)
      .select("user_id", "item_id", "rank")
  }
}
