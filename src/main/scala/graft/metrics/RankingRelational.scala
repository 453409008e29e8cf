package graft.metrics

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.functions.GraftFunctions.{qdec, qround}

/** Ranking metrics (Precision@K, MAP@K, NDCG@K with binary relevance) as a
  * pure relational computation — no RDD round-trip, no driver loops, every
  * step codegen'd and shuffle-partial-aggregated (replaces the reference's
  * `joined.rdd.map` → `mllib.RankingMetrics` bridge, M9, which serialized
  * every row through Python workers).
  *
  * Metric spec (documented here because it IS the oracle contract):
  *  - P@K    = |hits in first K| / K
  *  - AP@K   = Σ_{i≤K, hit_i} (cumHits_i / i) / min(|truth|, K)
  *  - NDCG@K = Σ_{i≤K, hit_i} 1/log2(i+1) / Σ_{i=1..min(|truth|,K)} 1/log2(i+1)
  * averaged over users that have ≥1 recommendation row and ≥1 truth item.
  */
object RankingRelational {

  /** `recs`: (user_id, item_id, rank 1..K); `truth`: (user_id, item_id).
    * Returns a single row (n_users, p_at_k, map_at_k, ndcg_at_k). */
  def metrics(spark: SparkSession, recs: DataFrame, truth: DataFrame,
              k: Int): DataFrame =
    metricsBy(spark, recs, truth, k, keys = Nil)

  /** Keyed variant: one metrics row per distinct value of `keys` in `recs`
    * (e.g. a hyperparameter column from a sweep — reference Table 2 runs
    * one evaluation per bias). `keys` columns must be carried on `recs`;
    * truth stays per-user. With `keys = Nil` this is the single global
    * row. All shuffles key on (keys..., user_id) — a sweep over B
    * parameter values is one pipeline, not B query plans. */
  def metricsBy(spark: SparkSession, recs: DataFrame, truth: DataFrame,
                k: Int, keys: Seq[String]): DataFrame = {
    val keyCols = keys.map(col)
    val t = truth.select("user_id", "item_id").distinct()
    val tsize = t.groupBy("user_id").agg(count(lit(1)).as("n_truth"))

    val hits = recs
      .join(t.withColumn("hit", lit(1)), Seq("user_id", "item_id"), "left")
      .withColumn("hit", coalesce(col("hit"), lit(0)))
    val w = Window.partitionBy(keyCols :+ col("user_id"): _*).orderBy("rank")
    val cum = hits.withColumn("ch", sum(col("hit")).over(w))

    // log2 via ln to mirror the oracle SQL exactly (ln(x)/ln(2)).
    val log2rank = log(col("rank") + 1) / log(lit(2.0))
    val perUser = cum.groupBy(keyCols :+ col("user_id"): _*).agg(
      (sum(col("hit")).cast("double") / k).as("p"),
      sum(when(col("hit") === 1, col("ch").cast("double") / col("rank"))
        .otherwise(0.0)).as("ap_num"),
      sum(when(col("hit") === 1, lit(1.0) / log2rank).otherwise(0.0)).as("dcg"))

    // idcg(m) = Σ_{i=1..m} 1/log2(i+1), precomputed for m = 1..K.
    val wi = Window.orderBy("m").rowsBetween(Window.unboundedPreceding, 0)
    val idcg = spark.range(1, k + 1).toDF("m")
      .withColumn("v", sum(lit(1.0) / (log(col("m") + 1) / log(lit(2.0)))).over(wi))

    perUser
      .join(tsize, "user_id")
      .withColumn("m", least(col("n_truth"), lit(k.toLong)))
      .join(broadcast(idcg), "m")
      .groupBy(keyCols: _*)
      .agg(
        count(lit(1)).as("n_users"),
        qround(avg(col("p")), 6).as("p_at_k"),
        qround(avg(col("ap_num") / col("m")), 6).as("map_at_k"),
        qround(avg(col("dcg") / col("v")), 6).as("ndcg_at_k"))
  }
}
