package graft.rec

import graft.segment.Twins
import graft.util.SessionMemo

import org.apache.spark.ml.evaluation.RegressionEvaluator
import org.apache.spark.ml.recommendation.{ALS, ALSModel}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ALS collaborative filtering (reference part5,
  * `als_latent_factors.py:32-106`): explicit feedback, nonnegative
  * factors, cold-start drop — the spark.ml blocked-ALS implementation the
  * reference already used, wrapped with deterministic seeding and the
  * per-(user,item) dedup the engine standardizes on.
  */
object AlsRec {

  /** The (int user, int item, float rating) dedup'd projection ALS
    * consumes; memoized+persisted per dataset key so N fits over the same
    * train split (q52/q53/the q55 grid) share one aggregate instead of
    * re-deduping per fit.
    *
    * NULL item/rating rows are dropped BEFORE the dedup: spark.ml ALS
    * rejects NULL/NaN ratings outright ("Ratings MUST NOT be Null or
    * NaN" — the ML fuzz arm's null_ratings fixture fired it), and a
    * NULL item can't index a factor. Dropping first also keeps the
    * dedup's max() from electing a NULL over a real rating — the same
    * trainable-row definition q190's leakage audit already uses. */
  private def prepared(train: DataFrame, cacheKey: String): DataFrame = {
    def build = Twins.userItemRatings(
        train.filter(col("item_id").isNotNull && col("rating").isNotNull))
      .select(col("user_id").cast("int"), col("item_id").cast("int"),
        col("rating").cast("float"))
    if (cacheKey.isEmpty) build
    else graft.util.SessionMemo.cached(train.sparkSession,
      s"als-train:$cacheKey")(build)
  }

  /** Prepared-train row count, memoized per dataset key (shared by the
    * blocking heuristic and the empty-train guard). */
  private def trainRows(ratings: DataFrame, cacheKey: String): Long =
    if (cacheKey.isEmpty) ratings.count()
    else SessionMemo(ratings.sparkSession, s"als-train-rows:$cacheKey")(
      ratings.count())

  /** Size-aware ALS blocking. spark.ml defaults to 10 user × 10 item
    * blocks regardless of input size, so every one of the solver's
    * 2·maxIter half-iterations schedules 10-task stages (plus the
    * block-to-block exchange) even when a block holds a few thousand
    * ratings — at small per-fit inputs the whole solve is scheduler
    * overhead, multiplied by 16 for the q55 grid. One block per ~1M
    * ratings (floor 1, cap = session default parallelism) keeps
    * per-block work meaningful at every scale: the sf0.1 fit runs
    * single-block, a MovieLens-20M fit gets its ~20 blocks back, and a
    * cluster-scale fit caps at the cluster's parallelism exactly like
    * the default. Block count does not change ALS math — only the
    * float-summation grouping — and every fit in a session derives the
    * same count from the same memoized input, so same-seed determinism
    * and the q53==grid(8,0.1) identity hold unchanged. */
  private val RatingsPerBlock = 1000000L
  private def numBlocks(ratings: DataFrame, cacheKey: String): Int = {
    def compute = {
      val rows = trainRows(ratings, cacheKey)
      val ideal = ((rows + RatingsPerBlock - 1) / RatingsPerBlock).toInt
      math.max(1, math.min(ratings.sparkSession.sparkContext.defaultParallelism,
        ideal))
    }
    if (cacheKey.isEmpty) compute
    else SessionMemo(ratings.sparkSession, s"als-blocks:$cacheKey")(compute)
  }

  /** Fit on (user_id, item_id, rating) with a fixed seed. `maxIter`
    * defaults to 10 — the spark.ml default the reference inherits
    * (`als_latent_factors.py:42-47` sets only rank/reg/seed/nonnegative/
    * coldStart), so a user reproducing the reference's convergence gets
    * it without touching knobs.
    *
    * `cacheKey` memoizes the fitted model within the session: it MUST
    * uniquely identify the training DATASET (e.g. `s"$dir/train"`), not
    * just the run — two different train DataFrames sharing a key would
    * silently share one model. Empty key = no memoization. */
  def fit(train: DataFrame, rank: Int = 8, maxIter: Int = 10,
          regParam: Double = 0.1, seed: Long = 42L,
          cacheKey: String = ""): ALSModel = {
    def doFit(): ALSModel = {
      val ratings = prepared(train, cacheKey)
      val blocks = numBlocks(ratings, cacheKey)
      val m = new ALS()
        .setUserCol("user_id").setItemCol("item_id").setRatingCol("rating")
        .setRank(rank).setMaxIter(maxIter).setRegParam(regParam)
        .setNonnegative(true).setColdStartStrategy("drop")
        .setNumUserBlocks(blocks).setNumItemBlocks(blocks)
        .setSeed(seed)
        .fit(ratings)
      // The factor FRAMES re-run their RDD→row conversion on every
      // action, and recommend/transform/rmse each act on them several
      // times — persisting them halves recommendForUserSubset (measured
      // 2.4 s → 0.8 s at sf0.1). Lazy persist: first use materializes.
      // SessionMemo.clear unpersists them for memoized models.
      m.userFactors.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      m.itemFactors.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      m
    }
    if (cacheKey.isEmpty) doFit()
    else graft.util.SessionMemo(train.sparkSession,
      s"als:$cacheKey:$rank:$maxIter:$regParam:$seed")(doFit())
  }

  /** [[fit]] with the empty-train case made total: spark.ml ALS rejects
    * an empty ratings frame ("No ratings available" — the ML fuzz arm's
    * empty_all fixture fired it through every ALS query), but a 100 TB
    * pipeline's empty partition day must degrade to "no model → no
    * recommendations", not a crash. None ⟺ zero trainable
    * (non-NULL item, non-NULL rating) rows after the dedup. */
  def fitOpt(train: DataFrame, rank: Int = 8, maxIter: Int = 10,
             regParam: Double = 0.1, seed: Long = 42L,
             cacheKey: String = ""): Option[ALSModel] =
    if (trainRows(prepared(train, cacheKey), cacheKey) == 0L) None
    else Some(fit(train, rank, maxIter, regParam, seed, cacheKey))

  /** Top-n per user of `users`, exploded to (user_id, rank, item_id,
    * score) rows with deterministic ordering. */
  def recommendFor(model: ALSModel, users: DataFrame, n: Int): DataFrame =
    model.recommendForUserSubset(users.select(col("user_id").cast("int")), n)
      .select(col("user_id"),
        posexplode(col("recommendations")).as(Seq("pos", "rec")))
      .select(col("user_id"), (col("pos") + 1).as("rank"),
        col("rec.item_id").as("item_id"),
        col("rec.rating").cast("double").as("score"))

  /** RMSE of model predictions on a held-out split (reference M11).
    *
    * None when the scored frame is empty — an empty held-out split, or
    * every held-out pair cold-started away by `coldStartStrategy=drop`
    * (the ML fuzz arm's cold_val_items fixture: all validation items
    * unseen in train ⇒ every prediction row dropped ⇒
    * RegressionEvaluator's summarizer throws "Nothing has been added").
    * RMSE of nothing is undefined, and the SQL-NULL convention the
    * oracle side of the repo uses for undefined aggregates is the
    * honest value — never NaN, never a crash. */
  def rmse(model: ALSModel, heldOut: DataFrame): Option[Double] = {
    val scored = model.transform(Twins.userItemRatings(
        heldOut.filter(col("item_id").isNotNull && col("rating").isNotNull))
      .select(col("user_id").cast("int"), col("item_id").cast("int"),
        col("rating").cast("float")))
      .filter(!isnan(col("prediction")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      if (scored.isEmpty) None
      else Some(new RegressionEvaluator()
        .setMetricName("rmse").setLabelCol("rating")
        .setPredictionCol("prediction")
        .evaluate(scored))
    } finally scored.unpersist(blocking = false)
  }

  /** Hyperparameter grid search by validation MAP-style score (reference
    * M12) — explicit loops, matching the reference's fixed chronological
    * validation set (no CV). Returns (rank, regParam, metricValue) rows.
    * `cacheKey` (dataset identity, e.g. `s"$dir/train"`) memoizes each
    * combo's fitted model — a combo matching another query's (rank, reg)
    * reuses that model instead of refitting. */
  def gridSearch(train: DataFrame, validation: DataFrame,
                 ranks: Seq[Int], regs: Seq[Double], topN: Int,
                 evalFn: (DataFrame, DataFrame) => Double,
                 cacheKey: String = "", maxIter: Int = 10,
                 poolOverride: Option[Int] = None): Seq[(Int, Double, Double)] = {
    import scala.concurrent.{Await, ExecutionContext, Future}
    val combos = for (r <- ranks; g <- regs) yield (r, g)
    if (combos.isEmpty) return Seq.empty
    // The combo chains (fit → recommend → eval) are independent, and at
    // iterative-ML shape the wall-clock is dominated by scheduling many
    // tiny per-iteration stages, not by compute — so the chains are
    // submitted concurrently (Spark job submission is thread-safe) and
    // the scheduler interleaves them onto idle cores. Result order stays
    // the deterministic combo order regardless of completion order.
    // Every combo recommends for the same user set — persist it once
    // (and materialize eagerly: a lazy persist would race the first
    // concurrent combos into computing it redundantly).
    val users = validation.select("user_id").distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    users.count()
    // Concurrency = enough chains to cover the grid in one wave on a
    // wide session (each chain's stages are 1-task at the single-block
    // sf0.1 shape, so idle cores are the cost of a narrow pool), capped
    // by half the session's parallelism so cluster-scale multi-block
    // fits don't oversubscribe. SPARK_GRAFT_ALS_GRID_POOL overrides
    // (same knob discipline as the other SPARK_GRAFT_* settings).
    // `poolOverride` is a dev-probe hook (OptProbe's same-JVM pool A/B);
    // production callers leave it None.
    val poolSize = poolOverride.orElse(
      sys.env.get("SPARK_GRAFT_ALS_GRID_POOL").map(_.toInt))
      .getOrElse(math.min(combos.size, math.max(8,
        train.sparkSession.sparkContext.defaultParallelism / 2)))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(poolSize)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val fs = combos.map { case (r, g) =>
        // Lifted to Try so the sequence always waits for EVERY combo:
        // failing fast on the first error would orphan the other
        // in-flight fits, which keep submitting Spark jobs on non-daemon
        // threads long after the caller has moved on.
        Future {
          // Pin the active session on the pool thread: these threads
          // inherit the SUBMITTER's thread-local, which in multi-thread
          // callers (test runners) may be unset — and any AQE
          // QueryStageCreator worker lazily created from a session-less
          // thread builds plan nodes with SparkPlan.session = null that
          // later NPE in resetMetrics (VERDICT r16 #2).
          org.apache.spark.sql.SparkSession.setActiveSession(
            train.sparkSession)
          scala.util.Try {
            fitOpt(train, rank = r, maxIter = maxIter, regParam = g,
                cacheKey = cacheKey) match {
              case Some(model) =>
                (r, g, evalFn(recommendFor(model, users, topN), validation))
              // Empty train: no combo can fit; every cell scores the 0.0
              // floor and the grid keeps its shape (ML fuzz arm).
              case None => (r, g, 0.0)
            }
          }
        }
      }
      Await.result(Future.sequence(fs),
        scala.concurrent.duration.Duration.Inf)
        .map(_.get) // all combos settled; now surface the first failure
    } finally {
      pool.shutdown()
      users.unpersist(blocking = false)
    }
  }
}
