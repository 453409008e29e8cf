package graft.queries

import graft.io.Tables
import graft.metrics.RankingRelational
import graft.rec.{AlsRec, ItemCf, Popularity}
import graft.functions.GraftFunctions.{qdec, qround}

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Recommendation parity surface (reference parts 3–5): chronological
  * split → popularity baseline with bias → relational ranking metrics →
  * ALS. The popularity pipeline and its metrics are DuckDB-oracle-checked
  * end-to-end; ALS (iterative ML) is seeded + rows-only.
  */
object RecQueries {
  type Q = (SparkSession, String) => DataFrame

  /** Memoized + persisted split-tagged ratings, one per (session, dir):
    * q50/q51/q54 and the whole ALS family start from this exact frame, and
    * the chronoSplit window + JSON-extract lineage is expensive enough
    * that recomputing it per query dominated those queries in round 3
    * (MEMORY_ONLY eviction under the grown memo footprint → full lineage
    * recompute; see VERDICT r3 "What's wrong" #2). */
  private[graft] def tagged(spark: SparkSession, dir: String): DataFrame =
    graft.util.SessionMemo.cached(spark, s"tagged-splits:$dir")(
      Popularity.withSplits(Tables.ratingsCached(spark, dir)))

  /** Memoized ALS top-20 recommendations for the validation users
    * (persisted, |val users| × 20 rows). `recommendForUserSubset` is the
    * expensive cross-scoring of the factor matrices — q52 and q53 both
    * need it, so it runs ONCE at the larger n and q52 slices ranks ≤ 10
    * (the first 10 of a top-20 are the top-10: ordering is by score with
    * ALSModel's own deterministic selection, model and data fixed). */
  private def alsRecs20(spark: SparkSession, dir: String): DataFrame =
    graft.util.SessionMemo.cached(spark, s"als-recs20:$dir") {
      val t = tagged(spark, dir)
      // Empty train (no trainable rows at all) ⇒ no model ⇒ no lists —
      // the ML fuzz arm's empty_all fixture; a crash here took the whole
      // ALS family down with it.
      AlsRec.fitOpt(Popularity.train(t), cacheKey = s"$dir/train") match {
        case Some(model) => AlsRec.recommendFor(model,
          Popularity.validation(t).select("user_id").distinct(), n = 20)
        case None =>
          import spark.implicits._
          Seq.empty[(Int, Int, Int, Double)]
            .toDF("user_id", "rank", "item_id", "score")
      }
    }

  /** Memoized q50 recommendation lists — q50/q51/q138/q150 all consume
    * the same popularity top-20; one per (session, dir) like [[tagged]]
    * (the r3-verdict eviction lesson: shared lineage, computed once). */
  private def popRecs(spark: SparkSession, dir: String): DataFrame =
    graft.util.SessionMemo.cached(spark, s"pop-recs20:$dir") {
      val t = tagged(spark, dir)
      Popularity.recommend(Popularity.train(t), Popularity.validation(t),
        bias = 100.0, poolK = 50, k = 20)
    }

  /** q50 — popularity recommendations for validation users: train-split
    * pool (bias 100, top-50), seen-removal against train, per-user top-20
    * by ascending item id (reference quirk preserved). */
  val q50: Q = (spark, dir) =>
    popRecs(spark, dir).orderBy("user_id", "rank")

  /** q51 — ranking metrics (P@20 / MAP@20 / NDCG@20) of q50 against the
    * validation truth — computed relationally (see
    * [[graft.metrics.RankingRelational]] for the exact metric spec). */
  val q51: Q = (spark, dir) => {
    val t = tagged(spark, dir)
    RankingRelational.metrics(spark, popRecs(spark, dir),
      Popularity.validation(t), k = 20)
  }

  /** q52 — ALS top-10 recommendations for validation users (seeded,
    * rank 8 × 10 iters, the reference's default convergence; rows-only
    * check — iterative ML has no SQL oracle).
    * Sliced from the memoized top-20 shared with q53. */
  val q52: Q = (spark, dir) =>
    alsRecs20(spark, dir)
      .filter(col("rank") <= 10)
      .orderBy("user_id", "rank")

  /** q53 — ALS validation RMSE + ranking metrics of the ALS recs, one row
    * (rows-only check). Reuses q52's memoized top-20 recommendations. */
  val q53: Q = (spark, dir) => {
    val t = tagged(spark, dir)
    val valid = Popularity.validation(t)
    val recs = alsRecs20(spark, dir).select("user_id", "item_id", "rank")
    val m = RankingRelational.metrics(spark, recs, valid, k = 20)
    m.withColumn("rmse", qround(alsRmseCol(spark, dir, valid), 6))
  }

  /** The ALS validation/test RMSE as a literal column: NULL when no
    * model fits (empty train) or the held-out eval frame is empty after
    * cold-start drop (see [[AlsRec.rmse]]) — the SQL-NULL convention for
    * an undefined aggregate, in place of the crash the ML fuzz arm
    * surfaced. On the main gate the value is identical to the pre-guard
    * literal. */
  private def alsRmseCol(spark: SparkSession, dir: String,
                         heldOut: DataFrame, rank: Int = 8,
                         regParam: Double = 0.1): org.apache.spark.sql.Column =
    AlsRec.fitOpt(Popularity.train(tagged(spark, dir)), rank = rank,
        regParam = regParam, cacheKey = s"$dir/train")
      .flatMap(model => AlsRec.rmse(model, heldOut))
      .map(lit)
      .getOrElse(lit(null).cast("double"))

  /** q54 — the bias hyperparameter sweep (reference Table 2,
    * `popularity_tuned.py:26-41`): one ranking-metrics row per bias ∈
    * {1, 10, 100, 1000}, computed as a single bias-keyed pipeline (see
    * [[graft.rec.Popularity.recommendSweep]]) rather than four plans. */
  val q54: Q = (spark, dir) => {
    val t = tagged(spark, dir)
    val recs = Popularity.recommendSweep(Popularity.train(t),
      Popularity.validation(t), biases = Seq(1.0, 10.0, 100.0, 1000.0),
      poolK = 50, k = 20)
    RankingRelational.metricsBy(spark, recs, Popularity.validation(t),
      k = 20, keys = Seq("bias"))
      .orderBy("bias")
  }

  /** q55 — the ALS hyperparameter grid at the REFERENCE'S shape
    * (Table 3, `als_latent_factors.py:31-44`): the full 4×4 — ranks
    * {5, 10, 20, 50} × regs {0.01, 0.05, 0.1, 1} — seeded, one
    * (rank, reg_param, map_at_k) row per combo, 16 rows, at the
    * reference's ITERATION fidelity too: maxIter 10, the spark.ml
    * default `als_latent_factors.py` never overrides — a user
    * reproducing report Table 3 hits the same convergence (the earlier
    * maxIter-4 economics knob preserved combo ordering but not cell
    * values). Metric cutoff remains MAP@20 (the engine's standard —
    * the reference's @100 exceeds the 50-item candidate pools at bench
    * scale). Rows-only check (iterative ML); determinism + the argmax
    * are spec-asserted (RecSpec). */
  val q55: Q = (spark, dir) => {
    val t = tagged(spark, dir)
    val valid = Popularity.validation(t)
    // Key carries the grid itself — another grid over the same dir must
    // not get this one's memoized rows back (SessionMemo key contract).
    val grid = graft.util.SessionMemo(spark,
      s"als-grid:$dir:r5,10,20,50:g0.01,0.05,0.1,1:top20:it10") {
      AlsRec.gridSearch(Popularity.train(t), valid,
        ranks = Seq(5, 10, 20, 50), regs = Seq(0.01, 0.05, 0.1, 1.0),
        topN = 20, maxIter = 10,
        evalFn = (recs, v) => {
          // MAP over zero evaluable users is undefined (metrics' global
          // aggregate emits NULL); the grid cell scores 0.0 — the
          // "nothing recommended correctly" floor — so the 16-cell
          // Table-3 shape survives degenerate splits (ML fuzz arm).
          val row = RankingRelational
            .metrics(spark, recs.select("user_id", "item_id", "rank"), v,
              k = 20)
            .select("map_at_k").head()
          if (row.isNullAt(0)) 0.0 else row.getDouble(0)
        },
        cacheKey = s"$dir/train")
    }
    import spark.implicits._
    grid.toDF("rank", "reg_param", "map_at_k")
      .orderBy("rank", "reg_param")
  }

  /** q56 — the reference's FINAL evaluation (part5,
    * `als_latent_factors.py:73-106`): the fixed (rank=50, regParam=0.05)
    * model, scored on the held-out TEST split (the val splits tune, the
    * test split reports) — ranking metrics @20 + RMSE, one row.
    * Rows-only (iterative ML); seeded + memoized per session.
    * maxIter matches the q55 grid (10, the reference default) so this
    * model IS the grid's (50, 0.05) cell by memo key — the final eval
    * reuses the tuned fit instead of refitting rank-50 from scratch. */
  val q56: Q = (spark, dir) => {
    val t = tagged(spark, dir)
    val test = Popularity.test(t)
    val recs = AlsRec.fitOpt(Popularity.train(t), rank = 50,
        regParam = 0.05, maxIter = 10, cacheKey = s"$dir/train") match {
      case Some(model) => AlsRec.recommendFor(model,
          test.select("user_id").distinct(), n = 20)
        .select("user_id", "item_id", "rank")
      case None =>
        import spark.implicits._
        Seq.empty[(Int, Int, Int)].toDF("user_id", "item_id", "rank")
    }
    RankingRelational.metrics(spark, recs, test, k = 20)
      .withColumn("rmse",
        qround(alsRmseCol(spark, dir, test, rank = 50, regParam = 0.05), 6))
  }

  /** q116 — negative sampling for implicit-feedback training (see
    * [[graft.rec.Negatives.sample]]): 5 keyed-PRNG unseen items per
    * user — broadcast item pool, in-map candidate stream, hash
    * anti-join, WindowGroupLimit top-k. */
  val q116: Q = (spark, dir) =>
    graft.rec.Negatives.sample(Tables.ratingsCached(spark, dir), k = 5)
      .orderBy("user_id", "rank")

  /** q136 — item–item CF neighbors ([[graft.rec.ItemCf.itemNeighbors]]):
    * top-10 most-similar items per item by rating-vector cosine, latest
    * rating per (user, item), support ≥ 5 co-raters. The `maxPerUser`
    * pair-explode cap is set above the observed per-user maximum so the
    * oracle's uncapped SQL computes the identical exact result. */
  val q136: Q = (spark, dir) =>
    ItemCf.itemNeighbors(Tables.ratingsCached(spark, dir),
        k = 10, minSupport = 5, maxPerUser = 1000)
      .orderBy("item_id", "rank")

  /** q138 — recommendation exposure diagnostics over the q50 popularity
    * lists: catalog coverage (share of train-catalog items that appear
    * in at least one top-20 list) and the Gini coefficient of per-item
    * exposure counts (zeros included — unexposed catalog items are the
    * long tail the metric exists to expose). All-integer sums feed one
    * final double division, so the row is bit-deterministic; the global
    * rank window runs over the already-aggregated |catalog| rows, not
    * the fact table. */
  val q138: Q = (spark, dir) => {
    val t = tagged(spark, dir)
    val recs = popRecs(spark, dir)
    val catalog = Popularity.train(t).select("item_id").distinct()
    val exposure = recs.groupBy("item_id").agg(count(lit(1)).as("x"))
    val e = catalog.join(exposure, Seq("item_id"), "left")
      .select(col("item_id"), coalesce(col("x"), lit(0L)).as("x"))
    val rk = e.withColumn("i",
      row_number().over(Window.orderBy(col("x"), col("item_id"))))
    rk.agg(count(lit(1)).as("n"), sum("x").as("sx"),
        sum(col("i") * col("x")).as("six"),
        sum(when(col("x") > 0, 1L).otherwise(0L)).as("nrec"))
      .select(col("n").as("n_items"), col("nrec").as("n_recommended"),
        qround(col("nrec").cast("double") / col("n").cast("double"), 6)
          .as("coverage"),
        qround(lit(2.0) * col("six").cast("double") /
            (col("n") * col("sx")).cast("double") -
            (col("n") + lit(1L)).cast("double") / col("n").cast("double"),
          6).as("gini"))
  }

  /** q139 — item-CF rating prediction on the held-out validation split
    * ([[graft.rec.ItemCf.rmseReport]]): neighbors fit on the TRAIN
    * split only (no leakage), weighted-average prediction for every
    * val (user, item), one summary row of n/coverage/RMSE/MAE — the
    * oracle-exact error eval the ALS family can't offer (q53 is
    * rows-only by iterative-ML nature). k=20 neighbors, support ≥ 3
    * co-raters; `maxPerUser` above the observed per-user maximum so
    * the uncapped oracle SQL is exact. */
  val q139: Q = (spark, dir) => {
    val t = tagged(spark, dir)
    ItemCf.rmseReport(Popularity.train(t), Popularity.validation(t),
      k = 20, minSupport = 3, maxPerUser = 1000)
  }

  /** q198 — Koren additive bias baseline (μ + b_i + b_u, shrinkage
    * λ_i = 10 / λ_u = 15) fit on train, RMSE/MAE on the validation
    * split ([[graft.rec.BiasBaseline]]): the strongest closed-form
    * member of the q165 (item-mean) / q139 (item-CF) rating-predictor
    * ladder, and the oracle-EXACT stand-in for the RMSE the iterative
    * ALS family (q53/q56) reports rows-only. Predictions clamp to the
    * observed [0, 500] rating range. */
  val q198: Q = (spark, dir) => {
    val t = tagged(spark, dir)
    graft.rec.BiasBaseline.rmseReport(Popularity.train(t),
      Popularity.validation(t), lambdaI = 10.0, lambdaU = 15.0,
      lo = 0.0, hi = 500.0)
  }

  /** q142 — popularity-score AUC on the validation split
    * ([[graft.metrics.Auc.binaryAuc]]): candidates = val users × the
    * biased top-50 pool, label = the user actually rated the item in
    * val, score = the 6-dp-rounded popularity score. The
    * threshold-free counterpart of q51's @k ranking metrics — and
    * integer-exact through the rank sum, so it gates hash-green where
    * AUC implementations usually drift on tie handling. */
  val q142: Q = (spark, dir) => {
    val t = tagged(spark, dir)
    val train = Popularity.train(t)
      .filter(col("item_id").isNotNull && col("rating").isNotNull)
    val va = Popularity.validation(t)
      .filter(col("item_id").isNotNull && col("rating").isNotNull)
    val pool = train.groupBy("item_id")
      .agg(qround(sum(qdec(col("rating"), 18, 2)).cast("double") /
        (count(lit(1)) + lit(100.0)), 6).as("score"))
      .orderBy(col("score").desc, col("item_id")).limit(50)
    val vusers = va.select("user_id").distinct()
    val vitems = va.select("user_id", "item_id").distinct()
      .withColumn("y", lit(1))
    val lab = vusers.crossJoin(broadcast(pool))
      .join(vitems, Seq("user_id", "item_id"), "left")
      .select(col("score"), coalesce(col("y"), lit(0)).as("y"))
    graft.metrics.Auc.binaryAuc(lab, col("score"), col("y"))
  }

  /** q145 — 5-fold CV of the item-mean bias hyperparameter
    * ([[graft.rec.CrossVal.biasCvRmse]]): K folds × 4 bias values in
    * one pipeline via out-of-fold subtraction — the leakage-safe
    * version of the reference's Table 2 sweep, per-(bias, fold) RMSE
    * plus the CV mean that actually selects b. */
  val q145: Q = (spark, dir) =>
    graft.rec.CrossVal.biasCvRmse(Tables.ratingsCached(spark, dir),
      folds = 5, biases = Seq(1, 5, 20, 100), seed = 145L)
      .orderBy("bias", "fold")

  /** q165 — calibration (reliability) curve of the shrunk item-mean
    * predictor on the validation split: predictions `(Σr + b·μ)/(n+b)`
    * (b = 20, μ = train global mean) bucketed to half-rating bins,
    * mean predicted vs mean actual per bin — the "is the model
    * over/under-confident where" diagnostic behind q139/q145's scalar
    * RMSEs. Preds round to 6dp then ride DECIMAL sums (a distributed
    * double mean would be summation-order-dependent). */
  val q165: Q = (spark, dir) => {
    val t = tagged(spark, dir)
    val notNull = col("item_id").isNotNull && col("rating").isNotNull
    val train = Popularity.train(t).filter(notNull)
    val va = Popularity.validation(t).filter(notNull)
    val g = train.agg(
        sum(qdec(col("rating"), 18, 2)).as("s"),
        count(lit(1)).as("n"))
      .select(qround(col("s").cast("double") / col("n"), 6).as("mu"))
    val preds = train.groupBy("item_id")
      .agg(sum(qdec(col("rating"), 18, 2)).as("s"),
        count(lit(1)).as("n"))
      .crossJoin(broadcast(g))
      .select(col("item_id"),
        qround((col("s").cast("double") + lit(20.0) * col("mu")) /
          (col("n") + lit(20.0)), 6).as("pred"))
    va.join(preds, "item_id")
      .withColumn("bucket", floor(col("pred") * 2).cast("long"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"),
        qround(sum(col("pred").cast("decimal(18,6)")).cast("double") /
          count(lit(1)), 6).as("avg_pred"),
        qround(sum(qdec(col("rating"), 18, 2)).cast("double") /
          count(lit(1)), 6).as("avg_actual"))
      .orderBy("bucket")
  }

  /** q149 — split-conformal prediction intervals for the smoothed
    * item-mean predictor ([[graft.rec.Conformal.itemMeanIntervals]]):
    * calibrated on the val split, coverage audited on the test split —
    * the distribution-free "how wide must the interval be" companion
    * to q139/q145's RMSEs, α = 0.1. */
  val q149: Q = (spark, dir) => {
    val t = tagged(spark, dir)
    graft.rec.Conformal.itemMeanIntervals(Popularity.train(t),
      Popularity.validation(t), Popularity.test(t),
      bias = 20, alpha = 0.1)
  }

  /** q150 — IPS / SNIPS debiased precision@20 of the q50 lists: offline
    * metrics over logged feedback are exposure-biased (popular items
    * get rated because they get shown); inverse-propensity weighting
    * (propensity ∝ train exposure share, weights clipped at 1000)
    * reweights hits toward the uniform-exposure estimand, and the
    * self-normalized (SNIPS) variant divides by each user's realized
    * weight mass to cut variance. Plain P@20 reported alongside —
    * three estimators, one scan of the recs. */
  val q150: Q = (spark, dir) => {
    val t = tagged(spark, dir)
    val train = Popularity.train(t)
      .filter(col("item_id").isNotNull && col("rating").isNotNull)
    val nT = train.agg(count(lit(1)).as("n_train"))
    val prop = train.groupBy("item_id").agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(nT))
      .select(col("item_id"),
        qround(col("cnt").cast("double") / col("n_train").cast("double"),
          6).as("p"))
    val w = popRecs(spark, dir).join(broadcast(prop), "item_id")
      .select(col("user_id"), col("item_id"),
        qround(least(lit(1.0) / col("p"), lit(1000.0)), 6)
          .cast("decimal(18,6)").as("w"))
    val truth = Popularity.validation(t)
      .filter(col("item_id").isNotNull)
      .select("user_id", "item_id").distinct().withColumn("hit", lit(1))
    val per = w.join(truth, Seq("user_id", "item_id"), "left")
      .groupBy("user_id")
      .agg(sum(when(col("hit") === 1, col("w"))
          .otherwise(lit(0).cast("decimal(18,6)"))).as("hit_w"),
        sum("w").as("tot_w"),
        sum(when(col("hit") === 1, 1L).otherwise(0L)).as("hits"))
    per.agg(count(lit(1)).as("n_users"), sum("hits").as("sh"),
        sum("hit_w").as("shw"),
        sum(qround(col("hit_w").cast("double") / col("tot_w").cast("double"),
          6).cast("decimal(18,6)")).as("ssn"))
      .select(col("n_users"),
        qround(col("sh").cast("double") /
          (col("n_users") * 20).cast("double"), 6).as("precision_at_20"),
        qround(col("shw").cast("double") /
          (col("n_users") * 20).cast("double"), 6).as("ips_at_20"),
        qround(col("ssn").cast("double") / col("n_users").cast("double"), 6)
          .as("snips_at_20"))
  }

  /** q152 — MMR diversified re-ranking
    * ([[graft.rec.Diversify.mmrRerank]]): the q50-style candidate lists
    * (top-20 unseen pool items, rel = rounded popularity score)
    * greedily re-ranked to 10 picks by λ·rel − μ·max-sim-to-selected
    * (λ=0.7, μ=0.3), with within-pool rating cosines
    * ([[graft.rec.Diversify.poolCosines]]) as the redundancy signal.
    * Oracle = the greedy unrolled as 10 chained CTE steps (the q49
    * PageRank technique applied to a sequential set-construction). */
  private def cleanTrain(spark: SparkSession, dir: String): DataFrame =
    Popularity.train(tagged(spark, dir))
      .filter(col("item_id").isNotNull && col("rating").isNotNull)

  /** The MMR candidate frame: (user_id, item_id, rel, rn ≤ 20) —
    * q50's construction with the ROUNDED pool score carried as `rel`
    * (rounded-score pool ordering, so q152/q153 share one oracle
    * definition of the candidate set). */
  private def roundedPool(spark: SparkSession, dir: String): DataFrame =
    cleanTrain(spark, dir).groupBy("item_id")
      .agg(qround(sum(qdec(col("rating"), 18, 2)).cast("double") /
        (count(lit(1)) + lit(100.0)), 6).as("rel"))
      .orderBy(col("rel").desc, col("item_id")).limit(50)

  private def mmrCands(spark: SparkSession, dir: String): DataFrame = {
    val train = cleanTrain(spark, dir)
    val users = Popularity.validation(tagged(spark, dir))
      .select("user_id").distinct()
    val seen = train.select("user_id", "item_id").distinct()
    users.crossJoin(broadcast(roundedPool(spark, dir)))
      .join(seen, Seq("user_id", "item_id"), "left_anti")
      .withColumn("rn", row_number().over(
        Window.partitionBy("user_id").orderBy("item_id")))
      .filter(col("rn") <= 20)
  }

  /** Memoized within-pool cosines — q152's redundancy signal and
    * q153's ILS numerator read the same tiny symmetric frame. */
  private def poolSims(spark: SparkSession, dir: String): DataFrame =
    graft.util.SessionMemo.cached(spark, s"pool-sims:$dir") {
      graft.rec.Diversify.poolCosines(cleanTrain(spark, dir),
        roundedPool(spark, dir).select("item_id"))
    }

  /** Memoized MMR lists (q152 output, q153 input). */
  private def mmrLists(spark: SparkSession, dir: String): DataFrame =
    graft.util.SessionMemo.cached(spark, s"mmr10:$dir")(
      graft.rec.Diversify.mmrRerank(mmrCands(spark, dir).drop("rn"),
        poolSims(spark, dir), relWeight = 0.7, divWeight = 0.3, k = 10))

  val q152: Q = (spark, dir) =>
    mmrLists(spark, dir).orderBy("user_id", "mmr_rank")

  /** q153 — list-quality report: mean intra-list similarity (ILS,
    * lower = more diverse) and mean novelty (−log₂ train-exposure
    * propensity, higher = less obvious) for the plain top-10 vs the
    * q152 MMR lists — the measurement that justifies re-ranking.
    * Per-user metrics reduce over ≤ 45-pair groups; everything joins
    * broadcast-sized frames. */
  val q153: Q = (spark, dir) => {
    val topk = mmrCands(spark, dir).filter(col("rn") <= 10)
      .select(lit("topk").as("method"), col("user_id"), col("item_id"))
    val mmr = mmrLists(spark, dir)
      .select(lit("mmr").as("method"), col("user_id"), col("item_id"))
    val lists = topk.unionByName(mmr)
    val a = lists.select(col("method"), col("user_id"),
      col("item_id").as("ia"))
    val b = lists.select(col("method"), col("user_id"),
      col("item_id").as("ib"))
    val ilsU = a.join(b, Seq("method", "user_id"))
      .filter(col("ia") < col("ib"))
      .join(poolSims(spark, dir), Seq("ia", "ib"), "left")
      .withColumn("sv", coalesce(col("sim"), lit(0.0)).cast("decimal(10,6)"))
      .groupBy("method", "user_id")
      .agg(qround(sum("sv").cast("double") / count(lit(1)).cast("double"), 6)
        .cast("decimal(18,6)").as("ils"))

    val train = cleanTrain(spark, dir)
    val nT = train.agg(count(lit(1)).as("n_train"))
    val prop = train.groupBy("item_id").agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(nT))
      .select(col("item_id"),
        qround(col("cnt").cast("double") / col("n_train").cast("double"), 6)
          .as("p"))
    val novU = lists.join(broadcast(prop), "item_id")
      .withColumn("nov",
        qround(-log(col("p")) / log(lit(2.0)), 6).cast("decimal(18,6)"))
      .groupBy("method", "user_id")
      .agg(qround(sum("nov").cast("double") / count(lit(1)).cast("double"), 6)
        .cast("decimal(18,6)").as("novelty"))

    ilsU.join(novU, Seq("method", "user_id"))
      .groupBy("method")
      .agg(count(lit(1)).as("n_users"),
        qround(sum("ils").cast("double") / count(lit(1)).cast("double"), 6)
          .as("mean_ils"),
        qround(sum("novelty").cast("double") / count(lit(1)).cast("double"),
          6).as("mean_novelty"))
      .orderBy("method")
  }

  /** q186 — structural audit of the ALS recommendation lists as an
    * ORACLE-GATED query. Iterative-ML VALUES have no SQL oracle (q52/q53
    * are rows-only by design), but the output's distributional contract
    * is exactly checkable: one list per validation user, exactly 20
    * dense ranks per list, items unique within a list, scores
    * non-increasing in rank. The oracle recomputes the expected user
    * count from raw events with the engine's own chronological-split
    * definition and pins every violation counter to zero — upgrading
    * the ALS family's gate from "produces rows" to "produces lists with
    * provably correct shape". Runs off the memoized q52/q53 top-20
    * frame, so the audit adds no extra cross-scoring.
    *
    * The expected list length is NOT a hard-coded 20: ALS can only rank
    * items that HAVE factors — the distinct trainable (non-NULL item,
    * non-NULL rating) items of the train split — so the contract is
    * `L = least(20, |trainable train items|)` per list (the ML fuzz
    * arm's one-item/3-item/cold-catalog fixtures all produce exact-L
    * lists, which the old 20-pin miscounted as violations). Likewise
    * `covers_all_val_users` compares against the val users a model CAN
    * cover: those with ≥1 trainable train row (a user absent from the
    * factor matrix is silently omitted by recommendForUserSubset — on
    * the main gate every val user trains, so the value is unchanged).
    * Empty-list aggregates coalesce to the oracle's literal zeros. */
  val q186: Q = (spark, dir) => {
    val t = tagged(spark, dir)
    val trainable = col("item_id").isNotNull && col("rating").isNotNull
    val li = Popularity.train(t).filter(trainable)
      .agg(least(countDistinct(col("item_id")), lit(20L)).as("li"))
    val w = Window.partitionBy("user_id").orderBy("rank")
    val flagged = alsRecs20(spark, dir)
      .withColumn("prev_score", lag(col("score"), 1).over(w))
      .withColumn("prev_rank", lag(col("rank"), 1).over(w))
    val perUser = flagged.groupBy("user_id").agg(
      count(lit(1)).as("n"),
      max(col("rank")).as("max_rank"),
      countDistinct(col("item_id")).as("n_items"),
      sum(when(col("prev_score").isNotNull &&
        col("score") > col("prev_score"), 1L).otherwise(0L))
        .as("inc_viol"),
      sum(when(col("prev_rank").isNotNull &&
        col("rank") =!= col("prev_rank") + 1, 1L).otherwise(0L))
        .as("gap_viol"))
    val nVal = Popularity.validation(t)
      .select("user_id").distinct()
      .join(Popularity.train(t).filter(trainable)
        .select("user_id").distinct(), Seq("user_id"), "left_semi")
      .agg(count(lit(1)).as("n_val_users"))
    perUser.crossJoin(broadcast(li)).agg(
        count(lit(1)).as("n_users"),
        coalesce(sum(col("n")), lit(0L)).as("n_rows"),
        coalesce(sum(when(col("n") =!= col("li") ||
          col("max_rank") =!= col("li") ||
          col("n_items") =!= col("li"), 1L).otherwise(0L)), lit(0L))
          .as("shape_viol"),
        coalesce(sum(col("inc_viol")), lit(0L)).as("score_viol"),
        coalesce(sum(col("gap_viol")), lit(0L)).as("rank_viol"))
      .crossJoin(broadcast(nVal))
      .select(col("n_users"), col("n_rows"),
        (col("n_users") === col("n_val_users")).cast("long")
          .as("covers_all_val_users"),
        col("shape_viol"), col("score_viol"), col("rank_viol"))
  }

  /** q190 — train/validation leakage audit of the chronological split:
    * how many validation (user, item) interactions also appear in train
    * (re-ratings of an already-seen item). A CHRONOLOGICAL split
    * legitimately carries such overlap — unlike a random split it never
    * leaks the FUTURE — but the overlap rate is exactly the quantity a
    * modeler must know before reading validation metrics: overlapping
    * pairs are trivially predictable from the train copy and inflate
    * apparent accuracy. One distinct-projection semi-join per side;
    * the rate is an int-quotient pinned DECIMAL. The leakage twin of
    * q82's corpus decontamination, applied to the rec split. */
  val q190: Q = (spark, dir) => {
    val t = tagged(spark, dir)
    val notNull = col("item_id").isNotNull && col("rating").isNotNull
    val tr = Popularity.train(t).filter(notNull)
      .select("user_id", "item_id").distinct()
    val va = Popularity.validation(t).filter(notNull)
      .select("user_id", "item_id").distinct()
    val nVal = va.agg(count(lit(1)).as("n_val_pairs"))
    val nOv = va.join(tr, Seq("user_id", "item_id"), "left_semi")
      .agg(count(lit(1)).as("n_overlap"))
    nVal.crossJoin(nOv)
      .select(col("n_val_pairs"), col("n_overlap"),
        // Empty validation: 0/0 throws under ANSI where DuckDB's native
        // x/0 is NULL — mirror the NULL (ML fuzz arm, one_rating_users).
        when(col("n_val_pairs") === 0L, lit(null).cast("double"))
          .otherwise(
            qround(col("n_overlap") * lit(100.0) / col("n_val_pairs"), 6))
          .as("overlap_pct"))
  }

  /** q240 — Brier score + Murphy (reliability/resolution/uncertainty)
    * decomposition of a probability forecast: per-cell "P(high-value
    * event)" rates fitted on the chronological first half, scored on
    * the second — the PROPER-score companion to q165's calibration
    * curve (q165 shows the reliability diagram; this prices it, and
    * says how much of the score is the forecast's skill vs the base
    * rate's entropy). Forecast cells are (event_type × user-bucket);
    * every p̂ and bin mean is quantized to a 6 dp DECIMAL before any
    * arithmetic touches it, so each (p̂−y)² term, Σ n_b(p̂_b−ȳ_b)² and
    * Σ n_b(ȳ_b−ȳ)² are EXACT decimal sums (merge-order-free), and the
    * only IEEE ops are the final audited divides — the q202 error-term
    * discipline applied to probability scoring. decomp_gap rides along:
    * with exact (unquantized) bin means it is identically 0; its
    * magnitude is the quantization noise, not a correctness signal. */
  val q240: Q = (spark, dir) => {
    val cutNs = 1705363200000000000L // 2024-01-16T00:00:00Z
    val e = Tables.events(spark, dir)
      .select(col("event_type"), (col("user_id") % 4).as("ubucket"),
        col("ts"), (col("value") >= 60.0).cast("int").as("y"))
    val cells = e.filter(col("ts") < cutNs)
      .groupBy("event_type", "ubucket")
      .agg(count(lit(1)).as("n_tr"), sum(col("y")).as("k_tr"))
      .select(col("event_type"), col("ubucket"),
        qround(col("k_tr").cast("double") / col("n_tr").cast("double"), 6)
          .cast("decimal(9,6)").as("phat"))
    val byBin = e.filter(col("ts") >= cutNs)
      .join(broadcast(cells), Seq("event_type", "ubucket"))
      .groupBy("event_type", "ubucket", "phat")
      .agg(count(lit(1)).as("n_b"), sum(col("y")).as("k_b"),
        sum(((col("phat") - col("y")) * (col("phat") - col("y")))
          .cast("decimal(28,12)")).as("sq_b"))
      .withColumn("ybar_b",
        qround(col("k_b").cast("double") / col("n_b").cast("double"), 6)
          .cast("decimal(9,6)"))
    val tot = byBin.agg(sum(col("n_b")).as("n_eval"),
        sum(col("k_b")).as("k_eval"),
        sum(col("sq_b")).cast("decimal(38,12)").as("sq_tot"))
      .withColumn("ybar",
        qround(col("k_eval").cast("double") / col("n_eval").cast("double"),
          6).cast("decimal(9,6)"))
    byBin.crossJoin(broadcast(tot))
      .groupBy("n_eval", "sq_tot", "ybar")
      .agg(
        sum((col("n_b").cast("decimal(12,0)") *
          ((col("phat") - col("ybar_b")) * (col("phat") - col("ybar_b"))))
          .cast("decimal(38,12)")).as("rel_sum"),
        sum((col("n_b").cast("decimal(12,0)") *
          ((col("ybar_b") - col("ybar")) * (col("ybar_b") - col("ybar"))))
          .cast("decimal(38,12)")).as("res_sum"))
      .select(col("n_eval"),
        qround(col("sq_tot").cast("double") /
          col("n_eval").cast("double"), 6).as("brier"),
        qround(col("rel_sum").cast("double") /
          col("n_eval").cast("double"), 6).as("reliability"),
        qround(col("res_sum").cast("double") /
          col("n_eval").cast("double"), 6).as("resolution"),
        qround(col("ybar").cast("double") *
          (lit(1.0) - col("ybar").cast("double")), 6).as("uncertainty"))
      .withColumn("decomp_gap", qround(
        col("brier") - (col("reliability") - col("resolution") +
          col("uncertainty")), 6))
  }

  /** q241 — cumulative gains / lift table (the targeting curve): rank
    * users by first-half engagement, split the ranking into 10 tiles,
    * and read off what share of second-half BUYERS each cumulative
    * prefix captures vs. the uniform baseline — the "call the top 20 %"
    * readout that turns q142's AUC into an operating decision. The
    * decile is the explicit closed form ((rank−1)·10) div N + 1 — OUR
    * definition, identical integer arithmetic in both engines — rather
    * than `ntile`, whose remainder-tile placement is engine-trust;
    * capture and lift are exact integer ppm via the (2·num·10⁶+den) div
    * (2·den) half-up idiom. The only global window runs over the
    * per-USER aggregate (|users| rows, never events); the 100 TB swap
    * is a range-partitioned rank over score cutpoints. */
  val q241: Q = (spark, dir) => {
    val cutNs = 1705363200000000000L // 2024-01-16T00:00:00Z
    val e = Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_type"))
    val score = e.filter(col("ts") < cutNs)
      .groupBy("user_id").agg(count(lit(1)).as("score"))
    val buyers = e.filter(col("ts") >= cutNs &&
        col("event_type") === "purchase")
      .select("user_id").distinct().withColumn("y", lit(1L))
    val scored = score.join(buyers, Seq("user_id"), "left")
      .withColumn("y", coalesce(col("y"), lit(0L)))
      .withColumn("rn", row_number().over(
        Window.orderBy(col("score").desc, col("user_id"))))
      .withColumn("n_total", count(lit(1)).over(
        Window.partitionBy(lit(1))))
      .withColumn("decile", expr("((rn - 1) * 10) div n_total + 1"))
    val byDec = scored.groupBy("decile")
      .agg(count(lit(1)).as("n_users"), sum(col("y")).as("n_buyers"))
    val wCum = Window.orderBy("decile")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(lit(1))
    byDec
      .withColumn("cum_users", sum(col("n_users")).over(wCum))
      .withColumn("cum_buyers", sum(col("n_buyers")).over(wCum))
      .withColumn("tot_users", sum(col("n_users")).over(wAll))
      .withColumn("tot_buyers", sum(col("n_buyers")).over(wAll))
      .select(col("decile"), col("n_users"), col("n_buyers"),
        col("cum_users"), col("cum_buyers"),
        expr("cast((2 * cast(cum_buyers as decimal(38,0)) * 1000000 + tot_buyers) div (2 * cast(tot_buyers as decimal(38,0))) as bigint)")
          .as("capture_ppm"),
        expr("cast((2 * cast(cum_buyers as decimal(38,0)) * tot_users * 1000000 + cast(tot_buyers as decimal(38,0)) * cum_users) div (2 * cast(tot_buyers as decimal(38,0)) * cum_users) as bigint)")
          .as("lift_ppm"))
      .orderBy("decile")
  }

  /** q257 — Qini / uplift curve: q241's targeting deciles re-scored for
    * an EXPERIMENT — per decile of the pre-period engagement ranking,
    * the treated-vs-control conversion gap (uplift) and the cumulative
    * Qini statistic, the readout that answers "whom does the treatment
    * actually MOVE" where q241 only answers "who converts anyway" (the
    * classic sure-thing/persuadable distinction). Treatment assignment
    * is q248's user_id parity; the decile is q241's explicit
    * ((rank−1)·10) div N + 1 closed form. Per-decile uplift quantizes
    * double ratios of exact counts (sign-safe — the div idiom's
    * floor/trunc negative-operand divergence never arises); the
    * cumulative Qini is kept as the EXACT signed integer
    * cum_conv_t·cum_n_c − cum_conv_c·cum_n_t (no division at all). */
  val q257: Q = (spark, dir) => {
    val cutNs = 1705363200000000000L // 2024-01-16T00:00:00Z
    val e = Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_type"),
        (col("user_id") % 2 === 0).as("treated"))
    val score = e.filter(col("ts") < cutNs)
      .groupBy("user_id", "treated").agg(count(lit(1)).as("score"))
    val buyers = e.filter(col("ts") >= cutNs &&
        col("event_type") === "purchase")
      .select("user_id").distinct().withColumn("y", lit(1L))
    val scored = score.join(buyers, Seq("user_id"), "left")
      .withColumn("y", coalesce(col("y"), lit(0L)))
      .withColumn("rn", row_number().over(
        Window.orderBy(col("score").desc, col("user_id"))))
      .withColumn("n_total", count(lit(1)).over(Window.partitionBy(lit(1))))
      .withColumn("decile", expr("((rn - 1) * 10) div n_total + 1"))
    val byDec = scored.groupBy("decile")
      .agg(sum(when(col("treated"), 1L).otherwise(0L)).as("n_t"),
        sum(when(!col("treated"), 1L).otherwise(0L)).as("n_c"),
        sum(when(col("treated"), col("y")).otherwise(0L)).as("conv_t"),
        sum(when(!col("treated"), col("y")).otherwise(0L)).as("conv_c"))
    val wCum = Window.orderBy("decile")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byDec
      .withColumn("cum_n_t", sum(col("n_t")).over(wCum))
      .withColumn("cum_n_c", sum(col("n_c")).over(wCum))
      .withColumn("cum_conv_t", sum(col("conv_t")).over(wCum))
      .withColumn("cum_conv_c", sum(col("conv_c")).over(wCum))
      .select(col("decile"), col("n_t"), col("n_c"), col("conv_t"),
        col("conv_c"),
        // tiny-SF deciles can have an empty arm — NULL uplift, mirrored
        when(col("n_t") > 0 && col("n_c") > 0,
          qround(col("conv_t").cast("double") / col("n_t").cast("double") -
            col("conv_c").cast("double") / col("n_c").cast("double"), 6))
          .as("uplift"),
        expr("cast(cast(cum_conv_t as decimal(38,0)) * cum_n_c - cast(cum_conv_c as decimal(38,0)) * cum_n_t as bigint)")
          .as("qini_scaled"))
      .orderBy("decile")
  }

  /** q284 — expected calibration error (ECE): Σ n_b·|ȳ_b − p̂_b| / N
    * over q240's forecast cells — the single calibration scalar modern
    * model cards report (q165 draws the reliability curve, q240 prices
    * the score; ECE answers "how far off is the stated confidence, on
    * average"). Both ȳ_b and p̂_b are 6 dp decimals, so every |gap| and
    * its n_b-weighted sum is EXACT decimal arithmetic — the only IEEE
    * op is the final audited divide. Max calibration error (the worst
    * bin) rides along. */
  val q284: Q = (spark, dir) => {
    val cutNs = 1705363200000000000L // 2024-01-16T00:00:00Z
    val e = Tables.events(spark, dir)
      .select(col("event_type"), (col("user_id") % 4).as("ubucket"),
        col("ts"), (col("value") >= 60.0).cast("int").as("y"))
    val cells = e.filter(col("ts") < cutNs)
      .groupBy("event_type", "ubucket")
      .agg(count(lit(1)).as("n_tr"), sum(col("y")).as("k_tr"))
      .select(col("event_type"), col("ubucket"),
        qround(col("k_tr").cast("double") / col("n_tr").cast("double"), 6)
          .cast("decimal(9,6)").as("phat"))
    e.filter(col("ts") >= cutNs)
      .join(broadcast(cells), Seq("event_type", "ubucket"))
      .groupBy("event_type", "ubucket", "phat")
      .agg(count(lit(1)).as("n_b"), sum(col("y")).as("k_b"))
      .withColumn("ybar_b",
        qround(col("k_b").cast("double") / col("n_b").cast("double"), 6)
          .cast("decimal(9,6)"))
      .withColumn("gap", abs(col("ybar_b") - col("phat")))
      .agg(sum(col("n_b")).as("n_eval"),
        count(lit(1)).as("n_bins"),
        sum((col("n_b").cast("decimal(12,0)") * col("gap"))
          .cast("decimal(28,6)")).cast("decimal(38,6)").as("wgap"),
        max(col("gap")).cast("decimal(9,6)").as("mce"))
      .select(col("n_eval"), col("n_bins"),
        qround(col("wgap").cast("double") / col("n_eval").cast("double"),
          6).as("ece"),
        col("mce").cast("double").as("mce"))
  }

  /** q358 — cold-start audit of the chronological split: how many
    * validation users/items never appear in train, and what share of
    * validation INTERACTIONS they carry — the number that says whether
    * offline metrics (q51/q53) even apply, since no collaborative model
    * can score an unseen entity (the reason q198's bias baseline and
    * q50's popularity pool exist as fallbacks). Two distinct-key
    * anti-joins against the memoized tagged frame; unseen key sets are
    * vanishing by construction, so the affected-row semi-join
    * broadcasts. Exact half-up ppm; 2-row output. */
  val q358: Q = (spark, dir) => {
    val t = tagged(spark, dir)
    val train = Popularity.train(t)
    val valid = Popularity.validation(t)
    def side(name: String, key: String): DataFrame = {
      val unseen = valid.select(col(key)).distinct()
        .join(train.select(col(key)).distinct(), Seq(key), "left_anti")
      val counts = valid.agg(
        countDistinct(col(key)).as("n_val_entities"),
        count(lit(1)).as("n_val_rows"))
      val aff = valid.join(broadcast(unseen), Seq(key), "left_semi")
        .agg(count(lit(1)).as("n_affected_rows"))
      val nu = unseen.agg(count(lit(1)).as("n_unseen"))
      counts.crossJoin(broadcast(nu)).crossJoin(broadcast(aff))
        .select(lit(name).as("entity"),
          col("n_val_entities"), col("n_unseen"),
          expr("cast((2 * n_unseen * 1000000 + n_val_entities) div (2 * n_val_entities) as bigint)")
            .as("unseen_ppm"),
          col("n_val_rows"), col("n_affected_rows"),
          expr("cast((2 * n_affected_rows * 1000000 + n_val_rows) div (2 * n_val_rows) as bigint)")
            .as("affected_rows_ppm"))
    }
    side("item", "item_id").unionByName(side("user", "user_id"))
      .orderBy("entity")
  }

  /** q360 — recommendation novelty (mean self-information): per
    * validation user, −Σ ln(train-share of each recommended item) / k
    * over q50's top-20 — the "are we only recommending blockbusters"
    * metric beside q138's exposure counts (novelty is LOW when every
    * list is the global head). Item shares come from one train-side
    * aggregate; each item's −ln share quantizes to DECIMAL(28,9) once,
    * so per-user sums are exact; the only data-sized work is the
    * memoized rec frame join. */
  val q360: Q = (spark, dir) => {
    val t = tagged(spark, dir)
    val train = Popularity.train(t)
    val totF = train.agg(count(lit(1)).as("n_train"))
    val pop = train.groupBy("item_id").agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(totF))
      .select(col("item_id"), graft.functions.GraftFunctions.qdec(
        -log(col("cnt").cast("double") / col("n_train").cast("double")),
        28, 9).as("selfinfo_q"))
    popRecs(spark, dir)
      .join(pop, Seq("item_id"), "left")
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_recs"),
        sum(col("selfinfo_q")).as("si_sum"),
        sum(when(col("selfinfo_q").isNull, 1L).otherwise(0L))
          .as("n_unscored"))
      .select(col("user_id"), col("n_recs"),
        qround(col("si_sum").cast("double") /
          (col("n_recs") - col("n_unscored")).cast("double"), 6)
          .as("novelty_nats"),
        col("n_unscored"))
      .orderBy("user_id")
  }

  /** q365 — hit-rate@k sweep over q50's lists (k = 1/5/10/20): the
    * "did ANY relevant item make the top-k" metric — coarser than
    * q51's MAP/NDCG but the one a UI with k slots actually experiences,
    * and the sweep shows where extra slots stop paying. ONE
    * recs⋈truth join builds each user's best matching rank; every k
    * then reads that |users|-row frame — a 4-point sweep costs one
    * pipeline, not four (the q145/metricsBy discipline). Exact counts,
    * half-up ppm. */
  val q365: Q = (spark, dir) => {
    val t = tagged(spark, dir)
    val truth = Popularity.validation(t)
      .select("user_id", "item_id").distinct()
    val den = truth.select("user_id").distinct()
      .agg(count(lit(1)).as("n_users"))
    val minRank = popRecs(spark, dir)
      .join(truth, Seq("user_id", "item_id"))
      .groupBy("user_id").agg(min(col("rank")).as("best_rank"))
    Seq(1, 5, 10, 20).map { k =>
      minRank.agg(sum(when(col("best_rank") <= k, 1L).otherwise(0L))
          .as("n_hit"))
        .crossJoin(broadcast(den))
        .select(lit(k.toLong).as("k"), col("n_users"),
          coalesce(col("n_hit"), lit(0L)).as("n_hit"))
        .withColumn("hitrate_ppm",
          expr("cast((2 * n_hit * 1000000 + n_users) div (2 * n_users) as bigint)"))
    }.reduce(_ unionByName _)
      .orderBy("k")
  }

  val queries: Map[String, Q] = Map(
    "q365_hitrate_sweep" -> q365,
    "q358_coldstart_audit" -> q358,
    "q360_rec_novelty" -> q360,
    "q284_calibration_ece" -> q284,
    "q257_qini_uplift" -> q257,
    "q240_brier_decomposition" -> q240,
    "q241_gains_lift" -> q241,
    "q190_split_leakage" -> q190,
    "q186_als_audit" -> q186,
    "q116_negative_samples" -> q116,
    "q136_item_cf" -> q136,
    "q139_item_cf_rmse" -> q139,
    "q198_bias_baseline" -> q198,
    "q142_popularity_auc" -> q142,
    "q145_bias_cv" -> q145,
    "q149_conformal" -> q149,
    "q165_calibration" -> q165,
    "q150_ips_eval" -> q150,
    "q152_mmr_rerank" -> q152,
    "q153_list_quality" -> q153,
    "q138_rec_exposure" -> q138,
    "q50_popularity_recs" -> q50,
    "q51_popularity_metrics" -> q51,
    "q52_als_recs" -> q52,
    "q53_als_eval" -> q53,
    "q54_bias_sweep" -> q54,
    "q55_als_grid" -> q55,
    "q56_als_test_eval" -> q56)

  // Oracle: the whole popularity pipeline + metrics in SQL.
  private val pipelineCte =
    """r AS (
      |  SELECT user_id, CAST(json_extract_string(props, '$.k') AS INT) AS item_id,
      |    value AS rating,
      |    row_number() OVER (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id) AS rn,
      |    COUNT(*) OVER (PARTITION BY user_id) AS n
      |  FROM events),
      |tagged AS (
      |  SELECT user_id, item_id, rating,
      |    CAST(FLOOR(((rn - 1)::DOUBLE / n) * 5) AS INT) AS split
      |  FROM r),
      |train AS (SELECT * FROM tagged WHERE split <= 2),
      |val AS (SELECT * FROM tagged WHERE split = 3),
      |pool AS (
      |  SELECT item_id FROM (
      |    SELECT item_id, COUNT(*) AS cnt,
      |      CAST(SUM(CAST(floor(rating * 100.0 + 0.5) / 100.0 AS DECIMAL(18,2))) AS DOUBLE) / (COUNT(*) + 100.0) AS score
      |    FROM train GROUP BY item_id)
      |  ORDER BY score DESC, item_id LIMIT 50),
      |vusers AS (SELECT DISTINCT user_id FROM val),
      |seen AS (SELECT DISTINCT user_id, item_id FROM train),
      |unseen AS (
      |  SELECT c.user_id, c.item_id
      |  FROM (SELECT u.user_id, p.item_id FROM vusers u CROSS JOIN pool p) c
      |  WHERE NOT EXISTS (SELECT 1 FROM seen s
      |                    WHERE s.user_id = c.user_id AND s.item_id = c.item_id)),
      |recs AS (
      |  SELECT user_id, item_id, rank FROM (
      |    SELECT user_id, item_id,
      |      CAST(row_number() OVER (PARTITION BY user_id ORDER BY item_id) AS INT) AS rank
      |    FROM unseen)
      |  WHERE rank <= 20)""".stripMargin

  /** q152 oracle: the greedy MMR loop unrolled as chained CTE steps —
    * pick n joins the not-yet-picked candidates against picked set n−1
    * for the max-similarity penalty, QUALIFY-style row_number picks the
    * arg-max, and picked_n = picked_{n−1} ∪ pick_n. Score literals
    * (0.7/0.3) are written identically to the engine's parameters. */
  private def mmrOracle: String =
    s"""WITH $mmrCoreCtes
       |SELECT user_id, item_id, CAST(step AS INT) AS mmr_rank,
       |  score AS mmr_score
       |FROM picked10 ORDER BY user_id, mmr_rank""".stripMargin

  /** Shared CTE chain of the MMR family (q152/q153): candidates, pool
    * sims, and the 10 unrolled greedy steps through `picked10`. */
  private def mmrCoreCtes: String = {
    val steps = (2 to 10).map { n =>
      s"""p$n AS MATERIALIZED (
         |  SELECT user_id, item_id, score, $n AS step FROM (
         |    SELECT x.user_id, x.item_id,
         |      0.7 * x.rel - 0.3 * x.pen AS score,
         |      row_number() OVER (PARTITION BY x.user_id
         |        ORDER BY 0.7 * x.rel - 0.3 * x.pen DESC, x.item_id) AS rn
         |    FROM (
         |      SELECT c.user_id, c.item_id, c.rel,
         |        MAX(COALESCE(s.sim, 0.0)) AS pen
         |      FROM cand c
         |      JOIN picked${n - 1} p ON p.user_id = c.user_id
         |      LEFT JOIN sims s
         |        ON s.ia = c.item_id AND s.ib = p.item_id
         |      WHERE NOT EXISTS (SELECT 1 FROM picked${n - 1} q
         |        WHERE q.user_id = c.user_id AND q.item_id = c.item_id)
         |      GROUP BY 1, 2, 3) x)
         |  WHERE rn = 1),
         |picked$n AS MATERIALIZED (SELECT * FROM picked${n - 1}
         |             UNION ALL SELECT * FROM p$n)""".stripMargin
    }.mkString(",\n")
    s"""r AS (
       |  SELECT user_id, CAST(json_extract_string(props, '$$.k') AS INT) AS item_id,
       |    value AS rating, ts, event_id,
       |    row_number() OVER (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id) AS rn,
       |    COUNT(*) OVER (PARTITION BY user_id) AS n
       |  FROM events),
       |tagged AS (
       |  SELECT user_id, item_id, rating, ts, event_id,
       |    CAST(FLOOR(((rn - 1)::DOUBLE / n) * 5) AS INT) AS split
       |  FROM r),
       |train AS (SELECT * FROM tagged WHERE split <= 2
       |          AND item_id IS NOT NULL AND rating IS NOT NULL),
       |pool AS (
       |  SELECT item_id,
       |    floor((CAST(SUM(CAST(floor(rating * 100.0 + 0.5) / 100.0 AS DECIMAL(18,2))) AS DOUBLE)
       |      / (COUNT(*) + 100.0)) * 1000000.0 + 0.5) / 1000000.0 AS rel
       |  FROM train GROUP BY 1 ORDER BY rel DESC, item_id LIMIT 50),
       |vusers AS (SELECT DISTINCT user_id FROM tagged WHERE split = 3),
       |seen AS (SELECT DISTINCT user_id, item_id FROM train),
       |cand0 AS MATERIALIZED (
       |  SELECT user_id, item_id, rel, rn FROM (
       |    SELECT u.user_id, p.item_id, p.rel,
       |      row_number() OVER (PARTITION BY u.user_id
       |        ORDER BY p.item_id) AS rn
       |    FROM vusers u CROSS JOIN pool p
       |    WHERE NOT EXISTS (SELECT 1 FROM seen s
       |      WHERE s.user_id = u.user_id AND s.item_id = p.item_id))
       |  WHERE rn <= 20),
       |cand AS (SELECT user_id, item_id, rel FROM cand0),
       |tr0 AS (
       |  SELECT user_id, item_id, rating,
       |    row_number() OVER (PARTITION BY user_id, item_id
       |      ORDER BY epoch_ns(ts) DESC, event_id DESC) AS rn
       |  FROM train),
       |tru AS (SELECT user_id, item_id,
       |          CAST(floor(rating * 100.0 + 0.5) AS BIGINT) AS rr
       |        FROM tr0 WHERE rn = 1),
       |trp AS (SELECT t.* FROM tru t
       |        WHERE EXISTS (SELECT 1 FROM pool p
       |                      WHERE p.item_id = t.item_id)),
       |st AS (SELECT item_id, SUM(rr * rr) AS norm2 FROM trp GROUP BY 1),
       |pr AS (
       |  SELECT a.item_id AS ia, b.item_id AS ib, SUM(a.rr * b.rr) AS dot
       |  FROM trp a JOIN trp b
       |    ON a.user_id = b.user_id AND a.item_id < b.item_id
       |  GROUP BY 1, 2),
       |sym AS (SELECT ia, ib, dot FROM pr
       |        UNION ALL SELECT ib, ia, dot FROM pr),
       |sims AS MATERIALIZED (
       |  SELECT s.ia, s.ib,
       |    floor((CAST(s.dot AS DOUBLE) /
       |      (sqrt(CAST(x.norm2 AS DOUBLE)) * sqrt(CAST(y.norm2 AS DOUBLE))))
       |      * 1000000.0 + 0.5) / 1000000.0 AS sim
       |  FROM sym s JOIN st x ON x.item_id = s.ia
       |             JOIN st y ON y.item_id = s.ib),
       |p1 AS (
       |  SELECT user_id, item_id, score, 1 AS step FROM (
       |    SELECT user_id, item_id, 0.7 * rel - 0.3 * 0.0 AS score,
       |      row_number() OVER (PARTITION BY user_id
       |        ORDER BY 0.7 * rel DESC, item_id) AS rn
       |    FROM cand) WHERE rn = 1),
       |picked1 AS MATERIALIZED (SELECT * FROM p1),
       |$steps""".stripMargin
  }

  /** q153 oracle: the same core chain, finished with the ILS/novelty
    * metric CTEs over the plain top-10 slice vs the MMR picks. */
  private def listQualityOracle: String =
    s"""WITH $mmrCoreCtes,
       |lists AS MATERIALIZED (
       |  SELECT 'topk' AS method, user_id, item_id FROM cand0
       |  WHERE rn <= 10
       |  UNION ALL
       |  SELECT 'mmr' AS method, user_id, item_id FROM picked10),
       |prs AS (
       |  SELECT l1.method, l1.user_id,
       |    CAST(COALESCE(s.sim, 0.0) AS DECIMAL(10,6)) AS sv
       |  FROM lists l1 JOIN lists l2
       |    ON l2.method = l1.method AND l2.user_id = l1.user_id
       |   AND l1.item_id < l2.item_id
       |  LEFT JOIN sims s ON s.ia = l1.item_id AND s.ib = l2.item_id),
       |ilsu AS (
       |  SELECT method, user_id,
       |    CAST(floor((CAST(SUM(sv) AS DOUBLE) / COUNT(*)) * 1000000.0 + 0.5) / 1000000.0
       |      AS DECIMAL(18,6)) AS ils
       |  FROM prs GROUP BY 1, 2),
       |nt AS (SELECT COUNT(*) AS n_train FROM train),
       |prop AS (
       |  SELECT item_id, floor((COUNT(*)::DOUBLE / nt.n_train) * 1000000.0 + 0.5) / 1000000.0 AS p
       |  FROM train CROSS JOIN nt GROUP BY item_id, nt.n_train),
       |novu AS (
       |  SELECT l.method, l.user_id,
       |    CAST(floor((CAST(SUM(CAST(floor((-ln(p.p) / ln(2.0)) * 1000000.0 + 0.5) / 1000000.0
       |        AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*)) * 1000000.0 + 0.5) / 1000000.0
       |      AS DECIMAL(18,6)) AS novelty
       |  FROM lists l JOIN prop p ON p.item_id = l.item_id
       |  GROUP BY 1, 2)
       |SELECT i.method, CAST(COUNT(*) AS BIGINT) AS n_users,
       |  floor((CAST(SUM(i.ils) AS DOUBLE) / COUNT(*)) * 1000000.0 + 0.5) / 1000000.0 AS mean_ils,
       |  floor((CAST(SUM(n.novelty) AS DOUBLE) / COUNT(*)) * 1000000.0 + 0.5) / 1000000.0
       |    AS mean_novelty
       |FROM ilsu i JOIN novu n
       |  ON n.method = i.method AND n.user_id = i.user_id
       |GROUP BY 1 ORDER BY 1""".stripMargin

  val oracles: Map[String, String] = Map(
    "q365_hitrate_sweep" ->
      s"""WITH $pipelineCte,
         |truth AS (SELECT DISTINCT user_id, item_id FROM val),
         |den AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
         |        FROM truth),
         |mr AS (
         |  SELECT r.user_id, MIN(r.rank) AS best_rank
         |  FROM recs r JOIN truth t
         |    ON t.user_id = r.user_id AND t.item_id = r.item_id
         |  GROUP BY 1),
         |ks AS (SELECT CAST(unnest([1, 5, 10, 20]) AS BIGINT) AS k),
         |arm AS (
         |  SELECT k, n_users,
         |    (SELECT CAST(COALESCE(SUM(CASE WHEN best_rank <= ks.k
         |      THEN 1 ELSE 0 END), 0) AS BIGINT) FROM mr) AS n_hit
         |  FROM ks, den)
         |SELECT k, n_users, n_hit,
         |  CAST((2 * n_hit * 1000000 + n_users) // (2 * n_users) AS BIGINT)
         |    AS hitrate_ppm
         |FROM arm ORDER BY k""".stripMargin,
    "q358_coldstart_audit" ->
      s"""WITH $pipelineCte,
         |arm AS (
         |  SELECT 'item' AS entity,
         |    (SELECT CAST(COUNT(DISTINCT item_id) AS BIGINT) FROM val)
         |      AS n_val_entities,
         |    (SELECT CAST(COUNT(*) AS BIGINT) FROM
         |      (SELECT DISTINCT item_id FROM val WHERE item_id NOT IN
         |        (SELECT DISTINCT item_id FROM train))) AS n_unseen,
         |    (SELECT CAST(COUNT(*) AS BIGINT) FROM val) AS n_val_rows,
         |    (SELECT CAST(COUNT(*) AS BIGINT) FROM val WHERE item_id NOT IN
         |      (SELECT DISTINCT item_id FROM train)) AS n_affected_rows
         |  UNION ALL
         |  SELECT 'user',
         |    (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) FROM val),
         |    (SELECT CAST(COUNT(*) AS BIGINT) FROM
         |      (SELECT DISTINCT user_id FROM val WHERE user_id NOT IN
         |        (SELECT DISTINCT user_id FROM train))),
         |    (SELECT CAST(COUNT(*) AS BIGINT) FROM val),
         |    (SELECT CAST(COUNT(*) AS BIGINT) FROM val WHERE user_id NOT IN
         |      (SELECT DISTINCT user_id FROM train)))
         |SELECT entity, n_val_entities, n_unseen,
         |  CAST((2 * n_unseen * 1000000 + n_val_entities)
         |    // (2 * n_val_entities) AS BIGINT) AS unseen_ppm,
         |  n_val_rows, n_affected_rows,
         |  CAST((2 * n_affected_rows * 1000000 + n_val_rows)
         |    // (2 * n_val_rows) AS BIGINT) AS affected_rows_ppm
         |FROM arm ORDER BY entity""".stripMargin,
    "q360_rec_novelty" ->
      s"""WITH $pipelineCte,
         |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_train FROM train),
         |pop AS (
         |  SELECT item_id,
         |    CAST(floor(-ln(CAST(COUNT(*) AS DOUBLE) / n_train)
         |      * 1000000000.0 + 0.5) / 1000000000.0 AS DECIMAL(28,9))
         |      AS selfinfo_q
         |  FROM train, tot GROUP BY item_id, n_train)
         |SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_recs,
         |  floor(CAST(SUM(selfinfo_q) AS DOUBLE)
         |      / (COUNT(*) - SUM(CASE WHEN selfinfo_q IS NULL THEN 1
         |        ELSE 0 END))
         |    * 1000000.0 + 0.5) / 1000000.0 AS novelty_nats,
         |  CAST(SUM(CASE WHEN selfinfo_q IS NULL THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_unscored
         |FROM recs LEFT JOIN pop USING (item_id)
         |GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q284_calibration_ece" ->
      """WITH e AS (
        |  SELECT event_type, user_id % 4 AS ubucket, epoch_ns(ts) AS tns,
        |    CASE WHEN value >= 60.0 THEN 1 ELSE 0 END AS y
        |  FROM events),
        |cells AS (
        |  SELECT event_type, ubucket,
        |    CAST(floor((CAST(SUM(y) AS DOUBLE) / CAST(count(*) AS DOUBLE))
        |      * 1000000.0 + 0.5) / 1000000.0 AS DECIMAL(9,6)) AS phat
        |  FROM e WHERE tns < 1705363200000000000 GROUP BY 1, 2),
        |bins AS (
        |  SELECT e.event_type, e.ubucket, c.phat,
        |    CAST(count(*) AS BIGINT) AS n_b,
        |    CAST(SUM(e.y) AS BIGINT) AS k_b
        |  FROM e JOIN cells c USING (event_type, ubucket)
        |  WHERE e.tns >= 1705363200000000000
        |  GROUP BY 1, 2, 3),
        |b2 AS (
        |  SELECT *,
        |    abs(CAST(floor((CAST(k_b AS DOUBLE) / CAST(n_b AS DOUBLE))
        |      * 1000000.0 + 0.5) / 1000000.0 AS DECIMAL(9,6)) - phat)
        |      AS gap
        |  FROM bins),
        |agg AS (
        |  SELECT CAST(SUM(n_b) AS BIGINT) AS n_eval,
        |    CAST(count(*) AS BIGINT) AS n_bins,
        |    CAST(SUM(CAST(CAST(n_b AS DECIMAL(12,0)) * gap
        |      AS DECIMAL(28,6))) AS DECIMAL(38,6)) AS wgap,
        |    CAST(MAX(gap) AS DECIMAL(9,6)) AS mce
        |  FROM b2)
        |SELECT n_eval, n_bins,
        |  floor((CAST(wgap AS DOUBLE) / CAST(n_eval AS DOUBLE))
        |    * 1000000.0 + 0.5) / 1000000.0 AS ece,
        |  CAST(mce AS DOUBLE) AS mce
        |FROM agg""".stripMargin,
    "q257_qini_uplift" ->
      """WITH e AS (
        |  SELECT user_id, epoch_ns(ts) AS tns, event_type,
        |    user_id % 2 = 0 AS treated
        |  FROM events),
        |s AS (
        |  SELECT user_id, treated, CAST(count(*) AS BIGINT) AS score
        |  FROM e WHERE tns < 1705363200000000000 GROUP BY 1, 2),
        |b AS (
        |  SELECT DISTINCT user_id FROM e
        |  WHERE tns >= 1705363200000000000 AND event_type = 'purchase'),
        |r AS (
        |  SELECT s.user_id, s.treated, s.score,
        |    CASE WHEN b.user_id IS NULL THEN 0 ELSE 1 END AS y,
        |    row_number() OVER (ORDER BY s.score DESC, s.user_id) AS rn,
        |    COUNT(*) OVER () AS n_total
        |  FROM s LEFT JOIN b ON s.user_id = b.user_id),
        |d AS (
        |  SELECT ((rn - 1) * 10) // n_total + 1 AS decile, treated, y
        |  FROM r),
        |g AS (
        |  SELECT decile,
        |    CAST(SUM(CASE WHEN treated THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_t,
        |    CAST(SUM(CASE WHEN NOT treated THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_c,
        |    CAST(SUM(CASE WHEN treated THEN y ELSE 0 END) AS BIGINT)
        |      AS conv_t,
        |    CAST(SUM(CASE WHEN NOT treated THEN y ELSE 0 END) AS BIGINT)
        |      AS conv_c
        |  FROM d GROUP BY 1),
        |c AS (
        |  SELECT *,
        |    SUM(n_t) OVER w AS cum_n_t, SUM(n_c) OVER w AS cum_n_c,
        |    SUM(conv_t) OVER w AS cum_conv_t,
        |    SUM(conv_c) OVER w AS cum_conv_c
        |  FROM g
        |  WINDOW w AS (ORDER BY decile ROWS UNBOUNDED PRECEDING))
        |SELECT decile, n_t, n_c, conv_t, conv_c,
        |  CASE WHEN n_t > 0 AND n_c > 0 THEN
        |    floor((CAST(conv_t AS DOUBLE) / CAST(n_t AS DOUBLE)
        |      - CAST(conv_c AS DOUBLE) / CAST(n_c AS DOUBLE)) * 1000000.0
        |      + 0.5) / 1000000.0 END AS uplift,
        |  CAST(CAST(cum_conv_t AS HUGEINT) * cum_n_c
        |    - CAST(cum_conv_c AS HUGEINT) * cum_n_t AS BIGINT)
        |    AS qini_scaled
        |FROM c ORDER BY decile""".stripMargin,
    "q240_brier_decomposition" ->
      """WITH e AS (
        |  SELECT event_type, user_id % 4 AS ubucket, epoch_ns(ts) AS tns,
        |    CASE WHEN value >= 60.0 THEN 1 ELSE 0 END AS y
        |  FROM events),
        |cells AS (
        |  SELECT event_type, ubucket,
        |    CAST(floor((CAST(SUM(y) AS DOUBLE) / CAST(count(*) AS DOUBLE))
        |      * 1000000.0 + 0.5) / 1000000.0 AS DECIMAL(9,6)) AS phat
        |  FROM e WHERE tns < 1705363200000000000 GROUP BY 1, 2),
        |bins AS (
        |  SELECT e.event_type, e.ubucket, c.phat,
        |    CAST(count(*) AS BIGINT) AS n_b,
        |    CAST(SUM(e.y) AS BIGINT) AS k_b,
        |    SUM(CAST((c.phat - e.y) * (c.phat - e.y) AS DECIMAL(28,12)))
        |      AS sq_b
        |  FROM e JOIN cells c USING (event_type, ubucket)
        |  WHERE e.tns >= 1705363200000000000
        |  GROUP BY 1, 2, 3),
        |bins2 AS (
        |  SELECT *, CAST(floor((CAST(k_b AS DOUBLE) / CAST(n_b AS DOUBLE))
        |    * 1000000.0 + 0.5) / 1000000.0 AS DECIMAL(9,6)) AS ybar_b
        |  FROM bins),
        |tot AS (
        |  SELECT CAST(SUM(n_b) AS BIGINT) AS n_eval,
        |    CAST(SUM(k_b) AS BIGINT) AS k_eval,
        |    CAST(SUM(sq_b) AS DECIMAL(38,12)) AS sq_tot
        |  FROM bins2),
        |tot2 AS (
        |  SELECT *, CAST(floor((CAST(k_eval AS DOUBLE)
        |    / CAST(n_eval AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0
        |    AS DECIMAL(9,6)) AS ybar
        |  FROM tot),
        |m AS (
        |  SELECT t.n_eval, t.sq_tot, t.ybar,
        |    CAST(SUM(CAST(b.n_b AS DECIMAL(12,0)) *
        |      ((b.phat - b.ybar_b) * (b.phat - b.ybar_b)))
        |      AS DECIMAL(38,12)) AS rel_sum,
        |    CAST(SUM(CAST(b.n_b AS DECIMAL(12,0)) *
        |      ((b.ybar_b - t.ybar) * (b.ybar_b - t.ybar)))
        |      AS DECIMAL(38,12)) AS res_sum
        |  FROM bins2 b CROSS JOIN tot2 t
        |  GROUP BY 1, 2, 3),
        |f AS (
        |  SELECT n_eval,
        |    floor((CAST(sq_tot AS DOUBLE) / CAST(n_eval AS DOUBLE))
        |      * 1000000.0 + 0.5) / 1000000.0 AS brier,
        |    floor((CAST(rel_sum AS DOUBLE) / CAST(n_eval AS DOUBLE))
        |      * 1000000.0 + 0.5) / 1000000.0 AS reliability,
        |    floor((CAST(res_sum AS DOUBLE) / CAST(n_eval AS DOUBLE))
        |      * 1000000.0 + 0.5) / 1000000.0 AS resolution,
        |    floor((CAST(ybar AS DOUBLE) * (1.0 - CAST(ybar AS DOUBLE)))
        |      * 1000000.0 + 0.5) / 1000000.0 AS uncertainty
        |  FROM m)
        |SELECT n_eval, brier, reliability, resolution, uncertainty,
        |  floor((brier - (reliability - resolution + uncertainty))
        |    * 1000000.0 + 0.5) / 1000000.0 AS decomp_gap
        |FROM f""".stripMargin,
    "q241_gains_lift" ->
      """WITH e AS (
        |  SELECT user_id, epoch_ns(ts) AS tns, event_type FROM events),
        |s AS (
        |  SELECT user_id, CAST(count(*) AS BIGINT) AS score FROM e
        |  WHERE tns < 1705363200000000000 GROUP BY 1),
        |b AS (
        |  SELECT DISTINCT user_id FROM e
        |  WHERE tns >= 1705363200000000000 AND event_type = 'purchase'),
        |r AS (
        |  SELECT s.user_id, s.score,
        |    CASE WHEN b.user_id IS NULL THEN 0 ELSE 1 END AS y,
        |    row_number() OVER (ORDER BY s.score DESC, s.user_id) AS rn,
        |    COUNT(*) OVER () AS n_total
        |  FROM s LEFT JOIN b ON s.user_id = b.user_id),
        |d AS (SELECT ((rn - 1) * 10) // n_total + 1 AS decile, y FROM r),
        |g AS (
        |  SELECT decile, CAST(count(*) AS BIGINT) AS n_users,
        |    CAST(SUM(y) AS BIGINT) AS n_buyers
        |  FROM d GROUP BY 1),
        |c AS (
        |  SELECT decile, n_users, n_buyers,
        |    CAST(SUM(n_users) OVER (ORDER BY decile
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_users,
        |    CAST(SUM(n_buyers) OVER (ORDER BY decile
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_buyers,
        |    CAST(SUM(n_users) OVER () AS BIGINT) AS tot_users,
        |    CAST(SUM(n_buyers) OVER () AS BIGINT) AS tot_buyers
        |  FROM g)
        |SELECT decile, n_users, n_buyers, cum_users, cum_buyers,
        |  CAST((2 * CAST(cum_buyers AS HUGEINT) * 1000000 + tot_buyers)
        |    // (2 * CAST(tot_buyers AS HUGEINT)) AS BIGINT) AS capture_ppm,
        |  CAST((2 * CAST(cum_buyers AS HUGEINT) * tot_users * 1000000
        |      + CAST(tot_buyers AS HUGEINT) * cum_users)
        |    // (2 * CAST(tot_buyers AS HUGEINT) * cum_users) AS BIGINT)
        |    AS lift_ppm
        |FROM c ORDER BY decile""".stripMargin,
    "q198_bias_baseline" ->
      s"""WITH $pipelineCte,
         |trainf AS (
         |  SELECT user_id, item_id,
         |    CAST(floor(rating * 100.0 + 0.5) / 100.0 AS DECIMAL(18,2)) AS r
         |  FROM train WHERE item_id IS NOT NULL AND rating IS NOT NULL),
         |g AS (
         |  SELECT floor((CAST(SUM(r) AS DOUBLE) / count(*)) * 1000000.0
         |    + 0.5) / 1000000.0 AS mu
         |  FROM trainf),
         |gi AS (
         |  SELECT item_id,
         |    floor((CAST(SUM(r - CAST(g.mu AS DECIMAL(18,6))) AS DOUBLE)
         |      / (10.0 + count(*))) * 1000000.0 + 0.5) / 1000000.0 AS b_i
         |  FROM trainf CROSS JOIN g GROUP BY item_id, g.mu),
         |gu AS (
         |  SELECT t.user_id,
         |    floor((CAST(SUM(t.r - CAST(g.mu AS DECIMAL(18,6))
         |        - CAST(gi.b_i AS DECIMAL(18,6))) AS DOUBLE)
         |      / (15.0 + count(*))) * 1000000.0 + 0.5) / 1000000.0 AS b_u
         |  FROM trainf t JOIN gi ON gi.item_id = t.item_id CROSS JOIN g
         |  GROUP BY t.user_id),
         |valf AS (
         |  SELECT user_id, item_id,
         |    CAST(floor(rating * 100.0 + 0.5) / 100.0 AS DECIMAL(18,2)) AS r
         |  FROM val WHERE item_id IS NOT NULL AND rating IS NOT NULL),
         |pred AS (
         |  SELECT v.r, gi.b_i IS NOT NULL AS known_i,
         |    gu.b_u IS NOT NULL AS known_u,
         |    CAST(floor(least(greatest(g.mu + coalesce(gi.b_i, 0.0)
         |        + coalesce(gu.b_u, 0.0), 0.0), 500.0) * 1000000.0 + 0.5)
         |      / 1000000.0 AS DECIMAL(18,6)) AS p
         |  FROM valf v
         |  LEFT JOIN gi ON gi.item_id = v.item_id
         |  LEFT JOIN gu ON gu.user_id = v.user_id
         |  CROSS JOIN g),
         |e AS (SELECT known_i, known_u,
         |        CAST(r AS DECIMAL(18,6)) - p AS e FROM pred)
         |SELECT CAST(count(*) AS BIGINT) AS n_rows,
         |  CAST(SUM(CASE WHEN known_i THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_known_item,
         |  CAST(SUM(CASE WHEN known_u THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_known_user,
         |  floor((g.mu) * 1000000.0 + 0.5) / 1000000.0 AS mu,
         |  floor(sqrt(CAST(SUM(e * e) AS DOUBLE) / count(*)) * 1000000.0
         |    + 0.5) / 1000000.0 AS rmse,
         |  floor((CAST(SUM(abs(e)) AS DOUBLE) / count(*)) * 1000000.0
         |    + 0.5) / 1000000.0 AS mae
         |FROM e CROSS JOIN g GROUP BY g.mu""".stripMargin,
    "q190_split_leakage" ->
      """WITH r AS (
        |  SELECT user_id,
        |    CAST(json_extract_string(props, '$.k') AS INT) AS item_id,
        |    value AS rating,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY epoch_ns(ts), event_id) AS rn,
        |    COUNT(*) OVER (PARTITION BY user_id) AS n
        |  FROM events),
        |tagged AS (
        |  SELECT user_id, item_id, rating,
        |    CAST(FLOOR(((rn - 1)::DOUBLE / n) * 5) AS INT) AS split
        |  FROM r),
        |tr AS (SELECT DISTINCT user_id, item_id FROM tagged
        |       WHERE split <= 2 AND item_id IS NOT NULL
        |         AND rating IS NOT NULL),
        |va AS (SELECT DISTINCT user_id, item_id FROM tagged
        |       WHERE split = 3 AND item_id IS NOT NULL
        |         AND rating IS NOT NULL),
        |ov AS (SELECT CAST(count(*) AS BIGINT) AS n_overlap
        |       FROM va SEMI JOIN tr USING (user_id, item_id)),
        |nv AS (SELECT CAST(count(*) AS BIGINT) AS n_val_pairs FROM va)
        |SELECT n_val_pairs, n_overlap,
        |  floor((CAST(n_overlap AS DOUBLE) * 100.0 / n_val_pairs)
        |    * 1000000.0 + 0.5) / 1000000.0 AS overlap_pct
        |FROM nv CROSS JOIN ov""".stripMargin,
    "q186_als_audit" ->
      """WITH r AS (
        |  SELECT user_id,
        |    CAST(json_extract_string(props, '$.k') AS INT) AS item_id,
        |    value AS rating,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY epoch_ns(ts), event_id) AS rn,
        |    COUNT(*) OVER (PARTITION BY user_id) AS n
        |  FROM events),
        |tagged AS (
        |  SELECT user_id, item_id, rating,
        |    CAST(FLOOR(((rn - 1)::DOUBLE / n) * 5) AS INT) AS split
        |  FROM r),
        |tr AS (SELECT user_id, item_id FROM tagged
        |       WHERE split <= 2 AND item_id IS NOT NULL
        |         AND rating IS NOT NULL),
        |li AS (SELECT least(CAST(count(DISTINCT item_id) AS BIGINT), 20)
        |         AS li FROM tr),
        |u AS (SELECT user_id,
        |        bool_or(split <= 2 AND item_id IS NOT NULL
        |          AND rating IS NOT NULL) AS has_train,
        |        bool_or(split = 3) AS has_val
        |      FROM tagged GROUP BY 1),
        |v AS (SELECT CAST(count(*) AS BIGINT) AS nv
        |      FROM u WHERE has_train AND has_val)
        |SELECT nv AS n_users, nv * li AS n_rows,
        |  CAST(1 AS BIGINT) AS covers_all_val_users,
        |  CAST(0 AS BIGINT) AS shape_viol,
        |  CAST(0 AS BIGINT) AS score_viol,
        |  CAST(0 AS BIGINT) AS rank_viol
        |FROM v CROSS JOIN li""".stripMargin,
    "q152_mmr_rerank" -> mmrOracle,
    "q153_list_quality" -> listQualityOracle,
    "q150_ips_eval" ->
      s"""WITH $pipelineCte,
         |trainf AS (SELECT * FROM train
         |           WHERE item_id IS NOT NULL AND rating IS NOT NULL),
         |nt AS (SELECT COUNT(*) AS n_train FROM trainf),
         |prop AS (
         |  SELECT item_id,
         |    floor((COUNT(*)::DOUBLE / nt.n_train) * 1000000.0 + 0.5) / 1000000.0 AS p
         |  FROM trainf CROSS JOIN nt GROUP BY item_id, nt.n_train),
         |w AS (
         |  SELECT r.user_id, r.item_id,
         |    CAST(floor((least(1.0 / p.p, 1000.0)) * 1000000.0 + 0.5) / 1000000.0 AS DECIMAL(18,6)) AS w
         |  FROM recs r JOIN prop p ON p.item_id = r.item_id),
         |truth AS (SELECT DISTINCT user_id, item_id FROM val
         |          WHERE item_id IS NOT NULL),
         |per AS (
         |  SELECT w.user_id,
         |    SUM(CASE WHEN t.item_id IS NOT NULL THEN w.w
         |        ELSE CAST(0 AS DECIMAL(18,6)) END) AS hit_w,
         |    SUM(w.w) AS tot_w,
         |    SUM(CASE WHEN t.item_id IS NOT NULL THEN 1 ELSE 0 END) AS hits
         |  FROM w LEFT JOIN truth t
         |    ON t.user_id = w.user_id AND t.item_id = w.item_id
         |  GROUP BY 1)
         |SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
         |  floor((CAST(SUM(hits) AS DOUBLE) / (COUNT(*) * 20.0)) * 1000000.0 + 0.5) / 1000000.0
         |    AS precision_at_20,
         |  floor((CAST(SUM(hit_w) AS DOUBLE) / (COUNT(*) * 20.0)) * 1000000.0 + 0.5) / 1000000.0
         |    AS ips_at_20,
         |  floor((CAST(SUM(CAST(floor((CAST(hit_w AS DOUBLE)
         |      / CAST(tot_w AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0 AS DECIMAL(18,6))) AS DOUBLE)
         |    / COUNT(*)) * 1000000.0 + 0.5) / 1000000.0 AS snips_at_20
         |FROM per""".stripMargin,
    "q149_conformal" ->
      """WITH r AS (
        |  SELECT user_id, CAST(json_extract_string(props, '$.k') AS INT) AS item_id,
        |    value AS rating,
        |    row_number() OVER (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id) AS rn,
        |    COUNT(*) OVER (PARTITION BY user_id) AS n
        |  FROM events),
        |tagged AS (
        |  SELECT user_id, item_id, rating,
        |    CAST(FLOOR(((rn - 1)::DOUBLE / n) * 5) AS INT) AS split
        |  FROM r),
        |tr AS (SELECT item_id, CAST(floor(rating * 100.0 + 0.5) / 100.0 AS DECIMAL(18,2)) AS rr
        |       FROM tagged WHERE split <= 2
        |         AND item_id IS NOT NULL AND rating IS NOT NULL),
        |ca AS (SELECT item_id, CAST(floor(rating * 100.0 + 0.5) / 100.0 AS DECIMAL(18,2)) AS rr
        |       FROM tagged WHERE split = 3
        |         AND item_id IS NOT NULL AND rating IS NOT NULL),
        |te AS (SELECT item_id, CAST(floor(rating * 100.0 + 0.5) / 100.0 AS DECIMAL(18,2)) AS rr
        |       FROM tagged WHERE split = 4
        |         AND item_id IS NOT NULL AND rating IS NOT NULL),
        |g AS (SELECT floor((CAST(SUM(rr) AS DOUBLE) / COUNT(*)) * 1000000.0 + 0.5) / 1000000.0 AS g
        |      FROM tr),
        |pred AS (
        |  SELECT item_id,
        |    CAST(floor(((CAST(SUM(rr) AS DOUBLE) + 20.0 * g.g)
        |      / (COUNT(*) + 20)) * 1000000.0 + 0.5) / 1000000.0 AS DECIMAL(18,6)) AS pred
        |  FROM tr CROSS JOIN g GROUP BY item_id, g.g),
        |cal AS (
        |  SELECT ABS(c.rr - COALESCE(p.pred,
        |    CAST(floor((g.g) * 1000000.0 + 0.5) / 1000000.0 AS DECIMAL(18,6)))) AS res
        |  FROM ca c LEFT JOIN pred p ON p.item_id = c.item_id
        |  CROSS JOIN g),
        |byres AS (SELECT res, COUNT(*) AS m FROM cal GROUP BY 1),
        |cum AS (SELECT res, m,
        |          SUM(m) OVER (ORDER BY res ROWS UNBOUNDED PRECEDING) AS cum
        |        FROM byres),
        |nc AS (SELECT SUM(m) AS n_calib FROM byres),
        |qh AS (SELECT MIN(res) AS qhat, MIN(n_calib) AS n_calib
        |       FROM cum CROSS JOIN nc
        |       WHERE cum >= least(
        |         CAST(ceil((n_calib + 1) * 0.9) AS BIGINT), n_calib)),
        |tes AS (
        |  SELECT ABS(t.rr - COALESCE(p.pred,
        |    CAST(floor((g.g) * 1000000.0 + 0.5) / 1000000.0 AS DECIMAL(18,6)))) AS res
        |  FROM te t LEFT JOIN pred p ON p.item_id = t.item_id
        |  CROSS JOIN g)
        |SELECT CAST(0.1 AS DOUBLE) AS alpha,
        |  CAST(q.n_calib AS BIGINT) AS n_calib,
        |  CAST(q.qhat AS DOUBLE) AS qhat,
        |  CAST(COUNT(*) AS BIGINT) AS n_test,
        |  floor((CAST(SUM(CASE WHEN s.res <= q.qhat THEN 1 ELSE 0 END)
        |      AS DOUBLE) / COUNT(*)) * 1000000.0 + 0.5) / 1000000.0 AS coverage
        |FROM tes s CROSS JOIN qh q GROUP BY q.n_calib, q.qhat""".stripMargin,
    "q165_calibration" ->
      """WITH r AS (
        |  SELECT user_id,
        |    CAST(json_extract_string(props, '$.k') AS INT) AS item_id,
        |    value AS rating,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY epoch_ns(ts), event_id) AS rn,
        |    COUNT(*) OVER (PARTITION BY user_id) AS n
        |  FROM events),
        |tagged AS (
        |  SELECT user_id, item_id, rating,
        |    CAST(FLOOR(((rn - 1)::DOUBLE / n) * 5) AS INT) AS split
        |  FROM r),
        |train AS (SELECT * FROM tagged WHERE split <= 2
        |          AND item_id IS NOT NULL AND rating IS NOT NULL),
        |val AS (SELECT * FROM tagged WHERE split = 3
        |        AND item_id IS NOT NULL AND rating IS NOT NULL),
        |g AS (SELECT floor((CAST(sum(CAST(floor(rating * 100.0 + 0.5) / 100.0 AS DECIMAL(18,2)))
        |        AS DOUBLE) / count(*)) * 1000000.0 + 0.5) / 1000000.0 AS mu FROM train),
        |preds AS (
        |  SELECT item_id,
        |    floor(((CAST(sum(CAST(floor(rating * 100.0 + 0.5) / 100.0 AS DECIMAL(18,2))) AS DOUBLE)
        |      + 20.0 * mu) / (count(*) + 20.0)) * 1000000.0 + 0.5) / 1000000.0 AS pred
        |  FROM train CROSS JOIN g GROUP BY item_id, mu),
        |b AS (SELECT CAST(floor(pred * 2) AS BIGINT) AS bucket,
        |        CAST(pred AS DECIMAL(18,6)) AS p,
        |        CAST(floor(rating * 100.0 + 0.5) / 100.0 AS DECIMAL(18,2)) AS a
        |      FROM val JOIN preds USING (item_id))
        |SELECT bucket, CAST(count(*) AS BIGINT) AS n,
        |  floor((CAST(sum(p) AS DOUBLE) / count(*)) * 1000000.0 + 0.5) / 1000000.0 AS avg_pred,
        |  floor((CAST(sum(a) AS DOUBLE) / count(*)) * 1000000.0 + 0.5) / 1000000.0 AS avg_actual
        |FROM b GROUP BY 1 ORDER BY 1""".stripMargin,
    "q145_bias_cv" ->
      """WITH r0 AS (
        |  SELECT CAST(json_extract_string(props, '$.k') AS INT) AS item_id,
        |    value AS rating, event_id
        |  FROM events
        |  WHERE json_extract_string(props, '$.k') IS NOT NULL
        |    AND value IS NOT NULL),
        |rows0 AS (
        |  SELECT item_id,
        |    CAST((md5_number_lower('145:' || event_id::VARCHAR)
        |      & 9223372036854775807) % 5 AS INT) AS fold,
        |    CAST(floor(rating * 100.0 + 0.5) / 100.0 AS DECIMAL(18,2)) AS v
        |  FROM r0),
        |pf AS (SELECT item_id, fold, COUNT(*) AS cnt, SUM(v) AS s
        |       FROM rows0 GROUP BY 1, 2),
        |e AS (
        |  SELECT item_id, fold,
        |    SUM(cnt) OVER (PARTITION BY item_id) - cnt AS oof_cnt,
        |    SUM(s) OVER (PARTITION BY item_id) - s AS oof_s,
        |    floor((CAST(SUM(s) OVER () - SUM(s) OVER (PARTITION BY fold)
        |        AS DOUBLE) /
        |      CAST(SUM(cnt) OVER () - SUM(cnt) OVER (PARTITION BY fold)
        |        AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0 AS g_oof
        |  FROM pf),
        |b AS (SELECT unnest([1, 5, 20, 100]) AS bias),
        |pred AS (
        |  SELECT item_id, fold, bias,
        |    CAST(floor(((CAST(oof_s AS DOUBLE) + bias * g_oof) /
        |      CAST(oof_cnt + bias AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0 AS DECIMAL(18,6)) AS pred
        |  FROM e CROSS JOIN b),
        |ev AS (
        |  SELECT p.bias, r.fold, r.v - p.pred AS err
        |  FROM rows0 r
        |  JOIN pred p ON p.item_id = r.item_id AND p.fold = r.fold),
        |pfold AS (
        |  SELECT bias, fold, COUNT(*) AS n_eval,
        |    CAST(floor((sqrt(CAST(SUM(err * err) AS DOUBLE) / COUNT(*))) * 1000000.0 + 0.5) / 1000000.0
        |      AS DECIMAL(18,6)) AS rmse
        |  FROM ev GROUP BY 1, 2)
        |SELECT bias, fold, CAST(n_eval AS BIGINT) AS n_eval,
        |  CAST(rmse AS DOUBLE) AS rmse,
        |  floor((CAST(SUM(rmse) OVER (PARTITION BY bias) AS DOUBLE) / 5.0) * 1000000.0 + 0.5) / 1000000.0
        |    AS cv_rmse
        |FROM pfold ORDER BY bias, fold""".stripMargin,
    "q142_popularity_auc" ->
      """WITH r AS (
        |  SELECT user_id, CAST(json_extract_string(props, '$.k') AS INT) AS item_id,
        |    value AS rating,
        |    row_number() OVER (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id) AS rn,
        |    COUNT(*) OVER (PARTITION BY user_id) AS n
        |  FROM events),
        |tagged AS (
        |  SELECT user_id, item_id, rating,
        |    CAST(FLOOR(((rn - 1)::DOUBLE / n) * 5) AS INT) AS split
        |  FROM r),
        |train AS (SELECT * FROM tagged
        |          WHERE split <= 2 AND item_id IS NOT NULL AND rating IS NOT NULL),
        |val AS (SELECT * FROM tagged
        |        WHERE split = 3 AND item_id IS NOT NULL AND rating IS NOT NULL),
        |pool AS (
        |  SELECT item_id,
        |    floor((CAST(SUM(CAST(floor(rating * 100.0 + 0.5) / 100.0 AS DECIMAL(18,2))) AS DOUBLE)
        |      / (COUNT(*) + 100.0)) * 1000000.0 + 0.5) / 1000000.0 AS score
        |  FROM train GROUP BY item_id
        |  ORDER BY score DESC, item_id LIMIT 50),
        |vusers AS (SELECT DISTINCT user_id FROM val),
        |vitems AS (SELECT DISTINCT user_id, item_id FROM val),
        |lab AS (
        |  SELECT c.score,
        |    CASE WHEN v.item_id IS NOT NULL THEN 1 ELSE 0 END AS y
        |  FROM (SELECT u.user_id, p.item_id, p.score
        |        FROM vusers u CROSS JOIN pool p) c
        |  LEFT JOIN vitems v
        |    ON v.user_id = c.user_id AND v.item_id = c.item_id),
        |bys AS (SELECT score AS s, COUNT(*) AS m, SUM(y) AS mp
        |        FROM lab GROUP BY 1),
        |g AS (SELECT m, mp,
        |        COALESCE(SUM(m) OVER (ORDER BY s
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS below
        |      FROM bys),
        |a AS (SELECT SUM(mp * (2 * below + m + 1)) AS r2,
        |        SUM(mp) AS np, SUM(m - mp) AS nn FROM g)
        |SELECT CAST(np AS BIGINT) AS n_pos, CAST(nn AS BIGINT) AS n_neg,
        |  floor(((CAST(r2 AS DOUBLE) / 2.0
        |      - CAST(np AS DOUBLE) * (np + 1) / 2.0)
        |    / (CAST(np AS DOUBLE) * CAST(nn AS DOUBLE))) * 1000000.0 + 0.5) / 1000000.0 AS auc
        |FROM a""".stripMargin,
    "q139_item_cf_rmse" ->
      """WITH r AS (
        |  SELECT user_id, CAST(json_extract_string(props, '$.k') AS INT) AS item_id,
        |    value AS rating, ts, event_id,
        |    row_number() OVER (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id) AS rn,
        |    COUNT(*) OVER (PARTITION BY user_id) AS n
        |  FROM events),
        |tagged AS (
        |  SELECT user_id, item_id, rating, ts, event_id,
        |    CAST(FLOOR(((rn - 1)::DOUBLE / n) * 5) AS INT) AS split
        |  FROM r),
        |tr0 AS (
        |  SELECT user_id, item_id, rating,
        |    row_number() OVER (PARTITION BY user_id, item_id
        |      ORDER BY epoch_ns(ts) DESC, event_id DESC) AS rn
        |  FROM tagged
        |  WHERE split <= 2 AND item_id IS NOT NULL AND rating IS NOT NULL),
        |tr AS (SELECT user_id, item_id, CAST(floor(rating * 100.0 + 0.5) / 100.0 AS DECIMAL(18,2)) AS rr
        |       FROM tr0 WHERE rn = 1),
        |va0 AS (
        |  SELECT user_id, item_id, rating,
        |    row_number() OVER (PARTITION BY user_id, item_id
        |      ORDER BY epoch_ns(ts) DESC, event_id DESC) AS rn
        |  FROM tagged
        |  WHERE split = 3 AND item_id IS NOT NULL AND rating IS NOT NULL),
        |va AS (SELECT user_id, item_id, CAST(floor(rating * 100.0 + 0.5) / 100.0 AS DECIMAL(18,2)) AS r_true
        |       FROM va0 WHERE rn = 1),
        |stats AS (SELECT item_id, SUM(rr*rr) AS norm2 FROM tr GROUP BY item_id),
        |pairs AS (
        |  SELECT a.item_id AS ia, b.item_id AS ib,
        |    SUM(a.rr * b.rr) AS dot
        |  FROM tr a JOIN tr b ON a.user_id = b.user_id AND a.item_id < b.item_id
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 3),
        |sym AS (
        |  SELECT ia AS item_id, ib AS neighbor_id, dot FROM pairs
        |  UNION ALL
        |  SELECT ib, ia, dot FROM pairs),
        |scored AS (
        |  SELECT s.item_id, s.neighbor_id,
        |    floor((CAST(s.dot AS DOUBLE) /
        |      (sqrt(CAST(x.norm2 AS DOUBLE)) * sqrt(CAST(y.norm2 AS DOUBLE)))) * 1000000.0 + 0.5) / 1000000.0 AS sim
        |  FROM sym s JOIN stats x ON x.item_id = s.item_id
        |             JOIN stats y ON y.item_id = s.neighbor_id),
        |nbrs AS (
        |  SELECT item_id, neighbor_id, CAST(sim AS DECIMAL(10,6)) AS w
        |  FROM (SELECT item_id, neighbor_id, sim,
        |          row_number() OVER (PARTITION BY item_id
        |            ORDER BY sim DESC, neighbor_id) AS rank
        |        FROM scored)
        |  WHERE rank <= 20),
        |preds AS (
        |  SELECT v.user_id, v.item_id,
        |    CAST(floor((CAST(SUM(n.w * t.rr) AS DOUBLE) /
        |      CAST(SUM(n.w) AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0 AS DECIMAL(18,6)) AS pred
        |  FROM va v
        |  JOIN nbrs n ON n.item_id = v.item_id
        |  JOIN tr t ON t.user_id = v.user_id AND t.item_id = n.neighbor_id
        |  GROUP BY 1, 2 HAVING SUM(n.w) > 0)
        |SELECT COUNT(*) AS n_val, COUNT(p.pred) AS n_pred,
        |  floor((COUNT(p.pred)::DOUBLE / COUNT(*)::DOUBLE) * 1000000.0 + 0.5) / 1000000.0 AS coverage,
        |  floor((sqrt(CAST(SUM((v.r_true - p.pred) * (v.r_true - p.pred)) AS DOUBLE)
        |    / COUNT(p.pred))) * 1000000.0 + 0.5) / 1000000.0 AS rmse,
        |  floor((CAST(SUM(ABS(v.r_true - p.pred)) AS DOUBLE) / COUNT(p.pred)) * 1000000.0 + 0.5) / 1000000.0 AS mae
        |FROM va v LEFT JOIN preds p
        |  ON p.user_id = v.user_id AND p.item_id = v.item_id""".stripMargin,
    "q136_item_cf" ->
      """WITH r0 AS (
        |  SELECT user_id, CAST(json_extract_string(props, '$.k') AS INT) AS item_id,
        |    value AS rating,
        |    row_number() OVER (
        |      PARTITION BY user_id, CAST(json_extract_string(props, '$.k') AS INT)
        |      ORDER BY epoch_ns(ts) DESC, event_id DESC) AS rn
        |  FROM events
        |  WHERE json_extract_string(props, '$.k') IS NOT NULL AND value IS NOT NULL),
        |r AS (SELECT user_id, item_id, CAST(floor(rating * 100.0 + 0.5) / 100.0 AS DECIMAL(18,2)) AS r
        |      FROM r0 WHERE rn = 1),
        |stats AS (SELECT item_id, SUM(r*r) AS norm2 FROM r GROUP BY item_id),
        |pairs AS (
        |  SELECT a.item_id AS ia, b.item_id AS ib,
        |    SUM(a.r * b.r) AS dot, COUNT(*) AS support
        |  FROM r a JOIN r b ON a.user_id = b.user_id AND a.item_id < b.item_id
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 5),
        |sym AS (
        |  SELECT ia AS item_id, ib AS neighbor_id, dot, support FROM pairs
        |  UNION ALL
        |  SELECT ib, ia, dot, support FROM pairs),
        |scored AS (
        |  SELECT s.item_id, s.neighbor_id,
        |    floor((CAST(s.dot AS DOUBLE) /
        |      (sqrt(CAST(x.norm2 AS DOUBLE)) * sqrt(CAST(y.norm2 AS DOUBLE)))) * 1000000.0 + 0.5) / 1000000.0 AS sim,
        |    s.support
        |  FROM sym s JOIN stats x ON x.item_id = s.item_id
        |             JOIN stats y ON y.item_id = s.neighbor_id),
        |rk AS (SELECT item_id, neighbor_id, sim, support,
        |         CAST(row_number() OVER (
        |           PARTITION BY item_id ORDER BY sim DESC, neighbor_id) AS INT) AS rank
        |       FROM scored)
        |SELECT item_id, neighbor_id, sim, support, rank
        |FROM rk WHERE rank <= 10 ORDER BY item_id, rank""".stripMargin,
    "q138_rec_exposure" ->
      s"""WITH $pipelineCte,
         |expo AS (
         |  SELECT c.item_id, COALESCE(e.x, 0) AS x
         |  FROM (SELECT DISTINCT item_id FROM train) c
         |  LEFT JOIN (SELECT item_id, COUNT(*) AS x FROM recs GROUP BY 1) e
         |    USING (item_id)),
         |rk AS (SELECT x, row_number() OVER (ORDER BY x, item_id) AS i FROM expo),
         |agg AS (SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(i*x) AS six,
         |          SUM(CASE WHEN x > 0 THEN 1 ELSE 0 END) AS nrec FROM rk)
         |SELECT CAST(n AS BIGINT) AS n_items, CAST(nrec AS BIGINT) AS n_recommended,
         |  floor((CAST(nrec AS DOUBLE) / CAST(n AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0 AS coverage,
         |  floor((2.0 * CAST(six AS DOUBLE) / CAST(n*sx AS DOUBLE)
         |    - CAST(n+1 AS DOUBLE) / CAST(n AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0 AS gini
         |FROM agg""".stripMargin,
    "q116_negative_samples" ->
      """WITH r AS (SELECT DISTINCT user_id,
        |             CAST(json_extract_string(props, '$.k') AS INT) AS item_id
        |           FROM events
        |           WHERE json_extract_string(props, '$.k') IS NOT NULL),
        |items AS (SELECT DISTINCT item_id FROM r),
        |users AS (SELECT DISTINCT user_id FROM r),
        |cand AS (SELECT u.user_id, i.item_id,
        |           (md5_number_lower(u.user_id || ':' || i.item_id)
        |             & 9223372036854775807)::BIGINT AS h
        |         FROM users u CROSS JOIN items i),
        |neg AS (SELECT c.user_id, c.item_id, c.h FROM cand c
        |        WHERE NOT EXISTS (SELECT 1 FROM r
        |                          WHERE r.user_id = c.user_id
        |                            AND r.item_id = c.item_id)),
        |rk AS (SELECT user_id, item_id,
        |         row_number() OVER (PARTITION BY user_id
        |                            ORDER BY h, item_id) AS rank
        |       FROM neg)
        |SELECT user_id, CAST(rank AS BIGINT) AS rank, item_id
        |FROM rk WHERE rank <= 5 ORDER BY user_id, rank""".stripMargin,
    "q50_popularity_recs" ->
      s"""WITH $pipelineCte
         |SELECT user_id, item_id, rank FROM recs ORDER BY user_id, rank""".stripMargin,
    "q51_popularity_metrics" ->
      s"""WITH $pipelineCte,
         |truth AS (SELECT DISTINCT user_id, item_id FROM val),
         |tsize AS (SELECT user_id, COUNT(*) AS n_truth FROM truth GROUP BY user_id),
         |hits AS (
         |  SELECT r.user_id, r.rank,
         |    CASE WHEN t.item_id IS NOT NULL THEN 1 ELSE 0 END AS hit
         |  FROM recs r LEFT JOIN truth t
         |    ON t.user_id = r.user_id AND t.item_id = r.item_id),
         |cum AS (
         |  SELECT user_id, rank, hit,
         |    SUM(hit) OVER (PARTITION BY user_id ORDER BY rank) AS ch
         |  FROM hits),
         |peruser AS (
         |  SELECT user_id,
         |    CAST(SUM(hit) AS DOUBLE) / 20 AS p,
         |    SUM(CASE WHEN hit = 1 THEN ch::DOUBLE / rank ELSE 0 END) AS ap_num,
         |    SUM(CASE WHEN hit = 1 THEN 1.0 / (ln(rank + 1) / ln(2)) ELSE 0 END) AS dcg
         |  FROM cum GROUP BY user_id),
         |idcg AS (
         |  SELECT m, SUM(1.0 / (ln(i + 1) / ln(2))) AS v
         |  FROM generate_series(1, 20) g(m) JOIN generate_series(1, 20) h(i) ON i <= m
         |  GROUP BY m)
         |SELECT COUNT(*) AS n_users,
         |  floor((AVG(p)) * 1000000.0 + 0.5) / 1000000.0 AS p_at_k,
         |  floor((AVG(ap_num / least(n_truth, 20))) * 1000000.0 + 0.5) / 1000000.0 AS map_at_k,
         |  floor((AVG(dcg / v)) * 1000000.0 + 0.5) / 1000000.0 AS ndcg_at_k
         |FROM peruser
         |JOIN tsize USING (user_id)
         |JOIN idcg ON m = least(n_truth, 20)""".stripMargin,
    "q54_bias_sweep" ->
      """WITH r AS (
        |  SELECT user_id, CAST(json_extract_string(props, '$.k') AS INT) AS item_id,
        |    value AS rating,
        |    row_number() OVER (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id) AS rn,
        |    COUNT(*) OVER (PARTITION BY user_id) AS n
        |  FROM events),
        |tagged AS (
        |  SELECT user_id, item_id, rating,
        |    CAST(FLOOR(((rn - 1)::DOUBLE / n) * 5) AS INT) AS split
        |  FROM r),
        |train AS (SELECT * FROM tagged WHERE split <= 2),
        |val AS (SELECT * FROM tagged WHERE split = 3),
        |biases AS (SELECT CAST(b AS DOUBLE) AS bias
        |           FROM (VALUES (1), (10), (100), (1000)) v(b)),
        |itemagg AS (
        |  SELECT item_id, COUNT(*) AS cnt,
        |    CAST(SUM(CAST(floor(rating * 100.0 + 0.5) / 100.0 AS DECIMAL(18,2))) AS DOUBLE) AS total
        |  FROM train GROUP BY item_id),
        |pool AS (
        |  SELECT bias, item_id FROM (
        |    SELECT b.bias, i.item_id,
        |      row_number() OVER (PARTITION BY b.bias
        |        ORDER BY i.total / (i.cnt + b.bias) DESC, i.item_id) AS prank
        |    FROM biases b CROSS JOIN itemagg i)
        |  WHERE prank <= 50),
        |vusers AS (SELECT DISTINCT user_id FROM val),
        |seen AS (SELECT DISTINCT user_id, item_id FROM train),
        |unseen AS (
        |  SELECT c.bias, c.user_id, c.item_id
        |  FROM (SELECT u.user_id, p.bias, p.item_id
        |        FROM vusers u CROSS JOIN pool p) c
        |  WHERE NOT EXISTS (SELECT 1 FROM seen s
        |                    WHERE s.user_id = c.user_id AND s.item_id = c.item_id)),
        |recs AS (
        |  SELECT bias, user_id, item_id, rank FROM (
        |    SELECT bias, user_id, item_id,
        |      CAST(row_number() OVER (PARTITION BY bias, user_id ORDER BY item_id) AS INT) AS rank
        |    FROM unseen)
        |  WHERE rank <= 20),
        |truth AS (SELECT DISTINCT user_id, item_id FROM val),
        |tsize AS (SELECT user_id, COUNT(*) AS n_truth FROM truth GROUP BY user_id),
        |hits AS (
        |  SELECT r.bias, r.user_id, r.rank,
        |    CASE WHEN t.item_id IS NOT NULL THEN 1 ELSE 0 END AS hit
        |  FROM recs r LEFT JOIN truth t
        |    ON t.user_id = r.user_id AND t.item_id = r.item_id),
        |cum AS (
        |  SELECT bias, user_id, rank, hit,
        |    SUM(hit) OVER (PARTITION BY bias, user_id ORDER BY rank) AS ch
        |  FROM hits),
        |peruser AS (
        |  SELECT bias, user_id,
        |    CAST(SUM(hit) AS DOUBLE) / 20 AS p,
        |    SUM(CASE WHEN hit = 1 THEN ch::DOUBLE / rank ELSE 0 END) AS ap_num,
        |    SUM(CASE WHEN hit = 1 THEN 1.0 / (ln(rank + 1) / ln(2)) ELSE 0 END) AS dcg
        |  FROM cum GROUP BY bias, user_id),
        |idcg AS (
        |  SELECT m, SUM(1.0 / (ln(i + 1) / ln(2))) AS v
        |  FROM generate_series(1, 20) g(m) JOIN generate_series(1, 20) h(i) ON i <= m
        |  GROUP BY m)
        |SELECT bias, COUNT(*) AS n_users,
        |  floor((AVG(p)) * 1000000.0 + 0.5) / 1000000.0 AS p_at_k,
        |  floor((AVG(ap_num / least(n_truth, 20))) * 1000000.0 + 0.5) / 1000000.0 AS map_at_k,
        |  floor((AVG(dcg / v)) * 1000000.0 + 0.5) / 1000000.0 AS ndcg_at_k
        |FROM peruser
        |JOIN tsize USING (user_id)
        |JOIN idcg ON m = least(n_truth, 20)
        |GROUP BY bias ORDER BY bias""".stripMargin)
}
