package graft.rec

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions.{qdec, qround}

/** Item–item collaborative filtering over explicit ratings — the
  * neighborhood-method complement to the latent-factor path
  * ([[AlsRec]], reference `codes/Movie Recommendation/part5/
  * als_latent_factors.py`) and the user–user similarity family
  * ([[graft.segment.Twins]], reference `codes/Customer Segmentation/
  * part1/top_100_pairs.py`). Classic Amazon-style item CF: the catalog
  * is orders of magnitude smaller than the user base and item
  * co-rating vectors are stabler than user vectors, so the
  * similarity matrix is both cheaper and longer-lived.
  *
  * Scale posture: the co-rating pair explode shuffles on `user_id` and
  * fans out n_u² rows per user — the classic item-CF hot spot. The
  * `maxPerUser` cap bounds it (keep each user's most recent ratings,
  * the standard mitigation: a 10k-rating power user contributes 10⁸
  * uncapped pairs, cap² capped). Everything downstream is
  * |co-rated item pairs| ≤ |catalog|², already aggregate-sized.
  * Sums run in the decimal domain so results are partitioning- and
  * merge-order-independent; the one double division + sqrt at the end
  * is IEEE-deterministic cross-engine.
  */
object ItemCf {

  /** Latest rating per (user, item): ratings are event-sourced and a
    * user may re-rate, so pick the row with the greatest `ts`
    * (event_id as the total-order tiebreak — same determinism contract
    * as [[graft.ops.Relational.chronoSplit]]). Null item ids / ratings
    * are dropped (malformed events carry no signal here). */
  def latestRatings(ratings: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id", "item_id")
      .orderBy(col("ts").desc, col("event_id").desc)
    ratings
      .filter(col("item_id").isNotNull && col("rating").isNotNull)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select("user_id", "item_id", "rating", "ts", "event_id")
  }

  /** Top-`k` most-similar items per item by rating-vector cosine.
    *
    * cos(i, j) = Σ_u r_ui·r_uj / (‖r_i‖·‖r_j‖) over users who rated
    * both, with full-vector norms (not co-rater-restricted), filtered
    * to pairs with at least `minSupport` co-raters. One canonical
    * (i < j) pair aggregate is computed, then mirrored so every item
    * ranks its full neighbor list. Ranking is on the 6-dp-rounded
    * cosine with the neighbor id as tiebreak — deterministic under
    * ties from symmetric rating patterns.
    *
    * `maxPerUser`: per-user recency cap on the pair explode (see class
    * doc). Callers at bench scale pass a cap above the observed
    * per-user maximum so the oracle's uncapped SQL is exact.
    */
  def itemNeighbors(ratings: DataFrame, k: Int, minSupport: Int,
                    maxPerUser: Int): DataFrame = {
    val capW = Window.partitionBy("user_id")
      .orderBy(col("ts").desc, col("event_id").desc)
    val r = latestRatings(ratings)
      .withColumn("__urn", row_number().over(capW))
      .filter(col("__urn") <= maxPerUser)
      .select(col("user_id"), col("item_id"),
        qdec(col("rating"), 18, 2).as("r"))

    val stats = r.groupBy("item_id")
      .agg(sum(col("r") * col("r")).as("norm2"))

    // spreadByKey (r16): the co-rating self-join fans out n_u² rows per
    // user from a few-MB input — AQE's input-sized coalescing serialized
    // the pair scan (see TextAnalysis.spreadByKey). The dot/support
    // aggregates are decimal/integer sums, so partitioning cannot move
    // a value.
    val a = graft.text.TextAnalysis.spreadByKey(
      r.select(col("user_id"), col("item_id").as("ia"),
        col("r").as("ra")), "user_id")
    val b = graft.text.TextAnalysis.spreadByKey(
      r.select(col("user_id"), col("item_id").as("ib"),
        col("r").as("rb")), "user_id")
    val pairs = a.join(b, a("user_id") === b("user_id") &&
        col("ia") < col("ib"))
      .groupBy("ia", "ib")
      .agg(sum(col("ra") * col("rb")).as("dot"),
        count(lit(1)).as("support"))
      .filter(col("support") >= minSupport)

    // r17: symmetrize by in-row explode — the self-union ran the whole
    // co-rating join + aggregate once per branch (exchange reuse
    // dedupes only the exchanges); ia < ib keeps the directions
    // disjoint, so the row multiset is identical.
    val sym = pairs
      .select(explode(array(
        struct(col("ia").as("item_id"), col("ib").as("neighbor_id"),
          col("dot"), col("support")),
        struct(col("ib").as("item_id"), col("ia").as("neighbor_id"),
          col("dot"), col("support")))).as("e"))
      .select("e.item_id", "e.neighbor_id", "e.dot", "e.support")

    val na = stats.select(col("item_id"), col("norm2").as("na"))
    val nb = stats.select(col("item_id").as("neighbor_id"),
      col("norm2").as("nb"))
    val scored = sym.join(na, "item_id").join(nb, "neighbor_id")
      .withColumn("sim", qround(col("dot").cast("double") /
        (sqrt(col("na").cast("double")) * sqrt(col("nb").cast("double"))),
        6))
    val rankW = Window.partitionBy("item_id")
      .orderBy(col("sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(rankW))
      .filter(col("rank") <= k)
      .select("item_id", "neighbor_id", "sim", "support", "rank")
  }

  /** Neighborhood rating prediction + error report — the item-CF
    * counterpart of the ALS validation eval (reference
    * `als_latent_factors.py` RMSE protocol), but oracle-EXACT where
    * ALS is rows-only: every arithmetic step stays in the decimal
    * domain or is a single IEEE double op on decimal-exact inputs, so
    * the one output row is bit-deterministic cross-engine.
    *
    * pred(u, i) = Σ_{j ∈ N_k(i)} sim(i,j)·r_uj / Σ sim(i,j) over the
    * user's TRAIN ratings on i's top-k neighbors (weighted-average
    * item-CF in its standard form). Pairs with no rated neighbor (or
    * all-zero rounded weights) are uncovered — reported via
    * `coverage`, not imputed, so the RMSE measures the neighborhood
    * model alone and the fallback policy stays a caller decision.
    *
    * Determinism: `sim` (6-dp-rounded double) casts exactly to
    * decimal(10,6); weighted sums then run decimal-exact
    * (order-independent); the division is one double op rounded to
    * 6 dp and recast to decimal, so squared/absolute errors and their
    * sums are again exact. Only the final RMSE/MAE divisions are
    * doubles. Scale: `truth` is |val| rows, neighbors |catalog|×k —
    * the contribution join shuffles on (user, item), never fans out
    * beyond k rows per validation pair.
    */
  def rmseReport(train: DataFrame, valSet: DataFrame, k: Int,
                 minSupport: Int, maxPerUser: Int): DataFrame = {
    val nbrs = itemNeighbors(train, k, minSupport, maxPerUser)
      .select(col("item_id"), col("neighbor_id"),
        col("sim").cast("decimal(10,6)").as("w"))
    val truth = latestRatings(valSet)
      .select(col("user_id"), col("item_id"),
        qdec(col("rating"), 18, 2).as("r_true"))
    val hist = latestRatings(train)
      .select(col("user_id"), col("item_id").as("neighbor_id"),
        qdec(col("rating"), 18, 2).as("r_n"))

    val preds = truth.join(nbrs, "item_id")
      .join(hist, Seq("user_id", "neighbor_id"))
      .groupBy("user_id", "item_id", "r_true")
      .agg(sum(col("w") * col("r_n")).as("num"), sum(col("w")).as("den"))
      .filter(col("den") > 0)
      .select(col("user_id"), col("item_id"),
        qround(col("num").cast("double") / col("den").cast("double"), 6)
          .cast("decimal(18,6)").as("pred"))

    truth.join(preds, Seq("user_id", "item_id"), "left")
      .agg(count(lit(1)).as("n_val"), count(col("pred")).as("n_pred"),
        sum((col("r_true") - col("pred")) *
          (col("r_true") - col("pred"))).as("sse"),
        sum(abs(col("r_true") - col("pred"))).as("sae"))
      .select(col("n_val"), col("n_pred"),
        qround(col("n_pred").cast("double") / col("n_val").cast("double"), 6)
          .as("coverage"),
        qround(sqrt(col("sse").cast("double") / col("n_pred").cast("double")),
          6).as("rmse"),
        qround(col("sae").cast("double") / col("n_pred").cast("double"), 6)
          .as("mae"))
  }
}
