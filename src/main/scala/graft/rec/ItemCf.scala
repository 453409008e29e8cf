package graft.rec

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

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
        col("rating").cast("decimal(18,2)").as("r"))

    val stats = r.groupBy("item_id")
      .agg(sum(col("r") * col("r")).as("norm2"))

    val a = r.select(col("user_id"), col("item_id").as("ia"),
      col("r").as("ra"))
    val b = r.select(col("user_id"), col("item_id").as("ib"),
      col("r").as("rb"))
    val pairs = a.join(b, a("user_id") === b("user_id") &&
        col("ia") < col("ib"))
      .groupBy("ia", "ib")
      .agg(sum(col("ra") * col("rb")).as("dot"),
        count(lit(1)).as("support"))
      .filter(col("support") >= minSupport)

    val sym = pairs.select(col("ia").as("item_id"),
        col("ib").as("neighbor_id"), col("dot"), col("support"))
      .unionByName(pairs.select(col("ib").as("item_id"),
        col("ia").as("neighbor_id"), col("dot"), col("support")))

    val na = stats.select(col("item_id"), col("norm2").as("na"))
    val nb = stats.select(col("item_id").as("neighbor_id"),
      col("norm2").as("nb"))
    val scored = sym.join(na, "item_id").join(nb, "neighbor_id")
      .withColumn("sim", round(col("dot").cast("double") /
        (sqrt(col("na").cast("double")) * sqrt(col("nb").cast("double"))),
        6))
    val rankW = Window.partitionBy("item_id")
      .orderBy(col("sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(rankW))
      .filter(col("rank") <= k)
      .select("item_id", "neighbor_id", "sim", "support", "rank")
  }
}
