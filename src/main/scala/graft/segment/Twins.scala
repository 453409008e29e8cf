package graft.segment

import graft.text.TextAnalysis

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Customer segmentation: "movie twins" by set similarity + statistical
  * validation via distributed Pearson correlation.
  *
  * Reference (`codes/Customer Segmentation/part1/top_100_pairs.py`,
  * `part2/correlation_optimised.py`) ran MinHash/LSH in driver-side
  * datasketch and Pearson in driver-side numpy; here both are pure Spark
  * shuffles: MinHash/LSH via [[graft.text.TextAnalysis]] (hash signatures
  * by partial-aggregated min, candidates by band bucket join) and Pearson
  * via a pair-list broadcast join + the built-in `corr` aggregate.
  */
object Twins {

  /** Per-(user, item) deduplicated rating: `rating = max(value)` —
    * deterministic, arithmetic-free dedup of repeated interactions
    * (the reference's driver dict keeps the last; any deterministic
    * reduction works, max is oracle-trivial). */
  def userItemRatings(ratings: DataFrame): DataFrame =
    ratings.groupBy("user_id", "item_id")
      .agg(max(col("rating")).as("rating"))

  /** Exact top-k most similar user pairs by Jaccard over item sets,
    * deterministic order (jaccard desc, user_a, user_b) →
    * TakeOrderedAndProject. Strategy (dense broadcast all-pairs vs sparse
    * co-occurrence join) is picked from input statistics — see
    * [[TextAnalysis.setJaccardPairsAuto]]. */
  def topTwinsExact(ratings: DataFrame, k: Int): DataFrame =
    TextAnalysis.setJaccardPairsAuto(
      ratings.select("user_id", "item_id").distinct(), "user_id", "item_id",
      minJaccard = 0.0)
      .orderBy(col("jaccard").desc, col("id_a"), col("id_b"))
      .limit(k)

  /** Sparse LSH feature tokens for a ratings table: one token per
    * (item, rating-bucket) with `bucket = floor(rating / bucketWidth)`.
    *
    * Raw item ids make a degenerate LSH feature space when the item
    * universe is small relative to set sizes (at 100 items × ~49-item
    * sets every user pair sits near Jaccard 0.5 and band collisions
    * approach all-pairs — the round-1 scale-killer). Conditioning each
    * item on its rating bucket multiplies the universe by the bucket
    * count, dropping random-pair Jaccard to ~0.05 so banding
    * discriminates; genuinely twin-like users (same items, similar
    * ratings) keep high overlap. Mirrors how the document pipeline fixed
    * the same issue with 3-gram shingles (q25–q27). */
  def ratingBucketTokens(ratings: DataFrame,
                         bucketWidth: Double = 100.0): DataFrame =
    userItemRatings(ratings)
      .select(col("user_id"),
        concat(col("item_id").cast("string"), lit(":"),
          floor(col("rating") / bucketWidth).cast("string")).as("token"))

  /** Approximate top-k twins: MinHash (numPerm) + LSH banding + estimated
    * Jaccard, the reference's M1+M2+M3 pipeline fully distributed. Only
    * band-colliding pairs are ever scored; tokens are the sparse
    * (item, rating-bucket) features of [[ratingBucketTokens]]. */
  def topTwinsLsh(ratings: DataFrame, numPerm: Int, rowsPerBand: Int,
                  k: Int): DataFrame = {
    val sets = ratingBucketTokens(ratings)
    val sigs = TextAnalysis.minhashSignatures(sets, "user_id", numPerm)
    val cands = TextAnalysis.lshCandidatePairs(sigs, "user_id", rowsPerBand)
    TextAnalysis.estimatedJaccard(cands, sigs, "user_id", numPerm)
      .orderBy(col("est_jaccard").desc, col("id_a"), col("id_b"))
      .limit(k)
  }

  /** Distributed per-pair Pearson correlation over co-rated items
    * (reference M4, `correlation_optimised.py:40-52` driver-side numpy →
    * here: pairs ⋈ ratings ⋈ ratings + built-in `corr` aggregate).
    * `pairs` is small (top-k) → broadcast; the two rating joins shuffle on
    * user and (user, item). Pairs with <2 co-rated items are dropped, like
    * the reference. */
  def pairCorrelation(pairs: DataFrame, ratings: DataFrame,
                      carryCols: Seq[String] = Nil,
                      broadcastPairs: Boolean = true): DataFrame = {
    val r = userItemRatings(ratings)
    val r1 = r.select(col("user_id").as("id_a"), col("item_id"),
      col("rating").as("rating_a"))
    val r2 = r.select(col("user_id").as("id_b"), col("item_id"),
      col("rating").as("rating_b"))
    val keyCols = Seq("id_a", "id_b") ++ carryCols
    val p = pairs.select(keyCols.map(col): _*)
    // broadcastPairs = true only for genuinely small pair lists (top-k);
    // a pair list proportional to the user population must shuffle-join.
    (if (broadcastPairs) broadcast(p) else p)
      .join(r1, "id_a")
      .join(r2, Seq("id_b", "item_id"))
      .groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n_corated"),
        corr(col("rating_a"), col("rating_b")).as("c"))
      .filter(col("n_corated") >= 2)
      .withColumn("corr6",
        when(isnan(col("c")), lit(null)).otherwise(round(col("c"), 6)))
      .drop("c")
  }
}
