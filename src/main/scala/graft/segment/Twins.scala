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
    * item on its rating bucket widens the universe so banding
    * discriminates; genuinely twin-like users (same items, similar
    * ratings) keep high overlap. Mirrors how the document pipeline fixed
    * the same issue with 3-gram shingles (q25–q27).
    *
    * Measured effect on the events data at sf0.01 (value range 0.01–490,
    * width 100 → 299-token universe, ~83% of post-dedup tokens in
    * bucket 0): average random-pair Jaccard drops from ~0.5 to ~0.21
    * — a real but value-skew-limited sparsification; the floor-bucket
    * form is kept because it is exactly reproducible in the SQL oracle.
    * If band collisions grow too dense at larger scale, narrow
    * `bucketWidth` (more buckets ⇒ sparser tokens) or switch to the
    * value-skew-proof equal-frequency space of
    * [[ratingQuantileTokensLong]]. `bucketWidth` has NO default — it must
    * sit at the data's value scale (MovieLens-style 0.5–5.0 ratings need
    * width ~1.0; the events data needs ~100), and a too-wide width
    * silently degenerates every token to its raw item id, changing the
    * similarity definition — so callers are forced to choose. */
  def ratingBucketTokens(ratings: DataFrame,
                         bucketWidth: Double): DataFrame =
    userItemRatings(ratings)
      .select(col("user_id"),
        concat(col("item_id").cast("string"), lit(":"),
          floor(col("rating") / bucketWidth).cast("string")).as("token"))

  /** Long-packed (item, rating-bucket) token:
    * `item_id · 2³² + bucket` — the same token identity as
    * [[ratingBucketTokens]] as one numeric column, injective for any
    * item_id < 2³¹ and bucket ∈ [0, 2³²) (i.e. any non-negative rating
    * at any sane bucketWidth — a narrow width cannot overflow the bucket
    * field into a neighboring item the way a small multiplier would).
    * Exact set operations over numeric tokens stay on the codegen'd
    * merge-walk; the string form exists for MinHash, whose md5 needs
    * bytes (measured: string-array all-pairs costs ~20× in row width +
    * compares — 31.5 s vs ~1.5 s at sf0.1). */
  def ratingBucketTokensLong(ratings: DataFrame,
                             bucketWidth: Double): DataFrame =
    userItemRatings(ratings)
      .select(col("user_id"),
        (col("item_id").cast("long") * lit(4294967296L) +
          floor(col("rating") / bucketWidth).cast("long")).as("token"))

  /** Equal-frequency (within-item quantile) rating tokens — the
    * value-skew-proof alternative to [[ratingBucketTokens]]'s global
    * floor buckets: `bucket = min(nBuckets−1, floor(percent_rank over
    * (partition by item order by rating) · nBuckets))`, token =
    * `item_id · 2³² + bucket`.
    *
    * Rank-based bucketing adapts to each item's empirical rating
    * distribution, so no value skew can collapse the token space the way
    * the events data collapses floor buckets (~83% of tokens in
    * bucket 0 → random-pair Jaccard ~0.21; quantile tokens measure
    * ~0.07 at sf0.01, ≈ the 1/nBuckets ideal — QuantileTwinsSpec). The
    * semantics shift from "similar absolute rating" to "similar rating
    * RELATIVE to this item's raters" — the collaborative-filtering
    * notion of agreement when items have idiosyncratic value scales.
    *
    * `percent_rank` (ordered by rating ONLY), not `ntile`: ntile must
    * split ties to keep its counts equal, so two users rating an item
    * IDENTICALLY could straddle a bucket boundary and tokenize
    * differently — exactly the users a twin pipeline exists to match
    * (the planted-twins e2e test catches this: discrete rating scales
    * make ties pervasive). percent_rank gives tied ratings the same
    * bucket by construction, is deterministic with no tiebreak column,
    * and buckets stay equal-count up to tie mass (exact on tie-free
    * data). Both engines compute it as `(rank−1)/(n−1)` (0 for a
    * single-row partition) from the same integers — bit-identical, so
    * the SQL mirror is exact.
    *
    * Scale: the window partitions by item — state is one item's ratings,
    * distributed across the cluster by item key (a pathological hot item
    * would need the q70 salting treatment first). */
  def ratingQuantileTokensLong(ratings: DataFrame, nBuckets: Int): DataFrame =
    userItemRatings(ratings)
      .select(col("user_id"),
        (col("item_id").cast("long") * lit(4294967296L) +
          quantileBucket(nBuckets)).as("token"))

  /** String form of [[ratingQuantileTokensLong]] (`"item:bucket"`) for
    * MinHash, whose md5 needs bytes — same token identity. */
  def ratingQuantileTokens(ratings: DataFrame, nBuckets: Int): DataFrame =
    userItemRatings(ratings)
      .select(col("user_id"),
        concat(col("item_id").cast("string"), lit(":"),
          quantileBucket(nBuckets).cast("string")).as("token"))

  private def quantileBucket(nBuckets: Int): org.apache.spark.sql.Column = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("item_id").orderBy(col("rating"))
    least(lit(nBuckets - 1).cast("long"),
      floor(percent_rank().over(w) * nBuckets))
  }

  /** Exact top-k twins over the equal-frequency quantile token space
    * ([[ratingQuantileTokensLong]]) — the opt-in skew-proof variant of
    * [[topTwinsExactTokens]] (q71). */
  def topTwinsExactQuantile(ratings: DataFrame, k: Int, nBuckets: Int,
                            maxDfPermille: Int = 1000): DataFrame =
    TextAnalysis.setJaccardPairsAuto(
      ratingQuantileTokensLong(ratings, nBuckets), "user_id", "token",
      minJaccard = 0.0, maxDfPermille = maxDfPermille)
      .orderBy(col("jaccard").desc, col("id_a"), col("id_b"))
      .limit(k)

  /** Approximate top-k twins (MinHash + LSH banding) over the quantile
    * token space — the skew-proof variant of [[topTwinsLsh]] (q72);
    * [[topTwinsExactQuantile]] computes the exact counterpart of its
    * `est_jaccard`. */
  def topTwinsLshQuantile(ratings: DataFrame, numPerm: Int, rowsPerBand: Int,
                          k: Int, nBuckets: Int): DataFrame = {
    val sets = ratingQuantileTokens(ratings, nBuckets)
    val sigs = TextAnalysis.minhashSignatures(sets, "user_id", numPerm)
    val cands = TextAnalysis.lshCandidatePairs(sigs, "user_id", rowsPerBand)
    TextAnalysis.estimatedJaccard(cands, sigs, "user_id", numPerm)
      .orderBy(col("est_jaccard").desc, col("id_a"), col("id_b"))
      .limit(k)
  }

  /** Exact top-k twins over the SAME (item, rating-bucket) token space
    * that [[topTwinsLsh]] estimates — so `est_jaccard` has an exactly
    * computed counterpart on the same similarity definition (q45 gates
    * it against the oracle; see the divergence note on [[topTwinsLsh]]).
    * Tokens are the long-packed form ([[ratingBucketTokensLong]]) — same
    * identity, numeric merge-walk speed.
    *
    * `maxDfPermille` < 1000 engages the hot-token document-frequency
    * cap (see [[TextAnalysis.setJaccardPairsAuto]]): a token held by
    * more than that fraction of users — here, "rated item X in the
    * same bucket as most of its raters" — carries ~no twin signal and
    * dominates the pair-join cost; dropping it is simultaneously the
    * IDF move and the quadratic-tail bound. */
  def topTwinsExactTokens(ratings: DataFrame, k: Int, bucketWidth: Double,
                          maxDfPermille: Int = 1000): DataFrame =
    TextAnalysis.setJaccardPairsAuto(
      ratingBucketTokensLong(ratings, bucketWidth), "user_id", "token",
      minJaccard = 0.0, maxDfPermille = maxDfPermille)
      .orderBy(col("jaccard").desc, col("id_a"), col("id_b"))
      .limit(k)

  /** Approximate top-k twins: MinHash (numPerm) + LSH banding + estimated
    * Jaccard, the reference's M1+M2+M3 pipeline fully distributed. Only
    * band-colliding pairs are ever scored; tokens are the sparse
    * (item, rating-bucket) features of [[ratingBucketTokens]].
    *
    * SIMILARITY DEFINITION — deliberate divergence from [[topTwinsExact]]
    * and the reference's movie-id MinHash (`top_100_pairs.py:77-78`):
    * this pipeline ranks by Jaccard over (item, rating-bucket) tokens,
    * not raw item sets, because raw ids are degenerate here (see
    * [[ratingBucketTokens]]). Pairs with identical item sets but
    * different ratings rank lower than under q41's raw-set Jaccard —
    * by design: "twins" here means same items AND similar ratings. The
    * exact query over the SAME token space is [[topTwinsExactTokens]]
    * (q45), which is what `est_jaccard` is an estimator of. */
  def topTwinsLsh(ratings: DataFrame, numPerm: Int, rowsPerBand: Int,
                  k: Int, bucketWidth: Double): DataFrame = {
    val sets = ratingBucketTokens(ratings, bucketWidth)
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
        // IEEE floor-quantization (GraftFunctions.qround), not round():
        // the 6-dp value leaves the engine bit-identical to any oracle
        // engine computing the same formula, with no rounding-mode
        // dependence (determinism rule, ARCHITECTURE.md).
        when(isnan(col("c")), lit(null)).otherwise(
          graft.functions.GraftFunctions.qround(col("c"), 6)))
      .drop("c")
  }
}
