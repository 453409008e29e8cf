package graft.sim

import org.apache.spark.ml.clustering.{KMeans, KMeansModel}
import org.apache.spark.sql.{Column, DataFrame}

/** Seeded KMeans with spark.ml's two degenerate-input crashes made
  * total (found by the ML fuzz arm, FuzzMlSpec):
  *
  *  - an EMPTY corpus → None (no centroids exist; callers degrade to an
  *    empty assignment instead of an init-sampling failure);
  *  - k > |distinct points| → k clamped to the distinct count. The
  *    random init samples k rows then DEDUPS byte-identical centers,
  *    but the blockified aggregator still indexes by the CONFIGURED k —
  *    `ArrayIndexOutOfBoundsException: Index 4 out of bounds for
  *    length 4` on a 4-distinct-vector corpus at k=10 (Spark 4.1
  *    `KMeansAggregator.euclideanUpdateInPlace`). Fewer distinct points
  *    than clusters admits at most one cluster per point, so the clamp
  *    is the mathematically maximal k, not an approximation.
  *
  * `distinctCols` is the caller's cheap distinct proxy for the feature
  * vector (the raw source columns — exact when the feature build is
  * injective on them, which each caller documents). The count is one
  * small aggregate per fit; production fits are k ≪ n and memoized, so
  * the guard never touches a hot loop.
  */
object SafeKMeans {

  /** Returns (distinct-point count, fitted model). None when fewer than
    * TWO distinct points exist: spark.ml additionally rejects k = 1
    * (`parameter k given invalid value 1`), and a 0/1-point corpus has
    * the trivial clustering anyway — empty, or everything in one
    * cluster at the single point — which each caller expresses with a
    * constant assignment instead of a model. */
  def fit(feats: DataFrame, k: Int, seed: Long, maxIter: Int,
          featuresCol: String,
          distinctCols: Seq[Column]): (Long, Option[KMeansModel]) = {
    val n = feats.select(distinctCols: _*).distinct().count()
    if (n < 2L) (n, None)
    else (n, Some(new KMeans()
      .setK(math.min(k.toLong, n).toInt).setSeed(seed).setMaxIter(maxIter)
      .setInitMode("random") // seeded; k-means|| costs ~5 extra passes
      .setFeaturesCol(featuresCol)
      .fit(feats)))
  }
}
