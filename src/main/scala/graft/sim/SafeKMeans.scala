package graft.sim

import org.apache.spark.ml.clustering.{KMeans, KMeansModel}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Seeded KMeans with spark.ml's degenerate-input crash class made
  * total (found by the ML fuzz arm, FuzzMlSpec; widened round 16):
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
  *    is the mathematically maximal k, not an approximation;
  *  - sampled-center COLLAPSE (the clamp's residual hole, ADVICE r15):
  *    even at k ≤ |distinct points|, the init samples k ROWS from the
  *    raw frame, so a heavily duplicated corpus (2 distinct vectors ×
  *    many copies at k = 2) can sample the same vector twice and dedup
  *    to fewer centers than k. SafeKMeansSpec measured what Spark 4.1
  *    actually does with that: it does NOT crash — it silently trains
  *    and returns a model with FEWER centers than the configured k
  *    (one center at the corpus mean on the 49:1 fixture), i.e. a
  *    quality defect with no error signal. The guard is therefore a
  *    post-fit check: a model with < clamped-k centers triggers ONE
  *    retry on `dropDuplicates(distinctCols)`, where every row is a
  *    distinct vector and the without-replacement init sample cannot
  *    collapse, so exactly k centers survive. The AIOOBE catch stays as
  *    belt-and-braces for the crash manifestation the r15 fuzz arm saw
  *    at k > |distinct| inside Spark's aggregator. The retry fires only
  *    where spark.ml under-delivered centers, so no non-degenerate
  *    result changes; its centroids weigh each distinct point once,
  *    which is as principled as any answer on an input whose
  *    duplication profile defeated the library's own init.
  *
  * `distinctCols` names the caller's cheap distinct proxy for the
  * feature vector (the raw source columns — exact when the feature
  * build is injective on them, which each caller documents; injectivity
  * also makes the dropDuplicates survivor-row choice immaterial). The
  * count is one small aggregate per fit; production fits are k ≪ n and
  * memoized, so the guard never touches a hot loop.
  */
object SafeKMeans {

  /** True when the failure is the blockified-aggregator center-collapse
    * crash — Spark surfaces it either raw or wrapped (SparkException
    * job-failure chains), so walk the causal chain. */
  private def isCenterCollapse(t: Throwable): Boolean =
    Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(16)
      .exists(_.isInstanceOf[ArrayIndexOutOfBoundsException])

  /** Returns (distinct-point count, fitted model). None when fewer than
    * TWO distinct points exist: spark.ml additionally rejects k = 1
    * (`parameter k given invalid value 1`), and a 0/1-point corpus has
    * the trivial clustering anyway — empty, or everything in one
    * cluster at the single point — which each caller expresses with a
    * constant assignment instead of a model. */
  def fit(feats: DataFrame, k: Int, seed: Long, maxIter: Int,
          featuresCol: String,
          distinctCols: Seq[String]): (Long, Option[KMeansModel]) = {
    val n = feats.select(distinctCols.map(col): _*).distinct().count()
    val clampedK = math.min(k.toLong, n).toInt
    def fitOn(df: DataFrame): KMeansModel = new KMeans()
      .setK(clampedK).setSeed(seed).setMaxIter(maxIter)
      .setInitMode("random") // seeded; k-means|| costs ~5 extra passes
      .setFeaturesCol(featuresCol)
      .fit(df)
    def fitDistinct() = fitOn(feats.dropDuplicates(distinctCols))
    if (n < 2L) (n, None)
    else (n, Some {
      val m =
        try fitOn(feats)
        catch { case t: Throwable if isCenterCollapse(t) => fitDistinct() }
      if (m.clusterCenters.length < clampedK) fitDistinct() else m
    })
  }
}
