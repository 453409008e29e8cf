package graft

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Pins the sampled-center COLLAPSE guard in [[graft.sim.SafeKMeans]]
  * (ADVICE r15 medium): even at k ≤ |distinct points|, spark.ml's
  * random init samples k ROWS, so a heavily duplicated corpus can
  * sample the same vector twice and dedup to fewer centers than the
  * configured k. The advice hypothesized the r15 AIOOBE crash; this
  * suite MEASURED Spark 4.1's actual behavior on the shape — no crash,
  * but a silently under-provisioned model (ONE center at the corpus
  * mean for a 2-distinct 49:1 corpus at k = 2), which is worse: a
  * quality defect with no error signal. The first test pins that raw
  * behavior (so a Spark upgrade that changes it is caught); the rest
  * prove SafeKMeans' post-fit retry on the distinct frame recovers the
  * full k centers, deterministically.
  */
class SafeKMeansSpec extends AnyFunSuite {

  private lazy val spark = GraftSpark.spark

  /** 49 copies of vector A + 1 of vector B: 2 distinct points, so the
    * clamp leaves k = 2, but a seeded 2-row init sample misses B with
    * probability 48/50 and collapses to one center. */
  private def duplicatedCorpus() = {
    import spark.implicits._
    val a = Seq(1.0f, 0.0f, 0.0f)
    val b = Seq(0.0f, 1.0f, 1.0f)
    (Seq.fill(49)(a) :+ b).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }
      .toDF("id", "emb")
      .withColumn("features", array_to_vector(col("emb")))
  }

  test("raw spark.ml KMeans silently under-delivers centers on the " +
    "duplicated corpus at k=2 (the collapse the guard exists for)") {
    val m = new KMeans().setK(2).setSeed(42L).setMaxIter(10)
      .setInitMode("random").setFeaturesCol("features")
      .fit(duplicatedCorpus())
    assert(m.clusterCenters.length == 1,
      s"Spark's collapse behavior changed — re-audit the SafeKMeans " +
        s"guard: got ${m.clusterCenters.length} centers")
  }

  test("SafeKMeans survives the collapse via the distinct-frame retry " +
    "and recovers both true centers") {
    val feats = duplicatedCorpus()
    val (n, model) = graft.sim.SafeKMeans.fit(feats, k = 2, seed = 42L,
      maxIter = 10, featuresCol = "features", distinctCols = Seq("emb"))
    assert(n == 2L)
    val centers = model.get.clusterCenters.map(_.toArray.toSeq).toSet
    assert(centers == Set(Seq(1.0, 0.0, 0.0), Seq(0.0, 1.0, 1.0)),
      s"retry on the 2-row distinct frame must converge to the two " +
        s"points themselves, got $centers")
  }

  test("the guard is deterministic: two fits on fresh frames agree") {
    val m1 = graft.sim.SafeKMeans.fit(duplicatedCorpus(), k = 2,
      seed = 42L, maxIter = 10, "features", Seq("emb"))._2.get
    val m2 = graft.sim.SafeKMeans.fit(duplicatedCorpus(), k = 2,
      seed = 42L, maxIter = 10, "features", Seq("emb"))._2.get
    assert(m1.clusterCenters.toSeq.map(_.toArray.toSeq) ==
      m2.clusterCenters.toSeq.map(_.toArray.toSeq))
  }
}
