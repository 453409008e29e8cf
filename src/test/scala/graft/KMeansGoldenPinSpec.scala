package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Value-level regression pin for the KMeans pair (VERDICT r10 #3 — the
  * last rows-only island without one): q33 (embeddings, k=10) and q35
  * (standardized RFM, k=4) have no SQL oracle (iterative ML), so a Spark
  * upgrade or an init/seeding change could silently re-segment every
  * customer while the rows-only gate stays green. This spec pins the
  * seeded models' centroids (EXACT at 6 decimals — fixed seed, fixed
  * maxIter, fixed test partitioning ⇒ bit-stable float math per Spark
  * version) and the per-cluster member counts at sf0.001 against a
  * committed golden file, the same recipe as [[AlsGoldenPinSpec]].
  *
  * Regenerate after an INTENTIONAL surface change with
  * `sbt "Test/runMain graft.KMeansGoldenGen"` — the golden diff is then
  * the review artifact.
  */
object KMeansGoldenPinSpec {
  /** `model,cluster,n,centroid6` CSV rows (centroid components %.6f,
    * ';'-joined) for BOTH seeded fits at sf0.001. Shared verbatim by the
    * spec and the regenerator so they can never diverge. The fits run
    * through the exact q33/q35 helpers ([[graft.queries
    * .SimilarityQueries.kmeansEmb]]/[[graft.queries.SimilarityQueries
    * .kmeansRfm]]) — the pin guards the query surface, not a replica. */
  def computeGolden(spark: SparkSession, sf: String): Seq[String] = {
    def rowsFor(tag: String,
                fm: (org.apache.spark.sql.DataFrame,
                     Option[org.apache.spark.ml.clustering.KMeansModel]))
        : Seq[String] = {
      // The helpers are total since the ML fuzz arm (None ⇔ empty
      // corpus); the golden fixture is never empty, so the model exists.
      val (frame, model0) = fm
      val model = model0.getOrElse(
        sys.error(s"$tag: no KMeans model on the golden fixture"))
      val counts = model.transform(frame)
        .groupBy("prediction").count().collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toMap
      model.clusterCenters.zipWithIndex.map { case (c, i) =>
        // Locale-fixed formatting (the f-interpolator follows the JVM
        // default locale — a comma-decimal locale would corrupt the
        // golden; AlsGoldenPinSpec pins via Spark's format_string for
        // the same reason).
        val cent = c.toArray.map(v => String.format(java.util.Locale.US,
          "%.6f", Double.box(v))).mkString(";")
        s"$tag,$i,${counts.getOrElse(i, 0L)},$cent"
      }.toSeq
    }
    rowsFor("emb_k10", graft.queries.SimilarityQueries.kmeansEmb(spark, sf)) ++
      rowsFor("rfm_k4", graft.queries.SimilarityQueries.kmeansRfm(spark, sf))
  }
}

class KMeansGoldenPinSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  val sf = GraftSpark.sf

  test("seeded KMeans centroids + cluster sizes match the committed golden") {
    val goldenUrl = getClass.getResource("/golden/kmeans_sf0001.csv")
    assert(goldenUrl != null,
      "golden file missing — run `sbt \"Test/runMain graft.KMeansGoldenGen\"` and commit it")
    val golden = scala.io.Source.fromURL(goldenUrl).getLines().drop(1)
      .filter(_.nonEmpty).toSeq
    val got = KMeansGoldenPinSpec.computeGolden(spark, sf)
    assert(got.size == golden.size, s"${got.size} rows vs golden ${golden.size}")
    got.zip(golden).zipWithIndex.foreach { case ((g, w), i) =>
      assert(g == w, s"golden row $i: got '$g' want '$w' — if the change " +
        "is intentional, regenerate via KMeansGoldenGen and review the diff")
    }
  }
}
