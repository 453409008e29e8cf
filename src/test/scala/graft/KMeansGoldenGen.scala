package graft

/** Regenerates the KMeans golden pin (`src/test/resources/golden/
  * kmeans_sf0001.csv`) asserted by KMeansGoldenPinSpec. Run after an
  * INTENTIONAL change to the clustering surface (Spark upgrade, init or
  * seed change) — the spec's diff against the old golden is the review
  * artifact that makes the shift visible instead of silent:
  *
  *   sbt "Test/runMain graft.KMeansGoldenGen"
  */
object KMeansGoldenGen {
  def main(args: Array[String]): Unit = {
    val rows = KMeansGoldenPinSpec.computeGolden(GraftSpark.spark, GraftSpark.sf)
    val path = java.nio.file.Paths.get(
      "src/test/resources/golden/kmeans_sf0001.csv")
    java.nio.file.Files.createDirectories(path.getParent)
    java.nio.file.Files.writeString(path,
      ("model,cluster,n,centroid6" +: rows).mkString("", "\n", "\n"))
    println(s"[golden] wrote ${rows.size} rows to $path")
    GraftSpark.spark.stop()
  }
}
