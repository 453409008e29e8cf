package graft

import org.apache.spark.sql.functions._

/** Regenerates the ALS golden pin (`src/test/resources/golden/
  * als_top10_sf0001.csv`) asserted by AlsGoldenPinSpec. Run after an
  * INTENTIONAL change to the recommendation surface (Spark upgrade, ALS
  * blocking change) — the spec's diff against the old golden is the
  * review artifact that makes the shift visible instead of silent:
  *
  *   sbt "Test/runMain graft.AlsGoldenGen"
  */
object AlsGoldenGen {
  def main(args: Array[String]): Unit = {
    val rows = AlsGoldenPinSpec.computeGolden(GraftSpark.spark, GraftSpark.sf)
    val path = java.nio.file.Paths.get(
      "src/test/resources/golden/als_top10_sf0001.csv")
    java.nio.file.Files.createDirectories(path.getParent)
    java.nio.file.Files.writeString(path,
      ("user_id,rank,item_id,score6" +: rows).mkString("", "\n", "\n"))
    println(s"[golden] wrote ${rows.size} rows to $path")
    GraftSpark.spark.stop()
  }
}
