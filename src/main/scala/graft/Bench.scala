package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed JVM warm-up: scheduler, whole-stage-codegen compiler, and
    // the parquet datasource init path — against a throwaway parquet
    // written here, NOT any input table (warming an input would
    // pre-populate file-listing/footer caches some timed query reads).
    // Without it the alphabetically-first query absorbs ~3-4 s of
    // one-time JVM costs that say nothing about its plan.
    spark.range(100000).selectExpr("sum(id)").collect()
    val warmDir = java.nio.file.Files.createTempDirectory("graft-warm")
    spark.range(100).write.mode("overwrite").parquet(s"$warmDir/w")
    spark.read.parquet(s"$warmDir/w").count()
    sys.addShutdownHook { // don't accumulate warm-up dirs across runs
      try {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(warmDir).iterator().asScala.toSeq
          .sortBy(-_.getNameCount)
          .foreach(p => java.nio.file.Files.deleteIfExists(p))
      } catch { case _: Throwable => () }
    }
    // Stable name order: run-to-run comparable timings (Map order is
    // hash-dependent and reshuffles whenever a query is added).
    // Driver contract: no args. An optional first arg (comma-separated
    // query names) is a builder-side dev aid — time only that subset in
    // an otherwise-identical fresh JVM.
    val only: Option[Set[String]] =
      if (args.nonEmpty) Some(args(0).split(",").toSet) else None
    var failed = List.empty[String]
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch {
        case e: Throwable =>
          // A swallowed failure would read as a fast success and silently
          // flatter the totals; surface it in the JSON and on stderr.
          failed ::= name
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
      }
      val secs = (System.nanoTime() - t0) / 1e9
      // Per-query progress on stderr: makes a stalled query identifiable
      // mid-run (the stdout JSON line stays the single driver artifact).
      System.err.println(f"[bench] $name done in $secs%.2f s")
      name -> secs
    }
    // Stdout contract: the driver tail-captures the LAST ~2000 chars of
    // stdout, so the single JSON line must fit entirely inside that
    // window — at 182 queries a full per-query map is ~5 kB and clips the
    // head ("metric":"total" unrecoverable; BENCH_r06 "parsed": null).
    // Stdout therefore carries total + failures + only the SLOWEST
    // queries (the perf signal), and the complete per-query map goes to
    // stderr and to bench_full.json next to the working dir.
    def s3(v: Double) = f"$v%.3f"
    def qjson(rs: Seq[(String, Double)]) =
      rs.map { case (k, v) => "\"" + k + "\":" + s3(v) }
        .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val failedJson = failed.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    val slowest = results.sortBy(-_._2).take(30).sortBy(_._1)
    val fullLine =
      s"""{"metric":"total","value":${s3(total)},"unit":"sec","n_queries":${results.size},"queries":${qjson(results)},"failed":$failedJson,"sf":"$sfDir"}"""
    System.err.println(s"[bench-full] $fullLine")
    // Only a FULL run may write the artifact: a dev subset run would
    // silently clobber the full-surface record the docs cite.
    if (only.isEmpty)
      try java.nio.file.Files.writeString(
        java.nio.file.Paths.get("bench_full.json"), fullLine + "\n")
      catch { case _: Throwable => () }
    println(
      s"""{"metric":"total","value":${s3(total)},"unit":"sec","n_queries":${results.size},"queries":${qjson(slowest)},"queries_note":"slowest 30 of ${results.size}; full map in stderr [bench-full] and bench_full.json","failed":$failedJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
