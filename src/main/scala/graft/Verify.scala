package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // Driver contract: 2 args. An optional 3rd (comma-separated query
    // names) is a builder-side dev aid — dump only that subset.
    val (sfDir, outDir) = (args(0), args(1))
    val only: Option[Set[String]] =
      if (args.length > 2)
        Some(args(2).split(",").map(_.trim).filter(_.nonEmpty).toSet)
      else None
    // A typo'd subset name would silently dump nothing and let a stale
    // or empty outDir read as green — fail loudly instead.
    only.foreach { s =>
      val unknown = s -- SparkEntry.queries.keySet
      require(unknown.isEmpty,
        s"unknown query name(s) in subset arg: ${unknown.toSeq.sorted.mkString(",")}")
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // If events.parquet carries TIMESTAMP(NANOS) (which Spark rejects
      // by default) read it as ns-epoch long; other units (MICROS→NTZ,
      // instant) are normalized to ns-long in Tables.normalizeEpochNs —
      // the engine is physical-timestamp-unit-oblivious.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    var nDumped = 0
    var nFailed = 0
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        nDumped += 1
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        nFailed += 1
        // A PREVIOUS run's parquet for this name may still sit in outDir
        // (the failure can precede write.mode(overwrite)'s delete) — the
        // compare would then false-green against stale output. Remove it.
        try {
          val d = Paths.get(s"$outDir/$name")
          if (Files.exists(d)) {
            import scala.jdk.CollectionConverters._
            Files.walk(d).iterator().asScala.toSeq
              .sortBy(-_.getNameCount).foreach(Files.deleteIfExists(_))
          }
        } catch { case _: Throwable => () }
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => only.forall(_.contains(k)) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // Self-describing run stamp (ADVICE r8/r9): records WHICH sf the
    // dump was produced from, so a mislabeled artifact is detectable.
    // n_queries counts SUCCESSFUL dumps (not attempts) so the stamp
    // matches what is actually on disk; failures ship separately.
    val sfRun = sfDir.split('/').filter(_.nonEmpty).lastOption.getOrElse("?")
    Files.writeString(Paths.get(s"$outDir/run_meta.json"),
      s"""{"sf_dir": ${q(sfDir)}, "sf_run": ${q(sfRun)}, "n_queries": $nDumped, "n_failed": $nFailed}""")
    spark.stop()
  }
}
