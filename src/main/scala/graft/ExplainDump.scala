package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Optimization-round evidence tool (round 16): dump
  * `.explain("formatted")` for a set of queries into per-query text
  * files — the `plans/rNN/<query>_{before,after}.txt` artifacts the
  * optimization judge checks plan claims against. Unlike [[PlanDump]]
  * (normalized fingerprints for cross-round regression diffs), this
  * emits the full human-readable formatted plan, AND — because
  * `explain` on a lazy frame shows only the initial AQE plan — it
  * first drives the query's own QueryExecution (collect(), the
  * PlanDump discipline; a separate noop write would plan a NEW
  * QueryExecution and leave this one un-finalized) so the captured
  * plan is the FINAL adaptively-executed one (`isFinalPlan=true`),
  * the plan the bench actually pays for.
  *
  * Usage: runMain graft.ExplainDump <sfDir> <outDir> <suffix> q1,q2,...
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = Paths.get(args(1))
    val suffix = args(2)
    val names = args(3).split(",").map(_.trim).filter(_.nonEmpty)
    val unknown = names.toSet -- SparkEntry.queries.keySet
    require(unknown.isEmpty,
      s"unknown query name(s): ${unknown.toSeq.sorted.mkString(",")}")
    Files.createDirectories(outDir)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.collect() // drive THIS QueryExecution so AQE finalizes
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(outDir.resolve(s"${name}_$suffix.txt"), txt)
      System.err.println(s"[explaindump] $name -> ${name}_$suffix.txt")
    }
    spark.stop()
  }
}
