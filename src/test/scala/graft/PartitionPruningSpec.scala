package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hive-style partitioned layout + partition pruning — the other half of
  * the physical-layout scale story next to BucketingSpec's co-located
  * joins. At 100 TB the events table is written partitioned by day; a
  * query for one day must plan its date predicate as a PARTITION filter
  * (listing-time directory pruning), not a row-level data filter over the
  * full scan.
  */
class PartitionPruningSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  val sf = GraftSpark.sf

  test("date-partitioned write is pruned to one partition by a date filter") {
    val out = Files.createTempDirectory("graft-part").toString
    val events = graft.io.Tables.events(spark, sf)
      .withColumn("d", to_date(timestamp_seconds(expr("ts div 1000000000"))))
    events.write.partitionBy("d").mode("overwrite").parquet(out)

    val days = events.select("d").distinct().count()
    assert(days > 1, "fixture must span multiple days for pruning to mean anything")

    val oneDay = events.agg(min("d")).head().getDate(0)
    val read = spark.read.parquet(out).filter(col("d") === lit(oneDay))

    // The predicate lands in PartitionFilters, not in the data Filter: the
    // plan prunes directories during listing, before any file is opened.
    val plan = read.queryExecution.executedPlan.toString
    val pf = "(?s).*PartitionFilters: \\[([^\\]]*)\\].*".r
    plan match {
      case pf(filters) =>
        assert(filters.contains("d#"),
          s"date predicate missing from PartitionFilters:\n$plan")
      case _ => fail(s"no PartitionFilters in scan plan:\n$plan")
    }

    // The layout is real: the partition directory exists and reading ONLY
    // that directory yields the same rows as the pruned filter.
    val dayDir = new java.io.File(s"$out/d=$oneDay")
    assert(dayDir.isDirectory, s"missing partition dir $dayDir")
    val direct = spark.read.parquet(dayDir.toString).count()
    val filtered = read.count()
    assert(filtered == direct && filtered > 0)
    assert(filtered == events.filter(col("d") === lit(oneDay)).count())
  }

  test("q299's dynamic pruning SKIPS files at runtime (numFiles metric = " +
      "kept days, not all days)") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

    val df = graft.queries.Registry.all("q299_dpp_prune")(spark, sf)
    // collect() drives THIS frame's QueryExecution (count() would build a
    // fresh one and leave these scan metrics untouched)
    assert(df.collect().nonEmpty)

    // AQE buries executed stages inside QueryStageExec leaves — a plain
    // collect stops at the stage boundary, so unwrap recursively.
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.QueryStageExec
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = {
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case other => other.children
      }
      (p match {
        case f: FileSourceScanExec => Seq(f)
        case _ => Nil
      }) ++ kids.flatMap(scans)
    }
    val root = df.queryExecution.executedPlan
    val scan = scans(root)
      .find(_.relation.location.rootPaths.exists(
        _.toString.contains("graft-evday")))
      .getOrElse(fail(s"no staged-events scan in plan:\n$root"))

    // one file per day directory (repartition(d) before partitionBy(d))
    val days = graft.io.Tables.events(spark, sf)
      .select(to_date(timestamp_seconds(expr("ts div 1000000000"))).as("d"))
      .distinct()
    val total = days.count()
    val kept = days.filter(expr("unix_date(d) % 7 IN (0, 3)")).count()
    assert(kept > 0 && kept < total,
      s"fixture must split days for the skip to mean anything ($kept/$total)")

    val numFiles = scan.metrics("numFiles").value
    assert(numFiles == kept,
      s"DPP read $numFiles files, expected the $kept kept days (of $total)")
  }
}
