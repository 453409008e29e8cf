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
}
