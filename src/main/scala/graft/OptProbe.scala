package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-16 optimization probe (dev tool, not part of the driver
  * contract): times SUB-PIECES of the bench's most expensive queries in
  * a bench-identical session (same master/shuffle-partition config),
  * each driven through the noop sink (guide §1.4) so the measurement is
  * the computation, not the sink or a count-pruned subtree. Job
  * descriptions label each piece (guide §1.5).
  *
  * Usage: runMain graft.OptProbe <sfDir> <probe1,probe2,...>
  */
object OptProbe {

  private def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val probes = args.lift(1).getOrElse("q205").split(",").toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // A/B lever: disable AQE partition coalescing for the whole probe
    // session — if a query speeds up markedly under this, its hot
    // stage is a tiny-input/huge-compute shape AQE serialized onto too
    // few partitions (the q205/q71 failure mode).
    if (sys.env.get("SPARK_GRAFT_PROBE_NOCOALESCE").contains("1")) {
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      println("PROBE session: AQE partition coalescing DISABLED")
    }
    // bench-identical warmup
    spark.range(100000).selectExpr("sum(xxhash64(id) % 1024)").collect()

    def phase(name: String)(f: => Unit): Unit = {
      spark.sparkContext.setJobDescription(name)
      val t0 = System.nanoTime()
      f
      println(f"PROBE $name%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      spark.sparkContext.setJobDescription(null)
    }

    if (probes("q205")) {
      phase("q205:dailyNationRevenue build+noop") {
        noop(graft.queries.SharedFrames.dailyNationRevenue(spark, sfDir))
      }
      phase("q205:dailyNationRevenue cached reread") {
        noop(graft.queries.SharedFrames.dailyNationRevenue(spark, sfDir))
      }
      phase("q205:theilsen on cached series") {
        noop(graft.metrics.TheilSen.fitPerGroup(
          graft.queries.SharedFrames.dailyNationRevenue(spark, sfDir)
            .select(col("nation"), col("day"),
              col("rev").cast("double").as("y")),
          "nation", "day", "y"))
      }
      phase("q205:theilsen again (warm)") {
        noop(graft.metrics.TheilSen.fitPerGroup(
          graft.queries.SharedFrames.dailyNationRevenue(spark, sfDir)
            .select(col("nation"), col("day"),
              col("rev").cast("double").as("y")),
          "nation", "day", "y"))
      }
    }

    if (probes("theil")) {
      val pts = graft.queries.SharedFrames.dailyNationRevenue(spark, sfDir)
        .select(col("nation"), col("day"), col("rev").cast("double").as("y"))
      noop(pts)
      val rows = pts.collect()
      val byKey = rows.groupBy(_.getString(0))
      println(s"PROBE theil:nations=${byKey.size} " +
        s"L=${byKey.map(_._2.length).toSeq.sorted.mkString(",")}")
      // pure driver-side replay of the fitPerGroup inner loop, all keys
      // sequential — the single-core CPU floor of the flatMapGroups work
      val t0 = System.nanoTime()
      byKey.foreach { case (k, rs) =>
        val arr = rs.map(r => (r.getLong(1), r.getDouble(2))).sortBy(_._1)
        val n = arr.length
        val slopes = Array.newBuilder[Long]
        slopes.sizeHint(n * (n - 1) / 2)
        var i = 0
        while (i < n) {
          var j = i + 1
          while (j < n) {
            val dx = arr(j)._1 - arr(i)._1
            if (dx != 0) {
              val m = (arr(j)._2 - arr(i)._2) / dx.toDouble
              slopes += math.floor(m * 1e6 + 0.5).toLong
            }
            j += 1
          }
          i += 1
        }
        val s = slopes.result()
        java.util.Arrays.sort(s)
      }
      println(f"PROBE theil:driver-side all-keys loop ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      phase("theil:fitPerGroup noop") {
        noop(graft.metrics.TheilSen.fitPerGroup(pts, "nation", "day", "y"))
      }
    }

    if (probes("q98x")) {
      val docs = graft.io.Tables.documents(spark, sfDir)
      phase("q98x:sig UNSPREAD") {
        noop(graft.text.TextAnalysis.minhashSignatureArray(
          docs, "doc_id", "text", n = 3, numPerm = 16))
      }
      phase("q98x:sig spread") {
        noop(graft.text.TextAnalysis.minhashSignatureArray(
          graft.io.Tables.spreadScan(docs), "doc_id", "text", n = 3,
          numPerm = 16))
      }
      phase("q98x:sig spread again") {
        noop(graft.text.TextAnalysis.minhashSignatureArray(
          graft.io.Tables.spreadScan(docs), "doc_id", "text", n = 3,
          numPerm = 16))
      }
      phase("q98x:posexplode+sort full") {
        noop(SparkEntry.queries("q98_minhash_rowsig")(spark, sfDir))
      }
    }

    if (probes("q71")) {
      import graft.segment.Twins
      val ratings = graft.io.Tables.ratingsCached(spark, sfDir)
      phase("q71:ratingsCached materialize") { noop(ratings) }
      val tok = Twins.ratingQuantileTokensLong(ratings, 4)
      phase("q71:quantile tokens") { noop(tok) }
      phase("q71:full topTwinsExactQuantile") {
        noop(Twins.topTwinsExactQuantile(ratings, k = 100, nBuckets = 4,
          maxDfPermille = 333))
      }
      phase("q71:full again (memo warm)") {
        noop(Twins.topTwinsExactQuantile(ratings, k = 100, nBuckets = 4,
          maxDfPermille = 333))
      }
    }

    if (probes("q175")) {
      val edges = graft.queries.SharedFrames.coPurchaseEdges(spark, sfDir)
      phase("q175:coPurchaseEdges build") { noop(edges) }
      phase("q175:kcore peelCounts") {
        noop(graft.graph.KCore.peelCounts(spark, edges, k = 3, rounds = 4))
      }
      phase("q175:kcore again") {
        noop(graft.graph.KCore.peelCounts(spark, edges, k = 3, rounds = 4))
      }
    }

    if (probes("q159")) {
      val edges = graft.queries.SharedFrames.coPurchaseEdges(spark, sfDir)
      phase("q159:coPurchaseEdges build") { noop(edges) }
      val seeds = graft.io.Tables.supplier(spark, sfDir)
        .filter(col("s_nationkey") === 0)
        .select(concat(lit("s"), col("s_suppkey")).as("node"))
      phase("q159:bfs hops") {
        noop(graft.graph.Bfs.hops(edges, seeds, maxHops = 3))
      }
    }

    // Generic probe: any registered query name runs through the noop
    // sink (twice — cold then memo-warm), so a candidate's cost can be
    // read without the bench's neighbours.
    probes.filter(SparkEntry.queries.contains).toSeq.sorted.foreach { name =>
      val fn = SparkEntry.queries(name)
      phase(s"$name:cold") { noop(fn(spark, sfDir)) }
      phase(s"$name:warm") { noop(fn(spark, sfDir)) }
    }

    spark.stop()
  }
}
