package graft

import graft.text.Dedup

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DedupSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._

  // Chain 1-2-3-4 (diameter 3), pair 10-11, triangle 20-21-22.
  private def graph = Seq(
    (2L, 1L), (2L, 3L), (3L, 4L),
    (10L, 11L),
    (20L, 21L), (21L, 22L), (20L, 22L)).toDF("id_a", "id_b")

  test("connectedComponents: chain, pair, triangle resolve to min labels") {
    val got = Dedup.connectedComponents(graph, "id_a", "id_b")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("connectedComponents: empty edge list → empty labels, no exception") {
    val empty = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(Dedup.connectedComponents(empty, "id_a", "id_b").count() == 0)
  }

  test("connectedComponents fails LOUDLY when the diameter exceeds maxIter") {
    assertThrows[IllegalStateException] {
      Dedup.connectedComponents(graph, "id_a", "id_b", maxIter = 1).collect()
    }
  }

  test("nearDupClusters carries component sizes; survivors drop non-canonicals") {
    val clusters = Dedup.nearDupClusters(graph, "id_a", "id_b")
    val sizes = clusters.select("canonical_id", "cluster_size").distinct()
      .as[(Long, Long)].collect().toMap
    assert(sizes == Map(1L -> 4L, 10L -> 2L, 20L -> 3L))
    val docs = (1L to 30L).toDF("doc_id")
    val kept = Dedup.survivors(docs, clusters, "doc_id")
      .as[Long].collect().toSet
    // Victims: 2,3,4 / 11 / 21,22. Everything else (incl. docs in no
    // pair) survives.
    assert(kept == (1L to 30L).toSet -- Set(2L, 3L, 4L, 11L, 21L, 22L))
  }

  test("q73/q74 cluster math agrees with the pair list at sf0.001") {
    val dir = GraftSpark.sf
    val pairs = graft.queries.TextQueries.q27(spark, dir)
      .select("id_a", "id_b")
    val members = pairs.select(col("id_a").as("id"))
      .union(pairs.select(col("id_b").as("id"))).distinct().count()
    val clusters = graft.queries.TextQueries.q73(spark, dir)
    // Every paired doc is clustered, canonical ids are component members,
    // and cluster_size sums back to the member count.
    assert(clusters.count() == members)
    assert(clusters.filter(col("canonical_id") > col("doc_id")).count() == 0)
    val survivorCount = graft.queries.TextQueries.q74(spark, dir).count()
    val victims = clusters.filter(col("doc_id") =!= col("canonical_id")).count()
    val total = graft.io.Tables.documents(spark, dir).count()
    assert(survivorCount == total - victims)
  }

  test("contaminationReport flags exactly the docs sharing an 8-gram") {
    import graft.text.TextAnalysis.contaminationReport
    val bench = Seq(
      (100L, "alpha beta gamma delta epsilon zeta eta theta iota"))
      .toDF("doc_id", "text")
    val train = Seq(
      // contains benchmark 8-grams: positions 1..8 and 2..9 of the
      // benchmark text both appear → n_shared = 2
      (1L, "xx alpha beta gamma delta epsilon zeta eta theta iota yy"),
      // shares only a 7-gram tail — BELOW n, must not flag
      (2L, "beta gamma delta epsilon zeta eta theta"),
      // no overlap at all
      (3L, "one two three four five six seven eight nine ten"))
      .toDF("doc_id", "text")
    val got = contaminationReport(train, bench, "doc_id", "text", n = 8)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 2L))
  }

  test("dedupLedger: exact outranks near; kept docs are their own canonical") {
    val docs = Seq(
      (1L, "aa bb"), (2L, "aa bb"),   // exact twins — canonical 1
      (3L, "cc dd"), (4L, "cc dd x"), // near pair — cluster canonical 3
      (5L, "zz"),                     // untouched
      (6L, "ee ff"), (7L, "ee ff")    // exact twins ALSO in a near cluster
    ).toDF("doc_id", "text")
    val nearClusters = Seq(
      (3L, 3L, 2L), (4L, 3L, 2L),
      (6L, 6L, 2L), (7L, 6L, 2L)
    ).toDF("doc_id", "canonical_id", "cluster_size")
    val got = Dedup.dedupLedger(docs, "doc_id", "text", nearClusters)
      .as[(Long, String, Long)].collect()
      .map { case (id, st, c) => id -> ((st, c)) }.toMap
    assert(got == Map(
      1L -> (("kept", 1L)),
      2L -> (("exact_dup", 1L)),
      3L -> (("kept", 3L)),
      4L -> (("near_dup", 3L)),
      5L -> (("kept", 5L)),
      6L -> (("kept", 6L)),
      // exact identity wins over near-cluster membership
      7L -> (("exact_dup", 6L))))
  }

  test("per-row signature path ≡ aggregate path (values, bands)") {
    import graft.text.TextAnalysis
    val docs = graft.io.Tables.documents(spark, GraftSpark.sf)
    // Exploded values: q98's map path == q25's aggregate path.
    val viaAgg = TextAnalysis.minhashSignatures(
      TextAnalysis.shingles(docs, "doc_id", "text", n = 3)
        .withColumnRenamed("shingle", "token"), "doc_id", numPerm = 16)
    val viaRow = TextAnalysis.minhashSignatureArray(docs, "doc_id", "text",
        n = 3, numPerm = 16)
      .select(col("doc_id"), posexplode(col("sig")).as(Seq("p", "mh")))
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.select(col("doc_id"), col("p").cast("int").as("p"), col("mh"))
        .orderBy("doc_id", "p").as[(Long, Int, Long)].collect().toSeq
    val a = norm(viaAgg)
    val r = norm(viaRow)
    assert(a == r)
    // Band fingerprints: the streaming (array) banding emits the same
    // strings as the batch (aggregate) banding — q99's join keys match
    // its static index.
    val bandsAgg = TextAnalysis.lshBands(viaAgg, "doc_id", rowsPerBand = 4)
      .select("doc_id", "band", "band_sig")
      .as[(Long, Long, String)].collect().toSet
    val bandsRow = TextAnalysis.lshBandsFromArray(
      TextAnalysis.minhashSignatureArray(docs, "doc_id", "text", 3, 16),
      "doc_id", numPerm = 16, rowsPerBand = 4)
      .select("doc_id", "band", "band_sig")
      .as[(Long, Long, String)].collect().toSet
    assert(bandsAgg == bandsRow)
    // No shuffle in the per-row signature plan.
    val rowPlan = TextAnalysis.minhashSignatureArray(docs, "doc_id", "text", 3, 16)
      .queryExecution.executedPlan.toString
    assert(!rowPlan.contains("Exchange"),
      s"per-row signature pass must not exchange:\n$rowPlan")
  }

  test("contaminationReportBloom ≡ contaminationReport, with might_contain in the plan") {
    import graft.text.TextAnalysis.{contaminationReport, contaminationReportBloom}
    val docs = graft.io.Tables.documents(spark, GraftSpark.sf)
    val train = docs.filter(col("doc_id") % 17 =!= 0)
    val bench = docs.filter(col("doc_id") % 17 === 0)
    val exact = contaminationReport(train, bench, "doc_id", "text", n = 8)
    val bloom = contaminationReportBloom(train, bench, "doc_id", "text", n = 8)
    // The Bloom prefilter is in the plan (native expression, not a UDF)…
    val plan = bloom.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"),
      s"Bloom prefilter missing from plan:\n$plan")
    // …and invisible in the result: false positives die in the exact join.
    val e = exact.orderBy("doc_id").as[(Long, Long)].collect().toSeq
    val b = bloom.orderBy("doc_id").as[(Long, Long)].collect().toSeq
    assert(e == b)
    assert(e.nonEmpty) // the sf0.001 corpus does plant cross-split dups
  }
}
