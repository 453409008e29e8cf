package graft

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** Differential fuzz gate, seeded-ML arm (VERDICT r14 item 2): the ALS
  * / KMeans / IVF / sketch family run over the degenerate fixtures of
  * [[FuzzMlFixtures]] — the last family that had hand pins only.
  *
  * Two gates, matching the family's two kinds of checkability:
  *
  *  1. The ORACLE sweep ([[FuzzHarness]], engine-vs-DuckDB): the
  *     family's oracle-gated queries — q186 (the ALS structural audit,
  *     which fits the real seeded ALS on every fixture), q190 (split
  *     leakage), q234 (HLL register oracle), q187/q189/q191 (KMV
  *     algebra). 13 classes × 3 seeds = 39 fixtures × 6 families
  *     = 234 comparisons (r16 added `duplicated_embeddings`, the
  *     sampled-center-collapse shape of ADVICE r15).
  *
  *  2. ENGINE INVARIANTS for the queries that have no SQL oracle by
  *     nature (q52/q53/q55/q56 ALS, q33/q35 KMeans, q37 IVF, q16 HLL):
  *     no throw on any degenerate input (a 100 TB pipeline must not
  *     fall over on an empty partition day), list/rank structure,
  *     metrics ∈ [0,1] ∪ NULL (never NaN — the SQL-NULL convention the
  *     oracle side of the repo already uses for undefined aggregates),
  *     empty-in → empty-out (or the documented degenerate shape), and
  *     same-seed determinism across two materializations of the same
  *     fixture.
  */
class FuzzMlSpec extends AnyFunSuite {

  private val core = Vector(
    "q186_als_audit",    // fits seeded ALS on EVERY fixture; shape audit
    "q234_hll_oracle",   // HLL registers on empty/skewed user sets
    "q187_kmv_distinct") // KMV sketch on tiny/empty distinct domains
  private val rotation = Vector(
    "q190_split_leakage", // chrono-split overlap (empty validation side)
    "q189_kmv_union",     // sketch merge algebra on empty/degenerate types
    "q191_kmv_intersect") // inclusion–exclusion under empty intersections

  test("engine matches DuckDB on 39 seeded degenerate ML fixtures " +
    "across 6 oracle-gated families") {
    FuzzHarness.sweep(GraftSpark.spark, "ml",
      FuzzMlFixtures.Classes, seeds = 3,
      write = FuzzMlFixtures.write,
      core = core, rotation = rotation, strides = Seq(0, 1, 2))
  }

  // ---- invariant gate (no-oracle queries) --------------------------------

  private lazy val spark = GraftSpark.spark
  private def fixture(cls: String, sub: String = "inv"): String = {
    val dir = new java.io.File(
      s"target/fuzz/ml-$sub/$cls").getAbsolutePath
    FuzzMlFixtures.write(spark, cls, 0L, dir)
    dir
  }

  private def run(q: String, dir: String): Seq[Row] =
    graft.queries.Registry.all(q)(spark, dir).collect().toSeq

  /** metric cell: NULL or a finite double in [0, 1] — never NaN. */
  private def assertMetric(row: Row, field: String, ctx: String): Unit = {
    val i = row.fieldIndex(field)
    if (!row.isNullAt(i)) {
      val v = row.get(i) match {
        case d: java.lang.Double => d.doubleValue()
        case d: java.math.BigDecimal => d.doubleValue()
        case other => fail(s"$ctx.$field unexpected type $other")
      }
      assert(!v.isNaN && v >= 0.0 && v <= 1.0, s"$ctx.$field = $v")
    }
  }

  /** rmse cell: NULL or a finite non-negative double — never NaN. */
  private def assertRmse(row: Row, ctx: String): Unit = {
    val i = row.fieldIndex("rmse")
    if (!row.isNullAt(i)) {
      val v = row.get(i) match {
        case d: java.lang.Double => d.doubleValue()
        case d: java.math.BigDecimal => d.doubleValue()
        case other => fail(s"$ctx.rmse unexpected type $other")
      }
      assert(!v.isNaN && v >= 0.0, s"$ctx.rmse = $v")
    }
  }

  /** per-user rec lists: dense ranks from 1, unique items,
    * non-increasing scores. */
  private def assertLists(rows: Seq[Row], ctx: String): Unit =
    rows.groupBy(_.getAs[Any]("user_id")).foreach { case (u, rs) =>
      val byRank = rs.sortBy(_.getAs[Number]("rank").intValue())
      val ranks = byRank.map(_.getAs[Number]("rank").intValue())
      assert(ranks == (1 to ranks.size),
        s"$ctx user $u ranks not dense: $ranks")
      val items = byRank.map(_.getAs[Any]("item_id"))
      assert(items.distinct.size == items.size,
        s"$ctx user $u repeats items: $items")
      val scores = byRank.map(_.getAs[Number]("score").doubleValue())
      assert(scores.zip(scores.drop(1)).forall { case (a, b) => a >= b },
        s"$ctx user $u scores increase: $scores")
    }

  for (cls <- FuzzMlFixtures.Classes) {
    test(s"no-oracle ML family holds its invariants on the $cls fixture") {
      val dir = fixture(cls)

      val recs = run("q52_als_recs", dir)
      assertLists(recs, s"$cls/q52")
      if (cls == "empty_all" || cls == "one_rating_users")
        assert(recs.isEmpty, s"$cls/q52 expected empty, got ${recs.size}")

      for (q <- Seq("q53_als_eval", "q56_als_test_eval")) {
        val rows = run(q, dir)
        assert(rows.size == 1, s"$cls/$q expected one row, got $rows")
        val row = rows.head
        Seq("p_at_k", "map_at_k", "ndcg_at_k")
          .foreach(assertMetric(row, _, s"$cls/$q"))
        assertRmse(row, s"$cls/$q")
        assert(row.getAs[Number]("n_users").longValue() >= 0L)
      }

      val clusters = run("q33_kmeans_embeddings", dir)
      val nEmb = FuzzMlFixtures.embeddingRows(cls, 0L).size
      assert(clusters.map(_.getAs[Number]("n").longValue()).sum == nEmb,
        s"$cls/q33 cluster sizes must partition the $nEmb-vector corpus")

      val segs = run("q35_kmeans_segments", dir)
      segs.foreach { row =>
        assert(!row.isNullAt(row.fieldIndex("segment")), s"$cls/q35 $row")
        assert(row.getAs[Number]("n_customers").longValue() > 0L)
      }

      val ann = run("q37_ann_ivf", dir)
      ann.groupBy(_.getAs[Any]("q_id")).foreach { case (q, rs) =>
        val ranks = rs.map(_.getAs[Number]("rank").intValue()).sorted
        assert(ranks == (1 to ranks.size), s"$cls/q37 query $q: $ranks")
      }
      if (cls == "empty_all" || cls == "tiny_embeddings")
        assert(ann.isEmpty, s"$cls/q37 corpus is empty, got ${ann.size}")

      val hll = run("q16_approx_distinct", dir)
      hll.foreach { row =>
        assert(row.getAs[Number]("approx_parts").longValue() >= 0L)
        assert(row.getAs[Number]("approx_orders").longValue() >= 0L)
      }
      if (cls == "empty_all") assert(hll.isEmpty)
    }
  }

  test("the q55 ALS grid keeps its 16-cell shape and [0,1] metric on " +
    "degenerate inputs") {
    for (cls <- Seq("empty_all", "few_items", "one_rating_users")) {
      val dir = fixture(cls, sub = "grid")
      val rows = run("q55_als_grid", dir)
      assert(rows.size == 16, s"$cls/q55: ${rows.size} rows")
      val combos = rows.map(r => (r.getAs[Number]("rank").intValue(),
        r.getAs[Number]("reg_param").doubleValue()))
      assert(combos == (for (r <- Seq(5, 10, 20, 50);
                             g <- Seq(0.01, 0.05, 0.1, 1.0)) yield (r, g)),
        s"$cls/q55 combos: $combos")
      rows.foreach(assertMetric(_, "map_at_k", s"$cls/q55"))
    }
  }

  test("seeded ML queries are deterministic across two " +
    "materializations of the same fixture") {
    val a = fixture("baseline", sub = "det-a")
    val b = fixture("baseline", sub = "det-b")
    for (q <- Seq("q52_als_recs", "q33_kmeans_embeddings", "q37_ann_ivf",
        "q35_kmeans_segments")) {
      assert(run(q, a) == run(q, b), s"$q differs across materializations")
    }
  }
}
