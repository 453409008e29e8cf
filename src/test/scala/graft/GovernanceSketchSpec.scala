package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants of the r9 governance/sketch wave: q286 PII scrub
  * audit, q287 rolling-HLL distinct, q288 quantile-sketch union, q289
  * cross-source dup matrix. Exact values are oracle-gated by the
  * driver; these pin the properties the hash compare can't express.
  */
class GovernanceSketchSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  val sf = GraftSpark.sf

  test("q286 audit counts reproduce the deterministic planting rules") {
    val rows = graft.queries.TextQueries.queries(
      "q286_pii_scrub_audit")(spark, sf).collect()
    val docs = graft.io.Tables.documents(spark, sf)
      .select("doc_id", "source")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val bySource = docs.groupBy(_._2)
    rows.foreach { r =>
      val src = r.getAs[String]("source")
      val ids = bySource(src).map(_._1)
      assert(r.getAs[Long]("n_docs") == ids.length.toLong)
      // the corpus itself is clean, so hits == planted docs exactly
      assert(r.getAs[Long]("email_docs") == ids.count(_ % 3 == 0).toLong)
      assert(r.getAs[Long]("email_hits") == r.getAs[Long]("email_docs"))
      assert(r.getAs[Long]("digitrun_docs") ==
        ids.count(_ % 5 == 0).toLong)
      assert(r.getAs[Long]("url_docs") == ids.count(_ % 7 == 0).toLong)
      assert(r.getAs[Long]("clean_docs") ==
        ids.count(i => i % 3 != 0 && i % 5 != 0 && i % 7 != 0).toLong)
      val ppm = r.getAs[Long]("clean_ppm")
      assert(ppm >= 0 && ppm <= 1000000L)
    }
  }

  test("q287 rolling HLL tracks the exact WAU within the p=8 error band") {
    val rows = graft.queries.OlapQueries.queries(
      "q287_hll_rolling_distinct")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val np = r.getAs[Long]("n_present")
      assert(np >= 1 && np <= 256 &&
        r.getAs[Long]("v_zero") == 256 - np)
      val raw = r.getAs[Double]("est_wau")
      val vz = r.getAs[Long]("v_zero")
      val ex = r.getAs[Long]("exact_wau").toDouble
      // The hashed surface carries the RAW estimate (ln is a libm call
      // engines disagree on by ulps — q234 contract); the small-range
      // linear-counting correction is the documented client-side
      // formula over (raw, v_zero). Apply it here like a client would.
      val est =
        if (raw <= 2.5 * 256 && vz > 0) 256.0 * math.log(256.0 / vz)
        else raw
      // sigma = 1.04/sqrt(256) ~ 6.5% for the raw regime; linear
      // counting is tighter still — 5-sigma + small-n slop
      assert(est > 0 && math.abs(est - ex) / math.max(ex, 16.0) < 0.5,
        s"corrected $est (raw $raw, v_zero $vz) vs exact $ex: " +
          r.toString)
    }
    // day-7+ windows must cover >= the single-day distinct count
    val day0 = rows.map(_.getAs[Long]("day")).min
    assert(rows.count(_.getAs[Long]("day") >= day0 + 6) > 0)
  }

  test("q288 union sample equals the direct global bottom-k and brackets " +
      "the exact percentiles") {
    val r = graft.queries.OlapQueries.queries(
      "q288_quantile_sketch_union")(spark, sf).collect().head
    val n = r.getAs[Long]("n_rows")
    assert(r.getAs[Long]("n_sample") == math.min(n, 256L))
    assert(r.getAs[Long]("n_types_merged") >= 2)
    val (e50, e90, e99) = (r.getAs[Double]("est_p50"),
      r.getAs[Double]("est_p90"), r.getAs[Double]("est_p99"))
    assert(e50 <= e90 && e90 <= e99)
    val (p50, p90, p99) = (r.getAs[Double]("p50"),
      r.getAs[Double]("p90"), r.getAs[Double]("p99"))
    assert(p50 <= p90 && p90 <= p99)
    // 256-point sample: loose relative envelope on the median
    assert(p50 == 0.0 || math.abs(e50 - p50) / math.max(p50, 1e-9) < 0.3)
  }

  test("q292 kappa is chance-corrected agreement over q22's confusion " +
      "matrix") {
    val r = graft.queries.TextQueries.queries(
      "q292_cohens_kappa")(spark, sf).collect().head
    val (po, pe, k) = (r.getAs[Double]("po"), r.getAs[Double]("pe"),
      r.getAs[Double]("kappa"))
    assert(po >= 0 && po <= 1 && pe > 0 && pe < 1)
    assert(k <= po + 1e-9, "kappa can never exceed raw agreement")
    // recompute from q22's per-doc (predicted, actual) pairs
    val pairs = graft.queries.TextQueries.queries(
      "q22_lang_id")(spark, sf)
      .select("predicted", "actual").collect()
      .map(r2 => (r2.getString(0), r2.getString(1)))
    val n = pairs.length.toLong
    val agree = pairs.count(p => p._1 == p._2).toLong
    assert(r.getAs[Long]("n_docs") == n &&
      r.getAs[Long]("n_agree") == agree)
    val rs = pairs.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val cs = pairs.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val peNum = rs.keySet.intersect(cs.keySet).toSeq
      .map(l => BigInt(rs(l)) * cs(l)).sum
    def q6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    assert(k == q6((BigInt(n) * agree - peNum).toDouble /
      (BigInt(n) * n - peNum).toDouble))
  }

  test("q293 elasticity classes respect their own |median| boundary") {
    val rows = graft.queries.OlapQueries.queries(
      "q293_arc_elasticity")(spark, sf).collect()
    assert(rows.nonEmpty &&
      rows.forall(r => Set("elastic", "inelastic")(r.getString(0))))
    rows.foreach { r =>
      assert(r.getAs[Long]("n_parts") > 0)
      val m = r.getAs[Double]("median_elasticity")
      if (r.getString(0) == "elastic") assert(math.abs(m) > 1.0)
      else assert(math.abs(m) <= 1.0)
    }
  }

  test("q294 funnel stages chain and only ever shrink") {
    val rows = graft.queries.TextQueries.queries(
      "q294_quality_filter_funnel")(spark, sf)
      .orderBy("stage").collect()
    assert(rows.map(_.getString(0)).toSeq ==
      Seq("1_min_length", "2_low_repetition", "3_lang_agreement"))
    val nDocs = graft.io.Tables.documents(spark, sf).count()
    assert(rows.head.getAs[Long]("n_in") == nDocs)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_out") <= r.getAs[Long]("n_in"))
      assert(r.getAs[Long]("n_dropped") ==
        r.getAs[Long]("n_in") - r.getAs[Long]("n_out"))
    }
    // sequential: each stage starts from the previous stage's survivors
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b.getAs[Long]("n_in") == a.getAs[Long]("n_out"))
    }
  }

  test("q295 savings reconcile with q74's survivor set") {
    val rows = graft.queries.TextQueries.queries(
      "q295_dedup_token_savings")(spark, sf).collect()
    val survivors = graft.queries.TextQueries.queries(
      "q74_neardup_survivors")(spark, sf).count()
    assert(rows.map(_.getAs[Long]("docs_after")).sum == survivors)
    rows.foreach { r =>
      assert(r.getAs[Long]("docs_after") <= r.getAs[Long]("docs_before"))
      assert(r.getAs[Long]("tokens_after") <=
        r.getAs[Long]("tokens_before"))
      val ppm = r.getAs[Long]("token_savings_ppm")
      assert(ppm >= 0 && ppm <= 1000000L)
    }
  }

  test("q296 lateness percentiles are ordered and count every event") {
    val r = graft.queries.StreamingQueries.queries(
      "q296_watermark_lateness")(spark, sf).collect().head
    assert(r.getAs[Long]("n_events") ==
      graft.io.Tables.events(spark, sf).count())
    assert(r.getAs[Long]("n_on_time") <= r.getAs[Long]("n_events"))
    val (p50, p95, p99, mx) = (r.getAs[Long]("p50_late_s"),
      r.getAs[Long]("p95_late_s"), r.getAs[Long]("p99_late_s"),
      r.getAs[Long]("max_late_s"))
    assert(0 <= p50 && p50 <= p95 && p95 <= p99 && p99 <= mx)
  }

  test("q297 busy time equals a driver interval-union recompute") {
    val rows = graft.queries.AnalyticsQueries.queries(
      "q297_busy_time_union")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("busy_s") <= 86400L)
      assert(r.getAs[Long]("busy_ppm_of_day") <= 1000000L)
    }
    // exact recompute: merge the per-user session intervals in memory
    val gapNs = 30L * 60 * 1000000000L
    val dayNs = 86400000000000L
    val evs = graft.io.Tables.events(spark, sf)
      .select("user_id", "ts").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).values
    val intervals = evs.flatMap { es =>
      val ts = es.map(_._2).sorted
      val out = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
      var st = ts.head; var prev = ts.head
      ts.tail.foreach { t =>
        if (t - prev > gapNs) { out += ((st, prev)); st = t }
        prev = t
      }
      out += ((st, prev))
      out
    }.filter(iv => iv._2 > iv._1).toSeq
    val busyByDay = intervals
      .flatMap { case (st, en) =>
        (st / dayNs to en / dayNs).map { d =>
          (d, (math.max(st, d * dayNs), math.min(en, (d + 1) * dayNs)))
        }
      }
      .filter { case (_, (s, e)) => e > s }
      .groupBy(_._1).view.mapValues { segs =>
        val sorted = segs.map(_._2).sortBy(_._1)
        var total = 0L; var curS = sorted.head._1; var curE = sorted.head._2
        sorted.tail.foreach { case (s, e) =>
          if (s > curE) { total += curE - curS; curS = s; curE = e }
          else if (e > curE) curE = e
        }
        total + (curE - curS)
      }.toMap
    rows.foreach { r =>
      val d = r.getAs[Long]("day")
      assert(busyByDay.contains(d), s"day $d missing in recompute")
      assert(r.getAs[Long]("busy_s") == busyByDay(d) / 1000000000L,
        s"day $d: ${r.getAs[Long]("busy_s")} vs ${busyByDay(d) / 1000000000L}")
    }
    assert(rows.length == busyByDay.size)
  }

  test("q289 matrix cells partition q27's pair list and ppm shares close") {
    val cells = graft.queries.TextQueries.queries(
      "q289_crosssource_dup_matrix")(spark, sf).collect()
    val nPairs = graft.queries.TextQueries.queries(
      "q27_minhash_lsh_dups")(spark, sf).count()
    assert(cells.map(_.getAs[Long]("n_pairs")).sum == nPairs)
    cells.foreach { r =>
      assert(r.getAs[String]("source_a") <= r.getAs[String]("source_b"))
      assert(r.getAs[Int]("within_source") ==
        (if (r.getAs[String]("source_a") == r.getAs[String]("source_b")) 1
         else 0))
    }
    // half-up ppm shares reconstruct from the counts exactly
    cells.foreach { r =>
      val c = r.getAs[Long]("n_pairs")
      val expect = (2 * c * 1000000L + nPairs) / (2 * nPairs)
      assert(r.getAs[Long]("share_ppm") == expect)
    }
  }
}
