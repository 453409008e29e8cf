package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants of the two scale-prep diagnostics added in round 7:
  * q184 temperature-balanced mixture resampling and q185 shuffle-key
  * skew profiling. Exact values are oracle-gated by the driver; these
  * pin the semantic properties the oracles can't express.
  */
class MixtureSkewSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  val sf = GraftSpark.sf

  test("q184: quotas respect the budget and temper toward the tail") {
    val kept = graft.queries.TextQueries.q184(spark, sf)
    val perSource = kept.groupBy("source")
      .agg(count(lit(1)).as("n_kept"),
        max(col("quota")).as("quota"), max(col("n_docs")).as("n_docs"))
      .collect()
    // Every source keeps exactly min(quota, n_docs) docs, never more.
    perSource.foreach { r =>
      val (nKept, quota, nDocs) =
        (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(nKept == math.min(quota, nDocs),
        s"${r.getString(0)}: kept $nKept of quota $quota (n=$nDocs)")
    }
    // Integer-floor quotas sum to ≤ the 50% budget (floor loses < 1 doc
    // per source).
    val total = perSource.map(_.getLong(3)).sum
    val quotaSum = perSource.map(_.getLong(2)).sum
    assert(quotaSum <= total / 2,
      s"quota sum $quotaSum exceeds budget ${total / 2}")
    assert(quotaSum >= total / 2 - perSource.length,
      "floor rounding lost more than one doc per source")
    // τ=2 tempering: the kept FRACTION of the smallest source is ≥ that
    // of the largest source (√n shares upsample the tail).
    val bySize = perSource.sortBy(_.getLong(3))
    val (small, large) = (bySize.head, bySize.last)
    assert(small.getLong(2).toDouble / small.getLong(3) >=
      large.getLong(2).toDouble / large.getLong(3) - 1e-9,
      "tail source not upsampled relative to head source")
  }

  test("q184 quota arithmetic survives the ~7M-doc BIGINT overflow " +
    "boundary (decimal-widened product == exact BigInt)") {
    // budget·w ≈ (n/2)·√n·1e9 outgrows BIGINT once n^1.5 ≳ 1.8e19/1e9·2
    // (≈7M docs): Spark's non-ANSI BIGINT multiply would silently wrap
    // (zero/garbage quotas) while DuckDB raised. q184 widens the
    // product to DECIMAL(38,0); this pins the widened quota to the
    // exact BigInt value on both sides of the boundary.
    import spark.implicits._
    Seq(6000000L, 7100000L, 50000000L, 2000000000L).foreach { nTotal =>
      val head = nTotal * 9 / 10
      val rows = Seq(("head", head), ("tail", nTotal - head))
      val weights = rows.toDF("source", "n_docs")
        .withColumn("w", expr(
          "cast(floor((sqrt(cast(n_docs as double)) * 1e9) + 0.5) as bigint)"))
      val tot = weights.agg(sum(col("w")).as("w_sum"),
        sum(col("n_docs")).as("n_total"))
      val got = weights.crossJoin(tot)
        .select(col("source"),
          expr("(cast(n_total div 2 as decimal(38,0)) * w) div w_sum")
            .as("quota"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val ws = weights.collect()
        .map(r => r.getString(0) -> BigInt(r.getLong(2))).toMap
      val wSum = ws.values.sum
      rows.foreach { case (src, _) =>
        val expect = (BigInt(nTotal / 2) * ws(src)) / wSum
        assert(BigInt(got(src)) == expect,
          s"n_total=$nTotal $src: got ${got(src)}, want $expect")
      }
    }
  }

  test("q185: profile is internally consistent with the raw counts") {
    val r = graft.queries.OlapQueries.q185(spark, sf).collect().head
    val nKeys = r.getLong(0); val totalRows = r.getLong(1)
    val maxN = r.getLong(2)
    val (p50, p90, p99) = (r.getLong(3), r.getLong(4), r.getLong(5))
    assert(p50 <= p90 && p90 <= p99 && p99 <= maxN)
    val ev = graft.io.Tables.events(spark, sf)
    assert(totalRows == ev.count())
    assert(nKeys == ev.select("user_id").distinct().count())
    val top1 = ev.groupBy("user_id").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("user_id")).limit(1).collect().head
    assert(r.getLong(7) == top1.getLong(1) && maxN == top1.getLong(1))
  }
}
