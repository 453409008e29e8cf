package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants of q374 — the MinHash estimation-error audit. */
class MinhashErrorSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  val sf = GraftSpark.sf

  private def q(x: Double, s: Int): Double = {
    val f = math.pow(10, s); math.floor(x * f + 0.5) / f
  }

  test("q374 bucket stats reproduce a driver recompute over candidates") {
    val rows = graft.queries.TextQueries.queries(
      "q374_minhash_error_audit")(spark, sf).collect()
    assert(rows.nonEmpty)
    // ground truth: per-doc hashed 3-gram sets and 16-perm signatures,
    // collected once (the hash itself is the engine's — the spec
    // independently recomputes the pairing, estimate, exact Jaccard,
    // bucketing and statistics)
    val docs = graft.io.Tables.documents(spark, sf)
      .withColumn("toks", split(col("text"), " "))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(toks) - 2), i -> concat_ws(' ', slice(toks, i, 3)))"))
        .as("shingle")).distinct()
      .select(col("doc_id"),
        graft.functions.GraftFunctions.md5_63(col("shingle")).as("h"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val sets = docs.groupBy(_._1).map { case (k, v) =>
      k -> v.map(_._2).toSet }
    val sigs = graft.queries.TextQueries.queries(
      "q25_minhash_sigs")(spark, sf).collect()
      .map(r => ((r.getLong(0), r.getAs[Number](1).intValue()),
        r.getAs[Long](2)))
    val sigByDoc = sigs.groupBy(_._1._1).map { case (d, xs) =>
      d -> xs.sortBy(_._1._2).map(_._2) }
    // candidate pairs: 4-row bands over the 16-perm signatures
    val bands = sigByDoc.toSeq.flatMap { case (d, sig) =>
      sig.grouped(4).zipWithIndex.map { case (g, b) =>
        ((b, g.toSeq), d) }
    }
    val cands = bands.groupBy(_._1).values.flatMap { ds =>
      val ids = ds.map(_._2).distinct.sorted
      for (i <- ids.indices; j <- i + 1 until ids.length)
        yield (ids(i), ids(j))
    }.toSet
    val perBucket = cands.toSeq.map { case (a, b) =>
      val est = sigByDoc(a).zip(sigByDoc(b)).count(x => x._1 == x._2) / 16.0
      val sh = (sets(a) intersect sets(b)).size
      val exact =
        if (sets(a).size + sets(b).size - sh > 0)
          sh.toDouble / (sets(a).size + sets(b).size - sh)
        else 0.0
      val bucket = math.min(9L, math.floor(est * 10.0).toLong)
      (bucket, q(math.abs(est - exact), 9))
    }.groupBy(_._1)
    assert(rows.length == perBucket.size)
    rows.foreach { r =>
      val b = r.getAs[Long]("bucket")
      val errs = perBucket(b).map(_._2)
      assert(r.getAs[Long]("n_pairs") == errs.length.toLong)
      assert(math.abs(r.getAs[Double]("mean_abs_err") -
        q(errs.sum / errs.length, 6)) < 1e-5)
      assert(r.getAs[Double]("max_abs_err") == errs.max)
      val mid = b / 10.0 + 0.05
      assert(r.getAs[Double]("analytic_se") ==
        q(math.sqrt(mid * (1 - mid) / 16.0), 6))
    }
  }
}
