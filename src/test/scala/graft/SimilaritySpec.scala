package graft

import graft.queries.SimilarityQueries
import graft.sim.VectorOps._

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SimilaritySpec extends AnyFunSuite {

  test("q232 truncation recall is a valid fraction and a full-width twin is perfect") {
    val spark = GraftSpark.spark
    val rows = graft.queries.Registry.all("q232_truncation_recall")(
      spark, GraftSpark.sf).collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_overlap")
      assert(n >= 0 && n <= 10)
      assert(r.getAs[Double]("recall_at_10") == n / 10.0)
    }
    // the 32-dim prefix of a 64-dim synthetic embedding should keep a
    // nontrivial share of true neighbors somewhere in the probe set
    assert(rows.map(_.getAs[Long]("n_overlap")).sum > 0)
  }
  lazy val spark = GraftSpark.spark
  import spark.implicits._
  val sf = GraftSpark.sf

  test("q201 triplet mining: label constraints hold and negatives are the hardest") {
    val e = graft.io.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("label"))
    val out = graft.queries.SimilarityQueries
      .queries("q201_triplet_mining")(spark, sf)
    // Positive shares the anchor's label; negative never does.
    val labeled = out
      .join(e.withColumnRenamed("vec_id", "pos_id")
        .withColumnRenamed("label", "pos_label"), "pos_id")
      .join(e.withColumnRenamed("vec_id", "neg_id")
        .withColumnRenamed("label", "neg_label"), "neg_id")
    assert(labeled.filter(col("pos_label") =!= col("a_label")).count() == 0)
    assert(labeled.filter(col("neg_label") === col("a_label")).count() == 0)
    // Margin is exactly the quantized difference, and no anchor mines
    // itself as either example.
    val rows = out.select("a_id", "pos_id", "neg_id", "pos_cos",
        "neg_cos", "margin")
      .as[(Long, Long, Long, Double, Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (a, p, n, pc, nc, m) =>
      assert(p != a && n != a)
      assert(m == math.floor((pc - nc) * 1e6 + 0.5) / 1e6)
    }
    // Spot-verify one anchor's hardest negative by brute force.
    val emb = graft.io.Tables.embeddings(spark, sf)
      .select("vec_id", "label", "embedding")
      .as[(Long, Int, Array[Float])].collect()
    val (aId, _, aNeg, _, aNegCos, _) = rows.minBy(_._1)
    val (_, aLabel, aEmb) = emb.find(_._1 == aId).get
    def cos(x: Array[Float], y: Array[Float]): Double = {
      def d(u: Array[Float], v: Array[Float]) =
        u.zip(v).map { case (p, q) => p.toDouble * q.toDouble }
          .foldLeft(0.0)(_ + _)
      d(x, y) / (math.sqrt(d(x, x)) * math.sqrt(d(y, y)))
    }
    val best = emb.filter(v => v._2 != aLabel && v._1 != aId)
      .map(v => (math.floor(cos(aEmb, v._3) * 1e6 + 0.5) / 1e6, v._1))
      .sortBy { case (c, id) => (-c, id) }.head
    assert((best._2, best._1) == ((aNeg, aNegCos)))
  }

  test("q216 semantic dedup: labeling consistent with the q36 pair graph") {
    val out = graft.queries.SimilarityQueries
      .queries("q216_semantic_dedup")(spark, sf)
      .as[(Long, Long, Long, Int)].collect()
    val total = graft.io.Tables.embeddings(spark, sf).count()
    assert(out.length == total)
    val canonOf = out.map(r => r._1 -> r._2).toMap
    // Every near-dup pair lands in one cluster.
    val pairs = graft.queries.SimilarityQueries
      .queries("q36_embedding_neardup")(spark, sf)
      .select("id_a", "id_b").as[(Long, Long)].collect()
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b) => assert(canonOf(a) == canonOf(b)) }
    // Canonical = the cluster's smallest member; survivor flag matches;
    // sizes are consistent.
    val clusters = out.groupBy(_._2)
    clusters.foreach { case (canon, members) =>
      assert(members.map(_._1).min == canon)
      assert(members.forall(_._3 == members.length.toLong))
      assert(members.count(_._4 == 1) == 1)
    }
  }

  test("q209 centroid monitor: counts partition the corpus, dispersion ordered") {
    val out = graft.queries.SimilarityQueries
      .queries("q209_centroid_monitor")(spark, sf)
      .as[(Int, Long, Double, Double)].collect()
    val total = graft.io.Tables.embeddings(spark, sf).count()
    assert(out.map(_._2).sum == total)
    out.foreach { case (_, n, avg, mx) =>
      // avg is 6dp-quantized, max 12dp — avg can round up past max by
      // at most half a 6dp step.
      assert(n > 0 && avg >= 0.0 && avg <= mx + 5e-7)
    }
    // Exact recomputation for one label with the same quantization.
    val one = out.minBy(_._1)
    val vecs = graft.io.Tables.embeddings(spark, sf)
      .filter(col("label") === one._1)
      .select("embedding").as[Array[Float]].collect()
      .map(_.map(_.toDouble))
    def q(x: Double, s: Double): Double = math.floor(x * s + 0.5) / s
    val dims = vecs.head.length
    val mu = (0 until dims).map { d =>
      val s = vecs.map(v => BigDecimal(q(v(d), 1e10))).sum
      // decimal→double cast THEN one double divide — the engine's
      // expression order, not an exact-decimal division.
      q(s.toDouble / vecs.length, 1e6)
    }
    val d2s = vecs.map { v =>
      (0 until dims).map(d => BigDecimal(q((v(d) - mu(d)) * (v(d) - mu(d)), 1e12))).sum
    }
    val avgExpect = q(d2s.sum.toDouble / d2s.length, 1e6)
    assert(one._3 == avgExpect)
  }

  test("dot/l2norm: hand-computed values") {
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)))
      .toDF("a", "b")
    val r = df.select(
      dot(col("a"), col("b")).as("d"),
      l2norm(col("a")).as("n")).head()
    assert(r.getDouble(0) == 32.0)
    assert(math.abs(r.getDouble(1) - math.sqrt(14.0)) < 1e-12)
  }

  test("cosine of identical vectors is 1") {
    val df = Seq((Array(0.5f, -0.25f, 2.0f))).toDF("a")
      .withColumn("n", l2norm(col("a")))
    val c = df.select(cosine6(col("a"), col("a"), col("n"), col("n"))).head.getDouble(0)
    assert(c == 1.0)
  }

  test("hyperplane weights are deterministic and in [-1, 1]") {
    val w1 = hyperplane(3, 64)
    val w2 = hyperplane(3, 64)
    assert(w1 == w2)
    assert(w1.forall(v => v >= -1.0 && v <= 1.0))
    assert(hyperplane(4, 64) != w1)
  }

  test("q30 brute-force KNN: ranks are 1..5 per query, cos within [-1,1]") {
    val r = SimilarityQueries.q30(spark, sf)
    val byQ = r.groupBy("q_id").agg(count(lit(1)).as("n"), max("rank").as("mr"))
      .collect()
    assert(byQ.nonEmpty)
    byQ.foreach { row =>
      assert(row.getAs[Long]("n") == 5L)
      assert(row.getAs[Int]("mr") == 5)
    }
    assert(r.filter(col("cos") > 1.0 || col("cos") < -1.0).count() == 0)
  }

  test("q32 ANN results are a subset of brute-force candidates by cosine") {
    // Every ANN neighbor must score <= the brute-force best for its query.
    val ann = SimilarityQueries.q32(spark, sf)
      .groupBy("q_id").agg(max("cos").as("ann_best"))
    val bf = SimilarityQueries.q30(spark, sf)
      .filter(col("rank") === 1)
      .select(col("q_id"), col("cos").as("bf_best"))
    val joined = ann.join(bf, "q_id")
    assert(joined.filter(col("ann_best") > col("bf_best")).count() == 0)
  }

  test("q33 KMeans is seeded-deterministic across runs") {
    val a = SimilarityQueries.q33(spark, sf).collect().toSeq
    val b = SimilarityQueries.q33(spark, sf).collect().toSeq
    assert(a == b)
    assert(a.map(_.getAs[Long]("n")).sum == 500L)
  }

  test("q35 KMeans segments: deterministic, sizes partition the customers") {
    val a = SimilarityQueries.q35(spark, sf).collect().toSeq
    assert(a == SimilarityQueries.q35(spark, sf).collect().toSeq)
    val nCust = SimilarityQueries.q34(spark, sf).count()
    assert(a.map(_.getAs[Long]("n_customers")).sum == nCust)
  }

  test("q34 RFM: frequency sums to order count") {
    val freq = SimilarityQueries.q34(spark, sf)
      .agg(sum("frequency")).as[Long].head()
    val orders = graft.io.Tables.orders(spark, sf).count()
    assert(freq == orders)
  }

  test("q37 IVF ANN: well-formed, deterministic, never beats brute force, real recall") {
    val ivf = SimilarityQueries.q37(spark, sf)
    val rows = ivf.collect()
    assert(rows.nonEmpty)
    // per query: ranks 1..n contiguous, <= 5
    val byQ = rows.groupBy(_.getAs[Long]("q_id"))
    byQ.values.foreach { rs =>
      val ranks = rs.map(_.getAs[Int]("rank")).sorted.toSeq
      assert(ranks == (1 to ranks.size), s"ranks not contiguous: $ranks")
      assert(ranks.size <= 5)
    }
    // seeded-deterministic
    assert(rows.toSeq == SimilarityQueries.q37(spark, sf).collect().toSeq)
    // an IVF neighbor can never out-score the brute-force best
    val bfTop = SimilarityQueries.q30(spark, sf)
      .filter(col("rank") === 1)
      .select(col("q_id"), col("cos").as("bf_best"))
    val beat = ivf.groupBy("q_id").agg(max("cos").as("ivf_best"))
      .join(bfTop, "q_id")
      .filter(col("ivf_best") > col("bf_best")).count()
    assert(beat == 0)
    // recall@5 vs brute force must clearly beat the random-scan floor
    // (nprobe/k = 2/16 = 12.5% of the corpus scanned → ~0.125 expected
    // by chance). Isotropic-random corpus keeps absolute recall modest;
    // the quantizer must still concentrate true neighbors into probed
    // cells.
    val bf5 = SimilarityQueries.q30(spark, sf)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val ivf5 = rows.map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("n_id"))).toSet
    val recall = (bf5 & ivf5).size.toDouble / bf5.size
    assert(recall >= 0.25, f"IVF recall@5 $recall%.3f below 0.25 floor")
  }

  test("q39 int8 quantization: codes bounded, reconstruction within half-step") {
    val q = SimilarityQueries.q39(spark, sf)
    val joined = q.join(
      graft.io.Tables.embeddings(spark, sf)
        .select(col("vec_id"), posexplode(col("embedding")).as(Seq("d", "x"))),
      Seq("vec_id", "d"))
    assert(joined.filter(abs(col("q")) > 127).count() == 0)
    // every code row round-trips: |x - q·scale| ≤ scale/2 (+ the 6-decimal
    // rounding slack on the published scale)
    val bad = joined.filter(
      abs(col("x").cast("double") - col("q") * col("scale_r")) >
        col("scale_r") / 2 + lit(1e-4)).count()
    assert(bad == 0)
    // the max-|x| component always quantizes to ±127 exactly
    val extremes = joined.groupBy("vec_id")
      .agg(max(abs(col("q"))).as("mq"))
      .filter(col("mq") =!= 127).count()
    assert(extremes == 0)
  }

  test("random projection: one-hot vectors read the weight matrix back") {
    import graft.functions.HashUtil
    // Projecting e_d yields exactly w(p, d) -- the md5-derived entry.
    def w(p: Int, d: Int): Double =
      math.rint(((HashUtil.md5Lower63(s"rp:$p:$d") % 2001L) - 1000L)
        .toDouble / 1000.0 * 1e6) / 1e6
    val vecs = Seq((0L, Array(1f, 0f, 0f, 0f)), (1L, Array(0f, 0f, 1f, 0f)))
      .toDF("vec_id", "embedding")
    val got = graft.sim.VectorOps
      .randomProject(vecs, "vec_id", "embedding", outDim = 3, dim = 4)
      .as[(Long, Int, Double)].collect()
      .map { case (id, p, y) => (id, p) -> y }.toMap
    assert(got.size == 6)
    (0 until 3).foreach { p =>
      assert(got((0L, p)) == w(p, 0))
      assert(got((1L, p)) == w(p, 2))
    }
  }
}
