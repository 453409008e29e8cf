package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants of the r10 graph/stream wave: q340 streaming
  * OHLC, q341 local clustering coefficient, q342 Markov path entropy.
  */
class GraphStreamWaveSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  val sf = GraftSpark.sf

  test("q340 stream OHLC equals its batch twin exactly") {
    val stream = graft.queries.StreamingQueries.queries(
      "q340_stream_ohlc")(spark, sf).collect()
    assert(stream.nonEmpty)
    val batch = graft.io.Tables.events(spark, sf)
      .withColumn("cents", floor(col("value") * 100.0 + lit(0.5)))
      .withColumn("bucket_s", expr("(ts div 1000000000) div 3600 * 3600"))
      .groupBy("event_type", "bucket_s")
      .agg(count(lit(1)).as("n"),
        min_by(col("cents"), struct(col("ts"), col("event_id")))
          .as("open_cents"),
        max_by(col("cents"), struct(col("ts"), col("event_id")))
          .as("close_cents"),
        max(col("cents")).as("high_cents"),
        min(col("cents")).as("low_cents"))
      .orderBy("event_type", "bucket_s")
      .collect()
    assert(stream.length == batch.length)
    stream.zip(batch).foreach { case (s, b) =>
      assert(s.toSeq == b.toSeq, s"stream $s != batch $b")
      val (o, c, h, l) = (s.getAs[Long]("open_cents"),
        s.getAs[Long]("close_cents"), s.getAs[Long]("high_cents"),
        s.getAs[Long]("low_cents"))
      assert(l <= o && o <= h && l <= c && c <= h)
    }
  }

  test("q341 clustering coefficients reproduce a brute-force recompute") {
    val rows = graft.queries.AnalyticsQueries.queries(
      "q341_local_clustering")(spark, sf).collect()
    assert(rows.nonEmpty)
    // brute-force ground truth from the same support-2 edge definition
    val li = graft.io.Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_partkey").distinct()
      .collect().map(r => (r.getAs[Number](0).longValue(),
        r.getAs[Number](1).longValue()))
    val byOrder = li.groupBy(_._1).values.map(_.map(_._2).distinct.sorted)
    val pairCount = scala.collection.mutable.Map.empty[(Long, Long), Int]
    byOrder.foreach { ps =>
      for (i <- ps.indices; j <- i + 1 until ps.length)
        pairCount((ps(i), ps(j))) = pairCount.getOrElse((ps(i), ps(j)), 0) + 1
    }
    val edges = pairCount.filter(_._2 >= 2).keys.toSeq
    val adj = scala.collection.mutable.Map.empty[Long, Set[Long]]
      .withDefaultValue(Set.empty)
    edges.foreach { case (u, v) =>
      adj(u) = adj(u) + v; adj(v) = adj(v) + u
    }
    def q6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    rows.foreach { r =>
      val k = r.getAs[Long]("part_key")
      val nbrs = adj(k)
      assert(r.getAs[Long]("degree") == nbrs.size.toLong)
      val tri = nbrs.toSeq.combinations(2)
        .count { case Seq(a, b) => adj(a).contains(b) }
      assert(r.getAs[Long]("n_triangles") == tri.toLong,
        s"part $k: engine ${r.getAs[Long]("n_triangles")} vs brute $tri")
      val d = nbrs.size
      val expect = if (d >= 2) q6(2.0 * tri / (d.toLong * (d - 1))) else 0.0
      assert(r.getAs[Double]("clustering") == expect)
      assert(r.getAs[Double]("clustering") >= 0 &&
        r.getAs[Double]("clustering") <= 1)
    }
  }

  test("q342 entropies are bounded and the conditional entropy mixes rows") {
    val rows = graft.queries.OlapQueries.queries(
      "q342_path_entropy")(spark, sf).collect()
    assert(rows.nonEmpty)
    val nn = rows.map(_.getAs[Long]("n_transitions")).sum
    val mix = rows.map(r => r.getAs[Long]("n_transitions").toDouble / nn *
      r.getAs[Double]("entropy_nats")).sum
    rows.foreach { r =>
      val h = r.getAs[Double]("entropy_nats")
      val k = r.getAs[Long]("n_next_types")
      assert(h >= 0 && h <= math.log(k.toDouble) + 1e-6,
        s"${r.getAs[String]("prev_type")}: H=$h outside [0, ln($k)]")
      assert(math.abs(r.getAs[Double]("perplexity") - math.exp(h)) < 1e-4)
      assert(math.abs(r.getAs[Double]("cond_entropy_nats") - mix) < 1e-4)
    }
  }
}
