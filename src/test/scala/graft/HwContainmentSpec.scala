package graft

import graft.ops.TimeSeries
import graft.queries.Registry

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-8 wave 2 (q242 containment dedup, q243 Holt–Winters):
  * the asymmetric-similarity laws and the smoothing-family degeneration
  * the hash gate can't express.
  */
class HwContainmentSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  val sf = GraftSpark.sf

  test("q242 containment dominates Jaccard and matches a driver recompute") {
    val rows = Registry.all("q242_containment_dups")(spark, sf).collect()
    assert(rows.nonEmpty, "sf0.001 corpus should contain subset dups")
    rows.foreach { r =>
      val cont = r.getAs[Long]("containment_ppm")
      val jacc = r.getAs[Long]("jaccard_ppm")
      val na = r.getAs[Long]("na")
      val nb = r.getAs[Long]("nb")
      val inter = r.getAs[Long]("inter")
      // J = |A∩B|/|A∪B| ≤ |A∩B|/|A| = containment (±1 half-up noise)
      assert(jacc <= cont + 1, r.toString)
      assert(inter <= math.min(na, nb), r.toString)
      assert(r.getAs[Boolean]("jaccard_blind") == (jacc < 500000L))
    }
    // exact recompute of one pair's shingle sets on the driver
    val r0 = rows.head
    val (ida, idb) = (r0.getAs[Long]("id_a"), r0.getAs[Long]("id_b"))
    val docs = graft.io.Tables.documents(spark, sf)
      .filter(col("doc_id").isin(ida, idb))
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def shingleSet(t: String): Set[String] =
      t.split(" ").sliding(3).filter(_.length == 3)
        .map(_.mkString(" ")).toSet
    val (sa, sb) = (shingleSet(docs(ida)), shingleSet(docs(idb)))
    // df-cap can only REMOVE shingles; at sf0.001 no shingle tops the
    // cap, so the raw sets are the capped sets
    assert(r0.getAs[Long]("na") == sa.size && r0.getAs[Long]("nb") == sb.size)
    assert(r0.getAs[Long]("inter") == (sa & sb).size)
  }

  test("q243 Holt-Winters with gamma=0 degenerates to Holt linear " +
      "bit-for-bit on level and trend") {
    val daily = graft.queries.SharedFrames
      .dailyNationRevenue(spark, sf)
      .select(col("nation"), col("day"),
        col("rev").cast("double").as("revenue"))
    val hw = TimeSeries.holtWintersAdditive(daily, "nation", "day",
        "revenue", alpha = 0.3, beta = 0.1, gamma = 0.0, period = 7)
      .select(col("nation"), col("day"), col("level").as("hw_l"),
        col("trend").as("hw_b"))
    val holt = TimeSeries.holtLinear(daily, "nation", "day", "revenue",
        alpha = 0.3, beta = 0.1)
      .select(col("nation"), col("day"), col("level").as("h_l"),
        col("trend").as("h_b"))
    val diff = hw.join(holt, Seq("nation", "day"))
      .filter(col("hw_l") =!= col("h_l") || col("hw_b") =!= col("h_b"))
      .count()
    assert(diff == 0L, s"$diff rows diverge from Holt under gamma=0")
  }

  test("q243 anchor rows carry zero seasonal state and forecast = x") {
    val rows = Registry.all("q243_holt_winters")(spark, sf).collect()
    assert(rows.nonEmpty)
    val firstByNation = rows.groupBy(_.getString(0))
      .map { case (_, rs) => rs.minBy(_.getAs[Long]("day")) }
    firstByNation.foreach { r =>
      assert(r.getAs[Double]("seasonal") == 0.0, r.toString)
      assert(r.getAs[Double]("forecast") == r.getAs[Double]("level"),
        r.toString)
      assert(r.getAs[Double]("trend") == 0.0, r.toString)
    }
    // seasonal adds information: with a weekly signal present (q156),
    // at least one post-warmup seasonal slot moves away from zero
    assert(rows.exists(r => math.abs(r.getAs[Double]("seasonal")) > 1e-6))
  }

  test("holtWintersAdditive survives pre-epoch (negative) day indices") {
    // Scala % preserves sign, so (d % period) on a negative day used to
    // index the seasonal array at -1; floorMod keeps the weekday cycle
    // continuous across the epoch.
    import spark.implicits._
    val pts = Seq(("k", -10L, 5.0), ("k", -3L, 6.0), ("k", -2L, 7.0),
      ("k", 1L, 8.0), ("k", 5L, 9.0))
      .toDF("key", "day", "revenue")
    val out = graft.ops.TimeSeries.holtWintersAdditive(
      pts, "key", "day", "revenue",
      alpha = 0.3, beta = 0.1, gamma = 0.2).collect()
    assert(out.length == 5 && out.forall(r =>
      !r.getAs[Double]("forecast").isNaN))
    // -10 and 4 share floorMod(d,7)=4: the -10 seasonal update must land
    // in the same slot a day-4 row would read (no -1 indexing, no skew)
    assert(java.lang.Math.floorMod(-10L, 7L) == 4L)
  }
}
