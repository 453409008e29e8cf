package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins [[graft.sim.IvfAnn.incrementalUpdate]] (q375): the append path
  * must use the BASE corpus's quantizer unchanged — that is the entire
  * point of an incremental update — and the occupancy audit must
  * partition both sides exactly. */
class IvfIncrementalSpec extends AnyFunSuite {

  private lazy val spark = GraftSpark.spark
  import spark.implicits._

  private def frame(rows: Seq[(Long, Seq[Float])]) =
    rows.toDF("vec_id", "embedding")

  private def vecs(seed: Int, n: Int): Seq[(Long, Seq[Float])] = {
    val r = new java.util.Random(seed)
    (0 until n).map(i =>
      (i.toLong + seed * 1000L,
        Seq.fill(8)((r.nextInt(2049) - 1024).toFloat / 1024.0f)))
  }

  test("counts partition both sides; empty cells ship as zero rows") {
    val base = frame(vecs(1, 20))
    val delta = frame(vecs(2, 7))
    val out = graft.sim.IvfAnn.incrementalUpdate(base, delta,
      "vec_id", "embedding", cells = 16).collect()
    assert(out.length == 16, "one audit row per seeded cell")
    assert(out.map(_.getAs[Long]("n_base")).sum == 20)
    assert(out.map(_.getAs[Long]("n_delta")).sum == 7)
    out.foreach { r =>
      assert(r.getAs[Long]("n_total") ==
        r.getAs[Long]("n_base") + r.getAs[Long]("n_delta"))
    }
    val shares = out.map(r => Option(r.getAs[java.lang.Double]("load_share"))
      .map(_.doubleValue()).getOrElse(0.0))
    assert(math.abs(shares.sum - 1.0) < 1e-4, s"shares sum ${shares.sum}")
  }

  test("the quantizer comes from the base only: adding a delta never " +
    "changes the cell set or the base assignment") {
    val base = frame(vecs(3, 25))
    val deltaA = frame(vecs(4, 5))
    val deltaB = frame(vecs(5, 11))
    def baseCounts(delta: org.apache.spark.sql.DataFrame) =
      graft.sim.IvfAnn.incrementalUpdate(base, delta,
        "vec_id", "embedding", cells = 8)
        .select("cell", "n_base").as[(Int, Long)].collect().toMap
    assert(baseCounts(deltaA) == baseCounts(deltaB),
      "base occupancy must be invariant to the append batch")
  }

  test("degenerate snapshots: empty base indexes nothing; empty delta " +
    "audits zero growth; growth is NULL on an empty base cell") {
    val base = frame(vecs(6, 12))
    val none = frame(Seq.empty)
    assert(graft.sim.IvfAnn.incrementalUpdate(none, base,
      "vec_id", "embedding", cells = 16).count() == 0,
      "no base corpus -> no quantizer -> no cells")
    val out = graft.sim.IvfAnn.incrementalUpdate(base, none,
      "vec_id", "embedding", cells = 16).collect()
    assert(out.forall(_.getAs[Long]("n_delta") == 0L))
    // 12 base vectors under 16 requested cells: every cell is seeded by
    // a distinct vector and self-assigns, so n_base >= 1 everywhere and
    // 12 cells exist (seed pick is capped by the corpus).
    assert(out.length == 12)
    assert(out.forall(r =>
      r.getAs[java.lang.Double]("growth_pct") != null ||
        r.getAs[Long]("n_base") == 0L))
  }
}
