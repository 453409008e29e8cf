package graft

import graft.ops.Features

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TargetEncodeSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._

  private def base = (1 to 200).map { i =>
    (i.toLong, if (i <= 100) "A" else "B", (i % 7).toDouble + 1.0)
  }.toDF("id", "cat", "v")

  private def encode(df: org.apache.spark.sql.DataFrame) =
    Features.targetEncodeOof(df, col("cat"), col("id"), col("v"),
      folds = 5, smoothing = 20, seed = 42L)
      .select("cat", "fold", "n_fold", "n_oof", "enc_raw", "enc_smooth")
      .as[(String, Int, Long, Long, Option[Double], Double)]
      .collect().map(r => (r._1, r._2) -> r).toMap

  test("fold-f encodings are untouched by fold-f targets (no leakage)") {
    val before = encode(base)
    // poison every fold-0 target (same PRNG the encoder uses)
    val fold = pmod(graft.functions.GraftFunctions.md5_63(
      concat(lit("42:"), col("id").cast("string"))), lit(5))
    val poisoned = base.withColumn("v",
      when(fold === 0, col("v") * 1000.0).otherwise(col("v")))
    val after = encode(poisoned)
    for (cat <- Seq("A", "B")) {
      assert(after((cat, 0)) == before((cat, 0))) // own fold: unchanged
      assert(after((cat, 1)) != before((cat, 1))) // other folds see it
    }
  }

  test("single-appearance category: raw null, smooth collapses to global") {
    val df = base.unionByName(Seq((999L, "C", 50.0)).toDF("id", "cat", "v"))
    val enc = encode(df)
    val cRow = enc.collect { case ((c, _), r) if c == "C" => r }.toSeq
    assert(cRow.size == 1)
    assert(cRow.head._4 == 0L && cRow.head._5.isEmpty) // n_oof 0, raw null
    // smoothing with zero evidence = the out-of-fold global mean
    val f = cRow.head._2
    val gOof = {
      val rows = (1 to 200).map { i =>
        (i.toLong, (i % 7).toDouble + 1.0)
      } :+ ((999L, 50.0))
      val fold = rows.map { case (id, _) =>
        id -> graft.functions.HashUtil.md5Lower63(s"42:$id") % 5
      }.toMap
      val keep = rows.filter { case (id, _) => fold(id) != f }
      BigDecimal(keep.map(_._2).sum / keep.size)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(cRow.head._6 == gOof)
  }
}
