package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the saturation-free quantizer (VERDICT r11 #3): qdecWide must be
  * bit-identical to the classic floor-long qdec everywhere the long path
  * is valid, and must keep producing the mathematically-right value in
  * the magnitude band where qround's floor(double)→LONG silently
  * saturates at Long.Max — the band where Spark and DuckDB used to
  * diverge (q336/q338 group terms near sf100). */
class QdecWideSpec extends AnyFunSuite {
  import graft.functions.GraftFunctions.{qdec, qdecWide, qroundWide}
  private lazy val spark = GraftSpark.spark

  private def one(c: org.apache.spark.sql.Column): java.math.BigDecimal =
    spark.range(1).select(c.as("v")).collect()(0)
      .getDecimal(0)

  test("matches classic qdec below the long ceiling") {
    for (x <- Seq(0.0, 0.004, 0.005, 1.0, 123.456, 98765.4321,
                  1.23e9, 8.8e15, 9.0e16 /* just under Long.Max/100 */ ))
      assert(one(qdecWide(lit(x), 38, 2)).compareTo(
             one(qdec(lit(x), 38, 2))) == 0, s"diverges at $x")
  }

  test("no saturation above Long.Max/100 — the old path's ceiling") {
    // classic qdec: floor(2e17·100) saturates the long at 9.223e18 →
    // records ~9.22e16, a silent 54% error; qdecWide stays exact.
    val big = 2.0e17
    assert(one(qdec(lit(big), 38, 2)).doubleValue() < 1.0e17,
      "precondition: classic path must actually saturate here")
    assert(one(qdecWide(lit(big), 38, 2)).doubleValue() === big)
  }

  test("identity above 2^53 (doubles carry no fractional bits)") {
    val x = 1.2345678e20
    assert(one(qdecWide(lit(x), 38, 2)).doubleValue() === x)
  }

  test("oracle twin computes the identical value in DuckDB semantics") {
    // The SQL twin uses y − fmod(y,1); Java's % on doubles IS fmod, so
    // evaluating the twin's algebra through Spark doubles must equal the
    // Column implementation — the same argument the qround/qroundSql
    // pair rests on.
    for (x <- Seq(0.004, 123.456, 9.0e16, 2.0e17)) {
      val viaTwinAlgebra = {
        val y = x * 100.0 + 0.5
        (y - (y % 1.0)) / 100.0
      }
      val viaColumn = spark.range(1)
        .select(qroundWide(lit(x), 2).as("v")).collect()(0).getDouble(0)
      assert(viaColumn === viaTwinAlgebra, s"twin mismatch at $x")
    }
  }
}
