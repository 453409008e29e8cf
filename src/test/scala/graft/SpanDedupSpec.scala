package graft

import graft.text.TextAnalysis

import org.scalatest.funsuite.AnyFunSuite

class SpanDedupSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._

  test("cross-doc and within-doc duplicated spans cover their positions") {
    val ten = (1 to 10).map(i => s"t$i").mkString(" ")
    val docs = Seq(
      (1L, s"$ten x y z"),                       // shared 10-gram at pos 0
      (2L, s"q r $ten"),                         // same 10-gram at pos 2
      (3L, (21 to 32).map(i => s"u$i").mkString(" ")), // all unique
      (4L, "a b c d e"),                         // below n: no shingles
      (5L, s"$ten $ten")                         // within-doc repeat
    ).toDF("doc_id", "text")
    val out = TextAnalysis.duplicateSpanCoverage(docs, "doc_id", "text",
      n = 10)
      .as[(Long, Int, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(out(1L) == ((1L, 13, 10L, 0.230769))) // pos 0–9 masked
    assert(out(2L) == ((2L, 12, 10L, 0.166667))) // pos 2–11 masked
    assert(out(3L) == ((3L, 12, 0L, 1.0)))
    assert(out(4L) == ((4L, 5, 0L, 1.0)))
    assert(out(5L) == ((5L, 20, 20L, 0.0)))      // self-repeat fully masked
  }

  test("overlapping duplicated spans union, not double-count") {
    // two overlapping duplicated 10-grams: positions 0..10 (11), not 20
    val eleven = (1 to 11).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, eleven),          // shingles at pos 0 and 1
      (2L, s"$eleven zz")    // same two shingles
    ).toDF("doc_id", "text")
    val out = TextAnalysis.duplicateSpanCoverage(docs, "doc_id", "text",
      n = 10)
      .as[(Long, Int, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(out(1L)._3 == 11L) // union of [0,9] and [1,10]
    assert(out(2L)._3 == 11L)
  }
}
