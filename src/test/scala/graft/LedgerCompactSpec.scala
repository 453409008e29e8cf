package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins [[graft.text.Dedup.ledgerCompact]] (q376) on a planted
  * cross-snapshot fixture: canonical carry-over, first-seen provenance,
  * the cross-dup count, and the closure property that makes the output
  * a LEDGER — feeding today's union forward as tomorrow's `prev`
  * preserves every canonical and provenance already recorded. */
class LedgerCompactSpec extends AnyFunSuite {

  private lazy val spark = GraftSpark.spark
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toSeq.toDF("doc_id", "text")

  test("planted fixture: carried canonicals, provenance, cross-dups") {
    // Yesterday: A at ids 2 and 4 (within-snapshot dup), B at 6.
    val prev = docs(2L -> "A", 4L -> "A", 6L -> "B")
    // Today: A again at 7 (CROSS-snapshot dup), C new at 1 and 3.
    val batch = docs(7L -> "A", 1L -> "C", 3L -> "C")
    val out = graft.text.Dedup.ledgerCompact(prev, batch, "doc_id", "text")
      .collect().map(r => (r.getAs[Long]("canonical_id"),
        (r.getAs[String]("first_seen"), r.getAs[Long]("n_prev"),
          r.getAs[Long]("n_new"), r.getAs[Long]("n_cross_dups")))).toMap
    assert(out.size == 3, s"one ledger row per fingerprint: $out")
    // A canonicalizes to yesterday's min id 2 (NOT today's 7), counts
    // 2 prev + 1 new, and that 1 is the cross-snapshot dup.
    assert(out(2L) == (("prev", 2L, 1L, 1L)))
    // B carried untouched.
    assert(out(6L) == (("prev", 1L, 0L, 0L)))
    // C is new today: canonical = batch min id 1, no cross-dups.
    assert(out(1L) == (("curr", 0L, 2L, 0L)))
  }

  test("closure under iteration: compacting forward keeps canonicals " +
    "and provenance stable") {
    val day1 = docs(2L -> "A", 6L -> "B")
    val day2 = docs(7L -> "A", 3L -> "C")
    val day3 = docs(9L -> "C", 8L -> "D")
    // The ledger contract: tomorrow's prev is the union of everything
    // seen so far (append-only crawl), so canonicals must never move.
    val l2 = graft.text.Dedup.ledgerCompact(day1, day2, "doc_id", "text")
    val l3 = graft.text.Dedup.ledgerCompact(
      day1.union(day2), day3, "doc_id", "text")
    val c2 = l2.collect().map(r =>
      r.getAs[String]("fp") -> r.getAs[Long]("canonical_id")).toMap
    val c3 = l3.collect().map(r =>
      r.getAs[String]("fp") -> r.getAs[Long]("canonical_id")).toMap
    assert(c2.forall { case (fp, canon) => c3(fp) == canon },
      "a canonical recorded on day 2 moved on day 3")
    val seen3 = l3.collect().map(r =>
      r.getAs[Long]("canonical_id") -> r.getAs[String]("first_seen")).toMap
    assert(seen3(2L) == "prev" && seen3(3L) == "prev" &&
      seen3(8L) == "curr")
  }

  test("NULL payloads keep standard join semantics: one per-side ledger " +
    "row each, never merged") {
    val prev = docs(2L -> "A") .union(Seq((4L, null.asInstanceOf[String]))
      .toDF("doc_id", "text"))
    val batch = Seq((5L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val out = graft.text.Dedup.ledgerCompact(prev, batch, "doc_id", "text")
      .collect()
    val nullRows = out.filter(_.getAs[String]("fp") == null)
    assert(nullRows.length == 2, s"NULL fp must not self-join: ${out.toSeq}")
    assert(nullRows.map(_.getAs[String]("first_seen")).sorted.toSeq ==
      Seq("curr", "prev"))
  }
}
