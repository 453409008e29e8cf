package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the cross-round drift taint's prior loader (r11's headline
  * bench mechanism): it must parse the COMMITTED bench_full.json (the
  * exact artifact the driver-run Bench reads at round start), degrade to
  * empty on damage (drift inactive — never a crashed bench), and carry
  * per-query values usable for the max(3×prior, 2 s) threshold. A
  * silent parse break here would disarm the taint while the bench keeps
  * printing — exactly the invisible failure this spec exists to catch.
  */
class BenchPriorSpec extends AnyFunSuite {

  test("loadPrior parses the committed bench_full.json artifact") {
    val p = java.nio.file.Paths.get("bench_full.json")
    assume(java.nio.file.Files.exists(p), "artifact not in working dir")
    val prior = Bench.loadPrior(p)
    assert(prior.size > 300, s"only ${prior.size} priors parsed")
    assert(prior.keys.forall(_.matches("q\\d+.*")), "non-query key parsed")
    assert(prior.values.forall(v => v > 0.0 && v < 600.0),
      "prior outside plausible per-query seconds")
  }

  test("loadPrior parses all three numeric JSON shapes") {
    val f = java.nio.file.Files.createTempFile("prior", ".json")
    java.nio.file.Files.writeString(f,
      """{"value":1.0,"queries":{"q01_a":0.123,"q02_b":4,"q03_c":1.5e1}}""")
    val m = Bench.loadPrior(f)
    assert(m == Map("q01_a" -> 0.123, "q02_b" -> 4.0, "q03_c" -> 15.0))
    java.nio.file.Files.deleteIfExists(f)
  }

  test("loadPrior degrades to empty on a missing or damaged file") {
    assert(Bench.loadPrior(
      java.nio.file.Paths.get("/nonexistent/bench_full.json")).isEmpty)
    val f = java.nio.file.Files.createTempFile("prior", ".json")
    java.nio.file.Files.writeString(f, """{"queries": not-json""")
    assert(Bench.loadPrior(f).isEmpty)
    java.nio.file.Files.writeString(f, """{"no_queries_key": 1}""")
    assert(Bench.loadPrior(f).isEmpty)
    java.nio.file.Files.deleteIfExists(f)
  }
}
