package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the cross-round drift taint's prior loader (r11's headline
  * bench mechanism, hardened per VERDICT r11 #1): it must parse the
  * COMMITTED bench_prior.json (the builder-curated artifact the bench
  * reads at round start — NOT the driver-overwritable bench_full.json),
  * degrade to empty on damage (drift inactive — never a crashed bench),
  * carry per-query values usable for the max(3×prior, 2 s) threshold,
  * carry sf_run so a cross-SF run disarms rather than mass-taints
  * (ADVICE r11), and gate prior refresh so a hot or driver-initiated
  * run can never raise any prior.
  */
class BenchPriorSpec extends AnyFunSuite {

  test("loadPrior parses the committed bench_prior.json artifact") {
    val p = java.nio.file.Paths.get("bench_prior.json")
    assume(java.nio.file.Files.exists(p), "artifact not in working dir")
    val prior = Bench.loadPrior(p)
    assert(prior.size > 300, s"only ${prior.size} priors parsed")
    assert(prior.keys.forall(_.matches("q\\d+.*")), "non-query key parsed")
    assert(prior.values.forall(v => v > 0.0 && v < 600.0),
      "prior outside plausible per-query seconds")
    assert(Bench.loadPriorArtifact(p).sfRun.contains("sf0.1"),
      "committed prior must self-describe its scale factor")
  }

  test("committed prior is the CLEAN close run, not a contaminated driver run") {
    // VERDICT r11 #1: the driver's weather-contaminated run recorded
    // q55_als_grid at 49.5 s (honest close-run value: ~13 s). If that
    // value ever reaches the prior file, a future ~45 s storm reading
    // passes untainted. This pin makes the poisoning loud.
    val p = java.nio.file.Paths.get("bench_prior.json")
    assume(java.nio.file.Files.exists(p), "artifact not in working dir")
    val prior = Bench.loadPrior(p)
    for ((q, ceiling) <- Seq("q55_als_grid" -> 25.0, "q54_bias_sweep" -> 6.0,
                             "q152_mmr_rerank" -> 10.0,
                             "q178_seasonal_anomaly" -> 6.0))
      prior.get(q).foreach(v =>
        assert(v < ceiling, s"$q prior $v looks storm-contaminated"))
  }

  test("loadPrior parses all three numeric JSON shapes") {
    val f = java.nio.file.Files.createTempFile("prior", ".json")
    java.nio.file.Files.writeString(f,
      """{"value":1.0,"sf_run":"sf0.1","queries":{"q01_a":0.123,"q02_b":4,"q03_c":1.5e1}}""")
    val art = Bench.loadPriorArtifact(f)
    assert(art.queries == Map("q01_a" -> 0.123, "q02_b" -> 4.0, "q03_c" -> 15.0))
    assert(art.sfRun.contains("sf0.1"))
    java.nio.file.Files.deleteIfExists(f)
  }

  test("loadPrior degrades to empty on a missing or damaged file") {
    assert(Bench.loadPrior(
      java.nio.file.Paths.get("/nonexistent/bench_prior.json")).isEmpty)
    val f = java.nio.file.Files.createTempFile("prior", ".json")
    java.nio.file.Files.writeString(f, """{"queries": not-json""")
    assert(Bench.loadPrior(f).isEmpty)
    java.nio.file.Files.writeString(f, """{"no_queries_key": 1}""")
    assert(Bench.loadPrior(f).isEmpty)
    // sf_run absent → None (caller disarms the drift taint, logs mismatch)
    java.nio.file.Files.writeString(f, """{"queries":{"q01_a":1.0}}""")
    assert(Bench.loadPriorArtifact(f).sfRun.isEmpty)
    java.nio.file.Files.deleteIfExists(f)
  }

  test("prior artifact self-describes its weather (sentinel_median) and " +
    "weatherFactor normalizes across regimes") {
    val p = java.nio.file.Paths.get("bench_prior.json")
    assume(java.nio.file.Files.exists(p), "artifact not in working dir")
    // The committed prior must carry the sentinel its readings were
    // taken at — without it the λ-normalization (VERDICT r15 #1)
    // silently degrades to the raw-seconds comparison.
    val sMed = Bench.loadPriorArtifact(p).sentinelMedian
    assert(sMed.exists(v => v > 0.0 && v < 1.0),
      s"prior sentinel_median missing or implausible: $sMed")
    // Identity cases: unknown prior sentinel (legacy artifact), equal
    // weather.
    assert(Bench.weatherFactor(0.127, None, 0.41) == 1.0)
    assert(Bench.weatherFactor(0.067, Some(0.067), 0.41) == 1.0)
    // The r15-close-vs-r13-prior shape the fix exists for: 0.127 vs
    // 0.067 at λ=0.41 scales the prior by 1 + 0.41·(0.127/0.067 − 1)
    // ≈ 1.367 — the drift gate stops crying weather on every heavy
    // query while a genuine 3× regression still clears 3 × 1.367.
    val wf = Bench.weatherFactor(0.127, Some(0.067), 0.41)
    assert(math.abs(wf - (1.0 + 0.41 * (0.127 / 0.067 - 1.0))) < 1e-12)
    assert(wf > 1.3 && wf < 1.4, s"wf $wf")
    // Clamps: a >5× scaled factor is a storm (sentinel taint's job);
    // quieter-than-prior tightens but never below 0.5.
    assert(Bench.weatherFactor(10.0, Some(0.067), 1.0) == 5.0)
    assert(Bench.weatherFactor(0.001, Some(0.5), 1.0) == 0.5)
  }

  test("mayWritePrior: driver, hot, and failing runs can never raise a prior") {
    // The driver never sets SPARK_GRAFT_WRITE_PRIOR — envFlag=false alone
    // must veto, regardless of how clean the run looked.
    assert(!Bench.mayWritePrior(envFlag = false, fullRun = true, Nil, Nil))
    // A flagged close run that itself hit a sustained storm must refuse:
    // baking a hot reading into the prior is exactly the r11 poisoning.
    assert(!Bench.mayWritePrior(envFlag = true, fullRun = true,
      unresolvedDrift = Seq("q55_als_grid"), failed = Nil))
    // A subset dev run must not shrink the prior surface.
    assert(!Bench.mayWritePrior(envFlag = true, fullRun = false, Nil, Nil))
    // A run with ANY failed query records a time-to-exception reading —
    // a flatteringly tiny prior that would drift-taint the honest value
    // forever after — and must refuse too.
    assert(!Bench.mayWritePrior(envFlag = true, fullRun = true, Nil,
      failed = Seq("q01_pricing_summary")))
    // Only the explicit, full, storm-free, failure-free close run writes.
    assert(Bench.mayWritePrior(envFlag = true, fullRun = true, Nil, Nil))
  }
}
