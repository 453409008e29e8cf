package graft
import org.apache.spark.sql.SparkSession
object Bench {
  /** A parsed prior artifact: the run's self-described scale factor and
    * sentinel median (its WEATHER — VERDICT r15 #1) plus per-query
    * readings (VERDICT r11 #1 / ADVICE r11). */
  final case class Prior(sfRun: Option[String], queries: Map[String, Double],
                         sentinelMedian: Option[Double] = None)

  /** Per-query prior readings for the cross-round drift taint
    * (VERDICT r10 #1). Since r12 the taint reads `bench_prior.json` — a
    * builder-curated file that ONLY a clean close run with
    * SPARK_GRAFT_WRITE_PRIOR=1 refreshes — never the driver-overwritable
    * bench_full.json (VERDICT r11 #1: the driver's weather-contaminated
    * r11 run overwrote bench_full.json and would have loosened 13
    * queries' taint thresholds). Tolerant by contract: any parse/read
    * failure returns empty (drift taint inactive, sentinel taint still
    * armed) rather than failing the bench. Extracted from main() so
    * BenchPriorSpec can pin the parse against the real artifact shape. */
  def loadPriorArtifact(path: java.nio.file.Path): Prior = try {
    import org.json4s._
    val txt = java.nio.file.Files.readString(path)
    val parsed = jackson.JsonMethods.parse(txt)
    val sfRun = parsed \ "sf_run" match {
      case JString(s) => Some(s)
      case _ => None
    }
    val qs = parsed \ "queries" match {
      case JObject(fields) => fields.collect {
        case (k, JDouble(v)) => k -> v
        case (k, JInt(v)) => k -> v.toDouble
        case (k, JDecimal(v)) => k -> v.toDouble
      }.toMap
      case _ => Map.empty[String, Double]
    }
    val sMed = parsed \ "sentinel_median" match {
      case JDouble(v) => Some(v)
      case JDecimal(v) => Some(v.toDouble)
      case JInt(v) => Some(v.toDouble)
      case _ => None
    }
    Prior(sfRun, qs, sMed)
  } catch { case _: Throwable => Prior(None, Map.empty) }

  /** λ-weather normalization (VERDICT r15 #1): the committed model
    * (ARCHITECTURE "Sentinel-to-wall-time weather correction", fit on
    * the r13/r14 windows and corroborated out-of-sample on r15) says a
    * run's wall-clock scales as Δtotal/total ≈ λ·Δsentinel/sentinel
    * with λ ≈ 0.41 on this host. The drift taint used to compare RAW
    * seconds against a prior taken in a different weather regime — once
    * the host floor drifted to ~2× the r13 sentinel, every driver run
    * tainted ~15 hot + ~176 ambient queries on zero code regressions
    * and each round needed a prose adjudication. The factor returned
    * here scales the prior's per-query readings into THIS run's
    * weather before the 3× comparison: 1 + λ·(s_run/s_prior − 1),
    * clamped to [0.5, 5] (a >5× sentinel ratio is a storm the sentinel
    * taint itself handles; < 0.5 would mean the prior was taken in
    * weather twice as bad as now — tighten, but not without bound).
    * Identity when either sentinel is unknown (legacy artifacts) or
    * the ratio is 1. λ overridable via SPARK_GRAFT_LAMBDA (same
    * override discipline as the other SPARK_GRAFT_* knobs). */
  val DefaultLambda = 0.41
  def weatherFactor(runSentinel: Double, priorSentinel: Option[Double],
                    lambda: Double): Double = priorSentinel match {
    case Some(s) if s > 0.0 && runSentinel > 0.0 =>
      math.min(5.0, math.max(0.5, 1.0 + lambda * (runSentinel / s - 1.0)))
    case _ => 1.0
  }

  def loadPrior(path: java.nio.file.Path): Map[String, Double] =
    loadPriorArtifact(path).queries

  /** Gate on refreshing bench_prior.json (VERDICT r11 #1). Four
    * independent conditions, each closing a distinct hazard:
    *  - envFlag: only the builder's explicit close run sets
    *    SPARK_GRAFT_WRITE_PRIOR=1 — the driver's invocation never does,
    *    so a driver run (contaminated or not) can NEVER raise a prior;
    *  - fullRun: a dev subset run must not shrink the prior surface;
    *  - unresolvedDrift empty: a close run that itself hit a sustained
    *    storm (readings still over threshold after rerun) must not bake
    *    hot values in as next round's reference;
    *  - failed empty: a failing query records its time-to-exception
    *    (possibly 0.3 s for a 5 s query), and baking that in would
    *    drift-taint the honest reading every round after the fix —
    *    and, worse, each of those would land in unresolved_drift and
    *    block every future refresh until the file was hand-repaired. */
  def mayWritePrior(envFlag: Boolean, fullRun: Boolean,
                    unresolvedDrift: Seq[String],
                    failed: Seq[String]): Boolean =
    envFlag && fullRun && unresolvedDrift.isEmpty && failed.isEmpty

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed JVM warm-up: scheduler, whole-stage-codegen compiler, and
    // the parquet datasource init path — against a throwaway parquet
    // written here, NOT any input table (warming an input would
    // pre-populate file-listing/footer caches some timed query reads).
    // Without it the alphabetically-first query absorbs ~3-4 s of
    // one-time JVM costs that say nothing about its plan.
    spark.range(100000).selectExpr("sum(id)").collect()
    val warmDir = java.nio.file.Files.createTempDirectory("graft-warm")
    spark.range(100).write.mode("overwrite").parquet(s"$warmDir/w")
    spark.read.parquet(s"$warmDir/w").count()
    sys.addShutdownHook { // don't accumulate warm-up dirs across runs
      try {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(warmDir).iterator().asScala.toSeq
          .sortBy(-_.getNameCount)
          .foreach(p => java.nio.file.Files.deleteIfExists(p))
      } catch { case _: Throwable => () }
    }

    // --- Host-contention sentinel (VERDICT r9 #1) -----------------------
    // BENCH_r09 was inflated ~2× by co-resident load: 287 s of its 338 s
    // excess sat in 9 CONTIGUOUS spans of the execution order — a
    // signature no per-query plan change can produce. The defense: a
    // fixed-cost CPU micro-op timed between queries. Its wall-clock has
    // no data, plan, or memo dependence, so a reading ≫ the session
    // median can only mean the host was busy — which taints the queries
    // timed nearby. Tainted queries are re-timed once at the end and the
    // recorded time is min(first, rerun): the min of two samples cannot
    // be contention-inflated unless BOTH windows were contended, and
    // every reading ships in bench_full.json so a damaged run is
    // self-diagnosing rather than silently wrong.
    def sentinel(): Double = {
      val t0 = System.nanoTime()
      // Per-row hash keeps the op CPU-bound and schedule-spanning; the
      // %1024 bound keeps the ANSI long sum overflow-free.
      spark.range(4000000).selectExpr("sum(xxhash64(id) % 1024)").collect()
      (System.nanoTime() - t0) / 1e9
    }
    sentinel() // warm the sentinel's own codegen path (untimed)
    val SentinelEvery = 3 // r9 contention spans covered 6-12 queries
    val TaintFactor = 2.0
    // Severity tiering (VERDICT r13 #4): the r13 close run's own trace
    // measured the clean-box sentinel distribution at n=126, median
    // 0.067 s, p95 0.185 s, max 0.265 s — ambient scheduler jitter never
    // exceeded median + 0.2 s, yet the pure-ratio gate (2×med = 0.134 s)
    // tainted 131 of 374 queries on a run with zero real contention: at
    // a ~0.1 s median the flag was noise, not signal (42% base rate in
    // the r13 driver run). A reading is HOT — actionable contention —
    // only when it clears the ratio gate AND exceeds the median by
    // 0.5 s in absolute terms: 2.5× the observed clean-run ceiling,
    // while the storms the mechanism exists for (r9: multi-second
    // readings against a ~0.1 s median) clear it by an order of
    // magnitude. Hot readings taint, rerun, and veto the prior refresh
    // exactly as before; ratio-only exceedances are AMBIENT — logged in
    // bench_full.json (`ambient_tainted`) for forensics, never rerun.
    //
    // The floor is DERIVED from the run's own sentinel spread, not the
    // hard-coded 0.5 s above (ADVICE r14: 0.5 was calibrated from ONE
    // machine's clean trace; on a slower/noisier host, sustained
    // contention adding 0.2–0.5 s per reading would tier AMBIENT forever
    // and silently inflate value_clean). 2.5 × the trace's p95
    // excess-over-median — the same multiple that turned the r13
    // calibration (p95 excess ≈ 0.2 s) into 0.5 — clamped to
    // [0.25, DefaultHotExcessSecs]: the lower clamp keeps clean-machine
    // jitter (max observed clean excess ≈ 0.2 s) from flagging hot and
    // vetoing the prior refresh; the upper keeps the r13-calibrated
    // worst case, because deriving MORE than 0.5 from a contaminated
    // trace would loosen the gate exactly when contention is sustained.
    // SPARK_GRAFT_HOT_EXCESS_SECS overrides both (per-host operator
    // knob). Computed after the trace exists — see hotExcessSecs below.
    val DefaultHotExcessSecs = 0.5

    // --- Cross-round drift taint (VERDICT r10 #1) -----------------------
    // The sentinel's structural blind spot: a contention burst SHORTER
    // than the query it lands inside leaves both bracketing readings calm
    // (r10: q208 recorded 89.79 s untainted; solo re-run 7.48 s; code
    // unchanged since r8). The defense that catches it: a per-query PRIOR.
    // The committed bench_prior.json (builder-curated; see loadPriorArtifact)
    // rides along in the checkout; any first-pass reading exceeding max(DriftFactor ×
    // its prior recording, DriftFloor) is drift-tainted and re-timed like
    // a sentinel taint — min(first, rerun) recorded as usual. Genuine
    // plan regressions re-measure at their true (still slow) cost, so a
    // real 3× slowdown still shows; only one-sided noise is removed. New
    // queries have no prior and stay sentinel-covered only.
    val DriftFactor = 3.0
    val DriftFloor = 2.0 // seconds — sub-2 s readings are all noise-sized
    // sf_run: the run's scale factor, self-described (ADVICE r8/r9 —
    // kills mislabeled-artifact ambiguity). Computed here because the
    // drift taint is only armed when the prior was taken at the SAME
    // scale factor (ADVICE r11: a cross-SF prior would either
    // mass-taint the whole suite or silently disarm the mechanism).
    val sfRun = sfDir.split('/').filter(_.nonEmpty).lastOption.getOrElse("?")
    val priorArt = loadPriorArtifact(java.nio.file.Paths.get("bench_prior.json"))
    val prior: Map[String, Double] =
      if (priorArt.queries.isEmpty) {
        System.err.println("[bench] no bench_prior.json — drift taint inactive")
        Map.empty
      } else if (!priorArt.sfRun.contains(sfRun)) {
        System.err.println(s"[bench] bench_prior.json is sf_run=" +
          s"${priorArt.sfRun.getOrElse("?")} but this run is $sfRun — " +
          "drift taint inactive (cross-SF priors are not comparable)")
        Map.empty
      } else priorArt.queries

    // Stable name order: run-to-run comparable timings (Map order is
    // hash-dependent and reshuffles whenever a query is added).
    // Driver contract: no args. An optional first arg (comma-separated
    // query names) is a builder-side dev aid — time only that subset in
    // an otherwise-identical fresh JVM.
    val only: Option[Set[String]] =
      if (args.nonEmpty) Some(args(0).split(",").toSet) else None
    var failed = List.empty[String]
    val toRun = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }

    def timeOne(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch {
        case e: Throwable =>
          // A swallowed failure would read as a fast success and silently
          // flatter the totals; surface it in the JSON and on stderr.
          if (!failed.contains(name)) failed ::= name
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
      }
      (System.nanoTime() - t0) / 1e9
    }

    // First pass: queries interleaved with sentinels. sentinelIdx(i) =
    // index of the sentinel reading taken BEFORE query i ran (the span
    // [reading s, reading s+1] brackets queries with sentinelIdx == s).
    // Per-query wall-clock START offsets (seconds since runEpochMs) ship
    // in bench_full.json (VERDICT r10 #6): they let a post-hoc audit
    // align any reading with external host-load evidence — the forensic
    // layer under both taint mechanisms.
    val runEpochMs = System.currentTimeMillis()
    val startOffset = scala.collection.mutable.LinkedHashMap[String, Double]()
    val sentinels = scala.collection.mutable.ArrayBuffer[Double]()
    val sentinelIdx = scala.collection.mutable.ArrayBuffer[Int]()
    sentinels += sentinel()
    val firstPass = toRun.zipWithIndex.map { case ((name, fn), i) =>
      if (i > 0 && i % SentinelEvery == 0) sentinels += sentinel()
      sentinelIdx += sentinels.size - 1
      startOffset(name) = (System.currentTimeMillis() - runEpochMs) / 1e3
      val secs = timeOne(name, fn)
      // Per-query progress on stderr: makes a stalled query identifiable
      // mid-run (the stdout JSON line stays the single driver artifact).
      System.err.println(f"[bench] $name done in $secs%.2f s")
      name -> secs
    }
    sentinels += sentinel()
    val med = {
      val s = sentinels.toSeq.sorted
      s(s.size / 2)
    }
    // A query is tainted when EITHER bracketing sentinel reading spiked:
    // contention may start mid-window (caught by the closing reading) or
    // end mid-window (caught by the opening one). HOT needs the ratio
    // gate AND the absolute-excess floor derived from this run's own
    // trace (see DefaultHotExcessSecs scaladoc for the derivation);
    // ratio-only exceedances tier down to AMBIENT (logged, not rerun).
    val hotExcessSecs = sys.env.get("SPARK_GRAFT_HOT_EXCESS_SECS")
      .map(_.toDouble).getOrElse {
        val exc = sentinels.toSeq.map(v => math.max(0.0, v - med)).sorted
        val p95 = exc(math.min(exc.size - 1, (exc.size * 95) / 100))
        math.min(DefaultHotExcessSecs, math.max(0.25, 2.5 * p95))
      }
    System.err.println(f"[bench] hot excess floor $hotExcessSecs%.3f s" +
      s" (${if (sys.env.contains("SPARK_GRAFT_HOT_EXCESS_SECS")) "env"
      else "derived from this run's sentinel spread"})")
    val hotThreshold = math.max(TaintFactor * med, med + hotExcessSecs)
    val hot = sentinels.zipWithIndex.collect {
      case (v, i) if v > hotThreshold => i
    }.toSet
    val ambientReadings = sentinels.zipWithIndex.collect {
      case (v, i) if v > TaintFactor * med && !hot(i) => i
    }.toSet
    val sentinelTainted = firstPass.zipWithIndex.collect {
      case ((name, _), i) if hot(sentinelIdx(i)) || hot(sentinelIdx(i) + 1) =>
        name
    }.toSet
    val ambientTainted = firstPass.zipWithIndex.collect {
      case ((name, _), i) if ambientReadings(sentinelIdx(i)) ||
        ambientReadings(sentinelIdx(i) + 1) => name
    }.toSet -- sentinelTainted
    // λ-normalize the prior into this run's weather before the 3×
    // comparison (VERDICT r15 #1 — see weatherFactor scaladoc): the
    // per-query drift threshold becomes
    //   max(DriftFactor × prior × wf, DriftFloor)
    // so a prior taken at sentinel 0.067 compared in a 0.127 window
    // stops crying weather on every heavy query, while a genuine 3×
    // plan regression still clears the (≤ ~1.4×-scaled) bar.
    val lambda = sys.env.get("SPARK_GRAFT_LAMBDA").map(_.toDouble)
      .getOrElse(DefaultLambda)
    val wf = weatherFactor(med, priorArt.sentinelMedian, lambda)
    if (prior.nonEmpty)
      System.err.println(f"[bench] weather factor $wf%.3f (lambda=$lambda%.2f, " +
        f"run sentinel $med%.3f vs prior " +
        s"${priorArt.sentinelMedian.map(v => f"$v%.3f").getOrElse("?")})")
    def driftThreshold(name: String): Double =
      math.max(DriftFactor * prior(name) * wf, DriftFloor)
    val driftTainted = firstPass.collect {
      case (name, secs) if prior.contains(name) &&
        secs > driftThreshold(name) => name
    }.toSet
    val tainted = sentinelTainted ++ driftTainted
    if (ambientTainted.nonEmpty)
      System.err.println(s"[bench] ${ambientReadings.size} ambient sentinel " +
        s"readings (over ${f"${TaintFactor * med}%.3f"} s ratio gate, under " +
        s"${f"$hotThreshold%.3f"} s hot threshold) flag " +
        s"${ambientTainted.size} queries — logged, not rerun")
    if (tainted.nonEmpty)
      System.err.println(s"[bench] sentinel median ${f"$med%.3f"} s; " +
        s"${hot.size} hot readings taint ${sentinelTainted.size} queries; " +
        s"drift vs prior taints ${driftTainted.size} " +
        s"(${driftTainted.toSeq.sorted.mkString(",")}); rerunning " +
        s"${tainted.size}: " + tainted.toSeq.sorted.mkString(","))

    // Rerun pass (once, at the end). Session memos built in the first
    // pass are DROPPED first: with them warm, a memo-backed query's
    // rerun measures a cache lookup (observed: q55's 16-fit ALS grid
    // "rerunning" in 0.099 s), and min(first, rerun) then under-counts
    // the total — a flattering error, worse than the contention it
    // corrects. With the memos cold, a rerun pays AT LEAST the query's
    // true cost (possibly more, if it rebuilds a frame the first pass
    // amortized across neighbours — the min() falls back to the first
    // reading in that case, so both readings are overestimates and
    // their min never flatters). Reruns go in name order, so memo
    // amortization WITHIN the rerun phase mirrors the first pass.
    graft.util.SessionMemo.clear(spark)
    val byName = toRun.toMap
    val rerunOffset = scala.collection.mutable.LinkedHashMap[String, Double]()
    val reruns = tainted.toSeq.sorted.map { name =>
      rerunOffset(name) = (System.currentTimeMillis() - runEpochMs) / 1e3
      val secs = timeOne(name, byName(name))
      System.err.println(f"[bench] rerun $name done in $secs%.2f s")
      name -> secs
    }.toMap
    val results = firstPass.map { case (name, first) =>
      name -> math.min(first, reruns.getOrElse(name, first))
    }

    // --- Unresolved drift (VERDICT r11 #2) ------------------------------
    // min(first, rerun) cannot defeat a contention storm LONGER than the
    // run: r11's driver slot was hot end-to-end, so 4 drift-tainted
    // queries' reruns (taken 450-600 s after first pass) were STILL over
    // threshold, and the artifact recorded hot values indistinguishably
    // from honest ones — adjudication needed judge solo re-runs. The data
    // to self-label was already here: any tainted query whose RECORDED
    // value still exceeds max(DriftFactor × prior, DriftFloor) is weather
    // the run could not out-wait. Those names ship as `unresolved_drift`,
    // and `value_clean` reports the total with each such reading
    // substituted by its prior — the run's own best estimate of the
    // weather-free figure, computed without external evidence.
    // Scope note (ADVICE r12 #4): this filters the UNION tainted set on
    // purpose — a sentinel-tainted query whose rerun is still over the
    // drift threshold is just as much unadjudicated weather as a
    // drift-tainted one, and must likewise veto the prior refresh and be
    // substituted in value_clean. The artifact field keeps its
    // `unresolved_drift` name (consumers: bench_weather.py, the driver's
    // n_unresolved, BenchPriorSpec); read it as "tainted by EITHER
    // mechanism and still hot after rerun".
    val resultMap = results.toMap
    val unresolvedDrift = tainted.toSeq.sorted.filter { name =>
      prior.contains(name) && resultMap(name) > driftThreshold(name)
    }
    // value_clean substitutes the λ-ADJUSTED prior (prior × wf) since
    // r16: the substituted figure estimates the reading in THIS run's
    // ambient weather, so value_clean stays comparable to the run's
    // other (untouched) readings instead of mixing two weather regimes.
    val valueClean = results.map { case (name, v) =>
      if (unresolvedDrift.contains(name)) prior(name) * wf else v
    }.sum
    if (unresolvedDrift.nonEmpty)
      System.err.println(s"[bench] UNRESOLVED hot readings (sentinel- or " +
        s"drift-tainted, rerun still over threshold — sustained host " +
        s"storm, values are weather not code): " +
        unresolvedDrift.mkString(","))

    // Stdout contract: the driver tail-captures the LAST ~2000 chars of
    // stdout, so the single JSON line must fit entirely inside that
    // window — at 182 queries a full per-query map is ~5 kB and clips the
    // head ("metric":"total" unrecoverable; BENCH_r06 "parsed": null).
    // Stdout therefore carries total + failures + only the SLOWEST
    // queries (the perf signal), and the complete per-query map — plus
    // the sentinel trace and rerun detail — goes to stderr and to
    // bench_full.json next to the working dir.
    // Locale-FIXED: this string lands inside the driver-parsed JSON
    // artifact — the default-locale f-interpolator would emit "1,234"
    // on a comma-decimal JVM and silently invalidate the whole line.
    def s3(v: Double) =
      String.format(java.util.Locale.US, "%.3f", Double.box(v))
    def qjson(rs: Seq[(String, Double)]) =
      rs.map { case (k, v) => "\"" + k + "\":" + s3(v) }
        .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val totalFirst = firstPass.map(_._2).sum
    val failedJson = failed.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    val slowest = results.sortBy(-_._2).take(30).sortBy(_._1)
    val sentinelJson = sentinels.map(s3).mkString("[", ",", "]")
    def names(xs: Iterable[String]) =
      xs.toSeq.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    // first_pass_s: the RAW first-pass map (ADVICE r11 medium — the
    // recorded min(first, rerun) hides the contaminated reading, so the
    // offset-alignment tool could never see what the taint fired on).
    // sentinel_tainted ships separately from the union `tainted` so the
    // forensic output can attribute WHICH mechanism fired (ADVICE r11).
    val fullLine =
      s"""{"metric":"total","value":${s3(total)},"unit":"sec","value_clean":${s3(valueClean)},"n_queries":${results.size},"queries":${qjson(results)},"failed":$failedJson,"sf":"$sfDir","sf_run":"$sfRun","total_first_pass":${s3(totalFirst)},"first_pass_s":${qjson(firstPass)},"sentinel":$sentinelJson,"sentinel_median":${s3(med)},"sentinel_every":$SentinelEvery,"lambda":${s3(lambda)},"weather_factor":${s3(wf)},"prior_sentinel_median":${priorArt.sentinelMedian.map(s3).getOrElse("null")},"tainted":${names(tainted)},"sentinel_tainted":${names(sentinelTainted)},"ambient_tainted":${names(ambientTainted)},"sentinel_hot_threshold":${s3(hotThreshold)},"drift_tainted":${names(driftTainted)},"unresolved_drift":${names(unresolvedDrift)},"reruns":${qjson(reruns.toSeq.sortBy(_._1))},"run_epoch_ms":$runEpochMs,"start_offset_s":${qjson(startOffset.toSeq)},"rerun_offset_s":${qjson(rerunOffset.toSeq)}}"""
    System.err.println(s"[bench-full] $fullLine")
    // Only a FULL run may write the artifact: a dev subset run would
    // silently clobber the full-surface record the docs cite.
    if (only.isEmpty)
      try java.nio.file.Files.writeString(
        java.nio.file.Paths.get("bench_full.json"), fullLine + "\n")
      catch { case _: Throwable => () }
    // bench_ledger.jsonl (VERDICT r15 #3): one appended line per FULL
    // run — the accumulating (sentinel, total) evidence the λ-model
    // refits from (tools/bench_weather.py --lambda) instead of the
    // three hand-picked windows it was born on. Tolerant like every
    // other artifact write; committed at close like bench_full.json.
    if (only.isEmpty) {
      try {
        val head =
          try scala.sys.process.Process(
            Seq("git", "rev-parse", "--short", "HEAD")).!!.trim
          catch { case _: Throwable => "?" }
        val ledgerLine =
          s"""{"run_epoch_ms":$runEpochMs,"sf_run":"$sfRun","sentinel_median":${s3(med)},"total":${s3(total)},"value_clean":${s3(valueClean)},"n_queries":${results.size},"lambda":${s3(lambda)},"weather_factor":${s3(wf)},"n_unresolved":${unresolvedDrift.size},"n_failed":${failed.size},"head":"$head"}"""
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get("bench_ledger.jsonl"), ledgerLine + "\n",
          java.nio.file.StandardOpenOption.CREATE,
          java.nio.file.StandardOpenOption.APPEND)
      } catch { case _: Throwable => () }
    }
    // bench_prior.json — next round's drift-taint reference — is refreshed
    // ONLY by an explicitly-flagged, full, storm-free run (VERDICT r11 #1;
    // gate logic pinned by BenchPriorSpec). The driver never sets the
    // flag, so its runs can never raise a prior.
    if (mayWritePrior(sys.env.get("SPARK_GRAFT_WRITE_PRIOR").contains("1"),
                      only.isEmpty, unresolvedDrift, failed)) {
      try {
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get("bench_prior.json"), fullLine + "\n")
        System.err.println("[bench] bench_prior.json refreshed (clean close run)")
      } catch { case _: Throwable => () }
    }
    // Stdout carries at most 10 unresolved names (the full list is in
    // bench_full.json) — a storm-wide list would clip the tail-captured
    // JSON head and lose "metric":"total" (the BENCH_r06 failure mode).
    println(
      s"""{"metric":"total","value":${s3(total)},"unit":"sec","value_clean":${s3(valueClean)},"n_queries":${results.size},"queries":${qjson(slowest)},"queries_note":"slowest 30 of ${results.size}; full map in stderr [bench-full] and bench_full.json","failed":$failedJson,"sf":"$sfDir","sf_run":"$sfRun","sentinel_median":${s3(med)},"n_tainted":${tainted.size},"n_ambient":${ambientTainted.size},"n_drift":${driftTainted.size},"n_unresolved":${unresolvedDrift.size},"unresolved_drift":${names(unresolvedDrift.take(10))}}""")
    spark.stop()
  }
}
