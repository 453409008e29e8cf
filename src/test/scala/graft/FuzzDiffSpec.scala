package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** Differential fuzz gate (VERDICT r12 item 3): seeded adversarial
  * fixtures ([[FuzzFixtures]] — ties, same-instant events, dead funnel
  * stages, empty/singleton inputs, identical values, single-user skew,
  * NULL measures), engine-vs-DuckDB on EVERY fixture via
  * tools/fuzz_check.py (one python process for the whole sweep; the
  * compare is tools/check.py `compare_query` — the identical
  * column-name-sorted positional compare as the sf-gate).
  *
  * 13 classes × 8 seeds = 104 fixtures. Every fixture runs the three
  * highest-risk families (fixed-anchor funnel q353, sliding funnel q375,
  * markov stationary q367 — the families whose r11/r12 bugs motivated
  * this gate) plus a 3-wide rotation over the other 13 events-only
  * families, so each family sees ≥ 24 fixtures across all classes.
  *
  * DuckDB runs through the same python3 toolchain the close-run
  * correctness gate already shells out to (tools/check.py); the shipped
  * library has no python dependency — this is test harness only. A
  * missing python3/duckdb fails the suite LOUDLY rather than skipping:
  * a silently-vanishing differential gate is worse than a broken build.
  */
class FuzzDiffSpec extends AnyFunSuite {

  /** Events-only query families under fuzz (names = Registry keys). */
  private val core = Vector(
    "q353_window_funnel", "q375_sliding_funnel", "q367_markov_stationary")
  private val rotation = Vector(
    "q11_sessionize",      // session windows (gap rule, ts+event_id order)
    "q12_hour_buckets",    // time-bucketed agg
    "q88_value_histogram", // histogram binning (NULL-bin ordering)
    "q90_funnel",          // unbounded funnel
    "q122_markov_transitions", // first-order transition matrix
    "q126_mad_outliers",   // robust z (MAD = 0 on identical values)
    "q174_rolling_actives",// DAU/WAU rolling distinct
    "q177_funnel_latency", // funnel latency percentiles
    "q214_mann_whitney",   // rank-sum test (ties in ranks)
    "q260_spearman",       // rank correlation (tie correction)
    "q285_activity_streaks", // islands-and-gaps window
    "q335_welch_ttest",    // two-sample t (degenerate arms)
    "q373_bounce_rate")    // sessionized bounce shares

  private def jsonEsc(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  test("engine matches DuckDB on 104 seeded adversarial fixtures " +
    "across 16 query families") {
    val spark = GraftSpark.spark
    val root = new java.io.File("target/fuzz").getAbsolutePath
    val fxRoot = s"$root/fixtures"
    val outRoot = s"$root/out"
    val oracles = graft.queries.Registry.oracles
    val all = graft.queries.Registry.all
    (core ++ rotation).foreach { q =>
      assert(all.contains(q), s"fuzz query $q not registered")
      assert(oracles.contains(q), s"fuzz query $q has no oracle SQL")
    }

    var k = 0
    // Engine-side exceptions are SURVEYED, not aborted on: a degenerate
    // fixture that throws (instead of emitting the NULL the oracle
    // emits) is exactly the bug class this gate hunts, and one run must
    // reveal ALL of them. A thrown query leaves no output → fuzz_check
    // counts it [MISS] → the gate still fails; the engineErrors list
    // names each (fixture, query, error) in the assertion message.
    val engineErrors = scala.collection.mutable.ArrayBuffer[String]()
    for (cls <- FuzzFixtures.Classes; seed <- 0 until 8) {
      val fx = f"fx$k%03d_$cls"
      val fxDir = s"$fxRoot/$fx"
      FuzzFixtures.write(spark, cls, seed.toLong, fxDir)
      // 3 core + 3 rotated families per fixture; stride 4 over a
      // 13-element rotation keeps the three picks distinct and cycles
      // every family through every class across the 8 seeds.
      val picked = core ++ Seq(k, k + 4, k + 8).map(i =>
        rotation(i % rotation.size))
      picked.foreach { q =>
        try {
          all(q)(spark, fxDir).coalesce(1)
            .write.mode("overwrite").parquet(s"$outRoot/$fx/$q")
        } catch { case e: Throwable =>
          engineErrors += s"$fx/$q: ${e.getClass.getSimpleName} " +
            e.getMessage.linesIterator.take(2).mkString(" | ")
        }
      }
      val json = picked.sorted
        .map(q => s"${jsonEsc(q)}: ${jsonEsc(oracles(q))}")
        .mkString("{", ",", "}")
      Files.createDirectories(Paths.get(s"$outRoot/$fx"))
      Files.writeString(Paths.get(s"$outRoot/$fx/oracle_sql.json"), json)
      k += 1
    }
    assert(k == 104, s"fixture plan drifted: $k")

    import scala.sys.process._
    val out = new StringBuilder
    val logger = ProcessLogger(
      l => out.append(l).append('\n'),
      l => out.append(l).append('\n'))
    val code = Process(Seq("python3", "tools/fuzz_check.py", fxRoot,
      outRoot, s"$root/fuzz_report.json"),
      new java.io.File(".")).!(logger)
    val text = out.toString
    val tail = text.linesIterator.toSeq.takeRight(40).mkString("\n")
    info(text.linesIterator.toSeq.lastOption.getOrElse("(no output)"))
    val engErrs =
      if (engineErrors.isEmpty) ""
      else s"\nENGINE exceptions (${engineErrors.size}):\n" +
        engineErrors.mkString("\n")
    assert(code == 0, s"fuzz_check.py failed (exit $code):\n$tail$engErrs")
    assert(engineErrors.isEmpty, engErrs)
    val summary = "FUZZ (\\d+) fixtures, (\\d+) ok, (\\d+) fail".r
    summary.findFirstMatchIn(text) match {
      case Some(m) =>
        assert(m.group(1).toInt == 104, s"fixture count: $tail")
        assert(m.group(3).toInt == 0, s"fuzz failures: $tail$engErrs")
        assert(m.group(2).toInt == 104 * 6, s"comparison count: $tail")
      case None => fail(s"no FUZZ summary line:\n$tail")
    }
  }
}
