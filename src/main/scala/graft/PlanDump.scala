package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.physical.{HashPartitioning, RangePartitioning, RoundRobinPartitioning, SinglePartition}
import org.apache.spark.sql.execution.{FileSourceScanExec, InputAdapter, SparkPlan, WholeStageCodegenExec}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ReusedExchangeExec, ShuffleExchangeExec}
import org.apache.spark.sql.execution.joins.{BaseJoinExec, BroadcastNestedLoopJoinExec, HashJoin}

/** Physical-plan fingerprint regression artifact (VERDICT r12 item 2).
  *
  * R10/R12PlanSpec pin ~a dozen plan shapes by hand; the other ~360
  * queries could silently regress — an AQE flip, a broadcast-threshold
  * change, a SessionMemo miss turning a reuse into a rescan. This main
  * executes every SparkEntry query at the given sf dir (collect(), so
  * AQE reaches its FINAL plan — the plan the bench actually pays for)
  * and emits a NORMALIZED operator-tree fingerprint per query into
  * `plans.json`: node names, join types + build sides, exchange
  * partitioning shapes, codegen span boundaries, scan tables + read
  * columns + pushed-filter structure — with expression IDs, partition
  * counts, literals, and statistics stripped, so the fingerprint is
  * stable run-to-run and diffs only when the PLAN changes.
  *
  * Close-run contract: run at sf0.1 (the bench's scale, where AQE makes
  * the decisions that matter), commit plans.json, and diff against the
  * prior round with tools/plan_diff.py — every changed query must be
  * named in COVERAGE.md.
  *
  * Usage: runMain graft.PlanDump <sfDir> [outPath=plans.json] [subset]
  */
object PlanDump {

  /** One normalized line per operator, children indented. */
  def fingerprint(plan: SparkPlan): String = {
    def norm(s: String): String = s.replaceAll("[0-9]+", "#")
    def tag(n: SparkPlan): String = n match {
      case j: HashJoin => s"${j.nodeName} ${j.joinType} build=${j.buildSide}"
      case j: BroadcastNestedLoopJoinExec =>
        s"${j.nodeName} ${j.joinType} build=${j.buildSide}"
      case j: BaseJoinExec => s"${j.nodeName} ${j.joinType}"
      case e: ShuffleExchangeExec =>
        val p = e.outputPartitioning match {
          case h: HashPartitioning => s"hash(${h.expressions.size})"
          case r: RangePartitioning => s"range(${r.ordering.size})"
          case SinglePartition => "single"
          case _: RoundRobinPartitioning => "roundrobin"
          case other => other.getClass.getSimpleName
        }
        s"Exchange $p"
      case b: BroadcastExchangeExec =>
        s"BroadcastExchange ${b.mode.getClass.getSimpleName}"
      case _: ReusedExchangeExec => "ReusedExchange"
      case f: FileSourceScanExec =>
        // norm() the table name too: roundtrip/sink queries scan
        // session-temp dirs like graft-part<random digits>, which would
        // otherwise diff on every run
        val table = norm(f.relation.location.rootPaths.headOption
          .map(_.getName).getOrElse("?"))
        val cols = f.requiredSchema.fieldNames.sorted.mkString(",")
        val pushed = norm(f.metadata.getOrElse("PushedFilters", ""))
        s"Scan $table cols=[$cols] pushed=$pushed"
      case _: WholeStageCodegenExec => "WholeStageCodegen"
      case _: InputAdapter => "InputAdapter"
      case other => other.nodeName
    }
    val out = scala.collection.mutable.ArrayBuffer[String]()
    def walk(n: SparkPlan, d: Int): Unit = n match {
      case a: AdaptiveSparkPlanExec =>
        out += ("  " * d) + "AdaptiveSparkPlan"
        walk(a.executedPlan, d + 1)
      case s: QueryStageExec =>
        out += ("  " * d) + s.nodeName.replaceAll("[-0-9]+", "")
        walk(s.plan, d + 1)
      case r: ReusedExchangeExec =>
        out += ("  " * d) + tag(r) // leaf: the reused subtree prints once
      case other =>
        out += ("  " * d) + tag(other)
        other.children.foreach(walk(_, d + 1))
    }
    walk(plan, 0)
    out.mkString("\n")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outPath = if (args.length > 1) args(1) else "plans.json"
    val only: Option[Set[String]] =
      if (args.length > 2)
        Some(args(2).split(",").map(_.trim).filter(_.nonEmpty).toSet)
      else None
    only.foreach { s =>
      val unknown = s -- SparkEntry.queries.keySet
      require(unknown.isEmpty,
        s"unknown query name(s): ${unknown.toSeq.sorted.mkString(",")}")
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sfRun = sfDir.split('/').filter(_.nonEmpty).lastOption.getOrElse("?")
    val plans = scala.collection.mutable.LinkedHashMap[String, String]()
    var nFailed = 0
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
        try {
          val df = fn(spark, sfDir)
          df.collect() // drive THIS QueryExecution so AQE finalizes
          plans(name) = fingerprint(df.queryExecution.executedPlan)
          System.err.println(s"[plandump] $name ok")
        } catch { case e: Throwable =>
          nFailed += 1
          plans(name) = s"FAILED: ${e.getClass.getSimpleName}"
          System.err.println(s"[plandump] $name FAILED: ${e.getMessage}")
        }
      }
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val body = plans.toSeq.sortBy(_._1)
      .map { case (k, v) => s"  ${q(k)}: ${q(v)}" }
      .mkString(",\n")
    val json = s"""{
 "sf_run": ${q(sfRun)},
 "cpus": $cpus,
 "n_queries": ${plans.size},
 "n_failed": $nFailed,
 "plans": {
$body
 }
}
"""
    // A subset dev run must not clobber the full committed artifact
    // (same rule as bench_full.json).
    if (only.isEmpty || outPath != "plans.json")
      Files.writeString(Paths.get(outPath), json)
    else
      System.err.println("[plandump] subset run — refusing to overwrite " +
        "plans.json; pass an explicit outPath")
    spark.stop()
  }
}
