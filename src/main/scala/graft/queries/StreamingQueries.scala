package graft.queries

import java.nio.file.{Files, Paths, StandardCopyOption}
import java.util.concurrent.atomic.AtomicLong
import graft.functions.GraftFunctions.{qdec, qround}

import graft.streaming.EventStreams

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Structured Streaming surface, driven to completion over the batch
  * parquet input and validated against the SAME DuckDB oracles as the
  * batch twins (q12/q11) — the defining correctness property of an
  * incremental operator is agreement with its batch semantics, and here
  * the driver's oracle gate checks it every round.
  */
object StreamingQueries {
  type Q = (SparkSession, String) => DataFrame

  private val eventsSchema = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", LongType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  private val runId = new AtomicLong(0)

  /** Streaming file sources need a directory; stage the events table into
    * a temp dir (per (session, dir), memoized — repeated runs in one JVM
    * reuse it; a shutdown hook removes it so long-lived JVMs don't leak
    * temp space). The stage WRITES the [[graft.io.Tables.events]] frame —
    * ts already normalized to canonical ns-epoch long — rather than
    * copying the raw file, so the streaming readers' pinned LongType
    * schema holds whatever physical timestamp unit the source parquet
    * carries (micros/nanos/instant; see `Tables.normalizeEpochNs`). */
  private def stagedDir(spark: SparkSession, dir: String): String =
    graft.util.SessionMemo(spark, s"stream-stage:$dir") {
      val d = Files.createTempDirectory("graft-stream-src")
      val staged = d.resolve("ev")
      graft.io.Tables.events(spark, dir)
        .write.mode("overwrite").parquet(staged.toString)
      graft.util.TempDirs.cleanupOnExit(d)
      staged.toString
    }

  /** Micro-batch partitioning override for the batching-invariance fuzz
    * gate (VERDICT r13 item 3, StreamBatchingFuzzSpec): when the system
    * property is set, every registered streaming query replays its
    * events through a CHUNKED staging — K files consumed one per
    * trigger — instead of the single-file whole-input staging, so the
    * same fixture exercises genuinely different micro-batch boundaries.
    * Layouts:
    *   `chrono:K`  — K files, contiguous chunks of the (ts, event_id)
    *                 sort: a chronological log replay whose boundaries
    *                 cut sessions and tie bursts mid-stream.
    *   `late:K:M`  — as `chrono:K`, but rows whose engine-shared
    *                 md5_63("late:" + event_id) ≡ 0 (mod 7) ARRIVE
    *                 M minutes after their event time (arrival order =
    *                 ts + delay): bounded lateness — at M = the 2-hour
    *                 watermark horizon, late rows land exactly AT the
    *                 watermark, the acceptance boundary every
    *                 watermarked operator must honor without dropping.
    * Never set outside the spec: Verify/Bench runs see the plain
    * single-staging path. The q132 `staged4Dir` is the fixed-shape
    * precedent; this generalizes it behind a test-only knob. */
  private[graft] val BatchingLayoutProp = "graft.stream.stage.layout"

  private def stream(spark: SparkSession, dir: String): DataFrame =
    sys.props.get(BatchingLayoutProp) match {
      case Some(layout) =>
        spark.readStream.schema(eventsSchema)
          .option("maxFilesPerTrigger", 1)
          .parquet(stagedChunkedDir(spark, dir, layout))
      case None =>
        spark.readStream.schema(eventsSchema).parquet(stagedDir(spark, dir))
    }

  /** Stage the events table as ordered chunk files for [[BatchingLayoutProp]]
    * (memoized per (session, layout, dir) like [[stagedDir]]). Chunk k's
    * modification time is staggered +2 s per chunk: the file streaming
    * source orders by (mtime, path), so explicit stamps make the replay
    * order deterministic rather than write-timing luck. The global
    * `ntile` sort is test-harness-scale machinery (fixture inputs),
    * never a production path. */
  private def stagedChunkedDir(spark: SparkSession, dir: String,
                               layout: String): String =
    graft.util.SessionMemo(spark, s"stream-stage-chunked:$layout:$dir") {
      val spec = layout.split(':')
      require(spec(0) == "chrono" || spec(0) == "late",
        s"unknown stream staging layout: $layout")
      val k = spec(1).toInt
      val delayNs =
        if (spec(0) == "late") spec(2).toLong * 60L * 1000000000L else 0L
      val arrival =
        if (delayNs == 0L) col("ts")
        else col("ts") + when(
          pmod(graft.functions.GraftFunctions.md5_63(
            concat(lit("late:"), col("event_id").cast("string"))), lit(7L))
            === 0L, lit(delayNs)).otherwise(lit(0L))
      val chunked = graft.io.Tables.events(spark, dir)
        .withColumn("__chunk", org.apache.spark.sql.functions.ntile(k).over(
          org.apache.spark.sql.expressions.Window
            .orderBy(arrival.asc, col("ts").asc, col("event_id").asc)))
      val d = Files.createTempDirectory("graft-stream-chunks")
      val staged = d.resolve("ev")
      Files.createDirectories(staged)
      val baseMtime = System.currentTimeMillis() - 3600000L
      (1 to k).foreach { i =>
        val tmp = d.resolve(s"tmp$i")
        chunked.filter(col("__chunk") === i).drop("__chunk")
          .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
        import scala.jdk.CollectionConverters._
        val ls = Files.list(tmp)
        val part =
          try ls.iterator().asScala.toSeq
            .find(_.getFileName.toString.endsWith(".parquet"))
          finally ls.close()
        part.foreach { p =>
          val target = staged.resolve(f"c$i%03d.parquet")
          Files.move(p, target, StandardCopyOption.REPLACE_EXISTING)
          Files.setLastModifiedTime(target,
            java.nio.file.attribute.FileTime.fromMillis(baseMtime + i * 2000L))
        }
      }
      graft.util.TempDirs.cleanupOnExit(d)
      staged.toString
    }

  /** q61 — the streaming hourly windowed aggregation, run to completion;
    * oracle identical to batch q12. Complete mode: a finite input never
    * closes its trailing watermarked windows in append mode. */
  val q61: Q = (spark, dir) => {
    val name = s"q61_out_${runId.incrementAndGet()}"
    EventStreams.runToMemory(spark,
      EventStreams.hourlyBuckets(stream(spark, dir)), name, OutputMode.Complete)
      .select("event_type", "bucket_s", "n", "total")
      .orderBy("event_type", "bucket_s")
  }

  /** q62 — the stateful streaming sessionization
    * (`flatMapGroupsWithState`), run to completion; final per-user state
    * (last Update-mode emission) must equal batch q11. */
  val q62: Q = (spark, dir) => {
    import spark.implicits._
    val name = s"q62_out_${runId.incrementAndGet()}"
    val events = stream(spark, dir)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[EventStreams.Event]
    EventStreams.runToMemory(spark,
      EventStreams.sessionize(events).toDF(), name, OutputMode.Update)
      .groupBy("user_id")
      .agg(max("n_events").as("n_events"), max("n_sessions").as("n_sessions"))
      .select("user_id", "n_events", "n_sessions")
      .orderBy("user_id")
  }

  /** q255 — q62's sessionization on Spark 4's `transformWithState`
    * arbitrary-state API ([[EventStreams.sessionizeTws]]): same fold,
    * same Update-mode emissions, same batch oracle — the point is API
    * coverage of the successor to `flatMapGroupsWithState` (named typed
    * state handles, RocksDB-only, per-state TTL, state schema
    * evolution), with the gate proving the migration is
    * semantics-preserving. The RocksDB provider is set for the run and
    * restored after (the API rejects the HDFS-backed default). */
  val q255: Q = (spark, dir) => {
    import spark.implicits._
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val name = s"q255_out_${runId.incrementAndGet()}"
      val events = stream(spark, dir)
        .select("event_id", "ts", "user_id", "event_type", "value")
        .as[EventStreams.Event]
      EventStreams.runToMemory(spark,
        EventStreams.sessionizeTws(events).toDF(), name, OutputMode.Update)
        .groupBy("user_id")
        .agg(max("n_events").as("n_events"),
          max("n_sessions").as("n_sessions"))
        .select("user_id", "n_events", "n_sessions")
        .orderBy("user_id")
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  /** q262 — streaming recent-activity feed ([[EventStreams.recentN]]):
    * each user's 5 most-recent event ids maintained in a
    * `transformWithState` ListState with a ValueState counter alongside
    * — the multi-handle composition fMGWS cannot express. Top-N under a
    * total order is a mergeable fold, so the final feed equals the
    * batch top-5 per user (the oracle); the monotone counter selects
    * the last emission. */
  val q262: Q = (spark, dir) => {
    import spark.implicits._
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val name = s"q262_out_${runId.incrementAndGet()}"
      val events = stream(spark, dir)
        .select("event_id", "ts", "user_id", "event_type", "value")
        .as[EventStreams.Event]
      val out = EventStreams.runToMemory(spark,
        EventStreams.recentN(events).toDF(), name, OutputMode.Update)
      out.withColumn("rk", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("user_id").orderBy(col("n_seen").desc)))
        .filter(col("rk") === 1)
        .select("user_id", "n_seen", "recent_csv")
        .orderBy("user_id")
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  /** q263 — streaming per-user event-type counters
    * ([[EventStreams.typeCounts]]): transformWithState MapState —
    * completing the q255/q262 state-type triple — gated against the
    * batch per-user pivot. Counting is a mergeable fold; the monotone
    * total selects the final emission. */
  val q263: Q = (spark, dir) => {
    import spark.implicits._
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val name = s"q263_out_${runId.incrementAndGet()}"
      val events = stream(spark, dir)
        .select("event_id", "ts", "user_id", "event_type", "value")
        .as[EventStreams.Event]
      EventStreams.runToMemory(spark,
        EventStreams.typeCounts(events).toDF(), name, OutputMode.Update)
        .withColumn("rk", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("user_id").orderBy(col("n_total").desc)))
        .filter(col("rk") === 1)
        .select("user_id", "n_total", "n_click", "n_view", "n_purchase",
          "n_signup", "n_error")
        .orderBy("user_id")
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  /** q266 — per-session rows via event-time TIMERS
    * ([[EventStreams.sessionEmit]]): closed-by-successor sessions emit
    * inline, the final hanging session per user emits when the
    * watermark passes its gap horizon through `handleExpiredTimer` —
    * the full timer API (register/delete/expire) under the oracle gate,
    * where q65's fMGWS only had blunt state timeouts. Append mode; on
    * the finite replay the no-data final micro-batch fires every
    * timer, so the emitted set equals the batch gaps-and-islands
    * decomposition exactly. */
  val q266: Q = (spark, dir) => {
    import spark.implicits._
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val name = s"q266_out_${runId.incrementAndGet()}"
      val events = stream(spark, dir)
        .withColumn("event_time", timestamp_micros(expr("ts div 1000")))
        .withWatermark("event_time", "2 hours")
        .select("event_id", "ts", "user_id", "event_type", "value",
          "event_time")
        .as[EventStreams.EventT]
      EventStreams.runToMemory(spark,
        EventStreams.sessionEmit(events).toDF(), name, OutputMode.Append)
        .select("user_id", "start_s", "end_s", "n_events")
        .orderBy("user_id", "start_s")
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  /** q63 — append-mode watermarked hourly windows: the scale-safe
    * production shape of q61. Append mode only emits a window once the
    * watermark passes its end, so state is bounded by the 2-hour
    * watermark horizon instead of holding every window ever seen
    * (Complete mode's unbounded-state posture — fine for a finite
    * harness, fatal on an unbounded stream). On a finite input the
    * emitted set is exactly the watermark-closed windows; the oracle is
    * batch q12 restricted to windows whose end ≤ final watermark
    * (max event time − 2 h). The trailing still-open windows are the
    * delta q61 covers. */
  val q63: Q = (spark, dir) => {
    val name = s"q63_out_${runId.incrementAndGet()}"
    EventStreams.runToMemory(spark,
      EventStreams.hourlyBuckets(stream(spark, dir)), name, OutputMode.Append)
      .select("event_type", "bucket_s", "n", "total")
      .orderBy("event_type", "bucket_s")
  }

  /** q64 — streaming exact dedup on (user_id, event_type): watermark-
    * bounded state (see [[EventStreams.dedupEvents]]); over the finite
    * input the emitted set equals the batch DISTINCT, which is the
    * oracle. */
  val q64: Q = (spark, dir) => {
    val name = s"q64_out_${runId.incrementAndGet()}"
    EventStreams.runToMemory(spark,
      EventStreams.dedupEvents(stream(spark, dir), Seq("user_id", "event_type")),
      name, OutputMode.Append)
      .select("user_id", "event_type")
      .orderBy("user_id", "event_type")
  }

  /** q65 — sessionization with EVENT-TIME state expiry: the scale-safe
    * form of q62 (a key's state dies once the watermark passes its last
    * event + 2 h, so the store holds only recently-active users). On the
    * finite replay the watermark only advances at the end, no state
    * expires mid-run, and the final per-user totals match q62's batch
    * oracle; mid-stream expiry semantics are spec-asserted with a
    * multi-batch MemoryStream (WatermarkSpec). */
  val q65: Q = (spark, dir) => {
    import spark.implicits._
    val name = s"q65_out_${runId.incrementAndGet()}"
    val events = stream(spark, dir)
      .withColumn("event_time", timestamp_micros(expr("ts div 1000")))
      .withWatermark("event_time", "2 hours")
      .select("event_id", "ts", "user_id", "event_type", "value", "event_time")
      .as[EventStreams.EventT]
    EventStreams.runToMemory(spark,
      EventStreams.sessionizeExpiring(events).toDF(),
      name, OutputMode.Update)
      .groupBy("user_id")
      .agg(max("n_events").as("n_events"), max("n_sessions").as("n_sessions"))
      .select("user_id", "n_events", "n_sessions")
      .orderBy("user_id")
  }

  /** q66 — stream-static enrichment join: the events stream joins the
    * static customer dimension (broadcast — stateless per micro-batch,
    * nothing accumulates for the join itself) and aggregates counts/sums
    * per (market segment, event type). Complete output mode is the
    * CORRECT state posture here, unlike q61's windowed case: the group
    * key space is a bounded product of two small dimensions, so the
    * state store is O(|segments| × |event types|) forever — the
    * canonical bounded-key running aggregate. */
  val q66: Q = (spark, dir) => {
    val name = s"q66_out_${runId.incrementAndGet()}"
    val cust = graft.io.Tables.customer(spark, dir)
      .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
    val enriched = stream(spark, dir)
      .join(broadcast(cust), "user_id")
      .groupBy("c_mktsegment", "event_type")
      .agg(count(lit(1)).as("n"),
        sum(qdec(col("value"), 18, 2)).cast("double").as("total"))
    EventStreams.runToMemory(spark, enriched, name, OutputMode.Complete)
      .select("c_mktsegment", "event_type", "n", "total")
      .orderBy("c_mktsegment", "event_type")
  }

  /** q81 — stream-stream interval join (click→purchase attribution within
    * a 24-hour lookback, [[EventStreams.clickAttribution]]): the
    * watermark + time-interval condition is what bounds BOTH join buffers
    * (state eviction horizon = watermark + lookback); run to completion
    * the emitted pairs equal the batch interval self-join, which is the
    * oracle. The lookback is sized to the synthetic stream's density
    * (~0.3 clicks/user/day — a 30-minute window almost never pairs). */
  val q81: Q = (spark, dir) => {
    val name = s"q81_out_${runId.incrementAndGet()}"
    EventStreams.runToMemory(spark,
      EventStreams.clickAttribution(stream(spark, dir), lookback = "24 hours"),
      name, OutputMode.Append)
      .select("purchase_id", "click_id", "user_id")
      .orderBy("purchase_id", "click_id")
  }

  /** q225 — stream-stream LEFT OUTER interval join
    * ([[EventStreams.clickAttributionLeftOuter]]): q81's attribution
    * plus the null-extended "unexplained purchase" rows the inner form
    * drops — the shape behind every streaming funnel-leak monitor. An
    * outer row is emitted only when the joint watermark CLOSES the
    * purchase's match window (state eviction), so the oracle is the
    * batch left join with its null rows restricted to
    * watermark-closed purchases; purchases still inside the trailing
    * horizon are (correctly) absent from a finite run. */
  val q225: Q = (spark, dir) => {
    val name = s"q225_out_${runId.incrementAndGet()}"
    EventStreams.runToMemory(spark,
      EventStreams.clickAttributionLeftOuter(stream(spark, dir),
        lookback = "24 hours"),
      name, OutputMode.Append)
      .select("purchase_id", "click_id", "user_id")
      .orderBy(col("purchase_id"), col("click_id").asc_nulls_first)
  }

  /** q237 — streaming HyperLogLog via the custom [[org.apache.spark.sql.graft.HllAgg]]
    * (p = 8): a Complete-mode aggregate whose state is a CONSTANT 256
    * bytes per group — the cheapest mergeable cardinality state in the
    * repo (KMV q188 holds 8 k) — with order-free updates and
    * associative merges, so the stream-final registers are bit-equal to
    * batch q234's whatever the micro-batch slicing, and the derived
    * V / Σ2^(56−M) / raw-estimate surface gates against the SAME DuckDB
    * oracle. The estimate math runs relationally on the emitted
    * register array (one shared formula, q234's). */
  val q237: Q = (spark, dir) => {
    val name = s"q237_out_${runId.incrementAndGet()}"
    val sketch = stream(spark, dir)
      .select(col("event_type"),
        graft.functions.GraftFunctions.md5_63(
          concat(lit("hll:"), col("user_id").cast("string"))).as("h"))
      .groupBy("event_type")
      .agg(graft.functions.GraftFunctions.hll_agg(col("h")).as("regs"))
    val sunk = EventStreams.runToMemory(spark, sketch, name,
      OutputMode.Complete)
    val exact = graft.io.Tables.events(spark, dir)
      .groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("n_exact"))
    sunk
      .select(col("event_type"), posexplode(col("regs")).as(Seq("bucket", "m")))
      .groupBy("event_type")
      .agg(sum(when(col("m") > 0, 1L).otherwise(0L)).as("n_present"),
        sum(expr("cast(shiftleft(cast(1 as bigint), 56 - m) as decimal(38,0))"))
          .cast("decimal(38,0)").as("s_fixed"))
      .withColumn("v_zero", (lit(256L) - col("n_present")).cast("long"))
      .withColumn("est_raw", graft.functions.GraftFunctions.qround(
        lit(0.7213 / (1.0 + 1.079 / 256.0)) * lit(65536.0) *
          lit(72057594037927936.0) / col("s_fixed").cast("double"), 6))
      .join(broadcast(exact), Seq("event_type"))
      .select(col("event_type"), col("n_present"), col("v_zero"),
        graft.functions.GraftFunctions.decFold(col("s_fixed"))
          .as("s_fixed"),
        col("est_raw"), col("n_exact"))
      .orderBy("event_type")
  }

  /** q92 — native `session_window` sessions over the BATCH events frame
    * ([[EventStreams.sessionWindowAgg]]): one row per (user, session)
    * with start, duration, event count. The oracle is the classic
    * gaps-and-islands rewrite; the boundary convention (an event at
    * exactly last+gap CONTINUES the session — touching windows merge,
    * measured on the gap_boundaries fuzz fixtures) is mirrored with the
    * strict `>` island test, the same convention as q11. */
  val q92: Q = (spark, dir) =>
    EventStreams.sessionWindowAgg(graft.io.Tables.events(spark, dir))
      .orderBy("user_id", "start_s")

  /** q93 — the streaming twin of q92 in append mode: Spark's NATIVE
    * session state (vs q62/q65's explicit flatMapGroupsWithState) — a
    * session emits once the watermark passes its end, so the state store
    * holds only open sessions within the watermark horizon. Oracle =
    * q92's islands restricted to watermark-closed sessions, same ms
    * arithmetic as q63. */
  val q93: Q = (spark, dir) => {
    val name = s"q93_out_${runId.incrementAndGet()}"
    EventStreams.runToMemory(spark,
      EventStreams.sessionWindowAgg(stream(spark, dir)),
      name, OutputMode.Append)
      .select("user_id", "start_s", "dur_us", "n")
      .orderBy("user_id", "start_s")
  }

  /** Streaming file source for the documents corpus (same staging
    * pattern as [[stagedDir]] for events). Handles BOTH physical
    * layouts of `documents.parquet`: the single file the test corpora
    * ship, and the Spark directory layout the fuzz fixtures write (a
    * flat `Files.copy` of a directory stages an empty dir — the
    * document-stream arm's fixtures would silently stream zero rows). */
  private def stagedDocsDir(spark: SparkSession, dir: String): String =
    graft.util.SessionMemo(spark, s"stream-docs-stage:$dir") {
      val d = Files.createTempDirectory("graft-stream-docs")
      val src = Paths.get(s"$dir/documents.parquet")
      if (Files.isDirectory(src)) {
        import scala.jdk.CollectionConverters._
        val ls = Files.list(src)
        try ls.iterator().asScala
          .filter(_.getFileName.toString.endsWith(".parquet"))
          .zipWithIndex.foreach { case (p, i) =>
            Files.copy(p, d.resolve(f"part$i%03d.parquet"),
              StandardCopyOption.REPLACE_EXISTING)
          }
        finally ls.close()
      } else Files.copy(src, d.resolve("documents.parquet"),
        StandardCopyOption.REPLACE_EXISTING)
      graft.util.TempDirs.cleanupOnExit(d)
      d.toString
    }

  /** q99 — INCREMENTAL near-duplicate detection: newly-ingested documents
    * (doc_id ≡ 3 mod 10, streamed from files) flagged against the LSH
    * index of the already-ingested corpus, entirely inside micro-batches.
    *
    * The stream side is stateless end-to-end — per-row signatures
    * ([[graft.text.TextAnalysis.minhashSignatureArray]], the q98 map
    * path), per-row band fingerprints, then two stream-static equi-joins
    * (band index, packed index signatures) and a per-row agreement fold.
    * No watermark, no state store: at 100 TB/day this ingests at file-
    * arrival rate with the static index as the only non-stream input
    * (rebuilt by a periodic batch compaction in production). A pair that
    * collides in several bands is emitted once per band (at-least-once);
    * the idempotent-sink `distinct` after run-to-completion is the
    * standard downstream dedup. Oracle: the batch LSH pipeline restricted
    * to stream×index pairs — stream-vs-batch agreement, gate-checked. */
  val q99: Q = (spark, dir) => {
    import graft.text.TextAnalysis
    val isStream = col("doc_id") % 10 === 3
    // Static index side: signatures of the already-ingested corpus,
    // banded + packed once per (session, dir).
    val idxSigs = TextQueries.sigsCached(spark, dir).filter(!isStream)
    val idxBands = graft.util.SessionMemo.cached(spark, s"neardup-idx-bands:$dir")(
      TextAnalysis.lshBands(idxSigs, "doc_id", rowsPerBand = 4)
        .withColumnRenamed("doc_id", "idx_id"))
    val idxPacked = graft.util.SessionMemo.cached(spark, s"neardup-idx-packed:$dir")(
      TextAnalysis.packedSignatures(idxSigs, "doc_id")
        .select(col("doc_id").as("idx_id"), col("sig").as("sig_i")))

    val docsSchema = graft.io.Tables.documents(spark, dir).schema
    val incoming = spark.readStream.schema(docsSchema)
      .parquet(stagedDocsDir(spark, dir))
      .filter(isStream)
    val flagged = TextAnalysis.lshBandsFromArray(
      TextAnalysis.minhashSignatureArray(incoming, "doc_id", "text",
        n = 3, numPerm = 16),
      "doc_id", numPerm = 16, rowsPerBand = 4)
      .join(idxBands, Seq("band", "band_sig"))
      .join(idxPacked, "idx_id")
      .withColumn("est_jaccard",
        expr("aggregate(zip_with(sig, sig_i, (x, y) -> IF(x = y, 1, 0)), 0, (a, v) -> a + v)")
          .cast("double") / lit(16.0))
      .filter(col("est_jaccard") >= 0.4)
      .select(least(col("doc_id"), col("idx_id")).as("id_a"),
        greatest(col("doc_id"), col("idx_id")).as("id_b"),
        col("est_jaccard"))

    val name = s"q99_out_${runId.incrementAndGet()}"
    EventStreams.runToMemory(spark, flagged, name, OutputMode.Append)
      .distinct() // at-least-once per band → idempotent-sink dedup
      .orderBy("id_a", "id_b")
  }

  /** q102 — streaming count-min sketch: the event stream's item keys
    * update depth×width cells in a Complete-mode aggregate. The state IS
    * the sketch — depth·width rows regardless of key cardinality, the
    * bounded-state answer to "frequency over an unbounded key space"
    * where a per-key streaming count grows without limit. Cells use the
    * same keyed-md5 hashing as batch q48, so the oracle (batch-computed
    * cells over the same events) gates the stream EXACTLY — and because
    * cell updates are associative sums, the same query shape merges
    * shard-local sketches on a real cluster. */
  val q102: Q = (spark, dir) => {
    val name = s"q102_out_${runId.incrementAndGet()}"
    val keyed = stream(spark, dir)
      .select(get_json_object(col("props"), "$.k").as("k"))
      .filter(col("k").isNotNull)
      .select(col("k"),
        explode(array((0 until 4).map(lit): _*)).as("r"))
      .withColumn("b", pmod(
        graft.functions.GraftFunctions.md5_63(
          concat(col("r").cast("string"), lit(":"), col("k"))),
        lit(64L)))
    EventStreams.runToMemory(spark,
      keyed.groupBy("r", "b").agg(count(lit(1)).as("cell")),
      name, OutputMode.Complete)
      .select(col("r").cast("long").as("r"), col("b"), col("cell"))
      .orderBy("r", "b")
  }

  /** q112 — streaming CDC log compaction (see [[EventStreams
    * .compactLatest]]): the maintained last-write-wins per-user view of
    * the event change stream, winner chosen by change order
    * (ts, event_id) so arrival order is irrelevant. Update-mode
    * emissions accumulate in the foreachBatch PARQUET sink (one maintained
    * row per user is production-shaped state — never driver-materialized);
    * the per-key FINAL state is the struct-max on the monotone change
    * counter. Oracle = the batch `row_number() = 1` latest-change view —
    * stream/batch equality is the compaction correctness property. */
  val q112: Q = (spark, dir) => {
    import spark.implicits._
    val events = stream(spark, dir)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[EventStreams.Event]
    EventStreams.runToParquet(spark,
      EventStreams.compactLatest(events).toDF(), OutputMode.Update)
      .groupBy("user_id")
      .agg(max(struct(col("n_changes"), col("last_s"), col("last_event_id"),
        col("last_event_type"), col("last_value"))).as("fin"))
      .select(col("user_id"), col("fin.last_s").as("last_s"),
        col("fin.last_event_id").as("last_event_id"),
        col("fin.last_event_type").as("last_event_type"),
        col("fin.last_value").as("last_value"),
        col("fin.n_changes").as("n_changes"))
      .orderBy("user_id")
  }

  /** 4-file staged copy of the events table (hash-split on event_id):
    * with `maxFilesPerTrigger = 1` the stream runs FOUR genuine
    * micro-batches, so q132's per-batch merge is exercised for real —
    * a single staged file would collapse to one batch and never merge.
    * Memoized per (session, dir) like [[stagedDir]]. */
  private def staged4Dir(spark: SparkSession, dir: String): String =
    graft.util.SessionMemo(spark, s"stream-stage4:$dir") {
      val d = Files.createTempDirectory("graft-stream-src4")
      graft.io.Tables.events(spark, dir)
        .repartition(4, col("event_id"))
        .write.mode("overwrite").parquet(d.resolve("ev").toString)
      graft.util.TempDirs.cleanupOnExit(d)
      d.resolve("ev").toString
    }

  /** q132 — streaming incremental materialized-view maintenance (see
    * [[EventStreams.maintainIncrementalMv]]): the per-(event_type, day)
    * count/sum/min/max view maintained across four micro-batches by
    * algebraic partial merge — the streaming twin of q103, and the
    * foreachBatch + MERGE INTO shape of every lakehouse streaming MV.
    * The oracle recomputes from scratch over all events: equality proves
    * the maintained view is independent of micro-batch slicing. */
  val q132: Q = (spark, dir) => {
    val s = spark.readStream.schema(eventsSchema)
      .option("maxFilesPerTrigger", 1)
      .parquet(staged4Dir(spark, dir))
      .withColumn("day", expr("ts div 86400000000000"))
    EventStreams.maintainIncrementalMv(s, Seq("event_type", "day"),
        col("value"))
      .select(col("event_type"), col("day"), col("n"),
        col("s").cast("double").as("sum_value"),
        col("mn").cast("double").as("min_value"),
        col("mx").cast("double").as("max_value"))
      .orderBy("event_type", "day")
  }

  /** q120 — streaming distribution-drift monitor: each hourly window's
    * value histogram scored against the GLOBAL reference distribution
    * with the q115 smoothed-PSI formula — the live "did traffic shift
    * this hour?" alarm. The STREAMING state is the watermark-less
    * Complete-mode (window, bin) count table — fixed-size: windows ×
    * bins, independent of event volume (the mergeable-histogram
    * property); the PSI arithmetic is a tiny batch transform on the
    * sink (Spark disallows joins after streaming aggregations, and the
    * reference frame is static anyway). Oracle = the identical batch
    * computation. */
  val q120: Q = (spark, dir) => {
    val name = s"q120_out_${runId.incrementAndGet()}"
    val binned = stream(spark, dir)
      .withColumn("event_time", timestamp_micros(expr("ts div 1000")))
      .groupBy(window(col("event_time"), "1 hour"),
        floor(col("value") / 10).cast("long").as("bin"))
      .agg(count(lit(1)).as("n"))
      .select(unix_timestamp(col("window.start")).as("win_s"),
        col("bin"), col("n"))
    val winBins = EventStreams.runToMemory(spark, binned, name,
      OutputMode.Complete)
    // Post-sink batch scoring against the static global reference.
    val ref = graft.io.Tables.events(spark, dir)
      .groupBy(floor(col("value") / 10).cast("long").as("bin"))
      .agg(count(lit(1)).as("n_ref"))
    val refTot = ref.agg(count(lit(1)).as("nbins"),
      sum(col("n_ref")).as("tot_ref"))
    val grid = winBins.select("win_s").distinct()
      .crossJoin(ref.select("bin", "n_ref"))
      .join(winBins, Seq("win_s", "bin"), "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
    val winTot = grid.groupBy("win_s").agg(sum(col("n")).as("tot_win"))
    val p = (col("n") + lit(1.0)) / (col("tot_win") + col("nbins"))
    val q = (col("n_ref") + lit(1.0)) / (col("tot_ref") + col("nbins"))
    grid.join(winTot, "win_s").crossJoin(broadcast(refTot))
      .withColumn("contrib", (p - q) * log(p / q))
      .groupBy("win_s")
      .agg(max(col("tot_win")).as("n_events"),
        qround(sum(col("contrib")), 6).as("psi"))
      .orderBy("win_s")
  }

  /** q169 — stream-static model serving: the q162 Naive Bayes model is
    * fit ONCE on the static train split, then the held-out documents
    * arrive as a file stream and are scored inside micro-batches — the
    * token join against the static likelihood table and the
    * per-(doc, class) posterior aggregation run IN the stream
    * (Complete mode; decimal-exact, so micro-batch slicing cannot
    * change a score); only the tiny per-doc argmax + confusion rollup
    * happens on the materialized result. Oracle: identical to batch
    * q162 — the defining agreement property. */
  val q169: Q = (spark, dir) => {
    val docs = graft.io.Tables.documents(spark, dir)
    val m = graft.util.SessionMemo(spark, s"nb-model:$dir")(
      graft.text.NaiveBayes.fit(
        docs.filter(col("doc_id") % 5 =!= 0), "doc_id", "text", "lang"))
    val incoming = spark.readStream.schema(docs.schema)
      .parquet(stagedDocsDir(spark, dir))
      .filter(col("doc_id") % 5 === 0)
    val scored = graft.text.NaiveBayes.posteriors(
      m, incoming, "doc_id", "text", "lang")
    val name = s"q169_out_${runId.incrementAndGet()}"
    val sunk = EventStreams.runToMemory(spark, scored, name,
      OutputMode.Complete)
    graft.text.NaiveBayes.argmax(sunk, "doc_id")
      .groupBy("truth", "predicted")
      .agg(count(lit(1)).as("n_docs"))
      .orderBy("truth", "predicted")
  }

  /** q182 — the q176 clamped-ledger fold as a STATEFUL stream
    * ([[EventStreams.clampedBalanceStream]]): exact-BigDecimal state
    * per user, Update-mode running emissions, final state per user
    * (the max-n_events row) must equal batch q176 bit-for-bit — same
    * oracle. */
  val q182: Q = (spark, dir) => {
    import spark.implicits._
    val ev = stream(spark, dir)
      .filter(col("event_type").isin("purchase", "error"))
      .select(col("user_id"), col("ts"), col("event_id"),
        // Same IEEE cents quantization as batch q176 — the shared oracle
        // demands the two paths ingest bit-identical deltas.
        when(col("event_type") === "purchase",
          graft.functions.GraftFunctions.qdec(col("value"), 18, 2))
          .otherwise(
            -graft.functions.GraftFunctions.qdec(col("value"), 18, 2))
          .as("delta"))
      .as[EventStreams.LedgerEvent]
    // Per-user exact-decimal ledger state is production-shaped (one row
    // per user per update): drive through the foreachBatch parquet sink,
    // never the driver-materializing memory sink.
    val sunk = EventStreams.runToParquet(spark,
      EventStreams.clampedBalanceStream(ev).toDF(), OutputMode.Update)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(desc("n_events"))
    sunk.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("user_id"), col("n_events"), col("n_clamped"),
        graft.functions.GraftFunctions.decOut(col("final_balance"), 2)
          .as("final_balance"))
      .orderBy("user_id")
  }

  /** q188 — streaming KMV distinct-count sketch: batch q187's
    * cardinality sketch maintained INCREMENTALLY over the event stream
    * by the custom [[org.apache.spark.sql.graft.KmvAgg]] aggregate.
    * KmvAgg's SET semantics absorb duplicate keys in-place, so the raw
    * stream needs no distinct pre-shuffle and the Complete-mode state
    * is exactly 64 longs per event_type — fixed-size regardless of
    * stream length or key cardinality, the defining property that makes
    * approximate cardinality streamable where exact count-distinct's
    * state grows with the key universe. The exact count and estimate
    * arithmetic run as a post-sink batch transform on the 5-row final
    * (the q120 pattern); the oracle is the SAME SQL as batch q187 —
    * stream-final sketch == batch sketch, bit for bit. */
  val q188: Q = (spark, dir) => {
    val name = s"q188_out_${runId.incrementAndGet()}"
    val k = 64
    val sketch = stream(spark, dir)
      .select(col("event_type"),
        graft.functions.GraftFunctions.md5_63(
          concat(lit("kmv:"), col("user_id").cast("string"))).as("h"))
      .groupBy("event_type")
      .agg(graft.functions.GraftFunctions.kmv_agg(col("h"), k).as("mins"))
    val sunk = EventStreams.runToMemory(spark, sketch, name,
      OutputMode.Complete)
    val exact = graft.io.Tables.events(spark, dir)
      .groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("n_exact"))
    sunk
      .select(col("event_type"),
        size(col("mins")).cast("long").as("n_kept"),
        element_at(col("mins"), size(col("mins"))).as("kth_hash"))
      .join(exact, "event_type")
      .select(col("event_type"), col("n_exact"), col("n_kept"),
        col("kth_hash"),
        when(col("n_kept") < k, col("n_exact"))
          .otherwise(OlapQueries.kmvEstimate).as("est_distinct"))
      .orderBy("event_type")
  }

  /** q203 — streaming bottom-k-sample QUANTILE sketch: batch q194's
    * per-group uniform sample maintained incrementally by the bounded-
    * heap [[org.apache.spark.sql.graft.TopKAgg]] over struct
    * (hash, event_id, value) — k smallest keyed hashes survive, each
    * carrying its value payload, so Complete-mode state is exactly
    * k structs per event_type regardless of stream length (the KMV
    * argument, extended from cardinality to quantiles; no set semantics
    * needed because event_id makes the rank key unique). Sample order
    * statistics run as a post-sink batch transform on the k-row final;
    * the oracle is batch q194's sample half — stream-final sketch ==
    * batch sketch, element for element. Completes the streaming sketch
    * family: frequency (q102 CMS), cardinality (q188 KMV), quantiles. */
  val q203: Q = (spark, dir) => {
    val name = s"q203_out_${runId.incrementAndGet()}"
    val k = 256
    val sk = stream(spark, dir)
      .select(col("event_type"), struct(
        graft.functions.GraftFunctions.md5_63(
          concat(lit("qsk:"), col("event_id").cast("string"))).as("h"),
        col("event_id"),
        qdec(col("value"), 18, 2).as("v")).as("s"))
      .groupBy("event_type")
      .agg(graft.functions.GraftFunctions.topk_agg(col("s"), k).as("samp"))
    val sunk = EventStreams.runToMemory(spark, sk, name,
      OutputMode.Complete)
    val ex = sunk
      .select(col("event_type"), explode(col("samp")).as("e"))
      .select(col("event_type"), col("e.v").as("v"),
        col("e.event_id").as("event_id"))
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    ex.withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("event_type").orderBy("v", "event_id"))
        .cast("long"))
      .withColumn("n_s", count(lit(1)).over(wAll))
      .groupBy("event_type")
      .agg(max(col("n_s")).as("n_sample"),
        graft.functions.GraftFunctions.decOut(
          min(when(col("rk") >= expr("(n_s + 1) div 2"), col("v"))), 2)
          .as("est_p50"),
        graft.functions.GraftFunctions.decOut(
          min(when(col("rk") >= expr("(n_s * 9 + 9) div 10"), col("v"))),
          2).as("est_p90"),
        graft.functions.GraftFunctions.decOut(
          min(when(col("rk") >= expr("(n_s * 99 + 99) div 100"),
            col("v"))), 2).as("est_p99"))
      .orderBy("event_type")
  }

  /** q213 — stream-static anomaly scoring: q126's robust med/MAD stats
    * fit ONCE batch-side, broadcast into the stream (a stateless
    * stream-static join — no state store growth), every event scored
    * with the identical rounded robust-z, anomaly counts aggregated per
    * type in Complete mode (state = |types| rows). The q169 serving
    * pattern applied to monitoring: model statics + streaming facts;
    * the oracle is the equivalent batch aggregation, so stream-final
    * counts equal the batch scorer exactly. */
  val q213: Q = (spark, dir) => {
    val name = s"q213_out_${runId.incrementAndGet()}"
    val ev = graft.io.Tables.events(spark, dir)
      .select(col("event_type"), col("value"))
    val med = ev.groupBy("event_type")
      .agg(qround(expr("percentile(value, 0.5D)"), 6).as("med"))
    val dev = ev.join(broadcast(med), "event_type")
      .withColumn("adev", abs(col("value") - col("med")))
    val stats = dev.groupBy("event_type")
      .agg(qround(expr("percentile(adev, 0.5D)"), 6).as("mad"))
      .join(med, "event_type")
    val scored = stream(spark, dir)
      .select(col("event_type"), col("value"))
      .join(broadcast(stats), "event_type")
      .withColumn("rz",
        qround(lit(0.6745) * (col("value") - col("med")) / col("mad"), 6))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        sum(when(abs(col("rz")) >= 3.5, 1L).otherwise(0L))
          .as("n_anomalies"))
    EventStreams.runToMemory(spark, scored, name, OutputMode.Complete)
      .orderBy("event_type")
  }

  /** q296 — event-time disorder / watermark-lateness profile: how late
    * do events arrive relative to the maximum event time already seen
    * in their key's stream (arrival order = event_id, the generation
    * sequence)? The p50/p95/p99/max lateness distribution is THE
    * statistic that calibrates `withWatermark`'s delay — a watermark at
    * the p99 bounds state while losing ≤1 % of late events. Scoped
    * PER USER deliberately: a global running max is inherently
    * sequential (one-partition window — the anti-pattern), while
    * per-key disorder partitions on user_id AND is what per-key
    * streaming state actually experiences. Percentiles walk the
    * seconds-histogram (q185's trick — |distinct lateness values|
    * rows), all integer end-to-end. */
  val q296: Q = (spark, dir) => {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("event_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, org.apache.spark.sql.expressions.Window
        .currentRow)
    val lat = graft.io.Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("ts"))
      .withColumn("runmax", max(col("ts")).over(w))
      .withColumn("late_s", expr("(runmax - ts) div 1000000000"))
    val hist = lat.groupBy("late_s").agg(count(lit(1)).as("c"))
    val wc = org.apache.spark.sql.expressions.Window.orderBy("late_s")
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, org.apache.spark.sql.expressions.Window
        .currentRow)
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy(lit(1))
    hist.withColumn("cum", sum(col("c")).over(wc))
      .withColumn("tot", sum(col("c")).over(wAll))
      .agg(max(col("tot")).as("n_events"),
        sum(when(col("late_s") === 0, col("c")).otherwise(0L))
          .as("n_on_time"),
        min(when(col("cum") * 2 >= col("tot"), col("late_s")))
          .as("p50_late_s"),
        min(when(col("cum") * 20 >= col("tot") * 19, col("late_s")))
          .as("p95_late_s"),
        min(when(col("cum") * 100 >= col("tot") * 99, col("late_s")))
          .as("p99_late_s"),
        max(col("late_s")).as("max_late_s"))
  }

  /** q315 — STREAMING sample-ratio-mismatch monitor: q308's
    * certification computed ON the stream, so a broken assignment or a
    * logging pipeline dropping one arm is caught while the experiment
    * runs — not at read time, after the damage. Per-cohort distinct
    * users via streaming dropDuplicates (state = one key per
    * (type, user); production bounds it with the q64 watermark
    * horizon), the canonical [[graft.functions.GraftFunctions.abVariant]]
    * split, Complete-mode counts; the chi-square and flag are scalar
    * math on the groups-sized result. Gated against q308's EXACT batch
    * oracle — the stream must converge to the batch certification. */
  val q315: Q = (spark, dir) => {
    val name = s"q315_out_${runId.incrementAndGet()}"
    val cohorts = stream(spark, dir)
      .select(col("event_type"), col("user_id"))
      .dropDuplicates("event_type", "user_id")
      .withColumn("variant",
        graft.functions.GraftFunctions.abVariant(col("user_id")))
      .groupBy("event_type")
      .agg(sum(when(col("variant") === "A", 1L).otherwise(0L)).as("n_a"),
        sum(when(col("variant") === "B", 1L).otherwise(0L)).as("n_b"))
    val (chi2, flag) = graft.functions.GraftFunctions.srmColumns(
      col("n_a"), col("n_b"))
    EventStreams.runToMemory(spark, cohorts, name, OutputMode.Complete)
      .select(col("event_type"), col("n_a"), col("n_b"),
        chi2.as("chi2"), flag.as("srm_flag"))
      .orderBy("event_type")
  }

  /** q340 — streaming OHLC (candlestick) aggregation: per (event_type,
    * hour) the opening value (first by event time, event_id tiebreak),
    * close (last), high, low, and count — the market-data shape every
    * metrics pipeline reuses for "first/last reading per window".
    * open/close ride `min_by`/`max_by` over a (ts, event_id) struct —
    * DECLARATIVE aggregates, so the streaming state per group is one
    * (value, key) pair, mergeable across micro-batches, never a buffered
    * window. Values are exact integer cents; the whole output surface is
    * BIGINT. Complete mode (finite input never closes trailing
    * watermarked windows in append); oracle = the identical batch SQL
    * with row_number endpoints. */
  val q340: Q = (spark, dir) => {
    val name = s"q340_out_${runId.incrementAndGet()}"
    val src = stream(spark, dir)
      .withColumn("cents", floor(col("value") * 100.0 + lit(0.5)))
      .withColumn("bucket_s", expr("(ts div 1000000000) div 3600 * 3600"))
    val agg = src.groupBy("event_type", "bucket_s")
      .agg(count(lit(1)).as("n"),
        min_by(col("cents"), struct(col("ts"), col("event_id")))
          .as("open_cents"),
        max_by(col("cents"), struct(col("ts"), col("event_id")))
          .as("close_cents"),
        max(col("cents")).as("high_cents"),
        min(col("cents")).as("low_cents"))
    EventStreams.runToMemory(spark, agg, name, OutputMode.Complete)
      .select("event_type", "bucket_s", "n", "open_cents", "close_cents",
        "high_cents", "low_cents")
      .orderBy("event_type", "bucket_s")
  }

  val queries: Map[String, Q] = Map(
    "q340_stream_ohlc" -> q340,
    "q315_stream_srm" -> q315,
    "q296_watermark_lateness" -> q296,
    "q213_stream_anomaly" -> q213,
    "q203_stream_quantiles" -> q203,
    "q188_stream_kmv" -> q188,
    "q182_stream_ledger" -> q182,
    "q169_stream_classify" -> q169,
    "q102_stream_heavy_hitters" -> q102,
    "q112_stream_compact" -> q112,
    "q132_stream_incremental_mv" -> q132,
    "q120_stream_drift" -> q120,
    "q81_stream_attribution" -> q81,
    "q225_stream_left_outer" -> q225,
    "q237_stream_hll" -> q237,
    "q92_session_windows" -> q92,
    "q93_stream_session_windows" -> q93,
    "q99_stream_neardup" -> q99,
    "q61_stream_hourly" -> q61,
    "q62_stream_sessions" -> q62,
    "q255_stream_sessions_tws" -> q255,
    "q262_stream_recent_feed" -> q262,
    "q263_stream_type_counts" -> q263,
    "q266_stream_session_rows" -> q266,
    "q63_stream_hourly_append" -> q63,
    "q64_stream_dedup" -> q64,
    "q65_stream_sessions_expiring" -> q65,
    "q66_stream_enrich" -> q66)

  // Island test is STRICT >: session_window merges windows that overlap
  // or touch, so an event at exactly last + gap continues the session —
  // measured on the stream fuzz gate's gap_boundaries fixtures (the old
  // `>=` encoded a strict-< boundary the operator does not have; the
  // tie-free sf corpus never exposed the difference). Same convention
  // as q11's sessionize gap test.
  private val sessionIslandsCte =
    """x AS (SELECT user_id, epoch_ns(ts) // 1000 AS t_us FROM events),
      |y AS (
      |  SELECT user_id, t_us,
      |    CASE WHEN lag(t_us) OVER w IS NULL
      |           OR t_us - lag(t_us) OVER w > 1800000000
      |         THEN 1 ELSE 0 END AS new_sess
      |  FROM x WINDOW w AS (PARTITION BY user_id ORDER BY t_us)),
      |z AS (
      |  SELECT user_id, t_us,
      |    SUM(new_sess) OVER (PARTITION BY user_id ORDER BY t_us
      |      ROWS UNBOUNDED PRECEDING) AS sess_id
      |  FROM y)""".stripMargin

  val oracles: Map[String, String] = Map(
    "q340_stream_ohlc" ->
      """WITH e AS (
        |  SELECT event_type, epoch_ns(ts) AS t, event_id,
        |    CAST(floor("value" * 100.0 + 0.5) AS BIGINT) AS cents
        |  FROM events),
        |b AS (
        |  SELECT event_type, (t // 1000000000) // 3600 * 3600 AS bucket_s,
        |    t, event_id, cents
        |  FROM e),
        |r AS (
        |  SELECT *,
        |    row_number() OVER (PARTITION BY event_type, bucket_s
        |      ORDER BY t, event_id) AS rn_a,
        |    row_number() OVER (PARTITION BY event_type, bucket_s
        |      ORDER BY t DESC, event_id DESC) AS rn_d
        |  FROM b)
        |SELECT event_type, CAST(bucket_s AS BIGINT) AS bucket_s,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(MAX(CASE WHEN rn_a = 1 THEN cents END) AS BIGINT)
        |    AS open_cents,
        |  CAST(MAX(CASE WHEN rn_d = 1 THEN cents END) AS BIGINT)
        |    AS close_cents,
        |  CAST(MAX(cents) AS BIGINT) AS high_cents,
        |  CAST(MIN(cents) AS BIGINT) AS low_cents
        |FROM r GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // The stream must converge to the batch certification: same oracle,
    // by reference, as the batch q308 — agreement with batch semantics
    // is THE correctness property of the incremental form.
    "q315_stream_srm" -> OlapQueries.oracles("q308_srm_check"),
    "q296_watermark_lateness" ->
      """WITH l AS (
        |  SELECT user_id, event_id, epoch_ns(ts) AS tns,
        |    MAX(epoch_ns(ts)) OVER (PARTITION BY user_id ORDER BY event_id
        |      ROWS UNBOUNDED PRECEDING) AS runmax
        |  FROM events),
        |d AS (SELECT (runmax - tns) // 1000000000 AS late_s FROM l),
        |h AS (SELECT late_s, count(*) AS c FROM d GROUP BY 1),
        |w AS (
        |  SELECT late_s, c,
        |    SUM(c) OVER (ORDER BY late_s ROWS UNBOUNDED PRECEDING) AS cum,
        |    SUM(c) OVER () AS tot
        |  FROM h)
        |SELECT CAST(MAX(tot) AS BIGINT) AS n_events,
        |  CAST(SUM(CASE WHEN late_s = 0 THEN c ELSE 0 END) AS BIGINT)
        |    AS n_on_time,
        |  CAST(MIN(CASE WHEN cum * 2 >= tot THEN late_s END) AS BIGINT)
        |    AS p50_late_s,
        |  CAST(MIN(CASE WHEN cum * 20 >= tot * 19 THEN late_s END)
        |    AS BIGINT) AS p95_late_s,
        |  CAST(MIN(CASE WHEN cum * 100 >= tot * 99 THEN late_s END)
        |    AS BIGINT) AS p99_late_s,
        |  CAST(MAX(late_s) AS BIGINT) AS max_late_s
        |FROM w""".stripMargin,
    // Stream-final anomaly counts == the equivalent batch scorer (same
    // med/MAD statics, same rounded robust-z, same threshold).
    "q213_stream_anomaly" ->
      """WITH ev AS (SELECT event_type, value FROM events),
        |med AS (SELECT event_type,
        |          floor((quantile_cont(value, 0.5)) * 1000000.0 + 0.5)
        |            / 1000000.0 AS med
        |        FROM ev GROUP BY 1),
        |dev AS (SELECT e.event_type, e.value, m.med,
        |          abs(e.value - m.med) AS adev
        |        FROM ev e JOIN med m USING (event_type)),
        |mad AS (SELECT event_type,
        |          floor((quantile_cont(adev, 0.5)) * 1000000.0 + 0.5)
        |            / 1000000.0 AS mad
        |        FROM dev GROUP BY 1)
        |SELECT d.event_type, CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(SUM(CASE WHEN abs(floor((0.6745 * (d.value - d.med)
        |      / m.mad) * 1000000.0 + 0.5) / 1000000.0) >= 3.5
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies
        |FROM dev d JOIN mad m USING (event_type)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // The stream-final bottom-k sample must equal batch q194's sample
    // half exactly (same hash, same k, same order statistics).
    "q203_stream_quantiles" ->
      """WITH r AS (
        |  SELECT event_type, event_id,
        |    CAST(floor(value * 100.0 + 0.5) / 100.0 AS DECIMAL(18,2)) AS v,
        |    CAST(md5_number_lower('qsk:' || event_id::VARCHAR)
        |      & 9223372036854775807 AS BIGINT) AS h
        |  FROM events),
        |s1 AS (
        |  SELECT event_type, v, event_id,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY h, event_id) AS rn
        |  FROM r),
        |s2 AS (
        |  SELECT event_type, v,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY v, event_id) AS rk,
        |    COUNT(*) OVER (PARTITION BY event_type) AS n_s
        |  FROM s1 WHERE rn <= 256)
        |SELECT event_type, CAST(MAX(n_s) AS BIGINT) AS n_sample,
        |  floor(CAST(MIN(CASE WHEN rk >= (n_s + 1) // 2 THEN v END)
        |    AS DOUBLE) * 100.0 + 0.5) / 100.0 AS est_p50,
        |  floor(CAST(MIN(CASE WHEN rk >= (n_s * 9 + 9) // 10 THEN v END)
        |    AS DOUBLE) * 100.0 + 0.5) / 100.0 AS est_p90,
        |  floor(CAST(MIN(CASE WHEN rk >= (n_s * 99 + 99) // 100 THEN v
        |    END) AS DOUBLE) * 100.0 + 0.5) / 100.0 AS est_p99
        |FROM s2 GROUP BY 1 ORDER BY 1""".stripMargin,
    // The stream-final KMV sketch must equal batch q187 exactly.
    "q188_stream_kmv" -> OlapQueries.oracles("q187_kmv_distinct"),
    // bit-identical registers => the batch q234 oracle verifies the stream
    "q237_stream_hll" -> OlapQueries.oracles("q234_hll_oracle"),
    // The stream-served classifier must equal batch q162 exactly.
    "q169_stream_classify" -> TextQueries.oracles("q162_naive_bayes"),
    // The streamed ledger's final state must equal batch q176 exactly.
    "q182_stream_ledger" ->
      AnalyticsQueries.oracles("q176_clamped_balance"),
    // From-scratch batch aggregation over ALL events: the maintained
    // MV must equal it regardless of micro-batch slicing.
    "q132_stream_incremental_mv" ->
      """SELECT event_type, epoch_ns(ts) // 86400000000000 AS day,
        |       CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(CAST(floor(value * 100.0 + 0.5) / 100.0 AS DECIMAL(18,2))) AS DOUBLE)
        |         AS sum_value,
        |       CAST(min(CAST(floor(value * 100.0 + 0.5) / 100.0 AS DECIMAL(18,2))) AS DOUBLE)
        |         AS min_value,
        |       CAST(max(CAST(floor(value * 100.0 + 0.5) / 100.0 AS DECIMAL(18,2))) AS DOUBLE)
        |         AS max_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // Batch-computed per-window PSI against the global reference — the
    // stream's Complete-mode histogram must land on identical counts.
    "q120_stream_drift" ->
      """WITH e AS (SELECT (epoch_ns(ts) // 1000000000) // 3600 * 3600
        |             AS win_s,
        |           CAST(floor(value / 10) AS BIGINT) AS bin FROM events),
        |wb AS (SELECT win_s, bin, CAST(count(*) AS BIGINT) AS n
        |       FROM e GROUP BY 1, 2),
        |ref AS (SELECT bin, CAST(count(*) AS BIGINT) AS n_ref
        |        FROM e GROUP BY 1),
        |rt AS (SELECT CAST(count(*) AS BIGINT) AS nbins,
        |              CAST(sum(n_ref) AS BIGINT) AS tot_ref FROM ref),
        |wins AS (SELECT DISTINCT win_s FROM wb),
        |grid AS (SELECT w.win_s, r.bin, r.n_ref, coalesce(wb.n, 0) AS n
        |         FROM wins w CROSS JOIN ref r
        |         LEFT JOIN wb ON wb.win_s = w.win_s AND wb.bin = r.bin),
        |wt AS (SELECT win_s, CAST(sum(n) AS BIGINT) AS tot_win
        |       FROM grid GROUP BY 1),
        |c AS (SELECT g.win_s, wt.tot_win,
        |        ((g.n + 1.0) / (wt.tot_win + rt.nbins)
        |          - (g.n_ref + 1.0) / (rt.tot_ref + rt.nbins))
        |        * ln(((g.n + 1.0) / (wt.tot_win + rt.nbins))
        |             / ((g.n_ref + 1.0) / (rt.tot_ref + rt.nbins)))
        |          AS contrib
        |      FROM grid g JOIN wt ON wt.win_s = g.win_s CROSS JOIN rt)
        |SELECT win_s, max(tot_win) AS n_events,
        |       floor((sum(contrib)) * 1000000.0 + 0.5) / 1000000.0 AS psi
        |FROM c GROUP BY 1 ORDER BY 1""".stripMargin,
    // Batch latest-change view: the stream's compacted state must equal
    // the row_number()=1 pick in change order.
    "q112_stream_compact" ->
      """WITH e AS (SELECT user_id, epoch_ns(ts) AS t, event_id,
        |                  event_type, value FROM events),
        |r AS (SELECT user_id, t, event_id, event_type, value,
        |        row_number() OVER (PARTITION BY user_id
        |                           ORDER BY t DESC, event_id DESC) AS rn,
        |        CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT)
        |          AS n_changes
        |      FROM e)
        |SELECT user_id, CAST(t // 1000000000 AS BIGINT) AS last_s,
        |       event_id AS last_event_id, event_type AS last_event_type,
        |       value AS last_value, n_changes
        |FROM r WHERE rn = 1 ORDER BY user_id""".stripMargin,
    // Batch-computed CMS cells over the same events: stream-final state
    // must equal the batch sketch (associative cell sums).
    "q102_stream_heavy_hitters" ->
      """WITH k AS (
        |  SELECT json_extract_string(props, '$.k') AS k FROM events
        |  WHERE json_extract_string(props, '$.k') IS NOT NULL)
        |SELECT r, ((md5_number_lower(r::VARCHAR || ':' || k)
        |            & 9223372036854775807)::BIGINT % 64) AS b,
        |       CAST(count(*) AS BIGINT) AS cell
        |FROM k CROSS JOIN generate_series(0, 3) g(r)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // The batch LSH pipeline (same band prefix as q27's oracle)
    // restricted to stream-side × index-side candidate pairs: the
    // incremental flagger must agree with what a batch re-run would say.
    "q99_stream_neardup" ->
      s"""WITH ${TextQueries.lshBandsCte},
         |cands AS (
         |  SELECT DISTINCT s.doc_id AS id_s, i.doc_id AS id_i
         |  FROM bands s JOIN bands i USING (band, band_sig)
         |  WHERE s.doc_id % 10 = 3 AND i.doc_id % 10 != 3),
         |est AS (
         |  SELECT id_s, id_i,
         |    CAST(SUM(CASE WHEN sa.mh = sb.mh THEN 1 ELSE 0 END) AS DOUBLE) / 16.0 AS est_jaccard
         |  FROM cands
         |  JOIN sigs sa ON sa.doc_id = id_s
         |  JOIN sigs sb ON sb.doc_id = id_i AND sb.p = sa.p
         |  GROUP BY id_s, id_i)
         |SELECT least(id_s, id_i) AS id_a, greatest(id_s, id_i) AS id_b,
         |  est_jaccard
         |FROM est WHERE est_jaccard >= 0.4
         |ORDER BY id_a, id_b""".stripMargin,
    // Gaps-and-islands mirror of session_window: an event at exactly
    // last+gap CONTINUES the session (strict > island test — touching
    // windows merge; see sessionIslandsCte).
    "q92_session_windows" ->
      s"""WITH $sessionIslandsCte
         |SELECT user_id, MIN(t_us) // 1000000 AS start_s,
         |  MAX(t_us) - MIN(t_us) AS dur_us, COUNT(*) AS n
         |FROM z GROUP BY user_id, sess_id
         |ORDER BY user_id, start_s""".stripMargin,
    // q92 restricted to watermark-closed sessions (session end =
    // last event + gap; same ms watermark arithmetic as q63).
    "q93_stream_session_windows" ->
      s"""WITH $sessionIslandsCte,
         |wm AS (SELECT (MAX(epoch_ns(ts) // 1000) // 1000) - 7200000 AS wm_ms
         |       FROM events)
         |SELECT user_id, MIN(t_us) // 1000000 AS start_s,
         |  MAX(t_us) - MIN(t_us) AS dur_us, COUNT(*) AS n
         |FROM z, wm GROUP BY user_id, sess_id, wm_ms
         |HAVING (MAX(t_us) + 1800000000) // 1000 <= wm_ms
         |ORDER BY user_id, start_s""".stripMargin,
    // Batch interval self-join over the same µs-truncated event times.
    "q81_stream_attribution" ->
      """SELECT p.event_id AS purchase_id, c.event_id AS click_id, p.user_id
        |FROM events p JOIN events c
        |  ON p.user_id = c.user_id
        | AND p.event_type = 'purchase' AND c.event_type = 'click'
        | AND epoch_ns(c.ts) // 1000 BETWEEN epoch_ns(p.ts) // 1000 - 86400000000
        |                                AND epoch_ns(p.ts) // 1000
        |ORDER BY purchase_id, click_id""".stripMargin,
    // Batch left join with null rows restricted to WATERMARK-CLOSED
    // purchases: an unmatched left row emits only once the joint
    // watermark (min of both sides' max event time, minus the 2 h
    // delay) strictly passes its match horizon p_time.
    "q225_stream_left_outer" ->
      """WITH p AS (
        |  SELECT event_id AS purchase_id, user_id,
        |    epoch_ns(ts) // 1000 AS pt
        |  FROM events WHERE event_type = 'purchase'),
        |c AS (
        |  SELECT event_id AS click_id, user_id,
        |    epoch_ns(ts) // 1000 AS ct
        |  FROM events WHERE event_type = 'click'),
        |wm AS (
        |  -- Joint watermark under Spark's min policy: a side that never
        |  -- saw a row keeps its watermark at epoch, so the joint
        |  -- watermark never advances and NO outer row closes. DuckDB's
        |  -- least() IGNORES a NULL arm, which silently closed every
        |  -- purchase on a click-free stream (stream fuzz gate,
        |  -- ledger_clamp class, 0 vs 25 rows) — the CASE makes the
        |  -- empty-side watermark NULL, and NULL comparisons below
        |  -- withhold every null-extension exactly like the engine.
        |  SELECT CASE WHEN (SELECT max(pt) FROM p) IS NULL
        |                OR (SELECT max(ct) FROM c) IS NULL THEN NULL
        |              ELSE least((SELECT max(pt) FROM p),
        |                         (SELECT max(ct) FROM c)) - 7200000000
        |         END AS w),
        |j AS (
        |  SELECT p.purchase_id, c.click_id, p.user_id, p.pt
        |  FROM p LEFT JOIN c ON p.user_id = c.user_id
        |    AND c.ct >= p.pt - 86400000000 AND c.ct <= p.pt)
        |SELECT purchase_id, click_id, user_id
        |FROM j CROSS JOIN wm
        |WHERE click_id IS NOT NULL OR pt < w
        |ORDER BY purchase_id, click_id NULLS FIRST""".stripMargin,
    // Identical semantics to the batch twins — same oracle SQL.
    "q61_stream_hourly" ->
      """SELECT event_type, (epoch_ns(ts) // 3600000000000) * 3600 AS bucket_s,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(floor(value * 100.0 + 0.5) / 100.0 AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM events GROUP BY event_type, bucket_s
        |ORDER BY event_type, bucket_s""".stripMargin,
    "q62_stream_sessions" ->
      """WITH x AS (
        |  SELECT user_id, epoch_ns(ts) AS t,
        |    lag(epoch_ns(ts)) OVER (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id) AS pt
        |  FROM events)
        |SELECT user_id, COUNT(*) AS n_events,
        |  CAST(SUM(CASE WHEN pt IS NULL OR t - pt > 1800000000000 THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions
        |FROM x GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q255_stream_sessions_tws" ->
      """WITH x AS (
        |  SELECT user_id, epoch_ns(ts) AS t,
        |    lag(epoch_ns(ts)) OVER (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id) AS pt
        |  FROM events)
        |SELECT user_id, COUNT(*) AS n_events,
        |  CAST(SUM(CASE WHEN pt IS NULL OR t - pt > 1800000000000 THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions
        |FROM x GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q262_stream_recent_feed" ->
      """WITH r AS (
        |  SELECT user_id, event_id,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY epoch_ns(ts) DESC, event_id DESC) AS rk,
        |    COUNT(*) OVER (PARTITION BY user_id) AS n_seen
        |  FROM events)
        |SELECT user_id, CAST(n_seen AS BIGINT) AS n_seen,
        |  string_agg(event_id::VARCHAR, ',' ORDER BY rk) AS recent_csv
        |FROM r WHERE rk <= 5
        |GROUP BY user_id, n_seen ORDER BY user_id""".stripMargin,
    "q263_stream_type_counts" ->
      """SELECT user_id, CAST(count(*) AS BIGINT) AS n_total,
        |  CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_click,
        |  CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_view,
        |  CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_purchase,
        |  CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_signup,
        |  CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_error
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    // Sessions closed by a successor always emit; each user's LAST
    // session emits only if its gap horizon cleared the final watermark
    // (max event ms − 2 h) so its timer fired — the append-mode
    // restriction, same shape as q63's.
    "q266_stream_session_rows" ->
      """WITH x AS (
        |  SELECT user_id, epoch_ns(ts) AS t, event_id,
        |    CASE WHEN lag(epoch_ns(ts)) OVER w IS NULL
        |      OR epoch_ns(ts) - lag(epoch_ns(ts)) OVER w > 1800000000000
        |      THEN 1 ELSE 0 END AS brk
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id)),
        |s AS (
        |  SELECT user_id, t,
        |    SUM(brk) OVER (PARTITION BY user_id ORDER BY t, event_id
        |      ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM x),
        |g AS (
        |  SELECT user_id, sid, MIN(t) AS start_t, MAX(t) AS end_t,
        |    CAST(count(*) AS BIGINT) AS n_events
        |  FROM s GROUP BY user_id, sid),
        |wm AS (SELECT ((MAX(epoch_ns(ts) // 1000) // 1000) - 7200000)
        |         AS wm_ms FROM events),
        |m AS (SELECT *, row_number() OVER (PARTITION BY user_id
        |        ORDER BY sid DESC) AS rk
        |      FROM g)
        |SELECT user_id,
        |  CAST(start_t // 1000000000 AS BIGINT) AS start_s,
        |  CAST(end_t // 1000000000 AS BIGINT) AS end_s,
        |  n_events
        |FROM m, wm
        |WHERE rk > 1 OR (end_t // 1000000 + 1800000) <= wm_ms
        |ORDER BY user_id, start_s""".stripMargin,
    // Batch q12 restricted to watermark-closed windows. Watermark ms
    // arithmetic mirrors Spark exactly: event-time µs = ts div 1000,
    // tracked max in ms = µs div 1000, watermark = max ms − 7 200 000;
    // a window is emitted when its end ≤ watermark.
    "q63_stream_hourly_append" ->
      """WITH wm AS (
        |  SELECT ((MAX(epoch_ns(ts) // 1000) // 1000) - 7200000) AS wm_ms
        |  FROM events)
        |SELECT event_type, (epoch_ns(ts) // 3600000000000) * 3600 AS bucket_s,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(floor(value * 100.0 + 0.5) / 100.0 AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM events, wm
        |GROUP BY event_type, bucket_s, wm_ms
        |HAVING (bucket_s + 3600) * 1000 <= wm_ms
        |ORDER BY event_type, bucket_s""".stripMargin,
    "q64_stream_dedup" ->
      """SELECT DISTINCT user_id, event_type FROM events
        |ORDER BY user_id, event_type""".stripMargin,
    // Identical oracle to q62: event-time expiry is inert on the finite
    // replay (watermark advances only after the last batch).
    "q65_stream_sessions_expiring" ->
      """WITH x AS (
        |  SELECT user_id, epoch_ns(ts) AS t,
        |    lag(epoch_ns(ts)) OVER (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id) AS pt
        |  FROM events)
        |SELECT user_id, COUNT(*) AS n_events,
        |  CAST(SUM(CASE WHEN pt IS NULL OR t - pt > 1800000000000 THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions
        |FROM x GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q66_stream_enrich" ->
      """SELECT c_mktsegment, event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(floor(value * 100.0 + 0.5) / 100.0 AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM events JOIN customer ON user_id = c_custkey
        |GROUP BY c_mktsegment, event_type
        |ORDER BY c_mktsegment, event_type""".stripMargin)
}
