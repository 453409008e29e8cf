package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import graft.functions.GraftFunctions.{qdec, qround}

/** Structured Streaming operators over the events stream.
  *
  * The reference has no streaming surface (SURVEY.md §2.12); these extend
  * the engine so the same event analytics run incrementally: the batch
  * queries q11 (sessionize) and q12 (hour buckets) each have a streaming
  * twin here, and the specs assert stream-vs-batch result equality on the
  * same input (the defining correctness property of an incremental
  * operator).
  *
  * Scale notes: windowed aggregation state is bounded by the watermark;
  * sessionization state is one small struct per user key, expired by a
  * processing-time timeout after inactivity — both shapes hold on an
  * unbounded 100 TB/day stream.
  */
object EventStreams {

  // `value` is Option: the events table's value column is NULLABLE, and
  // a primitive Double field makes the encoder throw on the first NULL
  // row — which killed every typed streaming query on NULL-carrying
  // corpora (stream fuzz gate, ledger_clamp class).
  case class Event(event_id: Long, ts: Long, user_id: Long,
                   event_type: String, value: Option[Double])

  /** [[Event]] + the event-time column: event-time state timeouts require
    * the WATERMARKED column to flow into the stateful operator (Spark's
    * checker rejects the plan if a projection drops it). */
  case class EventT(event_id: Long, ts: Long, user_id: Long,
                    event_type: String, value: Option[Double],
                    event_time: java.sql.Timestamp)

  case class SessionState(lastTsNs: Long, sessions: Long, events: Long)

  case class UserSessions(user_id: Long, n_events: Long, n_sessions: Long)

  /** Advance a session fold by one (ts-sorted) event. */
  private def advance(s: SessionState, tsNs: Long, gapNs: Long): SessionState = {
    val newSession = s.lastTsNs == Long.MinValue || tsNs - s.lastTsNs > gapNs
    SessionState(tsNs, s.sessions + (if (newSession) 1 else 0), s.events + 1)
  }

  /** Streaming twin of q12: hourly tumbling-window counts/sums per
    * event_type, with a 2-hour watermark bounding state. `ts` arrives as
    * ns-epoch long (the parquet source convention) and is converted to a
    * proper event-time timestamp for the window. */
  def hourlyBuckets(events: DataFrame): DataFrame =
    events
      .withColumn("event_time", timestamp_micros(expr("ts div 1000")))
      .withWatermark("event_time", "2 hours")
      .groupBy(window(col("event_time"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(qdec(col("value"), 18, 2)).cast("double").as("total"))
      .select(
        (unix_timestamp(col("window.start"))).as("bucket_s"),
        col("event_type"), col("n"), col("total"))

  /** Streaming twin of q11: per-user session counting with a 30-minute
    * inactivity gap, implemented with explicit keyed state
    * (`flatMapGroupsWithState`). Emits the running per-user totals on
    * every update (OutputMode.Update).
    *
    * State bounds (without one the store grows with every user ever
    * seen):
    *  - `eventTimeTimeout = true` — the production form: a key's state
    *    expires once the WATERMARK passes its last event + `expireAfterNs`
    *    (requires `withWatermark` upstream). Deterministic in event time,
    *    and inert on a finite replay whose watermark only advances at the
    *    end — so the same query still matches the batch oracle (q65).
    *  - `stateTimeoutMs` — processing-time expiry; opt-in because the
    *    timeout-check batches never let `processAllAvailable` settle.
    * Within a micro-batch rows are buffered and time-sorted; that buffer
    * is bounded by one key's rows in one trigger interval (cross-batch
    * disorder is the upstream watermark's job). */
  def sessionize(events: Dataset[Event],
                 gapNs: Long = 30L * 60 * 1000000000L,
                 stateTimeoutMs: Option[Long] = None): Dataset[UserSessions] = {
    import events.sparkSession.implicits._
    val timeoutConf =
      if (stateTimeoutMs.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, UserSessions](
        OutputMode.Update, timeoutConf) {
        (user: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val sorted = rows.toSeq.sortBy(e => (e.ts, e.event_id))
            var s = state.getOption.getOrElse(SessionState(Long.MinValue, 0L, 0L))
            sorted.foreach(e => s = advance(s, e.ts, gapNs))
            state.update(s)
            stateTimeoutMs.foreach(state.setTimeoutDuration)
            Iterator(UserSessions(user, s.events, s.sessions))
          }
      }
  }

  /** [[sessionize]]'s exact semantics re-expressed on Spark 4's
    * `transformWithState` arbitrary-state API (the successor to
    * `flatMapGroupsWithState`): state is a named, typed `ValueState`
    * handle in the RocksDB-backed store — the API that adds composite
    * state types, per-state TTL, and schema evolution for long-lived
    * production state. The fold itself is [[advance]], unchanged, so
    * the final per-user emissions match the fMGWS twin and the batch
    * oracle bit for bit. Requires the RocksDB state store provider
    * (the API rejects the HDFS-backed default) — callers set
    * `spark.sql.streaming.stateStore.providerClass`. */
  def sessionizeTws(events: Dataset[Event],
                    gapNs: Long = 30L * 60 * 1000000000L): Dataset[UserSessions] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new SessionTwsProcessor(gapNs),
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Update)
  }

  /** The [[sessionizeTws]] processor: one `ValueState[SessionState]`
    * per user, micro-batch rows buffered and time-sorted like the
    * fMGWS form (cross-batch disorder remains the upstream watermark's
    * job). */
  private class SessionTwsProcessor(gapNs: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, Event, UserSessions] {
    @transient private var state:
      org.apache.spark.sql.streaming.ValueState[SessionState] = _

    override def init(outputMode: OutputMode,
                      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      state = getHandle.getValueState[SessionState]("session",
        org.apache.spark.sql.Encoders.product[SessionState],
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(user: Long, rows: Iterator[Event],
        timerValues: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[UserSessions] = {
      val sorted = rows.toSeq.sortBy(e => (e.ts, e.event_id))
      var s = if (state.exists()) state.get()
              else SessionState(Long.MinValue, 0L, 0L)
      sorted.foreach(e => s = advance(s, e.ts, gapNs))
      state.update(s)
      Iterator(UserSessions(user, s.events, s.sessions))
    }
  }

  case class RecentEvent(ts: Long, event_id: Long)
  case class UserRecent(user_id: Long, n_seen: Long, recent_csv: String)

  /** Streaming "recent activity feed": keep each user's N most-recent
    * events (by event time, ties on id) in a `transformWithState`
    * ListState — the bounded-collection state type [[sessionizeTws]]'s
    * scalar ValueState can't express, plus a second ValueState counter
    * in the SAME processor (multi-handle composition is the API's
    * selling point over fMGWS's single state slot). Top-N under a total
    * order is a mergeable fold, so the final feed is batch-identical
    * whatever the micro-batch slicing; the monotone `n_seen` counter
    * makes the last emission per user selectable downstream. RocksDB
    * provider required, as with [[sessionizeTws]]. */
  def recentN(events: Dataset[Event], n: Int = 5): Dataset[UserRecent] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new RecentNProcessor(n),
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Update)
  }

  private class RecentNProcessor(n: Int)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, Event, UserRecent] {
    @transient private var recents:
      org.apache.spark.sql.streaming.ListState[RecentEvent] = _
    @transient private var seen:
      org.apache.spark.sql.streaming.ValueState[Long] = _

    override def init(outputMode: OutputMode,
                      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit = {
      recents = getHandle.getListState[RecentEvent]("recent",
        org.apache.spark.sql.Encoders.product[RecentEvent],
        org.apache.spark.sql.streaming.TTLConfig.NONE)
      seen = getHandle.getValueState[Long]("seen",
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.streaming.TTLConfig.NONE)
    }

    override def handleInputRows(user: Long, rows: Iterator[Event],
        timerValues: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[UserRecent] = {
      val batch = rows.toSeq
      val merged = (recents.get().toSeq ++
          batch.map(e => RecentEvent(e.ts, e.event_id)))
        .sortBy(e => (-e.ts, -e.event_id)).take(n)
      recents.put(merged.toArray)
      val total = (if (seen.exists()) seen.get() else 0L) + batch.length
      seen.update(total)
      Iterator(UserRecent(user, total,
        merged.map(_.event_id).mkString(",")))
    }
  }

  case class UserTypeCounts(user_id: Long, n_total: Long, n_click: Long,
                            n_view: Long, n_purchase: Long, n_signup: Long,
                            n_error: Long)

  /** Streaming per-user event-type counters in a `transformWithState`
    * MapState — the keyed-sub-state type that completes the API triple
    * ([[sessionizeTws]] ValueState, [[recentN]] ListState): the map key
    * space (event types) is data-driven, so a ValueState struct can't
    * hold it without schema changes, and RocksDB stores each map entry
    * as its own key — updates touch only the entry they change, the
    * property that matters when the per-key map is large. Counting is
    * a mergeable fold ⇒ final emissions equal the batch pivot whatever
    * the micro-batch slicing; monotone `n_total` selects the last
    * emission. */
  def typeCounts(events: Dataset[Event]): Dataset[UserTypeCounts] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new TypeCountsProcessor(),
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Update)
  }

  private class TypeCountsProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, Event, UserTypeCounts] {
    @transient private var counts:
      org.apache.spark.sql.streaming.MapState[String, Long] = _

    override def init(outputMode: OutputMode,
                      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      counts = getHandle.getMapState[String, Long]("counts",
        org.apache.spark.sql.Encoders.STRING,
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(user: Long, rows: Iterator[Event],
        timerValues: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[UserTypeCounts] = {
      rows.foreach { e =>
        val cur = if (counts.containsKey(e.event_type))
          counts.getValue(e.event_type) else 0L
        counts.updateValue(e.event_type, cur + 1L)
      }
      def g(t: String): Long =
        if (counts.containsKey(t)) counts.getValue(t) else 0L
      val tot = counts.values().foldLeft(0L)(_ + _)
      Iterator(UserTypeCounts(user, tot, g("click"), g("view"),
        g("purchase"), g("signup"), g("error")))
    }
  }

  case class SessionRow(user_id: Long, start_s: Long, end_s: Long,
                        n_events: Long)
  case class OpenSession(start: Long, last: Long, n: Long)

  /** Session EMISSION with event-time TIMERS ([[sessionizeTws]] counts
    * sessions; this emits each session as a ROW once it is provably
    * over): a closed-by-successor session emits inline when the next
    * event's gap exceeds the threshold, and the final hanging session
    * emits from `handleExpiredTimer` when the WATERMARK passes its
    * last event + gap — the timer API (register/expire) that
    * `flatMapGroupsWithState` only approximates with state timeouts,
    * here with exact per-session expiry timestamps. Each batch
    * re-registers the key's single timer at the new horizon (the old
    * one is deleted — timers are per-(key, timestamp)). On the finite
    * replay the watermark reaches max(event time) at the end and Spark
    * runs a no-data micro-batch, so every session emits exactly once
    * and the output equals the batch gaps-and-islands oracle. */
  def sessionEmit(events: Dataset[EventT],
                  gapNs: Long = 30L * 60 * 1000000000L): Dataset[SessionRow] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new SessionEmitProcessor(gapNs),
        org.apache.spark.sql.streaming.TimeMode.EventTime(),
        OutputMode.Append)
  }

  private class SessionEmitProcessor(gapNs: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, EventT, SessionRow] {
    @transient private var open:
      org.apache.spark.sql.streaming.ValueState[OpenSession] = _

    override def init(outputMode: OutputMode,
                      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      open = getHandle.getValueState[OpenSession]("open",
        org.apache.spark.sql.Encoders.product[OpenSession],
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    private def toRow(user: Long, s: OpenSession): SessionRow =
      SessionRow(user, s.start / 1000000000L, s.last / 1000000000L, s.n)

    override def handleInputRows(user: Long, rows: Iterator[EventT],
        timerValues: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[SessionRow] = {
      val sorted = rows.toSeq.sortBy(e => (e.ts, e.event_id))
      val out = Seq.newBuilder[SessionRow]
      var cur = if (open.exists()) Option(open.get()) else None
      sorted.foreach { e =>
        cur match {
          case Some(s) if e.ts - s.last <= gapNs =>
            cur = Some(OpenSession(s.start, e.ts, s.n + 1))
          case Some(s) =>
            out += toRow(user, s)
            cur = Some(OpenSession(e.ts, e.ts, 1L))
          case None =>
            cur = Some(OpenSession(e.ts, e.ts, 1L))
        }
      }
      cur.foreach { s =>
        open.update(s)
        // one live timer per key: re-arm at the new session horizon
        getHandle.listTimers().foreach(t =>
          getHandle.deleteTimer(t.asInstanceOf[Long]))
        getHandle.registerTimer(s.last / 1000000L + gapNs / 1000000L)
      }
      out.result().iterator
    }

    override def handleExpiredTimer(user: Long,
        timerValues: org.apache.spark.sql.streaming.TimerValues,
        expiredTimerInfo: org.apache.spark.sql.streaming.ExpiredTimerInfo)
        : Iterator[SessionRow] = {
      if (open.exists()) {
        val s = open.get()
        open.clear()
        Iterator(toRow(user, s))
      } else Iterator.empty
    }
  }

  case class LedgerEvent(user_id: Long, ts: Long, event_id: Long,
                         delta: java.math.BigDecimal)
  case class LedgerState(bal: java.math.BigDecimal, n: Long, clamps: Long)
  case class LedgerOut(user_id: Long, n_events: Long, n_clamped: Long,
                       final_balance: java.math.BigDecimal)

  /** Streaming floor-clamped balance — [[graft.ops.Ledger]]'s
    * non-linear fold as per-user `flatMapGroupsWithState`: state is the
    * exact-BigDecimal (balance, n, clamps) triple, each micro-batch
    * folds its rows in (ts, event_id) order on top of it, Update mode
    * emits the running result. Zero floating point, so the final state
    * equals the batch fold bit-for-bit whatever the batch slicing —
    * PROVIDED arrival order across batches respects event time (the
    * file-source harness replays in order; a production deployment
    * fronts this with a watermarked sort or accepts ledger semantics
    * of arrival order, as real ledgers do). */
  def clampedBalanceStream(events: Dataset[LedgerEvent]): Dataset[LedgerOut] = {
    import events.sparkSession.implicits._
    val zero = java.math.BigDecimal.ZERO
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[LedgerState, LedgerOut](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[LedgerEvent],
         state: GroupState[LedgerState]) =>
          val sorted = rows.toSeq.sortBy(e => (e.ts, e.event_id))
          var s = state.getOption.getOrElse(LedgerState(zero, 0L, 0L))
          sorted.foreach { e =>
            // NULL deltas poison the balance exactly as the oracle's SQL
            // arithmetic does (see graft.ops.Ledger) — never NPE.
            var bal = if (s.bal == null || e.delta == null) null
                      else s.bal.add(e.delta)
            var clamps = s.clamps
            if (bal != null && bal.signum() < 0) { bal = zero; clamps += 1 }
            s = LedgerState(bal, s.n + 1, clamps)
          }
          state.update(s)
          Iterator(LedgerOut(user, s.n, s.clamps, s.bal))
      }
  }

  case class CompactState(ts: Long, eventId: Long, eventType: String,
                          value: Option[Double], changes: Long)

  case class CompactRow(user_id: Long, last_s: Long, last_event_id: Long,
                        last_event_type: String, last_value: Option[Double],
                        n_changes: Long)

  /** Streaming CDC log compaction: the continuously-maintained
    * last-write-wins view of a keyed change stream (the Kafka-compacted-
    * topic / MERGE-from-change-feed shape, streaming twin of the batch
    * q100 upsert). State is ONE small struct per key — the winning
    * change and a change counter — and the winner is chosen by the
    * CHANGE ORDER key (ts, event_id), not arrival order, so out-of-order
    * and cross-batch arrivals converge to the same view a batch
    * `row_number() = 1` would pick: that equality is the oracle.
    *
    * Scale: state size tracks live keyspace, not stream length. On an
    * unbounded keyspace pair it with event-time expiry exactly like
    * [[sessionizeExpiring]] (the horizon trade is the same); compaction
    * output feeds downstream as updates, so the sink sees per-key upserts
    * rather than the raw firehose. */
  def compactLatest(events: Dataset[Event]): Dataset[CompactRow] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[CompactState, CompactRow](GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[Event], state: GroupState[CompactState]) =>
          var s = state.getOption
            .getOrElse(CompactState(Long.MinValue, Long.MinValue, "", None, 0L))
          rows.foreach { e =>
            val newer = e.ts > s.ts || (e.ts == s.ts && e.event_id > s.eventId)
            s =
              if (newer) CompactState(e.ts, e.event_id, e.event_type,
                e.value, s.changes + 1)
              else s.copy(changes = s.changes + 1)
          }
          state.update(s)
          CompactRow(user, s.ts / 1000000000L, s.eventId, s.eventType,
            s.value, s.changes)
      }
  }

  /** [[sessionize]] with EVENT-TIME state expiry — the production bound:
    * a key's state dies once the watermark passes its last event +
    * `expireAfterNs`, so the store holds only recently-active keys, in
    * event time (deterministic; a processing-time bound depends on
    * wall-clock luck). Input must carry a watermarked `event_time`
    * column ([[EventT]]); a key seen again after expiry restarts its
    * counts — the horizon trade, same as the streaming dedup. Inert on a
    * finite replay (the watermark only advances at the end), so results
    * still match the batch oracle. */
  def sessionizeExpiring(events: Dataset[EventT],
                         gapNs: Long = 30L * 60 * 1000000000L,
                         expireAfterNs: Long = 2L * 3600 * 1000000000L): Dataset[UserSessions] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, UserSessions](
        OutputMode.Update, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[EventT], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val sorted = rows.toSeq.sortBy(e => (e.ts, e.event_id))
            var s = state.getOption.getOrElse(SessionState(Long.MinValue, 0L, 0L))
            sorted.foreach(e => s = advance(s, e.ts, gapNs))
            state.update(s)
            state.setTimeoutTimestamp(
              s.lastTsNs / 1000000L + expireAfterNs / 1000000L)
            Iterator(UserSessions(user, s.events, s.sessions))
          }
      }
  }

  /** Streaming exact deduplication — the training-pipeline dedup
    * primitive (batch form: q23) in its scale-safe incremental shape.
    * `dropDuplicatesWithinWatermark` keeps one state entry per distinct
    * key only within the watermark horizon (a plain streaming
    * `dropDuplicates` would retain every key ever seen — unbounded);
    * append mode emits each key's first occurrence. A duplicate arriving
    * later than the horizon re-emits — at 100 TB/day that bounded-memory
    * trade is the point, and horizon-wide exactness is the watermark
    * contract, not a bug. Run to completion over a finite input the
    * emitted set is exactly the batch DISTINCT (the driver's oracle for
    * q64). */
  def dedupEvents(events: DataFrame, keys: Seq[String]): DataFrame =
    events
      .withColumn("event_time", timestamp_micros(expr("ts div 1000")))
      .withWatermark("event_time", "2 hours")
      .select(keys.map(col) :+ col("event_time"): _*)
      .dropDuplicatesWithinWatermark(keys)

  /** Native `session_window` aggregation (per-user 30-minute-gap
    * sessions): the built-in merging-window operator — each event opens a
    * [t, t+gap) window and windows merge when they overlap OR TOUCH: an
    * event at EXACTLY last + gap CONTINUES the session (measured on
    * boundary-tie fixtures — the stream fuzz gate's gap_boundaries
    * class; the earlier strict-`<` reading of the docs was wrong and
    * was never exercised by the tie-free sf corpus). This is the SAME
    * convention as the custom [[sessionize]]'s `>` gap test, so the
    * two operators agree on exact-boundary ties.
    *
    * Works identically over a batch frame (the q92 registration) and a
    * watermarked stream (q93, append mode — a session emits once the
    * watermark passes its end, so state is bounded by the watermark
    * horizon; this is the operator Spark maintains session state for
    * natively, vs [[sessionize]]'s hand-rolled flatMapGroupsWithState
    * which exists to show the explicit-state shape). Duration is emitted
    * in µs WITHOUT the trailing gap (last − first event), integer-exact
    * cross-engine. */
  def sessionWindowAgg(events: DataFrame,
                       gap: String = "30 minutes",
                       gapUs: Long = 30L * 60 * 1000000L): DataFrame =
    events
      .withColumn("event_time", timestamp_micros(expr("ts div 1000")))
      .withWatermark("event_time", "2 hours")
      .groupBy(session_window(col("event_time"), gap), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"),
        unix_timestamp(col("session_window.start")).as("start_s"),
        (unix_micros(col("session_window.end"))
          - unix_micros(col("session_window.start")) - lit(gapUs))
          .as("dur_us"),
        col("n"))

  /** Stream-stream interval join — click→purchase attribution: each
    * purchase pairs with the SAME user's clicks in the preceding
    * `lookback` (event time, inclusive both ends). The canonical
    * watermarked two-stream join: both sides carry a watermark and the
    * join condition time-bounds each side relative to the other, which is
    * exactly what lets Spark's symmetric hash join EVICT state — a click
    * older than (watermark − lookback) can never match a future purchase
    * and is dropped, so each side's buffer holds only a watermark+lookback
    * horizon of rows regardless of stream length. Without the interval
    * condition both buffers grow forever; that unbounded form is the
    * anti-pattern this operator exists to avoid.
    *
    * Inner-join append semantics: pairs emit as soon as both rows have
    * arrived; run to completion over a finite input the emitted set is
    * exactly the batch interval self-join (the oracle). Event times are
    * µs-truncated ns (the parquet convention), mirrored by the oracle's
    * `// 1000` µs arithmetic. */
  def clickAttribution(events: DataFrame,
                       lookback: String = "30 minutes"): DataFrame = {
    val purchases = events.filter(col("event_type") === "purchase")
      .withColumn("p_time", timestamp_micros(expr("ts div 1000")))
      .withWatermark("p_time", "2 hours")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("p_time"))
    val clicks = events.filter(col("event_type") === "click")
      .withColumn("c_time", timestamp_micros(expr("ts div 1000")))
      .withWatermark("c_time", "2 hours")
      .select(col("event_id").as("click_id"),
        col("user_id").as("c_user_id"), col("c_time"))
    purchases.join(clicks,
      col("user_id") === col("c_user_id") &&
        col("c_time") >= col("p_time") - expr(s"INTERVAL $lookback") &&
        col("c_time") <= col("p_time"))
      .select(col("purchase_id"), col("click_id"), col("user_id"))
  }

  /** Stream-stream LEFT OUTER interval join — q81's attribution with
    * null-extension for purchases no click explains: the unmatched left
    * row emits (click_id NULL) once the JOINT event-time watermark
    * passes its match horizon (clicks can arrive until c_time ≤ p_time,
    * so the row closes when watermark > p_time) and its state is
    * evicted — the outer row is a WATERMARK-CLOSED fact, not an
    * end-of-stream artifact, which is why purchases inside the trailing
    * watermark window never null-emit on a finite input (the oracle
    * mirrors the closure predicate). Same bounded-state argument as the
    * inner form; the no-data micro-batch (on by default) advances the
    * final watermark so closures at end-of-input do emit. */
  def clickAttributionLeftOuter(events: DataFrame,
                                lookback: String = "24 hours"): DataFrame = {
    val purchases = events.filter(col("event_type") === "purchase")
      .withColumn("p_time", timestamp_micros(expr("ts div 1000")))
      .withWatermark("p_time", "2 hours")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("p_time"))
    val clicks = events.filter(col("event_type") === "click")
      .withColumn("c_time", timestamp_micros(expr("ts div 1000")))
      .withWatermark("c_time", "2 hours")
      .select(col("event_id").as("click_id"),
        col("user_id").as("c_user_id"), col("c_time"))
    purchases.join(clicks,
        col("user_id") === col("c_user_id") &&
          col("c_time") >= col("p_time") - expr(s"INTERVAL $lookback") &&
          col("c_time") <= col("p_time"),
        "left_outer")
      .select(col("purchase_id"), col("click_id"), col("user_id"))
  }

  /** Streaming incremental materialized-view maintenance: each
    * micro-batch reduces to its algebraic partials
    * ([[graft.ops.Incremental.partials]]) and merges them into the
    * maintained view — the `foreachBatch` + MERGE pattern every
    * lakehouse streaming-MV pipeline runs, here with the merge target
    * held as a checkpointed DataFrame (production swaps the state holder
    * for a Delta/Iceberg MERGE INTO; the algebra is identical).
    *
    * Why this scales: per batch the fact rows reduce map-side to
    * |groups| partials, the merge shuffles |MV| + |batch groups| rows
    * (never history), and `localCheckpoint` truncates lineage so batch N
    * does not replay batches 1..N−1 — state is one groups-sized frame
    * regardless of stream length. Slicing-invariance of the algebraic
    * merge (count/sum/min/max over exact decimals) is what makes the
    * result independent of micro-batch boundaries — the property the
    * q132 gate checks against a from-scratch batch oracle. */
  def maintainIncrementalMv(streamed: DataFrame, keys: Seq[String],
                            measure: org.apache.spark.sql.Column,
                            shufflePartitions: Int = 4): DataFrame = {
    val spark = streamed.sparkSession
    var state: Option[DataFrame] = None
    val step: (Dataset[org.apache.spark.sql.Row], Long) => Unit =
      (batch, _) => {
        val p = graft.ops.Incremental.partials(batch.toDF(), keys, measure)
        val next = state match {
          case None => p
          case Some(mv) => graft.ops.Incremental.merge(Seq(mv, p), keys)
        }
        state = Some(next.localCheckpoint())
      }
    // same shuffle-partition posture as runToMemory: per-batch agg cost
    // scales with partitions while the groups-sized result does not
    val confKey = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(confKey)
    val q =
      try {
        spark.conf.set(confKey, shufflePartitions.toString)
        streamed.writeStream.outputMode(OutputMode.Append)
          .foreachBatch(step).start()
      } finally spark.conf.set(confKey, prev)
    try q.processAllAvailable() finally q.stop()
    state.getOrElse(spark.emptyDataFrame)
  }

  /** Crash-injection knob for the restart-recovery fuzz arm (VERDICT
    * r14 item 4): when set to N, every drive through [[runToParquet]]
    * (and [[runToMemory]], which delegates — the memory sink is not
    * fault-tolerant, so restart coverage must go through the
    * checkpointed foreachBatch landing path) CRASHES after micro-batch
    * N's write lands but BEFORE its checkpoint commit — the
    * at-least-once worst case — then restarts the query from the same
    * checkpoint and runs to completion. The final frame must equal the
    * unbroken run's (the per-batchId overwrite absorbs the replay;
    * StreamRestartSpec pins the mechanism, FuzzStreamRestartSpec sweeps
    * it across the registered streaming surface). Never set outside the
    * specs. */
  private[graft] val RestartCrashProp = "graft.stream.restart.batch"

  /** Marker for the injected crash — recognized (by class) in the cause
    * chain of the StreamingQueryException it surfaces as, so the drive
    * loop re-throws every OTHER failure unswallowed. */
  private[graft] final class InjectedCrash
    extends RuntimeException("injected restart-fuzz crash")

  private def isInjected(e: Throwable): Boolean = {
    var c: Throwable = e
    while (c != null) {
      if (c.isInstanceOf[InjectedCrash]) return true
      c = c.getCause
    }
    false
  }

  /** Restart-fuzz observability (ADVICE r15): nothing used to assert the
    * injected crash actually FIRED — a replay with fewer micro-batches
    * than the armed crash point completes its first drive cleanly and
    * the arm silently degrades to an unbroken-run comparison. Every
    * [[runToParquet]] drive armed under [[RestartCrashProp]] bumps
    * `restartDrivesArmed`; every recognized injected crash bumps
    * `restartCrashesFired`. FuzzStreamRestartSpec asserts the two deltas
    * are equal (no armed drive survived uncrashed) and cover the sweep. */
  private[graft] val restartDrivesArmed =
    new java.util.concurrent.atomic.AtomicLong(0L)
  private[graft] val restartCrashesFired =
    new java.util.concurrent.atomic.AtomicLong(0L)

  /** Convenience: run a streaming DataFrame to completion against a memory
    * sink and return the materialized result (test/batch-drive harness for
    * the streaming operators).
    *
    * The memory sink holds its rows on the driver for as long as its temp
    * view exists, so the rows are copied out and the view dropped before
    * returning — repeated runs in one long-lived JVM stay at zero retained
    * sink tables instead of accumulating one per run. The copy is bounded
    * by the sink's own design (memory sinks are only for small results).
    *
    * Under [[RestartCrashProp]] the drive delegates to [[runToParquet]]:
    * a memory sink cannot survive a restart (its table lives in the
    * driver and starts empty on recovery, losing every pre-crash Update
    * emission), while the parquet landing keeps committed batches on
    * disk — the two sinks' mode semantics are documented identical, so
    * the delegation changes the fault-tolerance story, not the result. */
  def runToMemory(spark: SparkSession, streamed: DataFrame, name: String,
                  mode: OutputMode, shufflePartitions: Int = 4): DataFrame = {
    if (sys.props.contains(RestartCrashProp))
      return runToParquet(spark, streamed, mode, shufflePartitions)
    // Stateful streaming cost scales with shuffle partitions — one state
    // store instance per partition per operator, each snapshotted and
    // committed EVERY micro-batch — while the result is partition-count
    // independent. The batch session's 32 partitions made q63 the single
    // most expensive query in round 3 (~12% of the bench); the finite
    // harness inputs need only a few. Production streams size this to
    // throughput via their own session conf — the override applies at
    // query START and is restored right after, so surrounding batch plans
    // keep the session default.
    val confKey = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(confKey)
    val q =
      try {
        spark.conf.set(confKey, shufflePartitions.toString)
        streamed.writeStream
          .outputMode(mode)
          .format("memory")
          .queryName(name)
          .start()
      } finally spark.conf.set(confKey, prev)
    try q.processAllAvailable() finally q.stop()
    val sunk = spark.table(name)
    val rows = sunk.collect().toIndexedSeq
    val out = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, numSlices = 1), sunk.schema)
    spark.catalog.dropTempView(name)
    out
  }

  /** Drive a streaming DataFrame to completion through a `foreachBatch`
    * PARQUET sink and return the sunk rows as a lazy batch frame — the
    * production-shaped twin of [[runToMemory]] for BIG-STATE streams
    * (per-user ledgers, latest-row compaction): emitted rows go executor
    * → files, the driver never materializes them, and the result scales
    * with cluster storage, not driver heap.
    *
    * Mode semantics mirror the memory sink exactly: Append/Update append
    * each micro-batch's emissions (the batch reader sees the union of
    * all emissions, same as the memory sink's table); Complete keeps
    * only the last batch's rewrite. This IS the lakehouse landing
    * pattern: swap the parquet write for a MERGE INTO / table-format
    * commit and nothing upstream changes.
    *
    * Each micro-batch owns `out/batch=<batchId>/`, written with
    * OVERWRITE — the write is idempotent under replay. A blind
    * `mode("append")` into one directory is NOT: foreachBatch is
    * at-least-once, so a crash mid-write followed by a re-run of the
    * uncommitted batch would duplicate its rows. Keying the overwrite
    * on batchId makes the retry rewrite its own directory instead,
    * which is what upgrades the checkpoint-restart contract from
    * at-least-once to effectively-once (StreamRestartSpec pins it).
    * A source that yields zero micro-batches leaves no batch dirs;
    * the explicit-schema read then returns an empty frame instead of
    * throwing on a path Spark can't infer from. */
  def runToParquet(spark: SparkSession, streamed: DataFrame,
                   mode: OutputMode, shufflePartitions: Int = 4): DataFrame = {
    val root = java.nio.file.Files.createTempDirectory("graft-stream-sink")
    val out = root.resolve("out")
    java.nio.file.Files.createDirectories(out)
    val chk = root.resolve("chk").toString
    graft.util.TempDirs.cleanupOnExit(root)
    val confKey = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(confKey)
    // Restart fuzz (RestartCrashProp): drive once with a crash injected
    // AFTER batch N's parquet write but BEFORE its checkpoint commit,
    // then re-drive from the same checkpoint to completion — the replay
    // of batch N rewrites its own batch=<id> directory (idempotent
    // overwrite), so the recovered result must equal the unbroken run.
    val crashAt = sys.props.get(RestartCrashProp).map(_.toLong)
    def drive(crash: Option[Long]): Unit = {
      val q =
        try {
          spark.conf.set(confKey, shufflePartitions.toString)
          streamed.writeStream
            .outputMode(mode)
            .option("checkpointLocation", chk)
            .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
              batch.write.mode("overwrite")
                .parquet(out.resolve(s"batch=$batchId").toString)
              if (crash.contains(batchId)) throw new InjectedCrash
            }
            .start()
        } finally spark.conf.set(confKey, prev)
      try q.processAllAvailable()
      catch { case e: Throwable if isInjected(e) =>
        restartCrashesFired.incrementAndGet(); ()
      }
      finally q.stop()
    }
    if (crashAt.isDefined) restartDrivesArmed.incrementAndGet()
    drive(crashAt)
    if (crashAt.isDefined) drive(None) // recover from the same checkpoint
    import scala.jdk.CollectionConverters._
    val ls = java.nio.file.Files.list(out)
    val batchDirs =
      try ls.iterator().asScala.toSeq
        .filter(p => p.getFileName.toString.startsWith("batch="))
        .sortBy(p => p.getFileName.toString.stripPrefix("batch=").toLong)
      finally ls.close()
    val keep =
      if (mode == OutputMode.Complete()) batchDirs.takeRight(1) else batchDirs
    if (keep.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], streamed.schema)
    else
      spark.read.schema(streamed.schema).parquet(keep.map(_.toString): _*)
  }
}
