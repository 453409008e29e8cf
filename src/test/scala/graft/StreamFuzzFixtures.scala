package graft

import java.sql.Timestamp

import org.apache.spark.sql.{Row, SparkSession}

/** Seeded fixtures for the STREAMING batching-invariance fuzz gate
  * (VERDICT r13 item 3, [[StreamBatchingFuzzSpec]]). The streaming
  * surface's oracle equality ("stream-final == batch") is a CONTRACT
  * with preconditions the repo documents at each operator: replay is
  * chronological at micro-batch granularity (the fMGWS folds sort
  * within a batch; cross-batch disorder is the upstream watermark's
  * job), lateness is bounded by the 2-hour watermark horizon, and
  * duplicates recur within the horizon of their first occurrence
  * (`dropDuplicatesWithinWatermark` re-emits past it — its documented
  * trade, not a bug). These fixtures are built to SATISFY that
  * contract while maximizing stress inside it: every user's entire
  * activity fits a ≤ 2 h burst (so per-key state expiry/eviction
  * between distant bursts is exercised but never breaks equality),
  * bursts scatter across 3 days (the watermark advances and evicts
  * mid-run under multi-batch replay), ties share exact instants
  * (chunk boundaries cut mid-tie), and session gaps sit exactly AT
  * the 30-minute boundary (an event exactly at last+gap CONTINUES the
  * session under every convention in the engine — `session_window`
  * merges touching windows and the q11/q62 islands CTE uses strict >,
  * the r14 agreement these fixtures pin).
  *
  * Determinism contract identical to [[FuzzFixtures]]. Tables: events
  * (the [[FuzzFixtures]] schema — props carries the `{"k": n}` JSON
  * the q102 sketch keys on) and customer ([[FuzzRelationalFixtures]]
  * schema — q66's broadcast dimension; some user_ids deliberately
  * have no customer row).
  */
object StreamFuzzFixtures {

  /** Adversarial classes, one streaming-runtime pathology each. */
  val Classes: Seq[String] = Seq(
    "bursts",         // scattered ≤2h user bursts, 31–45min session gaps
    "tie_instants",   // exact shared timestamps within and across users
    "gap_boundaries", // consecutive events exactly AT the 30-min gap
    "ledger_clamp",   // purchase/error sequences crossing zero; NULL values
    "empty")          // zero events (zero micro-batches; q66 dim-only)

  private val MinNs = 60L * 1000000000L

  /** The two tables' deterministic rows: (events, customer). */
  def rows(cls: String, seed: Long): (Seq[Row], Seq[Row]) = {
    val r = new java.util.Random(seed * 7001L + cls.hashCode)
    def ts(offsetS: Long) = new Timestamp(FuzzFixtures.BaseMs + offsetS * 1000L)
    def cents(maxUnits: Int): java.lang.Double =
      Double.box((1 + r.nextInt(maxUnits * 100)).toDouble / 100.0)
    val Types = Seq("view", "click", "purchase", "error", "signup")

    val ev = scala.collection.mutable.ArrayBuffer[Row]()
    var id = 0L
    def add(u: Long, offS: Long, et: String, v: java.lang.Double): Unit = {
      id += 1
      // props {"k": n}: a bounded key universe for the q102 sketch
      ev += Row(id, ts(offS), u, et, v, s"""{"k": ${r.nextInt(40)}}""")
    }
    /** One user's burst starting at startS: session event-gaps 1–5 min,
      * session breaks 31–45 min — total span < 2 h by construction. */
    def burst(u: Long, startS: Long, sessions: Int): Unit = {
      var t = startS
      (1 to sessions).foreach { s =>
        if (s > 1) t += (31 + r.nextInt(15)) * 60L // session break
        (1 to 2 + r.nextInt(4)).foreach { _ =>
          add(u, t, Types(r.nextInt(Types.size)), cents(200))
          t += (60 + r.nextInt(240)).toLong
        }
      }
    }

    cls match {
      case "bursts" =>
        (1 to 12).foreach { u =>
          burst(u.toLong, u * 21600L + r.nextInt(3600), 2 + r.nextInt(2))
        }
      case "tie_instants" =>
        // eight tie instants, each its own ≤2h user neighbourhood: the
        // instant's users fire 2–4 events at EXACTLY that second (some
        // same-user duplicates of the same type → q64 tie dedup), plus
        // a few ±1s satellites
        (0 until 8).foreach { i =>
          val t0 = i * 10800L + r.nextInt(600)
          val us = (1 to 2 + r.nextInt(3)).map(_ => 1L + r.nextInt(6))
          us.foreach { u =>
            val et = Types(r.nextInt(3))
            add(u + i * 10, t0, et, cents(50))
            add(u + i * 10, t0, et, cents(50)) // same (user,type,instant)
            if (r.nextBoolean()) add(u + i * 10, t0 + 1, "view", cents(50))
          }
        }
      case "gap_boundaries" =>
        // per user: events at exactly 0, 30min, 60min, 90min — every
        // consecutive pair exactly AT the session gap (one merged
        // session under every convention: q92's session_window merges
        // touching windows, q11/q62's islands CTE is strict > — the
        // r14 agreement this class pins); plus a ±1s pair
        (1 to 8).foreach { u =>
          val base = u * 14400L
          Seq(0L, 1800L, 3600L, 5400L).foreach { d =>
            add(u.toLong, base + d, Types(r.nextInt(Types.size)), cents(80))
          }
          add(u.toLong, base + 5400L + 1799L, "click", cents(80))
          add(u.toLong, base + 5400L + 1801L, "view", cents(80))
        }
      case "ledger_clamp" =>
        // purchase credits / error debits engineered to cross zero
        // repeatedly (clamp churn), one NULL-valued purchase and error
        // per user (DuckDB NULL-arithmetic mirroring), bursts ≤ 2h
        (1 to 6).foreach { u =>
          var t = u * 28800L
          (1 to 8).foreach { i =>
            val et = if (i % 2 == 0) "purchase" else "error"
            add(u.toLong, t, et, cents(30))
            t += (120 + r.nextInt(300)).toLong
          }
          add(u.toLong, t, "purchase", null)
          add(u.toLong, t + 60L, "error", null)
        }
      case "empty" => ()
      case other =>
        throw new IllegalArgumentException(s"unknown fuzz class: $other")
    }

    // customer: covers user_ids 1..60 EXCEPT multiples of 7 (q66 inner
    // join drops those users — the orphan-key shape)
    val cust = (1 to 60).filter(_ % 7 != 0).map { k =>
      Row(k.toLong, f"Customer#$k%09d", r.nextInt(25),
        (1 + r.nextInt(99000)).toDouble / 100.0,
        Seq("MACHINERY", "HOUSEHOLD", "AUTOMOBILE", "FURNITURE",
          "BUILDING")(r.nextInt(5)))
    }
    (ev.toSeq, cust)
  }

  /** Materialize one fixture's tables under `<dir>/`. */
  def write(spark: SparkSession, cls: String, seed: Long,
            dir: String): Unit = {
    import scala.jdk.CollectionConverters._
    val (e, c) = rows(cls, seed)
    spark.createDataFrame(e.asJava, FuzzFixtures.schema)
      .repartition(1)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    spark.createDataFrame(c.asJava, FuzzRelationalFixtures.customerSchema)
      .repartition(1)
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
  }
}
