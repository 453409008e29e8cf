package graft

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Seeded adversarial `events` fixture generator for the differential
  * fuzz gate (VERDICT r12 item 3). The sf0.01 oracle gate runs ONE fixed
  * dataset; these fixtures concentrate the shapes that dataset cannot
  * contain — same-instant ties, dead funnel stages, empty and singleton
  * inputs, all-identical values, single-user skew, NULL measures — and
  * [[FuzzDiffSpec]] runs engine-vs-DuckDB on every one of them.
  *
  * Determinism: everything derives from `new java.util.Random(seed)`;
  * the same (class, seed) pair always yields byte-identical rows, so a
  * red is replayable by name (e.g. `fx037_no_clicks`).
  *
  * Schema mirrors /root/testdata events.parquet (TESTDATA.md): event_id
  * BIGINT, ts TIMESTAMP, user_id BIGINT, event_type VARCHAR, value
  * DOUBLE, props VARCHAR. user_id/ts/event_id/event_type stay non-null
  * (the engine's key contract — [[graft.io.Tables.normalizeEpochNs]]
  * documents ts ≥ 0); value/props go NULL in the null_values class.
  */
object FuzzFixtures {

  /** Adversarial classes, one dimension of nastiness each. */
  val Classes: Seq[String] = Seq(
    "baseline",         // plain random traffic (control group)
    "same_instant",     // bursts sharing an exact timestamp per user
    "single_user_skew", // one bot user carries ~90% of events
    "singleton_users",  // every user exactly one event (all groups size 1)
    "identical_values", // value constant across all rows (MAD = 0 paths)
    "no_purchases",     // funnel final stage dead
    "no_clicks",        // funnel middle stage dead (stage 3 unreachable)
    "empty",            // zero rows
    "one_row",          // single event
    "two_types",        // state space {view, click} only
    "null_values",      // NULL value / props measures
    "cross_ties",       // identical timestamps ACROSS users + within
    "monotone")         // one user, one type, strictly increasing ts

  /** 2024-01-01T00:00:00Z — keeps normalized ts ≥ 0 (day-math contract). */
  val BaseMs = 1704067200000L

  val schema: StructType = StructType(Seq(
    StructField("event_id", LongType, nullable = false),
    StructField("ts", TimestampType, nullable = false),
    StructField("user_id", LongType, nullable = false),
    StructField("event_type", StringType, nullable = false),
    StructField("value", DoubleType, nullable = true),
    StructField("props", StringType, nullable = true)))

  /** Deterministic rows for one (class, seed) fixture. */
  def rows(cls: String, seed: Long): Seq[Row] = {
    val r = new java.util.Random(seed * 7919L + cls.hashCode)
    def cents(maxUnits: Int): java.lang.Double =
      Double.box(r.nextInt(maxUnits * 100).toDouble / 100.0)
    def ts(offsetS: Long) = new Timestamp(BaseMs + offsetS * 1000L)
    def wType(): String = {
      val p = r.nextInt(100)
      if (p < 55) "view" else if (p < 80) "click"
      else if (p < 93) "purchase" else "error"
    }
    var id = 0L
    val buf = scala.collection.mutable.ArrayBuffer[Row]()
    def add(u: Long, offS: Long, et: String,
            v: java.lang.Double, props: String = null): Unit = {
      id += 1
      buf += Row(id, ts(offS), u, et, v, props)
    }
    cls match {
      case "baseline" =>
        val n = 100 + r.nextInt(200)
        (1 to n).foreach { _ =>
          add(1L + r.nextInt(20), r.nextInt(259200).toLong, wType(),
            cents(200))
        }
      case "same_instant" =>
        (1 to 30).foreach { _ =>
          val u = 1L + r.nextInt(8)
          val t = r.nextInt(86400).toLong
          (0 until 2 + r.nextInt(5)).foreach { _ =>
            add(u, t, wType(), cents(50))
          }
        }
      case "single_user_skew" =>
        (1 to 200).foreach { _ =>
          val u = if (r.nextInt(10) < 9) 7L else 1L + r.nextInt(5)
          add(u, r.nextInt(172800).toLong, wType(), cents(100))
        }
      case "singleton_users" =>
        (1 to 80).foreach { u =>
          add(u.toLong, r.nextInt(259200).toLong, wType(), cents(100))
        }
      case "identical_values" =>
        (1 to 150).foreach { _ =>
          add(1L + r.nextInt(10), r.nextInt(86400).toLong, wType(),
            Double.box(13.37))
        }
      case "no_purchases" =>
        (1 to 120).foreach { _ =>
          val et = Seq("view", "click", "error")(r.nextInt(3))
          add(1L + r.nextInt(12), r.nextInt(172800).toLong, et, cents(80))
        }
      case "no_clicks" =>
        (1 to 120).foreach { _ =>
          val et = Seq("view", "purchase", "error")(r.nextInt(3))
          add(1L + r.nextInt(12), r.nextInt(172800).toLong, et, cents(80))
        }
      case "empty" => ()
      case "one_row" =>
        add(1L, 100L, "view", cents(10))
      case "two_types" =>
        (1 to 100).foreach { _ =>
          val et = if (r.nextBoolean()) "view" else "click"
          add(1L + r.nextInt(6), r.nextInt(86400).toLong, et, cents(40))
        }
      case "null_values" =>
        (1 to 140).foreach { _ =>
          val v = if (r.nextInt(10) < 3) null else cents(120)
          val p = if (r.nextInt(2) == 0) null else """{"src":"fuzz"}"""
          add(1L + r.nextInt(15), r.nextInt(172800).toLong, wType(), v, p)
        }
      case "cross_ties" =>
        val shared = (1 to 20).map(_ => r.nextInt(86400).toLong)
        shared.foreach { t =>
          (0 until 2 + r.nextInt(3)).foreach { _ =>
            add(1L + r.nextInt(10), t, wType(), cents(60))
          }
        }
        // within-user duplicate-instant pairs on top
        (1 to 15).foreach { _ =>
          val u = 1L + r.nextInt(10)
          val t = r.nextInt(86400).toLong
          add(u, t, wType(), cents(60))
          add(u, t, wType(), cents(60))
        }
      case "monotone" =>
        (0 until 60).foreach { i =>
          add(1L, i * 60L, "view", cents(20))
        }
      case other =>
        throw new IllegalArgumentException(s"unknown fuzz class: $other")
    }
    buf.toSeq
  }

  /** Materialize one fixture as `<dir>/events.parquet` (Spark directory
    * layout; tools/check.py bind_tables handles both layouts). */
  def write(spark: SparkSession, cls: String, seed: Long,
            dir: String): DataFrame = {
    import scala.jdk.CollectionConverters._
    val df = spark.createDataFrame(rows(cls, seed).asJava, schema)
      .repartition(1) // one writer task → exactly one part file, even empty
    df.write.mode("overwrite").parquet(s"$dir/events.parquet")
    df
  }
}
