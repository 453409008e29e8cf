package graft

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Seeded adversarial `lineitem`/`orders`/`customer` fixture generator —
  * the relational/stats arm of the differential fuzz gate. The r13
  * events-only sweep ([[FuzzFixtures]]) caught six defects in its first
  * run; this generator brings the same adversarial shapes to the TPC-H
  * side of the surface, where the gate's one fixed dataset is even
  * tamer (the synthetic generator never emits an empty table, a
  * constant price column, or an order with no lineitems).
  *
  * Determinism contract identical to [[FuzzFixtures]]: everything
  * derives from `new java.util.Random(seed)`; the same (class, seed)
  * pair always yields byte-identical rows.
  *
  * Schemas mirror /root/testdata (TESTDATA.md). Key columns stay
  * non-null and inside the real domains (returnflag/linestatus pairs,
  * orderstatus, priority strings, mktsegment, nationkey 0–24, cents
  * prices) — the nastiness is STRUCTURAL: empty tables, constant
  * columns, duplicate (l_orderkey, l_linenumber) pairs with different
  * prices (the exact shape behind this round's q17 tie bug), orphan
  * keys on both sides of the order⋈lineitem join, one-customer skew,
  * all-same-day calendars, sub-101-row tails under top-100 operators.
  */
object FuzzRelationalFixtures {

  /** Adversarial classes, one dimension of nastiness each. */
  val Classes: Seq[String] = Seq(
    "baseline",         // plain random rows (control group)
    "empty_all",        // all three tables zero rows
    "one_row",          // one customer, one order, one lineitem
    "identical_prices", // every price/quantity constant (zero variance)
    "single_customer",  // all orders on one customer (Pareto top-1 = 100%)
    "same_day",         // every date the same instant (zero-span calendar)
    "dup_line_keys",    // repeated (orderkey, linenumber) with different prices
    "orphan_keys",      // orders with no lineitems + lineitems with no order
    "tiny",             // 3 customers / 5 orders / 6 lineitems (singleton groups)
    "two_customers",    // binary split for KS / stump / WoE arms
    "monotone_dates",   // unique strictly-increasing dates, one per order
    "neg_acctbal")      // account balances straddling zero (negative tail)

  val lineitemSchema: StructType = StructType(Seq(
    StructField("l_orderkey", LongType, nullable = false),
    StructField("l_partkey", LongType, nullable = false),
    StructField("l_suppkey", LongType, nullable = false),
    StructField("l_linenumber", IntegerType, nullable = false),
    StructField("l_quantity", DoubleType, nullable = false),
    StructField("l_extendedprice", DoubleType, nullable = false),
    StructField("l_discount", DoubleType, nullable = false),
    StructField("l_tax", DoubleType, nullable = false),
    StructField("l_returnflag", StringType, nullable = false),
    StructField("l_linestatus", StringType, nullable = false),
    StructField("l_shipdate", TimestampType, nullable = false)))

  val ordersSchema: StructType = StructType(Seq(
    StructField("o_orderkey", LongType, nullable = false),
    StructField("o_custkey", LongType, nullable = false),
    StructField("o_orderstatus", StringType, nullable = false),
    StructField("o_totalprice", DoubleType, nullable = false),
    StructField("o_orderdate", TimestampType, nullable = false),
    StructField("o_orderpriority", StringType, nullable = false)))

  val customerSchema: StructType = StructType(Seq(
    StructField("c_custkey", LongType, nullable = false),
    StructField("c_name", StringType, nullable = false),
    StructField("c_nationkey", IntegerType, nullable = false),
    StructField("c_acctbal", DoubleType, nullable = false),
    StructField("c_mktsegment", StringType, nullable = false)))

  /** 1995-01-01T00:00:00Z — inside the real tables' date span. */
  val BaseMs = 788918400000L
  private val DayMs = 86400000L

  private val Flags = Seq("A", "N", "R")
  private val Statuses = Seq("O", "F")
  private val OrderStatuses = Seq("O", "F", "P")
  private val Priorities = Seq("1-URGENT", "2-HIGH", "3-MEDIUM",
    "4-NOT SPECIFIED", "5-LOW")
  private val Segments = Seq("MACHINERY", "HOUSEHOLD", "AUTOMOBILE",
    "FURNITURE", "BUILDING")

  /** The three tables' deterministic rows for one (class, seed) fixture. */
  def rows(cls: String, seed: Long):
      (Seq[Row], Seq[Row], Seq[Row]) = {
    val r = new java.util.Random(seed * 6007L + cls.hashCode)
    def cents(maxUnits: Int): Double =
      (1 + r.nextInt(maxUnits * 100)).toDouble / 100.0
    def pct(maxBp: Int): Double = r.nextInt(maxBp + 1).toDouble / 100.0
    def day(offsetDays: Int) = new Timestamp(BaseMs + offsetDays * DayMs)
    def name(k: Long) = f"Customer#$k%09d"

    val cust = scala.collection.mutable.ArrayBuffer[Row]()
    val ord = scala.collection.mutable.ArrayBuffer[Row]()
    val line = scala.collection.mutable.ArrayBuffer[Row]()
    def addCust(k: Long, bal: Double): Unit =
      cust += Row(k, name(k), r.nextInt(25), bal,
        Segments(r.nextInt(Segments.size)))
    def addOrder(k: Long, custKey: Long, total: Double,
                 d: Timestamp): Unit =
      ord += Row(k, custKey, OrderStatuses(r.nextInt(3)), total, d,
        Priorities(r.nextInt(5)))
    def addLine(ok: Long, ln: Int, qty: Double, price: Double,
                d: Timestamp): Unit =
      line += Row(ok, 1L + r.nextInt(40), 1L + r.nextInt(10), ln, qty,
        price, pct(10), pct(8), Flags(r.nextInt(3)),
        Statuses(r.nextInt(2)), d)

    /** nCust customers, ~nOrd orders spread over spanDays, 1–3 lines each. */
    def populate(nCust: Int, nOrd: Int, spanDays: Int): Unit = {
      (1 to nCust).foreach(k => addCust(k.toLong, cents(990)))
      (1 to nOrd).foreach { ok =>
        val ck = 1L + r.nextInt(nCust)
        val d = day(r.nextInt(spanDays max 1))
        addOrder(ok.toLong, ck, cents(4000), d)
        (1 to 1 + r.nextInt(3)).foreach { ln =>
          addLine(ok.toLong, ln, (1 + r.nextInt(50)).toDouble,
            cents(1000), day(r.nextInt(spanDays max 1)))
        }
      }
    }

    cls match {
      case "baseline" => populate(12, 40 + r.nextInt(40), 400)
      case "empty_all" => ()
      case "one_row" =>
        addCust(1L, cents(100))
        addOrder(1L, 1L, cents(500), day(10))
        addLine(1L, 1, 7.0, cents(300), day(12))
      case "identical_prices" =>
        (1 to 8).foreach(k => addCust(k.toLong, 500.0))
        (1 to 40).foreach { ok =>
          addOrder(ok.toLong, 1L + r.nextInt(8), 1234.56,
            day(r.nextInt(300)))
          (1 to 2).foreach(ln => addLine(ok.toLong, ln, 10.0, 99.99,
            day(r.nextInt(300))))
        }
      case "single_customer" =>
        addCust(1L, cents(800))
        (1 to 50).foreach { ok =>
          addOrder(ok.toLong, 1L, cents(3000), day(r.nextInt(500)))
          addLine(ok.toLong, 1, (1 + r.nextInt(30)).toDouble, cents(700),
            day(r.nextInt(500)))
        }
      case "same_day" =>
        (1 to 10).foreach(k => addCust(k.toLong, cents(900)))
        (1 to 45).foreach { ok =>
          addOrder(ok.toLong, 1L + r.nextInt(10), cents(2500), day(42))
          (1 to 1 + r.nextInt(2)).foreach(ln =>
            addLine(ok.toLong, ln, (1 + r.nextInt(20)).toDouble,
              cents(600), day(42)))
        }
      case "dup_line_keys" =>
        (1 to 6).foreach(k => addCust(k.toLong, cents(700)))
        (1 to 25).foreach { ok =>
          addOrder(ok.toLong, 1L + r.nextInt(6), cents(2000),
            day(r.nextInt(200)))
          // every order carries a repeated (orderkey, linenumber=1) pair
          // with DIFFERENT prices — sometimes on the same ship date
          val d = day(r.nextInt(200))
          addLine(ok.toLong, 1, (1 + r.nextInt(10)).toDouble, cents(500), d)
          addLine(ok.toLong, 1, (1 + r.nextInt(10)).toDouble, cents(500),
            if (r.nextBoolean()) d else day(r.nextInt(200)))
        }
      case "orphan_keys" =>
        (1 to 8).foreach(k => addCust(k.toLong, cents(600)))
        // orders 1–20 exist; lineitems reference orders 11–30, so
        // 1–10 are childless and 21–30 are parentless
        (1 to 20).foreach { ok =>
          addOrder(ok.toLong, 1L + r.nextInt(8), cents(1500),
            day(r.nextInt(250)))
        }
        (11 to 30).foreach { ok =>
          addLine(ok.toLong, 1, (1 + r.nextInt(15)).toDouble, cents(400),
            day(r.nextInt(250)))
        }
      case "tiny" =>
        (1 to 3).foreach(k => addCust(k.toLong, cents(300)))
        (1 to 5).foreach { ok =>
          addOrder(ok.toLong, 1L + (ok - 1) % 3, cents(900),
            day(ok * 30))
        }
        (1 to 6).foreach { i =>
          addLine(1L + (i - 1) % 5, 1 + (i - 1) / 5,
            (1 + r.nextInt(9)).toDouble, cents(250), day(i * 25))
        }
      case "two_customers" =>
        addCust(1L, cents(400)); addCust(2L, cents(400))
        (1 to 60).foreach { ok =>
          val ck = 1L + (ok % 2)
          addOrder(ok.toLong, ck, cents(if (ck == 1L) 1000 else 3000),
            day(r.nextInt(365)))
          addLine(ok.toLong, 1, (1 + r.nextInt(25)).toDouble, cents(550),
            day(r.nextInt(365)))
        }
      case "monotone_dates" =>
        addCust(1L, cents(500))
        (1 to 48).foreach { ok =>
          addOrder(ok.toLong, 1L, cents(2200), day(ok * 7))
          addLine(ok.toLong, 1, (1 + r.nextInt(12)).toDouble, cents(480),
            day(ok * 7))
        }
      case "neg_acctbal" =>
        (1 to 20).foreach { k =>
          val bal = if (k <= 7) -cents(900)
          else if (k <= 10) 0.0 else cents(900)
          addCust(k.toLong, bal)
        }
        (1 to 30).foreach { ok =>
          addOrder(ok.toLong, 1L + r.nextInt(20), cents(1800),
            day(r.nextInt(300)))
          addLine(ok.toLong, 1, (1 + r.nextInt(20)).toDouble, cents(350),
            day(r.nextInt(300)))
        }
      case other =>
        throw new IllegalArgumentException(s"unknown fuzz class: $other")
    }
    (line.toSeq, ord.toSeq, cust.toSeq)
  }

  /** Materialize one fixture's three tables under `<dir>/`. */
  def write(spark: SparkSession, cls: String, seed: Long,
            dir: String): Unit = {
    import scala.jdk.CollectionConverters._
    val (l, o, c) = rows(cls, seed)
    def dump(rs: Seq[Row], sch: StructType, tab: String): Unit =
      spark.createDataFrame(rs.asJava, sch)
        .repartition(1) // one writer task → exactly one part file, even empty
        .write.mode("overwrite").parquet(s"$dir/$tab.parquet")
    dump(l, lineitemSchema, "lineitem")
    dump(o, ordersSchema, "orders")
    dump(c, customerSchema, "customer")
  }
}
