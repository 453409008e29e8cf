package graft

import java.sql.Timestamp

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types._

/** Seeded adversarial GRAPH fixture generator — arm 5 of the
  * differential fuzz gate (VERDICT r13 item 1). The iterative-graph
  * family (PageRank q49/q200/q215, triangles q104, clustering q341,
  * Adamic–Adar q208, BFS q159, k-core q175, LPA q217, assortativity
  * q246, Markov stationary q367) runs on graphs DERIVED from the
  * relational tables: the customer–supplier co-purchase bipartite graph
  * (orders ⋈ lineitem distinct), the part co-occurrence graph (baskets
  * of l_partkey per order, pairs co-ordered ≥2×, basket ≤
  * [[graft.queries.AnalyticsQueries.BasketCap]]), and the event-type
  * Markov chain (per-user journey transitions). The synthetic sf
  * corpus only ever produces one well-connected blob of each; these
  * classes concentrate the structures it never contains: empty edge
  * sets, a single edge, two disconnected bicliques, star hubs exactly
  * AT and one PAST the q208 [[graft.queries.AnalyticsQueries
  * .HubDegreeCap]] / part baskets AT and PAST BasketCap, a pure cycle
  * (constant degrees — zero assortativity variance; periodic Markov
  * chain), isolated nodes and out-of-graph seed cohorts, duplicate
  * multigraph edges (q49-distinct vs q215-weight divergence), and
  * absorbing chain states (q367's renormalization path).
  *
  * Determinism contract identical to [[FuzzFixtures]]: everything
  * derives from `new java.util.Random(seed * prime + cls.hashCode)`;
  * the same (class, seed) pair always yields byte-identical rows.
  * Schemas are shared with [[FuzzRelationalFixtures]] (lineitem/orders/
  * customer) plus supplier and events (the [[FuzzFixtures]] shape) —
  * the five tables the family's engine code and oracles read.
  *
  * Seed-cohort conventions (fixed by the queries themselves):
  * q200's teleport seeds are customers with c_nationkey = 3; q159's
  * BFS sources are suppliers with s_nationkey = 0. Classes place these
  * cohorts inside, outside, or athwart the graph deliberately.
  */
object FuzzGraphFixtures {

  /** Adversarial classes, one graph pathology each. */
  val Classes: Seq[String] = Seq(
    "baseline",          // random bipartite blob (control group)
    "empty_graph",       // customers/suppliers exist, zero orders/lines/events
    "single_edge",       // one c–s edge; one Markov transition
    "two_cliques",       // two disconnected bicliques / part 4-cliques; reducible chain
    "star_hub_at_cap",   // customer with EXACTLY HubDegreeCap suppliers; basket AT BasketCap
    "star_hub_past_cap", // customer one PAST the cap; basket one PAST BasketCap
    "cycle",             // alternating 12-cycle (all degrees 2); period-3 Markov chain
    "isolated_nodes",    // seed cohorts (partially) outside the graph; single-part baskets
    "dup_edges",         // multigraph: repeated orders/lines (weight ≫ distinct)
    "absorbing_chain")   // path graph; journeys funnel into self-looping sink type

  val supplierSchema: StructType = StructType(Seq(
    StructField("s_suppkey", LongType, nullable = false),
    StructField("s_name", StringType, nullable = false),
    StructField("s_nationkey", IntegerType, nullable = false),
    StructField("s_acctbal", DoubleType, nullable = false)))

  private val HubCap = graft.queries.AnalyticsQueries.HubDegreeCap
  private val BasketCap = graft.queries.AnalyticsQueries.BasketCap

  /** The five tables' deterministic rows for one (class, seed) fixture:
    * (lineitem, orders, customer, supplier, events). */
  def rows(cls: String, seed: Long):
      (Seq[Row], Seq[Row], Seq[Row], Seq[Row], Seq[Row]) = {
    val r = new java.util.Random(seed * 9001L + cls.hashCode)
    def cents(maxUnits: Int): Double =
      (1 + r.nextInt(maxUnits * 100)).toDouble / 100.0
    def pct(maxBp: Int): Double = r.nextInt(maxBp + 1).toDouble / 100.0
    def oday(offsetDays: Int) =
      new Timestamp(FuzzRelationalFixtures.BaseMs + offsetDays * 86400000L)
    def ets(offsetS: Long) =
      new Timestamp(FuzzFixtures.BaseMs + offsetS * 1000L)

    val cust = scala.collection.mutable.ArrayBuffer[Row]()
    val supp = scala.collection.mutable.ArrayBuffer[Row]()
    val ord = scala.collection.mutable.ArrayBuffer[Row]()
    val line = scala.collection.mutable.ArrayBuffer[Row]()
    val ev = scala.collection.mutable.ArrayBuffer[Row]()
    val Segments = Seq("MACHINERY", "HOUSEHOLD", "AUTOMOBILE",
      "FURNITURE", "BUILDING")
    val Priorities = Seq("1-URGENT", "2-HIGH", "3-MEDIUM",
      "4-NOT SPECIFIED", "5-LOW")
    def addCust(k: Long, nation: Int): Unit =
      cust += Row(k, f"Customer#$k%09d", nation, cents(990),
        Segments(r.nextInt(Segments.size)))
    def addSupp(k: Long, nation: Int): Unit =
      supp += Row(k, f"Supplier#$k%09d", nation, cents(990))
    var nextOrder = 0L
    /** One order for `ck` whose lines carry the given (supplier, part)
      * pairs — the single primitive every class builds its three derived
      * graphs from: c–s edges = (ck, supplier), the part basket =
      * distinct parts, q215 edge weight = line multiplicity. */
    def addOrder(ck: Long, lines: Seq[(Long, Long)]): Unit = {
      nextOrder += 1
      ord += Row(nextOrder, ck, Seq("O", "F", "P")(r.nextInt(3)),
        cents(4000), oday(r.nextInt(300)), Priorities(r.nextInt(5)))
      lines.zipWithIndex.foreach { case ((sk, pk), i) =>
        line += Row(nextOrder, pk, sk, i + 1,
          (1 + r.nextInt(50)).toDouble, cents(1000), pct(10), pct(8),
          Seq("A", "N", "R")(r.nextInt(3)),
          Seq("O", "F")(r.nextInt(2)), oday(r.nextInt(300)))
      }
    }
    var nextEvent = 0L
    def addEvent(u: Long, offS: Long, et: String): Unit = {
      nextEvent += 1
      ev += Row(nextEvent, ets(offS), u, et,
        java.lang.Double.valueOf(cents(200)), null: String)
    }
    /** One user's journey: consecutive event types at distinct seconds. */
    def journey(u: Long, startS: Long, types: Seq[String]): Unit =
      types.zipWithIndex.foreach { case (t, i) =>
        addEvent(u, startS + i * 60L, t)
      }

    cls match {
      case "baseline" =>
        (1 to 8).foreach(k => addCust(k.toLong, if (k <= 2) 3 else k % 7))
        (1 to 6).foreach(k => addSupp(k.toLong, if (k <= 2) 0 else k % 5))
        (1 to 20 + r.nextInt(15)).foreach { _ =>
          val ck = 1L + r.nextInt(8)
          val n = 1 + r.nextInt(3)
          addOrder(ck, Seq.fill(n)((1L + r.nextInt(6), 1L + r.nextInt(10))))
        }
        (1 to 60 + r.nextInt(60)).foreach { _ =>
          val et = Seq("view", "click", "purchase", "error")(r.nextInt(4))
          addEvent(1L + r.nextInt(12), r.nextInt(259200).toLong, et)
        }

      case "empty_graph" =>
        // seed cohorts EXIST in the dimension tables; the graph does not
        (1 to 5).foreach(k => addCust(k.toLong, if (k == 1) 3 else 6))
        (1 to 4).foreach(k => addSupp(k.toLong, if (k == 1) 0 else 2))

      case "single_edge" =>
        addCust(1L, 3); addSupp(1L, 0)
        addOrder(1L, Seq((1L, 1L)))
        journey(1L, 100L, Seq("view", "click"))

      case "two_cliques" =>
        // biclique A: c1–c4 × s1–s4 (seed nations); B: c5–c8 × s5–s8
        (1 to 8).foreach(k => addCust(k.toLong, if (k <= 4) 3 else 5))
        (1 to 8).foreach(k => addSupp(k.toLong, if (k <= 4) 0 else 1))
        (1 to 8).foreach { k =>
          val base = if (k <= 4) 0L else 4L
          // basket {p1..p4} (block A) / {p5..p8} (block B), 4 orders each
          addOrder(k.toLong, (1 to 4).map(i => (base + i, base + i)))
        }
        // reducible Markov chain: two disjoint type blocks
        (1 to 3).foreach(u =>
          journey(u.toLong, u * 1000L,
            Seq("view", "click", "view", "click", "view")))
        (4 to 6).foreach(u =>
          journey(u.toLong, u * 1000L,
            Seq("purchase", "error", "purchase", "error")))

      case "star_hub_at_cap" =>
        // hub customer with EXACTLY HubDegreeCap distinct suppliers —
        // q208 must still include it; the one shared basket has EXACTLY
        // BasketCap distinct parts — partCoEdges must still include it
        addCust(1L, 3)
        (1 to HubCap).foreach(k => addSupp(k.toLong, if (k == 1) 0 else 2))
        val hubLines = (1 to HubCap).map(i => (i.toLong, i.toLong))
        addOrder(1L, hubLines)
        addOrder(1L, hubLines) // ×2 so every part pair passes w ≥ 2
        // two normal customers sharing a supplier pair → a second wedge
        addCust(2L, 4); addCust(3L, 4)
        addOrder(2L, Seq((1L, 1L), (2L, 2L)))
        addOrder(3L, Seq((1L, 1L), (2L, 2L)))
        (1 to 4).foreach(u =>
          journey(u.toLong, u * 500L, Seq("view", "click", "purchase")))

      case "star_hub_past_cap" =>
        // hub ONE past HubDegreeCap → excluded from the q208 wedge; the
        // hub basket ONE past BasketCap → dropped from partCoEdges
        addCust(1L, 3)
        (1 to HubCap + 1).foreach(k =>
          addSupp(k.toLong, if (k == 1) 0 else 2))
        val hubLines = (1 to HubCap + 1).map(i => (i.toLong, i.toLong))
        addOrder(1L, hubLines)
        addOrder(1L, hubLines)
        // the surviving wedge: c2/c3 share suppliers 300/301, parts 300/301
        addCust(2L, 3); addCust(3L, 6)
        addSupp(300L, 2); addSupp(301L, 2)
        addOrder(2L, Seq((300L, 300L), (301L, 301L)))
        addOrder(3L, Seq((300L, 300L), (301L, 301L)))
        (1 to 4).foreach(u =>
          journey(u.toLong, u * 500L, Seq("view", "click", "purchase")))

      case "cycle" =>
        // alternating 12-cycle c1-s1-c2-s2-…-c6-s6-c1: every node degree
        // 2 (constant — q246's zero-variance guard), no triangles, the
        // whole graph peels at k=3; part cycle p1-…-p6-p1 rides the same
        // orders (each basket {p_{i-1}, p_i} twice)
        (1 to 6).foreach(k => addCust(k.toLong, if (k == 1) 3 else 6))
        (1 to 6).foreach(k => addSupp(k.toLong, if (k == 1) 0 else 2))
        (1 to 6).foreach { i =>
          val prev = if (i == 1) 6L else (i - 1).toLong
          val lines = Seq((i.toLong, i.toLong), (prev, prev))
          addOrder(i.toLong, lines)
          addOrder(i.toLong, lines)
        }
        // period-3 chain: view → click → purchase → view (no damping
        // fixpoint; 5 synchronous steps land mid-rotation)
        (1 to 3).foreach { u =>
          journey(u.toLong, u * 2000L,
            Seq.tabulate(12)(i => Seq("view", "click", "purchase")(i % 3)))
        }

      case "isolated_nodes" =>
        // connected core: c1,c2 × s1,s2; seed cohorts STRADDLE the graph
        // (c1 nation-3 in-graph, c3–c5 nation-3 isolated; BFS sources
        // s3,s4 nation-0 are ALL isolated → empty in-graph frontier)
        addCust(1L, 3); addCust(2L, 6)
        (3 to 10).foreach(k => addCust(k.toLong, if (k <= 5) 3 else 6))
        addSupp(1L, 2); addSupp(2L, 2)
        (3 to 8).foreach(k => addSupp(k.toLong, if (k <= 4) 0 else 2))
        addOrder(1L, Seq((1L, 1L), (2L, 2L)))
        addOrder(1L, Seq((1L, 1L), (2L, 2L)))
        addOrder(2L, Seq((1L, 3L)))
        // single-part baskets (no pairs) beyond the one {p1,p2} pair
        (1 to 5).foreach(_ => addOrder(2L, Seq((1L, 1L + r.nextInt(3)))))
        // six single-event users (no transitions) + one real journey
        (1 to 6).foreach(u => addEvent(u.toLong, u * 100L, "view"))
        journey(7L, 5000L, Seq("view", "click", "purchase"))

      case "dup_edges" =>
        // multigraph: the SAME c–s pairings repeated through many orders
        // and duplicate lines (q215 weight 8× vs q49's distinct edge);
        // duplicate parts within a basket (collect_set dedup)
        (1 to 3).foreach(k => addCust(k.toLong, if (k == 1) 3 else 6))
        (1 to 2).foreach(k => addSupp(k.toLong, if (k == 1) 0 else 2))
        (1 to 4).foreach { _ =>
          addOrder(1L, Seq((1L, 1L), (1L, 2L))) // c1–s1 ×2 per order
        }
        addOrder(1L, Seq((2L, 1L), (2L, 2L)))
        (1 to 3).foreach(_ => addOrder(2L, Seq((1L, 1L), (1L, 1L))))
        (1 to 2).foreach(_ => addOrder(3L, Seq((2L, 2L), (2L, 3L))))
        // self-transition user + a repeated two-step journey
        journey(1L, 100L, Seq("view", "view", "view", "view"))
        (1 to 5).foreach(i =>
          journey(2L, 10000L + i * 300L, Seq("click", "purchase")))

      case "absorbing_chain" =>
        // path graph c1-s1-c2-s2-c3 (no cycle: BFS hop layering, leaf
        // PageRank); journeys funnel into a self-looping sink type and
        // one type appears ONLY as next_type (q367's shed-mass path)
        (1 to 3).foreach(k => addCust(k.toLong, if (k == 1) 3 else 6))
        (1 to 2).foreach(k => addSupp(k.toLong, if (k == 1) 0 else 2))
        addOrder(1L, Seq((1L, 1L), (1L, 2L)))
        addOrder(1L, Seq((1L, 1L), (1L, 2L)))
        addOrder(2L, Seq((1L, 2L), (2L, 3L)))
        addOrder(2L, Seq((1L, 2L), (2L, 3L)))
        addOrder(3L, Seq((2L, 4L)))
        (1 to 3).foreach { u =>
          journey(u.toLong, u * 1000L,
            Seq("view", "click", "purchase", "purchase", "purchase"))
        }
        journey(4L, 9000L, Seq("view", "error")) // error: next_type only

      case other =>
        throw new IllegalArgumentException(s"unknown fuzz class: $other")
    }
    (line.toSeq, ord.toSeq, cust.toSeq, supp.toSeq, ev.toSeq)
  }

  /** Materialize one fixture's five tables under `<dir>/`. */
  def write(spark: SparkSession, cls: String, seed: Long,
            dir: String): Unit = {
    import scala.jdk.CollectionConverters._
    val (l, o, c, s, e) = rows(cls, seed)
    def dump(rs: Seq[Row], sch: StructType, tab: String): Unit =
      spark.createDataFrame(rs.asJava, sch)
        .repartition(1) // one writer task → exactly one part file, even empty
        .write.mode("overwrite").parquet(s"$dir/$tab.parquet")
    dump(l, FuzzRelationalFixtures.lineitemSchema, "lineitem")
    dump(o, FuzzRelationalFixtures.ordersSchema, "orders")
    dump(c, FuzzRelationalFixtures.customerSchema, "customer")
    dump(s, supplierSchema, "supplier")
    dump(e, FuzzFixtures.schema, "events")
  }
}
