package graft

import java.sql.Timestamp

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types._

/** Seeded degenerate-input fixture generator for the seeded-ML arm of
  * the differential fuzz gate (VERDICT r14 item 2): ALS
  * (q52/q53/q55/q56 + the q186/q190 structural oracles), KMeans
  * (q33/q35), IVF (q37), and the sketch family (q16 HLL,
  * q187/q189/q191 KMV, q234 HLL oracle). Arms 1–6 caught 31 real
  * defects in families that were "fully green" for rounds; this is the
  * last family that had hand pins only.
  *
  * Each fixture materializes EVERY table the family reads — events
  * (the MovieLens-shaped ratings fact: `props.$.k` = item, `value` =
  * rating), embeddings, and lineitem/orders/customer (q16's HLL scan
  * and q35's RFM segmentation) — so any query of the family runs on
  * any fixture. Classes concentrate the shapes the sf corpora never
  * contain: empty train, a single user, a one-item catalog under a
  * top-20 recommender, rank-50 fits over a 3-item catalog, constant
  * ratings and zero-variance RFM (σ = 0 standardization), validation
  * items all cold under coldStartStrategy=drop (empty eval frame),
  * one-rating users (empty validation split), NULL ratings/items,
  * k > n and single-point KMeans corpora, an empty IVF corpus side,
  * and same-instant duplicate re-ratings.
  *
  * Determinism contract identical to [[FuzzFixtures]]: everything
  * derives from `new java.util.Random(seed * prime + cls.hashCode)`;
  * values are exactly representable (cents doubles, k/1024 floats).
  */
object FuzzMlFixtures {

  /** Adversarial classes, one dimension of nastiness each. */
  val Classes: Seq[String] = Seq(
    "baseline",         // healthy small tables (control group)
    "empty_all",        // every table zero rows (empty train / sketches)
    "single_user",      // one user carries every rating
    "single_item",      // one-item catalog under a top-20 recommender
    "constant_ratings", // all ratings identical; zero-variance RFM
    "few_items",        // 3-item catalog under the rank-50 q56 fit
    "cold_val_items",   // every validation item unseen in train (drop ⇒ empty eval)
    "one_rating_users", // every user exactly one rating (validation empty)
    "null_ratings",     // NULL value / NULL props / propless-k mixtures
    "tiny_embeddings",  // 4 vectors, all vec_id < 10 (IVF corpus empty; k > n)
    "identical_embeddings", // byte-identical vectors (one distinct point)
    "duplicated_embeddings", // 2 distinct vectors × many copies: k ≤ n yet
                        // the row-sampled init can COLLAPSE (ADVICE r15)
    "rating_ties")      // same-instant bursts + duplicate (user,item) re-ratings

  /** 2024-01-01T00:00:00Z — keeps normalized ts ≥ 0 (day-math contract). */
  val BaseMs = 1704067200000L

  val eventsSchema: StructType = FuzzFixtures.schema
  val embeddingsSchema: StructType = FuzzEmbeddingsFixtures.schema
  val Dim: Int = FuzzEmbeddingsFixtures.Dim

  private def ts(offsetS: Long) = new Timestamp(BaseMs + offsetS * 1000L)

  /** One rating event: `props.$.k` is the item, `value` the rating. */
  private def rating(id: Long, u: Long, offS: Long, item: java.lang.Integer,
                     v: java.lang.Double, et: String = "rate"): Row = {
    val props = if (item == null) null else s"""{"k":$item}"""
    Row(id, ts(offS), u, et, v, props)
  }

  /** Deterministic `events` rows (the ratings fact) for one fixture. */
  def eventRows(cls: String, seed: Long): Seq[Row] = {
    val r = new java.util.Random(seed * 9013L + cls.hashCode)
    def stars(): java.lang.Double =
      Double.box((2 + r.nextInt(7)).toDouble / 2.0) // 1.0 .. 4.0 halves
    val buf = scala.collection.mutable.ArrayBuffer[Row]()
    var id = 0L
    def add(u: Long, offS: Long, item: java.lang.Integer,
            v: java.lang.Double, et: String = "rate"): Unit = {
      id += 1
      buf += rating(id, u, offS, item, v, et)
    }
    cls match {
      case "baseline" =>
        (1 to 20).foreach { u =>
          (0 until 6 + r.nextInt(7)).foreach { _ =>
            add(u.toLong, r.nextInt(259200).toLong,
              Int.box(1 + r.nextInt(30)), stars())
          }
        }
      case "empty_all" => ()
      case "single_user" =>
        (0 until 40).foreach { _ =>
          add(7L, r.nextInt(259200).toLong, Int.box(1 + r.nextInt(25)),
            stars())
        }
      case "single_item" =>
        (1 to 18).foreach { u =>
          (0 until 5 + r.nextInt(6)).foreach { _ =>
            add(u.toLong, r.nextInt(259200).toLong, Int.box(1), stars())
          }
        }
      case "constant_ratings" =>
        (1 to 15).foreach { u =>
          (0 until 8).foreach { _ =>
            add(u.toLong, r.nextInt(259200).toLong,
              Int.box(1 + r.nextInt(20)), Double.box(3.0))
          }
        }
      case "few_items" =>
        (1 to 15).foreach { u =>
          (0 until 6 + r.nextInt(5)).foreach { _ =>
            add(u.toLong, r.nextInt(259200).toLong, Int.box(1 + r.nextInt(3)),
              stars())
          }
        }
      case "cold_val_items" =>
        // 4 ratings per user: rn 1–3 over a shared 10-item catalog
        // (splits 0/1/2 = train), rn 4 (split 3 = validation) on an item
        // unique to that user — every validation item is cold, so
        // coldStartStrategy=drop empties the RMSE eval frame.
        (1 to 16).foreach { u =>
          (0 until 3).foreach { i =>
            add(u.toLong, (u * 1000 + i * 100).toLong,
              Int.box(1 + r.nextInt(10)), stars())
          }
          add(u.toLong, (u * 1000 + 900).toLong, Int.box(1000 + u), stars())
        }
      case "one_rating_users" =>
        (1 to 30).foreach { u =>
          add(u.toLong, r.nextInt(259200).toLong, Int.box(1 + r.nextInt(12)),
            stars())
        }
      case "null_ratings" =>
        (1 to 15).foreach { u =>
          (0 until 6).foreach { _ =>
            val roll = r.nextInt(10)
            val item: java.lang.Integer =
              if (roll < 2) null else Int.box(1 + r.nextInt(15))
            val v: java.lang.Double = if (roll >= 2 && roll < 4) null
              else stars()
            if (roll < 1) {
              // props present but without $.k → item extracts NULL
              id += 1
              buf += Row(id, ts(r.nextInt(259200).toLong), u.toLong, "rate",
                v, """{"src":"fuzz"}""")
            } else add(u.toLong, r.nextInt(259200).toLong, item, v)
          }
        }
      case "tiny_embeddings" | "identical_embeddings"
         | "duplicated_embeddings" =>
        // healthy ratings — these classes stress the embeddings table
        (1 to 12).foreach { u =>
          (0 until 5 + r.nextInt(4)).foreach { _ =>
            add(u.toLong, r.nextInt(259200).toLong,
              Int.box(1 + r.nextInt(20)), stars())
          }
        }
      case "rating_ties" =>
        (1 to 12).foreach { u =>
          val t = r.nextInt(86400).toLong
          val item = 1 + r.nextInt(8)
          // same-instant burst incl. a duplicate (user, item) re-rating
          add(u.toLong, t, Int.box(item), stars())
          add(u.toLong, t, Int.box(item), stars())
          (0 until 4).foreach { _ =>
            add(u.toLong, t, Int.box(1 + r.nextInt(8)), stars())
          }
        }
      case other =>
        throw new IllegalArgumentException(s"unknown fuzz class: $other")
    }
    buf.toSeq
  }

  /** Deterministic `embeddings` rows. Healthy 40-vector corpus except
    * for the two embedding-adversarial classes; empty_all stays empty. */
  def embeddingRows(cls: String, seed: Long): Seq[Row] = {
    val r = new java.util.Random(seed * 9013L + cls.hashCode + 17)
    def comp(): Float = (r.nextInt(2049) - 1024).toFloat / 1024.0f
    def vec(): Seq[Float] = Seq.fill(Dim)(comp())
    cls match {
      case "empty_all" => Seq.empty
      case "tiny_embeddings" =>
        // 4 vectors, ids 0–3: q37's corpus side (vec_id ≥ 10) is EMPTY
        // and both KMeans (k=10) and the IVF quantizer (cells=16) see
        // fewer points than centroids.
        (0 until 4).map(i => Row(i.toLong, vec(), i % 2))
      case "identical_embeddings" =>
        val v = vec()
        (0 until 30).map(i => Row(i.toLong, v, i % 3))
      case "duplicated_embeddings" =>
        // 2 distinct vectors, 27:3 — k clamps to 2, but spark.ml's
        // row-sampled random init picks the majority vector twice with
        // high probability, dedups to ONE center, and (unguarded) hits
        // the blockified aggregator's AIOOBE even though k ≤ n_distinct.
        // Exercises SafeKMeans' collapse retry through q33 AND the IVF
        // quantizer (ids 10–29 form the q37 corpus side).
        val a = vec(); val b = vec()
        (0 until 30).map(i => Row(i.toLong, if (i % 10 == 9) b else a, i % 3))
      case _ =>
        (0 until 40).map(i => Row(i.toLong, vec(), r.nextInt(5)))
    }
  }

  /** Deterministic lineitem/orders/customer rows (q16's HLL scan, q35's
    * RFM segmentation). constant_ratings doubles as the zero-variance
    * RFM class: one same-priced, same-day order per customer makes
    * stddev_pop 0 on all three features. */
  def relationalRows(cls: String, seed: Long):
      (Seq[Row], Seq[Row], Seq[Row]) = {
    val r = new java.util.Random(seed * 9013L + cls.hashCode + 31)
    def cents(maxUnits: Int): Double =
      (1 + r.nextInt(maxUnits * 100)).toDouble / 100.0
    def day(offsetDays: Int) =
      new Timestamp(BaseMs + offsetDays * 86400000L)
    val segs = Seq("MACHINERY", "HOUSEHOLD", "AUTOMOBILE", "FURNITURE",
      "BUILDING")
    val cust = scala.collection.mutable.ArrayBuffer[Row]()
    val ord = scala.collection.mutable.ArrayBuffer[Row]()
    val line = scala.collection.mutable.ArrayBuffer[Row]()
    var ok = 0L
    def addCust(k: Long): Unit =
      cust += Row(k, f"Customer#$k%09d", r.nextInt(25), cents(1000),
        segs(r.nextInt(segs.size)))
    def addOrder(custKey: Long, total: Double, d: Timestamp): Unit = {
      ok += 1
      ord += Row(ok, custKey, Seq("O", "F", "P")(r.nextInt(3)), total, d,
        "3-MEDIUM")
    }
    def addLine(orderKey: Long, ln: Int): Unit =
      line += Row(orderKey, 1L + r.nextInt(25), 1L + r.nextInt(6), ln,
        (1 + r.nextInt(20)).toDouble, cents(500),
        r.nextInt(11).toDouble / 100.0, r.nextInt(9).toDouble / 100.0,
        Seq("A", "N", "R")(r.nextInt(3)), Seq("O", "F")(r.nextInt(2)),
        day(r.nextInt(60)))
    cls match {
      case "empty_all" => ()
      case "constant_ratings" =>
        (1L to 8L).foreach { k =>
          addCust(k)
          addOrder(k, 100.0, day(5)) // one order each: F=1, M=100, same day
          addLine(ok, 1)
        }
      case _ =>
        (1L to 8L).foreach { k =>
          addCust(k)
          (0 until 1 + r.nextInt(3)).foreach { _ =>
            addOrder(k, cents(2000), day(r.nextInt(60)))
            (1 to 1 + r.nextInt(3)).foreach(ln => addLine(ok, ln))
          }
        }
    }
    (cust.toSeq, ord.toSeq, line.toSeq)
  }

  /** Materialize one fixture: all five tables under `dir`. */
  def write(spark: SparkSession, cls: String, seed: Long,
            dir: String): Unit = {
    import scala.jdk.CollectionConverters._
    def put(rows: Seq[Row], schema: StructType, table: String): Unit =
      spark.createDataFrame(rows.asJava, schema)
        .repartition(1) // one writer task → exactly one part file, even empty
        .write.mode("overwrite").parquet(s"$dir/$table.parquet")
    put(eventRows(cls, seed), eventsSchema, "events")
    put(embeddingRows(cls, seed), embeddingsSchema, "embeddings")
    val (c, o, l) = relationalRows(cls, seed)
    put(c, FuzzRelationalFixtures.customerSchema, "customer")
    put(o, FuzzRelationalFixtures.ordersSchema, "orders")
    put(l, FuzzRelationalFixtures.lineitemSchema, "lineitem")
  }
}
