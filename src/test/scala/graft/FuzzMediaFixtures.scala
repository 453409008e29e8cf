package graft

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types._

/** Seeded degenerate-input fixture generator for the MEDIA/MULTIMODAL
  * arm of the differential fuzz gate (VERDICT r15 item 2) — the last
  * oracle-gated family (q60/q67/q68/q195, q324–q329) with no
  * adversarial sweep. Arms 1–9 averaged ~5 real defects per family on
  * first sweep; this arm's first find was the NULL-payload NPE in every
  * `mapPartitions` Media function (fixed in
  * [[graft.multimodal.Media]] round 16 with DuckDB-probed mirror
  * semantics).
  *
  * Each fixture writes BOTH tables the family reads — `documents` (the
  * media store stand-in: payload = text bytes, kind cycles
  * image/audio/video by `doc_id % 3`) and `embeddings` (the
  * caption↔vector link of q325/q326/q329). Classes concentrate what
  * the sf corpora never contain: empty stores, single-asset corpora
  * (with and without any video), zero-byte and NULL payloads, payload
  * lengths pinned to the resample (128) and frame (256) boundaries,
  * byte-identical payloads (all-pairs phash collisions), NULL
  * caption/source/embedding mixtures including missing-on-either-side
  * linkage, duplicate asset ids on both tables, single-modality
  * corpora (no cross-kind pair can exist), and shared-prefix re-edits
  * (the q327 partial-frame-match shape).
  *
  * Determinism contract identical to [[FuzzFixtures]]: everything
  * derives from `new java.util.Random(seed * prime + cls.hashCode)`;
  * payloads are printable ASCII (the oracles' documented byte==char
  * contract), embedding components k/1024 floats.
  */
object FuzzMediaFixtures {

  /** Adversarial classes, one dimension of nastiness each. */
  val Classes: Seq[String] = Seq(
    "baseline",           // healthy mixed-kind store + planted cross-modal dups
    "empty_corpus",       // zero assets, zero embeddings
    "one_video",          // a single asset, and it is a video
    "one_image",          // a single asset, and NO video exists at all
    "empty_payloads",     // zero-byte payloads among tiny 1-3 byte ones
    "boundary_lengths",   // lengths at the 128-resample / 256-frame edges
    "identical_payloads", // all payloads byte-identical (max dup_pct)
    "null_payloads",      // NULL payload / NULL source / NULL lang mixtures
    "null_embeddings",    // NULL vectors, NULL labels,
                          // captions without embeddings and vice versa
    "duplicate_ids",      // duplicate doc_id AND duplicate vec_id rows
    "all_video",          // single-modality store (no cross-kind pairs)
    "shared_prefix")      // re-edits: same head bytes, divergent tails

  val docsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("text", StringType, nullable = true),
    StructField("lang", StringType, nullable = true),
    StructField("source", StringType, nullable = true),
    StructField("n_chars", LongType, nullable = true)))

  val embSchema: StructType = StructType(Seq(
    StructField("vec_id", LongType, nullable = false),
    // containsNull=false IS the column contract (matches the production
    // corpus; see the null_embeddings scaladoc) — whole-ROW NULLs are
    // in contract via nullable=true.
    StructField("embedding", ArrayType(FloatType, containsNull = false),
      nullable = true),
    StructField("label", IntegerType, nullable = true)))

  val Dim = 64

  private val Vocab = Vector("pixel", "frame", "wave", "clip", "shot",
    "tone", "byte", "scan", "codec", "track", "image", "audio", "video",
    "media", "store", "decode", "sample", "hash", "band", "dup")

  /** Deterministic `documents` (media-store) rows for one fixture. */
  def docRows(cls: String, seed: Long): Seq[Row] = {
    val r = new java.util.Random(seed * 7717L + cls.hashCode)
    def word(): String = Vocab(r.nextInt(Vocab.size))
    def soup(n: Int): String = Seq.fill(n)(word()).mkString(" ")
    /** Exactly len printable-ASCII chars (payload length control). */
    def payload(len: Int): String = {
      val sb = new StringBuilder
      while (sb.length < len) sb.append((33 + r.nextInt(94)).toChar)
      sb.substring(0, len)
    }
    def src(): String = s"crawl${r.nextInt(4)}"
    val buf = scala.collection.mutable.ArrayBuffer[Row]()
    def add(id: Long, text: String, lg: String = "en",
            sc: String = null): Unit =
      buf += Row(id, text, lg, Option(sc).getOrElse(src()),
        if (text == null) null else Long.box(text.length.toLong))
    cls match {
      case "baseline" =>
        // ids 1..30 cycle the kinds; a planted SAME-payload pair across
        // kinds (4: audio? no — 4%3=1 audio, 5%3=2 video) and identical
        // embeddings for (1, 2) feed q326/q329 positives.
        (1L to 30L).foreach(id => add(id, soup(8 + r.nextInt(60))))
        add(31L, buf(3).getString(1)) // 31%3=1 audio, copies id 4's payload
      case "empty_corpus" => ()
      case "one_video" => add(2L, soup(70)) // 2 % 3 = 2 → video
      case "one_image" => add(3L, soup(40)) // 3 % 3 = 0 → image, no videos
      case "empty_payloads" =>
        (1L to 12L).foreach { id =>
          add(id, if (id % 3 == 0 || id == 5L) "" else payload(1 + r.nextInt(3)))
        }
      case "boundary_lengths" =>
        Seq(1, 2, 119, 127, 128, 129, 255, 256, 257, 300, 512)
          .zipWithIndex.foreach { case (len, i) =>
            add(i.toLong + 1L, payload(len))
          }
      case "identical_payloads" =>
        val t = soup(40)
        (1L to 15L).foreach(id => add(id, t))
      case "null_payloads" =>
        (1L to 18L).foreach { id =>
          if (id % 3 == 0 || id == 4L) add(id, null) // images + one audio
          else if (id % 5 == 0) add(id, soup(20), null, null) // NULL lang+source
          else add(id, soup(10 + r.nextInt(40)))
        }
        add(20L, null) // 20 % 3 = 2 → a NULL-payload VIDEO (frame path)
      case "null_embeddings" =>
        (1L to 16L).foreach(id => add(id, soup(12 + r.nextInt(30))))
        // ids 17/18: captions WITHOUT embeddings (see embRows)
        add(17L, soup(25)); add(18L, soup(25))
      case "duplicate_ids" =>
        (1L to 8L).foreach(id => add(id, soup(15 + r.nextInt(20))))
        add(3L, soup(22)) // same id, DIFFERENT payload
        add(5L, buf(4).getString(1)) // same id, SAME payload
      case "all_video" =>
        (1L to 10L).foreach(i => add(i * 3L + 2L, soup(20 + r.nextInt(40))))
      case "shared_prefix" =>
        val head = payload(300)
        (1L to 6L).foreach { i =>
          // same 300-byte head, divergent tails → frame 0 aligns, later
          // frames drift (the q327 n_close_frames < 4 shape)
          add(i, head + payload(60 * i.toInt))
        }
        add(8L, head) // 8 % 3 = 2 → video equal to the bare head
      case other =>
        throw new IllegalArgumentException(s"unknown fuzz class: $other")
    }
    buf.toSeq
  }

  /** Deterministic `embeddings` rows. Linked 1:1 to doc ids except where
    * the class's nastiness is the linkage itself. */
  def embRows(cls: String, seed: Long): Seq[Row] = {
    val r = new java.util.Random(seed * 7717L + cls.hashCode + 41)
    def comp(): Float = (r.nextInt(2049) - 1024).toFloat / 1024.0f
    def vec(): Seq[Float] = Seq.fill(Dim)(comp())
    def row(id: Long, v: Seq[Float], lbl: java.lang.Integer = null): Row =
      Row(id, v, if (lbl == null) Int.box(r.nextInt(5)) else lbl)
    val docIds = docRows(cls, seed).map(_.getLong(0)).distinct
    cls match {
      case "empty_corpus" => Seq.empty
      case "baseline" =>
        // identical vectors for ids 1 (audio? 1%3=1 audio) and 2 (video)
        // → a guaranteed cross-modal near-dup; the rest random.
        val shared = vec()
        docIds.map { id =>
          if (id == 1L || id == 2L) row(id, shared) else row(id, vec())
        }
      case "null_embeddings" =>
        // Whole-NULL vectors for some ids; NULL label; ids 17/18 get no
        // row (captions without embeddings); extra ids 90/91 have no doc
        // (embeddings without captions). ELEMENT-level NULLs are out of
        // contract by measurement: the production embedding schema is
        // containsNull=false, and DuckDB's list_inner_product REFUSES a
        // list containing NULL ("left argument can not contain NULL
        // values", probed in the first arm-10 sweep) — the oracle cannot
        // even express that shape, so the fixture stays inside the
        // column contract and stresses whole-row NULLs + linkage gaps.
        val linked = docIds.filterNot(id => id == 17L || id == 18L)
        linked.map { id =>
          if (id % 5 == 0) Row(id, null, Int.box(r.nextInt(5)))
          else if (id == 9L) Row(9L, vec(), null)
          else row(id, vec())
        } ++ Seq(row(90L, vec()), row(91L, vec()))
      case "duplicate_ids" =>
        docIds.map(id => row(id, vec())) :+ row(3L, vec()) // dup vec_id
      case _ =>
        docIds.map(id => row(id, vec()))
    }
  }

  /** Materialize one fixture: both tables under `dir`. */
  def write(spark: SparkSession, cls: String, seed: Long,
            dir: String): Unit = {
    import scala.jdk.CollectionConverters._
    def put(rows: Seq[Row], schema: StructType, table: String): Unit =
      spark.createDataFrame(rows.asJava, schema)
        .repartition(1) // one writer task → exactly one part file, even empty
        .write.mode("overwrite").parquet(s"$dir/$table.parquet")
    put(docRows(cls, seed), docsSchema, "documents")
    put(embRows(cls, seed), embSchema, "embeddings")
  }
}
