package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Seeded adversarial `documents` fixture generator — the text-analysis
  * arm of the differential fuzz gate. The synthetic corpus is a
  * single-space word soup with 40–560 chars per doc; these classes
  * concentrate what it never contains: empty corpora, empty strings,
  * one-token docs, fully identical docs (dedup collapses everything),
  * fully disjoint vocabularies (no pair shares a shingle), one token
  * repeated (type-token ratio → 0, vocabulary of size 1), consecutive
  * spaces (empty tokens — `split(text, ' ')` and DuckDB
  * `string_split` both keep them, so the comparison is well-defined
  * and any one-sided length>0 filter is a gate-worthy asymmetry), and
  * single-lang/single-source skew.
  *
  * Determinism contract identical to [[FuzzFixtures]]; n_chars is
  * always length(text) (the real corpus's invariant).
  */
object FuzzDocsFixtures {

  /** Adversarial classes, one dimension of nastiness each. */
  val Classes: Seq[String] = Seq(
    "baseline",       // plain word soup (control group)
    "empty_corpus",   // zero documents
    "one_doc",        // a single document
    "empty_text",     // some docs are the empty string (n_chars = 0)
    "single_token",   // every doc exactly one word
    "identical_docs", // all docs byte-identical
    "disjoint_vocab", // no two docs share any token
    "repeated_token", // each doc = one word repeated many times
    "multi_space",    // consecutive spaces → empty tokens on both engines
    "source_skew",    // one lang, one source for the whole corpus
    "long_doc")       // one 4000-token doc among shorts (MATTR/chunk windows)

  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("text", StringType, nullable = false),
    StructField("lang", StringType, nullable = false),
    StructField("source", StringType, nullable = false),
    StructField("n_chars", LongType, nullable = false)))

  private val Vocab = Vector("the", "fast", "key", "order", "sort",
    "table", "scan", "merge", "part", "window", "small", "hash", "join",
    "batch", "stream", "spark", "dup", "data", "slow", "filter",
    "customer", "line", "value", "group", "query", "row", "big",
    "column", "vector", "agg", "a")
  private val Langs = Vector("en", "de", "es", "fr", "zh")

  /** Deterministic rows for one (class, seed) fixture. */
  def rows(cls: String, seed: Long): Seq[Row] = {
    val r = new java.util.Random(seed * 9973L + cls.hashCode)
    def word(): String = Vocab(r.nextInt(Vocab.size))
    def soup(n: Int): String = Seq.fill(n)(word()).mkString(" ")
    def lang(): String = Langs(r.nextInt(Langs.size))
    def source(): String = s"src${r.nextInt(20)}"
    val buf = scala.collection.mutable.ArrayBuffer[Row]()
    var id = 0L
    def add(text: String, lg: String = null, src: String = null): Unit = {
      id += 1
      buf += Row(id, text, Option(lg).getOrElse(lang()),
        Option(src).getOrElse(source()), text.length.toLong)
    }
    cls match {
      case "baseline" =>
        (1 to 50 + r.nextInt(30)).foreach(_ => add(soup(20 + r.nextInt(60))))
      case "empty_corpus" => ()
      case "one_doc" => add(soup(25))
      case "empty_text" =>
        (1 to 40).foreach { i =>
          if (i % 3 == 0) add("") else add(soup(10 + r.nextInt(30)))
        }
      case "single_token" =>
        (1 to 45).foreach(_ => add(word()))
      case "identical_docs" =>
        val t = soup(30)
        (1 to 40).foreach(_ => add(t))
      case "disjoint_vocab" =>
        (1 to 30).foreach { i =>
          val n = 8 + r.nextInt(20)
          add((1 to n).map(j => s"w${i}x$j").mkString(" "))
        }
      case "repeated_token" =>
        (1 to 35).foreach { _ =>
          val w = word()
          add(Seq.fill(10 + r.nextInt(90))(w).mkString(" "))
        }
      case "multi_space" =>
        (1 to 40).foreach { _ =>
          // random runs of 1–3 spaces between words, plus leading or
          // trailing space on some docs — empty tokens on both engines
          val words = Seq.fill(8 + r.nextInt(25))(word())
          val body = words.map(w => w + (" " * (1 + r.nextInt(3))))
            .mkString.stripSuffix(" ")
          val t = r.nextInt(4) match {
            case 0 => " " + body
            case 1 => body + " "
            case _ => body
          }
          add(t)
        }
      case "source_skew" =>
        (1 to 50).foreach(_ => add(soup(15 + r.nextInt(40)), "en", "src0"))
      case "long_doc" =>
        add(soup(4000))
        (1 to 12).foreach(_ => add(soup(5 + r.nextInt(15))))
      case other =>
        throw new IllegalArgumentException(s"unknown fuzz class: $other")
    }
    buf.toSeq
  }

  /** Materialize one fixture as `<dir>/documents.parquet`. */
  def write(spark: SparkSession, cls: String, seed: Long,
            dir: String): Unit = {
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(rows(cls, seed).asJava, schema)
      .repartition(1) // one writer task → exactly one part file, even empty
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
  }
}
