package graft

import graft.queries.TextQueries
import graft.text.TextAnalysis._

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TextSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._
  val sf = GraftSpark.sf

  test("shingles: 'a b c d' → {'a b c','b c d'}") {
    val df = Seq((1L, "a b c d")).toDF("doc_id", "text")
    val got = shingles(df, "doc_id", "text", 3)
      .select("shingle").as[String].collect().toSet
    assert(got == Set("a b c", "b c d"))
  }

  test("shingles: doc shorter than n produces no rows") {
    val df = Seq((1L, "a b")).toDF("doc_id", "text")
    assert(shingles(df, "doc_id", "text", 3).count() == 0)
  }

  test("shingleJaccardPairs: exact jaccard on hand-computed fixture") {
    // A={x,y,z}, B={y,z,w} → J = 2/4 = 0.5
    val sh = Seq((1L, "x"), (1L, "y"), (1L, "z"), (2L, "y"), (2L, "z"), (2L, "w"))
      .toDF("doc_id", "shingle")
    val got = shingleJaccardPairs(sh, "doc_id", 0.0).collect().head
    assert(got.getAs[Long]("shared") == 2L)
    assert(got.getAs[Double]("jaccard") == 0.5)
  }

  test("minhash estimate tracks exact jaccard (identical docs → est 1.0)") {
    val df = Seq((1L, "a b c d e f"), (2L, "a b c d e f"), (3L, "q r s t u v"))
      .toDF("doc_id", "text")
    val sigs = minhashSignatures(
      shingles(df, "doc_id", "text", 3).withColumnRenamed("shingle", "token"),
      "doc_id", 16)
    val cands = lshCandidatePairs(sigs, "doc_id", 4)
    val est = estimatedJaccard(cands, sigs, "doc_id", 16).collect()
    assert(est.length == 1) // only (1,2) collide; 3 shares nothing
    val r = est.head
    assert(r.getAs[Long]("id_a") == 1L && r.getAs[Long]("id_b") == 2L)
    assert(r.getAs[Double]("est_jaccard") == 1.0)
  }

  test("simhash: identical docs get identical fingerprints, fingerprint >= 0") {
    val df = Seq((1L, "a b c"), (2L, "a b c"), (3L, "x y z w")).toDF("doc_id", "text")
    val fp = simhash(df, "doc_id", "text").orderBy("doc_id")
      .select("simhash").as[Long].collect()
    assert(fp(0) == fp(1))
    assert(fp.forall(_ >= 0L))
    assert(fp(0) != fp(2))
  }

  test("languageClassify: learns separable profiles") {
    val df = Seq(
      (1L, "aa bb cc", "x"), (2L, "aa bb dd", "x"),
      (3L, "zz yy ww", "y"), (4L, "zz yy vv", "y"))
      .toDF("doc_id", "text", "lang")
    val got = languageClassify(df, "doc_id", "text", "lang")
      .orderBy("doc_id").select("predicted").as[String].collect().toSeq
    assert(got == Seq("x", "x", "y", "y"))
  }

  test("exact dedup groups duplicates under min doc_id") {
    val got = TextQueries.q23(spark, sf)
    assert(got.count() > 0)
    assert(got.agg(min(col("n_copies"))).as[Long].head() >= 1L)
  }

  test("q26 and q27 agree on the planted near-dup pairs at sf0.001") {
    val exact = TextQueries.q26(spark, sf).select("id_a", "id_b")
      .as[(Long, Long)].collect().toSet
    val lsh = TextQueries.q27(spark, sf).select("id_a", "id_b")
      .as[(Long, Long)].collect().toSet
    assert(exact == lsh)
  }

  test("tfidfCosinePairs: identical docs score 1.0 and rank first") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the dog"),
      (2L, "the quick brown fox jumps over the dog"),
      (3L, "completely different words appear in here now"),
      (4L, "the quick brown fox naps under a tree"))
      .toDF("doc_id", "text")
    val got = tfidfCosinePairs(docs, "doc_id", "text", n = 3, maxDf = 20, k = 10)
      .select("id_a", "id_b", "cosine").as[(Long, Long, Double)].collect()
    assert(got.head == ((1L, 2L, 1.0))) // exact duplicate tops the list
    // doc 3 shares no shingle with anyone → never materializes as a pair
    assert(!got.exists(p => p._1 == 3L || p._2 == 3L))
    // the partial overlap (1,4)/(2,4) scores strictly between 0 and 1
    assert(got.tail.forall(p => p._3 > 0.0 && p._3 < 1.0))
  }

  test("chunkDocuments: grid boundaries, overlap, and the short-doc case") {
    val docs = Seq(
      (1L, (1 to 10).map(i => s"t$i").mkString(" ")), // len 10
      (2L, "a b c"))                                  // shorter than one chunk
      .toDF("doc_id", "text")
    val got = chunkDocuments(docs, "doc_id", "text", chunkSize = 8, stride = 4)
      .select("doc_id", "chunk_id", "chunk_len", "chunk")
      .as[(Long, Long, Long, String)].collect().toSet
    // len 10, size 8, stride 4 → ⌈(10−8)/4⌉+1 = 2 chunks: tokens 1–8 and
    // 5–10 (the trailing short window, NOT a third fully-contained one)
    assert(got == Set(
      (1L, 0L, 8L, (1 to 8).map(i => s"t$i").mkString(" ")),
      (1L, 1L, 6L, (5 to 10).map(i => s"t$i").mkString(" ")),
      (2L, 0L, 3L, "a b c")))
  }

  test("q89 normalization: hand case and idempotence on real docs") {
    val got = graft.queries.TextQueries.q89(spark, sf)
    // idempotence: normalizing an already-normal string changes nothing
    val renorm = got.select(
      col("doc_id"), col("norm"),
      trim(regexp_replace(regexp_replace(lower(col("norm")),
        "[^a-z0-9 ]", ""), " +", " ")).as("norm2"))
    assert(renorm.filter(col("norm") =!= col("norm2")).count() == 0)
    // n_tokens is consistent with the normalized text
    val bad = got.filter(col("n_tokens") =!=
      when(col("norm") === "", lit(0L))
        .otherwise(size(split(col("norm"), " ")).cast("long"))).count()
    assert(bad == 0)
  }

  test("packSequences: offsets, bin spans, and boundary straddlers") {
    def words(n: Int) = (1 to n).map(_ => "w").mkString(" ")
    val docs = Seq(
      (1L, "g", words(100)), // [0,100)   → bins 0..0
      (2L, "g", words(50)),  // [100,150) → bins 0..1 (straddles 128)
      (3L, "g", words(30)),  // [150,180) → bins 1..1
      (9L, "h", words(10)))  // other group packs independently from 0
      .toDF("doc_id", "grp", "text")
    val got = graft.text.TextAnalysis
      .packSequences(docs, "doc_id", "text", Seq("grp"), budget = 128)
      .select("doc_id", "off_tokens", "first_bin", "last_bin")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == Set(
      (1L, 0L, 0L, 0L), (2L, 100L, 0L, 1L), (3L, 150L, 1L, 1L),
      (9L, 0L, 0L, 0L)))
  }

  test("redactPii masks emails and URLs, leaves clean text intact") {
    val df = Seq(
      (1L, "write to a.b+tag@sub.domain.org today"),
      (2L, "see https://x.io/path?q=1&r=2 and http://plain.example/z"),
      (3L, "both j@d.co http://u.v/w here"),
      (4L, "no pii at all"),
      (5L, "not-an-email @ half http:/broken")).toDF("doc_id", "text")
    val got = df.select(col("doc_id"), redactPii(col("text")).as("r"))
      .as[(Long, String)].collect().toMap
    assert(got(1L) == "write to <EMAIL> today")
    assert(got(2L) == "see <URL> and <URL>")
    assert(got(3L) == "both <EMAIL> <URL> here")
    assert(got(4L) == "no pii at all")
    // malformed candidates must NOT be masked (no false positives)
    assert(got(5L) == "not-an-email @ half http:/broken")
    // idempotent: a redacted string redacts to itself
    val twice = df.select(redactPii(redactPii(col("text"))).as("r"))
      .as[String].collect().toSet
    assert(twice == got.values.toSet)
  }

  test("tfidfCosinePairs: a shingle over the df cap contributes no pairs") {
    // 3 identical docs, maxDf = 2: every shingle has df = 3 > cap, the
    // vocabulary is empty, and the pair join must produce ZERO rows —
    // the quadratic-fan-out valve doing its job.
    val docs = Seq((1L, "a b c d"), (2L, "a b c d"), (3L, "a b c d"))
      .toDF("doc_id", "text")
    assert(tfidfCosinePairs(docs, "doc_id", "text", n = 3, maxDf = 2, k = 10)
      .count() == 0)
  }

  test("bigram LM: hand-computed MLE log-likelihoods; short docs dropped") {
    // Corpus bigrams: (a,b) x2, (a,c) x1 -> P(b|a)=2/3, P(c|a)=1/3.
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "a c"), (4L, "solo"))
      .toDF("doc_id", "text")
    val got = graft.text.LangModel
      .bigramLogLikelihood(docs, "doc_id", "text")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(got.keySet == Set(1L, 2L, 3L)) // doc 4 has no bigram
    assert(got(1L) == ((1L, 1L, math.rint(math.log(2.0 / 3) * 1e6) / 1e6)))
    assert(got(3L) == ((3L, 1L, math.rint(math.log(1.0 / 3) * 1e6) / 1e6)))
  }

  test("bpe pair counts: vocab-weighted adjacent pairs, 1-char words skipped") {
    // vocab: abc x2 (pairs ab, bc), de x1 (pair de), "x" skipped.
    val docs = Seq((1L, "abc de x"), (2L, "abc")).toDF("doc_id", "text")
    val got = graft.text.LangModel.bpePairCounts(docs, "text")
      .as[(String, Long)].collect().toMap
    assert(got == Map("ab" -> 2L, "bc" -> 2L, "de" -> 1L))
  }

  test("q223 lift_ppm matches BigInt half-up recompute; support floor holds") {
    val rows = graft.queries.Registry.all("q223_word_associations")(
      spark, sf).collect()
    assert(rows.nonEmpty)
    val nDocs = graft.io.Tables.documents(spark, sf).count()
    rows.foreach { r =>
      val (nab, dfa, dfb) = (BigInt(r.getAs[Long]("n_ab")),
        BigInt(r.getAs[Long]("df_a")), BigInt(r.getAs[Long]("df_b")))
      assert(nab >= 20)
      assert(nab <= dfa.min(dfb)) // pair support bounded by either df
      val want = (2 * nab * nDocs * 1000000 + dfa * dfb) / (2 * dfa * dfb)
      assert(BigInt(r.getAs[Long]("lift_ppm")) == want, r.toString)
    }
    // ranking is by descending lift with the (ta, tb) tiebreak
    val lifts = rows.map(_.getAs[Long]("lift_ppm")).toSeq
    assert(lifts == lifts.sortBy(-_))
  }

  test("q230 threshold sweep shrinks monotonically with the agreement floor") {
    val rows = graft.queries.Registry.all("q230_dedup_threshold_sweep")(
      spark, sf).orderBy("min_agree").collect()
    assert(rows.nonEmpty)
    Seq("n_pairs", "n_docs_affected").foreach { c =>
      val v = rows.map(_.getAs[Long](c)).toSeq
      assert(v == v.sorted.reverse, s"$c not non-increasing: $v")
    }
    rows.foreach { r =>
      assert(r.getAs[Long]("n_docs_affected") <= 2 * r.getAs[Long]("n_pairs"))
      val want = math.floor(r.getAs[Long]("n_docs_affected").toDouble /
        r.getAs[Long]("n_docs") * 1e6 + 0.5) / 1e6
      assert(r.getAs[Double]("pct_docs") == want)
    }
  }

  test("q224 vocabulary growth is monotone and ends at the full corpus") {
    val rows = graft.queries.Registry.all("q224_heaps_vocab_growth")(
      spark, sf).orderBy("decile").collect()
    assert(rows.length == 10)
    Seq("n_docs", "n_tokens", "vocabulary").foreach { c =>
      val v = rows.map(_.getAs[Long](c)).toSeq
      assert(v == v.sorted, s"$c not monotone: $v")
    }
    val docs = graft.io.Tables.documents(spark, sf)
    assert(rows.last.getAs[Long]("n_docs") == docs.count())
    val fullVocab = docs
      .select(explode(split(col("text"), " ")).as("t"))
      .filter(length(col("t")) > 0).select("t").distinct().count()
    assert(rows.last.getAs[Long]("vocabulary") == fullVocab)
  }
}
