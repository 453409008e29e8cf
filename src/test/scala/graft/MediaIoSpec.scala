package graft

import java.nio.file.Files

import graft.io.Tables
import graft.multimodal.Media

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class MediaIoSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._
  val sf = GraftSpark.sf

  test("media featurize: deterministic, binary length preserved") {
    val feats = Media.featurize(spark, Media.mediaTable(Tables.documents(spark, sf)))
    val joined = feats.toDF().join(
      Tables.documents(spark, sf).select(col("doc_id").as("media_id"), col("n_chars")),
      "media_id")
    // ASCII corpus: byte length == char count.
    assert(joined.filter(col("n_bytes") =!= col("n_chars")).count() == 0)
    val a = feats.collect().sortBy(_.media_id).toSeq
    val b = feats.collect().sortBy(_.media_id).toSeq
    assert(a == b)
    assert(a.forall(f => f.width.exists(w => w >= 64 && w < 1088)))
  }

  test("media kinds cycle deterministically by id") {
    val kinds = Media.mediaTable(Tables.documents(spark, sf))
      .filter(col("media_id") < 3).orderBy("media_id")
      .select("kind").as[String].collect().toSeq
    assert(kinds == Seq("image", "audio", "video"))
  }

  test("CSV source/sink roundtrip preserves schema and data (S1/S3 parity)") {
    val dir = Files.createTempDirectory("graft-csv").toString + "/ratings"
    val schema = StructType(Seq(
      StructField("user_id", LongType), StructField("item_id", IntegerType),
      StructField("rating", DoubleType)))
    val orig = Tables.ratings(spark, sf).select("user_id", "item_id", "rating")
    Tables.writeCsv(orig, dir)
    val back = Tables.readCsv(spark, dir, schema)
    assert(back.schema == schema)
    assert(back.count() == orig.count())
    val sumOrig = orig.agg(sum(col("rating").cast("decimal(18,2)"))).head.getDecimal(0)
    val sumBack = back.agg(sum(col("rating").cast("decimal(18,2)"))).head.getDecimal(0)
    assert(sumOrig == sumBack)
  }

  test("frameSample: 4 frames per video, windows inside the payload, deterministic") {
    val media = Media.mediaTable(Tables.documents(spark, sf))
    val nVideos = media.filter(col("kind") === "video").count()
    val frames = Media.frameSample(spark, media, n = 4).collect()
    assert(frames.length == nVideos * 4)
    val sizes = Tables.documents(spark, sf)
      .filter(col("doc_id") % 3 === 2)
      .select(col("doc_id"), length(col("text")).as("l"))
      .as[(Long, Int)].collect().toMap
    frames.foreach { f =>
      val l = sizes(f.media_id)
      val off = f.off.get // healthy corpus: no NULL payloads
      assert(f.frame.length == math.min(256, l))
      assert(off >= 0 && off + f.frame.length <= l,
        s"frame window [$off, ${off + f.frame.length}) outside payload $l")
      if (f.frame_idx == 0) assert(off == 0L)
    }
    val again = Media.frameSample(spark, media, n = 4).collect()
    assert(frames.map(f => (f.media_id, f.frame_idx, f.off, f.frame.toSeq)).toSeq ==
      again.map(f => (f.media_id, f.frame_idx, f.off, f.frame.toSeq)).toSeq)
  }

  test("resample: stride-sampled to target length, short payloads pass through") {
    val media = Media.mediaTable(Tables.documents(spark, sf))
    val out = Media.resample(spark, media, targetLen = 128).collect()
    assert(out.length == media.count())
    val contents = media.select("media_id", "content")
      .as[(Long, Array[Byte])].collect().toMap
    out.foreach { r =>
      val c = contents(r.media_id)
      assert(r.n_bytes.contains(c.length))
      if (c.length <= 128) {
        assert(r.target_len.contains(c.length) && r.resized.toSeq == c.toSeq)
      } else {
        assert(r.target_len.contains(128) && r.resized.length == 128)
        // spot-check the stride arithmetic at both ends
        assert(r.resized(0) == c(0))
        assert(r.resized(127) == c((127L * c.length / 128).toInt))
      }
    }
  }

  test("perceptual hash: near-identical payloads collide, distinct ones don't (q195)") {
    val base = ("the quick brown fox jumps over the lazy dog " * 8).trim
    val near = base.updated(10, 'X') // one local edit
    val far = ("numbers 0123456789 and entirely different content here " * 8).trim
    val media = Seq(
      (1L, "image", base.getBytes("UTF-8"), "s"),
      (2L, "image", near.getBytes("UTF-8"), "s"),
      (3L, "image", far.getBytes("UTF-8"), "s"))
      .toDF("media_id", "kind", "content", "source")
    val h = Media.perceptualHash(spark, media).collect()
      .map(r => r.media_id -> r.phash).toMap
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(h.values.forall(p => p >= 0 && p < (1L << 60)),
      "phash must stay in 60 non-negative bits")
    // One byte edit perturbs at most one sampled gradient pair → the
    // pigeonhole bands (Hamming ≤ 3 guarantee) must catch the pair.
    assert(hamming(h(1L), h(2L)) <= 3,
      s"near-dup pair at hamming ${hamming(h(1L), h(2L))}")
    assert(hamming(h(1L), h(3L)) > 3,
      s"unrelated pair at hamming ${hamming(h(1L), h(3L))}")
    // Same payload, different kind wrapper → identical hash (byte-level
    // dedup transcends the media kind).
    val again = Media.perceptualHash(spark,
      Seq((9L, "audio", base.getBytes("UTF-8"), "s"))
        .toDF("media_id", "kind", "content", "source")).head().phash
    assert(again == h(1L))
  }

  test("split persistence roundtrip equals in-memory splits (S3 end-to-end)") {
    val dir = Files.createTempDirectory("graft-splits").toString
    val ratings = Tables.ratings(spark, sf)
    graft.io.Splits.persist(ratings, dir)
    val (train, valid, test) = graft.io.Splits.read(spark, dir)
    val tagged = graft.rec.Popularity.withSplits(ratings)
    for ((back, mem) <- Seq(
        train -> graft.rec.Popularity.train(tagged),
        valid -> graft.rec.Popularity.validation(tagged),
        test -> graft.rec.Popularity.test(tagged))) {
      val want = mem.drop("split")
      assert(back.schema.map(f => (f.name, f.dataType)) ==
        want.schema.map(f => (f.name, f.dataType)))
      // set equality both directions (exceptAll catches dup-count drift)
      assert(back.exceptAll(want).isEmpty && want.exceptAll(back).isEmpty)
    }
    // the three splits partition the input: no row lost or duplicated
    assert(train.count() + valid.count() + test.count() == ratings.count())
  }
}
