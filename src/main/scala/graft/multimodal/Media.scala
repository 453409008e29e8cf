package graft.multimodal

import graft.functions.HashUtil

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Multimodal column plumbing: opaque `binary` payloads with typed
  * metadata, decoded/batch-featurized executor-side.
  *
  * The Spark-side architecture here is real and tested — schema, typed
  * Encoders, per-partition batch processing, deterministic output — while
  * the actual media decode is a clearly marked STUB (this container has no
  * image/audio codecs). At scale the `mapPartitions` body is exactly where
  * a JNI/FFI decoder (libjpeg/ffmpeg) or a vectorized Python
  * `mapInPandas` stage would sit: one decoder init per partition, batched
  * row iteration, no driver involvement.
  */
object Media {

  case class MediaRow(media_id: Long, kind: String, content: Array[Byte],
                      source: String)

  /** NULL-payload totality (media fuzz arm, round 16): a 100 TB crawl
    * WILL present rows whose payload column is NULL (failed fetch, GDPR
    * scrub), and the typed `mapPartitions` path used to NPE on the
    * first one. Semantics mirror the DuckDB oracles' native NULL
    * arithmetic, probed directly (FuzzMediaSpec):
    * `strlen(NULL)`/`md5(NULL)`/`substring(NULL)` → NULL, so features,
    * frame offsets/bytes, and resampled payloads are NULL; gradient
    * hashes fold zero set bits over a NULL payload → phash/fhash 0
    * (matching the oracle's `COALESCE(SUM(CASE …), 0)` shape); and
    * `LEAST(NULL, t)` SKIPS the NULL in both engines, so a NULL
    * payload's `target_len`/frame length echo the REQUESTED size, not
    * NULL. Metric fields go `Option[_]` to carry the NULLs through the
    * Encoders. */
  case class MediaFeatures(media_id: Long, kind: String,
                           n_bytes: Option[Int], width: Option[Int],
                           height: Option[Int], fp: String)

  /** Build a media table from `documents`: text bytes stand in for the
    * opaque binary payload; kind cycles image/audio/video by id. */
  def mediaTable(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      col("text").cast("binary").as("content"),
      col("source"))

  /** Batched per-partition "decode" + feature extraction.
    *
    * STUB DECODE: real pixel/sample decoding is impossible in this
    * environment; `fakeDims` derives deterministic pseudo-dimensions from
    * the content hash instead, so the full distributed path (Encoders,
    * partition batching, downstream joins, the DuckDB oracle) exercises
    * end-to-end with stable values. Replace `fakeDims` with the codec
    * call to productionize.
    */
  def featurize(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      // One-time per-partition setup would go here (decoder init).
      rows.map { m =>
        if (m.content == null)
          MediaFeatures(m.media_id, m.kind, None, None, None, null)
        else {
          val h = HashUtil.md5Lower63(m.content)
          val (w, ht) = fakeDims(h)
          MediaFeatures(m.media_id, m.kind, Some(m.content.length),
            Some(w), Some(ht), md5Hex(m.content))
        }
      }
    }
  }

  /** Deterministic stand-in for decoded media dimensions:
    * width = 64 + h mod 1024, height = 64 + (h div 1024) mod 1024. */
  def fakeDims(h: Long): (Int, Int) =
    ((64L + h % 1024L).toInt, (64L + (h / 1024L) % 1024L).toInt)

  case class MediaFrame(media_id: Long, frame_idx: Int, off: Option[Long],
                        frame: Array[Byte])

  case class ResizedMedia(media_id: Long, kind: String,
                          n_bytes: Option[Int], target_len: Option[Int],
                          resized: Array[Byte])

  /** Resize / resample a payload to `targetLen` bytes by uniform stride
    * sampling: output byte i = content[(i·L) div T]. The byte-stream
    * analogue of image resize / audio resample — and the same
    * `mapPartitions` seam where a real scaler (libswscale/soxr) would
    * run. Payloads already ≤ targetLen pass through unchanged. Pure
    * deterministic map ⇒ oracle-checkable. */
  def resample(spark: SparkSession, media: DataFrame,
               targetLen: Int = 128): Dataset[ResizedMedia] = {
    import spark.implicits._
    require(targetLen >= 1, s"target length must be >= 1, got $targetLen")
    media.as[MediaRow].mapPartitions { rows =>
      rows.map { m =>
        if (m.content == null)
          // target_len echoes the REQUEST: LEAST(NULL, t) = t in both
          // engines (see the NULL-totality note on MediaFeatures).
          ResizedMedia(m.media_id, m.kind, None, Some(targetLen), null)
        else {
          val len = m.content.length
          if (len <= targetLen)
            ResizedMedia(m.media_id, m.kind, Some(len), Some(len), m.content)
          else {
            val out = new Array[Byte](targetLen)
            var i = 0
            while (i < targetLen) {
              out(i) = m.content((i.toLong * len / targetLen).toInt)
              i += 1
            }
            ResizedMedia(m.media_id, m.kind, Some(len), Some(targetLen), out)
          }
        }
      }
    }
  }

  /** Evenly-spaced frame sampling from "video" payloads: `n` frames of
    * (at most) `frameLen` bytes, frame i starting at
    * `i·(L−F) div (n−1)` — first frame at 0, last flush with the end.
    *
    * STUB DECODE: a real implementation seeks + decodes keyframes
    * (ffmpeg/JNI) inside this exact `mapPartitions` seam — one decoder
    * per partition, batched rows, no driver involvement; here frames are
    * deterministic byte windows of the payload so the distributed path
    * (typed Encoders, per-partition iteration, binary output column, the
    * DuckDB oracle) runs end-to-end with stable values. */
  def frameSample(spark: SparkSession, media: DataFrame, n: Int,
                  frameLen: Int = 256): Dataset[MediaFrame] = {
    import spark.implicits._
    require(n >= 1, s"frame count must be >= 1, got $n")
    media.filter(col("kind") === "video").as[MediaRow].mapPartitions { rows =>
      // One-time per-partition setup would go here (decoder init).
      rows.flatMap { m =>
        if (m.content == null)
          // NULL payload still yields its n frame ROWS (the oracle's
          // CROSS JOIN over frame indices), each with NULL offset/bytes.
          (0 until n).iterator.map(i => MediaFrame(m.media_id, i, None, null))
        else {
          val len = m.content.length
          val f = math.min(frameLen, len)
          (0 until n).iterator.map { i =>
            val off = if (n == 1) 0L else i.toLong * (len - f) / (n - 1)
            MediaFrame(m.media_id, i, Some(off),
              java.util.Arrays.copyOfRange(m.content, off.toInt,
                off.toInt + f))
          }
        }
      }
    }
  }

  case class FrameHash(media_id: Long, frame_idx: Int, fhash: Long)

  /** Per-frame perceptual difference-hash: [[frameSample]]'s evenly-
    * spaced frames, each reduced to the same 60-gradient-bit dHash as
    * [[perceptualHash]] (bit b set when frame byte 2b compares greater
    * than byte 2b+1, unsigned). The video-dedup pipeline shape: a whole-
    * payload hash (q195) misses videos sharing only SOME content
    * (re-edits, intros spliced on), while per-frame hashes localize the
    * match to the frames that survived. Same `mapPartitions` seam as the
    * rest of the family — a real deployment hashes each decoded keyframe
    * right after the seek. Pure deterministic map ⇒ oracle-checkable. */
  def frameHashes(spark: SparkSession, media: DataFrame, n: Int,
                  frameLen: Int = 256): Dataset[FrameHash] = {
    import spark.implicits._
    frameSample(spark, media, n, frameLen).map { fr =>
      FrameHash(fr.media_id, fr.frame_idx, gradientBits(fr.frame))
    }
  }

  /** 60 gradient bits (dHash core): bit b set when byte 2b compares
    * greater (unsigned) than byte 2b+1. A NULL or empty payload folds
    * ZERO set bits → hash 0 — exactly the oracle's
    * `COALESCE(SUM(CASE …), 0)` over NULL comparisons (media fuzz arm:
    * NULL-payload assets hash to the all-zero bucket on both engines
    * rather than crashing one of them). */
  private def gradientBits(b: Array[Byte]): Long = {
    if (b == null) return 0L
    var h = 0L
    var bit = 0
    while (bit < 60) {
      val i = 2 * bit
      if (i + 1 < b.length && (b(i) & 0xff) > (b(i + 1) & 0xff))
        h |= 1L << bit
      bit += 1
    }
    h
  }

  private def md5Hex(bytes: Array[Byte]): String = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(bytes)
    d.map(b => f"$b%02x").mkString
  }

  case class MediaHash(media_id: Long, kind: String, phash: Long)

  /** Perceptual difference-hash (dHash) over the RESAMPLED payload: the
    * image-dedup pipeline shape (resize → compare adjacent intensities →
    * bit per gradient) on the byte-stream stand-in. Bit b (0 ≤ b < 60)
    * is set when resampled byte 2b compares greater than byte 2b+1 —
    * 60 bits so the hash stays non-negative and splits into 4×15-bit
    * pigeonhole bands downstream (arithmetic-vs-logical shift semantics
    * never matter on a non-negative long, cross-engine). Gradient bits
    * survive uniform brightness/length shifts the way a cryptographic
    * fingerprint (q60's `fp`) cannot: NEAR-duplicate payloads land at
    * small Hamming distance. Same `mapPartitions`-adjacent seam as
    * [[featurize]] — a real deployment hashes right after decode. */
  def perceptualHash(spark: SparkSession, media: DataFrame,
                     targetLen: Int = 128): Dataset[MediaHash] = {
    import spark.implicits._
    resample(spark, media, targetLen).map { r =>
      MediaHash(r.media_id, r.kind, gradientBits(r.resized))
    }
  }
}
