package graft.queries

import graft.io.Tables
import graft.multimodal.Media

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Multimodal surface: binary media columns featurized executor-side
  * (stubbed decode — see [[graft.multimodal.Media]]). The oracle
  * reproduces the deterministic feature arithmetic in SQL, which validates
  * the whole typed `mapPartitions` path (schema, encoding, batching) —
  * exactly what a real decoder would ride on. */
object MediaQueries {
  type Q = (SparkSession, String) => DataFrame

  private val H = "9223372036854775807"

  /** q60 — media feature extraction over the binary payloads. */
  val q60: Q = (spark, dir) =>
    Media.featurize(spark, Media.mediaTable(Tables.documents(spark, dir)))
      .toDF()
      .orderBy("media_id")

  /** q67 — video frame sampling (4 evenly-spaced 256-byte stub frames
    * per video payload; see [[Media.frameSample]] for the decode seam).
    * The frame bytes are hex-encoded in the registered output: the
    * driver's comparator cannot hash raw binary cells, and hex is a
    * lossless, order-stable encoding both engines share (the library
    * surface, [[Media.frameSample]], still returns the typed binary
    * column). */
  val q67: Q = (spark, dir) =>
    Media.frameSample(spark, Media.mediaTable(Tables.documents(spark, dir)), n = 4)
      .toDF()
      .select(col("media_id"), col("frame_idx"), col("off"),
        lower(hex(col("frame"))).as("frame_hex"))
      .orderBy("media_id", "frame_idx")

  /** q68 — media resample to 128 bytes by uniform stride sampling (the
    * image-resize / audio-resample seam; see [[Media.resample]]). Output
    * payload hex-encoded for the comparator, as in q67. */
  val q68: Q = (spark, dir) =>
    Media.resample(spark, Media.mediaTable(Tables.documents(spark, dir)),
      targetLen = 128)
      .toDF()
      .select(col("media_id"), col("kind"), col("n_bytes"), col("target_len"),
        lower(hex(col("resized"))).as("resized_hex"))
      .orderBy("media_id")

  val queries: Map[String, Q] = Map(
    "q60_media_features" -> q60,
    "q67_media_frames" -> q67,
    "q68_media_resample" -> q68)

  val oracles: Map[String, String] = Map(
    "q60_media_features" ->
      s"""WITH m AS (
         |  SELECT doc_id AS media_id,
         |    CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
         |    text, (md5_number_lower(text) & $H)::BIGINT AS h
         |  FROM documents)
         |SELECT media_id, kind,
         |  CAST(strlen(text) AS INT) AS n_bytes,
         |  CAST(64 + h % 1024 AS INT) AS width,
         |  CAST(64 + (h // 1024) % 1024 AS INT) AS height,
         |  md5(text) AS fp
         |FROM m ORDER BY media_id""".stripMargin,
    // ASCII corpus ⇒ byte offsets == char offsets, so the byte-window
    // frames are substrings; integer div keeps offsets exact.
    "q67_media_frames" ->
      """WITH v AS (
        |  SELECT doc_id AS media_id, text, len(text) AS l,
        |    LEAST(256, len(text)) AS f
        |  FROM documents WHERE doc_id % 3 = 2),
        |idx AS (SELECT unnest(generate_series(0, 3)) AS frame_idx),
        |fr AS (
        |  SELECT media_id, CAST(frame_idx AS INT) AS frame_idx,
        |    (frame_idx * (l - f)) // 3 AS off, f, text
        |  FROM v CROSS JOIN idx)
        |SELECT media_id, frame_idx, CAST(off AS BIGINT) AS off,
        |  lower(hex(CAST(substring(text, CAST(off + 1 AS INT), CAST(f AS INT)) AS BLOB))) AS frame_hex
        |FROM fr ORDER BY media_id, frame_idx""".stripMargin,
    // Stride sampling: out[i] = content[(i*L) // T] — reproduced with a
    // per-index substring list folded back to a string. ASCII corpus ⇒
    // byte == char addressing.
    "q68_media_resample" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id,
        |    CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        |    text, len(text) AS l
        |  FROM documents)
        |SELECT media_id, kind, CAST(l AS INT) AS n_bytes,
        |  CAST(LEAST(l, 128) AS INT) AS target_len,
        |  lower(hex(CAST(CASE WHEN l <= 128 THEN text ELSE
        |    array_to_string(list_transform(generate_series(0, 127),
        |      i -> substring(text, CAST((i * l) // 128 AS INT) + 1, 1)), '')
        |  END AS BLOB))) AS resized_hex
        |FROM m ORDER BY media_id""".stripMargin)
}
