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

  /** q195 — multimodal near-duplicate detection: perceptual
    * difference-hash over the resampled payloads
    * ([[Media.perceptualHash]] — the resize → gradient-bits image-dedup
    * pipeline), 4×15-bit pigeonhole bands (any pair within Hamming ≤ 3
    * MUST share a band — same guarantee family as the q28 SimHash
    * dedup), exact `bit_count(xor)` distance on band-colliding
    * candidates only. This is the media-store dedup a training pipeline
    * runs where cryptographic fingerprints (q60 `fp`) only catch
    * bit-exact copies: near-identical payloads land at small Hamming
    * distance. Candidates-only scoring — never all-pairs — so the join
    * volume is band-bucket-bounded at any corpus size. */
  val q195: Q = (spark, dir) => {
    val hashed = Media.perceptualHash(spark,
      Media.mediaTable(Tables.documents(spark, dir))).toDF()
    val bands = hashed.select(col("media_id"), col("phash"),
      explode(array((0 until 4).map(lit): _*)).as("band"))
      .withColumn("bits", expr("(phash >> (15 * band)) & 32767"))
    val a = bands.select(col("media_id").as("id_a"),
      col("phash").as("pa"), col("band"), col("bits"))
    val b = bands.select(col("media_id").as("id_b"),
      col("phash").as("pb"), col("band"), col("bits"))
    a.join(b, Seq("band", "bits"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "pa", "pb").distinct()
      .withColumn("hamming", expr("bit_count(pa ^ pb)").cast("long"))
      .filter(col("hamming") <= 3)
      .select("id_a", "id_b", "hamming")
      .orderBy("id_a", "id_b")
  }

  val queries: Map[String, Q] = Map(
    "q60_media_features" -> q60,
    "q67_media_frames" -> q67,
    "q68_media_resample" -> q68,
    "q195_media_phash_dedup" -> q195)

  val oracles: Map[String, String] = Map(
    // Resample (q68's arithmetic) → 60 gradient bits → 4×15-bit bands →
    // exact Hamming on candidates. ASCII corpus ⇒ the Spark side's raw
    // resampled BYTES equal the oracle's character codepoints (ascii()).
    "q195_media_phash_dedup" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id, text, len(text) AS l FROM documents),
        |rz AS (
        |  SELECT media_id,
        |    CASE WHEN l <= 128 THEN text ELSE
        |      array_to_string(list_transform(generate_series(0, 127),
        |        i -> substring(text, CAST((i * l) // 128 AS INT) + 1, 1)), '')
        |    END AS r
        |  FROM m),
        |ph AS (
        |  SELECT media_id,
        |    CAST(COALESCE(SUM(CASE WHEN 2 * b + 2 <= len(r)
        |      AND ascii(substring(r, CAST(2 * b + 1 AS INT), 1)) >
        |          ascii(substring(r, CAST(2 * b + 2 AS INT), 1))
        |      THEN (1::BIGINT << CAST(b AS INT)) ELSE 0 END), 0) AS BIGINT)
        |      AS phash
        |  FROM rz CROSS JOIN generate_series(0, 59) g(b) GROUP BY 1),
        |bd AS (
        |  SELECT media_id, phash, CAST(b AS INT) AS band,
        |    (phash >> CAST(15 * b AS INT)) & 32767 AS bits
        |  FROM ph CROSS JOIN generate_series(0, 3) g(b)),
        |cand AS (
        |  SELECT DISTINCT a.media_id AS id_a, b.media_id AS id_b,
        |    a.phash AS pa, b.phash AS pb
        |  FROM bd a JOIN bd b USING (band, bits)
        |  WHERE a.media_id < b.media_id)
        |SELECT id_a, id_b, CAST(bit_count(xor(pa, pb)) AS BIGINT) AS hamming
        |FROM cand WHERE bit_count(xor(pa, pb)) <= 3
        |ORDER BY id_a, id_b""".stripMargin,
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
