package graft.queries

import graft.functions.GraftFunctions.qround
import graft.io.Tables
import graft.multimodal.Media
import graft.sim.VectorOps.{cosine6, l2norm, withLshBucket}

import org.apache.spark.sql.expressions.Window
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
  // Ordering note (media fuzz arm, r16): the driver comparator is
  // POSITIONAL, so every query's ORDER BY must be a total order on its
  // output. Under duplicate asset ids (a real crawl shape) `media_id`
  // alone ties rows whose payload-derived columns differ — the arm
  // caught q325 flapping on exactly that — so the media family orders
  // by its full deterministic column set, NULLS FIRST on both engines
  // (Spark's asc default).
  val q60: Q = (spark, dir) =>
    Media.featurize(spark, Media.mediaTable(Tables.documents(spark, dir)))
      .toDF()
      .orderBy("media_id", "n_bytes", "fp")

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
      .orderBy("media_id", "frame_idx", "off", "frame_hex")

  /** q68 — media resample to 128 bytes by uniform stride sampling (the
    * image-resize / audio-resample seam; see [[Media.resample]]). Output
    * payload hex-encoded for the comparator, as in q67. */
  val q68: Q = (spark, dir) =>
    Media.resample(spark, Media.mediaTable(Tables.documents(spark, dir)),
      targetLen = 128)
      .toDF()
      .select(col("media_id"), col("kind"), col("n_bytes"), col("target_len"),
        lower(hex(col("resized"))).as("resized_hex"))
      .orderBy("media_id", "n_bytes", "resized_hex")

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
      .orderBy("id_a", "id_b", "hamming")
  }

  /** q324 — per-modality data card: the q305 governance shape over the
    * media store (counts, byte volume, exact-duplicate rate via the
    * cryptographic fingerprint, median/max payload size). The artifact
    * that decides whether a modality's crawl enters the training mix.
    * 100 TB posture: ONE hash aggregate over the media scan — every
    * measure (count, sum, countDistinct on the 128-bit fp, exact median
    * at dimension-sized group count) partial-aggregates map-side;
    * output is |kinds| rows. */
  val q324: Q = (spark, dir) => {
    val feat = Media.featurize(spark,
      Media.mediaTable(Tables.documents(spark, dir))).toDF()
    feat.groupBy("kind")
      .agg(
        count(lit(1)).as("n_items"),
        sum(col("n_bytes").cast("long")).as("total_bytes"),
        countDistinct(col("fp")).as("n_distinct_fp"),
        qround(expr("percentile(n_bytes, 0.5D)"), 6).as("p50_bytes"),
        max(col("n_bytes")).cast("long").as("max_bytes"))
      .select(col("kind"), col("n_items"), col("total_bytes"),
        col("n_distinct_fp"),
        qround(lit(1.0) - col("n_distinct_fp").cast("double") /
          col("n_items"), 6).as("dup_pct"),
        col("p50_bytes"), col("max_bytes"))
      .orderBy("kind")
  }

  /** q325 — caption↔embedding linkage: each media item joined to its
    * embedding row (doc_id ≡ vec_id in the fixture — the production
    * analogue is the media-store key), carrying caption token count,
    * embedding dimensionality, and the l2 norm via the codegen'd
    * [[graft.sim.VectorOps.dot]] fold. The join every cross-modal op
    * downstream (q326/q329) rides on, registered standalone so the
    * linkage itself is oracle-gated. 100 TB posture: two fact scans
    * co-shuffled on the id key (or zero-shuffle under the q298 bucketed
    * layout); norms are in-row folds, no explode. */
  val q325: Q = (spark, dir) => {
    val m = Media.mediaTable(Tables.documents(spark, dir))
      .select(col("media_id"), col("kind"), col("source"),
        size(split(col("content").cast("string"), " ")).cast("long")
          .as("caption_tokens"))
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id").as("media_id"), col("embedding"),
        col("label").cast("long").as("label"))
    m.join(e, "media_id")
      .select(col("media_id"), col("kind"), col("source"),
        col("caption_tokens"), size(col("embedding")).as("dim"),
        qround(l2norm(col("embedding")), 6).as("l2norm"), col("label"))
      .orderBy("media_id", "source", "caption_tokens", "l2norm", "label")
  }

  /** q326 — CROSS-modal near-duplicate candidates: sign-LSH bucket join
    * over the linked embeddings (q325's join), pairs restricted to
    * DIFFERENT modalities, exact cosine ≥ 0.4 on bucket-colliding
    * candidates (q36's threshold convention). This is the "same content,
    * different medium" dedup a multimodal training mix needs — a
    * transcript duplicating its audio, a keyframe duplicating its video
    * — which single-modality fingerprints (q60 fp, q195 phash) cannot
    * see. 100 TB posture: identical to q32/q36 — the bucket is a pure
    * in-row map over the scan (8 literal hyperplanes, codegen'd dot
    * folds), the join shuffles on the bucket key only, and scoring
    * touches bucket-colliding pairs, never all-pairs. */
  val q326: Q = (spark, dir) => {
    val kinds = Media.mediaTable(Tables.documents(spark, dir))
      .select(col("media_id").as("vec_id"), col("kind"))
    val e = withLshBucket(Tables.embeddings(spark, dir), "embedding",
      planes = 8, dim = 64)
      .join(kinds, "vec_id")
      .withColumn("nrm", l2norm(col("embedding")))
    val a = e.select(col("vec_id").as("id_a"), col("kind").as("kind_a"),
      col("embedding").as("ea"), col("nrm").as("na"), col("bucket"))
    val b = e.select(col("vec_id").as("id_b"), col("kind").as("kind_b"),
      col("embedding").as("eb"), col("nrm").as("nb"), col("bucket"))
    a.join(b, "bucket")
      .filter(col("id_a") < col("id_b") && col("kind_a") =!= col("kind_b"))
      .withColumn("cos", cosine6(col("ea"), col("eb"), col("na"), col("nb")))
      .filter(col("cos") >= 0.4)
      .select("id_a", "id_b", "kind_a", "kind_b", "bucket", "cos")
      .orderBy("id_a", "id_b", "bucket", "cos")
  }

  /** q327 — frame-level perceptual dedup: [[Media.frameHashes]] (4
    * sampled frames per video, 60-bit dHash each), candidates from a
    * per-frame 4×15-bit pigeonhole band join (any frame pair within
    * Hamming ≤ 3 MUST collide; the oracle mirrors the banding exactly,
    * so recall semantics are pinned, not assumed), exact `bit_count`
    * Hamming ≤ 7 on candidates, rolled up per video pair. Catches what
    * q195's whole-payload hash cannot: videos sharing SOME frames
    * (re-edits, spliced intros) — the measured corpus has shift-broken
    * near-dup pairs where only frame 0 survives (n_close_frames=1) next
    * to fully-aligned pairs (n_close_frames=4). 100 TB posture: frames
    * and hashes are pure maps; the only shuffle is the (frame_idx, band,
    * bits) equi-join, bucket-bounded like every LSH path here. */
  val q327: Q = (spark, dir) => {
    val fh = Media.frameHashes(spark,
      Media.mediaTable(Tables.documents(spark, dir)), n = 4).toDF()
    val bands = fh.select(col("media_id"), col("frame_idx"), col("fhash"),
      explode(array((0 until 4).map(lit): _*)).as("band"))
      .withColumn("bits", expr("(fhash >> (15 * band)) & 32767"))
    val a = bands.select(col("media_id").as("id_a"), col("frame_idx"),
      col("fhash").as("ha"), col("band"), col("bits"))
    val b = bands.select(col("media_id").as("id_b"), col("frame_idx"),
      col("fhash").as("hb"), col("band"), col("bits"))
    a.join(b, Seq("frame_idx", "band", "bits"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "frame_idx", "ha", "hb").distinct()
      .withColumn("hamming", expr("bit_count(ha ^ hb)").cast("long"))
      .filter(col("hamming") <= 7)
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("n_close_frames"),
        min(col("hamming")).as("min_hamming"))
      .orderBy("id_a", "id_b")
  }

  /** q328 — modality×source mix audit: item and byte share of each
    * modality within each source — the balance check a curriculum /
    * sampling stage reads before mixing sources (a source that is 90 %
    * video bytes skews a token-budgeted mix even at equal item counts).
    * 100 TB posture: one grouped aggregate at |sources|×|kinds| output;
    * the within-source share is a window over that dimension-sized
    * result, not over the fact scan. */
  val q328: Q = (spark, dir) => {
    val m = Media.mediaTable(Tables.documents(spark, dir))
      .select(col("source"), col("kind"),
        length(col("content")).cast("long").as("nb"))
    val g = m.groupBy("source", "kind")
      .agg(count(lit(1)).as("n_items"), sum(col("nb")).as("total_bytes"))
    val w = Window.partitionBy("source")
    g.select(col("source"), col("kind"), col("n_items"), col("total_bytes"),
        qround(col("total_bytes").cast("double") /
          sum(col("total_bytes")).over(w).cast("double"), 6)
          .as("byte_share"))
      .orderBy("source", "kind")
  }

  /** q329 — cross-modal semantic-agreement audit: every TEXT near-dup
    * pair (q27's memoized MinHash-LSH pipeline, est-Jaccard ≥ 0.4)
    * joined to both members' embeddings, scoring embedding cosine next
    * to the text estimate. `agree`=1 where the embedding space confirms
    * (cos ≥ 0.4, q36's threshold); a disagreeing pair (near-dup text,
    * unrelated embeddings) is exactly the signal that a caption was
    * copy-pasted onto different media — the cross-modal QA step before
    * trusting either signal for dedup. 100 TB posture: |pairs| is the
    * tiny LSH output, so both embedding joins broadcast-shuffle on id at
    * pair-list scale, and the cosines are in-row codegen'd folds;
    * marginal cost over q27 is two key joins. */
  val q329: Q = (spark, dir) => {
    val pairs = TextQueries.lshPairsCached(spark, dir)
    val e = Tables.embeddings(spark, dir)
      .withColumn("nrm", l2norm(col("embedding")))
    val ea = e.select(col("vec_id").as("id_a"), col("embedding").as("ea"),
      col("nrm").as("na"))
    val eb = e.select(col("vec_id").as("id_b"), col("embedding").as("eb"),
      col("nrm").as("nb"))
    pairs.join(ea, "id_a").join(eb, "id_b")
      .withColumn("cos", cosine6(col("ea"), col("eb"), col("na"), col("nb")))
      .select(col("id_a"), col("id_b"), col("est_jaccard"), col("cos"),
        when(col("cos") >= 0.4, 1L).otherwise(0L).as("agree"))
      .orderBy("id_a", "id_b", "cos")
  }

  val queries: Map[String, Q] = Map(
    "q60_media_features" -> q60,
    "q67_media_frames" -> q67,
    "q68_media_resample" -> q68,
    "q195_media_phash_dedup" -> q195,
    "q324_media_datacard" -> q324,
    "q325_caption_embedding_link" -> q325,
    "q326_crossmodal_neardup" -> q326,
    "q327_frame_phash_dedup" -> q327,
    "q328_modality_source_mix" -> q328,
    "q329_crossmodal_agreement" -> q329)

  val oracles: Map[String, String] = Map(
    "q324_media_datacard" ->
      """WITH m AS (
        |  SELECT CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        |    strlen(text) AS nb, md5(text) AS fp
        |  FROM documents)
        |SELECT kind, CAST(COUNT(*) AS BIGINT) AS n_items,
        |  CAST(SUM(nb) AS BIGINT) AS total_bytes,
        |  CAST(COUNT(DISTINCT fp) AS BIGINT) AS n_distinct_fp,
        |  floor((1.0 - CAST(COUNT(DISTINCT fp) AS DOUBLE) / COUNT(*))
        |    * 1000000.0 + 0.5) / 1000000.0 AS dup_pct,
        |  floor(quantile_cont(nb, 0.5) * 1000000.0 + 0.5) / 1000000.0
        |    AS p50_bytes,
        |  CAST(MAX(nb) AS BIGINT) AS max_bytes
        |FROM m GROUP BY 1 ORDER BY 1 NULLS FIRST""".stripMargin,
    "q325_caption_embedding_link" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id,
        |    CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        |    source, len(string_split(text, ' ')) AS ct
        |  FROM documents)
        |SELECT m.media_id, m.kind, m.source,
        |  CAST(ct AS BIGINT) AS caption_tokens,
        |  CAST(len(e.embedding) AS INT) AS dim,
        |  floor(sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
        |    CAST(e.embedding AS DOUBLE[]))) * 1000000.0 + 0.5) / 1000000.0
        |    AS l2norm,
        |  CAST(e.label AS BIGINT) AS label
        |FROM m JOIN embeddings e ON m.media_id = e.vec_id
        |ORDER BY media_id, source NULLS FIRST, caption_tokens NULLS FIRST,
        |  l2norm NULLS FIRST, label NULLS FIRST""".stripMargin,
    "q326_crossmodal_neardup" ->
      s"""WITH proj AS (
         |  SELECT vec_id, p,
         |    list_dot_product(CAST(embedding AS DOUBLE[]),
         |      list_transform(generate_series(0, 63),
         |        d -> (((md5_number_lower(p::VARCHAR || ':' || d::VARCHAR) & $H)::BIGINT % 2001) - 1000)::DOUBLE / 1000.0)) AS s
         |  FROM embeddings CROSS JOIN generate_series(0, 7) g(p)),
         |buckets AS (
         |  SELECT vec_id,
         |    CAST(SUM(CASE WHEN floor((s) * 1000000.0 + 0.5) / 1000000.0 > 0 THEN (1::BIGINT << p) ELSE 0 END) AS BIGINT) AS bucket
         |  FROM proj GROUP BY vec_id),
         |k AS (
         |  SELECT doc_id AS vec_id,
         |    CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind
         |  FROM documents),
         |e AS (
         |  SELECT x.vec_id, CAST(x.embedding AS DOUBLE[]) AS emb, b.bucket, k.kind,
         |    sqrt(list_dot_product(CAST(x.embedding AS DOUBLE[]), CAST(x.embedding AS DOUBLE[]))) AS nrm
         |  FROM embeddings x JOIN buckets b USING (vec_id) JOIN k USING (vec_id)),
         |scored AS (
         |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |    a.kind AS kind_a, b.kind AS kind_b, a.bucket,
         |    floor((list_dot_product(a.emb, b.emb) / (a.nrm * b.nrm)) * 1000000.0 + 0.5) / 1000000.0 AS cos
         |  FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
         |  WHERE a.kind <> b.kind)
         |SELECT id_a, id_b, kind_a, kind_b, bucket, cos
         |FROM scored WHERE cos >= 0.4
         |ORDER BY id_a, id_b, bucket, cos""".stripMargin,
    // Frames per q67's offset arithmetic, dHash per q195's gradient
    // bits, pigeonhole bands per frame, exact Hamming on candidates.
    "q327_frame_phash_dedup" ->
      """WITH v AS (
        |  SELECT doc_id AS media_id, text, len(text) AS l,
        |    LEAST(256, len(text)) AS f
        |  FROM documents WHERE doc_id % 3 = 2),
        |idx AS (SELECT unnest(generate_series(0, 3)) AS frame_idx),
        |fr AS (
        |  SELECT media_id, CAST(frame_idx AS INT) AS frame_idx,
        |    substring(text, CAST((frame_idx * (l - f)) // 3 + 1 AS INT),
        |      CAST(f AS INT)) AS fb
        |  FROM v CROSS JOIN idx),
        |ph AS (
        |  SELECT media_id, frame_idx,
        |    CAST(COALESCE(SUM(CASE WHEN 2 * b + 2 <= len(fb)
        |      AND ascii(substring(fb, CAST(2 * b + 1 AS INT), 1)) >
        |          ascii(substring(fb, CAST(2 * b + 2 AS INT), 1))
        |      THEN (1::BIGINT << CAST(b AS INT)) ELSE 0 END), 0) AS BIGINT)
        |      AS h
        |  FROM fr CROSS JOIN generate_series(0, 59) g(b) GROUP BY 1, 2),
        |bd AS (
        |  SELECT media_id, frame_idx, h, CAST(b AS INT) AS band,
        |    (h >> CAST(15 * b AS INT)) & 32767 AS bits
        |  FROM ph CROSS JOIN generate_series(0, 3) g(b)),
        |cand AS (
        |  SELECT DISTINCT a.media_id AS id_a, b.media_id AS id_b,
        |    a.frame_idx, a.h AS ha, b.h AS hb
        |  FROM bd a JOIN bd b USING (frame_idx, band, bits)
        |  WHERE a.media_id < b.media_id),
        |cl AS (
        |  SELECT id_a, id_b, CAST(bit_count(xor(ha, hb)) AS BIGINT) AS hamming
        |  FROM cand WHERE bit_count(xor(ha, hb)) <= 7)
        |SELECT id_a, id_b, CAST(COUNT(*) AS BIGINT) AS n_close_frames,
        |  MIN(hamming) AS min_hamming
        |FROM cl GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q328_modality_source_mix" ->
      """WITH m AS (
        |  SELECT source,
        |    CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        |    strlen(text) AS nb
        |  FROM documents),
        |g AS (
        |  SELECT source, kind, CAST(COUNT(*) AS BIGINT) AS n_items,
        |    CAST(SUM(nb) AS BIGINT) AS total_bytes
        |  FROM m GROUP BY 1, 2)
        |SELECT source, kind, n_items, total_bytes,
        |  floor((CAST(total_bytes AS DOUBLE) /
        |    CAST(SUM(total_bytes) OVER (PARTITION BY source) AS DOUBLE))
        |    * 1000000.0 + 0.5) / 1000000.0 AS byte_share
        |FROM g ORDER BY source NULLS FIRST, kind""".stripMargin,
    "q329_crossmodal_agreement" ->
      s"""WITH ${TextQueries.lshPairsCte},
         |p AS (SELECT id_a, id_b, est_jaccard FROM est
         |      WHERE est_jaccard >= 0.4),
         |e AS (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb,
         |    sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
         |      CAST(embedding AS DOUBLE[]))) AS nrm
         |  FROM embeddings),
         |s AS (
         |  SELECT p.id_a, p.id_b, p.est_jaccard,
         |    floor((list_dot_product(a.emb, b.emb) / (a.nrm * b.nrm))
         |      * 1000000.0 + 0.5) / 1000000.0 AS cos
         |  FROM p JOIN e a ON p.id_a = a.vec_id
         |         JOIN e b ON p.id_b = b.vec_id)
         |SELECT id_a, id_b, est_jaccard, cos,
         |  CAST(CASE WHEN cos >= 0.4 THEN 1 ELSE 0 END AS BIGINT) AS agree
         |FROM s ORDER BY id_a, id_b, cos NULLS FIRST""".stripMargin,
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
        |ORDER BY id_a, id_b, hamming""".stripMargin,
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
         |FROM m
         |ORDER BY media_id, n_bytes NULLS FIRST, fp NULLS FIRST""".stripMargin,
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
        |  lower(hex(encode(substring(text, CAST(off + 1 AS INT), CAST(f AS INT))))) AS frame_hex
        |FROM fr
        |ORDER BY media_id, frame_idx, off NULLS FIRST,
        |  frame_hex NULLS FIRST""".stripMargin,
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
        |  lower(hex(encode(CASE WHEN l <= 128 THEN text ELSE
        |    array_to_string(list_transform(generate_series(0, 127),
        |      i -> substring(text, CAST((i * l) // 128 AS INT) + 1, 1)), '')
        |  END))) AS resized_hex
        |FROM m
        |ORDER BY media_id, n_bytes NULLS FIRST,
        |  resized_hex NULLS FIRST""".stripMargin)
}
