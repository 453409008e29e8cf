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

  val queries: Map[String, Q] = Map("q60_media_features" -> q60)

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
         |FROM m ORDER BY media_id""".stripMargin)
}
