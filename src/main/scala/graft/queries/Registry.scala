package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Central registry merging every query family exposed through
  * [[graft.SparkEntry]]. */
object Registry {
  type Q = (SparkSession, String) => DataFrame

  def all: Map[String, Q] =
    RelationalQueries.queries ++ TextQueries.queries ++
      SimilarityQueries.queries ++ TwinsQueries.queries ++
      RecQueries.queries ++ MediaQueries.queries ++
      StreamingQueries.queries ++ AnalyticsQueries.queries ++
      OlapQueries.queries

  def oracles: Map[String, String] =
    RelationalQueries.oracles ++ TextQueries.oracles ++
      SimilarityQueries.oracles ++ TwinsQueries.oracles ++
      RecQueries.oracles ++ MediaQueries.oracles ++
      StreamingQueries.oracles ++ AnalyticsQueries.oracles ++
      OlapQueries.oracles
}
