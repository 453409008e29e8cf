package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the engine's full operator inventory (one entry per
  * SURVEY.md §2 operator family plus the training-data-pipeline
  * extensions); `oracleSql` carries the DuckDB-equivalent ANSI SQL for
  * every query whose semantics are SQL-expressible.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Biased popularity top-k (reference `popularity_tuned.py:36-40`). */
  def entry(spark: SparkSession): DataFrame =
    graft.queries.Registry.all("q02_top_parts_biased")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Registry.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops (ML
    * models, LSH candidate generation) → driver records rows-only check. */
  def oracleSql: Map[String, String] = graft.queries.Registry.oracles
}
