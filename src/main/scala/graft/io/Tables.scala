package graft.io

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Typed readers for the driver-provided parquet star schema
  * (`/root/testdata/sf*`; see TESTDATA.md). All schemas are fixed by the
  * parquet footers — no `inferSchema` anywhere (the reference's
  * `inferSchema=True` CSV reads force an extra full scan per source;
  * see SURVEY.md §1.2).
  *
  * Column pruning and predicate pushdown reach the parquet scan because
  * every reader returns the raw lazy `DataFrame` — callers `select`/
  * `filter` and Catalyst pushes both into the `FileScan`.
  */
object Tables {
  // One analyzed relation per (session, path): re-creating a reader per
  // query rebuilds the file index (schema read + listing) every time;
  // sharing the DataFrame object reuses it. Lazy — no data is cached.
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    graft.util.SessionMemo(spark, s"relation:$dir/$name.parquet")(
      spark.read.parquet(s"$dir/$name.parquet"))

  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def events(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "events")
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")

  /** CSV source with a fixed schema (reference S1,
    * `top_100_pairs.py:26` — but without `inferSchema`, which costs an
    * extra full scan; SURVEY.md §1.2). */
  def readCsv(spark: SparkSession, path: String,
              schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(schema).option("header", "true").csv(path)

  /** CSV sink, overwrite, with header (reference S3/S5,
    * `partition.py:39-51`). `coalesce` only for genuinely small results —
    * large tables keep their partitioning. */
  def writeCsv(df: DataFrame, path: String, singleFile: Boolean = false): Unit =
    (if (singleFile) df.coalesce(1) else df)
      .write.mode("overwrite").option("header", "true").csv(path)

  /** The MovieLens-shaped ratings fact table the reference consumes
    * (`userId, movieId, rating, timestamp` — reference
    * `codes/Movie Recommendation/part3/partition.py:11`), synthesized from
    * `events`: `user_id` → user, JSON `props.k` → item (100 distinct),
    * `value` → rating, `ts` → timestamp. `get_json_object` is codegen'd;
    * the projection prunes the parquet scan to 4 columns.
    */
  def ratings(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir).select(
      col("user_id"),
      get_json_object(col("props"), "$.k").cast("int").as("item_id"),
      col("value").as("rating"),
      col("ts"),
      col("event_id"))

  /** S2 — load-and-clean composite (reference
    * `als_latent_factors.py:14-20`): drop rows with nulls in the key
    * columns, cast to the requested types, project. */
  def loadAndClean(df: DataFrame,
                   casts: Seq[(String, String)]): DataFrame =
    df.na.drop(casts.map(_._1))
      .select(casts.map { case (c, t) => col(c).cast(t).as(c) }: _*)

  /** M5 — deterministic pseudo-random sampling: order by a hash of the
    * key and take n. Unlike `df.sample` (partition-layout-dependent) or
    * `takeSample` (driver RDD action), this is a pure
    * `TakeOrderedAndProject` — reproducible on any cluster layout, seeded
    * by the salt. */
  def hashSample(df: DataFrame, key: String, n: Int,
                 salt: String = "42"): DataFrame =
    df.orderBy(graft.functions.GraftFunctions.md5_63(
      concat(lit(salt), lit(":"), col(key).cast("string"))), col(key))
      .limit(n)

  /** Memory-cached ratings projection, one per (session, dir): a dozen
    * registered queries start from this exact 5-column projection, so the
    * JSON extraction + scan amortizes across them (the reference
    * recomputed its lineage on every action — SURVEY §4.2's first
    * anti-pattern; a cached hot projection is the engine-side fix). */
  def ratingsCached(spark: SparkSession, dir: String): DataFrame =
    graft.util.SessionMemo.cached(spark, s"ratings:$dir")(ratings(spark, dir))
}
