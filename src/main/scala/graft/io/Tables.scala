package graft.io

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.functions.GraftFunctions.{qdec, qround}

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
  /** The events table with `ts` normalized to the engine's canonical
    * NANOSECOND-epoch `LongType`, whatever physical unit the parquet
    * writer chose. Real corpora arrive with every convention — INT64
    * ns-epoch, TIMESTAMP(MICROS) (Spark reads TIMESTAMP_NTZ when
    * `isAdjustedToUTC=false`), TIMESTAMP(MILLIS), instant-semantics
    * TIMESTAMP — and an engine that hard-codes one unit crashes or,
    * worse, silently mis-buckets by 1000× on the others. Normalizing
    * ONCE at the source keeps every downstream consumer (`ts div 1e9`
    * sessionization, gap arithmetic, watermarks) unit-oblivious.
    * The arithmetic is exact integer (`unix_micros * 1000`), codegen'd,
    * and per-row-trivial; at 100 TB it rides the scan with zero extra
    * shuffle or pass. */
  // Key is "relation-norm:", NOT load()'s "relation:" namespace: this
  // build differs (ts normalized), and sharing load()'s key would let a
  // future raw load(spark, dir, "events") poison every consumer with the
  // UN-normalized frame (1000× mis-bucketing, silently) — SessionMemo's
  // "two builds that could differ must not share a key" contract.
  def events(spark: SparkSession, dir: String): DataFrame =
    graft.util.SessionMemo(spark, s"relation-norm:$dir/events.parquet")(
      normalizeEpochNs(spark.read.parquet(s"$dir/events.parquet"), "ts"))

  /** Normalize a time column of any supported physical type to
    * nanosecond-epoch LongType (in place, position preserved).
    *
    * CONTRACT: downstream day/hour bucketing (`ts div 86400e9` et al.)
    * uses truncating integer division — mirror-identical to DuckDB's
    * integer `//` (both truncate toward zero, measured on DuckDB 1.0),
    * so there is NO engine-vs-oracle divergence at any sign — but a
    * pre-epoch (negative) value calendar-mis-buckets on BOTH sides
    * (ts ∈ (−1 day, 0) lands in day 0, not day −1). Graft day math
    * therefore assumes normalized ts ≥ 0 (DayBucketContractSpec pins
    * this on the test tables); pre-1970 feeds must floor-adjust before
    * entering.
    *  - `LongType`: already ns-epoch (the `nanosAsLong` read path for
    *    TIMESTAMP(NANOS) footers, or a raw INT64 column) — pass through.
    *  - `TimestampNTZType`: parquet micros/millis with
    *    `isAdjustedToUTC=false`. The session timezone is pinned to UTC
    *    everywhere in this engine (Verify/Bench/specs), so the NTZ→TZ
    *    cast is exact and `unix_micros` yields the UTC epoch the DuckDB
    *    oracle's `epoch_ns(ts)` computes.
    *  - `TimestampType`: instant semantics; `unix_micros` directly. */
  def normalizeEpochNs(df: DataFrame, colName: String): DataFrame = {
    import org.apache.spark.sql.types._
    df.schema(colName).dataType match {
      case LongType => df
      case TimestampNTZType =>
        df.withColumn(colName,
          expr(s"unix_micros(cast(`$colName` as timestamp)) * 1000L"))
      case TimestampType =>
        df.withColumn(colName, expr(s"unix_micros(`$colName`) * 1000L"))
      case DateType =>
        df.withColumn(colName,
          expr(s"unix_date(`$colName`) * 86400000000000L"))
      case other => throw new IllegalArgumentException(
        s"cannot normalize `$colName` of type $other to ns-epoch long")
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")

  /** The documents table staged as JSONL (one JSON object per line — the
    * interchange format of LLM training corpora) and read back with the
    * table's own explicit schema. The write happens once per
    * (session, dir) (memoized; shutdown hook removes the staging dir);
    * the read is lazy and schema-pinned — NO inference pass, which at
    * 100 TB would be a full extra scan. Exercises the JSON source/sink
    * under the oracle gate: any serialization drift (encoding, escaping,
    * type round-trip) surfaces as a checksum mismatch vs the
    * parquet-direct oracle. */
  def documentsJsonl(spark: SparkSession, dir: String): DataFrame = {
    val schema = documents(spark, dir).schema
    val staged = graft.util.SessionMemo(spark, s"jsonl-stage:$dir") {
      val d = java.nio.file.Files.createTempDirectory("graft-jsonl")
      documents(spark, dir).write.mode("overwrite").json(d.toString)
      sys.addShutdownHook(deleteRecursively(d))
      d.toString
    }
    spark.read.schema(schema).json(staged)
  }

  /** The documents table staged as ORC and read back — the columnar
    * interchange format counterpart to [[documentsJsonl]] (warehouse
    * pipelines routinely land ORC from Hive/Trino writers). Same staging
    * lifecycle: one write per (session, dir), lazy schema-pinned read,
    * shutdown-hook cleanup. ORC round-trips the exact logical types
    * (long/string), so the oracle's parquet-direct checksum must match
    * bit-for-bit — any writer/reader drift surfaces under the gate. */
  def documentsOrc(spark: SparkSession, dir: String): DataFrame = {
    val schema = documents(spark, dir).schema
    val staged = graft.util.SessionMemo(spark, s"orc-stage:$dir") {
      val d = java.nio.file.Files.createTempDirectory("graft-orc")
      documents(spark, dir).write.mode("overwrite").orc(d.toString)
      sys.addShutdownHook(deleteRecursively(d))
      d.toString
    }
    spark.read.schema(schema).orc(staged)
  }

  /** The documents table staged as a HIVE-PARTITIONED parquet layout
    * (`lang=<v>/part-*.parquet`) and read back partition-aware. This is
    * the 100 TB physical-layout primitive: a predicate on the partition
    * column never touches data files outside its directories — the scan's
    * `PartitionFilters` prune at the DRIVER from the file listing, zero
    * I/O for excluded partitions (vs. row-group zone maps, which still
    * read footers). PlanShapeSpec pins the pruned-partition count.
    *
    * The write repartitions by the partition column first so each
    * partition directory gets ONE file per final task rather than one
    * file per (input-partition × lang) — at scale the small-files problem
    * is the sink-side killer, and aligning the shuffle with the directory
    * layout is the standard fix. */
  def documentsPartitioned(spark: SparkSession, dir: String): DataFrame = {
    val schema = documents(spark, dir).schema
    val staged = graft.util.SessionMemo(spark, s"part-stage:$dir") {
      val d = java.nio.file.Files.createTempDirectory("graft-part")
      documents(spark, dir).repartition(col("lang"))
        .write.mode("overwrite").partitionBy("lang").parquet(d.toString)
      sys.addShutdownHook(deleteRecursively(d))
      d.toString
    }
    // The pinned schema keeps column order stable and gives the `lang`
    // partition column (read back from the directory names) its type.
    spark.read.schema(schema).parquet(staged)
  }

  /** The events table staged as a DATE-partitioned parquet layout
    * (`d=<yyyy-MM-dd>/part-*.parquet`, `d` = UTC event day) — the fact
    * layout every 100 TB event warehouse lands on. Unlike
    * [[documentsPartitioned]] (whose q57 consumer prunes with a LITERAL
    * IN-list at plan time), this layout exists for the RUNTIME pruning
    * path: a join against a filtered dim of days plans a
    * `dynamicpruning` subquery into the scan's PartitionFilters, so
    * executors never list — let alone read — the excluded day
    * directories (q299; plan pinned in PlanShapeSpec). Write side uses
    * the same repartition-by-partition-column alignment as q57's layout
    * (one file per day directory, not files × days — the small-files
    * fix). */
  def eventsDatePartitioned(spark: SparkSession, dir: String): DataFrame = {
    val staged = graft.util.SessionMemo(spark, s"events-day-stage:$dir") {
      val d = java.nio.file.Files.createTempDirectory("graft-evday")
      events(spark, dir)
        .withColumn("d", to_date(timestamp_seconds(expr("ts div 1000000000"))))
        .repartition(col("d"))
        .write.mode("overwrite").partitionBy("d").parquet(d.toString)
      sys.addShutdownHook(deleteRecursively(d))
      d.toString
    }
    spark.read.parquet(staged)
  }

  /** The documents table staged as TWO parquet batches with DIFFERENT
    * schemas — batch 1 (even doc_id) written BEFORE the `n_chars` column
    * existed, batch 2 (odd doc_id) with it — then read back under
    * `mergeSchema`. This is the schema-evolution reality of any corpus
    * that accretes for years: old files lack newer columns, and the
    * reader must widen (missing column → NULL) rather than fail or
    * silently drop files. The merged read is lazy; footer merging is a
    * driver-side listing pass, zero data I/O (q300 gates the NULL
    * semantics against an oracle emulating the batch split). */
  def documentsTwoBatch(spark: SparkSession, dir: String): DataFrame = {
    val staged = graft.util.SessionMemo(spark, s"twobatch-stage:$dir") {
      val d = java.nio.file.Files.createTempDirectory("graft-twobatch")
      val docs = documents(spark, dir)
      docs.filter(col("doc_id") % 2 === 0).drop("n_chars")
        .write.mode("overwrite").parquet(s"$d/batch=1")
      docs.filter(col("doc_id") % 2 =!= 0)
        .write.mode("overwrite").parquet(s"$d/batch=2")
      sys.addShutdownHook(deleteRecursively(d))
      d.toString
    }
    spark.read.option("mergeSchema", "true").parquet(staged)
  }

  /** lineitem + orders persisted as BUCKETED warehouse tables
    * (`bucketBy(8, orderkey)`, sorted within buckets) — the co-located
    * join layout: both sides of the orderkey join are pre-hashed into
    * matching bucket files at WRITE time, so every subsequent fact⋈fact
    * join on that key plans with ZERO shuffle exchange on either side
    * (q298; BucketingSpec + PlanShapeSpec pin the no-Exchange shape).
    * At 100 TB this converts the recurring dominant shuffle of the
    * orders⋈lineitem family into a bucket-wise local merge — paid once
    * at layout time, amortized over every downstream query. Bucket
    * count pins the join parallelism, so production sizing is
    * data/(bucket count) ≈ one task's working set; 8 keeps the sf0.1
    * harness fast while exercising the real multi-bucket path.
    * Returns the (lineitem, orders) table frames. */
  def bucketedOrderTables(spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    // Tag = bounded sanitized dir + unsigned 32-bit hash: readable,
    // never negative (a leading '-' breaks the unquoted DROP TABLE
    // identifier), length-bounded for metastore identifier limits, and
    // the hash suffix disambiguates dirs the case/punctuation folding
    // would otherwise collapse (/data/sf0.1 vs /data/sf0_1).
    val tag = dir.toLowerCase.replaceAll("[^a-z0-9]", "_").takeRight(40) +
      "_" + (scala.util.hashing.MurmurHash3.stringHash(dir).toLong &
        0xffffffffL).toHexString
    val (liName, ordName) = (s"li_bkt_$tag", s"ord_bkt_$tag")
    graft.util.SessionMemo(spark, s"bucketed-stage:$dir") {
      scrubManagedTables(spark, Seq(liName, ordName))
      // r17 probe note: spreading the scan before the bucketed write
      // (to parallelize the single-task write) was A/B'd over 5
      // fresh-JVM pairs and REJECTED — 32 writer tasks × 8 buckets emit
      // 256 small files, Spark drops the per-bucket sortedness
      // assumption, and the read side's open + re-sort overhead costs
      // more than the parallel write saves (median 5.1 → 6.9 s).
      lineitem(spark, dir)
        .select("l_orderkey", "l_extendedprice", "l_quantity")
        .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable(liName)
      orders(spark, dir)
        .select("o_orderkey", "o_orderpriority")
        .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable(ordName)
      ()
    }
    (spark.table(liName), spark.table(ordName))
  }

  /** Drop catalog entries AND scrub their warehouse directories. A
    * managed-table LOCATION left behind by a PREVIOUS JVM (the warehouse
    * dir outlives the in-memory catalog) makes saveAsTable fail with
    * LOCATION_ALREADY_EXISTS even under mode("overwrite") — every
    * bucketed-staging site must scrub before writing. */
  def scrubManagedTables(spark: SparkSession, names: Seq[String]): Unit = {
    // Hadoop Path, not java.net.URI.create: Spark does not guarantee the
    // conf value is percent-encoded, so a working directory with a space
    // would make URI.create throw before any scrub happened.
    val wh = java.nio.file.Paths.get(new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir")).toUri.getPath)
    names.foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = wh.resolve(t)
      if (java.nio.file.Files.exists(loc)) deleteRecursively(loc)
    }
  }

  private def deleteRecursively(d: java.nio.file.Path): Unit =
    graft.util.TempDirs.deleteRecursively(d)

  /** Spread a SCAN-rooted frame to the session's parallelism when the
    * scan would otherwise execute in fewer partitions (r16, guide §2.5
    * "input skew: one huge unsplittable file … repartition immediately
    * after the read"). The bench inputs are single parquet files with
    * one row group, so every scan-rooted pipeline — including the
    * CPU-heavy per-row text maps (shingle explodes, md5 signature
    * folds) and the map side of each first aggregation — ran on ONE
    * core until its first exchange. The guard makes this scale-honest:
    * a production corpus scan already has ≥ parallelism splits, so the
    * repartition (and its shuffle of the payload) simply doesn't
    * happen there — no 100 TB corpus is ever shuffled for parallelism
    * it already has. Use ONLY on frames whose downstream reductions
    * are order-free (per-row maps, integer/decimal aggregates):
    * repartitioning reorders float partial sums.
    * `df.rdd` plans (does not run) the scan-rooted query. */
  def spreadScan(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < p) df.repartition(p) else df
  }

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

  /** Uniform-[0,1) keyed PRNG column: `u = md5_63(seed ":" key) / 2^63`.
    *
    * The seeded-*random* primitive (true M5, reference
    * `correlation_optimised.py:56-68` `takeSample`): a pure deterministic
    * function of (seed, key), so — unlike `df.sample`/`rand(seed)`, whose
    * XORShift streams re-seed per *partition index* and therefore change
    * with the physical layout — the same rows are selected on any cluster,
    * any partitioning, and in DuckDB
    * (`md5_number_lower(seed || ':' || key) & 2^63-1`), which keeps every
    * sampling-derived query oracle-checkable. Uniformity + seed
    * sensitivity are property-checked in SampleSpec. */
  def seededUniform(key: org.apache.spark.sql.Column, seed: Long): org.apache.spark.sql.Column =
    // Hash values within ~512 ulps of 2^63 round UP when cast to double,
    // making the quotient exactly 1.0 — clamp to nextDown(1.0) so the
    // documented [0,1) contract holds for floor(u*k)-style bucketing too
    // (the `< fraction` filters never see the difference).
    least(
      graft.functions.GraftFunctions.md5_63(
        concat(lit(seed.toString), lit(":"), key.cast("string")))
        .cast("double") / lit(9.223372036854775808e18), // 2^63
      lit(0.9999999999999999)) // math.nextDown(1.0)

  /** Seeded Bernoulli sample: keep rows whose [[seededUniform]] draw on
    * `key` falls below `fraction`. Expected |out| = fraction · |df|;
    * layout-independent and reproducible under a fixed seed (see
    * [[seededUniform]] — this is the scalable, oracle-able replacement for
    * the reference's driver-side `takeSample`). */
  def randomSample(df: DataFrame, key: String, fraction: Double,
                   seed: Long): DataFrame =
    df.filter(seededUniform(col(key), seed) < fraction)

  /** Weighted (per-row-probability) seeded sampling: keep a row iff its
    * [[seededUniform]] draw falls below that row's OWN `keepProb` — the
    * training-mix downsampling primitive ("CommonCrawl at 0.3×, books at
    * 1.0×", or p ∝ a per-doc quality weight). Per-row independent
    * Bernoulli, so there is no top-k boundary where a float ulp could
    * flip membership cross-engine: both the draw and the probability are
    * IEEE-deterministic functions of integers, and the same rows are kept
    * on any cluster layout and in the DuckDB oracle. (The fixed-k
    * alternative — Efraimidis–Spirakis keys u^(1/w) — trades that for an
    * order-statistic boundary; prefer this form when the budget can be a
    * rate.) */
  def weightedSample(df: DataFrame, key: String,
                     keepProb: org.apache.spark.sql.Column,
                     seed: Long): DataFrame =
    df.filter(seededUniform(col(key), seed) < keepProb)

  /** Fixed-k weighted sample WITHOUT replacement — the Efraimidis–
    * Spirakis order-statistic form the [[weightedSample]] scaladoc
    * trades against: every row draws u ∈ (0, 1] from the seeded keyed
    * PRNG and the k largest u^(1/w) win (ranked as ln(u)/w — same
    * order, no tiny-power underflow). Inclusion probability tracks
    * weight exactly as A-ES guarantees, the budget is EXACTLY k rows,
    * and the sample is layout-independent + oracle-reproducible.
    *
    * Scale: the rank-and-keep is a global top-k → TakeOrderedAndProject
    * (per-partition heaps, no global sort); the only caveat is the
    * order-statistic float boundary at rank k, which the keyed-PRNG
    * keys make astronomically unlikely to straddle engines. Output:
    * (rank, row..., es·6dp). */
  /** The A-ES ranking key ln(u)/w shared by [[weightedTopK]] and
    * [[weightedTopKPerGroup]] — ONE definition so a boundary fix cannot
    * silently diverge the global and per-group samplers. u = (h+1)/2^63
    * with h the 63-bit keyed hash; the h = Long.MaxValue wrap (h+1
    * overflows to Long.Min → u = −1 → ln null, dropping the row that
    * should be the guaranteed winner u = 1.0) is special-cased — the
    * DuckDB oracle's HUGEINT (h+1) needs no guard and already yields
    * exactly 1.0 there, so this closes a (2⁻⁶³-probability) cross-engine
    * divergence without changing any other value: every other h rides
    * the identical exact-long-add-then-round double the oracle computes. */
  private def esKey(key: String, weight: org.apache.spark.sql.Column,
                    seed: Long): org.apache.spark.sql.Column = {
    val h = graft.functions.GraftFunctions.md5_63(
      concat(lit(s"$seed:"), col(key).cast("string")))
    val u = when(h === lit(Long.MaxValue), lit(1.0))
      .otherwise((h + lit(1L)).cast("double") / lit(math.pow(2, 63)))
    log(u) / weight
  }

  def weightedTopK(df: DataFrame, key: String,
                   weight: org.apache.spark.sql.Column, k: Int,
                   seed: Long): DataFrame = {
    val ranked = df.withColumn("__es", esKey(key, weight, seed))
      .orderBy(col("__es").desc, col(key))
      .limit(k)
    // rank over the ≤k-row result — single-partition window on a tiny
    // frame by construction (the randomPairs pattern).
    ranked.withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("__es").desc, col(key))))
      .withColumn("es", qround(col("__es"), 6)).drop("__es")
  }

  /** Per-group [[weightedTopK]] — exactly `k` weighted-sampled rows per
    * group (Efraimidis–Spirakis within each stratum): the training-mix
    * primitive combining [[stratifiedCap]]'s per-domain quota with
    * weight-proportional inclusion ("200 docs per (source, lang),
    * longer docs favored"). Same key formula as the global form — rank
    * u^(1/w) as ln(u)/w on the seeded keyed PRNG — so the sample is
    * layout-independent and oracle-reproducible.
    *
    * Scale: one window per group key; Spark's WindowGroupLimit pushes
    * the rank filter below the shuffle as a partial per-partition top-n
    * (the [[stratifiedCap]] plan), so the exchange carries ≤ k rows per
    * group per map partition — never the full stratum. Output adds
    * (rank, es·6dp). */
  def weightedTopKPerGroup(df: DataFrame, groups: Seq[String], key: String,
                           weight: org.apache.spark.sql.Column, k: Int,
                           seed: Long): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groups.map(col): _*)
      .orderBy(col("__es").desc, col(key))
    df.withColumn("__es", esKey(key, weight, seed))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .withColumn("es", qround(col("__es"), 6)).drop("__es")
  }

  /** `n` seeded-random disjoint pairs from the distinct values of `key`
    * (reference part2's random-pair protocol: sample users, pair them up).
    * Two-stage for scale: a distributed `TakeOrderedAndProject` selects
    * the 2n keys with the smallest PRNG draws, then consecutive ranks
    * pair up inside the tiny 2n-row frame (single-partition window on
    * ≤ 2n rows by construction). Output: (id_a < id_b). */
  def randomPairs(df: DataFrame, key: String, n: Int, seed: Long): DataFrame = {
    // Raw 63-bit hash (not the [0,1) double) as the sort key: the double
    // projection loses 11 mantissa bits, and an oracle sorting the exact
    // BIGINT could order a (vanishingly rare) near-tie differently.
    val u = graft.functions.GraftFunctions.md5_63(
      concat(lit(seed.toString), lit(":"), col(key).cast("string"))).as("__u")
    // distinct() enforces the documented contract ("from the DISTINCT
    // values of key"): duplicate keys hash identically, sort adjacently,
    // and would otherwise pair a key with itself.
    val sampled = df.select(col(key)).distinct()
      .select(col(key), u).orderBy(col("__u"), col(key)).limit(2 * n)
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("__u"), col(key))
    sampled
      .withColumn("__rn", row_number().over(w))
      .withColumn("__partner", lead(col(key), 1).over(w))
      .filter(col("__rn") % 2 === 1 && col("__partner").isNotNull)
      .select(least(col(key), col("__partner")).as("id_a"),
        greatest(col(key), col("__partner")).as("id_b"))
  }

  /** Seeded stratified cap — the training-data curation primitive for
    * domain/language balancing: keep at most `n` rows per group, chosen
    * by the keyed PRNG order of [[seededUniform]]'s underlying hash (so
    * the SAMPLE, not just its size, is layout-independent, reproducible
    * and oracle-able — contrast `df.sample` per stratum). One window per
    * group key: distributed by group, and Spark's WindowGroupLimit
    * pushes the rank filter below the shuffle as a partial top-n — the
    * scale shape of a per-domain quota over a 100 TB corpus. */
  def stratifiedCap(df: DataFrame, groups: Seq[String], key: String,
                    n: Int, seed: Long): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groups.map(col): _*)
      .orderBy(graft.functions.GraftFunctions.md5_63(
        concat(lit(seed.toString), lit(":"), col(key).cast("string"))), col(key))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= n).drop("__rn")
  }

  /** Memory-cached ratings projection, one per (session, dir): a dozen
    * registered queries start from this exact 5-column projection, so the
    * JSON extraction + scan amortizes across them (the reference
    * recomputed its lineage on every action — SURVEY §4.2's first
    * anti-pattern; a cached hot projection is the engine-side fix). */
  def ratingsCached(spark: SparkSession, dir: String): DataFrame =
    graft.util.SessionMemo.cached(spark, s"ratings:$dir")(ratings(spark, dir))
}
