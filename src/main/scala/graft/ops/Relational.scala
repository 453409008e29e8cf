package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.{Column, DataFrame}

/** Relational building blocks mirroring the reference's operator surface
  * (SURVEY.md §2.2–§2.6): activity filters (J1), chronological splits
  * (W1+P2), biased popularity scoring (A3+P2), global top-k pools (O2),
  * candidate generation (J2), seen-removal (J3), per-user top-k (W2) and
  * deterministic list collection (A5).
  *
  * Every operator is a pure `DataFrame => DataFrame` composition of
  * Catalyst built-ins, so predicate pushdown / column pruning / partial
  * aggregation / broadcast selection / AQE all apply unmodified.
  */
object Relational {

  /** Exact decimal sum of a double column: the per-row double→decimal
    * step goes through the IEEE floor-quantizer
    * ([[graft.functions.GraftFunctions.qdec]] — a raw cast's
    * half-boundary direction is engine-release-dependent), and decimal
    * addition is associative — so the sum is independent of
    * partitioning/merge order AND of the oracle engine's rounding mode.
    * This is what makes money-sum queries hash-comparable against the
    * DuckDB oracle at any parallelism. */
  def decSum(c: Column, precision: Int = 18, scale: Int = 2): Column =
    sum(graft.functions.GraftFunctions.qdec(c, precision, scale))

  /** [[decSum]]'s fast twin for DOUBLE-surfaced totals: quantize each
    * row to an exact scaled LONG (`floor(x·10^s + 0.5)` — same IEEE
    * family as qdec), sum in codegen'd integer arithmetic (exact,
    * order-free), and divide once back to DOUBLE. Value-identical to
    * `decSum(c).cast("double")` for FINITE inputs with
    * |Σ·10^s| < 2^53 — both are then the nearest double of the same
    * exact rational Σ/10^s; past 2^53 the long→double→divide path can
    * differ by 1 ulp from decimal's single rounding. NaN/±Inf rows pass
    * through as NULL (sum skips them), mirroring qround's guard —
    * without it Spark's `floor(+Inf)→Long.MaxValue` would poison the
    * long sum where decSum yields NULL-and-skip. Wins: whole-stage-
    * codegen'd long adds instead of interpreted BigDecimal (r8 measured
    * ~10× on full-scan aggregates). Keep [[decSum]] where downstream
    * arithmetic needs the decimal; use this where the total goes
    * straight to the output. */
  def centsSumDouble(c: Column, scale: Int = 2): Column = {
    val f = math.pow(10, scale)
    sum(floor(finiteOrNull(c) * f + lit(0.5))).cast("double") / f
  }

  /** [[centsSumDouble]] without the final divide: the exact scaled-LONG
    * sum itself. Use where subtotals must be RE-AGGREGATED exactly
    * (rollup/cube global rows rebuilt from subtotal frames — long adds
    * stay associative where the divided doubles would drift 1 ulp). */
  def centsSumLong(c: Column, scale: Int = 2): Column =
    sum(floor(finiteOrNull(c) * math.pow(10, scale) + lit(0.5)))

  private def finiteOrNull(c: Column): Column =
    when(c.isNull || isnan(c) ||
      c === lit(Double.PositiveInfinity) ||
      c === lit(Double.NegativeInfinity), lit(null))
      .otherwise(c)

  /** J1 + A1 + P5 — keep only rows of keys with ≥ minCount occurrences
    * (reference "active users", `top_100_pairs.py:34-36`). Implemented as
    * an aggregate + inner join on the key: both sides shuffle on `key`, and
    * when the distinct-key side is small Catalyst/AQE picks a broadcast
    * hash join automatically. */
  def filterActive(df: DataFrame, key: String, minCount: Long): DataFrame = {
    val active = df.groupBy(key).agg(count(lit(1)).as("__n")).filter(col("__n") >= minCount)
    df.join(active.select(key), Seq(key), "inner")
  }

  /** W1 + P2 — chronological per-key split label, reference
    * `partition.py:22-35`: rank rows per key by (time, tiebreak), label
    * with `floor((rn-1)/n * splits)`. A single shuffle on `key` serves
    * both the count and the window (same partitioning). `tiebreak` makes
    * the row_number total order deterministic for equal timestamps
    * (SURVEY.md §7.4.1). */
  def chronoSplit(df: DataFrame, key: String, time: String, tiebreak: String,
                  splits: Int = 5): DataFrame = {
    val w = Window.partitionBy(key).orderBy(col(time), col(tiebreak))
    val wn = Window.partitionBy(key)
    df.withColumn("__rn", row_number().over(w))
      .withColumn("__cnt", count(lit(1)).over(wn))
      .withColumn("split",
        floor((col("__rn") - 1).cast("double") / col("__cnt") * splits).cast("int"))
      .drop("__rn", "__cnt")
  }

  /** A3 + P2 + O2 — biased popularity pool, reference
    * `popularity_tuned.py:36-40`: score = Σ(value)/(count + bias), global
    * top-k with deterministic key tiebreak. Catalyst plans the
    * sort+limit as `TakeOrderedAndProject` (per-partition heap, no global
    * sort) — the shape that survives a 100× scale-up. */
  def biasedTopK(df: DataFrame, key: String, value: String, bias: Double,
                 k: Int): DataFrame =
    df.groupBy(key)
      .agg(centsSumDouble(col(value)).as("__total"), count(lit(1)).as("cnt"))
      .withColumn("score", col("__total").cast("double") / (col("cnt") + bias))
      .drop("__total")
      .orderBy(col("score").desc, col(key))
      .limit(k)

  /** J2 — candidate generation: every entity × a small top-k pool.
    * `broadcast()` forces `BroadcastNestedLoopJoin` — the pool is ≤ k rows
    * by construction, so no shuffle of the (large) entity side happens
    * (reference `popularity_with_bias_evaluation.py:43`). */
  def candidates(entities: DataFrame, pool: DataFrame): DataFrame =
    entities.crossJoin(broadcast(pool))

  /** J3 — remove already-seen (entity, item) pairs via multi-key left-anti
    * join (reference `popularity_evalutaion.py:47-48`). */
  def removeSeen(candidates: DataFrame, seen: DataFrame, keys: Seq[String]): DataFrame =
    candidates.join(seen.select(keys.map(col): _*).distinct(), keys, "left_anti")

  /** W2 — per-key top-k by an explicit deterministic ordering. The
    * reference's quirk (SURVEY.md §2.5): rank candidates by *ascending
    * item id*, not score — preserved here by letting the caller pass the
    * ordering. */
  def perKeyTopK(df: DataFrame, key: String, order: Seq[Column], k: Int,
                 rankCol: String = "rank"): DataFrame = {
    val w = Window.partitionBy(key).orderBy(order: _*)
    df.withColumn(rankCol, row_number().over(w)).filter(col(rankCol) <= k)
  }

  /** W2's sort-free form for the ascending-single-column ordering:
    * per-key top-k via the bounded-heap aggregate
    * ([[org.apache.spark.sql.graft.TopKAgg]]) instead of the row_number
    * window. Output is IDENTICAL to [[perKeyTopK]] with
    * `order = Seq(col(item))` (total order required: `item` unique per
    * key). Spark 4's WindowGroupLimit already bounds the window form's
    * shuffle; what the aggregate removes is both per-partition sorts
    * (heap upkeep is O(n log k)) and the separate rank-assignment pass
    * — the array explodes straight into ranked rows. */
  def perKeyTopKAggAsc(df: DataFrame, keys: Seq[String], item: String,
                       k: Int, rankCol: String = "rank"): DataFrame = {
    val keyCols = keys.map(col)
    df.groupBy(keyCols: _*)
      .agg(graft.functions.GraftFunctions.topk_agg(col(item), k)
        .as("__topk"))
      .select(keyCols :+ posexplode(col("__topk")).as(Seq("__pos", item)): _*)
      .withColumn(rankCol, (col("__pos") + 1).cast("int"))
      .drop("__pos")
  }

  /** O5 — stable global row index over an explicit total order (the
    * engine replacement for the reference's `rdd.zipWithIndex` slicing,
    * `top_100_pairs.py:69-71`, which was partition-layout-dependent and
    * recomputed per batch). A single un-partitioned window is the simple
    * form; for genuinely huge inputs prefer ranking within a keyed window
    * or `hashSample`. */
  def withRowIndex(df: DataFrame, order: Seq[Column],
                   out: String = "row_idx"): DataFrame =
    df.withColumn(out, row_number().over(Window.orderBy(order: _*)).cast("long"))

  /** A5 with deterministic order — per-key sorted item list rendered as a
    * comma-joined string (stable for hashing; arrays have
    * order-nondeterministic `collect_list` after shuffle). */
  def sortedList(df: DataFrame, key: String, item: String,
                 out: String): DataFrame =
    df.groupBy(key)
      .agg(array_join(
        transform(sort_array(collect_list(col(item))), _.cast("string")),
        ",").as(out))

  /** Sequential conversion funnel — the ordered-pattern analytic
    * (first `stages(0)`, then the first `stages(1)` STRICTLY after it,
    * then the first `stages(2)` after that, …): one row per key that
    * entered the funnel, with each stage's event time `t0..tN`, null
    * from the first missed stage on.
    *
    * Shape: a cascade of (filter → co-keyed join → partial-aggregated
    * min) per stage, then left-joins back onto the entry frame — every
    * shuffle in the plan is on the SAME key, so AQE coalesces the
    * cascade into co-partitioned stages; nothing is ordered globally and
    * no per-key event list is ever materialized (the window-sort
    * alternative would buffer each key's full history to walk it once —
    * this form only ever aggregates mins). */
  def funnel(df: DataFrame, key: String, typeCol: String, tsCol: String,
             stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val entry = df.filter(col(typeCol) === stages.head)
      .groupBy(col(key)).agg(min(col(tsCol)).as("t0"))
    val reached = stages.indices.tail.scanLeft(entry) { (acc, i) =>
      df.filter(col(typeCol) === stages(i))
        .select(col(key), col(tsCol))
        .join(acc.select(col(key), col(s"t${i - 1}")), key)
        .filter(col(tsCol) > col(s"t${i - 1}"))
        .groupBy(col(key)).agg(min(col(tsCol)).as(s"t$i"))
    }
    reached.tail.foldLeft(reached.head)((l, r) => l.join(r, Seq(key), "left"))
  }
}
