package graft.sketch

import graft.functions.GraftFunctions.md5_63

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch over a key column — the fixed-space (depth × width
  * cells, independent of key cardinality) frequency summary whose
  * estimates only ever OVER-count: est(k) = min over rows r of
  * cell(r, h_r(k)) ≥ true(k).
  *
  * Hashing is the repo-standard keyed md5 ([[graft.functions
  * .GraftFunctions.md5_63]] of `"r:key"`, bucket = mod width), so the
  * sketch is layout- and engine-independent: the DuckDB oracle rebuilds
  * the identical cells and the gate compares estimates EXACTLY — a
  * deterministic sketch, unlike seed-per-partition implementations.
  *
  * Scale shape: one map-side-combined groupBy builds per-key counts, a
  * second builds the depth·width cell table (fixed size — at 100 TB the
  * cells frame is still ≤ a few thousand rows, broadcastable), and the
  * estimate join is a broadcast hash join: the big side never shuffles
  * again. Cells from disjoint data shards MERGE by cell-wise addition,
  * which is what makes CMS the streaming/pre-aggregated-rollup frequency
  * structure (vs an exact groupBy whose state grows with cardinality).
  */
object CountMin {

  /** Per-key exact counts annotated with the CMS estimate: (k, c, est).
    * `est ≥ c` always; equality iff no bucket collision in some row. */
  def estimates(df: DataFrame, key: Column,
                depth: Int, width: Int): DataFrame = {
    require(depth >= 1 && width >= 2, s"bad sketch shape $depth x $width")
    // Materialize the per-key counts once (|distinct keys| rows): both the
    // cell build and the estimate join read them, and without the
    // checkpoint each consumer re-scans and re-aggregates the corpus.
    val counts = df.groupBy(key.cast("string").as("k"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint()
    val keyed = counts.select(col("k"), col("c"),
        explode(array((0 until depth).map(lit): _*)).as("r"))
      .withColumn("b",
        pmod(md5_63(concat(col("r").cast("string"), lit(":"), col("k"))),
          lit(width.toLong)))
    val cells = keyed.groupBy("r", "b").agg(sum("c").as("cell"))
    keyed.join(broadcast(cells), Seq("r", "b"))
      .groupBy("k", "c").agg(min("cell").as("est"))
  }
}
