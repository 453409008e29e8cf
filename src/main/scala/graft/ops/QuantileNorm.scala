package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions.{qdec, qround}

/** Quantile normalization across groups — map each group's value
  * distribution onto the POOLED distribution, so per-source scores
  * become comparable before a single global threshold is applied (the
  * batch-effect correction of bioinformatics, reused for training-data
  * curation: source A's "quality 0.7" and source B's "quality 0.7"
  * rarely mean the same thing).
  *
  * Scale posture: the textbook algorithm is two GLOBAL SORTS (rank
  * every row, join ranks) — the canonical anti-pattern this repo
  * rewrites. Here each distribution is summarized by `probes`+1 exact
  * percentile boundaries (one aggregate each — mergeable, map-side
  * partial; at 100 TB swap in `approx_percentile`, same shape), the
  * per-group tables broadcast, and every row maps through two
  * piecewise-linear interpolations: value → group percentile → pooled
  * value. O(rows) work, no row ever shuffles.
  *
  * Determinism: boundaries are rounded to 6 dp before any arithmetic,
  * the group percentile is rounded before the pooled lookup, and both
  * interpolations are fixed double expressions of those constants —
  * bit-identical cross-engine. Flat segments (equal adjacent
  * boundaries) contribute zero fraction instead of 0/0.
  */
object QuantileNorm {

  /** (id, group, v, p_src, v_norm) per row. `probes` = segments per
    * distribution (10 → decile-resolution interpolation). */
  def normalize(df: DataFrame, id: Column, group: Column, value: Column,
                probes: Int = 10): DataFrame = {
    val ps = (0 to probes).map(i => i.toDouble / probes)
    val psSql = ps.map(p => s"${p}D").mkString(", ")
    val rows = df.select(id.as("rid"), group.as("grp"),
      value.cast("double").as("v"))

    val gb = rows.agg(expr(s"percentile(v, array($psSql))").as("raw"))
      .select(expr("transform(raw, b -> floor((b) * 1000000.0 + 0.5) / 1000000.0)").as("gb"))
    val sb = rows.groupBy("grp")
      .agg(expr(s"percentile(v, array($psSql))").as("raw"))
      .select(col("grp"), expr("transform(raw, b -> floor((b) * 1000000.0 + 0.5) / 1000000.0)").as("sb"))

    val n = lit(probes)
    val withP = rows.join(broadcast(sb), "grp").crossJoin(broadcast(gb))
      .withColumn("i",
        greatest(lit(1), least(n, size(expr("filter(sb, b -> b < v)")))))
      .withColumn("lo", element_at(col("sb"), col("i")))
      .withColumn("hi", element_at(col("sb"), col("i") + 1))
      .withColumn("frac",
        when(col("hi") > col("lo"),
          (col("v") - col("lo")) / (col("hi") - col("lo")))
          .otherwise(lit(0.0)))
      .withColumn("p_src", qround(
        ((col("i") - 1).cast("double") + col("frac")) / n.cast("double"),
        6))

    withP
      .withColumn("j",
        least(floor(col("p_src") * n).cast("int"), n - 1))
      .withColumn("glo", element_at(col("gb"), col("j") + 1))
      .withColumn("ghi", element_at(col("gb"), col("j") + 2))
      .withColumn("jfrac", col("p_src") * n.cast("double") -
        col("j").cast("double"))
      .withColumn("v_norm",
        qround(col("glo") + col("jfrac") * (col("ghi") - col("glo")), 6))
      .select(col("rid"), col("grp"), col("v"), col("p_src"),
        col("v_norm"))
  }
}
