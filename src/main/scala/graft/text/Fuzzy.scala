package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Blocked fuzzy (edit-distance) matching — the entity-resolution
  * primitive: find near-identical name variants WITHOUT the all-pairs
  * O(N²) levenshtein wall.
  *
  * Two structural levers make this 100 TB-safe:
  *   1. match on the DISTINCT name vocabulary, not on rows — vocabulary
  *      grows sub-linearly with data (here it is bounded by the name
  *      generator), so the quadratic lives on |vocab|, never on |rows|;
  *      per-name row counts are carried through so the resolved pairs
  *      map back to row mass without a second scan.
  *   2. an equi-join blocking key (the name's last token — the "entity
  *      type" word) turns the pair space into per-block cliques: only
  *      same-block names ever meet the levenshtein filter. This is the
  *      standard recall trade of blocked ER — pairs whose edit distance
  *      lives in the blocking token are missed by design; tighten recall
  *      by unioning a second blocking pass on a different key (e.g.
  *      first token), exactly like multi-band LSH.
  */
object Fuzzy {

  /** Distinct values of `nameCol` that agree on blocking key (last
    * whitespace token) and sit within levenshtein distance [1, maxDist]:
    * (name_a, name_b, dist, n_rows_a, n_rows_b), name_a < name_b. */
  def nearNamePairs(df: DataFrame, nameCol: String,
                    maxDist: Int): DataFrame = {
    val names = df.groupBy(col(nameCol).as("name"))
      .agg(count(lit(1)).as("n_rows"))
      .withColumn("blk", regexp_extract(col("name"), "(\\S+)$", 1))
    names.as("a").join(names.as("b"),
        col("a.blk") === col("b.blk") && col("a.name") < col("b.name"))
      .withColumn("dist", levenshtein(col("a.name"), col("b.name")))
      .filter(col("dist").between(1, maxDist))
      .select(col("a.name").as("name_a"), col("b.name").as("name_b"),
        col("dist"), col("a.n_rows").as("n_rows_a"),
        col("b.n_rows").as("n_rows_b"))
  }
}
