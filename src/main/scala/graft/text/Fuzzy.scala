package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
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

  /** Multi-pass sorted-neighborhood candidate pairs over a distinct-name
    * frame (column `name`): each pass sorts the vocabulary on a key and
    * pairs every name with its next `w` neighbors via a lead-chain —
    * candidate volume is EXACTLY ≤ passes·w·|vocab|, linear in the
    * vocabulary where the naive pair space is quadratic. Two passes
    * (prefix order, reversed-name order) recover pairs a single sort key
    * would split — the standard multi-pass SNM recall lever, same
    * argument as multi-band LSH. Windows partition on the pass's first
    * character, so no global sort appears; callers verify candidates
    * with their own distance predicate. Output: (name_a, name_b)
    * canonical (name_a < name_b), distinct. */
  def sortedNeighborhoodPairs(names: DataFrame, w: Int): DataFrame = {
    def pass(sort: org.apache.spark.sql.Column,
             block: org.apache.spark.sql.Column): DataFrame = {
      val win = Window.partitionBy(block).orderBy(sort)
      names
        .select(col("name") +: (1 to w).map(i =>
          lead(col("name"), i).over(win).as(s"n$i")): _*)
        .select(col("name"),
          explode(array((1 to w).map(i => col(s"n$i")): _*)).as("nb"))
        .filter(col("nb").isNotNull)
        .select(least(col("name"), col("nb")).as("name_a"),
          greatest(col("name"), col("nb")).as("name_b"))
    }
    pass(col("name"), substring(col("name"), 1, 1))
      .unionByName(pass(reverse(col("name")),
        substring(reverse(col("name")), 1, 1)))
      .distinct()
  }
}
