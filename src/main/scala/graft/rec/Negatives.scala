package graft.rec

import graft.functions.GraftFunctions.md5_63
import graft.ops.Relational

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Negative sampling for implicit-feedback training: k random
  * NON-interacted items per user, the counterexamples a ranking loss
  * (BPR, sampled softmax, InfoNCE) needs alongside the positives.
  *
  * Randomness is the repo-standard keyed PRNG — rank candidates by
  * `md5_63("user:item")` — so the sample is seedless-deterministic,
  * layout-independent, and DuckDB-reproducible (no `rand()` whose
  * per-partition streams change with parallelism).
  *
  * Scale shape: the item pool is broadcast and each user's candidates
  * are generated in-map (broadcast nested loop), the seen-set removal is
  * a hash anti-join on (user, item), and per-user top-k is a
  * WindowGroupLimit — no candidate materialization beyond the per-task
  * stream. At catalog scale (10⁸ items) the pool itself must shrink
  * first — popularity-top-N or an md5 threshold on the item id — which
  * composes: both are filters on the broadcast side.
  */
object Negatives {

  /** (user_id, rank, item_id): k pseudo-random unseen items per user,
    * rank 1 = smallest hash. `ratings` needs (user_id, item_id); null
    * item_ids are ignored. */
  def sample(ratings: DataFrame, k: Int): DataFrame = {
    // Three consumers (users, items, the anti-join) — materialize the
    // distinct interaction set once instead of re-aggregating per use.
    val seen = ratings.select(col("user_id"), col("item_id"))
      .filter(col("item_id").isNotNull)
      .distinct()
      .localCheckpoint()
    val users = seen.select("user_id").distinct()
    val items = seen.select("item_id").distinct()
    val cand = users.crossJoin(broadcast(items))
      .withColumn("h", md5_63(concat(col("user_id").cast("string"),
        lit(":"), col("item_id").cast("string"))))
    val negs = cand.join(seen, Seq("user_id", "item_id"), "left_anti")
    Relational.perKeyTopK(negs, "user_id",
        Seq(col("h"), col("item_id")), k)
      .select("user_id", "rank", "item_id")
  }
}
