package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CDC merge / upsert — the lakehouse `MERGE INTO` shape expressed
  * relationally (one full-outer join on the key), for engines/sinks that
  * lack a transactional MERGE. Classifies every key as
  * `insert` / `update` / `unchanged` / `retain` and emits the merged
  * payload (updates win), so the output IS the next table version plus
  * its change audit in one pass.
  *
  * Scale shape: both sides shuffle once on the (unique) merge key — a
  * \|keys\|-sized join, never a fact-×-fact blowup. At warehouse scale the
  * base side is a partitioned table: feed only the partitions the update
  * batch touches (dynamic partition overwrite) and the join never reads
  * cold partitions. Compare columns are checked null-safely (`<=>`), so
  * NULL→value and value→NULL transitions classify as `update`, not
  * `unchanged`.
  */
object Merge {

  /** Merge `updates` into `base` on unique key `key`; `payload` are the
    * non-key columns carried (and compared) through the merge.
    *
    * Output columns: `key`, each payload column (update's value where the
    * key is present in `updates`, else base's), and `action`:
    *   - `insert`    — key only in `updates`
    *   - `retain`    — key only in `base` (no WHEN-NOT-MATCHED-BY-SOURCE
    *                   clause: the row survives unchanged)
    *   - `update`    — key in both, any payload column differs (null-safe)
    *   - `unchanged` — key in both, payload identical
    */
  def mergeUpsert(base: DataFrame, updates: DataFrame, key: String,
                  payload: Seq[String]): DataFrame = {
    val b = base.select(col(key) +: payload.map(c => col(c).as(s"__b_$c")): _*)
      .withColumn("__in_b", lit(1))
    val u = updates.select(col(key) +: payload.map(c => col(c).as(s"__u_$c")): _*)
      .withColumn("__in_u", lit(1))
    val j = b.join(u, Seq(key), "full_outer")
    val differs = payload
      .map(c => !(col(s"__b_$c") <=> col(s"__u_$c")))
      .reduce(_ || _)
    val action = when(col("__in_b").isNull, "insert")
      .when(col("__in_u").isNull, "retain")
      .when(differs, "update")
      .otherwise("unchanged")
    val merged = payload.map(c =>
      when(col("__in_u").isNotNull, col(s"__u_$c"))
        .otherwise(col(s"__b_$c")).as(c))
    j.select(col(key) +: merged :+ action.as("action"): _*)
  }
}
