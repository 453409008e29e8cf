package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal) join — attach to each probe row the most recent
  * state row of the same key with `state.time <= probe.time` (inclusive,
  * matching DuckDB/kdb ASOF semantics). Spark has no native ASOF join;
  * the naive encodings are a range theta-join (O(|probe|·|state|) per
  * key) or a per-row subquery — both scale-killers.
  *
  * This implementation composes existing operators (build brief
  * preference (a)): tag and UNION the two inputs, then one window per
  * key ordered by (time, kind) carrying the last non-null payload
  * forward. Exactly ONE shuffle (by key) + one sort — the same cost as
  * a sort-merge join of the two tables, independent of how many state
  * rows precede each probe. State rows order before probe rows at equal
  * timestamps (`kind` 0 < 1), which is what makes the match inclusive.
  *
  * Contract: `state` must hold at most one row per (key, time) — ties
  * inside a key-timestamp would make "the most recent row" ill-defined
  * on ANY engine (DuckDB's ASOF picks arbitrarily); pre-aggregate
  * upstream, as q76 does. Probe rows with no preceding state row get
  * null payloads (LEFT asof). A pathological single key holding a large
  * fraction of both tables serializes its window sort — range-bucket
  * the time axis inside such keys before reaching for this operator.
  */
object AsOf {

  def asofJoin(probe: DataFrame, state: DataFrame, key: String,
               time: String, payload: Seq[String]): DataFrame = {
    val stateTypes = state.schema.fields.map(f => f.name -> f.dataType).toMap
    val probeCols = probe.columns.toSeq
    val p = probe.select(
      probeCols.map(col) ++
        Seq(lit(1).as("__kind")) ++
        payload.map(c => lit(null).cast(stateTypes(c)).as(c)): _*)
    val probeTypes = probe.schema.fields.map(f => f.name -> f.dataType).toMap
    val s = state.select(
      probeCols.map {
        case c if c == key || c == time => col(c)
        case c => lit(null).cast(probeTypes(c)).as(c)
      } ++ Seq(lit(0).as("__kind")) ++ payload.map(col): _*)
    val w = Window.partitionBy(key).orderBy(col(time), col("__kind"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    p.unionByName(s)
      .select(
        probeCols.map(col) ++ Seq(col("__kind")) ++
          payload.map(c => last(col(c), ignoreNulls = true).over(w).as(c)): _*)
      .filter(col("__kind") === 1)
      .drop("__kind")
  }
}
