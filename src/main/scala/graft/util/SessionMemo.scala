package graft.util

import org.apache.spark.sql.SparkSession

/** Session-scoped memoization for expensive intermediates (cached
  * projections, fitted models, materialized pair lists).
  *
  * Keyed by the SparkSession REFERENCE (SparkSession uses object
  * identity for equality) plus a caller-chosen string that must encode the
  * full identity of the computed value — input path/dir AND any
  * parameters; two builds that could differ must not share a key.
  *
  * Entries live as long as the session object is referenced here; that is
  * the intended lifecycle for the driver's one-session-per-run
  * Verify/Bench processes. Long-lived multi-session JVMs should call
  * [[clear]] on session stop (persisted DataFrames are unpersisted).
  *
  * Concurrency: `build` runs exactly once per key. Concurrent callers of
  * the same key block on the winner's evaluation (a lost race would leak
  * the loser's side effects — e.g. an orphaned `persist` handle).
  */
object SessionMemo {
  /** Holder giving each key one evaluation lock; `peek` exposes the value
    * only if already computed (so [[clear]] never forces a build). The
    * build closure is RELEASED after evaluation: call sites pass by-name
    * thunks capturing enclosing locals (intermediate frames, models),
    * and entries live for the whole session — holding the closure would
    * keep that entire captured scope unreclaimable alongside the value. */
  private final class Memo(b: () => Any) {
    private var build: () => Any = b // mutated only under `synchronized`
    @volatile private var result: Option[Any] = None
    def value: Any = result match {
      case Some(v) => v
      case None => this.synchronized {
        result match {
          case Some(v) => v
          case None =>
            val v = build()
            result = Some(v)
            build = null
            v
        }
      }
    }
    def peek: Option[Any] = result
  }

  private val cache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), Memo]

  def apply[T](spark: SparkSession, key: String)(build: => T): T = {
    val fresh = new Memo(() => build)
    cache.putIfAbsent((spark, key), fresh).getOrElse(fresh)
      .value.asInstanceOf[T]
  }

  /** Memoize a DataFrame and persist it. MEMORY_AND_DISK by default: these
    * are hot intermediates shared by several queries, and under cache
    * pressure an evicted MEMORY_ONLY block silently recomputes its whole
    * lineage per downstream query (the round-3 q50/q51 regression) — disk
    * spill degrades to a local read instead. */
  def cached(spark: SparkSession, key: String,
             level: org.apache.spark.storage.StorageLevel =
               org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
            (build: => org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    apply(spark, key)(build.persist(level))

  /** Drop (and unpersist) everything memoized for a session. Acquiring
    * each Memo's evaluation lock awaits in-flight builds, so a
    * concurrently-built persisted DataFrame is unpersisted rather than
    * leaked (a build that STARTS after its entry is removed is the
    * caller's sequencing problem — clear on session stop). */
  def clear(spark: SparkSession): Unit =
    cache.keys.filter(_._1 eq spark).foreach { k =>
      cache.remove(k).flatMap(m => m.synchronized(m.peek)).foreach {
        case df: org.apache.spark.sql.Dataset[_] =>
          try df.unpersist(blocking = false) catch { case _: Throwable => () }
        case m: org.apache.spark.ml.recommendation.ALSModel =>
          // AlsRec.fit persists the factor frames of memoized models.
          try {
            m.userFactors.unpersist(blocking = false)
            m.itemFactors.unpersist(blocking = false)
          } catch { case _: Throwable => () }
        case _ => ()
      }
    }
}
