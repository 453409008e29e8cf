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
  */
object SessionMemo {
  private val cache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), Any]

  def apply[T](spark: SparkSession, key: String)(build: => T): T =
    cache.getOrElseUpdate((spark, key), build).asInstanceOf[T]

  /** Memoize a DataFrame and persist it in memory. */
  def cached(spark: SparkSession, key: String)
            (build: => org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    apply(spark, key)(
      build.persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY))

  /** Drop (and unpersist) everything memoized for a session. */
  def clear(spark: SparkSession): Unit =
    cache.keys.filter(_._1 eq spark).foreach { k =>
      cache.remove(k).foreach {
        case df: org.apache.spark.sql.DataFrame =>
          try df.unpersist(blocking = false) catch { case _: Throwable => () }
        case _ => ()
      }
    }
}
