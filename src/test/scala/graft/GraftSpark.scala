package graft

import org.apache.spark.sql.SparkSession

/** Shared test session (one per JVM — suites reuse it via getOrCreate). */
object GraftSpark {
  private lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Returns the shared session AND re-asserts it as the CALLING
    * thread's active session. Suites run sequentially but on changing
    * runner threads, and `getOrCreate` set the active-session
    * thread-local only on the first one; Spark's own action paths
    * (`withActive`) set-and-RESTORE it, so between actions most runner
    * threads carry none. That matters because AQE's shared
    * QueryStageCreator workers are a cached pool whose threads are
    * lazily (re)created after idle and INHERIT the creating thread's
    * active session: a worker born from a session-less runner thread
    * builds re-optimized plan nodes with `SparkPlan.session = null`
    * inside a memoized frame's cached plan, and the next consumer's
    * `collect` dies in `resetMetrics` forcing that node's lazy
    * `metrics` (the VERIFY_r16 q269/q267 `[INTERNAL_ERROR]` NPE —
    * VERDICT r16 #2). Pinning the active session on every thread that
    * obtains the session closes the hole at its root. */
  def spark: SparkSession = {
    val s = session
    SparkSession.setActiveSession(s)
    s
  }
  val sf: String = "/root/testdata/sf0.001"
}
