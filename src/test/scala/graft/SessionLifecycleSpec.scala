package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** VERDICT r16 #2: the driver's `sbt test` hit an [INTERNAL_ERROR] NPE
  * (`SparkPlan.session() is null` in `resetMetrics`) because a suite
  * runner thread without an active session seeded AQE's inheritable
  * thread-local into a lazily-created QueryStageCreator worker. The fix
  * is lifecycle, not semantics: every path that hands a thread the
  * shared session must pin it as that thread's active session. These
  * tests pin the two fix points (GraftSpark accessor, ALS grid pool). */
class SessionLifecycleSpec extends AnyFunSuite {

  test("GraftSpark.spark pins the active session on a fresh thread " +
      "that explicitly cleared it") {
    GraftSpark.spark // ensure the session exists first
    @volatile var activeAfter: Option[SparkSession] = None
    val t = new Thread(() => {
      // A new thread INHERITS the parent's active session; clear it to
      // model a runner thread that never had one.
      SparkSession.clearActiveSession()
      val s = GraftSpark.spark
      activeAfter = SparkSession.getActiveSession.map(_ => s)
    })
    t.start()
    t.join(30000)
    assert(activeAfter.isDefined,
      "GraftSpark.spark must set the calling thread's active session")
  }

  test("ALS grid pool threads see an active session even when the " +
      "submitter has none") {
    val spark = GraftSpark.spark
    import spark.implicits._
    // Tiny but trainable: 3 users x 3 items, so one 1-combo grid runs a
    // real fit on the pool thread.
    val train = Seq((1, 1, 5.0), (1, 2, 3.0), (2, 1, 4.0), (2, 3, 2.0),
        (3, 2, 4.0), (3, 3, 5.0))
      .toDF("user_id", "item_id", "rating")
    val valid = Seq((1, 3, 4.0)).toDF("user_id", "item_id", "rating")
    @volatile var seen: Boolean = false
    @volatile var err: Option[Throwable] = None
    val t = new Thread(() => {
      try {
        SparkSession.clearActiveSession() // submitter has no session
        graft.rec.AlsRec.gridSearch(train, valid,
          ranks = Seq(2), regs = Seq(0.1), topN = 2, maxIter = 2,
          evalFn = (recs, _) => {
            // Runs on the pool thread — the fix pins the session there.
            seen = SparkSession.getActiveSession.isDefined
            recs.count().toDouble
          },
          cacheKey = s"session-lifecycle-spec-${System.nanoTime()}")
      } catch { case e: Throwable => err = Some(e) }
    })
    t.start()
    t.join(120000)
    assert(err.isEmpty, s"gridSearch failed from a session-less thread: $err")
    assert(seen, "pool thread must carry an active session")
  }
}
