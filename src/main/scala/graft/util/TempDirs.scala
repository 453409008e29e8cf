package graft.util

import java.nio.file.{Files, Path}

/** Temp-directory hygiene shared by the staging sources/sinks and the
  * bench warm dir: recursive delete that CLOSES the `Files.walk` stream
  * (the walk holds an open directory handle per level; a leaked one per
  * staged dir adds up in a long-lived JVM), and a register-once shutdown
  * hook wrapper around it.
  */
object TempDirs {

  /** Delete `d` and everything under it, deepest-first. Best-effort: a
    * concurrent writer or permission failure is swallowed — callers are
    * temp-space janitors, never correctness paths. */
  def deleteRecursively(d: Path): Unit =
    try {
      import scala.jdk.CollectionConverters._
      val walk = Files.walk(d)
      try walk.iterator().asScala.toSeq.sortBy(-_.getNameCount)
        .foreach(p => Files.deleteIfExists(p))
      finally walk.close()
    } catch { case _: Throwable => () }

  /** Remove `d` recursively at JVM exit. */
  def cleanupOnExit(d: Path): Unit = {
    sys.addShutdownHook(deleteRecursively(d))
    ()
  }
}
