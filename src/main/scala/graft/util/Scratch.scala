package graft.util

import java.nio.file.{Files, Path, Paths}

/** Per-process scratch space for round-trip sink/source queries.
  *
  * Layout: ONE pid-scoped root (`graft-scratch-<pid>/`) holding a fixed
  * subdirectory per query. The three-way contract (each clause closed a
  * real defect in r9):
  *  - fixed WITHIN a process → repeated bench/verify iterations
  *    overwrite one directory instead of leaking a fresh
  *    createTempDirectory copy per invocation;
  *  - pid in the path → two concurrent graft JVMs can never read each
  *    other's half-overwritten files;
  *  - stale root deleted at first use + a shutdown hook deleting it at
  *    exit → runs don't abandon table copies in tmpdir, and an OS-
  *    recycled pid can't hand a new process leftover files that a
  *    read glob would silently include.
  */
object Scratch {

  private[graft] def deleteRecursively(p: Path): Unit =
    try {
      if (Files.exists(p)) {
        import scala.jdk.CollectionConverters._
        val walk = Files.walk(p)
        try walk.iterator().asScala.toSeq.reverse
          .foreach(f => Files.deleteIfExists(f))
        finally walk.close() // the stream holds a directory handle
      }
    } catch {
      // Shutdown hooks run concurrently with Spark's own (context stop,
      // Derby shutdown); a file vanishing mid-walk is fine — leftover
      // fragments are reclaimed by the next same-pid run's stale-clean.
      case _: java.io.IOException | _: java.io.UncheckedIOException => ()
    }

  private lazy val root: Path = {
    val r = Paths.get(sys.props("java.io.tmpdir"),
      s"graft-scratch-${ProcessHandle.current().pid()}")
    deleteRecursively(r) // stale copy from a recycled pid
    Files.createDirectories(r)
    Runtime.getRuntime.addShutdownHook(
      new Thread(() => deleteRecursively(r), "graft-scratch-cleanup"))
    r
  }

  /** Scratch directory for `name`, created on first use. */
  def dir(name: String): String = {
    val p = root.resolve(name)
    Files.createDirectories(p)
    p.toString
  }

  /** Scratch directory for `name`, EMPTIED on every call — for sinks
    * whose own commit/metadata log would treat leftovers from a prior
    * invocation as already-committed output (the streaming file sink). */
  def freshDir(name: String): String = {
    val p = root.resolve(name)
    deleteRecursively(p)
    Files.createDirectories(p)
    p.toString
  }
}
