package graft.util

import java.nio.file.{Files, Path}
import java.util.Comparator

/** Temp workspaces for queries that round-trip data through the local
  * filesystem (landing dirs, warehouses, checkpoints). Each workspace is
  * registered for recursive deletion at JVM exit, so repeated
  * Verify/Bench runs don't accumulate unbounded /tmp usage.
  */
object Workspace {

  /** Create a temp directory removed at JVM shutdown. */
  def temp(prefix: String): String = {
    val dir = Files.createTempDirectory(prefix)
    register(dir)
    dir.toString
  }

  private val registered = new java.util.concurrent.ConcurrentLinkedQueue[Path]()
  private lazy val hook: Unit = Runtime.getRuntime.addShutdownHook(new Thread(() => {
    registered.forEach(delete(_))
  }))

  private def register(p: Path): Unit = synchronized { hook; registered.add(p) }

  private def delete(root: Path): Unit =
    try {
      if (Files.exists(root))
        Files.walk(root).sorted(Comparator.reverseOrder[Path]())
          .forEach(f => try Files.deleteIfExists(f) catch { case _: Exception => () })
    } catch { case _: Exception => () }
}
