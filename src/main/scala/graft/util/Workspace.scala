package graft.util

import java.nio.file.{Files, Path}
import java.util.Comparator

import scala.collection.mutable.ArrayBuffer

/** Temp workspaces for queries that round-trip data through the local
  * filesystem (landing dirs, warehouses, checkpoints). Each workspace is
  * registered for recursive deletion at JVM exit — and, inside a
  * [[scoped]] block, deleted EAGERLY on success, so a 128-query Verify
  * or a multi-pass Bench holds at most one query's scratch on disk at a
  * time (the shutdown hook alone can't bound that: the dirs pile up for
  * the whole run, and a driver-side timeout SIGKILL never runs the
  * hook).
  */
object Workspace {

  /** Create a temp directory removed at JVM shutdown (and at the end of
    * the enclosing [[scoped]] block, if any). */
  def temp(prefix: String): String = {
    val dir = Files.createTempDirectory(prefix)
    register(dir)
    dir.toString
  }

  private val registered = new java.util.concurrent.ConcurrentLinkedQueue[Path]()
  private lazy val hook: Unit = Runtime.getRuntime.addShutdownHook(new Thread(() => {
    registered.forEach(delete(_))
  }))

  // innermost active scope on THIS thread; queries build and materialize
  // on the caller's thread, so thread-locality is the ownership boundary
  // that lets scopes run concurrently (Verify dumps queries in parallel)
  private val scopes = new ThreadLocal[ArrayBuffer[ArrayBuffer[Path]]] {
    override def initialValue(): ArrayBuffer[ArrayBuffer[Path]] = ArrayBuffer.empty
  }

  private def register(p: Path): Unit = {
    synchronized { hook; registered.add(p) }
    val st = scopes.get()
    if (st.nonEmpty) st.last += p
  }

  /** Run `f` and delete every workspace dir created on this thread
    * inside it — on SUCCESS only (a failed query keeps its scratch for
    * post-mortem; the shutdown hook still reclaims it). Delete-on-
    * success is safe because callers materialize everything they return
    * inside the block (Verify writes the result parquet, Bench drains
    * the noop write) — nothing lazy escapes. */
  def scoped[T](f: => T): T = {
    val mine = ArrayBuffer.empty[Path]
    val st = scopes.get()
    st += mine
    val r = try f finally { st.dropRightInPlace(1) }
    mine.foreach { p => delete(p); registered.remove(p) }
    r
  }

  private def delete(root: Path): Unit =
    try {
      if (Files.exists(root))
        Files.walk(root).sorted(Comparator.reverseOrder[Path]())
          .forEach(f => try Files.deleteIfExists(f) catch { case _: Exception => () })
    } catch { case _: Exception => () }
}
