package graft.streaming

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

/** THE file-level commit discipline every streaming store here shares
  * — extracted so the invariants live once instead of in five
  * hand-rolled copies ([[ClusterStream]]'s manifest, [[CountStream]]'s
  * generation and delta pointers, [[Reservoir]]'s generation,
  * [[Lineage]]'s stamp, [[CorpusBuilder]]'s filter + builder lock):
  *
  *   1. ATOMIC POINTER SWAP — tmp-sibling write + atomic rename of
  *      one pointer/manifest file; readers see old or new, never torn.
  *   2. REFERENCED-NEVER-DELETED — data dirs are written BEFORE the
  *      pointer references them, swept only AFTER nothing does; a
  *      crash leaves a readable store plus at worst ghost dirs.
  *   3. REPLAY GUARD — the pointer carries the last committed batch
  *      id, so an at-least-once redelivery is a no-op.
  *   4. LINEAGE BIND — batch-id guards are meaningful within ONE
  *      checkpoint lineage ([[Lineage]], built on the same swap).
  *   5. HOLDER LOCK + COMMIT RE-CHECK — writer exclusivity via an
  *      atomically-created lock file whose token the holder re-checks
  *      at its commit point ([[acquireHolderLock]]).
  */
object StoreManifest {

  /** Invariant 1: tmp-sibling write + atomic rename. */
  def atomicWrite(target: Path, content: String): Unit = {
    Files.createDirectories(target.getParent)
    val tmp = target.resolveSibling(target.getFileName.toString + ".tmp")
    Files.writeString(tmp, content)
    Files.move(tmp, target, StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
  }

  /** [[atomicWrite]] for binary payloads (bloom filters). */
  def atomicWriteBytes(target: Path, bytes: Array[Byte]): Unit = {
    Files.createDirectories(target.getParent)
    val tmp = target.resolveSibling(target.getFileName.toString + ".tmp")
    Files.write(tmp, bytes)
    Files.move(tmp, target, StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
  }

  def readIfExists(p: Path): Option[String] =
    if (Files.exists(p)) Some(Files.readString(p)) else None

  /** Total row count of the parquet data files directly under `dir`,
    * summed from the file FOOTERS on the driver — a metadata read, no
    * Spark job. The per-trigger store disciplines use it for the
    * emptiness / cardinality checks they run on files they JUST wrote:
    * a `spark.read.parquet(dir).count()` there prices a whole
    * scan-job's scheduling against information parquet already
    * committed to every footer. Local-filesystem stores only (the
    * java.nio contract every generation/delta store here already
    * carries). */
  def parquetRowCount(dir: Path): Long =
    if (!Files.isDirectory(dir)) 0L
    else {
      val ls = Files.list(dir)
      val files =
        try ls.iterator.asScala.filter { p =>
          val n = p.getFileName.toString
          Files.isRegularFile(p) && n.endsWith(".parquet") &&
            !n.startsWith("_") && !n.startsWith(".")
        }.toList
        finally ls.close()
      files.map { f =>
        val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(f.toUri),
          new org.apache.hadoop.conf.Configuration())
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try r.getRecordCount finally r.close()
      }.sum
    }

  def deleteRecursively(p: Path): Unit = if (Files.exists(p)) {
    val walk = Files.walk(p)
    try walk.sorted(java.util.Comparator.reverseOrder[Path]())
      .forEach(f => Files.deleteIfExists(f))
    finally walk.close()
  }

  /** Invariant 2's sweep half: delete every child DIRECTORY of `root`
    * whose name fails `keep`. Pointer-referenced names must be kept by
    * the caller's predicate; files (pointers, locks) are never
    * touched. */
  def sweepChildDirs(root: Path, keep: String => Boolean): Unit =
    if (Files.exists(root)) {
      val ls = Files.list(root)
      try ls.iterator.asScala.filter(Files.isDirectory(_)).toList
        .foreach(d => if (!keep(d.getFileName.toString)) deleteRecursively(d))
      finally ls.close()
    }

  // ---- the gen=N + GEN pointer discipline (CountStream, Reservoir) ----

  /** Raw committed GEN pointer content, if any. The first
    * space-separated token is the generation number; stores append
    * their own payload (CountStream rides the batch id). */
  def genPointer(storeDir: String): Option[String] =
    readIfExists(Paths.get(storeDir, "GEN")).map(_.trim)

  /** Committed generation directory (relative), if any. */
  def currentGenDir(storeDir: String): Option[String] =
    genPointer(storeDir).map(p => s"gen=${p.split(" ")(0)}")

  /** One generation advance under invariants 1+2: write gen=N+1 via
    * `writeGen(dir)`, run `afterWrite(dir)` (a failing check here —
    * e.g. a cardinality ceiling — leaves the store at its last good
    * generation), swap the pointer to `pointerFor(N+1)`, then drop the
    * superseded generation. */
  def advanceGen(storeDir: String, writeGen: String => Unit,
      pointerFor: Long => String = _.toString,
      afterWrite: String => Unit = _ => ()): Unit = {
    val old = genPointer(storeDir).map(_.split(" ")(0).toLong)
    val next = old.map(_ + 1).getOrElse(0L)
    val dir = s"$storeDir/gen=$next"
    writeGen(dir)
    afterWrite(dir)
    atomicWrite(Paths.get(storeDir, "GEN"), pointerFor(next))
    old.foreach(g => deleteRecursively(Paths.get(storeDir, s"gen=$g")))
  }

  // ---- hadoop-FS twins (stores that must run on ANY FileSystem —
  // the dedup meta pointers probe gs:// through the hermetic seam) ----

  /** [[readIfExists]] through the Hadoop FileSystem of `dir`. */
  def readFsString(spark: org.apache.spark.sql.SparkSession, dir: String,
      name: String): Option[String] = {
    val hp = new org.apache.hadoop.fs.Path(dir, name)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(hp)) None
    else {
      val in = fs.open(hp)
      try Some(scala.io.Source.fromInputStream(in, "UTF-8").mkString)
      finally in.close()
    }
  }

  /** Existence probe through the Hadoop FileSystem of `dir`. */
  def fsExists(spark: org.apache.spark.sql.SparkSession, dir: String,
      name: String): Boolean = {
    val hp = new org.apache.hadoop.fs.Path(dir, name)
    hp.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(hp)
  }

  // ---- invariant 5: holder lock + commit re-check ----

  /** [[acquireHolderLock]]'s CONTENTION failure — the lock file already
    * exists. A dedicated type so retry loops (e.g. a back-to-back build
    * arriving inside the previous builder's async release window) retry
    * ONLY on contention and let every other failure — unreadable lock,
    * permission error — propagate immediately. */
  final class AlreadyLockedException(msg: String) extends RuntimeException(msg)

  /** Atomically take an exclusive `role` lock, throwing
    * [[AlreadyLockedException]] if one is already held. Returns the
    * token the holder's commits pass to [[requireHolderLock]]. A
    * crashed holder leaves the lock for the operator to delete (the
    * [[ClusterStream]] compaction-lock contract). */
  def acquireHolderLock(lock: Path, role: String, holder: String,
      why: String): String = {
    Files.createDirectories(lock.getParent)
    val token = java.util.UUID.randomUUID().toString
    try {
      Files.write(lock, s"$token $holder".getBytes("UTF-8"),
        java.nio.file.StandardOpenOption.CREATE_NEW)
      token
    } catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        val cur = readIfExists(lock).map(_.trim).getOrElse("<unreadable>")
        throw new AlreadyLockedException(
          s"store at ${lock.getParent} already has a live $role " +
            s"($cur) — $why; stop it first, or if it crashed, delete $lock")
    }
  }

  /** Release IF `token` still holds the lock (idempotent; a
    * force-broken lock belongs to the usurper and is left alone). */
  def releaseHolderLock(lock: Path, token: String): Unit =
    if (readIfExists(lock).exists(_.startsWith(token)))
      Files.deleteIfExists(lock)

  /** The commit re-check: a holder must still own the lock at its
    * point of no return — a force-broken lock fails the usurped
    * holder's commit loudly instead of letting two writers
    * interleave. No token checks nothing (caller-owned
    * serialization). */
  def requireHolderLock(lock: Path, token: Option[String],
      consequence: String): Unit = token.foreach { t =>
    val cur = readIfExists(lock).getOrElse("")
    require(cur.startsWith(t),
      s"this holder no longer holds $lock (current holder: " +
        s"'${cur.trim}') — its lock was broken and another writer took " +
        s"the store; $consequence")
  }
}
