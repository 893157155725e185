package graft.ingest

import java.util.UUID

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Small-file compaction for partitioned parquet tables.
  *
  * The reference never needs this — BigQuery compacts storage
  * internally — but a file-backed warehouse must do it itself:
  * streaming ingest (SURVEY §2.7 T1/T2) appends one-or-more files per
  * micro-batch per destination, and after days of per-minute triggers a
  * partition holds thousands of KB-sized files whose per-file open +
  * footer reads dominate every scan. Compaction rewrites each
  * over-fragmented leaf partition into ~`targetBytes` files.
  *
  * Scale design:
  *   - leaves are discovered recursively, so multi-level layouts
  *     (`date=…/hour=…`) compact at the true leaf level;
  *   - each leaf partition is an INDEPENDENT scan → coalesce → write
  *     job over EXACTLY the files listed up front (a file appended
  *     concurrently is neither rewritten nor removed — it just stays);
  *     `coalesce` is a narrow dependency, so the rewrite never
  *     repartitions the data;
  *   - partitions already at or under the target file count are
  *     skipped without reading data (listing is metadata-only);
  *   - the swap is write-new → move-old-aside → promote-new →
  *     delete-old, all single-directory renames with checked results;
  *     a failed promote rolls the originals back. A crash mid-swap
  *     leaves a hidden `.compact-*-old` dir whose files the NEXT run
  *     restores before doing anything else, so either the old or the
  *     new complete file set is always recoverable. Concurrent
  *     *readers* of the same leaf may observe a mixed listing during
  *     the swap — callers that need stronger isolation should gate
  *     compaction with the ingest [[graft.state.StateStore]] lock,
  *     exactly as concurrent appends already do.
  */
object Compact {

  final case class Report(partition: String, filesBefore: Int,
      filesAfter: Int, bytes: Long)

  /** Compact every leaf partition (deepest `col=value` directories,
    * recursively) of `dir`; a flat unpartitioned directory compacts as
    * a single leaf. Returns one [[Report]] per REWRITTEN partition
    * (skipped ones are absent). */
  def compactDir(spark: SparkSession, dir: String,
      targetBytes: Long = 256L << 20): Seq[Report] = {
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    leavesOf(fs, root).sortBy(_.toString)
      .flatMap(compactLeaf(spark, fs, _, targetBytes))
  }

  /** Small-file-only compaction — the MAINTENANCE variant for stores
    * that receive a trickle of per-micro-batch appends forever
    * (streaming corpus docs, [[graft.dedup.DigestIndex]] /
    * [[graft.dedup.BandIndex]] bucket layouts): per leaf, merge ONLY
    * files under `smallBytes`, and only once at least `minFiles` of
    * them have accumulated. Files that have graduated past the
    * threshold are never rewritten again, so one maintenance run costs
    * at most `leaves × (minFiles-1) × smallBytes + new-small-mass` of
    * I/O — bounded by the layout's bucket count and the append rate,
    * NOT by corpus size (a full [[compactDir]] pays O(corpus) per run
    * and would dominate every maintenance cycle on a large store).
    * Write amplification per row is `≤ smallBytes / merged-run-size`
    * rewrites before graduating; pick `minFiles` ≈ the file-count level
    * where footer reads start to hurt (default 16).
    *
    * `mergeSchema = true` reads the small set with schema merging —
    * required for corpus docs dirs whose older files carry fewer
    * optional columns (exact-era appends lack the signature column); a
    * single-footer read could silently drop a column from the rewrite.
    *
    * Same swap + crash-recovery discipline as [[compactDir]]; a file
    * appended concurrently is neither rewritten nor removed. */
  def compactSmallFiles(spark: SparkSession, dir: String,
      targetBytes: Long = 256L << 20, smallBytes: Long = 64L << 20,
      minFiles: Int = 16, mergeSchema: Boolean = false): Seq[Report] = {
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    leavesOf(fs, root).sortBy(_.toString).flatMap { leaf =>
      recover(fs, leaf)
      val small = fs.listStatus(leaf).toSeq
        .filter(s => s.isFile && visible(s.getPath) && s.getLen < smallBytes)
      if (small.size < math.max(minFiles, 2)) None
      else rewriteFiles(spark, fs, leaf, small, targetBytes, mergeSchema)
    }
  }

  /** Deepest partition dirs: recurse while `col=value` subdirs exist. */
  private def leavesOf(fs: FileSystem, dir: Path): Seq[Path] = {
    val parts = fs.listStatus(dir).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.contains("="))
      .map(_.getPath)
    if (parts.isEmpty) Seq(dir) else parts.flatMap(leavesOf(fs, _))
  }

  private def visible(p: Path): Boolean = {
    val n = p.getName
    !n.startsWith(".") && !n.startsWith("_")
  }

  private def rename(fs: FileSystem, from: Path, to: Path): Unit =
    if (!fs.rename(from, to))
      sys.error(s"rename failed: $from -> $to")

  /** Crash recovery: files stranded in a `.compact-*-old` dir (a
    * previous run died between move-aside and promote) are restored to
    * the leaf; stale `-new` dirs are dropped (their content was never
    * promoted, the originals supersede it). */
  private def recover(fs: FileSystem, leaf: Path): Unit =
    fs.listStatus(leaf).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(".compact-"))
      .foreach { d =>
        if (d.getPath.getName.endsWith("-old"))
          fs.listStatus(d.getPath).toSeq.filter(_.isFile)
            .foreach(f => rename(fs, f.getPath, new Path(leaf, f.getPath.getName)))
        fs.delete(d.getPath, true)
      }

  private def compactLeaf(spark: SparkSession, fs: FileSystem, leaf: Path,
      targetBytes: Long): Option[Report] = {
    recover(fs, leaf)
    val files = fs.listStatus(leaf).toSeq.filter(s => s.isFile && visible(s.getPath))
    rewriteFiles(spark, fs, leaf, files, targetBytes, mergeSchema = false)
  }

  /** The swap core: rewrite EXACTLY `files` into ~`targetBytes` files
    * under `leaf`, leaving any other file in the leaf untouched. */
  private def rewriteFiles(spark: SparkSession, fs: FileSystem, leaf: Path,
      files: Seq[org.apache.hadoop.fs.FileStatus], targetBytes: Long,
      mergeSchema: Boolean): Option[Report] = {
    val bytes = files.map(_.getLen).sum
    val want = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
    if (files.size <= want) return None

    val runId = UUID.randomUUID().toString.take(8)
    val tmpNew = new Path(leaf, s".compact-$runId-new")
    val tmpOld = new Path(leaf, s".compact-$runId-old")
    // 1. rewrite EXACTLY the files listed by the caller (not a fresh
    //    directory listing — a concurrent append between the two would
    //    be rewritten AND kept, duplicating its rows)
    spark.read.option("mergeSchema", mergeSchema.toString)
      .parquet(files.map(_.getPath.toString): _*).coalesce(want)
      .write.mode("overwrite").parquet(tmpNew.toString)
    val produced = fs.listStatus(tmpNew).toSeq.filter(s => s.isFile && visible(s.getPath))
    // 2. move originals aside (renames — metadata ops)
    fs.mkdirs(tmpOld)
    files.foreach(f => rename(fs, f.getPath, new Path(tmpOld, f.getPath.getName)))
    // 3. promote the new files under unique names; on failure restore
    //    the originals and surface the error
    try produced.zipWithIndex.foreach { case (f, i) =>
      rename(fs, f.getPath, new Path(leaf, f"compact-$runId-$i%05d.parquet"))
    } catch {
      case e: Throwable =>
        fs.listStatus(tmpOld).toSeq.filter(_.isFile)
          .foreach(f => fs.rename(f.getPath, new Path(leaf, f.getPath.getName)))
        fs.delete(tmpOld, true)
        fs.delete(tmpNew, true)
        throw e
    }
    // 4. drop the old set + temp dirs
    fs.delete(tmpOld, true)
    fs.delete(tmpNew, true)
    Some(Report(leaf.getName, files.size, produced.size, bytes))
  }
}
