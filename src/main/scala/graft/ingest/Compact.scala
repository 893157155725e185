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
  *   - each leaf partition is an INDEPENDENT scan → coalesce → write
  *     job (no global shuffle; `coalesce` is a narrow dependency, so
  *     the rewrite never repartitions the data);
  *   - partitions already at or under the target file count are
  *     skipped without reading data (listing is metadata-only);
  *   - the swap is write-new → move-old-aside → promote-new →
  *     delete-old, all single-directory renames, so a crash leaves
  *     either the old or the new complete file set in place (plus at
  *     worst a hidden temp dir a re-run cleans up). Concurrent
  *     *readers* of the same leaf may observe a mixed listing during
  *     the swap — callers that need stronger isolation should gate
  *     compaction with the ingest [[graft.state.StateStore]] lock,
  *     exactly as concurrent appends already do.
  */
object Compact {

  final case class Report(partition: String, filesBefore: Int,
      filesAfter: Int, bytes: Long)

  /** Compact every leaf partition (`col=value` subdirectory) of `dir`;
    * a flat unpartitioned directory compacts as a single leaf. Returns
    * one [[Report]] per REWRITTEN partition (skipped ones are absent). */
  def compactDir(spark: SparkSession, dir: String,
      targetBytes: Long = 256L << 20): Seq[Report] = {
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val subdirs = fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.contains("="))
      .map(_.getPath)
    val leaves = if (subdirs.isEmpty) Seq(root) else subdirs
    leaves.sortBy(_.toString)
      .flatMap(compactLeaf(spark, fs, _, targetBytes))
  }

  private def visible(p: Path): Boolean = {
    val n = p.getName
    !n.startsWith(".") && !n.startsWith("_")
  }

  private def compactLeaf(spark: SparkSession, fs: FileSystem, leaf: Path,
      targetBytes: Long): Option[Report] = {
    val files = fs.listStatus(leaf).toSeq.filter(s => s.isFile && visible(s.getPath))
    val bytes = files.map(_.getLen).sum
    val want = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
    if (files.size <= want) return None

    val runId = UUID.randomUUID().toString.take(8)
    val tmpNew = new Path(leaf, s".compact-$runId-new")
    val tmpOld = new Path(leaf, s".compact-$runId-old")
    // 1. rewrite: one narrow job over just this leaf's files
    spark.read.parquet(leaf.toString).coalesce(want)
      .write.mode("overwrite").parquet(tmpNew.toString)
    val produced = fs.listStatus(tmpNew).toSeq.filter(s => s.isFile && visible(s.getPath))
    // 2. move originals aside (renames — metadata ops)
    fs.mkdirs(tmpOld)
    files.foreach(f => fs.rename(f.getPath, new Path(tmpOld, f.getPath.getName)))
    // 3. promote the new files under unique names
    produced.zipWithIndex.foreach { case (f, i) =>
      fs.rename(f.getPath, new Path(leaf, f"compact-$runId-$i%05d.parquet"))
    }
    // 4. drop the old set + temp dirs
    fs.delete(tmpOld, true)
    fs.delete(tmpNew, true)
    Some(Report(leaf.getName, files.size, produced.size, bytes))
  }
}
