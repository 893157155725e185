package graft.ingest

import java.io.File

import org.apache.spark.sql.functions._
import graft.SparkSpec

class CompactSpec extends SparkSpec {
  import spark.implicits._

  private def parquetFiles(dir: String): Seq[String] =
    Option(new File(dir).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && !f.getName.startsWith(".") && !f.getName.startsWith("_"))
      .map(_.getName).toSeq

  private def fragmented(dir: String, filesPerPart: Int): Unit =
    spark.range(2000).select($"id",
        ($"id" % 2).cast("string").as("p"), md5($"id".cast("string")).as("payload"))
      .repartition(filesPerPart)
      .write.partitionBy("p").mode("overwrite").parquet(dir)

  test("compactDir: fragmented partitions rewritten, content identical, idempotent") {
    val dir = tmpDir("compact") + "/t"
    fragmented(dir, 8)
    val before = spark.read.parquet(dir).orderBy("id").collect().toSeq
    assert(parquetFiles(s"$dir/p=0").size == 8)

    val reports = Compact.compactDir(spark, dir, targetBytes = 1L << 30)
    assert(reports.map(_.partition).sorted == Seq("p=0", "p=1"))
    assert(reports.forall(r => r.filesBefore == 8 && r.filesAfter == 1))
    assert(parquetFiles(s"$dir/p=0").size == 1)
    assert(spark.read.parquet(dir).orderBy("id").collect().toSeq == before)

    // already compact -> no-op, nothing rewritten
    assert(Compact.compactDir(spark, dir, targetBytes = 1L << 30).isEmpty)
  }

  test("compactDir: byte target bounds output file count; small target skips") {
    val dir = tmpDir("compact-target") + "/t"
    spark.range(2000).select($"id", md5($"id".cast("string")).as("payload"))
      .repartition(8).write.mode("overwrite").parquet(dir)
    val bytes = Option(new File(dir).listFiles()).get
      .filter(f => f.isFile && !f.getName.startsWith(".") && !f.getName.startsWith("_"))
      .map(_.length).sum
    // target = just over half the leaf -> want exactly 2 output files
    val reports = Compact.compactDir(spark, dir, targetBytes = bytes / 2 + 1)
    // coalesce caps at the scan's partition count, which may pack the
    // tiny files below `want` — the bound is ≤ 2, and strictly fewer
    assert(reports.size == 1 &&
      reports.forall(r => r.filesAfter <= 2 && r.filesAfter < r.filesBefore))
    // a target small enough that the current files are already
    // "right-sized" -> skip
    assert(Compact.compactDir(spark, dir, targetBytes = 1).isEmpty)
  }

  test("compactDir: multi-level partitions compact at the true leaves") {
    val dir = tmpDir("compact-deep") + "/t"
    spark.range(2000).select($"id",
        ($"id" % 2).cast("string").as("d"), ($"id" % 3).cast("string").as("h"),
        md5($"id".cast("string")).as("payload"))
      .repartition(6)
      .write.partitionBy("d", "h").mode("overwrite").parquet(dir)
    val before = spark.read.parquet(dir).orderBy("id").collect().toSeq
    val reports = Compact.compactDir(spark, dir, targetBytes = 1L << 30)
    // 2 × 3 hour-level leaves, each rewritten to one file
    assert(reports.size == 6 && reports.forall(r => r.filesAfter == 1 && r.filesBefore > 1))
    assert(reports.forall(_.partition.startsWith("h=")))
    assert(spark.read.parquet(dir).orderBy("id").collect().toSeq == before)
  }

  test("compactDir: a crash-stranded .compact-*-old dir is restored before compacting") {
    val dir = tmpDir("compact-crash") + "/t"
    spark.range(100).repartition(4).write.mode("overwrite").parquet(dir)
    val before = spark.read.parquet(dir).orderBy("id").collect().toSeq
    // simulate a crash between move-aside and promote: one data file
    // stranded in the hidden old-dir, a half-written new-dir left behind
    val leaf = new File(dir)
    val victim = leaf.listFiles().filter(f => f.isFile && f.getName.endsWith(".parquet")).head
    val old = new File(leaf, ".compact-dead-old"); old.mkdirs()
    assert(victim.renameTo(new File(old, victim.getName)))
    new File(leaf, ".compact-dead-new").mkdirs()

    val reports = Compact.compactDir(spark, dir, targetBytes = 1L << 30)
    // recovery restored the stranded file, then compaction saw all 4
    assert(reports.size == 1 && reports.head.filesBefore == 4)
    assert(spark.read.parquet(dir).orderBy("id").collect().toSeq == before)
    // no stranded temp DIRS (local-FS .crc sibling files of promoted
    // parquet are fine — Hadoop checksum bookkeeping, not our state)
    assert(!leaf.listFiles().exists(f => f.isDirectory && f.getName.startsWith(".compact-")))
  }

  test("compactDir: unpartitioned directory compacts as one leaf") {
    val dir = tmpDir("compact-flat") + "/t"
    spark.range(100).repartition(5).write.mode("overwrite").parquet(dir)
    val before = spark.read.parquet(dir).orderBy("id").collect().toSeq
    val reports = Compact.compactDir(spark, dir, targetBytes = 1L << 30)
    assert(reports.size == 1 && reports.head.filesBefore == 5 && reports.head.filesAfter == 1)
    assert(spark.read.parquet(dir).orderBy("id").collect().toSeq == before)
  }
}
