package graft.schema

import java.nio.file.{FileAlreadyExistsException, Files, Path, Paths}
import java.util.UUID

import scala.annotation.tailrec
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{DataType, StringType, StructType}

/** Transaction-log table catalog — the SECOND [[TableBackend]], proving
  * the storage seam two-sided: same contract as the parquet-dir
  * [[SchemaRegistry]], entirely different commit machinery, mirroring
  * the reference's optimistic BigQuery DDL (ETag compare-and-set,
  * `pkg/infra/bq/client.go:198-204`) and the log-structured commit
  * protocol of production table formats.
  *
  * Layout under `root/<dataset>/<table>/`:
  * {{{
  *   _log/schema-v00001.json   // immutable schema versions (CAS-created)
  *   _log/commit-<uuid>.json   // one manifest per committed batch
  *   data/batch-<uuid>/part-*.parquet   // __part kept as a DATA column
  * }}}
  *
  * DDL is LOCK-FREE optimistic concurrency: a writer reads the max
  * schema version N, merges, and tries to create `schema-v{N+1}` with an
  * atomic create-if-absent; losing the race re-reads and retries against
  * the winner's schema — exactly the reference's `UpdateTable(..., eTag)`
  * loop, with the version filename playing the ETag. Works across JVMs
  * on any shared filesystem (the object-store analogue is an
  * `If-None-Match: *` conditional PUT).
  *
  * Appends are STAGE-THEN-COMMIT: each batch writes its parquet under a
  * fresh `data/batch-<uuid>/` directory (partitioned by `__part`), then
  * publishes it by atomically creating one manifest file. Readers list
  * manifests and read ONLY published batch dirs, so a half-written batch
  * is invisible — stronger per-batch atomicity than the Hadoop
  * committer's visible-directory append, and concurrent same-table
  * appends from DIFFERENT JVMs are safe with no lock at all (unique
  * dirs, unique manifests — the [[SchemaRegistry]] needs a per-JVM lock
  * here). A crash between stage and publish strands an orphan batch dir:
  * invisible to every reader, reclaimable by a vacuum that deletes
  * `data/batch-*` dirs older than a horizon with no manifest.
  *
  * Scale notes: manifest listing is a driver-side metadata op, O(number
  * of commits) names — the production analogue checkpoints the manifest
  * list periodically (as log-structured table formats do) so the tail
  * stays short. Unlike the directory-partitioned registry, `__part`
  * stays a DATA column of the batch files (what manifest-based table
  * formats do: partition values live in metadata/file stats, not
  * directory names — Spark cannot partition-discover uniformly across
  * many batch roots). Pruning is NOT lost: the engine hands over
  * batches pre-clustered by `__part`, so files are partition-
  * homogeneous and parquet min/max stats on `__part` prune pushed-down
  * filters at the row-group level — the zone-map equivalent of
  * directory pruning.
  */
final class TxLogBackend(rootDir: String) extends TableBackend {

  private def tableDir(dataset: String, table: String): Path =
    Paths.get(rootDir, dataset, table)
  private def logDir(dataset: String, table: String): Path =
    tableDir(dataset, table).resolve("_log")
  private def dataDir(dataset: String, table: String): Path =
    tableDir(dataset, table).resolve("data")

  private val SchemaV = """schema-v(\d{5})\.json""".r

  private def schemaVersions(ds: String, t: String): Seq[(Int, Path)] = {
    val log = logDir(ds, t)
    if (!Files.exists(log)) Nil
    else Files.list(log).iterator.asScala.flatMap { p =>
      p.getFileName.toString match {
        case SchemaV(v) => Some(v.toInt -> p)
        case _ => None
      }
    }.toSeq.sortBy(_._1)
  }

  override def exists(dataset: String, table: String): Boolean =
    schemaVersions(dataset, table).nonEmpty

  override def currentSchema(dataset: String, table: String): Option[(Int, StructType)] =
    schemaVersions(dataset, table).lastOption.map { case (v, p) =>
      v -> DataType.fromJson(new String(Files.readAllBytes(p), "UTF-8"))
        .asInstanceOf[StructType]
    }

  /** Atomic create-if-absent with full content: stage to a tmp file,
    * hard-link it into place (atomic, fails if the target exists — the
    * CAS), drop the tmp. A reader can never observe a truncated file. */
  private def casCreate(target: Path, content: Array[Byte]): Boolean = {
    Files.createDirectories(target.getParent)
    val tmp = target.resolveSibling(s".${target.getFileName}.${UUID.randomUUID()}.tmp")
    Files.write(tmp, content)
    try { Files.createLink(target, tmp); true }
    catch { case _: FileAlreadyExistsException => false }
    finally Files.deleteIfExists(tmp)
  }

  @tailrec
  override def createOrUpdate(dataset: String, table: String,
      incoming: StructType): StructType =
    currentSchema(dataset, table) match {
      case None =>
        if (casCreate(logDir(dataset, table).resolve(f"schema-v${1}%05d.json"),
            incoming.json.getBytes("UTF-8"))) incoming
        else createOrUpdate(dataset, table, incoming) // lost the create race
      case Some((version, live)) =>
        val merged = SchemaMerge.merge(live, incoming)
        if (SchemaMerge.normalize(merged) == SchemaMerge.normalize(live)) live
        else if (casCreate(
            logDir(dataset, table).resolve(f"schema-v${version + 1}%05d.json"),
            merged.json.getBytes("UTF-8"))) merged
        else createOrUpdate(dataset, table, incoming) // lost the CAS — re-merge
    }

  override def appendPartitioned(dataset: String, table: String, df: DataFrame): Unit = {
    val batchId = UUID.randomUUID().toString
    val dir = dataDir(dataset, table).resolve(s"batch-$batchId")
    // __part stays a data column (class doc) — pre-clustered input makes
    // the files partition-homogeneous, so its parquet stats prune reads
    df.write.mode("overwrite").parquet(dir.toString)
    // publish: the manifest names the batch dir; its atomic creation IS
    // the commit point (unique name — it cannot collide or half-exist)
    val ok = casCreate(logDir(dataset, table).resolve(s"commit-$batchId.json"),
      s"""{"dir":"batch-$batchId"}""".getBytes("UTF-8"))
    assert(ok, s"commit manifest collision for batch $batchId")
  }

  private def committedDirs(ds: String, t: String): Seq[String] = {
    val log = logDir(ds, t)
    if (!Files.exists(log)) Nil
    else Files.list(log).iterator.asScala
      .map(_.getFileName.toString)
      .filter(n => n.startsWith("commit-") && n.endsWith(".json"))
      .map(n => dataDir(ds, t)
        .resolve("batch-" + n.stripPrefix("commit-").stripSuffix(".json"))
        .toString)
      .toSeq.sorted
  }

  override def readWithPart(spark: SparkSession, dataset: String,
      table: String): DataFrame = {
    val (_, schema) = currentSchema(dataset, table)
      .getOrElse(sys.error(s"no such table $dataset.$table"))
    val withPart = schema.add("__part", StringType)
    val dirs = committedDirs(dataset, table)
    if (dirs.isEmpty) // created-but-never-appended: empty, not an error
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        withPart)
    else spark.read.schema(withPart).parquet(dirs: _*)
  }
}
