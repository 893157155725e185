package graft.schema.bigquery

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.UUID

import scala.collection.concurrent.TrieMap
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{DataType, StructType}

/** In-process emulator of the PUBLIC BigQuery API surfaces the
  * reference engine drives — the sandbox stand-in that lets the
  * connector-shaped [[BigQueryWriteBackend]] run the full
  * TableBackendSpec contract suite with no network:
  *
  *   - `tables.get / insert / update` with ETag optimistic concurrency
  *     (ref: `pkg/infra/bq/client.go:198-204` — `UpdateTable(...,
  *     md.ETag)` and the retry-on-conflict loop above it);
  *   - the Storage Write API's PENDING-stream batch protocol:
  *     `CreateWriteStream` → `AppendRows` → `FinalizeWriteStream` →
  *     `BatchCommitWriteStreams` (ref: `pkg/infra/bq/stream.go:30-116`)
  *     — appended rows are INVISIBLE until the batch commit, which is
  *     atomic across the committed streams.
  *
  * The emulator persists each stream's rows as parquet under its own
  * directory and publishes commits by atomically rewriting a
  * `commits.json` membership file — so visibility semantics (pending
  * invisible, commit atomic, half-written never readable) match the
  * real service's, observable through the same verbs the real client
  * exposes. Method names deliberately mirror
  * `google-cloud-bigquerystorage`; a live deployment swaps this class
  * for a thin adapter over the real client and changes NOTHING above
  * it (the [[BigQueryWriteBackend]] calls only these eight methods).
  *
  * Single-JVM emulator: per-table monitors serialize metadata updates
  * (the service serializes them server-side); stream dirs are
  * uuid-unique so concurrent appends never collide.
  */
final class BigQueryEmulator(rootDir: String) {

  final case class TableMeta(etag: Int, schema: StructType)

  final class AlreadyExistsException(m: String) extends RuntimeException(m)
  final class EtagMismatchException(m: String) extends RuntimeException(m)

  private val locks = TrieMap.empty[String, Object]
  private def lockFor(ds: String, t: String): Object =
    locks.getOrElseUpdate(s"$ds.$t", new Object)

  private def tableDir(ds: String, t: String): Path = Paths.get(rootDir, ds, t)
  private def metaFile(ds: String, t: String): Path = tableDir(ds, t).resolve("meta.json")
  private def commitsFile(ds: String, t: String): Path = tableDir(ds, t).resolve("commits.json")
  private def streamDir(ds: String, t: String, s: String): Path =
    tableDir(ds, t).resolve("streams").resolve(s)

  private def atomicWrite(target: Path, content: String): Unit = {
    Files.createDirectories(target.getParent)
    val tmp = target.resolveSibling(target.getFileName.toString + ".tmp")
    Files.write(tmp, content.getBytes("UTF-8"))
    Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  // ---- tables.* (DDL plane) ----

  /** `tables.get`: metadata (ETag + schema) or None when absent. */
  def getTable(ds: String, t: String): Option[TableMeta] = {
    val f = metaFile(ds, t)
    if (!Files.exists(f)) None
    else {
      val txt = new String(Files.readAllBytes(f), "UTF-8")
      val eIdx = txt.indexOf("\"etag\":")
      val etag = txt.substring(eIdx + 7, txt.indexOf(',', eIdx)).trim.toInt
      val sIdx = txt.indexOf("\"schema\":")
      Some(TableMeta(etag,
        DataType.fromJson(txt.substring(sIdx + 9, txt.lastIndexOf('}')))
          .asInstanceOf[StructType]))
    }
  }

  /** `tables.insert`: create with schema; AlreadyExists when present —
    * the caller loses the create race and re-reads (the reference's
    * create-then-update fallback). */
  def createTable(ds: String, t: String, schema: StructType): Unit =
    lockFor(ds, t).synchronized {
      if (getTable(ds, t).isDefined)
        throw new AlreadyExistsException(s"$ds.$t already exists")
      atomicWrite(metaFile(ds, t), s"""{"etag":1,"schema":${schema.json}}""")
    }

  /** `tables.update` with `If-Match: etag`: the ETag compare-and-set of
    * `bq/client.go:198-204`. A stale etag throws; the caller re-reads,
    * re-merges, retries. */
  def updateTable(ds: String, t: String, schema: StructType, etag: Int): Unit =
    lockFor(ds, t).synchronized {
      val cur = getTable(ds, t).getOrElse(
        throw new IllegalStateException(s"$ds.$t does not exist"))
      if (cur.etag != etag)
        throw new EtagMismatchException(
          s"$ds.$t etag $etag is stale (current ${cur.etag})")
      atomicWrite(metaFile(ds, t), s"""{"etag":${etag + 1},"schema":${schema.json}}""")
    }

  // ---- Storage Write API (data plane, PENDING streams) ----

  /** `CreateWriteStream(type=PENDING)`: rows appended to the stream are
    * buffered invisibly until [[batchCommitWriteStreams]]. */
  def createWriteStream(ds: String, t: String): String = {
    val name = s"stream-${UUID.randomUUID()}"
    Files.createDirectories(streamDir(ds, t, name))
    name
  }

  /** `AppendRows`: stage a row block on the stream (parquet stands in
    * for the proto rows on the wire). May be called repeatedly. */
  def appendRows(ds: String, t: String, stream: String, rows: DataFrame): Unit = {
    require(!Files.exists(streamDir(ds, t, stream).resolve("_finalized")),
      s"$stream is finalized — no further appends (Storage Write API contract)")
    rows.write.mode("append").parquet(streamDir(ds, t, stream).resolve("rows").toString)
  }

  /** `FinalizeWriteStream`: seal the stream; required before commit. */
  def finalizeWriteStream(ds: String, t: String, stream: String): Unit =
    Files.write(streamDir(ds, t, stream).resolve("_finalized"), Array.emptyByteArray)

  /** `BatchCommitWriteStreams`: atomically publish the finalized
    * streams — after this returns, readers see ALL their rows; before
    * it, none (the manifest rewrite is the single commit point). */
  def batchCommitWriteStreams(ds: String, t: String, streams: Seq[String]): Unit =
    lockFor(ds, t).synchronized {
      streams.foreach { s =>
        require(Files.exists(streamDir(ds, t, s).resolve("_finalized")),
          s"$s must be finalized before commit")
      }
      val merged = committedStreams(ds, t) ++ streams
      atomicWrite(commitsFile(ds, t),
        merged.map(s => s""""$s"""").mkString("""{"streams":[""", ",", "]}"))
    }

  private def committedStreams(ds: String, t: String): Seq[String] = {
    val f = commitsFile(ds, t)
    if (!Files.exists(f)) Nil
    else """"(stream-[^"]+)"""".r
      .findAllMatchIn(new String(Files.readAllBytes(f), "UTF-8"))
      .map(_.group(1)).toSeq
  }

  /** `ReadRows` (Storage Read API shape): every committed stream's rows
    * under `schema` — uncommitted streams invisible, evolution
    * null-fills (exactly BigQuery's post-ALTER read semantics). */
  def readRows(spark: SparkSession, ds: String, t: String,
      schema: StructType): DataFrame = {
    val dirs = committedStreams(ds, t)
      .map(s => streamDir(ds, t, s).resolve("rows").toString)
      .filter(d => Files.exists(Paths.get(d))) // committed-but-empty stream
    if (dirs.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else spark.read.schema(schema).parquet(dirs: _*)
  }

  /** Datasets/tables present (for catalog listings). */
  def listTables(): Seq[(String, String)] = {
    val root = Paths.get(rootDir)
    if (!Files.exists(root)) Nil
    else {
      val ds = Files.list(root)
      try ds.iterator.asScala.filter(Files.isDirectory(_)).flatMap { d =>
        val ts = Files.list(d)
        try ts.iterator.asScala.filter(p => Files.exists(p.resolve("meta.json")))
          .map(p => d.getFileName.toString -> p.getFileName.toString).toList
        finally ts.close()
      }.toList
      finally ds.close()
    }
  }
}
