package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Object listing → object-metadata DataFrame, the input of event-rule
  * evaluation (SURVEY §2.1 S2/S3; reference builds `Object` from GCS
  * attrs, `pkg/domain/model/usecase.go:50-66`, lists prefixes in
  * `pkg/usecase/enqueue.go:30-60`).
  *
  * Columns: `bucket` (URI scheme+authority or ""), `name` (path), `path`
  * (full URI used to read), `size`, `created_at`, `md5` (hex digest from
  * the filesystem's checksum metadata where the store exposes one — GCS
  * does; local FS does not → null, and null predicates simply don't
  * match). Event rules are Spark SQL predicates over these — the cheap
  * metadata gate runs BEFORE any content I/O, same ordering as the
  * reference (rules on attrs, then download — SURVEY §4 row 1).
  *
  * Scale note: a listing is metadata (one row per object, not per
  * record); globStatus on a prefix is the batch path, the streaming file
  * source (Pipeline.stream) is the continuous path.
  */
object ObjectSource {

  /** List objects matching a glob pattern (e.g. `landing/&#42;.log.gz`). */
  def list(spark: SparkSession, pattern: String): DataFrame = {
    val p = new HPath(pattern)
    val fs = FileSystem.get(p.toUri, spark.sparkContext.hadoopConfiguration)
    val statuses = Option(fs.globStatus(p)).getOrElse(Array.empty)
      .flatMap { s =>
        if (s.isDirectory) fs.listStatus(s.getPath).filter(_.isFile) else Array(s)
      }
    val rows = statuses.toSeq.map { s =>
      val uri = s.getPath.toUri
      // Checksum comes from object-store metadata (free on GCS/S3-style
      // stores); local/HDFS return null or a non-md5 CRC → null column.
      val md5 = Option(try fs.getFileChecksum(s.getPath) catch { case _: Exception => null })
        .filter(_.getAlgorithmName.toLowerCase.contains("md5"))
        .map(c => c.getBytes.map("%02x".format(_)).mkString)
        .orNull
      (Option(uri.getScheme).map(sch => sch + "://" + Option(uri.getAuthority).getOrElse("")).getOrElse(""),
        uri.getPath, s.getPath.toString, s.getLen,
        new java.sql.Timestamp(s.getModificationTime), md5)
    }
    import spark.implicits._
    rows.toDF("bucket", "name", "path", "size", "created_at", "md5")
  }
}
