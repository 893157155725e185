package graft.sources

import java.io.{InputStream, SequenceInputStream}
import java.util.zip.GZIPInputStream

import com.fasterxml.jackson.core.{JsonFactory, JsonToken}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Reader for objects that are one-or-more *concatenated* JSON documents
  * rather than NDJSON — the reference's `json.Decoder.More()` loop
  * handles both transparently (`pkg/usecase/load.go:251-279`; the
  * CloudTrail fixture is a single doc, `examples/readme/data/test.log`
  * is NDJSON).
  *
  * Spark's `multiLine` JSON mode reads only ONE document per file, so
  * concatenated docs need a splitter. We tokenize with Jackson (bundled
  * with Spark) per file inside `flatMap` over (path, bytes) pairs — a
  * genuine per-partition imperative case. These objects are
  * notification-sized (events / batched exports), not bulk data, so the
  * whole-file read is the same I/O shape the reference has; bulk NDJSON
  * goes through the line-splittable `spark.read.json` path instead.
  */
object ConcatJsonReader {

  /** Split the files at `paths` into one JSON document string per row. */
  def docs(spark: SparkSession, paths: Seq[String]): Dataset[String] = {
    import spark.implicits._
    docsWithPath(spark, paths).select("value").as[String]
  }

  /** Like [[docs]] but keeps the source path with each document —
    * columns `(value, __graft_src)` — so the ingest pipeline can
    * attribute per-source record counts without a second read. */
  def docsWithPath(spark: SparkSession, paths: Seq[String]): DataFrame = {
    import spark.implicits._
    if (paths.isEmpty)
      return spark.emptyDataset[(String, String)].toDF("value", "__graft_src")
    spark.read.format("binaryFile").load(paths: _*)
      .select("path", "content")
      .as[(String, Array[Byte])]
      .flatMap { case (path, bytes) => splitDocs(open(path, bytes)).map((_, path)) }
      .toDF("value", "__graft_src")
  }

  /** Parse concatenated-JSON objects into records with inferred schema.
    * A top-level ARRAY document contributes one record per element
    * (matching `spark.read.json` array semantics). */
  def read(spark: SparkSession, paths: Seq[String]): DataFrame =
    spark.read.option("dropFieldIfAllNull", "true")
      .json(docs(spark, paths).map(identity)(org.apache.spark.sql.Encoders.STRING))

  private def open(path: String, bytes: Array[Byte]): InputStream = {
    val raw: InputStream = new java.io.ByteArrayInputStream(bytes)
    if (path.endsWith(".gz")) new GZIPInputStream(raw) else raw
  }

  /** Re-serialize each top-level document (object or array element) as
    * its own compact JSON string. */
  private[sources] def splitDocs(in: InputStream): Seq[String] = {
    val factory = new JsonFactory()
    val parser = factory.createParser(in)
    val out = Seq.newBuilder[String]
    try {
      var tok = parser.nextToken()
      while (tok != null) {
        val sw = new java.io.StringWriter()
        val gen = factory.createGenerator(sw)
        gen.copyCurrentStructure(parser)
        gen.close()
        out += sw.toString
        tok = parser.nextToken()
      }
    } finally parser.close()
    out.result()
  }
}
