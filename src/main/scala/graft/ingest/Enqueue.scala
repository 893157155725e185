package graft.ingest

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Backfill batching (SURVEY §2.4 A4 + §2.1 K5): list a prefix, pack
  * objects into work-list batches, flush when a batch would exceed the
  * size limit or reaches the count limit — the reference's `enqueue`
  * (`pkg/usecase/enqueue.go:15-73`; defaults 128 objects / 4 MiB,
  * `pkg/usecase/usecase.go:33-34`).
  *
  * Batching is greedy-sequential over the listing (order-dependent by
  * definition), so it runs driver-side over the metadata — exactly like
  * the reference's listing loop. The object listing is metadata (one row
  * per object): even 100 TB of data is only ~10⁶ objects, trivially
  * driver-sized. The *processing* of batches stays fully distributed
  * (each work-list file feeds Pipeline runs).
  */
object Enqueue {

  final case class ObjectRef(bucket: String, name: String, path: String, size: Long)

  val DefaultCountLimit = 128
  val DefaultSizeLimit: Long = 4L * 1024 * 1024

  /** Pack objects into batches: flush when adding the next object would
    * exceed `sizeLimit`, or when the batch hits `countLimit`. A single
    * oversized object still travels (alone), matching the reference's
    * flush-then-add behavior. */
  def plan(objects: Seq[ObjectRef], countLimit: Int = DefaultCountLimit,
      sizeLimit: Long = DefaultSizeLimit): Seq[Seq[ObjectRef]] = {
    val batches = Seq.newBuilder[Seq[ObjectRef]]
    var cur = Vector.empty[ObjectRef]
    var curSize = 0L
    objects.foreach { o =>
      if (cur.nonEmpty && (curSize + o.size > sizeLimit || cur.size >= countLimit)) {
        batches += cur; cur = Vector.empty; curSize = 0L
      }
      cur :+= o; curSize += o.size
    }
    if (cur.nonEmpty) batches += cur
    batches.result()
  }

  /** List a prefix, plan batches, and write one work-list JSON file per
    * batch (the file-based stand-in for the Pub/Sub publish, same as the
    * reference's dumper variant `pkg/infra/pubsub/dumper.go:20-29`).
    * Returns the written batch files. */
  def enqueue(spark: SparkSession, prefixGlob: String, outDir: String,
      countLimit: Int = DefaultCountLimit,
      sizeLimit: Long = DefaultSizeLimit): Seq[String] = {
    val listed = graft.sources.ObjectSource.list(spark, prefixGlob)
      .collect().map(r => ObjectRef(r.getAs[String]("bucket"),
        r.getAs[String]("name"), r.getAs[String]("path"), r.getAs[Long]("size")))
    Files.createDirectories(Paths.get(outDir))
    plan(listed.toSeq, countLimit, sizeLimit).zipWithIndex.map { case (batch, i) =>
      val objs = batch.map(o =>
        s"""{"bucket":${q(o.bucket)},"name":${q(o.name)},"path":${q(o.path)},"size":${o.size}}""")
        .mkString("[", ",", "]")
      val f = Paths.get(outDir, f"batch-$i%05d.json")
      Files.writeString(f, s"""{"objects":$objs}""")
      f.toString
    }
  }

  private def q(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
}
