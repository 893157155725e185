package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.dedup.Dedup

/** Continuously build an exact-deduped corpus from a landing stream —
  * the streaming face of the incremental-dedup family (q52 band table,
  * q62 IVF store, q64 bloom filter): each micro-batch keeps one row per
  * content digest (within-batch exact dedup), drops rows whose content
  * already exists in the STORED corpus (bloom probe + exact verify,
  * [[Dedup.bloomNewDocs]]), and appends the survivors. At-least-once
  * file delivery composed with content-keyed drops gives an
  * exactly-once-BY-CONTENT corpus no matter how micro-batches replay.
  *
  * Crash-safety invariant: the stored bloom filter is always a SUPERSET
  * of the corpus' digests. The merged filter is persisted BEFORE the
  * doc append, so a crash between the two steps leaves only false
  * positives (absorbed by the exact verify), never false negatives —
  * which would silently re-admit existing content on replay. The digest
  * is stored as a COLUMN of the corpus table itself, so the verify's
  * source of truth rides the same atomic append as the data (no sidecar
  * split-brain); the per-batch probe reads only that column
  * (column-pruned parquet scan), and AQE eliminates the scan entirely
  * for batches with no probe hits.
  *
  * Filter capacity (`expectedItems`/`fpp`) is declared per corpus;
  * outgrowing it only raises the false-positive rate — more exact-verify
  * work per batch, never wrong results. The filter ships to executors
  * as a plan literal (`might_contain` requires a foldable filter), so
  * size it for the task-binary budget: the 2^20-item default is ~1.2 MB.
  * A billion-doc corpus doesn't scale one monolithic filter — shard by
  * digest prefix (one filter per shard, probe the matching shard) or
  * rotate per corpus epoch and probe the union; both keep every filter
  * at the megabyte scale while preserving the superset invariant.
  */
object CorpusBuilder {

  /** Reserved digest column appended to the corpus table. */
  val DigestCol = "__corpus_digest"

  /** Start the streaming build: NDJSON docs under `landingGlob` →
    * exact-deduped corpus under `corpusDir` (docs parquet + bloom
    * file), checkpointed. `Trigger.AvailableNow` drains and stops
    * (backfill); a processing-time trigger runs continuously. The doc
    * schema is inferred once from the files present at start (the
    * streaming source needs a fixed schema — same contract as every
    * schemaful file stream). */
  def build(spark: SparkSession, landingGlob: String, checkpointDir: String,
      corpusDir: String, idCol: String = "doc_id", textCol: String = "text",
      trigger: Trigger = Trigger.AvailableNow(),
      maxFilesPerTrigger: Option[Int] = None,
      expectedItems: Long = 1L << 20, fpp: Double = 0.01): StreamingQuery = {
    val schema = spark.read.json(landingGlob).schema
    var reader = spark.readStream.schema(schema)
    maxFilesPerTrigger.foreach(n => reader = reader.option("maxFilesPerTrigger", n))
    reader.json(landingGlob)
      .writeStream
      .queryName("graft-corpus-builder")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        appendNew(spark, batch, corpusDir, idCol, textCol, expectedItems, fpp)
        ()
      }
      .start()
  }

  /** One batch of the build (also usable directly for batch-incremental
    * corpus maintenance). Returns the number of docs appended. */
  def appendNew(spark: SparkSession, batch: DataFrame, corpusDir: String,
      idCol: String, textCol: String,
      expectedItems: Long, fpp: Double): Long = {
    val docsDir = s"$corpusDir/docs"
    val bloomPath = Paths.get(corpusDir, "bloom.bin")
    Files.createDirectories(Paths.get(corpusDir))
    val inBatch = Dedup.exact(batch, textCol, idCol)
    val stored: Option[Array[Byte]] =
      if (Files.exists(bloomPath)) Some(Files.readAllBytes(bloomPath)) else None
    val fresh = stored match {
      case Some(f) =>
        val digests = spark.read.parquet(docsDir)
          .select(col(DigestCol).as("digest"))
        Dedup.bloomNewDocs(inBatch, digests, textCol, f)
      case None => inBatch // no corpus yet — everything is new
    }
    // survivors are consumed three times (filter build, docs append,
    // count) — materialize once; output-sized
    val staged = graft.util.Materialize.eager(
      fresh.withColumn(DigestCol, Dedup.contentKey(col(textCol))))
    val appended = staged.count()
    if (appended > 0) {
      // 1. bloom FIRST (superset invariant — see class doc)
      val batchFilter = Dedup.digestFilter(staged, textCol,
        expectedItems, Dedup.bloomBits(expectedItems, fpp))
      val merged = stored.fold(batchFilter)(mergeFilters(_, batchFilter))
      val tmp = bloomPath.resolveSibling("bloom.bin.tmp")
      Files.write(tmp, merged)
      Files.move(tmp, bloomPath, StandardCopyOption.ATOMIC_MOVE,
        StandardCopyOption.REPLACE_EXISTING)
      // 2. then the docs (atomic per batch via the commit protocol)
      staged.write.mode("append").parquet(docsDir)
    }
    appended
  }

  /** Union of two serialized filters (both sides were sized with the
    * same expectedItems/fpp, so the bitsets are compatible). */
  private def mergeFilters(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    import org.apache.spark.util.sketch.BloomFilter
    val fa = BloomFilter.readFrom(new java.io.ByteArrayInputStream(a))
    val fb = BloomFilter.readFrom(new java.io.ByteArrayInputStream(b))
    fa.mergeInPlace(fb)
    val out = new java.io.ByteArrayOutputStream()
    fa.writeTo(out)
    out.toByteArray
  }
}
