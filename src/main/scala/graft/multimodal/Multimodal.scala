package graft.multimodal

import java.security.MessageDigest

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column handling for training-data pipelines: image/audio/
  * video travel as opaque `binary` columns with typed metadata, and
  * decode / feature-extract / resize / frame-sample run as partition-
  * local batch functions over the binary payloads.
  *
  * The Spark-side plumbing — schemas, size-aware partitioning, the
  * batched `mapPartitions` shape (mirroring Arrow-batch UDF execution),
  * frame explosion — is real and tested. The actual codec calls are
  * STUBBED: this container has no image/audio libraries, so
  * [[FakeCodec]] stands in with a deterministic md5-derived
  * implementation (byte-exact reproducible, which also lets the decode
  * path be oracle-checked end-to-end). Swapping in a real codec touches
  * only [[FakeCodec]].
  *
  * Scale notes:
  *   - Binary payloads never shuffle for decode: `decodeImages` is a
  *     pure mapPartitions (narrow). Only the small decoded metadata +
  *     feature vectors flow onward.
  *   - Media blobs are heavily size-skewed; [[repartitionBySize]] uses
  *     range-partitioning on cumulative byte size so a partition holds
  *     ~equal bytes, not ~equal row counts (the classic fix for one
  *     task decoding all the 4K videos while 31 decode thumbnails).
  *   - Frame sampling explodes rows but each output frame carries a
  *     digest/slice, not a re-encoded payload — the explosion is
  *     metadata-sized.
  */
object Multimodal {

  /** One media object: payload + typed metadata. */
  final case class Media(media_id: Long, media_type: String, fmt: String,
      content: Array[Byte])

  final case class DecodedImage(media_id: Long, width: Int, height: Int,
      channels: Int, features: Array[Double])

  final case class Frame(media_id: Long, frame_idx: Int, frame_md5: String)

  final case class DecodedAudio(media_id: Long, sample_rate: Int,
      duration_ms: Long, channels: Int, mfcc: Array[Double])

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false),
    StructField("fmt", StringType, nullable = false),
    StructField("content", BinaryType, nullable = true)))

  /** The codec boundary. A real deployment implements this with e.g.
    * javacpp/ffmpeg or sends batches to a Python `mapInArrow` worker;
    * here it is a deterministic fake (md5-derived) so pipelines are
    * testable and oracle-checkable without native libs. */
  object FakeCodec {
    private def md5hex(b: Array[Byte]): String =
      MessageDigest.getInstance("MD5").digest(b)
        .map("%02x".format(_)).mkString

    private def hexLong(h: String, n: Int): Long =
      java.lang.Long.parseLong(h.take(n), 16)

    /** STUB decode: dimensions/channels/features derived from the md5
      * of the payload — a real decoder returns the codec's values. */
    def decodeImage(id: Long, bytes: Array[Byte]): DecodedImage = {
      val h = md5hex(bytes)
      val width = 1 + (hexLong(h, 8) % 1024L).toInt
      val height = 1 + (hexLong(h.substring(8, 16), 8) % 1024L).toInt
      val channels = 1 + (hexLong(h.substring(16, 20), 4) % 4L).toInt
      val features = (0 until 8).map { j =>
        val hj = md5hex((h + "/" + j).getBytes("UTF-8"))
        (hexLong(hj, 8) % 1000L).toDouble / 1000.0
      }.toArray
      DecodedImage(id, width, height, channels, features)
    }

    /** STUB audio decode: rate/duration/channels/MFCC-shaped features
      * from the payload digest — a real decoder reads the container
      * header and runs the filterbank. 13 coefficients, the classic
      * MFCC count. */
    def decodeAudio(id: Long, bytes: Array[Byte]): DecodedAudio = {
      val h = md5hex(bytes)
      val rates = Array(8000, 16000, 22050, 44100, 48000)
      val rate = rates((hexLong(h, 8) % 5L).toInt)
      val durationMs = 1L + hexLong(h.substring(8, 16), 8) % 600000L
      val channels = 1 + (hexLong(h.substring(16, 20), 4) % 2L).toInt
      val mfcc = (0 until 13).map { j =>
        val hj = md5hex((h + "@" + j).getBytes("UTF-8"))
        (hexLong(hj, 8) % 2000L - 1000L).toDouble / 100.0
      }.toArray
      DecodedAudio(id, rate, durationMs, channels, mfcc)
    }

    /** STUB frame count: a real demuxer reads container metadata. */
    def frameCount(bytes: Array[Byte]): Int =
      math.max(1, math.min(10, bytes.length / 1000))

    /** STUB frame extraction: digest of payload + index stands in for
      * the decoded frame image. */
    def frame(id: Long, bytes: Array[Byte], idx: Int): Frame =
      Frame(id, idx, md5hex((new String(bytes, "UTF-8") + "#" + idx).getBytes("UTF-8")))
  }

  /** Range-partition by cumulative payload size so each task decodes a
    * comparable byte volume (row-count partitioning is wrong for media:
    * blob sizes span orders of magnitude). */
  def repartitionBySize(df: DataFrame, partitions: Int): DataFrame =
    df.withColumn("__len", length(col("content")))
      .repartitionByRange(partitions, col("__len"), col("media_id"))
      .drop("__len")

  /** Decode a media DataFrame's image payloads in partition-local
    * batches of `batchSize` (the Arrow-batch execution shape: a real
    * codec amortizes per-batch setup — GPU transfer, library context —
    * exactly like this). Narrow op: no shuffle. */
  def decodeImages(media: DataFrame, batchSize: Int = 64): Dataset[DecodedImage] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("content")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          // per-batch codec context would be acquired here
          batch.iterator.map { case (id, bytes) => FakeCodec.decodeImage(id, bytes) }
        }
      }
  }

  /** Image signature for perceptual dedup: the aHash construction
    * (bit j set iff feature j exceeds the feature mean — the standard
    * average-hash over a decoded thumbnail's cells) computed inline in
    * the decode pass, plus the full feature vector for exact verify. */
  final case class ImageSig(media_id: Long, phash: Long, features: Array[Double])

  /** Decode + signature in one narrow pass: payloads never shuffle,
    * only (id, 64-bit hash, small feature vector) rows flow onward. */
  def imageSignatures(media: DataFrame, batchSize: Int = 64): Dataset[ImageSig] = {
    val spark = media.sparkSession
    import spark.implicits._
    decodeImages(media, batchSize).map { d =>
      // 64-bit hash ⇒ at most 64 cells (JVM shifts wrap mod 64, which
      // would alias unrelated features into one bit and flood the
      // buckets with spurious candidates); a >64-cell codec must fold
      // cells down first
      require(d.features.length <= 64,
        s"aHash packs at most 64 feature cells, got ${d.features.length}")
      val mean = d.features.sum / d.features.length
      var h = 0L
      var j = 0
      while (j < d.features.length) {
        if (d.features(j) > mean) h |= (1L << j)
        j += 1
      }
      ImageSig(d.media_id, h, d.features)
    }
  }

  /** Perceptual-hash image dedup: bucket by aHash, verify candidates
    * by exact feature equality — the image-side twin of the text
    * digest-dedup shape (hash buckets prune the pair space; the
    * verify step makes the answer exact, so hash collisions cost work,
    * never correctness).
    *
    * Scale shape: the self-join keys on the 64-bit hash, so only
    * same-bucket images ever pair (shuffle ∝ bucket sizes, not n²);
    * payload bytes stay where they were decoded. For Hamming radius
    * > 0 — the useful setting under a real codec, where recompression
    * flips a few hash bits — use [[imageNearDupPairsRadius]].
    *
    * @return (a, b, phash) — duplicate image pairs, a < b, ordered
    */
  def imageNearDupPairs(media: DataFrame, batchSize: Int = 64): DataFrame = {
    // persist: the signature frame feeds BOTH sides of the self-join,
    // and without it the decode pass (the dominant cost) runs twice
    val sigs = imageSignatures(media, batchSize).toDF().persist()
    try {
      sigs.as("x").join(sigs.as("y"),
          col("x.phash") === col("y.phash") &&
            col("x.media_id") < col("y.media_id"))
        .filter(col("x.features") === col("y.features"))
        .select(col("x.media_id").as("a"), col("y.media_id").as("b"),
          col("x.phash").as("phash"))
        .orderBy(col("a"), col("b"))
        .transform(graft.util.Materialize.eager)
    } finally sigs.unpersist()
  }

  /** Disjoint bit-slice bounds over a `hashBits`-wide signature: the
    * pigeonhole blocking of
    * [[graft.dedup.Dedup.simhashBlockBounds]] (32-bit SimHash)
    * generalized to the perceptual hash — `maxHamming + 1` slices, so
    * any pair within the radius agrees on at least one untouched
    * slice. Full recall by construction for any radius < hashBits. */
  private[graft] def phashBlockBounds(maxHamming: Int, hashBits: Int): Seq[(Int, Int)] = {
    require(hashBits >= 1 && hashBits <= 64,
      s"perceptual hashes are 1..64 bits, got $hashBits")
    require(maxHamming >= 0 && maxHamming < hashBits,
      s"blocking needs 0 <= maxHamming < hashBits, got $maxHamming/$hashBits")
    val b = maxHamming + 1
    (0 until b).map { i =>
      val lo = i * hashBits / b; (lo, (i + 1) * hashBits / b - lo)
    }
  }

  private def phashBlockCol(sig: Column, maxHamming: Int, hashBits: Int): Column =
    explode(array(phashBlockBounds(maxHamming, hashBits).zipWithIndex.map {
      case ((lo, w), i) =>
        // arithmetic shift + mask extracts bits [lo, lo+w) regardless
        // of sign; the one full-width slice (radius 0 over 64 bits) is
        // the signature itself. Key packs (index << 48) | slice into
        // ONE long (see Dedup.simhashBlockCol — long keys make the
        // bucket join's probe several× cheaper than string concat);
        // for b ≥ 2 blocks every slice is ≤ 33 bits, so no collision
        val v = if (w == 64) sig
          else shiftright(sig, lo).bitwiseAND(lit((1L << w) - 1))
            .bitwiseOR(lit(i.toLong << 48))
        v
    }: _*))

  /** Perceptual-hash image near-dup pairs at Hamming radius
    * `maxHamming` — [[imageNearDupPairs]] for the real-codec setting
    * where a re-encode/resize flips a few aHash bits instead of none.
    * Signatures block into `maxHamming + 1` disjoint bit slices
    * ([[phashBlockBounds]]); pairs agreeing on ANY slice collide
    * (pigeonhole: ≤ maxHamming flipped bits cannot touch every slice),
    * then the exact `bit_count(xor)` distance filters candidates — so
    * recall is total and collisions cost work, never correctness.
    *
    * Scale shape: same as the radius-0 path — payloads never shuffle,
    * the join keys on (slice, slice-bits), shuffle ∝ bucket sizes.
    * `hashBits` must cover the hash's populated width (pass the
    * codec's cell count when below 64, e.g. the stub's 8): slices are
    * carved from `[0, hashBits)`, and with the default 64 a narrow
    * hash would leave all-zero high slices colliding everything.
    *
    * @return (a, b, dist) — pairs with Hamming ≤ maxHamming, a < b,
    *         ordered
    */
  def imageNearDupPairsRadius(media: DataFrame, maxHamming: Int,
      hashBits: Int = 64, batchSize: Int = 64): DataFrame = {
    val sigs = imageSignatures(media, batchSize).toDF()
      .select(col("media_id"), col("phash")).persist()
    try radiusPairs(sigs, maxHamming, hashBits)
      .transform(graft.util.Materialize.eager)
    finally sigs.unpersist()
  }

  /** The un-materialized pair plan of [[imageNearDupPairsRadius]] —
    * split out so PlanShapeSpec can pin the (slice, bits) equi-join
    * shape (the public method checkpoints its output, which hides the
    * join from the returned frame's plan). */
  private[graft] def radiusPairs(sigs: DataFrame, maxHamming: Int,
      hashBits: Int): DataFrame = {
    val blocked = sigs.withColumn("blk",
      phashBlockCol(col("phash"), maxHamming, hashBits))
    val l = blocked.select(col("media_id").as("a"), col("phash").as("pa"), col("blk"))
    val r = blocked.select(col("media_id").as("b"), col("phash").as("pb"), col("blk"))
    l.join(r, "blk").filter(col("a") < col("b"))
      .select(col("a"), col("b"),
        graft.dedup.Dedup.hamming(col("pa"), col("pb")).cast("long").as("dist"))
      .filter(col("dist") <= maxHamming) // verify before the de-dup shuffle
      .distinct()
      .orderBy(col("a"), col("b"))
  }

  /** INCREMENTAL perceptual image dedup: a batch of media payloads
    * probed against a STORED `(media_id, phash)` table — the steady-
    * state crawl shape (the image member of the incremental family:
    * MinHash bands = `Dedup.incrementalCandidates`, SimHash =
    * `Dedup.incrementalSimhash`, exact = the digest index). One-sided:
    * only (new, corpus) pairs generate, never corpus × corpus, so
    * per-batch work is batch-blocks × per-block bucket size. The batch
    * side is decoded in this pass (payloads never shuffle); the stored
    * side is a column-pruned `(media_id, phash)` scan — persist it
    * partitioned by a hash prefix for PartitionFilters pruning when it
    * outgrows a broadcast, as [[graft.dedup.BandIndex]] does.
    *
    * @return (new_id, corpus_id, dist) — Hamming ≤ maxHamming pairs,
    *         ordered
    */
  def incrementalImageDedup(batch: DataFrame, corpusHashes: DataFrame,
      maxHamming: Int, hashBits: Int = 64, batchSize: Int = 64): DataFrame = {
    val sigs = imageSignatures(batch, batchSize).toDF()
      .select(col("media_id"), col("phash"))
    def blocked(df: DataFrame, id: String, ph: String) =
      df.select(col("media_id").as(id), col("phash").as(ph))
        .withColumn("blk", phashBlockCol(col(ph), maxHamming, hashBits))
    blocked(sigs, "new_id", "np")
      .join(blocked(corpusHashes, "corpus_id", "cp"), "blk")
      .select(col("new_id"), col("corpus_id"),
        graft.dedup.Dedup.hamming(col("np"), col("cp")).cast("long").as("dist"))
      .filter(col("dist") <= maxHamming) // verify before the de-dup shuffle
      .distinct()
      .orderBy(col("new_id"), col("corpus_id"))
  }

  /** Audio near-duplicate pairs: MFCC feature vectors (from
    * [[decodeAudio]] — stubbed features here, a real filterbank in
    * production; the PLUMBING is the contract) through the SRP-LSH
    * banded pair generator with exact cosine verify
    * ([[graft.sim.Similarity.nearDupPairsLsh]]) — the audio twin of
    * [[imageNearDupPairs]], and the same 100 TB shape: band collisions
    * generate candidates, no crossJoin anywhere. */
  def audioNearDupPairs(media: DataFrame, threshold: Double,
      batchSize: Int = 64): DataFrame =
    graft.sim.Similarity.nearDupPairsLsh(
      decodeAudio(media, batchSize).toDF().select(col("media_id"), col("mfcc")),
      threshold, idCol = "media_id", vecCol = "mfcc")

  /** Decode audio payloads — same batched partition-local shape as
    * [[decodeImages]]; only the small (rate, duration, channels, MFCC)
    * rows flow onward, never the waveform. */
  def decodeAudio(media: DataFrame, batchSize: Int = 64): Dataset[DecodedAudio] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("content")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.iterator.map { case (id, bytes) => FakeCodec.decodeAudio(id, bytes) }
        }
      }
  }

  /** Logical resize: rescale decoded dimensions and renormalize
    * features — metadata math today (STUB), a pixel op with a real
    * codec; the pipeline shape (second narrow pass over decoded data)
    * is what matters. */
  def resize(decoded: Dataset[DecodedImage], maxSide: Int): Dataset[DecodedImage] = {
    val spark = decoded.sparkSession
    import spark.implicits._
    decoded.map { d =>
      val scale = math.min(1.0, maxSide.toDouble / math.max(d.width, d.height))
      d.copy(width = math.max(1, (d.width * scale).toInt),
        height = math.max(1, (d.height * scale).toInt))
    }
  }

  /** Sample frames from video payloads: one output row per frame
    * (metadata-sized). Frame count comes from the (stubbed) demuxer. */
  def sampleFrames(media: DataFrame, batchSize: Int = 16): Dataset[Frame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("content")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.iterator.flatMap { case (id, bytes) =>
            (0 until FakeCodec.frameCount(bytes)).iterator
              .map(i => FakeCodec.frame(id, bytes, i))
          }
        }
      }
  }

  /** Build a media table from the `documents` test table (text bytes as
    * payload — the container ships no real media; the column types and
    * sizes behave like thumbnails). */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(col("doc_id").as("media_id"),
      when(col("doc_id") % 3 === 0, lit("video")).otherwise(lit("image")).as("media_type"),
      lit("fake").as("fmt"),
      encode(col("text"), "UTF-8").cast(BinaryType).as("content"))
}
