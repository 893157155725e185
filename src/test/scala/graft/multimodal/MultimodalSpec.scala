package graft.multimodal

import org.apache.spark.sql.functions._
import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  test("decodeAudio: deterministic metadata + 13 MFCCs, batched narrow pass") {
    import spark.implicits._
    val media = Seq(
      (1L, "audio", "fake", "some waveform bytes".getBytes("UTF-8")),
      (2L, "audio", "fake", "other waveform".getBytes("UTF-8")))
      .toDF("media_id", "media_type", "fmt", "content")
    val out = Multimodal.decodeAudio(media).collect().sortBy(_.media_id)
    assert(out.length == 2)
    assert(out.forall(a => Set(8000, 16000, 22050, 44100, 48000)(a.sample_rate)))
    assert(out.forall(a => a.duration_ms >= 1 && a.duration_ms <= 600000))
    assert(out.forall(a => a.channels == 1 || a.channels == 2))
    assert(out.forall(_.mfcc.length == 13))
    assert(out.forall(_.mfcc.forall(v => v >= -10.0 && v < 10.0)))
    // deterministic: same payload → same decode
    val again = Multimodal.decodeAudio(media).collect().sortBy(_.media_id)
    assert(out.map(_.mfcc.toSeq).toSeq == again.map(_.mfcc.toSeq).toSeq)
  }
  import spark.implicits._

  private def media = Multimodal.mediaFromDocuments(
    Seq((1L, "hello world this is a test document"),
      (3L, "short"),
      (6L, "x" * 3500)) // "video" (id%3==0), 3 frames
      .toDF("doc_id", "text"))

  test("media table has binary payload + typed metadata") {
    val s = media.schema
    assert(s("content").dataType.typeName == "binary")
    assert(media.count() == 3)
    assert(media.filter($"media_type" === "video").count() == 2)
  }

  test("decodeImages: deterministic, bounded dims, 8 features in [0,1)") {
    val d1 = Multimodal.decodeImages(media).collect().sortBy(_.media_id)
    val d2 = Multimodal.decodeImages(media, batchSize = 1).collect().sortBy(_.media_id)
    assert(d1.map(_.media_id).toSeq == Seq(1L, 3L, 6L))
    // batch size must not change results (pure per-element decode)
    assert(d1.zip(d2).forall { case (a, b) =>
      a.width == b.width && a.height == b.height && a.features.sameElements(b.features) })
    d1.foreach { d =>
      assert(d.width >= 1 && d.width <= 1024 && d.height >= 1 && d.height <= 1024)
      assert(d.channels >= 1 && d.channels <= 4)
      assert(d.features.length == 8 && d.features.forall(f => f >= 0.0 && f < 1.0))
    }
  }

  test("resize caps the longest side, preserves ids") {
    val resized = Multimodal.resize(Multimodal.decodeImages(media), maxSide = 64)
      .collect()
    assert(resized.forall(d => math.max(d.width, d.height) <= 64))
    assert(resized.map(_.media_id).sorted.toSeq == Seq(1L, 3L, 6L))
  }

  test("sampleFrames: count from payload size, deterministic digests") {
    val frames = Multimodal.sampleFrames(media.filter($"media_type" === "video"))
      .collect().sortBy(f => (f.media_id, f.frame_idx))
    // id 3 "short" -> 1 frame; id 6 (3500 bytes) -> 3 frames
    assert(frames.map(_.media_id).toSeq == Seq(3L, 6L, 6L, 6L))
    assert(frames.map(_.frame_idx).toSeq == Seq(0, 0, 1, 2))
    assert(frames.map(_.frame_md5).distinct.length == 4)
  }

  test("imageNearDupPairs: identical payloads pair, distinct ones never do") {
    val m = Multimodal.mediaFromDocuments(Seq(
      (1L, "the same picture bytes"), (2L, "the same picture bytes"),
      (7L, "the same picture bytes"), // triple → 3 pairs
      (3L, "something else entirely"), (4L, "yet another image"))
      .toDF("doc_id", "text"))
    val pairs = Multimodal.imageNearDupPairs(m)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(pairs == Seq((1L, 2L), (1L, 7L), (2L, 7L)),
      s"exactly the payload-identical pairs, ordered: $pairs")
  }

  test("imageSignatures: every aHash bit follows the mean threshold") {
    val sigs = Multimodal.imageSignatures(media).collect()
    assert(sigs.length == 3)
    sigs.foreach { s =>
      val mean = s.features.sum / s.features.length
      s.features.zipWithIndex.foreach { case (f, j) =>
        assert(((s.phash >> j) & 1L) == (if (f > mean) 1L else 0L),
          s"bit $j of ${s.media_id} disagrees with its feature/mean")
      }
    }
  }

  test("phashBlockBounds: disjoint slices exactly cover [0, hashBits)") {
    for (bits <- Seq(8, 17, 64); r <- 0 until math.min(bits, 7)) {
      val bounds = Multimodal.phashBlockBounds(r, bits)
      assert(bounds.length == r + 1)
      val covered = bounds.flatMap { case (lo, w) => lo until (lo + w) }
      assert(covered == (0 until bits),
        s"bits=$bits r=$r must partition the hash: $bounds")
    }
    intercept[IllegalArgumentException](Multimodal.phashBlockBounds(8, 8))
    intercept[IllegalArgumentException](Multimodal.phashBlockBounds(0, 65))
  }

  test("radius blocking is the recall identity against brute-force Hamming") {
    // 40 synthetic docs => 8-bit stub hashes with plenty of close pairs
    val many = Multimodal.mediaFromDocuments(
      (0L until 40L).map(i => (i, s"doc body number $i with drift ${i % 7}"))
        .toDF("doc_id", "text"))
    val sigs = Multimodal.imageSignatures(many).collect()
      .map(s => s.media_id -> s.phash).toMap
    for (r <- Seq(1, 2, 3)) {
      val expect = (for {
        a <- sigs.keys; b <- sigs.keys if a < b
        d = java.lang.Long.bitCount(sigs(a) ^ sigs(b)) if d <= r
      } yield (a, b, d.toLong)).toSet
      val got = Multimodal.imageNearDupPairsRadius(many, maxHamming = r,
          hashBits = 8)
        .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet
      assert(got == expect, s"radius $r: banded plan must lose no pair")
      assert(expect.nonEmpty, s"fixture must exercise radius $r")
    }
  }

  test("incrementalImageDedup: one-sided recall identity, corpus never self-pairs") {
    val all = Multimodal.mediaFromDocuments(
      (0L until 40L).map(i => (i, s"media item $i group ${i % 6}"))
        .toDF("doc_id", "text"))
    val corpusSigs = Multimodal.imageSignatures(all.filter(col("media_id") < 25))
      .toDF().select(col("media_id"), col("phash"))
    val batch = all.filter(col("media_id") >= 25)
    val got = Multimodal.incrementalImageDedup(batch, corpusSigs,
        maxHamming = 2, hashBits = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val sigs = Multimodal.imageSignatures(all).collect()
      .map(s => s.media_id -> s.phash).toMap
    val expect = (for {
      n <- 25L until 40L; c <- 0L until 25L
      d = java.lang.Long.bitCount(sigs(n) ^ sigs(c)) if d <= 2
    } yield (n, c, d.toLong)).toSet
    assert(got == expect, "banded one-sided probe must equal brute force")
    assert(expect.nonEmpty)
    assert(got.forall { case (n, c, _) => n >= 25 && c < 25 },
      "never a corpus-corpus or batch-batch pair")
  }

  test("repartitionBySize balances byte volume") {
    val parts = Multimodal.repartitionBySize(media, 2)
    assert(parts.rdd.getNumPartitions == 2)
    assert(parts.count() == 3)
  }

  test("audioNearDupPairs: identical payloads pair at sim 1.0, distinct payloads verified exactly") {
    import org.apache.spark.sql.functions._
    val m = spark.range(20).select($"id".as("media_id"),
        lit("audio").as("media_type"), lit("fake").as("fmt"),
        encode(concat(lit("payload "), ($"id" % 10).cast("string")), "UTF-8")
          .cast("binary").as("content"))
    // ids i and i+10 carry identical payloads -> identical MFCCs
    val got = Multimodal.audioNearDupPairs(m, threshold = 0.999)
      .as[(Long, Long, Double)].collect().toSet
    assert(got == (0L until 10L).map(i => (i, i + 10L, 1.0)).toSet, s"$got")
    // threshold 1.1 excludes everything (exact verify, not band trust)
    assert(Multimodal.audioNearDupPairs(m, threshold = 1.1).count() == 0)
  }
}
