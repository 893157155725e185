package graft.curation

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.text.TextFunctions.tokens

class DsirSpec extends SparkSpec {
  import spark.implicits._

  /** Two vocab-disjoint domains: target-slice docs speak "science",
    * the rest speak "spam"; two unlabeled probes, one per domain. */
  private def docs = Seq(
    (1L, "atoms orbit nuclei and electrons bond", true),
    (2L, "cells divide and proteins fold", true),
    (3L, "buy cheap pills now click here", false),
    (4L, "win cash prizes click now", false),
    (5L, "electrons bond and proteins fold", false), // science-y probe
    (6L, "cheap prizes click here now", false)) // spam probe
    .toDF("doc_id", "text", "is_tgt")

  test("importance scores rank target-like probes above anti-target probes") {
    val scores = Dsir.importanceScores(docs, col("doc_id"),
      tokens(lower(col("text"))), col("is_tgt"), numBuckets = 4096)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(scores(5) > scores(6),
      s"science probe must out-score spam probe: $scores")
    assert(scores(1) > scores(3) && scores(2) > scores(4),
      s"target docs must out-score anti-target docs: $scores")
  }

  test("select: exact top-n, rank order, and partitioning invariance") {
    val a = Dsir.select(docs.repartition(1), col("doc_id"),
      tokens(lower(col("text"))), col("is_tgt"), n = 3, numBuckets = 512)
      .collect().toSeq
    val b = Dsir.select(docs.repartition(7), col("doc_id"),
      tokens(lower(col("text"))), col("is_tgt"), n = 3, numBuckets = 512)
      .collect().toSeq
    assert(a == b, "two-stage top-n must be partitioning-invariant")
    assert(a.size == 3 && a.map(_.getLong(0)) == Seq(1L, 2L, 3L))
  }

  test("resample: deterministic Gumbel draw; T→0 collapses to the exact head") {
    val a = Dsir.resample(docs.repartition(1), col("doc_id"),
      tokens(lower(col("text"))), col("is_tgt"), n = 4, numBuckets = 512)
      .collect().toSeq
    val b = Dsir.resample(docs.repartition(7), col("doc_id"),
      tokens(lower(col("text"))), col("is_tgt"), n = 4, numBuckets = 512)
      .collect().toSeq
    assert(a == b, "md5-Gumbel sampling must be partitioning-invariant")
    assert(a.size == 4 && a.map(_.getLong(0)) == Seq(1L, 2L, 3L, 4L))
    // temperature → 0: score/T dwarfs the bounded Gumbel noise, so the
    // draw must coincide with the deterministic top-n head
    val frozen = Dsir.resample(docs, col("doc_id"), tokens(lower(col("text"))),
      col("is_tgt"), n = 3, numBuckets = 512, temperature = 1e-9)
      .collect().map(_.getLong(1)).toSet
    val head = Dsir.select(docs, col("doc_id"), tokens(lower(col("text"))),
      col("is_tgt"), n = 3, numBuckets = 512)
      .collect().map(_.getLong(1)).toSet
    assert(frozen == head, s"T→0 resample $frozen must equal the head $head")
  }

  test("frozen model round-trips self-scores and covers unseen-feed buckets") {
    val dir = tmpDir("dsir-model")
    val buckets = 64
    Dsir.trainDsirModel(docs, col("doc_id"), tokens(lower(col("text"))),
      col("is_tgt"), buckets, dir)
    // artifact covers the FULL bucket domain (unseen-feed safety)
    assert(spark.read.parquet(s"$dir/lr").count() == buckets.toLong)
    val self = Dsir.importanceScores(docs, col("doc_id"),
        tokens(lower(col("text"))), col("is_tgt"), buckets)
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    val stored = Dsir.scoreDsirModel(docs, col("doc_id"),
        tokens(lower(col("text"))), dir, buckets)
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(self == stored, "artifact round-trip must not change scores")
    // a live doc with out-of-training vocabulary still scores (its
    // buckets fall back to the smoothed zero-count ratio, no drop)
    val live = Seq((9L, "zz qq ww vv")).toDF("doc_id", "text")
    val out = Dsir.scoreDsirModel(live, col("doc_id"),
      tokens(lower(col("text"))), dir, buckets).collect()
    assert(out.length == 1 && !out.head.getDouble(2).isNaN,
      s"unseen-vocab doc must score, got ${out.toSeq}")
  }

  test("featureBuckets: unigrams + bigrams, all in [0, B)") {
    val out = Seq("a b c").toDF("text")
      .select(Dsir.featureBuckets(tokens(col("text")), 16).as("b"))
      .as[Seq[Long]].collect().head
    assert(out.size == 5, "3 unigrams + 2 bigrams")
    assert(out.forall(x => x >= 0 && x < 16))
  }

  test("whitespace-only documents drop out (no features, no NaN rows)") {
    val d = Seq((1L, "alpha beta", true), (2L, "   ", false))
      .toDF("doc_id", "text", "is_tgt")
    val out = Dsir.importanceScores(d, col("doc_id"),
      tokens(lower(col("text"))), col("is_tgt"))
      .as[(Long, Long, Double)].collect().toSeq
    assert(out.map(_._1) == Seq(1L))
    assert(!out.head._3.isNaN)
  }
}
