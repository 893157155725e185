package graft.curation

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PackingSpec extends SparkSpec {

  test("slidingChunks: stride windows + tail coverage; short and empty docs") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = Seq(
      (1L, (1 to 10).map(i => s"t$i").mkString(" ")), // 10 toks, w=4 s=3
      (2L, "a b"),                                    // shorter than window
      (3L, "")                                        // empty
    ).toDF("doc_id", "text")
    val chunks = Packing.slidingChunks(docs, "text", window = 4, stride = 3)
      .select("doc_id", "chunk_idx", "chunk_start", "chunk_text")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
    // doc 1: starts 0,3,6 (=len-window exactly, no extra tail)
    val d1 = chunks.filter(_._1 == 1L).sortBy(_._2)
    assert(d1.map(_._3).toSeq == Seq(0, 3, 6))
    assert(d1.head._4 == "t1 t2 t3 t4" && d1.last._4 == "t7 t8 t9 t10")
    // every token index is covered by some chunk
    assert(d1.map(c => (c._3, c._3 + 4)).foldLeft(Set.empty[Int]) {
      case (s, (a, b)) => s ++ (a until b)
    } == (0 until 10).toSet)
    // doc 2: one chunk, whole doc; doc 3: one empty chunk
    assert(chunks.filter(_._1 == 2L).toSeq == Seq((2L, 0, 0, "a b")))
    assert(chunks.filter(_._1 == 3L).toSeq == Seq((3L, 0, 0, "")))
    // tail start appended when stride overshoots: 11 toks, w=4, s=3 →
    // starts 0,3,6 then tail 7 (11-4) since 7 % 3 != 0
    val tail = Packing.slidingChunks(
      Seq((9L, (1 to 11).map(i => s"t$i").mkString(" "))).toDF("doc_id", "text"),
      "text", 4, 3).select("chunk_start").collect().map(_.getInt(0)).sorted
    assert(tail.toSeq == Seq(0, 3, 6, 7))
    // re-chunking chunked output must fail loudly, not produce
    // ambiguous duplicate columns
    val once = Packing.slidingChunks(docs, "text", 4, 3)
    intercept[IllegalArgumentException](
      Packing.slidingChunks(once, "chunk_text", 2, 1))
  }
  import spark.implicits._

  test("packPositions: concat-then-chunk within shards, exact offsets") {
    // one shard (nShards=1) makes the stream auditable by hand
    val docs = Seq((1L, 100L), (2L, 400L), (3L, 50L), (4L, 600L))
      .toDF("doc_id", "n")
    val pos = Packing.packPositions(docs, col("doc_id"), col("n"),
        seqLen = 512, nShards = 1)
      .orderBy("doc_id")
      .select("doc_id", "pack_id", "offset").as[(Long, Long, Long)].collect()
    // cum_before: 0, 100, 500, 550 → packs 0,0,0,1; offsets 0,100,500,38
    assert(pos.toSeq == Seq((1L, 0L, 0L), (2L, 0L, 100L), (3L, 0L, 500L),
      (4L, 1L, 38L)))
  }

  test("packPositions: deterministic across repartitioning (shard windows)") {
    val docs = Seq.tabulate(200)(i => (i.toLong, (i % 37 + 1).toLong))
      .toDF("doc_id", "n")
    def run(df: org.apache.spark.sql.DataFrame) =
      Packing.packPositions(df, col("doc_id"), col("n"), seqLen = 64, nShards = 4)
        .orderBy("doc_id").collect().toSeq
    assert(run(docs) == run(docs.repartition(13)))
  }

  test("qualityFilter: reasons name every violated rule; clean rows keep") {
    val docs = Seq(
      (1L, Seq.fill(40)("the word here").mkString(" ")), // long enough, has stopword
      (2L, "tiny doc the"), // too few tokens
      (3L, ("x" * 30 + " ") * 40) // long tokens, no stopwords, enough tokens
    ).toDF("doc_id", "text")
      .withColumn("t", graft.text.TextFunctions.tokens(col("text")))
      .withColumn("lt", graft.text.TextFunctions.tokens(lower(col("text"))))
    val out = Packing.qualityFilter(docs,
        Packing.gopherRules(col("text"), col("t"), col("lt"), minTokens = 30))
      .select(col("doc_id"), col("keep"), col("reasons"))
      .orderBy("doc_id").as[(Long, Boolean, Seq[String])].collect()
    assert(out(0) == ((1L, true, Seq.empty)))
    assert(!out(1)._2 && out(1)._3.contains("too_few_tokens"))
    assert(!out(2)._2 && out(2)._3.contains("mean_word_len")
      && out(2)._3.contains("no_stopwords"))
  }

  test("packTokens: every token lands once, in doc order, padded tail") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // one shard (nShards = 1) so the whole stream is checkable in order:
    // doc ids 0..4 with 3,5,7,2,4 tokens = 21 tokens → packs of 8: 8+8+5
    val lens = Seq(3, 5, 7, 2, 4)
    val docs = lens.zipWithIndex.map { case (n, d) =>
      (d.toLong, (0 until n).map(i => d * 100 + i).toArray)
    }.toDF("doc_id", "ids")
    val packed = Packing.packTokens(docs, col("doc_id"), col("ids"),
      seqLen = 8, nShards = 1, padId = -1)
      .orderBy("shard", "pack_id").collect()
    assert(packed.length == 3)
    assert(packed.forall(_.getSeq[Int](2).length == 8), "every pack full-length")
    val stream = packed.flatMap(_.getSeq[Int](2))
    val expected = lens.zipWithIndex
      .flatMap { case (n, d) => (0 until n).map(i => d * 100 + i) } ++
      Seq(-1, -1, -1)
    assert(stream.toSeq == expected,
      "concatenated packs must be the doc-ordered token stream + padding")

    // multi-shard: conservation and per-shard stream integrity
    val sharded = Packing.packTokens(docs, col("doc_id"), col("ids"),
      seqLen = 4, nShards = 2, padId = -1)
    val all = sharded.select(explode(col("input_ids")).as("id"))
      .filter(col("id") =!= -1).as[Int].collect().sorted.toSeq
    assert(all == lens.zipWithIndex
      .flatMap { case (n, d) => (0 until n).map(i => d * 100 + i) }.sorted)
    // consistency with the positions table: same pack count per shard
    val pos = Packing.packPositions(docs, col("doc_id"), size(col("ids")), 4, 2)
    val expPacks = pos.groupBy("shard")
      .agg(ceil(sum("n_tokens") / 4.0).as("n")).as[(Int, Long)].collect().toMap
    val gotPacks = sharded.groupBy("shard").count().as[(Int, Long)].collect().toMap
    assert(gotPacks == expPacks)
  }

  test("packingStats: fill is the tail-pack padding bill, consistent with packPositions") {
    val docs = (0L until 60L).map(i => (i, 10L + i % 7)).toDF("doc_id", "n")
    val stats = Packing.packingStats(docs, col("doc_id"), col("n"),
        seqLen = 64, nShards = 4)
      .as[(Int, Long, Long, Long, Double)].collect().toSeq
    assert(stats.map(_._1) == stats.map(_._1).sorted && stats.nonEmpty)
    // agree with the ground truth derived from the same shard hash
    val positions = Packing.packPositions(docs, col("doc_id"), col("n"), 64, 4)
      .select("shard", "n_tokens").as[(Int, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    for ((shard, nDocs, nToks, nPacks, fill) <- stats) {
      assert(nToks == positions(shard), s"shard $shard token mass")
      assert(nPacks == (nToks + 63) / 64)
      assert(fill == BigDecimal(nToks.toDouble / (nPacks * 64).toDouble)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      assert(fill > 0.5 && fill <= 1.0, s"shard $shard fill $fill")
    }
    assert(stats.map(_._2).sum == 60L, "every doc lands in one shard")
    // a token-less shard reports null fill, never NaN
    val empty = Packing.packingStats(
      Seq((1L, 0L)).toDF("doc_id", "n"), col("doc_id"), col("n"), 64, 1)
      .collect()
    assert(empty.head.isNullAt(4))
  }
}
