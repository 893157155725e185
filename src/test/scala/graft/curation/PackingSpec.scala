package graft.curation

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PackingSpec extends SparkSpec {
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
}
