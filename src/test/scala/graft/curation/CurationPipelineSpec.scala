package graft.curation

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.dedup.Dedup
import graft.text.{Bpe, TextFunctions}

/** The composed curation pipeline, end to end on one frame — the
  * "switch your training-data pipeline to this library" integration
  * story: normalize → exact dedup → near dedup (LSH + components) →
  * quality filter (reasons, never silent) → BPE tokenize → sequence
  * pack → token-budget select. Every stage is the library operator a
  * dedicated oracle query already verifies in isolation; this spec
  * pins that they COMPOSE — columns survive, drops are attributable,
  * and token mass is conserved into the packer.
  *
  * Planted corpus: a base doc, an exact dup of it hidden behind
  * representation tricks (zero-width chars + extra whitespace — only
  * the normalize-first contract catches it), an LSH near-dup, an
  * unrelated keeper, and three junk docs (short / punct-heavy /
  * digit-heavy), each expected to fall to a specific stage.
  */
class CurationPipelineSpec extends SparkSpec {
  import spark.implicits._

  private val wordsA = (1 to 40).map(i => s"the word alpha$i of").mkString(" ")
  private val wordsB = (1 to 40).map(i => s"the word beta$i of").mkString(" ")

  test("normalize → dedup → quality → tokenize → pack → budget composes") {
    val docs = Seq(
      0L -> s"a clean doc $wordsA",
      // exact dup of 0 after zero-width strip + whitespace collapse
      1L -> s"a clean \u200B doc $wordsA\uFEFF",
      // near-dup of 0: same shingle mass, few words changed
      2L -> s"a clean doc $wordsA changed tail words here",
      3L -> s"a different keeper $wordsB",
      4L -> "hi",
      5L -> ("!?!. " * 40),
      6L -> ("42 7 " * 40)
    ).toDF("doc_id", "text")

    // 1. normalize-first (q84's operator)
    val cleaned = docs.withColumn("text", TextFunctions.cleanText(col("text")))

    // 2. exact dedup (q24): doc 1 collapses onto doc 0
    val exact = Dedup.exact(cleaned, "text", "doc_id")
    assert(exact.select("doc_id").as[Long].collect().toSet ==
      Set(0L, 2L, 3L, 4L, 5L, 6L))

    // 3. near dedup (q26/q51): LSH candidates → agreement ≥ 0.5 →
    //    components → keep each component's min id. Doc 2 falls.
    val k = 32
    val sigged = exact.withColumn("sig", Dedup.minhashSignature(col("text"), k))
    val pairs = Dedup.lshCandidatesWithSigs(sigged, "doc_id", "sig", bands = 8)
      .filter(Dedup.sigMatches(col("siga"), col("sigb")) >= k / 2)
      .select("a", "b")
    val comps = Dedup.connectedComponents(pairs)
    val nearDeduped = exact.join(
      comps.filter(col("id") =!= col("comp")).select(col("id").as("doc_id")),
      Seq("doc_id"), "left_anti")
    assert(nearDeduped.select("doc_id").as[Long].collect().toSet ==
      Set(0L, 3L, 4L, 5L, 6L))

    // 4. quality filter (q58): the three junk docs drop, each for its
    //    planted reason; nothing is silent
    val staged = nearDeduped
      .withColumn("toks", TextFunctions.tokens(col("text")))
      .withColumn("ltoks", TextFunctions.tokens(lower(col("text"))))
    val judged = Packing.qualityFilter(staged,
      Packing.gopherRules(col("text"), col("toks"), col("ltoks"),
        minTokens = 20, minMeanLen = 2.0))
    val reasons = judged.filter(!col("keep"))
      .select(col("doc_id"), col("reasons"))
      .as[(Long, Seq[String])].collect().toMap
    assert(reasons.keySet == Set(4L, 5L, 6L))
    assert(reasons(4L).contains("too_few_tokens"))
    assert(reasons(5L).contains("punct_heavy"))
    assert(reasons(6L).contains("digit_heavy"))
    val kept = judged.filter(col("keep")).drop("toks", "ltoks", "reasons", "keep")
    assert(kept.select("doc_id").as[Long].collect().toSet == Set(0L, 3L))

    // 5. tokenize (q86): lossless, counted
    val merges = Bpe.train(kept, "text", numMerges = 64)
    val tokenized = kept
      .withColumn("tokens", Bpe.encode(col("text"), merges))
      .withColumn("n_tokens", size(col("tokens")))
    assert(tokenized.filter(
      Bpe.decode(col("tokens")) =!= col("text")).count() == 0)

    // 6. pack (q57): token mass conserved, offsets inside the sequence
    val totalTokens = tokenized.agg(sum("n_tokens")).head.getLong(0)
    val packed = Packing.packPositions(tokenized, col("doc_id"),
      col("n_tokens"), seqLen = 64, nShards = 2)
    assert(packed.agg(sum("n_tokens")).head.getLong(0) == totalTokens)
    assert(packed.filter(col("offset") < 0 || col("offset") >= 64).count() == 0)

    // 7. budget select (q76): spend at most `budget` tokens, best-first
    val budget = totalTokens - 1 // force a real cut
    val selected = Sampling.budgetSelect(tokenized, col("doc_id"),
      col("n_tokens").cast("double"), col("n_tokens"), budget)
    assert(selected.agg(sum("n_tokens")).head.getLong(0) <= budget)
    assert(selected.count() >= 1)
  }
}
