package graft.curation

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.relational.RelationalQueries.dsum

/** Corpus-trained n-gram language-model scoring — the CCNet-style
  * quality signal: documents whose token sequences are improbable under
  * a language model of the corpus itself score a high cross-entropy and
  * get filtered or bucketed (head/middle/tail) before training.
  *
  * The model here is an add-one-smoothed bigram LM trained distributed
  * on the same corpus it scores (two hash aggregations), rather than a
  * pretrained KenLM binary: the reference pipeline ships no model
  * artifact, and self-trained scoring keeps the whole operator inside
  * the engine with no external file dependency. Swapping in pretrained
  * counts is a join-table substitution.
  *
  * Scale shape (100 TB): bigram and prefix counts are two shuffles with
  * map-side partial aggregation — both collapse to vocabulary-bounded
  * tables (Heaps' law keeps distinct bigrams far below corpus size).
  * Scoring re-joins the bigram stream to those count tables on their
  * own keys (AQE broadcasts them when small); the vocabulary size is a
  * one-row broadcast. Per-document aggregation state is O(1) — one
  * decimal accumulator and one count. No driver-side collect anywhere.
  *
  * Determinism contract: with add-one smoothing every log argument is
  * an exact integer (c1 + V and c12 + 1), so the only engine
  * divergence is the last ulp of ln itself on integer inputs
  * (measured: ~2.4e-5 of integers in [1, 2e7] differ by 1 ulp between
  * Java's Math.log and DuckDB's ln). Each per-term log-probability is
  * rounded to 6 decimals AT THE TERM, then the per-document sum runs
  * in DECIMAL(18,6) ([[graft.relational.RelationalQueries.dsum]]) — a
  * commutative, exact sum, so the result is identical under ANY
  * partitioning/ordering and per-document aggregation state is one
  * decimal + one count, not a buffered token list (a 10M-token
  * document costs the same aggregation state as a tweet). A rounded
  * term straddling an ln ulp-wobble boundary is ~4e-14 likely per
  * term — absorbed by the same final 6-decimal round as before.
  */
object LangModel {

  /** Per-document cross-entropy under an add-one-smoothed bigram LM
    * trained on `docs` itself.
    *
    * P(w2 | w1) = (c(w1,w2) + 1) / (c(w1) + V) with V the distinct
    * token count of the corpus; cross-entropy is the mean of
    * ln(c(w1) + V) - ln(c(w1,w2) + 1) over the document's bigrams.
    *
    * Output: one row per document with at least one bigram —
    * `(__id, n_bigrams, xent)`, xent unrounded. Documents with fewer
    * than two tokens are absent (callers left-join and decide).
    */
  /** The `(__id, w1, w2)` bigram stream of a doc frame. */
  private def bigramsOf(docs: DataFrame, id: Column, toks: Column): DataFrame =
    docs.select(id.as("__id"), toks.as("__t"))
      .where(size(col("__t")) >= 2)
      .select(col("__id"),
        slice(col("__t"), lit(1), size(col("__t")) - 1).as("a"),
        slice(col("__t"), lit(2), size(col("__t")) - 1).as("b"))
      .select(col("__id"), explode(arrays_zip(col("a"), col("b"))).as("z"))
      .select(col("__id"), col("z.a").as("w1"), col("z.b").as("w2"))

  /** Score a bigram stream against model count tables. LEFT joins, so
    * bigrams the model never saw smooth to (0 + 1) / (0-or-c1 + V) —
    * exactly add-one smoothing — which is what lets a model trained on
    * one corpus score a DIFFERENT (e.g. live) doc stream; on the
    * self-train path every bigram is in the tables and the left joins
    * degenerate to inner. */
  private def scoreBigrams(big: DataFrame, c12: DataFrame, c1: DataFrame,
      vocab: DataFrame): DataFrame = {
    // per-term round, then a commutative decimal sum: O(1) aggregation
    // state per document, order-free by construction
    val lp = round(
      log((coalesce(col("c1"), lit(0L)) + col("v")).cast(DoubleType)) -
        log((coalesce(col("c12"), lit(0L)) + lit(1L)).cast(DoubleType)), 6)
    big.join(c12, Seq("w1", "w2"), "left")
      .join(c1, Seq("w1"), "left")
      .crossJoin(broadcast(vocab))
      .groupBy(col("__id"))
      .agg(count(lit(1)).as("n_bigrams"), dsum(lp).as("s"))
      .select(col("__id"), col("n_bigrams"),
        (col("s") / col("n_bigrams").cast(DoubleType)).as("xent"))
  }

  def bigramCrossEntropy(docs: DataFrame, id: Column, toks: Column): DataFrame = {
    val big = bigramsOf(docs, id, toks)
    // ONE corpus aggregation feeds the whole model: the bigram count
    // table is materialized once (vocabulary-bounded by Heaps' law) and
    // the prefix counts DERIVE from it by exact integer re-aggregation
    // (c1(w1) = Σ_w2 c12(w1,w2)) instead of a second corpus pass. The
    // per-bigram log-probability is then evaluated once per DISTINCT
    // bigram and joined back to the corpus-sized stream in a single
    // join — before, the corpus stream re-tokenized per count table and
    // joined the count tables row-by-row (4 source scans; now 2 + the
    // vocab pass collapses into neither side changing its arithmetic:
    // identical integer counts → identical rounded doubles).
    val c12 = graft.util.Materialize.eager(
      big.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12")))
    val c1 = c12.groupBy(col("w1")).agg(sum(col("c12")).as("c1"))
    val vocab = docs.select(explode(toks).as("w"))
      .agg(countDistinct(col("w")).as("v"))
    // same Column tree as [[scoreBigrams]]' lp — evaluated per distinct
    // bigram; on the self-train path every corpus bigram is in c12, so
    // the inner join below is row-for-row the old left-join result
    val lp = round(
      log((coalesce(col("c1"), lit(0L)) + col("v")).cast(DoubleType)) -
        log((coalesce(col("c12"), lit(0L)) + lit(1L)).cast(DoubleType)), 6)
    val score = c12.join(c1, Seq("w1"))
      .crossJoin(broadcast(vocab))
      .select(col("w1"), col("w2"), lp.as("__lp"))
    big.join(score, Seq("w1", "w2"))
      .groupBy(col("__id"))
      .agg(count(lit(1)).as("n_bigrams"), dsum(col("__lp")).as("s"))
      .select(col("__id"), col("n_bigrams"),
        (col("s") / col("n_bigrams").cast(DoubleType)).as("xent"))
  }

  /** Train the bigram model ONCE and persist its three count tables
    * (`c12`, `c1`, `v`) under `modelDir` — the artifact side of the
    * incremental-dedup pattern: heavy distributed training happens in
    * a batch pass, and scoring (batch or per-micro-batch) is then
    * three joins against vocabulary-bounded parquet. */
  def trainBigramModel(docs: DataFrame, id: Column, toks: Column,
      modelDir: String): Unit = {
    val big = bigramsOf(docs, id, toks)
    big.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
      .write.mode("overwrite").parquet(s"$modelDir/c12")
    // the prefix counts are an exact re-aggregation of the bigram table
    // just written (c1(w1) = Σ_w2 c12(w1,w2)) — read the artifact back
    // instead of paying a second tokenize+explode pass over the corpus
    docs.sparkSession.read.parquet(s"$modelDir/c12")
      .groupBy(col("w1")).agg(sum(col("c12")).as("c1"))
      .write.mode("overwrite").parquet(s"$modelDir/c1")
    docs.select(explode(toks).as("w")).agg(countDistinct(col("w")).as("v"))
      .write.mode("overwrite").parquet(s"$modelDir/v")
  }

  /** Score a doc frame against a [[trainBigramModel]] artifact.
    * Unseen bigrams smooth by add-one, so the scored frame need not be
    * the training corpus. Same output contract as
    * [[bigramCrossEntropy]]; identical results when scoring the
    * training corpus itself. */
  def scoreBigramModel(docs: DataFrame, id: Column, toks: Column,
      modelDir: String): DataFrame = {
    val spark = docs.sparkSession
    scoreBigrams(bigramsOf(docs, id, toks),
      spark.read.parquet(s"$modelDir/c12"),
      spark.read.parquet(s"$modelDir/c1"),
      spark.read.parquet(s"$modelDir/v"))
  }

  /** Score a LIVE document stream against a persisted
    * [[trainBigramModel]] artifact — the "score a live feed" closing
    * of the LM family: each micro-batch runs [[scoreBigramModel]]'s
    * three-join plan via `foreachBatch` and appends to `outDir`
    * (the incremental-dedup pattern: per-batch work ∝ batch size, the
    * model tables are re-read per batch and AQE broadcasts them).
    * Because scoring is per-document and the model is frozen, the
    * union of all batch outputs is EXACTLY the batch scoring of the
    * same documents — the q104→q108 equivalence, adjudicated by q120.
    * Blocks until the AvailableNow drain finishes. */
  def scoreBigramStream(stream: DataFrame, id: Column, toks: Column,
      modelDir: String, outDir: String, checkpointDir: String): Unit = {
    val spark = stream.sparkSession
    val c12 = spark.read.parquet(s"$modelDir/c12")
    val c1 = spark.read.parquet(s"$modelDir/c1")
    val v = spark.read.parquet(s"$modelDir/v")
    graft.streaming.ScoreStream.replay(stream, Seq(c12, c1, v), outDir,
      checkpointDir)(batch => scoreBigrams(bigramsOf(batch, id, toks), c12, c1, v))
  }

  /** Per-document cross-entropy under a Jelinek-Mercer-interpolated
    * trigram LM trained on `docs` itself — the sharper CCNet-style
    * signal once the corpus is big enough to support trigram counts:
    *
    *   P(w3 | w1 w2) = λ3·(c123+1)/(c12+V) + λ2·(c23+1)/(c2+V)
    *                   + λ1·(c3+1)/(N+V)
    *
    * with every count taken over the trigram stream, V the corpus
    * distinct-token count, and N the trigram total. The default
    * weights (.5/.25/.25) are exact binary fractions, every division
    * has exact-integer operands, and the three terms add in fixed
    * order — so P is the identical double in any IEEE engine and ln's
    * last-ulp wobble is absorbed exactly as in
    * [[bigramCrossEntropy]]'s contract.
    *
    * Scale shape: five count tables, all vocabulary-bounded, all
    * built with map-side partial aggregation; the widest (distinct
    * trigrams) is still far below corpus size by Heaps' law. Scoring
    * re-joins the trigram stream on the count tables' own keys (AQE
    * broadcasts the small ones); totals and V are one-row broadcasts.
    *
    * Output: `(__id, n_trigrams, xent)`, documents with < 3 tokens
    * absent (callers left-join and decide). */
  def trigramCrossEntropy(docs: DataFrame, id: Column, toks: Column,
      l3: Double = 0.5, l2: Double = 0.25, l1: Double = 0.25): DataFrame = {
    require(math.abs(l3 + l2 + l1 - 1.0) < 1e-12, "weights must sum to 1")
    val tok = docs.select(id.as("__id"), toks.as("__t"))
    val tri = tok.where(size(col("__t")) >= 3)
      .select(col("__id"),
        slice(col("__t"), lit(1), size(col("__t")) - 2).as("a"),
        slice(col("__t"), lit(2), size(col("__t")) - 2).as("b"),
        slice(col("__t"), lit(3), size(col("__t")) - 2).as("c"))
      .select(col("__id"), explode(arrays_zip(col("a"), col("b"), col("c"))).as("z"))
      .select(col("__id"),
        col("z.a").as("w1"), col("z.b").as("w2"), col("z.c").as("w3"))
    // ONE corpus aggregation: the trigram count table is materialized
    // once and every lower-order table DERIVES from it by exact integer
    // re-aggregation (c12(w1,w2) = Σ_w3 c123, c23/c2/c3/N likewise) —
    // before, each of the five count tables and the totals re-ran the
    // tokenize+slice+explode pipeline over the corpus (the r16 plan
    // audit counted 18 source scans / 54 exchanges in this one query).
    // The interpolated probability is then evaluated once per DISTINCT
    // trigram over the derived tables (all trigram-vocabulary-bounded)
    // and joined back to the corpus-sized stream in a single join —
    // identical integer counts → identical doubles → identical rounded
    // terms, and dsum is a commutative decimal sum, so the result is
    // bit-identical to the old five-join plan.
    val c123 = graft.util.Materialize.eager(
      tri.groupBy(col("w1"), col("w2"), col("w3")).agg(count(lit(1)).as("c123")))
    val c12 = c123.groupBy(col("w1"), col("w2")).agg(sum(col("c123")).as("c12"))
    val c23 = c123.groupBy(col("w2"), col("w3")).agg(sum(col("c123")).as("c23"))
    val c2 = c123.groupBy(col("w2")).agg(sum(col("c123")).as("c2"))
    val c3 = c123.groupBy(col("w3")).agg(sum(col("c123")).as("c3"))
    val n = c123.agg(sum(col("c123")).as("n"))
    val vocab = tok.select(explode(col("__t")).as("w"))
      .agg(countDistinct(col("w")).as("v"))
    val p =
      lit(l3) * ((col("c123") + lit(1L)).cast(DoubleType) / (col("c12") + col("v")).cast(DoubleType)) +
        lit(l2) * ((col("c23") + lit(1L)).cast(DoubleType) / (col("c2") + col("v")).cast(DoubleType)) +
        lit(l1) * ((col("c3") + lit(1L)).cast(DoubleType) / (col("n") + col("v")).cast(DoubleType))
    val lp = round(-log(p), 6)
    val score = c123
      .join(c12, Seq("w1", "w2"))
      .join(c23, Seq("w2", "w3"))
      .join(c2, Seq("w2"))
      .join(c3, Seq("w3"))
      .crossJoin(broadcast(n))
      .crossJoin(broadcast(vocab))
      .select(col("w1"), col("w2"), col("w3"), lp.as("__lp"))
    tri.join(score, Seq("w1", "w2", "w3"))
      .groupBy(col("__id"))
      .agg(count(lit(1)).as("n_trigrams"), dsum(col("__lp")).as("s"))
      .select(col("__id"), col("n_trigrams"),
        (col("s") / col("n_trigrams").cast(DoubleType)).as("xent"))
  }
}
