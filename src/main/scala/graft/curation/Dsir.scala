package graft.curation

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.relational.RelationalQueries.dsum
import graft.text.Collocations.bigramsOf
import graft.text.TextFunctions.md5Long

/** DSIR-style data selection: importance weights from hashed n-gram
  * bag models (Xie et al., "Data Selection for Language Models via
  * Importance Resampling", 2023 — public algorithm). A small trusted
  * slice of the corpus defines the TARGET distribution; every document
  * is scored by how much more likely its hashed features are under the
  * target model than under the raw-corpus model, and the top-scoring
  * documents are selected. This is the standard way to tilt a web-scale
  * crawl toward a quality domain without training a classifier.
  *
  * Scale shape (100 TB): features hash into `numBuckets` (default 2¹⁰)
  * buckets, so both "language models" are fixed-size tables no matter
  * the corpus — built with one map-side-combined groupBy each, joined
  * back by broadcast. Per-document scoring is one more partial-agg
  * groupBy over (doc, bucket) pairs; nothing driver-side, nothing
  * proportional to vocabulary. Top-n is the two-stage exact rank.
  *
  * Determinism contract: the per-bucket log ratio is a ± combination
  * of `ln` over exact integers (Laplace-smoothed counts), rounded to 6
  * decimals; per-document accumulation multiplies it by an integer
  * bucket count and sums in DECIMAL(18,6) (commutative — order-free),
  * so the score is bit-identical in DuckDB.
  */
object Dsir {

  /** Hashed unigram+bigram features of a token array, as bucket ids in
    * `[0, numBuckets)`. md5-based so the DuckDB oracle replays it. */
  def featureBuckets(toks: Column, numBuckets: Int): Column =
    transform(concat(toks, bigramsOf(toks)), f => md5Long(f) % numBuckets)

  /** Importance score per document: mean over the document's hashed
    * features of `ln p_target(b) − ln p_raw(b)`, both models Laplace-
    * smoothed over the bucket space. Documents with no tokens are
    * dropped (no features → no rows). Higher = more target-like.
    *
    * @param isTarget predicate over `docs` rows choosing the trusted
    *                 slice that defines the target distribution
    * @return (doc_id-named by `id`, n_feats, score)
    */
  def importanceScores(docs: DataFrame, id: Column, toks: Column,
      isTarget: Column, numBuckets: Int = 1024): DataFrame = {
    require(numBuckets > 0)
    // stage the token array as a bound column FIRST (the TextFunctions
    // *Of contract): featureBuckets references its input ~6× inside
    // interpreted HOFs, so an unstaged expression would re-tokenize
    // every document once per reference
    val b = docs.select(id.as("__id"), isTarget.as("__tgt"), toks.as("__t"))
      .select(col("__id"), col("__tgt"),
        explode(featureBuckets(col("__t"), numBuckets)).as("bucket"))
    // ONE corpus pass builds the whole model: per-bucket raw counts and
    // target counts come out of the same materialized aggregate (the
    // target count is the Σ of the 0/1 target flag, exactly the old
    // filtered count with missing buckets already at 0 — the na.fill),
    // and the totals re-aggregate its ≤ numBuckets rows. Before, raw /
    // tgt / totals each re-ran tokenize+featureBuckets+explode over the
    // corpus (4 source scans incl. the scoring pass; now 2).
    val g = graft.util.Materialize.eager(
      b.groupBy(col("bucket")).agg(
        count(lit(1)).as("c_raw"),
        sum(col("__tgt").cast("long")).as("c_tgt")))
    val totals = g.agg(
      sum(col("c_raw")).as("n_raw"),
      sum(col("c_tgt")).as("n_tgt"))

    // fixed-size model table: numBuckets rows, broadcast back
    val lr = g
      .crossJoin(broadcast(totals))
      .select(col("bucket"), round(
        log((col("c_tgt") + 1L).cast(DoubleType)) -
          log((col("n_tgt") + numBuckets).cast(DoubleType)) -
          log((col("c_raw") + 1L).cast(DoubleType)) +
          log((col("n_raw") + numBuckets).cast(DoubleType)), 6).as("lr"))

    b.groupBy(col("__id"), col("bucket")).agg(count(lit(1)).as("c"))
      .join(broadcast(lr), Seq("bucket"))
      .groupBy(col("__id"))
      .agg(sum(col("c")).as("n_feats"),
        round(dsum(col("c").cast(DoubleType) * col("lr")) /
          sum(col("c")).cast(DoubleType), 6).as("score"))
  }

  /** The staged (doc, bucket) feature stream. */
  private def featuresOf(docs: DataFrame, id: Column, toks: Column,
      isTarget: Column, numBuckets: Int): DataFrame =
    docs.select(id.as("__id"), isTarget.as("__tgt"), toks.as("__t"))
      .select(col("__id"), col("__tgt"),
        explode(featureBuckets(col("__t"), numBuckets)).as("bucket"))

  /** Train the DSIR model ONCE and persist the frozen per-bucket
    * log-ratio table under `modelDir` — the full `[0, numBuckets)`
    * domain, so a LIVE feed hashing into a bucket the training corpus
    * never produced still scores the Laplace-smoothed zero-count
    * ratio instead of silently dropping the feature. Scoring (batch
    * or per-micro-batch) is then one groupBy + one broadcast join
    * against a fixed-size artifact — the
    * [[LangModel.trainBigramModel]] pattern for data selection. */
  def trainDsirModel(docs: DataFrame, id: Column, toks: Column,
      isTarget: Column, numBuckets: Int, modelDir: String): Unit = {
    val b = featuresOf(docs, id, toks, isTarget, numBuckets)
    // one corpus pass, as [[importanceScores]]: raw/target counts from
    // one materialized per-bucket aggregate, totals derived from it
    val g = graft.util.Materialize.eager(
      b.groupBy(col("bucket")).agg(
        count(lit(1)).as("c_raw"),
        sum(col("__tgt").cast("long")).as("c_tgt")))
    val totals = g.agg(
      sum(col("c_raw")).as("n_raw"),
      sum(col("c_tgt")).as("n_tgt"))
    val domain = docs.sparkSession.range(numBuckets)
      .select(col("id").as("bucket"))
    domain.join(g, Seq("bucket"), "left")
      .na.fill(0L, Seq("c_raw", "c_tgt"))
      .crossJoin(broadcast(totals))
      .select(col("bucket"), round(
        log((col("c_tgt") + 1L).cast(DoubleType)) -
          log((col("n_tgt") + numBuckets).cast(DoubleType)) -
          log((col("c_raw") + 1L).cast(DoubleType)) +
          log((col("n_raw") + numBuckets).cast(DoubleType)), 6).as("lr"))
      .write.mode("overwrite").parquet(s"$modelDir/lr")
  }

  /** Score a doc frame against a [[trainDsirModel]] artifact —
    * identical output to [[importanceScores]] when scoring the
    * training corpus itself (the persisted table carries the same
    * smoothed ratios for every bucket the corpus produced). */
  def scoreDsirModel(docs: DataFrame, id: Column, toks: Column,
      modelDir: String, numBuckets: Int = 1024): DataFrame = {
    val lr = docs.sparkSession.read.parquet(s"$modelDir/lr")
    scoreAgainst(docs, id, toks, numBuckets, lr)
  }

  private def scoreAgainst(docs: DataFrame, id: Column, toks: Column,
      numBuckets: Int, lr: DataFrame): DataFrame =
    featuresOf(docs, id, toks, lit(false), numBuckets)
      .groupBy(col("__id"), col("bucket")).agg(count(lit(1)).as("c"))
      .join(broadcast(lr), Seq("bucket"))
      .groupBy(col("__id"))
      .agg(sum(col("c")).as("n_feats"),
        round(dsum(col("c").cast(DoubleType) * col("lr")) /
          sum(col("c")).cast(DoubleType), 6).as("score"))

  /** GATE a live document stream on target-likeness: per micro-batch,
    * score against the frozen [[trainDsirModel]] artifact and append
    * only documents with `score >= threshold` to `outDir` — DSIR as a
    * FILTER instead of a global top-n, because a per-document
    * threshold decomposes over micro-batches (the union of gated
    * batches equals the batch filter exactly — q127's adjudicated
    * identity — where a global top-n would not). The frozen ratio
    * table is read and pinned once across batches. Blocks until the
    * AvailableNow drain finishes. */
  def gateStream(stream: DataFrame, id: Column, toks: Column,
      modelDir: String, numBuckets: Int, threshold: Double,
      outDir: String, checkpointDir: String): Unit = {
    val lr = stream.sparkSession.read.parquet(s"$modelDir/lr")
    // spread = false: the gate's per-row work (tokenize + bucket hash +
    // one tiny broadcast join) is too light to amortize the spread's
    // exchange — measured ~+0.7s per drain at sf0.1 (docs/PERF.md r14)
    graft.streaming.ScoreStream.replay(stream, Seq(lr), outDir,
      checkpointDir, spread = false)(batch =>
      scoreAgainst(batch, id, toks, numBuckets, lr)
        .filter(col("score") >= threshold))
  }

  /** Top-`n` target-like documents by [[importanceScores]], ranked
    * (score desc, id) with the two-stage exact top-n. */
  def select(docs: DataFrame, id: Column, toks: Column, isTarget: Column,
      n: Int, numBuckets: Int = 1024): DataFrame = {
    require(n > 0)
    val scored = importanceScores(docs, id, toks, isTarget, numBuckets)
    graft.util.TopN.exact(scored, Seq.empty,
        Seq(col("score").desc, col("__id")), n)
      .select(col("rank"), col("__id"), col("n_feats"), col("score"))
  }

  /** Importance RESAMPLING — the paper's actual sampling step, not the
    * deterministic head: draw `n` documents without replacement with
    * probability ∝ exp(score/T) via the Gumbel-top-n trick
    * (Gumbel-max: argmax(logw_i + G_i) is a draw ∝ w; taking the top n
    * keys is a without-replacement sample — one pass, no sequential
    * draw, so it distributes as a plain top-n). The Gumbel noise is
    * DETERMINISTIC: u = md5(id)/2³² and G = −ln(−ln u), so the sample
    * is reproducible and the DuckDB oracle replays it exactly —
    * "random" here means md5-equidistributed, the same contract as
    * every deterministic sampler in [[Sampling]].
    *
    * @param temperature flattens (>1) or sharpens (<1) the tilt
    * @return (rank, __id, score, key) — rank 1..n by (key desc, id)
    */
  def resample(docs: DataFrame, id: Column, toks: Column, isTarget: Column,
      n: Int, numBuckets: Int = 1024, temperature: Double = 1.0): DataFrame = {
    require(n > 0 && temperature > 0)
    val scored = importanceScores(docs, id, toks, isTarget, numBuckets)
    val u = md5Long(col("__id").cast(org.apache.spark.sql.types.StringType)) /
      lit(4294967296.0)
    val key = round(col("score") / lit(temperature) - log(-log(u)), 6)
    graft.util.TopN.exact(scored.withColumn("key", key), Seq.empty,
        Seq(col("key").desc, col("__id")), n)
      .select(col("rank"), col("__id"), col("score"), col("key"))
  }
}
