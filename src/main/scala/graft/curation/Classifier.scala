package graft.curation

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Corpus-trained document classification — the fasttext/CCNet-style
  * pipeline classifier (domain routing, quality bucketing, source
  * attribution) as a closed-form model the engine trains AND applies
  * in one pass, with no external model artifact.
  *
  * The model is multinomial Naive Bayes with add-one smoothing:
  * `score(d, c) = ln P(c) + Σ_w ln P(w | c)` with
  * `P(w|c) = (count(w,c) + 1) / (tokens_c + V)` over the joint
  * vocabulary. Closed-form counts — not SGD — because every quantity
  * is an integer aggregate: training is two hash aggregations, and the
  * scores are exactly reproducible in any engine (the DuckDB oracle
  * replays them bit-for-bit), which no iteratively-trained model gives.
  *
  * Scale shape (100 TB): training collapses to vocabulary-bounded
  * tables — per-(token, class) counts (one shuffle, map-side partial
  * agg), per-class token totals and doc counts (tiny), vocabulary size
  * (one row). Scoring re-joins the token stream to the count table on
  * the token key (AQE broadcasts it when small; Heaps' law keeps it
  * far below corpus size) and folds per (doc, class) — one shuffle,
  * state bounded by documents × classes. No driver-side collect.
  *
  * Determinism contract (the [[LangModel]] discipline): every log
  * argument is an exact integer (`count + 1`, `tokens_c + V`,
  * `docs_c`, `N`), each token's log-likelihood rounds to 6 decimals
  * at the term and the per-(doc, class) sum runs in DECIMAL(18,6) —
  * commutative and exact, so partitioning/order-free with O(1)
  * aggregation state per (doc, class) — and the final score rounds to
  * 6 decimals before the argmax; class ties break lexicographically.
  */
object Classifier {

  /** Train on `docs` (each row labeled `label`) and score every doc
    * against every class, keeping the argmax.
    *
    * Output: `(__id, label, predicted, score)` — one row per input
    * document; `score` is the winning class's rounded log-posterior
    * (up to the constant evidence term). Documents with no tokens get
    * the prior-only argmax. Self-classification (train = score corpus)
    * is the pipeline shape: confidently-misrouted documents — label ≠
    * predicted with a large margin — are the mislabel/contamination
    * audit surface.
    */
  def naiveBayes(docs: DataFrame, id: Column, toks: Column,
      label: Column): DataFrame = {
    val base = docs.select(id.as("__id"), label.as("label"), toks.as("__t"))
    val m = modelFrames(base)
    scoreFrames(base, m)
  }

  /** The five count tables that ARE the trained model — every one
    * vocabulary/class-bounded (tiny). */
  private final case class Model(cls: DataFrame, n: DataFrame,
    tokc: DataFrame, v: DataFrame, cwc: DataFrame)

  private def modelFrames(base: DataFrame): Model = {
    val tok = base.where(size(col("__t")) > 0)
      .select(col("label"), explode(col("__t")).as("w"))
    Model(
      cls = base.groupBy(col("label").as("cls")).agg(count(lit(1)).as("docs_c")),
      n = base.agg(count(lit(1)).as("n")),
      tokc = tok.groupBy(col("label").as("cls")).agg(count(lit(1)).as("tok_c")),
      v = tok.agg(countDistinct(col("w")).as("v")),
      cwc = tok.groupBy(col("w"), col("label").as("cls"))
        .agg(count(lit(1)).as("cwc")))
  }

  private def scoreFrames(base: DataFrame, m: Model): DataFrame = {
    val tok = base.where(size(col("__t")) > 0)
      .select(col("__id"), explode(col("__t")).as("w"))
    val (cls, n, tokc, v, cwc) = (m.cls, m.n, m.tokc, m.v, m.cwc)

    // dense (doc token × class) log-likelihoods: zero counts smooth to
    // ln((0+1)/(tok_c + V)), so the left joins' nulls ARE the model.
    // Classes come from the DOC-level frame (`cls`), not the token
    // stream — a class trained only on token-less docs has no tokc row
    // but must still pay ln(1/V) per scored token; deriving classes
    // from tokc would silently give it prior-only scores, which win
    // the argmax over every real (negative-likelihood) class.
    val lp = round(log((coalesce(col("cwc"), lit(0L)) + 1L).cast(DoubleType)) -
      log((coalesce(col("tok_c"), lit(0L)) + col("v")).cast(DoubleType)), 6)
    val pairs = tok.select(col("__id"), col("w"))
      .crossJoin(broadcast(cls.select(col("cls"))))
      .join(broadcast(tokc), Seq("cls"), "left")
      .crossJoin(broadcast(v))
      .join(broadcast(cwc), Seq("w", "cls"), "left")
      .select(col("__id"), col("cls"), lp.as("lp"))

    // commutative decimal sum per (doc, class) — the determinism
    // contract, with O(1) aggregation state (no buffered token list)
    val sums = pairs
      .groupBy(col("__id"), col("cls"))
      .agg(graft.relational.RelationalQueries.dsum(col("lp")).as("s"))

    val prior = log(col("docs_c").cast(DoubleType)) - log(col("n").cast(DoubleType))
    val scored = base.select(col("__id"), col("label"))
      .crossJoin(broadcast(cls))
      .crossJoin(broadcast(n))
      .join(sums, Seq("__id", "cls"), "left")
      .select(col("__id"), col("label"), col("cls"),
        round(prior + coalesce(col("s"), lit(0.0)), 6).as("score"))

    val rank = Window.partitionBy(col("__id"))
      .orderBy(col("score").desc, col("cls"))
    scored
      .withColumn("__rn", row_number().over(rank))
      .where(col("__rn") === 1)
      .select(col("__id"), col("label"), col("cls").as("predicted"), col("score"))
  }

  /** Train ONCE and persist the five count tables under `modelDir` —
    * the [[LangModel.trainBigramModel]] pattern for the classifier:
    * training is the heavy distributed pass, scoring (batch or
    * per-micro-batch) is then joins against vocabulary-bounded
    * parquet. */
  def trainNbModel(docs: DataFrame, id: Column, toks: Column,
      label: Column, modelDir: String): Unit = {
    val base = docs.select(id.as("__id"), label.as("label"), toks.as("__t"))
    val m = modelFrames(base)
    m.cls.write.mode("overwrite").parquet(s"$modelDir/cls")
    m.n.write.mode("overwrite").parquet(s"$modelDir/n")
    m.tokc.write.mode("overwrite").parquet(s"$modelDir/tokc")
    m.v.write.mode("overwrite").parquet(s"$modelDir/v")
    m.cwc.write.mode("overwrite").parquet(s"$modelDir/cwc")
  }

  /** Score a doc frame against a [[trainNbModel]] artifact. `label` is
    * a passthrough column for audit joins (use `lit(null)` for an
    * unlabeled feed); tokens the model never saw smooth by add-one,
    * so the scored frame need not be the training corpus. Identical
    * output to [[naiveBayes]] when scoring the training corpus. */
  def scoreNbModel(docs: DataFrame, id: Column, toks: Column,
      label: Column, modelDir: String): DataFrame = {
    val spark = docs.sparkSession
    scoreFrames(docs.select(id.as("__id"), label.as("label"), toks.as("__t")),
      Model(
        cls = spark.read.parquet(s"$modelDir/cls"),
        n = spark.read.parquet(s"$modelDir/n"),
        tokc = spark.read.parquet(s"$modelDir/tokc"),
        v = spark.read.parquet(s"$modelDir/v"),
        cwc = spark.read.parquet(s"$modelDir/cwc")))
  }

  /** Score a LIVE document stream against a persisted [[trainNbModel]]
    * artifact — per-micro-batch [[scoreNbModel]] via `foreachBatch`,
    * appending to `outDir` (the incremental-dedup pattern; the union
    * of batch outputs equals batch scoring exactly because the model
    * is frozen and scoring is per-document — adjudicated by q122).
    * Blocks until the AvailableNow drain finishes. */
  def scoreNbStream(stream: DataFrame, id: Column, toks: Column,
      label: Column, modelDir: String, outDir: String,
      checkpointDir: String): Unit = {
    val spark = stream.sparkSession
    val m = Model(
      cls = spark.read.parquet(s"$modelDir/cls"),
      n = spark.read.parquet(s"$modelDir/n"),
      tokc = spark.read.parquet(s"$modelDir/tokc"),
      v = spark.read.parquet(s"$modelDir/v"),
      cwc = spark.read.parquet(s"$modelDir/cwc"))
    graft.streaming.ScoreStream.replay(stream,
      Seq(m.cls, m.n, m.tokc, m.v, m.cwc), outDir, checkpointDir)(batch =>
      scoreFrames(batch.select(id.as("__id"), label.as("label"),
        toks.as("__t")), m))
  }
}
