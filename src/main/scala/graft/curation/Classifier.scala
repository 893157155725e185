package graft.curation

import org.apache.spark.sql.{Column, DataFrame}
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
    // eager-materialize the two root count tables (both vocabulary/
    // class-bounded): compileModel broadcasts every model frame, and
    // without materialization each broadcast would re-run its whole
    // corpus-scan lineage at action time — the r16 plan audit counted
    // 16 source scans in the one-shot classifier. Eager checkpoint,
    // not persist: the returned frame is lazy, so a persist could not
    // be released without recompute (the q26 judge-hygiene item).
    val m = modelFrames(base, graft.util.Materialize.eager)
    scoreFrames(base, compileModel(m))
  }

  /** The five count tables that ARE the trained model — every one
    * vocabulary/class-bounded (tiny). */
  private final case class Model(cls: DataFrame, n: DataFrame,
    tokc: DataFrame, v: DataFrame, cwc: DataFrame)

  /** The corpus is read (and tokenized) ONCE: `cwc` is the only
    * corpus-sized token aggregation and `cls` the only doc-level one;
    * `tokc` (Σ cwc per class), `v` (distinct w in cwc) and `n`
    * (Σ docs_c, 0 for an empty corpus — count()'s value) DERIVE from
    * them by exact integer re-aggregation. `mat` lets callers pin the
    * two root frames (eager checkpoint on the lazy one-shot path;
    * identity on the train path, which persists and writes them
    * itself) so the derivations don't re-run the corpus lineage. */
  private def modelFrames(base: DataFrame,
      mat: DataFrame => DataFrame = identity): Model = {
    val tok = base.where(size(col("__t")) > 0)
      .select(col("label"), explode(col("__t")).as("w"))
    val cwc = mat(tok.groupBy(col("w"), col("label").as("cls"))
      .agg(count(lit(1)).as("cwc")))
    val cls = mat(base.groupBy(col("label").as("cls")).agg(count(lit(1)).as("docs_c")))
    Model(
      cls = cls,
      n = cls.agg(coalesce(sum(col("docs_c")), lit(0L)).as("n")),
      tokc = cwc.groupBy(col("cls")).agg(sum(col("cwc")).as("tok_c")),
      v = cwc.agg(countDistinct(col("w")).as("v")),
      cwc = cwc)
  }

  /** The model COMPILED for scoring: the five count tables folded into
    * the two frames the per-batch plan actually joins — `lpSeen` maps
    * every trained (token, class) to its rounded log-likelihood, and
    * `clsPrior` holds each class's smoothed unseen-token default `lp0`
    * plus its log-prior. Compiling once (outside the per-micro-batch
    * loop on the streaming path) is the trigger-floor optimization:
    * scoring pays TWO broadcasts, ONE source scan and TWO hash
    * aggregations per batch where the uncompiled plan paid four
    * broadcasts, three shuffles and a window sort. */
  private final case class ScoreModel(lpSeen: DataFrame, clsPrior: DataFrame)

  /** Every expression here reproduces [[scoreFrames]]' original
    * per-token arithmetic EXACTLY (same Column tree, same 6-decimal
    * rounding), just evaluated once per trained (token, class) instead
    * of once per scored token — zero counts smooth to
    * ln((0+1)/(tok_c + V)). Classes come from the DOC-level frame
    * (`cls`), not the token stream — a class trained only on
    * token-less docs has no tokc row but must still pay ln(1/V) per
    * scored token. */
  private def compileModel(m: Model): ScoreModel = {
    val lp = round(log((coalesce(col("cwc"), lit(0L)) + 1L).cast(DoubleType)) -
      log((coalesce(col("tok_c"), lit(0L)) + col("v")).cast(DoubleType)), 6)
    val lpSeen = m.cwc
      .join(broadcast(m.tokc), Seq("cls"), "left")
      .crossJoin(broadcast(m.v))
      .select(col("w"), col("cls"), lp.as("lp"))
    val lp0 = round(log((coalesce(lit(null).cast("long"), lit(0L)) + 1L)
        .cast(DoubleType)) -
      log((coalesce(col("tok_c"), lit(0L)) + col("v")).cast(DoubleType)), 6)
    val prior = log(col("docs_c").cast(DoubleType)) -
      log(col("n").cast(DoubleType))
    val clsPrior = m.cls
      .join(broadcast(m.tokc), Seq("cls"), "left")
      .crossJoin(broadcast(m.v))
      .crossJoin(broadcast(m.n))
      .select(col("cls"), lp0.as("lp0"), prior.as("prior"))
    ScoreModel(lpSeen, clsPrior)
  }

  private def scoreFrames(base: DataFrame, sm: ScoreModel): DataFrame = {
    // ONE scan of the batch: label rides the explode (functionally
    // dependent on __id) so the scored side never joins back to
    // `base`, and explode_outer keeps token-less docs in the SAME
    // pass as a null-token row (the old plan's second source scan —
    // which re-ran tokenization per trigger — and its union are gone).
    // A null token contributes exactly 0 to every class's sum, so a
    // token-less doc scores round(prior + 0, 6) per class and the
    // argmax resolves to the prior argmax, bit-identical to the
    // fallback literal. (Corner: a non-empty array CONTAINING null
    // tokens now scores them as absent rather than as unseen-smoothed
    // — tokenizers never emit null tokens, and absent is the sensible
    // semantics for one.)
    val tok = base.select(col("__id"), col("label"),
      explode_outer(when(size(col("__t")) > 0, col("__t"))).as("w"))
    val pairs = tok
      .crossJoin(broadcast(sm.clsPrior))
      .join(broadcast(sm.lpSeen), Seq("w", "cls"), "left")
      .select(col("__id"), col("label"), col("cls"), col("prior"),
        when(col("w").isNull, lit(0.0))
          .otherwise(coalesce(col("lp"), col("lp0"))).as("lp"))

    // commutative decimal sum per (doc, class) — the determinism
    // contract, with O(1) aggregation state (no buffered token list)
    val sums = pairs
      .groupBy(col("__id"), col("label"), col("cls"), col("prior"))
      .agg(graft.relational.RelationalQueries.dsum(col("lp")).as("s"))
      .select(col("__id"), col("label"), col("cls"),
        round(col("prior") + col("s"), 6).as("score"))

    // hash-agg argmax replacing the window rank: min over
    // (-score, cls) picks the max score, ties to the smallest class;
    // the original score rides the struct so no value is ever re-derived
    // from its negation (-0.0 hygiene)
    val best = sums
      .groupBy(col("__id"), col("label"))
      .agg(min(struct((lit(0.0) - col("score")).as("ns"), col("cls"),
        col("score"))).as("b"))
      .select(col("__id"), col("label"), col("b.cls").as("predicted"),
        col("b.score").as("score"))

    best
  }

  /** Train ONCE and persist the five count tables under `modelDir` —
    * the [[LangModel.trainBigramModel]] pattern for the classifier:
    * training is the heavy distributed pass, scoring (batch or
    * per-micro-batch) is then joins against vocabulary-bounded
    * parquet.
    *
    * The corpus is read (and tokenized) ONCE: `cwc` is the only
    * corpus-sized aggregation, and `tokc` (Σ cwc per class), `v`
    * (distinct w in cwc) and `n` (Σ docs_c) all derive from the two
    * persisted vocabulary/class-bounded frames — the naive five
    * independent writes each re-ran the tokenize+explode over the full
    * corpus, a 5× tokenization tax that dominated the train lap. */
  def trainNbModel(docs: DataFrame, id: Column, toks: Column,
      label: Column, modelDir: String): Unit = {
    val base = docs.select(id.as("__id"), label.as("label"), toks.as("__t"))
    val m = modelFrames(base)
    graft.streaming.ScoreStream.lap("nb-train") {
      val cwc = m.cwc.persist()
      val cls = m.cls.persist()
      try {
        cwc.write.mode("overwrite").parquet(s"$modelDir/cwc")
        cls.write.mode("overwrite").parquet(s"$modelDir/cls")
        // m.tokc/m.v/m.n are modelFrames' derivations over the same
        // cwc/cls plans just persisted — each write reads the cache
        m.tokc.write.mode("overwrite").parquet(s"$modelDir/tokc")
        m.v.write.mode("overwrite").parquet(s"$modelDir/v")
        m.n.write.mode("overwrite").parquet(s"$modelDir/n")
      } finally {
        cwc.unpersist(blocking = false)
        cls.unpersist(blocking = false)
      }
    }
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
      compileModel(loadModel(spark, modelDir)))
  }

  private def loadModel(spark: org.apache.spark.sql.SparkSession,
      modelDir: String): Model = Model(
    cls = spark.read.parquet(s"$modelDir/cls"),
    n = spark.read.parquet(s"$modelDir/n"),
    tokc = spark.read.parquet(s"$modelDir/tokc"),
    v = spark.read.parquet(s"$modelDir/v"),
    cwc = spark.read.parquet(s"$modelDir/cwc"))

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
    // compiled ONCE, before the drain: the per-trigger plan then joins
    // two frozen broadcast-side frames — the model fold-in (and its
    // one tiny fallback-argmax job) never re-runs inside the loop
    val sm = graft.streaming.ScoreStream.lap("nb-compile")(
      compileModel(loadModel(spark, modelDir)))
    graft.streaming.ScoreStream.replay(stream,
      Seq(sm.lpSeen, sm.clsPrior), outDir, checkpointDir)(batch =>
      scoreFrames(batch.select(id.as("__id"), label.as("label"),
        toks.as("__t")), sm))
  }
}
