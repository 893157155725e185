package graft.curation

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.text.TextFunctions._

/** Sequence packing and rule-based quality filtering — the two
  * curation steps between "scored documents" and "training batches".
  *
  * Packing follows the standard concat-then-chunk pretraining recipe:
  * documents are concatenated in a deterministic order and the token
  * stream is cut into fixed-length sequences; a document is addressed
  * by (sequence index, offset) of its first token. 100 TB shape:
  * packing is computed within independent SHARDS (hash of the doc id),
  * exactly how production pipelines shard their tokenized corpora — a
  * single global ordering would serialize the window into one
  * partition, while per-shard windows parallelize freely and each
  * shard's stream is self-contained. Deterministic: same docs → same
  * packs on any cluster/partitioning/retry.
  */
object Packing {

  /** Per-document packing position under concat-then-chunk: documents
    * ordered by `id` within `nShards` md5-derived shards; returns
    * (doc_id, shard, n_tokens, pack_id, offset) where pack_id/offset
    * locate the doc's first token in the shard's chunked stream.
    * One window shuffle on (shard, id) — no global sort. */
  def packPositions(docs: DataFrame, idCol: Column, tokenCountCol: Column,
      seqLen: Int, nShards: Int): DataFrame = {
    require(seqLen > 0 && nShards > 0, "seqLen and nShards must be positive")
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    docs.select(idCol.as("doc_id"), tokenCountCol.cast("long").as("n_tokens"),
        pmod(md5Long(idCol.cast("string"), 8), lit(nShards)).cast("int").as("shard"))
      .withColumn("cum_before", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .select(col("doc_id"), col("shard"), col("n_tokens"),
        floor(col("cum_before") / seqLen).as("pack_id"),
        (col("cum_before") % seqLen).as("offset"))
  }

  /** Per-(shard, pack) summary: docs starting in the pack and their
    * token mass — the shape a batch loader consumes. */
  def packSummary(positions: DataFrame): DataFrame =
    positions.groupBy(col("shard"), col("pack_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("tokens_started"))

  /** Packing-efficiency audit — the numbers you tune `seqLen`/`nShards`
    * with before a [[packTokens]] materialization: per shard, the doc
    * and token mass, the pack count `ceil(tokens / seqLen)`, and the
    * fill factor `tokens / (n_packs · seqLen)`. Concat-then-chunk
    * packing wastes tokens only in each shard's tail pack, so fill is
    * the padding bill directly; cross-shard token skew (compare the
    * per-shard rows) is the batch-balance bill. One groupBy over
    * shard-assigned counts — no window, no positions materialized,
    * cheaper than [[packPositions]] itself.
    *
    * @return (shard, n_docs, n_tokens, n_packs, fill) — fill rounded
    *         to 6, ordered by shard; token-less shards absent
    */
  def packingStats(docs: DataFrame, idCol: Column, tokenCountCol: Column,
      seqLen: Int, nShards: Int): DataFrame = {
    require(seqLen > 0 && nShards > 0, "seqLen and nShards must be positive")
    docs.select(tokenCountCol.cast("long").as("n_tokens"),
        pmod(graft.text.TextFunctions.md5Long(idCol.cast("string"), 8),
          lit(nShards)).cast("int").as("shard"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"))
      .select(col("shard"), col("n_docs"), col("n_tokens"),
        floor((col("n_tokens") + (seqLen - 1)) / seqLen).as("n_packs"),
        // a shard of only token-less docs has no packs: null, not 0/0
        when(col("n_tokens") === 0L, lit(null).cast("double"))
          .otherwise(round(col("n_tokens").cast("double") /
            (floor((col("n_tokens") + (seqLen - 1)) / seqLen) * seqLen)
              .cast("double"), 6)).as("fill"))
      .orderBy(col("shard"))
  }

  /** MATERIALIZE the packed training sequences: one row per
    * (shard, pack_id) holding exactly `seqLen` token ids (last pack of
    * each shard padded with `padId`), documents concatenated in doc-id
    * order with every token in place — the parquet a training loader
    * memory-maps, produced without ever assembling a shard's stream in
    * one task.
    *
    * `docs` must carry an `ids` array column (e.g.
    * [[graft.text.Bpe.encodeIds]]) whose length is the token count
    * used for [[packPositions]].
    *
    * Scale shape: the ONE token-sized stage is inherent — the output
    * IS the token stream — and it is a single shuffle: posexplode
    * tokens with their doc's absolute position (`pack_id·seqLen +
    * offset + i`, all per-row arithmetic), then one groupBy
    * (shard, pack) assembling each 4·seqLen-byte row via a sorted
    * collect. No window over the token stream, no driver collection;
    * pack rows are KBs regardless of corpus size. */
  def packTokens(docs: DataFrame, idCol: Column, idsCol: Column,
      seqLen: Int, nShards: Int, padId: Int = -1): DataFrame = {
    // packPositions projects the ids away, so join them back on doc_id
    // (docs-sized on both sides — a broadcast would be wrong here)
    val pos = packPositions(docs, idCol, size(idsCol), seqLen, nShards)
      .join(docs.select(idCol.as("doc_id"), idsCol.as("__ids")), "doc_id")
    val toks = pos.select(col("shard"),
        (col("pack_id") * seqLen + col("offset")).as("__start"),
        posexplode(col("__ids")).as(Seq("__i", "id")))
      .select(col("shard"), col("id"),
        floor((col("__start") + col("__i")) / seqLen).as("pack_id"),
        ((col("__start") + col("__i")) % seqLen).cast("int").as("slot"))
    toks.groupBy(col("shard"), col("pack_id"))
      .agg(transform(array_sort(collect_list(struct(col("slot"), col("id")))),
        s => s.getField("id")).as("__ids"))
      .select(col("shard"), col("pack_id"),
        concat(col("__ids"), array_repeat(lit(padId),
          lit(seqLen) - size(col("__ids")))).as("input_ids"))
  }

  /** Sliding-window chunking of each document into overlapping token
    * windows — the per-doc shape embedding/retrieval pipelines index
    * (window tokens per chunk, stride-sized steps, plus one tail chunk
    * so the final tokens are always covered). Pure per-row projection +
    * one generator: no shuffle, no state — any scale. Deterministic:
    * chunk starts are `0, stride, 2·stride, …` up to `len-window`, with
    * the tail start `len-window` appended when the stride doesn't land
    * on it exactly; a doc no longer than `window` yields one chunk.
    * Returns one row per chunk: (input cols…, chunk_idx, chunk_start,
    * chunk_text). */
  def slidingChunks(docs: DataFrame, textCol: String,
      window: Int, stride: Int): DataFrame = {
    require(window > 0 && stride > 0, "window and stride must be positive")
    // the input passes through col("*"): pre-existing output/temp names
    // would become ambiguous duplicates (or be silently overwritten) —
    // e.g. re-chunking already-chunked output at a different window
    val clash = docs.columns.toSet
      .intersect(Set("chunk_idx", "chunk_start", "chunk_text", "__toks", "__starts"))
    require(clash.isEmpty,
      s"input already has column(s) ${clash.mkString(", ")} — rename or drop before chunking")
    val toks = tokens(col(textCol))
    val last = greatest(size(toks) - window, lit(0)) // final chunk start
    val starts = concat(
      sequence(lit(0), last.cast("int"), lit(stride)),
      when(pmod(last, lit(stride)) =!= 0, array(last.cast("int")))
        .otherwise(array().cast("array<int>")))
    docs.withColumn("__toks", toks)
      .withColumn("__starts", starts)
      .select(col("*"),
        posexplode(col("__starts")).as(Seq("chunk_idx", "chunk_start")))
      .withColumn("chunk_text",
        array_join(slice(col("__toks"), col("chunk_start") + 1, lit(window)), " "))
      .drop("__toks", "__starts")
  }

  /** One quality rule: `reason` is attached when `bad` holds. */
  final case class QualityRule(reason: String, bad: Column)

  /** Gopher-style rule set over the engine's text statistics (public
    * heuristics: Rae et al. 2021 §A1.1 shapes — token-count bounds,
    * mean-word-length window, symbol-heaviness, stopword presence).
    * Thresholds are parameters, not dogma. `toks`/`ltoks` must be
    * staged token columns (the *Of contract). */
  def gopherRules(text: Column, toks: Column, ltoks: Column,
      minTokens: Int = 50, maxTokens: Int = 100000,
      minMeanLen: Double = 3.0, maxMeanLen: Double = 10.0,
      maxPunct: Double = 0.1, maxDigit: Double = 0.2): Seq[QualityRule] = Seq(
    QualityRule("too_few_tokens", size(toks) < minTokens),
    QualityRule("too_many_tokens", size(toks) > maxTokens),
    QualityRule("mean_word_len", meanTokenLen(text) < minMeanLen ||
      meanTokenLen(text) > maxMeanLen),
    QualityRule("punct_heavy", punctRatio(text) > maxPunct),
    QualityRule("digit_heavy", digitRatio(text) > maxDigit),
    QualityRule("no_stopwords",
      markerHitsOf(ltoks, LangMarkers.flatMap(_._2)) === 0))

  /** ADAPTIVE quality bounds: flag rows whose `valueCol` falls outside
    * the corpus' own [loQ, hiQ] percentile band — the statistics-driven
    * filter (outlier lengths, token counts, scores) that needs no
    * hand-tuned threshold and tracks the corpus as it shifts. Returns
    * the input plus `lo`/`hi` (the computed bounds, constant columns —
    * auditable in the output) and `within`.
    *
    * The bounds come from ONE exact-percentile aggregate whose result
    * is two doubles (model-sized; the filter itself is a map pass). The
    * exact percentile buffers the group's values, which is fine for the
    * single two-number aggregate here at test scale; at 100 TB derive
    * the two cutpoints from [[HistQuantiles.quantiles]] (two map-side-
    * combined passes, deterministic under any partitioning — unlike
    * `approx_percentile`'s order-dependent t-digest) and keep the
    * filter unchanged. */
  def percentileFilter(df: DataFrame, valueCol: String,
      loQ: Double, hiQ: Double): DataFrame = {
    require(loQ >= 0 && hiQ <= 1 && loQ <= hiQ, s"bad quantiles [$loQ, $hiQ]")
    val r = df.agg(
      expr(s"percentile($valueCol, array(${loQ}D, ${hiQ}D))").as("p")).head
    val bounds = r.getSeq[Double](0)
    df.withColumn("lo", lit(bounds(0))).withColumn("hi", lit(bounds(1)))
      .withColumn("within",
        col(valueCol) >= col("lo") && col(valueCol) <= col("hi"))
  }

  /** Apply a rule set: every row keeps/drops with machine-readable
    * reasons (dropped data is never silent — same contract as the
    * ingest quarantine). Pure projection: scales as a map pass. */
  def qualityFilter(docs: DataFrame, rules: Seq[QualityRule]): DataFrame = {
    val reasons = array_compact(array(rules.map(r =>
      when(r.bad, lit(r.reason))): _*))
    docs.withColumn("reasons", reasons)
      .withColumn("keep", size(col("reasons")) === 0)
  }
}
