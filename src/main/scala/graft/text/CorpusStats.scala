package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.relational.RelationalQueries.dsum
import graft.text.TextFunctions.tokens

/** Corpus-health statistics over grouped document slices — the audit
  * surface a mixing pipeline reads before retuning source weights:
  * which sources drifted away from the corpus distribution, and which
  * stopped looking like natural language at all.
  *
  * Scale shape (100 TB): everything reduces through (group, term)
  * counts — one map-side-combined shuffle — then joins against a
  * vocabulary-bounded term table (left to AQE) and broadcast one-row
  * totals. Per-group outputs are group-cardinality-sized. Nothing
  * driver-side, nothing proportional to tokens.
  *
  * Determinism contract: `ln` only ever sees exact integer counts
  * (the [[graft.curation.LangModel]] contract), each ln-combination is
  * rounded to 6 decimals, and per-group accumulation happens in
  * DECIMAL(18,6) ([[graft.relational.RelationalQueries.dsum]]) — a
  * commutative, order-free sum that DuckDB replays bit-identically.
  */
object CorpusStats {

  /** Per-group KL divergence from the corpus unigram distribution:
    * `KL(p_g ‖ p) = Σ_t p_g(t) · ln(p_g(t) / p(t))` — how far each
    * slice's token mix has drifted from the whole. 0 = identical mix;
    * monitoring this per source/day is the standard drift alarm for a
    * training-data feed.
    *
    * Expansion used (all-integer ln arguments):
    * `Σ_t c_gt · round(ln c_gt − ln n_g − ln c_t + ln N, 6) / n_g`.
    *
    * @return (group, n_tokens, kl) — kl ≥ 0 up to rounding, rounded
    *         to 6 decimals, ordered by group
    */
  def klDrift(docs: DataFrame, group: Column, toks: Column): DataFrame = {
    val tok = docs.select(group.as("group"), explode(toks).as("term"))
    klDriftFromCounts(
      tok.groupBy(col("group"), col("term")).agg(count(lit(1)).as("c_gt")))
  }

  /** [[klDrift]]'s read-out over an already-aggregated
    * (group, term, c_gt) count table. The count table is the operator's
    * complete sufficient statistic and merges by commutative integer
    * sum — which is what lets a STREAMING accumulator
    * ([[graft.streaming.CountStream]]) feed this identical tail and
    * land the batch answer exactly. */
  def klDriftFromCounts(gt: DataFrame): DataFrame = {
    // the count table is groups × vocabulary bounded but its lineage
    // may be a full corpus pass (klDrift) or a store read (the q141
    // streaming read-out) — and it feeds FOUR consumers (g, t, n via
    // g, and the contribution join). Materialized once, the whole
    // read-out runs over the checkpointed table.
    val gtm = graft.util.Materialize.eager(gt)
    val g = gtm.groupBy(col("group")).agg(sum(col("c_gt")).as("n_g"))
    val t = gtm.groupBy(col("term")).agg(sum(col("c_gt")).as("c_t"))
    val n = g.agg(sum(col("n_g")).as("n"))
    val lnTerm = round(
      log(col("c_gt").cast(DoubleType)) - log(col("n_g").cast(DoubleType)) -
        log(col("c_t").cast(DoubleType)) + log(col("n").cast(DoubleType)), 6)
    gtm.join(t, Seq("term"))
      .join(broadcast(g), Seq("group"))
      .crossJoin(broadcast(n))
      .select(col("group"), col("n_g"),
        (col("c_gt").cast(DoubleType) * lnTerm).as("contrib"))
      .groupBy(col("group"), col("n_g"))
      .agg(round(dsum(col("contrib")) / col("n_g").cast(DoubleType), 6).as("kl"))
      .select(col("group"), col("n_g").as("n_tokens"), col("kl"))
      .orderBy(col("group"))
  }

  /** Per-document n-gram novelty: the fraction of a document's
    * DISTINCT k-shingles that appear in no other document — the
    * diversity/contribution signal dual to the dedup family (a doc can
    * be far from every single other doc yet still be assembled
    * entirely from corpus-common spans; low novelty catches that).
    *
    * Scale shape: distinct (doc, shingle) postings → one
    * map-side-combined df count → join back on the shingle key (AQE
    * sizes it) → per-doc ratio. Shingles stay strings here (the df
    * join needs exact identity, and the oracle replays strings); at
    * petabyte vocabularies hash them first — same plan, narrower key.
    *
    * @return (id-named column, n_shingles, novelty) — docs with < k
    *         tokens absent (callers left-join); novelty rounded to 6
    */
  def docNovelty(docs: DataFrame, id: Column, toks: Column, k: Int): DataFrame = {
    require(k >= 1)
    // deliberately NOT persisted: the postings feed only two branches
    // (df count + the join back), and an r16 interleaved A/B measured
    // the persist+eager variant SLOWER (1.65 → 1.93 s min) — caching
    // the corpus-sized exploded postings costs more than re-running
    // the shingle kernel once, locally and plausibly at scale (the
    // cache write is itself a full materialization of the postings)
    val sh = docs.select(id.as("__id"), toks.as("__t"))
      .select(col("__id"), explode(array_distinct(
        call_function("graft_shingles", col("__t"), lit(k)))).as("g"))
    val dfs = sh.groupBy(col("g")).agg(count(lit(1)).as("df"))
    sh.join(dfs, Seq("g"))
      .groupBy(col("__id"))
      .agg(count(lit(1)).as("n_shingles"),
        sum((col("df") === 1).cast("long")).as("__uniq"))
      .select(col("__id"), col("n_shingles"),
        round(col("__uniq").cast(DoubleType) /
          col("n_shingles").cast(DoubleType), 6).as("novelty"))
  }

  /** Cross-group content-overlap matrix: for every pair of groups
    * (sources, crawls, snapshots), how many winnowed span fingerprints
    * they share, and the overlap coefficient
    * `shared / min(|A|, |B|)`. The provenance audit behind source
    * weighting: two "independent" feeds sharing 40% of their local
    * spans are mirrors, and a mixing plan that counts them twice
    * double-weights their content.
    *
    * Scale shape (100 TB): fingerprints are the winnowing selection
    * over k-shingle hashes (the q74-proven construction, native
    * kernels), collapsed to DISTINCT (group, fp) — so the join key
    * space is span-vocabulary-sized, not token-sized. A fingerprint
    * present in g groups contributes g² pair rows; `maxGroupFreq`
    * drops fingerprints shared by more than that many groups
    * (ubiquitous template spans — already known-shared, and the blowup
    * term), bounding the self-join at |postings|·maxGroupFreq rows.
    * The DEFAULT is the scale-safe finite cap (the q25/q74/q95
    * discipline: the library default must be the 100 TB configuration);
    * pass `maxGroupFreq = Int.MaxValue` explicitly for an exact audit
    * over every fingerprint. Per-group sizes are a group-cardinality
    * frame joined back by broadcast.
    *
    * @return (grp_a, grp_b, n_shared, overlap) with grp_a < grp_b,
    *         overlap rounded to 6 decimals, ordered by (grp_a, grp_b)
    */
  /** Default [[groupOverlap]] cap: fingerprints shared across more
    * than this many groups are dropped from the pair join. */
  val DefaultMaxGroupFreq: Int = 15

  def groupOverlap(docs: DataFrame, group: Column, text: Column,
      shingleK: Int = 3, w: Int = 4,
      maxGroupFreq: Int = DefaultMaxGroupFreq): DataFrame = {
    // materialized once: the distinct (group, fingerprint) postings
    // feed FOUR consumers (sizes, the group-frequency cap, and both
    // sides of the self-join) — unmaterialized, each re-ran the
    // tokenize+shingle+winnow kernels over the corpus (4 source scans
    // in the r16 plan audit; now 1)
    val fps = graft.util.Materialize.eager(
      docs.select(group.as("grp"), tokens(text).as("t"))
        .select(col("grp"), explode(call_function("graft_winnow",
          call_function("graft_shingles", col("t"), lit(shingleK)), lit(w))).as("fp"))
        .distinct())
    val sizes = fps.groupBy(col("grp")).agg(count(lit(1)).as("n_fp"))
    val joinable =
      if (maxGroupFreq == Int.MaxValue) fps
      else fps.join(
        fps.groupBy(col("fp")).agg(count(lit(1)).as("gf"))
          .filter(col("gf") <= maxGroupFreq).select(col("fp")), "fp")
    joinable.as("x").join(joinable.as("y"), col("x.fp") === col("y.fp"))
      .filter(col("x.grp") < col("y.grp"))
      .groupBy(col("x.grp").as("grp_a"), col("y.grp").as("grp_b"))
      .agg(count(lit(1)).as("n_shared"))
      .join(broadcast(sizes.select(col("grp").as("grp_a"), col("n_fp").as("n_a"))), Seq("grp_a"))
      .join(broadcast(sizes.select(col("grp").as("grp_b"), col("n_fp").as("n_b"))), Seq("grp_b"))
      .select(col("grp_a"), col("grp_b"), col("n_shared"),
        round(col("n_shared").cast(DoubleType) /
          least(col("n_a"), col("n_b")).cast(DoubleType), 6).as("overlap"))
      .orderBy(col("grp_a"), col("grp_b"))
  }

  /** Per-group Zipf exponent: the OLS slope of `ln freq` on `ln rank`
    * over the group's token frequency spectrum (ranked by freq desc,
    * then term). Natural language sits near −1; template/boilerplate
    * slices flatten toward 0 and near-random token streams fall off a
    * cliff — a one-number "does this source still look like language"
    * check.
    *
    * Closed form, decimal sums: slope =
    * `(n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)` with x = round(ln rank, 6),
    * y = round(ln freq, 6), every Σ a [[dsum]]. Groups with < 2
    * distinct terms (or a degenerate all-equal spectrum) return null.
    *
    * @return (group, n_terms, zipf_slope) ordered by group
    */
  def zipfSlope(docs: DataFrame, group: Column, toks: Column): DataFrame = {
    val tok = docs.select(group.as("group"), explode(toks).as("term"))
    val freq = tok.groupBy(col("group"), col("term")).agg(count(lit(1)).as("freq"))
    val w = Window.partitionBy(col("group"))
      .orderBy(col("freq").desc, col("term"))
    val xy = freq
      .withColumn("rank", row_number().over(w))
      .select(col("group"),
        round(log(col("rank").cast(DoubleType)), 6).as("x"),
        round(log(col("freq").cast(DoubleType)), 6).as("y"))
    xy.groupBy(col("group"))
      .agg(count(lit(1)).as("n_terms"),
        dsum(col("x")).as("sx"), dsum(col("y")).as("sy"),
        dsum(col("x") * col("y")).as("sxy"), dsum(col("x") * col("x")).as("sxx"))
      .select(col("group"), col("n_terms"),
        when(col("n_terms") < 2 ||
            col("n_terms").cast(DoubleType) * col("sxx") - col("sx") * col("sx") === 0.0,
          lit(null).cast(DoubleType))
          .otherwise(round(
            (col("n_terms").cast(DoubleType) * col("sxy") - col("sx") * col("sy")) /
              (col("n_terms").cast(DoubleType) * col("sxx") - col("sx") * col("sx")), 6))
          .as("zipf_slope"))
      .orderBy(col("group"))
  }
}
