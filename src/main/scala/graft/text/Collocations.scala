package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType, StringType}

/** Collocation mining — corpus-wide pointwise mutual information over
  * adjacent token pairs. The curation-pipeline use: surfacing
  * multi-word expressions ("new york", "machine learning") for
  * tokenizer vocabulary audits, boilerplate detection (a top-PMI pair
  * that appears in thousands of documents is template text), and
  * phrase-aware dedup shingling.
  *
  * Scale shape (100 TB): bigram and unigram counts are each one
  * shuffle with map-side partial aggregation (counts collapse per
  * input partition before moving). The `minCount` support filter is
  * applied to the bigram table BEFORE any join, so the joins back to
  * unigram counts move only surviving collocation candidates — a tiny
  * fraction of the vocabulary² space — and the corpus totals ride in
  * as broadcast one-row frames. Top-k is the two-stage exact pattern
  * (per-partition prune to k, then one global rank over ≤ k·P rows),
  * so no executor sorts the full candidate set.
  *
  * Determinism contract (see [[graft.curation.LangModel]]): every `ln`
  * argument is an exact integer count, PMI is a ± combination of such
  * lns rounded to 6 decimals before ranking, and rank ties break on
  * the pair text — bit-identical in any IEEE-754 engine.
  */
object Collocations {

  /** Adjacent-pair array of a token array: `["a","b","c"]` →
    * `["a b","b c"]`. Tokens come from whitespace splits so the
    * space-joined pair is collision-free. */
  def bigramsOf(toks: Column): Column =
    when(size(toks) < 2, array().cast(ArrayType(StringType)))
      .otherwise(zip_with(
        slice(toks, lit(1), size(toks) - 1),
        slice(toks, lit(2), size(toks) - 1),
        (a, b) => concat(a, lit(" "), b)))

  /** Top-`k` adjacent token pairs by PMI with support ≥ `minCount`.
    *
    * PMI = ln( p(x,y) / (p(x)·p(y)) ) with p(x,y) over the bigram
    * stream (N_bi positions) and p(x) over the token stream (N_uni
    * positions):
    *
    *   pmi = ln c_xy + 2·ln N_uni − ln N_bi − ln c_x − ln c_y
    *
    * — every ln argument an exact integer, so the double is
    * reproducible cross-engine (rounded to 6 decimals before the
    * rank).
    *
    * @param toks tokenization of each document (array<string>)
    * @return (rank, x, y, pair_count, pmi) — rank 1..k by
    *         (pmi desc, x, y)
    */
  def pmiTopK(docs: DataFrame, toks: Column, minCount: Long, k: Int): DataFrame = {
    require(minCount >= 1 && k > 0)
    val tok = docs.select(toks.as("__t"))
    // both count tables are materialized once (vocabulary-bounded):
    // uni feeds three downstream consumers (nUni + the x/y joins) and
    // bi two (nBi + the candidate filter) — unmaterialized, each
    // consumer re-ran its tokenize+explode corpus pass (5 source scans
    // in the r16 plan audit; now 2, the structural floor: unigram and
    // bigram streams are different explosions of the token array)
    val uni = graft.util.Materialize.eager(
      tok.select(explode(col("__t")).as("term"))
        .groupBy(col("term")).agg(count(lit(1)).as("c_term")))
    val nUni = uni.agg(sum(col("c_term")).as("n_uni"))
    val bi = graft.util.Materialize.eager(
      tok.select(explode(bigramsOf(col("__t"))).as("pair"))
        .groupBy(col("pair")).agg(count(lit(1)).as("pair_count")))
    val nBi = bi.agg(sum(col("pair_count")).as("n_bi"))

    // support-filter FIRST: everything downstream is candidate-sized
    val cands = bi.where(col("pair_count") >= minCount)
      .withColumn("x", split(col("pair"), " ").getItem(0))
      .withColumn("y", split(col("pair"), " ").getItem(1))

    val pmi = round(
      log(col("pair_count").cast(DoubleType)) +
        lit(2.0) * log(col("n_uni").cast(DoubleType)) -
        log(col("n_bi").cast(DoubleType)) -
        log(col("c_x").cast(DoubleType)) -
        log(col("c_y").cast(DoubleType)), 6)

    val scored = cands
      .join(uni.withColumnRenamed("term", "x").withColumnRenamed("c_term", "c_x"), Seq("x"))
      .join(uni.withColumnRenamed("term", "y").withColumnRenamed("c_term", "c_y"), Seq("y"))
      .crossJoin(broadcast(nUni)).crossJoin(broadcast(nBi))
      .select(col("x"), col("y"), col("pair_count"), pmi.as("pmi"))

    graft.util.TopN.exact(scored, Seq.empty,
        Seq(col("pmi").desc, col("x"), col("y")), k)
      .select(col("rank"), col("x"), col("y"), col("pair_count"), col("pmi"))
  }
}
