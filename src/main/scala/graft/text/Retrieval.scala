package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Keyword retrieval over a document corpus — BM25 scoring with exact
  * top-k per query. The curation-pipeline face of retrieval: finding
  * the documents most relevant to a probe query (eval-set mining,
  * targeted decontamination, topic auditing) without an external index.
  *
  * Scale shape (100 TB): the token stream is filtered to the query
  * vocabulary IMMEDIATELY after the generator (a literal isin — codegen,
  * no shuffle), so everything downstream is proportional to matched
  * postings, not corpus tokens. Document frequencies and corpus stats
  * are query-vocabulary-bounded one-row/tiny frames joined back by
  * broadcast. Top-k is two-stage: a per-(query, input-partition) rank
  * prunes to k·P candidate rows before the single global per-query
  * rank, so no executor ever sorts a query's full posting list (the
  * union of per-partition top-k sets contains the global top-k under
  * the same total order, so the pruning is exact and deterministic).
  *
  * Determinism contract: BM25's arithmetic here uses only IEEE +,*,/
  * on identical operands (integer casts, exact binary constants 0.5 /
  * 0.25 / 0.75, and decimal literals that parse to the same double in
  * any engine), folded per document in term order; ln's cross-engine
  * last-ulp wobble (see [[graft.curation.LangModel]]) is absorbed by
  * rounding scores to 6 decimals BEFORE ranking, and ranking ties
  * break by doc id.
  */
object Retrieval {

  /** Exact BM25 top-k per query.
    *
    * @param queries (query_id, terms); terms are matched exactly
    *                against the tokenization given by `toks`.
    * @return (query_id, rank, __id, score) — rank 1..k by
    *         (score desc, __id), score rounded to 6 decimals.
    */
  def bm25TopK(docs: DataFrame, id: Column, toks: Column,
               queries: Seq[(String, Seq[String])], k: Int,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queries.nonEmpty && k > 0)
    val spark = docs.sparkSession
    import spark.implicits._

    val tok = docs.select(id.as("__id"), toks.as("__t"))
      .select(col("__id"), col("__t"), size(col("__t")).as("dl"))
    val stats = tok.agg(count(lit(1)).as("n"),
      (sum(col("dl")).cast(DoubleType) / count(lit(1))).as("avgdl"))
    val vocabulary = queries.flatMap(_._2).distinct
    val q = queries.flatMap { case (qid, ts) => ts.map(qid -> _) }
      .toDF("query_id", "term")

    // postings: matched (doc, term) term frequencies; dl rides along
    // (functionally dependent on __id, so grouping by it adds nothing)
    // materialized once: tf is query-vocabulary-sized (tiny) but its
    // lineage is a full corpus scan, and it feeds two consumers (the
    // df count and the scoring join) — unmaterialized, the corpus was
    // tokenized twice
    val tf = graft.util.Materialize.eager(tok
      .select(col("__id"), col("dl"), explode(col("__t")).as("term"))
      .where(col("term").isin(vocabulary: _*))
      .groupBy(col("__id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf")))
    val dfs = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))

    val idf = log(
      ((col("n") - col("df")).cast(DoubleType) + lit(0.5)) /
        (col("df").cast(DoubleType) + lit(0.5)) + lit(1.0))
    val tfNorm = (col("tf").cast(DoubleType) * lit(k1 + 1.0)) /
      (col("tf").cast(DoubleType) +
        lit(k1) * (lit(1.0 - b) + lit(b) * (col("dl").cast(DoubleType) / col("avgdl"))))
    val comp = tf
      .join(broadcast(dfs), Seq("term"))
      .crossJoin(broadcast(stats))
      .select(col("__id"), col("term"), (idf * tfNorm).as("sc"))

    val scored = comp
      .join(broadcast(q), Seq("term"))
      .groupBy(col("query_id"), col("__id"))
      .agg(sort_array(collect_list(struct(col("term"), col("sc")))).as("xs"))
      .select(col("query_id"), col("__id"),
        round(aggregate(col("xs"), lit(0.0),
          (acc, x) => acc + x.getField("sc")), 6).as("score"))

    // two-stage exact top-k (graft.util.TopN): prune per (query, input
    // partition), then rank globally per query over the ≤ k·P survivors
    graft.util.TopN.exact(scored, Seq(col("query_id")),
        Seq(col("score").desc, col("__id")), k)
      .select(col("query_id"), col("rank"), col("__id"), col("score"))
  }

  /** Per-document tf-idf keyword extraction: the top-`k` terms of each
    * document by `tf · ln((N+1)/(df+1))` — topic tagging, eval-set
    * probe mining, and corpus auditing without a topic model.
    *
    * Scale shape (100 TB): per-(doc, term) counts are one shuffle with
    * map-side partial agg; document frequencies collapse to a
    * vocabulary-bounded table re-joined on its own key (left to AQE —
    * unlike [[bm25TopK]]'s query-vocab frames, a corpus-wide df table
    * can be too big for a broadcast HINT); the final rank partitions
    * by document, so no executor holds more than one document's
    * distinct terms.
    *
    * Determinism: both ln arguments are exact integers (the
    * [[graft.curation.LangModel]] contract), the product rounds to 6
    * decimals, and rank ties break on the term string. */
  def tfIdfKeywords(docs: DataFrame, id: Column, toks: Column,
      k: Int): DataFrame = {
    require(k > 0)
    val tok = docs.select(id.as("__id"), explode(toks).as("term"))
    val n = docs.agg(count(lit(1)).as("n"))
    // per-(doc, term) counts feed two consumers (the df table and the
    // scoring join); materialized once so the corpus tokenizes once —
    // tf is the aggregated postings table (≤ one row per distinct term
    // per doc), the smallest corpus-proportional frame in the plan
    val tf = graft.util.Materialize.eager(
      tok.groupBy(col("__id"), col("term")).agg(count(lit(1)).as("tf")))
    val dfs = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val score = round(col("tf").cast(DoubleType) *
      (log((col("n") + 1L).cast(DoubleType)) -
        log((col("df") + 1L).cast(DoubleType))), 6)
    val w = Window.partitionBy(col("__id"))
      .orderBy(col("score").desc, col("term"))
    tf.join(dfs, "term")
      .crossJoin(broadcast(n))
      .withColumn("score", score)
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("__id"), col("rank"), col("term"), col("score"))
  }
}
