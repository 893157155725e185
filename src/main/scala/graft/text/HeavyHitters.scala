package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact frequent-token mining via the two-pass sketch pattern: a
  * k-bounded Misra–Gries candidate pass ([[graft.plans.MisraGriesAgg]])
  * followed by an exact re-count of candidates only. The curation use:
  * stop-list construction, boilerplate-token discovery, and tokenizer
  * vocabulary audits over a corpus too large to groupBy-count whole.
  *
  * Why not just groupBy(term).count? At 100 TB that shuffles the FULL
  * vocabulary (billions of distinct near-unique tokens — URLs, ids,
  * hashes) to find the handful above support. Here pass 1 moves only
  * k-entry sketch states (map-side partials are k-bounded by
  * construction), and pass 2's re-count is a broadcast semi-join that
  * keeps ≤ k candidate terms — the long tail never shuffles at all.
  *
  * Determinism: the MG sketch state is partition-order-dependent, but
  * its guarantee (every term with freq > n/(k+1) survives) is not.
  * With k ≥ den/num, the candidate set is a superset of every term at
  * support ≥ num/den, and the exact re-count + threshold filter makes
  * the final answer exact — independent of partitioning, merge order,
  * and the sketch's sub-threshold junk.
  */
object HeavyHitters {

  /** One-row frame: (n, cands) — total token count and the MG
    * candidate array for support `num/den` (sketch size `k ≥ den/num`,
    * doubled for slack so the candidate set stays small but safe). */
  def mgSketch(docs: DataFrame, toks: Column, num: Long, den: Long): DataFrame = {
    require(num >= 1 && den > num, s"support num/den must be in (0,1), got $num/$den")
    // exactness needs k ≥ den/num (then k+1 > den/num and the MG bound
    // covers the requested support); the 100k ceiling bounds sketch
    // state, so supports finer than 1/100000 must FAIL, not silently
    // lose the guarantee
    require(den / num <= 100000L,
      s"support $num/$den needs ${den / num} sketch counters (cap 100000); " +
        "use a coarser support or raise the cap")
    val k = (2L * den / num).min(100000L).toInt
    docs.select(explode(toks).as("term"))
      .agg(count(lit(1)).as("n"),
        call_function("graft_misra_gries", col("term"), lit(k)).as("sk"))
  }

  /** Exact tokens with frequency ≥ `num/den` of all tokens:
    * (term, freq) ordered (freq desc, term). Exact and deterministic —
    * the sketch only prunes the candidate space (see object doc). */
  def frequentTokens(docs: DataFrame, toks: Column, num: Long, den: Long): DataFrame = {
    val tok = docs.select(explode(toks).as("term"))
    val sk = mgSketch(docs, toks, num, den)
    val cands = sk.select(explode(col("sk")).as("c"), col("n"))
      .select(col("c.term").as("term"), col("n"))
    tok.join(broadcast(cands), Seq("term"))
      .groupBy(col("term"), col("n"))
      .agg(count(lit(1)).as("freq"))
      .where(col("freq") * den >= col("n") * num)
      .select(col("term"), col("freq"))
      .orderBy(col("freq").desc, col("term"))
  }
}
