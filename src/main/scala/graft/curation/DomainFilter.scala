package graft.curation

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.relational.RelationalQueries.davg

/** Domain-level (two-stage) quality filtering — the web-corpus pattern
  * where keep/drop decisions are made per DOMAIN, not per document: a
  * domain whose aggregate quality is poor is dropped wholesale (spam
  * farms, SEO mills), even though individual pages inside it may score
  * fine. The reference's per-record rule predicates
  * (pkg/infra/policy/client.go:143 evaluates policy per input record)
  * are the per-row analogue; this is the aggregate tier a
  * training-data pipeline layers on top.
  */
object DomainFilter {

  /** Keep every row whose domain's average `score` is at or above the
    * corpus-wide average AND whose domain has at least `minCount` rows.
    * The relative threshold (domain mean vs corpus mean) needs no
    * magic constant and can never select zero domains — some domain is
    * always at or above the mean. Averages are exact-decimal
    * sum / count ([[graft.relational.RelationalQueries.davg]]) so the
    * keep set is identical under any partitioning.
    *
    * Returns the surviving rows with `domain_avg` (the domain's mean
    * score, rounded to 6 decimals) appended.
    *
    * Scale shape: one low-cardinality shuffle for the domain aggregate
    * (map-side partials do the work — domains number thousands, rows
    * billions), a one-row corpus aggregate, and a BROADCAST semi-join
    * of the metadata-sized keep list back onto the corpus — the corpus
    * itself never reshuffles. */
  def domainQualityFilter(df: DataFrame, domain: Column, score: Column,
      minCount: Long = 1L): DataFrame = {
    val byDom = df.groupBy(domain.as("__dom"))
      .agg(davg(score).as("__davg"), count(lit(1)).as("__dn"))
    val overall = df.agg(davg(score).as("__cavg"))
    val keep = byDom.crossJoin(broadcast(overall))
      .where(col("__davg") >= col("__cavg") && col("__dn") >= minCount)
      .select(col("__dom"), round(col("__davg"), 6).as("domain_avg"))
    df.join(broadcast(keep), domain === col("__dom")).drop("__dom")
  }
}
