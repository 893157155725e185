package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/** CONTINUOUS corpus diff — [[Dedup.corpusDiff]]'s
  * diff-against-yesterday read-out maintained under a live feed (the
  * crawl-ops dashboard shape): the frozen "before" snapshot's digest
  * counts compute once, the "after" corpus arrives as micro-batches,
  * and the running delta is available at every trigger.
  *
  * Why it streams exactly: a diff side's complete sufficient statistic
  * is the (digest, count, example-id) table, and it MERGES — count by
  * sum, example by min — so the after side rides the mergeable-store
  * discipline ([[CountStream.accumulateWith]]: pointer-guarded
  * generation swap, replay-safe) and the read-out goes through the
  * identical [[Dedup.diffFromCounts]] tail the batch operator uses.
  * After the drain, the result equals `corpusDiff(before, everything
  * fed)` row for row — the batch oracle adjudicates the streaming path
  * unchanged.
  *
  * State bound: the store is after-corpus-DIGEST-sized by construction
  * (the diff's own output domain), not live-key-bounded like a metric
  * store — so the cardinality ceiling is disabled and the generation
  * shards by the standard size threshold instead. */
object DiffStream {

  /** Drain `afterStream` with AvailableNow, folding each batch's digest
    * counts into the store at `storeDir`; returns the final diff of the
    * accumulated after side against the frozen `before` snapshot. */
  def streamCorpusDiff(spark: SparkSession, before: DataFrame,
      afterStream: DataFrame, storeDir: String, checkpointDir: String,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val acc = CountStream.accumulateWith(spark, afterStream, storeDir,
      checkpointDir, maxKeys = Long.MaxValue)(
      batch => Dedup.diffCounts(batch, idCol, textCol, "n_after", "ea"))(
      (cur, t) => cur.unionByName(t).groupBy(col("digest"))
        .agg(sum(col("n_after")).as("n_after"), min(col("ea")).as("ea")))
    // an all-empty drain commits no generation: every before-digest is
    // then "removed", which needs a typed empty after side
    val after = if (acc.columns.isEmpty)
      Dedup.diffCounts(before.limit(0), idCol, textCol, "n_after", "ea")
    else acc
    Dedup.diffFromCounts(
      Dedup.diffCounts(before, idCol, textCol, "n_before", "eb"), after)
  }
}
