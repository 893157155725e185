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
  * sum, example by min — so the after side rides the DELTA discipline
  * ([[CountStream.accumulateDeltas]]: each batch appends its own
  * batch-sized aggregated delta dir behind an atomic manifest,
  * replay-safe, with periodic bin-pack compaction) and the read-out
  * goes through the identical [[Dedup.diffFromCounts]] tail the batch
  * operator uses. After the drain, the result equals
  * `corpusDiff(before, everything fed)` row for row — the batch oracle
  * adjudicates the streaming path unchanged.
  *
  * Why deltas and not the metric stores' full re-merge: this store is
  * after-corpus-DIGEST-sized — it GROWS with the corpus instead of
  * being live-key-bounded — so rewriting the merged table every
  * micro-batch would make per-trigger work ∝ accumulated corpus (at
  * 100 TB, every trigger rewriting a billions-of-rows digest table).
  * Appending deltas keeps per-batch work ∝ batch, with the store-sized
  * merge paid once per [[CountStream.DefaultCompactEvery]] batches and
  * once at read-out. */
object DiffStream {

  /** The (digest, SUM n_after, MIN example) merge — associative and
    * commutative over any union of per-batch delta tables, so
    * compaction boundaries are invisible. */
  private def combine(u: DataFrame): DataFrame =
    u.groupBy(col("digest"))
      .agg(sum(col("n_after")).as("n_after"), min(col("ea")).as("ea"))

  /** Drain `afterStream` with AvailableNow, appending each batch's
    * digest-count delta to the store at `storeDir`; returns the final
    * diff of the accumulated after side against the frozen `before`
    * snapshot. */
  def streamCorpusDiff(spark: SparkSession, before: DataFrame,
      afterStream: DataFrame, storeDir: String, checkpointDir: String,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val acc = CountStream.accumulateDeltas(spark, afterStream, storeDir,
      checkpointDir)(
      batch => Dedup.diffCounts(batch, idCol, textCol, "n_after", "ea"))(
      combine)
    // an all-empty drain commits no generation: every before-digest is
    // then "removed", which needs a typed empty after side
    val after = if (acc.columns.isEmpty)
      Dedup.diffCounts(before.limit(0), idCol, textCol, "n_after", "ea")
    else acc
    Dedup.diffFromCounts(
      Dedup.diffCounts(before, idCol, textCol, "n_before", "eb"), after)
  }
}
