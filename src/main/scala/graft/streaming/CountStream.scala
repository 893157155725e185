package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Mergeable-count-table accumulation over a live feed — the third
  * streaming state discipline here, next to per-row scoring against
  * frozen state ([[ScoreStream]]) and bounded top-n state
  * ([[Reservoir]]): operators whose complete sufficient statistic is a
  * (keys..., count) table merge by commutative integer sum, so
  * accumulating per-batch count tables lands EXACTLY the batch
  * aggregation over everything fed — the streaming-equals-batch
  * identity, for the corpus-health family (histogram quantiles q125,
  * KL drift q105, and anything else count-shaped).
  *
  * Per-batch work: aggregate the batch (∝ batch size) + re-merge the
  * store (∝ store size = live key cardinality, NOT history size). The
  * scale contract is therefore BOUNDED KEYS — discrete metrics
  * (lengths, buckets, terms of a bounded vocabulary); bucket or hash a
  * continuous/unbounded key first.
  *
  * Replay safety: count merge is not idempotent, so the committed
  * pointer records the last merged batch id and a re-delivered batch
  * (at-least-once restart) is skipped — the standard foreachBatch
  * idempotence guard, transactional here because the pointer and the
  * generation move in one atomic rename (see [[Reservoir]]'s layout).
  */
object CountStream {

  /** Default key-cardinality ceiling: generous for any genuinely
    * discrete domain (langs × length buckets, a capped vocabulary) and
    * far below where the "store ∝ live keys" contract stops being a
    * bound in practice. */
  val MaxStoreKeys: Long = 1L << 22

  /** Above this many bytes per store file, a generation is written as
    * multiple shards instead of one (the single-file swap is an
    * optimization for the common small store, not a correctness
    * requirement — the pointer move is the commit either way). */
  val ShardBytes: Long = 128L << 20

  /** Drain `stream` with AvailableNow, folding `table(batch)` — a
    * (keyCols..., cntCol) frame — into the count store at `storeDir`
    * by groupBy(keys).sum(cnt). Returns the final accumulated table.
    *
    * `maxKeys` ENFORCES the bounded-keys contract instead of trusting
    * the scaladoc: a feed whose key is secretly unbounded (raw terms of
    * an open vocabulary, raw doc ids) fails loudly on the first
    * over-cardinality merge — before the pointer moves, so the store
    * stays at its last good generation — rather than silently growing
    * the store and every subsequent re-merge. */
  def accumulate(spark: SparkSession, stream: DataFrame, storeDir: String,
      checkpointDir: String, keyCols: Seq[String], cntCol: String,
      maxKeys: Long = MaxStoreKeys)
      (table: DataFrame => DataFrame): DataFrame =
    accumulateWith(spark, stream, storeDir, checkpointDir, maxKeys)(table)(
      (cur, t) => cur.unionByName(t)
        .groupBy(keyCols.map(col): _*)
        .agg(sum(col(cntCol)).as(cntCol)))

  /** [[accumulate]] with a caller-supplied merge — for sufficient
    * statistics beyond one summed count (e.g. the corpus diff's
    * (digest, SUM count, MIN example-id) table). Same pointer guard,
    * generation swap, cardinality ceiling and shard sizing; the merge
    * must be associative and commutative over batches for
    * streaming-equals-batch to hold. */
  def accumulateWith(spark: SparkSession, stream: DataFrame, storeDir: String,
      checkpointDir: String, maxKeys: Long = MaxStoreKeys)
      (table: DataFrame => DataFrame)
      (merge: (DataFrame, DataFrame) => DataFrame): DataFrame = {
    stream.writeStream
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        mergeBatchWith(spark, storeDir, table(batch), batchId, maxKeys)(merge)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start().awaitTermination()
    current(spark, storeDir).getOrElse(spark.emptyDataFrame)
  }

  /** Fold one batch's count table into the store — a NO-OP when
    * `batchId` is at or below the committed pointer's batch id (the
    * at-least-once replay guard: a crash between the store commit and
    * the checkpoint commit re-delivers the same id on restart, and a
    * second merge would double-count). */
  private[streaming] def mergeBatch(spark: SparkSession, storeDir: String,
      keyCols: Seq[String], cntCol: String, t: DataFrame,
      batchId: Long, maxKeys: Long = MaxStoreKeys): Unit =
    mergeBatchWith(spark, storeDir, t, batchId, maxKeys)(
      (cur, tt) => cur.unionByName(tt)
        .groupBy(keyCols.map(col): _*)
        .agg(sum(col(cntCol)).as(cntCol)))

  private[streaming] def mergeBatchWith(spark: SparkSession, storeDir: String,
      t: DataFrame, batchId: Long, maxKeys: Long)
      (merge: (DataFrame, DataFrame) => DataFrame): Unit =
    if (lastBatch(storeDir).forall(_ < batchId)) {
      val merged = current(spark, storeDir) match {
        case Some(cur) => merge(cur, t)
        case None => t
      }
      advance(spark, storeDir, merged, batchId, maxKeys)
    }

  private def genFile(storeDir: String) = Paths.get(storeDir, "GEN")

  private def pointer(storeDir: String): Option[(Long, Long)] = {
    val p = genFile(storeDir)
    if (!Files.exists(p)) None
    else Files.readString(p).trim.split(" ") match {
      case Array(g, b) => Some((g.toLong, b.toLong))
    }
  }

  /** Last merged micro-batch id, if any generation is committed. */
  def lastBatch(storeDir: String): Option[Long] = pointer(storeDir).map(_._2)

  /** The committed count table, or None before the first generation. */
  def current(spark: SparkSession, storeDir: String): Option[DataFrame] =
    pointer(storeDir).map { case (g, _) =>
      spark.read.parquet(s"$storeDir/gen=$g")
    }

  /** Bytes on disk of the committed generation, 0 when none — sizes the
    * NEXT generation's shard count (the store grows per-merge by at
    * most a batch's key set, so the previous size is the right
    * estimate; re-sizing lags one generation, which only ever means
    * one slightly-oversized file). */
  private def committedBytes(storeDir: String): Long = pointer(storeDir) match {
    case None => 0L
    case Some((g, _)) =>
      val dir = Paths.get(storeDir, s"gen=$g")
      if (!Files.exists(dir)) 0L
      else {
        val walk = Files.walk(dir)
        try walk.iterator.asScala.filter(Files.isRegularFile(_))
          .map(Files.size).sum
        finally walk.close()
      }
  }

  private def advance(spark: SparkSession, storeDir: String,
      merged: DataFrame, batchId: Long, maxKeys: Long): Unit = {
    val old = pointer(storeDir)
    val next = old.map(_._1 + 1).getOrElse(0L)
    val shards = math.max(1L, (committedBytes(storeDir) + ShardBytes - 1) / ShardBytes).toInt
    merged.repartition(shards).write.mode("overwrite")
      .parquet(s"$storeDir/gen=$next")
    // cardinality check off the WRITTEN parquet (footer metadata — no
    // recompute), and BEFORE the pointer move: an over-cardinality
    // merge leaves the store at its last good generation
    val keys = spark.read.parquet(s"$storeDir/gen=$next").count()
    require(keys <= maxKeys,
      s"count store at $storeDir: merge produced $keys keys > maxKeys=" +
        s"$maxKeys — the (keys..., count) table only bounds state for a " +
        "BOUNDED key domain; bucket or hash the key first (see " +
        "HistQuantiles), or raise maxKeys explicitly for a known domain.")
    val tmp = Paths.get(storeDir, "GEN.tmp")
    Files.writeString(tmp, s"$next $batchId")
    Files.move(tmp, genFile(storeDir), StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
    old.foreach { case (g, _) =>
      val dir = Paths.get(storeDir, s"gen=$g")
      if (Files.exists(dir))
        Files.walk(dir).sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
          .forEach(f => Files.deleteIfExists(f))
    }
  }
}
