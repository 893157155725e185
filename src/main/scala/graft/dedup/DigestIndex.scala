package graft.dedup

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}

/** Persisted digest-bucketed exact-verify store — the [[BandIndex]]
  * treatment applied to the content-digest column, closing the last
  * per-batch O(corpus) read in the incremental exact-dedup family.
  *
  * [[Dedup.bloomNewDocs]]'s verify step confirms probe-hit digests
  * against "the corpus digest column" — a column-pruned but still
  * corpus-wide parquet scan on every batch that has at least one bloom
  * hit. At 100 TB that scan IS the per-batch cost: the bloom layer
  * already made the candidate set batch-sized, but the confirm side
  * re-reads every footer. This store persists `(id, digest)` rows
  * directory-partitioned by a hash BUCKET of the digest, so a batch
  * verify reads ONLY the bucket directories its own candidate digests
  * hash to (`PartitionFilters` at the scan, batch side broadcast) —
  * per-batch verify I/O tracks the BATCH, not the corpus.
  *
  * Like every derived store here (bloom shards, band index, IVF
  * layout), it is REBUILDABLE from the corpus table's stored digest
  * column, so losing it costs one rebuild scan, never correctness.
  * Freshness is declared by `digests-meta.json` (spec pointer,
  * tmp+rename): a bucketing change rebuilds into a fresh layout
  * directory and flips the pointer only after the rebuild completes —
  * the [[ShardedBloom]] resize discipline.
  *
  * Crash-safety direction: callers append to the index BEFORE the docs
  * append, so the index is always a SUPERSET of the corpus' digests
  * (an index MISSING a committed digest would re-admit that content on
  * replay — a permanent duplicate). The cost of the superset direction
  * is GHOST rows: `(id, digest)` entries whose docs append never
  * happened. Unlike the band index — where the exact gate backstops
  * ghost absorption — exact dedup cannot blanket-absorb self-matches
  * (a replay AFTER a successful commit is `(id, digest)`-identical to
  * its committed row and must be DROPPED, while a replay after a
  * crash-between-index-and-docs is identical to its ghost and must be
  * ADMITTED). [[Dedup.indexedDupDigests]] therefore splits probe
  * matches: a different-id match is a true duplicate (dropped with no
  * corpus read — the recovery contract below keeps this sound), and a
  * same-id match falls back to the corpus digest column for THAT
  * digest set only — a scan paid only on replay/crash windows, never
  * in the steady state.
  *
  * Recovery contract (same as [[BandIndex]]): a failed batch is
  * re-run before new batches are admitted (Structured Streaming's
  * at-least-once replay gives exactly this), so a ghost's own batch
  * fills it before any LATER batch can collide with it under a
  * different id.
  */
object DigestIndex {

  /** Partition (bucket) column of the stored layout. */
  val BucketCol = "__dk"

  /** Declared index spec; doubles as the layout directory name so a
    * bucketing change targets a fresh directory and the flip is
    * atomic. `buckets` only shapes the layout — any probe works
    * against any bucketing, it just prunes differently. */
  final case class Spec(buckets: Int) {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    def layoutDir: String = s"digests-k$buckets"
  }

  private val MetaFile = "digests-meta.json"

  /** The ACTIVE spec, or None when no index exists yet. */
  def readMeta(spark: org.apache.spark.sql.SparkSession, storeDir: String): Option[Spec] =
    graft.streaming.StoreManifest.readFsString(spark, storeDir, MetaFile).map { s =>
      val m = """\{"buckets":(\d+)\}""".r
      s.trim match {
        case m(k) => Spec(k.toInt)
        case _ => sys.error(s"unreadable digest-index meta at $storeDir/$MetaFile: $s")
      }
    }

  /** Does the ACTIVE layout directory for `spec` exist? A meta pointer
    * whose layout was deleted out-of-band must trigger a rebuild, not
    * quietly verify "no match" ≡ "new content". */
  def layoutExists(spark: org.apache.spark.sql.SparkSession, storeDir: String,
      spec: Spec): Boolean =
    graft.streaming.StoreManifest.fsExists(spark, storeDir, spec.layoutDir)

  private def bucketOf(digest: Column, buckets: Int): Column =
    pmod(xxhash64(digest), lit(buckets.toLong)).cast(IntegerType)

  /** Bucket + rebalance-by-partition-column + partitioned write — one
    * task per touched bucket writes one file, not tasks × buckets
    * small files (the shared write shape of every partitioned store
    * here). */
  private def writeRows(docDigests: DataFrame, idCol: String, digestCol: String,
      layout: String, spec: Spec, mode: String): Unit =
    docDigests.select(col(idCol).as("doc"), col(digestCol).as("digest"))
      .withColumn(BucketCol, bucketOf(col("digest"), spec.buckets))
      .hint("rebalance", BucketCol)
      .write.partitionBy(BucketCol).mode(mode).parquet(layout)

  /** Append `(id, digest)` rows for newly-admitted docs to the active
    * layout and declare the spec active (first append on a fresh
    * corpus creates both). Call BEFORE the docs append — see class
    * doc. */
  def append(docDigests: DataFrame, idCol: String, digestCol: String,
      storeDir: String, spec: Spec): Unit = {
    val spark = docDigests.sparkSession
    writeRows(docDigests, idCol, digestCol,
      new Path(storeDir, spec.layoutDir).toString, spec, "append")
    ensureMeta(spark, storeDir, spec)
  }

  /** Build the index from scratch out of the corpus' stored
    * `(id, digest)` projection — first index on an existing corpus,
    * bucketing change, lost layout. The new layout is fully written
    * before the meta pointer flips; the superseded layout is removed
    * after. */
  def rebuild(corpusDigests: DataFrame, idCol: String, digestCol: String,
      storeDir: String, spec: Spec): Unit = {
    val spark = corpusDigests.sparkSession
    val fs = new Path(storeDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val layoutPath = new Path(storeDir, spec.layoutDir)
    // a half-written layout from a crashed rebuild is stale, not a
    // superset candidate — clear it so this rebuild starts clean
    if (fs.exists(layoutPath)) fs.delete(layoutPath, true)
    writeRows(corpusDigests, idCol, digestCol, layoutPath.toString, spec, "overwrite")
    // an empty corpus writes zero rows; the layout dir must still exist
    // so the probe's explicit-schema read sees "empty", not "lost"
    if (!fs.exists(layoutPath)) fs.mkdirs(layoutPath)
    ensureMeta(spark, storeDir, spec)
  }

  private def ensureMeta(spark: org.apache.spark.sql.SparkSession,
      storeDir: String, spec: Spec): Unit = {
    val previous = readMeta(spark, storeDir)
    if (!previous.contains(spec)) {
      val fs = new Path(storeDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
      ShardedBloom.atomicWrite(fs, new Path(storeDir, MetaFile),
        s"""{"buckets":${spec.buckets}}""".getBytes("UTF-8"))
      previous.map(_.layoutDir).filter(_ != spec.layoutDir)
        .foreach(old => fs.delete(new Path(storeDir, old), true))
    }
  }

  /** Matches between a batch's candidate `(id, digest)` rows and the
    * stored index: one row per (digest, new_id, corpus_id) triple. The
    * candidates' touched buckets arrive as `PartitionFilters` (the
    * scan reads only those directories) and the candidate side is
    * broadcast, so the corpus side never shuffles — and for a batch
    * touching few buckets, is mostly never read. Callers classify
    * matches via [[Dedup.indexedDupDigests]]. */
  def probe(candidates: DataFrame, idCol: String, digestCol: String,
      storeDir: String, spec: Spec,
      /** Candidate-row guard on the broadcast, as [[BandIndex.probe]]:
        * bloom-hit candidates are batch-bounded in steady state, but a
        * cap-less backfill whose content is mostly duplicates can make
        * this frame batch-SIZED — past the threshold the join falls
        * back to a shuffle on `digest` (AQE may still pick a broadcast
        * from actual sizes — the safe version of the hint). */
      maxBroadcastRows: Long = BandIndex.DefaultMaxBroadcastRows): DataFrame = {
    val spark = candidates.sparkSession
    // consumed twice (bucket list + join side) — materialize once;
    // candidates are bloom probe hits, batch-sized at most
    val n = graft.util.Materialize.eager(
      candidates.select(col(idCol).as("new_id"), col(digestCol).as("digest"))
        .distinct()
        .withColumn(BucketCol, bucketOf(col("digest"), spec.buckets)))
    val touched = n.select(BucketCol).distinct()
      .collect().map(_.getInt(0)).toIndexedSeq // metadata-sized: ≤ buckets
    // explicit schema: an empty layout (fresh corpus) has no footers to
    // infer from and must read as empty, not throw
    val schema = StructType(Seq(
      StructField("doc", candidates.schema(idCol).dataType),
      StructField("digest", StringType),
      StructField(BucketCol, IntegerType)))
    val store = spark.read.schema(schema)
      .parquet(new Path(storeDir, spec.layoutDir).toString)
      .filter(col(BucketCol).isin(touched: _*))
    val batchSide = n.drop(BucketCol)
    val guarded =
      if (n.count() <= maxBroadcastRows) broadcast(batchSide) else batchSide
    store.select(col("doc").as("corpus_id"), col("digest"))
      .join(guarded, "digest")
      .select(col("digest"), col("new_id"), col("corpus_id"))
      .distinct()
  }
}
