package graft.dedup

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, IntegerType, LongType, StringType, StructField, StructType}

/** Persisted LSH band index — the derived store that makes the
  * streaming near-dup gate's corpus probe O(batch), not O(corpus).
  *
  * [[Dedup.incrementalCandidates]]'s contract says "signature the
  * corpus ONCE at ingest (persist [[Dedup.banded]]'s output as a
  * table)"; this is that table, with the one addition a 100 TB corpus
  * needs: rows are directory-partitioned by a hash BUCKET of the band
  * key (same layout idea as the IVF store,
  * [[graft.sim.Similarity.writeIvfStore]]). A batch probe computes the
  * buckets its own band keys hash to — a metadata-sized driver list,
  * ≤ `buckets` ints — and reads ONLY those directories
  * (`PartitionFilters` at the scan), with the batch side broadcast: the
  * corpus side of the probe is never shuffled and, for a batch touching
  * few buckets, mostly never read.
  *
  * Like every derived store here (bloom shards, IVF layout), the index
  * is REBUILDABLE from the corpus table — the stored `(id, sig)`
  * projection re-bands in one pass — so losing it costs a rebuild,
  * never correctness. Freshness is declared by `bands-meta.json`
  * (spec pointer, tmp+rename): a param change targets a fresh layout
  * directory and flips the pointer only after the rebuild completes,
  * exactly the [[ShardedBloom]] resize discipline.
  *
  * Crash-safety direction: callers append to the index BEFORE the docs
  * append, so the index is always a SUPERSET of the corpus' band rows.
  * Ghost rows (index entries whose doc append never happened) are
  * `(id, sig)`-identical to the replayed batch's own rows and are
  * filtered by the caller ([[graft.streaming.CorpusBuilder]]'s ghost
  * anti-join); replay also re-appends the same band rows, which the
  * probe's `distinct()` absorbs.
  */
object BandIndex {

  /** Partition (bucket) column of the stored layout. */
  val BucketCol = "__bk"

  /** Declared index spec; doubles as the layout directory name so a
    * param change targets a fresh directory and the flip is atomic.
    * `bands` must match the probe-time banding (band keys embed the
    * band number and row slice); `buckets` only shapes the layout. */
  final case class Spec(bands: Int, buckets: Int) {
    require(bands >= 1, s"bands must be >= 1, got $bands")
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    def layoutDir: String = s"bands-b$bands-k$buckets"
  }

  private val MetaFile = "bands-meta.json"

  /** The ACTIVE spec, or None when no index exists yet. */
  def readMeta(spark: org.apache.spark.sql.SparkSession, storeDir: String): Option[Spec] =
    graft.streaming.StoreManifest.readFsString(spark, storeDir, MetaFile).map { s =>
      val m = """\{"bands":(\d+),"buckets":(\d+)\}""".r
      s.trim match {
        case m(b, k) => Spec(b.toInt, k.toInt)
        case _ => sys.error(s"unreadable band-index meta at $storeDir/$MetaFile: $s")
      }
    }

  /** Does the ACTIVE layout directory for `spec` exist? A meta pointer
    * whose layout was deleted out-of-band must trigger a rebuild, not
    * quietly probe "no index" ≡ "no near-dups". */
  def layoutExists(spark: org.apache.spark.sql.SparkSession, storeDir: String,
      spec: Spec): Boolean =
    graft.streaming.StoreManifest.fsExists(spark, storeDir, spec.layoutDir)

  private def bucketOf(bandKey: Column, buckets: Int): Column =
    pmod(xxhash64(bandKey), lit(buckets.toLong)).cast(IntegerType)

  /** Band + bucket + rebalance-by-partition-column + partitioned write —
    * the write shape every partitioned append here uses (one task per
    * touched bucket writes one file, not tasks × buckets small files). */
  private def writeRows(docSigs: DataFrame, idCol: String, sigCol: String,
      layout: String, spec: Spec, mode: String): Unit =
    Dedup.banded(docSigs, idCol, sigCol, spec.bands)
      .withColumn(BucketCol, bucketOf(col("band_key"), spec.buckets))
      .hint("rebalance", BucketCol)
      .write.partitionBy(BucketCol).mode(mode).parquet(layout)

  /** Append band rows for newly-admitted docs to the active layout and
    * declare the spec active (first append on a fresh corpus creates
    * both). Call BEFORE the docs append — see class doc. */
  def append(docSigs: DataFrame, idCol: String, sigCol: String,
      storeDir: String, spec: Spec): Unit = {
    val spark = docSigs.sparkSession
    writeRows(docSigs, idCol, sigCol,
      new Path(storeDir, spec.layoutDir).toString, spec, "append")
    ensureMeta(spark, storeDir, spec)
  }

  /** Build the index from scratch out of the corpus' stored `(id, sig)`
    * projection — first index on an existing corpus, param change, lost
    * layout. The new layout is fully written before the meta pointer
    * flips; the superseded layout is removed after. */
  def rebuild(corpusSigs: DataFrame, idCol: String, sigCol: String,
      storeDir: String, spec: Spec): Unit = {
    val spark = corpusSigs.sparkSession
    val fs = new Path(storeDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val layoutPath = new Path(storeDir, spec.layoutDir)
    // a half-written layout from a crashed rebuild is stale, not a
    // superset candidate — clear it so this rebuild starts clean
    if (fs.exists(layoutPath)) fs.delete(layoutPath, true)
    writeRows(corpusSigs, idCol, sigCol, layoutPath.toString, spec, "overwrite")
    // an all-sig-less corpus writes zero rows; the layout dir must still
    // exist so the probe's explicit-schema read sees "empty", not "lost"
    if (!fs.exists(layoutPath)) fs.mkdirs(layoutPath)
    ensureMeta(spark, storeDir, spec)
  }

  private def ensureMeta(spark: org.apache.spark.sql.SparkSession,
      storeDir: String, spec: Spec): Unit = {
    val previous = readMeta(spark, storeDir)
    if (!previous.contains(spec)) {
      val fs = new Path(storeDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
      ShardedBloom.atomicWrite(fs, new Path(storeDir, MetaFile),
        s"""{"bands":${spec.bands},"buckets":${spec.buckets}}""".getBytes("UTF-8"))
      previous.map(_.layoutDir).filter(_ != spec.layoutDir)
        .foreach(old => fs.delete(new Path(storeDir, old), true))
    }
  }

  /** Default band-row count above which [[probe]] stops broadcasting
    * the batch side (a 1M-band-row frame of 64-hash signatures is
    * ~0.5 GB serialized — past any sane broadcast budget). */
  val DefaultMaxBroadcastRows: Long = 1L << 20

  /** Candidate pairs between a batch's `(id, sig)` rows and the stored
    * index: one row per colliding (new, corpus) pair with both
    * signatures for agreement scoring — [[Dedup.incrementalCandidates]]
    * over the persisted store. The batch's touched buckets arrive as
    * `PartitionFilters` (the scan reads only those directories) and,
    * while the batch stays under `maxBroadcastRows` band rows
    * (trigger-bounded micro-batches always do), the batch side is
    * broadcast so the corpus side never shuffles. A LARGER batch — a
    * cap-less `AvailableNow` backfill over a big landing prefix —
    * would OOM the driver as an unconditional broadcast, so past the
    * threshold the join falls back to a shuffle on `band_key` (the
    * backfill already pays batch-sized I/O; one shuffle of the pruned
    * store side is the scale-correct shape, and AQE may still choose a
    * broadcast from ACTUAL sizes, which is exactly the safe version of
    * the hint). The band-row count is read from the already-
    * materialized probe frame — no extra computation. */
  def probe(batchSigs: DataFrame, idCol: String, sigCol: String,
      storeDir: String, spec: Spec,
      maxBroadcastRows: Long = DefaultMaxBroadcastRows): DataFrame = {
    val spark = batchSigs.sparkSession
    // consumed twice (bucket list + join side) — materialize once
    val n = graft.util.Materialize.eager(
      Dedup.banded(batchSigs, idCol, sigCol, spec.bands)
        .withColumn(BucketCol, bucketOf(col("band_key"), spec.buckets)))
    val touched = n.select(BucketCol).distinct()
      .collect().map(_.getInt(0)).toIndexedSeq // metadata-sized: ≤ buckets
    // explicit schema: an empty layout (fresh corpus, all-short docs) has
    // no footers to infer from and must read as empty, not throw; the
    // bucket column is resolved from the directory values as usual
    val schema = StructType(Seq(
      StructField("doc", batchSigs.schema(idCol).dataType),
      StructField("sig", ArrayType(LongType)),
      StructField("band_key", StringType),
      StructField(BucketCol, IntegerType)))
    val store = spark.read.schema(schema)
      .parquet(new Path(storeDir, spec.layoutDir).toString)
      .filter(col(BucketCol).isin(touched: _*))
    val batchSide = n.select(col("doc").as("new_id"), col("sig").as("nsig"),
      col("band_key"))
    val guarded =
      if (n.count() <= maxBroadcastRows) broadcast(batchSide) else batchSide
    store.select(col("doc").as("corpus_id"), col("sig").as("csig"), col("band_key"))
      .join(guarded, "band_key")
      .select(col("new_id"), col("corpus_id"), col("nsig"), col("csig"))
      .distinct()
  }
}
