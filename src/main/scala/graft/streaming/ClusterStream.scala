package graft.streaming

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Column, DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.dedup.Dedup

/** INCREMENTAL duplicate clustering — connected components maintained
  * under a live feed, the fourth streaming state discipline next to
  * frozen-artifact scoring ([[ScoreStream]]), bounded top-n
  * ([[Reservoir]]) and mergeable counts ([[CountStream]]): graph state
  * folded per batch, recomputing ONLY the components the batch's new
  * edges touch.
  *
  * The batch operator (q51: [[Dedup.lshJaccardPairs]] →
  * [[Dedup.connectedComponents]]) recomputes every cluster from ALL
  * pairs each run; a continuously-deduped crawl needs membership
  * maintained as documents land (the reference's own dedup horizon is
  * incremental — state TTL, `pkg/usecase/usecase.go:37`). Two pieces of
  * state under `storeDir`:
  *
  *  - `sigs/batch=<id>/` — each batch's (doc, sh, sig) staging
  *    ([[Dedup.stagedSigs]], the SAME projection the batch pipeline
  *    uses), append-only and idempotent (a re-delivered batch
  *    overwrites its own subdir). This is the probe corpus.
  *  - `labels/` — the (id, comp) table, hash-bucketed BY ID (a row's
  *    bucket never changes — comp updates rewrite in place) behind a
  *    MANIFEST mapping bucket → data dir. A fold rewrites only the
  *    buckets holding changed rows; untouched buckets carry forward as
  *    manifest pointers (the tx-log discipline applied to graph state).
  *
  * Per-batch fold:
  *  1. edge generation — batch-internal LSH candidates + a one-sided
  *     probe of the sig store (batch band keys BROADCAST; the corpus
  *     side is scanned map-side, column-pruned to (doc, sig), and never
  *     shuffled — the q126 discipline), every candidate exact-Jaccard
  *     verified. The union over batches equals the batch pipeline's
  *     edge set exactly: a pair lands in whichever batch carries its
  *     later endpoint.
  *  2. touched roots — endpoints' current labels, read from ONLY the
  *     endpoints' id-buckets (pruned by construction).
  *  3. member fetch — rows of touched components, one map-side
  *     broadcast-filtered scan of the label store (the single
  *     store-proportional READ in the fold; the store holds only
  *     pair-participating docs, and the scan is column-pruned and
  *     shuffle-free).
  *  4. local CC — [[Dedup.connectedComponents]] over (new edges ∪ star
  *     edges member→root). Star edges preserve existing connectivity,
  *     so the pointer-jumping iterations run over touched components +
  *     the batch ONLY, never the whole graph; comp = min id globally
  *     because every old label is itself a member id.
  *  5. bucket rewrite — changed rows land in `labels/data/batch=<id>/
  *     __bk=<k>/`; the manifest repoints exactly those buckets
  *     (tmp+atomic-rename, batch-id pointer = the replay guard);
  *     replaced dirs are swept after the commit.
  *
  * The invariant after every fold: the label table equals
  * `connectedComponents(all edges seen so far)` — so the batch oracle
  * (q51's recursive-CTE closure) adjudicates the streaming path
  * unchanged, at any trigger boundary. */
object ClusterStream {

  /** Label-store buckets. More buckets = finer rewrite granularity
    * (per-fold write IO ∝ touched buckets) at the cost of more files;
    * resize requires a rebuild (the manifest pins the count). */
  val DefaultBuckets = 64

  /** Drain `stream` with AvailableNow, folding each micro-batch into
    * the cluster state at `storeDir`; returns the final (id, comp)
    * labels — exactly [[Dedup.connectedComponents]] over the union of
    * all near-dup pairs in everything fed. Ids must be unique across
    * the feed (each document lands once — the replay-idempotence key,
    * as in [[Reservoir]]), and the store is bound to ONE checkpoint
    * lineage: resume later drains with the SAME `checkpointDir`, or the
    * restarted batch ids fall below the store's pointer and the folds
    * no-op (the batch-id replay guard cannot tell a fresh stream from a
    * redelivery — the [[CountStream]] contract). */
  def streamClusters(spark: SparkSession, stream: DataFrame,
      storeDir: String, checkpointDir: String,
      idCol: String = "doc_id", textCol: String = "text",
      shingleK: Int = 3, threshold: Double = 0.8,
      k: Int = 128, bands: Int = 32,
      nBuckets: Int = DefaultBuckets): DataFrame = {
    require(nBuckets >= 1, s"nBuckets must be >= 1, got $nBuckets")
    stream.writeStream
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        fold(spark, storeDir, batch, idCol, textCol, shingleK, threshold,
          k, bands, nBuckets, batchId)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start().awaitTermination()
    clusters(spark, storeDir)
  }

  /** The committed (id, comp) labels — empty before the first fold. */
  def clusters(spark: SparkSession, storeDir: String): DataFrame =
    readManifest(storeDir) match {
      case Some(m) if m.buckets.nonEmpty =>
        spark.read.parquet(
          m.buckets.values.toSeq.distinct.map(rel => s"$storeDir/labels/$rel"): _*)
      case _ =>
        spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("id",
              org.apache.spark.sql.types.LongType),
            org.apache.spark.sql.types.StructField("comp",
              org.apache.spark.sql.types.LongType))))
    }

  /** Last folded batch id, if any (the replay guard's pointer). */
  def lastBatch(storeDir: String): Option[Long] = readManifest(storeDir).map(_.batchId)

  // ---- the per-batch fold ----

  private[streaming] def fold(spark: SparkSession, storeDir: String,
      batch: DataFrame, idCol: String, textCol: String, shingleK: Int,
      threshold: Double, k: Int, bands: Int, nBuckets: Int,
      batchId: Long): Unit = {
    val cur = readManifest(storeDir)
    if (cur.exists(_.batchId >= batchId)) return // at-least-once replay: no-op
    cur.foreach(m => require(m.nBuckets == nBuckets,
      s"label store at $storeDir was built with nBuckets=${m.nBuckets}, " +
        s"fold called with $nBuckets — resizing requires a rebuild"))

    def bucketOf(c: Column): Column = pmod(hash(c), lit(nBuckets))

    val sigsB = Dedup.stagedSigs(batch, idCol, textCol, shingleK, k).persist()
    try {
      sigsB.count() // eager: banding + both verify joins must hit the cache
      // idempotent under redelivery: the batch owns its subdir
      sigsB.write.mode("overwrite").parquet(s"$storeDir/sigs/batch=$batchId")

      // batch-internal edges (the q51 pipeline restricted to the batch)
      val candIn = graft.util.Materialize.eager(
        Dedup.lshCandidates(sigsB, "doc", "sig", bands))
      val internal = candIn
        .join(sigsB.select(col("doc").as("a"), col("sh").as("sha")), "a")
        .join(sigsB.select(col("doc").as("b"), col("sh").as("shb")), "b")
        .filter(Dedup.jaccard(col("sha"), col("shb")) >= threshold)
        .select(col("a"), col("b"))

      // cross edges vs the PRIOR corpus: batch band keys broadcast, the
      // store scanned map-side (column-pruned to (doc, sig) by the band
      // projection), candidates fetched back one-sided — the corpus is
      // never shuffled, never re-signatured
      val corpus = spark.read.parquet(s"$storeDir/sigs")
        .filter(col("batch") < batchId)
      val bandB = broadcast(Dedup.banded(sigsB, "doc", "sig", bands)
        .select(col("doc").as("new_id"), col("band_key")))
      val candX = graft.util.Materialize.eager(
        Dedup.banded(corpus, "doc", "sig", bands).select(col("doc"), col("band_key"))
          .join(bandB, "band_key")
          .select(col("new_id"), col("doc").as("corpus_id")).distinct())
      val corpusSh = corpus.select(col("doc").as("corpus_id"), col("sh").as("csh"))
        .join(broadcast(candX.select("corpus_id").distinct()), "corpus_id")
      val cross = candX
        .join(corpusSh, "corpus_id")
        .join(sigsB.select(col("doc").as("new_id"), col("sh").as("nsh")), "new_id")
        .filter(Dedup.jaccard(col("csh"), col("nsh")) >= threshold)
        .select(col("new_id").as("a"), col("corpus_id").as("b"))

      val edges = graft.util.Materialize.eager(internal.unionByName(cross))
      if (edges.isEmpty) { // nothing to merge — just advance the pointer
        commit(storeDir, cur, Map.empty, nBuckets, batchId); return
      }

      // touched roots: endpoints' current labels, read from ONLY the
      // endpoints' id-buckets (driver holds bucket NUMBERS, ≤ nBuckets)
      val endpoints = graft.util.Materialize.eager(
        edges.select(col("a").as("id")).union(edges.select(col("b").as("id")))
          .distinct())
      val roots = cur.filter(_.buckets.nonEmpty).flatMap { m =>
        val eb = endpoints.select(bucketOf(col("id")).as("bk"))
          .distinct().collect().map(_.getInt(0)).toSet
        val hit = m.buckets.keySet.intersect(eb)
        if (hit.isEmpty) None
        else Some(graft.util.Materialize.eager(
          readBuckets(spark, storeDir, m, hit)
            .join(broadcast(endpoints), "id").select("comp").distinct()))
      }.filterNot(_.isEmpty)

      // members of touched components — the one store-proportional scan
      // (map-side, broadcast roots, column-pruned, shuffle-free)
      val sub = (cur, roots) match {
        case (Some(m), Some(r)) if m.buckets.nonEmpty =>
          Some(graft.util.Materialize.eager(
            readBuckets(spark, storeDir, m, m.buckets.keySet)
              .join(broadcast(r), "comp")))
        case _ => None
      }

      // local CC: new edges + star edges (member → its current root)
      // — touched components' connectivity rides in, so the result is
      // exactly the batch CC over everything seen
      val localEdges = sub match {
        case Some(s) => edges.unionByName(
          s.select(col("id").as("a"), col("comp").as("b")))
        case None => edges
      }
      val newLabels = graft.util.Materialize.eager(
        Dedup.connectedComponents(localEdges, "a", "b"))

      // rewrite exactly the buckets holding changed rows; carry the
      // rest forward as manifest pointers
      val tb = newLabels.select(bucketOf(col("id")).as("bk"))
        .distinct().collect().map(_.getInt(0)).toSet
      val keep = (cur, roots) match {
        case (Some(m), Some(r)) if m.buckets.keySet.exists(tb) =>
          readBuckets(spark, storeDir, m, m.buckets.keySet.intersect(tb))
            .join(broadcast(r), Seq("comp"), "left_anti")
        case (Some(m), None) if m.buckets.keySet.exists(tb) =>
          readBuckets(spark, storeDir, m, m.buckets.keySet.intersect(tb))
        case _ => newLabels.limit(0)
      }
      keep.unionByName(newLabels)
        .select(col("id"), col("comp")) // joins reorder — pin the layout
        .withColumn("__bk", bucketOf(col("id")))
        .write.partitionBy("__bk").mode("overwrite")
        .parquet(s"$storeDir/labels/data/batch=$batchId")
      val repointed = tb.map(bk => bk -> s"data/batch=$batchId/__bk=$bk").toMap
      commit(storeDir, cur, repointed, nBuckets, batchId)
    } finally sigsB.unpersist(blocking = false)
  }

  /** Point the manifest at `repointed` buckets (others carry forward),
    * record the batch id, then sweep bucket dirs no manifest references
    * — referenced dirs are never touched, so a crash anywhere leaves a
    * readable store (old manifest, or new manifest + live dirs). */
  private def commit(storeDir: String, cur: Option[Manifest],
      repointed: Map[Int, String], nBuckets: Int, batchId: Long): Unit = {
    val buckets = cur.map(_.buckets).getOrElse(Map.empty) ++ repointed
    writeManifest(storeDir, Manifest(batchId, nBuckets, buckets))
    val live = buckets.values.toSet
    val dataDir = Paths.get(storeDir, "labels", "data")
    if (Files.exists(dataDir)) {
      val batches = Files.list(dataDir)
      try batches.iterator.asScala.filter(Files.isDirectory(_)).foreach { bd =>
        val leaves = Files.list(bd)
        try leaves.iterator.asScala.filter(Files.isDirectory(_)).toList
          .foreach { leaf =>
            val rel = s"data/${bd.getFileName}/${leaf.getFileName}"
            if (!live(rel)) deleteRecursively(leaf)
          }
        finally leaves.close()
      }
      finally batches.close()
    }
  }

  private def readBuckets(spark: SparkSession, storeDir: String,
      m: Manifest, bks: Set[Int]): DataFrame = {
    val paths = bks.toSeq.sorted.flatMap(m.buckets.get)
      .distinct.map(rel => s"$storeDir/labels/$rel")
    require(paths.nonEmpty, "readBuckets called with no resolvable buckets")
    spark.read.parquet(paths: _*)
  }

  // ---- manifest (tmp + atomic rename; the pointer IS the commit) ----

  private final case class Manifest(batchId: Long, nBuckets: Int,
      buckets: Map[Int, String])

  private def manifestFile(storeDir: String): Path =
    Paths.get(storeDir, "labels", "MANIFEST")

  private def readManifest(storeDir: String): Option[Manifest] = {
    val p = manifestFile(storeDir)
    if (!Files.exists(p)) None
    else {
      val txt = Files.readString(p)
      val head = """"batchId":(-?\d+),"nBuckets":(\d+)""".r
      val entry = """"(\d+)":"([^"]+)"""".r
      val hm = head.findFirstMatchIn(txt).getOrElse(
        sys.error(s"unreadable cluster manifest at $p"))
      Some(Manifest(hm.group(1).toLong, hm.group(2).toInt,
        entry.findAllMatchIn(txt).map(m => m.group(1).toInt -> m.group(2)).toMap))
    }
  }

  private def writeManifest(storeDir: String, m: Manifest): Unit = {
    Files.createDirectories(manifestFile(storeDir).getParent)
    val body = s"""{"batchId":${m.batchId},"nBuckets":${m.nBuckets},"buckets":{""" +
      m.buckets.toSeq.sortBy(_._1)
        .map { case (k, v) => s""""$k":"$v"""" }.mkString(",") + "}}"
    val tmp = Paths.get(storeDir, "labels", "MANIFEST.tmp")
    Files.writeString(tmp, body)
    Files.move(tmp, manifestFile(storeDir), StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
  }

  private def deleteRecursively(p: Path): Unit = {
    val walk = Files.walk(p)
    try walk.sorted(java.util.Comparator.reverseOrder[Path]())
      .forEach(f => Files.deleteIfExists(f))
    finally walk.close()
  }
}
