package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.dedup.Dedup

/** Incremental connected components: the label store must equal the
  * batch CC over ALL pairs seen at every drain boundary (q150's
  * adjudication identity), components must MERGE when a later batch
  * bridges them, folds must rewrite only touched buckets, and a
  * re-delivered batch id must be a no-op. */
class ClusterStreamSpec extends SparkSpec {
  import spark.implicits._

  /** One coalesced file per sub-frame so maxFilesPerTrigger=1 maps
    * frames to micro-batches deterministically. */
  private def landFiles(dir: String, frames: Seq[DataFrame]): DataFrame = {
    frames.foreach(_.coalesce(1).write.mode("append").parquet(dir))
    spark.readStream.schema(frames.head.schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
  }

  private def batchClusters(docs: DataFrame): Set[(Long, Long)] =
    Dedup.connectedComponents(
        Dedup.lshJaccardPairs(docs, "doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private def streamedClusters(df: DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("streaming clusters == batch CC over everything fed (multi-batch drain)") {
    val work = graft.util.Workspace.temp("clusterstream-spec")
    // dup families straddling files + unique fillers
    def doc(id: Long, text: String) = (id, text)
    val famA = "alpha beta gamma delta epsilon zeta eta theta"
    val famB = "one two three four five six seven eight nine"
    val f1 = Seq(doc(1, famA), doc(6, "unique words here nothing shared one"),
      doc(4, famB)).toDF("doc_id", "text")
    val f2 = Seq(doc(2, famA), doc(5, famB),
      doc(7, "entirely different filler content two")).toDF("doc_id", "text")
    val f3 = Seq(doc(3, famA),
      doc(8, "more filler text with zero overlap three")).toDF("doc_id", "text")
    val feed = landFiles(s"$work/landing", Seq(f1, f2, f3))
    val streamed = ClusterStream.streamClusters(spark, feed,
      s"$work/store", s"$work/ckpt")
    val all = f1.unionByName(f2).unionByName(f3)
    assert(streamedClusters(streamed) == batchClusters(all))
    // famA straddles all three files: only the cross-batch probe can
    // have built it
    assert(streamedClusters(streamed).filter(_._2 == 1L).map(_._1) == Set(1L, 2L, 3L))
  }

  test("a later batch BRIDGES two existing components (touched-comp merge)") {
    val work = graft.util.Workspace.temp("clusterstream-merge")
    // T0 = 12 tokens; A and B each swap ONE end token: j(A,T0) = j(B,T0)
    // = 9/11 >= 0.8, but j(A,B) = 8/12 < 0.8 — so {1,2} and {10,11}
    // stay separate until T0 lands and bridges them
    val t0 = (1 to 12).map(i => s"w$i").mkString(" ")
    val ta = ((1 to 11).map(i => s"w$i") :+ "xx").mkString(" ")
    val tb = ("yy" +: (2 to 12).map(i => s"w$i")).mkString(" ")
    val f1 = Seq((1L, ta), (2L, ta)).toDF("doc_id", "text")
    val f2 = Seq((10L, tb), (11L, tb)).toDF("doc_id", "text")
    val f3 = Seq((5L, t0)).toDF("doc_id", "text")

    // drain the first two files: two SEPARATE components
    val feedA = landFiles(s"$work/landing", Seq(f1, f2))
    val mid = ClusterStream.streamClusters(spark, feedA,
      s"$work/store", s"$work/ckpt")
    assert(streamedClusters(mid) == Set((1L, 1L), (2L, 1L), (10L, 10L), (11L, 10L)))

    // the bridge arrives (same checkpoint lineage — the store's batch
    // pointer tracks ONE stream): everything collapses to comp=1
    val feedB = landFiles(s"$work/landing", Seq(f3))
    val fin = ClusterStream.streamClusters(spark, feedB,
      s"$work/store", s"$work/ckpt")
    val expected = Set(1L, 2L, 5L, 10L, 11L).map(_ -> 1L)
    assert(streamedClusters(fin) == expected)
    // and it still equals the batch CC over everything
    assert(streamedClusters(fin) ==
      batchClusters(f1.unionByName(f2).unionByName(f3)))
  }

  test("folds rewrite only touched buckets; untouched dirs carry forward") {
    val work = graft.util.Workspace.temp("clusterstream-buckets")
    val f1 = Seq((1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val f2 = Seq((30L, "one two three four five six"),
      (31L, "one two three four five six")).toDF("doc_id", "text")
    val feed = landFiles(s"$work/landing", Seq(f1, f2))
    ClusterStream.streamClusters(spark, feed, s"$work/store", s"$work/ckpt")
    // batch 0 wrote {1,2}; batch 1 touched only {30,31}'s buckets, so
    // batch 0's bucket dirs must still be live (carried forward by the
    // manifest, not rewritten)
    val b0 = java.nio.file.Paths.get(s"$work/store/labels/data/batch=0")
    assert(java.nio.file.Files.exists(b0), "untouched batch-0 buckets swept")
    val leaves = java.nio.file.Files.list(b0)
    val kept = try leaves.iterator().hasNext finally leaves.close()
    assert(kept, "batch 0 must retain at least one live bucket dir")
    assert(streamedClusters(ClusterStream.clusters(spark, s"$work/store")) ==
      Set((1L, 1L), (2L, 1L), (30L, 30L), (31L, 30L)))
  }

  test("compactStores bin-packs the sig/band dirs; later folds probe the consolidated store") {
    val work = graft.util.Workspace.temp("clusterstream-compact")
    val fam = "alpha beta gamma delta epsilon zeta eta"
    // 8 one-doc files -> 8 batches -> 8 sig dirs + 8 band dirs
    val frames = (0 until 8).map { i =>
      val text = if (i % 2 == 0) fam else s"unique filler number $i with words"
      Seq((i.toLong, text)).toDF("doc_id", "text")
    }
    val feed = landFiles(s"$work/landing", frames)
    ClusterStream.streamClusters(spark, feed, s"$work/store", s"$work/ckpt")
    def dirCount(area: String) =
      java.nio.file.Files.list(java.nio.file.Paths.get(s"$work/store/$area"))
        .filter(java.nio.file.Files.isDirectory(_)).count()
    assert(dirCount("sigs") == 8 && dirCount("bands") == 8)
    val before = ClusterStream.compactStores(spark, s"$work/store", minDirs = 4)
    assert(before.contains((8, 8)))
    assert(dirCount("sigs") == 1 && dirCount("bands") == 1,
      "replaced dirs swept after the manifest swap")
    // idempotent: a second compaction has nothing to do
    assert(ClusterStream.compactStores(spark, s"$work/store", minDirs = 4).isEmpty)
    // a later drain (same checkpoint lineage) probes the consolidated
    // store: the new twin must join the existing even-doc family
    val feed2 = landFiles(s"$work/landing", Seq(
      Seq((100L, fam)).toDF("doc_id", "text")))
    val fin = ClusterStream.streamClusters(spark, feed2,
      s"$work/store", s"$work/ckpt")
    val famIds = Set(0L, 2L, 4L, 6L, 100L)
    assert(streamedClusters(fin).filter(x => famIds(x._1)) == famIds.map(_ -> 0L),
      "post-compaction probe must still find the family")
  }

  test("a re-delivered batch id is a no-op; edge-free batches advance the pointer") {
    val work = graft.util.Workspace.temp("clusterstream-replay")
    val f1 = Seq((1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    // f2's doc is too short to shingle (< 3 tokens): the fold must
    // advance the pointer without registering an empty dir the next
    // fold's multi-dir probe would choke on
    val f2 = Seq((8L, "too short")).toDF("doc_id", "text")
    val f3 = Seq((9L, "totally unrelated words without any twin")).toDF("doc_id", "text")
    val feed = landFiles(s"$work/landing", Seq(f1, f2, f3))
    ClusterStream.streamClusters(spark, feed, s"$work/store", s"$work/ckpt")
    val committed = streamedClusters(ClusterStream.clusters(spark, s"$work/store"))
    val last = ClusterStream.lastBatch(s"$work/store").get
    assert(last >= 2, "edge-free and unshingleable batches must still advance the pointer")
    // crash-window redelivery of the LAST batch: must change nothing
    ClusterStream.fold(spark, s"$work/store", f1, "doc_id", "text",
      shingleK = 3, threshold = 0.8, k = 128, bands = 32,
      nBuckets = ClusterStream.DefaultBuckets, batchId = last)
    assert(ClusterStream.lastBatch(s"$work/store").contains(last))
    assert(streamedClusters(ClusterStream.clusters(spark, s"$work/store")) == committed)
  }
}
