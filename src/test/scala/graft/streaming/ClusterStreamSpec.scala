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
    // per-batch sig dirs land FLAT (write-optimized — the partitioned
    // layout is compaction's job); the manifest stamps the bucket count
    val m = ClusterStream.readManifest(s"$work/store").get
    assert(m.sigBk == ClusterStream.SigBuckets)
    import scala.jdk.CollectionConverters._
    val leaves = java.nio.file.Files.list(
        java.nio.file.Paths.get(s"$work/store/sigs/batch=0")).iterator.asScala
      .map(_.getFileName.toString).toSeq
    assert(!leaves.exists(_.startsWith("__bk=")),
      s"per-batch sig dirs must stay flat, got $leaves")
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
    assert(before.exists(t => t._1 == 8 && t._2 == 8))
    assert(dirCount("sigs") == 1 && dirCount("bands") == 1 &&
      dirCount("edges") == 1,
      "replaced dirs swept after the manifest swap")
    // the compacted sig dir is the READ-OPTIMIZED layout: id-bucket
    // partitioned, so later folds' verify fetch prunes to candidates
    import scala.jdk.CollectionConverters._
    val compactDir = java.nio.file.Files.list(
        java.nio.file.Paths.get(s"$work/store/sigs")).iterator.asScala.next()
    val bkLeaves = java.nio.file.Files.list(compactDir).iterator.asScala
      .map(_.getFileName.toString).toSeq
    assert(bkLeaves.exists(_.startsWith("__bk=")),
      s"compacted sig dir must be __bk-partitioned, got $bkLeaves")
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

  test("member guard: a small-edge fold into an oversized component routes to the distributed path") {
    val work = graft.util.Workspace.temp("clusterstream-memberguard")
    val fam = "alpha beta gamma delta epsilon zeta eta theta"
    // batch 0 (fast path): 3 twins -> 3 internal edges == guard
    ClusterStream.fold(spark, s"$work/store",
      Seq((1L, fam), (2L, fam), (3L, fam)).toDF("doc_id", "text"),
      "doc_id", "text", 3, 0.8, 128, 32, ClusterStream.DefaultBuckets,
      batchId = 0, maxLocalEdges = 4)
    val m0 = ClusterStream.readManifest(s"$work/store").get
    assert(m0.buckets.values.forall(_.startsWith("data/batch=0/")),
      "batch 0 must have taken the fast path (only its own buckets)")
    // batch 1: ONE new twin -> 3 cross edges <= guard, but the touched
    // component has 3 members: 3 + 3 > 4 routes to foldDistributed,
    // whose full rewrite repoints EVERY bucket at batch 1
    ClusterStream.fold(spark, s"$work/store",
      Seq((4L, fam)).toDF("doc_id", "text"),
      "doc_id", "text", 3, 0.8, 128, 32, ClusterStream.DefaultBuckets,
      batchId = 1, maxLocalEdges = 4)
    val m1 = ClusterStream.readManifest(s"$work/store").get
    assert(m1.buckets.nonEmpty &&
      m1.buckets.values.forall(_.startsWith("data/batch=1/")),
      s"member-guarded fold must rewrite the full store, got ${m1.buckets}")
    // and the distributed fold's labels still equal the batch CC
    val all = Seq((1L, fam), (2L, fam), (3L, fam), (4L, fam))
      .toDF("doc_id", "text")
    assert(streamedClusters(ClusterStream.clusters(spark, s"$work/store")) ==
      batchClusters(all))
    // a later fast-path fold reads the distributed store back fine
    ClusterStream.fold(spark, s"$work/store",
      Seq((9L, fam)).toDF("doc_id", "text"),
      "doc_id", "text", 3, 0.8, 128, 32, ClusterStream.DefaultBuckets,
      batchId = 2, maxLocalEdges = 1L << 22)
    assert(streamedClusters(ClusterStream.clusters(spark, s"$work/store")) ==
      (1L to 4L).map(_ -> 1L).toSet + (9L -> 1L))
    // the maintained row total stays exact across fast AND distributed
    // folds — it is the zero-job upper bound the member guard trusts
    assert(ClusterStream.readManifest(s"$work/store").get.rows == 5L)
  }

  test("edge guard: an over-guard first batch folds through the distributed path correctly") {
    val work = graft.util.Workspace.temp("clusterstream-distributed")
    val fam = "alpha beta gamma delta epsilon zeta eta theta"
    val f1 = Seq((1L, fam), (2L, fam), (3L, fam)).toDF("doc_id", "text")
    // 3 internal edges > maxLocalEdges=2: distributed from an empty store
    val feed = landFiles(s"$work/landing", Seq(f1))
    val out = ClusterStream.streamClusters(spark, feed,
      s"$work/store", s"$work/ckpt", maxLocalEdges = 2)
    assert(streamedClusters(out) == batchClusters(f1))
    val m = ClusterStream.readManifest(s"$work/store").get
    assert(m.buckets.values.forall(_.startsWith("data/batch=0/")))
  }

  test("expire drops old docs, re-roots retained components (batch CC over the retained window)") {
    val work = graft.util.Workspace.temp("clusterstream-expire")
    val fam = "alpha beta gamma delta epsilon zeta eta theta"
    def fold1(id: Long, text: String, b: Long) =
      ClusterStream.fold(spark, s"$work/store",
        Seq((id, text)).toDF("doc_id", "text"),
        "doc_id", "text", 3, 0.8, 128, 32,
        ClusterStream.DefaultBuckets, batchId = b)
    fold1(1L, fam, 0); fold1(2L, fam, 1); fold1(3L, fam, 2)
    assert(streamedClusters(ClusterStream.clusters(spark, s"$work/store")) ==
      Set((1L, 1L), (2L, 1L), (3L, 1L)))
    // expire batch 0: doc 1 leaves; edge (3,2) survives (batch 2, both
    // retained); the component re-roots at min retained id 2
    val stats = ClusterStream.expire(spark, s"$work/store", fromBatch = 1)
    assert(stats.contains((2L, 2L)), s"retained (docs, labels): $stats")
    assert(streamedClusters(ClusterStream.clusters(spark, s"$work/store")) ==
      Set((2L, 2L), (3L, 2L)))
    // a post-expiry fold probes only the retained window: a new famA
    // twin joins {2,3}; a twin of EXPIRED doc text still joins (same
    // family) — so use a doc similar only to nothing retained
    fold1(6L, fam, 3)
    assert(streamedClusters(ClusterStream.clusters(spark, s"$work/store")) ==
      Set((2L, 2L), (3L, 2L), (6L, 2L)))
    // expire reset the maintained row total; the post-expiry fold kept
    // it exact
    assert(ClusterStream.readManifest(s"$work/store").get.rows == 3L)
  }

  test("expire SPLITS a component whose bridge doc expired (labels alone could not)") {
    val work = graft.util.Workspace.temp("clusterstream-expire-bridge")
    // the bridge triple from the merge test: j(A,T0)=j(B,T0)>=0.8 but
    // j(A,B)<0.8 — T0 is the only connectivity between A and B
    val t0 = (1 to 12).map(i => s"w$i").mkString(" ")
    val ta = ((1 to 11).map(i => s"w$i") :+ "xx").mkString(" ")
    val tb = ("yy" +: (2 to 12).map(i => s"w$i")).mkString(" ")
    def fold1(id: Long, text: String, b: Long) =
      ClusterStream.fold(spark, s"$work/store",
        Seq((id, text)).toDF("doc_id", "text"),
        "doc_id", "text", 3, 0.8, 128, 32,
        ClusterStream.DefaultBuckets, batchId = b)
    fold1(5L, t0, 0); fold1(1L, ta, 1); fold1(10L, tb, 2)
    assert(streamedClusters(ClusterStream.clusters(spark, s"$work/store")) ==
      Set((1L, 1L), (5L, 1L), (10L, 1L)))
    // T0 expires: every retained edge had T0 as an endpoint, so the
    // retained-window CC is EMPTY — A and B must split apart, exactly
    // as a batch run over {A, B} alone would produce
    ClusterStream.expire(spark, s"$work/store", fromBatch = 1)
    assert(streamedClusters(ClusterStream.clusters(spark, s"$work/store")).isEmpty)
    // and a retained doc's twin still finds it post-expiry
    fold1(11L, tb, 3)
    assert(streamedClusters(ClusterStream.clusters(spark, s"$work/store")) ==
      Set((10L, 10L), (11L, 10L)))
  }

  test("a second checkpoint lineage on the same store fails loudly instead of no-oping") {
    val work = graft.util.Workspace.temp("clusterstream-lineage")
    val fam = "alpha beta gamma delta epsilon zeta"
    val f1 = Seq((1L, fam), (2L, fam)).toDF("doc_id", "text")
    val feedA = landFiles(s"$work/landingA", Seq(f1))
    ClusterStream.streamClusters(spark, feedA, s"$work/store", s"$work/ckptA")
    val f2 = Seq((3L, fam)).toDF("doc_id", "text")
    val feedB = landFiles(s"$work/landingB", Seq(f2))
    val ex = intercept[Exception] {
      ClusterStream.streamClusters(spark, feedB, s"$work/store", s"$work/ckptB")
    }
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ chain(t.getCause)
    assert(chain(ex).exists(_.contains("bound to checkpoint lineage")),
      s"expected the lineage guard, got: ${chain(ex).mkString(" | ")}")
    // the original lineage still resumes fine
    val f3 = Seq((4L, fam)).toDF("doc_id", "text")
    val feedA2 = landFiles(s"$work/landingA", Seq(f3))
    val fin = ClusterStream.streamClusters(spark, feedA2,
      s"$work/store", s"$work/ckptA")
    assert(streamedClusters(fin) == Set((1L, 1L), (2L, 1L), (4L, 1L)))
  }

  test("compaction aborts when the store advances mid-run; the lock blocks concurrent folds") {
    val work = graft.util.Workspace.temp("clusterstream-compact-guard")
    val fam = "alpha beta gamma delta epsilon zeta eta"
    def fold1(id: Long, b: Long) =
      ClusterStream.fold(spark, s"$work/store",
        Seq((id, fam)).toDF("doc_id", "text"),
        "doc_id", "text", 3, 0.8, 128, 32,
        ClusterStream.DefaultBuckets, batchId = b)
    (0L until 4L).foreach(b => fold1(b, b))
    val m = ClusterStream.readManifest(s"$work/store").get
    // pointer moves between the consolidated writes and the swap ->
    // the swap must abort (a fold committed dirs the swap would drop)
    val ex = intercept[IllegalArgumentException] {
      ClusterStream.compactStoresImpl(spark, s"$work/store", minDirs = 2,
        beforeSwap = () =>
          ClusterStream.writeManifest(s"$work/store",
            m.copy(batchId = m.batchId + 1)))
    }
    assert(ex.getMessage.contains("advanced during compaction"))
    // ... and the store still reads (the swap never happened)
    assert(streamedClusters(ClusterStream.clusters(spark, s"$work/store")) ==
      (0L until 4L).map(_ -> 0L).toSet)
    // a held lock makes a fold fail loudly instead of racing the sweep
    val lock = java.nio.file.Paths.get(s"$work/store/labels/COMPACT.lock")
    java.nio.file.Files.createFile(lock)
    val ex2 = intercept[IllegalArgumentException] { fold1(99L, 9L) }
    assert(ex2.getMessage.contains("COMPACT.lock"))
    java.nio.file.Files.delete(lock)
    // expire carries the same mid-run pointer guard
    val m3 = ClusterStream.readManifest(s"$work/store").get
    val ex3 = intercept[IllegalArgumentException] {
      ClusterStream.expireImpl(spark, s"$work/store", fromBatch = 1,
        beforeSwap = () =>
          ClusterStream.writeManifest(s"$work/store",
            m3.copy(batchId = m3.batchId + 1)))
    }
    assert(ex3.getMessage.contains("advanced during expiry"))
  }

  test("PROPERTY: the driver union-find equals the distributed CC on random graphs (min-label twin)") {
    // the fast path's correctness rests on unionFind producing exactly
    // Dedup.connectedComponents' canonical labels (comp = min id of the
    // component, SQL min ordering) — pinned on random edge sets instead
    // of argued from the implementation
    val gen = org.scalacheck.Gen.listOfN(40,
      org.scalacheck.Gen.zip(
        org.scalacheck.Gen.choose(0L, 24L), org.scalacheck.Gen.choose(0L, 24L)))
    var seed = org.scalacheck.rng.Seed(42L)
    (1 to 25).foreach { _ =>
      val edges = gen.pureApply(org.scalacheck.Gen.Parameters.default, seed)
        .filter { case (a, b) => a != b }
      seed = seed.next
      val ord = org.apache.spark.sql.catalyst.util.TypeUtils
        .getInterpretedOrdering(org.apache.spark.sql.types.LongType)
      val local = ClusterStream.unionFind(
        edges.map { case (a, b) => (a: Any, b: Any) }.toArray, ord)
      val dist = Dedup.connectedComponents(
          edges.toDF("a", "b"), "a", "b")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(local == dist,
        s"union-find diverged from the distributed CC on $edges:\n" +
          s"local=$local\ndist=$dist")
    }
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
