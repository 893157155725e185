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
    assert(m0.buckets.values.forall(_ == "data/batch=0"),
      "batch 0 must have taken the fast path (one flat run)")
    // batch 1: ONE new twin -> 3 cross edges <= guard, but the touched
    // component has 3 members: 3 + 3 > 4 routes to foldDistributed.
    // Every store row belongs to the touched component here, so the
    // touched-bucket rewrite covers every bucket
    ClusterStream.fold(spark, s"$work/store",
      Seq((4L, fam)).toDF("doc_id", "text"),
      "doc_id", "text", 3, 0.8, 128, 32, ClusterStream.DefaultBuckets,
      batchId = 1, maxLocalEdges = 4)
    val m1 = ClusterStream.readManifest(s"$work/store").get
    assert(m1.buckets.nonEmpty &&
      m1.buckets.values.forall(_.startsWith("data/batch=1/")),
      s"every bucket held touched rows, so all repoint at batch 1: ${m1.buckets}")
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

  test("an over-guard fold rewrites only the touched buckets; untouched pointers carry forward") {
    val work = graft.util.Workspace.temp("clusterstream-touched-dist")
    val store = s"$work/store"
    val famA = "alpha beta gamma delta epsilon zeta eta theta"
    val famB = "one two three four five six seven eight nine"
    def fold1(docs: Seq[(Long, String)], b: Long, guard: Long) =
      ClusterStream.fold(spark, store, docs.toDF("doc_id", "text"),
        "doc_id", "text", 3, 0.8, 128, 32, ClusterStream.DefaultBuckets,
        batchId = b, maxLocalEdges = guard)
    fold1(Seq((1L, famA), (2L, famA), (10L, famB), (11L, famB)), 0, 1L << 22)
    val m0 = ClusterStream.readManifest(store).get
    val lt = org.apache.spark.sql.types.LongType
    val famBBks = Set(10L, 11L)
      .map(ClusterStream.bucketOfValue(_, lt, m0.nBuckets))
    val famABks = Set(1L, 2L, 4L, 5L)
      .map(ClusterStream.bucketOfValue(_, lt, m0.nBuckets))
    assert(famBBks.intersect(famABks).isEmpty,
      "test ids must hash to disjoint buckets — pick different ids")
    // member-guard route (roots known from the probe): 2 cross edges +
    // 2 existing members > guard 3 -> distributed, but famB's buckets
    // hold no touched rows and must NOT be rewritten
    fold1(Seq((4L, famA)), 1, 3)
    val m1 = ClusterStream.readManifest(store).get
    famBBks.foreach(bk => assert(m1.buckets(bk) == m0.buckets(bk),
      s"untouched bucket $bk must carry forward: ${m1.buckets(bk)}"))
    Set(1L, 2L, 4L).map(ClusterStream.bucketOfValue(_, lt, m0.nBuckets))
      .foreach(bk => assert(m1.buckets(bk).startsWith("data/batch=1/"),
        s"touched bucket $bk must repoint: ${m1.buckets(bk)}"))
    assert(m1.rows == 5L, "the maintained total stays exact")
    // edge-guard route (batch too big to collect — roots derived
    // distributively): same touched-only rewrite
    fold1(Seq((5L, famA)), 2, 1)
    val m2 = ClusterStream.readManifest(store).get
    famBBks.foreach(bk => assert(m2.buckets(bk) == m0.buckets(bk),
      s"untouched bucket $bk must survive the edge-guard fold"))
    assert(m2.rows == 6L)
    // and the labels still equal the batch CC over everything fed
    val all = Seq((1L, famA), (2L, famA), (10L, famB), (11L, famB),
      (4L, famA), (5L, famA)).toDF("doc_id", "text")
    assert(streamedClusters(ClusterStream.clusters(spark, store)) ==
      batchClusters(all))
    assertIdxConsistent(store)
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

  test("byte guard: wide string ids route distributed below the edge-count ceiling") {
    val work = graft.util.Workspace.temp("clusterstream-byteguard")
    val fam = "alpha beta gamma delta epsilon zeta eta theta"
    // ~200-char URL-ish ids: ONE edge, far below any count ceiling,
    // but each collected pair is ~400B of id payload
    def wid(n: Int) = s"https://example.test/docs/${"x" * 160}/item-$n"
    val docs = Seq((wid(1), fam), (wid(2), fam)).toDF("doc_id", "text")
    // control: with the default byte ceiling the 1-edge fold takes the
    // fast path (one flat label run)
    ClusterStream.fold(spark, s"$work/fast", docs, "doc_id", "text",
      3, 0.8, 128, 32, ClusterStream.DefaultBuckets, batchId = 0)
    val mf = ClusterStream.readManifest(s"$work/fast").get
    assert(mf.buckets.values.forall(_ == "data/batch=0"),
      s"long-id-equivalent widths under the ceiling stay fast: ${mf.buckets}")
    // a tight byte ceiling (64B < one ~430B pair) must route the SAME
    // fold distributed even though eCount=1 << maxLocalEdges
    ClusterStream.fold(spark, s"$work/store", docs, "doc_id", "text",
      3, 0.8, 128, 32, ClusterStream.DefaultBuckets, batchId = 0,
      maxLocalEdgeBytes = 64L)
    val m = ClusterStream.readManifest(s"$work/store").get
    assert(m.buckets.nonEmpty &&
      m.buckets.values.forall(_.startsWith("data/batch=0/")),
      s"wide-id fold must take the distributed path: ${m.buckets}")
    // and the labels are the batch CC regardless of route
    val got = ClusterStream.clusters(spark, s"$work/store")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(wid(1) -> wid(1), wid(2) -> wid(1)))
    // fixed-width ids price statically: no agg, fast path untouched
    assert(ClusterStream.estimatedPairBytes(
      spark.emptyDataFrame, 1000L,
      org.apache.spark.sql.types.LongType, 1L << 28) == 16L)
    // StringType prices UTF-16 heap (2x the measured UTF-8 octets for
    // ASCII ids), not raw octets: 8 octets -> 16 + 32 overhead
    assert(ClusterStream.estimatedPairBytes(
      Seq(("abcd", "efgh")).toDF("a", "b"), 1L,
      org.apache.spark.sql.types.StringType, 1L << 28) == 48L)
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

  test("expiry rewrites ONLY touched state: retained runs and untouched label buckets carry forward by reference") {
    val work = graft.util.Workspace.temp("clusterstream-expire-touch")
    val famA = "alpha beta gamma delta epsilon zeta eta theta"
    val famB = "one two three four five six seven eight nine"
    val famC = "red orange yellow green blue indigo violet ultra"
    def fold(docs: Seq[(Long, String)], b: Long) =
      ClusterStream.fold(spark, s"$work/store",
        docs.toDF("doc_id", "text"), "doc_id", "text", 3, 0.8, 128, 32,
        ClusterStream.DefaultBuckets, batchId = b)
    // famA spans the horizon (touched, fully dies: doc 3's only edges
    // go to expired docs); famB and famC are wholly retained — famC
    // even SPANS two retained batches
    fold(Seq((1L, famA), (2L, famA)), 0)
    fold(Seq((3L, famA), (20L, famB), (21L, famB), (30L, famC)), 1)
    fold(Seq((31L, famC)), 2)
    assert(streamedClusters(ClusterStream.clusters(spark, s"$work/store")) ==
      Set((1L, 1L), (2L, 1L), (3L, 1L), (20L, 20L), (21L, 20L),
        (30L, 30L), (31L, 30L)))
    val before = ClusterStream.readManifest(s"$work/store").get
    // the pin's precondition: the touched comp's member buckets are
    // disjoint from the untouched comps' (deterministic murmur3 — if a
    // future id change collides, pick different ids)
    def bk(id: Long) = ClusterStream.bucketOfValue(id,
      org.apache.spark.sql.types.LongType, before.nBuckets)
    val touchedBks = Set(1L, 2L, 3L).map(bk)
    val untouchedBks = Set(20L, 21L, 30L, 31L).map(bk)
    assert(touchedBks.intersect(untouchedBks).isEmpty, "bucket collision")
    // wholly-retained flat runs: record a data file's mtime
    import scala.jdk.CollectionConverters._
    def dataFile(rel: String): java.nio.file.Path = {
      val s = java.nio.file.Files.list(
        java.nio.file.Paths.get(s"$work/store/$rel"))
      try s.iterator.asScala.find(_.getFileName.toString.endsWith(".parquet"))
        .get
      finally s.close()
    }
    val pinned = Seq("sigs/batch=1", "sigs/batch=2", "bands/batch=1",
      "edges/batch=1").map(rel => (rel, dataFile(rel),
      java.nio.file.Files.getLastModifiedTime(dataFile(rel))))

    val stats = ClusterStream.expire(spark, s"$work/store", fromBatch = 1)
    assert(stats.contains((5L, 4L)), s"(retained docs, labels): $stats")
    // labels equal the batch CC over the retained docs (doc 3 is
    // unlabeled: its only edges went to expired docs — DEAD edges in a
    // carried-forward dir, filtered at read)
    val retainedDocs = Seq((3L, famA), (20L, famB), (21L, famB),
      (30L, famC), (31L, famC)).toDF("doc_id", "text")
    assert(streamedClusters(ClusterStream.clusters(spark, s"$work/store")) ==
      batchClusters(retainedDocs))
    val after = ClusterStream.readManifest(s"$work/store").get
    // every retained run carried forward AS A MANIFEST REFERENCE —
    // identical rel paths, no expire-* rewrite anywhere
    assert(after.sigDirs == Seq("sigs/batch=1", "sigs/batch=2"),
      after.sigDirs.toString)
    assert(after.bandDirs == Seq("bands/batch=1", "bands/batch=2"),
      after.bandDirs.toString)
    assert(after.edgeDirs == Seq("edges/batch=1", "edges/batch=2"),
      after.edgeDirs.toString)
    // ... and their files were not rewritten (same path, same mtime)
    pinned.foreach { case (rel, path, mtime) =>
      assert(java.nio.file.Files.exists(path), s"$rel data file vanished")
      assert(java.nio.file.Files.getLastModifiedTime(path) == mtime,
        s"$rel was rewritten by an expiry that never touched it")
    }
    // untouched label BUCKETS kept their exact pointers; touched ones
    // moved to the expiry generation or left the map (comp died)
    untouchedBks.foreach { b =>
      assert(after.buckets.get(b) == before.buckets.get(b),
        s"untouched bucket $b was repointed")
    }
    touchedBks.foreach { b =>
      assert(!after.buckets.contains(b),
        s"touched bucket $b should have left the map (its comp died)")
    }
    // the store still folds correctly after the touched-only cut
    fold(Seq((32L, famC)), 3)
    assert(streamedClusters(ClusterStream.clusters(spark, s"$work/store"))
      .filter(_._2 == 30L).map(_._1) == Set(30L, 31L, 32L))
  }

  test("an expiry that crashes before its swap leaves the store intact; the retry self-heals its ghosts") {
    val work = graft.util.Workspace.temp("clusterstream-expire-crash")
    val store = s"$work/store"
    val famA = "alpha beta gamma delta epsilon zeta eta theta"
    val famB = "one two three four five six seven eight nine"
    def fold(docs: Seq[(Long, String)], b: Long) =
      ClusterStream.fold(spark, store,
        docs.toDF("doc_id", "text"), "doc_id", "text", 3, 0.8, 128, 32,
        ClusterStream.DefaultBuckets, batchId = b)
    fold(Seq((1L, famA), (2L, famA)), 0)
    fold(Seq((3L, famA), (20L, famB), (21L, famB)), 1)
    // compact first so the cut has a CONSOLIDATED dir to rewrite (the
    // crash window's interesting case: a half-written expire-* ghost)
    assert(ClusterStream.compactStores(spark, store, minDirs = 2).isDefined)
    val before = streamedClusters(ClusterStream.clusters(spark, store))
    // crash INSIDE the window: cut dirs written, swap never happens
    val boom = intercept[RuntimeException] {
      ClusterStream.expireImpl(spark, store, fromBatch = 1,
        beforeSwap = () => throw new RuntimeException("crash before swap"))
    }
    assert(boom.getMessage.contains("crash before swap"))
    // the manifest never moved: the store reads exactly as before, the
    // ghost expire-* dirs are invisible (referenced-never-deleted means
    // unreferenced-never-read)
    assert(streamedClusters(ClusterStream.clusters(spark, store)) == before)
    // the retried expiry overwrites its ghosts under the same
    // deterministic names and commits; the read-out is the retained CC
    val stats = ClusterStream.expire(spark, store, fromBatch = 1)
    assert(stats.isDefined, "retry after crash must succeed")
    assert(streamedClusters(ClusterStream.clusters(spark, store)) ==
      batchClusters(Seq((3L, famA), (20L, famB), (21L, famB))
        .toDF("doc_id", "text")))
    // nothing unreferenced survives the successful retry's sweep
    val m = ClusterStream.readManifest(store).get
    import scala.jdk.CollectionConverters._
    Seq("sigs", "bands", "edges").foreach { area =>
      val base = java.nio.file.Paths.get(store, area)
      if (java.nio.file.Files.exists(base)) {
        val ls = java.nio.file.Files.list(base)
        val children =
          try ls.iterator.asScala.map(_.getFileName.toString).toSet
          finally ls.close()
        val live = (m.sigDirs ++ m.bandDirs ++ m.edgeDirs)
          .filter(_.startsWith(s"$area/")).map(_.stripPrefix(s"$area/")).toSet
        assert(children == live,
          s"$area holds unswept ghosts: ${children.diff(live)}")
      }
    }
    // and the store still folds
    fold(Seq((22L, famB)), 2)
    assert(streamedClusters(ClusterStream.clusters(spark, store))
      .filter(_._2 == 20L).map(_._1) == Set(20L, 21L, 22L))
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

  test("expire refuses a store with unstamped (pre-upgrade) sig rows instead of silently dropping them") {
    val work = graft.util.Workspace.temp("clusterstream-prestamp")
    val store = s"$work/store"
    val fam = "alpha beta gamma delta epsilon zeta eta"
    def fold1(id: Long, b: Long) =
      ClusterStream.fold(spark, store,
        Seq((id, fam)).toDF("doc_id", "text"),
        "doc_id", "text", 3, 0.8, 128, 32,
        ClusterStream.DefaultBuckets, batchId = b)
    fold1(1L, 0); fold1(2L, 1)
    // a FRESH store is stamped at its first fold — the probe is a free
    // manifest read for every post-upgrade store
    assert(ClusterStream.readManifest(store).get.ver ==
      ClusterStream.StampedVer)
    // simulate a LEGACY store that still carries pre-upgrade rows:
    // strip the landing stamp from batch 0's sig dir (its rows would
    // read back as null __batch and the `>= fromBatch` cut would
    // silently drop them along with their never-persisted edges) AND
    // downgrade the manifest to the pre-upgrade read default (ver 0,
    // what every manifest written before the stamp reads as)
    val d = s"$store/sigs/batch=0"
    val stripped = spark.read.parquet(d).drop("__batch").localCheckpoint(true)
    stripped.write.mode("overwrite").parquet(d)
    def downgrade(): Unit = {
      val m = ClusterStream.readManifest(store).get
      ClusterStream.writeManifest(store, m.copy(ver = 0))
    }
    downgrade()
    val e = intercept[IllegalArgumentException] {
      ClusterStream.expire(spark, store, fromBatch = 0)
    }
    assert(e.getMessage.contains("landing-batch stamp"), e.getMessage)
    // same refusal when the column exists but holds nulls (a compacted
    // mixed-era store reads pre-upgrade rows as null through merge)
    val nulled = spark.read.parquet(d)
      .withColumn("__batch", lit(null).cast("long")).localCheckpoint(true)
    nulled.write.mode("overwrite").parquet(d)
    val e2 = intercept[IllegalArgumentException] {
      ClusterStream.expire(spark, store, fromBatch = 0)
    }
    assert(e2.getMessage.contains("landing-batch stamp"), e2.getMessage)
    // the refused store is untouched and still reads
    assert(streamedClusters(ClusterStream.clusters(spark, store)) ==
      Set((1L, 1L), (2L, 1L)))
  }

  test("the manifest version stamp replaces expiry's null probe; a passing legacy probe upgrades once") {
    val work = graft.util.Workspace.temp("clusterstream-verstamp")
    val store = s"$work/store"
    val fam = "alpha beta gamma delta epsilon zeta eta"
    def fold1(id: Long, b: Long) =
      ClusterStream.fold(spark, store,
        Seq((id, fam)).toDF("doc_id", "text"),
        "doc_id", "text", 3, 0.8, 128, 32,
        ClusterStream.DefaultBuckets, batchId = b)
    fold1(1L, 0); fold1(2L, 1); fold1(3L, 2)
    // a legacy manifest (ver 0) over FULLY-STAMPED rows: the one-time
    // probe passes and the expiry swap upgrades the stamp
    val m0 = ClusterStream.readManifest(store).get
    ClusterStream.writeManifest(store, m0.copy(ver = 0))
    assert(ClusterStream.expire(spark, store, fromBatch = 1).isDefined)
    assert(ClusterStream.readManifest(store).get.ver ==
      ClusterStream.StampedVer,
      "a passing probe must upgrade the stamp so it is paid at most once")
    assert(streamedClusters(ClusterStream.clusters(spark, store)) ==
      Set((2L, 2L), (3L, 2L)))
    // PROOF the scan is gone on stamped stores: null-stamp rows
    // smuggled under a StampedVer manifest do NOT trip the probe (the
    // old code scanned and refused; the stamp is now the contract and
    // the cut simply drops the nulls)
    val sigDir = ClusterStream.readManifest(store).get.sigDirs.head
    val smuggled = spark.read.parquet(s"$store/$sigDir")
      .withColumn("__batch", lit(null).cast("long")).localCheckpoint(true)
    smuggled.write.mode("overwrite").parquet(s"$store/$sigDir")
    assert(ClusterStream.expireImpl(spark, store, fromBatch = 2,
      beforeSwap = () => ()).isDefined,
      "a StampedVer manifest must make the stamp check a free manifest read")
  }

  test("a fold whose commit lands after a maintenance swap aborts instead of clobbering it (TOCTOU)") {
    val work = graft.util.Workspace.temp("clusterstream-toctou")
    val store = s"$work/store"
    val fam = "alpha beta gamma delta epsilon zeta eta"
    def fold1(id: Long, b: Long) =
      ClusterStream.fold(spark, store,
        Seq((id, fam)).toDF("doc_id", "text"),
        "doc_id", "text", 3, 0.8, 128, 32,
        ClusterStream.DefaultBuckets, batchId = b)
    (0L until 3L).foreach(b => fold1(b, b))
    val before = ClusterStream.readManifest(store).get
    // a maintenance swap completes INSIDE the fold's window (entered
    // before the lock existed, committing after the swap + sweep): the
    // fold's commit must abort on the moved sequence — committing would
    // repoint the store at dirs the sweep just deleted
    ClusterStream.beforeCommitCheck = dir =>
      if (dir == store && ClusterStream.readManifest(store).get.seq == before.seq)
        ClusterStream.writeManifest(store,
          before.copy(seq = before.seq + 1))
    try {
      val e1 = intercept[IllegalArgumentException] { fold1(50L, 3L) }
      assert(e1.getMessage.contains("changed mid-fold"), e1.getMessage)
    } finally ClusterStream.beforeCommitCheck = _ => ()
    // a maintenance op still RUNNING at commit time (lock held) aborts
    // too — the lock re-check closes the entry-check race from the
    // fold's side
    val lock = java.nio.file.Paths.get(s"$store/labels/COMPACT.lock")
    ClusterStream.beforeCommitCheck = dir =>
      if (dir == store && !java.nio.file.Files.exists(lock))
        java.nio.file.Files.createFile(lock)
    try {
      val e2 = intercept[IllegalArgumentException] { fold1(60L, 4L) }
      assert(e2.getMessage.contains("locked by a maintenance op"), e2.getMessage)
    } finally {
      ClusterStream.beforeCommitCheck = _ => ()
      java.nio.file.Files.deleteIfExists(lock)
    }
    // the store survived both aborts: the swap's manifest is intact and
    // the batch re-delivers cleanly on restart
    assert(ClusterStream.readManifest(store).get.seq == before.seq + 1)
    fold1(50L, 3L)
    assert(streamedClusters(ClusterStream.clusters(spark, store))
      .contains((50L, 0L)))
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

  test("PROPERTY: string-id union-find matches distributed CC on NON-BMP ids (UTF-16 vs UTF-8 order)") {
    // the exact divergence idOrdering targets: U+FF61 (UTF-16 code unit
    // 0xFF61, UTF-8 bytes EF BD A1) vs U+10000 (UTF-16 surrogate pair
    // starting 0xD800, UTF-8 bytes F0 90 80 80). java.lang.String ranks
    // U+10000 < U+FF61; SQL min (UTF8String bytes) ranks U+FF61 <
    // U+10000 — a min-label root chosen with the naive String ordering
    // would disagree with the oracle.
    val ids = IndexedSeq("｡", "𐀀", "a", "z｡",
      "z𐀀", "｡x", "𐀀x", "m", "é", "�")
    // first, the crafted divergence is REAL: the naive ordering picks
    // the other root on the two-node graph (red on the pre-fix shape)
    val naiveMin = Seq("｡", "𐀀").min // java.lang.String order
    val sqlMin = Seq(("｡", "𐀀")).toDF("a", "b")
      .select(least(col("a"), col("b"))).head.getString(0)
    assert(naiveMin == "𐀀" && sqlMin == "｡",
      "the generator must cover ids where UTF-16 and UTF-8 orders diverge")
    val ord = ClusterStream.idOrdering(org.apache.spark.sql.types.StringType)
    assert(ord.compare("｡", "𐀀") < 0,
      "idOrdering must rank as SQL min, not as java.lang.String")
    val gen = org.scalacheck.Gen.listOfN(30,
      org.scalacheck.Gen.zip(
        org.scalacheck.Gen.choose(0, ids.size - 1),
        org.scalacheck.Gen.choose(0, ids.size - 1)))
    var seed = org.scalacheck.rng.Seed(4242L)
    (1 to 20).foreach { _ =>
      val edges = gen.pureApply(org.scalacheck.Gen.Parameters.default, seed)
        .map { case (i, j) => (ids(i), ids(j)) }
        .filter { case (a, b) => a != b }
      seed = seed.next
      val local = ClusterStream.unionFind(
        edges.map { case (a, b) => (a: Any, b: Any) }.toArray, ord)
      val dist = Dedup.connectedComponents(edges.toDF("a", "b"), "a", "b")
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      assert(local == dist,
        s"string union-find diverged from the distributed CC on $edges:\n" +
          s"local=$local\ndist=$dist")
    }
  }

  test("idOrdering converts external types whose internal twin differs (Decimal, Date)") {
    // ADVICE r14: pre-fix, a DecimalType id would ClassCastException in
    // the local union-find (java.math.BigDecimal vs Decimal); the
    // converter-based ordering must rank external values as SQL does
    val dec = ClusterStream.idOrdering(
      org.apache.spark.sql.types.DecimalType(10, 2))
    assert(dec.compare(new java.math.BigDecimal("1.50"),
      new java.math.BigDecimal("2.25")) < 0)
    val date = ClusterStream.idOrdering(org.apache.spark.sql.types.DateType)
    assert(date.compare(java.sql.Date.valueOf("2020-01-01"),
      java.sql.Date.valueOf("2021-01-01")) < 0)
  }

  /** Every label row's denormalized comp index must equal the truth
    * derivable from the labels themselves: members = the component's
    * row count, bks = the set of buckets its members hash to. */
  private def assertIdxConsistent(store: String): Unit = {
    val m = ClusterStream.readManifest(store).get
    // the LIVE rows only — flat fold runs may carry stale superseded
    // rows of repointed buckets, which the pointer-filtered read drops
    val rows = ClusterStream.readBuckets(spark, store, m, m.buckets.keySet)
      .select("id", "comp", "members", "bks")
      .collect()
    val byComp = rows.groupBy(_.getLong(1))
    rows.foreach { r =>
      val ms = byComp(r.getLong(1))
      assert(!r.isNullAt(2) && r.getLong(2) == ms.length.toLong,
        s"row $r: members must be ${ms.length}")
      val expect = ms.map(x => ClusterStream.bucketOfValue(x.getLong(0),
        org.apache.spark.sql.types.LongType, m.nBuckets)).toSet
      assert(r.getSeq[Int](3).toSet == expect,
        s"row $r: bks must be $expect")
    }
  }

  test("the denormalized comp index stays consistent across fast, distributed and expire paths") {
    val work = graft.util.Workspace.temp("clusterstream-compidx")
    val fam = "alpha beta gamma delta epsilon zeta eta theta"
    val famB = "one two three four five six seven eight nine"
    def fold1(docs: Seq[(Long, String)], b: Long,
        guard: Long = 1L << 22) =
      ClusterStream.fold(spark, s"$work/store", docs.toDF("doc_id", "text"),
        "doc_id", "text", 3, 0.8, 128, 32,
        ClusterStream.DefaultBuckets, batchId = b, maxLocalEdges = guard)
    // fast folds: two families grow across batches
    fold1(Seq((1L, fam), (2L, fam)), 0)
    fold1(Seq((10L, famB), (11L, famB), (3L, fam)), 1)
    assertIdxConsistent(s"$work/store")
    // distributed fold (tight guard): full rewrite re-derives the index
    fold1(Seq((4L, fam)), 2, guard = 2)
    assertIdxConsistent(s"$work/store")
    // a fast fold on top of the distributed generation
    fold1(Seq((12L, famB)), 3)
    assertIdxConsistent(s"$work/store")
    // expire recomputes the retained-window CC WITH its index
    ClusterStream.expire(spark, s"$work/store", fromBatch = 1)
    assertIdxConsistent(s"$work/store")
    // and a post-expiry fast fold still maintains it
    fold1(Seq((13L, famB)), 4)
    assertIdxConsistent(s"$work/store")
    // the labels still equal the batch CC over the retained window
    // (batches 1-4's docs)
    val retained = Seq((10L, famB), (11L, famB), (3L, fam), (4L, fam),
      (12L, famB), (13L, famB)).toDF("doc_id", "text")
    assert(streamedClusters(ClusterStream.clusters(spark, s"$work/store")) ==
      batchClusters(retained))
  }

  test("a failed async store write fails the fold loudly, commits nothing, and the redelivery heals") {
    val work = graft.util.Workspace.temp("clusterstream-write-fail")
    val store = s"$work/store"
    val fam = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = Seq((1L, fam), (2L, fam)).toDF("doc_id", "text")
    def fold0() = ClusterStream.fold(spark, store, docs, "doc_id", "text",
      3, 0.8, 128, 32, ClusterStream.DefaultBuckets, batchId = 0)
    ClusterStream.afterStoreWrites =
      _ => sys.error("injected store-write failure")
    try {
      val e = intercept[Exception](fold0())
      assert(e.getMessage.contains("injected store-write failure"),
        s"the fold must surface the write failure, got: ${e.getMessage}")
      // nothing committed: no pointer, so the batch re-delivers
      assert(ClusterStream.lastBatch(store).isEmpty,
        "a fold whose store write failed must not advance the pointer")
    } finally ClusterStream.afterStoreWrites = _ => ()
    // the redelivered batch (same id) folds cleanly over the debris
    fold0()
    assert(ClusterStream.lastBatch(store).contains(0L))
    assert(streamedClusters(ClusterStream.clusters(spark, store)) ==
      batchClusters(docs))
  }

  test("a BLOCKED async store write fails the fold within graft.cluster.storeWriteTimeout") {
    val work = graft.util.Workspace.temp("clusterstream-write-stall")
    val store = s"$work/store"
    val fam = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = Seq((1L, fam), (2L, fam)).toDF("doc_id", "text")
    def fold0() = ClusterStream.fold(spark, store, docs, "doc_id", "text",
      3, 0.8, 128, 32, ClusterStream.DefaultBuckets, batchId = 0)
    // a filesystem stall, simulated on the writer stripe: the hook runs
    // inside the async write, AFTER the parquet writes — the fold's
    // awaits must give up at the configured bound instead of wedging
    val stall = new java.util.concurrent.CountDownLatch(1)
    ClusterStream.afterStoreWrites = _ => stall.await()
    spark.conf.set("graft.cluster.storeWriteTimeout", "2s")
    try {
      val t0 = System.nanoTime()
      val e = intercept[Exception](fold0())
      val took = (System.nanoTime() - t0) / 1e9
      assert(e.getMessage.contains("storeWriteTimeout"),
        s"the fold must name the timeout knob, got: ${e.getMessage}")
      assert(took < 30.0, s"the bounded await must not wedge (took ${took}s)")
      assert(ClusterStream.lastBatch(store).isEmpty,
        "a timed-out fold must not advance the pointer")
    } finally {
      stall.countDown()
      ClusterStream.afterStoreWrites = _ => ()
      spark.conf.unset("graft.cluster.storeWriteTimeout")
    }
    // the redelivered batch (same id) folds cleanly once the FS is back
    fold0()
    assert(ClusterStream.lastBatch(store).contains(0L))
    assert(streamedClusters(ClusterStream.clusters(spark, store)) ==
      batchClusters(docs))
  }

  test("PROPERTY soak: random fold/compact/expire interleavings hold the fold invariant, comp index and row total") {
    // the deterministic LIFECYCLE soak walks ONE maintenance sequence;
    // this walks seeded-random interleavings of all four operations
    // (fast fold, over-guard distributed fold, compaction, expiry) and
    // re-checks the adjudication identity — labels == batch CC over the
    // retained window — plus index consistency and the maintained row
    // total after EVERY step, so any ordering the six-way manifest
    // state space admits that breaks an invariant fails here with its
    // seed and step
    val fams = Vector(
      "alpha beta gamma delta epsilon zeta eta theta",
      "one two three four five six seven eight nine",
      "red orange yellow green blue indigo violet umber",
      "north south east west upward downward leftward rightward")
    for (seed <- Seq(7L, 101L)) {
      val rnd = new scala.util.Random(seed)
      val work = graft.util.Workspace.temp(s"clusterstream-propsoak-$seed")
      val store = s"$work/store"
      var nextId = 0L
      var nextBatch = 0L
      var fed = Vector.empty[(Long, Seq[(Long, String)])]
      var horizon = 0L
      def freshDoc(): (Long, String) = {
        nextId += 1
        val text =
          if (rnd.nextInt(3) == 0) // singleton: never pairs, never labeled
            s"unique filler s$seed n$nextId alone in this corpus m${nextId * 31}"
          else fams(rnd.nextInt(fams.size))
        (nextId, text)
      }
      def doFold(overGuard: Boolean): Unit = {
        val docs = Seq.fill(1 + rnd.nextInt(3))(freshDoc())
        val b = nextBatch; nextBatch += 1
        ClusterStream.fold(spark, store, docs.toDF("doc_id", "text"),
          "doc_id", "text", 3, 0.8, 128, 32,
          ClusterStream.DefaultBuckets, batchId = b,
          maxLocalEdges = if (overGuard) 1L else 1L << 22)
        fed = fed :+ ((b, docs))
      }
      def retained: Seq[(Long, String)] =
        fed.filter(_._1 >= horizon).flatMap(_._2)
      doFold(overGuard = false) // a store must exist before maintenance ops
      (1 to 10).foreach { step =>
        val op = rnd.nextInt(6) match {
          case 0 | 1 | 2 => doFold(overGuard = false); "fold"
          case 3 => doFold(overGuard = true); "fold-distributed"
          case 4 => ClusterStream.compactStores(spark, store, minDirs = 2); "compact"
          case 5 =>
            horizon = math.max(horizon, rnd.between(0L, nextBatch + 1))
            ClusterStream.expire(spark, store, fromBatch = horizon); "expire"
        }
        val at = s"seed=$seed step=$step after $op (horizon=$horizon)"
        val exp = batchClusters(retained.toDF("doc_id", "text"))
        assert(streamedClusters(ClusterStream.clusters(spark, store)) == exp,
          s"fold invariant broken $at")
        // a fully-expired / not-yet-paired store has no label rows to
        // index-check (readBuckets refuses an empty bucket set)
        if (ClusterStream.readManifest(store).exists(_.buckets.nonEmpty))
          assertIdxConsistent(store)
        assert(ClusterStream.readManifest(store).get.rows == exp.size.toLong,
          s"maintained row total diverged $at")
      }
    }
  }

  test("PROPERTY: the JSON manifest round-trips arbitrary field values (quotes, brackets, unicode)") {
    import org.scalacheck.Gen
    // the regex parser this replaced silently mis-read any value
    // containing ']' or '"' — generate exactly that hostile content
    val hostile = Gen.listOf(Gen.oneOf(
      Gen.alphaNumChar, Gen.oneOf(']', '[', '"', '\\', '/', '{', '}',
        ',', ':', '=', ' ', 'é', '→'))).map(_.mkString)
    val manifestGen = for {
      batchId <- Gen.choose(-1L, Long.MaxValue)
      nBuckets <- Gen.choose(1, 256)
      nB <- Gen.choose(0, 8)
      buckets <- Gen.mapOfN(nB, Gen.zip(Gen.choose(0, 255), hostile))
      sigDirs <- Gen.listOfN(3, hostile)
      bandDirs <- Gen.listOfN(2, hostile)
      edgeDirs <- Gen.listOfN(2, hostile)
      ckpt <- hostile
      rows <- Gen.choose(-1L, Long.MaxValue)
      sigBk <- Gen.choose(0, 256)
      bandBk <- Gen.choose(0, 256)
      seq <- Gen.choose(0L, Long.MaxValue)
    } yield ClusterStream.Manifest(batchId, nBuckets, buckets, sigDirs,
      bandDirs, edgeDirs, ckpt, rows, sigBk, bandBk, seq)
    val work = graft.util.Workspace.temp("clusterstream-manifest-prop")
    var seed = org.scalacheck.rng.Seed(13L)
    (1 to 40).foreach { i =>
      val m = manifestGen.pureApply(org.scalacheck.Gen.Parameters.default, seed)
      seed = seed.next
      val dir = s"$work/m$i"
      ClusterStream.writeManifest(dir, m)
      assert(ClusterStream.readManifest(dir).contains(m),
        s"manifest round-trip diverged for $m")
    }
    // and the pre-JSON-parser writer's output (the old regex writer
    // emitted valid JSON without the newer fields) reads back with
    // legacy defaults
    val legacy = s"$work/legacy"
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(legacy, "labels"))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(legacy, "labels", "MANIFEST"),
      """{"batchId":7,"nBuckets":64,"buckets":{"3":"data/batch=7/__bk=3"}}""")
    val got = ClusterStream.readManifest(legacy).get
    assert(got == ClusterStream.Manifest(7L, 64,
      Map(3 -> "data/batch=7/__bk=3"), Nil, Nil, Nil, "", -1L, 0, 0, 0L))
  }

  test("LIFECYCLE soak: drain -> compact -> drain -> expire -> drain -> compact holds the fold invariant at every boundary") {
    val work = graft.util.Workspace.temp("clusterstream-lifecycle")
    val store = s"$work/store"
    val famA = "alpha beta gamma delta epsilon zeta eta theta"
    val famB = "one two three four five six seven eight nine"
    // one frame per micro-batch (maxFilesPerTrigger=1): batch ids are
    // the frame indexes, continuing across drains on the one lineage
    val frames: Seq[Seq[(Long, String)]] = Seq(
      Seq((1L, famA), (2L, famA)),                       // b0
      Seq((10L, famB)),                                  // b1
      Seq((11L, famB)),                                  // b2
      Seq((3L, famA), (50L, "unique filler words here")),// b3
      Seq((4L, famA)),                                   // b4
      Seq((12L, famB)),                                  // b5
      Seq((13L, famB), (5L, famA)),                      // b6
      Seq((6L, famA)))                                   // b7
    def docsOf(bs: Range): Seq[(Long, String)] = bs.flatMap(frames(_))
    def drain(bs: Range): Unit = {
      val feed = landFiles(s"$work/landing",
        bs.map(b => frames(b).toDF("doc_id", "text")))
      ClusterStream.streamClusters(spark, feed, store, s"$work/ckpt")
    }
    def checkInvariant(docs: Seq[(Long, String)], at: String): Unit = {
      assert(streamedClusters(ClusterStream.clusters(spark, store)) ==
        batchClusters(docs.toDF("doc_id", "text")),
        s"fold invariant broken $at")
      assertIdxConsistent(store)
    }
    def dirCount(area: String): Long = {
      val p = java.nio.file.Paths.get(s"$store/$area")
      if (!java.nio.file.Files.exists(p)) 0L
      else {
        val ls = java.nio.file.Files.list(p)
        try ls.filter(java.nio.file.Files.isDirectory(_)).count()
        finally ls.close()
      }
    }
    drain(0 until 4)
    checkInvariant(docsOf(0 until 4), "after drain 1")
    assert(ClusterStream.compactStores(spark, store, minDirs = 2).nonEmpty)
    checkInvariant(docsOf(0 until 4), "after compact 1")
    drain(4 until 6)
    checkInvariant(docsOf(0 until 6), "after drain 2 (post-compaction probe)")
    // retention horizon: drop batches 0-1 ({1,2,famA} and doc 10)
    ClusterStream.expire(spark, store, fromBatch = 2)
    checkInvariant(docsOf(2 until 6), "after expire")
    drain(6 until 7)
    checkInvariant(docsOf(2 until 7), "after drain 3 (post-expiry probe)")
    assert(ClusterStream.compactStores(spark, store, minDirs = 2).nonEmpty)
    checkInvariant(docsOf(2 until 7), "after compact 2")
    // the six-way manifest state space stays bounded: one consolidated
    // dir per area after maintenance
    assert(dirCount("sigs") == 1 && dirCount("bands") == 1 &&
      dirCount("edges") == 1,
      s"dir accretion unbounded: ${dirCount("sigs")}/${dirCount("bands")}/" +
        s"${dirCount("edges")}")
    // and the store still folds after the full lifecycle
    drain(7 until 8)
    checkInvariant(docsOf(2 until 8), "after the post-lifecycle drain")
    val m = ClusterStream.readManifest(store).get
    assert(m.rows == ClusterStream.clusters(spark, store).count(),
      "the maintained row total survives the full lifecycle")
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

  test("async writer stripes key by store dir; the caller's job group rides onto the writer thread") {
    // stripe keying: a store always lands on the SAME single thread
    // (per-store write order), distinct stores may land on different
    // stripes (multi-store drains overlap instead of serializing)
    assert(ClusterStream.storeWriteEc("/tmp/storeA") eq
      ClusterStream.storeWriteEc("/tmp/storeA"))
    val stripes = (0 until 64)
      .map(i => ClusterStream.storeWriteEc(s"/tmp/store$i")).distinct
    assert(stripes.size > 1,
      "64 distinct stores must spread over more than one write stripe")

    // job-group propagation: a snapshot taken on the submitting thread
    // (here: with an active job group, as the micro-batch thread has)
    // must be visible to Spark's scheduler inside the writer task —
    // that's what makes query.stop() cancel an in-flight store write
    val sc = spark.sparkContext
    sc.setJobGroup("spec-group", "spec-desc", interruptOnCancel = true)
    try {
      val snap = ClusterStream.jobGroupSnapshot(sc)
      val seen = new java.util.concurrent.atomic.AtomicReference[String]()
      val latch = new java.util.concurrent.CountDownLatch(1)
      ClusterStream.storeWriteEc("/tmp/storeA").execute { () =>
        ClusterStream.withJobGroup(sc, snap) {
          seen.set(sc.getLocalProperty("spark.jobGroup.id"))
        }
        latch.countDown()
      }
      assert(latch.await(10, java.util.concurrent.TimeUnit.SECONDS))
      assert(seen.get() == "spec-group",
        "the writer thread must run under the submitting stream's job group")
    } finally sc.clearJobGroup()
  }
}
