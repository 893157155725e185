package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.dedup.Dedup

/** The shared train-once/score-a-feed harness (q120/q122/q127/q129 all
  * ride it) and its newest client, streaming fuzzy decontamination:
  * the union of per-batch outputs must equal the batch pass exactly —
  * the adjudication identity every streaming twin's oracle relies on. */
class ScoreStreamSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = {
    val answer = (1 to 30).map(i => s"ans$i").mkString(" ")
    val drifted = (1 to 30).map(i => if (i % 10 == 0) s"x$i" else s"ans$i").mkString(" ")
    Seq(
      (10L, answer),  // eval doc (id % 10 == 0)
      (1L, drifted),  // near-verbatim leak (winnow-level collision)
      (2L, answer),   // verbatim leak
      (3L, "totally unrelated words here one two three four five six"),
      (4L, "more clean filler text with nothing shared at all ok"))
      .toDF("doc_id", "text")
  }

  test("decontaminateStream == batch fuzzyContamination (union-of-batches identity)") {
    val docs = corpus
    val work = graft.util.Workspace.temp("score-stream-spec")
    Dedup.trainEvalFingerprints(docs, col("doc_id") % 10 === 0,
      modelDir = s"$work/model")
    val feed = ScoreStream.feed(
      docs.filter(col("doc_id") % 10 =!= 0).select($"doc_id", $"text"),
      s"$work/landing", files = 3)
    Dedup.decontaminateStream(feed, s"$work/model",
      outDir = s"$work/flagged", checkpointDir = s"$work/ckpt")
    val streamed = ScoreStream.output(spark, s"$work/flagged")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val batch = Dedup.fuzzyContamination(docs, col("doc_id") % 10 === 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(streamed == batch,
      s"streamed $streamed must equal batch $batch")
    assert(streamed.contains(1L) && streamed.contains(2L) && !streamed.contains(3L))
  }

  test("replay unpersists the frozen frames after the drain") {
    val docs = corpus
    val work = graft.util.Workspace.temp("score-stream-unpersist")
    Dedup.trainEvalFingerprints(docs, col("doc_id") % 10 === 0,
      modelDir = s"$work/model")
    val feed = ScoreStream.feed(
      docs.filter(col("doc_id") % 10 =!= 0).select($"doc_id", $"text"),
      s"$work/landing", files = 2)
    Dedup.decontaminateStream(feed, s"$work/model",
      outDir = s"$work/out", checkpointDir = s"$work/ckpt")
    assert(spark.sharedState.cacheManager.isEmpty,
      "frozen model frames must not leak into the session cache")
  }

  test("a second checkpoint lineage on one outDir fails loudly instead of overwriting batch dirs") {
    val work = graft.util.Workspace.temp("score-stream-lineage")
    val docs = corpus.select($"doc_id", $"text")
    val feed = ScoreStream.feed(docs, s"$work/landing", files = 2)
    ScoreStream.replay(feed, Nil, s"$work/out", s"$work/ckptA")(b => b)
    val committed = ScoreStream.output(spark, s"$work/out").count()
    assert(committed == docs.count())
    // a fresh checkpoint restarts batch ids at 0: its writes would
    // silently OVERWRITE the committed batch=0/1 dirs — fail instead
    val feedB = ScoreStream.feed(docs, s"$work/landingB", files = 1)
    val ex = intercept[IllegalArgumentException] {
      ScoreStream.replay(feedB, Nil, s"$work/out", s"$work/ckptB")(b => b)
    }
    assert(ex.getMessage.contains("bound to checkpoint lineage"), ex.getMessage)
    assert(ScoreStream.output(spark, s"$work/out").count() == committed,
      "the committed output survives the rejected second lineage")
    // the original lineage resumes (no new files -> unchanged output)
    val feedA2 = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$work/landing")
    ScoreStream.replay(feedA2, Nil, s"$work/out", s"$work/ckptA")(b => b)
    assert(ScoreStream.output(spark, s"$work/out").count() == committed)
  }

  test("feed replays the frame's exact rows as a maxFilesPerTrigger=1 stream") {
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")).toDF("id", "v")
    val work = graft.util.Workspace.temp("score-stream-feed")
    val feed = ScoreStream.feed(df, s"$work/landing", files = 4)
    assert(feed.isStreaming)
    var batches = 0
    ScoreStream.replay(feed, Nil, s"$work/out", s"$work/ckpt") { b =>
      batches += 1; b
    }
    // one trigger per landing FILE (repartition may leave an empty
    // partition unwritten, so ≥ 2 proves multi-batch, ≤ 4 proves the
    // one-file-per-trigger cap)
    assert(batches >= 2 && batches <= 4, s"per-file triggers, got $batches")
    val out = ScoreStream.output(spark, s"$work/out").as[(Long, String)].collect().toSet
    assert(out == Set((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")))
  }

  test("a re-delivered batch overwrites its own output (at-least-once crash window)") {
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")).toDF("id", "v")
    val work = graft.util.Workspace.temp("score-stream-redeliver")
    val feed = ScoreStream.feed(df, s"$work/landing", files = 2)
    // simulate the crash window: a previous attempt wrote batch 0's
    // output but died before the checkpoint commit — on restart the
    // stream re-delivers batch 0, which must REPLACE this, not append
    Seq((99L, "stale"), (98L, "stale")).toDF("id", "v")
      .write.parquet(s"$work/out/batch=0")
    ScoreStream.replay(feed, Nil, s"$work/out", s"$work/ckpt")(b => b)
    val out = ScoreStream.output(spark, s"$work/out").as[(Long, String)].collect().toSeq
    assert(out.sorted == Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")),
      s"stale pre-crash rows must be overwritten, got $out")
  }

  test("resuming over a legacy flat-layout outDir fails with a migration message") {
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val work = graft.util.Workspace.temp("score-stream-legacy")
    // the pre-batch-subdir layout: part files at the outDir ROOT —
    // writing batch= subdirs next to them makes the parquet read fail,
    // so replay must refuse up front
    df.coalesce(1).write.parquet(s"$work/out")
    val feed = ScoreStream.feed(df, s"$work/landing", files = 2)
    val ex = intercept[IllegalArgumentException] {
      ScoreStream.replay(feed, Nil, s"$work/out", s"$work/ckpt")(b => b)
    }
    assert(ex.getMessage.contains("batch=legacy"), ex.getMessage)
    // the documented migration unblocks the same resume
    val root = java.nio.file.Paths.get(s"$work/out")
    val legacyDir = root.resolve("batch=legacy")
    java.nio.file.Files.createDirectories(legacyDir)
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.list(root).iterator.asScala
      .filter(java.nio.file.Files.isRegularFile(_)).toList
      .foreach(p => java.nio.file.Files.move(p, legacyDir.resolve(p.getFileName)))
    ScoreStream.replay(feed, Nil, s"$work/out", s"$work/ckpt")(b => b)
    val out = ScoreStream.output(spark, s"$work/out").as[(Long, String)]
      .collect().toSeq.sorted
    // legacy rows union with the replayed batches
    assert(out == Seq((1L, "a"), (1L, "a"), (2L, "b"), (2L, "b")), s"got $out")
  }
}
