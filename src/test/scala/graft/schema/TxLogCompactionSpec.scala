package graft.schema

import graft.SparkSpec
import graft.ingest.Pipeline
import graft.rules.{EventRule, Rules, SchemaRule}

/** Streaming + compaction, proven TOGETHER on the tx-log backend:
  * 55 one-file micro-batches land through the real ingest stream, the
  * batch-dir/small-file population is collapsed in-loop by
  * [[TxLogBackend.compact]], and the versioned-snapshot contract holds
  * across it — a snapshot taken before a compaction reads identical
  * rows after it, until [[TxLogBackend.expireReplaced]] reclaims the
  * replaced dirs, at which point out-of-retention snapshots fail
  * LOUDLY instead of silently changing. */
class TxLogCompactionSpec extends SparkSpec {

  private def rules = Rules(
    event = Seq(EventRule(name = "ev", when = "name LIKE '%.log'",
      schemaRule = "ev")),
    schema = Seq(SchemaRule(name = "ev", dataset = "'logs'", table = "'ev'",
      id = Some("log_id"), timestamp = "event_time")))

  test("50+ micro-batch stream: compaction bounds files, snapshots stay exact, expiry fails loud") {
    val landing = tmpDir("txc-landing")
    val backend = new TxLogBackend(tmpDir("txc-wh"))
    val cfg = Pipeline.Config(backend, rules, telemetry = false)
    val ckpt = tmpDir("txc-ckpt")
    def writeBatchFiles(range: Range): Unit = range.foreach(i =>
      writeFile(landing, f"f$i%03d.log",
        s"""{"log_id": "a$i", "event_time": ${1559347200 + i}, "v": $i}""" + "\n"))
    def drain(): Unit =
      Pipeline.stream(spark, cfg, s"$landing/*.log", ckpt,
        maxFilesPerTrigger = Some(1)).awaitTermination()
    def idsAt(v: Int): Seq[String] =
      backend.readAt(spark, "logs", "ev", v)
        .select("id").collect().map(_.getString(0)).sorted.toSeq

    // phase 1: 30 one-file micro-batches → 30 append commits
    writeBatchFiles(1 to 30)
    drain()
    val tip1 = backend.snapshotVersions("logs", "ev").max
    assert(tip1 >= 30, s"one commit per micro-batch: $tip1")
    val snap1 = idsAt(tip1)
    assert(snap1.size == 30)

    // compact #1: the effective set collapses, the pinned snapshot
    // BELOW the compaction still reads the identical rows (old dirs
    // stay on disk until expiry)
    val cv1 = backend.compact(spark, "logs", "ev")
    assert(cv1 > tip1)
    assert(idsAt(tip1) == snap1, "pre-compaction snapshot must not move")
    assert(idsAt(cv1) == snap1, "compaction rewrites, never edits")

    // phase 2: 25 more micro-batches over the same checkpoint — the
    // appends land ABOVE the compaction and the effective-set rule
    // keeps exactly compacted + new
    writeBatchFiles(31 to 55)
    drain()
    val tip2 = backend.snapshotVersions("logs", "ev").max
    assert(tip2 >= cv1 + 25, "25 new commits above the compaction")
    val snap2 = idsAt(tip2)
    assert(snap2.size == 55)

    // compact #2 with a snapshot pinned mid-stream: reads at that
    // version are identical before and after the rewrite
    val cv2 = backend.compact(spark, "logs", "ev")
    assert(idsAt(tip2) == snap2, "mid-stream snapshot exact across compaction")
    assert(idsAt(cv2) == snap2)

    // expiry: replaced dirs reclaimed; the live table now reads a
    // BOUNDED file set (55 micro-batch dirs → one compacted dir)
    val expired = backend.expireReplaced("logs", "ev")
    assert(expired.size >= 30, s"phase-1 dirs + compaction #1 reclaimed: ${expired.size}")
    val files = backend.readWithPart(spark, "logs", "ev").inputFiles
    assert(files.length <= 4,
      s"post-compaction tip must read O(targetPartitions) files, got ${files.length}")
    assert(idsAt(cv2) == snap2, "tip content exact after expiry")

    // an out-of-retention snapshot fails loudly, never silently drifts
    val err = intercept[RuntimeException](idsAt(tip1))
    assert(err.getMessage.contains("expired"), err.getMessage)
  }

  test("appends racing a compaction are never lost (effective-set rule under concurrency)") {
    import spark.implicits._
    import graft.ingest.TableSink
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    val backend = new TxLogBackend(tmpDir("txc-race"))
    def routed(pre: String, n: Int) = (0 until n).map(i => (s"$pre-$i", i))
      .toDF("rid", "v")
      .select(org.apache.spark.sql.functions.col("rid").as("id"),
        org.apache.spark.sql.functions.lit("ing").as("ingest_id"),
        org.apache.spark.sql.functions.expr("timestamp'2024-05-01 00:00:00'").as("timestamp"),
        org.apache.spark.sql.functions.current_timestamp().as("ingested_at"),
        org.apache.spark.sql.functions.struct(
          org.apache.spark.sql.functions.col("v")).as("data"),
        org.apache.spark.sql.functions.lit("d").as("dataset"),
        org.apache.spark.sql.functions.lit("t").as("table"),
        org.apache.spark.sql.functions.lit("day").as("partition"))
    (0 until 6).foreach(i => TableSink.append(spark, backend, routed(s"seed$i", 5)))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      // compactions and appends interleave freely: a compaction's
      // `through` is its read tip, so any append landing above it must
      // survive every later effective-set evaluation
      val work = (0 until 3).map { i =>
        Future(TableSink.append(spark, backend, routed(s"race$i", 5)))
      } :+ Future(backend.compact(spark, "d", "t")) :+
        Future(backend.compact(spark, "d", "t"))
      Await.result(Future.sequence(work), 180.seconds)
    } finally pool.shutdown()
    val out = TableSink.read(spark, backend, "d", "t")
    assert(out.count() == 45L, "6 seed + 3 racing appends, 5 rows each")
    assert(out.select("id").distinct().count() == 45L, "no duplicates either")
    // one more compaction + expiry settles to the bounded file set with
    // identical content
    backend.compact(spark, "d", "t")
    backend.expireReplaced("d", "t")
    assert(TableSink.read(spark, backend, "d", "t")
      .select("id").distinct().count() == 45L)
  }
}
