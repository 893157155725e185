package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import graft.SparkSpec
import graft.streaming.StreamOps.{Event, Session}

/** MemoryStream test harness notes (hard-won):
  *   - Trigger.AvailableNow snapshots available offsets AT START — add
  *     data BEFORE start() or the run sees nothing.
  *   - Watermark/state live in the CHECKPOINT: two AvailableNow runs
  *     against the same checkpointLocation behave as consecutive
  *     micro-batches of one query (restart semantics — exactly what
  *     production ingestion does).
  *   - processAllAvailable() can hang with ProcessingTimeTimeout
  *     queries; bounded AvailableNow runs terminate deterministically.
  */
class StreamOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("windowedAgg: tumbling event-time windows (batch shape)") {
    val df = Seq(
      (ts("2024-01-01 00:00:10"), "click", 1.0),
      (ts("2024-01-01 00:00:50"), "click", 2.0),
      (ts("2024-01-01 00:01:10"), "click", 4.0),
      (ts("2024-01-01 00:01:20"), "view", 8.0))
      .toDF("ts", "event_type", "value")
    val out = StreamOps.windowedAgg(df, "ts", "event_type", "value", "1 minute")
      .orderBy("window_start", "event_type")
      .select("event_type", "n", "total")
      .as[(String, Long, Double)].collect().toSeq
    assert(out == Seq(("click", 2L, 3.0), ("click", 1L, 4.0), ("view", 1L, 8.0)))
  }

  test("windowedAgg streaming: watermark finalizes windows, late data dropped") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val ckpt = tmpDir("wm-ckpt")
    val out = tmpDir("wm-out")
    def run(): Unit = {
      // file sink (unlike memory) supports checkpoint recovery, so two
      // AvailableNow runs behave as consecutive batches of one query
      val q = StreamOps.windowedAgg(
        mem.toDF().toDF("ts", "event_type", "value"),
        "ts", "event_type", "value", "1 minute", watermark = "30 seconds")
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    // run 1: window [00:00,00:01) + an event far ahead that advances the
    // watermark past that window's end
    mem.addData((ts("2024-01-01 00:00:10"), "click", 1.0),
      (ts("2024-01-01 00:10:00"), "click", 1.0))
    run()
    // run 2 (same checkpoint = same logical query): a LATE event for the
    // closed window; the finalized window must not include it
    mem.addData((ts("2024-01-01 00:00:20"), "click", 99.0))
    run()
    val all = spark.read.parquet(out)
      .select("window_start", "n", "total").as[(Timestamp, Long, Double)]
      .collect().map { case (k, n, t) => k.toString -> (n, t) }.toMap
    assert(all(ts("2024-01-01 00:00:00").toString) == (1L, 1.0))
  }

  test("intervalJoin: in-window pairs only; streaming matches the batch twin") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = Seq(
      (1L, ts("2024-01-01 00:00:00")),
      (2L, ts("2024-01-01 00:00:00")),
      (1L, ts("2024-01-01 00:10:00")))
    val buys = Seq(
      (1L, ts("2024-01-01 00:00:30"), 10.0), // within 60s of click 1
      (1L, ts("2024-01-01 00:05:00"), 20.0), // between clicks: matches neither
      (2L, ts("2024-01-01 00:02:00"), 30.0), // past user 2's window
      (1L, ts("2024-01-01 00:10:30"), 40.0)) // within 60s of click 3
    val expected = Set(
      (1L, "2024-01-01 00:00:00", 10.0),
      (1L, "2024-01-01 00:10:00", 40.0))

    def pairs(df: org.apache.spark.sql.DataFrame) = df
      .selectExpr("l.user_id", "cast(l.cts as string) AS cts", "r.amount")

    // batch twin
    val batch = pairs(StreamOps.intervalJoin(
      clicks.toDF("user_id", "cts"), buys.toDF("user_id", "pts", "amount"),
      "user_id", "cts", "pts", withinSecs = 60))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(batch == expected)

    // streaming: same data through MemoryStreams, AvailableNow drain
    val cs = MemoryStream[(Long, Timestamp)]
    val ps = MemoryStream[(Long, Timestamp, Double)]
    cs.addData(clicks: _*)
    ps.addData(buys: _*)
    val out = tmpDir("ivj-out")
    val q = pairs(StreamOps.intervalJoin(
      cs.toDF().toDF("user_id", "cts"), ps.toDF().toDF("user_id", "pts", "amount"),
      "user_id", "cts", "pts", withinSecs = 60))
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", tmpDir("ivj-ckpt"))
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val streamed = spark.read.parquet(out)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(streamed == expected)
  }

  test("dedupWithinWatermark: replays inside horizon dropped, state evicted after") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val ckpt = tmpDir("dd-ckpt")
    val out = tmpDir("dd-out")
    def run(): Unit = {
      val q = StreamOps.dedupWithinWatermark(
        mem.toDF().toDF("ts", "id", "value"), Seq("id"), "ts",
        watermark = "30 seconds")
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    def ids() = spark.read.parquet(out).select("id").as[String]
      .collect().groupBy(identity).view.mapValues(_.length).toMap

    // run 1: in-batch duplicate of "a" collapses
    mem.addData((ts("2024-01-01 00:00:00"), "a", 1.0),
      (ts("2024-01-01 00:00:05"), "a", 2.0),
      (ts("2024-01-01 00:00:00"), "b", 3.0))
    run()
    assert(ids() == Map("a" -> 1, "b" -> 1))

    // run 2 (same checkpoint = restart): the cross-batch replay of "a"
    // is inside the horizon -> dropped; "c" far ahead advances the
    // watermark past a's expiry, evicting its state
    mem.addData((ts("2024-01-01 00:00:10"), "a", 4.0),
      (ts("2024-01-01 00:20:00"), "c", 5.0))
    run()
    assert(ids() == Map("a" -> 1, "b" -> 1, "c" -> 1))

    // run 3: same id AFTER the horizon is a new record (bounded state —
    // the dedup guarantee is per-horizon, not forever)
    mem.addData((ts("2024-01-01 00:25:00"), "a", 6.0))
    run()
    assert(ids() == Map("a" -> 2, "b" -> 1, "c" -> 1))

    // batch twin: same operator shape on a static frame is a plain dedup
    val batch = Seq((ts("2024-01-01 00:00:00"), "a", 1.0),
      (ts("2024-01-01 00:00:05"), "a", 2.0)).toDF("ts", "id", "value")
    assert(StreamOps.dedupWithinWatermark(batch, Seq("id"), "ts").count() == 1)
  }

  test("sessionize: event-time gap splits sessions; state survives restart") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val ckpt = tmpDir("sess-ckpt")
    val out = tmpDir("sess-out")
    def run(): Unit = {
      val q = StreamOps.sessionize(mem.toDS(), gapMillis = 60000)
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    // run 1: user 1 bursts twice, 4.5 min apart -> first session closes
    // in-batch via the gap; the watermark (max ts 00:05 − 30s) then
    // passes both users' idle timeouts, closing user 2's session and
    // user 1's second one by event-time timeout
    mem.addData(
      Event(1L, ts("2024-01-01 00:00:00"), 1.0),
      Event(1L, ts("2024-01-01 00:00:30"), 2.0),
      Event(1L, ts("2024-01-01 00:05:00"), 4.0),
      Event(2L, ts("2024-01-01 00:00:00"), 8.0))
    run()
    val r1 = spark.read.parquet(out).as[Session].collect()
    val u1 = r1.filter(_.user_id == 1L).sortBy(_.session_start.getTime)
    assert(u1.head.n_events == 2 && u1.head.total_value == 3.0)
    assert(u1.head.session_start == ts("2024-01-01 00:00:00"))
    assert(u1.head.session_end == ts("2024-01-01 00:00:30"))
    val u2r1 = r1.filter(_.user_id == 2L)
    assert(u2r1.length == 1 && u2r1.head.n_events == 1 && u2r1.head.total_value == 8.0)

    // run 2 (same checkpoint = restart): a new event for user 2 opens a
    // fresh session; the already-closed one is NOT re-emitted, and the
    // fresh one stays open (nothing past its gap yet)
    mem.addData(Event(2L, ts("2024-01-01 00:30:00"), 16.0))
    run()
    val r2 = spark.read.parquet(out).as[Session].collect()
    val u2r2 = r2.filter(_.user_id == 2L)
    assert(u2r2.length == 1) // still just the run-1 closed session
    assert(!r2.exists(s => s.user_id == 2L && s.total_value == 16.0))
  }
}
