package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.schema.SchemaRegistry

class StreamLogSpec extends SparkSpec {
  import spark.implicits._

  test("stream_log: one row per micro-batch, input counts recorded") {
    implicit val sqlCtx = spark.sqlContext
    val registry = new SchemaRegistry(tmpDir("sl-tables"))
    val logger = StreamLog.attach(spark, registry)
    try {
      val mem = MemoryStream[(Timestamp, String)]
      mem.addData((Timestamp.valueOf("2024-01-01 00:00:00"), "a"),
        (Timestamp.valueOf("2024-01-01 00:00:01"), "b"),
        (Timestamp.valueOf("2024-01-01 00:00:02"), "c"))
      val q = mem.toDF().toDF("ts", "v").writeStream.format("parquet")
        .queryName("sl-spec-query")
        .option("path", tmpDir("sl-out"))
        .option("checkpointLocation", tmpDir("sl-ckpt"))
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()

      // listener events are async — poll for the telemetry row
      val dir = registry.dataDir("_meta", "stream_log")
      val deadline = System.currentTimeMillis() + 30000
      def rows() =
        try spark.read.parquet(dir)
          .filter($"query" === "sl-spec-query" && $"input_rows" > 0)
          .select("query", "input_rows").as[(String, Long)].collect()
        catch { // dir absent or mid-write (no data files yet)
          case _: Exception => Array.empty[(String, Long)]
        }
      while (rows().isEmpty && System.currentTimeMillis() < deadline)
        Thread.sleep(250)
      val got = rows()
      assert(got.nonEmpty, "no stream_log row within 30s")
      assert(got.exists(_._2 == 3L), s"expected a 3-row batch, got ${got.mkString(",")}")
    } finally StreamLog.detach(spark, logger)
  }
}
