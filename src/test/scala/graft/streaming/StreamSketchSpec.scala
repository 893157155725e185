package graft.streaming

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.SparkSpec

/** The Misra-Gries aggregate under STREAMING state persistence: every
  * micro-batch serializes the sketch buffer into the state store and
  * the next batch's partials merge into the deserialized state. The
  * guarantee under test: a term above n/(k+1) of the WHOLE drained
  * stream survives in the final sketch no matter how the stream is
  * chopped into triggers — i.e. the mergeable-summary combine holds
  * across checkpoint boundaries, not just in-memory partials. */
class StreamSketchSpec extends SparkSpec {
  import spark.implicits._

  test("MG sketch survives k-pressure across many micro-batches") {
    val dir = tmpDir("stream-mg")
    // 9 files → 9 micro-batches at maxFilesPerTrigger=1. "hot" is 60 of
    // 510 tokens (> n/(k+1) = 510/6 = 85? no — use k big enough):
    // k=11 → threshold 510/12 = 42.5; hot=60 must survive; the 450
    // distinct tail terms keep every counter under constant pressure.
    val hot = Seq.fill(60)("hot")
    val tail = (1 to 450).map(i => s"t$i")
    val all = new scala.util.Random(7).shuffle((hot ++ tail).toList)
    all.grouped(57).zipWithIndex.foreach { case (chunk, i) =>
      chunk.toDF("term").coalesce(1).write.parquet(s"$dir/landing/f$i")
    }
    val schema = StructType(Seq(StructField("term", StringType)))
    val in = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/landing/*")
    val q = in.groupBy()
      .agg(count(lit(1)).as("n"),
        call_function("graft_misra_gries", col("term"), lit(11)).as("sk"))
      .writeStream.format("memory").queryName("mg_stream_spec")
      .option("checkpointLocation", s"$dir/ckpt")
      .outputMode("complete").trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // the drain really ran as many triggers (state crossed the store)
    assert(q.recentProgress.length > 3,
      s"expected many micro-batches, got ${q.recentProgress.length}")
    val row = spark.table("mg_stream_spec").collect().head
    assert(row.getLong(0) == 510L)
    val cands = row.getSeq[Row](1).map(_.getString(0))
    assert(cands.size <= 11, s"state must stay k-bounded: ${cands.size}")
    assert(cands.contains("hot"),
      s"above-threshold term lost across state-store merges: $cands")
  }
}
