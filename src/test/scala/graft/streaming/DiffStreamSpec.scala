package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.dedup.Dedup

/** Continuous corpus diff: the accumulated after-side counts must read
  * out EXACTLY the batch corpusDiff (q151's adjudication identity), at
  * any batch boundary, with replay riding the count store's pointer
  * guard. */
class DiffStreamSpec extends SparkSpec {
  import spark.implicits._

  private def doc(id: Long, text: String) = (id, text)

  test("streaming diff == batch corpusDiff over everything fed") {
    val work = graft.util.Workspace.temp("diffstream-spec")
    val before = Seq(doc(1, "kept text one"), doc(2, "dropped text two"),
      doc(3, "kept text three"), doc(4, "duplicated text four"))
      .toDF("doc_id", "text")
    // after: doc 2's content gone, doc 4's duplicated, one addition
    val after = Seq(doc(1, "kept text one"), doc(3, "kept text three"),
      doc(4, "duplicated text four"), doc(14, "duplicated text four"),
      doc(20, "brand new text twenty"))
      .toDF("doc_id", "text")
    val feed = ScoreStream.feed(after, s"$work/landing", files = 3)
    val streamed = DiffStream.streamCorpusDiff(spark, before, feed,
        s"$work/store", s"$work/ckpt")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getString(5))).toSet
    val batch = Dedup.corpusDiff(before, after)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getString(5))).toSet
    assert(streamed == batch)
    val statuses = streamed.map(_._6)
    assert(statuses == Set("added", "removed", "changed"),
      s"all three statuses must appear, got $statuses")
  }

  test("resumed drain keeps accumulating; the diff shrinks as the after side fills in") {
    val work = graft.util.Workspace.temp("diffstream-resume")
    val before = Seq(doc(1, "alpha one"), doc(2, "beta two")).toDF("doc_id", "text")
    def land(df: org.apache.spark.sql.DataFrame) =
      df.coalesce(1).write.mode("append").parquet(s"$work/landing")
    land(Seq(doc(1, "alpha one")).toDF("doc_id", "text"))
    def feed = spark.readStream.schema(before.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$work/landing")
    val d1 = DiffStream.streamCorpusDiff(spark, before, feed,
      s"$work/store", s"$work/ckpt")
    // only doc 2's digest is missing so far
    assert(d1.collect().map(_.getString(5)).toSeq == Seq("removed"))
    // doc 2's content lands later (same checkpoint lineage): diff empties
    land(Seq(doc(2, "beta two")).toDF("doc_id", "text"))
    val d2 = DiffStream.streamCorpusDiff(spark, before, feed,
      s"$work/store", s"$work/ckpt")
    assert(d2.isEmpty, "identical corpora must diff to empty")
  }
}
