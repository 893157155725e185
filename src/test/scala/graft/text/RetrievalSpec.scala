package graft.text

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.text.TextFunctions.tokens

class RetrievalSpec extends SparkSpec {

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("bm25TopK matches a hand-computed score on a tiny corpus") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "spark shuffle join"),
      (2L, "spark spark spark batch"),
      (3L, "window sort merge join"),
      (4L, "batch")
    ).toDF("doc_id", "text")

    val out = Retrieval.bm25TopK(docs, col("doc_id"), tokens(col("text")),
        Seq("qa" -> Seq("spark", "join"), "qb" -> Seq("absent", "batch")), k = 3)
      .orderBy(col("query_id"), col("rank"))
      .collect()

    // same arithmetic, same op order as the operator: idf * tfNorm per
    // term, folded from 0.0 in term order, rounded to 6 before ranking
    val n = 4L; val avgdl = (3 + 4 + 4 + 1).toDouble / 4; val k1 = 1.2; val b = 0.75
    def idf(df: Long): Double =
      math.log(((n - df).toDouble + 0.5) / (df.toDouble + 0.5) + 1.0)
    def sc(tf: Long, dl: Long, df: Long): Double =
      idf(df) * (tf.toDouble * (k1 + 1.0)) /
        (tf.toDouble + k1 * ((1.0 - b) + b * (dl.toDouble / avgdl)))
    // dfs over the query vocabulary: spark 2, join 2, batch 2
    val qa = Map( // fold order = sorted term order: join < spark
      1L -> round6(Seq(sc(1, 3, 2), sc(1, 3, 2)).foldLeft(0.0)(_ + _)),
      2L -> round6(Seq(sc(3, 4, 2)).foldLeft(0.0)(_ + _)),
      3L -> round6(Seq(sc(1, 4, 2)).foldLeft(0.0)(_ + _)))
    val qb = Map( // "absent" has df 0 — contributes nothing, never NaN
      2L -> round6(sc(1, 4, 2)),
      4L -> round6(sc(1, 1, 2)))

    val got = out.map(r => (r.getString(0), r.getLong(1), r.getLong(2),
      r.getDouble(3)))
    val qaRank = qa.toSeq.sortBy { case (id, score) => (-score, id) }
    val qbRank = qb.toSeq.sortBy { case (id, score) => (-score, id) }
    assert(got.toSeq ==
      qaRank.zipWithIndex.map { case ((id, score), i) => ("qa", (i + 1).toLong, id, score) } ++
      qbRank.zipWithIndex.map { case ((id, score), i) => ("qb", (i + 1).toLong, id, score) })
  }

  test("two-stage top-k is exact across many partitions, ties break by id") {
    val s = spark
    import s.implicits._
    // 60 docs, heavy term overlap, spread over 16 partitions so the
    // per-partition prune genuinely discards candidates
    val docs = (1L to 60L)
      .map(i => (i, s"alpha ${if (i % 2 == 0) "beta" else "gamma"} " * (1 + (i % 5)).toInt))
      .toDF("doc_id", "text")
      .repartition(16)

    val out = Retrieval.bm25TopK(docs, col("doc_id"), tokens(col("text")),
      Seq("q" -> Seq("alpha", "beta")), k = 7).collect()

    // reference: identical scoring WITHOUT the per-partition prune
    // (single-partition input makes stage 1 a no-op)
    val ref = Retrieval.bm25TopK(docs.coalesce(1), col("doc_id"),
      tokens(col("text")), Seq("q" -> Seq("alpha", "beta")), k = 7).collect()

    def key(r: org.apache.spark.sql.Row) =
      (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))
    assert(out.map(key).sortBy(_._2).toSeq == ref.map(key).sortBy(_._2).toSeq)
    assert(out.length == 7)
    // every doc with an even id scores identically within its dl class;
    // ranks must be strictly increasing and ids ascending within a tie
    val byRank = out.map(key).sortBy(_._2)
    byRank.sliding(2).foreach { case Array(a, b) =>
      assert(a._4 > b._4 || (a._4 == b._4 && a._3 < b._3))
    }
  }

  test("tfIdfKeywords ranks distinctive terms over corpus-wide ones") {
    val s = spark
    import s.implicits._
    // 'common' is in every doc (df=N → idf ln((N+1)/(N+1)) = 0); each
    // doc's unique term must outrank it despite lower tf
    val docs = Seq(
      (1L, "common common common cats"),
      (2L, "common common dogs"),
      (3L, "common birds birds")).toDF("doc_id", "text")
    val out = Retrieval.tfIdfKeywords(docs, col("doc_id"),
        tokens(col("text")), k = 2)
      .orderBy(col("__id"), col("rank"))
      .as[(Long, Long, String, Double)].collect().toSeq
    assert(out.filter(_._2 == 1L).map(r => r._1 -> r._3).toMap ==
      Map(1L -> "cats", 2L -> "dogs", 3L -> "birds"),
      s"each doc's unique term must rank first: $out")
    // the everywhere-term scores exactly 0 (idf of df=N is ln(1))
    assert(out.filter(_._3 == "common").forall(_._4 == 0.0))
    // k bounds per doc
    assert(out.groupBy(_._1).forall(_._2.size <= 2))
  }

  test("a query of only absent terms returns no rows for that query") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "x y z"), (2L, "y z w")).toDF("doc_id", "text")
    val out = Retrieval.bm25TopK(docs, col("doc_id"), tokens(col("text")),
      Seq("hit" -> Seq("x"), "miss" -> Seq("nope")), k = 5)
    assert(out.filter(col("query_id") === "miss").count() == 0)
    assert(out.filter(col("query_id") === "hit").count() == 1)
  }
}
