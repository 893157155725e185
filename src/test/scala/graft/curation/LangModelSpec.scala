package graft.curation

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.text.TextFunctions.tokens

class LangModelSpec extends SparkSpec {

  test("bigram cross-entropy matches a hand-computed add-one LM") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "a b a b"),
      (2L, "a b b"),
      (3L, "c"), // single token: no bigrams, absent from output
      (4L, "")   // empty: absent from output
    ).toDF("doc_id", "text")

    val out = LangModel
      .bigramCrossEntropy(docs, col("doc_id"), tokens(col("text")))
      .orderBy(col("__id"))
      .collect()

    // corpus bigrams: d1 = (a,b),(b,a),(a,b); d2 = (a,b),(b,b)
    // c12: (a,b)->3, (b,a)->1, (b,b)->1 ; c1: a->3, b->2 ; V = {a,b,c} = 3
    val V = 3L
    // each term rounds to 6 decimals, then sums exactly in decimal —
    // the operator's commutative contract, replayed literally
    def lp(c1: Long, c12: Long): BigDecimal =
      BigDecimal(math.log((c1 + V).toDouble) - math.log((c12 + 1).toDouble))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val d1 = Seq(lp(3, 3), lp(2, 1), lp(3, 3)).sum.toDouble / 3
    val d2 = Seq(lp(3, 3), lp(2, 1)).sum.toDouble / 2

    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(out.map(_.getLong(1)).toSeq == Seq(3L, 2L))
    assert(out(0).getDouble(2) == d1)
    assert(out(1).getDouble(2) == d2)
    // doc 1 repeats its dominant bigram; doc 2 has a singleton -> rarer
    assert(out(0).getDouble(2) < out(1).getDouble(2))

    // the de-quadratic contract: no buffered token list anywhere in the
    // aggregation — per-document state is one decimal + one count
    val plan = LangModel.bigramCrossEntropy(docs, col("doc_id"),
      tokens(col("text"))).queryExecution.optimizedPlan.toString
    assert(!plan.contains("collect_list"), s"buffered-list agg crept back:\n$plan")
  }

  test("q81 covers every document, null xent below two tokens") {
    val s = spark
    val sf = "/root/testdata/sf0.001"
    val out = graft.queries.CurationQueries.q81(s, sf)
    val total = s.read.parquet(s"$sf/documents.parquet").count()
    assert(out.count() == total)
    val short = out.filter(col("n_bigrams") === 0)
    assert(short.filter(col("xent").isNotNull).count() == 0)
  }

  test("stored model scores a DIFFERENT doc stream with add-one smoothing for unseen bigrams") {
    val s = spark
    import s.implicits._
    import graft.text.TextFunctions.tokens
    val train = Seq((1L, "a b a b"), (2L, "a b b")).toDF("doc_id", "text")
    val dir = tmpDir("lm-model")
    LangModel.trainBigramModel(train, col("doc_id"), tokens(col("text")), dir)

    // same corpus re-scored from the artifact == in-memory self-score
    val self = LangModel.bigramCrossEntropy(train, col("doc_id"), tokens(col("text")))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val stored = LangModel.scoreBigramModel(train, col("doc_id"), tokens(col("text")), dir)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(self == stored, "artifact round-trip must not change self-scores")

    // unseen bigrams: doc "b c" — (b,c) never trained; c1(b)=2, V=2
    // lp = round6(ln(0 + c1(b)=2 + ... )) careful: c1 from model, V=2 ({a,b})
    val out = LangModel.scoreBigramModel(
      Seq((9L, "b c")).toDF("doc_id", "text"), col("doc_id"), tokens(col("text")), dir)
      .collect()
    assert(out.length == 1 && out.head.getLong(1) == 1L)
    val expected = BigDecimal(math.log((2 + 2).toDouble) - math.log(1.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble / 1
    assert(out.head.getDouble(2) == expected,
      s"unseen bigram must smooth add-one: got ${out.head.getDouble(2)}, want $expected")
  }

  test("trigram LM: predictable text scores below out-of-distribution text") {
    import spark.implicits._
    import graft.text.TextFunctions.tokens
    // doc 1 repeats the corpus's dominant phrase; doc 2 is unique noise
    val phrase = "the quick brown fox jumps"
    val docs = ((1L to 8L).map(i => (i, phrase)) :+
      ((9L, "zx qv wk jm pl")) :+ ((10L, "hi"))) // 2 tokens → absent
      .toDF("doc_id", "text")
    val out = LangModel.trigramCrossEntropy(docs, col("doc_id"),
      tokens(col("text")))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(!out.contains(10L), "sub-trigram docs are absent")
    assert(out(1L) < out(9L),
      s"in-distribution phrase must score lower xent: $out")
    // deterministic across partitionings
    val again = LangModel.trigramCrossEntropy(docs.repartition(5),
      col("doc_id"), tokens(col("text")))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out == again)
  }
}
