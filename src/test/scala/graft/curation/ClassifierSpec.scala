package graft.curation

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.text.TextFunctions.tokens

class ClassifierSpec extends SparkSpec {
  import spark.implicits._

  test("naiveBayes separates vocab-disjoint classes and stays deterministic") {
    val docs = Seq(
      (1L, "apple banana cherry apple", "fruit"),
      (2L, "banana cherry banana", "fruit"),
      (3L, "bolt wrench gear bolt", "tool"),
      (4L, "gear wrench gear wrench", "tool"),
      (5L, "apple banana gear", "fruit")) // mixed, fruit-leaning
      .toDF("doc_id", "text", "y")
    val out = Classifier.naiveBayes(docs, col("doc_id"),
      tokens(col("text")), col("y"))
      .orderBy("__id")
      .as[(Long, String, String, Double)].collect().toSeq
    assert(out.size == 5, "one row per document")
    assert(out.forall { case (_, label, pred, _) => label == pred },
      s"vocab-disjoint classes must self-classify, got $out")
    // deterministic: a re-run is bit-identical
    val again = Classifier.naiveBayes(docs, col("doc_id"),
      tokens(col("text")), col("y"))
      .orderBy("__id").as[(Long, String, String, Double)].collect().toSeq
    assert(out == again)
  }

  test("scores are partitioning-invariant with O(1) aggregation state (no collect_list)") {
    val docs = (1L to 40L).map(i =>
      (i, Seq.tabulate(30)(j => s"w${(i * 7 + j * 13) % 11}").mkString(" "),
        s"c${i % 3}")).toDF("doc_id", "text", "y")
    def run(df: org.apache.spark.sql.DataFrame) =
      Classifier.naiveBayes(df, col("doc_id"), tokens(col("text")), col("y"))
        .orderBy("__id").as[(Long, String, String, Double)].collect().toSeq
    // commutative decimal sum => identical under any partitioning
    assert(run(docs.repartition(1)) == run(docs.repartition(13)))
    val plan = Classifier.naiveBayes(docs, col("doc_id"),
      tokens(col("text")), col("y")).queryExecution.optimizedPlan.toString
    assert(!plan.contains("collect_list"), s"buffered-list agg crept back:\n$plan")
  }

  test("stored NB model round-trips self-scores and scores an unlabeled feed") {
    val docs = Seq(
      (1L, "apple banana cherry apple", "fruit"),
      (2L, "banana cherry banana", "fruit"),
      (3L, "bolt wrench gear bolt", "tool"),
      (4L, "gear wrench gear wrench", "tool"))
      .toDF("doc_id", "text", "y")
    val dir = tmpDir("nb-model")
    Classifier.trainNbModel(docs, col("doc_id"), tokens(col("text")),
      col("y"), dir)
    val self = Classifier.naiveBayes(docs, col("doc_id"),
        tokens(col("text")), col("y"))
      .orderBy("__id").as[(Long, String, String, Double)].collect().toSeq
    val stored = Classifier.scoreNbModel(docs, col("doc_id"),
        tokens(col("text")), col("y"), dir)
      .orderBy("__id").as[(Long, String, String, Double)].collect().toSeq
    assert(self == stored, "artifact round-trip must not change scores")
    // unlabeled live feed: label passes through as null, routing works
    val live = Seq((9L, "apple banana"), (10L, "wrench gear gear"))
      .toDF("doc_id", "text")
    val out = Classifier.scoreNbModel(live, col("doc_id"),
        tokens(col("text")), lit(null).cast("string"), dir)
      .orderBy("__id").collect()
    assert(out.map(_.getString(2)).toSeq == Seq("fruit", "tool"),
      s"frozen model must route the live feed: ${out.toSeq}")
    assert(out.forall(_.isNullAt(1)), "null label passes through")
  }

  test("add-one smoothing scores unseen-per-class tokens; empty docs take the prior argmax") {
    val docs = Seq(
      (1L, "alpha alpha", "a"),
      (2L, "alpha beta", "a"),
      (3L, "gamma", "b"),
      (4L, "", "b"),
      (5L, "   ", "a")) // whitespace-only → no tokens
      .toDF("doc_id", "text", "y")
    val out = Classifier.naiveBayes(docs, col("doc_id"),
      tokens(col("text")), col("y"))
      .orderBy("__id")
      .as[(Long, String, String, Double)].collect().toSeq
    assert(out.size == 5)
    // token-less docs score prior-only: class 'a' has 3 docs vs 2 —
    // both empty docs predict 'a' regardless of their own label
    assert(out.filter(r => r._1 == 4L || r._1 == 5L)
      .forall(_._3 == "a"), s"prior argmax for token-less docs, got $out")
    // doc 3's 'gamma' is unseen in class a (count 0 → smoothed), seen
    // in b — b must win despite a's larger prior
    assert(out.find(_._1 == 3L).get._3 == "b")
    // scores are finite (smoothing leaves no -inf anywhere)
    assert(out.forall(r => !r._4.isNaN && !r._4.isInfinite))
  }

  test("a class trained only on token-less docs cannot hijack the argmax") {
    // 'junk' has the LARGEST prior (3 of 6 docs) but zero token mass —
    // its per-token likelihood must be the smoothed ln(1/V), not a
    // silently-dropped term (which would make prior-only 'junk' beat
    // every real class's negative likelihood sum)
    // repeated tokens: classes with real token mass concentrate their
    // likelihood ((c+1)/(tok_c+V) ≫ 1/V), so they must beat junk's
    // smoothed floor despite its prior edge. (A class of all-unique
    // singletons scores ≈ the smoothed floor and junk's prior CAN
    // legitimately win it — that is correct NB, not the bug.)
    val docs = Seq(
      (1L, "alpha alpha alpha alpha", "a"),
      (2L, "alpha alpha beta beta", "a"),
      (3L, "t1 t1 t1 t1 t2 t2 t2 t2", "b"),
      (4L, "", "junk"), (5L, "  ", "junk"), (6L, "", "junk"))
      .toDF("doc_id", "text", "y")
    val out = Classifier.naiveBayes(docs, col("doc_id"),
      tokens(col("text")), col("y"))
      .orderBy("__id").as[(Long, String, String, Double)].collect().toSeq
    assert(out.find(_._1 == 1L).get._3 == "a",
      s"an alpha-heavy doc must stay with the class that owns alpha: $out")
    assert(out.find(_._1 == 2L).get._3 == "a")
    assert(out.find(_._1 == 3L).get._3 == "b")
    // junk still wins the token-LESS docs (prior argmax — correct)
    assert(out.filter(r => r._1 >= 4L).forall(_._3 == "junk"))
  }

  test("class tie-break is lexicographic at equal rounded scores") {
    // two classes, symmetric corpora: every doc scores identically for
    // both classes, so the argmax must fall to the class name
    val docs = Seq(
      (1L, "x", "a"), (2L, "x", "b"))
      .toDF("doc_id", "text", "y")
    val out = Classifier.naiveBayes(docs, col("doc_id"),
      tokens(col("text")), col("y"))
      .orderBy("__id").as[(Long, String, String, Double)].collect().toSeq
    assert(out.forall(_._3 == "a"), s"lexicographic tie-break, got $out")
  }
}
