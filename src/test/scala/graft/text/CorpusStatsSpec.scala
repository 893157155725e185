package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.text.TextFunctions.tokens

class CorpusStatsSpec extends SparkSpec {
  import spark.implicits._

  test("klDrift: identical mixes sit at ~0, a divergent slice scores higher") {
    val docs = Seq(
      ("a", "x x y z"), ("a", "x y z x"), // same mix, shuffled order
      ("b", "x x y z"), ("b", "z x y x"),
      ("c", "q q q q"), ("c", "q q q r")) // disjoint vocabulary
      .toDF("src", "text")
    val out = CorpusStats.klDrift(docs, col("src"), tokens(col("text")))
      .as[(String, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(out("a") == out("b"), "identical distributions must tie exactly")
    assert(out("c") > out("a"), s"disjoint-vocab slice must drift most: $out")
    assert(out.values.forall(_ >= -1e-6), s"KL is non-negative: $out")
  }

  test("klDrift is partitioning-invariant (decimal-sum contract)") {
    val docs = (1 to 60).map(i => (s"s${i % 3}", s"w${i % 7} w${i % 5} common"))
      .toDF("src", "text")
    val a = CorpusStats.klDrift(docs.repartition(1), col("src"), tokens(col("text"))).collect().toSeq
    val b = CorpusStats.klDrift(docs.repartition(11), col("src"), tokens(col("text"))).collect().toSeq
    assert(a == b)
  }

  test("groupOverlap: mirrors hit 1.0, disjoint feeds pair nothing, the cap drops ubiquitous spans") {
    val mirrorText = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = Seq(
      ("m1", mirrorText), ("m2", mirrorText), // exact mirrors
      ("solo", "one two three four five six")) // disjoint vocabulary
      .toDF("src", "text")
    val out = CorpusStats.groupOverlap(docs, col("src"), col("text"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(out.keySet == Set(("m1", "m2")),
      s"only the mirror pair shares spans: ${out.keySet}")
    assert(out(("m1", "m2"))._2 == 1.0, s"mirrors overlap fully: $out")

    // a span in EVERY group is dropped by the cap; the rare span still pairs
    val shared = "w1 w2 w3 w4 w5 w6 w7"
    val capped = Seq(("a", shared), ("b", shared), ("c", shared),
      ("a", "p q r s t u"), ("b", "p q r s t u"))
      .toDF("src", "text")
    val withCap = CorpusStats.groupOverlap(capped, col("src"), col("text"),
      maxGroupFreq = 2)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(withCap.keySet == Set(("a", "b")),
      s"3-group spans must drop at cap 2, leaving only the rare pair: $withCap")
    // exact audit is OPT-IN: the library default is the finite cap
    assert(CorpusStats.DefaultMaxGroupFreq < Int.MaxValue)
    val noCap = CorpusStats.groupOverlap(capped, col("src"), col("text"),
        maxGroupFreq = Int.MaxValue)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(noCap == Set(("a", "b"), ("a", "c"), ("b", "c")),
      s"uncapped, the ubiquitous span pairs all three: $noCap")

    // the default cap itself drops spans past DefaultMaxGroupFreq groups
    val wide = (0 until CorpusStats.DefaultMaxGroupFreq + 1)
      .map(i => (s"g$i", shared)).toDF("src", "text")
    assert(CorpusStats.groupOverlap(wide, col("src"), col("text")).count() == 0,
      "a span in DefaultMaxGroupFreq+1 groups must drop under the default")
  }

  test("docNovelty: boilerplate-assembled docs score 0, unique docs 1, mixes between") {
    val span = (1 to 10).map(i => s"c$i").mkString(" ")
    val docs = Seq(
      (1L, span),                       // every 3-shingle shared with doc 2
      (2L, span),
      (3L, "u1 u2 u3 u4 u5 u6"),        // fully unique
      (4L, s"$span u7 u8 u9"),          // mix: shared prefix + unique tail
      (5L, "a b"))                      // < k tokens → absent
      .toDF("doc_id", "text")
    val out = CorpusStats.docNovelty(docs, col("doc_id"),
      graft.text.TextFunctions.tokens(col("text")), k = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out(1L) == 0.0 && out(2L) == 0.0, s"mirrored docs contribute nothing: $out")
    assert(out(3L) == 1.0, s"fully-unique doc is all-novel: $out")
    assert(out(4L) > 0.0 && out(4L) < 1.0, s"mix lands strictly between: $out")
    assert(!out.contains(5L), "sub-shingle docs are absent")
  }

  test("zipfSlope: an exact 1/r spectrum regresses to -1; singletons go null") {
    // freqs 12/r for ranks 1..4 → ln f = ln 12 − ln r, slope exactly −1
    val zipfTokens = Seq.fill(12)("a") ++ Seq.fill(6)("b") ++
      Seq.fill(4)("c") ++ Seq.fill(3)("d")
    val docs = (zipfTokens.grouped(5).map(_.mkString(" ")).map("z" -> _).toSeq
      :+ ("solo" -> "only"))
      .toDF("src", "text")
    val out = CorpusStats.zipfSlope(docs, col("src"), tokens(col("text")))
      .collect().map(r => r.getString(0) -> ((r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))).toMap
    val (nZ, slopeZ) = out("z")
    assert(nZ == 4L && slopeZ.isDefined)
    assert(math.abs(slopeZ.get - (-1.0)) < 1e-3,
      s"12/r spectrum must slope to -1, got $slopeZ")
    assert(out("solo") == ((1L, None)),
      s"single-term group must return null slope: $out")
  }
}
