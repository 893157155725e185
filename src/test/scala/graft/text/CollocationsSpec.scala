package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.text.TextFunctions.tokens

class CollocationsSpec extends SparkSpec {
  import spark.implicits._

  test("bigramsOf: adjacent pairs; empty and single-token arrays give []") {
    val out = Seq("a b c d", "solo", "", "x y")
      .toDF("text")
      .select(Collocations.bigramsOf(tokens(col("text"))).as("bi"))
      .as[Seq[String]].collect().toSeq
    assert(out == Seq(Seq("a b", "b c", "c d"), Seq(), Seq(), Seq("x y")))
  }

  test("pmiTopK: an always-joint pair beats an independent pair; counts exact") {
    // "new york" always adjacent (8×); "the cat"/"the dog" mix freely
    val docs = (Seq.fill(8)("new york") ++
      Seq.fill(8)("the cat the dog the cat the dog"))
      .toDF("text")
    val out = Collocations.pmiTopK(docs, tokens(col("text")),
      minCount = 2, k = 10)
      .as[(Long, String, String, Long, Double)].collect().toSeq
    assert(out.nonEmpty && out.head._2 == "new" && out.head._3 == "york",
      s"perfectly-joint pair must rank first, got $out")
    assert(out.head._4 == 8, "support count is exact")
    // every returned pair meets the support floor and ranks are 1..n
    assert(out.forall(_._4 >= 2))
    assert(out.map(_._1) == (1L to out.size))
    // PMI of the joint pair > PMI of any mixed pair
    val mixed = out.filter(r => r._2 == "the")
    assert(mixed.forall(_._5 < out.head._5))
  }

  test("pmiTopK is partitioning-invariant (two-stage top-k is exact)") {
    val docs = (1 to 50).map(i => s"alpha beta gamma delta w$i alpha beta")
      .toDF("text")
    val a = Collocations.pmiTopK(docs.repartition(1), tokens(col("text")), 2, 5)
      .collect().toSeq
    val b = Collocations.pmiTopK(docs.repartition(13), tokens(col("text")), 2, 5)
      .collect().toSeq
    assert(a == b)
  }
}
