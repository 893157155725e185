package graft.text

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.text.TextFunctions.tokens

class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  /** A skewed stream: "hot1" 300×, "hot2" 150×, "warm" 40×, plus 600
    * distinct singletons — n = 1090. At support 1/20 (n/20 = 54.5) the
    * exact answer is {hot1, hot2}. */
  private def corpus = {
    val toks = Seq.fill(300)("hot1") ++ Seq.fill(150)("hot2") ++
      Seq.fill(40)("warm") ++ (1 to 600).map(i => s"tail$i")
    // spread tokens across many docs so partitions differ
    toks.grouped(7).map(_.mkString(" ")).toSeq.toDF("text")
  }

  test("frequentTokens equals the exact groupBy answer, any partitioning") {
    val exact = corpus.select(explode(tokens(col("text"))).as("term"))
      .groupBy("term").count()
      .withColumnRenamed("count", "freq")
      .where(col("freq") * 20 >= lit(1090L))
      .orderBy(col("freq").desc, col("term"))
      .as[(String, Long)].collect().toSeq
    assert(exact.map(_._1) == Seq("hot1", "hot2"), s"fixture sanity: $exact")
    for (p <- Seq(1, 3, 17)) {
      val got = HeavyHitters.frequentTokens(corpus.repartition(p),
        tokens(col("text")), num = 1, den = 20)
        .as[(String, Long)].collect().toSeq
      assert(got == exact, s"partitioning $p changed the answer: $got")
    }
  }

  test("MG sketch state is k-bounded and its candidates are a frequency superset") {
    val row = HeavyHitters.mgSketch(corpus.repartition(11),
      tokens(col("text")), num = 1, den = 20).collect().head
    val n = row.getLong(0)
    assert(n == 1090L)
    val cands = row.getSeq[Row](1).map(_.getString(0))
    assert(cands.size <= 40, s"sketch must stay k-bounded, got ${cands.size}")
    // guarantee: every term above n/(k+1) is present (k = 40 here)
    assert(cands.contains("hot1") && cands.contains("hot2"))
  }

  test("sketch survives a low-k adversarial order (guarantee, not luck)") {
    // hot appears exactly 11× in 100 tokens; k=9 → threshold n/(k+1)=10,
    // so hot MUST survive even when every other token is distinct and
    // the hots arrive first (worst case for decrement sweeps)
    val toks = Seq.fill(11)("hot") ++ (1 to 89).map(i => s"t$i")
    val df = toks.map(Tuple1(_)).toDF("term")
    val sk = df.repartition(1)
      .agg(call_function("graft_misra_gries", col("term"), lit(9)).as("sk"))
      .collect().head.getSeq[Row](0).map(_.getString(0))
    assert(sk.contains("hot"), s"MG guarantee violated: $sk")
    assert(sk.size <= 9)
  }

  test("null terms are ignored; empty input gives an empty sketch") {
    val df = Seq(Some("a"), None, Some("a"), None).toDF("term")
    val sk = df.agg(call_function("graft_misra_gries", col("term"), lit(4)).as("sk"))
      .collect().head.getSeq[Row](0)
    assert(sk.map(r => (r.getString(0), r.getLong(1))) == Seq(("a", 2L)))
    val empty = spark.emptyDataset[String].toDF("term")
      .agg(call_function("graft_misra_gries", col("term"), lit(4)).as("sk"))
      .collect().head.getSeq[Row](0)
    assert(empty.isEmpty)
  }
}
