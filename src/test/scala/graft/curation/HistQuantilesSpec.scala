package graft.curation

import org.apache.spark.sql.functions._

import graft.SparkSpec

class HistQuantilesSpec extends SparkSpec {
  import spark.implicits._

  test("estimates sit within one bin width of the exact percentile") {
    val docs = (0 until 2000)
      .map(i => (s"g${i % 3}", math.pow(1.003, i) * 10)) // skewed spectrum
      .toDF("grp", "x")
    val qs = Seq(0.5, 0.9, 0.99)
    val bins = 128
    val est = HistQuantiles.quantiles(docs, col("grp"), col("x"), bins, qs)
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    val exact = docs.groupBy("grp")
      .agg(expr("percentile(x, array(0.5D, 0.9D, 0.99D))").as("p"),
        max("x").as("hi"), min("x").as("lo"))
      .collect().flatMap { r =>
        val p = r.getSeq[Double](1)
        val width = (r.getDouble(2) - r.getDouble(3)) / bins
        qs.zipWithIndex.map { case (q, i) => (r.getString(0), q) -> (p(i), width) }
      }.toMap
    for (((g, q), e) <- est) {
      val (ex, width) = exact((g, q))
      assert(math.abs(e - ex) <= width + 1e-9,
        s"$g q=$q: est $e vs exact $ex exceeds bin width $width")
    }
  }

  test("partitioning-invariant (commutative integer counts, unlike sketch quantiles)") {
    val docs = (0 until 1000).map(i => ("g", (i * 37 % 997).toDouble)).toDF("grp", "x")
    val a = HistQuantiles.quantiles(docs.repartition(1), col("grp"), col("x"))
      .collect().toSeq
    val b = HistQuantiles.quantiles(docs.repartition(17), col("grp"), col("x"))
      .collect().toSeq
    assert(a == b)
  }

  test("degenerate all-equal group returns the value; tiny groups still answer") {
    val docs = (Seq.fill(5)(("flat", 7.0)) ++ Seq(("one", 3.0))).toDF("grp", "x")
    val out = HistQuantiles.quantiles(docs, col("grp"), col("x"), bins = 8,
        qs = Seq(0.5))
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(out("flat") == 7.0 && out("one") == 3.0, out.toString)
  }

  test("no sort of the data-scale side: the only window runs over the bins-bounded table") {
    val docs = (0 until 500).map(i => ("g", i.toDouble)).toDF("grp", "x")
    val plan = HistQuantiles.quantiles(docs, col("grp"), col("x"), bins = 16)
      .queryExecution.optimizedPlan.toString
    // exact percentile would show a sort-based aggregate over x; the
    // histogram path must not sort anything data-sized (the ORDER BY
    // in the output and the bins-table window are bounded by bins)
    assert(!plan.toLowerCase.contains("percentile"),
      s"histogram path must not fall back to sort-based percentile:\n$plan")
  }
}
